import numpy as np
import jax.numpy as jnp
import pytest

from metalpathtracer_tpu.io import (
    linear_to_srgb,
    load_checkpoint,
    read_png,
    save_checkpoint,
    write_png,
)
from metalpathtracer_tpu.render.pipeline import AccumState


def test_png_roundtrip(tmp_path):
    img = np.random.default_rng(0).random((17, 23, 3)).astype(np.float32)
    p = str(tmp_path / "t.png")
    write_png(p, img)
    back = read_png(p)
    assert back.shape == (17, 23, 3) and back.dtype == np.uint8
    expected = (linear_to_srgb(img) * 255 + 0.5).astype(np.uint8)
    np.testing.assert_array_equal(back, expected)


def test_png_uint8_passthrough(tmp_path):
    img = np.arange(4 * 4 * 3, dtype=np.uint8).reshape(4, 4, 3)
    p = str(tmp_path / "u.png")
    write_png(p, img)
    np.testing.assert_array_equal(read_png(p), img)


def test_png_rejects_bad_shape(tmp_path):
    with pytest.raises(ValueError):
        write_png(str(tmp_path / "x.png"), np.zeros((4, 4)))


def test_srgb_curve():
    np.testing.assert_allclose(linear_to_srgb(np.array(0.0)), 0.0)
    np.testing.assert_allclose(linear_to_srgb(np.array(1.0)), 1.0)
    np.testing.assert_allclose(linear_to_srgb(np.array(0.5)), 0.7353569, atol=1e-5)


def test_checkpoint_roundtrip(tmp_path):
    st = AccumState(
        rgb_sum=jnp.ones((8, 8, 3)) * 2.5,
        spp=jnp.int32(7),
    )
    p = str(tmp_path / "ck.npz")
    save_checkpoint(p, st, seed=123, meta={"width": 8})
    st2, seed, meta = load_checkpoint(p)
    np.testing.assert_array_equal(np.asarray(st2.rgb_sum), np.asarray(st.rgb_sum))
    assert int(st2.spp) == 7 and seed == 123 and int(meta["width"]) == 8
