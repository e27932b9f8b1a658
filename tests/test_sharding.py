"""Multi-chip sharding tests on the virtual 8-device CPU mesh (SURVEY.md §4.4).

The central claim: positional RNG makes sharded renders BIT-IDENTICAL to the
single-device render, for tile, sample, and composed 2-D shardings.
"""

import jax
import numpy as np
import pytest

from metalpathtracer_tpu.parallel import (
    make_mesh,
    make_mesh_2d,
    render_image_sample_sharded,
    render_image_sharded,
    render_image_sharded_2d,
)
from metalpathtracer_tpu.render import Camera, render_image, upload_scene
from metalpathtracer_tpu.scene import presets

CAM = Camera.look_at((0, 2.5, 9.0), (0, 2.5, 0), vfov_deg=40.0)


@pytest.fixture(scope="module")
def cornell():
    return upload_scene(presets.cornell_spheres())


@pytest.fixture(scope="module")
def single(cornell):
    img, rays = render_image(cornell, CAM, 32, 32, spp=4, seed=3, spp_per_pass=4)
    return np.asarray(img), rays


def test_tile_sharded_bit_identical(cornell, single):
    img, rays = render_image_sharded(cornell, CAM, 32, 32, spp=4, seed=3)
    np.testing.assert_array_equal(np.asarray(img), single[0])
    assert rays == single[1]


def test_tile_sharded_two_devices(cornell, single):
    mesh = make_mesh(2)
    img, _ = render_image_sharded(cornell, CAM, 32, 32, spp=4, seed=3, mesh=mesh)
    np.testing.assert_array_equal(np.asarray(img), single[0])


def test_sample_sharded_matches(cornell):
    base, base_rays = render_image(cornell, CAM, 32, 32, spp=8, seed=3, spp_per_pass=8)
    img, rays = render_image_sample_sharded(cornell, CAM, 32, 32, spp=8, seed=3)
    # psum reorders the per-sample additions: allow float addition slop
    np.testing.assert_allclose(np.asarray(img), np.asarray(base), rtol=1e-5, atol=1e-6)
    assert rays == base_rays


def test_2d_mesh_matches(cornell, single):
    mesh = make_mesh_2d(4, 2)
    img, rays = render_image_sharded_2d(
        cornell, CAM, 32, 32, spp=4, seed=3, mesh=mesh
    )
    np.testing.assert_allclose(np.asarray(img), single[0], rtol=1e-5, atol=1e-6)
    assert rays == single[1]


def test_tile_sharding_requires_divisible_height(cornell):
    with pytest.raises(ValueError):
        render_image_sharded(cornell, CAM, 32, 30, spp=1, seed=0)


def test_sample_sharding_requires_divisible_spp(cornell):
    with pytest.raises(ValueError):
        render_image_sample_sharded(cornell, CAM, 32, 32, spp=3, seed=0)


def test_mesh_has_8_virtual_devices():
    assert jax.device_count() == 8
    assert make_mesh().devices.size == 8


def test_progressive_sharded_accumulation_matches_wavefront(cornell):
    """Two accumulate_sharded steps == one-shot wavefront render at the
    same total spp (same seed; sample ids continue across steps), and the
    compiled fn is reused across steps (no per-step re-jit)."""
    from metalpathtracer_tpu.parallel import (
        accumulate_sharded,
        init_accum_sharded,
    )
    from metalpathtracer_tpu.parallel.sharding import _accum_sharded_fn
    from metalpathtracer_tpu.render import render_image_wavefront

    mesh = make_mesh(4)
    state = init_accum_sharded(32, 32, mesh)
    _accum_sharded_fn.cache_clear()
    state, rays1 = accumulate_sharded(
        state, cornell, CAM, n_samples=2, seed=3, mesh=mesh, pool_size=256
    )
    state, rays2 = accumulate_sharded(
        state, cornell, CAM, n_samples=2, seed=3, mesh=mesh, pool_size=256
    )
    assert _accum_sharded_fn.cache_info().misses == 1
    assert _accum_sharded_fn.cache_info().hits == 1
    assert int(state.spp) == 4

    img, rays = render_image_wavefront(
        cornell, CAM, 32, 32, spp=4, seed=3, pool_size=256
    )
    # per-pixel sums accumulate in a different order across steps: the
    # radiance values are identical, addition order is not -> tiny fp slop
    np.testing.assert_allclose(
        np.asarray(state.rgb_sum) / 4.0, np.asarray(img), rtol=1e-6, atol=1e-7
    )
    assert rays1 + rays2 == rays


def test_accum_sharded_checkpoint_roundtrip(cornell, tmp_path):
    """Gather -> checkpoint -> restore -> continue == uninterrupted run."""
    from metalpathtracer_tpu.io.checkpoint import load_checkpoint, save_checkpoint
    from metalpathtracer_tpu.parallel import (
        accumulate_sharded,
        init_accum_sharded,
    )
    from metalpathtracer_tpu.render.pipeline import AccumState

    mesh = make_mesh(4)
    s0 = init_accum_sharded(32, 32, mesh)
    s1, _ = accumulate_sharded(
        s0, cornell, CAM, n_samples=2, seed=7, mesh=mesh, pool_size=256
    )
    path = tmp_path / "shard.npz"
    save_checkpoint(str(path), AccumState(np.asarray(s1.rgb_sum), s1.spp), seed=7)
    loaded, _seed, _meta = load_checkpoint(str(path))
    import jax
    from jax.sharding import NamedSharding, PartitionSpec as P

    resumed = AccumState(
        rgb_sum=jax.device_put(loaded.rgb_sum, NamedSharding(mesh, P("tiles"))),
        spp=loaded.spp,
    )
    a, _ = accumulate_sharded(
        resumed, cornell, CAM, n_samples=2, seed=7, mesh=mesh, pool_size=256
    )
    b, _ = accumulate_sharded(
        s1, cornell, CAM, n_samples=2, seed=7, mesh=mesh, pool_size=256
    )
    np.testing.assert_array_equal(np.asarray(a.rgb_sum), np.asarray(b.rgb_sum))
    assert int(a.spp) == int(b.spp) == 4
