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
