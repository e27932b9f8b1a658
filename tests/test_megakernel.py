"""Fused-bounce megakernel correctness (interpret mode on CPU)."""

import numpy as np
import pytest

from metalpathtracer_tpu.render import (
    Camera,
    RenderConfig,
    render_image_wavefront,
    upload_scene,
)
from metalpathtracer_tpu.scene import presets

CAM = Camera.look_at((0, 2.5, 9.0), (0, 2.5, 0), vfov_deg=40.0)


def test_megakernel_furnace_exact():
    # albedo-1 furnace must converge to exactly 1.0 — the strongest
    # whole-estimator correctness check
    scene = upload_scene(presets.furnace(1.0))
    cam = Camera.look_at((0, 0, 0), (0, 0, -3), vfov_deg=40.0)
    img, _ = render_image_wavefront(
        scene, cam, 16, 16, spp=8, seed=2,
        cfg=RenderConfig(max_depth=64, megakernel=True), pool_size=1024,
    )
    np.testing.assert_allclose(np.asarray(img), 1.0, atol=1e-4)


def test_megakernel_matches_xla_estimator():
    # same RNG streams; BSDF fp reassociation causes per-pixel chaos, so
    # compare distributions: means agree and most pixels match
    scene = upload_scene(presets.cornell_materials())
    a, ra = render_image_wavefront(
        scene, CAM, 24, 24, spp=8, seed=7,
        cfg=RenderConfig(max_depth=8), pool_size=1024,
    )
    b, rb = render_image_wavefront(
        scene, CAM, 24, 24, spp=8, seed=7,
        cfg=RenderConfig(max_depth=8, megakernel=True), pool_size=1024,
    )
    a, b = np.asarray(a), np.asarray(b)
    assert abs(a.mean() - b.mean()) / a.mean() < 0.02
    assert (np.abs(a - b) < 1e-3).mean() > 0.75
    # ulp-level direction differences occasionally change path lengths
    assert abs(ra - rb) / ra < 0.01


def test_megakernel_bunny_scene():
    scene = upload_scene(presets.reference_default("assets/bunny.obj"))
    cam = Camera.reset()
    a, ra = render_image_wavefront(
        scene, cam, 32, 18, spp=2, seed=1,
        cfg=RenderConfig(max_depth=6), pool_size=512,
    )
    b, rb = render_image_wavefront(
        scene, cam, 32, 18, spp=2, seed=1,
        cfg=RenderConfig(max_depth=6, megakernel=True), pool_size=512,
    )
    a, b = np.asarray(a), np.asarray(b)
    assert abs(ra - rb) / ra < 0.02
    assert abs(a.mean() - b.mean()) / a.mean() < 0.02


def test_megakernel_rr():
    scene = upload_scene(presets.cornell_spheres())
    img, _ = render_image_wavefront(
        scene, CAM, 16, 16, spp=8, seed=3,
        cfg=RenderConfig(max_depth=16, rr_start=2, megakernel=True),
        pool_size=512,
    )
    base, _ = render_image_wavefront(
        scene, CAM, 16, 16, spp=8, seed=3,
        cfg=RenderConfig(max_depth=16), pool_size=512,
    )
    m0, m1 = float(np.asarray(base).mean()), float(np.asarray(img).mean())
    assert abs(m0 - m1) / m0 < 0.2  # unbiased, higher variance


def test_megakernel_bounces_per_iter_invariant():
    # the packed wavefront must honor bounces_per_iter (it once silently
    # ignored it, ADVICE r1) and the estimate is invariant to the setting
    scene = upload_scene(presets.cornell_spheres())
    base, rb = render_image_wavefront(
        scene, CAM, 16, 16, spp=4, seed=5,
        cfg=RenderConfig(max_depth=6, megakernel=True), pool_size=256,
    )
    for bpi in (2, 3):
        img, r = render_image_wavefront(
            scene, CAM, 16, 16, spp=4, seed=5,
            cfg=RenderConfig(max_depth=6, megakernel=True,
                             bounces_per_iter=bpi),
            pool_size=256,
        )
        np.testing.assert_allclose(np.asarray(img), np.asarray(base),
                                   rtol=1e-5, atol=1e-6)
        assert r == rb
