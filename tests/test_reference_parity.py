"""Reference-parity checklist: one assertion per behavioral contract
inherited from omkhairate/MetalPathtracer (file:line cites in comments).

This file is the compact, executable form of the README's component map —
if the reference defines a constant or semantic, the rebuild either matches
it or documents the deliberate deviation where the behavior is defined.
"""

import jax.numpy as jnp
import numpy as np

from metalpathtracer_tpu.accel.bvh import LEAF_SIZE, TRAVERSAL_COST
from metalpathtracer_tpu.core import rng
from metalpathtracer_tpu.render import Camera, RenderConfig, viewport_basis
from metalpathtracer_tpu.render import camera as cam_mod
from metalpathtracer_tpu.render.bsdf import sky_color
from metalpathtracer_tpu.render.intersect import T_MIN, TRI_PARALLEL_EPS
from metalpathtracer_tpu.scene import Material
from metalpathtracer_tpu.scene.xml_loader import _parse_float, _parse_vec3


def test_camera_constants():
    # Camera.h:20-22 speeds; Camera.h:24-32 reset pose; Camera.h:66-73 fov clamp
    assert cam_mod.MOVEMENT_SPEED == 0.1
    assert cam_mod.ROTATION_SPEED == 0.002
    assert cam_mod.ZOOM_SPEED == 0.1
    assert (cam_mod.FOV_MIN, cam_mod.FOV_MAX) == (30.0, 120.0)
    c = Camera.reset()
    np.testing.assert_array_equal(np.asarray(c.position), [0, 20, 50])
    assert float(c.vfov_deg) == 60.0


def test_integrator_constants():
    # PathTracing.h:216 max depth; PathTracing.h:100,134,165 epsilons;
    # PathTracing.h:148 parallel test
    assert RenderConfig().max_depth == 32
    assert T_MIN == 1e-4
    assert TRI_PARALLEL_EPS == 1e-5


def test_bvh_constants():
    # Scene.h:223 leaf size; Scene.h:283-299 SAH cost constant
    assert LEAF_SIZE == 8
    assert TRAVERSAL_COST == 0.125


def test_sky_gradient_is_reference_mix():
    # PathTracing.h:225-231: mix(white, (0.6,0.7,1.0), 0.5*(y+1))
    for y in (-1.0, -0.25, 0.0, 0.5, 1.0):
        d = jnp.array([[0.0, y, 0.0]])
        t = 0.5 * (y + 1.0)
        expect = (1 - t) * np.ones(3) + t * np.array([0.6, 0.7, 1.0])
        np.testing.assert_allclose(np.asarray(sky_color(d))[0], expect, atol=1e-6)


def test_material_float_conventions():
    # Material.h + Scatter.h + PathTracing.h:245 conventions
    m = Material()
    assert m.material_type == 0.0 and m.emission_power == 0.0  # Lambertian
    from metalpathtracer_tpu.render.bsdf import is_emissive

    assert bool(is_emissive(jnp.float32(2.0), jnp.float32(0.0)))  # ==2 marker
    assert bool(is_emissive(jnp.float32(0.0), jnp.float32(5.0)))  # power>0
    assert not bool(is_emissive(jnp.float32(-1.0), jnp.float32(0.0)))  # mirror


def test_xml_defaults_match_reference():
    # SceneLoader.cpp:95-105: radius default 1, scale default 1,
    # materialType default 0, emissionPower default 0; vec3 "x,y,z"
    assert _parse_float(None, 1.0) == 1.0
    assert _parse_float("2.5", 1.0) == 2.5
    assert _parse_vec3("1,2,3") == (1.0, 2.0, 3.0)
    assert _parse_vec3(None) == (0.0, 0.0, 0.0)


def test_viewport_math_matches_recalculateViewport():
    # Renderer.cpp:153-176 at the defaults (focal length 1)
    c = Camera.reset()
    origin, first_pixel, vu, vv = (np.asarray(v) for v in viewport_basis(c, 1280, 720))
    half_h = np.tan(np.deg2rad(30.0))
    half_w = (1280 / 720) * half_h
    np.testing.assert_allclose(np.linalg.norm(vu), 2 * half_w, rtol=1e-6)
    np.testing.assert_allclose(np.linalg.norm(vv), 2 * half_h, rtol=1e-6)
    # vv points DOWN in world (y-flipped uv, Vertex.metal)
    assert vv[1] < 0


def test_reference_estimator_semantics_documented_deviations():
    # deliberate deviations are opt-outs, not silent changes:
    cfg = RenderConfig()
    assert cfg.clamp_radiance is False  # PathTracing.h:258 clamp = opt-in
    assert RenderConfig(clamp_radiance=True).clamp_radiance  # parity mode
    assert cfg.adaptive_offset is True  # 1e-4 fixed offset = opt-out
    assert RenderConfig(adaptive_offset=False).adaptive_offset is False
    assert cfg.rr_start == 0 and cfg.nee is False  # extensions off by default


def test_rng_fixes_reference_defects():
    # appendix 1: correlated unit-vector draws; appendix 2: static-camera
    # accumulation retracing identical paths. Both are structural here.
    pix = jnp.arange(2048, dtype=jnp.uint32)
    v = np.asarray(rng.random_unit_vector(1, pix, 0, 0))
    z, t = v[:, 2], np.arctan2(v[:, 1], v[:, 0])
    assert abs(np.corrcoef(z, t)[0, 1]) < 0.06  # decorrelated draws
    s0 = np.asarray(rng.uniform1(1, pix, 0, 0, rng.PURPOSE_JITTER_X))
    s1 = np.asarray(rng.uniform1(1, pix, 1, 0, rng.PURPOSE_JITTER_X))
    assert not np.array_equal(s0, s1)  # frames advance the stream


def test_reference_config_is_strict():
    from metalpathtracer_tpu.render import REFERENCE_CONFIG

    assert REFERENCE_CONFIG.clamp_radiance is True
    assert REFERENCE_CONFIG.adaptive_offset is False
    assert REFERENCE_CONFIG.max_depth == 32
    assert REFERENCE_CONFIG.nee is False and REFERENCE_CONFIG.rr_start == 0
