"""The fused advance kernel (render/pallas/advance_mm.py) against the
split bounce path. Agreement contract (see the module docstring there):

- per-bounce ESTIMATOR state (light, throughput, alive mask, counters) is
  bit-identical in CPU interpret mode — any formula-order divergence
  between `fused_bounce_step` and `integrator._bounce_step` +
  `closest_hit_mm_full` + `bsdf.sample_bsdf` shows up as a hard mismatch;
- ray GEOMETRY (o, d) agrees to ~1 ulp only: XLA's FMA contraction is
  fusion-context-dependent (the same `o + t*d` contracts inside the
  Pallas kernel but not inside _bounce_step), so position rounding cannot
  be promised bit-equal across two differently-fused programs. Geometry
  asserts a tight tolerance plus a zero budget for large outliers (a real
  formula bug moves many lanes by a lot, not 75% of lanes by 1e-6);
- full renders agree at chaos level (the golden-test convention's class
  of 1-ulp difference): RMSE gate + near-equal ray counts.
"""

import numpy as np
import pytest

import jax.numpy as jnp

from metalpathtracer_tpu.render import (
    Camera,
    RenderConfig,
    render_image,
    render_image_wavefront,
    upload_scene,
)
from metalpathtracer_tpu.render.pallas import advance_mm
from metalpathtracer_tpu.scene import presets
from metalpathtracer_tpu.scene.types import HostScene, Material

CAM = Camera.look_at((0, 2.5, 9.0), (0, 2.5, 0), vfov_deg=40.0)


def _all_lobes_scene() -> HostScene:
    """Cornell sphere box + mirror/dielectric/glossy spheres + TWO meshes
    (one diffuse, one glossy metal): every BSDF lobe reachable on both
    primitive kinds, so the fused kernel's tri/sphere merge and every
    shade branch are exercised."""
    from metalpathtracer_tpu.scene.procgen import icosphere

    s = presets.cornell_materials()
    verts, faces = icosphere(subdivisions=1, radius=0.6)
    s.add_mesh(verts, faces, position=(-0.9, 1.9, -1.2), scale=1.0,
               material=Material(albedo=(0.85, 0.55, 0.25)))
    s.add_mesh(verts, faces, position=(1.2, 2.6, -0.6), scale=0.8,
               material=Material(albedo=(0.9, 0.9, 0.95),
                                 material_type=-1.0, fuzz=0.2))
    return s


@pytest.fixture(scope="module")
def scene():
    return upload_scene(_all_lobes_scene())


def test_fused_tables_built(scene):
    assert scene.mm_w_t.ndim == 3
    n_tiles, rows, feats = scene.mm_w_t.shape
    tile_p = rows // 4
    assert feats == 64
    assert scene.mm_refine3.shape == (n_tiles, 48, tile_p)


def test_refine3_reconstructs_exactly(scene):
    """The 3-way bf16 mantissa split must reconstruct the f32 refine rows
    — normal, n.v0, prim id AND the baked per-triangle material fields —
    bit-exactly when summed in f32."""
    r3 = np.asarray(scene.mm_refine3, np.float32)  # (nt, 48, tp)
    rec = r3[:, 0:16, :] + r3[:, 16:32, :] + r3[:, 32:48, :]
    n_tiles, _, tile_p = r3.shape
    ref = np.asarray(scene.mm_refine, np.float32)  # (T, 8)
    bank = np.asarray(scene.mat_bank, np.float32)
    full = np.zeros((n_tiles * tile_p, 16), np.float32)
    t = ref.shape[0]
    full[:t, :5] = ref[:, :5]
    full[:t, 5:14] = bank[ref[:, 5].astype(np.int64), 0:9]
    want = full.reshape(n_tiles, tile_p, 16).transpose(0, 2, 1)
    np.testing.assert_array_equal(rec, want)


def test_eligibility_gates(scene):
    cfg = RenderConfig(fused=True)
    assert advance_mm.fused_eligible(scene, cfg, 1024)
    assert not advance_mm.fused_eligible(scene, cfg, 512)  # pool % BLOCK_R
    assert not advance_mm.fused_eligible(
        scene, RenderConfig(fused=False), 1024
    )
    assert not advance_mm.fused_eligible(
        scene, RenderConfig(nee=True, rr_start=2), 1024
    )
    assert not advance_mm.fused_eligible(
        scene, RenderConfig(intersector="bvh"), 1024
    )
    sph = upload_scene(presets.cornell_spheres())  # num_tris == 0
    assert not advance_mm.fused_eligible(sph, cfg, 1024)


def _step_pair(scene, cfg_kw, bounce, seed=7):
    """Run ONE bounce through the split and the fused paths on identical
    inputs and return both output tuples."""
    from metalpathtracer_tpu.render import integrator
    from metalpathtracer_tpu.render.pipeline import generate_rays

    n = 1024
    pixel = jnp.arange(n, dtype=jnp.uint32)
    sample = jnp.zeros((n,), jnp.uint32)
    o, d = generate_rays(CAM, 32, 32, pixel, sample, seed)
    light = jnp.zeros((n, 3), jnp.float32)
    tp = jnp.ones((n, 3), jnp.float32)
    prev = jnp.zeros((n,), jnp.float32)
    active = (jnp.arange(n) % 17) != 0  # some dead lanes
    bvec = jnp.full((n,), bounce, jnp.int32)

    cfg_split = RenderConfig(fused=False, **cfg_kw)
    cfg_fused = RenderConfig(fused=True, **cfg_kw)
    assert advance_mm.fused_eligible(scene, cfg_fused, n)

    out_s = integrator._bounce_step(
        scene, o, d, light, tp, active, prev, pixel, sample, bvec, seed,
        cfg_split,
    )
    out_f = integrator._bounce_step(
        scene, o, d, light, tp, active, prev, pixel, sample, bvec, seed,
        cfg_fused,
    )
    return out_s, out_f


def _assert_step_agreement(out_s, out_f):
    # estimator state: BIT-exact
    exact = {2: "light", 3: "throughput", 4: "still", 5: "prev_pdf",
             6: "rays", 7: "shadow"}
    for i, name in exact.items():
        np.testing.assert_array_equal(
            np.asarray(out_s[i]), np.asarray(out_f[i]),
            err_msg=f"field {name}",
        )
    # geometry: ~1 ulp (FMA contraction context — see module docstrings).
    # A real formula bug moves lanes by O(1); zero tolerance for that.
    for i, name in ((0, "o"), (1, "d")):
        a = np.asarray(out_s[i], np.float64)
        b = np.asarray(out_f[i], np.float64)
        diff = np.abs(a - b)
        tol = 1e-5 * np.maximum(1.0, np.abs(a))
        n_big = int((diff > tol).sum())
        assert n_big == 0, (
            f"field {name}: {n_big} elements beyond 1-ulp-scale tolerance "
            f"(max diff {diff.max():.3e})"
        )


@pytest.mark.parametrize("cfg_kw", [
    dict(),
    dict(rr_start=1),
    dict(adaptive_offset=False),
])
def test_fused_step_agreement(scene, cfg_kw):
    out_s, out_f = _step_pair(scene, cfg_kw, bounce=0)
    _assert_step_agreement(out_s, out_f)


def test_fused_step_agreement_deep_bounce(scene):
    # bounce 3 exercises different RNG counters and (with rr_start=2) the
    # roulette branch being LIVE rather than pass-through
    out_s, out_f = _step_pair(scene, dict(rr_start=2), bounce=3)
    _assert_step_agreement(out_s, out_f)


def _rmse(a, b):
    return float(np.sqrt(np.mean((np.asarray(a) - np.asarray(b)) ** 2)))


def test_fused_wavefront_render_agreement(scene):
    cfg_s = RenderConfig(max_depth=6, fused=False)
    cfg_f = RenderConfig(max_depth=6, fused=True)
    a, ra = render_image_wavefront(
        scene, CAM, 32, 32, spp=2, seed=3, cfg=cfg_s, pool_size=1024
    )
    b, rb = render_image_wavefront(
        scene, CAM, 32, 32, spp=2, seed=3, cfg=cfg_f, pool_size=1024
    )
    # chaos-level agreement: 1-ulp geometry drift decorrelates deep
    # bounces on a few lanes; the estimator itself is unchanged
    assert _rmse(a, b) < 2e-2
    assert abs(int(ra) - int(rb)) <= 0.01 * int(ra)


def test_fused_scan_render_agreement(scene):
    # the scan integrator routes through the same _bounce_step: 32x32 = 1024
    # lanes is fused-eligible
    cfg_s = RenderConfig(max_depth=4, fused=False)
    cfg_f = RenderConfig(max_depth=4, fused=True)
    a, _ = render_image(scene, CAM, 32, 32, spp=2, seed=5, cfg=cfg_s)
    b, _ = render_image(scene, CAM, 32, 32, spp=2, seed=5, cfg=cfg_f)
    assert _rmse(a, b) < 2e-2


def test_fused_wavefront_vs_scan_same_config(scene):
    """With fused ON in BOTH integrators the wavefront/scan agreement is
    still bit-exact (same _bounce_step program, same fusion context) —
    the wavefront-vs-scan contract survives the fused path."""
    cfg = RenderConfig(max_depth=4, fused=True)
    a, _ = render_image(scene, CAM, 32, 32, spp=2, seed=9, cfg=cfg)
    b, _ = render_image_wavefront(
        scene, CAM, 32, 32, spp=2, seed=9, cfg=cfg, pool_size=1024
    )
    np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
