"""Path-tracing integrator over the ray wavefront.

Rebuilds the reference's `rayColor` bounce loop (`MetalCpp Path Tracer/
Renderer/Shaders/PathTracing.h:207-259`) as a wavefront: a `lax.while_loop`
over bounce index carrying (origin, direction, light, throughput, active)
arrays for every ray. All rays advance one bounce per iteration with masked
updates; the loop exits early once every ray has terminated — the collective
equivalent of the megakernel's per-thread `break`.

Estimator semantics preserved (SURVEY.md §7 "hard parts" (c)):
- miss → sky gradient, terminate (`PathTracing.h:221-231`)
- emissive hit adds `throughput * emission * power` and KEEPS bouncing
  (`PathTracing.h:245-249`)
- throughput *= albedo once per bounce (`PathTracing.h:256`)
- new origin offset 1e-4 along the normal (`PathTracing.h:253`)
- optional per-sample clamp of radiance to [0,1] (`PathTracing.h:258`) —
  biased (appendix 9) but required for golden parity; off by default.

Extensions the reference lacks but BASELINE configs 3-4 require: all BSDF
lobes wired (mirror/glossy/dielectric), Russian-roulette termination, and
next-event estimation (explicit light sampling) for emissive spheres.
"""

from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp

from metalpathtracer_tpu.core import rng, vecmath as vm
from metalpathtracer_tpu.render import bsdf
from metalpathtracer_tpu.render.intersect import (
    T_MIN,
    closest_hit_bruteforce,
    surface_interaction_packed,
)
from metalpathtracer_tpu.render.traverse import closest_hit_bvh
from metalpathtracer_tpu.scene.types import PRIM_SPHERE


@dataclasses.dataclass(frozen=True)
class RenderConfig:
    """Static integrator configuration (hashable; becomes part of the jit
    cache key). The reference hardcodes all of these
    (`PathTracing.h:216`, `Scene.h:223`, SURVEY.md §5 config note)."""

    max_depth: int = 32  # reference maxRayDepth (PathTracing.h:216)
    # intersector: "auto" picks the MXU matmul kernel for scenes that fit
    # VMEM and BVH traversal beyond; "bvh" / "mm" / "brute" force a path.
    intersector: str = "auto"
    brute_chunk: int = 128
    clamp_radiance: bool = False  # reference's per-sample [0,1] clamp
    rr_start: int = 0  # 0 = off; else first bounce eligible for roulette
    nee: bool = False  # next-event estimation for emissive spheres


DEFAULT_CONFIG = RenderConfig()
REFERENCE_CONFIG = RenderConfig(max_depth=32, clamp_radiance=True)


MM_MAX_PRIMS = 8192  # beyond this the brute-force matmul loses to traversal


def _trace_rays(scene, o, d, cfg, active=None):
    kind = cfg.intersector
    if kind == "auto":
        kind = "mm" if scene.mm_wa.shape[1] <= MM_MAX_PRIMS else "bvh"
    if kind == "mm":
        from metalpathtracer_tpu.render.pallas.intersect_mm import closest_hit_mm

        return closest_hit_mm(scene, o, d, T_MIN, active=active)
    if kind == "bvh":
        return closest_hit_bvh(scene, o, d, T_MIN)
    if kind == "brute":
        return closest_hit_bruteforce(scene, o, d, T_MIN, chunk=cfg.brute_chunk)
    raise ValueError(f"unknown intersector {cfg.intersector!r}")


def _sample_light_sphere(scene, point, u1, u2):
    """Pick the scene's brightest emissive sphere and sample a direction
    toward it (uniform over the subtended cone). Returns
    (dir, dist, radiance, pdf_valid). Static single-light NEE — enough for
    the BASELINE config-4 scene family (one emissive sphere light)."""
    power = jnp.where(
        (scene.prim_type == PRIM_SPHERE) & (scene.emission_power > 0.0),
        scene.emission_power * jnp.max(scene.emission_color, axis=-1),
        0.0,
    )
    light = jnp.argmax(power)
    center = scene.p0[light]
    radius = scene.p1[light, 0]
    emission = scene.emission_color[light] * scene.emission_power[light]

    to_c = center - point
    dist2 = vm.length_squared(to_c)
    dist = jnp.sqrt(dist2)
    w = to_c / dist[..., None]
    # cone sampling (uniform direction within the cone subtending the sphere)
    sin_max2 = jnp.clip(radius * radius / dist2, 0.0, 1.0)
    cos_max = jnp.sqrt(1.0 - sin_max2)
    cos_t = 1.0 - u1 * (1.0 - cos_max)
    sin_t = jnp.sqrt(jnp.maximum(0.0, 1.0 - cos_t * cos_t))
    phi = 2.0 * jnp.pi * u2
    # orthonormal basis around w
    a = vm.where3(jnp.abs(w[..., 0]) > 0.9, jnp.array([0.0, 1.0, 0.0]), jnp.array([1.0, 0.0, 0.0]))
    t1 = vm.normalize(vm.cross(a, w))
    t2 = vm.cross(w, t1)
    dir_out = (
        t1 * (sin_t * jnp.cos(phi))[..., None]
        + t2 * (sin_t * jnp.sin(phi))[..., None]
        + w * cos_t[..., None]
    )
    # pdf over solid angle = 1 / (2*pi*(1-cos_max)); contribution weight:
    inv_pdf = 2.0 * jnp.pi * (1.0 - cos_max)
    valid = power[light] > 0.0
    return dir_out, dist, emission, inv_pdf, light, valid


def trace(scene, o, d, pixel_id, sample_id, seed, cfg: RenderConfig = DEFAULT_CONFIG):
    """Trace one path per lane to completion.

    Args:
      scene: DeviceScene. o, d: float32 (N, 3) primary rays (d unit).
      pixel_id: uint32 (N,) positional RNG stream ids.
      sample_id: scalar uint32 — which spp sample this is.
      seed: scalar uint32 global seed.

    Returns (radiance (N, 3), rays_traced ()): total emitted+sky light
    gathered along each path, and the number of rays actually traced
    (for Mrays/sec accounting, SURVEY.md §5 tracing note).
    """
    n = o.shape[0]
    light = jnp.zeros((n, 3), jnp.float32)
    throughput = jnp.ones((n, 3), jnp.float32)
    active = jnp.ones((n,), bool)
    # prev_spec: last bounce was specular (mirror/dielectric) — such paths
    # must still collect BSDF-found emission under NEE (no light-sample
    # covers a delta lobe).
    prev_spec = jnp.ones((n,), bool)  # bounce 0 counts as "specular" (camera)
    rays_traced = jnp.zeros((), jnp.int64 if jax.config.jax_enable_x64 else jnp.int32)

    def cond(state):
        bounce, _, _, _, _, active, _, _ = state
        return (bounce < cfg.max_depth) & jnp.any(active)

    def body(state):
        bounce, o, d, light, throughput, active, prev_spec, rays_traced = state
        rays_traced = rays_traced + jnp.sum(active, dtype=rays_traced.dtype)

        t, idx = _trace_rays(scene, o, d, cfg, active=active)
        miss = idx < 0

        # --- sky on miss (PathTracing.h:225-231) ---
        sky = bsdf.sky_color(d)
        light = light + jnp.where((active & miss)[:, None], throughput * sky, 0.0)

        hit_live = active & ~miss
        midx = jnp.maximum(idx, 0)
        # two packed gathers per bounce (geometry + material) instead of ~10
        geom_row = scene.geom_table[midx]
        mat_row = scene.mat_table[midx]
        point, normal, front_face = surface_interaction_packed(geom_row, o, d, t)
        albedo = mat_row[:, 0:3]
        mat_type = mat_row[:, 3]
        emission = mat_row[:, 4:7]
        power = mat_row[:, 7]
        fuzz = mat_row[:, 8]

        # --- emissive accumulation (PathTracing.h:245-249) ---
        emissive = bsdf.is_emissive(mat_type, power)
        if cfg.nee:
            # with NEE, BSDF-found emission only counts on camera hits or
            # after a specular bounce; diffuse bounces get their light from
            # the explicit light sample instead (no double counting).
            count_emission = hit_live & emissive & prev_spec
        else:
            count_emission = hit_live & emissive
        light = light + jnp.where(
            count_emission[:, None], throughput * emission * power[:, None], 0.0
        )

        # --- next-event estimation (extension; BASELINE config 4) ---
        if cfg.nee:
            ul1, ul2 = rng.uniform2(seed, pixel_id, sample_id, bounce, rng.PURPOSE_LIGHT)
            ldir, ldist, lrad, inv_pdf, lidx, lvalid = _sample_light_sphere(
                scene, point, ul1, ul2
            )
            is_diffuse = (mat_type == 0.0) | (mat_type == 2.0)
            cos_s = vm.dot(normal, ldir)
            cand = hit_live & is_diffuse & (cos_s > 0.0) & lvalid & ~emissive
            s_o = point + (1e-3) * normal
            st, sidx = _trace_rays(scene, s_o, ldir, cfg)
            rays_traced = rays_traced + jnp.sum(cand, dtype=rays_traced.dtype)
            lit = cand & (sidx == lidx)
            # Lambertian BRDF albedo/pi, cosine term, cone inv-pdf
            contrib = (
                throughput
                * albedo
                * lrad
                * (cos_s * inv_pdf / jnp.pi)[..., None]
            )
            light = light + jnp.where(lit[:, None], contrib, 0.0)

        # --- scatter (PathTracing.h:251-256, Scatter.h wired) ---
        unit_vec = rng.random_unit_vector(seed, pixel_id, sample_id, bounce)
        u_fres = rng.uniform1(seed, pixel_id, sample_id, bounce, rng.PURPOSE_FRESNEL)
        d_out, offset_sign = bsdf.sample_bsdf(
            d, normal, front_face, mat_type, fuzz, unit_vec, u_fres
        )
        new_o = point + (1e-4 * offset_sign)[..., None] * normal
        new_tp = throughput * albedo

        # --- Russian roulette (extension; unbiased early termination) ---
        if cfg.rr_start > 0:
            u_rr = rng.uniform1(seed, pixel_id, sample_id, bounce, rng.PURPOSE_RR)
            p = jnp.clip(jnp.max(new_tp, axis=-1), 0.05, 1.0)
            do_rr = bounce >= cfg.rr_start  # scalar: bounce is the loop counter
            scale = jnp.where(do_rr, 1.0 / p, 1.0)
            new_tp = new_tp * scale[..., None]
            survive = (~do_rr) | (u_rr < p)
            hit_live = hit_live & survive

        is_specular = (mat_type < 0.0) | ((mat_type > 0.0) & (mat_type != 2.0))
        o = vm.where3(hit_live, new_o, o)
        d = vm.where3(hit_live, d_out, d)
        throughput = jnp.where(hit_live[:, None], new_tp, throughput)
        prev_spec = jnp.where(hit_live, is_specular, prev_spec)
        active = hit_live
        return bounce + 1, o, d, light, throughput, active, prev_spec, rays_traced

    _, _, _, light, _, _, _, rays_traced = jax.lax.while_loop(
        cond,
        body,
        (jnp.int32(0), o, d, light, throughput, active, prev_spec, rays_traced),
    )
    if cfg.clamp_radiance:
        light = jnp.clip(light, 0.0, 1.0)
    return light, rays_traced
