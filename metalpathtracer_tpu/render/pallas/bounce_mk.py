"""Fused bounce megakernel: one Pallas kernel advances the wavefront a bounce.

The XLA wavefront loop body spends most of its time on per-op launch
overhead and HBM round-trips between ~80 small ops (docs/PERFORMANCE.md).
This kernel fuses the whole bounce — triangle tile intersection, exact
sphere pass, winner data fetch, threefry RNG, all BSDF lobes, sky/emission
accumulation, Russian roulette — into a single VMEM-resident program per
ray block. Only lane regeneration (a global cumsum over terminated lanes)
stays in XLA.

Design notes (all measured on v5e, see docs/PERFORMANCE.md):
- No branches: tile work is skipped via prefetched per-block tile lists and
  loop trip counts.
- No per-lane gathers: the winning primitive's [v0,e1,e2,n | material] row
  is fetched with a one-hot (B,TILE)@(TILE,32) matmul accumulated over the
  same culled tile list; spheres (few) loop over SMEM scalars.
- Per-ray state rides in two matrices: float state (B,16) = [o,d,light,tp,
  pad] and int state (B,8) = [pixel,sample,bounce,active,prev_spec,...] so
  the loop body reads/writes two arrays instead of ten.
- RNG is the same counter-based threefry as `core/rng.py` (vector uint32
  ops compile fine under Mosaic), keyed on (seed, pixel, sample, bounce,
  purpose) — so the megakernel and the XLA integrator draw IDENTICAL
  random numbers and agree up to fp reassociation in the BSDF math.

Reference semantics preserved exactly as in `integrator._bounce_step`
(`MetalCpp Path Tracer/Renderer/Shaders/PathTracing.h:207-259`, Scatter.h).
NEE is not fused (cfg.nee falls back to the XLA bounce).
"""

from __future__ import annotations

import functools
import os

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from metalpathtracer_tpu.render.pallas.intersect_mm import (
    BLOCK_R,
    NUM_FEATURES,
    TILE_P,
    TRI_PARALLEL_EPS,
    _det_matmul,
)

T_MIN = 1e-4
_INF = float("inf")
# Round 1 capped blocks at 256 lanes to fit Mosaic's default 16 MB scoped
# VMEM; with the cap raised toward the chip's physical 128 MiB
# (VMEM_LIMIT_BYTES below) the fused program affords MXU-width blocks, and
# (256,)-vector issue overhead stops dominating the ~200-op shading tail.
MK_BLOCK_R = int(os.environ.get("MPT_MK_BLOCK_R", "1024"))
MK_VMEM_LIMIT_BYTES = (
    int(os.environ.get("MPT_MK_VMEM_LIMIT_MB", "100")) * (1 << 20)
)
# ablation switch for kernel-cost attribution (benchmarks only):
#   full  = production kernel
#   isect = stop after the intersection phase (t/col into the outputs)
#   fetch = intersection + winner-row fetch, skip shading/RNG
MK_ABLATE = os.environ.get("MPT_MK_ABLATE", "full")

# float-state columns
F_OX, F_OY, F_OZ = 0, 1, 2
F_DX, F_DY, F_DZ = 3, 4, 5
F_LR, F_LG, F_LB = 6, 7, 8
F_TR, F_TG, F_TB = 9, 10, 11
STATE_F_COLS = 16
# int-state columns
I_PIXEL, I_SAMPLE, I_BOUNCE, I_ACTIVE, I_PREVSPEC = 0, 1, 2, 3, 4
STATE_I_COLS = 8

# winner-table columns (per triangle column / per sphere row)
# [v0(3), e1(3), e2(3), n(3), albedo(3), mat_type, emission(3), power, fuzz,
#  pad...] = 24 used, padded to 32
TBL_COLS = 32


def build_shade_tables(w, packed):
    """Per-kernel-column shading tables built next to `build_weights`'s
    output `w` (uses its Morton order via tri_ids). Returns dict with
    tri_table (Tpad, 32) f32 and sph_scalars (Spad, 8) f32
    [cx,cy,cz,r, mat_bank_id, 0,0,0] — sphere materials are fetched by a
    tiny (B,S)@(S,32) one-hot, table sph_table (Spad, 32)."""
    tri_ids = w["tri_ids"]
    tpad = tri_ids.shape[0]
    tbl = np.zeros((tpad, TBL_COLS), np.float32)
    real = tri_ids >= 0
    sel = tri_ids[real]
    v0 = packed.p0[sel]
    e1 = packed.p1[sel] - v0
    e2 = packed.p2[sel] - v0
    n = np.cross(e1, e2)
    tbl[real, 0:3] = v0
    tbl[real, 3:6] = e1
    tbl[real, 6:9] = e2
    tbl[real, 9:12] = n
    tbl[real, 12:15] = packed.albedo[sel]
    tbl[real, 15] = packed.material_type[sel]
    tbl[real, 16:19] = packed.emission_color[sel]
    tbl[real, 19] = packed.emission_power[sel]
    tbl[real, 20] = packed.fuzz[sel]

    sph_ids = w["sph_ids"]
    spad = sph_ids.shape[0]
    stbl = np.zeros((spad, TBL_COLS), np.float32)
    sreal = sph_ids >= 0
    ssel = sph_ids[sreal]
    stbl[sreal, 0:3] = packed.p0[ssel]
    stbl[sreal, 3] = packed.p1[ssel, 0]  # radius
    stbl[sreal, 12:15] = packed.albedo[ssel]
    stbl[sreal, 15] = packed.material_type[ssel]
    stbl[sreal, 16:19] = packed.emission_color[ssel]
    stbl[sreal, 19] = packed.emission_power[ssel]
    stbl[sreal, 20] = packed.fuzz[ssel]
    return dict(tri_table=tbl, sph_table=stbl)


# ---------------------------------------------------------------------------
# in-kernel threefry (identical math to core/rng.py, on (B,) uint32 vectors)
# ---------------------------------------------------------------------------

_ROT = (13, 15, 26, 6, 17, 29, 16, 24)


def _rotl(x, r):
    return (x << jnp.uint32(r)) | (x >> jnp.uint32(32 - r))


def _threefry2x32(k0, k1, x0, x1):
    ks2 = jnp.uint32(0x1BD11BDA) ^ k0 ^ k1
    ks = (k0, k1, ks2)
    x0 = x0 + ks[0]
    x1 = x1 + ks[1]
    for block in range(5):
        rots = _ROT[0:4] if block % 2 == 0 else _ROT[4:8]
        for r in rots:
            x0 = x0 + x1
            x1 = _rotl(x1, r)
            x1 = x0 ^ x1
        x0 = x0 + ks[(block + 1) % 3]
        x1 = x1 + ks[(block + 2) % 3] + jnp.uint32(block + 1)
    return x0, x1


def _to_unit(bits):
    # Mosaic has no uint32->f32 cast; the top-24-bit value fits int32 exactly
    return (bits >> jnp.uint32(8)).astype(jnp.int32).astype(jnp.float32) * (
        2.0**-24
    )


def _uniform2(seed, pixel, sample, bounce, purpose: int):
    c1 = (bounce.astype(jnp.uint32) << jnp.uint32(8)) | jnp.uint32(purpose)
    b0, b1 = _threefry2x32(seed, pixel, sample, c1)
    return _to_unit(b0), _to_unit(b1)

# rng purposes (must match core/rng.py)
_P_LOBE, _P_FRESNEL, _P_RR = 1, 2, 3


def _bounce_kernel(lists_ref, counts_ref, params_ref, sph_sc_ref,
                   sf_ref, si_ref, w_ref, tri_tbl_ref, sph_tbl_ref,
                   sf_out, si_out,
                   *, n_sph: int, rr_start: int, t_min: float,
                   adaptive_offset: bool):
    cell = pl.program_id(0)
    sf = sf_ref[:]  # (B, 16)
    si = si_ref[:]  # (B, 8)
    b = sf.shape[0]

    ox, oy, oz = sf[:, F_OX], sf[:, F_OY], sf[:, F_OZ]
    dx, dy, dz = sf[:, F_DX], sf[:, F_DY], sf[:, F_DZ]
    # ray features for the determinant matmul, built in-kernel (a separate
    # (B,12) input cost ~50KB of double-buffered VMEM — exactly the margin
    # that kept 512-lane blocks from fitting)
    mx = oy * dz - oz * dy
    my = oz * dx - ox * dz
    mz = ox * dy - oy * dx
    zero = jnp.zeros((b,), jnp.float32)
    x = jnp.stack(
        [dx, dy, dz, mx, my, mz, ox, oy, oz,
         ox * dx + oy * dy + oz * dz,
         ox * ox + oy * oy + oz * oz,
         jnp.ones((b,), jnp.float32),
         zero, zero, zero, zero],  # NUM_FEATURES sublane padding
        axis=1,
    )
    lr, lg, lb = sf[:, F_LR], sf[:, F_LG], sf[:, F_LB]
    tr, tg, tb = sf[:, F_TR], sf[:, F_TG], sf[:, F_TB]
    pixel = si[:, I_PIXEL].astype(jnp.uint32)
    sample = si[:, I_SAMPLE].astype(jnp.uint32)
    bounce = si[:, I_BOUNCE]
    active = si[:, I_ACTIVE] > 0
    prev_spec = si[:, I_PREVSPEC] > 0
    seed = params_ref[0]

    col = jax.lax.broadcasted_iota(jnp.int32, (b, TILE_P), 1)

    # ---------------- triangle tiles (culled list, branch-free) -----------
    def tile_body(j, carry):
        best_t, best_col = carry
        i = lists_ref[cell, j]
        s4 = pl.ds(i * 4 * TILE_P, 4 * TILE_P)
        block = _det_matmul(x, w_ref[:, s4])
        sa = block[:, 0:TILE_P]
        su = block[:, TILE_P : 2 * TILE_P]
        sv = block[:, 2 * TILE_P : 3 * TILE_P]
        st = block[:, 3 * TILE_P : 4 * TILE_P]
        par = jnp.abs(sa) <= TRI_PARALLEL_EPS
        f = 1.0 / jnp.where(par, 1.0, sa)
        u = f * su
        v = f * sv
        tt = f * st
        ok = ((~par) & (u >= 0.0) & (u <= 1.0) & (v >= 0.0)
              & (u + v <= 1.0) & (tt > t_min))
        t_all = jnp.where(ok, tt, _INF)
        t_best_tile = jnp.min(t_all, axis=1, keepdims=True)
        idx_in_tile = jnp.min(
            jnp.where(t_all == t_best_tile, col, jnp.int32(0x7FFFFFFF)),
            axis=1, keepdims=True,
        )
        t_best_tile = t_best_tile[:, 0]
        idx_tile = i * TILE_P + idx_in_tile[:, 0]
        better = t_best_tile < best_t
        return (jnp.where(better, t_best_tile, best_t),
                jnp.where(better, idx_tile, best_col))

    count = counts_ref[cell]
    t_tri, best_col = jax.lax.fori_loop(
        0, count, tile_body,
        (jnp.full((b,), _INF), jnp.full((b,), -1, jnp.int32)),
    )

    # ---------------- spheres: exact quadratic over SMEM scalars ----------
    def sph_body(s, carry):
        best_t, best_slot = carry
        cx, cy, cz = sph_sc_ref[s, 0], sph_sc_ref[s, 1], sph_sc_ref[s, 2]
        r = sph_sc_ref[s, 3]
        ocx, ocy, ocz = ox - cx, oy - cy, oz - cz
        bq = ocx * dx + ocy * dy + ocz * dz
        cq = ocx * ocx + ocy * ocy + ocz * ocz - r * r
        disc = bq * bq - cq  # |d| == 1
        sq = jnp.sqrt(jnp.maximum(disc, 0.0))
        tn = -bq - sq
        tf = -bq + sq
        valid = disc > 0.0
        # far root only past a radius-scaled floor (see intersect.ray_sphere)
        far_floor = jnp.maximum(t_min, 3.0e-5 * r)
        ts = jnp.where(valid & (tn > t_min), tn,
                       jnp.where(valid & (tf > far_floor), tf, _INF))
        better = ts < best_t
        return (jnp.where(better, ts, best_t),
                jnp.where(better, s, best_slot))

    t_sph, best_slot = jax.lax.fori_loop(
        0, n_sph, sph_body,
        (jnp.full((b,), _INF), jnp.full((b,), -1, jnp.int32)),
    )

    if MK_ABLATE == "isect":
        sf_out[:, :] = sf
        si_out[:, :] = si
        sf_out[:, 12] = jnp.minimum(t_tri, t_sph)
        si_out[:, 5] = best_col
        return

    # ---------------- winner rows via one-hot matmuls ----------------------
    # Fetch the TRIANGLE candidate row first, refine its t exactly, and only
    # then decide tri-vs-sphere: deciding on the approximate matmul t and
    # fetching a single merged row loses the sphere hit whenever the exact
    # recompute rejects the triangle (light leaks through geometry).
    tri_cand = jnp.isfinite(t_tri)

    def fetch_body(j, acc):
        i = lists_ref[cell, j]
        local = best_col - i * TILE_P
        oh = ((col == local[:, None]) & tri_cand[:, None]).astype(jnp.float32)
        rows = tri_tbl_ref[pl.ds(i * TILE_P, TILE_P), :]
        return acc + jnp.dot(oh, rows, preferred_element_type=jnp.float32,
                             precision=jax.lax.Precision.HIGHEST)

    acc_tri = jax.lax.fori_loop(
        0, count, fetch_body, jnp.zeros((b, TBL_COLS), jnp.float32)
    )

    # ---------------- exact triangle refine -------------------------------
    v0x, v0y, v0z = acc_tri[:, 0], acc_tri[:, 1], acc_tri[:, 2]
    e1x, e1y, e1z = acc_tri[:, 3], acc_tri[:, 4], acc_tri[:, 5]
    e2x, e2y, e2z = acc_tri[:, 6], acc_tri[:, 7], acc_tri[:, 8]
    # h = d x e2; a = e1.h
    hx = dy * e2z - dz * e2y
    hy = dz * e2x - dx * e2z
    hz = dx * e2y - dy * e2x
    a = e1x * hx + e1y * hy + e1z * hz
    par = jnp.abs(a) <= TRI_PARALLEL_EPS
    f = 1.0 / jnp.where(par, 1.0, a)
    sx, sy, sz = ox - v0x, oy - v0y, oz - v0z
    u = f * (sx * hx + sy * hy + sz * hz)
    qx = sy * e1z - sz * e1y
    qy = sz * e1x - sx * e1z
    qz = sx * e1y - sy * e1x
    v = f * (dx * qx + dy * qy + dz * qz)
    t_ex = f * (e2x * qx + e2y * qy + e2z * qz)
    ok_ex = (tri_cand & (~par) & (u >= 0.0) & (u <= 1.0) & (v >= 0.0)
             & (u + v <= 1.0) & (t_ex > t_min))
    # on refine rejection keep the approximate winner's t instead of a miss
    # (t_tri is already _INF for non-candidates) — see intersect_mm.py
    t_tri_exact = jnp.where(ok_ex, t_ex, t_tri)

    tri_wins = t_tri_exact < t_sph

    # sphere winner row (tiny table), then merge
    s_pad = sph_tbl_ref.shape[0]
    scol = jax.lax.broadcasted_iota(jnp.int32, (b, s_pad), 1)
    soh = ((scol == best_slot[:, None]) & (~tri_wins)[:, None]).astype(jnp.float32)
    acc_sph = jnp.dot(soh, sph_tbl_ref[:, :],
                      preferred_element_type=jnp.float32,
                      precision=jax.lax.Precision.HIGHEST)
    acc = jnp.where(tri_wins[:, None], acc_tri, acc_sph)

    if MK_ABLATE == "fetch":
        sf_out[:, :] = sf
        si_out[:, :] = si
        sf_out[:, 12] = jnp.where(tri_wins, t_tri_exact, t_sph)
        sf_out[:, 13] = acc[:, 12]
        return

    t = jnp.where(tri_wins, t_tri_exact, t_sph)
    hit = active & jnp.isfinite(t)
    miss = active & ~jnp.isfinite(t)
    tsafe = jnp.where(jnp.isfinite(t), t, 0.0)

    px = ox + tsafe * dx
    py = oy + tsafe * dy
    pz = oz + tsafe * dz

    # normal: tri from table n; sphere (point - center; center sits in 0:3)
    nx = jnp.where(tri_wins, acc[:, 9], px - acc[:, 0])
    ny = jnp.where(tri_wins, acc[:, 10], py - acc[:, 1])
    nz = jnp.where(tri_wins, acc[:, 11], pz - acc[:, 2])
    nlen2 = nx * nx + ny * ny + nz * nz
    ninv = jnp.where(nlen2 > 1e-20, jax.lax.rsqrt(nlen2), 0.0)
    nx, ny, nz = nx * ninv, ny * ninv, nz * ninv
    ndd = nx * dx + ny * dy + nz * dz
    front = ndd < 0.0
    flip = jnp.where(front, 1.0, -1.0)
    nx, ny, nz = nx * flip, ny * flip, nz * flip

    # ---------------- sky on miss (PathTracing.h:225-231) -----------------
    tsky = 0.5 * (dy + 1.0)
    skr = 1.0 + tsky * (0.6 - 1.0)
    skg = 1.0 + tsky * (0.7 - 1.0)
    skb = 1.0  # mix(1, 1.0, t) for blue
    mf = miss.astype(jnp.float32)
    lr = lr + mf * tr * skr
    lg = lg + mf * tg * skg
    lb = lb + mf * tb * skb

    # ---------------- emissive accumulation -------------------------------
    alr, alg, alb = acc[:, 12], acc[:, 13], acc[:, 14]
    mat_type = acc[:, 15]
    emr, emg, emb = acc[:, 16], acc[:, 17], acc[:, 18]
    power = acc[:, 19]
    fuzz = acc[:, 20]
    emissive = (power > 0.0) | (mat_type == 2.0)
    ef = (hit & emissive).astype(jnp.float32) * power
    lr = lr + ef * tr * emr
    lg = lg + ef * tg * emg
    lb = lb + ef * tb * emb

    # ---------------- scatter (all lobes, Scatter.h wired) ----------------
    u1, u2 = _uniform2(seed, pixel, sample, bounce, _P_LOBE)
    zz = 2.0 * u1 - 1.0
    theta = (2.0 * jnp.pi) * u2
    rr_ = jnp.sqrt(jnp.maximum(0.0, 1.0 - zz * zz))
    uvx = rr_ * jnp.cos(theta)
    uvy = rr_ * jnp.sin(theta)
    uvz = zz
    u_fres, _ = _uniform2(seed, pixel, sample, bounce, _P_FRESNEL)

    is_dielectric = (mat_type > 0.0) & (mat_type != 2.0)
    is_mirror = mat_type < 0.0

    # lambertian: normalize(n + uv)
    lamx, lamy, lamz = nx + uvx, ny + uvy, nz + uvz
    ll2 = lamx * lamx + lamy * lamy + lamz * lamz
    linv = jnp.where(ll2 > 1e-12, jax.lax.rsqrt(ll2), 0.0)
    deg = ll2 <= 1e-12
    lamx = jnp.where(deg, nx, lamx * linv)
    lamy = jnp.where(deg, ny, lamy * linv)
    lamz = jnp.where(deg, nz, lamz * linv)

    # mirror (+fuzz)
    rx = dx - 2.0 * ndd * flip * nx  # note: ndd computed pre-flip; d.n_flipped = ndd*flip
    ry = dy - 2.0 * ndd * flip * ny
    rz = dz - 2.0 * ndd * flip * nz
    mx, my, mz = rx + fuzz * uvx, ry + fuzz * uvy, rz + fuzz * uvz
    ml2 = mx * mx + my * my + mz * mz
    minv = jnp.where(ml2 > 1e-20, jax.lax.rsqrt(ml2), 0.0)
    mx, my, mz = mx * minv, my * minv, mz * minv
    bad_fuzz = (mx * nx + my * ny + mz * nz) <= 0.0
    rl2 = rx * rx + ry * ry + rz * rz
    rinv = jnp.where(rl2 > 1e-20, jax.lax.rsqrt(rl2), 0.0)
    mx = jnp.where(bad_fuzz, rx * rinv, mx)
    my = jnp.where(bad_fuzz, ry * rinv, my)
    mz = jnp.where(bad_fuzz, rz * rinv, mz)

    # dielectric (Schlick + TIR)
    ior = jnp.where(is_dielectric, mat_type, 1.5)
    eta = jnp.where(front, 1.0 / ior, ior)
    cos_t = jnp.clip(-(dx * nx + dy * ny + dz * nz), 0.0, 1.0)
    sin_t = jnp.sqrt(jnp.maximum(0.0, 1.0 - cos_t * cos_t))
    cannot = eta * sin_t > 1.0
    r0 = (1.0 - eta) / (1.0 + eta)
    r0 = r0 * r0
    refl = r0 + (1.0 - r0) * (1.0 - cos_t) ** 5
    choose_reflect = cannot | (refl > u_fres)
    # refract
    s2 = eta * eta * jnp.maximum(0.0, 1.0 - cos_t * cos_t)
    cto = jnp.sqrt(jnp.maximum(0.0, 1.0 - s2))
    fx = eta * dx + (eta * cos_t - cto) * nx
    fy = eta * dy + (eta * cos_t - cto) * ny
    fz = eta * dz + (eta * cos_t - cto) * nz
    tir = s2 > 1.0
    fx = jnp.where(tir, 0.0, fx)
    fy = jnp.where(tir, 0.0, fy)
    fz = jnp.where(tir, 0.0, fz)
    fl2 = fx * fx + fy * fy + fz * fz
    finv = jnp.where(fl2 > 1e-20, jax.lax.rsqrt(fl2), 0.0)
    dix = jnp.where(choose_reflect, rx * rinv, fx * finv)
    diy = jnp.where(choose_reflect, ry * rinv, fy * finv)
    diz = jnp.where(choose_reflect, rz * rinv, fz * finv)

    ndx = jnp.where(is_dielectric, dix, jnp.where(is_mirror, mx, lamx))
    ndy = jnp.where(is_dielectric, diy, jnp.where(is_mirror, my, lamy))
    ndz = jnp.where(is_dielectric, diz, jnp.where(is_mirror, mz, lamz))
    transmitted = is_dielectric & ~choose_reflect
    off = jnp.where(transmitted, -1e-4, 1e-4)
    if adaptive_offset:
        # scaled by coordinate magnitude (see integrator.RenderConfig)
        off = off * jnp.maximum(
            1.0, jnp.maximum(jnp.abs(px), jnp.maximum(jnp.abs(py), jnp.abs(pz)))
        )

    nox = px + off * nx
    noy = py + off * ny
    noz = pz + off * nz
    ntr, ntg, ntb = tr * alr, tg * alg, tb * alb

    # ---------------- Russian roulette ------------------------------------
    hit_live = hit
    if rr_start > 0:
        u_rr, _ = _uniform2(seed, pixel, sample, bounce, _P_RR)
        p = jnp.clip(jnp.maximum(ntr, jnp.maximum(ntg, ntb)), 0.05, 1.0)
        do_rr = bounce >= rr_start
        scale = jnp.where(do_rr, 1.0 / p, 1.0)
        ntr, ntg, ntb = ntr * scale, ntg * scale, ntb * scale
        survive = (~do_rr) | (u_rr < p)
        hit_live = hit_live & survive

    # ---------------- write state -----------------------------------------
    hf = hit_live.astype(jnp.float32)
    kf = 1.0 - hf
    is_spec = is_mirror | is_dielectric

    sf_new = jnp.stack(
        [
            nox * hf + ox * kf, noy * hf + oy * kf, noz * hf + oz * kf,
            ndx * hf + dx * kf, ndy * hf + dy * kf, ndz * hf + dz * kf,
            lr, lg, lb,
            ntr * hf + tr * kf, ntg * hf + tg * kf, ntb * hf + tb * kf,
            jnp.zeros((b,), jnp.float32), jnp.zeros((b,), jnp.float32),
            jnp.zeros((b,), jnp.float32), jnp.zeros((b,), jnp.float32),
        ],
        axis=1,
    )
    si_new = jnp.stack(
        [
            si[:, I_PIXEL], si[:, I_SAMPLE], bounce,
            hit_live.astype(jnp.int32),
            jnp.where(hit_live, is_spec.astype(jnp.int32),
                      prev_spec.astype(jnp.int32)),
            jnp.zeros((b,), jnp.int32), jnp.zeros((b,), jnp.int32),
            jnp.zeros((b,), jnp.int32),
        ],
        axis=1,
    )
    sf_out[:, :] = sf_new
    si_out[:, :] = si_new


@functools.partial(
    jax.jit,
    static_argnames=("n_sph", "rr_start", "t_min", "interpret",
                     "adaptive_offset"),
)
def bounce_megakernel(sf, si, lists, counts, params, sph_sc, w_all,
                      tri_tbl, sph_tbl, n_sph: int, rr_start: int,
                      t_min: float, interpret: bool,
                      adaptive_offset: bool = True):
    """One fused bounce over the padded wavefront. All arrays pre-padded to
    BLOCK_R multiples. Returns (sf_new, si_new)."""
    n = sf.shape[0]
    grid = (n // MK_BLOCK_R,)
    kernel = functools.partial(
        _bounce_kernel, n_sph=n_sph, rr_start=rr_start, t_min=t_min,
        adaptive_offset=adaptive_offset,
    )
    p4 = w_all.shape[1]
    # lists/counts/params/sphere scalars ride as plain SMEM inputs, NOT
    # PrefetchScalarGridSpec: the prefetch wrapper is the documented ~800x
    # pathology on this toolchain (docs/PERFORMANCE.md) — the split kernel
    # dropped it in round 1, and the megakernel's entire "3.3x slower than
    # split" mystery ablated down to exactly this wrapper (intersection
    # phase 461 us/block with it; fetch+shading only +14 us combined).
    sf_new, si_new = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec((MK_BLOCK_R, STATE_F_COLS), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((MK_BLOCK_R, STATE_I_COLS), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((NUM_FEATURES, p4), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((tri_tbl.shape[0], TBL_COLS), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((sph_tbl.shape[0], TBL_COLS), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=(
            pl.BlockSpec((MK_BLOCK_R, STATE_F_COLS), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((MK_BLOCK_R, STATE_I_COLS), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((n, STATE_F_COLS), jnp.float32),
            jax.ShapeDtypeStruct((n, STATE_I_COLS), jnp.int32),
        ),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=MK_VMEM_LIMIT_BYTES
        ),
        interpret=interpret,
    )(lists, counts, params, sph_sc, sf, si, w_all, tri_tbl, sph_tbl)
    return sf_new, si_new
