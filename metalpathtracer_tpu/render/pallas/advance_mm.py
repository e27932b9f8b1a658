"""Fused wavefront advance: intersect + refine + material + shade in ONE
Pallas kernel (the TPU answer to the reference's one-dispatch frame,
`MetalCpp Path Tracer/Renderer/Renderer.cpp:269-310` encoding
`Fragment.metal:8-72`).

The split wavefront advance runs the MXU intersect kernel plus ~80 XLA ops
(sphere merge, refine gather, material one-hot, sky/emissive/scatter math,
threefry draws) per bounce; per-HLO-op issue overhead was measured as the
dominant non-kernel cost on the flagship scene (docs/PERFORMANCE.md
"wavefront pool sizing", VERDICT r3 weak #1: ~38% of device time outside
the kernel). This module fuses the whole per-lane bounce into the
intersect kernel for the NON-NEE, VMEM-RESIDENT path, leaving in XLA only
what is genuinely global: the exact sphere pass (it feeds the cull's
occlusion bound), the cull/list build, the RNG draws (see below), and the
queue/bank/sort machinery.

Layout: everything rides TRANSPOSED — rays on lanes, components/tiles on
sublanes:

- the determinant matmul computes blockT = W^T (4T, 64) @ X^T (64, 128)
  per 128-lane subgroup: tiles on sublanes, rays on lanes;
- the per-tile argmin reduces over SUBLANES to a (1, 128) best-t row;
- the winner's refine row — normal, n.v0, prim id, AND the triangle's
  9-field material row baked per triangle (albedo, type, emission, power,
  fuzz), so no separate material fetch exists for triangles — is
  extracted by ONE one-hot matmul refine3 (48, tile_p) @ onehot
  (tile_p, 128) over a host-side (hi, mid, lo) bf16 decomposition — exact
  f32 reconstruction (v = vh + vm + vl splits a 24-bit mantissa into
  three non-overlapping 8-bit pieces; one-hot columns contribute exact
  zeros), so plane-t refinement, ids and material constants survive
  bit-exactly. Sphere-winner material rows ride SIN planes from one XLA
  row gather (~9 ns/row, measured cheaper than per-subgroup one-hot
  matmuls by ~20x at pool 2^15);
- the SHADE phase runs once per 1024-lane cell on full (8, 128) planes —
  per-128-lane rows would waste 7/8 of the VPU (the (B, 1)/(1, 128)
  single-row pathology in CLAUDE.md). Per-subgroup loop results are
  merged into planes with 8-row concats, which lower to sublane inserts.

Estimator semantics are REPLICATED VERBATIM from integrator._bounce_step /
intersect_mm.closest_hit_mm_full / bsdf.sample_bsdf (same formula order,
same epsilons). Agreement contract with the split path (pinned by
tests/test_advance_mm.py):

- per-bounce estimator state — light, throughput, alive mask, ray/shadow
  counters — is BIT-identical in CPU interpret mode;
- RNG draws are bit-identical by construction: the unit vector and the
  fresnel/RR uniforms are drawn in the XLA prologue by the exact same
  core/rng call sites as the split path and ride SIN planes into the
  kernel (in-kernel jnp.cos/sin rounds 1 ulp differently from the jitted
  XLA path — Eigen vector-path divergence — so transcendentals must not
  be re-evaluated in-kernel);
- ray GEOMETRY (o, d) agrees to ~1 ulp, not bit-exactly: XLA's mul+add →
  FMA contraction is fusion-context-dependent (measured: the same
  `o + t*d` contracts in the kernel's context but not in _bounce_step's),
  so two differently-fused programs cannot promise identical position
  rounding. Full renders therefore agree at chaos level, and ON CHIP the
  1-ulp geometry differences flip grazing/self-intersection outcomes on
  ~1% of lanes per bounce (the same class of flip any recompilation of
  the split path could produce); the estimator stays unbiased, and
  benchmarks/fused_check.py gates CONVERGED agreement on hardware.
"""

from __future__ import annotations

import functools
import os

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from metalpathtracer_tpu.core import rng
from metalpathtracer_tpu.render.pallas.intersect_mm import (
    BLOCK_R,
    T_MIN,
    TRI_PARALLEL_EPS,
    VMEM_LIMIT_BYTES,
    _INF,
    _cull_tile_lists,
    _prep_x,
    _sphere_hit_exact,
    ray_features,
)

# fused-path residency cap: the transposed weight slab (4*tile_p x 64 bf16
# = 512 B/tri) plus the 3-split refine slab (48 x tile_p bf16 = 96 B/tri)
# must fit VMEM next to the ray temps — ~0.61 MB per 1024 tris, so 96k
# tris ~ 58 MB under the 100 MB scoped cap. Beyond it the wavefront falls
# back to the split streaming path.
FUSED_MAX_TRIS = int(os.environ.get("MPT_FUSED_MAX_TRIS", str(96 * 1024)))

# SIN plane indices (kernel input state, one (8, 128) plane per component
# per 1024-lane block): rows c*8 + subrow of a (_NSIN*8, 128) block.
# RNG draws (unit vector, fresnel, RR uniforms) ride planes 28:33: they are
# computed in the XLA prologue with the SAME core/rng helpers as the split
# path, because jnp.cos/sin inside a Pallas kernel round differently (1 ulp,
# Eigen vector-path divergence in interpret mode; analogous transcendental
# divergence on Mosaic) — sharing the draw site is what keeps fused == split
# RNG bit-exact (the CLAUDE.md RNG/estimator contract). Sphere-winner
# material fields (mat_bank cols 0:9 gathered by sphere mat id) ride planes
# 19:28; triangle material fields are baked into refine3 instead.
_SIN = dict(
    o=0, d=3, tp=6, light=9, bounce=12, active=13,
    sph_t=14, sph_prim=15, sph_n=16,  # 16:19
    sph_mat=19,  # 19:28 — mat_bank cols 0:9 for the sphere candidate
    uv=28, u_fres=31, u_rr=32,
)
_NSIN = 33
# SOUT planes: new o, d, tp, light, alive flag (+3 spare/debug)
_NSOUT = 16

# refine-row slots (best_row rows after 3-piece reconstruction):
# 0:3 normal, 3 n.v0, 4 prim id, 5:14 material fields = mat_bank cols 0:9
# (albedo 3, type, emission 3, power, fuzz)
_R_MAT = 5


def build_fused_tables(w: dict, tile_p: int, mat_bank: np.ndarray) -> dict:
    """Host-side tables for the fused kernel (NumPy, once per scene):
      w_t: (n_tiles, 4*tile_p, 64) bf16 — the pack-mode slab transposed
        per tile, so blockT = w_t[i] @ xT needs no in-kernel relayout
      refine3: (n_tiles, 48, tile_p) bf16 — rows [Rh; Rm; Rl] of the
        (16, tile_p) per-tile refine+material matrix under the exact
        3-way bf16 mantissa split (see module docstring). Cols 0:5 come
        from tri_refine (normal, n.v0, prim); cols 5:14 bake the
        triangle's material row (mat_bank cols 0:9 via the mat-bank id in
        tri_refine col 5), so the kernel needs no material fetch for
        triangle winners.
    Only built for pack-mode scenes within FUSED_MAX_TRIS."""
    import ml_dtypes

    bf = ml_dtypes.bfloat16
    w_all = w["w_all"]  # (n_tiles, 64, 4*tile_p) bf16 (pack mode)
    w_t = np.ascontiguousarray(np.transpose(w_all, (0, 2, 1)))

    refine = w["tri_refine"]  # (T, 8) f32 — col 5 (mat-bank id) already
    #                           filled by upload_scene before this call
    n_tiles = w_all.shape[0]
    r16 = np.zeros((n_tiles * tile_p, 16), np.float32)
    t = refine.shape[0]
    r16[:t, :5] = refine[:, :5]
    mat_ids = refine[:, 5].astype(np.int64)
    r16[:t, _R_MAT : _R_MAT + 9] = mat_bank[mat_ids, 0:9]
    rt = r16.reshape(n_tiles, tile_p, 16).transpose(0, 2, 1)  # (nt, 16, tp)
    rh = rt.astype(bf)
    rm = (rt - rh.astype(np.float32)).astype(bf)
    rl = (rt - rh.astype(np.float32) - rm.astype(np.float32)).astype(bf)
    refine3 = np.concatenate([rh, rm, rl], axis=1)  # (nt, 48, tp)
    return dict(w_t=w_t, refine3=np.ascontiguousarray(refine3))


def _normalize3(x, y, z, eps=1e-20):
    n2 = x * x + y * y + z * z
    inv = jnp.where(n2 > eps, 1.0 / jnp.sqrt(n2), 0.0)
    return x * inv, y * inv, z * inv, n2


def _mm_advance_kernel(
    lists_ref, counts_ref, smin_ref, sin_ref, xp_ref, lb_ref,
    w_ref, ref3_ref, sout_ref, hit_ref, *,
    t_min: float, tile_p: int, u_res: int, rr_start: int,
    adaptive_offset: bool, sky_h, sky_d,
):
    """One fused bounce for BLOCK_R rays. Phase 1 loops 128-lane subgroups
    through their culled tile lists (transposed det matmuls + one-hot
    refine extraction); phase 2 shades the whole 1024-lane cell at once
    on (8, 128) planes (tri/sphere merge, plane-t refinement, sky,
    emissive, scatter, RR)."""
    cell = pl.program_id(0)
    sub = BLOCK_R // 128
    col_s = jax.lax.broadcasted_iota(jnp.int32, (tile_p, 128), 0)

    # ---- phase 1: per-subgroup intersect ----
    # Results land in the hit_ref VMEM scratch in PLANE layout (row
    # r*8 + sg), so phase 2 reads aligned (8, 128) slices. Single-row
    # stores are cheap; jnp.concatenate of per-subgroup (1, 128) rows
    # into (8, 128) planes was measured 30x slower on chip (pathological
    # Mosaic relayout).
    for sg in range(sub):
        xs = xp_ref[:, sg * 128 : (sg + 1) * 128]  # (64, 128) bf16
        g = cell * sub + sg
        lbr = lb_ref[sg : sg + 1, :]  # (1, 128)
        cnt = counts_ref[g]

        def cond(carry, g=g, cnt=cnt):
            j, thr = carry[0], carry[1]
            return (j < cnt) & (smin_ref[g, j] <= thr)

        def tile_body(carry, xs=xs, g=g, lbr=lbr, cnt=cnt):
            j, _, best_t, best_pos, best_col = carry
            for k in range(u_res):  # consecutive, clamped (dups idempotent)
                jj = jnp.minimum(j + k, cnt - 1) if u_res > 1 else j
                i = lists_ref[g, jj]
                blockT = jnp.dot(
                    w_ref[i], xs, preferred_element_type=jnp.float32
                )  # (4*tile_p, 128)
                sa = blockT[0:tile_p, :]
                su = blockT[tile_p : 2 * tile_p, :]
                sv = blockT[2 * tile_p : 3 * tile_p, :]
                st = blockT[3 * tile_p : 4 * tile_p, :]
                s = jnp.where(sa < 0.0, -1.0, 1.0)
                sas = sa * s
                sus = su * s
                svs = sv * s
                sts = st * s
                ok = (
                    (sas > TRI_PARALLEL_EPS) & (sus >= 0.0) & (svs >= 0.0)
                    & (sus + svs <= sas) & (sts > t_min * sas)
                )
                t_all = jnp.where(
                    ok, sts * pl.reciprocal(sas, approx=True), _INF
                )
                tbt = jnp.min(t_all, axis=0, keepdims=True)  # (1, 128)
                idxs = jnp.min(
                    jnp.where(t_all == tbt, col_s, jnp.int32(0x7FFFFFFF)),
                    axis=0, keepdims=True,
                )
                better = tbt < best_t  # (1, 128)
                # LAZY refine: the hot loop carries only the winner's LIST
                # POSITION and column (3 cheap (1,128) selects); the
                # one-hot refine-row extraction runs in a second, short
                # loop below that walks only to the maximum winner
                # position — for entry-ordered lists winners concentrate
                # at the first positions, so the expensive per-tile
                # extraction (one-hot build + (48,tp) matmul + wide
                # select) drops out of almost every hot-loop trip
                best_t = jnp.where(better, tbt, best_t)
                best_pos = jnp.where(better, jj, best_pos)
                best_col = jnp.where(better, idxs, best_col)
            thr = jnp.max(jnp.minimum(best_t, lbr))
            return (j + u_res, thr, best_t, best_pos, best_col)

        init = (
            jnp.int32(0), jnp.max(lbr),
            jnp.full((1, 128), _INF),
            jnp.full((1, 128), -1, jnp.int32),
            jnp.zeros((1, 128), jnp.int32),
        )
        _, _, best_t, best_pos, best_col = jax.lax.while_loop(
            cond, tile_body, init
        )

        # ---- refine extraction: walk positions [0, max winner pos] ----
        jend = jnp.max(best_pos) + 1  # 0 when no lane hit

        # extraction walks with its OWN (short) unroll: winners of entry-
        # ordered lists sit at positions 0-2, and a u_res(=6)-wide chunk
        # would pay 6 one-hot builds + (48,tp) matmuls when 1-2 suffice —
        # the chunk size only trades loop-issue overhead (~0.25us/iter)
        # against wasted clamped positions, and at jend~2 the waste wins.
        u_ext = 2

        def ext_cond(carry):
            return carry[0] < jend

        def ext_body(carry, g=g, cnt=cnt):
            j, r48 = carry
            for k in range(u_ext):
                pos = j + k
                jj = jnp.minimum(pos, cnt - 1)  # clamped LIST read only
                i = lists_ref[g, jj]
                # gate on the TRUE position, so clamped duplicate reads
                # can never double-count a lane's winner row
                sel = jnp.where(best_pos == pos, best_col, jnp.int32(-1))
                oh = jnp.where(col_s == sel, 1.0, 0.0).astype(
                    jnp.bfloat16
                )  # (tile_p, 128); exactly one position matches per lane
                # ONE (48,tp)@(tp,128) matmul extracts all three split
                # pieces [rh; rm; rl]; each lane's column accumulates from
                # exactly one tile, so += is exact (adds exact zeros
                # elsewhere) and the piece-sum below reconstructs f32
                # bit-exactly (see build_fused_tables)
                r48 = r48 + jnp.dot(
                    ref3_ref[i], oh, preferred_element_type=jnp.float32
                )
            return (j + u_ext, r48)

        _, r48 = jax.lax.while_loop(
            ext_cond, ext_body,
            (jnp.int32(0), jnp.zeros((48, 128), jnp.float32)),
        )
        row16 = r48[0:16, :] + r48[16:32, :] + r48[32:48, :]
        for r in range(16):
            hit_ref[r * 8 + sg : r * 8 + sg + 1, :] = row16[r : r + 1, :]
        hit_ref[16 * 8 + sg : 16 * 8 + sg + 1, :] = best_t

    # ---- phase 2: whole-cell shade on (8, 128) planes ----
    best_t = hit_ref[16 * 8 : 17 * 8, :]  # (8, 128)

    def rplane(r):  # refine row r across the 8 subgroups -> (8, 128)
        return hit_ref[r * 8 : (r + 1) * 8, :]

    def plane(c):
        return sin_ref[c * 8 : (c + 1) * 8, :]  # (8, 128), aligned

    ox, oy, oz = plane(0), plane(1), plane(2)
    dx, dy, dz = plane(3), plane(4), plane(5)
    tpx, tpy, tpz = plane(6), plane(7), plane(8)
    lix, liy, liz = plane(9), plane(10), plane(11)
    bounce = plane(12).astype(jnp.int32)
    active = plane(13) > 0.5
    t_s = plane(14)
    s_prim = plane(15)
    snx, sny, snz = plane(16), plane(17), plane(18)
    uvx, uvy, uvz = plane(28), plane(29), plane(30)
    u_fres = plane(31)
    u_rr = plane(32)

    # ---- plane-t refinement (closest_hit_mm_full, bit-for-bit) ----
    nx = rplane(0)
    ny = rplane(1)
    nz = rplane(2)
    ndotv0 = rplane(3)
    denom = nx * dx + ny * dy + nz * dz
    parallel = jnp.abs(denom) <= TRI_PARALLEL_EPS
    t_plane = (ndotv0 - (nx * ox + ny * oy + nz * oz)) / jnp.where(
        parallel, 1.0, denom
    )
    t_exact = jnp.where((~parallel) & (t_plane > t_min), t_plane, _INF)
    tri_hit = best_t < _INF
    t_t = jnp.where(
        tri_hit,
        jnp.where(t_exact < _INF, t_exact, best_t),
        _INF,
    )
    tnx, tny, tnz, _ = _normalize3(nx, ny, nz)

    # ---- tri/sphere merge (same where order as closest_hit_mm_full) ----
    tri_wins = t_t < t_s
    t = jnp.where(tri_wins, t_t, t_s)
    # miss as an f32 select (Mosaic rejects selects on bool vectors):
    # the tri side misses iff no tri hit (tri_wins implies tri_hit since
    # t_t is _INF otherwise); the sphere side iff s_prim < 0
    miss_t = jnp.where(tri_hit, 0.0, 1.0)
    miss_s = jnp.where(s_prim < 0.0, 1.0, 0.0)
    miss = jnp.where(tri_wins, miss_t, miss_s) > 0.5
    nx = jnp.where(tri_wins, tnx, snx)
    ny = jnp.where(tri_wins, tny, sny)
    nz = jnp.where(tri_wins, tnz, snz)
    front = (nx * dx + ny * dy + nz * dz) < 0.0
    nx = jnp.where(front, nx, -nx)
    ny = jnp.where(front, ny, -ny)
    nz = jnp.where(front, nz, -nz)

    # ---- material row: baked tri fields vs sphere SIN planes ----
    def mfield(k):
        return jnp.where(tri_wins, rplane(_R_MAT + k), plane(19 + k))

    alx, aly, alz = mfield(0), mfield(1), mfield(2)
    mtype = mfield(3)
    emx, emy, emz = mfield(4), mfield(5), mfield(6)
    power = mfield(7)
    fuzz = mfield(8)

    # ---- sky on miss (PathTracing.h:225-231) ----
    # sky_d = f32(zenith) - f32(horizon), precomputed in f32 host-side
    # so the gradient matches vm.mix bit-for-bit (a Python-f64 z - h
    # here would differ by 1 ulp)
    skyt = 0.5 * (dy + 1.0)
    add = active & miss
    lix = lix + jnp.where(add, tpx * (sky_h[0] + sky_d[0] * skyt), 0.0)
    liy = liy + jnp.where(add, tpy * (sky_h[1] + sky_d[1] * skyt), 0.0)
    liz = liz + jnp.where(add, tpz * (sky_h[2] + sky_d[2] * skyt), 0.0)
    hit_live = active & ~miss
    px = ox + t * dx
    py = oy + t * dy
    pz = oz + t * dz

    # ---- emissive accumulation (PathTracing.h:245-249) ----
    emissive = (power > 0.0) | (mtype == 2.0)
    ce = hit_live & emissive
    lix = lix + jnp.where(ce, tpx * emx * power, 0.0)
    liy = liy + jnp.where(ce, tpy * emy * power, 0.0)
    liz = liz + jnp.where(ce, tpz * emz * power, 0.0)

    # ---- scatter (bsdf.sample_bsdf, verbatim; uv/u_fres drawn in the
    # XLA prologue — see the _SIN comment) ----
    is_diel = (mtype > 0.0) & (mtype != 2.0)
    is_mirror = mtype < 0.0

    lamx, lamy, lamz, lamn2 = _normalize3(nx + uvx, ny + uvy, nz + uvz)
    # degenerate normal+unit ~ 0 -> fall back to the normal.
    # sample_bsdf tests length_squared(normalized lam) > 1e-12: the
    # normalized vector has unit length unless the guard zeroed it, so
    # the test reduces to "did _normalize3 zero it" (n2 <= 1e-20).
    lam_ok = lamn2 > 1e-20
    lamx = jnp.where(lam_ok, lamx, nx)
    lamy = jnp.where(lam_ok, lamy, ny)
    lamz = jnp.where(lam_ok, lamz, nz)

    ddn = dx * nx + dy * ny + dz * nz
    rfx = dx - 2.0 * ddn * nx
    rfy = dy - 2.0 * ddn * ny
    rfz = dz - 2.0 * ddn * nz
    mix_, miy_, miz_, _ = _normalize3(
        rfx + fuzz * uvx, rfy + fuzz * uvy, rfz + fuzz * uvz
    )
    rnx, rny, rnz, _ = _normalize3(rfx, rfy, rfz)
    m_ok = (mix_ * nx + miy_ * ny + miz_ * nz) > 0.0
    mix_ = jnp.where(m_ok, mix_, rnx)
    miy_ = jnp.where(m_ok, miy_, rny)
    miz_ = jnp.where(m_ok, miz_, rnz)

    ior = jnp.where(is_diel, mtype, 1.5)
    eta = jnp.where(front, 1.0 / ior, ior)
    cos_t = jnp.clip(-(ddn), 0.0, 1.0)
    sin_t = jnp.sqrt(jnp.maximum(0.0, 1.0 - cos_t * cos_t))
    cannot = eta * sin_t > 1.0
    r0 = (1.0 - eta) / (1.0 + eta)
    r0 = r0 * r0
    om = 1.0 - cos_t
    om2 = om * om
    refl_p = r0 + (1.0 - r0) * (om2 * om2 * om)
    choose_refl = cannot | (refl_p > u_fres)
    # vm.refract: cos_i = -d.n; sin2_t = eta^2 (1 - cos_i^2)
    cos_i = -ddn
    sin2t = eta * eta * jnp.maximum(0.0, 1.0 - cos_i * cos_i)
    tir = sin2t > 1.0
    cos_tt = jnp.sqrt(jnp.maximum(0.0, 1.0 - sin2t))
    rcx = eta * dx + (eta * cos_i - cos_tt) * nx
    rcy = eta * dy + (eta * cos_i - cos_tt) * ny
    rcz = eta * dz + (eta * cos_i - cos_tt) * nz
    rcx = jnp.where(tir, 0.0, rcx)
    rcy = jnp.where(tir, 0.0, rcy)
    rcz = jnp.where(tir, 0.0, rcz)
    rcx, rcy, rcz, _ = _normalize3(rcx, rcy, rcz)
    dix = jnp.where(choose_refl, rnx, rcx)
    diy = jnp.where(choose_refl, rny, rcy)
    diz = jnp.where(choose_refl, rnz, rcz)

    dox = jnp.where(is_diel, dix, jnp.where(is_mirror, mix_, lamx))
    doy = jnp.where(is_diel, diy, jnp.where(is_mirror, miy_, lamy))
    doz = jnp.where(is_diel, diz, jnp.where(is_mirror, miz_, lamz))
    transmitted = is_diel & ~choose_refl
    off_sign = jnp.where(transmitted, -1.0, 1.0)

    if adaptive_offset:
        scale = jnp.maximum(
            1.0, jnp.maximum(jnp.abs(px), jnp.maximum(jnp.abs(py),
                                                      jnp.abs(pz)))
        )
        off = (1e-4) * off_sign * scale
    else:
        off = (1e-4) * off_sign
    nox = px + off * nx
    noy = py + off * ny
    noz = pz + off * nz
    ntx = tpx * alx
    nty = tpy * aly
    ntz = tpz * alz

    if rr_start > 0:
        pmax = jnp.maximum(ntx, jnp.maximum(nty, ntz))
        prob = jnp.clip(pmax, 0.05, 1.0)
        do_rr = bounce >= rr_start
        rscale = jnp.where(do_rr, 1.0 / prob, 1.0)
        ntx = ntx * rscale
        nty = nty * rscale
        ntz = ntz * rscale
        survive = (~do_rr) | (u_rr < prob)
        hit_live = hit_live & survive

    # ---- masked final state (same where order as _bounce_step) ----
    hl = hit_live
    zero = jnp.zeros((8, 128), jnp.float32)
    out = [
        jnp.where(hl, nox, ox), jnp.where(hl, noy, oy),
        jnp.where(hl, noz, oz),
        jnp.where(hl, dox, dx), jnp.where(hl, doy, dy),
        jnp.where(hl, doz, dz),
        jnp.where(hl, ntx, tpx), jnp.where(hl, nty, tpy),
        jnp.where(hl, ntz, tpz),
        lix, liy, liz,
        jnp.where(hl, 1.0, 0.0),
        zero, zero, zero,
    ]
    for c in range(_NSOUT):
        sout_ref[c * 8 : (c + 1) * 8, :] = out[c]


@functools.partial(
    jax.jit,
    static_argnames=("t_min", "rr_start", "adaptive_offset", "interpret"),
)
def _fused_advance_padded(sin, xp, lists, counts, smin, lb,
                          w_t, refine3, t_min: float, rr_start: int,
                          adaptive_offset: bool, interpret: bool):
    n = xp.shape[1]
    cells = n // BLOCK_R
    tile_p = w_t.shape[1] // 4
    u_res = 6 if tile_p <= 128 else 4  # mirrors the resident kernel's auto
    from metalpathtracer_tpu.render.bsdf import SKY_HORIZON, SKY_ZENITH

    kernel = functools.partial(
        _mm_advance_kernel,
        t_min=t_min, tile_p=tile_p, u_res=u_res, rr_start=rr_start,
        adaptive_offset=adaptive_offset,
        sky_h=tuple(float(v) for v in SKY_HORIZON),
        sky_d=tuple(
            float(z - h) for z, h in zip(SKY_ZENITH, SKY_HORIZON)
        ),  # np.float32 subtraction: exact f32 deltas (see kernel comment)
    )
    n_tiles = w_t.shape[0]
    sout = pl.pallas_call(
        kernel,
        grid=(cells,),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),  # lists (n_sub, nt)
            pl.BlockSpec(memory_space=pltpu.SMEM),  # counts (n_sub,)
            pl.BlockSpec(memory_space=pltpu.SMEM),  # smin (n_sub, nt)
            pl.BlockSpec((_NSIN * 8, 128), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),  # sin planes
            pl.BlockSpec((64, BLOCK_R), lambda i: (0, i),
                         memory_space=pltpu.VMEM),  # xp (64, N) bf16
            pl.BlockSpec((BLOCK_R // 128, 128), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),  # lane bound
            pl.BlockSpec((n_tiles, 4 * tile_p, 64), lambda i: (0, 0, 0),
                         memory_space=pltpu.VMEM),  # w_t
            pl.BlockSpec((n_tiles, 48, tile_p), lambda i: (0, 0, 0),
                         memory_space=pltpu.VMEM),  # refine3
        ],
        out_specs=pl.BlockSpec((_NSOUT * 8, 128), lambda i: (i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((cells * _NSOUT * 8, 128),
                                       jnp.float32),
        scratch_shapes=[pltpu.VMEM((17 * 8, 128), jnp.float32)],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=VMEM_LIMIT_BYTES
        ),
        interpret=interpret,
    )(lists, counts, smin, sin, xp, lb, w_t, refine3)
    return sout


def fused_eligible(scene, cfg, pool: int) -> bool:
    """Static routing decision, evaluated once per trace_wavefront call."""
    from metalpathtracer_tpu.render.pallas import intersect_mm as imm

    if not getattr(cfg, "fused", False) or cfg.nee:
        return False
    if cfg.intersector not in ("auto", "mm"):
        return False
    if scene.num_tris == 0 or scene.num_tris > FUSED_MAX_TRIS:
        return False
    if getattr(scene, "mm_w_t", None) is None or scene.mm_w_t.ndim != 3:
        return False
    if pool % BLOCK_R != 0:
        return False
    if imm.MM_PRECISION_MODE != "pack" or imm.PACKED_ARGMIN:
        return False
    n_tiles = scene.mm_w_t.shape[0]
    tile_p = scene.mm_w_t.shape[1] // 4
    cull_r = imm.CULL_R or (
        imm.CULL_R_SMALL if n_tiles * tile_p <= imm.TILE_SWITCH_TRIS
        else imm.CULL_R_LARGE
    )
    if cull_r != 128:
        return False
    # resident SMEM guard (same bound as _tri_hit_mm_padded)
    if (pool // cull_r) * n_tiles * 8 > 768 * 1024:
        return False
    if scene.num_tris > imm.VMEM_RESIDENT_MAX_TRIS:
        return False
    return True


def fused_bounce_step(scene, o, d, light, throughput, active,
                      pixel_id, sample_id, bounce, seed, cfg):
    """Drop-in replacement for integrator._bounce_step on the fused path
    (non-NEE, resident, pack mode). Returns the same tuple:
    (o, d, light, throughput, still_active, prev_pdf, rays_counted,
    shadow_counted, tile_passes)."""
    from metalpathtracer_tpu.core import vecmath as vm

    n = o.shape[0]
    cells = n // BLOCK_R
    rays_counted = jnp.sum(active, dtype=jnp.int32)

    # ---- XLA prologue: exact sphere pass + cull (needs the sphere
    # occlusion bound) ----
    t_s, i_s, c, m_s = _sphere_hit_exact(scene, o, d, T_MIN)
    sph_point = o + t_s[:, None] * d
    sph_n = vm.normalize(sph_point - c)
    # sphere-candidate material fields via the one-hot MXU matmul (same
    # formulation and precision as integrator._fetch_material, so values
    # are bit-equal to the split path). A direct row gather
    # mat_bank[m_s, 0:9] lowers to a SERIAL per-lane (1, 9) dynamic-slice
    # loop on this backend (~1.8k cycles/lane — measured 20x whole-bench
    # slowdown); never row-gather in the hot path (CLAUDE.md).
    from metalpathtracer_tpu.render.integrator import _fetch_material

    sph_mrow = _fetch_material(scene, i_s, m_s)[:, 0:9]  # (N, 9)
    x = ray_features(o, d)
    act = active.astype(jnp.float32)[:, None]
    lists, counts, smin, lane_bound = _cull_tile_lists(
        x, act, scene.mm_tile_box, float(T_MIN), t_s, block_r=128,
        interpret=(jax.default_backend() == "cpu"),
    )
    xp = _prep_x(x).T  # (64, N) bf16

    # ---- pack the SIN planes: (_NSIN, N) -> (cells*_NSIN*8, 128) ----
    bounce_arr = jnp.broadcast_to(
        jnp.asarray(bounce, jnp.int32).astype(jnp.float32), (n,)
    ) if jnp.ndim(bounce) == 0 else bounce.astype(jnp.float32)
    # RNG draws at the SAME call sites as the split _bounce_step — the
    # kernel consumes them verbatim (see the _SIN comment on why the
    # cos/sin cannot live in-kernel and stay bit-exact)
    uv = rng.random_unit_vector(seed, pixel_id, sample_id, bounce,
                                rng.PURPOSE_LOBE)
    u_fres = rng.uniform1(seed, pixel_id, sample_id, bounce,
                          rng.PURPOSE_FRESNEL)
    if cfg.rr_start > 0:
        u_rr = rng.uniform1(seed, pixel_id, sample_id, bounce,
                            rng.PURPOSE_RR)
    else:
        u_rr = jnp.zeros((n,), jnp.float32)
    comps = [
        o[:, 0], o[:, 1], o[:, 2],
        d[:, 0], d[:, 1], d[:, 2],
        throughput[:, 0], throughput[:, 1], throughput[:, 2],
        light[:, 0], light[:, 1], light[:, 2],
        bounce_arr,
        active.astype(jnp.float32),
        t_s,
        i_s.astype(jnp.float32),
        sph_n[:, 0], sph_n[:, 1], sph_n[:, 2],  # planes 16:19
    ] + [sph_mrow[:, k] for k in range(9)] + [  # planes 19:28
        uv[:, 0], uv[:, 1], uv[:, 2],  # planes 28:31
        u_fres,
        u_rr,
    ]
    sin = jnp.stack(comps, axis=0)  # (_NSIN, N)
    sin = sin.reshape(_NSIN, cells, 8, 128).transpose(1, 0, 2, 3).reshape(
        cells * _NSIN * 8, 128
    )
    lb = jnp.minimum(lane_bound, t_s).reshape(n // 128, 128)

    sout = _fused_advance_padded(
        sin, xp, lists, counts, smin, lb,
        scene.mm_w_t, scene.mm_refine3,
        t_min=float(T_MIN), rr_start=int(cfg.rr_start),
        adaptive_offset=bool(cfg.adaptive_offset),
        interpret=(jax.default_backend() == "cpu"),
    )
    sout = sout.reshape(cells, _NSOUT, 8, 128).transpose(1, 0, 2, 3).reshape(
        _NSOUT, n
    )
    o2 = sout[0:3].T
    d2 = sout[3:6].T
    tp2 = sout[6:9].T
    li2 = sout[9:12].T
    still = sout[12] > 0.5
    prev_pdf = jnp.zeros((n,), jnp.float32)
    tile_p = scene.mm_w_t.shape[1] // 4
    tile_passes = jnp.sum(counts).astype(jnp.float32) * (
        128 * tile_p / float(1 << 20)
    )
    return (o2, d2, li2, tp2, still, prev_pdf, rays_counted,
            jnp.zeros((), jnp.int32), tile_passes)
