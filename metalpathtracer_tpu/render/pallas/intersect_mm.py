"""MXU-native closest-hit: ray-triangle intersection as matrix multiplies.

The TPU's compute power lives in the 128x128 systolic array, not in the
pointer-chasing the reference's BVH traversal does per thread
(`MetalCpp Path Tracer/Renderer/Shaders/PathTracing.h:75-204`). This module
reformulates brute-force closest-hit so the inner loop IS a matmul:

Every Moller-Trumbore triple product is *bilinear* in per-ray quantities and
per-triangle constants. With the 12-dim ray feature vector

    X = [ d, (o x d), o, o.d, |o|^2, 1 ]                    (B, 12)

each of the four MT determinants (a, s.h, d.q, e2.q) is a single linear
functional of X with per-triangle weights:

    a  = -d.n                                    n = e1 x e2
    su = (o x d).e2 - d.(e2 x v0)                = det[s, d, e2]
    sv = -(o x d).e1 - d.(v0 x e1)               = det[d, s, e1]
    st = o.n - v0.n                              = det[e2, s, e1]

so testing a block of B rays against a tile of T triangles is four
(B,12)@(12,T) MXU matmuls plus (B,T) elementwise VPU postprocessing — zero
gathers, zero divergence, everything resident in VMEM. u = su/a, v = sv/a,
t = st/a reproduce the reference's acceptance tests (same 1e-5 parallel
epsilon, 1e-4 t_min; `PathTracing.h:143-176`); the winner's t is then
re-derived exactly from the plane equation for full f32 accuracy.

Spheres do NOT go through the matmul: the expanded quadratic
(|o|^2 - 2 o.c + |c|^2 - r^2) catastrophically cancels for the reference's
r=10000 ground sphere (|c|^2 ~ 1e8 vs f32 eps ~ 8), flipping grazing/
self-intersection validity tests. Scenes have few spheres (the mesh carries
the primitive count), so spheres get an exact dense pass over a dedicated
(S,) SoA — numerically identical to the oracle — and the two closest hits
merge at the end.
"""

from __future__ import annotations

import functools
import os

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from metalpathtracer_tpu.scene.types import PRIM_SPHERE, PRIM_TRIANGLE

T_MIN = 1e-4
TRI_PARALLEL_EPS = 1e-5
# 12 live ray features padded to 16: Mosaic requires HBM->VMEM DMA slices
# (the streaming kernel's weight tiles) to be 8-sublane aligned, and a
# 12-row slice of a tiled memref fails to compile ("Slice shape along
# dimension 0 must be aligned to tiling (8), but is 12"). The extra 4
# zero rows/columns are free in the matmul (K pads to 128 on the MXU
# regardless).
NUM_FEATURES = 16
_LIVE_FEATURES = 12
# rays per grid cell / triangles per inner tile (bigger tiles amortize the
# ~1.7us per-loop-iteration overhead measured on v5e). Env overrides exist
# for perf sweeps only — production uses the defaults.
BLOCK_R = int(os.environ.get("MPT_BLOCK_R", "1024"))
# triangles per inner tile. 0 = auto PER SCENE (build_weights): 128 for
# small resident scenes, 256 past TILE_SWITCH_TRIS. Chip sweep with the kd
# partition (which flipped round 2's "256 always" verdict): reference 5k
# tris 26.8 (128) vs 24.0 (256) Mrays/s pipelined; bunny70k 4.69 (128) vs
# 4.95 (256) — small scenes want finer tiles (fewer tested pairs), large
# scenes want fewer tiles (cull tables + list walks scale with n_tiles).
# Kernels read the ACTUAL tile size from the weight slab's shape, so the
# choice is per-uploaded-scene, not per-process.
TILE_P = int(os.environ.get("MPT_TILE_P", "0"))
TILE_P_SMALL = 128
TILE_P_LARGE = 256
TILE_SWITCH_TRIS = int(os.environ.get("MPT_TILE_SWITCH", str(24 * 1024)))
# cull granularity WITHIN a kernel block: tile lists are built per CULL_R
# consecutive lanes (the kernel processes each subgroup against its own
# list). One list per 1024 incoherent lanes tests the UNION of their tiles;
# finer lists cut matmul pairs wherever rays share any locality. Must
# divide BLOCK_R and be a multiple of 128. 0 = auto PER SCENE in
# _tri_hit_mm_padded: 256 up to TILE_SWITCH_TRIS, 128 beyond (bunny70k
# chip sweep: 128/256/512 -> 5.50/5.01/4.63 Mrays/s — large scenes have
# long tile lists whose pair-count halving beats the per-subgroup fixed
# costs; the reference scene measured the opposite, 25.2 at 128 vs 26.8
# at 256). The STREAMING kernel stays at 128: its blocked SMEM list specs
# need >= 8 subgroups per 1024-lane block.
CULL_R = int(os.environ.get("MPT_CULL_R", "0"))
# both 128 since the bpi-1/pool-2^15 retune: the reference scene flipped
# from 256 (26.8 vs 25.2 at the old defaults) to 128 (32.8 vs 31.9 —
# deeper sorted pools cluster lanes well enough that finer subgroups cut
# pairs 31% without the fixed-cost penalty). The per-scene split
# machinery stays for the next flip.
CULL_R_SMALL = 128
CULL_R_LARGE = 128
CULL_R_STREAM = int(os.environ.get("MPT_CULL_R_STREAM", "128"))
# pack the tile argmin's (t, column) into one int32 key (bitcast f32 t is
# order-preserving for positives; the low 8 mantissa bits carry the
# column) — on paper 2 fewer full-width VPU passes per tile, but measured
# NEUTRAL-to-slightly-slower on chip (21.2 vs 21.6 Mrays/s probe; the
# where/min chain schedules as well as the bitcast/and/or chain). Kept as
# an off-by-default knob; oracle-validated identical. Requires
# TILE_P <= 256.
PACKED_ARGMIN = os.environ.get("MPT_PACKED_ARGMIN", "0") == "1"
# triangle->tile partition scheme (see build_weights): "kd" median splits
# (tight tile AABBs) or the legacy "morton" run grouping
TILE_PARTITION = os.environ.get("MPT_TILE_PART", "kd")
# Mosaic's default scoped-VMEM budget is 16 MB, but a v5e core has 128 MiB
# of physical VMEM; raising the cap lets the det tile use wide ray blocks.
VMEM_LIMIT_BYTES = int(os.environ.get("MPT_VMEM_LIMIT_MB", "100")) * (1 << 20)
# MXU precision scheme for the determinant matmuls. Mosaic's DEFAULT f32
# matmul runs at reduced (bf16-class) precision and silently flipped
# intersection accept/reject decisions on real hardware (caught by the
# brute-force oracle: 2.5% of bunny pixels, 55% of a 100k random cloud,
# while CPU interpret mode — exact f32 — masked it in tests). HIGHEST
# restores bit-level agreement with the oracle but costs a multi-pass f32
# emulation. Modes, fastest first:
#
#   "pack"   (default) ONE bf16 matmul per tile at K=64. The key MXU fact:
#            a matmul with K <= 128 costs the same passes as K=128 (the
#            contraction dimension is padded to the systolic array's 128
#            rows regardless — docs/PERFORMANCE.md measured the K=12
#            formulation running at the padded-work speed of light). So the
#            hi/lo split scheme's FOUR term products
#            xh@wh + xl@wh + xh@wl + xl@wl fit in ONE pass by packing
#            X = [xh | xl | xh | xl] (B, 64) against W = [wh; wh; wl; wl]
#            (64, 4T), both bf16. bf16 x bf16 products are EXACT in the f32
#            accumulator (8+8 mantissa bits < 24), so the only error is f32
#            accumulation rounding — b3-class accuracy or better (the
#            xl@wl term b3 drops is included) at one third the MXU passes.
#            The weight slab is pre-split host-side (build_weights) to
#            bf16 (64, 4T); ray features split in-kernel.
#   "b3"     manual bf16 hi/lo split, 3 one-pass matmuls over the f32
#            (16, 4T) slab — ~2x faster than HIGHEST, abs error
#            ~2^-16 x |x||w|; kept as the round-2 validated fallback.
#   "highest"/"default": plain f32 matmul at that XLA precision.
#
# Winner refinement is exact f32 in every mode, so residual risk is
# marginal accept/reject flips at triangle edges. Any default change is
# validated against the brute oracle ON CHIP (CPU interpret is exact f32
# and hides Mosaic matmul behavior).
MM_PRECISION_MODE = os.environ.get("MPT_MM_PRECISION", "pack")
# XLA precision for the plain-matmul modes; None on the manual-split
# branches of _det_matmul (b3/pack do not consult it — ADVICE r2).
MM_PRECISION = {
    "default": jax.lax.Precision.DEFAULT,
    "highest": jax.lax.Precision.HIGHEST,
    "b3": None,
    "pack": None,
}[MM_PRECISION_MODE]
# weight-slab layout for the selected mode (see build_weights)
W_ROWS = 64 if MM_PRECISION_MODE == "pack" else 16
W_DTYPE = jnp.bfloat16 if MM_PRECISION_MODE == "pack" else jnp.float32


def _prep_x(x):
    """Per-block ray-feature preparation, hoisted OUT of the tile loop.
    "pack": the in-kernel hi/lo split + concat happens once per kernel
    block instead of once per tile iteration. Other modes: identity."""
    if MM_PRECISION_MODE == "pack":
        xh32 = x.astype(jnp.bfloat16).astype(jnp.float32)
        xl32 = x - xh32
        # [xh | xl | xh | xl] pairs with the pre-split W = [wh; wh; wl; wl]
        # (each block cast is exact: bf16(x) == xh, bf16(xl32) == xl by
        # construction)
        return jnp.concatenate([x, xl32, x, xl32], axis=1).astype(jnp.bfloat16)
    return x


def _det_matmul_prepped(xp, w):
    """block = xp @ w where xp came from `_prep_x`. One bf16 pass in
    "pack" mode; the split-per-call schemes otherwise."""
    if MM_PRECISION_MODE == "pack":
        return jnp.dot(xp, w, preferred_element_type=jnp.float32)
    return _det_matmul(xp, w)


def _det_matmul(x, w):
    """block = x @ w with the selected precision scheme (see
    MM_PRECISION_MODE). x: (B, 16) f32 ray features; w: the weight slab —
    bf16 (64, 4*TILE_P) pre-split [wh; wh; wl; wl] in "pack" mode, f32
    (16, 4*TILE_P) otherwise."""
    if MM_PRECISION_MODE == "pack":
        return _det_matmul_prepped(_prep_x(x), w)
    if MM_PRECISION_MODE == "b3":
        xh = x.astype(jnp.bfloat16)
        xl = (x - xh.astype(jnp.float32)).astype(jnp.bfloat16)
        wh = w.astype(jnp.bfloat16)
        wl = (w - wh.astype(jnp.float32)).astype(jnp.bfloat16)
        acc = jnp.dot(xh, wh, preferred_element_type=jnp.float32)
        acc += jnp.dot(xh, wl, preferred_element_type=jnp.float32)
        acc += jnp.dot(xl, wh, preferred_element_type=jnp.float32)
        return acc
    return jnp.dot(
        x, w, preferred_element_type=jnp.float32, precision=MM_PRECISION
    )

_INF = float("inf")  # plain float: jnp scalars become captured consts in kernels


def _morton3(pts: np.ndarray) -> np.ndarray:
    """30-bit Morton codes of points quantized to a 1024^3 grid."""
    lo = pts.min(axis=0)
    span = np.maximum(pts.max(axis=0) - lo, 1e-9)
    q = np.clip(((pts - lo) / span * 1023.0), 0, 1023).astype(np.uint64)

    def spread(x):
        x = (x | (x << 16)) & np.uint64(0x030000FF)
        x = (x | (x << 8)) & np.uint64(0x0300F00F)
        x = (x | (x << 4)) & np.uint64(0x030C30C3)
        x = (x | (x << 2)) & np.uint64(0x09249249)
        return x

    return (spread(q[:, 0]) | (spread(q[:, 1]) << np.uint64(1))
            | (spread(q[:, 2]) << np.uint64(2)))


def build_weights(prim_type, p0, p1, p2):
    """Precompute per-scene intersection tables (NumPy, once per scene).

    Returns dict with:
      w_all: the tile-interleaved weight slab — bf16 (64, 4*T_padded)
        pre-split [wh; wh; wl; wl] in "pack" mode, f32 (16, 4*T_padded)
        otherwise (see MM_PRECISION_MODE)
      tri_ids: int32 (T_padded,) original primitive index per column
      n_tris: int — real triangle count
      sph_center/sph_radius/sph_ids: sphere SoA (S_padded, ...) for the
        exact sphere pass (padding radius 0 → never hits).
    """
    prim_type = np.asarray(prim_type)
    p0 = np.asarray(p0, np.float32)
    p1 = np.asarray(p1, np.float32)
    p2 = np.asarray(p2, np.float32)

    tri_sel = np.nonzero(prim_type == PRIM_TRIANGLE)[0]
    sph_sel = np.nonzero(prim_type == PRIM_SPHERE)[0]

    # per-scene tile size (see the TILE_P constant's comment)
    tile_p = TILE_P or (
        TILE_P_SMALL if len(tri_sel) <= TILE_SWITCH_TRIS else TILE_P_LARGE
    )

    # Order triangles so each TILE_P tile is spatially compact — the
    # per-tile AABB cull then skips most tiles per ray block. "kd"
    # (default): recursive longest-axis median splits at TILE_P-multiple
    # boundaries — every tile is an exact spatial partition cell, with
    # strictly tighter AABBs than same-size Morton runs (a Morton run can
    # straddle a curve discontinuity and span the whole scene). "morton":
    # the round-1/2 centroid Morton sort, kept for A/B.
    if len(tri_sel):
        cent = (p0[tri_sel] + p1[tri_sel] + p2[tri_sel]) / 3.0
        if TILE_PARTITION == "kd":
            order = np.empty(len(tri_sel), np.int64)
            out_pos = [0]

            def split(idx):
                n_i = len(idx)
                if n_i <= tile_p:
                    order[out_pos[0] : out_pos[0] + n_i] = idx
                    out_pos[0] += n_i
                    return
                c = cent[idx]
                axis = int(np.argmax(c.max(axis=0) - c.min(axis=0)))
                # split at the largest TILE_P multiple <= half (keeps every
                # tile exactly TILE_P until the single ragged tail)
                k = max(tile_p, (n_i // 2) // tile_p * tile_p)
                part = np.argpartition(c[:, axis], k)
                split(idx[part[:k]])
                split(idx[part[k:]])

            split(np.arange(len(tri_sel)))
            tri_sel = tri_sel[order]
        else:
            tri_sel = tri_sel[np.argsort(_morton3(cent), kind="stable")]

    # --- triangle weights ---
    v0, v1, v2 = p0[tri_sel], p1[tri_sel], p2[tri_sel]
    t = len(tri_sel)
    pad_t = (-t) % tile_p if t else tile_p
    e1 = v1 - v0
    e2 = v2 - v0
    n = np.cross(e1, e2)
    z1 = np.zeros((t, 1), np.float32)
    z3 = np.zeros((t, 3), np.float32)
    zp = np.zeros((t, NUM_FEATURES - _LIVE_FEATURES), np.float32)
    wa = np.concatenate([-n, z3, z3, z1, z1, z1, zp], axis=1)
    wu = np.concatenate([-np.cross(e2, v0), e2, z3, z1, z1, z1, zp], axis=1)
    wv = np.concatenate([-np.cross(v0, e1), -e1, z3, z1, z1, z1, zp], axis=1)
    wt = np.concatenate(
        [z3, z3, n, z1, z1, -np.sum(v0 * n, 1, keepdims=True), zp], axis=1
    )

    def padw(w):
        return np.concatenate(
            [w, np.zeros((pad_t, NUM_FEATURES), np.float32)]
        ).T.copy()

    # one tile-interleaved weight matrix: for tile i the 4*TILE_P columns are
    # [wa_i | wu_i | wv_i | wt_i], so each tile is ONE (B,12)@(12,4T) matmul
    wa_p, wu_p, wv_p, wt_p = padw(wa), padw(wu), padw(wv), padw(wt)
    n_tiles_w = wa_p.shape[1] // tile_p
    w_all = np.empty((NUM_FEATURES, 4 * wa_p.shape[1]), np.float32)
    for i in range(n_tiles_w):
        s = i * tile_p
        ws = i * 4 * tile_p
        w_all[:, ws : ws + tile_p] = wa_p[:, s : s + tile_p]
        w_all[:, ws + tile_p : ws + 2 * tile_p] = wu_p[:, s : s + tile_p]
        w_all[:, ws + 2 * tile_p : ws + 3 * tile_p] = wv_p[:, s : s + tile_p]
        w_all[:, ws + 3 * tile_p : ws + 4 * tile_p] = wt_p[:, s : s + tile_p]

    if MM_PRECISION_MODE == "pack":
        # pre-split bf16 hi/lo slab for the one-pass packed matmul:
        # rows [wh; wh; wl; wl] pair with in-kernel X = [xh | xl | xh | xl]
        import ml_dtypes

        bf = ml_dtypes.bfloat16
        wh = w_all.astype(bf)
        wl = (w_all - wh.astype(np.float32)).astype(bf)
        w_all = np.concatenate([wh, wh, wl, wl], axis=0)  # (64, 4T) bf16

    # one-tile-per-leading-index layout (n_tiles, W_ROWS, 4*TILE_P): the
    # streaming kernel DMAs w[i] as ONE contiguous 128 KB block. The
    # column-interleaved 2-D slab made every tile fetch 64 strided 2 KB
    # segments — descriptor-bound at a fraction of HBM bandwidth.
    w_all = np.ascontiguousarray(
        w_all.reshape(w_all.shape[0], n_tiles_w, 4 * tile_p).transpose(1, 0, 2)
    )

    tri_ids = np.concatenate(
        [tri_sel.astype(np.int32), np.full(pad_t, -1, np.int32)]
    )

    # packed refinement table in KERNEL COLUMN order:
    # [n, n.v0, prim_id, mat_id, pad2] — the winner's normal, EXACT plane
    # offset, ORIGINAL PRIMITIVE INDEX and MATERIAL BANK ID all cost ONE
    # (N,8) row gather. Separate gathers for ids measured 31 ms/render
    # each in the in-situ HLO profile (scalar-gather tax, ~9 ns/row); ids
    # ride as exact small-integer f32 (|id| < 2^24). mat_id (col 5) is
    # filled by upload_scene once the material bank exists.
    #
    # The winner's t re-derives from the PLANE equation
    # t = (n.v0 - n.o) / (n.d) — algebraically identical to Moller-
    # Trumbore's st/sa for the winning triangle, at the same f32 accuracy,
    # for a quarter of the round-2 full-MT refine's gather bytes and VPU
    # ops. The u/v acceptance re-check the full refine ran was DISCARDED
    # by design anyway: a kernel winner whose exact-precision re-test
    # fails keeps its approximate t rather than reporting a miss (edge
    # sparkle fix, ADVICE r1), so only the t value itself was ever used.
    # n.v0 accumulates in f64 host-side before the f32 round.
    refine = np.zeros((t + pad_t, 8), np.float32)
    refine[:t, 0:3] = n
    refine[:t, 3] = np.sum(
        v0.astype(np.float64) * n.astype(np.float64), axis=1
    ).astype(np.float32)
    refine[:, 4] = tri_ids.astype(np.float32)

    # per-tile AABBs over the padded triangle order; padding tiles get empty
    # boxes (lo=+inf, hi=-inf) that fail every slab test
    n_tiles = (t + pad_t) // tile_p
    tile_box = np.zeros((max(n_tiles, 1), 8), np.float32)
    tile_box[:, 0:3] = np.inf
    tile_box[:, 4:7] = -np.inf
    for i in range(n_tiles):
        a, b = i * tile_p, min((i + 1) * tile_p, t)
        if a >= t:
            continue
        vs = np.concatenate([v0[a:b], v1[a:b], v2[a:b]])
        tile_box[i, 0:3] = vs.min(axis=0)
        tile_box[i, 4:7] = vs.max(axis=0)

    # --- sphere SoA (exact pass) ---
    s = len(sph_sel)
    pad_s = (-s) % 8 if s else 8
    sph_center = np.concatenate(
        [p0[sph_sel], np.zeros((pad_s, 3), np.float32)]
    )
    sph_radius = np.concatenate(
        [p1[sph_sel, 0], np.zeros(pad_s, np.float32)]  # r=0 never hits
    )
    sph_ids = np.concatenate(
        [sph_sel.astype(np.int32), np.full(pad_s, -1, np.int32)]
    )

    return dict(
        w_all=w_all,
        tri_ids=tri_ids,
        tri_refine=refine,
        tile_box=tile_box,
        n_tris=t,
        sph_center=sph_center.astype(np.float32),
        sph_radius=sph_radius.astype(np.float32),
        sph_ids=sph_ids,
    )


def ray_features(o: jnp.ndarray, d: jnp.ndarray) -> jnp.ndarray:
    """X = [d, o x d, o, o.d, |o|^2, 1, 0*4] — (N, 16) float32 (zero-padded
    to the 8-sublane-aligned NUM_FEATURES; see the constant's comment)."""
    m = jnp.cross(o, d)
    od = jnp.sum(o * d, axis=-1, keepdims=True)
    oo = jnp.sum(o * o, axis=-1, keepdims=True)
    ones = jnp.ones_like(od)
    pad = jnp.zeros(o.shape[:-1] + (NUM_FEATURES - _LIVE_FEATURES,), o.dtype)
    return jnp.concatenate([d, m, o, od, oo, ones, pad], axis=-1)


def _tile_epilogue(block, i, col, best_t, best_i, t_min, tile_p):
    """Shared VPU epilogue of one tile matmul: acceptance tests
    (u = su/a, v = sv/a, t = st/a — PathTracing.h:143-176, same 1e-5
    parallel epsilon), per-tile argmin, and the running-best merge.

    DIVISION-FREE formulation — this epilogue is the kernel's VPU bound
    (~15 vector ops per tested pair vs the matmul's ~free 43 MXU flops),
    so every pass counts:
    - acceptance runs in multiply form on sign-folded determinants
      (sus >= 0 etc. with sas = |sa|) — algebraically EXACT, tighter than
      the divided original (no rounding before the compares);
    - `u <= 1` is dropped: implied by v >= 0 and u + v <= 1;
    - the candidate t used for tile argmin / best-t pruning comes from a
      fast approximate reciprocal (the winner's t is re-derived exactly in
      f32 by the caller's plane-t refine, so the approximation can only
      reorder near-ties — the same class as the tolerated matmul edge
      flips)."""
    sa = block[:, 0:tile_p]
    su = block[:, tile_p : 2 * tile_p]
    sv = block[:, 2 * tile_p : 3 * tile_p]
    st = block[:, 3 * tile_p : 4 * tile_p]

    s = jnp.where(sa < 0.0, -1.0, 1.0)
    sas = sa * s
    sus = su * s
    svs = sv * s
    sts = st * s
    ok = (
        (sas > TRI_PARALLEL_EPS) & (sus >= 0.0) & (svs >= 0.0)
        & (sus + svs <= sas) & (sts > t_min * sas)
    )
    if PACKED_ARGMIN and tile_p <= 256:
        # pack t and column into ONE int32 key: positive-f32 bitcasts are
        # order-preserving, and stealing the low 8 mantissa bits for the
        # column (TILE_P <= 256) costs 2^-15 relative t resolution —
        # BELOW the approximate-reciprocal error that already bounds this
        # candidate t. One wide where + one wide min replace the
        # min/eq/where/min chain (2 fewer full-width VPU passes).
        t_all = sts * pl.reciprocal(sas, approx=True)
        key = jnp.where(
            ok,
            (jax.lax.bitcast_convert_type(t_all, jnp.int32)
             & jnp.int32(~0xFF)) | col,
            jnp.int32(0x7F800000),  # +inf pattern, col 0
        )
        kmin = jnp.min(key, axis=1)
        t_best_tile = jax.lax.bitcast_convert_type(
            kmin & jnp.int32(~0xFF), jnp.float32
        )
        idx_tile = i * tile_p + (kmin & jnp.int32(0xFF))
        better = t_best_tile < best_t
        return (jnp.where(better, t_best_tile, best_t),
                jnp.where(better, idx_tile, best_i))

    t_all = jnp.where(ok, sts * pl.reciprocal(sas, approx=True), _INF)

    # tile argmin: min value, then smallest matching column
    t_best_tile = jnp.min(t_all, axis=1, keepdims=True)
    idx_in_tile = jnp.min(
        jnp.where(t_all == t_best_tile, col, jnp.int32(0x7FFFFFFF)),
        axis=1,
        keepdims=True,
    )
    t_best_tile = t_best_tile[:, 0]
    idx_tile = i * tile_p + idx_in_tile[:, 0]

    better = t_best_tile < best_t
    return (jnp.where(better, t_best_tile, best_t),
            jnp.where(better, idx_tile, best_i))


def _mm_kernel(lists_ref, counts_ref, smin_ref, x_ref, lb_ref, w_ref,
               t_ref, idx_ref, *, t_min: float, tile_p: int, cull_r: int):
    """VMEM-resident weights. Work-skipping design (see docs/PERFORMANCE.md):
    the passing-tile lists are computed OUTSIDE the kernel (vectorized XLA
    cull) per CULL_R-lane SUBGROUP and arrive as SMEM inputs, ENTRY-ORDERED
    (nearest tile first). Each subgroup walks its list in a while loop that
    ALSO stops when the next tile's minimum entry distance exceeds every
    lane's min(best_t, own-last-tile entry) — the ordered-BVH-traversal
    best-t prune (PathTracing.h:102) at tile granularity. Branches
    (`lax.cond`, in-loop `pl.when`) measured as predicated-both-paths on
    TPU, and an in-kernel scalar cull loop costs ~1.7us/iteration — so
    neither appears here; the prune is the loop CONDITION, not a branch."""
    cell = pl.program_id(0)
    sub = BLOCK_R // cull_r
    rows = cull_r // 128
    # 6 at tile_p 128 re-swept at CULL_R 128 (4/6/8 -> 32.3/33.2/32.7)
    u_res = TILE_UNROLL_RES or (6 if tile_p <= 128 else 4)
    col = jax.lax.broadcasted_iota(jnp.int32, (cull_r, tile_p), 1)
    xp = _prep_x(x_ref[:])  # hi/lo split + concat ONCE per block

    for sg in range(sub):  # static unroll over subgroups
        xs = xp[sg * cull_r : (sg + 1) * cull_r, :]
        g = cell * sub + sg
        lb2 = lb_ref[sg * rows : (sg + 1) * rows, :]  # (rows, 128) 2-D
        cnt = counts_ref[g]

        def cond(carry, g=g, cnt=cnt):
            j, thr, _, _ = carry
            # smin is +inf at padded positions, so the entry test alone
            # would terminate; j < cnt keeps the trip count exact
            return (j < cnt) & (smin_ref[g, j] <= thr)

        def tile_body(carry, xs=xs, g=g, lb2=lb2, cnt=cnt):
            j, _, best_t, best_i = carry
            for k in range(u_res):  # consecutive, clamped
                jj = (jnp.minimum(j + k, cnt - 1)
                      if u_res > 1 else j)
                i = lists_ref[g, jj]
                # one fused matmul per tile: [a | su | sv | st]
                block = _det_matmul_prepped(xs, w_ref[i])
                best_t, best_i = _tile_epilogue(block, i, col, best_t,
                                                best_i, t_min, tile_p)
            # 2-D shapes for the reduce: a loaded-1-D-reshape feeding
            # compare/select crashes Mosaic layout inference (see
            # _mm_kernel_stream)
            thr = jnp.max(jnp.minimum(best_t.reshape(rows, 128), lb2))
            return (j + u_res, thr, best_t, best_i)

        init = (jnp.int32(0), jnp.max(lb2),
                jnp.full((cull_r,), _INF), jnp.full((cull_r,), -1, jnp.int32))
        _, _, best_t, best_i = jax.lax.while_loop(cond, tile_body, init)
        # (8, 128)-tiled output blocks: a (B, 1) layout puts one element per
        # sublane row and costs ~12us/cell of pure write overhead
        t_ref[sg * rows : (sg + 1) * rows, :] = best_t.reshape(rows, 128)
        idx_ref[sg * rows : (sg + 1) * rows, :] = best_i.reshape(rows, 128)


# VMEM weight-tile cache slots per kernel block in the streaming kernel;
# S x (W_ROWS x 4*TILE_P) of W_DTYPE (4 MB at the defaults). Bigger = fewer
# DMA batches; smaller = less VMEM next to wide ray blocks.
STREAM_CACHE_SLOTS = int(os.environ.get("MPT_STREAM_SLOTS", "128"))  # chip: bunny300k 32/64/128 -> 3.52/4.06/4.58 Mrays/s (16 MB VMEM cache at 128)
# unroll factors for the per-tile matmul loops: Mosaic's dynamic-bound
# loops cost ~0.25us/iteration of issue overhead around the matmul +
# epilogue, so the tile loops process U consecutive list positions per
# iteration (hand-rolled — lax.fori_loop's unroll= needs static bounds).
# Positions past the end CLAMP to the last valid one; re-testing a tile is
# idempotent (the epilogue merge is strict <), so duplicates are harmless.
# Swept on chip (100k cloud, incoherent rays): stream 9278 (U1) -> 7255
# (U2) -> 6223 (U4) -> 5376 us/call (U8). The RESIDENT kernel's lists are
# short (bench scene ~6 tiles) and its best-t early exit checks once per
# chunk, so it stays fine-grained at U2 — deep unroll would pad short
# lists with duplicates and blunt the exit.
TILE_UNROLL_STREAM = max(1, int(os.environ.get("MPT_TILE_UNROLL", "8")))
# 0 = auto: U8 at tile_p 128, U4 at 256 (chip sweep: at TILE_P 128 the
# resident kernel measured U2 24.2 / U4 26.5 / U8 26.8 Mrays/s pipelined)
TILE_UNROLL_RES = max(0, int(os.environ.get("MPT_TILE_UNROLL_RES", "0")))


def _mm_kernel_stream(slists_ref, starts_ref, ulists_ref, ucounts_ref,
                      rme_ref, x_ref, lb_ref, w_hbm_ref, t_ref, idx_ref,
                      bt_ref, bi_ref, cache, dma_sem, *, t_min: float,
                      tile_p: int):
    """HBM-streaming variant with the SAME per-subgroup culling as the
    resident kernel (round-2 parity gap closed — VERDICT r2 item 2), plus
    ordered-traversal early exit:

    - the block's union tile list drives DMA: each passing-anywhere tile is
      fetched ONCE into a slot of the VMEM cache (no duplicate transfers),
      in batches of STREAM_CACHE_SLOTS with all of a batch's copies in
      flight together;
    - the union list is ENTRY-ORDERED (nearest tiles first), so after each
      batch the block compares the minimum entry distance of all remaining
      tiles (`rme`) against every lane's min(best_t, own-last-tile entry):
      once no remaining tile can possibly produce a closer hit for any
      lane, the rest of the list — DMA and matmuls — is skipped by zeroing
      loop trip counts (branchless; `pl.when` in loop bodies runs both
      paths on this backend);
    - each CULL_R-lane subgroup then matmuls only ITS passing tiles,
      indexing the cache through a slot list (the XLA cull pre-maps tile
      ids to union-list positions, so the kernel needs no search);
    - running bests persist across batches in scratch refs.

    Scene size is bounded by HBM, not VMEM (millions of triangles); compute
    scales with per-subgroup passing pairs UP TO the first settled batch —
    the same occlusion property that makes the reference's near-first BVH
    traversal O(log n) per ray (PathTracing.h:75-204).
    """
    cell = pl.program_id(0)
    urow = jax.lax.rem(cell, 8)  # ulists rows ride in groups of 8 (SMEM
    # block specs need >= 8 sublanes; the index_map delivers rows
    # [8*(cell//8), ...) and the kernel picks its own)
    sub = BLOCK_R // CULL_R_STREAM
    rows = CULL_R_STREAM // 128
    S = STREAM_CACHE_SLOTS
    col = jax.lax.broadcasted_iota(jnp.int32, (CULL_R_STREAM, tile_p), 1)
    xp = _prep_x(x_ref[:])

    bt_ref[:, :] = jnp.full(bt_ref.shape, _INF)
    bi_ref[:, :] = jnp.full(bi_ref.shape, -1, jnp.int32)
    ucount = ucounts_ref[cell]
    used = (ucount + (S - 1)) // S  # dynamic DMA-batch count

    def dma_for(sglobal, slot):
        i = ulists_ref[urow, sglobal]
        # one contiguous 128 KB block per tile (leading-index layout)
        return pltpu.make_async_copy(
            w_hbm_ref.at[i],
            cache.at[slot],
            dma_sem.at[slot],
        )

    def batch_body(b, _):
        base = b * S

        # ordered-traversal exit: every lane's relevance bound is
        # min(best_t, entry of its farthest own passing tile); if the
        # minimum entry among remaining tiles exceeds ALL lanes' bounds,
        # nothing left can matter — zero this batch's trip counts (and,
        # rme being non-decreasing, every later batch's too).
        thr = jnp.max(jnp.minimum(bt_ref[:, :], lb_ref[:, :]))
        settled = rme_ref[cell, b] > thr
        m = jnp.where(settled, 0, jnp.minimum(S, ucount - base))

        # start ALL of this batch's copies, then wait them: the DMA engine
        # runs them concurrently, so latency amortizes across the batch.
        # Starts/waits pair exactly (same trip count) — the round-2 lesson
        # about guarded DMA in loop bodies (both paths execute) is moot
        # because nothing here is guarded.
        #
        # A round-4 experiment U-chunked these loops with clamped tails
        # (duplicate in-flight copies into one slot) on the hypothesis
        # that per-iteration scalar issue overhead dominated; it measured
        # +0.9% — noise — while resting on the DMA engine tolerating
        # overlapping byte-identical writes to one destination, an
        # undocumented-hardware assumption. Reverted (ADVICE r4 #2): the
        # simple one-start/one-wait pairing is the correctness-obvious
        # form and the transfer itself, not issue overhead, bounds this
        # loop (docs/PERFORMANCE.md round 4 "chunking" post-mortem).

        def start_one(s, _):
            dma_for(base + s, s).start()
            return 0

        def wait_one(s, _):
            dma_for(base + s, s).wait()
            return 0

        jax.lax.fori_loop(0, m, start_one, 0)
        jax.lax.fori_loop(0, m, wait_one, 0)

        for sg in range(sub):  # static unroll over subgroups
            xs = xp[sg * CULL_R_STREAM : (sg + 1) * CULL_R_STREAM, :]
            # per-SUBGROUP settle: the block-level check above needs all
            # 1024 lanes done (one straggler forces everyone); checking
            # each 128-lane subgroup against ITS OWN lanes' bounds lets
            # settled subgroups skip their lists 8x sooner
            sl = slice(sg * rows, (sg + 1) * rows)
            thr_sg = jnp.max(jnp.minimum(bt_ref[sl, :], lb_ref[sl, :]))
            sg_done = rme_ref[cell, b] > thr_sg
            j0 = starts_ref[sg, b]
            j1 = jnp.where(settled | sg_done, j0, starts_ref[sg, b + 1])

            def chunk_body(c, carry, xs=xs, sg=sg, base=base, j0=j0, j1=j1):
                jb = j0 + c * TILE_UNROLL_STREAM
                for k in range(TILE_UNROLL_STREAM):  # clamped dups: harmless
                    jj = (jnp.minimum(jb + k, j1 - 1)
                          if TILE_UNROLL_STREAM > 1 else jb)
                    sglob = slists_ref[sg, jj]
                    i = ulists_ref[urow, sglob]
                    block = _det_matmul_prepped(xs, cache[sglob - base])
                    carry = _tile_epilogue(block, i, col, *carry, t_min,
                                           tile_p)
                return carry

            # Carries init from CONSTANTS and merge with the persisted bests
            # in 2-D AFTER the loop: a (1,128)->(128,) reshaped LOAD feeding
            # the epilogue's compare/select crashes Mosaic layout inference
            # ("Check failed: arr.size() >= layout_rank" — bisected on chip;
            # constant-init 1-D carries, as in the resident kernel, are fine).
            init = (jnp.full((CULL_R_STREAM,), _INF),
                    jnp.full((CULL_R_STREAM,), -1, jnp.int32))
            nchunks = ((j1 - j0 + TILE_UNROLL_STREAM - 1)
                       // TILE_UNROLL_STREAM)
            best_t, best_i = jax.lax.fori_loop(0, nchunks, chunk_body, init)
            sl = slice(sg * rows, (sg + 1) * rows)
            nt2 = best_t.reshape(rows, 128)
            ni2 = best_i.reshape(rows, 128)
            ot2 = bt_ref[sl, :]
            oi2 = bi_ref[sl, :]
            b2 = nt2 < ot2
            bt_ref[sl, :] = jnp.where(b2, nt2, ot2)
            bi_ref[sl, :] = jnp.where(b2, ni2, oi2)
        return 0

    jax.lax.fori_loop(0, used, batch_body, 0)
    t_ref[:, :] = bt_ref[:, :]
    idx_ref[:, :] = bi_ref[:, :]


# above this many triangles the weight slab stops fitting in VMEM next to
# the block temps -> stream tiles from HBM. The bf16 pack slab costs
# 128 KB/tile (512 B/tri), so the 100 MB scoped-VMEM cap admits ~200k tris;
# 128k keeps margin for the ray-block temps. Chip-validated at 79,488 tris
# (reference_bunny70k: resident 3.79 vs streaming 3.86 Mrays/s — compute
# parity, but the resident program compiles 2.6x faster).
VMEM_RESIDENT_MAX_TRIS = int(
    os.environ.get("MPT_RESIDENT_MAX_TRIS", str(128 * 1024))
)


# tile columns processed per in-kernel chunk of the fused cull kernel
# (bounds the (128, TC) slab-test temporaries to ~1 MB apiece)
CULL_TILE_CHUNK = 2048


def _cull_kernel(rayp_ref, tbt_ref, ghit_ref, gent_ref, lb_ref, *,
                 t_min: float, n_tiles: int):
    """Fused ray-vs-tile-AABB slab test with in-VMEM reductions.

    The XLA formulation of this cull (`_cull_hit_mask` + the reduce chain
    in the list builders) materializes several (n_tiles, N) f32/bool
    intermediates in HBM per advance — measured 45% of bunny300k device
    time (docs/PERFORMANCE.md round-4 profile: 4x select_reduce_fusion +
    the slab-test loop fusions ~250 of 562 ms). This kernel computes the
    same quantities in one pass, reduced to their compact forms before
    anything leaves VMEM:

      ghit (N/128, ntp) f32: 1.0 where ANY lane of the 128-lane subgroup
        enters the tile (the subgroup union the list builders need)
      gent (N/128, ntp) f32: the subgroup-min entry distance (+inf where
        no lane enters) — the entry-ordering / best-t-prune key
      lb   (N, 128)     f32: per-lane partial max entry, folded over tile
        columns mod 128; the true per-lane bound is the XLA-side max over
        the 128 columns (a (N,128) reduce — the fold avoids an in-kernel
        (128,1)->(1,128) relayout, CLAUDE.md reshape pathology)

    Rays ride on sublanes, tiles on lanes; per-lane occlusion bounds are
    pre-folded into the `occ` column (-inf for inactive lanes, so the
    `enter <= occ` test also kills them: enter >= t_min > -inf).
    Inactive/degenerate directions arrive as CLAMPED reciprocals (+-1e30,
    built by `_cull_pass`) so no inf*0 NaNs can occur — a d==0 axis with
    the origin outside the slab then correctly CULLS the tile (the XLA
    version conservatively passes it; both are sound, the kernel's is
    tighter)."""
    sub = BLOCK_R // 128
    ntp = tbt_ref.shape[1]
    tc = min(CULL_TILE_CHUNK, ntp)
    for sg in range(sub):
        r = rayp_ref[sg * 128 : (sg + 1) * 128, :]  # (128, 8)
        ox, oy, oz = r[:, 0:1], r[:, 1:2], r[:, 2:3]
        ix, iy, iz = r[:, 3:4], r[:, 4:5], r[:, 5:6]
        occ = r[:, 6:7]
        lb = jnp.full((128, 128), -_INF)
        for c0 in range(0, ntp, tc):
            w = min(tc, ntp - c0)
            lox = tbt_ref[0:1, c0 : c0 + w]
            loy = tbt_ref[1:2, c0 : c0 + w]
            loz = tbt_ref[2:3, c0 : c0 + w]
            hix = tbt_ref[4:5, c0 : c0 + w]
            hiy = tbt_ref[5:6, c0 : c0 + w]
            hiz = tbt_ref[6:7, c0 : c0 + w]
            t0 = (lox - ox) * ix
            t1 = (hix - ox) * ix
            en = jnp.maximum(jnp.minimum(t0, t1), t_min)
            ex = jnp.maximum(t0, t1)
            t0 = (loy - oy) * iy
            t1 = (hiy - oy) * iy
            en = jnp.maximum(en, jnp.minimum(t0, t1))
            ex = jnp.minimum(ex, jnp.maximum(t0, t1))
            t0 = (loz - oz) * iz
            t1 = (hiz - oz) * iz
            en = jnp.maximum(en, jnp.minimum(t0, t1))
            ex = jnp.minimum(ex, jnp.maximum(t0, t1))
            colm = (
                jax.lax.broadcasted_iota(jnp.int32, (1, w), 1) + c0
            ) < n_tiles  # padding tiles never pass
            hit = (ex > en) & (en <= occ) & colm
            ghit_ref[sg : sg + 1, c0 : c0 + w] = jnp.max(
                jnp.where(hit, 1.0, 0.0), axis=0, keepdims=True
            )
            gent_ref[sg : sg + 1, c0 : c0 + w] = jnp.min(
                jnp.where(hit, en, _INF), axis=0, keepdims=True
            )
            lbe = jnp.where(hit, en, -_INF)
            for k in range(w // 128):  # fold tile columns mod 128
                lb = jnp.maximum(lb, lbe[:, k * 128 : (k + 1) * 128])
        lb_ref[sg * 128 : (sg + 1) * 128, :] = lb


# tile count at which the fused Pallas cull kernel takes over from the
# XLA formulation. Small scenes lose to the kernel's fixed dispatch +
# operand-prep cost (flagship 40 tiles measured 32.8 -> 25.9 Mrays/s on
# the kernel); big scenes win big (the XLA path materializes (nt, N)
# intermediates in HBM — bunny300k device self-time 562 -> 456 ms).
CULL_KERNEL_MIN_TILES = int(os.environ.get("MPT_CULL_KMIN", "512"))

# --- signature-homogeneous subgroup regrouping (VERDICT r4 #1) -----------
#
# The kernels test each CULL_R-lane subgroup against the UNION of its
# lanes' passing tiles; on incoherent bounce distributions the union
# inflates pairs 6-60x over per-lane entitlement (benchmarks/cull_diag.py,
# docs/PERFORMANCE.md round 4) — the structural wall both kernels are
# pair-bound on. The pool sort already orders lanes by their coarse
# tile-set signature, but fixed 128-lane subgroup boundaries cut through
# signature runs, so most subgroups mix 2+ signatures. This pass re-places
# lanes into a padded buffer where every equal-signature run starts at a
# 128-lane boundary: each subgroup then holds ONE signature and its union
# collapses toward the run's shared tiles — the same property the
# reference's per-thread ordered BVH traversal gets for free
# (PathTracing.h:75-204), recovered at vector-register granularity.
# Padding lanes are inactive (they join no union and their subgroups walk
# only their run's tiles), so the extra width costs only the cull slab
# pass + per-cell fixed overhead, not pairs. When the run structure is too
# fragmented to fit the static capacity, the key coarsens (low signature
# bits drop — lexicographic neighbors merge) and ultimately falls back to
# the identity placement (= today's behavior).
#
# MEASURED A LARGE LOSS ON CHIP, hence OFF by default (round-5 A/B,
# docs/PERFORMANCE.md): flagship 32.7 -> 10.9 Mrays/s, bunny300k
# 5.6 -> 3.9. Two structural reasons: (1) the regroup runs per ADVANCE
# and its permutation traffic (a pmap scatter, act/occ/readback gathers
# at ~9-40 ns/row, one wide row gather each way) costs more than the
# whole intersection kernel it optimizes (~0.5 ms/advance on the
# flagship); (2) exactly where union inflation hurts — incoherent bounce
# distributions — signatures are nearly unique, run-alignment padding
# overflows any affordable capacity, and the pass degrades to identity
# placement + pure overhead. Kept as an opt-in experiment surface; the
# honest conclusion is that run-aligned subgroup homogeneity is not
# affordable at (8,128)-vreg granularity on this backend.
REGROUP = os.environ.get("MPT_REGROUP", "0") == "1"
# padded capacity = n * (1 + SLACK), rounded up to BLOCK_R
REGROUP_SLACK = float(os.environ.get("MPT_REGROUP_SLACK", "0.5"))

# static routing of the most recent _tri_hit_mm_padded TRACE (stream vs
# resident kernel, regroup engaged) — validation surface for the dryrun
LAST_PLAN: dict = {}


def _signature_key(x, active, occ, coarse_box, t_min):
    """Per-lane u32 coarse tile-set signature — the same quantity the
    integrator's 'tileset' sort key uses (one slab-test bit per coarse
    range AABB), with the lane's occlusion bound folded in so the
    signature matches what its tile lists will actually contain. Uses at
    most the first 32 boxes (one u32; the sort key carries a second word
    past 32, this opt-in experiment keeps one)."""
    n = x.shape[0]
    o, d = x[:, 6:9], x[:, 0:3]
    coarse_box = coarse_box[: min(32, coarse_box.shape[0])]
    chit, _ = _cull_hit_mask(o, d, active.reshape(n, 1), coarse_box,
                             t_min, occ)
    bits = jnp.uint32(1) << jnp.arange(
        coarse_box.shape[0], dtype=jnp.uint32
    )
    return jnp.sum(chit.astype(jnp.uint32) * bits[:, None], axis=0,
                   dtype=jnp.uint32)


def _regroup_dest(key, cap):
    """Monotone destination positions placing each equal-key run at a
    128-aligned start. Tries the exact key, then two coarsened levels
    (>>8, >>16 — adjacent signatures merge), then identity when even the
    coarse runs don't fit `cap`. One cummax + one cumsum per level."""
    n = key.shape[0]
    iota = jnp.arange(n, dtype=jnp.int32)

    def dest_for(shift):
        kk = jax.lax.shift_right_logical(
            key, jnp.uint32(shift)
        ) if shift else key
        newrun = jnp.concatenate(
            [jnp.ones((1,), bool), kk[1:] != kk[:-1]]
        )
        run_start = jax.lax.cummax(jnp.where(newrun, iota, 0))
        off = iota - run_start
        blockstart = (off % 128) == 0
        return (128 * (jnp.cumsum(blockstart.astype(jnp.int32)) - 1)
                + (off % 128))

    d0, d1, d2 = dest_for(0), dest_for(8), dest_for(16)
    # dest is monotone, so the last element is the max
    dest = jnp.where(
        d0[-1] < cap, d0,
        jnp.where(d1[-1] < cap, d1, jnp.where(d2[-1] < cap, d2, iota)),
    )
    return dest


def _regroup_lanes(x, active, occ, coarse_box, t_min, cap):
    """Gather (x, active, occ) into the `cap`-wide run-aligned placement.
    Returns the widened operands plus the (n,) dest map for reading the
    kernel's per-lane outputs back. Unfilled slots hold an inactive
    zero-ray (sentinel row n of each extended operand)."""
    n = x.shape[0]
    key = _signature_key(x, active, occ, coarse_box, t_min)
    dest = _regroup_dest(key, cap)
    pmap = jnp.full((cap,), n, jnp.int32).at[dest].set(
        jnp.arange(n, dtype=jnp.int32)
    )
    xg = jnp.concatenate(
        [x, jnp.zeros((1, x.shape[1]), x.dtype)]
    )[pmap]
    actg = jnp.concatenate(
        [active, jnp.zeros((1, 1), active.dtype)]
    )[pmap]
    occg = jnp.concatenate([occ, jnp.full((1,), _INF)])[pmap]
    return xg, actg, occg, dest


def _cull_pass(x, active, tile_box, t_min, occ=None, interpret=False):
    """Subgroup-granularity cull: returns
      sgm (N/128, nt) bool — per-128-lane-subgroup union hit mask
      gent (N/128, nt) f32 — subgroup-min entry (+inf where no hit)
      lane_bound (N,) f32 — per lane, max entry over ITS passing tiles
        (-inf when the lane passes none)
    x: (N, NUM_FEATURES) ray features (N a multiple of BLOCK_R);
    active: (N,) or (N, 1) float; occ: optional (N,) per-lane bound.

    Routes to the fused Pallas kernel past CULL_KERNEL_MIN_TILES, else the
    XLA slab test + reduces (identical results — tests pin bit-equality)."""
    n = x.shape[0]
    nt = tile_box.shape[0]
    if nt < CULL_KERNEL_MIN_TILES:
        o, d = x[:, 6:9], x[:, 0:3]
        act = active.reshape(n, 1)
        hit, enter = _cull_hit_mask(o, d, act, tile_box, t_min, occ)
        ent = jnp.where(hit, enter, _INF)  # (nt, n)
        lane_bound = jnp.max(jnp.where(hit, enter, -_INF), axis=0)
        sgm = hit.reshape(nt, n // 128, 128).any(axis=2).T
        gent = ent.reshape(nt, n // 128, 128).min(axis=2).T
        return sgm, gent, lane_bound
    ntp = -(-nt // 128) * 128
    o, d = x[:, 6:9], x[:, 0:3]
    inv = jnp.clip(1.0 / d, -1e30, 1e30)  # finite: no inf*0 NaN in-kernel
    occv = jnp.full((n,), _INF) if occ is None else occ
    occv = jnp.where(active.reshape(n) > 0.5, occv, -_INF)
    rayp = jnp.concatenate(
        [o, inv, occv[:, None], jnp.zeros((n, 1), jnp.float32)], axis=1
    )
    tbt = jnp.pad(tile_box, ((0, ntp - nt), (0, 0))).T  # (8, ntp)
    ghit, gent, lb = pl.pallas_call(
        functools.partial(_cull_kernel, t_min=float(t_min), n_tiles=nt),
        grid=(n // BLOCK_R,),
        in_specs=[
            pl.BlockSpec((BLOCK_R, 8), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((8, ntp), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=(
            pl.BlockSpec((BLOCK_R // 128, ntp), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((BLOCK_R // 128, ntp), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((BLOCK_R, 128), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((n // 128, ntp), jnp.float32),
            jax.ShapeDtypeStruct((n // 128, ntp), jnp.float32),
            jax.ShapeDtypeStruct((n, 128), jnp.float32),
        ),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=VMEM_LIMIT_BYTES
        ),
        interpret=interpret,
    )(rayp, tbt)
    lane_bound = jnp.max(lb, axis=1)
    return ghit[:, :nt] > 0.5, gent[:, :nt], lane_bound


def _cull_hit_mask(o, d, active, tile_box, t_min, occ=None):
    """Vectorized XLA slab test. Returns (hit (nt, N) bool — can this
    active ray enter this tile's AABB?, enter (nt, N) f32 — the ray's
    entry distance into the box, >= t_min). Runs fused in the surrounding
    jit; replaces ~1.7us/iteration of in-kernel scalar cull loop.

    `enter` is the ordered-traversal bound: any intersection with a
    triangle inside the box happens at t >= enter, so entry-sorted tile
    lists admit best-t early exit (the reference's BVH gets its O(log n)
    from the same argument — Scene.h:71-93 near-child-first ordering)."""
    n = o.shape[0]
    nt = tile_box.shape[0]
    inv = 1.0 / d
    # (nt, N) layout — rays on the 128-lane axis. The transposed (N, nt, 3)
    # formulation puts size-3/size-nt dims on lanes and measured 820 us/call
    # at 4096 rays (20x the kernel it feeds); this layout is ~trivial.
    enter = jnp.full((nt, n), t_min, jnp.float32)
    exit_ = jnp.full((nt, n), float("inf"), jnp.float32)
    for a in range(3):  # static 3-axis unroll
        lo = tile_box[:, a][:, None]
        hi = tile_box[:, 4 + a][:, None]
        oa = o[:, a][None, :]
        ia = inv[:, a][None, :]
        t0 = (lo - oa) * ia
        t1 = (hi - oa) * ia
        # 0 * inf = NaN when a direction component is 0 and the origin sits
        # exactly on the box plane; NaN would propagate and falsely CULL the
        # tile. Treat that axis as unconstraining (conservative).
        a_lo = jnp.minimum(t0, t1)
        a_hi = jnp.maximum(t0, t1)
        enter = jnp.maximum(enter, jnp.where(jnp.isnan(a_lo), -_INF, a_lo))
        exit_ = jnp.minimum(exit_, jnp.where(jnp.isnan(a_hi), _INF, a_hi))
    hit = (exit_ > enter) & (active.reshape(1, n) > 0.5)  # (nt, N)
    if occ is not None:
        # exact prune: a hit inside the tile satisfies t >= enter, so a
        # tile entered beyond the lane's known occlusion bound (the exact
        # sphere pass / a shadow ray's light distance) cannot win the merge
        hit &= enter <= occ.reshape(1, n)
    return hit, enter


def _cull_tile_lists(x, active, tile_box, t_min, occ=None,
                     block_r: int = 256, interpret: bool = False):
    """Per ray-block ENTRY-ORDERED passing-tile lists for the resident
    kernel. Returns:
      lists (nb, nt) int32: passing tiles first, nearest-entry first
      counts (nb,) int32
      smin (nb, nt) f32: the block-min entry distance of the tile at each
        list position (ascending; +inf at non-passing positions) — the
        kernel's best-t prune bound
      lane_bound (n,) f32: per lane, max entry over ITS passing tiles
        (-inf when the lane passes none)
    """
    n = x.shape[0]
    nb = n // block_r
    nt = tile_box.shape[0]
    sgm, gent128, lane_bound = _cull_pass(
        x, active, tile_box, t_min, occ, interpret
    )
    g = block_r // 128
    gent = gent128.reshape(nb, g, nt).min(axis=1)  # (nb, nt)
    counts = (
        sgm.reshape(nb, g, nt).any(axis=1).sum(axis=1).astype(jnp.int32)
    )
    # ONE two-operand sort returns the sorted entries AND the permutation:
    # the argsort + take_along_axis formulation paid ~5 ns/element of
    # scalar-gather tax for the take (5.2 ms/render per call site in the
    # in-situ HLO profile — fusion.880/.867)
    iota = jnp.broadcast_to(
        jnp.arange(nt, dtype=jnp.int32)[None, :], gent.shape
    )
    smin, lists = jax.lax.sort((gent, iota), dimension=1, num_keys=1,
                               is_stable=True)
    return lists, counts, smin, lane_bound


def _cull_stream_lists(x, active, tile_box, t_min, occ=None,
                       interpret: bool = False):
    """Streaming-kernel cull: ENTRY-ORDERED per-CULL_R-subgroup slot lists
    over the per-BLOCK_R union DMA list, plus the best-t early-exit tables.

    The union list is sorted by the block's minimum ray-entry distance into
    each tile (nearest tiles stream first). Because a hit inside a tile
    satisfies t >= entry, the kernel can stop as soon as the minimum entry
    of every REMAINING tile exceeds each lane's min(best_t so far, entry of
    the lane's own farthest passing tile) — the ordered-BVH-traversal
    argument (Scene.h near-child-first + PathTracing.h:102 best-t prune)
    at tile/batch granularity.

    Returns:
      slists (n_sub, nt) int32: each subgroup's passing tiles as POSITIONS
        in its block's union list (ascending; 0x7FFFFFF0 beyond count)
      starts (n_sub, nbat+1) int32: for DMA batch b, the subgroup's
        entries live at slists[g, starts[g,b]:starts[g,b+1]]
      ulists (nb, nt) int32: union tile ids, entry-ordered passing first
      ucounts (nb,) int32
      rme (nb, nbat+1) f32: min entry over union tiles at positions
        >= b*S — "remaining min entry" before batch b (+inf past the end)
      lane_bound (n,) f32: per lane, max entry over ITS passing tiles
        (-inf when the lane passes no tile)
      counts (n_sub,) int32: per-subgroup passing-tile counts (telemetry
        upper bound; early exit may test fewer)
    """
    n = x.shape[0]
    nt = tile_box.shape[0]
    n_sub = n // CULL_R_STREAM
    nb = n // BLOCK_R
    sub = BLOCK_R // CULL_R_STREAM
    S = STREAM_CACHE_SLOTS
    sgm128, gent128, lane_bound = _cull_pass(
        x, active, tile_box, t_min, occ, interpret
    )
    g = CULL_R_STREAM // 128
    sgm = sgm128.reshape(n_sub, g, nt).any(axis=1)  # (n_sub, nt)
    bent = gent128.reshape(nb, (BLOCK_R // 128), nt).min(axis=1)  # (nb, nt)
    ublk = sgm.reshape(nb, sub, nt).any(axis=1)  # (nb, nt)
    ucounts = ublk.sum(axis=1).astype(jnp.int32)
    # union list: passing tiles first, ordered by block entry distance
    # (non-passing tiles have bent=+inf; ties broken by tile id — argsort
    # on the (entry, id) pair via stable sort)
    # one two-operand sort: sorted entries + permutation, no gather (see
    # _cull_tile_lists)
    uiota = jnp.broadcast_to(
        jnp.arange(nt, dtype=jnp.int32)[None, :], bent.shape
    )
    bent_sorted, uorder = jax.lax.sort(
        (bent, uiota), dimension=1, num_keys=1, is_stable=True
    )  # bent_sorted ascending
    ulists = uorder
    nbat = -(-nt // S)
    probe = jnp.minimum(jnp.arange(nbat + 1, dtype=jnp.int32) * S, nt - 1)
    rme = jnp.where(
        (jnp.arange(nbat + 1)[None, :] * S) < ucounts[:, None],
        bent_sorted[:, probe],
        _INF,
    )
    # slot_map[b, t] = position of tile t in block b's union list — the
    # inverse permutation of uorder
    slot_map = jnp.zeros((nb, nt), jnp.int32).at[
        jnp.arange(nb)[:, None], uorder
    ].set(jnp.arange(nt, dtype=jnp.int32)[None, :])
    counts = sgm.sum(axis=1).astype(jnp.int32)
    block_of = jnp.arange(n_sub) // sub
    # subgroup lists: the subgroup's passing tiles by union position,
    # ascending (= entry order). Sort the per-tile union positions with
    # non-passing pushed to the end.
    sg_slots = jnp.where(sgm, slot_map[block_of], jnp.int32(0x7FFFFFF0))
    slists = jnp.sort(sg_slots, axis=1).astype(jnp.int32)
    nbat_chk = nbat
    bounds = jnp.arange(nbat_chk + 1, dtype=jnp.int32) * S
    starts = jax.vmap(
        lambda row: jnp.searchsorted(row, bounds, side="left")
    )(slists).astype(jnp.int32)
    return slists, starts, ulists, ucounts, rme, lane_bound, counts


@functools.partial(jax.jit, static_argnames=("t_min", "interpret"))
def _tri_hit_mm_padded(x, active, occ_t, w_all, tile_box, coarse_box,
                       t_min: float, interpret: bool):
    """occ_t (n,) f32: per-lane occlusion bound from primitives already
    intersected OUTSIDE this kernel (the exact sphere pass) — a tile whose
    entry distance exceeds it cannot produce the winning hit, so it folds
    into the lane relevance bound for the best-t prune (the same role the
    running closest-t plays across node kinds in the reference's BVH
    traversal, PathTracing.h:102). +inf disables.

    coarse_box (32, 8): the coarse range AABBs driving the signature-
    homogeneous regrouping (see REGROUP above); (0, 8) disables."""
    n_in = x.shape[0]
    regroup = (
        REGROUP and coarse_box.shape[0] > 0 and n_in >= 2 * BLOCK_R
    )
    dest = None
    if regroup:
        cap = n_in + max(
            BLOCK_R,
            -(-int(n_in * REGROUP_SLACK) // BLOCK_R) * BLOCK_R,
        )
        x, active, occ_t, dest = _regroup_lanes(
            x, active, occ_t, coarse_box, t_min, cap
        )
    n = x.shape[0]
    n_tiles = w_all.shape[0]  # (n_tiles, W_ROWS, 4*tile_p)
    tile_p = w_all.shape[2] // 4  # per-scene tile size (build_weights)
    cull_r = CULL_R or (
        CULL_R_SMALL if n_tiles * tile_p <= TILE_SWITCH_TRIS
        else CULL_R_LARGE
    )
    grid = (n // BLOCK_R,)
    sub = BLOCK_R // CULL_R_STREAM  # stream-branch spec grouping

    stream = (n_tiles * tile_p) > VMEM_RESIDENT_MAX_TRIS
    # SMEM guard: the resident kernel ships its lists + smin as WHOLE
    # (n_sub, n_tiles) SMEM arrays (4B each); past ~1 MB Mosaic fails with
    # "Ran out of memory in memory space smem" (hit at tile_p=128 on the
    # 79k-tri bunny: 256 subgroups x 622 tiles x 8B = 1.27 MB). The
    # streaming kernel's blocked SMEM specs stay bounded — route there.
    if not stream and (n // cull_r) * n_tiles * 8 > 768 * 1024:
        stream = True
    x_spec = pl.BlockSpec((BLOCK_R, NUM_FEATURES), lambda i: (i, 0),
                          memory_space=pltpu.VMEM)
    out_specs = (
        pl.BlockSpec((BLOCK_R // 128, 128), lambda i: (i, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((BLOCK_R // 128, 128), lambda i: (i, 0),
                     memory_space=pltpu.VMEM),
    )

    # cull lists ride as plain SMEM inputs, NOT PrefetchScalarGridSpec:
    # the prefetch wrapper measured ~800x slower for the identical kernel
    # body on this toolchain (744 vs 0.9 us/tile-matmul — see
    # docs/PERFORMANCE.md "scalar-prefetch pathology"). The streaming
    # kernel's lists are BLOCKED per grid cell so SMEM holds only one
    # block's rows at a time (large scenes have hundreds of tiles).
    if stream:
        slists, starts, ulists, ucounts, rme, lane_bound, scounts = (
            _cull_stream_lists(x, active, tile_box, t_min, occ_t,
                               interpret=interpret)
        )
        lane_bound = jnp.minimum(lane_bound, occ_t)
        nbat = starts.shape[1] - 1
        kernel = functools.partial(_mm_kernel_stream, t_min=t_min,
                                   tile_p=tile_p)
        # Mosaic blocked-SMEM specs need the last two block dims divisible
        # by (8, 128) or equal to the array dims: pad the tile axis to 128
        # columns, deliver slists/starts per-cell (sub = 8 rows), and ship
        # ulists in groups of 8 block-rows (the kernel indexes cell % 8).
        assert sub % 8 == 0, "BLOCK_R // CULL_R must be a multiple of 8"
        ntp = -(-n_tiles // 128) * 128
        nbp = -(-(n // BLOCK_R) // 8) * 8
        slists = jnp.pad(slists, ((0, 0), (0, ntp - n_tiles)),
                         constant_values=0x7FFFFFF0)
        ulists = jnp.pad(ulists, ((0, nbp - ulists.shape[0]),
                                  (0, ntp - n_tiles)))
        lb2 = lane_bound.reshape(n // 128, 128)
        in_specs = [
            pl.BlockSpec((sub, ntp), lambda i: (i, 0),
                         memory_space=pltpu.SMEM),
            pl.BlockSpec((sub, nbat + 1), lambda i: (i, 0),
                         memory_space=pltpu.SMEM),
            pl.BlockSpec((8, ntp), lambda i: (i // 8, 0),
                         memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pltpu.SMEM),  # ucounts: whole (nb,)
            pl.BlockSpec(memory_space=pltpu.SMEM),  # rme: whole (nb, nbat+1)
            x_spec,
            pl.BlockSpec((BLOCK_R // 128, 128), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),  # lane_bound
            pl.BlockSpec(memory_space=pl.ANY),  # weights stay in HBM
        ]
        args = (slists, starts, ulists, ucounts, rme, x, lb2, w_all)
        scratch = [
            pltpu.VMEM((BLOCK_R // 128, 128), jnp.float32),
            pltpu.VMEM((BLOCK_R // 128, 128), jnp.int32),
            pltpu.VMEM((STREAM_CACHE_SLOTS, W_ROWS, 4 * tile_p), W_DTYPE),
            pltpu.SemaphoreType.DMA((STREAM_CACHE_SLOTS,)),
        ]
        pair_counts = scounts
    else:
        lists, counts, smin, lane_bound = _cull_tile_lists(
            x, active, tile_box, t_min, occ_t, block_r=cull_r,
            interpret=interpret,
        )
        lane_bound = jnp.minimum(lane_bound, occ_t)
        kernel = functools.partial(_mm_kernel, t_min=t_min,
                                   tile_p=tile_p, cull_r=cull_r)
        in_specs = [
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pltpu.SMEM),  # smin (n_sub, nt) f32
            x_spec,
            pl.BlockSpec((BLOCK_R // 128, 128), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),  # lane_bound
            pl.BlockSpec((n_tiles, W_ROWS, 4 * tile_p), lambda i: (0, 0, 0),
                         memory_space=pltpu.VMEM),
        ]
        args = (lists, counts, smin, x, lane_bound.reshape(n // 128, 128),
                w_all)
        scratch = []  # resident kernel keeps bests in loop carries
        pair_counts = counts

    global LAST_PLAN
    LAST_PLAN = dict(stream=bool(stream), regroup=bool(regroup),
                     n_lanes=int(n), tile_p=int(tile_p))
    t, idx = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=in_specs,
        out_specs=out_specs,
        scratch_shapes=scratch,
        out_shape=(
            jax.ShapeDtypeStruct((n // 128, 128), jnp.float32),
            jax.ShapeDtypeStruct((n // 128, 128), jnp.int32),
        ),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=VMEM_LIMIT_BYTES
        ),
        interpret=interpret,
    )(*args)
    # tested (ray, triangle) pairs this call in units of 2^20 ("mega
    # pairs") — the MFU numerator (each passing subgroup-list entry runs
    # CULL_R x TILE_P Moller-Trumbore tests on the MXU). f32 mega-pair
    # units keep long renders well inside float precision.
    pair_lanes = CULL_R_STREAM if stream else cull_r
    tile_passes = jnp.sum(pair_counts).astype(jnp.float32) * (
        pair_lanes * tile_p / float(1 << 20)
    )
    t, idx = t.reshape(n), idx.reshape(n)
    if regroup:  # read each source lane's result from its placed slot
        t, idx = t[dest], idx[dest]
    return t, idx, tile_passes


def _sphere_hit_exact(scene, o, d, t_min):
    """Exact dense sphere pass: (N, S) oracle quadratic (oc = o - c first, no
    cancellation). S is small — the mesh carries the primitive count.
    Returns (t, idx, center) for normal computation.

    The winner's (t, id, center) come out of masked REDUCES over the tiny
    (N, S) field, never per-lane gathers: take_along_axis on the lane axis
    measured 36 ms/render (11 ns/ray) in the in-situ HLO profile — scalar
    gathers are the split path's real tax on this backend."""
    from metalpathtracer_tpu.render.intersect import ray_sphere

    t = ray_sphere(
        o[:, None, :],
        d[:, None, :],
        scene.sph_center[None, :, :],
        scene.sph_radius[None, :],
        t_min,
    )  # (N, S); padding has r=0 → disc <= 0 → inf
    t_best = jnp.min(t, axis=1)
    win = t == t_best[:, None]  # >=1 True per row; ties pick the lowest slot
    first = jnp.cumsum(win.astype(jnp.int32), axis=1) == 1
    win = win & first
    wf = win.astype(jnp.float32)
    idx = jnp.sum(
        jnp.where(win, scene.sph_ids[None, :], 0), axis=1, dtype=jnp.int32
    )
    idx = jnp.where(jnp.isinf(t_best), -1, idx)
    center = jnp.dot(
        wf, scene.sph_center, precision=jax.lax.Precision.HIGHEST
    )  # (N, S) @ (S, 3); HIGHEST: default TPU matmul bf16-rounds centers
    mat_id = jnp.sum(
        jnp.where(win, scene.sph_mat_id[None, :], 0), axis=1, dtype=jnp.int32
    )
    return t_best, idx, center, mat_id


def closest_hit_mm_full(scene, o, d, t_min=T_MIN, active=None, occ_t=None):
    """Closest hit: MXU triangle kernel + exact sphere pass, merged.

    Returns (t, idx, normal, front_face, mat_id, tile_passes) — the
    surface frame AND
    the winner's material-bank id come out of the same single (N,16) row
    gather (plus masked reduces for spheres), so the integrator pays no
    further geometry or id gathers. idx is -1 on miss (normal/mat_id are
    garbage there; callers mask). `active` (N,) bool lets the kernel skip
    ray blocks whose lanes have all terminated (wavefront early-out).

    `occ_t` (N,) optional: per-lane caller-known occlusion bound — hits
    beyond it cannot matter to the caller (e.g. a shadow ray's light
    distance). Tiles entirely beyond the bound are pruned; the returned
    closest hit is exact for t <= occ_t and unspecified-but-farther
    beyond it.
    """
    from metalpathtracer_tpu.core import vecmath as vm

    n = o.shape[0]
    t_s, i_s, c, m_s = _sphere_hit_exact(scene, o, d, t_min)
    sph_point = o + t_s[:, None] * d
    sph_n = vm.normalize(sph_point - c)

    if scene.num_tris > 0:
        pad = (-n) % BLOCK_R
        x = ray_features(o, d)
        if active is None:
            act = jnp.ones((n, 1), jnp.float32)
        else:
            act = active.astype(jnp.float32)[:, None]
        # the exact sphere pass already bounds the winner: a tile whose
        # entry exceeds the lane's sphere hit can't matter (best-t prune
        # across primitive kinds, like the reference's single traversal)
        occ = t_s if occ_t is None else jnp.minimum(t_s, occ_t)
        if pad:
            x = jnp.concatenate([x, jnp.zeros((pad, NUM_FEATURES), jnp.float32)])
            act = jnp.concatenate([act, jnp.zeros((pad, 1), jnp.float32)])
            occ = jnp.concatenate([occ, jnp.full((pad,), jnp.inf)])
        interpret = jax.default_backend() == "cpu"
        t_t, col, tile_passes = _tri_hit_mm_padded(
            x, act, occ, scene.mm_w, scene.mm_tile_box,
            scene.mm_coarse_box, float(t_min), interpret,
        )
        t_t, col = t_t[:n], col[:n]
        ccol = jnp.maximum(col, 0)

        # ONE packed (N,8) row gather serves refine, normal, prim id and
        # material id: [n, n.v0, prim_id, mat_id] (see build_weights — the
        # winner's exact t comes from the plane equation, so the row no
        # longer carries v0/e1/e2)
        row = scene.mm_refine[ccol]
        nvec = row[:, 0:3]
        ndotv0 = row[:, 3]
        i_t = row[:, 4].astype(jnp.int32)
        m_t = row[:, 5].astype(jnp.int32)
        denom = vm.dot(nvec, d)  # = -a (MT's sa determinant), exact f32
        parallel = jnp.abs(denom) <= TRI_PARALLEL_EPS
        t_plane = (ndotv0 - vm.dot(nvec, o)) / jnp.where(
            parallel, 1.0, denom
        )
        t_exact = jnp.where(
            (~parallel) & (t_plane > t_min), t_plane, jnp.inf
        )
        # If the exact re-refine rejects the kernel's approximate winner,
        # keep the approximate t (it passed the same acceptance tests in
        # matmul precision) rather than reporting a miss — dropping it
        # produced rare sparkle/leak pixels near edges where the two
        # precisions disagree (ADVICE.md r1).
        tri_hit = (col >= 0) & jnp.isfinite(t_t)
        t_t = jnp.where(
            tri_hit, jnp.where(jnp.isfinite(t_exact), t_exact, t_t), jnp.inf
        )
        i_t = jnp.where(tri_hit, i_t, -1)
        tri_n = vm.normalize(nvec)
    else:
        t_t = jnp.full((n,), jnp.inf)
        i_t = jnp.full((n,), -1, jnp.int32)
        m_t = jnp.zeros((n,), jnp.int32)
        tri_n = jnp.zeros_like(o)
        tile_passes = jnp.zeros((), jnp.float32)

    tri_wins = t_t < t_s
    t = jnp.where(tri_wins, t_t, t_s)
    idx = jnp.where(tri_wins, i_t, i_s)
    mat_id = jnp.where(tri_wins, m_t, m_s)
    normal = vm.where3(tri_wins, tri_n, sph_n)
    front_face = vm.dot(normal, d) < 0.0
    normal = vm.where3(front_face, normal, -normal)
    return t, idx, normal, front_face, mat_id, tile_passes


def closest_hit_mm(scene, o, d, t_min=T_MIN, active=None):
    """(t, idx)-only contract, matching `traverse.closest_hit_bvh`."""
    t, idx = closest_hit_mm_full(scene, o, d, t_min, active)[:2]
    return t, idx
