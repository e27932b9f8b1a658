"""Megakernel body-cost attribution (standalone Pallas timing is legit —
Pallas kernels don't fuse; docs/PERFORMANCE.md measurement rule).

Runs the fused bounce kernel on a bunny-scene pool with MPT_MK_ABLATE in
{isect, fetch, full} and reports us/call — pinpointing where the measured
3.3x overhead vs the split kernel lives (intersection matmuls vs one-hot
winner fetch vs the shading/RNG tail on (B,16)-packed state).

Usage: MPT_MK_ABLATE=isect python benchmarks/mk_ablate.py [--pool 12]
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/.cache/jax_tpu_cache")
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "1")


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--pool", type=int, default=12, help="log2 pool size")
    ap.add_argument("--chain", type=int, default=16)
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp
    # the env vars alone do NOT engage the persistent cache on this
    # backend (verified: entries only appear after explicit config.update)
    try:
        jax.config.update(
            "jax_compilation_cache_dir",
            os.environ["JAX_COMPILATION_CACHE_DIR"],
        )
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1)
    except Exception:
        pass

    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    sys.path.insert(0, repo)

    from metalpathtracer_tpu.core import rng
    from metalpathtracer_tpu.render import Camera, upload_scene
    from metalpathtracer_tpu.render.pallas import bounce_mk as MK
    from metalpathtracer_tpu.render.pallas.intersect_mm import (
        T_MIN,
        _cull_tile_lists_od,
    )
    from metalpathtracer_tpu.render.pipeline import generate_rays
    from metalpathtracer_tpu.scene import load_scene_xml

    scene = upload_scene(load_scene_xml(os.path.join(repo, "scenes", "reference.xml")))
    cam = Camera.reset()
    pool = 1 << args.pool
    n_sph = int(scene.mk_sph_table.shape[0])
    seed = rng.seed_from_int(0)

    # scattered primary rays as a representative mixed workload
    pix = (jnp.arange(pool, dtype=jnp.uint32) * 131 + 7) % jnp.uint32(1280 * 720)
    o, d = generate_rays(cam, 1280, 720, pix, jnp.uint32(0), seed)
    sf = jnp.zeros((pool, MK.STATE_F_COLS), jnp.float32)
    sf = sf.at[:, 0:3].set(o).at[:, 3:6].set(d)
    sf = sf.at[:, 9:12].set(1.0)
    si = jnp.zeros((pool, MK.STATE_I_COLS), jnp.int32)
    si = si.at[:, MK.I_PIXEL].set(pix.astype(jnp.int32))
    si = si.at[:, MK.I_ACTIVE].set(1)
    params = jnp.broadcast_to(seed, (4,))

    import functools

    @functools.partial(jax.jit, static_argnames=("k",))
    def chain(sf, si, k):
        for _ in range(k):
            lists, counts = _cull_tile_lists_od(
                sf[:, 0:3], sf[:, 3:6],
                (si[:, MK.I_ACTIVE] > 0).astype(jnp.float32)[:, None],
                scene.mm_tile_box, T_MIN, block_r=MK.MK_BLOCK_R,
            )
            sf, si = MK.bounce_megakernel(
                sf, si, lists, counts, params, scene.mk_sph_scalars,
                scene.mm_w, scene.mk_tri_table, scene.mk_sph_table,
                n_sph, 0, float(T_MIN), False,
            )
            si = si.at[:, MK.I_ACTIVE].set(1)  # keep all lanes hot
        return sf, si

    out = chain(sf, si, args.chain)
    jax.block_until_ready(out)
    best = float("inf")
    for _ in range(3):
        t0 = time.perf_counter()
        out = chain(sf, si, args.chain)
        v = float(out[0][0, 12])  # value fetch = real barrier
        dt = time.perf_counter() - t0
        best = min(best, dt)
    print(
        json.dumps(
            dict(
                ablate=MK.MK_ABLATE,
                pool=pool,
                us_per_call=round(best / args.chain * 1e6, 1),
                blocks=pool // MK.MK_BLOCK_R,
            )
        )
    )
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
