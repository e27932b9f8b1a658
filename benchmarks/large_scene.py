"""Large-scene stress: the HBM-streaming MXU intersector on the real chip.

Validates the production route for scenes far beyond VMEM residency
(docs/PERFORMANCE.md: the jnp BVH-traversal fallback is gather-bound and
once crashed the TPU worker; the streaming kernel DMAs only culled weight
tiles). Renders a random triangle cloud at the given scale and prints
Mrays/s.

Usage: python benchmarks/large_scene.py [--tris 1000000] [--spp 2] ...
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
    ap.add_argument("--tris", type=int, default=1_000_000)
    ap.add_argument("--preset", default=None,
                    help="use a scene preset (e.g. reference_bunny70k) "
                    "instead of a random cloud")
    ap.add_argument("--width", type=int, default=512)
    ap.add_argument("--height", type=int, default=512)
    ap.add_argument("--spp", type=int, default=2)
    ap.add_argument("--depth", type=int, default=8)
    ap.add_argument("--pool", type=int, default=15)  # chip: bunny70k 2^12/14/15 -> 5.67/6.83/6.98 Mrays/s
    ap.add_argument("--intersector", default="mm", choices=("mm", "bvh"))
    args = ap.parse_args()

    import jax

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

    from metalpathtracer_tpu.render import (
        Camera,
        render_image_wavefront,
        upload_scene,
    )
    from metalpathtracer_tpu.render.integrator import RenderConfig
    from metalpathtracer_tpu.scene import presets

    t0 = time.perf_counter()
    if args.preset:
        host = getattr(presets, args.preset)()
        args.tris = -1  # reported from the scene below
    else:
        host = presets.random_tri_cloud(args.tris, seed=1)
    scene = upload_scene(host)
    print(
        f"scene: {args.tris} tris built+uploaded in "
        f"{time.perf_counter() - t0:.1f}s; mm_w {scene.mm_w.shape} "
        f"({scene.mm_w.nbytes / 1e6:.0f} MB), "
        f"{scene.mm_tile_box.shape[0]} tiles",
        file=sys.stderr,
    )

    if args.preset:
        camera = Camera.reset()  # the reference scene's default view
    else:
        camera = Camera.look_at((0, 0, 28), (0, 0, 0), vfov_deg=55.0)
    cfg = RenderConfig(
        max_depth=args.depth, bounces_per_iter=1, intersector=args.intersector
    )

    t0 = time.perf_counter()
    img, rays = render_image_wavefront(
        scene, camera, args.width, args.height, args.spp, seed=0, cfg=cfg,
        pool_size=1 << args.pool,
    )
    jax.block_until_ready(img)
    compile_s = time.perf_counter() - t0

    best = 0.0
    for rep in range(2):
        t0 = time.perf_counter()
        img, rays = render_image_wavefront(
            scene, camera, args.width, args.height, args.spp, seed=rep + 1,
            cfg=cfg, pool_size=1 << args.pool,
        )
        jax.block_until_ready(img)
        best = max(best, rays / (time.perf_counter() - t0) / 1e6)

    import numpy as np

    a = np.asarray(img)
    print(
        json.dumps(
            dict(
                tris=args.tris,
                mrays=round(best, 3),
                intersector=args.intersector,
                compile_s=round(compile_s, 1),
                mean=float(a.mean()),
                finite=bool(np.isfinite(a).all()),
            )
        )
    )
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
