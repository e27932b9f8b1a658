"""One timed wavefront render with CLI-selected knobs — the sweep unit.

Run under different MPT_* env vars (block sizes bind at import time) and
compare the printed Mrays/s. End-to-end only: standalone kernel timings lie
on this backend (docs/PERFORMANCE.md "measurement trap").

Usage: python benchmarks/perf_probe.py [--pool LOG2]
           [--bpi N] [--spp N] [--depth N] [--scene PATH] [--tag STR]
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
    ap.add_argument("--sort", action=argparse.BooleanOptionalAction,
                    default=True,
                    help="cfg.sort_lanes pool sorting (DEFAULT ON — the "
                    "production default; round-3 sweeps measured with the "
                    "old store_true default silently compared unsorted "
                    "configs)")
    ap.add_argument("--sort-key", default="tileset",
                    choices=("morton", "tileset", "neartile"),
                    help="pool sort key (default matches the production "
                    "RenderConfig.sort_key)")
    ap.add_argument("--pool", type=int, default=12, help="log2 pool size")
    ap.add_argument("--bpi", type=int, default=2)
    ap.add_argument("--spp", type=int, default=4)
    ap.add_argument("--depth", type=int, default=32)
    ap.add_argument("--width", type=int, default=1280)
    ap.add_argument("--height", type=int, default=720)
    ap.add_argument("--scene", default=None)
    ap.add_argument("--tag", default="")
    ap.add_argument("--reps", type=int, default=3)
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
    from metalpathtracer_tpu.scene import load_scene_xml

    scene_path = args.scene or os.path.join(repo, "scenes", "reference.xml")
    scene = upload_scene(load_scene_xml(scene_path))
    camera = Camera.reset()
    cfg = RenderConfig(
        max_depth=args.depth,
        bounces_per_iter=args.bpi,
        sort_lanes=args.sort,
        sort_key=args.sort_key,
    )

    kw = dict(spp=args.spp, cfg=cfg, pool_size=1 << args.pool)
    t0 = time.perf_counter()
    img, rays = render_image_wavefront(
        scene, camera, args.width, args.height, seed=0, **kw
    )
    jax.block_until_ready(img)
    compile_s = time.perf_counter() - t0

    best = 0.0
    for rep in range(args.reps):
        t0 = time.perf_counter()
        img, rays = render_image_wavefront(
            scene, camera, args.width, args.height, seed=rep + 1, **kw
        )
        jax.block_until_ready(img)
        dt = time.perf_counter() - t0
        best = max(best, rays / dt / 1e6)

    print(
        json.dumps(
            dict(
                tag=args.tag,
                mrays=round(best, 3),
                        pool=args.pool,
                bpi=args.bpi,
                mean=float(img.mean()),
                compile_s=round(compile_s, 1),
                env={
                    k: v for k, v in os.environ.items() if k.startswith("MPT_")
                },
            )
        )
    )
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
