"""Benchmark harness — prints ONE JSON line with the headline metric.

Metric: Mrays/sec/chip on the flagship scene (the reference's shipped scene:
3 spheres + 4968-tri bunny, `scenes/reference.xml`) at the reference's
default 1280x720 / 32-bounce configuration (`ApplicationDelegate.cpp:24`,
`PathTracing.h:216`). Baseline: the BASELINE.md north-star target of
100 Mrays/sec/chip on TPU v5e (the reference publishes no numbers of its
own — SURVEY.md §6).

Rays are counted exactly: the integrator sums live lanes per bounce
(`metalpathtracer_tpu/render/integrator.py`), so Mrays/sec reflects rays
actually traced, not pixels x spp x max_depth.
"""

from __future__ import annotations

import json
import os
import sys
import time

# persistent compile cache: repeat runs skip the slow remote XLA compiles
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/.cache/jax_tpu_cache")
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "1")

BASELINE_MRAYS = 100.0  # BASELINE.md target: >=100 Mrays/sec/chip on v5e


def main() -> int:
    import jax

    repo = os.path.dirname(os.path.abspath(__file__))
    sys.path.insert(0, repo)

    from metalpathtracer_tpu.render import (
        Camera,
        render_image_wavefront,
        upload_scene,
    )
    from metalpathtracer_tpu.render.integrator import RenderConfig
    from metalpathtracer_tpu.scene import load_scene_xml

    dev = jax.devices()[0]
    print(f"benchmarking on {dev.platform} ({dev})", file=sys.stderr)

    scene = upload_scene(load_scene_xml(os.path.join(repo, "scenes", "reference.xml")))
    camera = Camera.reset()  # the reference's default view
    width, height = 1280, 720
    cfg = RenderConfig(max_depth=32, bounces_per_iter=2)
    spp = 4

    # pool 2^12 measured optimal for this open scene (drain-tail cost scales
    # with pool size; see docs/PERFORMANCE.md)
    pool = 1 << 12

    # warmup / compile
    img, rays = render_image_wavefront(scene, camera, width, height, spp, seed=0, cfg=cfg, pool_size=pool)
    jax.block_until_ready(img)

    # timed: best of repeated passes
    best = 0.0
    for rep in range(3):
        t0 = time.perf_counter()
        img, rays = render_image_wavefront(
            scene, camera, width, height, spp, seed=rep + 1, cfg=cfg,
            pool_size=pool,
        )
        jax.block_until_ready(img)
        dt = time.perf_counter() - t0
        mrays = rays / dt / 1e6
        best = max(best, mrays)
        print(
            f"pass {rep}: {rays} rays in {dt:.3f}s = {mrays:.2f} Mrays/s",
            file=sys.stderr,
        )

    print(
        json.dumps(
            {
                "metric": "Mrays/sec/chip (reference scene, 720p, 32 bounces)",
                "value": round(best, 3),
                "unit": "Mrays/s",
                "vs_baseline": round(best / BASELINE_MRAYS, 4),
            }
        )
    )
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
