"""On-chip fused-advance gate (render/pallas/advance_mm.py).

CPU interpret tests pin the fused kernel's estimator state bit-exactly to
the split path, but the round-2 precision incident (Mosaic's default f32
matmul silently corrupted intersections ON CHIP while CPU tests passed)
makes an on-hardware comparison the required gate for any kernel math.

On chip the two paths are NOT per-sample comparable: 1-ulp FMA-contraction
differences in ray geometry flip grazing/self-intersection outcomes on
~1% of lanes per bounce (measured; see advance_mm.py's docstring — the
same class of flip any recompilation of the split path could produce), so
individual low-spp images diverge chaotically while both estimators stay
unbiased. The sound hardware gate is CONVERGED agreement: render both
paths at moderate spp and require the image MEANS and the per-pixel RMSE
(which averages the chaos over samples) to sit at fp-chaos level. A real
precision bug in the fused det matmul / refine extraction / baked
material tables / shade math is systematic and blows the mean gate.

Usage: python benchmarks/fused_check.py [--size 160 90] [--spp 64]
Prints one JSON line; exit 1 on gate failure.
"""

from __future__ import annotations

import argparse
import json
import os
import sys

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/.cache/jax_tpu_cache")
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "1")


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--size", type=int, nargs=2, default=(160, 90))
    ap.add_argument("--spp", type=int, default=64)
    ap.add_argument("--depth", type=int, default=8)
    ap.add_argument("--pool", type=int, default=1 << 14)
    args = ap.parse_args()

    import jax

    jax.config.update(
        "jax_compilation_cache_dir", os.environ["JAX_COMPILATION_CACHE_DIR"]
    )
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1)

    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    sys.path.insert(0, repo)

    import numpy as np

    from metalpathtracer_tpu.render import Camera, upload_scene
    from metalpathtracer_tpu.render.integrator import RenderConfig
    from metalpathtracer_tpu.render.pipeline import render_image_wavefront
    from metalpathtracer_tpu.scene import presets

    scene = upload_scene(
        presets.reference_default(
            os.path.join(repo, "assets", "bunny.obj")
        )
    )
    cam = Camera.reset()
    w, h = args.size
    imgs, rays = {}, {}
    for name, fused in (("split", False), ("fused", True)):
        cfg = RenderConfig(max_depth=args.depth, fused=fused)
        img, r = render_image_wavefront(
            scene, cam, w, h, spp=args.spp, seed=11, cfg=cfg,
            pool_size=args.pool,
        )
        imgs[name] = np.asarray(img)
        rays[name] = int(r)

    a, b = imgs["split"], imgs["fused"]
    rmse = float(np.sqrt(np.mean((a - b) ** 2)))
    mean_diff = float(abs(a.mean() - b.mean()))
    ray_rel = abs(rays["split"] - rays["fused"]) / max(rays["split"], 1)
    # at spp 64 the per-bounce edge-flip chaos averages: each pixel's
    # diff is ~(flips/spp); systematic precision bugs shift the MEAN
    ok = rmse < 3e-2 and mean_diff < 1e-3 and ray_rel < 0.02
    print(json.dumps(dict(
        rmse=rmse, mean_diff=mean_diff,
        rays_split=rays["split"], rays_fused=rays["fused"],
        ray_rel=ray_rel, verdict="ok" if ok else "FAIL",
    )))
    return 0 if ok else 1


if __name__ == "__main__":
    raise SystemExit(main())
