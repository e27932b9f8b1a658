"""On-chip brute-force-oracle arbitration of the MXU intersector.

The round-2 precision bug (Mosaic's default f32 matmul is bf16-class and
silently flipped intersection accept/reject decisions ON CHIP while exact-f32
CPU interpret tests passed) makes this the required gate for ANY change to
the determinant math: run the mm kernel and the chunked brute-force oracle
over the same rays ON THE HARDWARE and diff hit ids and distances.

Ray sets:
  - bunny: the reference scene's 4,968-tri bunny + spheres, primary rays
    from the default camera plus incoherent rays from scattered origins.
  - cloud: a random sliver-triangle cloud (default 100k tris -> exercises
    the HBM-streaming kernel) with incoherent rays.

Usage: python benchmarks/oracle_check.py [--cloud-tris 100000] [--rays 4096]
Prints one JSON line: max |t| diff on agreeing ids, # id mismatches, verdict.
Exit code 1 if mismatches exceed the edge-flip allowance (0.5% of hits).
"""

from __future__ import annotations

import argparse
import json
import os
import sys

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/.cache/jax_tpu_cache")
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "1")
# the cloud leg exists to validate the HBM-STREAMING kernel; the production
# residency cap (128k tris) would route a 100k cloud resident, so pin the
# cap below it for this gate (must be set before the kernel module imports)
os.environ.setdefault("MPT_RESIDENT_MAX_TRIS", "16384")


def _ray_batches(n, seed, lo, hi, rng_np):
    import numpy as np

    o = rng_np.uniform(lo, hi, (n, 3)).astype(np.float32)
    target = rng_np.uniform(lo, hi, (n, 3)).astype(np.float32)
    d = target - o
    nrm = np.linalg.norm(d, axis=1, keepdims=True)
    d = (d / np.maximum(nrm, 1e-8)).astype(np.float32)
    return o, d


def check(scene, o, d, tag):
    import jax
    import numpy as np

    from metalpathtracer_tpu.render.intersect import closest_hit_bruteforce
    from metalpathtracer_tpu.render.pallas.intersect_mm import closest_hit_mm

    t_mm, i_mm = jax.jit(closest_hit_mm)(scene, o, d)
    t_br, i_br = jax.jit(closest_hit_bruteforce)(scene, o, d)
    t_mm, i_mm = np.asarray(t_mm), np.asarray(i_mm)
    t_br, i_br = np.asarray(t_br), np.asarray(i_br)

    id_mismatch = int((i_mm != i_br).sum())
    both = (i_mm == i_br) & (i_br >= 0)
    tdiff = float(np.abs(t_mm[both] - t_br[both]).max()) if both.any() else 0.0
    hits = int((i_br >= 0).sum())
    rel = id_mismatch / max(hits, 1)
    print(
        f"{tag}: {hits} hits, {id_mismatch} id mismatches "
        f"({100 * rel:.3f}%), max t diff {tdiff:.3e}",
        file=sys.stderr,
    )
    return dict(tag=tag, hits=hits, id_mismatch=id_mismatch,
                max_t_diff=tdiff, mismatch_frac=rel)


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--cloud-tris", type=int, default=100_000)
    ap.add_argument("--rays", type=int, default=4096)
    ap.add_argument("--skip-cloud", action="store_true")
    args = ap.parse_args()

    import jax
    import numpy as np

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

    import jax.numpy as jnp

    from metalpathtracer_tpu.render import upload_scene
    from metalpathtracer_tpu.render.pallas.intersect_mm import (
        MM_PRECISION_MODE,
    )
    from metalpathtracer_tpu.scene import load_scene_xml, presets

    print(
        f"backend {jax.default_backend()}, precision mode {MM_PRECISION_MODE}",
        file=sys.stderr,
    )
    rng_np = np.random.default_rng(11)
    results = []

    scene = upload_scene(
        load_scene_xml(os.path.join(repo, "scenes", "reference.xml"))
    )
    o, d = _ray_batches(args.rays, 0, -2.0, 2.0, rng_np)
    results.append(check(scene, jnp.asarray(o), jnp.asarray(d), "bunny"))

    if not args.skip_cloud:
        cloud = upload_scene(presets.random_tri_cloud(args.cloud_tris, seed=1))
        o, d = _ray_batches(args.rays, 1, -12.0, 12.0, rng_np)
        results.append(check(cloud, jnp.asarray(o), jnp.asarray(d), "cloud"))

    worst = max(r["mismatch_frac"] for r in results)
    ok = worst <= 0.005 and all(r["max_t_diff"] < 1e-3 for r in results)
    print(json.dumps(dict(mode=MM_PRECISION_MODE, ok=bool(ok),
                          results=results)))
    return 0 if ok else 1


if __name__ == "__main__":
    raise SystemExit(main())
