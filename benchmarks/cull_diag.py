"""Cull diagnostic: per-lane passing tiles vs per-subgroup union lists.

Answers "where do the kernel's tested pairs come from?" by splitting
listed tiles/ray into (a) genuine per-lane geometric overlap — the floor
no grouping can beat — and (b) union inflation from sharing one list per
CULL_R lanes. Ray population mirrors production: primary rays plus the
integrator's own bounced distribution (captured from a short scan trace),
sorted by the production tileset key before grouping.

Runs on CPU (statistics only, no Mosaic needed). Usage:
    python benchmarks/cull_diag.py [--scene scenes/reference.xml]
"""

from __future__ import annotations

import argparse
import os
import sys


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--scene", default=None)
    ap.add_argument("--pool", type=int, default=14, help="log2 lanes")
    ap.add_argument("--bounces", type=int, default=4)
    args = ap.parse_args()

    import jax

    jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp
    import numpy as np

    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    sys.path.insert(0, repo)

    from metalpathtracer_tpu.core import rng as rng_mod
    from metalpathtracer_tpu.render import Camera, upload_scene
    from metalpathtracer_tpu.render.pallas.intersect_mm import (
        CULL_R,
        T_MIN,
        _cull_hit_mask,
    )
    from metalpathtracer_tpu.render import bsdf  # noqa: F401
    from metalpathtracer_tpu.render.integrator import _bounce_step, RenderConfig
    from metalpathtracer_tpu.render.pipeline import generate_rays
    from metalpathtracer_tpu.scene import load_scene_xml

    scene_path = args.scene or os.path.join(repo, "scenes", "reference.xml")
    scene = upload_scene(load_scene_xml(scene_path))
    camera = Camera.reset()
    n = 1 << args.pool
    W, H = 1280, 720

    # lane population: random pixels, then follow the real bounce chain
    key = np.random.default_rng(0)
    pixel = jnp.asarray(
        key.integers(0, W * H, size=n).astype(np.uint32)
    )
    sample = jnp.zeros((n,), jnp.uint32)
    seed = rng_mod.seed_from_int(3)
    o, d = generate_rays(camera, W, H, pixel, sample, seed)
    cfg = RenderConfig(max_depth=32)

    light = jnp.zeros((n, 3))
    tp = jnp.ones((n, 3))
    active = jnp.ones((n,), bool)
    prev_pdf = jnp.zeros((n,))

    def stats(o, d, act, tag):
        hit, _ = _cull_hit_mask(o, d, act.astype(jnp.float32),
                                scene.mm_tile_box, T_MIN)
        hit = np.asarray(hit)  # (nt, n)
        act_np = np.asarray(act)
        per_lane = hit.sum(0)[act_np]
        # production grouping: tileset-key sort, then per-CULL_R unions
        chit, _ = _cull_hit_mask(o, d, act.astype(jnp.float32),
                                 scene.mm_coarse_box, T_MIN)
        bits = (np.asarray(chit).astype(np.uint64).T
                * (1 << np.arange(chit.shape[0], dtype=np.uint64))).sum(1)
        order = np.argsort(bits, kind="stable")
        hs = hit[:, order]
        acts = act_np[order]
        nsub = n // CULL_R
        union = hs.reshape(hs.shape[0], nsub, CULL_R).any(2)  # (nt, nsub)
        # a subgroup's list is walked by all CULL_R lanes -> listed pairs
        listed = union.sum(0)  # tiles per subgroup
        sub_active = acts.reshape(nsub, CULL_R).any(1)
        print(
            f"{tag:>10}: per-lane passing tiles mean {per_lane.mean():6.2f} "
            f"p95 {np.percentile(per_lane, 95):5.1f} | "
            f"subgroup union mean {listed[sub_active].mean():6.2f} "
            f"(x{listed[sub_active].mean() / max(per_lane.mean(), 1e-9):.2f} "
            f"inflation) | active {act_np.mean():.2f}"
        )

    stats(o, d, active, "primary")
    for b in range(1, args.bounces + 1):
        o, d, light, tp, active, prev_pdf, _, _, _ = _bounce_step(
            scene, o, d, light, tp, active, prev_pdf,
            pixel, sample, jnp.full((n,), b - 1, jnp.int32), seed, cfg,
        )
        if not bool(jnp.any(active)):
            break
        stats(o, d, active, f"bounce {b}")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
