"""Trace one wavefront render on the TPU and print the device-time split.

Captures a jax.profiler trace of the bench-config render and converts the
xplane with xprof's hlo_stats tool, aggregating self-time by HLO op — the
trustworthy in-situ view (docs/PERFORMANCE.md "measurement trap": standalone
fragment timings lie; only whole-program traces attribute cost correctly).

Usage: python benchmarks/profile_render.py [--pool N] ...
"""

from __future__ import annotations

import argparse
import glob
import json
import os
import sys
import tempfile

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/.cache/jax_tpu_cache")
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "1")


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--pool", type=int, default=12, help="log2 pool size")
    ap.add_argument("--bpi", type=int, default=2)
    ap.add_argument("--spp", type=int, default=4)
    ap.add_argument("--depth", type=int, default=32)
    ap.add_argument("--top", type=int, default=25)
    ap.add_argument("--tris", type=int, default=0,
                    help="profile a random_tri_cloud of this size (the "
                    "HBM-streaming kernel) instead of the reference scene")
    ap.add_argument("--preset", default=None,
                    help="profile a scene preset (e.g. reference_bunny70k)")
    ap.add_argument("--width", type=int, default=1280)
    ap.add_argument("--height", type=int, default=720)
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

    if args.preset:
        from metalpathtracer_tpu.scene import presets

        scene = upload_scene(getattr(presets, args.preset)())
        camera = Camera.reset()
    elif args.tris:
        from metalpathtracer_tpu.scene import presets

        scene = upload_scene(presets.random_tri_cloud(args.tris, seed=1))
        camera = Camera.look_at((0, 0, 28), (0, 0, 0), vfov_deg=55.0)
    else:
        scene = upload_scene(
            load_scene_xml(os.path.join(repo, "scenes", "reference.xml"))
        )
        camera = Camera.reset()
    cfg = RenderConfig(
        max_depth=args.depth, bounces_per_iter=args.bpi,
    )
    kw = dict(spp=args.spp, cfg=cfg, pool_size=1 << args.pool)
    W, H = args.width, args.height

    # compile outside the trace
    img, rays = render_image_wavefront(scene, camera, W, H, seed=0, **kw)
    jax.block_until_ready(img)

    logdir = tempfile.mkdtemp(prefix="mpt_prof_")
    jax.profiler.start_trace(logdir)
    img, rays = render_image_wavefront(scene, camera, W, H, seed=1, **kw)
    jax.block_until_ready(img)
    jax.profiler.stop_trace()

    xplanes = glob.glob(os.path.join(logdir, "**", "*.xplane.pb"), recursive=True)
    if not xplanes:
        print("no xplane produced", file=sys.stderr)
        return 1

    from xprof.convert import raw_to_tool_data

    data, _ = raw_to_tool_data.xspace_to_tool_data(
        xplanes, "hlo_stats", {}
    )
    if isinstance(data, bytes):
        data = data.decode("utf-8", "replace")

    # hlo_stats emits a gviz DataTable JSON: {"cols": [...], "rows":
    # [{"c": [{"v": ...}, ...]}, ...]}
    table = json.loads(data)
    col_ids = [c["id"] for c in table["cols"]]

    def pick_col(*cands):
        for c in cands:
            if c in col_ids:
                return col_ids.index(c)
        raise KeyError(f"{cands} not in {col_ids}")

    i_time = pick_col("total_self_time", "self_time", "total_time")
    i_name = pick_col("hlo_op_name")
    i_cat = pick_col("category")
    try:
        i_expr = pick_col("hlo_op_expression", "hlo_expression", "expression")
    except KeyError:
        i_expr = None

    agg: dict[str, float] = {}
    cat: dict[str, float] = {}
    expr: dict[str, str] = {}
    total = 0.0
    for row in table["rows"]:
        c = row["c"]

        def val(i):
            v = c[i].get("v") if c[i] else None
            return v

        us = float(val(i_time) or 0.0)
        name = str(val(i_name))
        agg[name] = agg.get(name, 0.0) + us
        if i_expr is not None and name not in expr:
            expr[name] = str(val(i_expr) or "")[:300]
        k = str(val(i_cat))
        cat[k] = cat.get(k, 0.0) + us
        total += us

    print(f"total device self-time: {total/1e3:.1f} ms for {int(rays)} rays "
          f"({total*1e3/max(int(rays),1):.0f} ns/ray)")
    print("\n-- by category --")
    for k, v in sorted(cat.items(), key=lambda kv: -kv[1]):
        print(f"{v/1e3:9.1f} ms  {100*v/total:5.1f}%  {k}")
    print(f"\n-- top {args.top} ops --")
    for k, v in sorted(agg.items(), key=lambda kv: -kv[1])[: args.top]:
        print(f"{v/1e3:9.1f} ms  {100*v/total:5.1f}%  {k[:110]}")

    with open("/tmp/mpt_hlo_stats.json", "w") as f:
        json.dump(dict(total_us=total, rays=int(rays), ops=agg, expr=expr), f)
    print("\nfull op table -> /tmp/mpt_hlo_stats.json; trace dir:", logdir)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
