"""Benchmark harness — prints ONE JSON line with the headline metric.

Metric: Mrays/sec/chip on the flagship scene (the reference's shipped scene:
3 spheres + 4968-tri bunny, `scenes/reference.xml`) at the reference's
default 1280x720 / 32-bounce configuration (`ApplicationDelegate.cpp:24`,
`PathTracing.h:216`). Baseline: the BASELINE.md north-star target of
100 Mrays/sec/chip on TPU v5e (the reference publishes no numbers of its
own — SURVEY.md §6).

Rays are counted exactly: the integrator sums live lanes per bounce
(`metalpathtracer_tpu/render/integrator.py`), so Mrays/sec reflects rays
actually traced, not pixels x spp x max_depth. The JSON also reports `mfu`:
USEFUL-FLOP MFU — Moller-Trumbore FLOPs the algorithm needs (tested
(ray, triangle) pairs x 96 flops, counted exactly from the kernel's culled
tile passes) over the v5e chip peak (ADVICE r2: this is algorithmic
utilization, not hardware-counter MFU). Hardware MXU occupancy is higher
by the K-padding factor (the 16-feature contraction pads to the MXU's 128
rows) times the precision scheme's pass count: 1 bf16 pass/pair in the
default "pack" mode (the packed hi/lo scheme), 3 in "b3".
"""

from __future__ import annotations

import functools
import json
import os
import sys
import time

# persistent compile cache: repeat runs skip the slow remote XLA compiles
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/.cache/jax_tpu_cache")
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "1")

BASELINE_MRAYS = 100.0  # BASELINE.md target: >=100 Mrays/sec/chip on v5e
PEAK_FLOPS_V5E = 197.2e12  # bf16 MXU peak per chip (f32 runs at ~1/4 of it)


def main() -> int:
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

    repo = os.path.dirname(os.path.abspath(__file__))
    sys.path.insert(0, repo)

    from metalpathtracer_tpu.core import rng
    from metalpathtracer_tpu.render import Camera, upload_scene
    from metalpathtracer_tpu.render.integrator import (
        RenderConfig,
        trace_wavefront,
    )
    from metalpathtracer_tpu.scene import load_scene_xml

    dev = jax.devices()[0]
    print(f"benchmarking on {dev.platform} ({dev})", file=sys.stderr)

    scene = upload_scene(load_scene_xml(os.path.join(repo, "scenes", "reference.xml")))
    camera = Camera.reset()  # the reference's default view
    width, height = 1280, 720
    # env knobs exist for perf sweeps only; the defaults are the shipped
    # production configuration
    # bpi=1 / pool 2^15: re-swept at the late-round-3 engine (chip:
    # bpi 1/2/3 -> 30.1/28.6/25.2 at pool 2^14; pool 2^14/15/16 ->
    # 30.1/32.1/27.0 at bpi 1). The round-2 "bpi=2 wins" verdict flipped
    # once banking + sort restructures made the per-advance regen cheap.
    cfg = RenderConfig(
        max_depth=32,
        bounces_per_iter=int(os.environ.get("MPT_BENCH_BPI", "1")),
    )
    spp = 4
    pool = 1 << int(os.environ.get("MPT_BENCH_POOL", "15"))

    @functools.partial(jax.jit, static_argnames=("spp", "pool"))
    def render(scene, camera, seed, spp, pool):
        fb, rays, stats = trace_wavefront(
            scene, camera, width, height, spp, seed, cfg, pool,
            return_stats=True,
        )
        return fb, rays, stats

    # warmup / compile; the ray-count fetch is the real barrier (through
    # the tunnel, block_until_ready alone returns before the remote
    # compile+execute completes, and the first timed pass would eat it).
    # Compile wall time is a tracked budget (VERDICT r2 #9): the persistent
    # cache never holds the big render executables on this backend, so
    # every fresh process pays it.
    t0 = time.perf_counter()
    fb, rays, stats = render(scene, camera, rng.seed_from_int(0), spp, pool)
    int(rays)
    jax.block_until_ready(fb)
    compile_s = time.perf_counter() - t0
    print(f"warmup (compile + first pass): {compile_s:.1f}s", file=sys.stderr)

    # timed: best of repeated passes. The ray count is READ inside the
    # timed region — through the axon tunnel, block_until_ready alone can
    # report completion before the remote execution finishes (a phantom
    # ~1 ms first pass); a value fetch is the only trustworthy barrier.
    #
    # Each pass dispatches PIPE renders back-to-back and fetches once:
    # single-shot wall time carries ~50-60 ms of tunnel dispatch latency
    # on top of ~200 ms device time (profile_render vs wall, measured),
    # which back-to-back dispatch hides — exactly how the progressive
    # renderer and the viewer operate in production. The single-shot
    # number is reported alongside as `single_shot_mrays`.
    PIPE = int(os.environ.get("MPT_BENCH_PIPE", "3"))
    best, best_mfu, best_single = 0.0, 0.0, 0.0
    for rep in range(4):
        t0 = time.perf_counter()
        fb, rays, stats = render(
            scene, camera, rng.seed_from_int(rep * PIPE + 1), spp, pool
        )
        rays = int(rays)
        jax.block_until_ready(fb)
        dt_single = time.perf_counter() - t0
        single = rays / dt_single / 1e6
        best_single = max(best_single, single)

        t0 = time.perf_counter()
        outs = [
            render(scene, camera, rng.seed_from_int(rep * PIPE + 2 + i),
                   spp, pool)
            for i in range(PIPE)
        ]
        rays = sum(int(r) for _, r, _ in outs)
        for fb, _, _ in outs:
            jax.block_until_ready(fb)
        dt = (time.perf_counter() - t0) / PIPE
        mrays = rays / PIPE / dt / 1e6
        stats = outs[-1][2]
        # USEFUL-flop MFU: 4 MT determinants x 24 flops per LISTED
        # (ray, triangle) pair (counter in units of 2^20). Issued MXU work
        # differs both ways: the K=64 "pack" scheme runs hi/lo cross terms
        # (~2.7x the useful flops at K=128 padding), while the in-kernel
        # best-t early exit tests FEWER pairs than listed — so this is a
        # utilization-of-peak-by-useful-work metric, not hardware-counter
        # MFU (ADVICE r2).
        useful_flops = float(stats["mxu_tile_passes"]) * (1 << 20) * 96
        mfu = useful_flops / dt / PEAK_FLOPS_V5E
        if mrays > best:
            best, best_mfu = mrays, mfu
        print(
            f"pass {rep}: {rays // PIPE} rays in {dt:.3f}s/render = "
            f"{mrays:.2f} Mrays/s pipelined ({single:.2f} single-shot)"
            f" | mfu {100 * mfu:.2f}%",
            file=sys.stderr,
        )

    out = {
        "metric": (
            "Mrays/sec/chip (reference scene, 720p, 32 bounces, "
            "steady-state)"
        ),
        "value": round(best, 3),
        "unit": "Mrays/s",
        "vs_baseline": round(best / BASELINE_MRAYS, 4),
        "useful_flop_mfu": round(best_mfu, 5),
        "single_shot_mrays": round(best_single, 3),
        # BASELINE.md reported-metrics row: samples/sec scaled to a
        # 1080p frame. samples/s = pixels*spp / seconds_per_render;
        # seconds_per_render = rays_per_render / (best Mrays/s).
        "spp_per_sec_1080p": round(
            (width * height * spp) * (best * 1e6) / (rays // PIPE)
            / 2073600.0,
            3,
        ),
        "compile_s": round(compile_s, 1),
    }

    # Large-scene legs (VERDICT r4 #5): the streaming/large-resident paths
    # get a DRIVER-RECORDED number each round, so a regression there fails
    # loudly instead of living only in docs prose. Skippable for quick
    # sweeps (MPT_BENCH_SCENES=0); timed at 512^2 spp 2 with one warmup +
    # 2 pipelined passes (these scenes are minutes-per-compile, so the leg
    # budget stays small next to the flagship's).
    if os.environ.get("MPT_BENCH_SCENES", "1") == "1":
        from metalpathtracer_tpu.scene import presets

        # settings match benchmarks/large_scene.py's defaults (512^2,
        # spp 2, depth 8, same reference camera), so these numbers are
        # comparable with every prior round's docs/PERFORMANCE.md figures
        lcfg = RenderConfig(max_depth=8)

        @functools.partial(jax.jit, static_argnames=("spp", "pool"))
        def render_large(scene, camera, seed, spp, pool):
            return trace_wavefront(
                scene, camera, 512, 512, spp, seed, lcfg, pool
            )

        for name, preset in (
            ("bunny70k_mrays", presets.reference_bunny70k),
            ("bunny300k_mrays", presets.reference_bunny300k),
        ):
            try:
                t0 = time.perf_counter()
                sc = upload_scene(preset())
                fb, lrays = render_large(sc, camera, rng.seed_from_int(0),
                                         2, pool)
                int(lrays)
                jax.block_until_ready(fb)
                warm_s = time.perf_counter() - t0
                lbest = 0.0
                for rep in range(2):
                    t0 = time.perf_counter()
                    outs = [
                        render_large(sc, camera,
                                     rng.seed_from_int(rep * 2 + 1 + i),
                                     2, pool)
                        for i in range(2)
                    ]
                    lr = sum(int(r) for _, r in outs)
                    for lfb, _ in outs:
                        jax.block_until_ready(lfb)
                    dt = (time.perf_counter() - t0) / 2
                    lbest = max(lbest, lr / 2 / dt / 1e6)
                out[name] = round(lbest, 3)
                print(f"{name}: {lbest:.2f} Mrays/s (warmup {warm_s:.0f}s)",
                      file=sys.stderr)
            except Exception as e:  # a failed leg must not kill the headline
                print(f"{name} leg failed: {e!r}", file=sys.stderr)
                out[name] = None

    # Interactive-viewer leg (VERDICT r4 #8): steady-state progressive fps
    # at the viewer's default 512x288, driver-recorded so a regression in
    # the pipelined viewer fails loudly instead of living only in docs
    # prose. Runs the real viewer binary through a pty and averages the
    # per-frame dt trace over the steady tail (on-screen fps strings
    # sample post-stall queue-drain bursts and read ~10x high —
    # docs/PERFORMANCE.md round 5 viewer section). Skippable for sweeps
    # (MPT_BENCH_VIEWER=0); any failure records null, never kills the
    # headline.
    if os.environ.get("MPT_BENCH_VIEWER", "1") == "1":
        try:
            out["viewer_512x288_fps"] = round(_viewer_fps(repo), 1)
        except Exception as e:
            print(f"viewer leg failed: {e!r}", file=sys.stderr)
            out["viewer_512x288_fps"] = None

    print(json.dumps(out))
    return 0


def _viewer_fps(repo: str, frames: int = 90, width: int = 512,
                height: int = 288) -> float:
    """Steady-state viewer fps: drive the terminal viewer through a pty
    for `frames` frames with MPT_VIEWER_TRACE on, return 1/mean(dt) over
    the steady tail (frames 10+)."""
    import pty
    import re
    import select
    import subprocess

    code = (
        f"import sys; sys.path.insert(0, {repo!r});"
        "from metalpathtracer_tpu.viewer import main;"
        f"main(['--scene', {os.path.join(repo, 'scenes', 'reference.xml')!r},"
        f"'--width','{width}','--height','{height}',"
        f"'--max-frames','{frames}'])"
    )
    env = dict(os.environ, MPT_VIEWER_TRACE="1", COLUMNS="100", LINES="30")
    m, s = pty.openpty()
    p = subprocess.Popen([sys.executable, "-c", code], stdin=s, stdout=s,
                         stderr=subprocess.PIPE, close_fds=True, env=env)
    os.close(s)
    deadline = time.time() + 1800  # first viewer compile can take minutes
    try:
        while time.time() < deadline and p.poll() is None:
            r, _, _ = select.select([m], [], [], 0.5)
            if r:
                try:
                    os.read(m, 1 << 20)  # drain the terminal output
                except OSError:
                    break
        p.wait(timeout=60)
    finally:
        try:
            os.close(m)
        except OSError:
            pass
        if p.poll() is None:
            p.kill()
    err = p.stderr.read().decode(errors="replace")
    dts = [float(x) for x in re.findall(r"dt ([\d.]+)s", err)][10:]
    if len(dts) < 10:
        raise RuntimeError(f"viewer traced only {len(dts) + 10} frames")
    mean_dt = sum(dts) / len(dts)
    print(f"viewer {width}x{height}: {1 / mean_dt:.1f} fps steady "
          f"(mean dt {1e3 * mean_dt:.1f} ms over {len(dts)} frames)",
          file=sys.stderr)
    return 1.0 / mean_dt


if __name__ == "__main__":
    raise SystemExit(main())
