"""Probe Mosaic support for the ops the fused shade kernel needs.

The shade step (integrator._bounce_step's per-lane math) needs, inside a
Pallas TPU kernel: sin/cos (unit-vector sampling), sqrt, threefry's uint32
rotate/xor/add chain, and u32->f32 via int32 (CLAUDE.md: direct u32->f32
casts are unsupported). This probe compiles and runs a tiny kernel using
all of them ON CHIP and checks the values against the XLA versions, so the
shade-kernel design can rely on a measured capability list rather than
guesses. Usage: python benchmarks/mosaic_probe.py
"""

from __future__ import annotations

import os
import sys

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/.cache/jax_tpu_cache")
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "1")


def main() -> int:
    import jax

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
    import numpy as np
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    from metalpathtracer_tpu.core import rng

    def kernel(seed_ref, pix_ref, out_ref):
        pix = pix_ref[:, :]  # (8, 128) int32 lane ids
        seed = seed_ref[0]
        b0, b1 = rng.threefry2x32(
            jnp.uint32(seed), pix.astype(jnp.uint32), jnp.uint32(3),
            jnp.uint32(7),
        )
        # u32 -> f32 via int32 (top 24 bits are < 2^24, exact in int32)
        u0 = (b0 >> jnp.uint32(8)).astype(jnp.int32).astype(jnp.float32) * (
            2.0**-24
        )
        u1 = (b1 >> jnp.uint32(8)).astype(jnp.int32).astype(jnp.float32) * (
            2.0**-24
        )
        z = 2.0 * u0 - 1.0
        t = (2.0 * np.pi) * u1
        r = jnp.sqrt(jnp.maximum(0.0, 1.0 - z * z))
        out_ref[0] = r * jnp.cos(t)
        out_ref[1] = r * jnp.sin(t)
        out_ref[2] = z

    n = 1024
    pix = jnp.arange(n, dtype=jnp.int32).reshape(8, 128)
    seed = jnp.full((1,), 42, jnp.uint32)
    out = pl.pallas_call(
        kernel,
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((3, 8, 128), jnp.float32),
    )(seed, pix)
    out = np.asarray(out)

    ref = np.asarray(
        rng.random_unit_vector(
            jnp.uint32(42),
            jnp.arange(n, dtype=jnp.uint32),
            jnp.uint32(3 & 0xFFFFFFFF),
            jnp.uint32(0),
            purpose=7,
        )
    )
    # counter c1 in kernel is (7) vs rng's (bounce<<8|purpose): match them
    ref = np.asarray(
        rng.random_unit_vector(jnp.uint32(42), jnp.arange(n, dtype=jnp.uint32),
                               jnp.uint32(3), jnp.uint32(0), purpose=7)
    )
    got = np.stack(
        [out[0].reshape(-1), out[1].reshape(-1), out[2].reshape(-1)], axis=-1
    )
    err = np.abs(got - ref).max()
    print(f"backend {jax.default_backend()}: max |kernel - xla| = {err:.3e}")
    ok = bool(err < 1e-5)
    print({"sin_cos_threefry_in_kernel": ok, "max_err": float(err)})
    return 0 if ok else 1


if __name__ == "__main__":
    sys.exit(main())
