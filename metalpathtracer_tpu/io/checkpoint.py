"""Checkpoint/resume for progressive renders.

The reference's only evolving state is its accumulation-texture pair
(`MetalCpp Path Tracer/Renderer/Renderer.cpp:228-241`) and it never persists
it (SURVEY.md §5). Here the progressive state `(rgb_sum, spp)` plus the RNG
seed round-trips through npz; resume continues at the next sample counter
with bit-identical results to an uninterrupted render (counter-based RNG
makes this structural — tests/test_render.py::test_accumulate_matches_batch_render).
"""

from __future__ import annotations

import os

import jax.numpy as jnp
import numpy as np

from metalpathtracer_tpu.render.pipeline import AccumState

FORMAT_VERSION = 1


def save_checkpoint(path: str, state: AccumState, seed: int, meta: dict | None = None) -> None:
    payload = {
        "format_version": FORMAT_VERSION,
        "rgb_sum": np.asarray(state.rgb_sum),
        "spp": np.asarray(state.spp),
        "seed": np.uint32(seed & 0xFFFFFFFF),
    }
    for k, v in (meta or {}).items():
        payload[f"meta_{k}"] = np.asarray(v)
    tmp = path + ".tmp.npz"  # .npz suffix keeps savez from appending its own
    np.savez_compressed(tmp, **payload)
    os.replace(tmp, path)  # atomic: resume never sees a half-written file


def load_checkpoint(path: str):
    """Returns (AccumState, seed, meta_dict)."""
    with np.load(path) as z:
        version = int(z["format_version"])
        if version > FORMAT_VERSION:
            raise ValueError(f"checkpoint {path} has newer format {version}")
        state = AccumState(
            rgb_sum=jnp.asarray(z["rgb_sum"]),
            spp=jnp.asarray(z["spp"]),
        )
        seed = int(z["seed"])
        meta = {
            k[len("meta_") :]: z[k] for k in z.files if k.startswith("meta_")
        }
    return state, seed, meta
