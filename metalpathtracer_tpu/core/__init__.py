from metalpathtracer_tpu.core import rng, vecmath

__all__ = ["rng", "vecmath"]
