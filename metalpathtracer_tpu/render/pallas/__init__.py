from metalpathtracer_tpu.render.pallas.intersect_mm import (
    build_weights,
    closest_hit_mm,
    ray_features,
)

__all__ = ["build_weights", "closest_hit_mm", "ray_features"]
