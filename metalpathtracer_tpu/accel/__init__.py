from metalpathtracer_tpu.accel.bvh import (
    BVHArrays,
    LEAF_SIZE,
    build_bvh,
    build_bvh_from_aabbs,
    validate_bvh,
)

__all__ = [
    "BVHArrays",
    "LEAF_SIZE",
    "build_bvh",
    "build_bvh_from_aabbs",
    "validate_bvh",
]
