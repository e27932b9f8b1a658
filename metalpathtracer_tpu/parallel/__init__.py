from metalpathtracer_tpu.parallel.sharding import (
    accumulate_sharded,
    init_accum_sharded,
    make_mesh,
    make_mesh_2d,
    render_image_sample_sharded,
    render_image_sample_sharded_wavefront,
    render_image_sharded,
    render_image_sharded_2d,
    render_image_sharded_2d_wavefront,
    render_image_wavefront_sharded,
)

__all__ = [
    "accumulate_sharded",
    "init_accum_sharded",
    "make_mesh",
    "make_mesh_2d",
    "render_image_sharded",
    "render_image_sample_sharded",
    "render_image_sample_sharded_wavefront",
    "render_image_sharded_2d",
    "render_image_sharded_2d_wavefront",
    "render_image_wavefront_sharded",
]
