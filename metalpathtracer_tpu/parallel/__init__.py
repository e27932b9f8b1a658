from metalpathtracer_tpu.parallel.sharding import (
    make_mesh,
    make_mesh_2d,
    render_image_sample_sharded,
    render_image_sharded,
    render_image_sharded_2d,
    render_image_wavefront_sharded,
)

__all__ = [
    "make_mesh",
    "make_mesh_2d",
    "render_image_sharded",
    "render_image_sample_sharded",
    "render_image_sharded_2d",
    "render_image_wavefront_sharded",
]
