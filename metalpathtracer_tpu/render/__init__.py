from metalpathtracer_tpu.render.camera import Camera, InputState, viewport_basis
from metalpathtracer_tpu.render.device_scene import DeviceScene, upload_scene
from metalpathtracer_tpu.render.integrator import (
    DEFAULT_CONFIG,
    REFERENCE_CONFIG,
    RenderConfig,
    trace,
    trace_wavefront,
)
from metalpathtracer_tpu.render.pipeline import (
    AccumState,
    accumulate,
    accumulate_wavefront,
    generate_rays,
    init_accum,
    render_image,
    render_image_wavefront,
    to_image,
)

__all__ = [
    "Camera",
    "InputState",
    "viewport_basis",
    "DeviceScene",
    "upload_scene",
    "RenderConfig",
    "DEFAULT_CONFIG",
    "REFERENCE_CONFIG",
    "trace",
    "trace_wavefront",
    "AccumState",
    "accumulate",
    "accumulate_wavefront",
    "init_accum",
    "render_image",
    "render_image_wavefront",
    "to_image",
    "generate_rays",
]
