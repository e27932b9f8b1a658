from metalpathtracer_tpu.utils.metrics import (
    RenderStats,
    enable_persistent_compile_cache,
    Timer,
    profile_trace,
    relative_mse,
    rmse,
    timed_render,
)

__all__ = [
    "RenderStats",
    "enable_persistent_compile_cache",
    "Timer",
    "profile_trace",
    "relative_mse",
    "rmse",
    "timed_render",
]
