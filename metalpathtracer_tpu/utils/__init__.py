from metalpathtracer_tpu.utils.metrics import (
    RenderStats,
    Timer,
    profile_trace,
    relative_mse,
    rmse,
    timed_render,
)

__all__ = [
    "RenderStats",
    "Timer",
    "profile_trace",
    "relative_mse",
    "rmse",
    "timed_render",
]
