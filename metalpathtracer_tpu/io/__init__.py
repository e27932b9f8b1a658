from metalpathtracer_tpu.io.checkpoint import load_checkpoint, save_checkpoint
from metalpathtracer_tpu.io.png import linear_to_srgb, read_png, write_png

__all__ = [
    "write_png",
    "read_png",
    "linear_to_srgb",
    "save_checkpoint",
    "load_checkpoint",
]
