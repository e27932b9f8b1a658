"""Interactive progressive viewer — the reference's front-end, reborn in the
terminal.

The reference is an AppKit window + MTKView redrawing at 60 Hz
(`MetalCpp Path Tracer/Window/*`), with WASD/mouse camera controls that were
implemented but never wired in (`ControllerView.mm` has no caller —
SURVEY.md §2#5, appendix 6). This viewer completes the intended loop
(SURVEY.md §3.3):

    key event → InputState → apply_inputs → camera changed?
        → reset accumulation : keep accumulating → draw

Rendering goes to the terminal as 24-bit-color half-block characters (two
image rows per text row), so it runs over SSH with zero display deps. Keys:

    w/a/s/d  move (horizontal, y-locked like the reference)
    space/c  up / down
    arrows   rotate (yaw/pitch)
    +/-      zoom (fov)
    r        reset camera        p  save PNG to runs/
    q        quit
"""

from __future__ import annotations

import os
import select
import sys
import termios
import time
import tty

import numpy as np


def _read_keys(timeout: float = 0.0) -> list[str]:
    """Non-blocking read of pending keypresses (arrow keys decoded)."""
    keys = []
    while select.select([sys.stdin], [], [], timeout)[0]:
        ch = sys.stdin.read(1)
        if ch == "\x1b":  # possible escape sequence
            if select.select([sys.stdin], [], [], 0.01)[0]:
                ch2 = sys.stdin.read(1)
                if ch2 == "[" and select.select([sys.stdin], [], [], 0.01)[0]:
                    ch3 = sys.stdin.read(1)
                    keys.append({"A": "up", "B": "down", "C": "right",
                                 "D": "left"}.get(ch3, ""))
                    continue
            keys.append("esc")
        else:
            keys.append(ch)
        timeout = 0.0
    return keys


def _frame_to_ansi(img: np.ndarray) -> str:
    """(H, W, 3) linear [0,1] → truecolor half-block string (H/2 rows)."""
    from metalpathtracer_tpu.io.png import linear_to_srgb

    rgb = (linear_to_srgb(img) * 255 + 0.5).astype(np.uint8)
    h = rgb.shape[0] & ~1
    out = []
    for y in range(0, h, 2):
        row = []
        for x in range(rgb.shape[1]):
            t = rgb[y, x]
            b = rgb[y + 1, x]
            row.append(
                f"\x1b[38;2;{t[0]};{t[1]};{t[2]}m"
                f"\x1b[48;2;{b[0]};{b[1]};{b[2]}m▀"
            )
        out.append("".join(row) + "\x1b[0m")
    return "\n".join(out)


def run_viewer(scene_path: str, width: int = 128, height: int = 72,
               spp_per_frame: int = 1, max_depth: int = 8, seed: int = 0,
               max_frames: int | None = None, fit_terminal: bool = False) -> None:
    import jax.numpy as jnp

    from metalpathtracer_tpu.io import write_png
    from metalpathtracer_tpu.render import (
        Camera,
        RenderConfig,
        accumulate,
        init_accum,
        to_image,
        upload_scene,
    )
    from metalpathtracer_tpu.render.camera import InputState, apply_inputs
    from metalpathtracer_tpu.scene import load_scene_xml

    scene = upload_scene(load_scene_xml(scene_path))
    cam = Camera.reset()
    cfg = RenderConfig(max_depth=max_depth)
    state = init_accum(width, height)
    inputs = InputState()

    def terminal_render_size():
        try:
            cols, rows = os.get_terminal_size()
        except OSError:
            return width, height
        return max(16, cols), max(16, 2 * (rows - 1))

    if fit_terminal:
        width, height = terminal_render_size()
        state = init_accum(width, height)

    fd = sys.stdin.fileno()
    old = termios.tcgetattr(fd)
    tty.setcbreak(fd)
    sys.stdout.write("\x1b[2J")  # clear
    frames = 0
    try:
        while max_frames is None or frames < max_frames:
            # resize → rebuild accumulation at the new size AND reset the
            # sample counter (the reference forgets the reset and averages
            # against uninitialized textures — SURVEY.md appendix 8)
            if fit_terminal:
                new_w, new_h = terminal_render_size()
                if (new_w, new_h) != (width, height):
                    width, height = new_w, new_h
                    state = init_accum(width, height)
                    sys.stdout.write("\x1b[2J")
            # --- input → camera (reference §3.3 latent path, now live) ---
            for k in _read_keys():
                if k == "q":
                    return
                elif k == "w":
                    inputs.movement = np.array([0, 0, 1], np.float32)
                elif k == "s":
                    inputs.movement = np.array([0, 0, -1], np.float32)
                elif k == "a":
                    inputs.movement = np.array([-1, 0, 0], np.float32)
                elif k == "d":
                    inputs.movement = np.array([1, 0, 0], np.float32)
                elif k == " ":
                    inputs.movement = np.array([0, 1, 0], np.float32)
                elif k == "c":
                    inputs.movement = np.array([0, -1, 0], np.float32)
                elif k == "left":
                    inputs.rotation = np.array([-40.0, 0], np.float32)
                elif k == "right":
                    inputs.rotation = np.array([40.0, 0], np.float32)
                elif k == "up":
                    inputs.rotation = np.array([0, -40.0], np.float32)
                elif k == "down":
                    inputs.rotation = np.array([0, 40.0], np.float32)
                elif k == "+":
                    inputs.zoom = -20.0
                elif k == "-":
                    inputs.zoom = 20.0
                elif k == "r":
                    inputs.reset = True
                elif k == "p":
                    os.makedirs("runs", exist_ok=True)
                    out = f"runs/viewer_{int(time.time())}.png"
                    write_png(out, np.asarray(to_image(state)))
                    sys.stdout.write(f"\x1b[H\x1b[2Ksaved {out}\n")

            cam, changed = apply_inputs(cam, inputs)
            inputs.movement = np.zeros(3, np.float32)
            inputs.clear()
            if changed:
                # accumulation invalidation (reference Renderer.cpp:255-257)
                state = init_accum(width, height)

            # --- one progressive step (the reference's per-vsync draw) ---
            t0 = time.perf_counter()
            state = accumulate(
                state, scene, cam, width, height, spp_per_frame,
                jnp.uint32(seed), cfg,
            )
            img = np.asarray(to_image(state))
            dt = time.perf_counter() - t0

            sys.stdout.write("\x1b[H")  # home
            sys.stdout.write(_frame_to_ansi(img))
            sys.stdout.write(
                f"\n\x1b[0m\x1b[2K{int(state.spp)} spp | {1.0 / max(dt, 1e-9):5.1f} fps | "
                f"wasd/space/c move, arrows rotate, +/- zoom, r reset, p png, q quit"
            )
            sys.stdout.flush()
            frames += 1
    finally:
        termios.tcsetattr(fd, termios.TCSADRAIN, old)
        sys.stdout.write("\x1b[0m\n")


def main(argv=None) -> int:
    import argparse

    p = argparse.ArgumentParser(description="interactive terminal viewer")
    p.add_argument("--scene", required=True)
    p.add_argument("--width", type=int, default=128)
    p.add_argument("--height", type=int, default=72)
    p.add_argument("--spp-per-frame", type=int, default=1)
    p.add_argument("--max-depth", type=int, default=8)
    p.add_argument("--seed", type=int, default=0)
    p.add_argument("--max-frames", type=int, default=None,
                   help="exit after N frames (for testing)")
    p.add_argument("--fit-terminal", action="store_true",
                   help="track the terminal size (resize resets accumulation)")
    a = p.parse_args(argv)
    run_viewer(a.scene, a.width, a.height, a.spp_per_frame, a.max_depth,
               a.seed, a.max_frames, a.fit_terminal)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
