"""Interactive progressive viewer — the reference's front-end, reborn in the
terminal.

The reference is an AppKit window + MTKView redrawing at 60 Hz
(`MetalCpp Path Tracer/Window/*`), with WASD/mouse camera controls that were
implemented but never wired in (`ControllerView.mm` has no caller —
SURVEY.md §2#5, appendix 6). This viewer completes the intended loop
(SURVEY.md §3.3):

    key/mouse event → InputState → apply_inputs → camera changed?
        → reset accumulation : keep accumulating → draw

Rendering uses the persistent-wavefront integrator (the fast path) and
overlaps the device dispatch with input polling: while the chip traces,
the host keeps draining the event queue, so controls stay live at any
frame rate. Output goes to the terminal as 24-bit-color half-block
characters (two image rows per text row), so it runs over SSH with zero
display deps.

Controls (mouse needs an xterm-compatible terminal; keys always work):

    mouse drag      rotate (ControllerView.mm:41-44, now wired)
    scroll wheel    zoom (ControllerView.mm:71-73)
    w/a/s/d         move (horizontal, y-locked like the reference)
    space/c         up / down
    arrows          rotate (yaw/pitch)
    +/-             zoom (fov)
    r               reset camera        p  save PNG to runs/
    q               quit
"""

from __future__ import annotations

import os
import select
import sys
import termios
import time
import tty

import numpy as np

# xterm mouse reporting: button-event tracking (drag) + SGR extended coords
_MOUSE_ON = "\x1b[?1002h\x1b[?1006h"
_MOUSE_OFF = "\x1b[?1006l\x1b[?1002l"


# partially-received SGR mouse sequence carried across _read_events calls:
# terminal bytes can straddle the 10 ms per-byte select timeouts, and
# dropping the partial mid-stream made the leftover digits/';' bytes
# reappear as spurious key events on the next call (ADVICE r2)
_sgr_partial: str | None = None


def _read_events(timeout: float = 0.0) -> list[tuple]:
    """Non-blocking read of pending input events.

    Returns a list of ("key", ch), ("mouse", btn, x, y, is_press),
    ("drag", x, y) or ("scroll", direction) tuples. Arrow keys decode to
    ("key", "up"/"down"/"left"/"right"); SGR mouse sequences
    (ESC [ < b ; x ; y M/m) decode to drag/scroll events the way the
    reference's ControllerView NSEvent handlers would see them.
    """
    global _sgr_partial
    events: list[tuple] = []

    def read_sgr(seq: str) -> None:
        """Consume an SGR payload; stash the partial if bytes run dry."""
        global _sgr_partial
        while select.select([sys.stdin], [], [], 0.01)[0]:
            c = sys.stdin.read(1)
            if c in "Mm":
                _sgr_partial = None
                try:
                    btn_s, x_s, y_s = seq.split(";")
                    btn = int(btn_s)
                    x, y = int(x_s), int(y_s)
                except ValueError:
                    return
                if btn & 64:  # scroll wheel
                    events.append(("scroll", -1 if (btn & 3) == 0 else 1))
                elif btn & 32:  # motion with button held = drag
                    events.append(("drag", x, y))
                else:
                    events.append(("mouse", btn & 3, x, y, c == "M"))
                return
            seq += c
            if len(seq) > 32:  # malformed stream; stop buffering
                _sgr_partial = None
                return
        _sgr_partial = seq  # bytes straddled the timeout; resume next call

    if _sgr_partial is not None:
        read_sgr(_sgr_partial)
    while select.select([sys.stdin], [], [], timeout)[0]:
        timeout = 0.0
        ch = sys.stdin.read(1)
        if ch != "\x1b":
            events.append(("key", ch))
            continue
        if not select.select([sys.stdin], [], [], 0.01)[0]:
            events.append(("key", "esc"))
            continue
        ch2 = sys.stdin.read(1)
        if ch2 != "[":
            # ESC followed by a plain byte (alt-chords, pasted text): the
            # byte is a real keystroke, not part of a control sequence —
            # dropping it ate the key (tests/test_viewer_input.py)
            events.append(("key", "esc"))
            events.append(("key", "esc" if ch2 == "\x1b" else ch2))
            continue
        if not select.select([sys.stdin], [], [], 0.01)[0]:
            continue
        ch3 = sys.stdin.read(1)
        if ch3 in "ABCD":
            events.append(("key", {"A": "up", "B": "down", "C": "right",
                                   "D": "left"}[ch3]))
            continue
        if ch3 != "<":
            continue
        # SGR mouse: <btn>;<x>;<y>(M=press/motion | m=release)
        read_sgr("")
    return events


# one half-block cell, zero-padded fixed width so digit positions are
# static: the whole frame becomes a numpy byte-buffer fill (the per-pixel
# f-string loop cost ~300 ms/frame at 256x144; np.char ops still ~80 ms;
# this is ~2 ms)
_CELL = "\x1b[38;2;000;000;000m\x1b[48;2;000;000;000m▀".encode()
_ROW_SUFFIX = "\x1b[0m\n".encode()


def _cell_digit_positions() -> list[int]:
    pos, i = [], 0
    while True:
        i = _CELL.find(b"000", i)
        if i < 0:
            return pos
        pos.append(i)
        i += 3


_DIGIT_POS = _cell_digit_positions()  # 6 triplets: fg r,g,b then bg r,g,b
assert len(_DIGIT_POS) == 6


_srgb_u8_jit = None  # lazily-jitted (jax import is deferred in this module)


def _srgb_u8(state):
    """Resolve AccumState to sRGB uint8 ON DEVICE (jitted — eager ops
    each cost a ~25 ms tunnel RPC): the tunnel then moves (H, W, 3) bytes
    per frame instead of f32 — 4x less fetch latency at 512x288."""
    global _srgb_u8_jit
    if _srgb_u8_jit is None:
        import jax
        import jax.numpy as jnp

        def resolve(state):
            img = state.rgb_sum / jnp.maximum(state.spp, 1).astype(
                jnp.float32
            )
            img = jnp.clip(img, 0.0, 1.0)
            srgb = jnp.where(
                img <= 0.0031308, img * 12.92,
                1.055 * jnp.power(img, 1 / 2.4) - 0.055,
            )
            return (srgb * 255 + 0.5).astype(jnp.uint8)

        _srgb_u8_jit = jax.jit(resolve)
    return _srgb_u8_jit(state)


def _frame_to_ansi(img: np.ndarray) -> str:
    """(H, W, 3) linear [0,1] f32 OR pre-resolved sRGB uint8 (from
    `_srgb_u8`) → truecolor half-block string (H/2 rows)."""
    if img.dtype == np.uint8:
        rgb = img.astype(np.uint16)
    else:
        from metalpathtracer_tpu.io.png import linear_to_srgb

        rgb = (linear_to_srgb(img) * 255 + 0.5).astype(np.uint16)
    h = rgb.shape[0] & ~1
    w = rgb.shape[1]
    vals = np.concatenate([rgb[0:h:2], rgb[1:h:2]], axis=-1)  # (h/2, w, 6)

    buf = np.tile(
        np.frombuffer(_CELL, np.uint8), (h // 2, w, 1)
    )  # (h/2, w, cell_len)
    for k, p in enumerate(_DIGIT_POS):
        v = vals[..., k]
        buf[..., p] = v // 100 + 48
        buf[..., p + 1] = (v // 10) % 10 + 48
        buf[..., p + 2] = v % 10 + 48

    rows = buf.reshape(h // 2, w * len(_CELL))
    suffix = np.tile(np.frombuffer(_ROW_SUFFIX, np.uint8), (h // 2, 1))
    out = np.concatenate([rows, suffix], axis=1).tobytes()
    return out[:-1].decode("utf-8")  # drop the trailing newline


def run_viewer(scene_path: str, width: int = 512, height: int = 288,
               spp_per_frame: int = 1, max_depth: int = 8, seed: int = 0,
               max_frames: int | None = None, fit_terminal: bool = False,
               integrator: str = "wavefront",
               mouse: bool = True) -> None:
    import jax.numpy as jnp

    from metalpathtracer_tpu.io import write_png
    from metalpathtracer_tpu.render import (
        Camera,
        RenderConfig,
        accumulate,
        accumulate_wavefront,
        init_accum,
        to_image,
        upload_scene,
    )
    from metalpathtracer_tpu.render.camera import InputState, apply_inputs
    from metalpathtracer_tpu.scene import load_scene_xml

    scene = upload_scene(load_scene_xml(scene_path))
    cam = Camera.reset()
    # bpi=2: the per-iteration regen machinery amortizes over two bounce
    # steps (round-2 sweep: bpi 1 measured ~1.6x slower end to end)
    # bpi=1: re-swept late round 3 (chip bench 30.1 vs 28.6 at bpi 2 —
    # the banking/sort restructures made per-advance regen cheap); env
    # override for interactive-latency sweeps
    cfg = RenderConfig(
        max_depth=max_depth,
        bounces_per_iter=int(os.environ.get("MPT_VIEWER_BPI", "1")),
    )
    state = init_accum(width, height)
    inputs = InputState()
    use_wavefront = integrator == "wavefront"

    def terminal_render_size():
        try:
            cols, rows = os.get_terminal_size()
        except OSError:
            return width, height
        return max(16, cols), max(16, 2 * (rows - 1))

    if fit_terminal:
        width, height = terminal_render_size()
        state = init_accum(width, height)

    def drag_scale(w):
        # one full image-width drag sweeps ~half a turn, like dragging
        # across the reference's window (rotate speed lives in apply_inputs)
        return 1600.0 / max(w, 1)

    fd = sys.stdin.fileno()
    old = termios.tcgetattr(fd)
    tty.setcbreak(fd)
    sys.stdout.write("\x1b[2J")  # clear
    if mouse:
        sys.stdout.write(_MOUSE_ON)
        sys.stdout.flush()
    frames = 0
    drag_last: tuple[int, int] | None = None
    out_buf: str | None = None  # frame N ANSI text, written while
    # frame N+1 renders on the device (host/terminal work overlaps the
    # dispatch — the loop is software-pipelined one frame deep)
    # Display decoupling: a 512x288 truecolor frame is ~3 MB of escape
    # codes; slow terminals/SSH cannot drain that every frame and a
    # blocking write would stall the RENDER loop behind the terminal
    # (measured: pty writes stretching 0.9 -> 18 s/frame while the device
    # idles). Frames are emitted only when the terminal has kept up —
    # rendering/accumulation NEVER waits for display.
    emit_interval = 0.0  # adaptive: ~1.5x the last measured write time
    last_emit = 0.0
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

            # --- one progressive step, dispatched asynchronously ---------
            t0 = time.perf_counter()
            if use_wavefront:
                # small pool: a viewer frame is ~1 spp of a small image, so
                # drain-stage count (and compile size) stays low
                pending, rays = accumulate_wavefront(
                    state, scene, cam, width, height, spp_per_frame,
                    jnp.uint32(seed), cfg,
                    pool_size=min(1 << 14, width * height * spp_per_frame),
                )
                t_disp = time.perf_counter()
                if out_buf is not None:  # overlap: draw PREV frame now
                    sys.stdout.write(out_buf)
                    sys.stdout.flush()
                    out_buf = None
                    # adapt the display rate to the terminal's drain speed
                    emit_interval = 1.5 * (time.perf_counter() - t_disp)
                    last_emit = t_disp
                t_write = time.perf_counter()
            else:
                pending = accumulate(
                    state, scene, cam, width, height, spp_per_frame,
                    jnp.uint32(seed), cfg,
                )
                rays = None

            # --- input → camera while the device renders (§3.3, now with
            # the reference's mouse modality: drag=rotate, wheel=zoom) -----
            quit_req = False
            save_req = False
            while True:
                for ev in _read_events():
                    kind = ev[0]
                    if kind == "key":
                        k = ev[1]
                        if k == "q":
                            quit_req = True
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
                            inputs.rotation = inputs.rotation + np.array(
                                [-40.0, 0], np.float32
                            )
                        elif k == "right":
                            inputs.rotation = inputs.rotation + np.array(
                                [40.0, 0], np.float32
                            )
                        elif k == "up":
                            inputs.rotation = inputs.rotation + np.array(
                                [0, -40.0], np.float32
                            )
                        elif k == "down":
                            inputs.rotation = inputs.rotation + np.array(
                                [0, 40.0], np.float32
                            )
                        elif k == "+":
                            inputs.zoom = -20.0
                        elif k == "-":
                            inputs.zoom = 20.0
                        elif k == "r":
                            inputs.reset = True
                        elif k == "p":
                            save_req = True
                    elif kind == "mouse":
                        _, btn, x, y, press = ev
                        drag_last = (x, y) if press and btn == 0 else None
                    elif kind == "drag":
                        _, x, y = ev
                        if drag_last is not None:
                            s = drag_scale(width)
                            dx = (x - drag_last[0]) * s
                            dy = (y - drag_last[1]) * 2 * s  # half-block rows
                            inputs.rotation = inputs.rotation + np.array(
                                [dx, dy], np.float32
                            )
                        drag_last = (x, y)
                    elif kind == "scroll":
                        inputs.zoom += 12.0 * ev[1]
                if quit_req or pending.rgb_sum.is_ready():
                    break
                time.sleep(0.002)
            if quit_req:
                return

            t_poll = time.perf_counter()
            state = pending
            # device-side sRGB resolve: the tunnel moves uint8, 4x less
            # than the f32 image (to_image stays for PNG saves)
            img = np.asarray(_srgb_u8(state))
            dt = time.perf_counter() - t0
            if os.environ.get("MPT_VIEWER_TRACE"):
                print(
                    f"frame {frames}: write {t_write - t_disp:.3f}s "
                    f"poll {t_poll - t_write:.3f}s "
                    f"fetch {time.perf_counter() - t_poll:.3f}s",
                    file=sys.stderr,
                )

            if save_req:
                os.makedirs("runs", exist_ok=True)
                out = f"runs/viewer_{int(time.time())}.png"
                write_png(out, np.asarray(to_image(state)))
                sys.stdout.write(f"\x1b[H\x1b[2Ksaved {out}\n")

            # --- apply the inputs gathered during the render --------------
            cam, changed = apply_inputs(cam, inputs)
            inputs.movement = np.zeros(3, np.float32)
            inputs.clear()
            if changed:
                # accumulation invalidation (reference Renderer.cpp:255-257)
                state = init_accum(width, height)

            mrays = (
                f" | {int(rays) / dt / 1e6:6.2f} Mrays/s" if rays is not None
                else ""
            )
            last = max_frames is not None and frames == max_frames - 1
            due = (time.perf_counter() - last_emit) >= emit_interval
            if due or last or changed:
                out_buf = (
                    "\x1b[H" + _frame_to_ansi(img)
                    + f"\n\x1b[0m\x1b[2K{int(state.spp)} spp | "
                    f"{1.0 / max(dt, 1e-9):5.1f} fps{mrays} | "
                    f"drag rotate, wheel zoom, wasd/space/c move, +/- fov, "
                    f"r reset, p png, q quit"
                )
            if out_buf is not None and (not use_wavefront or last):
                sys.stdout.write(out_buf)  # last frame: no next dispatch
                sys.stdout.flush()
                out_buf = None
            frames += 1
    finally:
        if mouse:
            sys.stdout.write(_MOUSE_OFF)
        termios.tcsetattr(fd, termios.TCSADRAIN, old)
        sys.stdout.write("\x1b[0m\n")


def main(argv=None) -> int:
    import argparse

    p = argparse.ArgumentParser(description="interactive terminal viewer")
    p.add_argument("--scene", required=True)
    p.add_argument("--width", type=int, default=512)
    p.add_argument("--height", type=int, default=288)
    p.add_argument("--spp-per-frame", type=int, default=1)
    p.add_argument("--max-depth", type=int, default=8)
    p.add_argument("--seed", type=int, default=0)
    p.add_argument("--max-frames", type=int, default=None,
                   help="exit after N frames (for testing)")
    p.add_argument("--fit-terminal", action="store_true",
                   help="track the terminal size (resize resets accumulation)")
    p.add_argument("--integrator", choices=("wavefront", "scan"),
                   default="wavefront")
    p.add_argument("--no-mouse", action="store_true",
                   help="skip xterm mouse reporting")
    a = p.parse_args(argv)
    run_viewer(a.scene, a.width, a.height, a.spp_per_frame, a.max_depth,
               a.seed, a.max_frames, a.fit_terminal, a.integrator,
               mouse=not a.no_mouse)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
