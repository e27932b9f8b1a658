"""Camera state, controls, and viewport-basis ray setup.

Functional rebuild of the reference's global-state camera
(`MetalCpp Path Tracer/Renderer/Camera.h:9-90`) and viewport derivation
(`Renderer::recalculateViewport`, `Renderer/Renderer.cpp:153-182`): the
classic Ray-Tracing-in-One-Weekend basis (w = -forward, u = up x w,
v = w x u; viewportU/V spanning the image plane at focal length 1). The
reference mutates namespace globals from input events; here the camera is an
immutable pytree and each control returns a new camera, so the render step
stays a pure jittable function of (scene, camera, counters).

Control semantics and speeds preserved exactly: movementSpeed=0.1 with the
y-locked horizontal basis (`Camera.h:35-48`), quaternion rotate at 0.002
rad/px (`Camera.h:50-64`), zoom = vertical-fov clamp 30..120 deg at 0.1
(`Camera.h:66-73`), reset to pos (0,20,50) looking down -Z at 60 deg fov
(`Camera.h:24-32`).
"""

from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np

MOVEMENT_SPEED = 0.1
ROTATION_SPEED = 0.002
ZOOM_SPEED = 0.1
FOV_MIN, FOV_MAX = 30.0, 120.0


@jax.tree_util.register_dataclass
@dataclasses.dataclass(frozen=True)
class Camera:
    position: jax.Array  # float32 (3,)
    forward: jax.Array  # float32 (3,), unit
    up: jax.Array  # float32 (3,), unit
    vfov_deg: jax.Array  # float32 scalar

    @staticmethod
    def reset() -> "Camera":
        """Reference `Camera::reset` (`Camera.h:24-32`)."""
        return Camera(
            position=jnp.array([0.0, 20.0, 50.0], jnp.float32),
            forward=jnp.array([0.0, 0.0, -1.0], jnp.float32),
            up=jnp.array([0.0, 1.0, 0.0], jnp.float32),
            vfov_deg=jnp.float32(60.0),
        )

    @staticmethod
    def look_at(position, target, up=(0.0, 1.0, 0.0), vfov_deg=60.0) -> "Camera":
        position = np.asarray(position, np.float32)
        fwd = np.asarray(target, np.float32) - position
        fwd = fwd / np.linalg.norm(fwd)
        upv = np.asarray(up, np.float32)
        right = np.cross(fwd, upv)
        right /= np.linalg.norm(right)
        true_up = np.cross(right, fwd)
        return Camera(
            position=jnp.asarray(position),
            forward=jnp.asarray(fwd),
            up=jnp.asarray(true_up),
            vfov_deg=jnp.float32(vfov_deg),
        )


def _np(v) -> np.ndarray:
    return np.asarray(v, np.float32)


def move(cam: Camera, movement_input) -> Camera:
    """WASD/space/C translation with the y-locked horizontal basis
    (reference `Camera::move`, `Camera.h:35-48`). `movement_input` is the
    (x=strafe, y=vertical, z=forward) input vector; zero input is a no-op."""
    mi = _np(movement_input)
    if float(np.dot(mi, mi)) == 0.0:
        return cam
    fwd = _np(cam.forward)
    world_up = np.array([0.0, 1.0, 0.0], np.float32)
    right = np.cross(fwd, world_up)
    right /= np.linalg.norm(right)
    fwd_horiz = np.cross(world_up, right)
    step = right * mi[0] + world_up * mi[1] + fwd_horiz * mi[2]
    step = MOVEMENT_SPEED * step / np.linalg.norm(step)
    return dataclasses.replace(cam, position=jnp.asarray(_np(cam.position) + step))


def _quat_rotate(v: np.ndarray, axis: np.ndarray, angle: float) -> np.ndarray:
    """Rotate v around unit axis by angle (Rodrigues; equals quaternion action
    used by the reference via `simd_act`, `Camera.h:55-61`)."""
    axis = axis / np.linalg.norm(axis)
    c, s = np.cos(angle), np.sin(angle)
    return (
        v * c + np.cross(axis, v) * s + axis * np.dot(axis, v) * (1.0 - c)
    ).astype(np.float32)


def rotate(cam: Camera, rotation_input) -> Camera:
    """Mouse-drag look: pitch around camera-right by -dy*speed, then yaw
    around the recomputed up by -dx*speed (reference `Camera::rotate`,
    `Camera.h:50-64`)."""
    ri = _np(rotation_input)
    if float(np.dot(ri, ri)) == 0.0:
        return cam
    fwd = _np(cam.forward)
    world_up = np.array([0.0, 1.0, 0.0], np.float32)

    right = np.cross(fwd, world_up)
    fwd = _quat_rotate(fwd, right, -ri[1] * ROTATION_SPEED)
    fwd /= np.linalg.norm(fwd)

    right = np.cross(fwd, world_up)
    up = np.cross(right, fwd)
    up /= np.linalg.norm(up)
    fwd = _quat_rotate(fwd, up, -ri[0] * ROTATION_SPEED)
    fwd /= np.linalg.norm(fwd)
    return dataclasses.replace(
        cam, forward=jnp.asarray(fwd), up=jnp.asarray(up)
    )


def zoom(cam: Camera, amount: float) -> Camera:
    """Scroll zoom = fov change, clamped (reference `Camera::zoom`,
    `Camera.h:66-73`)."""
    if amount == 0:
        return cam
    fov = float(np.clip(float(cam.vfov_deg) + amount * ZOOM_SPEED, FOV_MIN, FOV_MAX))
    return dataclasses.replace(cam, vfov_deg=jnp.float32(fov))


def apply_inputs(cam: Camera, inputs) -> tuple[Camera, bool]:
    """Consume an InputState (reference `Camera::transformWithInputs`,
    `Camera.h:75-89`): reset, move, rotate, zoom. Returns (camera, changed);
    `changed` triggers accumulation reset in the progressive renderer."""
    changed = False
    if inputs.reset:
        cam, changed = Camera.reset(), True
    if float(np.dot(_np(inputs.movement), _np(inputs.movement))) != 0.0:
        cam, changed = move(cam, inputs.movement), True
    if float(np.dot(_np(inputs.rotation), _np(inputs.rotation))) != 0.0:
        cam, changed = rotate(cam, inputs.rotation), True
    if inputs.zoom != 0.0:
        cam, changed = zoom(cam, inputs.zoom), True
    return cam, changed


def viewport_basis(cam: Camera, width: int, height: int):
    """Camera basis → image-plane vectors (reference
    `Renderer::recalculateViewport`, `Renderer.cpp:153-176`).

    Returns (origin, first_pixel, viewport_u, viewport_v): a ray through
    normalized screen coords (sx, sy) in [0,1]^2 (sy=0 at the TOP row, as in
    the reference's y-flipped uv, `Shaders/Vertex.metal:3-19`) is
        dir = first_pixel + sx*viewport_u + sy*viewport_v - origin.
    jnp-traceable: works under jit with a Camera pytree argument.
    """
    aspect = width / height
    fov_rad = cam.vfov_deg * (jnp.pi / 180.0)
    half_h = jnp.tan(fov_rad * 0.5)
    half_w = aspect * half_h

    fwd = cam.forward / jnp.linalg.norm(cam.forward)
    w = -fwd
    u = jnp.cross(cam.up, w)
    u = u / jnp.linalg.norm(u)
    v = jnp.cross(w, u)

    viewport_u = u * (2.0 * half_w)
    viewport_v = -v * (2.0 * half_h)
    first_pixel = cam.position - w - 0.5 * viewport_u - 0.5 * viewport_v
    return cam.position, first_pixel, viewport_u, viewport_v


@dataclasses.dataclass
class InputState:
    """Per-frame input snapshot (reference `Window/InputSystem.h:8-22`).
    The write side is the interactive front-end; `clear()` consumes the
    one-shot inputs each frame like `InputSystem::clearInputs`."""

    movement: np.ndarray = dataclasses.field(
        default_factory=lambda: np.zeros(3, np.float32)
    )
    rotation: np.ndarray = dataclasses.field(
        default_factory=lambda: np.zeros(2, np.float32)
    )
    zoom: float = 0.0
    reset: bool = False

    def clear(self) -> None:
        self.rotation = np.zeros(2, np.float32)
        self.zoom = 0.0
        self.reset = False
