import numpy as np

from metalpathtracer_tpu.render import Camera, viewport_basis
from metalpathtracer_tpu.render import camera as cam_mod


def test_reset_matches_reference():
    c = Camera.reset()
    np.testing.assert_array_equal(np.asarray(c.position), [0, 20, 50])
    np.testing.assert_array_equal(np.asarray(c.forward), [0, 0, -1])
    np.testing.assert_array_equal(np.asarray(c.up), [0, 1, 0])
    assert float(c.vfov_deg) == 60.0


def test_viewport_basis_matches_reference_math():
    # Reference recalculateViewport at 1280x720, fov 60, default camera
    # (Renderer.cpp:153-176): halfH = tan(30deg), halfW = aspect*halfH.
    c = Camera.reset()
    origin, first_pixel, vu, vv = (np.asarray(x) for x in viewport_basis(c, 1280, 720))
    half_h = np.tan(np.deg2rad(30.0))
    half_w = (1280 / 720) * half_h
    np.testing.assert_allclose(vu, [2 * half_w, 0, 0], atol=1e-5)
    np.testing.assert_allclose(vv, [0, -2 * half_h, 0], atol=1e-5)
    np.testing.assert_allclose(
        first_pixel, [0 - half_w, 20 + half_h, 50 - 1], atol=1e-5
    )
    np.testing.assert_array_equal(origin, [0, 20, 50])


def test_move_semantics():
    c = Camera.reset()
    # forward input moves along -Z (horizontal forward), speed 0.1
    c2 = cam_mod.move(c, (0, 0, 1))
    np.testing.assert_allclose(np.asarray(c2.position), [0, 20, 49.9], atol=1e-6)
    # strafe right is +X
    c3 = cam_mod.move(c, (1, 0, 0))
    np.testing.assert_allclose(np.asarray(c3.position), [0.1, 20, 50], atol=1e-6)
    # zero input is a no-op
    assert cam_mod.move(c, (0, 0, 0)) is c


def test_move_is_horizontal_even_when_pitched():
    c = Camera.reset()
    c = cam_mod.rotate(c, (0.0, 200.0))  # pitch down a bit
    assert abs(float(c.forward[1])) > 0.1
    c2 = cam_mod.move(c, (0, 0, 1))
    # y must not change: movement uses the y-locked horizontal basis
    assert float(c2.position[1]) == float(c.position[1])


def test_rotate_yaw():
    c = Camera.reset()
    c2 = cam_mod.rotate(c, (100.0, 0.0))  # 100 px * 0.002 = 0.2 rad yaw
    fwd = np.asarray(c2.forward)
    np.testing.assert_allclose(np.linalg.norm(fwd), 1.0, atol=1e-6)
    # reference rotates by -rotX*speed around up (Camera.h:59-61): a positive
    # drag swings forward toward +X
    expected = np.array([np.sin(0.2), 0.0, -np.cos(0.2)])
    np.testing.assert_allclose(fwd, expected, atol=1e-3)


def test_zoom_clamps():
    c = Camera.reset()
    assert float(cam_mod.zoom(c, 1000.0).vfov_deg) == 120.0
    assert float(cam_mod.zoom(c, -1000.0).vfov_deg) == 30.0
    assert float(cam_mod.zoom(c, 10.0).vfov_deg) == 61.0


def test_apply_inputs_reports_changed():
    c = Camera.reset()
    st = cam_mod.InputState()
    c2, changed = cam_mod.apply_inputs(c, st)
    assert not changed
    st.zoom = 5.0
    _, changed = cam_mod.apply_inputs(c, st)
    assert changed
    st.clear()
    assert st.zoom == 0.0
