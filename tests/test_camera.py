"""Camera/GLM math tests against analytically known matrices."""
import numpy as np
import pytest

from rtmm_tpu.utils import camera, glmmath


def test_perspective_matches_glm():
    m = glmmath.perspective(np.radians(80.0), 1.0, 0.1, 1000.0)
    f = 1.0 / np.tan(np.radians(40.0))
    assert m[0, 0] == pytest.approx(f)
    assert m[1, 1] == pytest.approx(f)
    assert m[2, 2] == pytest.approx(-(1000.1) / 999.9)
    assert m[2, 3] == pytest.approx(-(2 * 1000 * 0.1) / 999.9)
    assert m[3, 2] == -1.0


def test_look_at_identity_frame():
    v = glmmath.look_at(np.array([0.0, 0.0, 5.0]), np.zeros(3),
                        np.array([0.0, 1.0, 0.0]))
    # camera at +z looking at origin: forward = -z
    p = v @ np.array([0.0, 0.0, 0.0, 1.0])
    assert p[2] == pytest.approx(-5.0)
    p = v @ np.array([1.0, 0.0, 0.0, 1.0])
    assert p[0] == pytest.approx(1.0)


def test_quat_rotation_basic():
    q = glmmath.quat_from_euler(np.array([0.0, np.pi / 2, 0.0]))
    out = glmmath.quat_rotate(q, np.array([0.0, 0.0, 1.0]))
    np.testing.assert_allclose(out, [1.0, 0.0, 0.0], atol=1e-12)
    q = glmmath.quat_from_euler(np.array([np.pi / 2, 0.0, 0.0]))
    out = glmmath.quat_rotate(q, np.array([0.0, 0.0, 1.0]))
    np.testing.assert_allclose(out, [0.0, -1.0, 0.0], atol=1e-12)


def test_trackball_default_position():
    tb = camera.Trackball()
    np.testing.assert_allclose(tb.position(), [0.0, 0.0, -4.0], atol=1e-12)
    np.testing.assert_allclose(tb.forward(), [0.0, 0.0, 1.0], atol=1e-12)


def test_trackball_pitch_clamp():
    tb = camera.Trackball()
    tb.rotate(0.0, -10000.0)
    assert tb.rotation_euler[0] == pytest.approx(np.pi / 2)


def test_trackball_zoom_and_translate():
    tb = camera.Trackball()
    d0 = tb.distance
    tb.zoom(2.0)
    assert tb.distance == pytest.approx(d0 - 1.0)   # zoomSpeedFactor 0.5
    tb.translate(10.0, 0.0)
    np.testing.assert_allclose(tb.look_at, [0.05, 0.0, 0.0], atol=1e-12)


def test_inv_view_proj_roundtrip():
    tb = camera.Trackball()
    tb.set_camera([0.1, -0.2, 0.3], [0.2, -0.4, 0.0], 3.0)
    ivp = camera.inv_view_proj(tb, 640, 480)
    proj = glmmath.perspective(np.radians(80.0), 640 / 480, 0.1, 1000.0)
    vp = proj @ tb.view_matrix()
    np.testing.assert_allclose(ivp @ vp, np.eye(4), atol=1e-4)


def test_generate_ray_matches_reference_convention():
    tb = camera.Trackball()
    o, d = tb.generate_ray((0.0, 0.0))
    np.testing.assert_allclose(o, [0, 0, -4.0], atol=1e-12)
    np.testing.assert_allclose(d, [0, 0, 1.0], atol=1e-12)   # center: forward
    # +x pixel: reference flips x (cameraSpaceDirection.x = -pixel.x * ...)
    _, d2 = tb.generate_ray((1.0, 0.0))
    assert d2[0] < 0
    assert np.linalg.norm(d2) == pytest.approx(1.0)
