"""Viewer input-parity tests (keyboard + resize paths of the reference
Window, framework/src/window.cpp:122-210) — headless, no display needed."""
import numpy as np
import pytest

from rtmm_tpu.config import RenderConfig
from rtmm_tpu.models import procedural, scene as scene_mod
from rtmm_tpu.render.renderer import Renderer
from rtmm_tpu.viewer import Viewer


@pytest.fixture(scope="module")
def viewer():
    mesh = procedural.make_plane(grid=(1, 1), level=1, amplitude=0.1)
    scene = scene_mod.build_device_scene(mesh)
    return Viewer(Renderer(scene, RenderConfig(width=32, height=16,
                                               pipeline="ray")))


def test_key_rotate_and_zoom(viewer):
    yaw0 = float(viewer.trackball.rotation_euler[1])
    assert viewer.on_key("left")
    assert float(viewer.trackball.rotation_euler[1]) > yaw0
    d0 = viewer.trackball.distance
    assert viewer.on_key("+")
    assert viewer.trackball.distance < d0            # zoom in


def test_key_reset_restores_home(viewer):
    viewer.on_key("left")
    viewer.on_key("up")
    viewer.on_key("-")
    viewer.on_key("r")
    look, rot, dist = viewer._home
    np.testing.assert_allclose(viewer.trackball.rotation_euler, rot)
    np.testing.assert_allclose(viewer.trackball.look_at, look)
    assert viewer.trackball.distance == dist


def test_key_quit_and_callback_fanout(viewer):
    seen = []
    viewer.register_key_callback(seen.append)
    assert viewer.on_key("x")
    assert not viewer.on_key("q")
    assert not viewer.on_key("escape")
    assert seen == ["x", "q", "escape"]


def test_resize_recreates_pipeline(viewer):
    viewer.on_resize(64, 24)
    assert (viewer.renderer.cfg.width, viewer.renderer.cfg.height) == (64, 24)
    # Zero-area resize (minimized window) is ignored, as the reference's
    # getRenderDimension clamps (window.cpp:220-227).
    viewer.on_resize(0, 24)
    assert viewer.renderer.cfg.width == 64
    img = viewer.renderer.render_u8(np.eye(4, dtype=np.float32))
    assert img.shape == (24, 64, 3)
