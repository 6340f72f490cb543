"""Native (C++) precompute kernels must match the NumPy reference exactly."""
import os

import numpy as np
import pytest

from rtmm_tpu.models import procedural
from rtmm_tpu.ops import native, precompute, subdivision as sub

pytestmark = pytest.mark.skipif(not native.available(),
                                reason="native library unavailable")


@pytest.fixture(scope="module")
def meshes():
    return [
        procedural.make_plane(grid=(2, 2), level=3, amplitude=0.25),
        procedural.make_plane(grid=(2, 2), level=2, amplitude=0.25,
                              mixed_levels=True),
        procedural.make_icosphere(subdivisions=0, level=2, amplitude=0.1),
    ]


def _numpy_tables(tri, mesh):
    os.environ["RTMM_NO_NATIVE"] = "1"
    try:
        return precompute.build_triangle_tables(tri, mesh)
    finally:
        del os.environ["RTMM_NO_NATIVE"]


def test_native_matches_numpy_tables(meshes):
    for mesh in meshes:
        for tri in mesh.triangles:
            a = precompute.build_triangle_tables(tri, mesh)   # native path
            b = _numpy_tables(tri, mesh)
            np.testing.assert_allclose(a.scales, b.scales, atol=2e-5)
            np.testing.assert_allclose(a.node_minmax, b.node_minmax,
                                       atol=1e-6)
            np.testing.assert_allclose(a.node_delta, b.node_delta, atol=1e-6)
            np.testing.assert_allclose(a.node_verts, b.node_verts, atol=1e-5)
            np.testing.assert_allclose(a.leaf_verts, b.leaf_verts, atol=2e-5)


def test_native_face_node_paths(meshes):
    mesh = meshes[0]
    tri = mesh.triangles[0]
    lvl = tri.subdivision_level
    coords = sub.grid_coords(lvl)[tri.u_faces]
    np.testing.assert_array_equal(
        native.face_node_paths(coords, lvl),
        sub.face_node_paths(coords, lvl))


def test_native_version():
    assert native.available()
