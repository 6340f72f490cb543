"""Tests for the host precompute passes against brute-force oracles."""
import numpy as np
import pytest

from rtmm_tpu.models import procedural
from rtmm_tpu.ops import precompute, subdivision as sub


@pytest.fixture(scope="module")
def plane_mesh():
    return procedural.make_plane(grid=(2, 2), level=2, amplitude=0.3)


@pytest.fixture(scope="module")
def mixed_mesh():
    return procedural.make_plane(grid=(2, 2), level=2, amplitude=0.3,
                                 mixed_levels=True)


def test_displacement_scales_roundtrip(plane_mesh):
    """scale * interpolated direction must reproduce the displacement
    (mesh.cpp:386-420: scale is defined as exactly that ratio)."""
    mesh = plane_mesh
    for tri in mesh.triangles:
        scales = precompute.displacement_scales(tri, mesh)
        assert (scales[~tri.u_present] == -1.0).all()
        # reconstruct
        from rtmm_tpu.models.mesh import barycentric_coords
        b = tri.base_vertex_indices
        bc = barycentric_coords(mesh.positions[b[0]], mesh.positions[b[1]],
                                mesh.positions[b[2]], tri.u_positions)
        d = (bc[:, :1] * mesh.directions[b[0]]
             + bc[:, 1:2] * mesh.directions[b[1]]
             + bc[:, 2:3] * mesh.directions[b[2]])
        rec = scales[:, None] * d
        np.testing.assert_allclose(rec[tri.u_present],
                                   tri.u_displacements[tri.u_present],
                                   atol=1e-5)


def test_minmax_bounds_all_heights(plane_mesh):
    """Every node's (min, max) must bound the heights of all micro-vertices
    of faces inside it (mesh.cpp:145-160)."""
    mesh = plane_mesh
    for tri in mesh.triangles:
        tb = precompute.build_triangle_tables(tri, mesh)
        lvl = tri.subdivision_level
        heights = tri.u_displacements @ tb.plane_n
        coords_all = sub.grid_coords(lvl)
        paths = sub.face_node_paths(coords_all[tri.u_faces], lvl)
        for l in range(lvl):
            off = sub.level_offset(l)
            for f, face in enumerate(tri.u_faces):
                node = paths[f, l]
                mn, mx = tb.node_minmax[off + node]
                hs = heights[face]
                assert mn <= hs.min() + 1e-6
                assert mx >= hs.max() - 1e-6


def test_delta_encloses_descendants(plane_mesh):
    """The delta-expanded node triangle must contain the projected displaced
    positions of every micro-vertex inside the node (the invariant the
    traversal relies on, intersection.hlsl:147-172,394)."""
    mesh = plane_mesh
    for tri in mesh.triangles:
        tb = precompute.build_triangle_tables(tri, mesh)
        lvl = tri.subdivision_level
        pts2d = precompute.project_onto(
            tri.u_positions + tri.u_displacements,
            tb.plane_t, tb.plane_b, tb.plane_o)
        coords_all = sub.grid_coords(lvl)
        paths = sub.face_node_paths(coords_all[tri.u_faces], lvl)
        for l in range(lvl):
            off = sub.level_offset(l)
            for f, face in enumerate(tri.u_faces):
                node = paths[f, l]
                verts = tb.node_verts[off + node]       # expanded (3, 2)
                for p in pts2d[face]:
                    assert _point_in_triangle(p, verts, eps=1e-4), (l, f)


def _cross2(a, b):
    """z of the 2-D cross product (np.cross on 2-vectors is removed in
    NumPy 2.x)."""
    return a[0] * b[1] - a[1] * b[0]


def _point_in_triangle(p, verts, eps):
    v0, v1, v2 = verts
    d = []
    for a, b in ((v0, v1), (v1, v2), (v2, v0)):
        e = b - a
        d.append(_cross2(e, p - a))
    d = np.asarray(d)
    area = _cross2(v1 - v0, v2 - v0)
    scale = max(abs(area), 1e-12) ** 0.5
    return (d >= -eps * scale).all() if area > 0 else (d <= eps * scale).all()


def test_expand_triangle_zero_delta():
    verts = np.array([[0.0, 0.0], [2.0, 0.0], [1.0, 2.0]], np.float32)
    out = precompute.expand_triangle(verts, np.float32(0.0))
    np.testing.assert_allclose(out, verts, atol=1e-6)


def test_expand_triangle_distance():
    """Each original edge must move outward by exactly delta."""
    verts = np.array([[0.0, 0.0], [4.0, 0.0], [1.0, 3.0]], np.float32)
    delta = np.float32(0.25)
    out = precompute.expand_triangle(verts, delta)
    for i, j in ((0, 1), (1, 2), (2, 0)):
        a, b = verts[i], verts[j]
        e = (b - a) / np.linalg.norm(b - a)
        # expanded corners i and j must be at distance delta from line (a, b)
        for q in (out[i], out[j]):
            dist = abs(_cross2(e, q - a))
            assert dist == pytest.approx(delta, abs=1e-5)


def test_leaf_set_matches_ufaces(plane_mesh, mixed_mesh):
    """Traversal leaf 3D triangles == tessellated uFaces triangles (the
    reference's correctness premise: both modes render the same geometry)."""
    for mesh in (plane_mesh, mixed_mesh):
        for tri in mesh.triangles:
            tb = precompute.build_triangle_tables(tri, mesh)
            leaf = np.sort(tb.leaf_verts.round(5).reshape(-1, 9), axis=0)
            tess = np.sort(tb.tess_verts.round(5).reshape(-1, 9), axis=0)
            assert leaf.shape == tess.shape
            np.testing.assert_allclose(leaf, tess, atol=1e-4)


def test_aabb_contains_displaced(plane_mesh):
    mesh = plane_mesh
    for tri in mesh.triangles:
        tb = precompute.build_triangle_tables(tri, mesh)
        displaced = tri.u_positions + tri.u_displacements
        assert (displaced >= tb.aabb_min - 1e-6).all()
        assert (displaced <= tb.aabb_max + 1e-6).all()


def test_group_tables_match_per_triangle():
    """The batched (level, presence-pattern) group precompute must agree
    with the per-triangle reference path on a stitched mixed-level mesh
    (scales/node tables/leaves — the whole TriangleTables surface)."""
    import os

    from rtmm_tpu.models import procedural
    mesh = procedural.make_plane(grid=(3, 3), level=2, amplitude=0.25,
                                 mixed_levels=True)
    os.environ["RTMM_NO_NATIVE"] = "1"
    try:
        groups = {}
        for i, t in enumerate(mesh.triangles):
            groups.setdefault((t.subdivision_level, t.u_present.tobytes()),
                              []).append(i)
        assert len(groups) > 2            # stitching produced patterns
        for ids in groups.values():
            bt = precompute.build_group_tables(mesh, ids)
            for row, i in enumerate(ids):
                tb = precompute.build_triangle_tables(mesh.triangles[i],
                                                      mesh)
                np.testing.assert_allclose(bt["scales"][row], tb.scales,
                                           rtol=1e-6, atol=1e-7)
                np.testing.assert_allclose(bt["aabb_min"][row], tb.aabb_min,
                                           atol=1e-6)
                np.testing.assert_allclose(
                    bt["node_minmax"][row], tb.node_minmax, atol=1e-5)
                np.testing.assert_allclose(
                    bt["node_delta"][row], tb.node_delta, atol=1e-5)
                np.testing.assert_allclose(
                    bt["node_verts"][row], tb.node_verts, atol=1e-4)
                np.testing.assert_array_equal(bt["leaf_slots"],
                                              tb.leaf_slots)
                np.testing.assert_allclose(
                    bt["leaf_verts"][row], tb.leaf_verts, atol=1e-5)
                np.testing.assert_allclose(
                    bt["tess_verts"][row], tb.tess_verts, atol=1e-6)
    finally:
        del os.environ["RTMM_NO_NATIVE"]
