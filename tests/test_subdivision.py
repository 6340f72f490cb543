"""Unit tests for the implicit 4-ary hierarchy tables.

Oracles are the reference's exact indexing rules: flat buffer offset
(4^l-1)/3, child slot 4*parent + digit with digits {0: near-v0, 1: near-v1,
2: center, 3: near-v2} (intersection.hlsl:310-338), the triangular-grid
storage index x(x+1)/2 + y (intersection.hlsl:105-110), and the BFS
membership rule bc>0.5 (mesh.cpp:172-180).
"""
import numpy as np
import pytest

from rtmm_tpu.ops import subdivision as sub


def test_level_offsets():
    assert [sub.level_offset(l) for l in range(6)] == [0, 1, 5, 21, 85, 341]
    assert sub.num_internal_nodes(3) == 21


def test_grid_index_roundtrip():
    for level in range(4):
        coords = sub.grid_coords(level)
        idx = sub.grid_index(coords)
        assert np.array_equal(idx, np.arange(coords.shape[0]))
        assert coords.shape[0] == sub.verts_for_level(level)
        assert sub.level_from_vertex_count(coords.shape[0]) == level


def test_child_corners_level1():
    kids = sub.child_corners(sub.root_corners(1))
    # digit order: near-v0, near-v1, center, near-v2
    np.testing.assert_array_equal(kids[0], [[0, 0], [1, 0], [1, 1]])
    np.testing.assert_array_equal(kids[1], [[1, 0], [2, 0], [2, 1]])
    np.testing.assert_array_equal(kids[2], [[1, 0], [2, 1], [1, 1]])
    np.testing.assert_array_equal(kids[3], [[1, 1], [2, 1], [2, 2]])


def test_face_node_paths_level1():
    # The four level-1 faces of a level-1 triangle in grid coords.
    faces = np.array([
        [[0, 0], [1, 0], [1, 1]],   # near v0
        [[1, 0], [2, 0], [2, 1]],   # near v1
        [[1, 0], [2, 1], [1, 1]],   # center (inverted)
        [[1, 1], [2, 1], [2, 2]],   # near v2
    ])
    paths = sub.face_node_paths(faces, 1)
    np.testing.assert_array_equal(paths[:, 0], [0, 0, 0, 0])
    np.testing.assert_array_equal(paths[:, 1], [0, 1, 2, 3])


def test_face_node_paths_level2_counts():
    corners = sub.uniform_leaf_corners(2)        # 16 leaves, digit order
    paths = sub.face_node_paths(corners, 2)
    # Leaf k's node index at level 2 must be k itself (digit-order placement).
    np.testing.assert_array_equal(paths[:, 2], np.arange(16))
    # And level-1 node = k >> 2.
    np.testing.assert_array_equal(paths[:, 1], np.arange(16) >> 2)


def test_uniform_leaf_count():
    for lvl in range(4):
        assert sub.uniform_leaf_corners(lvl).shape == (4**lvl, 3, 2)


@pytest.mark.parametrize("pattern,count", [
    ((1, 1, 1), 4), ((1, 0, 0), 2), ((0, 1, 0), 2), ((0, 0, 1), 2),
    ((1, 0, 1), 3), ((1, 1, 0), 3), ((0, 1, 1), 3), ((0, 0, 0), 1)])
def test_stitch_counts(pattern, count):
    assert len(sub.STITCH_TABLE[pattern]) == count


def test_stitch_area_conservation():
    """Stitched leaf triangles must tile the parent exactly (no overlap/gap)."""
    for pattern, tris in sub.STITCH_TABLE.items():
        v0, v1, v2 = (0.0, 0.0), (2.0, 0.0), (2.0, 2.0)
        uv0, uv1, uv2 = (1.0, 0.0), (2.0, 1.0), (1.0, 1.0)
        sel = [v0, v1, v2, uv0, uv1, uv2]
        total = 0.0
        for t in tris:
            a, b, c = (np.asarray(sel[i]) for i in t)
            ab, ac = b - a, c - a
            total += 0.5 * abs(ab[0] * ac[1] - ab[1] * ac[0])
        assert total == pytest.approx(2.0), pattern


def test_enumerate_leaves_mixed_presence():
    """Leaves on a level-2 triangle with absent odd verts on edge v0-v1."""
    def present(c):
        # absent: finest-level odd verts on the y==0 edge
        on_edge = c[..., 1] == 0
        return ~(on_edge & (c[..., 0] % 2 == 1))

    slots, corners = sub.enumerate_leaves(2, present)
    # Parents 0 and 1 touch edge v0-v1 with an absent midpoint each -> 3
    # leaves; parents 2, 3 keep 4.
    assert len(slots) == 3 + 3 + 4 + 4
    # every referenced corner must be present
    assert present(corners).all()
