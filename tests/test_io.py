"""Asset IO round-trip tests (gltf + bary, npz, umajor ordering)."""
import numpy as np
import pytest

from rtmm_tpu.io import bary, loader
from rtmm_tpu.models import procedural
from rtmm_tpu.ops import subdivision


def _assert_mesh_equal(a, b, atol=1e-6):
    np.testing.assert_allclose(a.positions, b.positions, atol=atol)
    np.testing.assert_allclose(a.normals, b.normals, atol=atol)
    np.testing.assert_allclose(a.directions, b.directions, atol=atol)
    assert len(a.triangles) == len(b.triangles)
    for ta, tb in zip(a.triangles, b.triangles):
        np.testing.assert_array_equal(ta.base_vertex_indices,
                                      tb.base_vertex_indices)
        np.testing.assert_allclose(ta.u_positions, tb.u_positions, atol=atol)
        np.testing.assert_allclose(ta.u_displacements, tb.u_displacements,
                                   atol=atol)
        np.testing.assert_array_equal(ta.u_present, tb.u_present)
        # uFaces as sets of coordinate triples (slot order may differ)
        fa = np.sort(ta.u_faces.reshape(-1, 3), axis=0)
        fb = np.sort(tb.u_faces.reshape(-1, 3), axis=0)
        np.testing.assert_array_equal(fa, fb)


def test_umajor_grid_permutations_inverse():
    for lvl in range(5):
        p = bary.umajor_to_grid_order(lvl)
        inv = bary.grid_to_umajor_order(lvl)
        n = subdivision.verts_for_level(lvl)
        assert sorted(p.tolist()) == list(range(n))
        np.testing.assert_array_equal(p[inv], np.arange(n))


def test_umajor_corner_indices():
    # corners of a level-2 grid: v0 (u=0,v=0) -> 0; v1 (u=s,v=0) -> last of
    # u rows; v2 (u=0, v=s) -> s
    s = 4
    assert bary.umajor_index(np.int64(0), np.int64(0), s) == 0
    assert bary.umajor_index(np.int64(0), np.int64(s), s) == s
    total = subdivision.verts_for_level(2)
    assert bary.umajor_index(np.int64(s), np.int64(0), s) == total - 1


@pytest.mark.parametrize("mixed", [False, True])
def test_gltf_bary_roundtrip(tmp_path, mixed):
    mesh = procedural.make_plane(grid=(2, 2), level=2, amplitude=0.2,
                                 mixed_levels=mixed)
    path = str(tmp_path / "asset.gltf")
    loader.save_gltf_bary(mesh, path)
    back = loader.load_micromesh(path)
    _assert_mesh_equal(mesh, back, atol=1e-5)


def test_npz_roundtrip(tmp_path):
    mesh = procedural.make_plane(grid=(2, 2), level=2, amplitude=0.2,
                                 mixed_levels=True)
    path = str(tmp_path / "asset.npz")
    loader.save_npz(mesh, path)
    back = loader.load_micromesh(path)
    _assert_mesh_equal(mesh, back, atol=1e-6)


def test_rtmb_container_roundtrip(tmp_path):
    content = bary.BaryContent(
        groups=[bary.BaryGroup(0, 2, 0, 9, bias=0.5, scale=2.0)],
        tri_value_offset=np.array([0, 3], np.int64),
        tri_subdiv_level=np.array([0, 1], np.int32),
        values=np.arange(9, dtype=np.float32),
        tri_edge_flags=np.array([0, 5], np.uint8))
    path = str(tmp_path / "x.bary")
    bary.write_rtmb(path, content)
    back = bary.read_bary(path)
    assert back.groups[0].scale == 2.0
    np.testing.assert_array_equal(back.tri_value_offset, [0, 3])
    np.testing.assert_array_equal(back.tri_edge_flags, [0, 5])
    np.testing.assert_allclose(back.values, np.arange(9))


def test_nvidia_bary_magic_rejected(tmp_path):
    path = str(tmp_path / "bad.bary")
    with open(path, "wb") as f:
        f.write(b"NOTBARY123")
    with pytest.raises(ValueError):
        bary.read_bary(path)
