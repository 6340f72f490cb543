"""Micro-mesh asset loading: gltf(+bary), npz, and save-out.

Port of the reference asset pipeline (GPUMesh::loadGLTFMeshGPU,
src/GPUMesh.cpp:143-152 + TinyGLTFLoader::toMesh,
framework/src/TinyGLTFLoader.cpp:26-105) without the external
umeshtools_core dependency:

  * `.gltf`/`.glb` + `.bary`: base mesh from glTF, displacement scalars +
    subdivision levels + edge-decimation flags from the bary container;
    micro positions are barycentric-affine, displacement vector =
    scalar * interpolated per-vertex direction.
  * `.npz`: an umeshtools-style SubdivisionMesh dump (per-face F/V/VD +
    base_V/base_VD) — this path is the literal semantic port of
    TinyGLTFLoader::toMesh, including presence-by-face-reference and
    epsilon-matched per-vertex directions (TinyGLTFLoader.cpp:59-105).
"""
from __future__ import annotations

import os

import numpy as np

from ..models import mesh as mesh_mod
from ..ops import subdivision
from . import bary as bary_mod
from . import gltf as gltf_mod


def load_micromesh(path: str) -> mesh_mod.MicroMesh:
    ext = os.path.splitext(path)[1].lower()
    if ext in (".gltf", ".glb"):
        return load_gltf_bary(path)
    if ext == ".npz":
        return load_npz(path)
    raise ValueError(f"unsupported asset type: {path}")


# --- gltf + bary ------------------------------------------------------------

def load_gltf_bary(path: str, bary_path: str | None = None
                   ) -> mesh_mod.MicroMesh:
    g = gltf_mod.Gltf.load(path)
    positions = g.attribute("POSITION").astype(np.float32)
    normals = g.attribute("NORMAL").astype(np.float32)
    faces = g.indices().reshape(-1, 3).astype(np.int32)

    if bary_path is None:
        bary_path = g.micromap_uri()
    if bary_path is None:
        # Fall back to a sibling .bary with the same stem.
        candidate = os.path.splitext(path)[0] + ".bary"
        if os.path.exists(candidate):
            bary_path = candidate
    if bary_path is None:
        raise ValueError(
            "gltf file does not reference micromesh data "
            "(no NV micromap extension and no sibling .bary)")
    content = bary_mod.read_bary(bary_path)

    # Displacement directions: dedicated attribute if present, else normals
    # (the NV_displacement_micromap spec default).
    try:
        directions = g.attribute("_DISPLACEMENT_DIRECTION").astype(np.float32)
    except KeyError:
        directions = normals.copy()

    if len(content.tri_subdiv_level) != len(faces):
        raise ValueError("bary triangle count does not match gltf indices")
    flags = content.tri_edge_flags
    if flags.shape[0] != len(faces):
        flags = np.zeros(len(faces), np.uint8)

    bias_scale = (content.groups[0].bias, content.groups[0].scale) \
        if content.groups else (0.0, 1.0)

    tris = []
    for t, f in enumerate(faces):
        lvl = int(content.tri_subdiv_level[t])
        scales = (content.triangle_values_grid_order(t) * bias_scale[1]
                  + bias_scale[0]).astype(np.float32)
        tris.append(_assemble_triangle(
            f, lvl, scales, int(flags[t]), positions, directions))

    out = mesh_mod.MicroMesh(positions=positions, normals=normals,
                             directions=directions, triangles=tris)
    out.validate()
    return out


def _assemble_triangle(f, lvl, scales, edge_flags, positions, directions
                       ) -> mesh_mod.MicroTriangle:
    n = subdivision.rows_for_level(lvl)
    denom = max(n - 1, 1)
    coords = subdivision.grid_coords(lvl)
    u = coords[:, 0] / denom
    w = coords[:, 1] / denom
    bc = np.stack([1.0 - u, u - w, w], axis=1)
    v0, v1, v2 = positions[f[0]], positions[f[1]], positions[f[2]]
    d0, d1, d2 = directions[f[0]], directions[f[1]], directions[f[2]]
    u_pos = (bc[:, :1] * v0 + bc[:, 1:2] * v1 + bc[:, 2:3] * v2).astype(
        np.float32)
    interp_dir = (bc[:, :1] * d0 + bc[:, 1:2] * d1 + bc[:, 2:3] * d2).astype(
        np.float32)

    present = np.ones(coords.shape[0], dtype=bool)
    if n > 2:
        edge_verts = [
            (coords[:, 1] == 0, coords[:, 0]),               # v0-v1
            (coords[:, 0] == denom, coords[:, 1]),           # v1-v2
            (coords[:, 0] == coords[:, 1], coords[:, 0]),    # v2-v0
        ]
        for e, (on_edge, along) in enumerate(edge_verts):
            if edge_flags & (1 << e):
                present &= ~(on_edge & (along % 2 == 1))

    u_disp = np.where(present[:, None], scales[:, None] * interp_dir,
                      0.0).astype(np.float32)

    def present_at(c):
        return present[subdivision.grid_index(c)]

    _, corners = subdivision.enumerate_leaves(lvl, present_at)
    u_faces = subdivision.grid_index(corners).astype(np.int32)
    return mesh_mod.MicroTriangle(
        base_vertex_indices=np.asarray(f, np.int32),
        u_positions=u_pos, u_displacements=u_disp,
        u_present=present, u_faces=u_faces)


def save_gltf_bary(mesh: mesh_mod.MicroMesh, gltf_path: str,
                   bary_path: str | None = None) -> None:
    """Write a MicroMesh as .gltf + RTMB .bary (round-trip capable)."""
    from ..ops import precompute

    if bary_path is None:
        bary_path = os.path.splitext(gltf_path)[0] + ".bary"
    levels, flags, values = [], [], []
    for tri in mesh.triangles:
        lvl = tri.subdivision_level
        scales = precompute.displacement_scales(tri, mesh)
        # store u-major, with absent verts' scale forced to 0 (recovered via
        # edge flags on load)
        grid = np.where(tri.u_present, scales, 0.0).astype(np.float32)
        values.append(grid[bary_mod.grid_to_umajor_order(lvl)])
        levels.append(lvl)
        flags.append(_edge_flags_from_presence(tri))
    offsets = np.cumsum([0] + [len(v) for v in values[:-1]]).astype(np.int64)
    vals = np.concatenate(values).astype(np.float32)
    content = bary_mod.BaryContent(
        groups=[bary_mod.BaryGroup(0, len(levels), 0, len(vals))],
        tri_value_offset=offsets,
        tri_subdiv_level=np.asarray(levels, np.int32),
        values=vals,
        tri_edge_flags=np.asarray(flags, np.uint8))
    bary_mod.write_rtmb(bary_path, content)
    gltf_mod.write_gltf(
        gltf_path, mesh.positions, mesh.normals,
        mesh.base_triangle_indices(),
        extra_root_ext={"NV_micromaps": {
            "micromaps": [{"uri": os.path.basename(bary_path)}]}})


def _edge_flags_from_presence(tri: mesh_mod.MicroTriangle) -> int:
    n = tri.n_rows
    if n <= 2:
        return 0
    denom = n - 1
    coords = subdivision.grid_coords(tri.subdivision_level)
    specs = [
        (coords[:, 1] == 0, coords[:, 0]),
        (coords[:, 0] == denom, coords[:, 1]),
        (coords[:, 0] == coords[:, 1], coords[:, 0]),
    ]
    flags = 0
    for e, (on_edge, along) in enumerate(specs):
        odd = on_edge & (along % 2 == 1)
        if odd.any() and (~tri.u_present[subdivision.grid_index(
                coords[odd])]).all():
            flags |= 1 << e
    return flags


# --- umeshtools-style npz (SubdivisionMesh dump) ----------------------------

def load_npz(path: str) -> mesh_mod.MicroMesh:
    """Load an umeshtools-style SubdivisionMesh dump.

    Expected arrays (T = #base faces): `base_faces (T,3)`, `positions (V,3)`,
    `normals (V,3)`, per-face ragged data concatenated with offsets:
    `V (sumM,3)` micro positions, `VD (sumM,3)` micro displacements,
    `F (sumF,3)` micro faces (local indices), `v_offsets (T+1,)`,
    `f_offsets (T+1,)`, `base_V (T,3,3)`, `base_VD (T,3,3)`.

    This is the literal port of TinyGLTFLoader::toMesh
    (TinyGLTFLoader.cpp:26-105): presence = "referenced by a micro-face",
    per-vertex direction recovered by epsilon-matching positions against
    base_V (eps 1e-3, getVertexDisplacementDir).
    """
    z = np.load(path)
    base_faces = z["base_faces"].astype(np.int32)
    positions = z["positions"].astype(np.float32)
    normals = z["normals"].astype(np.float32)
    v_off = z["v_offsets"].astype(np.int64)
    f_off = z["f_offsets"].astype(np.int64)
    big_v = z["V"].astype(np.float32)
    big_vd = z["VD"].astype(np.float32)
    big_f = z["F"].astype(np.int64)
    base_v = z["base_V"].astype(np.float32)
    base_vd = z["base_VD"].astype(np.float32)

    # Per-vertex displacement direction by epsilon match
    # (TinyGLTFLoader.cpp:91-105).
    directions = np.zeros_like(positions)
    found = np.zeros(len(positions), bool)
    for t in range(len(base_faces)):
        for i in range(3):
            diff = np.abs(positions - base_v[t, i]).max(axis=1)
            hit = (diff <= 1e-3) & ~found
            directions[hit] = base_vd[t, i]
            found |= hit
    if not found.all():
        raise ValueError("Vertex displacement not found")  # cpp:104

    tris = []
    for t, f in enumerate(base_faces):
        vs = big_v[v_off[t]:v_off[t + 1]]
        vds = big_vd[v_off[t]:v_off[t + 1]]
        fs = big_f[f_off[t]:f_off[t + 1]].astype(np.int32)
        present = np.zeros(len(vs), bool)
        present[np.unique(fs)] = True                 # cpp:59-79
        tris.append(mesh_mod.MicroTriangle(
            base_vertex_indices=np.asarray(f, np.int32),
            u_positions=vs, u_displacements=vds,
            u_present=present, u_faces=fs))
    out = mesh_mod.MicroMesh(positions=positions, normals=normals,
                             directions=directions, triangles=tris)
    out.validate()
    return out


def save_npz(mesh: mesh_mod.MicroMesh, path: str) -> None:
    base_faces = mesh.base_triangle_indices()
    v_off = np.cumsum([0] + [t.u_positions.shape[0]
                             for t in mesh.triangles]).astype(np.int64)
    f_off = np.cumsum([0] + [t.u_faces.shape[0]
                             for t in mesh.triangles]).astype(np.int64)
    np.savez(
        path,
        base_faces=base_faces,
        positions=mesh.positions, normals=mesh.normals,
        V=np.concatenate([t.u_positions for t in mesh.triangles]),
        VD=np.concatenate([t.u_displacements for t in mesh.triangles]),
        F=np.concatenate([t.u_faces for t in mesh.triangles]),
        v_offsets=v_off, f_offsets=f_off,
        base_V=np.stack([mesh.positions[t.base_vertex_indices]
                         for t in mesh.triangles]),
        base_VD=np.stack([mesh.directions[t.base_vertex_indices]
                          for t in mesh.triangles]))
