"""Device scene: padded dense JAX arrays for the wavefront renderer.

This replaces the reference's GPU scene build (src/GPUMesh.cpp:32-110 — buffer
uploads, AABB compute pass, BLAS/TLAS build) and its six t1-t5 SRV tables
(src/application.cpp:124-161). Instead of a descriptor-ordered buffer soup,
the scene is one pytree of named dense arrays, padded to static shapes so a
single compiled XLA program renders any scene of the same (T, level) class.

The acceleration structure analog: per-base-triangle AABBs (the reference's
procedural BLAS input, GPUMesh.cpp:154-192) are kept as dense (T, 3) min/max
arrays; candidate search is a vectorized slab test + top-K instead of
hardware TLAS traversal.
"""
from __future__ import annotations

import dataclasses
import functools

import jax
import numpy as np

from ..ops import precompute, subdivision
from . import mesh as mesh_mod

BIG = np.float32(1e30)


@functools.partial(
    jax.tree_util.register_dataclass,
    data_fields=["aabb_min", "aabb_max", "plane_t", "plane_b", "plane_n",
                 "plane_o", "node_verts", "node_minmax", "node_pass",
                 "leaf_verts", "leaf_mask", "tri_valid"],
    meta_fields=["max_level"])
@dataclasses.dataclass(frozen=True)
class DeviceScene:
    """All arrays are padded to T triangles; NI = (4^L-1)/3, NF = 4^L.

    Micro-mesh mode: node_* hold the delta-expanded displaced 2D hierarchy
    (levels 0..L-1, level-ordered, slot = 4*parent + digit) and leaf_verts the
    displaced 3D micro-triangles placed at slot k << 2*(L - level_t).
    Tessellated mode (`-T`): node_pass is all-True (NI=1) and leaf_verts holds
    the uFaces expansion — same renderer, no hierarchy pruning.
    """

    aabb_min: jax.Array    # (T, 3)
    aabb_max: jax.Array    # (T, 3)
    plane_t: jax.Array     # (T, 3)
    plane_b: jax.Array     # (T, 3)
    plane_n: jax.Array     # (T, 3)
    plane_o: jax.Array     # (T, 3)
    node_verts: jax.Array  # (T, NI, 3, 2)
    node_minmax: jax.Array  # (T, NI, 2)
    node_pass: jax.Array   # (T, NI) bool
    leaf_verts: jax.Array  # (T, NF, 3, 3)
    leaf_mask: jax.Array   # (T, NF) bool
    tri_valid: jax.Array   # (T,) bool
    max_level: int         # static

    @property
    def num_triangles(self) -> int:
        return self.aabb_min.shape[0]

    @property
    def num_leaf_slots(self) -> int:
        return self.leaf_verts.shape[1]


def build_device_scene(mesh: mesh_mod.MicroMesh, tessellated: bool = False,
                       pad_triangles_to: int = 8) -> DeviceScene:
    """Run all host precompute and pack the padded device arrays.

    Mirrors GPUMesh::loadGLTFMeshGPU + the Application scene-build block
    (src/application.cpp:113-197) in one call.
    """
    tables = [precompute.build_triangle_tables(t, mesh) for t in mesh.triangles]
    t_real = len(tables)
    t_pad = max(_round_up(t_real, pad_triangles_to), pad_triangles_to)
    max_level = max((tb.level for tb in tables), default=0)

    if tessellated:
        ni, nf = 1, max(max(tb.tess_verts.shape[0] for tb in tables), 1)
    else:
        ni = max(subdivision.num_internal_nodes(max_level), 1)
        nf = 4**max_level

    aabb_min = np.full((t_pad, 3), BIG, np.float32)
    aabb_max = np.full((t_pad, 3), -BIG, np.float32)
    plane = {k: np.zeros((t_pad, 3), np.float32)
             for k in ("t", "b", "n", "o")}
    plane["n"][:, 2] = 1.0  # benign default frame for padding
    plane["t"][:, 0] = 1.0
    plane["b"][:, 1] = 1.0
    node_verts = np.zeros((t_pad, ni, 3, 2), np.float32)
    node_minmax = np.tile(np.asarray([[-BIG, BIG]], np.float32), (t_pad * ni, 1)
                          ).reshape(t_pad, ni, 2)
    node_pass = np.ones((t_pad, ni), bool)
    leaf_verts = np.zeros((t_pad, nf, 3, 3), np.float32)
    leaf_mask = np.zeros((t_pad, nf), bool)
    tri_valid = np.zeros((t_pad,), bool)

    for i, tb in enumerate(tables):
        aabb_min[i] = tb.aabb_min
        aabb_max[i] = tb.aabb_max
        plane["t"][i] = tb.plane_t
        plane["b"][i] = tb.plane_b
        plane["n"][i] = tb.plane_n
        plane["o"][i] = tb.plane_o
        tri_valid[i] = True
        if tessellated:
            f = tb.tess_verts.shape[0]
            leaf_verts[i, :f] = tb.tess_verts
            leaf_mask[i, :f] = True
            continue
        ni_t = tb.node_verts.shape[0]
        node_verts[i, :ni_t] = tb.node_verts
        node_minmax[i, :ni_t] = tb.node_minmax
        node_pass[i, :ni_t] = False  # real nodes: use the test
        # Leaves: slot k (level level_t) -> flat slot k << 2*(L - level_t).
        shift = 4 ** (max_level - tb.level)
        flat = tb.leaf_slots * shift
        leaf_verts[i, flat] = tb.leaf_verts
        leaf_mask[i, flat] = True

    dev = lambda x: jax.device_put(x)
    return DeviceScene(
        aabb_min=dev(aabb_min), aabb_max=dev(aabb_max),
        plane_t=dev(plane["t"]), plane_b=dev(plane["b"]),
        plane_n=dev(plane["n"]), plane_o=dev(plane["o"]),
        node_verts=dev(node_verts), node_minmax=dev(node_minmax),
        node_pass=dev(node_pass), leaf_verts=dev(leaf_verts),
        leaf_mask=dev(leaf_mask), tri_valid=dev(tri_valid),
        max_level=0 if tessellated else max_level)


def _round_up(x: int, m: int) -> int:
    return ((x + m - 1) // m) * m
