"""Multi-instance scenes — the TLAS analog with per-instance transforms.

The reference only ever builds a single identity-transform instance
(src/GPUMesh.cpp:244-252); this module provides the full two-level story
(benchmark config 4): N instances of a base micro-mesh, each with a
rigid + uniform-scale transform, traced by the same tiled/Pallas pipeline.

TPU-first design: instead of transforming rays into object space per
candidate (a per-candidate (8, TILE) recompute inside the hot loop),
instance transforms are *baked* into world-space scene tables by a jitted
device function — a handful of batched matmuls over the leaf tables. For
static scenes this runs once; for dynamic scenes it is cheap enough to run
per frame (it is O(scene), not O(rays)).
"""
from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np

from ..models.scene import DeviceScene

BIG = jnp.float32(1e30)


@dataclasses.dataclass(frozen=True)
class Instance:
    """Rigid + uniform-scale transform (rotation, translation, scale)."""

    rotation: np.ndarray      # (3, 3)
    translation: np.ndarray   # (3,)
    scale: float = 1.0

    @staticmethod
    def identity() -> "Instance":
        return Instance(np.eye(3, dtype=np.float32),
                        np.zeros(3, dtype=np.float32), 1.0)

    @staticmethod
    def from_euler(translation, euler_xyz=(0.0, 0.0, 0.0),
                   scale: float = 1.0) -> "Instance":
        cx, cy, cz = np.cos(euler_xyz)
        sx, sy, sz = np.sin(euler_xyz)
        rx = np.array([[1, 0, 0], [0, cx, -sx], [0, sx, cx]])
        ry = np.array([[cy, 0, sy], [0, 1, 0], [-sy, 0, cy]])
        rz = np.array([[cz, -sz, 0], [sz, cz, 0], [0, 0, 1]])
        return Instance((rz @ ry @ rx).astype(np.float32),
                        np.asarray(translation, np.float32), float(scale))


def bake_instances(scene: DeviceScene, instances: list[Instance]
                   ) -> DeviceScene:
    """Build a world-space DeviceScene containing every instance.

    All tables transform analytically:
      * 3D points p -> s R p + t (leaf verts, plane origins, AABB corners)
      * directions   -> R d (plane frames)
      * object-space lengths/heights scale by s (2D node tables, min/max
        heights — the expanded node verts already have deltas baked in)
      * MT tables (q, n, e2w2) are recomputed from the transformed leaves.
    """
    rot = jnp.asarray(np.stack([i.rotation for i in instances]), jnp.float32)
    trn = jnp.asarray(np.stack([i.translation for i in instances]),
                      jnp.float32)
    scl = jnp.asarray(np.asarray([i.scale for i in instances]), jnp.float32)
    return _bake(scene, rot, trn, scl)


@jax.jit
def _bake(scene: DeviceScene, rot: jax.Array, trn: jax.Array,
          scl: jax.Array) -> DeviceScene:
    m = rot.shape[0]

    def pts(x):
        """Transform points: (T, ..., 3) -> (M*T, ..., 3)."""
        out = jnp.einsum("mij,t...j->mt...i", rot, x,
                         precision=jax.lax.Precision.HIGHEST)
        out = out * scl.reshape((m,) + (1,) * x.ndim)
        out = out + trn.reshape((m,) + (1,) * (x.ndim - 1) + (3,))
        return out.reshape((-1,) + x.shape[1:])

    def dirs(x):
        out = jnp.einsum("mij,t...j->mt...i", rot, x,
                         precision=jax.lax.Precision.HIGHEST)
        return out.reshape((-1,) + x.shape[1:])

    def lengths(x):
        """Scale-only quantities: (T, ...) -> (M*T, ...)."""
        out = x[None] * scl.reshape((m,) + (1,) * x.ndim)
        return out.reshape((-1,) + x.shape[1:])

    def tile(x):
        return jnp.broadcast_to(x[None], (m,) + x.shape).reshape(
            (-1,) + x.shape[1:])

    leaf_verts = pts(scene.leaf_verts)                    # (M*T, NF, 3, 3)
    leaf_mask = tile(scene.leaf_mask)

    # Per-triangle AABBs from transformed leaf vertices.
    lv = leaf_verts.reshape(leaf_verts.shape[0], -1, 3)
    lm = jnp.repeat(leaf_mask, 3, axis=1)[..., None]
    aabb_min = jnp.where(lm, lv, BIG).min(axis=1)
    aabb_max = jnp.where(lm, lv, -BIG).max(axis=1)
    tri_valid = tile(scene.tri_valid)
    aabb_min = jnp.where(tri_valid[:, None], aabb_min, BIG)
    aabb_max = jnp.where(tri_valid[:, None], aabb_max, -BIG)

    # Traversal-unit tables from transformed leaves.
    lpu = scene.leaves_per_unit
    ulv = leaf_verts.reshape(-1, lpu, 3, 3)
    ulm = leaf_mask.reshape(-1, lpu)
    u_lv = ulv.reshape(ulv.shape[0], -1, 3)
    u_lm = jnp.repeat(ulm, 3, axis=1)[..., None]
    unit_valid = ulm.any(axis=1)
    unit_aabb_min = jnp.where(u_lm, u_lv, BIG).min(axis=1)
    unit_aabb_max = jnp.where(u_lm, u_lv, -BIG).max(axis=1)

    lmf = ulm[..., None].astype(jnp.float32)
    v0, v1, v2 = ulv[:, :, 0], ulv[:, :, 1], ulv[:, :, 2]
    e1 = (v1 - v0) * lmf
    e2 = (v2 - v0) * lmf
    nvec = jnp.cross(e1, e2)
    w1 = jnp.cross(e2, v0 * lmf)
    w2 = jnp.cross(v0 * lmf, e1)
    u_total = ulv.shape[0]
    unit_q = jnp.zeros((u_total, 8, 4 * lpu), jnp.float32)
    unit_q = unit_q.at[:, 0:3, 0 * lpu:1 * lpu].set(
        -nvec.transpose(0, 2, 1))
    unit_q = unit_q.at[:, 0:3, 1 * lpu:2 * lpu].set(-w1.transpose(0, 2, 1))
    unit_q = unit_q.at[:, 3:6, 1 * lpu:2 * lpu].set(e2.transpose(0, 2, 1))
    unit_q = unit_q.at[:, 0:3, 2 * lpu:3 * lpu].set(-w2.transpose(0, 2, 1))
    unit_q = unit_q.at[:, 3:6, 2 * lpu:3 * lpu].set(-e1.transpose(0, 2, 1))
    unit_e2w2 = (e2 * w2).sum(-1)
    norm = jnp.maximum(jnp.linalg.norm(nvec, axis=-1, keepdims=True), 1e-20)
    unit_nrm = nvec / norm
    npad = scene.unit_nrm_pad.shape[2]
    unit_nrm_pad = jnp.zeros((u_total, 8, npad), jnp.float32)
    unit_nrm_pad = unit_nrm_pad.at[:, 0:3, 0:lpu].set(
        unit_nrm.transpose(0, 2, 1))
    unit_q16 = jnp.zeros((u_total, 16, 4 * lpu), jnp.float32)
    unit_q16 = unit_q16.at[:, 0:6, 0:3 * lpu].set(unit_q[:, 0:6, 0:3 * lpu])
    unit_q16 = unit_q16.at[:, 6:9, 3 * lpu:4 * lpu].set(
        nvec.transpose(0, 2, 1))
    unit_q16 = unit_q16.at[:, 9, 3 * lpu:4 * lpu].set(-unit_e2w2)

    return dataclasses.replace(
        scene,
        aabb_min=aabb_min, aabb_max=aabb_max,
        plane_t=dirs(scene.plane_t), plane_b=dirs(scene.plane_b),
        plane_n=dirs(scene.plane_n), plane_o=pts(scene.plane_o),
        node_verts=lengths(scene.node_verts),
        node_minmax=lengths(scene.node_minmax),
        node_pass=tile(scene.node_pass),
        leaf_verts=leaf_verts, leaf_mask=leaf_mask, tri_valid=tri_valid,
        unit_aabb_min=unit_aabb_min, unit_aabb_max=unit_aabb_max,
        unit_valid=unit_valid,
        unit_q=unit_q, unit_n=nvec, unit_e2w2=unit_e2w2,
        unit_nrm=unit_nrm, unit_nrm_pad=unit_nrm_pad, unit_q16=unit_q16)
