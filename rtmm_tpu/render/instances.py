"""Multi-instance scenes — the TLAS analog with per-instance transforms.

The reference only ever builds a single identity-transform instance
(src/GPUMesh.cpp:244-252); this module provides the full two-level story
(benchmark config 4): N instances of a base micro-mesh, each with a
rigid + uniform-scale transform. Two strategies:

* bake_instances — materialize world-space copies of the scene tables (a
  handful of batched matmuls, jitted). Fastest to trace (one flat scene)
  but HBM is O(instances x scene): right for a handful of instances.

* render_instanced — TRUE two-level traversal (the reference's TLAS ->
  ray-transform -> shared-BLAS model, src/GPUMesh.cpp:238-278): a scan
  over instances transforms the per-frame ray tables into each instance's
  object space (apex/dirs rotate, t scales by 1/s — the shared-apex
  bilinear MT identities survive rigid+uniform-scale exactly) and traces
  the SHARED object-space cluster hierarchy, min-combining closest hits
  across instances in world t. HBM is O(scene + instances), so it scales
  to hundreds of instances and per-frame animation. Per-instance near/far
  clips act in object units (world t_min*s_i .. t_max*s_i) — a sub-epsilon
  deviation from the baked path at the near plane.
"""
from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np

from ..models import scene as scene_mod
from ..models.scene import DeviceScene
from ..ops.culling import UNITS_PER_CLUSTER

BIG = jnp.float32(1e30)


def _part1by2(x: jax.Array) -> jax.Array:
    """Spread 10 bits to every third bit (Morton; jnp twin of scene.py's)."""
    x = x.astype(jnp.uint32) & jnp.uint32(0x3FF)
    x = (x | (x << 16)) & jnp.uint32(0x30000FF)
    x = (x | (x << 8)) & jnp.uint32(0x300F00F)
    x = (x | (x << 4)) & jnp.uint32(0x30C30C3)
    x = (x | (x << 2)) & jnp.uint32(0x9249249)
    return x


def _morton_leaf_order(centers: jax.Array, valid: jax.Array) -> jax.Array:
    """Stable order putting valid leaves first along a Morton curve (jnp
    twin of scene.pack_units's ordering; shapes stay static under jit)."""
    lo = jnp.where(valid[:, None], centers, BIG).min(axis=0)
    hi = jnp.where(valid[:, None], centers, -BIG).max(axis=0)
    span = jnp.maximum(hi - lo, 1e-20)
    q = jnp.clip((centers - lo) / span * 1023.0, 0.0, 1023.0
                 ).astype(jnp.uint32)
    code = (_part1by2(q[:, 0]) | (_part1by2(q[:, 1]) << 1)
            | (_part1by2(q[:, 2]) << 2))
    code = jnp.where(valid, code, jnp.uint32(0x7FFFFFFF))
    return jnp.argsort(code, stable=True)


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
    if scene.compressed:
        return _bake_compressed(scene, rot, trn, scl)
    return _bake(scene, rot, trn, scl)


@jax.jit
def _bake_compressed(scene: DeviceScene, rot: jax.Array, trn: jax.Array,
                     scl: jax.Array) -> DeviceScene:
    """Bake instances of a compressed scene: grid records transform
    analytically (positions p -> s R p + t; corner-index rows copy), so
    direct tracing survives baking — nothing is ever pre-tessellated.

    Unit AABBs use the conservative |R| slab transform of the object
    AABBs (exact geometry lives in the records; AABBs only cull). Zero
    padding lanes transform to t, which is safe: padded leaf columns
    derive three EQUAL corners -> det == 0 -> rejected."""
    m = rot.shape[0]
    grid = scene.unit_grid                         # (U, R, GL)
    pos = grid[:, 0:3, :]
    posw = (jnp.einsum("mij,ujl->muil", rot, pos,
                       precision=jax.lax.Precision.HIGHEST)
            * scl[:, None, None, None] + trn[:, None, :, None])
    rest = jnp.broadcast_to(grid[None, :, 3:, :],
                            (m,) + grid[:, 3:, :].shape)  # (M, U, R-3, GL)
    gridw = jnp.concatenate(
        [posw.reshape(m * grid.shape[0], 3, grid.shape[2]),
         rest.reshape(m * grid.shape[0], -1, grid.shape[2])], axis=1)

    # Conservative world AABBs: c_w = s R c + t, h_w = s |R| h.
    c_o = 0.5 * (scene.unit_aabb_min + scene.unit_aabb_max)
    h_o = 0.5 * (scene.unit_aabb_max - scene.unit_aabb_min)
    valid_o = scene.unit_valid
    c_w = (jnp.einsum("mij,uj->mui", rot, c_o,
                      precision=jax.lax.Precision.HIGHEST)
           * scl[:, None, None] + trn[:, None, :])
    h_w = jnp.einsum("mij,uj->mui", jnp.abs(rot),
                     jnp.where(valid_o[:, None], h_o, 0.0),
                     precision=jax.lax.Precision.HIGHEST
                     ) * scl[:, None, None]
    vmask = jnp.broadcast_to(valid_o[None, :, None], c_w.shape)
    umin = jnp.where(vmask, c_w - h_w, BIG).reshape(-1, 3)
    umax = jnp.where(vmask, c_w + h_w, -BIG).reshape(-1, 3)
    unit_valid = jnp.broadcast_to(valid_o[None], (m,) + valid_o.shape
                                  ).reshape(-1)

    # Morton reorder (jit twin of the host pack) + clusters.
    order = _morton_leaf_order(0.5 * (umin + umax), unit_valid)
    gridw = gridw[order]
    umin = umin[order]
    umax = umax[order]
    unit_valid = unit_valid[order]
    u_total = gridw.shape[0]
    pad = (-u_total) % UNITS_PER_CLUSTER
    if pad:
        gridw = jnp.pad(gridw, ((0, pad), (0, 0), (0, 0)))
        umin = jnp.pad(umin, ((0, pad), (0, 0)), constant_values=BIG)
        umax = jnp.pad(umax, ((0, pad), (0, 0)), constant_values=-BIG)
        unit_valid = jnp.pad(unit_valid, ((0, pad),))
        u_total += pad

    n_cl = u_total // UNITS_PER_CLUSTER
    cl_mask = unit_valid.reshape(n_cl, UNITS_PER_CLUSTER, 1)
    cluster_aabb_min = jnp.where(
        cl_mask, umin.reshape(n_cl, UNITS_PER_CLUSTER, 3), BIG).min(axis=1)
    cluster_aabb_max = jnp.where(
        cl_mask, umax.reshape(n_cl, UNITS_PER_CLUSTER, 3), -BIG).max(axis=1)
    cluster_valid = cl_mask[..., 0].any(axis=1)
    meta = jnp.zeros((n_cl, 8, 128), jnp.float32)
    meta = meta.at[:, 0:3, :UNITS_PER_CLUSTER].set(
        umin.reshape(n_cl, UNITS_PER_CLUSTER, 3).transpose(0, 2, 1))
    meta = meta.at[:, 3:6, :UNITS_PER_CLUSTER].set(
        umax.reshape(n_cl, UNITS_PER_CLUSTER, 3).transpose(0, 2, 1))
    meta = meta.at[:, 6, :UNITS_PER_CLUSTER].set(
        unit_valid.reshape(n_cl, UNITS_PER_CLUSTER).astype(jnp.float32))

    # Per-triangle AABBs (coarse culling only), same |R| transform.
    tc_o = 0.5 * (scene.aabb_min + scene.aabb_max)
    th_o = 0.5 * (scene.aabb_max - scene.aabb_min)
    tvalid = scene.tri_valid
    tc_w = (jnp.einsum("mij,tj->mti", rot, tc_o,
                       precision=jax.lax.Precision.HIGHEST)
            * scl[:, None, None] + trn[:, None, :])
    th_w = jnp.einsum("mij,tj->mti", jnp.abs(rot),
                      jnp.where(tvalid[:, None], th_o, 0.0),
                      precision=jax.lax.Precision.HIGHEST
                      ) * scl[:, None, None]
    tmask = jnp.broadcast_to(tvalid[None, :, None], tc_w.shape)
    aabb_min = jnp.where(tmask, tc_w - th_w, BIG).reshape(-1, 3)
    aabb_max = jnp.where(tmask, tc_w + th_w, -BIG).reshape(-1, 3)

    return dataclasses.replace(
        scene,
        aabb_min=aabb_min, aabb_max=aabb_max,
        tri_valid=jnp.broadcast_to(tvalid[None], (m,) + tvalid.shape
                                   ).reshape(-1),
        unit_aabb_min=umin, unit_aabb_max=umax, unit_valid=unit_valid,
        unit_grid=gridw,
        cluster_aabb_min=cluster_aabb_min, cluster_aabb_max=cluster_aabb_max,
        cluster_valid=cluster_valid, cluster_unit_meta=meta)


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

    # Traversal units: Morton-packed blocks of valid world-space leaves
    # (the jit-safe twin of scene.pack_units — the total slot count stays
    # static; invalid leaves sort to the tail as invalid units/clusters).
    lpu = scene_mod.LPU
    lv_flat = leaf_verts.reshape(-1, 3, 3)
    lm_flat = leaf_mask.reshape(-1)
    order = _morton_leaf_order(lv_flat.mean(axis=1), lm_flat)
    l_pad = -(-lv_flat.shape[0] // (lpu * UNITS_PER_CLUSTER)) \
        * (lpu * UNITS_PER_CLUSTER)
    pad_n = l_pad - lv_flat.shape[0]
    lv_sorted = jnp.pad(lv_flat[order], ((0, pad_n), (0, 0), (0, 0)))
    lm_sorted = jnp.pad(lm_flat[order], ((0, pad_n),))
    unit_leaf_idx = jnp.pad(
        jnp.where(lm_flat[order], order.astype(jnp.int32), -1),
        ((0, pad_n),), constant_values=-1)
    lv_sorted = jnp.where(lm_sorted[:, None, None], lv_sorted, 0.0)

    u_total = l_pad // lpu
    ulv = lv_sorted.reshape(u_total, lpu, 3, 3)
    ulm = lm_sorted.reshape(u_total, lpu)
    unit_leaf_idx = unit_leaf_idx.reshape(u_total, lpu)
    u_lv = ulv.reshape(u_total, -1, 3)
    u_lm = jnp.repeat(ulm, 3, axis=1)[..., None]
    unit_valid = ulm.any(axis=1)
    unit_aabb_min = jnp.where(u_lm, u_lv, BIG).min(axis=1)
    unit_aabb_max = jnp.where(u_lm, u_lv, -BIG).max(axis=1)

    # Recentered u/v rows, absolute q16 — the jnp twin of
    # models/scene.py::pack_units (see its recentering comment).
    lmf = ulm[..., None].astype(jnp.float32)
    v0, v1, v2 = ulv[:, :, 0], ulv[:, :, 1], ulv[:, :, 2]
    center = 0.5 * (unit_aabb_min + unit_aabb_max)
    v0c = (v0 - center[:, None, :]) * lmf
    e1 = (v1 - v0) * lmf
    e2 = (v2 - v0) * lmf
    nvec = jnp.cross(e1, e2)
    w1 = jnp.cross(e2, v0c)
    w2 = jnp.cross(v0c, e1)
    w1_abs = jnp.cross(e2, v0 * lmf)
    w2_abs = jnp.cross(v0 * lmf, e1)
    u_total = ulv.shape[0]
    unit_qn = jnp.zeros((u_total, 8, 4 * lpu + 128), jnp.float32)
    unit_qn = unit_qn.at[:, 0:3, 0 * lpu:1 * lpu].set(
        -nvec.transpose(0, 2, 1))
    unit_qn = unit_qn.at[:, 0:3, 1 * lpu:2 * lpu].set(-w1.transpose(0, 2, 1))
    unit_qn = unit_qn.at[:, 3:6, 1 * lpu:2 * lpu].set(e2.transpose(0, 2, 1))
    unit_qn = unit_qn.at[:, 0:3, 2 * lpu:3 * lpu].set(-w2.transpose(0, 2, 1))
    unit_qn = unit_qn.at[:, 3:6, 2 * lpu:3 * lpu].set(-e1.transpose(0, 2, 1))
    unit_e2w2 = (e2 * w2).sum(-1)
    norm = jnp.maximum(jnp.linalg.norm(nvec, axis=-1, keepdims=True), 1e-20)
    unit_nrm = nvec / norm
    unit_qn = unit_qn.at[:, 0:3, 4 * lpu:5 * lpu].set(
        unit_nrm.transpose(0, 2, 1))
    unit_qn = unit_qn.at[:, 3, 4 * lpu:5 * lpu].set(unit_e2w2)
    npad = scene.unit_nrm_pad.shape[2]
    unit_nrm_pad = jnp.zeros((u_total, 8, npad), jnp.float32)
    unit_nrm_pad = unit_nrm_pad.at[:, 0:3, 0:lpu].set(
        unit_nrm.transpose(0, 2, 1))
    e2w2_abs = (e2 * w2_abs).sum(-1)
    unit_q16 = jnp.zeros((u_total, 16, 4 * lpu), jnp.float32)
    unit_q16 = unit_q16.at[:, 0:3, 0 * lpu:1 * lpu].set(
        -nvec.transpose(0, 2, 1))
    unit_q16 = unit_q16.at[:, 0:3, 1 * lpu:2 * lpu].set(
        -w1_abs.transpose(0, 2, 1))
    unit_q16 = unit_q16.at[:, 3:6, 1 * lpu:2 * lpu].set(
        e2.transpose(0, 2, 1))
    unit_q16 = unit_q16.at[:, 0:3, 2 * lpu:3 * lpu].set(
        -w2_abs.transpose(0, 2, 1))
    unit_q16 = unit_q16.at[:, 3:6, 2 * lpu:3 * lpu].set(
        -e1.transpose(0, 2, 1))
    unit_q16 = unit_q16.at[:, 6:9, 3 * lpu:4 * lpu].set(
        nvec.transpose(0, 2, 1))
    unit_q16 = unit_q16.at[:, 9, 3 * lpu:4 * lpu].set(-e2w2_abs)

    # Clusters over the (already Morton-packed) units.
    n_cl = u_total // UNITS_PER_CLUSTER
    cl_mask = unit_valid.reshape(n_cl, UNITS_PER_CLUSTER, 1)
    cluster_aabb_min = jnp.where(
        cl_mask, unit_aabb_min.reshape(n_cl, UNITS_PER_CLUSTER, 3),
        BIG).min(axis=1)
    cluster_aabb_max = jnp.where(
        cl_mask, unit_aabb_max.reshape(n_cl, UNITS_PER_CLUSTER, 3),
        -BIG).max(axis=1)
    cluster_valid = cl_mask[..., 0].any(axis=1)

    meta = jnp.zeros((n_cl, 8, 128), jnp.float32)
    meta = meta.at[:, 0:3, :UNITS_PER_CLUSTER].set(
        unit_aabb_min.reshape(n_cl, UNITS_PER_CLUSTER, 3).transpose(0, 2, 1))
    meta = meta.at[:, 3:6, :UNITS_PER_CLUSTER].set(
        unit_aabb_max.reshape(n_cl, UNITS_PER_CLUSTER, 3).transpose(0, 2, 1))
    meta = meta.at[:, 6, :UNITS_PER_CLUSTER].set(
        unit_valid.reshape(n_cl, UNITS_PER_CLUSTER).astype(jnp.float32))

    return dataclasses.replace(
        scene,
        aabb_min=aabb_min, aabb_max=aabb_max,
        plane_t=dirs(scene.plane_t), plane_b=dirs(scene.plane_b),
        plane_n=dirs(scene.plane_n), plane_o=pts(scene.plane_o),
        node_verts=(None if scene.node_verts is None
                    else lengths(scene.node_verts)),
        node_minmax=(None if scene.node_minmax is None
                     else lengths(scene.node_minmax)),
        node_pass=(None if scene.node_pass is None
                   else tile(scene.node_pass)),
        leaf_verts=leaf_verts, leaf_mask=leaf_mask, tri_valid=tri_valid,
        unit_aabb_min=unit_aabb_min, unit_aabb_max=unit_aabb_max,
        unit_valid=unit_valid, unit_leaf_idx=unit_leaf_idx,
        unit_qn=unit_qn, unit_n=nvec, unit_e2w2=unit_e2w2,
        unit_nrm=unit_nrm, unit_nrm_pad=unit_nrm_pad, unit_q16=unit_q16,
        cluster_aabb_min=cluster_aabb_min, cluster_aabb_max=cluster_aabb_max,
        cluster_valid=cluster_valid, cluster_unit_meta=meta)


def render_instanced(scene: DeviceScene, instances: list[Instance],
                     inv_view_proj, cfg, interpret: bool | None = None):
    """Render N instances of `scene` with true two-level traversal.

    Returns (H, W, 3) float32. The scene tables are shared (object space);
    only a (N, 3, 3) rotation + (N, 3) translation + (N,) scale stack is
    instance-specific.
    """
    # Compressed scenes work as-is: the kernel / XLA tile backend derive
    # the MT tables per unit from the (object-space) grid records; only
    # the precomputed-table t_num/q_frame inputs are skipped below.
    rot = jnp.asarray(np.stack([i.rotation for i in instances]), jnp.float32)
    trn = jnp.asarray(np.stack([i.translation for i in instances]),
                      jnp.float32)
    scl = jnp.asarray(np.asarray([i.scale for i in instances]), jnp.float32)
    return _render_instanced(scene, rot, trn, scl,
                             jnp.asarray(inv_view_proj, jnp.float32),
                             cfg, interpret)


def _tile_cap(cfg, n_tiles: int) -> int:
    """Per-instance tile-row cap for the SERIAL path's compaction window
    (the merged launch sizes its one global pool via _row_budget
    instead). The cap only bounds one instance's gathered-tile window —
    no N-scaled buffer exists here — so the footprint heuristic stands.
    RTMM_INSTANCE_TILE_CAP overrides for bench A/Bs (0 = cfg/auto)."""
    import os
    env = int(os.environ.get("RTMM_INSTANCE_TILE_CAP", "0"))
    auto = max(4 * cfg.tiles_per_block, n_tiles // 8)
    cap = env or cfg.instance_tile_cap or auto
    return min(n_tiles, cap)


def _row_budget(cfg, n_tiles: int, n_inst: int) -> int:
    """Total (instance, tile) candidate rows of the merged launch — ONE
    shared pool filled by footprint (VERDICT r4 item 4), replacing the
    fixed per-instance cap whose N x cap rows paid for empty tiles
    whenever footprints were uneven. The launch's floor cost is ~1 us
    per row (grid step + output traffic — the round-4 cap sweep), so the
    budget should sit just above the summed footprint. Default
    n_tiles + 4 * n_inst: every screen tile claimed once (instances that
    tile the screen without overlap) plus 4 rows per instance for
    overlap and conservative AABB-corner tiles — measured on the bench
    rings, S_max = 1,682 (64 inst) / 2,415 (256 inst) of n_tiles =
    2,040, both under the default with margin, and shrinking the pool
    from the earlier 2 * n_tiles blanket to ~the footprint measured
    +13% on config 8 (~0.9 us/padding row). The budget must also scale
    with N at SMALL frames or the pool can't even hold one row per
    instance (the 480x288 verify at N=256 overflowed nearly every
    instance into the serial backstop — double-tracing every pixel and
    verifying the backstop instead of the merged path). Overflow
    (summed footprint > budget) stays exact via the serial re-run
    backstop. RTMM_INSTANCE_ROWS overrides; cfg.instance_tile_cap (a
    PER-INSTANCE tile cap) maps to its aggregate row meaning, cap * N —
    the overflow tests force tiny pools through it."""
    import os
    env = int(os.environ.get("RTMM_INSTANCE_ROWS", "0"))
    rows = env or (cfg.instance_tile_cap * n_inst
                   if cfg.instance_tile_cap else n_tiles + 4 * n_inst)
    return min(n_inst * n_tiles, rows)


def _render_instanced_merged(scene, rot, trn, scl, ivp, cfg,
                             interpret: bool):
    """N-insensitive two-level traversal: ONE kernel launch for ALL
    instances (VERDICT round-3 item 4).

    Every kernel input is per-TILE (the frustum pack carries the apex;
    t_num derives in-kernel), so instances batch exactly like frames
    (pallas_tiled.render_pallas_frames). Rows come from ONE global pool
    (_row_budget): the per-tile instance cull flags every (instance,
    tile) pair whose frustum sees the instance, and the first `rows`
    pairs in instance-major order each get one kernel row — object-space
    rays + frustum pack + cluster list built per ROW. Closest hits
    min-combine across instances in world t with a scatter-min
    afterwards (exact-tie normals sum, matching the kernel's own one-hot
    tie semantics). Cost scales with the summed screen FOOTPRINT, not
    with N — the role hardware TLAS instancing plays for the reference
    (src/GPUMesh.cpp:238-278).

    Exactness is preserved by a follow-up pass: if the summed footprint
    overflows the pool, every instance at or past the truncation point
    re-runs through the serial full-frame trace, min-combining into the
    same best (lax.cond per instance: the common all-fit case is a
    passthrough). Requires single-window cluster lists
    (num_clusters <= kernel_clusters_per_window); callers fall back to
    the serial path otherwise.
    """
    from ..ops import culling, pallas_tiled, raygen, shading, tiled
    from ..ops.tiled import TILE

    n_inst = rot.shape[0]
    width, height = cfg.width, cfg.height
    pw, ph = tiled.padded_size(width, height)
    tx, ty = pw // culling.TILE_W, ph // culling.TILE_H
    n_tiles = tx * ty
    kc = max(1, min(cfg.kernel_clusters_per_window, scene.num_clusters))

    apex_w, normals_w = culling.tile_frustums(ivp, width, height, pw, ph)
    sub_normals_w = culling.tile_sub_frustums(ivp, width, height, pw, ph,
                                              n_sub=cfg.sub_frusta,
                                              n_rows=cfg.sub_rows)
    origins_w, dirs_w = raygen.generate_rays(ivp, width, height, pw, ph)

    def to_tiles(x):
        return (x.reshape(ty, culling.TILE_H, tx, culling.TILE_W, 3)
                .transpose(0, 2, 1, 3, 4).reshape(n_tiles, TILE, 3))

    dirs_w = to_tiles(dirs_w)
    origins_w = to_tiles(origins_w)
    s_w = ((origins_w - apex_w) * dirs_w).sum(-1)        # (tiles, TILE)

    rows = _row_budget(cfg, n_tiles, n_inst)
    hp = jax.lax.Precision.HIGHEST
    exit_aabb = tiled.scene_exit_aabb(scene)

    # Per-instance object-space camera + coarse cull (the only O(N x
    # tiles) stage; everything downstream is per-ROW).
    inv_s = 1.0 / scl                                     # (N,)
    apex_o = (jnp.einsum("nji,nj->ni", rot, apex_w - trn, precision=hp)
              * inv_s[:, None])                           # (N, 3)
    normals_o = jnp.einsum("nji,xyj->nxyi", rot, normals_w,
                           precision=hp)                  # (N, tiles, 4, 3)
    cluster_hit = jax.vmap(
        lambda a, nm: culling.cull_units(a, nm, scene.cluster_aabb_min,
                                         scene.cluster_aabb_max,
                                         scene.cluster_valid)
    )(apex_o, normals_o)                                  # (N, tiles, C)
    tile_sees = cluster_hit.any(axis=2)                   # (N, tiles)
    n_seen = tile_sees.sum(axis=1)                        # (N,)

    # Global row assignment, instance-major: one sort of the flat
    # (instance, tile) flags — seen pairs first, in order — then take
    # the first `rows`. An instance is fully covered iff the running sum
    # of footprints up to it fits the pool (checked below).
    total = n_inst * n_tiles
    fidx = jnp.arange(total, dtype=jnp.int32)
    key = jnp.where(tile_sees.reshape(total), fidx, jnp.int32(total))
    _, sidx = jax.lax.sort_key_val(key, fidx)
    sel = sidx[:rows]
    row_valid = key[sel] < total                          # padding rows
    row_inst = jnp.where(row_valid, sel // n_tiles, 0)
    row_tile = jnp.where(row_valid, sel % n_tiles, 0)

    # Per-row object-space rays + frustum pack + cluster list.
    import os as _os
    # Default ON (measured +11% on config 8, image gate clean): the
    # in-kernel path drops the (rows, TILE, 8) object-space ray table
    # and its ~32 KB/row build + stream traffic entirely.
    kray = _os.environ.get("RTMM_INSTANCED_KRAYGEN", "1") == "1"
    row_rot = rot[row_inst]                               # (rows, 3, 3)
    row_apex = apex_o[row_inst]                           # (rows, 3)
    row_invs = inv_s[row_inst]
    sub_o = jnp.einsum("rji,rsyj->rsyi", row_rot, sub_normals_w[row_tile],
                       precision=hp)                      # (rows, ns, 4, 3)
    nsub = sub_o.shape[1]
    if kray:
        # In-kernel raygen + object transform (A/B): the pack gains the
        # raygen scalars + [R^T (9), inv_s (1), apex_w (3)] and the
        # kernel builds each row's object-space ray matrix itself — no
        # (rows, TILE, 8) HBM table exists at all (~32 KB/row of build
        # + stream traffic gone; see pallas_tiled._raygen_rows).
        raymat = None
        pack = tiled.frustum_pack_len(nsub, with_xform=True)
        used = 3 + nsub * 12 + 18 + 6 + 13
        px0 = ((row_tile % tx) * culling.TILE_W).astype(jnp.float32)
        py0 = ((row_tile // tx) * culling.TILE_H).astype(jnp.float32)
        m16 = jnp.broadcast_to(
            ivp.astype(jnp.float32).reshape(16), (rows, 16))
        xf = jnp.concatenate(
            [row_rot.transpose(0, 2, 1).reshape(rows, 9),
             row_invs[:, None],
             jnp.broadcast_to(apex_w, (rows, 3))], axis=1)
        frus = jnp.concatenate(
            [row_apex, sub_o.reshape(rows, nsub * 12),
             px0[:, None], py0[:, None], m16,
             jnp.broadcast_to(exit_aabb, (rows, 6)), xf,
             jnp.zeros((rows, pack - used), jnp.float32)], axis=1)
    else:
        d_o = jnp.einsum("rji,rtj->rti", row_rot, dirs_w[row_tile],
                         precision=hp)                    # (rows, TILE, 3)
        m_o = jnp.cross(row_apex[:, None, :], d_o)
        s_o = s_w[row_tile] * row_invs[:, None]
        raymat = jnp.concatenate(
            [d_o, m_o, s_o[..., None], jnp.ones_like(s_o)[..., None]],
            axis=-1)
        pack = tiled.frustum_pack_len(nsub)
        used = 3 + nsub * 12 + 6
        frus = jnp.concatenate(
            [row_apex, sub_o.reshape(rows, nsub * 12),
             jnp.broadcast_to(exit_aabb, (rows, 6)),
             jnp.zeros((rows, pack - used), jnp.float32)], axis=1)

    cl_dist = culling.aabb_distance(
        apex_o[:, None, :], scene.cluster_aabb_min,
        scene.cluster_aabb_max)                           # (N, C)
    row_hit = cluster_hit[row_inst, row_tile]             # (rows, C)
    ckey = jnp.where(row_hit & row_valid[:, None],
                     -cl_dist[row_inst], -jnp.inf)
    negd, cidx = jax.lax.top_k(ckey, kc)
    csel = negd > -jnp.inf
    centry = jnp.where(csel, -negd, jnp.inf).astype(jnp.float32)

    # Stage-attribution knobs (timing A/Bs ONLY — both produce wrong
    # images; the bench image gate must be off when used):
    # RTMM_INSTANCED_NOTRACE=1 skips the kernel launch (measures the XLA
    # prologue + combine; the fake output keeps a data dependence on the
    # built inputs so XLA cannot DCE the prologue);
    # RTMM_INSTANCED_NOCOMBINE=1 (below) replaces the scatter-min with a
    # cheap reshape (isolates the combine cost).
    if _os.environ.get("RTMM_INSTANCED_NOTRACE", "0") == "1":
        dep = (frus[:, 0:1, None] if raymat is None
               else raymat[:, 0:1, 0:1])
        out = jnp.concatenate(
            [jnp.broadcast_to(dep, (rows, 1, TILE)) + BIG,
             jnp.zeros((rows, 3, TILE), jnp.float32)], axis=1)
    else:
        out = pallas_tiled.trace_pallas(
            scene, None if raymat is None else raymat.transpose(0, 2, 1),
            frus, cidx.astype(jnp.int32),
            csel.sum(axis=1).astype(jnp.int32), centry, None, None, cfg,
            interpret=interpret, raw=True,
            xform_raygen=kray)                            # (rows, 4, TILE)

    # Object -> world: t scales per instance, normals rotate.
    bt_o = out[:, 0]                                      # (rows, TILE)
    bn_o = out[:, 1:4]                                    # (rows, 3, TILE)
    bt_w = jnp.where(bt_o < BIG * 0.5, bt_o * scl[row_inst][:, None], BIG)
    bn_w = jnp.einsum("rij,rjt->rti", row_rot, bn_o)      # (rows, TILE, 3)

    # Min-combine across instances by target tile (duplicate tile rows
    # from different instances are exactly what .at[].min handles).
    if _os.environ.get("RTMM_INSTANCED_NOCOMBINE", "0") == "1":
        best_t = bt_w[:n_tiles]                 # timing A/B: wrong image
        best_n = bn_w[:n_tiles]
    else:
        best_t = jnp.full((n_tiles, TILE), BIG, jnp.float32
                          ).at[row_tile].min(bt_w)
        winner = bt_w <= best_t[row_tile]
        best_n = jnp.zeros((n_tiles, TILE, 3), jnp.float32
                           ).at[row_tile].add(
            jnp.where(winner[..., None], bn_w, 0.0))

    # Exactness backstop: instance-major assignment means an instance is
    # fully covered iff the cumulative footprint through it fits the
    # pool; the truncated tail re-runs through the serial full-frame
    # trace (min-combining is idempotent for rows already traced).
    overflow = jnp.cumsum(n_seen) > rows
    best_t, best_n = _overflow_pass(scene, rot, trn, scl, overflow,
                                    best_t, best_n, apex_w, normals_w,
                                    sub_normals_w, dirs_w, s_w, cfg,
                                    interpret)

    hit = best_t < BIG * 0.5
    nrm = best_n / jnp.maximum(
        jnp.linalg.norm(best_n, axis=-1, keepdims=True), 1e-20)
    colors = shading.shade_or_miss(hit, nrm, -dirs_w, cfg)
    img = (colors.reshape(ty, tx, culling.TILE_H, culling.TILE_W, 3)
           .transpose(0, 2, 1, 3, 4).reshape(ph, pw, 3))
    return img[:cfg.height, :cfg.width]


def _overflow_pass(scene, rot, trn, scl, overflow, best_t, best_n,
                   apex_w, normals_w, sub_normals_w, dirs_w, s_w, cfg,
                   interpret):
    """Serial full-frame pass over ONLY the instances whose footprint
    overflowed the merged launch's per-instance tile cap. The cond's
    passthrough branch makes the common all-fit case ~free."""
    from ..ops import culling, pallas_tiled, tiled
    from ..ops.tiled import TILE

    n_tiles = dirs_w.shape[0]
    kc = max(1, min(cfg.kernel_clusters_per_window, scene.num_clusters))
    lpu = scene.leaves_per_unit
    hp = jax.lax.Precision.HIGHEST
    exit_aabb = tiled.scene_exit_aabb(scene)

    def one(carry, inst):
        best_t, best_n = carry
        r, t, s, ov = inst
        inv_s = 1.0 / s

        def full(args):
            best_t, best_n = args
            apex_o = jnp.einsum("ij,j->i", r.T, apex_w - t,
                                precision=hp) * inv_s
            normals_o = jnp.einsum("ij,xyj->xyi", r.T, normals_w,
                                   precision=hp)
            sub_normals_o = jnp.einsum("ij,xsyj->xsyi", r.T, sub_normals_w,
                                       precision=hp)
            cluster_hit = culling.cull_units(
                apex_o, normals_o, scene.cluster_aabb_min,
                scene.cluster_aabb_max, scene.cluster_valid)
            dirs_o = jnp.einsum("ij,xyj->xyi", r.T, dirs_w, precision=hp)
            m_o = jnp.cross(jnp.broadcast_to(apex_o, dirs_o.shape), dirs_o)
            s_o = s_w * inv_s
            raymat = jnp.concatenate(
                [dirs_o, m_o, s_o[..., None],
                 jnp.ones_like(s_o)[..., None]], axis=-1)
            q_frame = None
            if interpret and not scene.compressed:
                t_num = tiled.frame_t_num(scene, apex_o)
                q_frame = scene.unit_qn.at[:, 7, 3 * lpu:4 * lpu].set(t_num)
            fi = tiled.FrameInputs(raymat, q_frame, dirs_o, apex_o,
                                   normals_o, cluster_hit,
                                   sub_normals_o, None, exit_aabb)
            init_t = best_t * inv_s
            if interpret:
                init_n3 = jnp.einsum("ij,xyj->xyi", r.T, best_n)
                bt_o, bn_o3 = tiled.trace_windowed(
                    scene, fi, cfg,
                    _xla_window(scene, fi, cfg), init_t, init_n3)
                bn_w = jnp.einsum("ij,xyj->xyi", r, bn_o3)
            else:
                frus = tiled.frustum_scalars(fi)
                init_n = jnp.zeros((n_tiles, 8, TILE), jnp.float32)
                init_n = init_n.at[:, 0:3].set(
                    jnp.einsum("ij,xjy->xiy", r.T,
                               best_n.transpose(0, 2, 1)))
                raymat_t = raymat.transpose(0, 2, 1)

                def trace_window(ccand, ccount, centry, bt, bn):
                    return pallas_tiled.trace_pallas(
                        scene, raymat_t, frus, ccand, ccount,
                        centry, bt, bn, cfg, interpret=interpret)

                bt_o, bn_rows = tiled.trace_windowed_clusters(
                    scene, fi, cfg, trace_window, init_t, init_n, kc=kc)
                bn_w = jnp.einsum("ij,xjy->xyi", r, bn_rows[:, 0:3])
            bt_w = jnp.where(bt_o < BIG * 0.5, bt_o * s, best_t)
            return bt_w, bn_w

        best_t, best_n = jax.lax.cond(ov, full, lambda a: a,
                                      (best_t, best_n))
        return (best_t, best_n), None

    (best_t, best_n), _ = jax.lax.scan(one, (best_t, best_n),
                                       (rot, trn, scl, overflow))
    return best_t, best_n


def _render_instanced(scene, rot, trn, scl, ivp, cfg, interpret=None,
                      serial: bool = False):
    import jax as _jax

    from ..ops import culling, pallas_tiled, shading, tiled
    from ..ops.tiled import TILE

    if interpret is None:
        interpret = _jax.devices()[0].platform == "cpu"

    # The merged one-launch path is the production TLAS analog whenever a
    # single cluster window covers the scene; serial=True (or
    # RTMM_INSTANCED_SERIAL=1) forces the round-3 per-instance scan —
    # the A/B partner and the bench image gate's independent reference.
    import os as _os
    kc_fit = scene.num_clusters <= max(1, cfg.kernel_clusters_per_window)
    if (kc_fit and not serial
            and _os.environ.get("RTMM_INSTANCED_SERIAL", "0") != "1"):
        return _render_instanced_merged(scene, rot, trn, scl, ivp, cfg,
                                        interpret)
    width, height = cfg.width, cfg.height
    pw, ph = tiled.padded_size(width, height)
    tx, ty = pw // culling.TILE_W, ph // culling.TILE_H
    n_tiles = tx * ty

    # World-space per-frame ray data (shared across instances).
    from ..ops import raygen

    apex_w, normals_w = culling.tile_frustums(ivp, width, height, pw, ph)
    sub_normals_w = culling.tile_sub_frustums(ivp, width, height, pw, ph,
                                              n_sub=cfg.sub_frusta,
                                              n_rows=cfg.sub_rows)
    origins_w, dirs_w = raygen.generate_rays(ivp, width, height, pw, ph)

    def to_tiles(x):
        return (x.reshape(ty, culling.TILE_H, tx, culling.TILE_W, 3)
                .transpose(0, 2, 1, 3, 4).reshape(n_tiles, TILE, 3))

    dirs_w = to_tiles(dirs_w)
    origins_w = to_tiles(origins_w)
    s_w = ((origins_w - apex_w) * dirs_w).sum(-1)        # (tiles, TILE)
    lpu = scene.leaves_per_unit

    m_cap = _tile_cap(cfg, n_tiles)
    use_compact = m_cap < n_tiles

    def one_instance(carry, inst):
        best_t, best_n = carry                            # world-space
        r, t, s = inst                                    # (3,3), (3,), ()
        inv_s = 1.0 / s
        # object space: p_obj = R^T (p - t) / s, directions rotate only
        hp = jax.lax.Precision.HIGHEST
        apex_o = jnp.einsum("ij,j->i", r.T, apex_w - t, precision=hp) * inv_s
        normals_o = jnp.einsum("ij,xyj->xyi", r.T, normals_w, precision=hp)
        sub_normals_o = jnp.einsum("ij,xsyj->xsyi", r.T, sub_normals_w,
                                   precision=hp)
        cluster_hit_full = culling.cull_units(
            apex_o, normals_o, scene.cluster_aabb_min,
            scene.cluster_aabb_max, scene.cluster_valid)
        # t_num: only the XLA correctness path (interpret) needs the
        # per-instance table — the kernel derives it from the frus apex.
        t_num = (None if scene.compressed or not interpret
                 else tiled.frame_t_num(scene, apex_o))
        kc = max(1, min(cfg.kernel_clusters_per_window, scene.num_clusters))

        def object_raymat(dirs_g, s_g):
            dirs_o = jnp.einsum("ij,xyj->xyi", r.T, dirs_g,
                                precision=jax.lax.Precision.HIGHEST)
            m_o = jnp.cross(jnp.broadcast_to(apex_o, dirs_o.shape), dirs_o)
            s_o = s_g * inv_s
            return dirs_o, jnp.concatenate(
                [dirs_o, m_o, s_o[..., None],
                 jnp.ones_like(s_o)[..., None]], axis=-1)

        def trace_compact(args):
            """Per-tile instance culling: gather only the tiles whose
            frustum sees this instance, trace those through the kernel,
            scatter the improved world-space hits back. Per-instance cost
            is O(screen footprint), not O(frame) — the role hardware
            instance culling plays for the reference's TLAS
            (GPUMesh.cpp:238-278)."""
            best_t, best_n = args
            tile_sees = cluster_hit_full.any(axis=1)      # (tiles,)
            key = jnp.where(tile_sees,
                            n_tiles - jax.lax.iota(jnp.int32, n_tiles), 0)
            _, tidx = jax.lax.top_k(key, m_cap)           # ascending tiles
            # Padding slots land on distinct unseen tiles (top_k indices
            # are unique): their ccount is 0, the trace returns the carry,
            # and the scatter writes back unchanged values.
            dirs_o, raymat = object_raymat(dirs_w[tidx], s_w[tidx])
            fi = tiled.FrameInputs(
                raymat, None, dirs_o, apex_o, normals_o[tidx],
                cluster_hit_full[tidx], sub_normals_o[tidx], t_num,
                tiled.scene_exit_aabb(scene))
            frus = tiled.frustum_scalars(fi)
            raymat_t = raymat.transpose(0, 2, 1)

            def trace_window(ccand, ccount, centry, bt, bn):
                return pallas_tiled.trace_pallas(
                    scene, raymat_t, frus, ccand, ccount, centry,
                    bt, bn, cfg, interpret=interpret)

            old_t = best_t[tidx]
            init_t = old_t * inv_s
            init_n = jnp.zeros((m_cap, 8, TILE), jnp.float32)
            init_n = init_n.at[:, 0:3].set(
                jnp.einsum("ij,xjy->xiy", r.T,
                           best_n[tidx].transpose(0, 2, 1)))
            bt_o, bn_rows = tiled.trace_windowed_clusters(
                scene, fi, cfg, trace_window, init_t, init_n, kc=kc)
            bn_w = jnp.einsum("ij,xjy->xyi", r, bn_rows[:, 0:3])
            bt_w = jnp.where(bt_o < BIG * 0.5, bt_o * s, old_t)
            improved = bt_w < old_t
            new_t = best_t.at[tidx].set(jnp.where(improved, bt_w, old_t))
            new_n = best_n.at[tidx].set(
                jnp.where(improved[..., None], bn_w, best_n[tidx]))
            return new_t, new_n

        def trace_full(args):
            """All tiles (an instance filling most of the frame)."""
            best_t, best_n = args
            dirs_o, raymat = object_raymat(dirs_w, s_w)
            # Only the XLA correctness path gathers whole q blocks; the
            # Pallas branch keeps unit_qn static and folds t_num in-kernel.
            q_frame = (scene.unit_qn.at[:, 7, 3 * lpu:4 * lpu].set(t_num)
                       if interpret and not scene.compressed else None)
            fi = tiled.FrameInputs(raymat, q_frame, dirs_o, apex_o,
                                   normals_o, cluster_hit_full,
                                   sub_normals_o, t_num,
                                   tiled.scene_exit_aabb(scene))
            # Carry converts world -> object (t scales, normal rows
            # rotate) so the kernel's early exit prunes against hits from
            # prior instances.
            init_t = best_t * inv_s
            if interpret:
                # XLA windowed tracer (CPU correctness path).
                init_n3 = jnp.einsum("ij,xyj->xyi", r.T, best_n)
                bt_o, bn_o3 = tiled.trace_windowed(
                    scene, fi, cfg,
                    _xla_window(scene, fi, cfg), init_t, init_n3)
                bn_w = jnp.einsum("ij,xyj->xyi", r, bn_o3)
            else:
                frus = tiled.frustum_scalars(fi)
                init_n = jnp.zeros((n_tiles, 8, TILE), jnp.float32)
                init_n = init_n.at[:, 0:3].set(
                    jnp.einsum("ij,xjy->xiy", r.T,
                               best_n.transpose(0, 2, 1)))
                raymat_t = raymat.transpose(0, 2, 1)

                def trace_window(ccand, ccount, centry, bt, bn):
                    return pallas_tiled.trace_pallas(
                        scene, raymat_t, frus, ccand, ccount,
                        centry, bt, bn, cfg, interpret=False)

                bt_o, bn_rows = tiled.trace_windowed_clusters(
                    scene, fi, cfg, trace_window, init_t, init_n, kc=kc)
                bn_w = jnp.einsum("ij,xjy->xyi", r,
                                  bn_rows[:, 0:3])        # (tiles, TILE, 3)
            bt_w = jnp.where(bt_o < BIG * 0.5, bt_o * s, best_t)
            return bt_w, bn_w

        if use_compact:
            n_seen = cluster_hit_full.any(axis=1).sum()
            best_t, best_n = jax.lax.cond(
                n_seen <= m_cap, trace_compact, trace_full,
                (best_t, best_n))
        else:
            best_t, best_n = trace_full((best_t, best_n))
        return (best_t, best_n), None

    init = (jnp.full((n_tiles, TILE), BIG, jnp.float32),
            jnp.zeros((n_tiles, TILE, 3), jnp.float32))
    (best_t, best_n), _ = jax.lax.scan(one_instance, init, (rot, trn, scl))

    hit = best_t < BIG * 0.5
    nrm = best_n / jnp.maximum(
        jnp.linalg.norm(best_n, axis=-1, keepdims=True), 1e-20)
    colors = shading.shade_or_miss(hit, nrm, -dirs_w, cfg)
    img = (colors.reshape(ty, tx, culling.TILE_H, culling.TILE_W, 3)
           .transpose(0, 2, 1, 3, 4).reshape(ph, pw, 3))
    return img[:cfg.height, :cfg.width]


def _xla_window(scene, fi, cfg):
    def trace_window(cand, count, entry, best_t, best_n):
        c_max = cand.shape[1]

        def body(c, carry):
            bt, bn = carry
            from ..ops import tiled as tiled_mod
            tb, nb = tiled_mod.trace_candidate(
                scene, fi.raymat, fi.q_frame, cand[:, c], c < count, cfg,
                apex=fi.apex)
            take = tb < bt
            return (jnp.where(take, tb, bt),
                    jnp.where(take[..., None], nb, bn))

        return jax.lax.fori_loop(0, c_max, body, (best_t, best_n))

    return trace_window


class InstancedRenderer:
    """jit-compiled two-level (TLAS-style) frame renderer: N instances of
    one shared object-space scene, O(scene + N) HBM."""

    def __init__(self, scene: DeviceScene, instances: list[Instance], cfg):
        import functools

        from ..ops import pallas_tiled

        self.scene = scene
        self.cfg = cfg = pallas_tiled.resolve_mt_precision(scene, cfg)
        self.rot = jnp.asarray(np.stack([i.rotation for i in instances]),
                               jnp.float32)
        self.trn = jnp.asarray(np.stack([i.translation for i in instances]),
                               jnp.float32)
        self.scl = jnp.asarray(np.asarray([i.scale for i in instances]),
                               jnp.float32)
        interpret = jax.devices()[0].platform == "cpu"
        self._fn = jax.jit(functools.partial(
            _render_instanced, cfg=cfg, interpret=interpret),
            keep_unused=True)

    def render(self, inv_view_proj: np.ndarray) -> jax.Array:
        return self._fn(self.scene, self.rot, self.trn, self.scl,
                        jnp.asarray(inv_view_proj, jnp.float32))

    def render_u8(self, inv_view_proj: np.ndarray) -> np.ndarray:
        img = self.render(inv_view_proj)
        return np.asarray((jnp.clip(img, 0.0, 1.0) * 255.0 + 0.5
                           ).astype(jnp.uint8))
