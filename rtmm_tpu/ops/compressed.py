"""Compressed traversal units: leaf geometry derived at trace time.

The reference's whole reason to exist is tracing micro-meshes WITHOUT
pre-tessellating: its intersection shader reconstructs each displaced
micro-triangle on the fly from base geometry + displacement scalars
(/root/reference/shaders/intersection.hlsl:465-470, createDisplacedTriangle
:193-202), so only scalars and small hierarchy tables live in GPU memory.

The standard DeviceScene tables (unit_qn/unit_q16/leaf_verts) instead
materialize every micro-triangle's Möller-Trumbore rows — ~580 B per
micro-triangle, which caps one 16 GiB chip at ~25M micro-tris. Compressed
mode restores the reference's memory model the TPU way:

  * a traversal unit is one level-(L-3) subtree of one base triangle
    (64 leaf micro-triangles, 45 shared grid vertices);
  * the scene stores ONLY the unit's 45 displaced grid-vertex positions —
    one (GRID_ROWS=4, 128)-f32 record, 2 KiB/unit = 32 B/micro-tri,
    18x smaller;
  * at trace time the 64 leaves' MT rows are derived from the record:
    a one-hot gather matmul expands grid vertices to leaf corners
    (v0|v1|v2), then edges/cross products/e2.w2 on the VPU — the exact
    quantities pack_units precomputes on the host (models/scene.py),
    bit-compatible up to fp reassociation.

The micro-vertex positions themselves are barycentric-affine in the base
triangle (pos = lerp(corners) + scale * lerp(directions), the closed form
of ops/precompute._leaf_verts_3d), so the 45 stored positions are the
minimal per-unit state; everything else is reconstructed, exactly as the
reference reconstructs leaf vertices per ray.
"""
from __future__ import annotations

import functools

import numpy as np

from . import subdivision

GRID_ROWS = 4       # record rows: 0-2 = grid-point xyz, 3 = spare
GRID_LANES = 128    # lane-aligned record width (45 used at sub-level 3)
SUB_LEVEL = 3       # unit = level-(L-3) subtree -> 64 leaves, 45 vertices
LPU = 64            # leaf columns per unit (4^SUB_LEVEL)
# Indexed records (mixed-level / stitched-presence scenes): three extra
# rows carry per-unit leaf-corner lane indices, so the stitched topology
# — the reference's 6-case presence re-stitching
# (intersection.hlsl:339-371) — is encoded in the unit itself and ONE
# kernel traces any level mix. Row 3+j, lanes 0..LPU-1: corner-j lane
# indices (one row per corner keeps every kernel slice at lane offset 0 —
# Mosaic penalizes non-128-aligned lane offsets). Index GRID_LANES-1 is
# the degenerate sentinel: lane 127 of every record is zero (<= 45 grid
# points used), so padded leaf columns derive v0 = v1 = v2 = 0 ->
# det == 0 -> rejected by the standard epsilon.
IDX_ROWS = 6
IDX_SENTINEL = GRID_LANES - 1


@functools.cache
def local_grid(su: int) -> np.ndarray:
    """(gpts, 2) local grid coords of a level-`su` subtree, storage order."""
    return subdivision.grid_coords(su)


@functools.cache
def leaf_gather_matrix(su: int) -> np.ndarray:
    """(GRID_LANES, 3*LPU) one-hot: grid-point lane -> leaf-corner column.

    Column layout [v0 block | v1 block | v2 block] of LPU lanes each; leaf
    k of the unit (emission order, matching the flat leaf table built by
    models/scene.py) reads corner j from column j*LPU + k. Leaves beyond
    4^su (sub-level < 3 scenes) and grid lanes beyond the grid size are
    zero columns/rows — derived vertices come out 0 and the det==0 epsilon
    rejects them, the same mechanism that masks absent leaves in the
    standard tables.
    """
    corners = subdivision.enumerate_leaves(
        su, lambda c: np.ones(c.shape[:-1], dtype=bool))[1]   # (4^su, 3, 2)
    gidx = subdivision.grid_index(corners)                    # (4^su, 3)
    g = np.zeros((GRID_LANES, 3 * LPU), np.float32)
    for j in range(3):
        g[gidx[:, j], j * LPU + np.arange(corners.shape[0])] = 1.0
    return g


def subtree_grid_coords(level: int) -> tuple[np.ndarray, int]:
    """Global finest-grid coords of every subtree's local grid points.

    Returns (coords (spt, gpts, 2) int64, su): subtree s (the level-(L-su)
    node in hierarchical slot order, su = min(level, SUB_LEVEL)) covers
    local grid point i at global coords coords[s, i]. Exact integer
    arithmetic (subtree corners are multiples of 2^su on the finest grid).
    """
    su = min(level, SUB_LEVEL)
    den = 2 ** su
    sub_corners = subdivision.node_corner_table(level)[level - su]
    local = local_grid(su)                                    # (gpts, 2)
    wa = (den - local[:, 0])[None, :, None]
    wb = (local[:, 0] - local[:, 1])[None, :, None]
    wc = local[:, 1][None, :, None]
    c = sub_corners[:, None]                                  # (spt, 1, 3, 2)
    coords = (c[:, :, 0] * wa + c[:, :, 1] * wb + c[:, :, 2] * wc)
    assert (coords % den == 0).all()
    return coords // den, su


def stitched_unit_topology(level: int, present: np.ndarray):
    """Per-subtree leaf-corner lane indices for a stitched triangle class.

    level: the triangle's subdivision level; present: (M,) bool presence
    over its grid vertices (finest-grid storage order). The stitched leaf
    set (subdivision.enumerate_leaves — the reference's 6-case presence
    re-stitching, intersection.hlsl:339-371) still has every corner AT a
    grid point, so a unit's topology is fully described by 3*LPU lane
    indices into its own grid record. Shared by every triangle of the
    same (level, presence) class — computed once per class.

    Returns (idx (spt, 3, LPU) int32 corner lane indices (IDX_SENTINEL
    pads unused columns), ref (spt, GRID_LANES) bool referenced-lane
    mask, su).
    """
    from . import subdivision

    gcoords, su = subtree_grid_coords(level)          # (spt, gpts, 2)
    spt, gpts = gcoords.shape[:2]
    lane_of = [{tuple(c): i for i, c in enumerate(map(tuple, gcoords[s]))}
               for s in range(spt)]

    def present_at(c):
        return present[subdivision.grid_index(c)]

    slots, corners = subdivision.enumerate_leaves(level, present_at)
    idx = np.full((spt, 3, LPU), IDX_SENTINEL, np.int32)
    ref = np.zeros((spt, GRID_LANES), bool)
    counts = np.zeros(spt, np.int64)
    shift = 2 * (su - 1)
    for slot, cor in zip(slots, corners):
        s = 0 if level == 0 else int(slot) // 4 >> shift
        k = counts[s]
        counts[s] += 1
        for j in range(3):
            ln = lane_of[s][tuple(cor[j])]
            idx[s, j, k] = ln
            ref[s, ln] = True
    assert counts.max(initial=0) <= LPU
    return idx, ref, su


def uniform_unit_indices(su: int) -> np.ndarray:
    """(3, LPU) corner lane indices of the all-present topology — the
    indexed-record equivalent of leaf_gather_matrix(su) (same emission
    order); columns beyond 4^su get the degenerate sentinel."""
    g = leaf_gather_matrix(su)                        # (GRID_LANES, 3*LPU)
    idx = np.full((3, LPU), IDX_SENTINEL, np.int32)
    for j in range(3):
        blk = g[:, j * LPU:(j + 1) * LPU]
        lanes, cols = np.nonzero(blk)
        idx[j, cols] = lanes
    return idx


def widen_gather_matrix(g):
    """(GRID_LANES, 3*LPU) gather matrix -> (GRID_LANES, 6*LPU) padded
    layout with corner blocks at 2*LPU-aligned lane offsets (0, 128, 256
    at LPU=64). The fused single-pass gather (pallas_tiled._derive_unit)
    contracts this once and slices per-corner blocks that are then
    physically lane-offset-0 inside their vregs — Mosaic penalizes
    non-128-aligned lane offsets. The interleaved zero blocks contract
    to zero columns nobody reads. Accepts np or jax arrays."""
    import jax.numpy as jnp
    z = jnp.zeros((g.shape[0], LPU), jnp.float32)
    g = jnp.asarray(g, jnp.float32)
    return jnp.concatenate(
        [g[:, 0 * LPU:1 * LPU], z, g[:, 1 * LPU:2 * LPU], z,
         g[:, 2 * LPU:3 * LPU], z], axis=1)


def gather_matrix_from_indices(idx3: np.ndarray) -> np.ndarray:
    """(3, LPU) corner lane indices -> (GRID_LANES, 3*LPU) one-hot gather
    matrix (leaf_gather_matrix's layout). Sentinel indices become real
    one-hots onto the guaranteed-zero lane GRID_LANES-1, so gathering
    derives zero corners -> det == 0 rejection, exactly like the
    in-kernel per-unit one-hot the matrix replaces. Used when every unit
    of an indexed scene shares ONE topology (single-class packed builds):
    the kernel then skips the per-visit iota/compare/cast one-hot
    construction entirely (measured 34% of the config-9 frame)."""
    g = np.zeros((GRID_LANES, 3 * LPU), np.float32)
    for j in range(3):
        g[np.asarray(idx3[j], np.int64), j * LPU + np.arange(LPU)] = 1.0
    return g


def pack_index_rows(idx: np.ndarray) -> np.ndarray:
    """(..., 3, LPU) int corner indices -> (..., 3, GRID_LANES) f32 record
    rows (row j lanes 0..LPU-1 = corner-j indices; layout above)."""
    lead = idx.shape[:-2]
    rows = np.full(lead + (3, GRID_LANES), float(IDX_SENTINEL), np.float32)
    rows[..., :, 0 * LPU:1 * LPU] = idx
    return rows


def grid_positions(v0, v1, v2, d0, d1, d2, scales, gcoords, level):
    """Displaced positions of every (triangle, subtree, grid point).

    v0..d2: (N, 3) base corner positions/directions; scales: (N, M)
    displacement scales; gcoords: (spt, gpts, 2) from subtree_grid_coords.
    Returns (N, spt, gpts, 3) float32 — element-for-element the closed form
    of ops/precompute.build_uniform_tables' leaf vertices (same arithmetic
    at the same grid points, so values are bitwise identical to the
    standard tables').
    """
    denom = max(2 ** level, 1)
    u = gcoords[..., 0] / denom                               # (spt, gpts)
    w = gcoords[..., 1] / denom
    lbc = np.stack([1.0 - u, u - w, w], axis=-1).astype(np.float32)
    base = (lbc[None, ..., 0:1] * v0[:, None, None]
            + lbc[None, ..., 1:2] * v1[:, None, None]
            + lbc[None, ..., 2:3] * v2[:, None, None])
    dirs = (lbc[None, ..., 0:1] * d0[:, None, None]
            + lbc[None, ..., 1:2] * d1[:, None, None]
            + lbc[None, ..., 2:3] * d2[:, None, None])
    gidx = subdivision.grid_index(gcoords)                    # (spt, gpts)
    s = scales[:, gidx]                                       # (N, spt, gpts)
    return (base + s[..., None] * dirs).astype(np.float32)


def _corner_indices_np(grid: np.ndarray) -> np.ndarray:
    """(U, IDX_ROWS, GRID_LANES) indexed record -> (U, 3, LPU) int64."""
    return grid[:, 3:6, 0 * LPU:1 * LPU].astype(np.int64)


def derive_unit_tables_np(grid: np.ndarray, apex: np.ndarray, su: int,
                          centers: np.ndarray | None = None,
                          indexed: bool = False):
    """NumPy reference of the trace-time derivation (tests + host oracle).

    grid: (U, GRID_ROWS, GRID_LANES) unit records; apex: (3,); centers:
    (U, 3) unit AABB centers (the recentering origin — see
    models/scene.py::pack_units; None = absolute frame). Returns dict(q
    (U, 8, 4*LPU) with the per-frame t_num in row 7 of the t block, nrm
    (U, LPU, 3)) — the layout of DeviceScene.unit_qn[:, :, :4*LPU] with
    FrameInputs.t_num folded, as the XLA backend consumes it. Recentered
    q rows expect ray moments m = (apex - c) x d (tiled.recentered_raymat).
    """
    if centers is None:
        centers = np.zeros((grid.shape[0], 3), grid.dtype)
    pos = grid[:, 0:3, :]                                     # (U, 3, GL)
    if indexed:
        idx = _corner_indices_np(grid)                        # (U, 3, LPU)
        take = lambda j: np.take_along_axis(                  # noqa: E731
            pos, idx[:, j][:, None, :], axis=2).transpose(0, 2, 1)
        v0, v1, v2 = take(0), take(1), take(2)                # (U, LPU, 3)
    else:
        g = leaf_gather_matrix(su)
        v = pos @ g                                           # (U, 3, 3*LPU)
        v0 = v[:, :, 0 * LPU:1 * LPU].transpose(0, 2, 1)      # (U, LPU, 3)
        v1 = v[:, :, 1 * LPU:2 * LPU].transpose(0, 2, 1)
        v2 = v[:, :, 2 * LPU:3 * LPU].transpose(0, 2, 1)
    e1 = v1 - v0
    e2 = v2 - v0
    v0c = v0 - centers[:, None, :]
    n = np.cross(e1, e2)
    w1 = np.cross(e2, v0c)
    w2 = np.cross(v0c, e1)
    e2w2 = (e2 * w2).sum(-1)
    t_num = (n * (apex - centers)[:, None, :]).sum(-1) - e2w2  # (U, LPU)
    q = np.zeros((grid.shape[0], 8, 4 * LPU), np.float32)
    q[:, 0:3, 0 * LPU:1 * LPU] = -n.transpose(0, 2, 1)
    q[:, 0:3, 1 * LPU:2 * LPU] = -w1.transpose(0, 2, 1)
    q[:, 3:6, 1 * LPU:2 * LPU] = e2.transpose(0, 2, 1)
    q[:, 0:3, 2 * LPU:3 * LPU] = -w2.transpose(0, 2, 1)
    q[:, 3:6, 2 * LPU:3 * LPU] = -e1.transpose(0, 2, 1)
    q[:, 7, 3 * LPU:4 * LPU] = t_num
    norm = np.maximum(np.linalg.norm(n, axis=-1, keepdims=True), 1e-20)
    return dict(q=q, nrm=(n / norm).astype(np.float32))


def derive_q16_np(grid: np.ndarray, su: int, indexed: bool = False):
    """NumPy reference: the arbitrary-origin (secondary-bounce) MT table.

    Derives models/scene.py::pack_units' unit_q16 layout — ray rows
    [d(3), o x d(3), o(3), 1, pad(6)], ABSOLUTE coordinates — from grid
    records (same closed form, so values match the precomputed table up
    to fp reassociation). Returns dict(q16 (U, 16, 4*LPU),
    nrm (U, LPU, 3))."""
    pos = grid[:, 0:3, :]
    if indexed:
        idx = _corner_indices_np(grid)
        take = lambda j: np.take_along_axis(                  # noqa: E731
            pos, idx[:, j][:, None, :], axis=2).transpose(0, 2, 1)
        v0, v1, v2 = take(0), take(1), take(2)                # (U, LPU, 3)
    else:
        g = leaf_gather_matrix(su)
        v = pos @ g
        v0 = v[:, :, 0 * LPU:1 * LPU].transpose(0, 2, 1)
        v1 = v[:, :, 1 * LPU:2 * LPU].transpose(0, 2, 1)
        v2 = v[:, :, 2 * LPU:3 * LPU].transpose(0, 2, 1)
    e1 = v1 - v0
    e2 = v2 - v0
    n = np.cross(e1, e2)
    w1a = np.cross(e2, v0)
    w2a = np.cross(v0, e1)
    e2w2a = (e2 * w2a).sum(-1).astype(np.float32)
    u = grid.shape[0]
    q16 = np.zeros((u, 16, 4 * LPU), np.float32)
    q16[:, 0:3, 0 * LPU:1 * LPU] = -n.transpose(0, 2, 1)
    q16[:, 0:3, 1 * LPU:2 * LPU] = -w1a.transpose(0, 2, 1)
    q16[:, 3:6, 1 * LPU:2 * LPU] = e2.transpose(0, 2, 1)
    q16[:, 0:3, 2 * LPU:3 * LPU] = -w2a.transpose(0, 2, 1)
    q16[:, 3:6, 2 * LPU:3 * LPU] = -e1.transpose(0, 2, 1)
    q16[:, 6:9, 3 * LPU:4 * LPU] = n.transpose(0, 2, 1)
    q16[:, 9, 3 * LPU:4 * LPU] = -e2w2a
    norm = np.maximum(np.linalg.norm(n, axis=-1, keepdims=True), 1e-20)
    return dict(q16=q16, nrm=(n / norm).astype(np.float32))


def derive_q16_jnp(grid, su: int, indexed: bool = False):
    """XLA twin of derive_q16_np for the grouped (secondary-ray) engine:
    per gathered candidate, returns (q16 (n, 16, 4*LPU), nrm (n, LPU, 3))
    — drop-in for scene.unit_q16[unit] / scene.unit_nrm[unit]."""
    import jax
    import jax.numpy as jnp

    pos = grid[:, 0:3, :]
    if indexed:
        idx = jnp.concatenate(
            [grid[:, 3, 0 * LPU:1 * LPU], grid[:, 4, 0 * LPU:1 * LPU],
             grid[:, 5, 0 * LPU:1 * LPU]], axis=1)            # (n, 3*LPU)
        giota = jnp.arange(GRID_LANES, dtype=grid.dtype)
        oh = (giota[None, :, None] == idx[:, None, :]).astype(grid.dtype)
        v = jnp.einsum("nck,nkl->ncl", pos, oh,
                       preferred_element_type=jnp.float32,
                       precision=jax.lax.Precision.HIGHEST)
    else:
        g = jnp.asarray(leaf_gather_matrix(su))
        v = jnp.einsum("nck,kl->ncl", pos, g,
                       preferred_element_type=jnp.float32,
                       precision=jax.lax.Precision.HIGHEST)    # (n, 3, 3*LPU)
    v0 = v[:, :, 0 * LPU:1 * LPU]                             # (n, 3, LPU)
    v1 = v[:, :, 1 * LPU:2 * LPU]
    v2 = v[:, :, 2 * LPU:3 * LPU]
    e1 = v1 - v0
    e2 = v2 - v0

    def cross_rows(a, b):
        return jnp.stack([a[:, 1] * b[:, 2] - a[:, 2] * b[:, 1],
                          a[:, 2] * b[:, 0] - a[:, 0] * b[:, 2],
                          a[:, 0] * b[:, 1] - a[:, 1] * b[:, 0]], axis=1)

    n = cross_rows(e1, e2)                                    # (n, 3, LPU)
    w1a = cross_rows(e2, v0)
    w2a = cross_rows(v0, e1)
    e2w2a = (e2 * w2a).sum(axis=1)                            # (n, LPU)
    z3 = jnp.zeros_like(n)
    z1 = jnp.zeros_like(e2w2a)[:, None]
    rows02 = jnp.concatenate([-n, -w1a, -w2a, z3], axis=2)    # (n, 3, 4LPU)
    rows35 = jnp.concatenate([z3, e2, -e1, z3], axis=2)
    rows68 = jnp.concatenate([z3, z3, z3, n], axis=2)
    row9 = jnp.concatenate([z1, z1, z1, -e2w2a[:, None]], axis=2)
    zrows = jnp.zeros((grid.shape[0], 6, 4 * LPU), jnp.float32)
    q16 = jnp.concatenate([rows02, rows35, rows68, row9, zrows], axis=1)
    norm = jnp.maximum(
        jnp.sqrt((n * n).sum(axis=1, keepdims=True)), 1e-20)
    return q16, (n / norm).transpose(0, 2, 1)


def derive_q_jnp(grid, apex, su: int, centers=None, indexed: bool = False):
    """JAX derivation for the XLA tiled backend: per gathered candidate.

    grid: (n, GRID_ROWS | IDX_ROWS, GRID_LANES); apex: (3,); centers:
    (n, 3) unit AABB centers (recentered frame — pair with
    tiled.recentered_raymat; None = absolute). indexed: per-unit corner
    lane indices in rows 3-4 (stitched/mixed-level scenes) instead of the
    shared all-present gather matrix. Returns (q (n, 8, 4*LPU) with t_num
    folded into row 7 of the t block, nrm (n, LPU, 3)) — drop-in for
    q_frame[unit] / scene.unit_nrm[unit].
    """
    import jax
    import jax.numpy as jnp

    pos = grid[:, 0:3, :]
    if indexed:
        # Per-unit one-hot gather built from the index rows (matmul, not
        # take_along_axis — per-candidate gathers are pathological on
        # TPU): oh[n, g, c] = (g == idx[n, c]).
        idx = jnp.concatenate(
            [grid[:, 3, 0 * LPU:1 * LPU], grid[:, 4, 0 * LPU:1 * LPU],
             grid[:, 5, 0 * LPU:1 * LPU]], axis=1)            # (n, 3*LPU)
        giota = jnp.arange(GRID_LANES, dtype=grid.dtype)
        oh = (giota[None, :, None] == idx[:, None, :]).astype(grid.dtype)
        v = jnp.einsum("nck,nkl->ncl", pos, oh,
                       preferred_element_type=jnp.float32,
                       precision=jax.lax.Precision.HIGHEST)    # (n, 3, 3*LPU)
    else:
        g = jnp.asarray(leaf_gather_matrix(su))
        v = jnp.einsum("nck,kl->ncl", pos, g,
                       preferred_element_type=jnp.float32,
                       precision=jax.lax.Precision.HIGHEST)    # (n, 3, 3*LPU)
    v0 = v[:, :, 0 * LPU:1 * LPU]                             # (n, 3, LPU)
    v1 = v[:, :, 1 * LPU:2 * LPU]
    v2 = v[:, :, 2 * LPU:3 * LPU]
    e1 = v1 - v0
    e2 = v2 - v0
    if centers is None:
        centers = jnp.zeros((grid.shape[0], 3), grid.dtype)
    v0c = v0 - centers[..., None]

    def cross_rows(a, b):
        return jnp.stack([a[:, 1] * b[:, 2] - a[:, 2] * b[:, 1],
                          a[:, 2] * b[:, 0] - a[:, 0] * b[:, 2],
                          a[:, 0] * b[:, 1] - a[:, 1] * b[:, 0]], axis=1)

    n = cross_rows(e1, e2)                                    # (n, 3, LPU)
    w1 = cross_rows(e2, v0c)
    w2 = cross_rows(v0c, e1)
    e2w2 = (e2 * w2).sum(axis=1)                              # (n, LPU)
    t_num = (n * (apex[None, :] - centers)[..., None]).sum(axis=1) - e2w2
    z = jnp.zeros_like(n)
    z1 = jnp.zeros_like(e2w2)[:, None]
    rows03 = jnp.concatenate([-n, -w1, -w2, z], axis=2)       # (n, 3, 4*LPU)
    rows35 = jnp.concatenate([z, e2, -e1, z], axis=2)
    row7 = jnp.concatenate([z1, z1, z1, t_num[:, None]], axis=2)
    q = jnp.concatenate(
        [rows03, rows35, jnp.zeros_like(row7), row7], axis=1)  # (n, 8, 4LPU)
    norm = jnp.maximum(
        jnp.sqrt((n * n).sum(axis=1, keepdims=True)), 1e-20)
    return q, (n / norm).transpose(0, 2, 1)
