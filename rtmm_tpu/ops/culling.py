"""Tile-frustum candidate culling — the TPU-shaped acceleration stage.

The reference leans on hardware TLAS traversal per ray
(src/application.cpp:214). A TPU has no RT cores and per-ray gathers are
slow, so candidates are found per *ray tile* instead: the frame is split
into 8x128-pixel tiles (the native f32 VPU register shape); each tile's
primary rays share an origin and form a 4-plane frustum cone.

Two-level structure (the TLAS role, src/GPUMesh.cpp:238-278): traversal
units are Morton-ordered at scene build and grouped into *clusters* of
UNITS_PER_CLUSTER consecutive units with a cluster AABB. Per frame, every
cluster is tested against every tile frustum (tiles x clusters is small
even for 10^5-unit scenes); unit-level tests run only on the clusters a
tile actually hits, window by window (ops/tiled.py::candidate_window), so
the cull is O(tiles x clusters + tiles x hit-units), not
O(tiles x units), and candidate lists can never silently overflow.

Conservative everywhere: a box is culled only if its AABB lies fully
outside one frustum plane (p-vertex test). The mirror cone behind the
camera is automatically rejected because all plane dots flip sign.
"""
from __future__ import annotations

import os

import jax
import jax.numpy as jnp

# Pixel footprint of one ray tile (TILE_H * TILE_W = the lane count of
# the kernel's ray matrix; any multiple of the 128-lane vreg width works).
# Two independent effects, both measured on one v5e @1080p:
# * SHAPE: squarer tiles have smaller perimeter, so each tile's frustum
#   overlaps fewer traversal units ((W + u)(H + u) incidences for unit
#   footprint u) — 32x32 vs 8x128 at 1024 rays: 51,200-tri plane 49.8 ->
#   71.5 Mrays/s, 1,280-tri flagship 160 -> 215 (+35-44%).
# * SIZE: smaller tiles shrink every (LPU, TILE) epilogue pass's lane
#   count faster than boundary crossings add visits — but the per-visit
#   costs that do NOT scale with TILE (per-unit table prep, MT-matmul
#   pipeline fill at K=18, per-tile walk machinery, cluster q-block DMA
#   per (tile, cluster)) grow with the 1.26x visit count and 4x tile
#   count. MEASURED a clear loss: 16x16 on config 6 = 57.6 vs 79.6
#   Mrays/s at 32x32 (image gate clean) — fourth data point (after
#   SUBGATE/SUBWALK/LANEWALK) that shrinking the epilogue's lane count
#   loses to its fixed costs; only op-count cuts pay.
# The ray-matrix layout is unaffected (lanes map to pixels row-major
# within the tile). Overridable per process for A/B measurement.
_shape = os.environ.get("RTMM_TILE_SHAPE", "32x32")
TILE_H, TILE_W = (int(x) for x in _shape.split("x"))
assert (TILE_H * TILE_W) % 128 == 0, "tile rays must be a multiple of 128"
# Traversal units per scene cluster (the coarse level of the two-level
# cull). 64 keeps the per-tile cluster matrix tiny while one cluster's
# units fill exactly half a candidate-window sort lane block.
UNITS_PER_CLUSTER = 64


def tile_frustums(inv_view_proj: jax.Array, width: int, height: int,
                  render_width: int | None = None,
                  render_height: int | None = None):
    """Build per-tile frustum planes from the corner pixel rays.

    render_width/height (multiples of TILE_W/TILE_H) define the padded tile
    grid; width/height define the NDC mapping (as in raygen.generate_rays).
    Returns (apex (3,), normals (tiles, 4, 3)): points p inside a tile's
    cone satisfy dot(n_i, p - apex) >= 0 for all 4 planes.
    """
    m = inv_view_proj.astype(jnp.float32)
    rw = render_width or width
    rh = render_height or height
    tx = rw // TILE_W
    ty = rh // TILE_H

    def unproject(px, py, z):
        u = px / width
        v = py / height
        ndc_x = u * 2.0 - 1.0
        ndc_y = -(v * 2.0 - 1.0)
        p = [m[i, 0] * ndc_x + m[i, 1] * ndc_y + (m[i, 2] * z + m[i, 3])
             for i in range(4)]
        return jnp.stack([p[0] / p[3], p[1] / p[3], p[2] / p[3]], axis=-1)

    # All primary rays pass through the camera position (the cone apex).
    # Unprojecting it directly is ill-posed (w -> 0), so recover it as the
    # closest-approach point of two corner pixel rays.
    n00 = unproject(jnp.float32(0.0), jnp.float32(0.0), 0.0)
    f00 = unproject(jnp.float32(0.0), jnp.float32(0.0), 1.0)
    n11 = unproject(jnp.float32(rw), jnp.float32(rh), 0.0)
    f11 = unproject(jnp.float32(rw), jnp.float32(rh), 1.0)
    apex = _ray_closest_point(n00, f00 - n00, n11, f11 - n11)

    normals = _cone_grid_normals(m, width, height, rw, rh, 1, 1)
    return apex, normals.reshape(ty * tx, 4, 3)


def _cone_grid_normals(m: jax.Array, width: int, height: int,
                       rw: int, rh: int, n_rows: int, n_cols: int):
    """Inward-oriented plane normals for an n_rows x n_cols grid of
    sub-cones per 8x128 tile, fully vectorized: ONE batched unproject over
    all (tile, corner) pairs and ONE cross product instead of Python
    loops over cones and planes (shared corner computation, smaller HLO).

    Returns (tiles, n_rows*n_cols, 4, 3); per-element arithmetic is
    identical to the scalar construction, so the planes are bit-equal.
    """
    tx = rw // TILE_W
    ty = rh // TILE_H
    sw = TILE_W // n_cols
    sh = TILE_H // n_rows

    cx = jax.lax.broadcasted_iota(jnp.float32, (ty, tx), 1) * TILE_W
    cy = jax.lax.broadcasted_iota(jnp.float32, (ty, tx), 0) * TILE_H
    # Corner pixel grid: (ty, tx, n_rows+1, n_cols+1)
    gx = jnp.arange(n_cols + 1, dtype=jnp.float32) * sw
    gy = jnp.arange(n_rows + 1, dtype=jnp.float32) * sh
    px = cx[..., None, None] + gx[None, None, None, :]
    py = cy[..., None, None] + gy[None, None, :, None]

    u = px / width
    v = py / height
    ndc_x = u * 2.0 - 1.0
    ndc_y = -(v * 2.0 - 1.0)

    def unproj(z):
        p = [m[i, 0] * ndc_x + m[i, 1] * ndc_y + (m[i, 2] * z + m[i, 3])
             for i in range(4)]
        return jnp.stack([p[0] / p[3], p[1] / p[3], p[2] / p[3]], axis=-1)

    d = unproj(1.0) - unproj(0.0)
    d = d / jnp.linalg.norm(d, axis=-1, keepdims=True)

    # Per cone: corners TL/TR/BR/BL; edges (TL,TR),(TR,BR),(BR,BL),(BL,TL).
    tl = d[:, :, :-1, :-1]
    tr = d[:, :, :-1, 1:]
    br = d[:, :, 1:, 1:]
    bl = d[:, :, 1:, :-1]
    a = jnp.stack([tl, tr, br, bl], axis=-2)       # (ty,tx,nr,nc,4,3)
    b = jnp.stack([tr, br, bl, tl], axis=-2)
    n = jnp.cross(a, b)
    # Orient inward. The corner-sum direction lies strictly inside the
    # (convex) cone, so its dot sign equals the center direction's.
    dc = (tl + tr + br + bl)[..., None, :]
    sign = jnp.sign((n * dc).sum(-1, keepdims=True))
    sign = jnp.where(sign == 0.0, 1.0, sign)
    n = n * sign
    # (ty, tx, nr, nc, 4, 3) -> (tiles, nr*nc, 4, 3), j = row*nc + col.
    return n.reshape(ty, tx, n_rows * n_cols, 4, 3).reshape(
        ty * tx, n_rows * n_cols, 4, 3)


# Default sub-cones per tile along the 128-px width (32 px each). Measured
# tradeoff (v5e, RenderConfig.sub_frusta): 8 is ~14% faster on
# silhouette-heavy secondary-ray frames (a sub-tile straddling an object
# edge never fills, so its worst-hit bound stays +inf and it walks every
# back-surface unit — narrower cones shrink the straddling set) but ~5%
# slower on coherent primary frames (twice the plane tests per unit
# visit). 4 is the primary-ray default; the path tracer uses 8.
SUB_FRUSTA = 4


def tile_sub_frustums(inv_view_proj: jax.Array, width: int, height: int,
                      render_width: int | None = None,
                      render_height: int | None = None,
                      n_sub: int = SUB_FRUSTA,
                      n_rows: int = 1) -> jax.Array:
    """Per-tile SUB-frustum planes: each 8x128 tile split into an
    n_rows x (n_sub // n_rows) grid of cones (n_rows=1: vertical strips).

    Narrow cones let the trace kernel prune per sub-tile: a unit is a
    candidate only for sub-tiles whose cone reaches it AND whose own worst
    hit it could still beat — which is what kills the silhouette-tile
    blow-up (a wide tile straddling an object edge otherwise keeps every
    back-surface unit alive because some of its rays miss). A 2-row grid
    makes the cones squarer in screen space (4x32 px instead of 8x16 at
    n_sub=8), bounding arbitrary silhouette orientations better at the
    same plane-test cost.

    Returns normals (tiles, n_sub, 4, 3), sub index j = row * cols + col,
    with the same orientation convention as tile_frustums.
    """
    if n_sub % n_rows or TILE_H % n_rows:
        raise ValueError(f"n_rows={n_rows} must divide n_sub={n_sub} and "
                         f"the {TILE_H}-px tile height")
    n_cols = n_sub // n_rows
    if TILE_W % n_cols:
        raise ValueError(f"{n_cols} columns must divide the {TILE_W}-px "
                         "tile")
    m = inv_view_proj.astype(jnp.float32)
    rw = render_width or width
    rh = render_height or height
    return _cone_grid_normals(m, width, height, rw, rh, n_rows, n_cols)


def _ray_closest_point(o1, d1, o2, d2):
    """Closest point of two rays (the shared camera apex for primaries)."""
    a = (d1 * d1).sum(-1)
    b = (d1 * d2).sum(-1)
    c = (d2 * d2).sum(-1)
    w = o1 - o2
    d = (d1 * w).sum(-1)
    e = (d2 * w).sum(-1)
    den = a * c - b * b
    den = jnp.where(jnp.abs(den) < 1e-12, 1e-12, den)
    s = (b * e - c * d) / den
    t = (a * e - b * d) / den
    return 0.5 * ((o1 + s[..., None] * d1) + (o2 + t[..., None] * d2))


def cull_units(apex: jax.Array, normals: jax.Array, aabb_min: jax.Array,
               aabb_max: jax.Array, valid: jax.Array) -> jax.Array:
    """(tiles, U) bool: unit AABB intersects tile frustum (conservative)."""
    # p-vertex per plane: the AABB corner furthest along the plane normal.
    n = normals[:, :, None, :]                     # (tiles, 4, 1, 3)
    pmin = (aabb_min - apex)[None, None]           # (1, 1, U, 3)
    pmax = (aabb_max - apex)[None, None]
    pvert = jnp.where(n >= 0.0, pmax, pmin)
    outside = (n * pvert).sum(-1) < 0.0            # (tiles, 4, U)
    return (~outside.any(axis=1)) & valid[None, :]


def aabb_distance(apex: jax.Array, aabb_min: jax.Array,
                  aabb_max: jax.Array) -> jax.Array:
    """Conservative apex -> AABB distance lower bound.

    apex (3,); aabb_min/max (..., 3) -> (...,). Zero inside the box.
    """
    return jnp.linalg.norm(
        jnp.maximum(jnp.maximum(aabb_min - apex, apex - aabb_max), 0.0),
        axis=-1)


def frustum_hit_gathered(normals: jax.Array, apex: jax.Array,
                         aabb_min: jax.Array, aabb_max: jax.Array
                         ) -> jax.Array:
    """Per-tile p-vertex test on per-tile gathered AABBs.

    normals (tiles, 4, 3); aabb_min/max (tiles, N, 3) -> (tiles, N) bool.
    The refine stage of the two-level cull: each tile tests only the boxes
    gathered from its own candidate clusters.
    """
    n = normals[:, :, None, :]                     # (tiles, 4, 1, 3)
    pmin = (aabb_min - apex)[:, None]              # (tiles, 1, N, 3)
    pmax = (aabb_max - apex)[:, None]
    pvert = jnp.where(n >= 0.0, pmax, pmin)
    outside = (n * pvert).sum(-1) < 0.0            # (tiles, 4, N)
    return ~outside.any(axis=1)


def candidate_lists(hit: jax.Array, max_candidates: int,
                    apex: jax.Array | None = None,
                    aabb_min: jax.Array | None = None,
                    aabb_max: jax.Array | None = None):
    """Compact per-tile candidate lists, front-to-back.

    hit: (tiles, U) bool. Returns (idx (tiles, C) int32, count (tiles,),
    entry (tiles, C) f32): the first C unit indices with hit=True per tile
    and the true per-tile hit count (callers detect overflow via count > C).

    When apex + AABBs are given, candidates are ordered by a conservative
    apex->AABB distance lower bound and `entry` carries that bound — the
    trace kernel stops a tile's candidate loop once every ray's closest hit
    is nearer than the next candidate's bound (the analog of the reference's
    nearest-first stack ordering + first-hit early-out,
    intersection.hlsl:228-242,472).
    """
    u = hit.shape[1]
    c = min(max_candidates, u)
    if apex is not None:
        dist = jnp.linalg.norm(
            jnp.maximum(jnp.maximum(aabb_min - apex, apex - aabb_max), 0.0),
            axis=1)                                    # (U,)
        key = jnp.where(hit, -dist[None, :], -jnp.inf)
        val, idx = jax.lax.top_k(key, c)               # ascending distance
        entry = -val
    else:
        key = jnp.where(
            hit, u - jax.lax.broadcasted_iota(jnp.int32, hit.shape, 1), 0)
        _, idx = jax.lax.top_k(key, c)
        entry = jnp.zeros(idx.shape, jnp.float32)
    count = hit.sum(axis=1).astype(jnp.int32)
    return idx.astype(jnp.int32), count, jnp.asarray(entry, jnp.float32)
