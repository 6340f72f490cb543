"""Ray-primitive intersection tests (jnp, broadcastable).

Ports the reference's intersection math with identical epsilons:
  - slab AABB test (the hardware TLAS/BLAS traversal analog,
    src/GPUMesh.cpp:154-192 builds procedural AABBs; we test them in software)
  - 2D ray-vs-edge (shaders/intersection.hlsl:204-222)
  - height-band displacement-region test (intersection.hlsl:55-68, 257-269)
  - Möller-Trumbore (intersection.hlsl:412-442)
"""
from __future__ import annotations

import jax
import jax.numpy as jnp

MAX_T = 100000.0        # intersection.hlsl:99
EDGE_PARALLEL_EPS = 1e-6  # intersection.hlsl:211
BAND_EPS = 1e-4         # intersection.hlsl:263
MT_UV_EPS = 1e-3        # intersection.hlsl:413
MT_DET_EPS = 1e-8       # intersection.hlsl:423


def ray_aabb(origin, inv_dir, aabb_min, aabb_max):
    """Slab test. origin/inv_dir (..., 3); aabb (..., 3). Returns (hit, t_entry).

    Padded triangles carry inverted AABBs (min > max) and fail automatically.
    """
    t0 = (aabb_min - origin) * inv_dir
    t1 = (aabb_max - origin) * inv_dir
    t_near = jnp.minimum(t0, t1).max(axis=-1)
    t_far = jnp.maximum(t0, t1).min(axis=-1)
    # Inverted (padding-sentinel) boxes can overflow to +-inf in the slab
    # arithmetic and spuriously pass; reject them explicitly.
    valid = (aabb_min <= aabb_max).all(axis=-1)
    hit = valid & (t_near <= t_far) & (t_far >= 0.0)
    return hit, t_near


def ray_edge_2d(o2, d2, start, end):
    """rayIntersectsEdge (intersection.hlsl:204-222).

    o2/d2: (..., 2) 2D ray (d2 normalized); start/end: (..., 2).
    Returns (hit, t) with t = -1 where no hit (the reference's inout
    convention: ts stay -1 when an edge is missed, intersection.hlsl:377).
    """
    val1 = o2 - start
    val2 = end - start
    val3 = jnp.stack([-d2[..., 1], d2[..., 0]], axis=-1)
    denom = (val2 * val3).sum(-1)
    safe = jnp.where(jnp.abs(denom) < EDGE_PARALLEL_EPS, 1.0, denom)
    t1 = (val2[..., 0] * val1[..., 1] - val2[..., 1] * val1[..., 0]) / safe
    t2 = (val1 * val3).sum(-1) / safe
    hit = ((jnp.abs(denom) >= EDGE_PARALLEL_EPS)
           & (t1 >= 0.0) & (t2 >= 0.0) & (t2 <= 1.0))
    return hit, jnp.where(hit, t1, -1.0)


def node_test(o2, d2, verts, minmax, h0, hslope):
    """One hierarchy-node pruning test.

    verts: (..., 3, 2) expanded displaced 2D node triangle; minmax: (..., 2);
    h0/hslope: (...,) affine height-along-ray coefficients (closed form of
    Ray2D::heightTo3DRay, intersection.hlsl:55-68: height(t2d) = h0 +
    t2d * dot(D, N)/|D_planar|).

    Returns active: ray crosses the node's expanded 2D triangle AND is not
    outside the displacement band (intersection.hlsl:249-269, 398).
    """
    hits, ts = [], []
    for i, j in ((0, 1), (1, 2), (2, 0)):
        h, t = ray_edge_2d(o2, d2, verts[..., i, :], verts[..., j, :])
        hits.append(h)
        ts.append(t)
    tri_hit = hits[0] | hits[1] | hits[2]
    ts = jnp.stack(ts, axis=-1)                        # (..., 3)
    entry = jnp.min(jnp.where(ts < 0.0, MAX_T, ts), axis=-1)
    exit_ = jnp.max(ts, axis=-1)
    h_entry = h0 + entry * hslope
    h_exit = h0 + exit_ * hslope
    mn = minmax[..., 0]
    mx = minmax[..., 1]
    outside = ((jnp.abs(entry - exit_) >= BAND_EPS)
               & (((h_entry < mn) & (h_exit < mn))
                  | ((h_entry > mx) & (h_exit > mx))))
    return tri_hit & ~outside


def _nodet() -> bool:
    """RTMM_MT_NODET (default ON): drop the |det| >= EPS acceptance guard —
    numerically redundant because the unguarded reciprocal turns det~0
    lanes into Inf/NaN u/v, which the uv windows reject. Mirrored here in
    the per-ray path so ALL backends (ray, tile, pallas, grouped) share
    one acceptance set and the cross-backend agreement oracles stay exact
    (advisor round-3 medium finding)."""
    import os
    return os.environ.get("RTMM_MT_NODET", "1") == "1"


def moller_trumbore(origin, direction, v0, v1, v2):
    """rayTraceTriangle (intersection.hlsl:412-442) with identical epsilons.

    origin/direction: (..., 3); v0/v1/v2: (..., 3).
    Returns (hit, t, normal) — normal = normalize(cross(e1, e2)), un-flipped,
    exactly as the reference reports to the closest-hit shader.
    """
    e1 = v1 - v0
    e2 = v2 - v0
    pvec = jnp.cross(direction, e2)
    det = (e1 * pvec).sum(-1)
    if _nodet():
        # Unguarded reciprocal, same as the vectorized epilogues: det == 0
        # yields Inf/NaN u/v rejected by the windows below (NaN compares
        # False), so the acceptance set matches tile/pallas/grouped exactly.
        ok = jnp.ones_like(det, dtype=bool)
        inv_det = 1.0 / det
    else:
        ok = jnp.abs(det) >= MT_DET_EPS
        inv_det = 1.0 / jnp.where(ok, det, 1.0)
    tvec = origin - v0
    u = (tvec * pvec).sum(-1) * inv_det
    ok &= (u >= -MT_UV_EPS) & (u <= 1.0 + MT_UV_EPS)
    qvec = jnp.cross(tvec, e1)
    v = (direction * qvec).sum(-1) * inv_det
    ok &= (v >= -MT_UV_EPS) & (u + v <= 1.0 + MT_UV_EPS)
    t = (e2 * qvec).sum(-1) * inv_det
    n = jnp.cross(e1, e2)
    n = n / jnp.maximum(jnp.linalg.norm(n, axis=-1, keepdims=True), 1e-20)
    return ok, t, n


def project_ray_2d(origin, direction, plane_t, plane_b, plane_n, plane_o):
    """Project a 3D ray onto a base-triangle plane (intersection.hlsl:520-531).

    Returns (o2, d2, h0, hslope): 2D ray origin, normalized 2D direction and
    the affine height coefficients height(t2d) = h0 + t2d * hslope.
    """
    rel = origin - plane_o
    o2 = jnp.stack([(rel * plane_t).sum(-1), (rel * plane_b).sum(-1)], axis=-1)
    d2 = jnp.stack([(direction * plane_t).sum(-1),
                    (direction * plane_b).sum(-1)], axis=-1)
    len_plane = jnp.maximum(jnp.linalg.norm(d2, axis=-1), 1e-12)
    d2 = d2 / len_plane[..., None]
    h0 = (rel * plane_n).sum(-1)
    hslope = (direction * plane_n).sum(-1) / len_plane
    return o2, d2, h0, hslope
