"""Wavefront micro-mesh traversal — the TPU re-architecture of the reference's
DXR intersection shader (/root/reference/shaders/intersection.hlsl:454-559).

The reference runs, per ray and per AABB hit, a 256-deep explicit stack with
nearest-first bubble sorting and first-hit early exit — maximally divergent
SIMT code. On TPU we reformulate it as a *level-synchronous breadth-first
mask propagation* over the precomputed hierarchy tables:

  level 0..L-1: active[l][n] = active[l-1][n >> 2] AND node_test(n)
  leaves:       candidate iff leaf_mask AND active[L-1][slot >> 2]
  hit:          masked Möller-Trumbore, min-reduce over t

`node_test` is the exact pruning predicate of the reference (expanded 2D
triangle crossing + displacement height band, intersection.hlsl:398); the
nearest-first ordering + early exit is replaced by an exact min-reduction
over all surviving leaves (a safe superset — same closest hit). All lanes
stay converged; there is no stack, no sort, no data-dependent control flow.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

from ..config import RenderConfig
from ..models.scene import DeviceScene
from . import intersect
from .subdivision import level_offset

BIG = jnp.float32(1e30)


def trace(scene: DeviceScene, origins: jax.Array, directions: jax.Array,
          cfg: RenderConfig):
    """Trace a batch of rays against the scene.

    origins/directions: (N, 3). Returns (t (N,), normal (N, 3), hit (N,)).
    Replaces TraceRay + the whole DXR shader-table machinery
    (src/application.cpp:214, src/dx_util/RayTraceShader.cpp:345-372).
    """
    t, nrm, hit, _ = trace_with_steps(scene, origins, directions, cfg)
    return t, nrm, hit


def trace_with_steps(scene: DeviceScene, origins: jax.Array,
                     directions: jax.Array, cfg: RenderConfig):
    """trace() plus a per-ray traversal-step count: the number of hierarchy
    nodes that survived pruning plus the leaf Möller-Trumbore tests run —
    the divergence metric of the reference's per-ray stack loop
    (intersection.hlsl:462-476), per pixel. Returns (t, normal, hit,
    steps (N,) int32)."""
    if scene.compressed:
        raise ValueError(
            "the per-ray reference backend reads the leaf/hierarchy "
            "tables, which compressed scenes do not materialize; use the "
            "tile/pallas pipelines or build with compressed=False")
    if scene.node_verts is None and scene.max_level > 0:
        raise ValueError(
            "per-ray traversal needs the hierarchy tables; this scene was "
            "built with hierarchy=False (production tile/pallas builds). "
            "Rebuild with build_device_scene(..., hierarchy=True).")
    n = origins.shape[0]
    num_tris = scene.num_triangles
    k = min(cfg.max_candidates, num_tris)

    # --- candidate search: software TLAS (slab test over base-tri AABBs) ---
    safe_dir = jnp.where(jnp.abs(directions) < 1e-12, 1e-12, directions)
    inv_dir = 1.0 / safe_dir
    hit_aabb, t_entry = intersect.ray_aabb(
        origins[:, None, :], inv_dir[:, None, :],
        scene.aabb_min[None], scene.aabb_max[None])          # (N, T)
    hit_aabb &= scene.tri_valid[None, :]
    score = jnp.where(hit_aabb, t_entry, BIG)
    neg_score, cand_idx = jax.lax.top_k(-score, k)           # (N, K)
    cand_valid = neg_score > -BIG

    # --- per-candidate traversal, running closest hit over the K slots ---
    best_t = jnp.full((n,), BIG, jnp.float32)
    best_n = jnp.zeros((n, 3), jnp.float32)
    steps = jnp.zeros((n,), jnp.int32)
    for slot in range(k):
        tri = cand_idx[:, slot]
        t, nrm, st = _trace_one_candidate(scene, origins, directions, tri,
                                          cfg)
        valid = cand_valid[:, slot]
        steps = steps + jnp.where(valid, st, 0)
        take = valid & (t < best_t)
        best_t = jnp.where(take, t, best_t)
        best_n = jnp.where(take[:, None], nrm, best_n)
    hit = best_t < BIG
    return jnp.where(hit, best_t, cfg.t_max), best_n, hit, steps


def _trace_one_candidate(scene: DeviceScene, origins, directions, tri, cfg):
    """Traverse one (ray, base-triangle) candidate per lane. tri: (N,)."""
    o2, d2, h0, hslope = intersect.project_ray_2d(
        origins, directions,
        scene.plane_t[tri], scene.plane_b[tri],
        scene.plane_n[tri], scene.plane_o[tri])
    n = tri.shape[0]
    level = scene.max_level

    # Breadth-first mask propagation over internal levels (static unroll,
    # level <= 5 as in the reference, intersection.hlsl:79).
    steps = jnp.zeros((n,), jnp.int32)
    active = jnp.ones((n, 1), bool)
    for l in range(level):
        off = level_offset(l)
        cnt = 4**l
        nv = scene.node_verts[:, off:off + cnt][tri]         # (N, cnt, 3, 2)
        nm = scene.node_minmax[:, off:off + cnt][tri]        # (N, cnt, 2)
        npass = scene.node_pass[:, off:off + cnt][tri]       # (N, cnt)
        ok = npass | intersect.node_test(
            o2[:, None], d2[:, None], nv, nm, h0[:, None], hslope[:, None])
        parent = active if l == 0 else jnp.repeat(active, 4, axis=1)
        active = parent & ok
        steps = steps + active.sum(axis=1, dtype=jnp.int32)
    leaf_active = (jnp.repeat(active, 4, axis=1) if level > 0
                   else jnp.ones((n, scene.num_leaf_slots), bool))
    # Leaf slots are padded to a multiple of 64 (traversal-unit alignment);
    # padding slots beyond 4^L are never valid.
    pad = scene.num_leaf_slots - leaf_active.shape[1]
    if pad > 0:
        leaf_active = jnp.pad(leaf_active, ((0, 0), (0, pad)))

    # Masked Möller-Trumbore over leaf blocks with a running min. Ceil
    # division: nf need not be a blk multiple (a mixed-level tessellated
    # scene has e.g. 1,008 slots) — the last block's dynamic_slice clamps
    # its start, re-testing a few slots, which the min-reduce absorbs.
    nf = scene.num_leaf_slots
    blk = min(nf, 256)
    num_blocks = -(-nf // blk)
    t_min = jnp.float32(cfg.t_min)
    t_max = jnp.float32(cfg.t_max)

    def leaf_block(i, carry):
        bt, bn, st = carry
        lv = jax.lax.dynamic_slice_in_dim(scene.leaf_verts, i * blk, blk, 1)
        lm = jax.lax.dynamic_slice_in_dim(scene.leaf_mask, i * blk, blk, 1)
        la = jax.lax.dynamic_slice_in_dim(leaf_active, i * blk, blk, 1)
        lv = lv[tri]                                         # (N, blk, 3, 3)
        lm = lm[tri]                                         # (N, blk)
        tested = lm & la
        st = st + tested.sum(axis=1, dtype=jnp.int32)
        ok, t, nrm = intersect.moller_trumbore(
            origins[:, None], directions[:, None],
            lv[:, :, 0], lv[:, :, 1], lv[:, :, 2])
        valid = ok & tested & (t >= t_min) & (t <= t_max)
        t = jnp.where(valid, t, BIG)
        idx = jnp.argmin(t, axis=1)                          # (N,)
        tb = jnp.take_along_axis(t, idx[:, None], 1)[:, 0]
        nb = jnp.take_along_axis(nrm, idx[:, None, None], 1)[:, 0]
        take = tb < bt
        return (jnp.where(take, tb, bt),
                jnp.where(take[:, None], nb, bn), st)

    init = (jnp.full((n,), BIG, jnp.float32), jnp.zeros((n, 3), jnp.float32),
            steps)
    if num_blocks == 1:
        best_t, best_n, steps = leaf_block(0, init)
    else:
        best_t, best_n, steps = jax.lax.fori_loop(0, num_blocks, leaf_block,
                                                  init)
    return best_t, best_n, steps
