"""Grouped trace for arbitrary (incoherent) rays — the path tracer engine.

Secondary bounces have no shared apex and no screen-tile coherence, so the
primary renderer's tile-frustum machinery does not apply. Instead
(BASELINE config 5's "ray compaction/sorting"):

  1. sort rays by direction octant so each contiguous group of GROUP=1024
     rays points into a narrow cone (dead rays sink to the end);
  2. per group, build a conservative *reach box* — the AABB of
     {o + t*d : o in origin-box, d in direction-box, t in [0, t_max]} —
     and cull traversal units against it;
  3. per (group, candidate) run the generalized bilinear Möller-Trumbore:
     ray vector [d, o x d, o, 1] (per-ray origin rows replace the apex
     trick), one (1024, 16) @ (16, 4*LPU) matmul on the MXU;
  4. exact closest hit by min-reduce; one-hot matmul normal select.

The group candidate list is capped (config: max_group_candidates); groups
whose reach box overlaps more units process them in capped front-to-back
order by origin-box distance, so truncation (reported in stats) drops only
the farthest candidates.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp

from ..config import RenderConfig
from ..models.scene import DeviceScene
from .intersect import MT_DET_EPS, MT_UV_EPS

BIG = jnp.float32(1e30)
GROUP = 1024


def _octant(d: jax.Array) -> jax.Array:
    """Direction octant id (0..7)."""
    return ((d[:, 0] > 0).astype(jnp.int32)
            + 2 * (d[:, 1] > 0).astype(jnp.int32)
            + 4 * (d[:, 2] > 0).astype(jnp.int32))


N_CELLS = 4   # origin cells per axis in the group sort key
DEAD_KEY = 8 * N_CELLS**3


def _sort_key(o: jax.Array, d: jax.Array, scene: DeviceScene) -> jax.Array:
    """Direction octant + origin cell (4x4x4 over the scene bounds): rays
    in a group share a cone AND a local origin box, keeping reach boxes
    tight."""
    lo = scene.unit_aabb_min.min(axis=0)
    hi = scene.unit_aabb_max.max(axis=0)
    cell = jnp.clip(((o - lo) / jnp.maximum(hi - lo, 1e-6)
                     * N_CELLS).astype(jnp.int32), 0, N_CELLS - 1)
    cell_id = (cell[:, 0] + N_CELLS * cell[:, 1]
               + N_CELLS * N_CELLS * cell[:, 2])
    return _octant(d) * N_CELLS**3 + cell_id


def trace_sorted(scene: DeviceScene, o: jax.Array, d: jax.Array,
                 live: jax.Array, cfg: RenderConfig,
                 max_group_candidates: int = 96):
    """Trace pre-grouped rays: o/d (g, GROUP, 3), live (g, GROUP).

    The caller owns the grouping (sort by _sort_key for coherence; the
    path tracer keeps its whole per-ray state in sorted order across
    bounces so each bounce pays ONE multi-operand sort instead of a
    sort + unsort per trace). Returns (best_t (g, GROUP) with BIG = miss,
    best_n (g, GROUP, 3) unnormalized, overflow_groups scalar).
    """
    g = o.shape[0]
    t_max = jnp.float32(cfg.t_max)

    # --- conservative per-group reach boxes -> candidate lists ---
    omin = jnp.where(live[..., None], o, BIG).min(axis=1)     # (g, 3)
    omax = jnp.where(live[..., None], o, -BIG).max(axis=1)
    dmin = jnp.where(live[..., None], d, BIG).min(axis=1)
    dmax = jnp.where(live[..., None], d, -BIG).max(axis=1)
    reach_min = omin + t_max * jnp.minimum(dmin, 0.0)
    reach_max = omax + t_max * jnp.maximum(dmax, 0.0)
    any_live = live.any(axis=1)
    overlap = ((reach_min[:, None, :] <= scene.unit_aabb_max[None])
               & (reach_max[:, None, :] >= scene.unit_aabb_min[None])
               ).all(-1)                                       # (g, U)
    overlap &= scene.unit_valid[None] & any_live[:, None]

    # Front-to-back by distance from the origin box (conservative bound).
    gap = jnp.maximum(
        jnp.maximum(scene.unit_aabb_min[None] - omax[:, None, :],
                    omin[:, None, :] - scene.unit_aabb_max[None]), 0.0)
    dist = jnp.linalg.norm(gap, axis=-1)                       # (g, U)
    c = min(max_group_candidates, scene.num_units)
    val, cand = jax.lax.top_k(jnp.where(overlap, -dist, -jnp.inf), c)
    cvalid = val > -jnp.inf                                    # (g, C)
    count = overlap.sum(axis=1)
    overflow = (count > c).sum()

    # --- generalized MT: ray matrix (g, GROUP, 16) ---
    m = jnp.cross(o, d)
    rv = jnp.concatenate(
        [d, m, o, jnp.ones((g, GROUP, 1), jnp.float32),
         jnp.zeros((g, GROUP, 6), jnp.float32)], axis=-1)
    lpu = scene.leaves_per_unit
    t_min = jnp.float32(cfg.t_min)

    def trace_group_chunk(args):
        rv_c, cand_c, cvalid_c, live_c = args
        gc = rv_c.shape[0]

        def body(ci, carry):
            best_t, best_n = carry
            unit = cand_c[:, ci]                               # (gc,)
            if scene.compressed:
                # Derive the arbitrary-origin MT table from the unit's
                # grid record at trace time (direct tracing on the
                # secondary-bounce engine too).
                from . import compressed as comp
                q, nrm = comp.derive_q16_jnp(scene.unit_grid[unit],
                                             scene.sub_level,
                                             indexed=scene.indexed)
            else:
                q = scene.unit_q16[unit]                       # (gc,16,4LPU)
                nrm = scene.unit_nrm[unit]                     # (gc, LPU, 3)
            import os as _os
            wform = _os.environ.get("RTMM_MT_WFORM", "1") == "1"
            if wform:
                # w-form acceptance (mirrors pallas_grouped; see
                # pallas_tiled's _wform knob doc).
                q = jnp.concatenate(
                    [q, (q[..., 0 * lpu:1 * lpu] - q[..., 1 * lpu:2 * lpu]
                         - q[..., 2 * lpu:3 * lpu])], axis=-1)
            out = jax.lax.dot_general(
                rv_c, q, dimension_numbers=(((2,), (1,)), ((0,), (0,))),
                preferred_element_type=jnp.float32,
                precision=jax.lax.Precision.HIGHEST)         # (gc,GROUP,4|5L)
            det = out[..., 0 * lpu:1 * lpu]
            u_num = out[..., 1 * lpu:2 * lpu]
            v_num = out[..., 2 * lpu:3 * lpu]
            tn = out[..., 3 * lpu:4 * lpu]
            # Unguarded reciprocal (mirrors pallas_grouped): det == 0
            # lanes yield inf/NaN quotients whose two-sided window
            # compares are all False — which also makes the |det| >= EPS
            # guard numerically redundant (dropped under RTMM_MT_NODET,
            # default ON; see pallas_tiled's _nodet doc).
            inv = 1.0 / det
            u = u_num * inv
            v = v_num * inv
            t = tn * inv
            # Upper t-window POST-reduce (row op on the winner) —
            # mirrors the pallas_grouped epilogue bit-for-bit.
            if wform:
                ww = out[..., 4 * lpu:5 * lpu] * inv
                ok = ((jnp.minimum(jnp.minimum(u, v), ww) >= -MT_UV_EPS)
                      & (t >= t_min)
                      & cvalid_c[:, ci][:, None, None] & live_c[..., None])
            else:
                ok = ((u >= -MT_UV_EPS) & (u <= 1.0 + MT_UV_EPS)
                      & (v >= -MT_UV_EPS) & (u + v <= 1.0 + MT_UV_EPS)
                      & (t >= t_min)
                      & cvalid_c[:, ci][:, None, None] & live_c[..., None])
            if _os.environ.get("RTMM_MT_NODET", "1") != "1":
                ok &= jnp.abs(det) >= MT_DET_EPS
            t = jnp.where(ok, t, BIG)
            tb = t.min(axis=2)                                 # (gc, GROUP)
            tb = jnp.where(tb <= t_max, tb, BIG)
            # One-hot without & ok: masked/invalid leaves hold t == BIG
            # and an all-miss lane's tb == BIG never wins the strict
            # take below (mirrors the pallas engines).
            onehot = (t <= tb[..., None]).astype(jnp.float32)
            nb = jax.lax.dot_general(
                onehot, nrm, dimension_numbers=(((2,), (1,)), ((0,), (0,))),
                preferred_element_type=jnp.float32,
                precision=jax.lax.Precision.HIGHEST)           # (gc, GROUP, 3)
            take = tb < best_t
            return (jnp.where(take, tb, best_t),
                    jnp.where(take[..., None], nb, best_n))

        init = (jnp.full((gc, GROUP), BIG, jnp.float32),
                jnp.zeros((gc, GROUP, 3), jnp.float32))
        return jax.lax.fori_loop(0, c, body, init)

    # Chunk groups so the (gc, GROUP, 4*LPU) matmul output stays small.
    chunk = 16
    if g % chunk:
        chunk = next(x for x in range(min(chunk, g), 0, -1) if g % x == 0)
    best_t, best_n = jax.lax.map(
        trace_group_chunk,
        (rv.reshape(-1, chunk, GROUP, 16), cand.reshape(-1, chunk, c),
         cvalid.reshape(-1, chunk, c), live.reshape(-1, chunk, GROUP)))
    return (best_t.reshape(g, GROUP), best_n.reshape(g, GROUP, 3),
            overflow)
