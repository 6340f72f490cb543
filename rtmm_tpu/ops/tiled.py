"""Tiled wavefront renderer (XLA path) — MXU-form Möller-Trumbore.

The TPU-shaped replacement for the per-ray pipeline in traversal.py:

  * rays are processed in 8x128 pixel tiles (one VPU register per scalar);
  * candidates come from a two-level frustum cull: a dense tile x cluster
    test (clusters = Morton-consecutive groups of 64 traversal units with a
    scene-build AABB — the TLAS role, src/GPUMesh.cpp:238-278), then a
    unit-level refine only on the clusters each tile hits;
  * candidates are consumed in *windows* of cfg.clusters_per_window
    clusters per tile, nearest-first, inside a while_loop that stops when
    every tile has either exhausted its clusters or proven that no
    remaining cluster can beat its worst closest hit. Capacity is exact by
    construction — there is no top-K truncation, so geometry is never
    silently dropped no matter how many units a tile sees;
  * because all primary rays share the camera apex, the Möller-Trumbore
    quantities are bilinear in (ray, leaf) (see DeviceScene.unit_q): each
    (tile, candidate) step is ONE (1024, 8) @ (8, 4*LPU) matmul on the MXU
    followed by an elementwise epilogue and a min-reduce. Per-pixel
    near-plane origins are recovered exactly via t_near = t_apex - s with
    s = dot(origin - apex, d) (d . (d x e2) = 0 makes u, v independent of
    the along-ray origin shift).

This XLA version is the correctness reference and CPU fallback;
pallas_tiled.py implements the same algorithm with per-tile dynamic
candidate counts and double-buffered HBM->VMEM DMA.
"""
from __future__ import annotations

from typing import Callable, NamedTuple

import jax
import jax.numpy as jnp

from ..config import RenderConfig
from ..models.scene import DeviceScene
from . import culling, raygen, shading
from . import intersect
from .intersect import MT_DET_EPS, MT_UV_EPS

BIG = jnp.float32(1e30)
TILE = culling.TILE_H * culling.TILE_W


def _nodet() -> bool:
    """RTMM_MT_NODET (default ON): drop the numerically-redundant
    |det| >= EPS acceptance guard — see pallas_tiled's _nodet doc."""
    import os
    return os.environ.get("RTMM_MT_NODET", "1") == "1"
UPC = culling.UNITS_PER_CLUSTER


def padded_size(width: int, height: int) -> tuple[int, int]:
    pw = -(-width // culling.TILE_W) * culling.TILE_W
    ph = -(-height // culling.TILE_H) * culling.TILE_H
    return pw, ph


class FrameInputs(NamedTuple):
    """Per-frame inputs shared by the XLA and Pallas backends."""

    raymat: jax.Array       # (tiles, TILE, 8) rows [d, apex x d, s, 1]
    # (U, 8, 4*LPU+128) unit_qn with the per-frame t_num row materialized —
    # only the XLA backend needs it (it gathers whole q blocks per
    # candidate); None on the Pallas path, which keeps unit_qn static and
    # folds fi.t_num in-kernel (two extra matmul K-rows).
    q_frame: jax.Array | None
    dirs: jax.Array         # (tiles, TILE, 3)
    apex: jax.Array         # (3,)
    normals: jax.Array      # (tiles, 4, 3) tile frustum planes
    cluster_hit: jax.Array  # (tiles, C) bool — coarse-level cull result
    # (tiles, cfg.sub_frusta, 4, 3) sub-cone planes for the kernel's
    # per-unit cull, or None on paths that never reach the Pallas kernel.
    sub_normals: jax.Array | None = None
    t_num: jax.Array | None = None  # (U, LPU) per-frame a.n - e2.w2
    # (6,) inflated scene AABB [min xyz, max xyz] (scene_exit_aabb) — the
    # kernel's per-ray reach bound for rays that still miss everything.
    scene_aabb: jax.Array | None = None


def scene_exit_aabb(scene: DeviceScene) -> jax.Array:
    """(6,) f32 [min xyz, max xyz]: the union of valid cluster AABBs,
    inflated so that every hit the MT epilogue can ACCEPT (uv within
    MT_UV_EPS outside a leaf, i.e. up to ~eps * extent outside the exact
    geometry AABB) still lies inside. A ray's slab EXIT through this box
    upper-bounds the apex-relative t of any hit it may still find in this
    scene — the reach bound the kernel substitutes for +inf on rays that
    miss everything (the reference's per-ray traversal stops at its AABB
    exit for free; intersection.hlsl:533-557 early-outs on the base
    bounding triangle the same way)."""
    big3 = jnp.full((3,), BIG, jnp.float32)
    valid = scene.cluster_valid[:, None]
    mn = jnp.where(valid, scene.cluster_aabb_min, big3).min(axis=0)
    mx = jnp.where(valid, scene.cluster_aabb_max, -big3).max(axis=0)
    pad = 2.0 * intersect.MT_UV_EPS * (mx - mn) + 1e-6
    return jnp.concatenate([mn - pad, mx + pad]).astype(jnp.float32)


def unit_centers(scene: DeviceScene) -> jax.Array:
    """(U, 3) unit AABB centers — the per-unit recentering origin of the
    MT tables (models/scene.py::pack_units). Must be 0.5*(min+max) in f32
    exactly: the Pallas kernel recomputes the same value from the
    cluster_unit_meta rows, and both sides have to agree bit-for-bit."""
    return 0.5 * (scene.unit_aabb_min + scene.unit_aabb_max)


def frame_t_num(scene: DeviceScene, apex: jax.Array) -> jax.Array:
    """(U, LPU) per-frame t_num = (apex - c).n - e2.w2 against the
    recentered tables (c = unit AABB center). One definition shared by
    every consumer (primary frame build, per-instance object-space
    apexes, per-shard tables).

    Written as explicit left-associated component FMAs (not a .sum(-1))
    so the Pallas kernel's in-kernel derivation — which computes the same
    three products from the negated det-block rows — stays bit-identical
    (pallas_tiled.unit_tables; f32 negation and sign-flipped addition are
    exact)."""
    ac = apex - unit_centers(scene)                       # (U, 3)
    n = scene.unit_n                                      # (U, LPU, 3)
    s = (n[..., 0] * ac[:, None, 0] + n[..., 1] * ac[:, None, 1]
         + n[..., 2] * ac[:, None, 2])
    return s - scene.unit_e2w2


def recentered_raymat(raymat: jax.Array, centers: jax.Array) -> jax.Array:
    """Swap the moment rows of gathered ray matrices to per-unit frames.

    raymat: (nt, TILE, 8) rows [d, m, s, 1] with m = a x d; centers:
    (nt, 3) — the gathered unit centers. Returns raymat with
    m' = (a - c) x d = m - c x d. ~12 flops/ray vs the ~4K-flop MT matmul
    it feeds; XLA fuses it into the operand read."""
    d = raymat[..., 0:3]
    m2 = raymat[..., 3:6] - jnp.cross(centers[:, None, :], d)
    return jnp.concatenate([d, m2, raymat[..., 6:8]], axis=-1)


def build_frame_inputs(scene: DeviceScene, inv_view_proj: jax.Array,
                       cfg: RenderConfig,
                       need_q_frame: bool = True,
                       need_rays: bool = True) -> FrameInputs:
    """Raygen + per-frame tables + the coarse (cluster-level) cull.

    need_rays=False skips raygen and the ray-matrix build (raymat/dirs
    come back None) — the in-kernel-raygen fused Pallas mode derives
    both from the inv-view-proj scalars per tile instead of streaming a
    (tiles, TILE, 8) table through HBM.
    """
    width, height = cfg.width, cfg.height
    pw, ph = padded_size(width, height)
    tx, ty = pw // culling.TILE_W, ph // culling.TILE_H
    n_tiles = tx * ty

    apex, normals = culling.tile_frustums(inv_view_proj, width, height,
                                          pw, ph)
    sub_normals = culling.tile_sub_frustums(inv_view_proj, width, height,
                                            pw, ph, n_sub=cfg.sub_frusta,
                                            n_rows=cfg.sub_rows)
    cluster_hit = culling.cull_units(apex, normals, scene.cluster_aabb_min,
                                     scene.cluster_aabb_max,
                                     scene.cluster_valid)

    raymat = dirs = None
    if need_rays:
        origins, dirs = raygen.generate_rays(inv_view_proj, width, height,
                                             pw, ph)

        def to_tiles(x):
            return (x.reshape(ty, culling.TILE_H, tx, culling.TILE_W, 3)
                    .transpose(0, 2, 1, 3, 4).reshape(n_tiles, TILE, 3))

        dirs = to_tiles(dirs)
        origins = to_tiles(origins)
        m = jnp.cross(jnp.broadcast_to(apex, dirs.shape), dirs)
        s = ((origins - apex) * dirs).sum(-1)
        raymat = jnp.concatenate(
            [dirs, m, s[..., None], jnp.ones_like(s)[..., None]], axis=-1)

    if scene.compressed or not need_q_frame:
        # Compressed scenes have no precomputed MT tables at all, and the
        # Pallas kernel derives t_num = (apex-c).n - e2.w2 in-kernel from
        # the static q table (pallas_tiled.unit_tables) — only the XLA
        # tile backend materializes the per-frame q table.
        t_num = q_frame = None
    else:
        # t_num = (a-c).n - e2.w2 — ray-independent, apex-dependent.
        t_num = frame_t_num(scene, apex)                           # (U, LPU)
        lpu = scene.leaves_per_unit
        q_frame = scene.unit_qn.at[:, 7, 3 * lpu:4 * lpu].set(t_num)
    return FrameInputs(raymat, q_frame, dirs, apex, normals, cluster_hit,
                       sub_normals, t_num, scene_exit_aabb(scene))


def _select_nearest_clusters(cl_dist: jax.Array, remaining: jax.Array,
                             kc: int):
    """Per-tile kc nearest remaining clusters + the cleared remaining set.

    Key design: selection is by (distance, cluster index) lexicographic
    order — jax.lax.top_k documents that ties go to the lower index, so
    the selected set is exactly the kc lexicographically-smallest
    remaining clusters. "Clear the selected clusters" is then a per-tile
    threshold compare against the LAST selected (distance, index) pair —
    O(tiles x C) — instead of the (tiles, kc, C) one-hot membership
    tensor this used to build (8+ GB at 15k clusters; the scaling wall
    for 10^6-triangle scenes).

    Returns (cidx (tiles, kc) int32, sel (tiles, kc) bool ascending-dist,
    new_remaining (tiles, C) bool, next_bound (tiles,) f32).
    """
    n_cl = remaining.shape[1]
    idx = jnp.arange(n_cl, dtype=jnp.int32)
    keyed = jnp.where(remaining, -cl_dist[None, :], -jnp.inf)  # (tiles, C)
    negd, cidx = jax.lax.top_k(keyed, kc)      # ascending dist, ties by idx
    sel = negd > -jnp.inf
    # Strictly after the kc-th selected pair in (dist, idx) order; when
    # fewer than kc survived, everything remaining was selected, so the
    # threshold is +inf (nothing stays).
    kth_d = jnp.where(sel[:, -1], -negd[:, -1], jnp.inf)[:, None]
    kth_i = jnp.where(sel[:, -1], cidx[:, -1], n_cl)[:, None]
    d = cl_dist[None, :]
    new_remaining = remaining & ((d > kth_d)
                                 | ((d == kth_d) & (idx[None, :] > kth_i)))
    next_bound = jnp.min(
        jnp.where(new_remaining, cl_dist[None, :], jnp.inf), axis=1)
    return cidx.astype(jnp.int32), sel, new_remaining, next_bound


def candidate_window(scene: DeviceScene, apex: jax.Array, normals: jax.Array,
                     remaining: jax.Array, kc: int):
    """Build one unit-level candidate window from the nearest remaining
    clusters of each tile.

    remaining: (tiles, C) bool — clusters hit by the tile frustum and not
    yet processed. Selects (up to) the kc nearest, refines their units with
    the tile's own frustum, and sorts the survivors front-to-back by a
    conservative apex->AABB entry bound.

    Returns (cand (tiles, kc*UPC) int32, count (tiles,) int32,
    entry (tiles, kc*UPC) f32 ascending with +inf tail, new_remaining,
    next_bound (tiles,) f32 — the nearest entry bound any tile's
    *unselected* cluster could still contribute).
    """
    n_tiles, n_cl = remaining.shape
    cl_dist = culling.aabb_distance(apex, scene.cluster_aabb_min,
                                    scene.cluster_aabb_max)          # (C,)
    cidx, sel, new_remaining, next_bound = _select_nearest_clusters(
        cl_dist, remaining, kc)

    units = (cidx[..., None] * UPC
             + jnp.arange(UPC, dtype=jnp.int32)[None, None]
             ).reshape(n_tiles, kc * UPC)
    umin = scene.unit_aabb_min[units]                     # (tiles, n, 3)
    umax = scene.unit_aabb_max[units]
    uhit = culling.frustum_hit_gathered(normals, apex, umin, umax)
    uhit &= scene.unit_valid[units]
    uhit &= jnp.repeat(sel, UPC, axis=1)
    udist = culling.aabb_distance(apex, umin, umax)
    dkey = jnp.where(uhit, udist, jnp.inf)
    entry, cand = jax.lax.sort_key_val(dkey, units, dimension=1)
    count = uhit.sum(axis=1).astype(jnp.int32)
    return (cand.astype(jnp.int32), count, entry.astype(jnp.float32),
            new_remaining, next_bound)


def cluster_window(scene: DeviceScene, apex: jax.Array,
                   remaining: jax.Array, kc: int):
    """Cluster-level window: the kc nearest remaining clusters per tile,
    front-to-back, for the Pallas kernel's in-kernel unit walk.

    Returns (ccand (tiles, kc) int32, ccount (tiles,) int32,
    centry (tiles, kc) f32 ascending with +inf tail, new_remaining,
    next_bound (tiles,))."""
    cl_dist = culling.aabb_distance(apex, scene.cluster_aabb_min,
                                    scene.cluster_aabb_max)          # (C,)
    cidx, sel, new_remaining, next_bound = _select_nearest_clusters(
        cl_dist, remaining, kc)
    centry = jnp.where(sel, cl_dist[cidx], jnp.inf)       # ascending dist
    return (cidx, sel.sum(axis=1).astype(jnp.int32),
            centry.astype(jnp.float32), new_remaining, next_bound)


def frustum_pack_len(n_sub: int, with_raygen: bool = False,
                     with_xform: bool = False) -> int:
    """Length of the per-tile frustum scalar pack (rounded up to 64).
    with_xform: the merged-instancing in-kernel-raygen pack appends an
    object transform block [R^T (9), inv_s (1), apex_w (3)] after the
    scene AABB (implies with_raygen)."""
    return -(-(3 + n_sub * 12 + (18 if with_raygen or with_xform else 0)
               + 6 + (13 if with_xform else 0)) // 64) * 64


def frustum_scalars(fi: FrameInputs,
                    raygen_ivp: jax.Array | None = None,
                    tx: int | None = None) -> jax.Array:
    """(tiles, frustum_pack_len(...)) f32 per-tile frustum pack for the
    kernel's SMEM: [apex xyz, n_sub sub-cones x 4 planes x xyz, then —
    for the in-kernel-raygen fused mode — the tile's pixel origin (px0,
    py0) and the 16 inv-view-proj scalars, then the 6 inflated scene-AABB
    scalars (fi.scene_aabb — the kernel's per-ray reach bound), pad];
    n_sub comes from fi.sub_normals (set by cfg.sub_frusta)."""
    n_tiles = fi.normals.shape[0]
    n_sub = fi.sub_normals.shape[1]
    ns = n_sub * 12
    apex = jnp.broadcast_to(fi.apex, (n_tiles, 3))
    parts = [apex, fi.sub_normals.reshape(n_tiles, ns)]
    used = 3 + ns
    if raygen_ivp is not None:
        tile = jnp.arange(n_tiles, dtype=jnp.float32)
        px0 = jnp.mod(tile, tx) * culling.TILE_W
        py0 = jnp.floor_divide(tile, tx) * culling.TILE_H
        m16 = jnp.broadcast_to(
            raygen_ivp.astype(jnp.float32).reshape(16), (n_tiles, 16))
        parts += [px0[:, None], py0[:, None], m16]
        used += 18
    if fi.scene_aabb is None:
        raise ValueError("FrameInputs.scene_aabb is required for the "
                         "Pallas frustum pack (tiled.scene_exit_aabb)")
    parts.append(jnp.broadcast_to(fi.scene_aabb, (n_tiles, 6)))
    used += 6
    pack = frustum_pack_len(n_sub, raygen_ivp is not None)
    parts.append(jnp.zeros((n_tiles, pack - used), jnp.float32))
    return jnp.concatenate(parts, axis=1)


def trace_windowed_clusters(scene: DeviceScene, fi: FrameInputs,
                            cfg: RenderConfig, trace_window: Callable,
                            init_t: jax.Array, init_n, kc: int):
    """Cluster-granular window driver (Pallas path): trace_window receives
    (ccand, ccount, centry, best_t, best_n) and walks units in-kernel.
    Typically a single window — multiple only when some tile's frustum hits
    more than kc clusters."""
    s_apex = fi.raymat[..., 6]
    # Per-ray scene-exit reach (same bound the kernel applies in its
    # worst_subs): miss rays stop holding their tile's worst at +inf, so
    # the window loop can skip whole windows of beyond-reach clusters.
    if fi.scene_aabb is not None:
        d = fi.raymat[..., 0:3]
        tiny = jnp.float32(1e-12)
        ds = jnp.where(jnp.abs(d) < tiny,
                       jnp.where(d >= 0.0, tiny, -tiny), d)
        t0 = (fi.scene_aabb[0:3] - fi.apex) / ds
        t1 = (fi.scene_aabb[3:6] - fi.apex) / ds
        exit_t = jnp.maximum(t0, t1).min(-1)          # (tiles, TILE)
    else:
        exit_t = BIG

    def cond(st):
        return st[0].any()

    def body(st):
        active, remaining, best_t, best_n = st
        ccand, ccount, centry, remaining, bound = cluster_window(
            scene, fi.apex, remaining, kc)
        best_t, best_n = trace_window(ccand, ccount, centry, best_t, best_n)
        worst = jnp.max(jnp.where(best_t < BIG, best_t + s_apex, exit_t),
                        axis=1)
        active = remaining.any(axis=1) & (worst >= bound)
        remaining &= active[:, None]
        return (active, remaining, best_t, best_n)

    active0 = fi.cluster_hit.any(axis=1)
    remaining0 = fi.cluster_hit & active0[:, None]
    _, _, best_t, best_n = jax.lax.while_loop(
        cond, body, (active0, remaining0, init_t, init_n))
    return best_t, best_n


def trace_windowed(scene: DeviceScene, fi: FrameInputs, cfg: RenderConfig,
                   trace_window: Callable, init_t: jax.Array, init_n):
    """Drive trace_window over candidate windows until every tile is done.

    trace_window(cand, count, entry, best_t, best_n) -> (best_t, best_n)
    must fold one window's candidates into the running closest hit; best_t
    is (tiles, TILE) along-ray t (BIG = miss), best_n is backend-shaped.

    A tile stays active while it has unprocessed clusters AND some ray
    could still be improved: entry bounds are apex-relative, so the tile's
    worst hit converts via t_apex = t + s (misses keep it at +inf, which
    correctly forbids early exit while any ray has not hit).
    """
    kc = max(1, min(cfg.clusters_per_window, fi.cluster_hit.shape[1]))
    s_apex = fi.raymat[..., 6]                            # (tiles, TILE)

    def cond(st):
        return st[0].any()

    def body(st):
        active, remaining, best_t, best_n = st
        cand, count, entry, remaining, bound = candidate_window(
            scene, fi.apex, fi.normals, remaining, kc)
        best_t, best_n = trace_window(cand, count, entry, best_t, best_n)
        worst = jnp.max(jnp.where(best_t < BIG, best_t + s_apex, BIG),
                        axis=1)
        active = remaining.any(axis=1) & (worst >= bound)
        remaining &= active[:, None]
        return (active, remaining, best_t, best_n)

    active0 = fi.cluster_hit.any(axis=1)
    remaining0 = fi.cluster_hit & active0[:, None]
    _, _, best_t, best_n = jax.lax.while_loop(
        cond, body, (active0, remaining0, init_t, init_n))
    return best_t, best_n


def candidate_counts(scene: DeviceScene, inv_view_proj: jax.Array,
                     cfg: RenderConfig) -> jax.Array:
    """(tiles,) exact per-tile unit-candidate counts (observability; sums
    the windows the trace would consume without early exit)."""
    fi = build_frame_inputs(scene, inv_view_proj, cfg)
    kc = max(1, min(cfg.clusters_per_window, fi.cluster_hit.shape[1]))

    def cond(st):
        return st[0].any()

    def body(st):
        remaining, total = st
        _, count, _, remaining, _ = candidate_window(
            scene, fi.apex, fi.normals, remaining, kc)
        return (remaining, total + count)

    _, total = jax.lax.while_loop(
        cond, body,
        (fi.cluster_hit, jnp.zeros(fi.cluster_hit.shape[0], jnp.int32)))
    return total


def trace_candidate(scene: DeviceScene, raymat, q_frame, unit, in_range, cfg,
                    apex=None):
    """One candidate slot for a batch of tiles.

    raymat: (nt, TILE, 8); unit: (nt,) int32; in_range: (nt,) bool.
    Returns (t (nt, TILE), normal (nt, TILE, 3) unnormalized one-hot pick).

    No per-ray gathers anywhere (they are pathological on TPU): the closest
    leaf's normal is selected with a one-hot min-mask matmul instead of
    argmin + take_along_axis.

    Compressed scenes (q_frame None): the q rows are derived per candidate
    from the unit's grid-vertex record (ops/compressed.py) — the gathered
    HBM traffic per candidate drops from 12 KiB of precomputed table to
    the 2 KiB record.
    """
    lpu = scene.leaves_per_unit
    centers = unit_centers(scene)[unit]                # (nt, 3)
    if scene.compressed:
        from . import compressed as comp
        q, nrm = comp.derive_q_jnp(scene.unit_grid[unit], apex,
                                   scene.sub_level, centers=centers,
                                   indexed=scene.indexed)  # (nt, 8, 4*LPU)
    else:
        q = q_frame[unit][..., :4 * lpu]               # (nt, 8, 4*LPU)
        nrm = scene.unit_nrm[unit]                     # (nt, LPU, 3)
    import os as _os
    wform = _os.environ.get("RTMM_MT_WFORM", "1") == "1"
    if wform:
        # Fourth numerator block w = det - u - v, built on the q table
        # columns BEFORE the contraction — mirrors the Pallas kernel's
        # w-form acceptance (pallas_tiled, the _wform knob doc) so the
        # backends keep agreeing at the acceptance boundary.
        q = jnp.concatenate(
            [q, (q[..., 0 * lpu:1 * lpu] - q[..., 1 * lpu:2 * lpu]
                 - q[..., 2 * lpu:3 * lpu])], axis=-1)
    out = jax.lax.dot_general(
        recentered_raymat(raymat, centers), q,
        dimension_numbers=(((2,), (1,)), ((0,), (0,))),
        preferred_element_type=jnp.float32,
        precision=jax.lax.Precision.HIGHEST)           # (nt, TILE, 4|5*LPU)
    det = out[..., 0 * lpu:1 * lpu]
    u_num = out[..., 1 * lpu:2 * lpu]
    v_num = out[..., 2 * lpu:3 * lpu]
    tn_b = out[..., 3 * lpu:4 * lpu]
    # Unguarded reciprocal + p-form t-window (p = t + s; the per-ray
    # apex shift folds into the BOUNDS and is subtracted after the leaf
    # min) — mirrors the Pallas kernel's epilogue exactly so the two
    # backends keep bit-level agreement at the window boundary, and
    # saves one (.., LPU)-wide pass each. Under cfg.debug_guards (the
    # checkify sanitizer render) or RTMM_MT_NODET=0 the division is
    # guarded instead and the reference's |det| >= EPS acceptance is
    # restored, so float_checks only fire on genuine data corruption.
    guard = cfg.debug_guards or not _nodet()
    if guard:
        det_ok = jnp.abs(det) >= MT_DET_EPS
        inv = 1.0 / jnp.where(det_ok, det, 1.0)
    else:
        inv = 1.0 / det
    u = u_num * inv
    v = v_num * inv
    s = raymat[..., 6:7]
    p = tn_b * inv
    # The upper t-window runs POST-reduce on the winning pb (a (nt, TILE)
    # row op instead of an (nt, TILE, LPU) pass) — exactly equivalent
    # (the min picks the smallest accepted p; clipping larger candidates
    # never changes it) and mirrors the Pallas epilogue bit-for-bit.
    if wform:
        ww = out[..., 4 * lpu:5 * lpu] * inv
        ok = ((jnp.minimum(jnp.minimum(u, v), ww) >= -MT_UV_EPS)
              & (p >= cfg.t_min + s)
              & in_range[:, None, None])
    else:
        ok = ((u >= -MT_UV_EPS) & (u <= 1.0 + MT_UV_EPS)
              & (v >= -MT_UV_EPS) & (u + v <= 1.0 + MT_UV_EPS)
              & (p >= cfg.t_min + s)
              & in_range[:, None, None])
    if guard:
        # The |det| >= EPS guard is numerically redundant on the unguarded
        # path (the windows reject every inf/NaN lane: +inf p loses every
        # min against BIG, -inf fails pmin, NaN fails both); applied here
        # whenever the division above was guarded, restoring the
        # reference's exact acceptance set (intersection.hlsl:423) — see
        # the pallas_tiled _nodet doc.
        ok &= det_ok
    p = jnp.where(ok, p, BIG)
    pb = p.min(axis=2)                                 # (nt, TILE)
    tb = jnp.where(pb <= cfg.t_max + s[..., 0], pb - s[..., 0], BIG)
    # One-hot without & ok: invalid leaves hold p == BIG, matching only
    # on all-miss lanes whose tb == BIG never wins the running-best
    # fold (mirrors the Pallas epilogue).
    onehot = (p <= pb[..., None])                      # ties sum (normalized
    nb = jax.lax.dot_general(                          # again before shading)
        onehot.astype(jnp.float32), nrm,
        dimension_numbers=(((2,), (1,)), ((0,), (0,))),
        preferred_element_type=jnp.float32)            # (nt, TILE, 3)
    return tb, nb


def xla_trace_frame(scene: DeviceScene, fi: FrameInputs, cfg: RenderConfig):
    """Trace one frame's primary rays with the XLA windowed tracer.

    Returns (best_t (tiles, TILE) with BIG = miss, best_n (tiles, TILE, 3)
    unnormalized one-hot normal pick)."""
    n_tiles = fi.raymat.shape[0]
    q_frame = fi.q_frame

    tile_chunk = max(1, min(n_tiles, cfg.tile_chunk))
    if n_tiles % tile_chunk:
        tile_chunk = n_tiles

    def trace_window(cand, count, entry, best_t, best_n):
        c_max = cand.shape[1]

        def trace_tiles(args):
            rm, cnd, cnt, bt0, bn0 = args

            def body(c, carry):
                bt, bn = carry
                unit = cnd[:, c]
                tb, nb = trace_candidate(scene, rm, q_frame, unit,
                                         c < cnt, cfg, apex=fi.apex)
                take = tb < bt
                return (jnp.where(take, tb, bt),
                        jnp.where(take[..., None], nb, bn))

            return jax.lax.fori_loop(0, c_max, body, (bt0, bn0))

        bt, bn = jax.lax.map(
            trace_tiles,
            (fi.raymat.reshape(-1, tile_chunk, TILE, 8),
             cand.reshape(-1, tile_chunk, c_max),
             count.reshape(-1, tile_chunk),
             best_t.reshape(-1, tile_chunk, TILE),
             best_n.reshape(-1, tile_chunk, TILE, 3)))
        return bt.reshape(n_tiles, TILE), bn.reshape(n_tiles, TILE, 3)

    init = (jnp.full((n_tiles, TILE), BIG, jnp.float32),
            jnp.zeros((n_tiles, TILE, 3), jnp.float32))
    return trace_windowed(scene, fi, cfg, trace_window, *init)


def render_tiled(scene: DeviceScene, inv_view_proj: jax.Array,
                 cfg: RenderConfig) -> jax.Array:
    """Render one frame. Returns (H, W, 3) float32."""
    width, height = cfg.width, cfg.height
    pw, ph = padded_size(width, height)
    tx, ty = pw // culling.TILE_W, ph // culling.TILE_H

    fi = build_frame_inputs(scene, inv_view_proj, cfg)
    best_t, best_n = xla_trace_frame(scene, fi, cfg)

    hit_mask = best_t < BIG
    nrm = best_n / jnp.maximum(
        jnp.linalg.norm(best_n, axis=-1, keepdims=True), 1e-20)
    colors = shading.shade_or_miss(hit_mask, nrm, -fi.dirs, cfg)

    img = (colors.reshape(ty, tx, culling.TILE_H, culling.TILE_W, 3)
           .transpose(0, 2, 1, 3, 4).reshape(ph, pw, 3))
    return img[:height, :width]
