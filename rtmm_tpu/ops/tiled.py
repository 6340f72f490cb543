"""Tiled wavefront renderer (XLA path) — MXU-form Möller-Trumbore.

The TPU-shaped replacement for the per-ray pipeline in traversal.py:

  * rays are processed in 8x128 pixel tiles (one VPU register per scalar);
  * candidates come from the tile-frustum cull (culling.py), so the only
    dynamic gathers are per tile, not per ray;
  * because all primary rays share the camera apex, the Möller-Trumbore
    quantities are bilinear in (ray, leaf) (see DeviceScene.unit_q): each
    (tile, candidate) step is ONE (1024, 6) @ (6, 3*LPU) matmul on the MXU
    followed by an elementwise epilogue and a min-reduce. Per-pixel
    near-plane origins are recovered exactly via t_near = t_apex - s with
    s = dot(origin - apex, d) (d . (d x e2) = 0 makes u, v independent of
    the along-ray origin shift).

The hierarchy is folded into the traversal units (scene.py): every unit
carries at most 64 leaf micro-triangles, so the inner loop is dense and
branch-free. This XLA version is the correctness reference and CPU
fallback; pallas_tiled.py implements the same algorithm with per-tile
dynamic candidate counts.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp

from ..config import RenderConfig
from ..models.scene import DeviceScene
from . import culling, raygen, shading
from .intersect import MT_DET_EPS, MT_UV_EPS

BIG = jnp.float32(1e30)
TILE = culling.TILE_H * culling.TILE_W


def padded_size(width: int, height: int) -> tuple[int, int]:
    pw = -(-width // culling.TILE_W) * culling.TILE_W
    ph = -(-height // culling.TILE_H) * culling.TILE_H
    return pw, ph


def build_frame_inputs(scene: DeviceScene, inv_view_proj: jax.Array,
                       cfg: RenderConfig):
    """Per-frame, per-tile inputs shared by the XLA and Pallas backends.

    Returns (raymat (tiles, TILE, 8), q_frame (U, 8, 4*LPU), cand
    (tiles, C), count (tiles,), entry (tiles, C), dirs (tiles, TILE, 3)) —
    candidates front-to-back with conservative entry bounds. raymat columns are
    [d, apex x d, s, 1] with s = dot(origin - apex, d); q_frame is the
    static unit_q table with the apex-dependent t_num block filled in
    (row 7, broadcast through the constant-1 ray column).
    """
    width, height = cfg.width, cfg.height
    pw, ph = padded_size(width, height)
    tx, ty = pw // culling.TILE_W, ph // culling.TILE_H
    n_tiles = tx * ty

    apex, normals = culling.tile_frustums(inv_view_proj, width, height,
                                          pw, ph)
    hit = culling.cull_units(apex, normals, scene.unit_aabb_min,
                             scene.unit_aabb_max, scene.unit_valid)
    cand, count, entry = culling.candidate_lists(
        hit, cfg.max_tile_candidates, apex,
        scene.unit_aabb_min, scene.unit_aabb_max)

    origins, dirs = raygen.generate_rays(inv_view_proj, width, height, pw, ph)

    def to_tiles(x):
        return (x.reshape(ty, culling.TILE_H, tx, culling.TILE_W, 3)
                .transpose(0, 2, 1, 3, 4).reshape(n_tiles, TILE, 3))

    dirs = to_tiles(dirs)
    origins = to_tiles(origins)
    m = jnp.cross(jnp.broadcast_to(apex, dirs.shape), dirs)
    s = ((origins - apex) * dirs).sum(-1)
    raymat = jnp.concatenate(
        [dirs, m, s[..., None], jnp.ones_like(s)[..., None]], axis=-1)

    # t_num = a.n - e2.w2 — ray-independent, apex-dependent (once per frame).
    t_num = (scene.unit_n * apex).sum(-1) - scene.unit_e2w2    # (U, LPU)
    lpu = scene.leaves_per_unit
    q_frame = scene.unit_q.at[:, 7, 3 * lpu:4 * lpu].set(t_num)
    return raymat, q_frame, cand, count, entry, dirs


def trace_candidate(scene: DeviceScene, raymat, q_frame, unit, in_range, cfg):
    """One candidate slot for a batch of tiles.

    raymat: (nt, TILE, 8); unit: (nt,) int32; in_range: (nt,) bool.
    Returns (t (nt, TILE), normal (nt, TILE, 3) unnormalized one-hot pick).

    No per-ray gathers anywhere (they are pathological on TPU): the closest
    leaf's normal is selected with a one-hot min-mask matmul instead of
    argmin + take_along_axis.
    """
    lpu = scene.leaves_per_unit
    q = q_frame[unit]                                  # (nt, 8, 4*LPU)
    nrm = scene.unit_nrm[unit]                         # (nt, LPU, 3)
    out = jax.lax.dot_general(
        raymat, q,
        dimension_numbers=(((2,), (1,)), ((0,), (0,))),
        preferred_element_type=jnp.float32,
        precision=jax.lax.Precision.HIGHEST)           # (nt, TILE, 4*LPU)
    det = out[..., 0 * lpu:1 * lpu]
    u_num = out[..., 1 * lpu:2 * lpu]
    v_num = out[..., 2 * lpu:3 * lpu]
    tn_b = out[..., 3 * lpu:4 * lpu]
    ok = jnp.abs(det) >= MT_DET_EPS
    inv = 1.0 / jnp.where(ok, det, 1.0)
    u = u_num * inv
    v = v_num * inv
    s = raymat[..., 6:7]
    t = tn_b * inv - s
    ok &= ((u >= -MT_UV_EPS) & (u <= 1.0 + MT_UV_EPS)
           & (v >= -MT_UV_EPS) & (u + v <= 1.0 + MT_UV_EPS)
           & (t >= cfg.t_min) & (t <= cfg.t_max)
           & in_range[:, None, None])
    t = jnp.where(ok, t, BIG)
    tb = t.min(axis=2)                                 # (nt, TILE)
    onehot = (t <= tb[..., None]) & ok                 # ties sum (normalized
    nb = jax.lax.dot_general(                          # again before shading)
        onehot.astype(jnp.float32), nrm,
        dimension_numbers=(((2,), (1,)), ((0,), (0,))),
        preferred_element_type=jnp.float32)            # (nt, TILE, 3)
    return tb, nb


def render_tiled(scene: DeviceScene, inv_view_proj: jax.Array,
                 cfg: RenderConfig) -> jax.Array:
    """Render one frame. Returns (H, W, 3) float32."""
    width, height = cfg.width, cfg.height
    pw, ph = padded_size(width, height)
    tx, ty = pw // culling.TILE_W, ph // culling.TILE_H
    n_tiles = tx * ty

    raymat, q_frame, cand, count, _entry, dirs = build_frame_inputs(
        scene, inv_view_proj, cfg)
    c_max = cand.shape[1]

    def trace_tiles(args):
        rm, d, cnd, cnt = args

        def body(c, carry):
            best_t, best_n = carry
            unit = cnd[:, c]
            tb, nb = trace_candidate(scene, rm, q_frame, unit, c < cnt, cfg)
            take = tb < best_t
            return (jnp.where(take, tb, best_t),
                    jnp.where(take[..., None], nb, best_n))

        nt = rm.shape[0]
        init = (jnp.full((nt, TILE), BIG, jnp.float32),
                jnp.zeros((nt, TILE, 3), jnp.float32))
        best_t, best_n = jax.lax.fori_loop(0, c_max, body, init)
        hit_mask = best_t < BIG
        nrm = best_n / jnp.maximum(
            jnp.linalg.norm(best_n, axis=-1, keepdims=True), 1e-20)
        return shading.shade_or_miss(hit_mask, nrm, -d, cfg)

    tile_chunk = max(1, min(n_tiles, cfg.tile_chunk))
    if n_tiles % tile_chunk:
        tile_chunk = n_tiles
    colors = jax.lax.map(
        trace_tiles,
        (raymat.reshape(-1, tile_chunk, TILE, 8),
         dirs.reshape(-1, tile_chunk, TILE, 3),
         cand.reshape(-1, tile_chunk, c_max),
         count.reshape(-1, tile_chunk)))
    colors = colors.reshape(n_tiles, TILE, 3)

    img = (colors.reshape(ty, tx, culling.TILE_H, culling.TILE_W, 3)
           .transpose(0, 2, 1, 3, 4).reshape(ph, pw, 3))
    return img[:height, :width]
