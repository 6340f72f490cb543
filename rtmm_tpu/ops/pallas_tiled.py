"""Pallas TPU kernel for the tiled wavefront trace.

Same algorithm as tiled.py (MXU-form Möller-Trumbore over per-tile candidate
lists) with the two things XLA cannot express:

  * a *dynamic* per-tile candidate loop — tiles run exactly `count[i]`
    candidates instead of the padded maximum, so empty sky tiles cost ~zero;
  * explicit double-buffered DMA of each candidate's tables (HBM -> VMEM)
    overlapped with the previous candidate's compute.

Data layout per (tile, candidate) step, chosen for native TPU tiling:
  raymat   (8, TILE)    rows [dx,dy,dz, mx,my,mz, s, 1]  (TILE = 1024 lanes)
  q        (8, 4*LPU)   [det | u_num | v_num | t_num] column blocks
                        (DeviceScene.unit_q with the per-frame t_num row)
  matmul   q^T . raymat ->  (4*LPU, TILE) on the MXU — one matmul computes
                        every MT quantity for all rays x leaves at once
  epilogue VPU compare/select, min over the leaf sublanes
  normals  nrm_pad(8, NP) @ onehot(NP, TILE) -> (8, TILE) on the MXU
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..config import RenderConfig
from ..models.scene import DeviceScene
from . import culling, shading, tiled
from .intersect import MT_DET_EPS, MT_UV_EPS

BIG = jnp.float32(1e30)
TILE = culling.TILE_H * culling.TILE_W


def _kernel(cand_ref, count_ref, entry_ref, raymat_ref,  # blocked inputs
            q_hbm, nrm_hbm,                       # full tables (ANY/HBM)
            t_out, n_out,                         # outputs
            q_buf, nrm_buf, sem,                  # scratch
            *, lpu: int, npad: int, t_min: float, t_max: float,
            tiles_per_block: int):
    # Several tiles per grid step amortize the per-program overhead (the
    # frame is mostly empty tiles whose only cost is grid machinery).
    for b in range(tiles_per_block):
        _trace_tile(b, cand_ref, count_ref, entry_ref, raymat_ref,
                    q_hbm, nrm_hbm, t_out, n_out, q_buf, nrm_buf, sem,
                    lpu=lpu, npad=npad, t_min=t_min, t_max=t_max)


def _trace_tile(b, cand_ref, count_ref, entry_ref, raymat_ref,
                q_hbm, nrm_hbm, t_out, n_out, q_buf, nrm_buf, sem,
                *, lpu, npad, t_min, t_max):
    rm = raymat_ref[0, b]                         # (8, TILE)
    # count can exceed the candidate-list capacity (overflowing tiles keep
    # their true count for observability); clamp — reading cand_ref past
    # c_max would index garbage and launch an out-of-bounds table DMA.
    cnt = jnp.minimum(count_ref[0, b, 0], cand_ref.shape[2])

    def dmas(slot, c):
        unit = cand_ref[0, b, c]
        return (
            pltpu.make_async_copy(q_hbm.at[unit], q_buf.at[slot],
                                  sem.at[slot, 0]),
            pltpu.make_async_copy(nrm_hbm.at[unit], nrm_buf.at[slot],
                                  sem.at[slot, 1]),
        )

    @pl.when(cnt > 0)
    def _():
        for d in dmas(0, 0):
            d.start()

    s_row = rm[6:7]                               # (1, TILE)
    # hi/lo bf16 split of the ray matrix (once per tile): emulates 3-pass
    # f32 matmuls (Mosaic supports only DEFAULT/HIGHEST; HIGHEST is 6
    # passes and the matmul dominates the kernel).
    rm_hi = rm.astype(jnp.bfloat16)
    rm_lo = (rm - rm_hi.astype(jnp.float32)).astype(jnp.bfloat16)

    def body(carry):
        c, best_t, best_n, _worst = carry
        slot = jax.lax.rem(c, 2)

        @pl.when(c + 1 < cnt)
        def _():
            for d in dmas(jax.lax.rem(c + 1, 2), c + 1):
                d.start()

        for d in dmas(slot, c):
            d.wait()

        q = q_buf[slot]                           # (8, 4*LPU)
        # Single-pass bf16 speckles the image (the det/u/v epsilon tests
        # flip near edges), and HIGHEST costs 6 passes. Three bf16 products
        # with the hi/lo splits give ~21-bit mantissas — ample for the
        # reference's 1e-3 u/v epsilons.
        q_hi = q.astype(jnp.bfloat16)
        q_lo = (q - q_hi.astype(jnp.float32)).astype(jnp.bfloat16)
        dims = (((0,), (0,)), ((), ()))

        def mm(a, b):
            return jax.lax.dot_general(
                a, b, dimension_numbers=dims,
                preferred_element_type=jnp.float32)

        out = mm(q_hi, rm_hi) + (mm(q_hi, rm_lo) + mm(q_lo, rm_hi))
        det = out[0 * lpu:1 * lpu]
        u_num = out[1 * lpu:2 * lpu]
        v_num = out[2 * lpu:3 * lpu]
        tn_b = out[3 * lpu:4 * lpu]
        ok = jnp.abs(det) >= MT_DET_EPS
        inv = 1.0 / jnp.where(ok, det, 1.0)
        u = u_num * inv
        v = v_num * inv
        t = tn_b * inv - s_row                    # (LPU, TILE)
        ok &= ((u >= -MT_UV_EPS) & (u <= 1.0 + MT_UV_EPS)
               & (v >= -MT_UV_EPS) & (u + v <= 1.0 + MT_UV_EPS)
               & (t >= t_min) & (t <= t_max))
        t = jnp.where(ok, t, 1e30)
        tb = t.min(axis=0, keepdims=True)         # (1, TILE)
        onehot = ((t <= tb) & ok).astype(jnp.float32)
        oh = jnp.concatenate(
            [onehot, jnp.zeros((npad - lpu, TILE), jnp.float32)], axis=0)
        # one-hot is exact in bf16; split only the normals (2 passes).
        nrm_v = nrm_buf[slot]
        n_hi = nrm_v.astype(jnp.bfloat16)
        n_lo = (nrm_v - n_hi.astype(jnp.float32)).astype(jnp.bfloat16)
        oh_b = oh.astype(jnp.bfloat16)
        ndims = (((1,), (0,)), ((), ()))
        nsel = (jax.lax.dot_general(n_hi, oh_b, dimension_numbers=ndims,
                                    preferred_element_type=jnp.float32)
                + jax.lax.dot_general(n_lo, oh_b, dimension_numbers=ndims,
                                      preferred_element_type=jnp.float32))
        take = tb < best_t
        best_t = jnp.where(take, tb, best_t)
        best_n = jnp.where(take, nsel, best_n)
        # Early-exit bound: candidates are front-to-back by apex distance;
        # once every ray's best apex-relative hit is nearer than the next
        # candidate's entry bound, the rest cannot contribute (the analog of
        # the reference's nearest-first stack + first-hit return,
        # intersection.hlsl:462-476).
        worst = jnp.max(jnp.where(best_t < 1e30, best_t + s_row, 1e30))
        return c + 1, best_t, best_n, worst

    def cond(carry):
        c, _best_t, _best_n, worst = carry
        cidx = jnp.minimum(c, entry_ref.shape[2] - 1)  # guard c == c_max
        return (c < cnt) & (worst >= entry_ref[0, b, cidx])

    init = (jnp.int32(0),
            jnp.full((1, TILE), 1e30, jnp.float32),
            jnp.zeros((8, TILE), jnp.float32),
            jnp.float32(1e30))
    c_final, best_t, best_n, _ = jax.lax.while_loop(cond, body, init)

    # Drain: if the early-exit bound stopped the loop at c_final < cnt, the
    # previous iteration already started the DMA for candidate c_final —
    # leaving it un-awaited leaks its semaphore and corrupts later programs
    # on the device. (At a full run c_final == cnt and nothing is pending.)
    @pl.when((c_final > 0) & (c_final < cnt))
    def _():
        for d in dmas(jax.lax.rem(c_final, 2), c_final):
            d.wait()

    t_out[0, b] = best_t[0]
    n_out[0, b] = best_n


def trace_pallas(scene: DeviceScene, raymat_t: jax.Array, q_frame: jax.Array,
                 cand: jax.Array, count: jax.Array, entry: jax.Array,
                 cfg: RenderConfig, interpret: bool = False,
                 tiles_per_block: int = 8):
    """raymat_t: (tiles, 8, TILE); q_frame: (U, 8, 4*LPU).
    Returns (t (tiles, TILE), normal (tiles, 8, TILE), rows 0..2 used)."""
    n_tiles = raymat_t.shape[0]
    lpu = scene.leaves_per_unit
    npad = scene.unit_nrm_pad.shape[2]
    c_max = cand.shape[1]
    tb = tiles_per_block
    pad = (-n_tiles) % tb
    if pad:
        raymat_t = jnp.pad(raymat_t, ((0, pad), (0, 0), (0, 0)))
        cand = jnp.pad(cand, ((0, pad), (0, 0)))
        count = jnp.pad(count, ((0, pad),))
        entry = jnp.pad(entry, ((0, pad), (0, 0)))
    nb = (n_tiles + pad) // tb

    kernel = functools.partial(_kernel, lpu=lpu, npad=npad,
                               t_min=cfg.t_min, t_max=cfg.t_max,
                               tiles_per_block=tb)
    out_shape = (
        jax.ShapeDtypeStruct((nb, tb, TILE), jnp.float32),
        jax.ShapeDtypeStruct((nb, tb, 8, TILE), jnp.float32),
    )
    in_specs = [
        pl.BlockSpec((1, tb, c_max), lambda i: (i, 0, 0),
                     memory_space=pltpu.SMEM),
        pl.BlockSpec((1, tb, 1), lambda i: (i, 0, 0),
                     memory_space=pltpu.SMEM),
        pl.BlockSpec((1, tb, c_max), lambda i: (i, 0, 0),
                     memory_space=pltpu.SMEM),
        pl.BlockSpec((1, tb, 8, TILE), lambda i: (i, 0, 0, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec(memory_space=pl.ANY),
        pl.BlockSpec(memory_space=pl.ANY),
    ]
    out_specs = (
        pl.BlockSpec((1, tb, TILE), lambda i: (i, 0, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((1, tb, 8, TILE), lambda i: (i, 0, 0, 0),
                     memory_space=pltpu.VMEM),
    )
    t, nrm = pl.pallas_call(
        kernel,
        grid=(nb,),
        in_specs=in_specs,
        out_specs=out_specs,
        out_shape=out_shape,
        scratch_shapes=[
            pltpu.VMEM((2, 8, 4 * lpu), jnp.float32),
            pltpu.VMEM((2, 8, npad), jnp.float32),
            pltpu.SemaphoreType.DMA((2, 2)),
        ],
        interpret=interpret,
    )(cand.reshape(nb, tb, c_max), count.reshape(nb, tb, 1),
      entry.reshape(nb, tb, c_max), raymat_t.reshape(nb, tb, 8, TILE),
      q_frame, scene.unit_nrm_pad)
    return (t.reshape(-1, TILE)[:n_tiles],
            nrm.reshape(-1, 8, TILE)[:n_tiles])


def render_pallas(scene: DeviceScene, inv_view_proj: jax.Array,
                  cfg: RenderConfig, interpret: bool | None = None) -> jax.Array:
    """Render one frame with the Pallas backend. Returns (H, W, 3)."""
    if interpret is None:
        interpret = jax.devices()[0].platform == "cpu"
    width, height = cfg.width, cfg.height
    pw, ph = tiled.padded_size(width, height)
    tx, ty = pw // culling.TILE_W, ph // culling.TILE_H

    raymat, q_frame, cand, count, entry, dirs = tiled.build_frame_inputs(
        scene, inv_view_proj, cfg)
    raymat_t = raymat.transpose(0, 2, 1)            # (tiles, 8, TILE)

    t, nrm = trace_pallas(scene, raymat_t, q_frame, cand, count, entry, cfg,
                          interpret=interpret)
    best_t = t                                      # (tiles, TILE)
    best_n = nrm[:, 0:3].transpose(0, 2, 1)         # (tiles, TILE, 3)
    hit_mask = best_t < BIG
    n_unit = best_n / jnp.maximum(
        jnp.linalg.norm(best_n, axis=-1, keepdims=True), 1e-20)
    colors = shading.shade_or_miss(hit_mask, n_unit, -dirs, cfg)

    img = (colors.reshape(ty, tx, culling.TILE_H, culling.TILE_W, 3)
           .transpose(0, 2, 1, 3, 4).reshape(ph, pw, 3))
    return img[:height, :width]
