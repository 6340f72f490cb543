"""Pallas TPU kernel for the tiled wavefront trace.

Same algorithm as tiled.py (MXU-form Möller-Trumbore over front-to-back
candidates) with the things XLA cannot express:

  * the whole two-level walk runs *inside* the kernel: each tile iterates
    its own front-to-back cluster list (SMEM scalars), DMAs one 4 KB
    cluster-metadata block (per-unit AABBs), frustum-culls and
    distance-sorts the 64 member units on the VPU, and then runs only the
    surviving units — so a frame is ONE kernel launch regardless of scene
    size, with per-tile data-dependent trip counts;
  * double-buffered DMA at both levels: the next cluster's metadata and the
    next unit's MT tables stream from HBM while the current one computes;
  * per-tile early exit: the cluster loop stops when every ray's best hit
    is nearer than the next cluster's conservative entry bound, and units
    are pruned against the running worst-hit distance (the analog of the
    reference's nearest-first stack + first-hit return,
    intersection.hlsl:228-242,472).

Data layout per (tile, unit) step, chosen for native TPU tiling:
  raymat   (6, TILE)    rows [dx,dy,dz, mx,my,mz]  (TILE = TILE_H*TILE_W
                        lanes, a multiple of 128 — 32x32 default;
                        s lives in a separate row, used in the epilogue)
  q        (6, 3*LPU)   [det | u_num | v_num] column blocks
                        (rows 0-5 of DeviceScene.unit_qn)
  matmul   q^T . raymat ->  (3*LPU, TILE) on the MXU — one matmul computes
                        det/u/v for all rays x leaves at once
  t_num    (LPU, 1)     exact per-unit transpose matmul (eye @ t_num row);
                        t broadcast-multiplies against 1/det on the VPU
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
UPC = culling.UNITS_PER_CLUSTER


def _paired_mode() -> int:
    """RTMM_PAIRED env knob: 0 = sequential walk, 1 = paired-issue
    MXU/VPU overlap (default; config 6 measured 72.5 -> 73.8 Mrays/s),
    2 = paired + per-slot private moment buffers (the ray-matrix
    scratch grows a leading 2 dim — the builder and the kernel must
    agree, so both read this; measured NEUTRAL vs mode 1 (73.2), i.e.
    the shared-buffer WAR hazard was not costing anything — kept as an
    A/B knob)."""
    import os
    v = os.environ.get("RTMM_PAIRED", "1")
    return int(v) if v in ("0", "1", "2") else 1


def resolve_mt_precision(scene: DeviceScene, cfg: RenderConfig
                         ) -> RenderConfig:
    """Resolve cfg.mt_precision == "auto" for a concrete scene.

    auto means fast3 (one 3-pass hi/lo bf16 matmul, ~2x cheaper than the
    6-pass HIGHEST). This used to be scale-dependent: u_num/v_num are
    differences of moment-magnitude partial products that cancel down to
    det magnitude, and with ABSOLUTE-coordinate tables the moment
    |o x d| is scene-scale, costing log2(scene/micro-tri) bits — a 10^6-
    triangle plane rendered garbage at fast3. The per-unit RECENTERING
    (models/scene.py::pack_units + the kernel's per-unit moment rows)
    shrinks every cancelling product to unit magnitude, so fast3's ~17
    product bits now cover any scene scale; HIGHEST remains as a manual
    A/B knob (cfg.mt_precision / RTMM_MT_PRECISION env).
    """
    import dataclasses as _dc
    import os as _os

    # A/B override hooks (bench/experiment only): sub-cone grid shape.
    sf = _os.environ.get("RTMM_SUB_FRUSTA")
    sr = _os.environ.get("RTMM_SUB_ROWS")
    if sf or sr:
        cfg = _dc.replace(cfg,
                          sub_frusta=int(sf) if sf else cfg.sub_frusta,
                          sub_rows=int(sr) if sr else cfg.sub_rows)
    env = _os.environ.get("RTMM_MT_PRECISION")   # A/B override hook
    if env:
        return _dc.replace(cfg, mt_precision=env)
    if cfg.mt_precision != "auto":
        return cfg
    return _dc.replace(cfg, mt_precision="fast3")


def _kernel(*refs, lpu: int, t_min: float, t_max: float,
            tiles_per_block: int, nsub: int, nrows: int, fused_cfg,
            kraygen: bool, grid_su, hi_prec: bool, fast2: bool,
            indexed: bool = False, raw: bool = False,
            xform: bool = False, rg_cfg=None):
    """fused_cfg: None = windowed mode (carry t/n in and out); a
    RenderConfig = single-window fused mode (shade in-kernel, write color
    rows, no carry inputs — saves one full (tiles, 8, TILE) HBM round-trip
    plus the separate XLA shading pass). kraygen (fused only): the ray
    matrix is generated in-kernel from the inv-view-proj scalars in the
    frustum pack — no raymat input at all. grid_su: None = standard scene
    (q_hbm holds precomputed unit_qn MT tables + a t_num table input);
    an int = compressed scene (q_hbm holds the per-unit grid-vertex
    records; MT rows AND t_num are derived in-kernel — see _derive_unit).
    indexed: the records carry per-unit corner-index rows (stitched /
    mixed-level scenes, ops/compressed.py IDX_ROWS) instead of sharing
    one all-present gather matrix (no gmat input at all).
    raw (single-window, unshaded): no carry inputs (every row starts
    fresh at t=BIG) and ONE compact (4, TILE) output row [t | normal
    xyz] — the merged-instancing launch's mode, where carries are never
    needed and the windowed mode's 36 KB/row carry stream + 36 KB/row
    output were pure per-row floor cost (the instanced cap sweep
    measured ~1 us/row of floor; see render/instances.py)."""
    compressed = grid_su is not None
    it = list(refs)
    ccand_ref, ccount_ref, centry_ref, frus_ref = it[:4]
    i = 4
    raymat_ref = None
    if not kraygen:
        raymat_ref = it[i]
        i += 1
    gmat_ref = None
    if compressed and not indexed:
        gmat_ref = it[i]       # (GRID_LANES, 3*LPU) leaf gather matrix
        i += 1
    t_in = n_in = None
    if fused_cfg is None and not raw:
        t_in, n_in = it[i:i + 2]
        i += 2
    meta_hbm, q_hbm = it[i:i + 2]
    i += 2
    if raw:
        r_out = it[i]
        i += 1
        outs = (None, None, None, None, None, r_out)
    elif fused_cfg is None:
        t_out, n_out = it[i:i + 2]
        i += 2
        outs = (t_in, n_in, t_out, n_out, None, None)
    else:
        c_out = it[i]
        i += 1
        outs = (None, None, None, None, c_out, None)
    meta_buf, q_buf = it[i:i + 2]
    i += 2
    msem, usem = it[i:i + 2]
    i += 2
    # Per-tile ray-matrix buffer (the recentered moment rows are
    # re-written per unit): (18, TILE) bf16 hi/lo-cat for fast3,
    # (6, TILE) f32 for HIGHEST — MT rows 0-5 only (d + moment).
    rm_buf = it[i]
    i += 1
    # Per-tile running best hit (t (1, TILE), normal rows (8, TILE)) live
    # in scratch REFS, not loop carries: the per-unit slab pre-test gates
    # the MXU/epilogue stage with pl.when, and in-place ref mutation costs
    # nothing where a lax.cond carry would copy 36 KB per unit (measured
    # slower in the grouped kernel — pallas_grouped.py:154).
    bt_scr, bn_scr = it[i:i + 2]
    # Several tiles per grid step amortize the per-program overhead (the
    # frame is mostly empty tiles whose only cost is grid machinery).
    # Kick off every tile's FIRST cluster-metadata DMA up front (per-tile
    # buffers) so tile b+1's metadata streams while tile b computes —
    # otherwise each tile pays the full HBM latency before its first
    # cluster.
    for b in range(tiles_per_block):
        cnt_b = jnp.minimum(ccount_ref[0, b, 0], ccand_ref.shape[2])

        @pl.when(cnt_b > 0)
        def _(b=b):
            pltpu.make_async_copy(
                meta_hbm.at[ccand_ref[0, b, 0]], meta_buf.at[b, 0],
                msem.at[b, 0]).start()

    for b in range(tiles_per_block):
        _trace_tile(b, ccand_ref, ccount_ref, centry_ref, frus_ref,
                    raymat_ref, outs, meta_hbm, q_hbm,
                    meta_buf, q_buf, msem, usem, rm_buf,
                    bt_scr, bn_scr,
                    lpu=lpu, t_min=t_min, t_max=t_max, nsub=nsub,
                    nrows=nrows, fused_cfg=fused_cfg, kraygen=kraygen,
                    grid_su=grid_su, gmat_ref=gmat_ref, hi_prec=hi_prec,
                    fast2=fast2, indexed=indexed, xform=xform,
                    rg_cfg=rg_cfg)


def _trace_tile(b, ccand_ref, ccount_ref, centry_ref, frus_ref, raymat_ref,
                outs, meta_hbm, q_hbm,
                meta_buf, q_buf, msem, usem, rm_buf,
                bt_scr, bn_scr,
                *, lpu, t_min, t_max, nsub, nrows, fused_cfg, kraygen,
                grid_su, gmat_ref, hi_prec, fast2, indexed,
                xform=False, rg_cfg=None):
    t_in, n_in, t_out, n_out, c_out, r_out = outs
    # count can exceed the cluster-list capacity (overflowing tiles keep
    # their true count; the host window loop re-runs them); clamp — reading
    # ccand_ref past capacity would index garbage.
    ccnt = jnp.minimum(ccount_ref[0, b, 0], ccand_ref.shape[2])

    # Empty tiles (~85% of a typical frame) skip everything: constant
    # background (fused) / carry passthrough (windowed) / miss (raw).
    @pl.when(ccnt == 0)
    def _():
        if r_out is not None:
            r_out[0, b] = jnp.concatenate(
                [jnp.full((1, TILE), jnp.float32(1e30)),
                 jnp.zeros((3, TILE), jnp.float32)], axis=0)
        elif fused_cfg is None:
            t_out[0, b] = t_in[0, b]
            n_out[0, b] = n_in[0, b]
        else:
            bg = [jnp.full((1, TILE), jnp.float32(c))
                  for c in fused_cfg.background]
            c_out[0, b] = jnp.concatenate(
                bg + [jnp.zeros((5, TILE), jnp.float32)], axis=0)

    @pl.when(ccnt > 0)
    def _():
        _trace_tile_nonempty(
            b, ccnt, ccand_ref, centry_ref, frus_ref, raymat_ref, outs,
            meta_hbm, q_hbm, meta_buf, q_buf,
            msem, usem, rm_buf, bt_scr, bn_scr,
            lpu=lpu, t_min=t_min, t_max=t_max, nsub=nsub, nrows=nrows,
            fused_cfg=fused_cfg, kraygen=kraygen, grid_su=grid_su,
            gmat_ref=gmat_ref, hi_prec=hi_prec, fast2=fast2,
            indexed=indexed, xform=xform, rg_cfg=rg_cfg)


def _raygen_rows(frus_ref, b, nsub, cfg, apex_off: int = 0,
                 xform_off: int | None = None):
    """In-kernel primary raygen: the exact math of ops/raygen.py +
    build_frame_inputs' ray-matrix assembly, from the 18 raygen scalars
    appended to the frustum pack ([px0, py0, inv_view_proj (row-major
    16)] at offset 3 + nsub*12). ~45 VPU ops on (1, TILE) per nonempty
    tile — replaces streaming a (tiles, TILE, 8) HBM table. Explicit FMA
    (not a matmul): the w component is a catastrophic cancellation that
    needs f32 (see ops/raygen.py).

    apex_off: pack offset of the apex used for the moment/shift rows
    (0 = the standard camera apex at the pack head). xform_off: when
    set, the pack carries a rigid+uniform-scale OBJECT transform at that
    offset ([R^T row-major (9), inv_s (1)]) and the returned rows are the
    instanced object-space ray matrix: d_o = R^T d_w, m_o = apex_o x d_o
    (apex_o = pack head), s_o = s_w * inv_s — the merged-instancing
    launch's per-row rays, generated in-kernel instead of streaming a
    (rows, TILE, 8) HBM table (render/instances.py)."""
    rg = 3 + nsub * 12
    px0 = frus_ref[0, b, rg + 0]
    py0 = frus_ref[0, b, rg + 1]

    def m(i, j):
        return frus_ref[0, b, rg + 2 + 4 * i + j]

    idx = jax.lax.broadcasted_iota(jnp.int32, (1, TILE), 1)
    col = jax.lax.rem(idx, culling.TILE_W).astype(jnp.float32)
    row = jax.lax.div(idx, culling.TILE_W).astype(jnp.float32)
    u = (px0 + col + 0.5) / jnp.float32(cfg.width)
    v = (py0 + row + 0.5) / jnp.float32(cfg.height)
    ndc_x = u * 2.0 - 1.0
    ndc_y = -(v * 2.0 - 1.0)

    pn = [m(i, 0) * ndc_x + m(i, 1) * ndc_y + m(i, 3) for i in range(4)]
    pf = [m(i, 0) * ndc_x + m(i, 1) * ndc_y + (m(i, 2) + m(i, 3))
          for i in range(4)]
    # Divisions (not mul-by-reciprocal) to match ops/raygen.py's rounding
    # bit-for-bit where possible.
    ox, oy, oz = pn[0] / pn[3], pn[1] / pn[3], pn[2] / pn[3]  # near point
    dx = pf[0] / pf[3] - ox
    dy = pf[1] / pf[3] - oy
    dz = pf[2] / pf[3] - oz
    ln = jnp.sqrt(dx * dx + dy * dy + dz * dz)
    dx, dy, dz = dx / ln, dy / ln, dz / ln
    ax = frus_ref[0, b, apex_off + 0]
    ay = frus_ref[0, b, apex_off + 1]
    az = frus_ref[0, b, apex_off + 2]
    s = (ox - ax) * dx + (oy - ay) * dy + (oz - az) * dz
    if xform_off is not None:
        def xf(i):
            return frus_ref[0, b, xform_off + i]
        # d_o = R^T d_w (row i of the stored R^T dots d_w); the world s
        # scales by inv_s (the object-space shift along the unit object
        # direction: |d_o| = 1 because R is a rotation).
        dxo = xf(0) * dx + xf(1) * dy + xf(2) * dz
        dyo = xf(3) * dx + xf(4) * dy + xf(5) * dz
        dzo = xf(6) * dx + xf(7) * dy + xf(8) * dz
        dx, dy, dz = dxo, dyo, dzo
        s = s * xf(9)
        aox = frus_ref[0, b, 0]
        aoy = frus_ref[0, b, 1]
        aoz = frus_ref[0, b, 2]
        mx = aoy * dz - aoz * dy
        my = aoz * dx - aox * dz
        mz = aox * dy - aoy * dx
    else:
        mx = ay * dz - az * dy
        my = az * dx - ax * dz
        mz = ax * dy - ay * dx
    return jnp.concatenate(
        [dx, dy, dz, mx, my, mz, s, jnp.ones((1, TILE), jnp.float32)],
        axis=0)


def _derive_unit(grid_block, gmat, ax, ay, az, cx, cy, cz, lpu,
                 indexed: bool = False):
    """Derive one unit's MT table from its VMEM-resident grid-vertex
    record (the compressed-scene analog of reading the precomputed
    unit_qn block) — the reference's on-the-fly leaf reconstruction
    (intersection.hlsl:465-470) in TPU form.

    grid_block: (GRID_ROWS, GRID_LANES) f32, rows 0-2 = the unit's grid
    vertex xyz (absolute coordinates). cx/cy/cz: the unit's AABB-center
    scalars — the derived w1/w2/t_num rows come out RECENTERED (same
    frame as pack_units' precomputed tables; pair with the per-unit
    moment rows (apex-c) x d). Returns (q (6, 3*lpu) MT rows — det|u|v
    column blocks over the d + moment ray rows, tn (1, lpu) per-frame
    t_num = (apex-c).n - e2.w2, nrm_v (8, lpu) rows 0-2 normalized
    normals).

    One exact one-hot gather matmul per corner expands the <=45 grid
    vertices to the 64 leaves' corner columns [v0|v1|v2]; crosses /
    dot products are VPU row arithmetic in the (3, lanes) layout the MT
    matmul wants, so no transposes appear anywhere. Zero grid lanes
    (padding units, sub-level < 3 leaves) derive zero rows -> det == 0 ->
    rejected by the same epsilon that masks absent leaves in the
    precomputed tables.

    The gather is bit-exact in ONE bf16 MXU pass (vs the generic 6-pass
    HIGHEST f32 emulation): an f32 splits exactly into three bf16 terms
    (x = b1 + b2 + b3, each residual has <= 8 mantissa bits), a one-hot
    contraction of each term is an exact product, and the f32 sum of the
    three gathered components reconstructs x bit-for-bit (the partial
    sums are representable: the terms' mantissas do not overlap beyond
    f32's 24 bits).
    """
    import os as _os2
    # RTMM_DERIVE2=1 (A/B, judged by the on-TPU image gate): 2-term bf16
    # split of the grid positions (~16 mantissa bits, rel ~2^-17 on
    # derived e1/e2/crosses — inside the 1e-3 MT_UV_EPS budget but NOT
    # bit-exact, so the bitwise pinning tests must run with it off).
    # Cuts the three gather matmuls' K from 19 to 11 rows.
    _d2 = _os2.environ.get("RTMM_DERIVE2", "0") == "1"
    pos = grid_block[0:3, :]                        # (3, GRID_LANES)
    p1 = pos.astype(jnp.bfloat16)
    r12 = pos - p1.astype(jnp.float32)
    p2 = r12.astype(jnp.bfloat16)
    zpad = jnp.zeros((5, pos.shape[1]), jnp.bfloat16)
    # Terms at row offsets 0/8/16: the f32 output's term blocks then sit
    # at vreg-aligned sublane offsets (slices stay relayout-free).
    if _d2:
        pos_cat = jnp.concatenate([p1, zpad, p2], axis=0)        # (11, GL)
    else:
        p3 = (r12 - p2.astype(jnp.float32)).astype(jnp.bfloat16)
        pos_cat = jnp.concatenate([p1, zpad, p2, zpad, p3],
                                  axis=0)                        # (19, GL)

    import os as _os
    fused = (not indexed and gmat is not None
             and gmat.shape[1] == 6 * lpu)

    def gather_fused():
        """ONE wide MXU pass for all three corners (widen_gather_matrix
        layout: corner blocks at 2*lpu-aligned lane offsets, so every
        per-corner slice below is physically offset-0 in its vreg and
        the downstream row arithmetic is unchanged). Bit-exact vs the
        3-pass form — each output lane contracts the same one-hot
        column, so the products and per-corner term sums are identical
        f32. Why: the 3 narrow passes cost ~7.9 ms/frame on config 9
        (RTMM_ABLATE=2xgather) while their K-row count is free
        (RTMM_DERIVE2 measured neutral) — the cost is per-PASS MXU
        overhead, not FLOPs, so pass count is the lever."""
        g9 = jax.lax.dot_general(
            pos_cat, gmat.astype(jnp.bfloat16),
            dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)         # (19|11, 6*lpu)
        return (g9[0:3] + g9[8:11] if _d2
                else g9[0:3] + g9[8:11] + g9[16:19])    # (3, 6*lpu)

    def gather(j):
        # One matmul per corner (not one (3, 3*LPU) matmul sliced after):
        # slices of a matmul result carry their lane offset into every
        # derived array, and Mosaic's tpu.concatenate cannot merge pieces
        # whose non-concat-dim offsets differ ("result/input offset
        # mismatch") — offset-0 operands keep the whole derivation legal.
        if indexed:
            # Per-unit one-hot built from the record's corner-index row
            # (stitched/mixed-level topology): oh[g, k] = (g == idx[k]).
            # Exact — indices are small ints in f32, so the int32 cast is
            # lossless; the compare runs on int32 because Mosaic's
            # verifier rejects a FLOAT tpu.iota on real v5e (interpret
            # mode accepted it — caught on the first hardware run). The
            # sentinel index hits the guaranteed-zero lane 127
            # (degenerate leaf).
            from .compressed import GRID_LANES
            idx_row = grid_block[3 + j:4 + j, 0:lpu]          # (1, lpu)
            gi = jax.lax.broadcasted_iota(
                jnp.int32, (GRID_LANES, lpu), 0)
            oh = (gi == idx_row.astype(jnp.int32)).astype(jnp.bfloat16)
        else:
            oh = gmat[:, j * lpu:(j + 1) * lpu].astype(jnp.bfloat16)
        g9 = jax.lax.dot_general(
            pos_cat, oh,
            dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)     # (19|11, lpu)
        if _d2:
            return g9[0:3] + g9[8:11]               # ~16-bit rebuild
        return g9[0:3] + g9[8:11] + g9[16:19]       # exact f32 rebuild

    if fused:
        # (A packed 4*LPU / 2-output-tile variant — v1 at lane offset
        # LPU — was tried and is NOT legalizable: the offset-64 slice
        # propagates its lane offset into the derived rows and real-v5e
        # Mosaic rejects the q/nrm concats with "result/input offset
        # mismatch on non-concat dimension"; interpret mode accepts it.
        # Corner blocks must stay at 128-aligned offsets.)
        g3 = gather_fused()
        v0 = g3[:, 0 * lpu:1 * lpu]                     # lane offset 0
        v1 = g3[:, 2 * lpu:3 * lpu]                     # 2*lpu = vreg 1
        v2 = g3[:, 4 * lpu:5 * lpu]                     # 4*lpu = vreg 2
    else:
        v0, v1, v2 = gather(0), gather(1), gather(2)
    if _os.environ.get("RTMM_ABLATE", "") == "2xgather":
        # Attribute the corner-gather matmul stage alone (the rest of
        # the 2xderive cost is the cross/concat row arithmetic): same
        # DCE/CSE defenses as the other RTMM_ABLATE stages.
        bump = jnp.where(jnp.max(v0) > 1e38, jnp.float32(1.0),
                         jnp.float32(0.0))
        pos_cat = pos_cat + bump.astype(jnp.bfloat16)
        dup = (jnp.abs(gather_fused()) if fused
               else (jnp.abs(gather(0)) + jnp.abs(gather(1))
                     + jnp.abs(gather(2))))
        v0 = v0 + jnp.where(jnp.max(dup) > 1e38,
                            jnp.float32(1.0), jnp.float32(0.0))
    e1 = v1 - v0
    e2 = v2 - v0
    # Recenter v0 about the unit AABB center (zero-gather padding lanes
    # keep e1 = e2 = 0, so their w rows stay 0 and det==0 still rejects).
    v0c = jnp.concatenate([v0[0:1] - cx, v0[1:2] - cy, v0[2:3] - cz],
                          axis=0)

    def cross(a, b):
        return jnp.concatenate(
            [a[1:2] * b[2:3] - a[2:3] * b[1:2],
             a[2:3] * b[0:1] - a[0:1] * b[2:3],
             a[0:1] * b[1:2] - a[1:2] * b[0:1]], axis=0)

    n = cross(e1, e2)                               # (3, lpu)
    w1 = cross(e2, v0c)
    w2 = cross(v0c, e1)
    e2w2 = (e2 * w2).sum(axis=0, keepdims=True)     # (1, lpu)
    tn = ((ax - cx) * n[0:1] + (ay - cy) * n[1:2] + (az - cz) * n[2:3]
          - e2w2)
    z3 = jnp.zeros((3, lpu), jnp.float32)
    rows02 = jnp.concatenate([-n, -w1, -w2], axis=1)          # (3, 3*lpu)
    rows35 = jnp.concatenate([z3, e2, -e1], axis=1)
    q = jnp.concatenate([rows02, rows35], axis=0)             # (6, 3*lpu)
    nn = jnp.maximum(jnp.sqrt((n * n).sum(axis=0, keepdims=True)), 1e-20)
    nrm_v = jnp.concatenate([n / nn, jnp.zeros((5, lpu), jnp.float32)],
                            axis=0)
    return q, tn, nrm_v


def _trace_tile_nonempty(b, ccnt, ccand_ref, centry_ref, frus_ref,
                         raymat_ref, outs, meta_hbm, q_hbm,
                         meta_buf, q_buf, msem, usem,
                         rm_buf, bt_scr, bn_scr,
                         *, lpu, t_min, t_max, nsub, nrows, fused_cfg,
                         kraygen, grid_su, gmat_ref, hi_prec, fast2,
                         indexed, xform=False, rg_cfg=None):
    t_in, n_in, t_out, n_out, c_out, r_out = outs
    # Cost-attribution instrument (RTMM_ABLATE=2xmatmul|2xepilogue|
    # 2xnsel|2xpick, read at trace time): DUPLICATE one stage and fold a
    # data-dependent zero of its result into the real value, so a
    # same-process A/B's time delta IS that stage's per-visit cost —
    # semantics (and therefore the walk's visit counts) are bit-identical.
    # Two compiler hazards are defended against: DCE (the duplicate's
    # result feeds the real value through _dep_zero, whose guard
    # x > 1e38 / 2^30 is never true for scene-scale quantities) and CSE
    # (the duplicate's input is perturbed by a DATA-DEPENDENT zero, so
    # it is not syntactically equal to the original's input and cannot
    # be merged with it).
    import os as _os
    _abl = _os.environ.get("RTMM_ABLATE", "")
    # RTMM_COUNT_PROD=1 (instrument only): count walk iterations whose
    # unit pair IMPROVED some ray's best hit (row-5 counter). visits -
    # productive bounds the headroom of tighter-than-AABB unit bounds /
    # reach sharpening: an unproductive visit is a unit that passed the
    # cone+distance eligibility but contributed nothing. Costs one
    # vector->scalar sync per iteration — never on in production.
    _prod = _os.environ.get("RTMM_COUNT_PROD", "0") == "1"
    # Four alternative walk gatings were built and MEASURED as losses on
    # v5e config 6 (see PERF.md "negative results" for the full analyses):
    # per-ray slab pre-test gate (RTMM_PRETEST, 36.8 vs 46.3 — the ~11%
    # skip rate never paid for the per-unit vector->scalar sync), sub-band
    # gated MT (RTMM_SUBGATE, 52-65 vs 71.5 — per-unit data-dependent
    # branches stall the pipelined walk more than the narrower epilogue
    # saves), per-sub private walks (RTMM_SUBWALK, 38.5 vs 73.8 — 8x the
    # serial scalar syncs + duplicated table prep), and the lockstep band
    # walk (RTMM_LANEWALK, neutral). All four code paths were deleted in
    # round 4 (git history r3 keeps them); the shared static-shape walk
    # below is the only walk. The shared lesson: on this VPU-epilogue-
    # bound kernel, only op-count cuts pay — lane-count cuts and
    # data-dependent gating lose to their fixed costs.
    #
    # Paired-issue MXU/VPU overlap (trace-time env knob, default ON):
    # the walk picks two units per iteration; issuing BOTH units' MT
    # matmuls before either unit's VPU epilogue lets unit B's MXU work
    # overlap unit A's epilogue (no data dependency between them). The
    # fold order A-then-B is preserved — bit-identical image. Measured
    # +1.8% on config 6 — small, which together with the 2x-stage
    # ablation sums exceeding the frame (9.3 ms matmul + 22.5 ms epilogue
    # + 1 ms nsel > 29 ms frame) says Mosaic already overlaps most of the
    # in-order matmul under the previous unit's epilogue; the frame is
    # VPU-epilogue-bound. Mode 2 additionally gives each pair slot a
    # PRIVATE moment-row buffer (scratch grows a leading 2 dim) to break
    # the WAR hazard between unit B's moment write and matmul A's operand
    # read — measured neutral (the hazard wasn't stalling anything).
    _pmode = _paired_mode()
    _paired = _pmode >= 1
    _dbuf = _pmode == 2
    # w-form MT acceptance (default ON; RTMM_MT_WFORM=0 restores the
    # textbook form for A/B): contract a fourth numerator block
    # w = det - u - v (built from the q table columns BEFORE the
    # matmul — a (6, LPU) subtraction, negligible next to the (LPU,
    # TILE) epilogue passes it removes) and accept on
    # min(uu, vv, ww) >= -eps instead of the 4-compare textbook chain.
    # ww >= -eps is EXACTLY uu + vv <= 1 + eps (w/det = 1 - u/det -
    # v/det in exact arithmetic); the dropped uu <= 1 + eps is implied
    # up to 2*eps by vv, ww >= -eps, so the accept set differs only in
    # an O(eps^2) corner sliver — the same epsilon class the image
    # gates budget. The MXU rows grow 3*LPU -> 4*LPU (hidden under the
    # VPU epilogue); the VPU drops ~4 (LPU, TILE) passes per visit
    # (2 compares + 1 add + 1 and, minus 1 min). Mirrored bit-for-bit
    # in the XLA tile backend (ops/tiled.py) so the backends keep
    # agreeing at the acceptance boundary.
    _wform = _os.environ.get("RTMM_MT_WFORM", "1") == "1"
    # Drop the |det| >= EPS test (default ON; RTMM_MT_NODET=0 restores
    # it): the two-sided p-window compare already rejects every lane the
    # det test guarded numerically — det == 0 makes the quotients
    # inf/NaN, and +-inf fails one window side while NaN fails both (and
    # NaN poisons the muv min), so padded/degenerate leaves still never
    # accept. The only semantic change: a hit with 0 < |det| < 1e-8
    # (a near-parallel graze whose u/v/t carry large relative error) is
    # now accepted where the reference rejects it
    # (intersection.hlsl:423) — the same silhouette-epsilon class the
    # image gates budget. Saves an abs + cmp + and, ~3 of the ~24
    # (LPU, TILE) VPU passes per visit in the epilogue-bound kernel.
    # Mirrored in the XLA tile backend and both grouped engines.
    _nodet = _os.environ.get("RTMM_MT_NODET", "1") == "1"
    # RTMM_MT_ARECIP=1: approximate hardware reciprocal in the MT
    # epilogue (A/B; see the accept() doc). Off by default until the
    # image gate judges it on real hardware.
    _arecip = _os.environ.get("RTMM_MT_ARECIP", "0") == "1"

    def _rmix(sl, rows, lo, hi):
        """rm_buf index: (slot, rows, lanes) under the double-buffered
        layout, (rows, lanes) under the shared one."""
        ix = (rows, slice(lo, hi))
        return ((sl,) + ix) if _dbuf else ix

    def _dep_zero(x):
        return jnp.where(x > 1e38, jnp.float32(1.0), jnp.float32(0.0))

    if kraygen and xform:
        # Merged-instancing rows: world raygen + per-row object
        # transform, all in-kernel (xf block after the scene AABB:
        # [R^T (9), inv_s (1), apex_w (3)]).
        xfo = 3 + nsub * 12 + 18 + 6
        rm = _raygen_rows(frus_ref, b, nsub, rg_cfg,
                          apex_off=xfo + 10, xform_off=xfo)
    elif kraygen:
        rm = _raygen_rows(frus_ref, b, nsub, fused_cfg)
    else:
        rm = raymat_ref[0, b]                     # (8, TILE)
    s_row = rm[6:7]                               # (1, TILE)
    if not hi_prec:
        # hi/lo bf16 split of the ray matrix (once per tile): emulates
        # 3-pass f32 matmuls. One K=18 matmul instead of three K=6 passes:
        # each extra pass re-pays the MXU's per-output-tile overheads,
        # which dominate at tiny K. Only ray rows 0-5 (d + moment) feed
        # the MT contraction — q rows 6-7 were structurally zero, and the
        # old all-ones t_num fold rows became a per-unit (LPU, 1)
        # transpose matmul in process_unit (the t block of the old output
        # was a rank-1 broadcast of t_num across the rays: paying M=LPU
        # MXU rows + a (LPU, TILE) f32 output slice to broadcast a lane
        # vector). The cat lives in a scratch BUFFER because the moment
        # rows (3:6 hi, 9:12 lo, 15:18 hi) are re-written per unit with
        # the RECENTERED moment (a - c) x d — that, plus the recentered
        # w1/w2 in the q table, keeps every cancelling partial product at
        # unit magnitude so the 3-pass scheme stays exact at any scene
        # scale.
        rm6 = rm[0:6]
        rm_hi = rm6.astype(jnp.bfloat16)
        rm_lo = (rm6 - rm_hi.astype(jnp.float32)).astype(jnp.bfloat16)
        if fast2:
            # 2-pass scheme (q_hi.rm_hi + q_hi.rm_lo): drops the q-side
            # low bits (~2^-9 relative det/u/v error) for K=12 — an A/B
            # knob judged by the on-TPU image gate, NOT a default.
            _rm_init = jnp.concatenate([rm_hi, rm_lo], axis=0)
        else:
            _rm_init = jnp.concatenate([rm_hi, rm_lo, rm_hi], axis=0)
    else:
        _rm_init = rm[0:6]
    if _dbuf:
        rm_buf[0] = _rm_init
        rm_buf[1] = _rm_init
    else:
        rm_buf[...] = _rm_init

    # Reciprocal direction rows for the per-unit slab pre-test (once per
    # tile; the tiny-|d| clamp keeps 0 * inf NaNs out of the slab mins).
    def _safe_dir(d):
        tiny = jnp.float32(1e-12)
        return jnp.where(jnp.abs(d) < tiny,
                         jnp.where(d >= 0.0, tiny, -tiny), d)

    invd = [1.0 / _safe_dir(rm[k:k + 1]) for k in range(3)]  # 3 x (1, TILE)

    def set_unit_moment(cx, cy, cz, sl=0):
        """Write this unit's recentered moment rows m' = m - c x d into
        the ray-matrix buffer (m = a x d is per-tile; c x d is ~9 VPU row
        ops — noise next to the MT matmul it feeds). sl (static) picks
        the pair slot under the double-buffered layout."""
        mpx = rm[3:4] - (cy * rm[2:3] - cz * rm[1:2])
        mpy = rm[4:5] - (cz * rm[0:1] - cx * rm[2:3])
        mpz = rm[5:6] - (cx * rm[1:2] - cy * rm[0:1])
        mp = jnp.concatenate([mpx, mpy, mpz], axis=0)      # (3, TILE)
        if hi_prec:
            rm_buf[_rmix(sl, slice(3, 6), 0, TILE)] = mp
        else:
            mp_hi = mp.astype(jnp.bfloat16)
            mp_lo = (mp - mp_hi.astype(jnp.float32)).astype(jnp.bfloat16)
            rm_buf[_rmix(sl, slice(3, 6), 0, TILE)] = mp_hi
            rm_buf[_rmix(sl, slice(9, 12), 0, TILE)] = mp_lo
            if not fast2:
                rm_buf[_rmix(sl, slice(15, 18), 0, TILE)] = mp_hi

    # Frustum scalars: [apex xyz, nsub sub-cones x 4 planes x xyz,
    # (raygen scalars,) inflated scene AABB].
    ax = frus_ref[0, b, 0]
    ay = frus_ref[0, b, 1]
    az = frus_ref[0, b, 2]

    # Per-ray scene-exit reach bound (once per tile): a ray's slab EXIT
    # through the inflated scene AABB (tiled.scene_exit_aabb) upper-bounds
    # the apex-relative t of any hit it can still find, so rays that miss
    # everything stop forcing their sub-tile's worst bound to +inf (the
    # silhouette-tile blowup: such subs walked every candidate). Exact:
    # all geometry (incl. the MT uv-epsilon acceptance slop) lies inside
    # the inflated box, and directions are unit length, so hit t <= slab
    # exit. Rays that miss the box get an empty/negative interval — also
    # a valid "no further hits" bound (worst_subs floors at 0).
    sb = 3 + nsub * 12 + (18 if kraygen else 0)
    exit_row = None
    apx = (ax, ay, az)
    for k in range(3):
        e0 = (frus_ref[0, b, sb + k] - apx[k]) * invd[k]
        e1 = (frus_ref[0, b, sb + 3 + k] - apx[k]) * invd[k]
        ek = jnp.maximum(e0, e1)
        exit_row = ek if exit_row is None else jnp.minimum(exit_row, ek)

    lane = jax.lax.broadcasted_iota(jnp.int32, (1, 128), 1)
    # Identity for the per-unit t_num lane->sublane transpose matmul
    # (kernels cannot capture array constants; two iotas build it).
    eyem = (jax.lax.broadcasted_iota(jnp.int32, (lpu, lpu), 0)
            == jax.lax.broadcasted_iota(jnp.int32, (lpu, lpu), 1)
            ).astype(jnp.float32)
    # Sub-tile ray masks: pixel (r, c) sits at ray index r*TILE_W + c;
    # the sub-cone grid is nrows x ncols with j = row * ncols + col.
    idx = jax.lax.broadcasted_iota(jnp.int32, (1, TILE), 1)
    col = jax.lax.rem(idx, culling.TILE_W)
    row = jax.lax.div(idx, culling.TILE_W)
    ncols = nsub // nrows
    sw = culling.TILE_W // ncols
    sh = culling.TILE_H // nrows
    smask = [((row >= (j // ncols) * sh) & (row < (j // ncols + 1) * sh)
              & (col >= (j % ncols) * sw) & (col < (j % ncols + 1) * sw))
             for j in range(nsub)]

    def cmeta_dma(slot, ci):
        return pltpu.make_async_copy(
            meta_hbm.at[ccand_ref[0, b, ci]], meta_buf.at[b, slot],
            msem.at[b, slot])

    def qblock_dma(slot, ci):
        cl0 = ccand_ref[0, b, ci]
        return (pltpu.make_async_copy(
            q_hbm.at[pl.ds(cl0 * UPC, UPC)], q_buf.at[slot],
            usem.at[slot]),)

    def qblock_start(slot, ci):
        for dma in qblock_dma(slot, ci):
            dma.start()

    def qblock_wait(slot, ci):
        for dma in qblock_dma(slot, ci):
            dma.wait()

    @pl.when(ccnt > 0)
    def _():
        qblock_start(0, 0)

    # (this tile's first cluster metadata DMA was started by _kernel's
    # block-level prefetch loop)

    def unit_tables(qslot, u, cx, cy, cz):
        """Per-unit MT operand prep (VMEM reads + bf16 hi/lo splits, or
        the compressed-scene derive): returns (q_mt, n_cat, tn_col,
        tn_row) for the unit at lane u of the resident cluster q block."""
        if grid_su is not None:
            q, tn_row, nrm_v = _derive_unit(
                q_buf[qslot, u],
                None if indexed else gmat_ref[...],
                ax, ay, az, cx, cy, cz, lpu, indexed=indexed)
            if _abl == "2xderive":
                # Attribute the in-kernel table derivation (gathers +
                # cross products): duplicate it on a data-dependently
                # perturbed record and fold a zero of its result in.
                q2, tn2, nv2 = _derive_unit(
                    q_buf[qslot, u] + _dep_zero(jnp.max(q)),
                    None if indexed else gmat_ref[...],
                    ax, ay, az, cx, cy, cz, lpu, indexed=indexed)
                q = q + _dep_zero(jnp.max(jnp.abs(q2)) + jnp.max(tn2)
                                  + jnp.max(nv2))
        else:
            qn = q_buf[qslot, u]                  # (8, 4*LPU + 128)
            # Only rows 0-5 carry MT data ([-n|-w1|-w2] over d rows,
            # [0|e2|-e1] over moment rows) and only the first 3*LPU
            # column blocks (det|u|v) contract against anything — the
            # t block is handled by tn_col below.
            q = qn[0:6, :3 * lpu]
            nrm_v = qn[:, 4 * lpu:4 * lpu + lpu]
            # Per-frame t_num = (apex - c).n - e2.w2, derived IN-KERNEL
            # from rows the q block already carries: the det column block
            # rows 0-2 are -n per leaf, and row 3 of the normal block is
            # e2.w2 (models/scene.py:390-393). Three (1, LPU) FMAs
            # replace what round 3 streamed as a per-frame XLA-built
            # (U, 128) HBM table + a third per-cluster DMA; the q table
            # is now fully camera-independent, which also makes every
            # per-tile kernel input frame-local (multi-frame batching).
            # Arithmetic order mirrors tiled.frame_t_num term-for-term
            # (negations are exact in f32) so the XLA backend's folded
            # row-7 value stays bit-identical.
            s_neg = ((ax - cx) * q[0:1, 0 * lpu:1 * lpu]
                     + (ay - cy) * q[1:2, 0 * lpu:1 * lpu]
                     + (az - cz) * q[2:3, 0 * lpu:1 * lpu])
            tn_row = -s_neg - nrm_v[3:4]                       # (1, LPU)
        # Per-leaf t_num as a SUBLANE column (LPU, 1): an exact one-hot
        # transpose matmul (K=LPU, N=1 — tiny next to the MT matmul it
        # replaces a whole M=LPU output block of: the old scheme paid
        # M=LPU MXU rows + an (LPU, TILE) f32 output slice just to
        # broadcast this lane vector across the rays, and rounded it
        # through a bf16 hi/lo pair on the way; tn_col is exact f32,
        # matching the XLA backend's f32 row-7 fold).
        # Lane -> sublane transpose of t_num as a VPU mask-reduce:
        # broadcast the (1, LPU) row across LPU sublanes, zero all but
        # the diagonal, reduce over lanes. Exact f32 (each output row
        # sums exactly one nonzero term) and ~LPU^2 elementwise flops
        # (64x64 — negligible next to the MT matmul). NB an N=1 bf16
        # one-hot MATMUL form of this transpose trips a Mosaic verifier
        # bug on real v5e (the lowering emits a dtype-changing
        # vector.broadcast bf16->f32, which fails MLIR verification;
        # interpret mode cannot see it), so keep this on the VPU.
        tn_col = jnp.sum(eyem * jnp.broadcast_to(tn_row, (lpu, lpu)),
                         axis=1, keepdims=True)            # (LPU, 1)
        if _wform:
            # Fourth numerator block w = det - u - v, built on the q
            # COLUMNS (6, LPU) so the matmul contracts it like the
            # others (see the _wform knob doc).
            w_col = (q[:, 0 * lpu:1 * lpu] - q[:, 1 * lpu:2 * lpu]
                     - q[:, 2 * lpu:3 * lpu])
            q = jnp.concatenate([q, w_col], axis=1)    # (6, 4*LPU)
        if hi_prec:
            # True-f32 contraction (Mosaic HIGHEST, 6 passes): a manual
            # A/B knob (see resolve_mt_precision).
            q_mt = q
        else:
            # Single-pass bf16 speckles the image (the det/u/v epsilon
            # tests flip near edges). Three bf16 products with the hi/lo
            # splits give ~21-bit mantissas — ample for the reference's
            # 1e-3 u/v epsilons — and fuse into ONE K=18 matmul (each
            # extra pass re-pays the MXU's per-output-tile overheads,
            # which dominate at tiny contraction depth).
            q_hi = q.astype(jnp.bfloat16)
            if fast2:
                q_mt = jnp.concatenate([q_hi, q_hi], axis=0)
            else:
                q_lo = (q - q_hi.astype(jnp.float32)).astype(jnp.bfloat16)
                q_mt = jnp.concatenate([q_hi, q_hi, q_lo], axis=0)
        # hi/lo normal split: TWO accumulated K=LPU one-hot matmuls (not
        # one fused K=2*LPU) — each gather is exact (one nonzero lane) and
        # n_hi + n_lo reconstructs the f32 normal bit-for-bit, so the only
        # thing the fused form bought was a (LPU, TILE) bf16 oh_cat copy
        # per visit in the VPU-bound epilogue. Tie lanes (several leaves
        # at the same p) sum in a different association order than the
        # fused matmul — the same tie-rounding corner both backends
        # already budget.
        n_hi = nrm_v.astype(jnp.bfloat16)
        n_lo = (nrm_v - n_hi.astype(jnp.float32)).astype(jnp.bfloat16)
        return q_mt, (n_hi, n_lo), tn_col, tn_row

    def ep_fold(out, tn, nsel_of):
        """VPU MT epilogue + normal select + running-best fold over the
        tile. out: the MT matmul result (3*LPU, TILE) — det|u|v
        numerator blocks; tn: per-leaf t numerators (LPU, 1);
        nsel_of(oh_b, bump=None): the winner-normal contraction."""
        det = out[0 * lpu:1 * lpu]
        u_num = out[1 * lpu:2 * lpu]
        v_num = out[2 * lpu:3 * lpu]
        s_sl = s_row
        # Row-shaped t-window bounds: the apex shift s is per-RAY
        # (constant across a ray's LPU leaves), so the leaf argmin
        # and the [t_min, t_max] tests run on the raw quotient
        # p = t + s with the shift folded into the BOUNDS ((1, TILE)
        # row ops) and subtracted from the winner after the reduce —
        # one fewer (LPU, TILE) pass. Boundary rounding vs the t-form
        # is <1 ulp (same epsilon class the image gates budget); the
        # miss sentinel survives the shift exactly (ulp(1e30) >> |s|,
        # so 1e30 - s == 1e30 in f32).
        pmin_row = t_min + s_sl
        pmax_row = t_max + s_sl
        def accept(dt, un, vn, wn, pq):
            """The acceptance predicate on the quotients — w-form
            (min-composed, see the _wform knob doc) or textbook.

            The t-window's UPPER side is NOT tested per leaf: the leaf
            min picks the smallest accepted p, and clipping candidates
            larger than the winner can never change the winner, so one
            (1, TILE) row compare after the reduce (below) is exactly
            equivalent to the (LPU, TILE) cmp+and it replaces — two
            fewer full-size passes in the VPU-bound epilogue. A det==0
            lane's +inf pp (positive numerator) passes here but loses
            every min against the 1e30 sentinel; -inf fails pmin; NaN
            fails both compares (and poisons muv)."""
            if _arecip:
                # Hardware approximate reciprocal (~2^-12 relative): the
                # uv/w windows budget 1e-3 epsilons and shading never
                # reads hit positions (directional lights), so the only
                # exposure is winner flips between sub-2e-4 t-ties — the
                # same epsilon class the image gate budgets. A/B knob,
                # judged on-TPU by the gate.
                iv = pl.reciprocal(dt, approx=True)
            else:
                iv = 1.0 / dt
            uu = un * iv
            vv = vn * iv
            pp = pq * iv
            if _wform:
                ww = wn * iv
                muv = jnp.minimum(jnp.minimum(uu, vv), ww)
                o = (muv >= -MT_UV_EPS) & (pp >= pmin_row)
            else:
                o = ((uu >= -MT_UV_EPS) & (uu <= 1.0 + MT_UV_EPS)
                     & (vv >= -MT_UV_EPS)
                     & (uu + vv <= 1.0 + MT_UV_EPS)
                     & (pp >= pmin_row))
            if not _nodet:
                o &= jnp.abs(dt) >= MT_DET_EPS
            return jnp.where(o, pp, 1e30)

        w_num = out[3 * lpu:4 * lpu] if _wform else None
        if _abl == "2xepilogue":
            det2 = det + jnp.max(_dep_zero(u_num))
            p2 = accept(det2, u_num, v_num, w_num, tn)
            pb2 = p2.min(axis=0, keepdims=True)
            det = det + _dep_zero(pb2)
        # Unguarded reciprocal inside accept(): det == 0 lanes yield
        # inf/NaN quotients whose window compares are all False — the
        # old where(ok, det, 1.0) guard was a full-size pass that only
        # changed masked-out lanes.
        # (bf16 u/v epsilon compares were tried for half-width VPU
        # ops: Mosaic rejects bf16 vector cmpf on v5e — "Target does
        # not support this comparison" — so the epilogue stays f32.)
        p = accept(det, u_num, v_num, w_num, tn)   # (LPU, TILE); miss 1e30
        pb = p.min(axis=0, keepdims=True)     # (1, TILE)
        # Post-reduce upper t-window (see the accept() doc): the row
        # compare on pb replaces the per-leaf pmax pass exactly. The
        # winner one-hot below keys on the UNclipped p/pb (same leaf);
        # a clipped lane's tb == 1e30 fails the strict take, discarding
        # the normal exactly like the all-miss case.
        tb = jnp.where(pb <= pmax_row, pb - s_sl, 1e30)   # (1, TILE)
        # One-hot without the & ok pass: invalid leaves hold p == 1e30,
        # so they match only when pb == 1e30 (an all-miss lane) — and
        # there tb == 1e30 fails the strict take below, discarding the
        # spurious normal sum exactly as the masked form did.
        oh_b = (p <= pb).astype(jnp.bfloat16)         # one-hot exact
        nsel = nsel_of(oh_b)
        if _abl == "2xnsel":
            nsel = nsel + _dep_zero(
                nsel_of(oh_b, jnp.max(_dep_zero(tb))))
        bt_cur = bt_scr[...]
        take = tb < bt_cur
        bt_scr[...] = jnp.where(take, tb, bt_cur)
        bn_scr[...] = jnp.where(take, nsel, bn_scr[...])

    def process_unit(qslot, u, cx, cy, cz, defer=False, pslot=0):
        """MXU Möller-Trumbore for one unit's LPU leaves (read from the
        VMEM-resident cluster q block at lane u); folds improvements into
        the bt_scr/bn_scr running-best refs in place. cx/cy/cz: the
        unit's AABB-center scalars — they recenter this unit's moment
        rows + (compressed) derived tables. defer: issue the table prep
        + MT matmul now and return a thunk for the VPU epilogue/select/
        fold — the caller interleaves two units' stages (mm A, mm B,
        ep A, ep B) so unit B's MXU matmul overlaps unit A's VPU epilogue
        (the two stages have no data dependency; the fold order A-then-B
        is preserved, so the image is bit-identical to the sequential
        call order)."""
        q_mt, (n_hi, n_lo), tn_col, tn_row = unit_tables(qslot, u, cx, cy,
                                                         cz)

        def nsel_of(oh_b, bump=None):
            def gath(n):
                if bump is not None:
                    n = n + bump.astype(n.dtype)
                return jax.lax.dot_general(
                    n, oh_b, dimension_numbers=(((1,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32)
            return gath(n_hi) + gath(n_lo)

        def mm_stage():
            """MXU stage: per-unit recentered moment write + MT matmul."""
            set_unit_moment(cx, cy, cz, sl=pslot)
            rm_sl = rm_buf[_rmix(pslot, slice(None), 0, TILE)]
            out = jax.lax.dot_general(
                q_mt, rm_sl,
                dimension_numbers=(((0,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
                **({"precision": jax.lax.Precision.HIGHEST}
                   if hi_prec else {}))
            if _abl == "2xmatmul":
                qd = q_mt + jnp.max(_dep_zero(tn_row)).astype(q_mt.dtype)
                out = out + _dep_zero(jax.lax.dot_general(
                    qd, rm_sl,
                    dimension_numbers=(((0,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32))
            return out

        def ep_stage(out):
            """VPU stage: MT epilogue + normal select + running-best
            fold (shared math in ep_fold)."""
            ep_fold(out, tn_col, nsel_of)

        if defer:
            out = mm_stage()
            return lambda: ep_stage(out)
        ep_stage(mm_stage())

    def worst_subs():
        """Per-sub-tile worst-case reach: each ray contributes its hit's
        apex-relative t, or — while it still misses everything — its
        scene-AABB exit t (it cannot find a hit beyond that), so even
        all-miss sub-tiles get a finite prune bound."""
        bt = bt_scr[...]
        v = jnp.where(bt < 1e30, bt + s_row, exit_row)
        return tuple(jnp.max(jnp.where(smask[j], v, 0.0))
                     for j in range(nsub))

    def cluster_body(carry):
        ci, worsts, nvis, nelig, nprod = carry
        cslot = jax.lax.rem(ci, 2)

        @pl.when(ci + 1 < ccnt)
        def _():
            cmeta_dma(jax.lax.rem(ci + 1, 2), ci + 1).start()
            qblock_start(jax.lax.rem(ci + 1, 2), ci + 1)

        cmeta_dma(cslot, ci).wait()
        meta = meta_buf[b, cslot]                 # (8, 128)
        cl = ccand_ref[0, b, ci]

        mnx, mny, mnz = meta[0:1], meta[1:2], meta[2:3]
        mxx, mxy, mxz = meta[3:4], meta[4:5], meta[5:6]
        # Unit AABB centers (3, 128) — MUST be 0.5*(min+max) in f32 to
        # match the recentering origin baked into the tables
        # (models/scene.py::pack_units / tiled.unit_centers) bit-for-bit.
        crow = 0.5 * (meta[0:3] + meta[3:6])
        valid = meta[6:7] > 0.0                   # valid lanes only
        # Per-sub-cone p-vertex tests: a unit stays a candidate only for
        # sub-tiles whose cone reaches it AND whose own worst hit it could
        # still beat (the per-sub bound is what prunes back-surface units
        # on silhouette tiles, where some full-tile rays miss everything).
        insides = []
        for j in range(nsub):
            inside_j = valid
            for p in range(4):
                base = 3 + 12 * j + 3 * p
                nx = frus_ref[0, b, base + 0]
                ny = frus_ref[0, b, base + 1]
                nz = frus_ref[0, b, base + 2]
                dot = (nx * (jnp.where(nx >= 0.0, mxx, mnx) - ax)
                       + ny * (jnp.where(ny >= 0.0, mxy, mny) - ay)
                       + nz * (jnp.where(nz >= 0.0, mxz, mnz) - az))
                inside_j &= dot >= 0.0
            insides.append(inside_j)
        dx = jnp.maximum(jnp.maximum(mnx - ax, ax - mxx), 0.0)
        dy = jnp.maximum(jnp.maximum(mny - ay, ay - mxy), 0.0)
        dz = jnp.maximum(jnp.maximum(mnz - az, az - mxz), 0.0)
        dist = jnp.sqrt(dx * dx + dy * dy + dz * dz)   # (1, 128)

        def eligible(ws):
            e = insides[0] & (dist <= ws[0])
            for j in range(1, nsub):
                e |= insides[j] & (dist <= ws[j])
            return e


        # Integer candidate keys: distance bits (monotone for dist >= 0)
        # with the lane in the low 7 bits — ONE min-reduce picks the
        # nearest unit AND its lane. INT32_MAX = removed/ineligible.
        imax = jnp.int32(0x7FFFFFFF)
        dist_ikey = jax.lax.bitwise_or(
            jax.lax.bitwise_and(
                jax.lax.bitcast_convert_type(dist, jnp.int32),
                jnp.int32(-128)), lane)

        def ikey_of(ws, removed):
            return jnp.where(eligible(ws) & ~removed, dist_ikey, imax)

        def pick2(ikey):
            p0 = jnp.min(ikey)
            u0 = jnp.where(p0 < imax, jax.lax.bitwise_and(p0, 127), 128)
            ikey = jnp.where(lane == u0, imax, ikey)
            p1 = jnp.min(ikey)
            u1 = jnp.where(p1 < imax, jax.lax.bitwise_and(p1, 127), 128)
            ikey = jnp.where(lane == u1, imax, ikey)
            return u0, u1, ikey

        def _ctr(u):
            """Unit-AABB-center extraction at lane u: one-hot lane reduce
            of the precomputed center row — exact (one nonzero lane), and
            the centers stay vector-valued (1, 1) slices (a
            vector->scalar move per component would be 3 pipeline syncs
            per unit)."""
            ohf = (lane == u).astype(jnp.float32)
            ctrv = jnp.sum(crow * ohf, axis=1, keepdims=True)   # (3, 1)
            return ctrv[0:1], ctrv[1:2], ctrv[2:3]

        def unit_step(u, en):
            """One unit visit: extract the unit's AABB center and run the
            full MXU/VPU MT stage. Dup slots recompute their partner —
            idempotent take. Conditional per-unit gating variants
            (pretest/subgate/subwalk/lanewalk) were all measured losses
            (see the knob-pruning note above).
            Returns 1 if the unit was an active (non-dup) slot."""
            process_unit(cslot, u, *_ctr(u))
            return en.astype(jnp.int32)

        # Wait for this cluster's resident q block (prefetched), then walk
        # its eligible units two per iteration — all reads are VMEM slices,
        # so the per-unit cost is picks + MXU/VPU stages only (no DMA
        # machinery).
        qblock_wait(cslot, ci)

        removed0 = lane >= 128   # nothing removed yet (all-False row)
        u0, u1, ikey0 = pick2(ikey_of(worsts, removed0))

        def unit_body(st):
            ua, ub, ikey, ws, nv, ne, npr = st
            hasb = ub < 128
            if _prod:
                bt_before = bt_scr[...]
            if _paired:
                # Interleaved stages: mm A, mm B, ep A, ep B (see
                # process_unit's defer doc). A dup slot (no second unit)
                # recomputes unit A — idempotent fold, exactly like the
                # sequential walk's gate-off path.
                ub_eff = jnp.where(hasb, ub, ua)
                ep_a = process_unit(cslot, ua, *_ctr(ua), defer=True,
                                    pslot=0)
                ep_b = process_unit(cslot, ub_eff, *_ctr(ub_eff),
                                    defer=True, pslot=1 if _dbuf else 0)
                ep_a()
                ep_b()
                np_a = (ua < 128).astype(jnp.int32)
                np_b = hasb.astype(jnp.int32)
            else:
                np_a = unit_step(ua, ua < 128)
                np_b = unit_step(jnp.where(hasb, ub, ua), hasb)
            ws = worst_subs()
            removed = ikey >= imax
            na, nb, ikey2 = pick2(jnp.where(removed, imax,
                                            ikey_of(ws, removed)))
            nv = nv + np_a + np_b
            ne = ne + 1 + hasb.astype(jnp.int32)
            if _prod:
                npr = npr + jnp.max(
                    (bt_scr[...] < bt_before).astype(jnp.int32))
            if _abl == "2xpick":
                iz = jnp.where(nv > (1 << 30), jnp.int32(1), jnp.int32(0))
                na2, _, _ = pick2(jnp.where(removed, imax,
                                            ikey_of(ws, removed)) + iz)
                nv = nv + jnp.where(na2 > (1 << 30), jnp.int32(1),
                                    jnp.int32(0))
            return (na, nb, ikey2, ws, nv, ne, npr)

        def unit_cond(st):
            return st[0] < 128

        _, _, _, worsts, nvis, nelig, nprod = jax.lax.while_loop(
            unit_cond, unit_body,
            (u0, u1, ikey0, worsts, nvis, nelig, nprod))
        return ci + 1, worsts, nvis, nelig, nprod

    def cluster_cond(carry):
        ci, worsts, _nv, _ne, _np = carry
        wmax = worsts[0]
        for j in range(1, nsub):
            wmax = jnp.maximum(wmax, worsts[j])
        cidx = jnp.minimum(ci, centry_ref.shape[2] - 1)
        return (ci < ccnt) & (wmax >= centry_ref[0, b, cidx])

    # Carry in the running best from previous cluster windows; the early
    # exit bound then also skips whole windows this tile no longer needs.
    # (Fused mode is single-window: start fresh.) The visit counter rides
    # row 3 of the normal OUTPUT: during the loop, row 3 of the nrm-block
    # carry is NOT zero (it holds e2w2-weighted picks — scene.py packs
    # unit_e2w2 into row 3 of the qn normal block), but the epilogue below
    # overwrites output row 3 wholesale with nv_row, and nv0 reads the
    # previous window's already-overwritten row. Do not rely on row 3 of
    # best_n being zero mid-loop.
    if fused_cfg is None and t_in is not None:
        bt_scr[...] = t_in[0, b].reshape(1, TILE)
        bn_scr[...] = n_in[0, b]                  # (8, TILE)
        nv0 = jnp.max(n_in[0, b, 3:4]).astype(jnp.int32)
        ne0 = jnp.max(n_in[0, b, 4:5]).astype(jnp.int32)
    else:
        bt_scr[...] = jnp.full((1, TILE), 1e30, jnp.float32)
        bn_scr[...] = jnp.zeros((8, TILE), jnp.float32)
        nv0 = ne0 = jnp.int32(0)
    c_final, _, nvis, nelig, nprod = jax.lax.while_loop(
        cluster_cond, cluster_body,
        (jnp.int32(0), worst_subs(), nv0, ne0, jnp.int32(0)))

    # Drain: whenever the cluster loop stopped at c_final < ccnt (early-exit
    # bound, possibly before the first iteration), the metadata DMA for
    # cluster c_final has already been started — leaving it un-awaited leaks
    # its semaphore and corrupts later programs on the device. (Unit DMAs
    # never leak: the unit loop only exits after processing a unit whose
    # successor was 128, i.e. nothing in flight.)
    @pl.when(c_final < ccnt)
    def _():
        cmeta_dma(jax.lax.rem(c_final, 2), c_final).wait()
        qblock_wait(jax.lax.rem(c_final, 2), c_final)

    # Counters ride the otherwise-padded normal rows: row 3 = units
    # PROCESSED (MXU steps actually run), row 4 = units ELIGIBLE (walk
    # picks — processed + pre-test skips). Windowed carries read both
    # back from the previous window's already-overwritten rows.
    best_t = bt_scr[...]
    best_n = bn_scr[...]
    nv_row = jnp.full((1, TILE), nvis.astype(jnp.float32))
    ne_row = jnp.full((1, TILE), nelig.astype(jnp.float32))
    np_row = (jnp.full((1, TILE), nprod.astype(jnp.float32)) if _prod
              else None)
    if r_out is not None:
        # Raw mode: compact [t | normal xyz] row, no carries, no counters.
        r_out[0, b] = jnp.concatenate([best_t, best_n[0:3]], axis=0)
    elif fused_cfg is None:
        t_out[0, b] = best_t[0]
        n_out[0, b] = jnp.concatenate(
            [best_n[0:3], nv_row, ne_row,
             np_row if _prod else best_n[5:6], best_n[6:8]], axis=0)
    else:
        # Fused epilogue: normalize the selected normal, shade against the
        # view direction (-d = -rows 0..2 of the ray matrix), Reinhard — the
        # exact row form of shading.shade_or_miss.
        nx, ny, nz = best_n[0:1], best_n[1:2], best_n[2:3]
        nn = jnp.maximum(jnp.sqrt(nx * nx + ny * ny + nz * nz), 1e-20)
        hit = best_t < 1e30
        r, g, bl = shading.shade_rows(
            nx / nn, ny / nn, nz / nn, -rm[0:1], -rm[1:2], -rm[2:3],
            hit, fused_cfg)
        zrows = jnp.zeros((2, TILE), jnp.float32)
        c_out[0, b] = jnp.concatenate(
            [r, g, bl, nv_row, ne_row,
             np_row if _prod else jnp.zeros((1, TILE), jnp.float32),
             zrows], axis=0)


def trace_pallas(scene: DeviceScene, raymat_t: jax.Array,
                 frus: jax.Array, ccand: jax.Array, ccount: jax.Array,
                 centry: jax.Array, t_in: jax.Array | None,
                 n_in: jax.Array | None, cfg: RenderConfig,
                 interpret: bool = False,
                 tiles_per_block: int | None = None,
                 fused: bool = False, raw: bool = False,
                 xform_raygen: bool = False):
    """One cluster window (normally the whole frame). raymat_t:
    (tiles, 8, TILE); frus: (tiles, pack) frustum scalars (apex + sub-cone
    planes + scene AABB; the kernel derives the per-frame t_num row from
    the apex scalars and the static q table — every input is per-tile);
    ccand/ccount/centry: per-tile front-to-back cluster lists.

    Windowed mode (fused=False): t_in (tiles, TILE) / n_in
    (tiles, 8, TILE) carry the running best from previous windows (BIG/0
    for the first); returns the updated (t, normal rows).
    Fused mode (fused=True, single window): shades in-kernel and returns
    one (tiles, 8, TILE) array with rgb in rows 0..2.
    """
    kraygen = ((fused and cfg.kernel_raygen and raymat_t is None)
               or (raw and xform_raygen))
    compressed = scene.compressed
    n_tiles = frus.shape[0]
    lpu = scene.leaves_per_unit
    kc = ccand.shape[1]
    tb = tiles_per_block or cfg.tiles_per_block
    pad = (-n_tiles) % tb
    if pad:
        if not kraygen:
            raymat_t = jnp.pad(raymat_t, ((0, pad), (0, 0), (0, 0)))
        frus = jnp.pad(frus, ((0, pad), (0, 0)))
        ccand = jnp.pad(ccand, ((0, pad), (0, 0)))
        ccount = jnp.pad(ccount, ((0, pad),))
        centry = jnp.pad(centry, ((0, pad), (0, 0)))
        if not fused and not raw:
            t_in = jnp.pad(t_in, ((0, pad), (0, 0)), constant_values=1e30)
            n_in = jnp.pad(n_in, ((0, pad), (0, 0), (0, 0)))
    nb = (n_tiles + pad) // tb

    # Shared-topology indexed scenes (scene.unit_gmat set) take the gmat
    # gather path: the kernel skips the per-visit one-hot construction
    # and the records' index rows go unread — bit-identical output (the
    # shared matrix IS the one-hot every unit would build).
    kidx = compressed and scene.indexed and scene.unit_gmat is None
    kernel = functools.partial(_kernel, lpu=lpu,
                               t_min=cfg.t_min, t_max=cfg.t_max,
                               tiles_per_block=tb, nsub=cfg.sub_frusta,
                               nrows=cfg.sub_rows,
                               fused_cfg=cfg if fused else None,
                               kraygen=kraygen,
                               grid_su=(scene.sub_level if compressed
                                        else None),
                               hi_prec=cfg.mt_precision == "highest",
                               fast2=cfg.mt_precision == "fast2",
                               indexed=kidx, raw=raw,
                               xform=raw and xform_raygen,
                               rg_cfg=cfg if xform_raygen else None)
    smem = lambda shape: pl.BlockSpec(  # noqa: E731
        (1,) + shape, lambda i: (i,) + (0,) * len(shape),
        memory_space=pltpu.SMEM)
    vmem = lambda shape: pl.BlockSpec(  # noqa: E731
        (1,) + shape, lambda i: (i,) + (0,) * len(shape),
        memory_space=pltpu.VMEM)
    frusp = tiled.frustum_pack_len(cfg.sub_frusta, with_raygen=kraygen,
                                   with_xform=raw and xform_raygen)
    head_specs = [smem((tb, kc)), smem((tb, 1)), smem((tb, kc)),
                  smem((tb, frusp))]
    head_args = (ccand.reshape(nb, tb, kc), ccount.reshape(nb, tb, 1),
                 centry.reshape(nb, tb, kc), frus.reshape(nb, tb, frusp))
    if not kraygen:
        head_specs = head_specs + [vmem((tb, 8, TILE))]
        head_args = head_args + (raymat_t.reshape(nb, tb, 8, TILE),)
    if compressed:
        from . import compressed as comp
        if not kidx:
            gmat = (scene.unit_gmat if scene.unit_gmat is not None
                    else jnp.asarray(comp.leaf_gather_matrix(
                        scene.sub_level)))
            # Fused single-pass corner gather (default; RTMM_DERIVE_FUSED=0
            # reverts to three narrow per-corner passes — bit-identical,
            # the A/B is pure pass-count cost, see _derive_unit).
            import os as _osf
            if _osf.environ.get("RTMM_DERIVE_FUSED", "1") == "1":
                gmat = comp.widen_gather_matrix(gmat)
            # The gather matrix is a per-call constant (kernels cannot
            # capture array constants): one whole-array VMEM block shared
            # by every grid program. Per-unit-topology indexed scenes
            # need none — each record carries its own corner indices.
            head_specs = head_specs + [pl.BlockSpec(
                gmat.shape, lambda i: (0, 0), memory_space=pltpu.VMEM)]
            head_args = head_args + (gmat,)
        tail_args = (scene.cluster_unit_meta, scene.unit_grid)
    else:
        tail_args = (scene.cluster_unit_meta, scene.unit_qn)
    tail_specs = [pl.BlockSpec(memory_space=pl.ANY)] * len(tail_args)
    if raw:
        in_specs = head_specs + tail_specs
        args = head_args + tail_args
        out_shape = jax.ShapeDtypeStruct((nb, tb, 4, TILE), jnp.float32)
        out_specs = vmem((tb, 4, TILE))
    elif fused:
        in_specs = head_specs + tail_specs
        args = head_args + tail_args
        out_shape = jax.ShapeDtypeStruct((nb, tb, 8, TILE), jnp.float32)
        out_specs = vmem((tb, 8, TILE))
    else:
        in_specs = head_specs + [vmem((tb, TILE)),
                                 vmem((tb, 8, TILE))] + tail_specs
        args = head_args + (t_in.reshape(nb, tb, TILE),
                            n_in.reshape(nb, tb, 8, TILE)) + tail_args
        out_shape = (
            jax.ShapeDtypeStruct((nb, tb, TILE), jnp.float32),
            jax.ShapeDtypeStruct((nb, tb, 8, TILE), jnp.float32),
        )
        out_specs = (vmem((tb, TILE)), vmem((tb, 8, TILE)))

    # Per-tile ray-matrix buffer (moment rows re-written per unit with
    # the recentered (a - c) x d; see _trace_tile_nonempty). Under
    # RTMM_PAIRED=2 each pair slot gets a private copy (leading 2 dim)
    # so unit B's moment write has no WAR hazard against matmul A.
    _rm_dims = ((2,) if _paired_mode() == 2 else ())
    if cfg.mt_precision == "highest":
        rm_scratch = pltpu.VMEM(_rm_dims + (6, TILE), jnp.float32)
    elif cfg.mt_precision == "fast2":
        rm_scratch = pltpu.VMEM(_rm_dims + (12, TILE), jnp.bfloat16)
    else:
        rm_scratch = pltpu.VMEM(_rm_dims + (18, TILE), jnp.bfloat16)
    # Running-best refs (t + normal rows): in-place state for the
    # pre-test-gated unit stage (see _trace_tile_nonempty).
    best_scratch = [pltpu.VMEM((1, TILE), jnp.float32),
                    pltpu.VMEM((8, TILE), jnp.float32)]
    if compressed:
        from . import compressed as comp
        grows = comp.IDX_ROWS if scene.indexed else comp.GRID_ROWS
        scratch = [
            pltpu.VMEM((tb, 2, 8, 128), jnp.float32),
            pltpu.VMEM((2, UPC, grows, comp.GRID_LANES),
                       jnp.float32),
            pltpu.SemaphoreType.DMA((tb, 2)),
            pltpu.SemaphoreType.DMA((2,)),
            rm_scratch,
        ] + best_scratch
    else:
        scratch = [
            pltpu.VMEM((tb, 2, 8, 128), jnp.float32),
            pltpu.VMEM((2, UPC, 8, 4 * lpu + 128), jnp.float32),
            pltpu.SemaphoreType.DMA((tb, 2)),
            pltpu.SemaphoreType.DMA((2,)),
            rm_scratch,
        ] + best_scratch
    out = pl.pallas_call(
        kernel,
        grid=(nb,),
        in_specs=in_specs,
        out_specs=out_specs,
        out_shape=out_shape,
        scratch_shapes=scratch,
        interpret=interpret,
    )(*args)
    if raw:
        return out.reshape(-1, 4, TILE)[:n_tiles]
    if fused:
        return out.reshape(-1, 8, TILE)[:n_tiles]
    t, nrm = out
    return (t.reshape(-1, TILE)[:n_tiles],
            nrm.reshape(-1, 8, TILE)[:n_tiles])


def render_pallas(scene: DeviceScene, inv_view_proj: jax.Array,
                  cfg: RenderConfig, interpret: bool | None = None,
                  with_stats: bool = False):
    """Render one frame with the Pallas backend. Returns (H, W, 3), or
    ((H, W, 3), stats) with stats["kernel_unit_visits"] = the exact
    per-tile (ty, tx) count of (tile, unit) MXU steps the kernel executed
    (row-3 counter) and stats["kernel_unit_eligible"] = the walk's picks
    before the per-ray slab pre-test (row-4 counter) — eligible - visits
    is the work the pre-test skipped."""
    if interpret is None:
        interpret = jax.devices()[0].platform == "cpu"
    width, height = cfg.width, cfg.height
    pw, ph = tiled.padded_size(width, height)
    tx, ty = pw // culling.TILE_W, ph // culling.TILE_H
    n_tiles = tx * ty

    kc = max(1, min(cfg.kernel_clusters_per_window, scene.num_clusters))
    fused_mode = scene.num_clusters <= kc
    kraygen = fused_mode and cfg.kernel_raygen

    fi = tiled.build_frame_inputs(scene, inv_view_proj, cfg,
                                  need_q_frame=False,
                                  need_rays=not kraygen)
    if kraygen:
        raymat_t = None
        frus = tiled.frustum_scalars(
            fi, raygen_ivp=jnp.asarray(inv_view_proj, jnp.float32), tx=tx)
    else:
        raymat_t = fi.raymat.transpose(0, 2, 1)     # (tiles, 8, TILE)
        frus = tiled.frustum_scalars(fi)

    if fused_mode:
        # Single window covers the whole scene: trace + shade fused in one
        # kernel launch (no (tiles, 8, TILE) HBM round-trip, no separate
        # shading pass, empty tiles write constant background in-kernel;
        # with kernel_raygen the ray matrix never exists in HBM at all).
        cl_dist = culling.aabb_distance(fi.apex, scene.cluster_aabb_min,
                                        scene.cluster_aabb_max)
        key = jnp.where(fi.cluster_hit, -cl_dist[None, :], -jnp.inf)
        negd, cidx = jax.lax.top_k(key, kc)
        sel = negd > -jnp.inf
        centry = jnp.where(sel, -negd, jnp.inf).astype(jnp.float32)
        rows = trace_pallas(scene, raymat_t, frus,
                            cidx.astype(jnp.int32),
                            sel.sum(axis=1).astype(jnp.int32), centry,
                            None, None, cfg, interpret=interpret,
                            fused=True)
        colors = rows[:, 0:3].transpose(0, 2, 1)     # (tiles, TILE, 3)
        visits = rows[:, 3, 0]
        eligible = rows[:, 4, 0]
        productive = rows[:, 5, 0]
    else:
        def trace_window(ccand, ccount, centry, best_t, best_n):
            return trace_pallas(scene, raymat_t, frus,
                                ccand, ccount, centry, best_t, best_n, cfg,
                                interpret=interpret)

        init = (jnp.full((n_tiles, TILE), BIG, jnp.float32),
                jnp.zeros((n_tiles, 8, TILE), jnp.float32))
        best_t, nrm = tiled.trace_windowed_clusters(
            scene, fi, cfg, trace_window, *init, kc=kc)

        best_n = nrm[:, 0:3].transpose(0, 2, 1)     # (tiles, TILE, 3)
        visits = nrm[:, 3, 0]
        eligible = nrm[:, 4, 0]
        productive = nrm[:, 5, 0]
        hit_mask = best_t < BIG
        n_unit = best_n / jnp.maximum(
            jnp.linalg.norm(best_n, axis=-1, keepdims=True), 1e-20)
        colors = shading.shade_or_miss(hit_mask, n_unit, -fi.dirs, cfg)

    img = (colors.reshape(ty, tx, culling.TILE_H, culling.TILE_W, 3)
           .transpose(0, 2, 1, 3, 4).reshape(ph, pw, 3))[:height, :width]
    if with_stats:
        return img, {"kernel_unit_visits":
                     visits.reshape(ty, tx).astype(jnp.int32),
                     "kernel_unit_eligible":
                     eligible.reshape(ty, tx).astype(jnp.int32),
                     # Pair-iterations that improved some ray (row-5
                     # counter; all-zero unless RTMM_COUNT_PROD=1).
                     "kernel_unit_productive":
                     productive.reshape(ty, tx).astype(jnp.int32)}
    return img


def render_pallas_frames(scene: DeviceScene, ivps: jax.Array,
                         cfg: RenderConfig,
                         interpret: bool | None = None) -> jax.Array:
    """Render a BATCH of frames in one fused kernel launch.

    ivps: (F, 4, 4). Returns (F, H, W, 3).

    Every input of the fused single-window kernel is per-TILE (frustum
    scalars carry the apex + raygen scalars; the per-frame t_num row is
    derived in-kernel from the apex — unit_tables), so F frames batch by
    simply concatenating their tile rows into one (F * tiles) launch.
    This amortizes the per-launch fixed cost (XLA prologue + grid
    machinery, ~1.2 ms/frame — the round-3 bound on small-frame
    throughput, VERDICT item 5) across the whole batch: the reference
    analog is that its ENTIRE frame is one DispatchRays
    (src/application.cpp:214) with no per-frame re-setup.

    Falls back to a lax.map over single frames when the scene needs
    windowed cluster consumption (some tile sees more than
    kernel_clusters_per_window clusters).
    """
    if interpret is None:
        interpret = jax.devices()[0].platform == "cpu"
    kc = max(1, min(cfg.kernel_clusters_per_window, scene.num_clusters))
    if scene.num_clusters > kc:
        return jax.lax.map(
            lambda m: render_pallas(scene, m, cfg, interpret=interpret),
            ivps)
    width, height = cfg.width, cfg.height
    pw, ph = tiled.padded_size(width, height)
    tx, ty = pw // culling.TILE_W, ph // culling.TILE_H
    n_tiles = tx * ty
    kraygen = cfg.kernel_raygen
    f_total = ivps.shape[0]

    # Bound the launch's tile count (the fused kernel's output rows are
    # (F*tiles, 8, TILE) f32 — 16k tiles ~ 0.5 GB): chunk the batch into
    # equal sub-batches when a frame is large. Small frames (the case the
    # batching exists for) fit whole orbits in one launch.
    import os as _os
    cap = int(_os.environ.get("RTMM_BATCH_TILE_CAP", "16384"))
    f = max(1, min(f_total, cap // max(n_tiles, 1)))
    while f_total % f:
        f -= 1
    ivps = jnp.asarray(ivps, jnp.float32)
    if f < f_total:
        body = functools.partial(render_pallas_frames, scene, cfg=cfg,
                                 interpret=interpret)
        out = jax.lax.map(body, ivps.reshape(f_total // f, f, 4, 4))
        return out.reshape(f_total, height, width, 3)

    def frame_inputs(ivp):
        fi = tiled.build_frame_inputs(scene, ivp, cfg, need_q_frame=False,
                                      need_rays=not kraygen)
        if kraygen:
            raymat_t = jnp.zeros((n_tiles, 0, 0), jnp.float32)
            frus = tiled.frustum_scalars(
                fi, raygen_ivp=ivp.astype(jnp.float32), tx=tx)
        else:
            raymat_t = fi.raymat.transpose(0, 2, 1)
            frus = tiled.frustum_scalars(fi)
        cl_dist = culling.aabb_distance(fi.apex, scene.cluster_aabb_min,
                                        scene.cluster_aabb_max)
        key = jnp.where(fi.cluster_hit, -cl_dist[None, :], -jnp.inf)
        negd, cidx = jax.lax.top_k(key, kc)
        sel = negd > -jnp.inf
        centry = jnp.where(sel, -negd, jnp.inf).astype(jnp.float32)
        return (raymat_t, frus, cidx.astype(jnp.int32),
                sel.sum(axis=1).astype(jnp.int32), centry)

    raymat_t, frus, cidx, ccnt, centry = jax.vmap(frame_inputs)(ivps)

    def flat(x):
        return x.reshape((f * n_tiles,) + x.shape[2:])

    rows = trace_pallas(scene, None if kraygen else flat(raymat_t),
                        flat(frus), flat(cidx), flat(ccnt), flat(centry),
                        None, None, cfg, interpret=interpret, fused=True)
    colors = rows[:, 0:3].transpose(0, 2, 1)        # (F*tiles, TILE, 3)
    imgs = (colors.reshape(f, ty, tx, culling.TILE_H, culling.TILE_W, 3)
            .transpose(0, 1, 3, 2, 4, 5).reshape(f, ph, pw, 3))
    return imgs[:, :height, :width]
