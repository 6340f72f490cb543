"""Pallas TPU kernel for the grouped (arbitrary-origin) trace — the path
tracer's secondary-ray engine (BASELINE config 5).

Same group model as ops/grouped.py (octant+origin-cell sorted groups of
GROUP rays, conservative per-group reach boxes) with the scalability fixes
the XLA version cannot express:

  * the scene's cluster hierarchy replaces the dense (groups x units)
    overlap matrix: each group walks its own front-to-back cluster list
    in-kernel, culls the 64 member units against its reach box on the VPU,
    and traces only survivors — with *dynamic* per-group trip counts
    instead of a fixed candidate cap;
  * candidate capacity is exact by construction (cluster windows repeat on
    the rare group that overlaps more clusters than the list capacity), so
    the silent 96-candidate truncation of the XLA path is gone;
  * per-group early exit: clusters stop when every live ray's best hit is
    nearer than the next cluster's conservative entry distance (valid in t
    units because ray directions are normalized), and units are pruned
    against the running worst;
  * double-buffered HBM->VMEM DMA of cluster metadata and per-unit
    generalized MT tables (unit_q16: ray rows [d, o x d, o, 1]).
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..config import RenderConfig
from ..models.scene import DeviceScene
from . import culling
from .grouped import DEAD_KEY, GROUP, _sort_key
from .intersect import MT_DET_EPS, MT_UV_EPS

BIG = jnp.float32(1e30)
UPC = culling.UNITS_PER_CLUSTER
# Sub-groups of 128 consecutive (sorted, hence coherent) rays per GROUP:
# each carries its own origin/reach box and worst-hit bound so units are
# culled per sub-group — the grouped analog of the tile kernel's
# sub-frusta. A whole group's union reach box is near-useless for
# incoherent secondary rays (it spans most of the scene); the 128-ray
# boxes stay tight because the sort packs similar octant+cell rays
# together.
NS = GROUP // 128


def _derive_q16_unit(grid_block, gmat, lpu, indexed):
    """One unit's arbitrary-origin MT table (16, 4*lpu) + normal rows
    (8, lpu), derived from its VMEM grid record — the grouped-engine twin
    of pallas_tiled._derive_unit, in ABSOLUTE coordinates (the grouped ray
    rows [d, o x d, o, 1] need no recentering). compressed.derive_q16_np
    is the host oracle; offset-0 gathers/concats keep Mosaic legal (see
    pallas_tiled._derive_unit)."""
    pos = grid_block[0:3, :]                      # (3, GRID_LANES)
    # Bit-exact one-pass bf16 gather (vs 6-pass HIGHEST): x = b1+b2+b3
    # exactly, one-hot contractions of each term are exact products, and
    # the f32 rebuild is exact (see pallas_tiled._derive_unit). Term rows
    # at vreg-aligned offsets 0/8/16 keep the output slices relayout-free.
    p1 = pos.astype(jnp.bfloat16)
    r12 = pos - p1.astype(jnp.float32)
    p2 = r12.astype(jnp.bfloat16)
    p3 = (r12 - p2.astype(jnp.float32)).astype(jnp.bfloat16)
    zpad = jnp.zeros((5, pos.shape[1]), jnp.bfloat16)
    pos_cat = jnp.concatenate([p1, zpad, p2, zpad, p3], axis=0)  # (19, GL)

    def gather(j):
        if indexed:
            from .compressed import GRID_LANES
            idx_row = grid_block[3 + j:4 + j, 0:lpu]          # (1, lpu)
            # int32 iota/compare: Mosaic rejects a FLOAT tpu.iota on
            # real v5e (the cast of the small-int f32 row is lossless).
            gi = jax.lax.broadcasted_iota(
                jnp.int32, (GRID_LANES, lpu), 0)
            oh = (gi == idx_row.astype(jnp.int32)).astype(jnp.bfloat16)
        else:
            oh = gmat[:, j * lpu:(j + 1) * lpu].astype(jnp.bfloat16)
        g9 = jax.lax.dot_general(
            pos_cat, oh, dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)   # (19, lpu)
        return g9[0:3] + g9[8:11] + g9[16:19]

    v0 = gather(0)
    v1 = gather(1)
    v2 = gather(2)
    e1 = v1 - v0
    e2 = v2 - v0

    def cross(a, b):
        return jnp.concatenate(
            [a[1:2] * b[2:3] - a[2:3] * b[1:2],
             a[2:3] * b[0:1] - a[0:1] * b[2:3],
             a[0:1] * b[1:2] - a[1:2] * b[0:1]], axis=0)

    n = cross(e1, e2)                             # (3, lpu)
    w1a = cross(e2, v0)
    w2a = cross(v0, e1)
    e2w2 = (e2 * w2a).sum(axis=0, keepdims=True)  # (1, lpu)
    z3 = jnp.zeros((3, lpu), jnp.float32)
    z1 = jnp.zeros((1, lpu), jnp.float32)
    rows02 = jnp.concatenate([-n, -w1a, -w2a, z3], axis=1)    # (3, 4*lpu)
    rows35 = jnp.concatenate([z3, e2, -e1, z3], axis=1)
    rows68 = jnp.concatenate([z3, z3, z3, n], axis=1)
    row9 = jnp.concatenate([z1, z1, z1, -e2w2], axis=1)
    q = jnp.concatenate(
        [rows02, rows35, rows68, row9,
         jnp.zeros((6, 4 * lpu), jnp.float32)], axis=0)       # (16, 4*lpu)
    nn = jnp.maximum(jnp.sqrt((n * n).sum(axis=0, keepdims=True)), 1e-20)
    nrm_v = jnp.concatenate([n / nn, jnp.zeros((5, lpu), jnp.float32)],
                            axis=0)               # (8, lpu)
    return q, nrm_v


def _kernel(ccand_ref, ccount_ref, centry_ref, box_ref, rv_ref,
            t_in, n_in, meta_hbm, q_hbm, nrm_hbm, t_out, n_out,
            meta_buf, q_buf, nrm_buf, msem, usem, bt_scr, bn_scr,
            *, lpu: int, npad: int, t_min: float, t_max: float,
            groups_per_block: int, grid_su=None, indexed: bool = False):
    # grid_su not None = compressed scene: q_hbm holds grid records, the
    # q16 table + shading normals are derived per unit in-kernel
    # (_derive_q16_unit); nrm_hbm then carries the shared gather matrix
    # (uniform topology) or a dummy (indexed records carry their own
    # corner indices).
    for b in range(groups_per_block):
        cnt_b = jnp.minimum(ccount_ref[0, b, 0], ccand_ref.shape[2])

        @pl.when(cnt_b > 0)
        def _(b=b):
            pltpu.make_async_copy(
                meta_hbm.at[ccand_ref[0, b, 0]], meta_buf.at[b, 0],
                msem.at[b, 0]).start()

    for b in range(groups_per_block):
        _trace_group(b, ccand_ref, ccount_ref, centry_ref, box_ref, rv_ref,
                     t_in, n_in, meta_hbm, q_hbm, nrm_hbm, t_out, n_out,
                     meta_buf, q_buf, nrm_buf, msem, usem, bt_scr, bn_scr,
                     lpu=lpu, npad=npad, t_min=t_min, t_max=t_max,
                     grid_su=grid_su, indexed=indexed)


def _trace_group(b, ccand_ref, ccount_ref, centry_ref, box_ref, rv_ref,
                 t_in, n_in, meta_hbm, q_hbm, nrm_hbm, t_out, n_out,
                 meta_buf, q_buf, nrm_buf, msem, usem, bt_scr, bn_scr,
                 *, lpu, npad, t_min, t_max, grid_su=None, indexed=False):
    ccnt = jnp.minimum(ccount_ref[0, b, 0], ccand_ref.shape[2])

    @pl.when(ccnt == 0)
    def _():
        t_out[0, b] = t_in[0, b]
        n_out[0, b] = n_in[0, b]

    @pl.when(ccnt > 0)
    def _():
        _trace_group_nonempty(
            b, ccnt, ccand_ref, centry_ref, box_ref, rv_ref, t_in, n_in,
            meta_hbm, q_hbm, nrm_hbm, t_out, n_out,
            meta_buf, q_buf, nrm_buf, msem, usem, bt_scr, bn_scr,
            lpu=lpu, npad=npad, t_min=t_min, t_max=t_max,
            grid_su=grid_su, indexed=indexed)


def _trace_group_nonempty(b, ccnt, ccand_ref, centry_ref, box_ref, rv_ref,
                          t_in, n_in, meta_hbm, q_hbm, nrm_hbm, t_out, n_out,
                          meta_buf, q_buf, nrm_buf, msem, usem,
                          bt_scr, bn_scr,
                          *, lpu, npad, t_min, t_max, grid_su=None,
                          indexed=False):
    import os as _os
    compressed = grid_su is not None
    # Sub-group gated MT (default ON; RTMM_SUBGATE=0 disables for A/B):
    # the MT matmul/epilogue/select runs only on the 128-lane sub-groups
    # the picked unit is eligible for (insides[j] & dists[j] <= ws[j] —
    # the walk's own sound per-sub predicates, extracted at the unit's
    # lane). Secondary-bounce groups are miss/dead dominated (live rays
    # collapse across bounces), so most picked units touch 1-2 of the 8
    # sub-groups — the ungated kernel paid the full (4*LPU, GROUP) matmul
    # output for them regardless. Bitwise identical: skipped sub-groups
    # can only ever contribute non-winning hits.
    _subgate = _os.environ.get("RTMM_SUBGATE", "1") != "0"
    # w-form MT acceptance (see pallas_tiled's _wform knob doc).
    _wform = _os.environ.get("RTMM_MT_WFORM", "1") == "1"
    _nodet = _os.environ.get("RTMM_MT_NODET", "1") == "1"
    rv = rv_ref[0, b]                             # (16, GROUP)
    rv_hi = rv.astype(jnp.bfloat16)
    rv_lo = (rv - rv_hi.astype(jnp.float32)).astype(jnp.bfloat16)
    # One K=48 matmul instead of three K=16 passes (per-pass MXU overheads
    # dominate at tiny contraction depth; see pallas_tiled).
    rv_cat = jnp.concatenate([rv_hi, rv_lo, rv_hi], axis=0)   # (48, GROUP)

    # Per-SUB-group box scalars, NS x [omin xyz, omax xyz, reach_min xyz,
    # reach_max xyz, pad] (j-th sub-group owns ray lanes [128j, 128j+128)).
    def bx(j, i):
        return box_ref[0, b, j * 16 + i]

    lane = jax.lax.broadcasted_iota(jnp.int32, (1, 128), 1)
    col = jax.lax.broadcasted_iota(jnp.int32, (1, GROUP), 1)
    smask = [(col >= j * 128) & (col < (j + 1) * 128) for j in range(NS)]

    # Per-ray scene-exit reach bound (once per group): rays that still
    # miss everything contribute their slab exit through the inflated
    # scene AABB (box tail scalars) instead of +inf to the per-sub worst
    # bound — without it a sub with one miss ray never prunes anything
    # (PERF.md: miss-dominated bounces kept worst = +inf forever). rv
    # rows: [d(3), o x d(3), o(3), 1]; t is o-relative and directions are
    # unit length, so exit is directly comparable with best_t. Dead lanes
    # carry bt = 0 and never read the miss branch.
    def _safe(dk):
        tiny = jnp.float32(1e-12)
        return jnp.where(jnp.abs(dk) < tiny,
                         jnp.where(dk >= 0.0, tiny, -tiny), dk)

    e_row = None
    for k in range(3):
        dk = _safe(rv[k:k + 1])
        ok_ = rv[6 + k:7 + k]
        e0 = (box_ref[0, b, NS * 16 + k] - ok_) / dk
        e1 = (box_ref[0, b, NS * 16 + 3 + k] - ok_) / dk
        ek = jnp.maximum(e0, e1)
        e_row = ek if e_row is None else jnp.minimum(e_row, ek)

    def cmeta_dma(slot, ci):
        return pltpu.make_async_copy(
            meta_hbm.at[ccand_ref[0, b, ci]], meta_buf.at[b, slot],
            msem.at[b, slot])

    def unit_dmas(slot, unit):
        if compressed:
            # One grid-record DMA per unit (2-3 KiB vs 16 KiB of q16 +
            # normal table); q16 AND normals are derived in-kernel.
            return (pltpu.make_async_copy(q_hbm.at[unit], q_buf.at[slot],
                                          usem.at[slot, 0]),)
        return (
            pltpu.make_async_copy(q_hbm.at[unit], q_buf.at[slot],
                                  usem.at[slot, 0]),
            pltpu.make_async_copy(nrm_hbm.at[unit], nrm_buf.at[slot],
                                  usem.at[slot, 1]),
        )

    def worst_subs():
        """Per-sub-group worst-case reach: hits contribute their t, rays
        that still miss contribute their scene-exit bound (they cannot
        find a hit beyond it); dead lanes carry bt=0 so they never
        block."""
        bt = bt_scr[...]
        v = jnp.where(bt < 1e30, bt, e_row)
        return tuple(jnp.max(jnp.where(smask[j], v, 0.0))
                     for j in range(NS))

    def process_unit(uslot, elig=None):
        """Fold one unit's MT hits into the bt_scr/bn_scr running best.
        elig (under _subgate): one scalar bool per 128-lane sub-group —
        the matmul/epilogue/select stage runs only on eligible lanes."""
        if compressed:
            q, nrm_d = _derive_q16_unit(
                q_buf[uslot], None if indexed else nrm_hbm[...], lpu,
                indexed)
        else:
            q = q_buf[uslot]                      # (16, 4*LPU)
        if _wform:
            # Fifth numerator block w = det - u - v, built on the q
            # columns BEFORE the matmul; accept on min(u, v, w) >= -eps
            # below — same w-form acceptance as the tiled kernel
            # (pallas_tiled, the _wform knob doc): drops two compares,
            # an add and an and per (LPU, nl) epilogue at the cost of
            # MXU rows that hide under the VPU.
            q = jnp.concatenate(
                [q, (q[:, 0 * lpu:1 * lpu] - q[:, 1 * lpu:2 * lpu]
                     - q[:, 2 * lpu:3 * lpu])], axis=1)
        q_hi = q.astype(jnp.bfloat16)
        q_lo = (q - q_hi.astype(jnp.float32)).astype(jnp.bfloat16)
        q_cat = jnp.concatenate([q_hi, q_hi, q_lo], axis=0)   # (48, 4*LPU)
        # hi/lo normal split: two accumulated K=LPU one-hot matmuls (each
        # gather exact, n_hi + n_lo rebuilds f32 exactly) instead of one
        # fused K=2*LPU — drops the per-step oh_cat copy (lax.cond-gating
        # this measured slower: the cond's carry copies cost more).
        nrm_v = nrm_d if compressed else nrm_buf[uslot][:, :lpu]
        n_hi = nrm_v.astype(jnp.bfloat16)
        n_lo = (nrm_v - n_hi.astype(jnp.float32)).astype(jnp.bfloat16)

        def mt_lanes(lo, nl):
            hi_l = lo + nl
            out = jax.lax.dot_general(
                q_cat, rv_cat[:, lo:hi_l],
                dimension_numbers=(((0,), (0,)), ((), ())),
                preferred_element_type=jnp.float32)
            det = out[0 * lpu:1 * lpu]
            u_num = out[1 * lpu:2 * lpu]
            v_num = out[2 * lpu:3 * lpu]
            tn = out[3 * lpu:4 * lpu]
            # Unguarded reciprocal: det == 0 lanes yield inf/NaN
            # quotients whose two-sided window compares are all False —
            # which also makes the |det| >= EPS guard numerically
            # redundant (dropped under RTMM_MT_NODET, default ON; see
            # pallas_tiled's _nodet doc).
            inv = 1.0 / det
            u = u_num * inv
            v = v_num * inv
            t = tn * inv                          # (LPU, nl)
            # Upper t-window POST-reduce (a row op on the winner — the
            # min picks the smallest accepted t, so clipping larger
            # candidates never changes it): two fewer (LPU, nl) passes.
            # +inf t from a det==0 lane loses every min vs the 1e30
            # sentinel; -inf fails t_min; NaN fails both compares.
            if _wform:
                ok = ((jnp.minimum(jnp.minimum(u, v),
                                   out[4 * lpu:5 * lpu] * inv)
                       >= -MT_UV_EPS) & (t >= t_min))
            else:
                ok = ((u >= -MT_UV_EPS) & (u <= 1.0 + MT_UV_EPS)
                      & (v >= -MT_UV_EPS) & (u + v <= 1.0 + MT_UV_EPS)
                      & (t >= t_min))
            if not _nodet:
                ok &= jnp.abs(det) >= MT_DET_EPS
            t = jnp.where(ok, t, 1e30)
            tb = t.min(axis=0, keepdims=True)     # (1, nl)
            tb = jnp.where(tb <= t_max, tb, 1e30)
            # One-hot without & ok: invalid leaves hold t == 1e30 and an
            # all-miss lane's tb == 1e30 never wins the strict take.
            oh_b = (t <= tb).astype(jnp.bfloat16)

            def gath(n):
                return jax.lax.dot_general(
                    n, oh_b, dimension_numbers=(((1,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32)

            nsel = gath(n_hi) + gath(n_lo)
            bt_cur = bt_scr[:, lo:hi_l]
            take = tb < bt_cur
            bt_scr[:, lo:hi_l] = jnp.where(take, tb, bt_cur)
            bn_scr[:, lo:hi_l] = jnp.where(take, nsel,
                                           bn_scr[:, lo:hi_l])

        if elig is None:
            mt_lanes(0, GROUP)
        else:
            for j in range(NS):
                @pl.when(elig[j])
                def _(j=j):
                    mt_lanes(j * 128, 128)

    def cluster_body(carry):
        ci, worsts = carry
        cslot = jax.lax.rem(ci, 2)

        @pl.when(ci + 1 < ccnt)
        def _():
            cmeta_dma(jax.lax.rem(ci + 1, 2), ci + 1).start()

        cmeta_dma(cslot, ci).wait()
        meta = meta_buf[b, cslot]                 # (8, 128)
        cl = ccand_ref[0, b, ci]

        mnx, mny, mnz = meta[0:1], meta[1:2], meta[2:3]
        mxx, mxy, mxz = meta[3:4], meta[4:5], meta[5:6]
        valid = meta[6:7] > 0.0
        # Per-sub-group reach overlap + conservative entry distance: a
        # unit is a candidate only for sub-groups whose reach box touches
        # it AND whose own worst hit its entry gap could still beat
        # (directions are unit length, so gap(origin box, unit AABB) is a
        # lower bound on any sub ray's t into the unit). The whole-group
        # union box spans most of the scene for incoherent bounce rays;
        # the 128-lane boxes are what makes the cull bite.
        insides = []
        dists = []
        for j in range(NS):
            inside_j = valid
            inside_j &= (mnx <= bx(j, 9)) & (mxx >= bx(j, 6))
            inside_j &= (mny <= bx(j, 10)) & (mxy >= bx(j, 7))
            inside_j &= (mnz <= bx(j, 11)) & (mxz >= bx(j, 8))
            dx = jnp.maximum(jnp.maximum(mnx - bx(j, 3), bx(j, 0) - mxx),
                             0.0)
            dy = jnp.maximum(jnp.maximum(mny - bx(j, 4), bx(j, 1) - mxy),
                             0.0)
            dz = jnp.maximum(jnp.maximum(mnz - bx(j, 5), bx(j, 2) - mxz),
                             0.0)
            insides.append(inside_j)
            dists.append(jnp.sqrt(dx * dx + dy * dy + dz * dz))
        inf = jnp.float32(jnp.inf)

        def elig_key(ws, removed):
            """Nearest-eligible distance per unit lane (+inf = ineligible
            or removed; `removed` is a float row, 0 = present, inf =
            consumed — Mosaic can't carry boolean vectors)."""
            k = inf + jnp.zeros((1, 128), jnp.float32)
            for j in range(NS):
                kj = jnp.where(insides[j] & (dists[j] <= ws[j]),
                               dists[j], inf)
                k = jnp.minimum(k, kj)
            return k + removed

        def first(key):
            kmin = jnp.min(key)
            return jnp.min(jnp.where((key <= kmin) & (key < inf), lane, 128))

        # Two-deep unit DMA pipeline (3-slot ring), as in pallas_tiled.
        removed0 = jnp.zeros((1, 128), jnp.float32)
        key0 = elig_key(worsts, removed0)
        u0 = first(key0)
        removed0 = jnp.where(lane == u0, inf, removed0)
        u1 = first(key0 + removed0)
        removed0 = jnp.where(lane == u1, inf, removed0)

        @pl.when(u0 < 128)
        def _():
            for d in unit_dmas(0, cl * UPC + u0):
                d.start()

        @pl.when(u1 < 128)
        def _():
            for d in unit_dmas(1, cl * UPC + u1):
                d.start()

        def unit_body(st):
            u, n1, uslot, removed, ws = st
            n2 = first(elig_key(ws, removed))
            removed = jnp.where(lane == n2, inf, removed)

            @pl.when(n2 < 128)
            def _():
                slot2 = jax.lax.rem(uslot + 2, 3)
                for d in unit_dmas(slot2, cl * UPC + n2):
                    d.start()

            # The DMA wait is unconditional even when gating skips every
            # sub-group (the pick pipeline started it two iterations ago;
            # an un-awaited DMA leaks its semaphore device-wide).
            for d in unit_dmas(uslot, cl * UPC + u):
                d.wait()

            if _subgate:
                # Per-sub-group eligibility of THIS unit under the
                # current bounds, extracted at its lane (ws is monotone
                # nonincreasing, so this is conservative wrt the pick).
                # All NS bits ride ONE weighted one-hot reduction (each
                # vector->scalar move is a pipeline sync).
                ohf = (lane == u).astype(jnp.float32)
                bits = jnp.zeros((1, 128), jnp.float32)
                for j in range(NS):
                    bits += jnp.where(insides[j] & (dists[j] <= ws[j]),
                                      jnp.float32(1 << j), 0.0)
                bi = jnp.sum(bits * ohf).astype(jnp.int32)
                elig = tuple(jax.lax.bitwise_and(bi, 1 << j) > 0
                             for j in range(NS))
                anyp = bi > 0

                @pl.when(anyp)
                def _():
                    process_unit(uslot, elig=elig)
            else:
                process_unit(uslot)
            ws = worst_subs()
            return (n1, n2, jax.lax.rem(uslot + 1, 3), removed, ws)

        def unit_cond(st):
            return st[0] < 128

        _, _, _, _, worsts = jax.lax.while_loop(
            unit_cond, unit_body,
            (u0, u1, jnp.int32(0), removed0, worsts))
        return ci + 1, worsts

    def cluster_cond(carry):
        ci, worsts = carry
        wmax = worsts[0]
        for j in range(1, NS):
            wmax = jnp.maximum(wmax, worsts[j])
        cidx = jnp.minimum(ci, centry_ref.shape[2] - 1)
        return (ci < ccnt) & (wmax >= centry_ref[0, b, cidx])

    bt_scr[...] = t_in[0, b].reshape(1, GROUP)
    bn_scr[...] = n_in[0, b]                      # (8, GROUP)
    c_final, _ = jax.lax.while_loop(
        cluster_cond, cluster_body, (jnp.int32(0), worst_subs()))

    @pl.when(c_final < ccnt)
    def _():
        cmeta_dma(jax.lax.rem(c_final, 2), c_final).wait()

    t_out[0, b] = bt_scr[...][0]
    n_out[0, b] = bn_scr[...]


def _grouped_cluster_window(scene: DeviceScene, omin, omax, remaining,
                            kc: int):
    """Per-group cluster window: nearest kc remaining clusters by
    origin-box gap, reach-overlap already folded into `remaining`."""
    g, n_cl = remaining.shape
    gap = jnp.maximum(
        jnp.maximum(scene.cluster_aabb_min[None] - omax[:, None, :],
                    omin[:, None, :] - scene.cluster_aabb_max[None]), 0.0)
    dist = jnp.linalg.norm(gap, axis=-1)                      # (g, C)
    key = jnp.where(remaining, -dist, -jnp.inf)
    negd, cidx = jax.lax.top_k(key, kc)
    sel = negd > -jnp.inf
    centry = jnp.where(sel, -negd, jnp.inf)
    iota = jax.lax.broadcasted_iota(jnp.int32, (g, kc, n_cl), 2)
    taken = ((iota == cidx[..., None]) & sel[..., None]).any(axis=1)
    new_remaining = remaining & ~taken
    next_bound = jnp.min(jnp.where(new_remaining, dist, jnp.inf), axis=1)
    return (cidx.astype(jnp.int32), sel.sum(axis=1).astype(jnp.int32),
            centry.astype(jnp.float32), new_remaining, next_bound)


def trace_sorted(scene: DeviceScene, o: jax.Array, d: jax.Array,
                 live: jax.Array, cfg: RenderConfig,
                 interpret: bool | None = None,
                 groups_per_block: int = 8):
    """Trace pre-grouped rays through the in-kernel cluster walk.

    o/d: (g, GROUP, 3); live: (g, GROUP). The caller owns the grouping
    (see grouped.trace_sorted). Returns (best_t (g, GROUP) with BIG =
    miss, best_n (g, GROUP, 3) unnormalized, windows scalar int32).
    """
    if interpret is None:
        interpret = jax.devices()[0].platform == "cpu"
    g = o.shape[0]

    t_max = jnp.float32(cfg.t_max)
    # Per-SUB-group (128 sorted lanes) origin/reach boxes — the kernel
    # culls units per sub-group; whole-group boxes only feed the
    # cluster-window build below.
    # Per-ray reach cap: a ray cannot find a hit beyond its slab EXIT
    # through the inflated scene AABB (tiled.scene_exit_aabb), so the
    # reach segment is o -> o + min(t_max, exit) * d instead of the full
    # t_max sweep. For miss-heavy bounces (most secondary rays), rays
    # pointing away from the scene collapse to degenerate segments, and
    # the reach boxes / cluster windows / per-sub unit culls all tighten.
    from . import tiled as _tiled
    aabb6 = _tiled.scene_exit_aabb(scene)                     # (6,)
    tiny = jnp.float32(1e-12)
    dsafe = jnp.where(jnp.abs(d) < tiny,
                      jnp.where(d >= 0.0, tiny, -tiny), d)
    ex0 = (aabb6[0:3] - o) / dsafe
    ex1 = (aabb6[3:6] - o) / dsafe
    exit_t = jnp.clip(jnp.maximum(ex0, ex1).min(-1), 0.0, t_max)
    end = o + exit_t[..., None] * d                           # (g, GROUP, 3)

    os = o.reshape(g, NS, 128, 3)
    es = end.reshape(g, NS, 128, 3)
    ls = live.reshape(g, NS, 128, 1)
    omin_s = jnp.where(ls, os, BIG).min(axis=2)               # (g, NS, 3)
    omax_s = jnp.where(ls, os, -BIG).max(axis=2)
    reach_min_s = jnp.minimum(omin_s, jnp.where(ls, es, BIG).min(axis=2))
    reach_max_s = jnp.maximum(omax_s, jnp.where(ls, es, -BIG).max(axis=2))
    omin = omin_s.min(axis=1)                                 # (g, 3)
    omax = omax_s.max(axis=1)
    reach_min = reach_min_s.min(axis=1)
    reach_max = reach_max_s.max(axis=1)
    any_live = live.any(axis=1)
    cl_hit = ((reach_min[:, None, :] <= scene.cluster_aabb_max[None])
              & (reach_max[:, None, :] >= scene.cluster_aabb_min[None])
              ).all(-1)                                       # (g, C)
    cl_hit &= scene.cluster_valid[None] & any_live[:, None]

    # Ray matrix rows [d(3), o x d(3), o(3), 1, pad(6)] (scene.unit_q16).
    m = jnp.cross(o, d)
    rv = jnp.concatenate(
        [d, m, o, jnp.ones((g, GROUP, 1), jnp.float32),
         jnp.zeros((g, GROUP, 6), jnp.float32)], axis=-1)
    rv_t = rv.transpose(0, 2, 1)                              # (g, 16, GROUP)
    box = jnp.concatenate(
        [omin_s, omax_s, reach_min_s, reach_max_s,
         jnp.zeros((g, NS, 4), jnp.float32)],
        axis=2).reshape(g, NS * 16)                           # (g, NS*16)
    # Tail block: the 6 inflated scene-AABB scalars (the kernel derives
    # each ray's exit-t reach bound from them + its o/d rows), pad to 16.
    box = jnp.concatenate(
        [box, jnp.broadcast_to(aabb6, (g, 6)),
         jnp.zeros((g, 10), jnp.float32)], axis=1)            # (g, NS*16+16)

    kc = max(1, min(cfg.kernel_clusters_per_window, scene.num_clusters))
    # Dead lanes start "hit at 0" so they never block early exit; their
    # outputs are masked below.
    init_t = jnp.where(live, BIG, 0.0)
    init_n = jnp.zeros((g, 8, GROUP), jnp.float32)

    def one_window(ccand, ccount, centry, best_t, best_n):
        return _launch(scene, rv_t, box, ccand, ccount, centry,
                       best_t, best_n, cfg, interpret, groups_per_block)

    def cond(st):
        return st[0].any()

    def body(st):
        active, remaining, best_t, best_n, windows = st
        ccand, ccount, centry, remaining, bound = _grouped_cluster_window(
            scene, omin, omax, remaining, kc)
        best_t, best_n = one_window(ccand, ccount, centry, best_t, best_n)
        # Miss rays contribute their scene-exit reach (dead lanes carry
        # best_t = 0), so beyond-reach windows are skipped.
        worst = jnp.max(jnp.where(best_t < BIG, best_t, exit_t), axis=1)
        active = remaining.any(axis=1) & (worst >= bound)
        remaining &= active[:, None]
        return (active, remaining, best_t, best_n,
                windows + active.sum(dtype=jnp.int32))

    active0 = cl_hit.any(axis=1)
    _, _, best_t, best_n, windows = jax.lax.while_loop(
        cond, body, (active0, cl_hit & active0[:, None], init_t, init_n,
                     jnp.int32(0)))

    return best_t, best_n[:, 0:3].transpose(0, 2, 1), windows


def _launch(scene, rv_t, box, ccand, ccount, centry, t_in, n_in, cfg,
            interpret, groups_per_block):
    g = rv_t.shape[0]
    lpu = scene.leaves_per_unit
    compressed = scene.compressed
    npad = 128 if compressed else scene.unit_nrm_pad.shape[2]
    kc = ccand.shape[1]
    gb = groups_per_block
    pad = (-g) % gb
    if pad:
        rv_t = jnp.pad(rv_t, ((0, pad), (0, 0), (0, 0)))
        box = jnp.pad(box, ((0, pad), (0, 0)))
        ccand = jnp.pad(ccand, ((0, pad), (0, 0)))
        ccount = jnp.pad(ccount, ((0, pad),))
        centry = jnp.pad(centry, ((0, pad), (0, 0)))
        t_in = jnp.pad(t_in, ((0, pad), (0, 0)))
        n_in = jnp.pad(n_in, ((0, pad), (0, 0), (0, 0)))
    nb = (g + pad) // gb

    # Shared-topology indexed scenes (scene.unit_gmat) take the gmat
    # gather path — see pallas_tiled.trace_pallas.
    kidx = compressed and scene.indexed and scene.unit_gmat is None
    kernel = functools.partial(_kernel, lpu=lpu, npad=npad,
                               t_min=cfg.t_min, t_max=cfg.t_max,
                               groups_per_block=gb,
                               grid_su=(scene.sub_level if compressed
                                        else None),
                               indexed=kidx)
    out_shape = (
        jax.ShapeDtypeStruct((nb, gb, GROUP), jnp.float32),
        jax.ShapeDtypeStruct((nb, gb, 8, GROUP), jnp.float32),
    )
    in_specs = [
        pl.BlockSpec((1, gb, kc), lambda i: (i, 0, 0),
                     memory_space=pltpu.SMEM),
        pl.BlockSpec((1, gb, 1), lambda i: (i, 0, 0),
                     memory_space=pltpu.SMEM),
        pl.BlockSpec((1, gb, kc), lambda i: (i, 0, 0),
                     memory_space=pltpu.SMEM),
        pl.BlockSpec((1, gb, NS * 16 + 16), lambda i: (i, 0, 0),
                     memory_space=pltpu.SMEM),
        pl.BlockSpec((1, gb, 16, GROUP), lambda i: (i, 0, 0, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((1, gb, GROUP), lambda i: (i, 0, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((1, gb, 8, GROUP), lambda i: (i, 0, 0, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec(memory_space=pl.ANY),
        pl.BlockSpec(memory_space=pl.ANY),
    ]
    if compressed:
        from . import compressed as comp
        # Slot 3 of the tail carries the shared gather matrix as a
        # whole-array VMEM block (uniform or single-class topology), or a
        # dummy for per-unit-topology indexed records (each record holds
        # its own corner indices).
        if kidx:
            gmat = jnp.zeros((8, 128), jnp.float32)
        elif scene.unit_gmat is not None:
            gmat = scene.unit_gmat
        else:
            gmat = jnp.asarray(comp.leaf_gather_matrix(scene.sub_level))
        in_specs.append(pl.BlockSpec(gmat.shape, lambda i: (0, 0),
                                     memory_space=pltpu.VMEM))
        q_tail = scene.unit_grid
        nrm_tail = gmat
        grows = comp.IDX_ROWS if scene.indexed else comp.GRID_ROWS
        q_scratch = pltpu.VMEM((3, grows, comp.GRID_LANES), jnp.float32)
    else:
        in_specs.append(pl.BlockSpec(memory_space=pl.ANY))
        q_tail = scene.unit_q16
        nrm_tail = scene.unit_nrm_pad
        q_scratch = pltpu.VMEM((3, 16, 4 * lpu), jnp.float32)
    out_specs = (
        pl.BlockSpec((1, gb, GROUP), lambda i: (i, 0, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((1, gb, 8, GROUP), lambda i: (i, 0, 0, 0),
                     memory_space=pltpu.VMEM),
    )
    t, nrm = pl.pallas_call(
        kernel,
        grid=(nb,),
        in_specs=in_specs,
        out_specs=out_specs,
        out_shape=out_shape,
        scratch_shapes=[
            pltpu.VMEM((gb, 2, 8, 128), jnp.float32),
            q_scratch,
            pltpu.VMEM((3, 8, npad), jnp.float32),
            pltpu.SemaphoreType.DMA((gb, 2)),
            pltpu.SemaphoreType.DMA((3, 2)),
            # Running best t/normal rows: in-place refs so the sub-group
            # gated MT stage can pl.when-skip ineligible lanes (a
            # while-carry would copy 36 KB per unit; see pallas_tiled).
            pltpu.VMEM((1, GROUP), jnp.float32),
            pltpu.VMEM((8, GROUP), jnp.float32),
        ],
        interpret=interpret,
    )(ccand.reshape(nb, gb, kc), ccount.reshape(nb, gb, 1),
      centry.reshape(nb, gb, kc), box.reshape(nb, gb, NS * 16 + 16),
      rv_t.reshape(nb, gb, 16, GROUP),
      t_in.reshape(nb, gb, GROUP), n_in.reshape(nb, gb, 8, GROUP),
      scene.cluster_unit_meta, q_tail, nrm_tail)
    return (t.reshape(-1, GROUP)[:g], nrm.reshape(-1, 8, GROUP)[:g])
