"""Path-traced multi-bounce rendering with ray compaction (config 5).

The reference is a primary-ray-only renderer; this extends the same
traversal to a Monte-Carlo path tracer the TPU way:

  * a wavefront bounce loop over dense ray buffers (no recursion);
  * Lambertian surface with the reference's material color, lit by the
    reference's four directional lights plus the miss color as a constant
    environment term;
  * cosine-weighted hemisphere sampling with **pixel-indexed** randoms
    (drawn in raster order per (sample, bounce) and carried through every
    permutation), so the estimator is identical no matter how rays are
    sorted — all engines produce the same image;
  * bounce 0 is camera rays: they are coherent by construction, so they
    ride the PRIMARY pipeline (the tiled/Pallas frustum renderer) instead
    of the grouped engine, and — being deterministic — run ONCE per frame
    with their shading shared by every sample;
  * secondary bounces keep the whole per-ray state (origin, direction,
    throughput, radiance, pixel index, pending randoms) in *sorted order*
    across bounces: each bounce pays ONE multi-operand lax.sort into
    direction-octant/origin-cell groups (dead rays sinking to the back),
    and only the final radiance is un-permuted, once. The old shape
    (sort + unsort inside every trace) paid ~2x the permutation traffic;
  * ALL samples ride ONE merged pipeline of spp * rays lanes: rays from
    different samples landing in the same spatial region share groups,
    so each group's candidate DMA + table derivation serves spp times
    the rays, and per-bounce fixed costs are paid once, not per sample.

Secondary engines: "pallas" = in-kernel cluster walk
(ops/pallas_grouped.py, the TPU production engine; interpret-mode on
CPU); "grouped" = octant-sorted groups + generalized MXU Möller-Trumbore
in XLA; "perray" = the per-ray reference pipeline.
"""
from __future__ import annotations

import dataclasses
import functools

import jax
import jax.numpy as jnp
import numpy as np

from ..config import RenderConfig
from ..models.scene import DeviceScene
from ..ops import (culling, grouped, pallas_grouped, pallas_tiled, raygen,
                   shading, tiled, traversal)

BIG = jnp.float32(1e30)
GROUP = grouped.GROUP


@dataclasses.dataclass(frozen=True)
class PathTraceConfig:
    bounces: int = 3
    samples_per_pixel: int = 4
    seed: int = 0
    ray_chunk: int = 8192
    compaction: bool = True
    # t_max for bounce rays (>= the scene diagonal is lossless: bounce
    # origins lie on scene geometry, so no hit can be farther). PathTracer
    # fills it from the scene bounds; it shrinks the conservative reach
    # boxes of incoherent ray groups from t_max-sized to scene-sized.
    bounce_t_max: float | None = None
    # "pallas": in-kernel cluster-walk groups (ops/pallas_grouped.py, the
    # TPU production engine; interpreted on CPU); "grouped": octant-sorted
    # ray groups + generalized MXU Möller-Trumbore in XLA (ops/grouped.py);
    # "perray": the per-ray reference pipeline. "auto" = pallas on TPU,
    # grouped on CPU.
    engine: str = "auto"


def _direct_light(normal: jax.Array, albedo: jax.Array,
                  cfg: RenderConfig) -> jax.Array:
    """Diffuse direct lighting from the four reference lights
    (closesthit.hlsl:70-81), Lambertian only."""
    lo = jnp.zeros(normal.shape[:-1] + (3,), jnp.float32)
    for ldir, lscale in zip(shading.LIGHT_DIRS, shading.LIGHT_SCALE):
        l = shading._vec3(ldir)
        n_dot_l = jnp.maximum((normal * l).sum(-1), 0.0)
        radiance = cfg.light_intensity * lscale
        lo = lo + albedo * (radiance / np.pi) * n_dot_l[..., None]
    # Reinhard, as the primary renderer does.
    return lo / (lo + 1.0)


def _cosine_dir(u: jax.Array, normal: jax.Array) -> jax.Array:
    """Cosine-weighted hemisphere direction around `normal` from uniform
    u (..., 2). u is drawn pixel-indexed (raster order) and permuted along
    with the ray it belongs to, so the sampled direction of a given pixel
    does not depend on ray ordering."""
    r = jnp.sqrt(u[..., 0])
    phi = 2.0 * np.pi * u[..., 1]
    x = r * jnp.cos(phi)
    y = r * jnp.sin(phi)
    z = jnp.sqrt(jnp.maximum(1.0 - u[..., 0], 0.0))
    # Build an orthonormal basis around the normal.
    up = jnp.where(jnp.abs(normal[..., 2:3]) < 0.9,
                   shading._vec3((0.0, 0.0, 1.0)),
                   shading._vec3((1.0, 0.0, 0.0)))
    t = jnp.cross(up, normal)
    t = t / jnp.maximum(jnp.linalg.norm(t, axis=-1, keepdims=True), 1e-20)
    b = jnp.cross(normal, t)
    return (x[..., None] * t + y[..., None] * b + z[..., None] * normal)


def _cap_schedule(mtotal: int, engine: str, n_bounce: int) -> list[int]:
    """Per-bounce static lane caps of the compacted secondary pipeline
    (entry b-1 = cap applied after bounce b's sort; 0 = no compaction at
    that bounce). Only the group engines compact — the perray reference
    keeps its original shape.

    Live counts COLLAPSE across bounces (config 5 at 512^2 x 2 spp:
    ~80-100k live of the 524k buffer entering bounce 1, a few thousand
    re-hits entering bounce 2), so one static cap leaves bounces >= 2
    paying sorts/launches for a buffer that is almost all dead tail.
    Default: mtotal/4 at bounce 1, then /4 per further bounce (floored
    at 4*GROUP); every slice keeps the lax.cond full-size fallback, so
    an overflowing schedule is a perf knob, never a correctness one.
    RTMM_PT_CAP overrides bounce 1 (0 disables all compaction);
    RTMM_PT_CAPS='a,b,...' overrides the whole schedule."""
    import os
    if engine not in ("pallas", "grouped") or n_bounce < 1:
        return [0] * n_bounce
    env_s = os.environ.get("RTMM_PT_CAPS")
    if env_s:
        caps = [int(x) for x in env_s.split(",")]
        caps += [caps[-1]] * (n_bounce - len(caps))
        caps = caps[:n_bounce]
    else:
        env = os.environ.get("RTMM_PT_CAP")
        c1 = int(env) if env is not None else mtotal // 4
        if c1 <= 0:
            return [0] * n_bounce
        caps = [max(c1 // (4 ** b), 4 * GROUP) for b in range(n_bounce)]
    caps = [(c + GROUP - 1) // GROUP * GROUP if c > 0 else 0
            for c in caps]
    return [c if 0 < c < mtotal else 0 for c in caps]


def _normalize_flip(bn: jax.Array, dirs: jax.Array) -> jax.Array:
    """Normalize an (unnormalized, reference-style) geometric normal and
    flip it toward the incoming ray for bounce bookkeeping."""
    nrm = bn / jnp.maximum(jnp.linalg.norm(bn, axis=-1, keepdims=True),
                           1e-20)
    return jnp.where(((nrm * dirs).sum(-1) > 0.0)[:, None], -nrm, nrm)


def _trace_chunked(scene, origins, directions, cfg, chunk):
    n = origins.shape[0]
    pad = (-n) % chunk
    o = jnp.pad(origins, ((0, pad), (0, 0)))
    d = jnp.pad(directions, ((0, pad), (0, 0)), constant_values=1.0)

    def per_chunk(args):
        return traversal.trace(scene, args[0], args[1], cfg)

    t, nrm, hit = jax.lax.map(
        per_chunk, (o.reshape(-1, chunk, 3), d.reshape(-1, chunk, 3)))
    return (t.reshape(-1)[:n], nrm.reshape(-1, 3)[:n],
            hit.reshape(-1)[:n])


def _trace_primary(scene: DeviceScene, inv_view_proj: jax.Array,
                   cfg: RenderConfig, engine: str):
    """Bounce-0 trace through the primary (tile-frustum) pipeline.

    Camera rays are coherent by construction — exactly what the tiled
    renderer is built for — so tracing them with the grouped secondary-ray
    engine wastes its generality. Returns (t (n,), hit (n,), normal (n, 3)
    unnormalized) in raster order; t is relative to the raygen near-plane
    origins, matching traversal.trace / grouped conventions.
    """
    width, height = cfg.width, cfg.height
    pw, ph = tiled.padded_size(width, height)
    tx, ty = pw // culling.TILE_W, ph // culling.TILE_H
    n_tiles = tx * ty
    tile = culling.TILE_H * culling.TILE_W

    if engine == "pallas":
        interpret = jax.devices()[0].platform == "cpu"
        fi = tiled.build_frame_inputs(scene, inv_view_proj, cfg,
                                      need_q_frame=False)
        raymat_t = fi.raymat.transpose(0, 2, 1)
        frus = tiled.frustum_scalars(fi)
        kc = max(1, min(cfg.kernel_clusters_per_window, scene.num_clusters))
        if scene.num_clusters <= kc:
            # Single window covers the scene: the carry-free raw kernel
            # mode ([t | normal xyz] output, no (tiles, 8, TILE) carry
            # streams) — the primary trace needs t/n, not colors, so the
            # fused mode never applied here.
            cl_dist = culling.aabb_distance(
                fi.apex, scene.cluster_aabb_min, scene.cluster_aabb_max)
            key = jnp.where(fi.cluster_hit, -cl_dist[None, :], -jnp.inf)
            negd, cidx = jax.lax.top_k(key, kc)
            sel = negd > -jnp.inf
            centry = jnp.where(sel, -negd, jnp.inf).astype(jnp.float32)
            out = pallas_tiled.trace_pallas(
                scene, raymat_t, frus, cidx.astype(jnp.int32),
                sel.sum(axis=1).astype(jnp.int32), centry, None, None,
                cfg, interpret=interpret, raw=True)
            best_t = out[:, 0]
            best_n = out[:, 1:4].transpose(0, 2, 1)    # (tiles, TILE, 3)
        else:
            def trace_window(ccand, ccount, centry, bt, bn):
                return pallas_tiled.trace_pallas(
                    scene, raymat_t, frus, ccand, ccount, centry,
                    bt, bn, cfg, interpret=interpret)

            init = (jnp.full((n_tiles, tile), BIG, jnp.float32),
                    jnp.zeros((n_tiles, 8, tile), jnp.float32))
            best_t, rows = tiled.trace_windowed_clusters(
                scene, fi, cfg, trace_window, *init, kc=kc)
            best_n = rows[:, 0:3].transpose(0, 2, 1)   # (tiles, TILE, 3)
    else:
        fi = tiled.build_frame_inputs(scene, inv_view_proj, cfg)
        best_t, best_n = tiled.xla_trace_frame(scene, fi, cfg)

    def from_tiles(x):
        k = x.shape[-1]
        return (x.reshape(ty, tx, culling.TILE_H, culling.TILE_W, k)
                .transpose(0, 2, 1, 3, 4).reshape(ph, pw, k)
                [:height, :width].reshape(-1, k))

    t = from_tiles(best_t[..., None])[:, 0]
    bn = from_tiles(best_n)
    hit = t < BIG
    return jnp.where(hit, t, cfg.t_max), hit, bn


def path_trace(scene: DeviceScene, inv_view_proj: jax.Array,
               cfg: RenderConfig, pt: PathTraceConfig):
    """Returns (image (H, W, 3), stats dict with per-bounce live counts)."""
    height, width = cfg.height, cfg.width
    # Compressed scenes work on every engine: the grouped XLA engine and
    # the grouped Pallas kernel both derive the arbitrary-origin MT table
    # + shading normals per unit from the grid records at trace time
    # (ops/compressed.derive_q16_jnp / pallas_grouped._derive_q16_unit).
    engine = pt.engine
    if engine == "perray" and scene.compressed:
        raise ValueError(
            "the per-ray reference engine walks the hierarchy tables, "
            "which compressed scenes do not build; use the grouped or "
            "pallas engine (both derive the MT tables from grid records)")
    if engine == "auto":
        try:
            on_tpu = jax.devices()[0].platform != "cpu"
        except Exception:
            on_tpu = False
        engine = "pallas" if on_tpu else "grouped"
    o0, d0 = raygen.generate_rays(
        jnp.asarray(inv_view_proj, jnp.float32), width, height)
    n = o0.shape[0]
    n_bounce = pt.bounces
    cfg_bounce = (dataclasses.replace(cfg, t_max=pt.bounce_t_max)
                  if pt.bounce_t_max else cfg)
    albedo = shading._vec3(cfg.mesh_color)
    bg = shading._vec3(cfg.background)
    key0 = jax.random.key(pt.seed)

    # ---- bounce 0: deterministic, shared by every sample ----
    if engine == "perray":
        t0, bn0, hit0 = _trace_chunked(scene, o0, d0, cfg, pt.ray_chunk)
    else:
        t0, hit0, bn0 = _trace_primary(scene, inv_view_proj, cfg, engine)
    nrm0 = _normalize_flip(bn0, d0)
    radiance0 = jnp.where(hit0[:, None], _direct_light(nrm0, albedo, cfg),
                          bg)                          # throughput = 1
    live0 = hit0.sum()

    if n_bounce == 0:
        # Primary-only tracing: no secondary state exists (the bounce loop
        # below indexes rs[0], which would be empty).
        image = radiance0.reshape(height, width, 3)
        return image, {
            "live_rays_per_bounce": live0[None].astype(jnp.float32),
            _overflow_stat_key(engine): jnp.zeros((1,), jnp.int32),
        }

    borigin0 = o0 + t0[:, None] * d0 + 1e-4 * nrm0

    # Pad the per-ray state once to a GROUP multiple (dead pad lanes).
    pad = (-n) % GROUP
    total = n + pad

    def pad_to(x, value=0.0):
        widths = ((0, pad),) + ((0, 0),) * (x.ndim - 1)
        return jnp.pad(x, widths, constant_values=value)

    borigin0p = pad_to(borigin0)
    d0p = pad_to(d0, 1.0)
    nrm0p = pad_to(nrm0)
    hit0p = pad_to(hit0)

    # Hash-drawn randoms (default; RTMM_PT_HASHRAND=0 reverts): each
    # bounce's randoms are drawn at USE time as a stateless hash of
    # (sample key, bounce, original pixel index) — a vectorized per-lane
    # threefry on the carried idx column — instead of pre-drawing
    # raster-order arrays and carrying the not-yet-used ones through
    # every compaction sort (up to 2*(bounces-1) extra 262k-lane sort
    # operands at 512^2). Same determinism property (randoms are a
    # function of the pixel, not the permutation), so all engines still
    # agree pixel-for-pixel; the VALUES differ from the pre-drawn
    # scheme. Measured +2.7% on config 5 once compaction landed (14.08
    # -> 14.46; was neutral pre-compaction when sorts ran full-size).
    import os as _os
    _hashrand = _os.environ.get("RTMM_PT_HASHRAND", "1") == "1"

    def secondary_all(keys):
        """Bounces 1..N for ALL samples in ONE merged pipeline of
        spp * total lanes. Every sample's rays ride the same sorts and
        the same grouped traces: rays from different samples that land in
        the same spatial region share groups, so each group's candidate
        DMA + table derivation serves spp times the rays (the secondary
        trace is the config-5 bottleneck), and the per-bounce fixed costs
        (sort passes, kernel launches) are paid once instead of per
        sample.

        Two exact size cuts keep the per-bounce fixed costs about the
        LIVE rays, not the buffer (the secondary pipeline is
        miss-dominated — most of the spp * total lanes died at bounce 0
        and can never contribute):

        * throughput never rides the sorts: the albedo is scene-constant
          (the reference's single material, closesthit.hlsl:1-9), so
          every lane READ at bounce b holds throughput == albedo**b — a
          per-bounce Python constant, not 3 carried sort operands;
        * after the first secondary sort (which sinks every dead lane to
          the back), the state is SLICED to a static `cap` prefix and
          the whole bounce loop runs on the small buffer; a lax.cond
          falls back to the full-size pipeline when the live count
          overflows the cap, so no ray is ever dropped (RTMM_PT_CAP
          lanes, default spp*total/4 rounded up to a GROUP multiple;
          0 disables). The sliced-off suffix is exactly the sorted dead
          lanes: their radiance is 0 and stays 0, so concatenating it
          back before the final unsort is exact.

        Returns (radiance (n, 3) in raster order SUMMED over
        samples, live counts (N,) summed, overflow counts (N,))."""
        spp = pt.samples_per_pixel
        mtotal = spp * total

        def rand2(b, idxg):
            # Stateless per-(sample, bounce, pixel) draw keyed by the
            # global lane index g = sample * total + pixel.
            kb = jax.random.fold_in(key0, b)
            return jax.vmap(
                lambda g: jax.random.uniform(
                    jax.random.fold_in(
                        jax.random.fold_in(kb, g // total), g % total),
                    (2,)))(idxg)

        def tile_s(x):
            return jnp.tile(x, (spp,) + (1,) * (x.ndim - 1))

        nrm0m = tile_s(nrm0p)
        hit0m = tile_s(hit0p)
        # Pixel-indexed randoms: drawn in raster order per (sample,
        # bounce) event and permuted along with their rays below (or
        # hash-drawn at use time under RTMM_PT_HASHRAND — then nothing
        # rides the sorts). The pre-drawn values are IDENTICAL to the
        # old per-sample pipeline's (same fold_in(keys[s], b) streams).
        if _hashrand:
            rs = None
            d1 = _cosine_dir(rand2(0, jnp.arange(mtotal, dtype=jnp.int32)),
                             nrm0m)
        else:
            rs = [jnp.concatenate(
                [jax.random.uniform(jax.random.fold_in(keys[s], b),
                                    (total, 2)) for s in range(spp)])
                for b in range(n_bounce)]
            d1 = _cosine_dir(rs[0], nrm0m)
        o = tile_s(borigin0p)
        d = jnp.where(hit0m[:, None], d1, tile_s(d0p))
        alive = hit0m
        rad = jnp.zeros((mtotal, 3), jnp.float32)
        idx = jnp.arange(mtotal, dtype=jnp.int32)
        # pend[i] holds the (lanes, 2) randoms for bounce `start + i`
        # (consumed front-to-back; the not-yet-used columns ride every
        # sort so the draw stays pixel-indexed under permutation).
        pend0 = [] if _hashrand else rs[1:]

        def sort_state(bounce, o, d, alive, rad, idx, pend):
            if engine in ("pallas", "grouped"):
                skey = jnp.where(alive, grouped._sort_key(o, d, scene),
                                 grouped.DEAD_KEY)
            else:
                # perray compaction: live rays to the front, stable.
                skey = jnp.where(alive, 0, 1)
            cols = [c for r in pend for c in (r[:, 0], r[:, 1])]
            ops = jax.lax.sort(
                (skey, o[:, 0], o[:, 1], o[:, 2],
                 d[:, 0], d[:, 1], d[:, 2],
                 rad[:, 0], rad[:, 1], rad[:, 2], idx, *cols),
                num_keys=1, is_stable=True)
            o = jnp.stack(ops[1:4], axis=-1)
            d = jnp.stack(ops[4:7], axis=-1)
            rad = jnp.stack(ops[7:10], axis=-1)
            idx = ops[10]
            pend = [jnp.stack(ops[11 + 2 * i:13 + 2 * i], axis=-1)
                    for i in range(len(pend))]
            if engine in ("pallas", "grouped"):
                alive = ops[0] < grouped.DEAD_KEY
            else:
                alive = ops[0] == 0
            return o, d, alive, rad, idx, pend

        caps = _cap_schedule(mtotal, engine, n_bounce)
        do_sort = engine in ("pallas", "grouped") or pt.compaction

        def bounce_from(bounce, o, d, alive, rad, idx, pend):
            """Run bounces `bounce..n_bounce` on a state of ANY static
            lane count (a GROUP multiple): sort (dead lanes sink to the
            back), optionally SLICE to this bounce's static cap (the
            sliced-off suffix is exactly the sorted dead tail — its
            radiance is 0 and can never change, so concatenating it back
            is exact; a lax.cond falls back to the unsliced loop when
            the live count overflows the cap), trace, recurse. Returns
            (rad, idx, live (n_bounce-bounce+1,), ovf (same,)) at the
            CALLER's lane count."""
            if do_sort:
                o, d, alive, rad, idx, pend = sort_state(
                    bounce, o, d, alive, rad, idx, pend)
            cap = caps[bounce - 1]
            if do_sort and 0 < cap < o.shape[0]:
                st = (o, d, alive, rad, idx, pend)

                def compact_fn(st):
                    o, d, alive, rad, idx, pend = st
                    sl = lambda x: x[:cap]
                    rad_c, idx_c, live, ovf = trace_bounce(
                        bounce, sl(o), sl(d), sl(alive), sl(rad),
                        sl(idx), [sl(p) for p in pend])
                    return (jnp.concatenate([rad_c, rad[cap:]]),
                            jnp.concatenate([idx_c, idx[cap:]]),
                            live, ovf)

                def full_fn(st):
                    return trace_bounce(bounce, *st)

                return jax.lax.cond(alive.sum() <= cap,
                                    compact_fn, full_fn, st)
            return trace_bounce(bounce, o, d, alive, rad, idx, pend)

        def trace_bounce(bounce, o, d, alive, rad, idx, pend):
            """Trace ONE bounce at this state's static lane count, fold
            radiance, then recurse into bounce_from(bounce + 1)."""
            # Throughput of every lane read this bounce (see the
            # docstring): albedo**bounce, a compile-time constant.
            tp_b = albedo ** bounce

            if engine == "pallas":
                bt, bn3, overflow = pallas_grouped.trace_sorted(
                    scene, o.reshape(-1, GROUP, 3),
                    d.reshape(-1, GROUP, 3),
                    alive.reshape(-1, GROUP), cfg_bounce)
                bt = bt.reshape(-1)
                bn3 = bn3.reshape(-1, 3)
                hit = alive & (bt < BIG) & (bt > 0.0)
            elif engine == "grouped":
                bt, bn3, overflow = grouped.trace_sorted(
                    scene, o.reshape(-1, GROUP, 3),
                    d.reshape(-1, GROUP, 3),
                    alive.reshape(-1, GROUP), cfg_bounce)
                bt = bt.reshape(-1)
                bn3 = bn3.reshape(-1, 3)
                hit = alive & (bt < BIG) & (bt > 0.0)
            else:
                bt, bn3, hit = _trace_chunked(scene, o, d, cfg_bounce,
                                              pt.ray_chunk)
                hit = hit & alive
                overflow = jnp.int32(0)
            nrm = _normalize_flip(bn3, d)
            escaped = alive & ~hit
            rad = rad + jnp.where(escaped[:, None], tp_b * bg, 0.0)
            direct = _direct_light(nrm, albedo, cfg)
            rad = rad + jnp.where(hit[:, None], tp_b * direct, 0.0)
            alive = hit
            live_b = alive.sum()
            if bounce == n_bounce:
                return (rad, idx, live_b[None].astype(jnp.int32),
                        overflow[None])
            hit_pos = o + jnp.where(hit, bt, 0.0)[:, None] * d
            new_dir = _cosine_dir(
                rand2(bounce, idx) if _hashrand else pend[0], nrm)
            pend = pend if _hashrand else pend[1:]
            o = hit_pos + 1e-4 * nrm
            d = jnp.where(alive[:, None], new_dir, d)
            rad, idx, live_rest, ovf_rest = bounce_from(
                bounce + 1, o, d, alive, rad, idx, pend)
            return (rad, idx,
                    jnp.concatenate([live_b[None].astype(jnp.int32),
                                     live_rest]),
                    jnp.concatenate([overflow[None], ovf_rest]))

        rad, idx, live_counts, overflow_counts = bounce_from(
            1, o, d, alive, rad, idx, pend0)
        # Undo the permutation(s): idx is a permutation of [0, mtotal),
        # so one sort keyed on it restores (sample-major) raster order;
        # the sample reduce then happens in plain blocked layout.
        (_, r0, r1, r2) = jax.lax.sort(
            (idx, rad[:, 0], rad[:, 1], rad[:, 2]), num_keys=1)
        rad = jnp.stack([r0, r1, r2], axis=-1)
        rad = rad.reshape(spp, total, 3)[:, :n].sum(axis=0)
        return rad, live_counts, overflow_counts

    keys = jax.random.split(key0, pt.samples_per_pixel)
    radiance, counts, overflows = secondary_all(keys)
    spp = pt.samples_per_pixel
    image = (radiance0 + radiance / spp).reshape(height, width, 3)
    live = jnp.concatenate(
        [jnp.broadcast_to(live0 * spp, (1,)).astype(jnp.int32), counts])
    stats = {
        "live_rays_per_bounce": live / spp,
        # Per-engine trace-pressure observability (summed over samples;
        # index 0 is bounce 0, which rides the windowed primary pipeline —
        # exact, never capped, so it is always 0). The key names the
        # engine-specific meaning — see _overflow_stat_key.
        _overflow_stat_key(engine): jnp.concatenate(
            [jnp.zeros((1,), jnp.int32), overflows]),
    }
    return image, stats


def _overflow_stat_key(engine: str) -> str:
    """Stats key for each engine's third trace_sorted return value — the
    two engines report DIFFERENT things and must not share a name:

    * "grouped" (ops/grouped.py): ``overflow_groups_per_bounce`` — groups
      whose candidate count exceeded the capped candidate list
      (max_group_candidates); their farthest candidates were dropped, so a
      nonzero value means possible (back-surface) geometry misses.
    * "pallas" (ops/pallas_grouped.py): ``extra_window_passes_per_bounce``
      — cluster windows beyond the first that some group had to consume.
      Nothing is ever truncated on this engine (windows repeat until every
      group is done); the value is a work/occupancy signal only.
    * "perray": exact, uncapped — reports ``overflow_groups_per_bounce``,
      always 0.
    """
    return ("extra_window_passes_per_bounce" if engine == "pallas"
            else "overflow_groups_per_bounce")


class PathTracer:
    def __init__(self, scene: DeviceScene, cfg: RenderConfig | None = None,
                 pt: PathTraceConfig | None = None):
        self.scene = scene
        self.cfg = pallas_tiled.resolve_mt_precision(scene,
                                                     cfg or RenderConfig())
        self.pt = pt or PathTraceConfig()
        if self.pt.bounce_t_max is None:
            lo = np.asarray(scene.cluster_aabb_min)
            hi = np.asarray(scene.cluster_aabb_max)
            valid = np.asarray(scene.cluster_valid)
            diag = float(np.linalg.norm(hi[valid].max(0) - lo[valid].min(0)))
            self.pt = dataclasses.replace(
                self.pt,
                bounce_t_max=min(self.cfg.t_max, diag * 1.05 + 1e-3))
        self._fn = jax.jit(functools.partial(path_trace, cfg=self.cfg,
                                             pt=self.pt))

    def render(self, inv_view_proj: np.ndarray):
        return self._fn(self.scene, jnp.asarray(inv_view_proj, jnp.float32))
