"""Per-frame observability (SURVEY §5: the reference has none — its only
instrumentation was the D3D12 debug layer and eyeballing frames).

Structured per-frame statistics: throughput, hit rate, candidate-list
distribution (the traversal-divergence proxy), plus jax.profiler hooks.
"""
from __future__ import annotations

import contextlib
import dataclasses
import time

import jax
import jax.numpy as jnp
import numpy as np


@dataclasses.dataclass
class FrameStats:
    frame_ms: float
    mrays_per_s: float
    hit_fraction: float
    tiles: int
    candidates_mean: float
    candidates_p90: float
    candidates_max: int
    empty_tiles: int
    traversal_steps_total: int

    def as_dict(self) -> dict:
        return dataclasses.asdict(self)


def traversal_heatmap(scene, inv_view_proj, cfg) -> np.ndarray:
    """(H, W) int32 per-pixel traversal-step counts (SURVEY §5: the
    divergence heatmap the reference lacks) — hierarchy nodes surviving
    pruning plus leaf Möller-Trumbore tests, per ray."""
    from ..ops import raygen, traversal

    ivp = jnp.asarray(inv_view_proj, jnp.float32)
    h, w = cfg.height, cfg.width

    @jax.jit
    def run(s, m):
        o, d = raygen.generate_rays(m, w, h)
        total = h * w
        chunk = min(max(cfg.ray_chunk, 256), total)
        pad = (-total) % chunk
        o = jnp.pad(o, ((0, pad), (0, 0)))
        d = jnp.pad(d, ((0, pad), (0, 0)), constant_values=1.0)

        def per_chunk(args):
            return traversal.trace_with_steps(s, args[0], args[1], cfg)[3]

        steps = jax.lax.map(per_chunk, (o.reshape(-1, chunk, 3),
                                        d.reshape(-1, chunk, 3)))
        return steps.reshape(-1)[:total].reshape(h, w)

    return np.asarray(run(scene, ivp))


def heatmap_to_png(path: str, counts: np.ndarray) -> None:
    """Dump a step-count heatmap as a viridis-ish PNG."""
    from ..io import image

    c = counts.astype(np.float64)
    hi = max(c.max(), 1.0)
    t = (c / hi)[..., None]
    # simple 3-stop gradient: black -> magenta -> yellow
    lo_c = np.array([0.0, 0.0, 0.05])
    mid_c = np.array([0.7, 0.1, 0.6])
    hi_c = np.array([1.0, 0.95, 0.3])
    img = np.where(t < 0.5, lo_c + (mid_c - lo_c) * (t * 2.0),
                   mid_c + (hi_c - mid_c) * ((t - 0.5) * 2.0))
    image.write_png(path, (img * 255.0 + 0.5).astype(np.uint8))


def collect_frame_stats(scene, inv_view_proj, cfg,
                        heatmap: np.ndarray | None = None) -> FrameStats:
    """Render one frame with timing + traversal statistics.

    Pass a precomputed `traversal_heatmap` result to avoid re-running the
    per-ray reference trace (the slowest pipeline) twice per frame."""
    from ..ops import tiled as tiled_mod
    from ..render.renderer import render_image

    ivp = jnp.asarray(inv_view_proj, jnp.float32)
    count = np.asarray(jax.jit(
        lambda s, m: tiled_mod.candidate_counts(s, m, cfg))(scene, ivp))

    fn = jax.jit(lambda s, m: render_image(s, m, cfg))
    jax.block_until_ready(fn(scene, ivp))    # compile
    t0 = time.perf_counter()
    img = fn(scene, ivp)
    jax.block_until_ready(img)
    dt = time.perf_counter() - t0

    steps = (heatmap if heatmap is not None
             else traversal_heatmap(scene, inv_view_proj, cfg))

    img = np.asarray(img)
    bg = np.asarray(cfg.background, np.float32)
    hit_fraction = float((np.abs(img - bg).max(-1) > 1e-5).mean())
    n_rays = cfg.width * cfg.height
    return FrameStats(
        frame_ms=dt * 1e3,
        mrays_per_s=n_rays / dt / 1e6,
        hit_fraction=hit_fraction,
        tiles=int(count.shape[0]),
        candidates_mean=float(count.mean()),
        candidates_p90=float(np.percentile(count, 90)),
        candidates_max=int(count.max()),
        empty_tiles=int((count == 0).sum()),
        traversal_steps_total=int(steps.sum()),
    )


@contextlib.contextmanager
def profiler_trace(logdir: str):
    """jax.profiler trace context (view with TensorBoard / xprof)."""
    jax.profiler.start_trace(logdir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()
