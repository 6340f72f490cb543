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

    def as_dict(self) -> dict:
        return dataclasses.asdict(self)


def collect_frame_stats(scene, inv_view_proj, cfg) -> FrameStats:
    """Render one frame with timing + traversal statistics."""
    from ..ops import tiled as tiled_mod
    from ..render.renderer import render_image

    ivp = jnp.asarray(inv_view_proj, jnp.float32)
    _, _, _, count, _, _ = jax.jit(
        lambda s, m: tiled_mod.build_frame_inputs(s, m, cfg))(scene, ivp)
    count = np.asarray(count)

    fn = jax.jit(lambda s, m: render_image(s, m, cfg))
    jax.block_until_ready(fn(scene, ivp))    # compile
    t0 = time.perf_counter()
    img = fn(scene, ivp)
    jax.block_until_ready(img)
    dt = time.perf_counter() - t0

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
    )


@contextlib.contextmanager
def profiler_trace(logdir: str):
    """jax.profiler trace context (view with TensorBoard / xprof)."""
    jax.profiler.start_trace(logdir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()
