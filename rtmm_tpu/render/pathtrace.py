"""Path-traced multi-bounce rendering with ray compaction (config 5).

The reference is a primary-ray-only renderer; this extends the same
traversal to a Monte-Carlo path tracer the TPU way:

  * a wavefront bounce loop over dense ray buffers (no recursion);
  * Lambertian surface with the reference's material color, lit by the
    reference's four directional lights plus the miss color as a constant
    environment term;
  * cosine-weighted hemisphere sampling (jax.random, counter-based keys:
    deterministic per pixel/bounce);
  * per-bounce ray *compaction*: rays are sorted so live rays cluster at
    the buffer front and dead lanes carry zero throughput — on TPU this
    keeps the trace's candidate search memory-coherent; per-bounce live
    counts are reported as stats.

Secondary bounces are incoherent, so the primary renderer's tile-frustum
path does not apply; the default engine (ops/grouped.py) octant-sorts rays
into groups and runs the generalized arbitrary-origin MXU Möller-Trumbore
per group. The per-ray pipeline (ops/traversal.py) remains available as
the reference engine.
"""
from __future__ import annotations

import dataclasses
import functools

import jax
import jax.numpy as jnp
import numpy as np

from ..config import RenderConfig
from ..models.scene import DeviceScene
from ..ops import grouped, pallas_grouped, raygen, shading, traversal

BIG = jnp.float32(1e30)


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


def _cosine_sample(key: jax.Array, normal: jax.Array) -> jax.Array:
    """Cosine-weighted hemisphere direction around `normal`."""
    u = jax.random.uniform(key, normal.shape[:-1] + (2,))
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


def path_trace(scene: DeviceScene, inv_view_proj: jax.Array,
               cfg: RenderConfig, pt: PathTraceConfig):
    """Returns (image (H, W, 3), stats dict with per-bounce live counts)."""
    height, width = cfg.height, cfg.width
    engine = pt.engine
    if engine == "auto":
        try:
            on_tpu = jax.devices()[0].platform != "cpu"
        except Exception:
            on_tpu = False
        engine = "pallas" if on_tpu else "grouped"
    o0, d0 = raygen.generate_rays(
        jnp.asarray(inv_view_proj, jnp.float32), width, height)
    n = o0.shape[0]
    cfg_bounce = (dataclasses.replace(cfg, t_max=pt.bounce_t_max)
                  if pt.bounce_t_max else cfg)
    albedo = shading._vec3(cfg.mesh_color)
    bg = shading._vec3(cfg.background)
    key0 = jax.random.key(pt.seed)

    def one_sample(key):
        origins, dirs = o0, d0
        order = jnp.arange(n)
        throughput = jnp.ones((n, 3), jnp.float32)
        radiance = jnp.zeros((n, 3), jnp.float32)
        alive = jnp.ones((n,), bool)
        live_counts = []
        overflow_counts = []
        for bounce in range(pt.bounces + 1):
            cfg_b = cfg if bounce == 0 else cfg_bounce
            if engine == "pallas":
                t, nrm, hit, overflow = pallas_grouped.trace_grouped_pallas(
                    scene, origins, dirs, alive, cfg_b)
            elif engine == "grouped":
                t, nrm, hit, overflow = grouped.trace_grouped(
                    scene, origins, dirs, alive, cfg_b)
            else:
                t, nrm, hit = _trace_chunked(scene, origins, dirs, cfg_b,
                                             pt.ray_chunk)
                overflow = jnp.int32(0)
            overflow_counts.append(overflow)
            hit &= alive
            # Flip the (unflipped, reference-style) geometric normal toward
            # the incoming ray for bounce bookkeeping.
            nrm = jnp.where(((nrm * dirs).sum(-1) > 0.0)[:, None],
                            -nrm, nrm)
            # Escaped rays collect the constant environment (miss color).
            escaped = alive & ~hit
            radiance = radiance + jnp.where(
                escaped[:, None], throughput * bg, 0.0)
            # Surface hit: direct lighting x throughput.
            direct = _direct_light(nrm, albedo, cfg)
            radiance = radiance + jnp.where(
                hit[:, None], throughput * direct, 0.0)
            alive = hit
            live_counts.append(alive.sum())
            if bounce == pt.bounces:
                break
            # Next bounce.
            key, sub = jax.random.split(key)
            hit_pos = origins + t[:, None] * dirs
            new_dir = _cosine_sample(sub, nrm)
            origins = hit_pos + 1e-4 * nrm
            dirs = jnp.where(alive[:, None], new_dir, dirs)
            throughput = throughput * jnp.where(
                alive[:, None], albedo, 1.0)
            if pt.compaction and engine == "perray":
                # Sort live rays to the buffer front (stable) so the trace's
                # candidate search touches coherent memory. The grouped
                # engines sort internally (octant + origin cell, dead rays
                # last), so an outer compaction pass would only re-pay the
                # 262k-row permutation cost per bounce.
                perm = jnp.argsort(~alive, stable=True)
                origins = origins[perm]
                dirs = dirs[perm]
                throughput = throughput[perm]
                radiance = radiance[perm]
                alive = alive[perm]
                order = order[perm]
        # Undo the compaction permutation(s).
        inv = jnp.argsort(order)
        return (radiance[inv], jnp.stack(live_counts),
                jnp.stack(overflow_counts))

    keys = jax.random.split(key0, pt.samples_per_pixel)
    radiance = jnp.zeros((n, 3), jnp.float32)
    counts = jnp.zeros((pt.bounces + 1,), jnp.int32)
    overflows = jnp.zeros((pt.bounces + 1,), jnp.int32)
    for k in keys:
        r, c, ov = one_sample(k)
        radiance = radiance + r
        counts = counts + c
        overflows = overflows + ov
    image = (radiance / pt.samples_per_pixel).reshape(height, width, 3)
    stats = {
        "live_rays_per_bounce": counts / pt.samples_per_pixel,
        # Candidate-list saturation observability: groups whose candidate
        # count exceeded the list capacity this bounce (summed over samples).
        # Non-zero means geometry may be culled from some secondary rays.
        "overflow_groups_per_bounce": overflows,
    }
    return image, stats


class PathTracer:
    def __init__(self, scene: DeviceScene, cfg: RenderConfig | None = None,
                 pt: PathTraceConfig | None = None):
        self.scene = scene
        self.cfg = cfg or RenderConfig()
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
