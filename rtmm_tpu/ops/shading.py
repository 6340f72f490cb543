"""Cook-Torrance GGX shading + miss (ports shaders/closesthit.hlsl and
shaders/miss.hlsl).

Four hard-coded directional lights (+Z, +Y, -Z, -Y at intensity 22/11/22/11),
Reinhard tone map, albedo lerp — constants from closesthit.hlsl:1-9, main
loop from closesthit.hlsl:56-116. Pure element-wise math: XLA fuses it into
the trace epilogue; bfloat16-safe but kept f32 to match reference images.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp

from ..config import RenderConfig

PI = 3.14159265359


def _vec3(t) -> jax.Array:
    """3-vector from Python floats as stacked scalar literals.

    jnp.asarray((a, b, c)) captures an ndarray constant in the jaxpr;
    hoisted constants have triggered executable/dispatch buffer-count
    mismatches in JAX's cpp fastpath ("supplied N buffers but compiled
    program expected M"), so constants are built from scalar literals,
    which inline into the HLO.
    """
    return jnp.stack([jnp.float32(t[0]), jnp.float32(t[1]),
                      jnp.float32(t[2])])

LIGHT_DIRS = (
    (0.0, 0.0, 1.0),
    (0.0, 1.0, 0.0),
    (0.0, 0.0, -1.0),
    (0.0, -1.0, 0.0),
)
LIGHT_SCALE = (1.0, 0.5, 1.0, 0.5)   # closesthit.hlsl:74-79


def _distribution_ggx(n_dot_h, roughness):
    a2 = (roughness * roughness) ** 2
    denom = n_dot_h * n_dot_h * (a2 - 1.0) + 1.0
    return a2 / (PI * denom * denom)


def _geometry_schlick_ggx(n_dot, roughness):
    r = roughness + 1.0
    k = (r * r) / 8.0
    return n_dot / (n_dot * (1.0 - k) + k)


def _fresnel_schlick(cos_theta, f0):
    return f0 + (1.0 - f0) * jnp.clip(1.0 - cos_theta, 0.0, 1.0) ** 5


def shade(normal: jax.Array, view: jax.Array,
          cfg: RenderConfig) -> jax.Array:
    """Shade hits. normal/view: (..., 3) -> color (..., 3)."""
    albedo = _vec3(cfg.mesh_color)
    f0 = _vec3((0.04, 0.04, 0.04))
    f0 = f0 + (albedo - f0) * cfg.metallic          # lerp(F0, albedo, metallic)

    n = normal
    v = view
    n_dot_v = jnp.maximum((n * v).sum(-1), 0.0)
    ggx_v = _geometry_schlick_ggx(n_dot_v, cfg.roughness)

    lo = jnp.zeros(n.shape[:-1] + (3,), jnp.float32)
    for ldir, lscale in zip(LIGHT_DIRS, LIGHT_SCALE):
        l = _vec3(ldir)
        h = v + l
        h = h / jnp.maximum(jnp.linalg.norm(h, axis=-1, keepdims=True), 1e-20)
        radiance = _vec3(cfg.light_color) * (cfg.light_intensity * lscale)
        n_dot_l = jnp.maximum((n * l).sum(-1), 0.0)
        ndf = _distribution_ggx(jnp.maximum((n * h).sum(-1), 0.0),
                                cfg.roughness)
        g = ggx_v * _geometry_schlick_ggx(n_dot_l, cfg.roughness)
        f = _fresnel_schlick(jnp.maximum((h * v).sum(-1), 0.0)[..., None], f0)
        k_d = (1.0 - f) * (1.0 - cfg.metallic)
        numerator = (ndf * g)[..., None] * f
        denominator = 4.0 * n_dot_v * n_dot_l + 0.0001
        specular = numerator / denominator[..., None]
        lo = lo + ((k_d * albedo / PI + specular)
                   * radiance * n_dot_l[..., None])

    ambient = albedo * (cfg.ambient_occlusion * cfg.light_intensity * 0.1)
    color = ambient + lo
    color = color / (color + 1.0)                   # Reinhard, closesthit.hlsl:111
    return albedo + (color - albedo) * cfg.shading_weight


def shade_or_miss(hit: jax.Array, normal: jax.Array, view: jax.Array,
                  cfg: RenderConfig) -> jax.Array:
    bg = _vec3(cfg.background)
    color = shade(normal, view, cfg)
    return jnp.where(hit[..., None], color, bg)


def shade_rows(nx, ny, nz, vx, vy, vz, hit, cfg: RenderConfig):
    """Row-major shade_or_miss for the Pallas kernel's fused epilogue.

    All inputs are same-shaped arrays (component rows, e.g. (1, TILE));
    colors come back as (r, g, b) rows. Python-float constants inline as
    scalars — exactly the same math as shade()/shade_or_miss().
    """
    alb = [float(c) for c in cfg.mesh_color]
    f0 = [0.04 + (a - 0.04) * cfg.metallic for a in alb]
    n_dot_v = jnp.maximum(nx * vx + ny * vy + nz * vz, 0.0)
    ggx_v = _geometry_schlick_ggx(n_dot_v, cfg.roughness)

    lo = [jnp.zeros_like(nx) for _ in range(3)]
    for ldir, lscale in zip(LIGHT_DIRS, LIGHT_SCALE):
        lx, ly, lz = (jnp.float32(c) for c in ldir)
        hx, hy, hz = vx + lx, vy + ly, vz + lz
        hnorm = jnp.maximum(jnp.sqrt(hx * hx + hy * hy + hz * hz), 1e-20)
        hx, hy, hz = hx / hnorm, hy / hnorm, hz / hnorm
        n_dot_l = jnp.maximum(nx * lx + ny * ly + nz * lz, 0.0)
        ndf = _distribution_ggx(
            jnp.maximum(nx * hx + ny * hy + nz * hz, 0.0), cfg.roughness)
        g = ggx_v * _geometry_schlick_ggx(n_dot_l, cfg.roughness)
        h_dot_v = jnp.maximum(hx * vx + hy * vy + hz * vz, 0.0)
        fres5 = jnp.clip(1.0 - h_dot_v, 0.0, 1.0) ** 5
        denom = 4.0 * n_dot_v * n_dot_l + 0.0001
        ndf_g = ndf * g
        for c in range(3):
            radiance = (cfg.light_color[c] * cfg.light_intensity * lscale)
            f_c = f0[c] + (1.0 - f0[c]) * fres5
            k_d = (1.0 - f_c) * (1.0 - cfg.metallic)
            spec = ndf_g * f_c / denom
            lo[c] = lo[c] + ((k_d * (alb[c] / PI) + spec)
                             * radiance * n_dot_l)

    out = []
    for c in range(3):
        ambient = alb[c] * (cfg.ambient_occlusion * cfg.light_intensity * 0.1)
        color = ambient + lo[c]
        color = color / (color + 1.0)               # Reinhard
        color = alb[c] + (color - alb[c]) * cfg.shading_weight
        out.append(jnp.where(hit, color, jnp.float32(cfg.background[c])))
    return out
