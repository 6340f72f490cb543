"""Primary-ray generation (port of /root/reference/shaders/raygen.hlsl:12-44).

Per pixel: uv = (idx + 0.5)/size -> NDC in [-1,1] with Y flipped (DX
convention) -> unproject z=0 and z=1 with inverse(view-projection) ->
normalized direction. Runs as one fused XLA computation over the whole
pixel grid; the only per-frame input is the 4x4 matrix (the reference's
single CBV upload, src/application.cpp:204-205).
"""
from __future__ import annotations

import jax
import jax.numpy as jnp


def generate_rays(inv_view_proj: jax.Array, width: int, height: int,
                  render_width: int | None = None,
                  render_height: int | None = None):
    """Returns (origins (H*W, 3), directions (H*W, 3)) in row-major pixel order.

    render_width/height generate a larger (padded) pixel grid while keeping
    the NDC mapping of the logical width/height — padding pixels fall
    outside NDC [-1, 1] and are cropped by the caller.
    """
    rw = render_width or width
    rh = render_height or height
    px = jax.lax.broadcasted_iota(jnp.float32, (rh, rw), 1)
    py = jax.lax.broadcasted_iota(jnp.float32, (rh, rw), 0)
    u = (px + 0.5) / width
    v = (py + 0.5) / height
    ndc_x = u * 2.0 - 1.0
    ndc_y = -(v * 2.0 - 1.0)                      # raygen.hlsl:23

    m = inv_view_proj.astype(jnp.float32)

    def unproject(z):
        # Explicit FMA instead of a matmul: the w component is a catastrophic
        # cancellation (~1e-3 from ~5-magnitude terms) that bf16-accumulating
        # MXU matmuls destroy; VPU float32 keeps it exact.
        p = [m[i, 0] * ndc_x + m[i, 1] * ndc_y + (m[i, 2] * z + m[i, 3])
             for i in range(4)]
        w = p[3]
        return jnp.stack([p[0] / w, p[1] / w, p[2] / w], axis=-1)

    near = unproject(0.0)                          # raygen.hlsl:26
    far = unproject(1.0)                           # raygen.hlsl:27
    d = far - near
    d = d / jnp.linalg.norm(d, axis=-1, keepdims=True)
    return near.reshape(-1, 3), d.reshape(-1, 3)
