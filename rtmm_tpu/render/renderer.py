"""Frame renderer: raygen -> wavefront trace -> shade, fully jitted.

Equivalent of the reference per-frame hot loop (Application::update,
src/application.cpp:200-242): there, one DispatchRays call renders the frame
into a UAV texture which is copied to the swapchain. Here one jitted XLA
program maps the pixel grid through the wavefront pipeline in fixed-size ray
chunks (lax.map keeps peak memory bounded regardless of resolution) and
returns the (H, W, 3) framebuffer. The only per-frame host->device transfer
is the 4x4 inverse view-projection matrix (application.cpp:204-205).
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

from ..config import RenderConfig
from ..models.scene import DeviceScene
# NOTE: pipeline modules must be imported at module scope. A lazy import
# inside the traced render function executes the target module's top-level
# jnp statements *under the trace*, leaking a tracer into module globals;
# later traces then capture it as a stale constant and the compiled
# executable's buffer count mismatches at dispatch.
from ..ops import pallas_tiled, raygen, shading, tiled, traversal


def render_image(scene: DeviceScene, inv_view_proj: jax.Array,
                 cfg: RenderConfig) -> jax.Array:
    """Render one frame. Returns (H, W, 3) float32 in [0, 1].

    Pipeline selection: "ray" is the per-ray wavefront reference
    implementation; "tile"/"pallas" are the tiled production paths (see
    ops/tiled.py); "auto" picks pallas on TPU when the scene fits VMEM,
    else the tiled XLA path.
    """
    pipeline = _resolve_pipeline(cfg, scene)
    if pipeline == "tile":
        return tiled.render_tiled(scene, inv_view_proj, cfg)
    if pipeline == "pallas":
        return pallas_tiled.render_pallas(scene, inv_view_proj, cfg)
    height, width = cfg.height, cfg.width
    origins, directions = raygen.generate_rays(inv_view_proj, width, height)

    total = height * width
    chunk = _pick_chunk(cfg, scene)
    padded = ((total + chunk - 1) // chunk) * chunk
    pad = padded - total
    origins = jnp.pad(origins, ((0, pad), (0, 0)))
    directions = jnp.pad(directions, ((0, pad), (0, 0)),
                         constant_values=1.0)

    def per_chunk(args):
        o, d = args
        t, nrm, hit = traversal.trace(scene, o, d, cfg)
        return shading.shade_or_miss(hit, nrm, -d, cfg)

    colors = jax.lax.map(per_chunk,
                         (origins.reshape(-1, chunk, 3),
                          directions.reshape(-1, chunk, 3)))
    return colors.reshape(-1, 3)[:total].reshape(height, width, 3)


def _resolve_pipeline(cfg: RenderConfig, scene: DeviceScene) -> str:
    if cfg.pipeline != "auto":
        return cfg.pipeline
    # The Pallas kernel streams candidate tables from HBM (no scene-size
    # constraint); on CPU it would run interpreted (slow), so the XLA tiled
    # path is the CPU default.
    try:
        on_tpu = jax.devices()[0].platform != "cpu"
    except Exception:
        on_tpu = False
    return "pallas" if on_tpu else "tile"


def _pick_chunk(cfg: RenderConfig, scene: DeviceScene) -> int:
    """Scale the ray chunk down for deep hierarchies to bound peak memory."""
    chunk = cfg.ray_chunk >> (2 * max(scene.max_level - 3, 0))
    return max(min(chunk, cfg.height * cfg.width), 256)


class Renderer:
    """Owns the compiled render pipeline for one scene shape class.

    Analog of Application's RayTraceShader setup (src/application.cpp:113-197):
    construction "builds the pipeline" (traces + compiles on first call);
    render() is the per-frame path.
    """

    def __init__(self, scene: DeviceScene, cfg: RenderConfig | None = None):
        self.scene = scene
        self.cfg = pallas_tiled.resolve_mt_precision(scene,
                                                     cfg or RenderConfig())
        # keep_unused: pipelines use different subsets of the scene arrays;
        # argument pruning has shown executable-cache inconsistencies
        # ("supplied N buffers but compiled program expected M") when scenes
        # that differ only in unused tables share an HLO fingerprint.
        self._fn = jax.jit(
            functools.partial(render_image, cfg=self.cfg), keep_unused=True)
        self._fn_u8 = jax.jit(
            lambda s, m: (jnp.clip(render_image(s, m, self.cfg), 0.0, 1.0)
                          * 255.0 + 0.5).astype(jnp.uint8),
            keep_unused=True)

    def resize(self, width: int, height: int) -> None:
        """Recreate the pipeline for a new framebuffer size — the analog of
        the reference's WM_SIZE path (framework/src/window.cpp:173-182:
        swapchain ResizeBuffers + render-target recreate + new SBT with the
        new dispatch dimensions). Re-jitting compiles a fresh executable
        for the new static shape on first render."""
        import dataclasses

        if (width, height) == (self.cfg.width, self.cfg.height):
            return
        self.__init__(self.scene,
                      dataclasses.replace(self.cfg, width=width,
                                          height=height))

    def render(self, inv_view_proj: np.ndarray) -> jax.Array:
        """Returns the (H, W, 3) float32 framebuffer (device array)."""
        return self._fn(self.scene, jnp.asarray(inv_view_proj, jnp.float32))

    def render_u8(self, inv_view_proj: np.ndarray) -> np.ndarray:
        """Quantized frame, as the reference's R8G8B8A8_UNORM output texture
        (src/application.cpp:82-89). Quantization runs on-device."""
        return np.asarray(self._fn_u8(
            self.scene, jnp.asarray(inv_view_proj, jnp.float32)))


class FramePipeline:
    """Two frames in flight — the GPUState swapchain-pacing analog
    (src/dx_util/GPUState.cpp:115-148 keeps 2 frames in flight and blocks
    on the fence of frame n-2).

    XLA dispatch is asynchronous, so submitting frame n+1 before reading
    frame n overlaps the host-side readback/IO of one frame with the device
    render of the next.
    """

    def __init__(self, renderer: Renderer, depth: int = 2):
        self.renderer = renderer
        self.depth = depth
        self._queue: list = []

    def submit(self, inv_view_proj: np.ndarray):
        """Enqueue a frame; returns the oldest finished frame (as uint8
        ndarray) once the pipeline is full, else None."""
        self._queue.append(self.renderer._fn_u8(
            self.renderer.scene,
            jnp.asarray(inv_view_proj, jnp.float32)))
        if len(self._queue) >= self.depth:
            return np.asarray(self._queue.pop(0))
        return None

    def drain(self):
        """Yield all remaining frames."""
        while self._queue:
            yield np.asarray(self._queue.pop(0))
