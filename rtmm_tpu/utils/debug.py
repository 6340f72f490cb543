"""Debug-mode rendering — the sanitizer / D3D12-debug-layer analog.

The reference's only runtime checking was the D3D12 debug layer with
break-on-error (SURVEY §5, src/application.cpp:275-303). The JAX-native
equivalent: render under `checkify` with float (NaN/Inf) and index checks
enabled, so a bad scene table or a numerical blow-up fails loudly with a
location instead of rendering garbage.
"""
from __future__ import annotations

import functools

import jax
from jax.experimental import checkify

from ..config import RenderConfig
from ..models.scene import DeviceScene
from ..render.renderer import render_image


def debug_render(scene: DeviceScene, inv_view_proj, cfg: RenderConfig):
    """Render one frame with NaN/Inf and OOB-index checking.

    Returns the image; raises checkify.JaxRuntimeError with the failing
    check's location if anything is non-finite where it shouldn't be.
    Only the XLA pipelines support checkify; the Pallas kernel is excluded.
    """
    import dataclasses

    pipeline = ("tile" if cfg.pipeline in ("auto", "pallas")
                else cfg.pipeline)
    # debug_guards: guard the production path's intentionally-unguarded
    # Möller-Trumbore reciprocal so float_checks stay silent on clean
    # scenes and fire only on genuine NaN/Inf in the data (see
    # ops/tiled.py::trace_candidate).
    cfg = dataclasses.replace(cfg, pipeline=pipeline, debug_guards=True)

    checked = checkify.checkify(
        functools.partial(render_image, cfg=cfg),
        errors=checkify.float_checks | checkify.index_checks)
    err, img = jax.jit(checked)(scene, jax.numpy.asarray(
        inv_view_proj, jax.numpy.float32))
    err.throw()
    return img
