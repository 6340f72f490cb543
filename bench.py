"""Benchmark driver: primary-ray throughput on the flagship config.

Config 3 of BASELINE.json: full micro-mesh asset at 1080p, micro-mesh
(direct traversal) mode, closest-hit shading + miss. Prints ONE JSON line:
  {"metric": ..., "value": N, "unit": "Mrays/s", "vs_baseline": N}
vs_baseline is measured against the 100 Mrays/s/chip north-star target
(BASELINE.md — the reference publishes no numbers of its own).
"""
from __future__ import annotations

import json
import time

import numpy as np


def main() -> None:
    import jax

    from rtmm_tpu.config import RenderConfig
    from rtmm_tpu.models import procedural, scene as scene_mod
    from rtmm_tpu.render.renderer import Renderer
    from rtmm_tpu.utils import camera

    width, height = 1920, 1080
    cfg = RenderConfig(width=width, height=height)

    # Subdivision-level-3 closed surface (the north-star workload class):
    # 320 base triangles x 64 micro-triangles = 20480 micro-triangles.
    mesh = procedural.make_icosphere(subdivisions=2, level=3, amplitude=0.12)
    scene = scene_mod.build_device_scene(mesh)

    tb = camera.Trackball()
    tb.set_camera([0.0, 0.0, 0.0],
                  [np.radians(-30.0), np.radians(25.0), 0.0], 3.0)
    ivp = camera.inv_view_proj(tb, width, height)

    renderer = Renderer(scene, cfg)
    # Warmup / compile (u8 path: on-device quantization like the reference's
    # R8G8B8A8_UNORM output).
    renderer.render_u8(ivp)

    times = []
    for _ in range(8):
        t0 = time.perf_counter()
        renderer.render_u8(ivp)
        times.append(time.perf_counter() - t0)
    dt = float(np.median(times))
    mrays = width * height / dt / 1e6

    print(json.dumps({
        "metric": "primary_rays_1080p_subdiv3_micromesh",
        "value": round(mrays, 2),
        "unit": "Mrays/s",
        "vs_baseline": round(mrays / 100.0, 3),
    }))


if __name__ == "__main__":
    main()
