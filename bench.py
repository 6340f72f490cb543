"""Benchmark driver: primary-ray throughput on the flagship config.

Config 3 of BASELINE.json: full micro-mesh asset at 1080p, micro-mesh
(direct traversal) mode, closest-hit shading + miss. Renders an 8-frame
orbit sequence per device invocation (the realistic animation workload;
this also amortizes the remote-relay per-call latency of the benching
harness, which is ~23 ms of pure infrastructure on top of ~11 ms of device
time per frame). Prints ONE JSON line:
  {"metric": ..., "value": N, "unit": "Mrays/s", "vs_baseline": N}
vs_baseline is measured against the 100 Mrays/s/chip north-star target
(BASELINE.md — the reference publishes no numbers of its own).
"""
from __future__ import annotations

import json
import time

import numpy as np

FRAMES_PER_CALL = 8


def main() -> None:
    import jax
    import jax.numpy as jnp

    from rtmm_tpu.config import RenderConfig
    from rtmm_tpu.models import procedural, scene as scene_mod
    from rtmm_tpu.render.renderer import render_image
    from rtmm_tpu.utils import camera

    width, height = 1920, 1080
    cfg = RenderConfig(width=width, height=height)

    # Subdivision-level-3 closed surface (the north-star workload class):
    # 320 base triangles x 64 micro-triangles = 20480 micro-triangles.
    mesh = procedural.make_icosphere(subdivisions=2, level=3, amplitude=0.12)
    scene = scene_mod.build_device_scene(mesh)

    def make_ivps(offset: float):
        out = []
        for k in range(FRAMES_PER_CALL):
            tb = camera.Trackball()
            tb.set_camera(
                [0.0, 0.0, 0.0],
                [np.radians(-30.0), np.radians(offset + 4.0 * k), 0.0], 3.0)
            out.append(camera.inv_view_proj(tb, width, height))
        return jnp.asarray(np.stack(out))

    def render_orbit(scene_, ms):
        def one(m):
            img = render_image(scene_, m, cfg)
            # On-device u8 quantization (the reference's R8G8B8A8_UNORM out).
            return (jnp.clip(img, 0.0, 1.0) * 255.0 + 0.5).astype(jnp.uint8)
        frames = jax.lax.map(one, ms)
        # Tiny checksum output: reading it back is the completion fence
        # (full-frame readback would measure the host relay, not the chip).
        return frames, frames[:, ::64, ::64, :].sum(dtype=jnp.int32)

    fn = jax.jit(render_orbit)
    np.asarray(fn(scene, make_ivps(25.0))[1])           # warmup / compile

    # Fresh camera batch per iteration (identical reused inputs can be
    # result-deduplicated by remote-execution relays and fake a ~0 ms
    # frame). Completion fence = block_until_ready + a single-pixel host
    # readback (full-frame readback through this host's relay runs at
    # ~7 MB/s, which would measure the tunnel, not the renderer). Retry on
    # transient backend aborts.
    times = []
    attempts = 0
    while len(times) < 4 and attempts < 10:
        attempts += 1
        try:
            ivps = make_ivps(25.0 + attempts * 0.7)
            t0 = time.perf_counter()
            _frames, checksum = fn(scene, ivps)
            checksum = int(np.asarray(checksum))
            times.append(time.perf_counter() - t0)
            assert checksum > 0
        except jax.errors.JaxRuntimeError as exc:
            import sys
            print(f"bench attempt {attempts} failed: "
                  f"{type(exc).__name__}: {str(exc)[:160]}", file=sys.stderr)
            time.sleep(2.0)
    if not times:
        raise SystemExit(3)   # backend soured; parent retries a fresh process
    dt = float(np.median(times)) / FRAMES_PER_CALL
    mrays = width * height / dt / 1e6

    print(json.dumps({
        "metric": "primary_rays_1080p_subdiv3_micromesh",
        "value": round(mrays, 2),
        "unit": "Mrays/s",
        "vs_baseline": round(mrays / 100.0, 3),
    }))


def _run_with_process_retries() -> int:
    """The remote TPU relay on this host occasionally wedges a process's
    backend permanently (every subsequent call returns INTERNAL); a fresh
    process re-establishes the tunnel. Retry the measurement in child
    processes and forward the JSON line."""
    import os
    import subprocess
    import sys

    for _ in range(3):
        r = subprocess.run(
            [sys.executable, os.path.abspath(__file__)],
            env={**os.environ, "RTMM_BENCH_CHILD": "1"},
            capture_output=True, text=True)
        line = next((l for l in reversed(r.stdout.strip().splitlines())
                     if l.startswith("{")), None)
        if r.returncode == 0 and line:
            print(line)
            return 0
        print(r.stderr[-500:], file=sys.stderr)
    print(json.dumps({
        "metric": "primary_rays_1080p_subdiv3_micromesh",
        "value": 0.0, "unit": "Mrays/s", "vs_baseline": 0.0,
        "error": "TPU backend unavailable after 3 attempts"}))
    return 1


if __name__ == "__main__":
    import os as _os
    import sys as _sys

    if _os.environ.get("RTMM_BENCH_CHILD"):
        main()
    else:
        _sys.exit(_run_with_process_retries())
