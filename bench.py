"""Benchmark driver (BASELINE.json configs).

Default: config 3 — full micro-mesh asset at 1080p, direct traversal,
closest-hit shading + miss. `--config N` selects the other BASELINE
configs:
  1  tessellated (-T) low-poly asset, 256x256 primary rays
  2  direct micro-mesh traversal, same asset as 1
  3  full asset @1080p via the gltf+bary io path (flagship, the default)
  4  multi-instance two-level traversal with per-instance transforms
  5  path-traced multi-bounce, subdivision-level-5 micro-mesh, compaction
  6  (extra) 51,200-base-triangle scene through the cluster hierarchy
  7  (extra) 10^6 base tris / 64M micro-tris, compressed direct tracing
  8  (extra) TRUE two-level TLAS, 64 instances, merged one-launch path
  9  (extra) config-6 scene through compressed (derive-at-trace) records
  10 (extra) TRUE TLAS, 256 instances (N-insensitivity probe)
  11 (extra) subdiv-5 direct primary tracing (long-dimension probe)

Every config carries a real-TPU image gate: primary-ray configs verify
the Pallas kernel against the XLA tile backend (_verify_image); the
instanced configs verify the merged one-launch path against the serial
per-instance scan (_verify_instanced); the path tracer verifies the
pallas-grouped engine against the grouped-XLA engine (_verify_pathtrace).
Interpret-mode CPU tests cannot see Mosaic miscompiles — this repo's
DMA-leak and matmul-precision bugs were real-TPU-only.

Renders a multi-frame orbit per device invocation (the realistic
animation workload; also amortizes the ~25 ms per-call latency of this
host's remote-execution relay — measured per-frame differentials show a
single 1080p call is ~17% relay latency, a single 512^2 path-trace call
~50%). Prints ONE JSON line:
  {"metric": ..., "value": N, "unit": "Mrays/s", "vs_baseline": N}
vs_baseline is measured against the 100 Mrays/s/chip north-star target
(BASELINE.md — the reference publishes no numbers of its own).
"""
from __future__ import annotations

import json
import sys
import time

import numpy as np

FRAMES_PER_CALL = 32


def _frames_per_call(cfg) -> int:
    """Orbit length per device invocation. Small frames render in well
    under 1 ms, so the host relay's ~25 ms per-call latency would dominate
    a short orbit; longer orbits keep the measurement about the chip
    (32 x ~17 ms at 1080p leaves the relay <5% of a call; at 256^2 even a
    64-frame call is ~half relay, so small frames default to 256 — one
    fused launch of 16k tile rows, ~0.5 GB of output rows).
    RTMM_BENCH_FRAMES overrides for orbit-length A/Bs."""
    import os
    env = int(os.environ.get("RTMM_BENCH_FRAMES", "0"))
    if env:
        return env
    return FRAMES_PER_CALL if cfg.width * cfg.height >= 2**20 else 256


def _build_config(n: int):
    metric, scene, cfg, f = _build_config_raw(n)
    # (RTMM_SUB_FRUSTA / RTMM_SUB_ROWS sub-cone A/B overrides are applied
    # inside resolve_mt_precision — one place, not two.)
    from rtmm_tpu.ops.pallas_tiled import resolve_mt_precision
    ds = scene[0] if isinstance(scene, tuple) else scene
    return metric, scene, resolve_mt_precision(ds, cfg), f


def _build_config_raw(n: int):
    """Returns (metric_name, scene, render_cfg, rays_per_frame_factor)."""
    from rtmm_tpu.config import RenderConfig
    from rtmm_tpu.models import procedural, scene as scene_mod

    if n == 1:
        mesh = procedural.make_icosphere(subdivisions=0, level=2,
                                         amplitude=0.1)
        scene = scene_mod.build_device_scene(mesh, tessellated=True)
        return ("tessellated_256_lowpoly", scene,
                RenderConfig(width=256, height=256), 1)
    if n == 2:
        mesh = procedural.make_icosphere(subdivisions=0, level=2,
                                         amplitude=0.1)
        scene = scene_mod.build_device_scene(mesh)
        return ("micromesh_256_lowpoly", scene,
                RenderConfig(width=256, height=256), 1)
    if n == 3:
        # Full asset through the asset-loading path (BASELINE config 3 is
        # "full micromesh-tools asset at 1080p"): a subdiv-3 closed surface
        # with 1,280 base x 64 micro = 81,920 micro-triangles, written as a
        # spec-layout .gltf + .bary pair once and loaded via io.loader.
        # (A 4x bigger 5,120-triangle variant runs at ~73 Mrays/s — see
        # PERF.md's scene-size table.)
        mesh = _full_asset_via_io()
        scene = scene_mod.build_device_scene(mesh)
        return ("primary_rays_1080p_subdiv3_micromesh", scene,
                RenderConfig(width=1920, height=1080), 1)
    if n == 6:
        # Real-scale stress: 51,200 base triangles at subdiv 2 (819k
        # micro-triangles) through the cluster hierarchy at 1080p.
        mesh = procedural.make_plane(grid=(160, 160), level=2,
                                     amplitude=0.05)
        scene = scene_mod.build_device_scene(mesh)
        return ("large_scene_51k_tris_1080p", scene,
                RenderConfig(width=1920, height=1080), 1)
    if n == 7:
        # Full-scale direct tracing: 10^6 base triangles at level 3 =
        # 64M micro-triangles. Only representable via the compressed
        # (derive-at-trace-time) scene — the precomputed MT tables would
        # need ~35 GiB; the grid records are ~2 GiB on a 16 GiB chip.
        return ("compressed_1M_tris_64M_micro_1080p", _million_tri_scene(),
                RenderConfig(width=1920, height=1080), 1)
    if n == 9:
        # Config-6 A/B through compressed direct tracing: same 51,200-tri
        # scene, but the kernel DMAs 2 KiB grid records instead of 12 KiB
        # precomputed MT tables per unit (6x less HBM traffic per
        # candidate) and derives the tables on the MXU/VPU.
        mesh = procedural.make_plane(grid=(160, 160), level=2,
                                     amplitude=0.05)
        scene = scene_mod.build_device_scene(mesh, compressed=True)
        return ("large_scene_51k_tris_compressed_1080p", scene,
                RenderConfig(width=1920, height=1080), 1)
    if n == 11:
        # Subdiv-5 long-dimension probe (VERDICT r4 item 8): direct
        # primary tracing at the reference's max subdivision level
        # (intersection.hlsl:79) — level 5 previously ran only inside
        # the path tracer. 320 base x 1024 = 327,680 micro-triangles,
        # 16 units per base triangle, @1080p.
        mesh = procedural.make_icosphere(subdivisions=2, level=5,
                                         amplitude=0.1)
        scene = scene_mod.build_device_scene(mesh)
        return ("subdiv5_direct_1080p", scene,
                RenderConfig(width=1920, height=1080), 1)
    if n == 4:
        from rtmm_tpu.render import instances as inst_mod
        mesh = procedural.make_icosphere(subdivisions=1, level=3,
                                         amplitude=0.12)
        base = scene_mod.build_device_scene(mesh)
        ring = []
        for i in range(6):
            a = 2.0 * np.pi * i / 6
            ring.append(inst_mod.Instance.from_euler(
                [2.4 * np.cos(a), 2.4 * np.sin(a), 0.0], (0.0, a, 0.3 * i),
                0.8))
        scene = inst_mod.bake_instances(base, ring)
        return ("multi_instance_6x_1080p", scene,
                RenderConfig(width=1920, height=1080), 1)
    if n == 5:
        import os
        mesh = procedural.make_icosphere(subdivisions=0, level=5,
                                         amplitude=0.1)
        # RTMM_PT_COMPRESSED=1: grouped engines trace the compressed
        # (derive-at-trace-time) scene — 6x less HBM per candidate DMA on
        # the incoherent secondary bounces (VERDICT round-3 item 9 A/B).
        scene = scene_mod.build_device_scene(
            mesh, compressed=os.environ.get("RTMM_PT_COMPRESSED") == "1")
        # sub_frusta=8: measured +14% on this config (silhouette tiles
        # dominate the primary trace) vs -5% on coherent primary configs,
        # which keep the default 4 — see PERF.md.
        return ("pathtrace_subdiv5_3bounce", scene,
                RenderConfig(width=512, height=512, sub_frusta=8),
                None)  # special-cased
    if n in (8, 10):
        # TRUE two-level (TLAS-analog) traversal at instance scale: N
        # instances of one shared object-space scene, O(scene + N) HBM,
        # per-instance ray transform + per-tile instance culling, merged
        # into ONE windowed launch whose cost scales with the instances'
        # total screen footprint, not N
        # (render/instances.py::_render_instanced_merged). Config 4
        # measures the baked alternative (O(N x scene) HBM, 6 instances);
        # config 10 is the 256-instance N-insensitivity probe (footprint
        # per instance shrinks as the ring widens, so Mrays/s should
        # track the ~constant covered-pixel count, not N).
        from rtmm_tpu.render import instances as inst_mod
        n_inst = 64 if n == 8 else 256
        mesh = procedural.make_icosphere(subdivisions=1, level=3,
                                         amplitude=0.12)
        base = scene_mod.build_device_scene(mesh)
        rng = np.random.default_rng(9)
        ring = []
        for i in range(n_inst):
            a = 2.0 * np.pi * i / n_inst
            rad = 2.4 + 0.9 * ((i * 7) % 3)
            ring.append(inst_mod.Instance.from_euler(
                [rad * np.cos(a), rad * np.sin(a),
                 0.8 * float(rng.standard_normal())],
                (0.0, a, 0.2 * i), 0.35 if n == 8 else 0.18))
        import os
        if os.environ.get("RTMM_INSTANCE_BAKED") == "1":
            # A/B: the SAME ring through the baked O(N x scene)-HBM path
            # (config 4's architecture) — the apples-to-apples control
            # for the merged-vs-baked claim (config 4 itself is a
            # different, larger-instance scene).
            return (f"instanced_baked_{n_inst}x_1080p",
                    inst_mod.bake_instances(base, ring),
                    RenderConfig(width=1920, height=1080), 1)
        return (f"instanced_tlas_{n_inst}x_1080p", (base, ring),
                RenderConfig(width=1920, height=1080), None)
    raise SystemExit(f"unknown config {n}")


def _million_tri_scene():
    """Config 7's 10^6-triangle level-3 compressed scene, disk-cached
    (the host-side build is ~7 min of NumPy; np.savez uncompressed keeps
    the reload to ~30 s of IO)."""
    import os
    import tempfile

    import numpy as np

    from rtmm_tpu.models import procedural, scene as scene_mod
    from rtmm_tpu.utils import cache as cache_mod

    path = os.path.join(tempfile.gettempdir(), "rtmm_bench_1m_l3.npz")
    if os.path.exists(path):
        try:
            return cache_mod.load_scene(path)
        except Exception:
            pass
    mesh = procedural.make_plane(grid=(707, 707), level=3, amplitude=0.05)
    scene = scene_mod.build_device_scene(mesh, compressed=True)
    # Uncompressed savez: ~2 GB of f32 grid positions compress slowly and
    # poorly; plain IO is minutes faster both ways.
    import dataclasses as _dc
    arrays = {f.name: np.asarray(getattr(scene, f.name))
              for f in _dc.fields(scene)
              if f.name not in cache_mod._META_FIELDS
              and getattr(scene, f.name) is not None}
    np.savez(path, **cache_mod._meta_arrays(scene), **arrays)
    return scene


def _full_asset_via_io():
    """Generate-once + load the config-3 asset through the gltf+bary path."""
    import os
    import tempfile

    from rtmm_tpu.io import loader
    from rtmm_tpu.models import procedural

    path = os.path.join(tempfile.gettempdir(), "rtmm_bench_sphere3_l3.gltf")
    if not os.path.exists(path):
        mesh = procedural.make_icosphere(subdivisions=3, level=3,
                                         amplitude=0.12)
        loader.save_gltf_bary(mesh, path)
    return loader.load_micromesh(path)


# Expected per-frame (tile, unit) kernel visit counts at the verify
# camera (yaw 25 deg, pitch -30, dist as in _verify_image) — the
# drift gate (VERDICT r4 item 7): Mrays/s has a ~+-9% session-to-session
# envelope on this host's relay, so a silent <9% regression in the walk
# itself would be invisible; the EXACT in-kernel visit counter is
# session-noise-free. A config keys in only once measured; tolerance
# covers fast3 epsilon flips at walk boundaries (visits are otherwise
# deterministic for a fixed scene + camera).
EXPECTED_VISITS: dict[int, int] = {
    # Fixed-camera counts from the round-5 session (2026-08-20); visits
    # are deterministic for a fixed scene + camera + walk, so the 5%
    # tolerance is purely headroom for intentional walk changes—which
    # must update these pins.
    1: 95,         # tessellated 256² low-poly (round-5 session)
    2: 95,         # direct micro-mesh, same asset (round-5 session)
    3: 5359,       # flagship 1,280-tri subdiv-3 @1080p (round-5 session)
    4: 13338,      # six baked instances @1080p (round-5 session)
    6: 24312,      # 51k-tri plane @1080p (sub_frusta=4)
    7: 1041098,    # 1M-tri compressed @1080p (round-5 session)
    9: 21967,      # 51k-tri compressed @1080p (round-5 session)
    11: 9434,      # subdiv-5 icosphere direct @1080p (round-5 session)
}
VISITS_RTOL = 0.05


def visit_gate(config_n: int, visits: int) -> str | None:
    """None if the measured visit count is within VISITS_RTOL of the
    recorded expectation (or no expectation is recorded); else the gate
    failure message. A +10% injection MUST trip this (tested)."""
    exp = EXPECTED_VISITS.get(config_n)
    if exp is not None and abs(visits - exp) > VISITS_RTOL * exp:
        return (f"visit-count gate: {visits} vs expected {exp} "
                f"(rtol {VISITS_RTOL})")
    return None


def _visit_stats(scene, cfg, dist: float):
    """One fixed-camera frame through render_pallas(with_stats=True):
    returns the exact (tile, unit) visit/eligible totals the kernel
    executed (counters ride output rows 3/4 — free)."""
    import jax

    from rtmm_tpu.ops import pallas_tiled as _pt
    from rtmm_tpu.utils import camera

    tb = camera.Trackball()
    tb.set_camera([0.0, 0.0, 0.0],
                  [np.radians(-30.0), np.radians(25.0), 0.0], dist)
    ivp = camera.inv_view_proj(tb, cfg.width, cfg.height)

    def f(s, m):
        img, st = _pt.render_pallas(s, m, cfg, with_stats=True)
        return (st["kernel_unit_visits"].sum(),
                st["kernel_unit_eligible"].sum())
    nv, ne = jax.jit(f)(scene, ivp)
    return int(np.asarray(nv)), int(np.asarray(ne))


def _bench_render(scene, cfg, metric, dist: float = 3.0):
    import jax
    import jax.numpy as jnp

    from rtmm_tpu.render.renderer import render_image
    from rtmm_tpu.utils import camera

    width, height = cfg.width, cfg.height
    frames_per_call = _frames_per_call(cfg)

    def make_ivps(offset: float):
        out = []
        for k in range(frames_per_call):
            tb = camera.Trackball()
            tb.set_camera(
                [0.0, 0.0, 0.0],
                [np.radians(-30.0),
                 np.radians(offset + 360.0 / frames_per_call * k), 0.0],
                dist)
            out.append(camera.inv_view_proj(tb, width, height))
        return jnp.asarray(np.stack(out))

    from rtmm_tpu.ops import pallas_tiled as _pt
    from rtmm_tpu.render.renderer import _resolve_pipeline
    use_batched = _resolve_pipeline(cfg, scene) == "pallas"

    def render_orbit(scene_, ms):
        if use_batched:
            # Multi-frame fused launches (render_pallas_frames): per-frame
            # launch fixed cost amortizes across the batch — the round-4
            # small-frame lever (VERDICT item 5).
            imgs = _pt.render_pallas_frames(scene_, ms, cfg)
            frames = (jnp.clip(imgs, 0.0, 1.0) * 255.0
                      + 0.5).astype(jnp.uint8)
        else:
            def one(m):
                img = render_image(scene_, m, cfg)
                # On-device u8 quantization (the reference's
                # R8G8B8A8_UNORM out).
                return (jnp.clip(img, 0.0, 1.0) * 255.0
                        + 0.5).astype(jnp.uint8)
            frames = jax.lax.map(one, ms)
        # Tiny checksum output: reading it back is the completion fence
        # (full-frame readback would measure the host relay, not the chip).
        return frames, frames[:, ::64, ::64, :].sum(dtype=jnp.int32)

    fn = jax.jit(render_orbit)
    np.asarray(fn(scene, make_ivps(25.0))[1])           # warmup / compile

    # Fresh camera batch per iteration (identical reused inputs can be
    # result-deduplicated by remote-execution relays and fake a ~0 ms
    # frame); tiny-checksum readback is the fence (bulk readback through
    # this host's relay runs at ~7 MB/s and would measure the tunnel).
    times = []
    attempts = 0
    while len(times) < 4 and attempts < 10:
        attempts += 1
        try:
            ivps = make_ivps(25.0 + attempts * 0.7)
            # The host->device transfer is async and a relay round trip of
            # its own (~30 ms): fence it OUT of the timed region.
            jax.block_until_ready(ivps)
            t0 = time.perf_counter()
            _frames, checksum = fn(scene, ivps)
            checksum = int(np.asarray(checksum))
            times.append(time.perf_counter() - t0)
            assert checksum > 0
        except jax.errors.JaxRuntimeError as exc:
            print(f"bench attempt {attempts} failed: "
                  f"{type(exc).__name__}: {str(exc)[:160]}", file=sys.stderr)
            time.sleep(2.0)
    if not times:
        raise SystemExit(3)   # backend soured; parent retries a fresh process
    dt = float(np.median(times)) / frames_per_call
    return width * height / dt / 1e6


def diff_metrics(a_, b_):
    """Backend-agreement metrics for one (H, W, 3) frame pair.

    Two-tier pixel gate, calibrated by on-TPU measurement:
    * noise tier (> 4/255, one clearly visible u8 step in the PNG the
      renderer outputs): fast3-vs-f32 epsilon flips at leaf silhouettes
      land here (config 4 measured 234 px of 2M, 91% within 2 px of an
      edge, 0 px at the same scene with both backends at HIGHEST). A
      >1e-3 gate could never pass: 358 px differ at that level even
      f32-vs-f32 (accumulation order).
    * big tier (> 0.25, a different-surface/miss-level error): epsilon
      flips measured 3 px here; real Mosaic-miscompile classes measured
      748 px at maxdiff 0.48 (and 34,995 at 0.62) — hundreds-to-
      thousands of big diffs is the miscompile signature this check
      exists to catch.
    Cell tier (gates the subpixel-leaf regime instead of the pixel
    tiers): mean |diff| over 6x6 cells. With hundreds of micro-triangles
    per pixel (config 7: ~500 leaves/px at the reduced verify res) two
    CORRECT single-sample renderers decorrelate — f32-epsilon t-ties
    flip which subpixel leaf wins and the facet normals differ
    arbitrarily — so per-pixel budgets cannot separate flips (measured
    985 px / 91 big, scattered) from miscompiles (contiguous surface
    regions). Averaging 36 pixels bounds the scattered-flip
    contribution (0.76% density x ~0.3 magnitude ~ 0.002 per cell)
    while a regional miscompile drives whole cells past 0.05.

    Returns (npix > 4/255, npix > 0.25, max pixel diff,
    ncells mean > 0.05, max cell mean).
    """
    import jax.numpy as jnp

    d = jnp.abs(a_ - b_).max(-1)
    ch, cw = (a_.shape[0] // 6) * 6, (a_.shape[1] // 6) * 6
    cells = jnp.abs(a_[:ch, :cw] - b_[:ch, :cw]).mean(-1).reshape(
        ch // 6, 6, cw // 6, 6).mean((1, 3))
    return ((d > 4.0 / 255.0).sum(dtype=jnp.int32),
            (d > 0.25).sum(dtype=jnp.int32), d.max(),
            (cells > 0.05).sum(dtype=jnp.int32), cells.max())


def _verify_image(scene, cfg, dist: float = 3.0) -> dict:
    """Real-TPU pixel verification: ONE frame through the Pallas kernel
    vs the XLA tile backend, compared ON DEVICE (full-frame readback
    through this host's ~7 MB/s relay would dominate).

    Interpret-mode CPU tests cannot see Mosaic miscompiles (this repo's
    own DMA-leak and matmul-precision bugs were real-TPU-only); a bench
    number without this check only proves a nonzero checksum.
    """
    import dataclasses

    import jax
    import jax.numpy as jnp

    from rtmm_tpu.render.renderer import render_image
    from rtmm_tpu.utils import camera

    # The tile reference is the ~10-50x slower of the pair; on >=10^5-unit
    # scenes a full-res tile frame is minutes of device time in one
    # program — long enough to trip the relay's program watchdog (config 7
    # reproducibly took the TPU worker down mid-verification). Verify at
    # reduced resolution there: miscompile-class bugs cover whole
    # surfaces, not single pixels, so 480x270 still catches them.
    vw, vh = cfg.width, cfg.height
    n_units = int(np.asarray(scene.unit_valid).sum())
    if n_units > 100_000:
        vw, vh = 480, 270
    if n_units > 400_000:
        # The tile-reference frame is a single device program whose
        # duration grows with unit count; at the 10^6-unit scale even
        # 480x270 trips the relay's program watchdog (the worker
        # crashes mid-verification — observed again after the w-form
        # added 25% MXU work to the tile path). Miscompile classes
        # cover whole surfaces, so 240x136 still catches them.
        vw, vh = 240, 136
    # Subpixel-leaf regime (see the cell tier below): average >4 leaves
    # per pixel means single-sample winner flips are expected behavior,
    # so the gate moves from pixel budgets to 6x6-cell mean budgets.
    # (Compressed scenes keep the pixel tiers: this gate caught the
    # tile backend's derive gathers running at DEFAULT matmul precision
    # — bf16-rounded grid positions on the MXU, 496/182 px at config 9
    # while the in-kernel derive measured bit-exact for all 51,200
    # units; fixed with Precision.HIGHEST in ops/compressed.py.)
    subpixel = n_units * 64 > 4 * vw * vh
    tb = camera.Trackball()
    tb.set_camera([0.0, 0.0, 0.0],
                  [np.radians(-30.0), np.radians(25.0), 0.0], dist)
    ivp = jnp.asarray(camera.inv_view_proj(tb, vw, vh))
    cfg_p = dataclasses.replace(cfg, pipeline="pallas", width=vw, height=vh)
    cfg_t = dataclasses.replace(cfg, pipeline="tile", width=vw, height=vh)

    # Two separate device calls (not one fused jit): halves peak HBM on
    # scenes that barely fit, and the slow tile program stands alone.
    a = jax.jit(lambda s, m: render_image(s, m, cfg_p))(scene, ivp)
    jax.block_until_ready(a)
    b = jax.jit(lambda s, m: render_image(s, m, cfg_t))(scene, ivp)

    npix, nbig, maxdiff, ncell, maxcell = jax.jit(diff_metrics)(a, b)
    return {"verify_npix": int(np.asarray(npix)),
            "verify_nbig": int(np.asarray(nbig)),
            "verify_maxdiff": round(float(np.asarray(maxdiff)), 5),
            "verify_budget": max(64, (vw * vh) // 2000),
            "verify_big_budget": max(16, (vw * vh) // 50000),
            "verify_mode": "cell" if subpixel else "pixel",
            "verify_ncell": int(np.asarray(ncell)),
            "verify_maxcell": round(float(np.asarray(maxcell)), 5),
            "verify_cell_budget": 8,
            **({"verify_wh": f"{vw}x{vh}"}
               if (vw, vh) != (cfg.width, cfg.height) else {})}


def _verify_instanced(base_scene, ring, cfg, dist: float = 6.5) -> dict:
    """Real-TPU image gate for the instanced configs (8/10): ONE
    reduced-res frame through the merged one-launch path vs the serial
    per-instance scan — identical object-space math, independent launch
    structure (the merged path's concatenated row geometry is exactly
    what no interpret-mode test can exercise on hardware). Reduced res:
    the serial reference scans N full-frame launches."""
    import dataclasses

    import jax
    import jax.numpy as jnp

    from rtmm_tpu.render import instances as inst_mod
    from rtmm_tpu.utils import camera

    vw, vh = 480, 288
    cfgv = dataclasses.replace(cfg, width=vw, height=vh)
    tb = camera.Trackball()
    tb.set_camera([0.0, 0.0, 0.0],
                  [np.radians(-30.0), np.radians(25.0), 0.0], dist)
    ivp = jnp.asarray(camera.inv_view_proj(tb, vw, vh))
    rot = jnp.asarray(np.stack([i.rotation for i in ring]), jnp.float32)
    trn = jnp.asarray(np.stack([i.translation for i in ring]), jnp.float32)
    scl = jnp.asarray(np.asarray([i.scale for i in ring]), jnp.float32)

    a = jax.jit(lambda s, m: inst_mod._render_instanced(
        s, rot, trn, scl, m, cfgv, interpret=False))(base_scene, ivp)
    jax.block_until_ready(a)
    b = jax.jit(lambda s, m: inst_mod._render_instanced(
        s, rot, trn, scl, m, cfgv, interpret=False, serial=True))(
        base_scene, ivp)
    npix, nbig, maxdiff, _, _ = jax.jit(diff_metrics)(a, b)
    # Covered-pixel fraction (pixels not equal to the constant miss
    # color) — the denominator of the N-insensitivity claim: merged-
    # launch cost should track covered pixels, not N (PERF.md round 5).
    bg = jnp.asarray(cfg.background, jnp.float32)
    covered = jnp.any(jnp.abs(a - bg) > 1e-6, axis=-1).sum()
    return {"verify_npix": int(np.asarray(npix)),
            "verify_nbig": int(np.asarray(nbig)),
            "verify_maxdiff": round(float(np.asarray(maxdiff)), 5),
            "verify_budget": max(64, (vw * vh) // 2000),
            "verify_big_budget": max(16, (vw * vh) // 50000),
            "verify_mode": "pixel", "verify_wh": f"{vw}x{vh}",
            "covered_px": int(np.asarray(covered)),
            "covered_frac": round(float(np.asarray(covered))
                                  / (vw * vh), 4)}


def _verify_pathtrace(scene, cfg) -> dict:
    """Real-TPU image gate for config 5: ONE reduced-res frame through
    the pallas-grouped AND the grouped-XLA secondary engines on the
    chip. The engines share the estimator (pixel-indexed randoms) but
    differ in MT precision scheme (3-pass bf16 kernel vs HIGHEST f32
    XLA), and an epsilon-flipped bounce hit repaints its whole pixel —
    so the budgets are wider than the primary gate's (interpret-mode
    agreement measured <=5 px of 64^2 per bounce; a Mosaic-miscompile
    class repaints contiguous regions, measured 748-35,000 px)."""
    import dataclasses

    import jax
    import jax.numpy as jnp

    from rtmm_tpu.render.pathtrace import (PathTraceConfig, PathTracer,
                                           path_trace)
    from rtmm_tpu.utils import camera

    vw, vh = 256, 256
    cfgv = dataclasses.replace(cfg, width=vw, height=vh)
    tb = camera.Trackball()
    tb.set_camera([0.0, 0.0, 0.0],
                  [np.radians(-30.0), np.radians(25.0), 0.0], 3.0)
    ivp = jnp.asarray(camera.inv_view_proj(tb, vw, vh))

    def one(engine):
        pt = PathTracer(scene, cfgv, PathTraceConfig(
            bounces=3, samples_per_pixel=2, ray_chunk=16384,
            engine=engine)).pt
        img, _stats = jax.jit(lambda s, m: path_trace(s, m, cfgv, pt))(
            scene, ivp)
        jax.block_until_ready(img)
        return img

    a = one("pallas")
    b = one("grouped")
    npix, nbig, maxdiff, _, _ = jax.jit(diff_metrics)(a, b)
    return {"verify_npix": int(np.asarray(npix)),
            "verify_nbig": int(np.asarray(nbig)),
            "verify_maxdiff": round(float(np.asarray(maxdiff)), 5),
            "verify_budget": max(64, (vw * vh) // 500),
            "verify_big_budget": max(16, (vw * vh) // 500),
            "verify_mode": "pixel", "verify_wh": f"{vw}x{vh}"}


def _bench_instanced(base_scene, ring, cfg, dist: float = 6.5):
    """Config 8: the true two-level instanced path, orbit-in-one-call
    (same relay-amortization scheme as _bench_render)."""
    import jax
    import jax.numpy as jnp

    from rtmm_tpu.render import instances as inst_mod
    from rtmm_tpu.utils import camera

    frames_per_call = _frames_per_call(cfg)
    rot = jnp.asarray(np.stack([i.rotation for i in ring]), jnp.float32)
    trn = jnp.asarray(np.stack([i.translation for i in ring]), jnp.float32)
    scl = jnp.asarray(np.asarray([i.scale for i in ring]), jnp.float32)

    def make_ivps(offset: float):
        out = []
        for k in range(frames_per_call):
            tb = camera.Trackball()
            tb.set_camera(
                [0.0, 0.0, 0.0],
                [np.radians(-30.0),
                 np.radians(offset + 360.0 / frames_per_call * k), 0.0],
                dist)
            out.append(camera.inv_view_proj(tb, cfg.width, cfg.height))
        return jnp.asarray(np.stack(out))

    @jax.jit
    def orbit(scene_, ms):
        def one(m):
            img = inst_mod._render_instanced(scene_, rot, trn, scl, m, cfg,
                                             interpret=False)
            return (jnp.clip(img, 0.0, 1.0) * 255.0 + 0.5
                    ).astype(jnp.uint8)
        frames = jax.lax.map(one, ms)
        return frames[:, ::64, ::64, :].sum(dtype=jnp.int32)

    checksum = int(np.asarray(orbit(base_scene, make_ivps(25.0))))
    assert checksum > 0
    times = []
    attempts = 0
    while len(times) < 4 and attempts < 10:
        attempts += 1
        try:
            ivps = make_ivps(25.0 + attempts * 0.7)
            jax.block_until_ready(ivps)
            t0 = time.perf_counter()
            checksum = int(np.asarray(orbit(base_scene, ivps)))
            times.append(time.perf_counter() - t0)
            assert checksum > 0
        except jax.errors.JaxRuntimeError as exc:
            print(f"bench attempt {attempts} failed: "
                  f"{type(exc).__name__}: {str(exc)[:160]}", file=sys.stderr)
            time.sleep(2.0)
    if not times:
        raise SystemExit(3)
    dt = float(np.median(times)) / frames_per_call
    return cfg.width * cfg.height / dt / 1e6


def _bench_pathtrace(scene, cfg, metric, frames: int = 32):
    """Config 5: total rays traced per second across bounces + samples.

    Times an `frames`-frame orbit inside ONE jit call (a single 512^2
    path-trace frame is ~25 ms on-device — timing it per-call would be
    ~50% relay latency, and even the earlier 8-frame orbit billed the
    ~30 ms per-call relay overhead as ~15% phantom frame time; 32
    frames matches the primary configs' amortization so the number is
    about the chip, like every other row)."""
    import functools
    import os

    import jax
    import jax.numpy as jnp

    from rtmm_tpu.render.pathtrace import (PathTraceConfig, PathTracer,
                                           path_trace)
    from rtmm_tpu.utils import camera

    # RTMM_PT_BOUNCES / RTMM_PT_SPP: attribution A/Bs (e.g. the cost of
    # one extra bounce = T(3) - T(2) isolates the late, mostly-dead
    # secondary traces; the published config-5 number is the default 3/2).
    pt = PathTraceConfig(
        bounces=int(os.environ.get("RTMM_PT_BOUNCES", "3")),
        samples_per_pixel=int(os.environ.get("RTMM_PT_SPP", "2")),
        ray_chunk=16384)
    # PathTracer only to resolve bounce_t_max from the scene bounds.
    pt = PathTracer(scene, cfg, pt).pt

    def make_ivps(offset: float):
        out = []
        for k in range(frames):
            tb = camera.Trackball()
            tb.set_camera(
                [0.0, 0.0, 0.0],
                [np.radians(-30.0),
                 np.radians(offset + 360.0 / frames * k), 0.0], 3.0)
            out.append(camera.inv_view_proj(tb, cfg.width, cfg.height))
        return jnp.asarray(np.stack(out))

    @jax.jit
    def orbit(ms):
        def one(m):
            img, stats = path_trace(scene, m, cfg, pt)
            frame = (jnp.clip(img, 0.0, 1.0) * 255.0 + 0.5
                     ).astype(jnp.uint8)
            return frame[::64, ::64, :].sum(dtype=jnp.int32), \
                stats["live_rays_per_bounce"]
        checks, live = jax.lax.map(one, ms)
        return checks.sum(), live.mean(axis=0)

    check, live = orbit(make_ivps(25.0))                # warmup / compile
    live = np.asarray(live)
    assert int(np.asarray(check)) > 0
    # Rays actually traced: the primaries ONCE per frame (bounce 0 is
    # deterministic and shared across samples) plus, per sample and per
    # bounce b >= 1, the rays still alive after bounce b-1. Rays alive
    # after the FINAL bounce are never traced again, so live[-1] is
    # excluded. (live counts are per-sample means.)
    rays_per_frame = int(
        cfg.width * cfg.height
        + live[:-1].sum() * pt.samples_per_pixel)

    times = []
    attempts = 0
    while len(times) < 3 and attempts < 8:
        attempts += 1
        try:
            ivps = make_ivps(25.0 + attempts * 0.9)
            jax.block_until_ready(ivps)     # transfer outside the timer
            t0 = time.perf_counter()
            check, lv = orbit(ivps)
            check = int(np.asarray(check))
            times.append(time.perf_counter() - t0)
            assert np.isfinite(np.asarray(lv)).all()
        except Exception as exc:
            print(f"bench attempt {attempts} failed: {str(exc)[:160]}",
                  file=sys.stderr)
            time.sleep(2.0)
    if not times:
        raise SystemExit(3)
    dt = float(np.median(times)) / frames
    # Orbit-mean live secondaries per bounce (per-sample), printed to
    # stderr for cap-schedule tuning (RTMM_PT_CAP/RTMM_PT_CAPS must sit
    # above spp * live[b-1] at every bounce or the exact full-size
    # fallback erases the compaction's win for that frame).
    print(f"pt live per bounce (per-sample means): "
          f"{[round(float(x), 1) for x in live]}", file=sys.stderr)
    return rays_per_frame / dt / 1e6


def main() -> None:
    n = 3
    if "--config" in sys.argv:
        n = int(sys.argv[sys.argv.index("--config") + 1])
    metric, scene, cfg, _ = _build_config(n)
    result = {"metric": metric, "unit": "Mrays/s"}

    def gate_or_exit(v):
        """Apply the two-tier pixel gate from a _verify_* dict; zero the
        result and exit on failure (same contract as the primary gate)."""
        result.update(v)
        if (v["verify_npix"] > v["verify_budget"]
                or v["verify_nbig"] > v["verify_big_budget"]):
            result.update(
                value=0.0, vs_baseline=0.0,
                error=f"image verification failed: {v['verify_npix']} px "
                      f"diverge ({v['verify_nbig']} large)")
            print(json.dumps(result))
            raise SystemExit(4)

    # --verify-only: skip the timing orbit entirely and report just the
    # on-TPU verify fields (value stays 0 — NOT a perf row; used to
    # collect covered_px / gate status without paying a full bench).
    verify_only = "--verify-only" in sys.argv

    if n == 5:
        mrays = 0.0 if verify_only else _bench_pathtrace(scene, cfg,
                                                         metric)
        if "--no-verify" not in sys.argv:
            gate_or_exit(_verify_pathtrace(scene, cfg))
    elif n in (8, 10) and isinstance(scene, tuple):
        base, ring = scene
        mrays = 0.0 if verify_only else _bench_instanced(base, ring, cfg)
        if "--no-verify" not in sys.argv:
            gate_or_exit(_verify_instanced(base, ring, cfg))
    else:
        # (configs 8/10 land here under RTMM_INSTANCE_BAKED=1 — the ring
        # baked into one scene rides the plain primary pipeline at the
        # instanced configs' camera distance.)
        dist = 4.5 if n == 4 else (6.5 if n in (8, 10) else 3.0)
        mrays = 0.0 if verify_only else _bench_render(scene, cfg, metric,
                                                      dist=dist)
        if "--no-ab" not in sys.argv and not verify_only:
            # Exact visit-count drift gate (see EXPECTED_VISITS): pins
            # the walk against silent regressions the Mrays/s session
            # envelope (~+-9%) would hide. us_per_visit pairs the orbit's
            # median frame time with the fixed-camera visit count —
            # approximate, but the GATE is on the exact counter alone.
            import jax
            try:
                nv, ne = _visit_stats(scene, cfg, dist=dist)
                dt_f = cfg.width * cfg.height / (mrays * 1e6)
                result.update(visits=nv, eligible=ne,
                              us_per_visit=round(dt_f * 1e6 / max(nv, 1),
                                                 3))
                if n in EXPECTED_VISITS:
                    result["visits_expected"] = EXPECTED_VISITS[n]
                gate_msg = visit_gate(n, nv)
                if gate_msg is not None:
                    result.update(value=0.0, vs_baseline=0.0,
                                  error=gate_msg)
                    print(json.dumps(result))
                    raise SystemExit(5)
            except jax.errors.JaxRuntimeError as exc:
                result["visits_error"] = str(exc)[:120]
        if "--no-verify" not in sys.argv:
            # Pixel-verify the kernel output against the XLA backend on
            # the real chip (tolerance as in the interpret-mode tests;
            # fails the bench on mismatch — a nonzero checksum alone
            # cannot catch Mosaic miscompiles).
            v = _verify_image(scene, cfg, dist=dist)
            result.update(v)
            if v["verify_mode"] == "cell":
                # Subpixel-leaf regime: gate on 6x6-cell means (regional
                # agreement), plus a >10%-of-pixels guard against a
                # uniform small bias that cells alone would admit.
                vw, vh = map(int, v.get(
                    "verify_wh", f"{cfg.width}x{cfg.height}").split("x"))
                npx_guard = max(vw * vh // 10, 1)
                bad = (v["verify_ncell"] > v["verify_cell_budget"]
                       or v["verify_npix"] > npx_guard)
                msg = (f"{v['verify_ncell']} cells diverge "
                       f"(maxcell {v['verify_maxcell']}, "
                       f"{v['verify_npix']} px)")
            else:
                bad = (v["verify_npix"] > v["verify_budget"]
                       or v["verify_nbig"] > v["verify_big_budget"])
                msg = (f"{v['verify_npix']} px diverge "
                       f"({v['verify_nbig']} large)")
            if bad:
                result.update(value=0.0, vs_baseline=0.0,
                              error=f"image verification failed: {msg}")
                print(json.dumps(result))
                raise SystemExit(4)
    result.update(value=round(mrays, 2), vs_baseline=round(mrays / 100.0, 3))
    print(json.dumps(result))


def _run_with_process_retries() -> int:
    """The remote TPU relay on this host occasionally wedges a process's
    backend permanently (every subsequent call returns INTERNAL); a fresh
    process re-establishes the tunnel. Retry the measurement in child
    processes and forward the JSON line."""
    import os
    import subprocess

    for _ in range(3):
        r = subprocess.run(
            [sys.executable, os.path.abspath(__file__)] + sys.argv[1:],
            env={**os.environ, "RTMM_BENCH_CHILD": "1"},
            capture_output=True, text=True)
        line = next((l for l in reversed(r.stdout.strip().splitlines())
                     if l.startswith("{")), None)
        if r.returncode == 0 and line:
            print(line)
            return 0
        # Surface the child's failure (the in-child attempt messages go
        # to its stdout; the traceback to its stderr) for diagnosis.
        print(f"--- child rc={r.returncode} stdout tail:\n"
              f"{r.stdout[-500:]}\n--- stderr tail:\n{r.stderr[-800:]}",
              file=sys.stderr)
    n = 3
    if "--config" in sys.argv:
        n = int(sys.argv[sys.argv.index("--config") + 1])
    metric = {1: "tessellated_256_lowpoly", 2: "micromesh_256_lowpoly",
              3: "primary_rays_1080p_subdiv3_micromesh",
              4: "multi_instance_6x_1080p", 5: "pathtrace_subdiv5_3bounce",
              6: "large_scene_51k_tris_1080p",
              7: "compressed_1M_tris_64M_micro_1080p",
              8: "instanced_tlas_64x_1080p",
              9: "large_scene_51k_tris_compressed_1080p",
              10: "instanced_tlas_256x_1080p",
              11: "subdiv5_direct_1080p"}.get(n, f"config_{n}")
    print(json.dumps({
        "metric": metric,
        "value": 0.0, "unit": "Mrays/s", "vs_baseline": 0.0,
        "error": "TPU backend unavailable after 3 attempts"}))
    return 1


if __name__ == "__main__":
    import os as _os

    if _os.environ.get("RTMM_BENCH_CHILD"):
        main()
    else:
        sys.exit(_run_with_process_retries())
