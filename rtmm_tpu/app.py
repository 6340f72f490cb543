"""CLI application.

Mirrors the reference entry point (src/application.cpp:333-364):
`rtmm <mesh.gltf> [-T]` — positional micro-mesh asset plus the optional
tessellated ground-truth mode. A headless TPU host has no Win32 swapchain,
so the "window" is an offline frame sequence: the trackball camera orbits
(or follows scripted input) and frames are written as PNG.

Additional flags only add capability (resolution, frame count, output dir,
procedural assets for machines without .gltf/.bary files).
"""
from __future__ import annotations

import argparse
import os
import sys
import time

import numpy as np

from .config import RenderConfig
from .io import image as image_io
from .models import procedural, scene as scene_mod
from .render.renderer import Renderer
from .utils import camera


def load_asset(path: str):
    """Load a micro-mesh: .gltf/.glb via the asset loader, or a procedural
    spec `proc:<name>?key=val,...` (e.g. proc:plane?level=3)."""
    if path.startswith("proc:"):
        spec = path[5:]
        name, _, args = spec.partition("?")
        kwargs = {}
        for kv in filter(None, args.split(",")):
            k, _, v = kv.partition("=")
            kwargs[k] = float(v) if "." in v else int(v)
        if name == "plane":
            lvl = int(kwargs.pop("level", 3))
            g = int(kwargs.pop("grid", 4))
            return procedural.make_plane(grid=(g, g), level=lvl, **kwargs)
        if name == "sphere":
            lvl = int(kwargs.pop("level", 3))
            sub = int(kwargs.pop("subdivisions", 1))
            return procedural.make_icosphere(subdivisions=sub, level=lvl,
                                             **kwargs)
        raise SystemExit(f"unknown procedural asset '{name}'")
    from .io import loader
    return loader.load_micromesh(path)


def main(argv=None) -> int:
    parser = argparse.ArgumentParser(
        prog="rtmm", description="TPU micro-mesh ray tracer")
    parser.add_argument("asset", help=".gltf micro-mesh or proc:<spec>")
    parser.add_argument("-T", dest="tessellated", action="store_true",
                        help="pre-tessellate and trace plain triangles "
                             "(ground-truth mode, README.md:7-12)")
    parser.add_argument("--width", type=int, default=1024)
    parser.add_argument("--height", type=int, default=1024)
    parser.add_argument("--frames", type=int, default=1)
    parser.add_argument("--orbit", type=float, default=2.0,
                        help="degrees of yaw per frame")
    parser.add_argument("--distance", type=float, default=4.0)
    parser.add_argument("--pitch", type=float, default=-30.0)
    parser.add_argument("--yaw", type=float, default=20.0)
    parser.add_argument("--out", default="frames")
    parser.add_argument("--pipeline", default="auto",
                        choices=["auto", "ray", "tile", "pallas"],
                        help="trace backend (auto: pallas on TPU, tiled XLA "
                             "on CPU)")
    parser.add_argument("--stats", action="store_true",
                        help="print per-frame traversal statistics")
    parser.add_argument("--cache", action="store_true",
                        help="cache scene precompute keyed by asset hash")
    parser.add_argument("--compressed", action="store_true",
                        help="direct-tracing scene: store only per-unit "
                             "grid-vertex records (~32 B/micro-tri) and "
                             "derive leaf geometry at trace time — the "
                             "reference's memory model; required for "
                             "assets that exceed HBM when pre-expanded "
                             "(uniform-level assets, tile/pallas only)")
    parser.add_argument("--instances", type=int, default=1,
                        help="replicate the asset in a ring of N instances "
                             "(TLAS analog demo)")
    parser.add_argument("--tlas", action="store_true",
                        help="with --instances: true two-level traversal "
                             "(per-instance ray transform into the shared "
                             "BLAS, O(scene+N) memory) instead of baking "
                             "world-space copies")
    parser.add_argument("--pathtrace", type=int, default=0, metavar="BOUNCES",
                        help="path-traced multi-bounce rendering")
    parser.add_argument("--spp", type=int, default=4,
                        help="path-tracer samples per pixel")
    parser.add_argument("--compare-t", action="store_true",
                        help="render both micro-mesh and tessellated modes "
                             "and report the image RMSE (the reference's "
                             "implicit correctness oracle)")
    parser.add_argument("--dump-bary", action="store_true",
                        help="inspect the asset's .bary container (header, "
                             "property table, group/triangle/value info) "
                             "and exit — the diagnostic for real-file "
                             "layout mismatches (see rtmm_tpu/io/FORMATS.md)")
    args = parser.parse_args(argv)

    if not args.asset.startswith("proc:") and not os.path.exists(args.asset):
        print("Micro-mesh file does not exist.", file=sys.stderr)
        return 1

    if args.dump_bary:
        from .io import bary as bary_mod
        path = args.asset
        if path.endswith((".gltf", ".glb")):
            from .io import gltf as gltf_mod
            resolved = gltf_mod.Gltf.load(path).micromap_uri()
            if not resolved:
                print("gltf has no NV displacement-micromap .bary reference",
                      file=sys.stderr)
                return 1
            path = resolved
        print(bary_mod.dump_bary(path))
        return 0

    cfg = RenderConfig(width=args.width, height=args.height,
                       pipeline=args.pipeline)
    # The per-node hierarchy tables feed only the per-ray reference backend
    # (pipeline=ray) and the --stats step-count heatmap; production renders
    # skip building/uploading them (~0.5 GiB HBM at 10^6 triangles).
    hierarchy = args.pipeline == "ray" or args.stats
    t0 = time.perf_counter()
    if args.cache and not args.asset.startswith("proc:"):
        from .utils.cache import build_device_scene_cached
        ds = build_device_scene_cached(args.asset,
                                       tessellated=args.tessellated,
                                       hierarchy=hierarchy,
                                       compressed=args.compressed)
    else:
        mesh = load_asset(args.asset)
        print(f"loaded: {mesh.num_triangles} base triangles, "
              f"max subdivision level {mesh.max_level}, "
              f"uniform={mesh.has_uniform_subdivision_level()}")
        ds = scene_mod.build_device_scene(mesh, tessellated=args.tessellated,
                                          hierarchy=hierarchy,
                                          compressed=args.compressed)
    print(f"scene build: {time.perf_counter() - t0:.2f}s "
          f"(mode={'tessellated' if args.tessellated else 'micromesh'})")

    instance_ring = None
    if args.instances > 1:
        from .render import instances as inst_mod
        n = args.instances
        ring = []
        for i in range(n):
            a = 2.0 * np.pi * i / n
            ring.append(inst_mod.Instance.from_euler(
                [2.2 * np.cos(a), 2.2 * np.sin(a), 0.0],
                (0.0, a, 0.0), 0.8))
        if args.tlas:
            instance_ring = ring
            print(f"instanced (two-level TLAS): {n} instances, shared BLAS")
        else:
            ds = inst_mod.bake_instances(ds, ring)
            print(f"instanced: {n} instances, "
                  f"{ds.num_triangles} triangles total")

    if args.compare_t:
        if args.cache:
            mesh = load_asset(args.asset)
        ds_t = scene_mod.build_device_scene(mesh, tessellated=True)
        tb = camera.Trackball(distance=args.distance)
        tb.set_camera([0.0, 0.0, 0.0],
                      [np.radians(args.pitch), np.radians(args.yaw), 0.0],
                      args.distance)
        ivp = camera.inv_view_proj(tb, cfg.width, cfg.height,
                                   cfg.fov_y_degrees, cfg.near, cfg.far)
        img_mm = np.asarray(Renderer(ds, cfg).render(ivp))
        img_ts = np.asarray(Renderer(ds_t, cfg).render(ivp))
        rmse = float(np.sqrt(((img_mm - img_ts) ** 2).mean()))
        npix = int((np.abs(img_mm - img_ts).max(-1) > 1e-3).sum())
        print(f"micromesh vs tessellated: RMSE={rmse:.3e}, "
              f"pixels>1e-3: {npix} of {cfg.width * cfg.height} "
              f"({'PASS' if rmse <= 1e-3 else 'FAIL'} at 1e-3)")
        return 0 if rmse <= 1e-3 else 2

    if args.pathtrace > 0:
        import dataclasses

        from .render.pathtrace import PathTraceConfig, PathTracer
        # 8 sub-frusta measured ~14% faster for path tracing (silhouette
        # sub-tiles dominate the primary trace there); 4 stays the
        # primary-render default. See PERF.md.
        renderer = PathTracer(ds, dataclasses.replace(cfg, sub_frusta=8),
                              PathTraceConfig(
            bounces=args.pathtrace, samples_per_pixel=args.spp))
    elif instance_ring is not None:
        from .render import instances as inst_mod
        renderer = inst_mod.InstancedRenderer(ds, instance_ring, cfg)
    else:
        renderer = Renderer(ds, cfg)
    tb = camera.Trackball(distance=args.distance)
    tb.set_camera([0.0, 0.0, 0.0],
                  [np.radians(args.pitch), np.radians(args.yaw), 0.0],
                  args.distance)

    os.makedirs(args.out, exist_ok=True)
    for frame in range(args.frames):
        ivp = camera.inv_view_proj(tb, cfg.width, cfg.height,
                                   cfg.fov_y_degrees, cfg.near, cfg.far)
        t0 = time.perf_counter()
        if args.pathtrace > 0:
            img, pt_stats = renderer.render(ivp)
            img = (np.clip(np.asarray(img), 0.0, 1.0) * 255.0 + 0.5
                   ).astype(np.uint8)
        else:
            img = renderer.render_u8(ivp)
        dt = time.perf_counter() - t0
        path = os.path.join(args.out, f"frame_{frame:04d}.png")
        image_io.write_png(path, img)
        mrays = cfg.width * cfg.height / dt / 1e6
        print(f"frame {frame}: {dt * 1e3:.1f} ms ({mrays:.1f} Mrays/s) -> {path}")
        if args.stats and args.pathtrace == 0:
            from .utils import stats as stats_mod
            # Traversal-divergence heatmap (SURVEY §5): per-pixel step
            # counts (computed once; reused for the stats summary).
            hm = stats_mod.traversal_heatmap(ds, ivp, cfg)
            print("  stats:",
                  stats_mod.collect_frame_stats(ds, ivp, cfg,
                                                heatmap=hm).as_dict())
            hm_path = os.path.join(args.out, f"heatmap_{frame:04d}.png")
            stats_mod.heatmap_to_png(hm_path, hm)
            print(f"  heatmap: max {int(hm.max())} steps/ray -> {hm_path}")
            from .render.renderer import _resolve_pipeline
            if args.instances <= 1 and _resolve_pipeline(cfg, ds) == "pallas":
                # Exact in-kernel (tile, unit) MXU-step counts (row-3
                # counter of the Pallas trace kernel). Only when the pallas
                # pipeline is in use: on the ray/tile pipelines this would
                # run a whole extra (interpret-mode on CPU — very slow)
                # kernel trace per frame just for the counter.
                import jax.numpy as jnp

                from .ops.pallas_tiled import render_pallas
                _img, kst = render_pallas(ds, jnp.asarray(ivp), cfg,
                                          with_stats=True)
                kv = np.asarray(kst["kernel_unit_visits"])
                ke = np.asarray(kst["kernel_unit_eligible"])
                print(f"  kernel visits: {int(kv.sum())} (tile,unit) steps"
                      f" of {int(ke.sum())} eligible"
                      f" (slab pre-test skipped"
                      f" {int(ke.sum()) - int(kv.sum())}),"
                      f" max/tile {int(kv.max())},"
                      f" nonempty tiles {int((kv > 0).sum())}")
        elif args.stats:
            print("  live rays/bounce:",
                  np.asarray(pt_stats["live_rays_per_bounce"]).tolist())
        tb.rotation_euler[1] -= np.radians(args.orbit)
    return 0


if __name__ == "__main__":
    sys.exit(main())
