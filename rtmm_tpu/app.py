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
    args = parser.parse_args(argv)

    if not args.asset.startswith("proc:") and not os.path.exists(args.asset):
        print("Micro-mesh file does not exist.", file=sys.stderr)
        return 1

    mesh = load_asset(args.asset)
    print(f"loaded: {mesh.num_triangles} base triangles, "
          f"max subdivision level {mesh.max_level}, "
          f"uniform={mesh.has_uniform_subdivision_level()}")

    cfg = RenderConfig(width=args.width, height=args.height)
    t0 = time.perf_counter()
    ds = scene_mod.build_device_scene(mesh, tessellated=args.tessellated)
    print(f"scene build: {time.perf_counter() - t0:.2f}s "
          f"(mode={'tessellated' if args.tessellated else 'micromesh'})")

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
        img = renderer.render_u8(ivp)
        dt = time.perf_counter() - t0
        path = os.path.join(args.out, f"frame_{frame:04d}.png")
        image_io.write_png(path, img)
        mrays = cfg.width * cfg.height / dt / 1e6
        print(f"frame {frame}: {dt * 1e3:.1f} ms ({mrays:.1f} Mrays/s) -> {path}")
        tb.rotation_euler[1] -= np.radians(args.orbit)
    return 0


if __name__ == "__main__":
    sys.exit(main())
