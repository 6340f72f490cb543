"""Multi-chip rendering: shard rays and scene over a jax.sharding.Mesh.

The reference is strictly single-GPU (SURVEY.md §2.4); its only "backend" is
D3D12 upload/readback. The TPU-native scaling story is a 2D device mesh:

  axis "rays"  — data-parallel pixel rows (embarrassingly parallel, no
                 comms; the dominant axis),
  axis "scene" — the scene tables sharded across chips (model-parallel
                 analog for scenes larger than one chip's HBM); per-ray
                 closest hits are combined with an all_gather + min-reduce
                 across this axis (rides ICI, one small collective per
                 frame).

Three pipelines:
  * render_sharded       — per-ray reference path, rays x scene shard_map;
  * render_tiled_gspmd   — rays-only GSPMD annotation of the tiled/MXU
                           path (no collectives at all);
  * render_tiled_sharded — the tiled/MXU path under shard_map with BOTH
                           axes: tiles split over "rays", clusters + unit
                           tables split over "scene", windowed trace per
                           shard, then the closest-hit min-combine.

Everything is expressed so XLA inserts the collectives; the same code runs
on a virtual CPU mesh for tests.
"""
from __future__ import annotations

import dataclasses
import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, PartitionSpec as P

from ..config import RenderConfig
from ..models.scene import DeviceScene
from ..ops import culling, pallas_tiled, raygen, shading, tiled, traversal
from ..ops.tiled import TILE

BIG = jnp.float32(1e30)


def make_mesh(n_rays: int | None = None, n_scene: int = 1,
              devices=None) -> Mesh:
    devices = devices if devices is not None else jax.devices()
    if n_rays is None:
        n_rays = len(devices) // n_scene
    dev = np.asarray(devices[:n_rays * n_scene]).reshape(n_rays, n_scene)
    return Mesh(dev, ("rays", "scene"))


_UNIT_FIELDS = ("unit_aabb_min", "unit_aabb_max", "unit_valid", "unit_leaf_idx",
                "unit_qn", "unit_n", "unit_e2w2", "unit_nrm", "unit_nrm_pad",
                "unit_q16", "unit_grid")
_CLUSTER_FIELDS = ("cluster_aabb_min", "cluster_aabb_max", "cluster_valid",
                   "cluster_unit_meta")


def _scene_specs(scene: DeviceScene, n_scene: int):
    """PartitionSpec pytree: tables sharded on axis 0 over 'scene',
    replicated over 'rays'.

    Every big table family splits when its size divides the axis; the tiny
    cluster tables (C x 3 floats) replicate whenever C doesn't divide —
    the per-ray path never reads them and the tiled path pads the scene to
    divisibility first (_pad_scene_for_scene_axis).
    """
    u_ok = scene.num_units % n_scene == 0
    c_ok = scene.num_clusters % n_scene == 0
    specs = {}
    meta = {f.name for f in dataclasses.fields(scene)
            if f.name in ("max_level", "compressed", "sub_level",
                          "indexed")}
    for f in dataclasses.fields(scene):
        if f.name in meta or getattr(scene, f.name) is None:
            continue   # optional tables absent from this build: stay None
        if f.name in _CLUSTER_FIELDS:
            specs[f.name] = P("scene") if c_ok else P()
        elif f.name in _UNIT_FIELDS:
            specs[f.name] = P("scene") if u_ok else P()
        elif f.name == "unit_gmat":
            # Shared gather matrix (GRID_LANES x 3*LPU), one per scene —
            # NOT a per-unit table: every shard derives its local units
            # against the full matrix, so it must replicate.
            specs[f.name] = P()
        else:
            specs[f.name] = P("scene")
    return dataclasses.replace(
        jax.tree.map(lambda _: P(), scene), **specs)


def _pad_scene_for_scene_axis(scene: DeviceScene, s: int) -> DeviceScene:
    """Pad unit + cluster tables with invalid entries so whole clusters
    split evenly over the scene axis (each shard keeps aligned
    cluster -> unit ranges)."""
    n_cl = scene.num_clusters
    pad_cl = (-n_cl) % s
    if pad_cl == 0:
        return scene
    upc = culling.UNITS_PER_CLUSTER
    updates = {}
    for name in _UNIT_FIELDS + _CLUSTER_FIELDS:
        a = getattr(scene, name)
        if a is None:
            continue
        n = pad_cl * (upc if name in _UNIT_FIELDS else 1)
        fill = (BIG if name.endswith("aabb_min")
                else -BIG if name.endswith("aabb_max")
                else -1 if name == "unit_leaf_idx"   # -1 = no-leaf sentinel
                else 0)
        pads = ((0, n),) + ((0, 0),) * (a.ndim - 1)
        updates[name] = jnp.pad(a, pads, constant_values=fill)
    return dataclasses.replace(scene, **updates)


def _check_divisible(scene: DeviceScene, n_scene_axis: int) -> None:
    if scene.num_triangles % n_scene_axis:
        raise ValueError("triangle padding must divide over the 'scene' axis")


def render_sharded(scene: DeviceScene, inv_view_proj: jax.Array,
                   cfg: RenderConfig, mesh: Mesh) -> jax.Array:
    """Per-ray reference path over the device mesh. Returns (H, W, 3).

    Requires cfg.height divisible by the 'rays' axis size and the padded
    triangle count divisible by the 'scene' axis size.
    """
    n_rays_axis = mesh.shape["rays"]
    n_scene_axis = mesh.shape["scene"]
    if cfg.height % n_rays_axis:
        raise ValueError("height must divide over the 'rays' axis")
    _check_divisible(scene, n_scene_axis)

    @functools.partial(
        jax.shard_map, mesh=mesh,
        in_specs=(_scene_specs(scene, n_scene_axis), P()),
        out_specs=P("rays"),
        check_vma=False)
    def step(scene_shard: DeviceScene, ivp: jax.Array) -> jax.Array:
        height_local = cfg.height // n_rays_axis
        row0 = jax.lax.axis_index("rays") * height_local
        # Raygen for the full frame is cheap, but we only need our rows:
        # generate the full grid and slice — XLA DCEs the unused rows.
        o_all, d_all = raygen.generate_rays(ivp, cfg.width, cfg.height)
        o = jax.lax.dynamic_slice_in_dim(
            o_all, row0 * cfg.width, height_local * cfg.width, 0)
        d = jax.lax.dynamic_slice_in_dim(
            d_all, row0 * cfg.width, height_local * cfg.width, 0)

        t, nrm, hit = traversal.trace(scene_shard, o, d, cfg)
        tt = jnp.where(hit, t, BIG)

        if n_scene_axis > 1:
            # Closest-hit combine across the scene shards (ICI collective).
            tt_all = jax.lax.all_gather(tt, "scene")       # (S, n)
            n_all = jax.lax.all_gather(nrm, "scene")       # (S, n, 3)
            best = jnp.argmin(tt_all, axis=0)              # (n,)
            tt = jnp.take_along_axis(tt_all, best[None], 0)[0]
            nrm = jnp.take_along_axis(n_all, best[None, :, None], 0)[0]
            hit = tt < BIG

        color = shading.shade_or_miss(hit, nrm, -d, cfg)
        return color.reshape(height_local, cfg.width, 3)

    return step(scene, jnp.asarray(inv_view_proj, jnp.float32))


def _xla_trace_window(scene, raymat, q_frame, cfg, apex=None):
    """Unchunked XLA window tracer (for GSPMD / shard_map bodies)."""

    def trace_window(cand, count, entry, best_t, best_n):
        c_max = cand.shape[1]

        def body(c, carry):
            bt, bn = carry
            tb, nb = tiled.trace_candidate(scene, raymat, q_frame,
                                           cand[:, c], c < count, cfg,
                                           apex=apex)
            take = tb < bt
            return (jnp.where(take, tb, bt),
                    jnp.where(take[..., None], nb, bn))

        return jax.lax.fori_loop(0, c_max, body, (best_t, best_n))

    return trace_window


def render_tiled_gspmd(scene: DeviceScene, inv_view_proj: jax.Array,
                       cfg: RenderConfig, mesh: Mesh) -> jax.Array:
    """Data-parallel tiled rendering via GSPMD sharding annotations.

    The idiomatic single-axis scaling path: the windowed per-tile trace is
    a dense computation over the tile dimension, so sharding the per-tile
    inputs over the 'rays' mesh axis and letting XLA partition is
    sufficient — no collectives in the render at all (the scene tables are
    replicated). Used when the mesh has no 'scene' axis; the shard_map
    paths handle scene-sharded tracing with their closest-hit combine.
    """
    width, height = cfg.width, cfg.height
    pw, ph = tiled.padded_size(width, height)
    tx, ty = pw // culling.TILE_W, ph // culling.TILE_H
    n_tiles = tx * ty
    n_dev = mesh.shape["rays"]
    if n_tiles % n_dev:
        raise ValueError("tile count must divide over the 'rays' axis")

    fi = tiled.build_frame_inputs(scene, inv_view_proj, cfg)
    shard = jax.NamedSharding(mesh, P("rays"))
    fi = fi._replace(
        raymat=jax.lax.with_sharding_constraint(fi.raymat, shard),
        dirs=jax.lax.with_sharding_constraint(fi.dirs, shard),
        normals=jax.lax.with_sharding_constraint(fi.normals, shard),
        cluster_hit=jax.lax.with_sharding_constraint(fi.cluster_hit, shard))

    init = (jnp.full((n_tiles, TILE), BIG, jnp.float32),
            jnp.zeros((n_tiles, TILE, 3), jnp.float32))
    best_t, best_n = tiled.trace_windowed(
        scene, fi, cfg,
        _xla_trace_window(scene, fi.raymat, fi.q_frame, cfg), *init)
    hit = best_t < BIG
    nrm = best_n / jnp.maximum(
        jnp.linalg.norm(best_n, axis=-1, keepdims=True), 1e-20)
    colors = shading.shade_or_miss(hit, nrm, -fi.dirs, cfg)
    img = (colors.reshape(ty, tx, culling.TILE_H, culling.TILE_W, 3)
           .transpose(0, 2, 1, 3, 4).reshape(ph, pw, 3))
    return img[:height, :width]


def render_tiled_sharded(scene: DeviceScene, inv_view_proj: jax.Array,
                         cfg: RenderConfig, mesh: Mesh,
                         backend: str = "auto") -> jax.Array:
    """Tiled/MXU pipeline over BOTH mesh axes via shard_map.

    Pixel tiles (flat tile index) split over 'rays'; clusters + unit tables
    split over 'scene' (each shard culls and traces only its slice of the
    scene's units — the scene-too-big-for-one-chip case). Per-tile closest
    hits are min-combined across the scene axis with one all_gather per
    frame, then shaded locally. Numerics match the single-chip tiled path
    (same MXU-form Möller-Trumbore, same window machinery).

    Works for ANY frame size: each shard traces a contiguous window of
    ceil(n_tiles / n_rays) flat tiles with the window start clamped to the
    frame, so when tile count doesn't divide the 'rays' axis the trailing
    shards re-trace a few overlap tiles (identical values) instead of the
    renderer refusing the mesh; the image is reassembled by explicit tile
    index on the host side of the shard_map.

    backend: "pallas" runs the PRODUCTION kernel per shard (each shard's
    pallas_call walks its local cluster slice in-kernel; interpret mode on
    CPU meshes, Mosaic on TPU); "xla" runs the XLA window tracer;
    "auto" = pallas on TPU, xla on CPU (compiling the real kernel is what
    a multi-chip deployment does — a scene sharded because it exceeds one
    chip must not fall back to the slow tracer).
    """
    width, height = cfg.width, cfg.height
    pw, ph = tiled.padded_size(width, height)
    tx, ty = pw // culling.TILE_W, ph // culling.TILE_H
    n_tiles = tx * ty
    n_rays_axis = mesh.shape["rays"]
    n_scene_axis = mesh.shape["scene"]
    _check_divisible(scene, n_scene_axis)
    scene = _pad_scene_for_scene_axis(scene, n_scene_axis)
    platform = mesh.devices.flat[0].platform
    if backend == "auto":
        backend = "xla" if platform == "cpu" else "pallas"
    interpret = platform == "cpu"
    # Tiles per shard; window starts clamp so every window stays in-frame.
    n_tiles_local = -(-n_tiles // n_rays_axis)
    starts = np.minimum(np.arange(n_rays_axis) * n_tiles_local,
                        n_tiles - n_tiles_local)

    @functools.partial(
        jax.shard_map, mesh=mesh,
        in_specs=(_scene_specs(scene, n_scene_axis), P()),
        out_specs=P("rays"),
        check_vma=False)
    def step(scene_shard: DeviceScene, ivp: jax.Array) -> jax.Array:
        tile0 = jnp.minimum(jax.lax.axis_index("rays") * n_tiles_local,
                            n_tiles - n_tiles_local)

        # Full-frame frustums + rays, sliced to this shard's tile rows.
        apex, normals = culling.tile_frustums(ivp, width, height, pw, ph)
        normals = jax.lax.dynamic_slice_in_dim(normals, tile0,
                                               n_tiles_local, 0)
        origins, dirs = raygen.generate_rays(ivp, width, height, pw, ph)

        def to_tiles(x):
            x = (x.reshape(ty, culling.TILE_H, tx, culling.TILE_W, 3)
                 .transpose(0, 2, 1, 3, 4).reshape(ty * tx, TILE, 3))
            return jax.lax.dynamic_slice_in_dim(x, tile0, n_tiles_local, 0)

        dirs = to_tiles(dirs)
        origins = to_tiles(origins)
        m = jnp.cross(jnp.broadcast_to(apex, dirs.shape), dirs)
        s = ((origins - apex) * dirs).sum(-1)
        raymat = jnp.concatenate(
            [dirs, m, s[..., None], jnp.ones_like(s)[..., None]], axis=-1)

        # Shard-local coarse cull + q table (this shard's clusters/units).
        cluster_hit = culling.cull_units(
            apex, normals, scene_shard.cluster_aabb_min,
            scene_shard.cluster_aabb_max, scene_shard.cluster_valid)
        if scene_shard.compressed or backend != "xla":
            t_num = q_frame = None
        else:
            lpu = scene_shard.leaves_per_unit
            t_num = tiled.frame_t_num(scene_shard, apex)
            q_frame = (scene_shard.unit_qn
                       .at[:, 7, 3 * lpu:4 * lpu].set(t_num))

        if backend == "pallas":
            # The PRODUCTION kernel per shard: its in-kernel cluster walk
            # runs over this shard's local cluster slice (ccand indices
            # are shard-local, as are the meta/q tables it DMAs).
            sub_normals = culling.tile_sub_frustums(
                ivp, width, height, pw, ph, n_sub=cfg.sub_frusta,
                n_rows=cfg.sub_rows)
            sub_normals = jax.lax.dynamic_slice_in_dim(
                sub_normals, tile0, n_tiles_local, 0)
            fi = tiled.FrameInputs(raymat, None, dirs, apex, normals,
                                   cluster_hit, sub_normals, None,
                                   tiled.scene_exit_aabb(scene_shard))
            raymat_t = raymat.transpose(0, 2, 1)
            frus = tiled.frustum_scalars(fi)
            kc = max(1, min(cfg.kernel_clusters_per_window,
                            scene_shard.num_clusters))

            def trace_window(ccand, ccount, centry, bt, bn):
                return pallas_tiled.trace_pallas(
                    scene_shard, raymat_t, frus, ccand, ccount,
                    centry, bt, bn, cfg, interpret=interpret)

            init = (jnp.full((n_tiles_local, TILE), BIG, jnp.float32),
                    jnp.zeros((n_tiles_local, 8, TILE), jnp.float32))
            best_t, rows = tiled.trace_windowed_clusters(
                scene_shard, fi, cfg, trace_window, *init, kc=kc)
            best_n = rows[:, 0:3].transpose(0, 2, 1)
        else:
            fi = tiled.FrameInputs(raymat, q_frame, dirs, apex, normals,
                                   cluster_hit)
            init = (jnp.full((n_tiles_local, TILE), BIG, jnp.float32),
                    jnp.zeros((n_tiles_local, TILE, 3), jnp.float32))
            best_t, best_n = tiled.trace_windowed(
                scene_shard, fi, cfg,
                _xla_trace_window(scene_shard, raymat, q_frame, cfg,
                                  apex=apex), *init)

        if n_scene_axis > 1:
            # Closest-hit combine across scene shards (ICI collective).
            t_all = jax.lax.all_gather(best_t, "scene")    # (S, nt, TILE)
            n_all = jax.lax.all_gather(best_n, "scene")
            best = jnp.argmin(t_all, axis=0)
            best_t = jnp.take_along_axis(t_all, best[None], 0)[0]
            best_n = jnp.take_along_axis(
                n_all, best[None, ..., None], 0)[0]

        hit = best_t < BIG
        nrm = best_n / jnp.maximum(
            jnp.linalg.norm(best_n, axis=-1, keepdims=True), 1e-20)
        colors = shading.shade_or_miss(hit, nrm, -dirs, cfg)
        return colors.reshape(n_tiles_local, TILE, 3)

    tiles_out = step(scene, jnp.asarray(inv_view_proj, jnp.float32))
    # Reassemble by explicit tile index (overlap windows write identical
    # values, so duplicate scatter indices are benign).
    idx = (starts[:, None] + np.arange(n_tiles_local)[None, :]).reshape(-1)
    full = jnp.zeros((n_tiles, TILE, 3), tiles_out.dtype).at[idx].set(
        tiles_out.reshape(-1, TILE, 3))
    img = (full.reshape(ty, tx, culling.TILE_H, culling.TILE_W, 3)
           .transpose(0, 2, 1, 3, 4).reshape(ph, pw, 3))
    return img[:height, :width]


@dataclasses.dataclass
class ShardedRenderer:
    """jit-compiled multi-chip frame renderer."""

    scene: DeviceScene
    cfg: RenderConfig
    mesh: Mesh

    pipeline: str = "auto"   # "ray" (shard_map) | "tile" | "auto"
    backend: str = "auto"    # tiled-sharded body: "pallas" | "xla" | "auto"

    # Resolved after construction — which render path actually compiled.
    # "tile-gspmd" | "tile-sharded" | "ray"; chosen_backend is the resolved
    # tiled-sharded kernel ("pallas" | "xla", None otherwise). A caller that
    # requires the production kernel (e.g. the driver dryrun) asserts these
    # instead of trusting defaults — no silent downgrades.
    chosen_pipeline: str = dataclasses.field(init=False, default="")
    chosen_backend: str | None = dataclasses.field(init=False, default=None)

    def __post_init__(self):
        from ..ops import pallas_tiled
        self.cfg = pallas_tiled.resolve_mt_precision(self.scene, self.cfg)
        pw, ph = tiled.padded_size(self.cfg.width, self.cfg.height)
        tx = pw // culling.TILE_W
        ty = ph // culling.TILE_H
        n_rays = self.mesh.shape["rays"]
        n_scene = self.mesh.shape["scene"]
        gspmd_ok = n_scene == 1 and (tx * ty) % n_rays == 0
        sharded_ok = self.scene.num_triangles % n_scene == 0
        use_tile = (self.pipeline == "tile"
                    or (self.pipeline == "auto"
                        and (gspmd_ok or sharded_ok)))
        if self.pipeline == "tile" and not (gspmd_ok or sharded_ok):
            raise ValueError(
                "pipeline='tile' requested but neither the GSPMD nor the "
                "shard_map tiled path fits this mesh (triangle padding "
                f"{self.scene.num_triangles} % scene axis {n_scene} != 0)")
        if use_tile:
            if gspmd_ok and self.backend != "pallas":
                self.chosen_pipeline = "tile-gspmd"
                fn = functools.partial(render_tiled_gspmd, cfg=self.cfg,
                                       mesh=self.mesh)
            else:
                self.chosen_pipeline = "tile-sharded"
                platform = self.mesh.devices.flat[0].platform
                self.chosen_backend = (self.backend if self.backend != "auto"
                                       else ("xla" if platform == "cpu"
                                             else "pallas"))
                fn = functools.partial(render_tiled_sharded, cfg=self.cfg,
                                       mesh=self.mesh, backend=self.backend)
        else:
            self.chosen_pipeline = "ray"
            fn = functools.partial(render_sharded, cfg=self.cfg,
                                   mesh=self.mesh)
        self._fn = jax.jit(fn, keep_unused=True)

    def render(self, inv_view_proj: np.ndarray) -> jax.Array:
        return self._fn(self.scene, jnp.asarray(inv_view_proj, jnp.float32))
