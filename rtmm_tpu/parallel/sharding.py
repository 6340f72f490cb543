"""Multi-chip rendering: shard rays and scene over a jax.sharding.Mesh.

The reference is strictly single-GPU (SURVEY.md §2.4); its only "backend" is
D3D12 upload/readback. The TPU-native scaling story is a 2D device mesh:

  axis "rays"  — data-parallel pixel rows (embarrassingly parallel, no
                 comms; the dominant axis),
  axis "scene" — the base-triangle tables sharded across chips (model-
                 parallel analog for scenes larger than one chip's HBM);
                 per-ray closest hits are combined with an all_gather +
                 min-reduce across this axis (rides ICI, one small
                 collective per frame).

Everything is expressed with shard_map over a Mesh so XLA inserts the
collectives; the same code runs on a virtual CPU mesh for tests.
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
from ..ops import raygen, shading, traversal

BIG = jnp.float32(1e30)


def make_mesh(n_rays: int | None = None, n_scene: int = 1,
              devices=None) -> Mesh:
    devices = devices if devices is not None else jax.devices()
    if n_rays is None:
        n_rays = len(devices) // n_scene
    dev = np.asarray(devices[:n_rays * n_scene]).reshape(n_rays, n_scene)
    return Mesh(dev, ("rays", "scene"))


def _scene_specs(scene: DeviceScene):
    """PartitionSpec pytree: every per-triangle table sharded on axis 0 over
    'scene', replicated over 'rays'."""
    return jax.tree.map(lambda _: P("scene"), scene)


def render_sharded(scene: DeviceScene, inv_view_proj: jax.Array,
                   cfg: RenderConfig, mesh: Mesh) -> jax.Array:
    """Render one frame over the device mesh. Returns (H, W, 3) float32.

    Requires cfg.height divisible by the 'rays' axis size and the padded
    triangle count divisible by the 'scene' axis size.
    """
    n_rays_axis = mesh.shape["rays"]
    n_scene_axis = mesh.shape["scene"]
    if cfg.height % n_rays_axis:
        raise ValueError("height must divide over the 'rays' axis")
    if scene.num_triangles % n_scene_axis:
        raise ValueError("triangle padding must divide over the 'scene' axis")

    @functools.partial(
        jax.shard_map, mesh=mesh,
        in_specs=(_scene_specs(scene), P()),
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


def render_tiled_gspmd(scene: DeviceScene, inv_view_proj: jax.Array,
                       cfg: RenderConfig, mesh: Mesh) -> jax.Array:
    """Data-parallel tiled rendering via GSPMD sharding annotations.

    The idiomatic single-axis scaling path: the per-tile trace is a dense
    computation over the tile dimension, so sharding the per-tile inputs
    over the 'rays' mesh axis and letting XLA partition is sufficient — no
    collectives in the render at all (the scene tables are replicated).
    Used when the mesh has no 'scene' axis; the shard_map path above
    handles scene-sharded tracing with its closest-hit combine.
    """
    from ..ops import culling, tiled
    from ..ops.tiled import TILE

    width, height = cfg.width, cfg.height
    pw, ph = tiled.padded_size(width, height)
    tx, ty = pw // culling.TILE_W, ph // culling.TILE_H
    n_tiles = tx * ty
    n_dev = mesh.shape["rays"]
    if n_tiles % n_dev:
        raise ValueError("tile count must divide over the 'rays' axis")

    raymat, q_frame, cand, count, _entry, dirs = tiled.build_frame_inputs(
        scene, inv_view_proj, cfg)
    shard = jax.NamedSharding(mesh, P("rays"))
    raymat = jax.lax.with_sharding_constraint(raymat, shard)
    cand = jax.lax.with_sharding_constraint(cand, shard)
    count = jax.lax.with_sharding_constraint(count, shard)
    dirs = jax.lax.with_sharding_constraint(dirs, shard)

    c_max = cand.shape[1]

    def body(c, carry):
        best_t, best_n = carry
        tb, nb = tiled.trace_candidate(scene, raymat, q_frame, cand[:, c],
                                       c < count, cfg)
        take = tb < best_t
        return (jnp.where(take, tb, best_t),
                jnp.where(take[..., None], nb, best_n))

    init = (jnp.full((n_tiles, TILE), BIG, jnp.float32),
            jnp.zeros((n_tiles, TILE, 3), jnp.float32))
    best_t, best_n = jax.lax.fori_loop(0, c_max, body, init)
    hit = best_t < BIG
    nrm = best_n / jnp.maximum(
        jnp.linalg.norm(best_n, axis=-1, keepdims=True), 1e-20)
    colors = shading.shade_or_miss(hit, nrm, -dirs, cfg)
    img = (colors.reshape(ty, tx, culling.TILE_H, culling.TILE_W, 3)
           .transpose(0, 2, 1, 3, 4).reshape(ph, pw, 3))
    return img[:height, :width]


@dataclasses.dataclass
class ShardedRenderer:
    """jit-compiled multi-chip frame renderer."""

    scene: DeviceScene
    cfg: RenderConfig
    mesh: Mesh

    pipeline: str = "auto"   # "ray" (shard_map) | "tile" (GSPMD) | "auto"

    def __post_init__(self):
        from ..ops import culling, tiled

        pw, ph = tiled.padded_size(self.cfg.width, self.cfg.height)
        n_tiles = (pw // culling.TILE_W) * (ph // culling.TILE_H)
        divisible = n_tiles % self.mesh.shape["rays"] == 0
        use_tile = (self.pipeline == "tile"
                    or (self.pipeline == "auto"
                        and self.mesh.shape["scene"] == 1
                        and divisible))
        fn = render_tiled_gspmd if use_tile else render_sharded
        self._fn = jax.jit(functools.partial(
            fn, cfg=self.cfg, mesh=self.mesh), keep_unused=True)

    def render(self, inv_view_proj: np.ndarray) -> jax.Array:
        return self._fn(self.scene, jnp.asarray(inv_view_proj, jnp.float32))
