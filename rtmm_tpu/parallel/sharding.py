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


@dataclasses.dataclass
class ShardedRenderer:
    """jit-compiled multi-chip frame renderer."""

    scene: DeviceScene
    cfg: RenderConfig
    mesh: Mesh

    def __post_init__(self):
        self._fn = jax.jit(functools.partial(
            render_sharded, cfg=self.cfg, mesh=self.mesh))

    def render(self, inv_view_proj: np.ndarray) -> jax.Array:
        return self._fn(self.scene, jnp.asarray(inv_view_proj, jnp.float32))
