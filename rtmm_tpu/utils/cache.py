"""Scene precompute disk cache.

The reference's only persisted artifact is the input asset (SURVEY §5:
checkpoint/resume = none). Our scene precompute (scales/minmax/deltas/leaf
expansion) is the slow cold path, so DeviceScene arrays are cached to disk
keyed by (asset bytes hash, build options, format version).
"""
from __future__ import annotations

import dataclasses
import hashlib
import os

import jax
import numpy as np

from ..models.scene import DeviceScene

# Part of the cache key: bump whenever the DeviceScene schema changes so
# stale files are orphaned instead of loaded into the new dataclass.
# v4: unit_q -> unit_qn, cluster hierarchy tables, unit_leaf_idx.
FORMAT_VERSION = 4


def asset_cache_key(path: str, tessellated: bool) -> str:
    h = hashlib.sha256()
    h.update(f"v{FORMAT_VERSION}:tess={tessellated}:".encode())
    with open(path, "rb") as f:
        h.update(f.read())
    # Sibling .bary travels with the gltf.
    bary = os.path.splitext(path)[0] + ".bary"
    if os.path.exists(bary):
        with open(bary, "rb") as f:
            h.update(f.read())
    return h.hexdigest()[:24]


def save_scene(scene: DeviceScene, cache_path: str) -> None:
    arrays = {f.name: np.asarray(getattr(scene, f.name))
              for f in dataclasses.fields(scene) if f.name != "max_level"}
    os.makedirs(os.path.dirname(cache_path) or ".", exist_ok=True)
    np.savez_compressed(cache_path, max_level=scene.max_level, **arrays)


def load_scene(cache_path: str) -> DeviceScene:
    z = np.load(cache_path)
    kwargs = {k: jax.device_put(z[k]) for k in z.files if k != "max_level"}
    return DeviceScene(max_level=int(z["max_level"]), **kwargs)


def build_device_scene_cached(asset_path: str, tessellated: bool = False,
                              cache_dir: str | None = None) -> DeviceScene:
    """Load an asset with precompute caching (keyed by content hash)."""
    from ..io import loader
    from ..models.scene import build_device_scene

    cache_dir = cache_dir or os.path.join(
        os.path.expanduser("~"), ".cache", "rtmm_tpu")
    key = asset_cache_key(asset_path, tessellated)
    cache_path = os.path.join(cache_dir, f"{key}.npz")
    if os.path.exists(cache_path):
        try:
            return load_scene(cache_path)
        except (TypeError, KeyError, ValueError, OSError):
            pass    # stale or corrupt cache file: rebuild it below
    mesh = loader.load_micromesh(asset_path)
    scene = build_device_scene(mesh, tessellated=tessellated)
    save_scene(scene, cache_path)
    return scene
