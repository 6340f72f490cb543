"""Stats + scene-cache tests."""
import numpy as np

from rtmm_tpu.config import RenderConfig
from rtmm_tpu.io import loader
from rtmm_tpu.models import procedural, scene as scene_mod
from rtmm_tpu.utils import cache, camera, stats


def test_frame_stats():
    mesh = procedural.make_plane(grid=(2, 2), level=1, amplitude=0.2)
    ds = scene_mod.build_device_scene(mesh)
    cfg = RenderConfig(width=64, height=32, pipeline="tile")
    tb = camera.Trackball()
    tb.set_camera([0, 0, 0], [np.radians(-30), np.radians(20), 0], 3.0)
    fs = stats.collect_frame_stats(
        ds, camera.inv_view_proj(tb, 64, 32), cfg)
    assert fs.mrays_per_s > 0
    assert 0.0 < fs.hit_fraction < 1.0
    assert fs.candidates_max >= 1
    d = fs.as_dict()
    assert "frame_ms" in d


def test_scene_cache_roundtrip(tmp_path):
    mesh = procedural.make_plane(grid=(2, 2), level=2, amplitude=0.2,
                                 mixed_levels=True)
    asset = str(tmp_path / "a.gltf")
    loader.save_gltf_bary(mesh, asset)

    ds1 = cache.build_device_scene_cached(asset, cache_dir=str(tmp_path))
    ds2 = cache.build_device_scene_cached(asset, cache_dir=str(tmp_path))
    assert ds1.max_level == ds2.max_level
    np.testing.assert_array_equal(np.asarray(ds1.leaf_verts),
                                  np.asarray(ds2.leaf_verts))
    np.testing.assert_array_equal(np.asarray(ds1.unit_qn),
                                  np.asarray(ds2.unit_qn))
    # exactly one cache file was produced and reused
    files = [f for f in tmp_path.iterdir() if f.suffix == ".npz"]
    assert len(files) == 1


def test_cache_key_changes_with_content(tmp_path):
    mesh = procedural.make_plane(grid=(2, 2), level=1, amplitude=0.2)
    a1 = str(tmp_path / "a1.gltf")
    loader.save_gltf_bary(mesh, a1)
    mesh2 = procedural.make_plane(grid=(2, 2), level=1, amplitude=0.3)
    a2 = str(tmp_path / "a2.gltf")
    loader.save_gltf_bary(mesh2, a2)
    k1 = cache.asset_cache_key(a1, False)
    k2 = cache.asset_cache_key(a2, False)
    k3 = cache.asset_cache_key(a1, True)
    assert k1 != k2 and k1 != k3


def test_debug_render_clean_scene_passes():
    from rtmm_tpu.utils.debug import debug_render

    mesh = procedural.make_plane(grid=(2, 2), level=1, amplitude=0.2)
    ds = scene_mod.build_device_scene(mesh)
    cfg = RenderConfig(width=64, height=32)
    tb = camera.Trackball()
    tb.set_camera([0, 0, 0], [np.radians(-30), np.radians(20), 0], 3.0)
    img = debug_render(ds, camera.inv_view_proj(tb, 64, 32), cfg)
    assert np.isfinite(np.asarray(img)).all()


def test_traversal_heatmap_sums_to_stats(tmp_path):
    """The per-pixel step heatmap must sum to the frame-stats counter, be
    zero on background-only pixels away from all AABBs, and dump as a PNG."""
    mesh = procedural.make_plane(grid=(2, 2), level=2, amplitude=0.2)
    ds = scene_mod.build_device_scene(mesh)
    cfg = RenderConfig(width=64, height=32, pipeline="tile")
    tb = camera.Trackball()
    tb.set_camera([0, 0, 0], [np.radians(-30), np.radians(20), 0], 3.0)
    ivp = camera.inv_view_proj(tb, 64, 32)

    hm = stats.traversal_heatmap(ds, ivp, cfg)
    assert hm.shape == (32, 64) and hm.dtype == np.int32
    assert hm.max() > 0, "visible scene must record traversal work"
    fs = stats.collect_frame_stats(ds, ivp, cfg)
    assert fs.traversal_steps_total == int(hm.sum())

    png = str(tmp_path / "hm.png")
    stats.heatmap_to_png(png, hm)
    from rtmm_tpu.io import image
    back = image.read_png(png)
    assert back.shape == (32, 64, 3)
    # hottest pixel maps to the bright end of the gradient
    y, x = np.unravel_index(hm.argmax(), hm.shape)
    assert back[y, x].sum() > back[hm == 0].sum(-1).min()
