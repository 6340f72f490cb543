"""Tiled + Pallas pipeline tests: all three backends must agree.

The per-ray pipeline (traversal.py) is the semantics reference; the tiled
XLA path and the Pallas kernel (interpret mode on CPU) must reproduce it.
"""
import jax.numpy as jnp
import numpy as np
import pytest

from rtmm_tpu.config import RenderConfig
from rtmm_tpu.models import procedural, scene as scene_mod
from rtmm_tpu.ops import culling
from rtmm_tpu.ops.pallas_tiled import render_pallas
from rtmm_tpu.render.renderer import Renderer
from rtmm_tpu.utils import camera


def _ivp(w, h, pitch=-35.0, yaw=25.0, dist=3.0):
    tb = camera.Trackball()
    tb.set_camera([0, 0, 0], [np.radians(pitch), np.radians(yaw), 0.0], dist)
    return camera.inv_view_proj(tb, w, h)


@pytest.fixture(scope="module")
def sphere_scene():
    mesh = procedural.make_icosphere(subdivisions=0, level=2, amplitude=0.1)
    return scene_mod.build_device_scene(mesh)


@pytest.fixture(scope="module")
def mixed_scene():
    mesh = procedural.make_plane(grid=(2, 2), level=2, amplitude=0.25,
                                 mixed_levels=True)
    return scene_mod.build_device_scene(mesh)


def _compare(ds, w, h, rtol=1e-3):
    ivp = _ivp(w, h)
    ray = np.asarray(Renderer(ds, RenderConfig(
        width=w, height=h, pipeline="ray", max_candidates=8,
        ray_chunk=4096)).render(ivp))
    tile = np.asarray(Renderer(ds, RenderConfig(
        width=w, height=h, pipeline="tile")).render(ivp))
    npix = (np.abs(ray - tile).max(-1) > rtol).sum()
    assert npix == 0, f"tile differs on {npix} pixels"
    return ivp, tile


def test_tile_matches_ray_sphere(sphere_scene):
    _compare(sphere_scene, 256, 144)


def test_tile_matches_ray_odd_size(sphere_scene):
    _compare(sphere_scene, 130, 52)


def test_tile_matches_ray_mixed_levels(mixed_scene):
    _compare(mixed_scene, 128, 64)


def test_pallas_interpret_matches_tile(sphere_scene):
    cfg = RenderConfig(width=128, height=64)
    ivp = _ivp(128, 64)
    tile = np.asarray(Renderer(sphere_scene, RenderConfig(
        width=128, height=64, pipeline="tile")).render(ivp))
    pal = np.asarray(render_pallas(sphere_scene, jnp.asarray(ivp), cfg,
                                   interpret=True))
    # The Pallas kernel runs its MXU products as hi/lo bf16 splits (~21-bit
    # mantissa); a handful of silhouette pixels may flip across the MT
    # epsilon boundary relative to the f32 XLA path.
    npix = (np.abs(tile - pal).max(-1) > 1e-3).sum()
    rmse = np.sqrt(((tile - pal) ** 2).mean())
    assert npix <= max(4, tile.size // 10000), f"{npix} pixels differ"
    assert rmse <= 2e-4, rmse


def test_frustum_cull_is_conservative(sphere_scene):
    """Every unit hit by some ray of a tile must appear in that tile's
    candidate mask (validated against the per-ray slab test)."""
    ds = sphere_scene
    th, tw = culling.TILE_H, culling.TILE_W
    # Frame dims padded to whole tiles so the manual per-tile reshape
    # below is exact for any RTMM_TILE_SHAPE.
    pw, ph = 2 * tw if tw >= 64 else 256, 4 * th if th >= 32 else 128
    ivp = jnp.asarray(_ivp(pw, ph))
    apex, normals = culling.tile_frustums(ivp, pw, ph, pw, ph)
    hit = np.asarray(culling.cull_units(
        apex, normals, ds.unit_aabb_min, ds.unit_aabb_max, ds.unit_valid))

    from rtmm_tpu.ops import intersect, raygen
    o, d = raygen.generate_rays(ivp, pw, ph)
    inv_dir = 1.0 / jnp.where(jnp.abs(d) < 1e-12, 1e-12, d)
    ray_hit, _ = intersect.ray_aabb(
        o[:, None], inv_dir[:, None],
        ds.unit_aabb_min[None], ds.unit_aabb_max[None])
    ray_hit = np.asarray(ray_hit & ds.unit_valid[None])
    ty, tx = ph // th, pw // tw
    per_tile = (ray_hit.reshape(ty, th, tx, tw, -1)
                .transpose(0, 2, 1, 3, 4).reshape(ty * tx, th * tw, -1)
                .any(axis=1))
    missed = per_tile & ~hit
    assert not missed.any(), f"{missed.sum()} unit-tile pairs wrongly culled"


def test_candidate_lists_compact():
    hit = jnp.asarray(np.array([[True, False, True, True],
                                [False, False, False, False]]))
    idx, count, _entry = culling.candidate_lists(hit, 3)
    assert count.tolist() == [3, 0]
    assert idx[0].tolist() == [0, 2, 3]


def test_candidate_lists_front_to_back():
    import jax.numpy as jnp2
    hit = jnp.asarray(np.array([[True, True, True]]))
    apex = jnp2.zeros(3)
    aabb_min = jnp.asarray(np.array(
        [[5.0, 0, 0], [1.0, 0, 0], [3.0, 0, 0]], np.float32))
    aabb_max = aabb_min + 0.5
    idx, count, entry = culling.candidate_lists(hit, 3, apex, aabb_min,
                                                aabb_max)
    assert idx[0].tolist() == [1, 2, 0]          # sorted by apex distance
    assert np.all(np.diff(np.asarray(entry[0])) >= 0)
    assert np.asarray(entry[0, 0]) == pytest.approx(1.0)


def test_deep_hierarchy_level4_units():
    """max_level > 3: traversal units are level-(L-3) subtree nodes; the
    tiled path must still match both the per-ray path and the tessellated
    ground truth."""
    mesh = procedural.make_plane(grid=(1, 1), level=4, amplitude=0.2)
    ds = scene_mod.build_device_scene(mesh)
    # 4 units per real level-4 triangle (unit table padded to a cluster)
    assert int(np.asarray(ds.unit_valid).sum()) == mesh.num_triangles * 4
    assert ds.num_units % 64 == 0
    assert ds.leaves_per_unit == 64
    w, h = 96, 48
    cfg_t = RenderConfig(width=w, height=h, pipeline="tile")
    tile = np.asarray(Renderer(ds, cfg_t).render(_ivp_wh(w, h)))
    tess = np.asarray(Renderer(
        scene_mod.build_device_scene(mesh, tessellated=True),
        cfg_t).render(_ivp_wh(w, h)))
    npix = (np.abs(tile - tess).max(-1) > 1e-3).sum()
    assert npix == 0, f"{npix} pixels differ vs tessellated at level 4"


def _ivp_wh(w, h, pitch=-35.0, yaw=25.0, dist=2.5):
    tb = camera.Trackball()
    tb.set_camera([0, 0, 0], [np.radians(pitch), np.radians(yaw), 0.0], dist)
    return camera.inv_view_proj(tb, w, h)


def test_deep_hierarchy_level5_pallas_interpret():
    """Subdivision level 5 (the reference's maximum, intersection.hlsl:79):
    16 units/triangle; Pallas interpret == tiled XLA."""
    mesh = procedural.make_plane(grid=(1, 1), level=5, amplitude=0.15)
    ds = scene_mod.build_device_scene(mesh)
    assert int(np.asarray(ds.unit_valid).sum()) == mesh.num_triangles * 16
    w, h = 64, 32
    cfg = RenderConfig(width=w, height=h)
    ivp = _ivp_wh(w, h)
    tile = np.asarray(Renderer(ds, RenderConfig(
        width=w, height=h, pipeline="tile")).render(ivp))
    pal = np.asarray(render_pallas(ds, jnp.asarray(ivp), cfg,
                                   interpret=True))
    npix = (np.abs(tile - pal).max(-1) > 1e-3).sum()
    rmse = np.sqrt(((tile - pal) ** 2).mean())
    assert npix <= max(4, tile.size // 10000), f"{npix} differ at level 5"
    assert rmse <= 2e-4, rmse
    # and it draws something
    bg = np.asarray(cfg.background, np.float32)
    assert (np.abs(tile - bg).max(-1) > 1e-5).mean() > 0.05


# --- scene-level hierarchy: clusters + candidate windows -------------------

def test_multi_window_equals_single_window():
    """Windowed candidate consumption never drops geometry: a forced
    one-cluster-per-window render must equal the few-window render and the
    per-ray reference (the overflow-free guarantee of the window loop)."""
    mesh = procedural.make_plane(grid=(32, 32), level=1, amplitude=0.15)
    ds = scene_mod.build_device_scene(mesh)
    assert ds.num_clusters >= 2, "need a multi-cluster scene"
    w, h = 64, 32
    ivp = _ivp(w, h, dist=2.2)
    imgs = {}
    for kc in (1, 8):
        cfg = RenderConfig(width=w, height=h, pipeline="tile",
                           clusters_per_window=kc)
        imgs[kc] = np.asarray(Renderer(ds, cfg).render(ivp))
    np.testing.assert_allclose(imgs[1], imgs[8], atol=1e-6)
    pal = np.asarray(render_pallas(
        ds, jnp.asarray(ivp),
        RenderConfig(width=w, height=h, clusters_per_window=1),
        interpret=True))
    np.testing.assert_allclose(pal, imgs[8], atol=1e-5)
    ray = np.asarray(Renderer(ds, RenderConfig(
        width=w, height=h, pipeline="ray", max_candidates=16)).render(ivp))
    rmse = np.sqrt(((imgs[1] - ray) ** 2).mean())
    assert rmse <= 1e-3, rmse


def test_large_scene_tile_matches_ray():
    """A real-scale (10k+ base triangle) scene renders through the cluster
    hierarchy with tile == per-ray agreement and zero dropped hits."""
    mesh = procedural.make_plane(grid=(72, 72), level=0, amplitude=0.08)
    assert mesh.num_triangles == 10368
    ds = scene_mod.build_device_scene(mesh)
    assert ds.num_clusters > 2
    w, h = 64, 32
    ivp = _ivp(w, h, dist=2.0)
    tile = np.asarray(Renderer(ds, RenderConfig(
        width=w, height=h, pipeline="tile")).render(ivp))
    ray = np.asarray(Renderer(ds, RenderConfig(
        width=w, height=h, pipeline="ray", max_candidates=16)).render(ivp))
    rmse = np.sqrt(((tile - ray) ** 2).mean())
    assert rmse <= 1e-3, rmse
    # visible coverage sanity: the plane fills a chunk of the frame
    bg = np.asarray(RenderConfig().background)
    assert (np.abs(tile - bg).max(-1) > 1e-5).mean() > 0.1


def test_candidate_counts_match_dense_cull():
    """candidate_counts (windowed, exact) == the dense tiles x units cull."""
    import jax

    from rtmm_tpu.ops import tiled as tiled_mod

    mesh = procedural.make_plane(grid=(8, 8), level=1, amplitude=0.1)
    ds = scene_mod.build_device_scene(mesh)
    cfg = RenderConfig(width=64, height=32, clusters_per_window=1)
    ivp = jnp.asarray(_ivp(64, 32, dist=2.2))
    counts = np.asarray(jax.jit(
        lambda s, m: tiled_mod.candidate_counts(s, m, cfg))(ds, ivp))
    pw, ph = tiled_mod.padded_size(cfg.width, cfg.height)
    apex, normals = culling.tile_frustums(ivp, cfg.width, cfg.height, pw, ph)
    dense = np.asarray(culling.cull_units(
        apex, normals, ds.unit_aabb_min, ds.unit_aabb_max,
        ds.unit_valid).sum(axis=1))
    np.testing.assert_array_equal(counts, dense)


def test_pallas_sub_frusta_8_matches_default(sphere_scene):
    """cfg.sub_frusta only changes pruning granularity, never the image:
    the 8-cone variant must reproduce the default 4-cone render exactly."""
    ivp = _ivp(128, 64)
    base = np.asarray(render_pallas(
        sphere_scene, jnp.asarray(ivp),
        RenderConfig(width=128, height=64), interpret=True))
    eight = np.asarray(render_pallas(
        sphere_scene, jnp.asarray(ivp),
        RenderConfig(width=128, height=64, sub_frusta=8), interpret=True))
    np.testing.assert_array_equal(base, eight)


def test_pallas_visit_counter(sphere_scene):
    """Row-3 kernel visit counter: image identical to the plain render,
    counts positive exactly on tiles whose frustum hits geometry."""
    ivp = _ivp(128, 64)
    cfg = RenderConfig(width=128, height=64)
    plain = np.asarray(render_pallas(sphere_scene, jnp.asarray(ivp), cfg,
                                     interpret=True))
    img, st = render_pallas(sphere_scene, jnp.asarray(ivp), cfg,
                            interpret=True, with_stats=True)
    np.testing.assert_array_equal(plain, np.asarray(img))
    visits = np.asarray(st["kernel_unit_visits"])
    from rtmm_tpu.ops import culling
    assert visits.shape == (-(-64 // culling.TILE_H),
                            -(-128 // culling.TILE_W))
    assert visits.sum() > 0
    # Any tile containing a non-background pixel must have visits > 0.
    bg = np.asarray(RenderConfig().background)
    nonbg = (np.abs(np.asarray(plain) - bg).max(-1) > 1e-3)
    hit_tiles = nonbg.reshape(64 // culling.TILE_H, culling.TILE_H,
                              128 // culling.TILE_W, culling.TILE_W
                              ).any(axis=(1, 3))
    assert hit_tiles.any()
    assert (visits[hit_tiles] > 0).all()


def test_pallas_sub_rows_2_matches_default(sphere_scene):
    """The 2x4 sub-cone grid is pruning-only: image identical to the
    default 4x1 strips."""
    ivp = _ivp(128, 64)
    base = np.asarray(render_pallas(
        sphere_scene, jnp.asarray(ivp),
        RenderConfig(width=128, height=64), interpret=True))
    grid = np.asarray(render_pallas(
        sphere_scene, jnp.asarray(ivp),
        RenderConfig(width=128, height=64, sub_frusta=8, sub_rows=2),
        interpret=True))
    np.testing.assert_array_equal(base, grid)


def test_pallas_kernel_raygen_matches_raymat(sphere_scene):
    """In-kernel raygen (fused mode) reproduces the XLA ray matrix to
    float ulps: same image as streaming the raymat table."""
    ivp = _ivp(128, 64)
    a = np.asarray(render_pallas(
        sphere_scene, jnp.asarray(ivp),
        RenderConfig(width=128, height=64, kernel_raygen=False),
        interpret=True))
    b = np.asarray(render_pallas(
        sphere_scene, jnp.asarray(ivp),
        RenderConfig(width=128, height=64, kernel_raygen=True),
        interpret=True))
    diff = np.abs(a - b).max(-1)
    assert (diff > 1e-3).sum() == 0
    assert float(np.sqrt(((a - b) ** 2).mean())) < 1e-6


def test_ray_pipeline_covers_leaf_slot_tail():
    """Regression: num_leaf_slots need not be a 256 multiple (mixed-level
    tessellated scenes, e.g. 1,008 slots at level 5) — the per-ray leaf
    loop must ceil-divide, not floor-drop the tail block."""
    mesh = procedural.make_plane(grid=(2, 2), level=5, amplitude=0.2,
                                 mixed_levels=True)
    ds = scene_mod.build_device_scene(mesh, tessellated=True)
    assert ds.num_leaf_slots > 256 and ds.num_leaf_slots % 256 != 0, \
        "scene no longer triggers the regression precondition"
    w, h = 96, 48
    ivp = _ivp(w, h, dist=2.2)
    ray = np.asarray(Renderer(ds, RenderConfig(
        width=w, height=h, pipeline="ray", max_candidates=8,
        ray_chunk=1536)).render(ivp))
    tile = np.asarray(Renderer(ds, RenderConfig(
        width=w, height=h, pipeline="tile")).render(ivp))
    npix = (np.abs(ray - tile).max(-1) > 1e-3).sum()
    assert npix == 0, f"ray pipeline differs on {npix} pixels"


def _translate_mesh(mesh, off):
    mesh.positions = (mesh.positions + off).astype(np.float32)
    for t in mesh.triangles:
        t.u_positions = (t.u_positions + off).astype(np.float32)
    return mesh


@pytest.mark.parametrize("compressed", [False, True])
def test_far_from_origin_fast3_matches_tile(compressed):
    """Recentering regression (models/scene.py::pack_units): the per-unit
    AABB-center recentering keeps every cancelling MT partial product at
    unit magnitude, so the 3-pass bf16 MXU scheme stays exact regardless
    of where the asset sits. Pre-recentering, absolute-coordinate tables
    at |p| ~ 1e3 lose ~10 product bits and fast3 renders garbage (the
    real-TPU symptom was pallas != tile on half the covered pixels of a
    10^6-triangle scene)."""
    off = np.array([710.0, -530.0, 920.0], np.float32)
    mesh = _translate_mesh(
        procedural.make_icosphere(subdivisions=0, level=2, amplitude=0.1),
        off)
    ds = scene_mod.build_device_scene(mesh, compressed=compressed)
    w, h = 128, 64
    tb = camera.Trackball()
    tb.set_camera(off.tolist(),
                  [np.radians(-35.0), np.radians(25.0), 0.0], 3.0)
    ivp = camera.inv_view_proj(tb, w, h)
    tile = np.asarray(Renderer(ds, RenderConfig(
        width=w, height=h, pipeline="tile")).render(ivp))
    assert (tile.max(-1) > 0).sum() > 300, "scene not visible; bad test"
    pal = np.asarray(render_pallas(
        ds, jnp.asarray(ivp),
        RenderConfig(width=w, height=h, mt_precision="fast3"),
        interpret=True))
    npix = (np.abs(tile - pal).max(-1) > 1e-3).sum()
    rmse = np.sqrt(((tile - pal) ** 2).mean())
    assert npix <= max(4, tile.size // 10000), f"{npix} pixels differ"
    assert rmse <= 2e-4, rmse


@pytest.mark.parametrize("compressed,mode", [(False, "1"), (True, "1"),
                                             (False, "2"), (True, "2")])
def test_pallas_paired_bitwise_identical(compressed, mode, monkeypatch):
    """RTMM_PAIRED=1 (interleaved per-pair stage issue: mm A, mm B,
    ep A, ep B — unit B's MXU matmul overlaps unit A's VPU epilogue)
    must be BITWISE identical to the sequential walk: only the issue
    order changes; the running-best fold order A-then-B is preserved.
    Mode 2 adds per-slot private moment buffers (same invariant)."""
    mesh = procedural.make_icosphere(subdivisions=1, level=3, amplitude=0.15)
    ds = scene_mod.build_device_scene(mesh, compressed=compressed)
    ivp = jnp.asarray(_ivp(256, 64, dist=1.6))
    cfg = RenderConfig(width=256, height=64)
    monkeypatch.setenv("RTMM_PAIRED", "0")   # sequential baseline
    base = np.asarray(render_pallas(ds, ivp, cfg, interpret=True))
    monkeypatch.setenv("RTMM_PAIRED", mode)
    paired = np.asarray(render_pallas(ds, ivp, cfg, interpret=True))
    bg = np.asarray(cfg.background, np.float32)
    assert (np.abs(base - bg).max(-1) > 1e-5).mean() > 0.1
    np.testing.assert_array_equal(base, paired)


@pytest.mark.parametrize("kraygen", [True, False])
def test_pallas_frames_batch_matches_per_frame(kraygen):
    """render_pallas_frames (F frames in ONE fused kernel launch — every
    input is per-tile now that t_num derives in-kernel) must match
    per-frame render_pallas bitwise: the batch is a pure concatenation of
    the same per-tile rows."""
    import dataclasses
    from rtmm_tpu.ops.pallas_tiled import render_pallas_frames
    mesh = procedural.make_icosphere(subdivisions=0, level=2, amplitude=0.15)
    ds = scene_mod.build_device_scene(mesh)
    cfg = dataclasses.replace(RenderConfig(width=96, height=64),
                              kernel_raygen=kraygen)
    ivps = jnp.stack([jnp.asarray(_ivp(96, 64, dist=2.0 + 0.2 * i))
                      for i in range(3)])
    batch = np.asarray(render_pallas_frames(ds, ivps, cfg, interpret=True))
    for i in range(3):
        one = np.asarray(render_pallas(ds, ivps[i], cfg, interpret=True))
        np.testing.assert_array_equal(batch[i], one)


def test_raw_mode_matches_windowed(sphere_scene):
    """The carry-free raw kernel mode ([t | normal xyz] compact output,
    no carry inputs) must be bit-identical to the windowed mode started
    from fresh carries — the merged-instancing launch and the path
    tracer's primary trace ride it."""
    import jax

    from rtmm_tpu.ops import pallas_tiled, tiled
    from rtmm_tpu.ops.tiled import TILE

    ds = sphere_scene
    w, h = 128, 64
    cfg = pallas_tiled.resolve_mt_precision(ds, RenderConfig(width=w,
                                                             height=h))
    ivp = jnp.asarray(_ivp(w, h))
    fi = tiled.build_frame_inputs(ds, ivp, cfg, need_q_frame=False)
    raymat_t = fi.raymat.transpose(0, 2, 1)
    frus = tiled.frustum_scalars(fi)
    n_tiles = frus.shape[0]
    kc = max(1, min(cfg.kernel_clusters_per_window, ds.num_clusters))
    cl_dist = culling.aabb_distance(fi.apex, ds.cluster_aabb_min,
                                    ds.cluster_aabb_max)
    key = jnp.where(fi.cluster_hit, -cl_dist[None, :], -jnp.inf)
    negd, cidx = jax.lax.top_k(key, kc)
    sel = negd > -jnp.inf
    centry = jnp.where(sel, -negd, jnp.inf).astype(jnp.float32)
    ccnt = sel.sum(axis=1).astype(jnp.int32)

    raw = pallas_tiled.trace_pallas(
        ds, raymat_t, frus, cidx.astype(jnp.int32), ccnt, centry,
        None, None, cfg, interpret=True, raw=True)
    bt_w, nrm_w = pallas_tiled.trace_pallas(
        ds, raymat_t, frus, cidx.astype(jnp.int32), ccnt, centry,
        jnp.full((n_tiles, TILE), 1e30, jnp.float32),
        jnp.zeros((n_tiles, 8, TILE), jnp.float32), cfg, interpret=True)
    np.testing.assert_array_equal(np.asarray(raw[:, 0]), np.asarray(bt_w))
    np.testing.assert_array_equal(np.asarray(raw[:, 1:4]),
                                  np.asarray(nrm_w[:, 0:3]))
