"""Multi-instance (TLAS analog) tests."""
import numpy as np
import pytest

from rtmm_tpu.config import RenderConfig
from rtmm_tpu.models import procedural, scene as scene_mod
from rtmm_tpu.render import instances as inst_mod
from rtmm_tpu.render.renderer import Renderer
from rtmm_tpu.utils import camera

CFG = RenderConfig(width=96, height=64, pipeline="tile")


def _ivp(pitch=-30.0, yaw=20.0, dist=5.0):
    tb = camera.Trackball()
    tb.set_camera([0, 0, 0], [np.radians(pitch), np.radians(yaw), 0.0], dist)
    return camera.inv_view_proj(tb, CFG.width, CFG.height)


@pytest.fixture(scope="module")
def base_scene():
    mesh = procedural.make_icosphere(subdivisions=0, level=2, amplitude=0.1)
    return scene_mod.build_device_scene(mesh)


def test_identity_instance_matches_base(base_scene):
    ivp = _ivp()
    ref = np.asarray(Renderer(base_scene, CFG).render(ivp))
    baked = inst_mod.bake_instances(base_scene, [inst_mod.Instance.identity()])
    out = np.asarray(Renderer(baked, CFG).render(ivp))
    np.testing.assert_allclose(out, ref, atol=1e-5)


def test_transformed_instance_matches_transformed_mesh(base_scene):
    """Baking a transform == building the mesh pre-transformed."""
    euler = (0.3, -0.5, 0.2)
    t = np.array([0.4, -0.2, 0.6], np.float32)
    s = 1.4
    inst = inst_mod.Instance.from_euler(t, euler, s)

    mesh = procedural.make_icosphere(subdivisions=0, level=2, amplitude=0.1)
    # pre-transform the host mesh the same way
    r = inst.rotation
    mesh2 = procedural.make_icosphere(subdivisions=0, level=2, amplitude=0.1)
    for tri, tri2 in zip(mesh.triangles, mesh2.triangles):
        tri2.u_positions = (tri.u_positions @ r.T * s + t).astype(np.float32)
        tri2.u_displacements = (tri.u_displacements @ r.T * s).astype(
            np.float32)
    mesh2.positions = (mesh.positions @ r.T * s + t).astype(np.float32)
    mesh2.normals = (mesh.normals @ r.T).astype(np.float32)
    mesh2.directions = (mesh.directions @ r.T * s).astype(np.float32)
    ref_scene = scene_mod.build_device_scene(mesh2)

    ivp = _ivp()
    ref = np.asarray(Renderer(ref_scene, CFG).render(ivp))
    baked = inst_mod.bake_instances(
        scene_mod.build_device_scene(mesh), [inst])
    out = np.asarray(Renderer(baked, CFG).render(ivp))
    npix = (np.abs(ref - out).max(-1) > 2e-2).sum()
    assert npix <= 4, f"{npix} pixels differ"   # fp-order differences only


def test_two_instances_cover_more(base_scene):
    ivp = _ivp()
    one = np.asarray(Renderer(base_scene, CFG).render(ivp))
    baked = inst_mod.bake_instances(base_scene, [
        inst_mod.Instance.from_euler([-1.3, 0.0, 0.0], scale=0.8),
        inst_mod.Instance.from_euler([1.3, 0.0, 0.0], (0.0, 1.0, 0.0), 0.8),
    ])
    two = np.asarray(Renderer(baked, CFG).render(ivp))
    bg = np.asarray(CFG.background, np.float32)
    cov1 = (np.abs(one - bg).max(-1) > 1e-5).mean()
    cov2 = (np.abs(two - bg).max(-1) > 1e-5).mean()
    assert cov2 > cov1 * 0.8 and cov2 > 0.02
    assert baked.num_triangles == 2 * base_scene.num_triangles


def test_instances_work_with_ray_pipeline(base_scene):
    """The per-ray reference pipeline renders baked instances too (the 2D
    hierarchy tables transform correctly under rigid+scale)."""
    ivp = _ivp()
    baked = inst_mod.bake_instances(base_scene, [
        inst_mod.Instance.from_euler([0.8, 0.0, 0.0], (0.2, 0.1, 0.0), 1.1)])
    cfg_ray = RenderConfig(width=CFG.width, height=CFG.height, pipeline="ray",
                           max_candidates=8, ray_chunk=2048)
    a = np.asarray(Renderer(baked, cfg_ray).render(ivp))
    b = np.asarray(Renderer(baked, CFG).render(ivp))
    npix = (np.abs(a - b).max(-1) > 1e-3).sum()
    assert npix == 0, f"{npix} pixels differ between pipelines"


def test_two_level_traversal_matches_baked(base_scene):
    """render_instanced (ray-transform-per-instance, shared BLAS) must match
    the baked world-space render."""
    ring = []
    for i in range(6):
        a = 2.0 * np.pi * i / 6
        ring.append(inst_mod.Instance.from_euler(
            [2.2 * np.cos(a), 2.2 * np.sin(a), 0.0], (0.0, a, 0.25 * i),
            0.7 + 0.1 * (i % 3)))
    ivp = _ivp(dist=6.0)
    baked = np.asarray(Renderer(
        inst_mod.bake_instances(base_scene, ring), CFG).render(ivp))
    two_level = np.asarray(inst_mod.render_instanced(
        base_scene, ring, ivp, CFG))
    diff = np.abs(two_level - baked).max(-1)
    npix = int((diff > 1e-3).sum())
    assert npix <= 3, f"{npix} pixels diverge vs baked instances"


def test_two_level_traversal_64_instances(base_scene):
    """64 instances through the two-level path: memory stays O(scene +
    instances) (no baked tables) and the image matches the baked render."""
    rng = np.random.default_rng(11)
    insts = []
    for i in range(64):
        pos = rng.uniform(-3.2, 3.2, size=3)
        insts.append(inst_mod.Instance.from_euler(
            pos, rng.uniform(0, 2 * np.pi, size=3), 0.35))
    ivp = _ivp(dist=8.0)
    two_level = np.asarray(inst_mod.render_instanced(
        base_scene, insts, ivp, CFG))
    baked = np.asarray(Renderer(
        inst_mod.bake_instances(base_scene, insts), CFG).render(ivp))
    assert np.isfinite(two_level).all()
    # scene must actually be visible
    bg = np.asarray(CFG.background, np.float32)
    assert (np.abs(two_level - bg).max(-1) > 1e-5).mean() > 0.05
    diff = np.abs(two_level - baked).max(-1)
    npix = int((diff > 1e-3).sum())
    assert npix <= 6, f"{npix} pixels diverge vs baked instances"


def test_instanced_tile_compaction_matches_full():
    """Per-tile instance culling (gather visible tiles -> trace -> scatter
    back) must be pixel-identical to the full-grid path, including the
    cond fallback when an instance exceeds the cap."""
    import dataclasses

    from rtmm_tpu.render import instances as inst_mod
    mesh = procedural.make_plane(grid=(2, 2), level=1, amplitude=0.2)
    ds = scene_mod.build_device_scene(mesh)
    ring = [
        inst_mod.Instance.from_euler([0.0, 0.0, 0.0], (0.0, 0.0, 0.0), 1.0),
        inst_mod.Instance.from_euler([1.4, 0.9, 0.3], (0.2, 0.5, 0.1), 0.35),
        inst_mod.Instance.from_euler([-1.2, -0.8, -0.2], (0.1, 0.2, 0.4),
                                     0.3),
    ]
    cfg_full = RenderConfig(width=128, height=64, max_candidates=8,
                            instance_tile_cap=10**9)   # cap >= tiles: full
    cfg_comp = dataclasses.replace(cfg_full, instance_tile_cap=4)
    tb = camera.Trackball()
    tb.set_camera([0, 0, 0], [np.radians(-40), np.radians(15), 0.0], 3.5)
    ivp = camera.inv_view_proj(tb, cfg_full.width, cfg_full.height)
    a = np.asarray(inst_mod.InstancedRenderer(ds, ring, cfg_full).render(ivp))
    b = np.asarray(inst_mod.InstancedRenderer(ds, ring, cfg_comp).render(ivp))
    # The big identity instance exceeds cap=4 tiles (cond -> full branch);
    # the small ones ride the compact gather/scatter. Full path on CPU is
    # the XLA tracer, compact is the interpret-mode kernel: epsilon-
    # boundary pixels may flip, nothing else.
    diff = np.abs(a - b).max(-1)
    npix = int((diff > 1e-4).sum())
    assert npix <= 5, f"{npix} pixels diverge"


def test_two_level_traversal_compressed_scene(base_scene):
    """Instanced two-level traversal over a COMPRESSED base scene: the
    kernel derives each unit's MT rows from the (object-space) grid
    records per instance — direct tracing composes with instancing, like
    the reference's per-BLAS intersection shader under TLAS transforms
    (GPUMesh.cpp:238-278)."""
    from rtmm_tpu.models import procedural, scene as scene_mod

    mesh = procedural.make_icosphere(subdivisions=0, level=3, amplitude=0.12)
    std = scene_mod.build_device_scene(mesh)
    cmp_ = scene_mod.build_device_scene(mesh, compressed=True)
    ring = []
    for i in range(4):
        a = 2.0 * np.pi * i / 4
        ring.append(inst_mod.Instance.from_euler(
            [1.8 * np.cos(a), 1.8 * np.sin(a), 0.0], (0.0, a, 0.3 * i),
            0.8))
    ivp = _ivp(dist=5.0)
    a_img = np.asarray(inst_mod.render_instanced(std, ring, ivp, CFG))
    b_img = np.asarray(inst_mod.render_instanced(cmp_, ring, ivp, CFG))
    bg = np.asarray(CFG.background, np.float32)
    assert (np.abs(b_img - bg).max(-1) > 1e-5).mean() > 0.05
    diff = np.abs(a_img - b_img).max(-1)
    npix = int((diff > 1e-3).sum())
    assert npix <= 3, f"{npix} pixels diverge compressed vs standard"


def test_bake_compressed_matches_bake_standard():
    """Baking instances of a compressed scene transforms the grid RECORDS
    (positions only; index rows copy) — the baked scene still traces
    directly. Must match the standard baked render pixel-for-pixel up to
    epsilon flips."""
    from rtmm_tpu.models import procedural, scene as scene_mod

    mesh = procedural.make_icosphere(subdivisions=0, level=3, amplitude=0.12)
    std = scene_mod.build_device_scene(mesh)
    cmp_ = scene_mod.build_device_scene(mesh, compressed=True)
    ring = [inst_mod.Instance.from_euler(
        [1.5 * np.cos(a), 1.5 * np.sin(a), 0.1], (0.1, a, 0.2), 0.9)
        for a in (0.0, 2.1, 4.2)]
    ivp = _ivp(dist=4.5)
    a_img = np.asarray(Renderer(
        inst_mod.bake_instances(std, ring), CFG).render(ivp))
    baked_c = inst_mod.bake_instances(cmp_, ring)
    assert baked_c.compressed and baked_c.unit_qn is None
    b_img = np.asarray(Renderer(baked_c, CFG).render(ivp))
    bg = np.asarray(CFG.background, np.float32)
    assert (np.abs(b_img - bg).max(-1) > 1e-5).mean() > 0.05
    npix = int((np.abs(a_img - b_img).max(-1) > 1e-3).sum())
    assert npix <= 3, f"{npix} pixels diverge"


def test_merged_instanced_matches_serial(base_scene):
    """The merged one-launch instanced path (all instances' compact tile
    rows concatenated into a single windowed kernel call, world-t
    scatter-min across instances) must agree with the round-3 serial
    per-instance scan (RTMM_INSTANCED_SERIAL=1)."""
    import os
    from rtmm_tpu.render import instances as inst_mod

    ds = base_scene
    ring = [inst_mod.Instance.from_euler([0.9 * np.cos(a), 0.9 * np.sin(a),
                                          0.05 * i], (0.0, a, 0.1 * i), 0.5)
            for i, a in enumerate(np.linspace(0, 2 * np.pi, 5)[:-1])]
    cfg = RenderConfig(width=128, height=64, pipeline="tile")
    tb = camera.Trackball()
    tb.set_camera([0, 0, 0], [np.radians(-25), np.radians(30), 0], 2.6)
    ivp = camera.inv_view_proj(tb, cfg.width, cfg.height)
    merged = np.asarray(inst_mod.render_instanced(ds, ring, ivp, cfg))
    os.environ["RTMM_INSTANCED_SERIAL"] = "1"
    try:
        serial = np.asarray(inst_mod.render_instanced(ds, ring, ivp, cfg))
    finally:
        del os.environ["RTMM_INSTANCED_SERIAL"]
    diff = np.abs(merged - serial).max(-1)
    npix = int((diff > 1e-4).sum())
    assert npix <= 5, f"{npix} pixels diverge (max {diff.max():.4g})"
    bg = np.asarray(cfg.background, np.float32)
    assert (np.abs(merged - bg).max(-1) > 1e-5).mean() > 0.05


def test_merged_instanced_overflow_backstop(base_scene):
    """An instance seen by more tiles than the per-instance cap must
    still render exactly (the overflow pass re-traces it full-frame) —
    capacity never silently drops geometry."""
    import dataclasses
    from rtmm_tpu.render import instances as inst_mod

    ds = base_scene
    # One close-up instance covering most tiles + tiny cap to force
    # overflow, plus a second small instance to keep the merge nontrivial.
    ring = [inst_mod.Instance.identity(),
            inst_mod.Instance.from_euler([1.4, 0.0, 0.0], (0, 0, 0), 0.3)]
    cfg = dataclasses.replace(RenderConfig(width=128, height=64,
                                           pipeline="tile"),
                              instance_tile_cap=2)
    cfg_full = dataclasses.replace(cfg, instance_tile_cap=0)
    tb = camera.Trackball()
    tb.set_camera([0, 0, 0], [np.radians(-25), np.radians(30), 0], 1.8)
    ivp = camera.inv_view_proj(tb, cfg.width, cfg.height)
    capped = np.asarray(inst_mod.render_instanced(ds, ring, ivp, cfg))
    full = np.asarray(inst_mod.render_instanced(ds, ring, ivp, cfg_full))
    diff = np.abs(capped - full).max(-1)
    npix = int((diff > 1e-4).sum())
    assert npix <= 5, f"{npix} pixels diverge (max {diff.max():.4g})"
