"""Compressed-scene (derive-at-trace-time) tests.

The round-3 centerpiece: the production path must trace the micro-mesh
representation directly (grid scalars + derivation), not a pre-expanded
tessellation — the reference's entire premise (README.md:7-12,
intersection.hlsl:465-470). These tests pin the compressed path to the
standard tables bit-for-bit at the geometry level and image-for-image at
the render level.
"""
import dataclasses

import numpy as np
import pytest

from rtmm_tpu.config import RenderConfig
from rtmm_tpu.models import procedural, scene as scene_mod
from rtmm_tpu.ops import compressed as comp
from rtmm_tpu.ops import precompute
from rtmm_tpu.render.renderer import Renderer
from rtmm_tpu.utils import camera

CFG = RenderConfig(width=48, height=48, ray_chunk=768, max_candidates=4)


def _ivp(pitch=-35.0, yaw=25.0, dist=3.0, cfg=CFG):
    tb = camera.Trackball()
    tb.set_camera([0, 0, 0], [np.radians(pitch), np.radians(yaw), 0.0], dist)
    return camera.inv_view_proj(tb, cfg.width, cfg.height)


@pytest.mark.parametrize("level", [0, 1, 2, 3, 4])
def test_derived_leaf_verts_bitwise_match_standard_tables(level):
    """The 45 stored grid positions + the gather matrix reproduce the
    standard leaf_verts table EXACTLY (same closed-form arithmetic at the
    same grid points): leaf f of triangle t == lane f%LPU of subtree
    f//LPU, bitwise."""
    mesh = procedural.make_icosphere(subdivisions=0, level=level,
                                     amplitude=0.15)
    std = precompute.build_uniform_tables(mesh, 0, mesh.num_triangles)
    gcoords, su = comp.subtree_grid_coords(level)
    v0, v1, v2, d0, d1, d2, scales = precompute.base_and_scales(
        mesh, 0, mesh.num_triangles)
    pos = comp.grid_positions(v0, v1, v2, d0, d1, d2, scales, gcoords,
                              level)                  # (N, spt, gpts, 3)
    n, spt, gpts = pos.shape[:3]
    grid = np.zeros((n * spt, comp.GRID_ROWS, comp.GRID_LANES), np.float32)
    grid[:, 0:3, :gpts] = pos.reshape(-1, gpts, 3).transpose(0, 2, 1)
    g = comp.leaf_gather_matrix(su)
    v = grid[:, 0:3, :] @ g                           # (U, 3, 3*LPU)
    nf = 4 ** level
    lpb = 4 ** su                                     # leaves per subtree
    leaf = std["leaf_verts"]                          # (N, NF, 3, 3)
    for t in range(n):
        for f in range(nf):
            u = t * spt + f // lpb
            j = f % lpb
            got = np.stack([v[u, :, 0 * comp.LPU + j],
                            v[u, :, 1 * comp.LPU + j],
                            v[u, :, 2 * comp.LPU + j]])
            np.testing.assert_array_equal(got, leaf[t, f])


def test_derive_np_matches_derive_jnp():
    """The XLA derivation (einsum gather + row crosses) must agree with
    the NumPy reference derivation."""
    import jax.numpy as jnp

    mesh = procedural.make_plane(grid=(2, 2), level=3, amplitude=0.2)
    ds = scene_mod.build_device_scene(mesh, compressed=True)
    apex = np.asarray([0.3, -1.2, 2.5], np.float32)
    grid = np.asarray(ds.unit_grid)
    ref = comp.derive_unit_tables_np(grid, apex, ds.sub_level)
    q, nrm = comp.derive_q_jnp(jnp.asarray(grid), jnp.asarray(apex),
                               ds.sub_level)
    np.testing.assert_allclose(np.asarray(q), ref["q"], rtol=1e-6, atol=1e-6)
    np.testing.assert_allclose(np.asarray(nrm), ref["nrm"],
                               rtol=1e-6, atol=1e-6)


def _npix(a, b, tol=1e-4):
    return int((np.abs(a - b).max(-1) > tol).sum())


@pytest.mark.parametrize("level", [2, 3])
def test_compressed_tile_matches_standard_tile(level):
    """Same mesh, standard vs compressed build, XLA tile backend: the
    images must agree pixel-for-pixel up to epsilon-boundary flips (the
    MT quantities are computed from bitwise-identical leaf vertices, via
    host tables vs trace-time derivation)."""
    mesh = procedural.make_icosphere(subdivisions=0, level=level,
                                     amplitude=0.12)
    cfg = dataclasses.replace(CFG, pipeline="tile")
    a = np.asarray(Renderer(
        scene_mod.build_device_scene(mesh), cfg).render(_ivp()))
    b = np.asarray(Renderer(
        scene_mod.build_device_scene(mesh, compressed=True),
        cfg).render(_ivp()))
    assert _npix(a, b) <= 5, f"{_npix(a, b)} pixels diverge"


def test_compressed_pallas_matches_compressed_tile():
    """The in-kernel derivation (interpret mode on CPU) must agree with
    the XLA derivation image-for-image."""
    mesh = procedural.make_plane(grid=(4, 4), level=3, amplitude=0.2)
    ds = scene_mod.build_device_scene(mesh, compressed=True)
    a = np.asarray(Renderer(
        ds, dataclasses.replace(CFG, pipeline="tile")).render(_ivp()))
    b = np.asarray(Renderer(
        ds, dataclasses.replace(CFG, pipeline="pallas")).render(_ivp()))
    assert _npix(a, b) <= 5, f"{_npix(a, b)} pixels diverge"


def test_compressed_matches_tessellated_oracle():
    """The reference's own correctness oracle, on the compressed path:
    direct micro-mesh trace == tessellated ground truth, RMSE <= 1e-3."""
    mesh = procedural.make_icosphere(subdivisions=0, level=3, amplitude=0.1)
    cfg = dataclasses.replace(CFG, pipeline="tile")
    img_c = np.asarray(Renderer(
        scene_mod.build_device_scene(mesh, compressed=True),
        cfg).render(_ivp()))
    img_t = np.asarray(Renderer(
        scene_mod.build_device_scene(mesh, tessellated=True),
        cfg).render(_ivp()))
    bg = np.asarray(cfg.background)
    assert (np.abs(img_c - bg).max(-1) > 1e-5).mean() > 0.05, "not visible"
    rmse = np.sqrt(((img_c - img_t) ** 2).mean())
    assert rmse <= 1e-3, rmse


def test_compressed_level4_splits_subtrees():
    """Level > 3: units are level-(L-3) subtrees, several per triangle."""
    mesh = procedural.make_plane(grid=(1, 1), level=4, amplitude=0.15)
    ds = scene_mod.build_device_scene(mesh, compressed=True)
    spt = 4 ** (4 - comp.SUB_LEVEL)
    assert int(np.asarray(ds.unit_valid).sum()) == mesh.num_triangles * spt
    cfg = dataclasses.replace(CFG, pipeline="tile")
    a = np.asarray(Renderer(ds, cfg).render(_ivp()))
    b = np.asarray(Renderer(
        scene_mod.build_device_scene(mesh), cfg).render(_ivp()))
    assert _npix(a, b) <= 5, f"{_npix(a, b)} pixels diverge"


def test_compressed_memory_footprint():
    """The point of the exercise: per-micro-triangle device bytes must be
    ~32 B (one (4, 128)-f32 record per 64 leaves) — ~18x below the
    standard tables' ~580 B."""
    mesh = procedural.make_plane(grid=(8, 8), level=3, amplitude=0.2)
    ds = scene_mod.build_device_scene(mesh, compressed=True)
    micro_tris = mesh.num_triangles * 4 ** 3
    per_unit = (np.asarray(ds.unit_grid).nbytes
                + np.asarray(ds.unit_aabb_min).nbytes
                + np.asarray(ds.unit_aabb_max).nbytes)
    assert per_unit / micro_tris < 40.0
    assert ds.unit_qn is None and ds.leaf_verts is None
    assert ds.unit_q16 is None and ds.node_verts is None


def test_compressed_guards():
    uni = procedural.make_plane(grid=(2, 2), level=2, amplitude=0.25)
    with pytest.raises(ValueError, match="tessellated"):
        scene_mod.build_device_scene(uni, tessellated=True, compressed=True)
    ds = scene_mod.build_device_scene(uni, compressed=True)
    from rtmm_tpu.ops import traversal
    import jax.numpy as jnp
    with pytest.raises(ValueError, match="compressed"):
        traversal.trace(ds, jnp.zeros((4, 3)), jnp.ones((4, 3)), CFG)
    from rtmm_tpu.render.pathtrace import PathTraceConfig, PathTracer
    with pytest.raises(ValueError, match="per-ray"):
        PathTracer(ds, CFG, PathTraceConfig(
            bounces=1, samples_per_pixel=1, engine="perray")).render(_ivp())


# ---- Indexed compressed scenes (mixed levels / stitched presence) ----
# The records gain per-unit corner-index rows encoding the stitched leaf
# topology (the reference's 6-case presence re-stitching,
# intersection.hlsl:339-371), so direct tracing covers EVERY mesh class —
# no pre-tessellation fallback anywhere.


def _mixed_mesh():
    return procedural.make_icosphere(subdivisions=1, level=3,
                                     amplitude=0.12, mixed_levels=True)


def test_indexed_build_selected_for_mixed_meshes():
    ds = scene_mod.build_device_scene(_mixed_mesh(), compressed=True)
    assert ds.indexed and ds.compressed
    assert ds.unit_grid.shape[1] == comp.IDX_ROWS
    uni = scene_mod.build_device_scene(
        procedural.make_plane(grid=(2, 2), level=3, amplitude=0.2),
        compressed=True)
    assert not uni.indexed
    assert uni.unit_grid.shape[1] == comp.GRID_ROWS


def test_shared_gmat_only_for_single_topology_scenes():
    """Single-class indexed builds (uniform level-2 packed k-per-unit)
    emit scene.unit_gmat — the shared gather matrix the kernels use
    instead of per-visit one-hot construction; multi-class (mixed-level)
    builds must NOT (their units carry different topologies). The gmat
    must reproduce each unit's own index rows exactly."""
    lo = scene_mod.build_device_scene(
        procedural.make_plane(grid=(4, 4), level=2, amplitude=0.2),
        compressed=True)
    assert lo.indexed and lo.unit_gmat is not None
    assert lo.unit_gmat.shape == (comp.GRID_LANES, 3 * comp.LPU)
    # Equivalence: gmat one-hot == the one-hot any unit's index rows build.
    idx = comp._corner_indices_np(np.asarray(lo.unit_grid))[0]  # (3, LPU)
    g = np.asarray(lo.unit_gmat)
    for j in range(3):
        blk = g[:, j * comp.LPU:(j + 1) * comp.LPU]
        assert (blk.sum(axis=0) == 1.0).all()
        assert (blk.argmax(axis=0) == idx[j]).all()
    mixed = scene_mod.build_device_scene(_mixed_mesh(), compressed=True)
    assert mixed.indexed and mixed.unit_gmat is None


def test_widened_gather_matrix_vreg_aligned_layout():
    """The fused single-pass gather's layout contract: corner blocks at
    2*LPU-aligned lane offsets (0, 128, 256 at LPU=64) with zero blocks
    between. This alignment is LOAD-BEARING on real hardware — Mosaic
    rejects downstream concats of slices whose lane offset is not a
    multiple of the 128-lane vreg ("result/input offset mismatch"), a
    failure class interpret mode cannot see (PERF.md round 5)."""
    g = comp.leaf_gather_matrix(3)
    w = np.asarray(comp.widen_gather_matrix(g))
    assert w.shape == (comp.GRID_LANES, 6 * comp.LPU)
    assert 2 * comp.LPU % 128 == 0     # corner-block stride = whole vregs
    for j in range(3):
        blk = w[:, 2 * j * comp.LPU:(2 * j + 1) * comp.LPU]
        pad = w[:, (2 * j + 1) * comp.LPU:(2 * j + 2) * comp.LPU]
        np.testing.assert_array_equal(
            blk, g[:, j * comp.LPU:(j + 1) * comp.LPU])
        assert (pad == 0.0).all()


def test_indexed_leaf_set_bitwise_matches_stitched_tables():
    """The derived (record positions + index rows) nondegenerate leaf set
    equals the standard stitched leaf_verts table EXACTLY — same closed
    form at the same grid points, topology included."""
    mesh = _mixed_mesh()
    cs = scene_mod.build_device_scene(mesh, compressed=True)
    ss = scene_mod.build_device_scene(mesh)
    grid = np.asarray(cs.unit_grid)
    idx = comp._corner_indices_np(grid)
    pos = grid[:, 0:3, :]
    take = lambda j: np.take_along_axis(  # noqa: E731
        pos, idx[:, j][:, None, :], axis=2).transpose(0, 2, 1)
    v0, v1, v2 = take(0), take(1), take(2)
    deg = (np.abs(np.cross(v1 - v0, v2 - v0)).sum(-1) == 0)
    der = np.stack([v0, v1, v2], axis=2)          # (U, LPU, 3, 3)
    der_set = {der[u, k].tobytes() for u in range(der.shape[0])
               for k in range(comp.LPU) if not deg[u, k]}
    slv = np.asarray(ss.leaf_verts)[np.asarray(ss.leaf_mask)]
    std_set = {slv[i].tobytes() for i in range(slv.shape[0])}
    assert der_set == std_set


def test_indexed_derive_np_matches_jnp():
    import jax.numpy as jnp

    ds = scene_mod.build_device_scene(_mixed_mesh(), compressed=True)
    apex = np.asarray([0.3, -1.2, 2.5], np.float32)
    grid = np.asarray(ds.unit_grid)
    ctr = 0.5 * (np.asarray(ds.unit_aabb_min) + np.asarray(ds.unit_aabb_max))
    ref = comp.derive_unit_tables_np(grid, apex, ds.sub_level,
                                     centers=ctr, indexed=True)
    q, nrm = comp.derive_q_jnp(jnp.asarray(grid), jnp.asarray(apex),
                               ds.sub_level, centers=jnp.asarray(ctr),
                               indexed=True)
    np.testing.assert_allclose(np.asarray(q), ref["q"], rtol=1e-6, atol=1e-6)
    np.testing.assert_allclose(np.asarray(nrm), ref["nrm"],
                               rtol=1e-6, atol=1e-6)


def test_indexed_tile_matches_standard_tile():
    mesh = _mixed_mesh()
    cfg = dataclasses.replace(CFG, pipeline="tile")
    a = np.asarray(Renderer(
        scene_mod.build_device_scene(mesh), cfg).render(_ivp()))
    b = np.asarray(Renderer(
        scene_mod.build_device_scene(mesh, compressed=True),
        cfg).render(_ivp()))
    assert _npix(a, b) <= 5, f"{_npix(a, b)} pixels diverge"


def test_indexed_pallas_matches_indexed_tile():
    """The in-kernel per-unit one-hot gather (interpret mode) must agree
    with the XLA indexed derivation image-for-image."""
    ds = scene_mod.build_device_scene(_mixed_mesh(), compressed=True)
    a = np.asarray(Renderer(
        ds, dataclasses.replace(CFG, pipeline="tile")).render(_ivp()))
    b = np.asarray(Renderer(
        ds, dataclasses.replace(CFG, pipeline="pallas")).render(_ivp()))
    assert _npix(a, b) <= 5, f"{_npix(a, b)} pixels diverge"


def test_indexed_matches_tessellated_oracle():
    """The correctness oracle on a decimated-presence mixed-level mesh:
    direct (indexed compressed) trace == tessellated ground truth."""
    mesh = procedural.make_plane(grid=(4, 4), level=3, amplitude=0.25,
                                 mixed_levels=True)
    assert not all(t.u_present.all() for t in mesh.triangles)
    cfg = dataclasses.replace(CFG, pipeline="tile")
    img_c = np.asarray(Renderer(
        scene_mod.build_device_scene(mesh, compressed=True),
        cfg).render(_ivp()))
    img_t = np.asarray(Renderer(
        scene_mod.build_device_scene(mesh, tessellated=True),
        cfg).render(_ivp()))
    bg = np.asarray(cfg.background)
    assert (np.abs(img_c - bg).max(-1) > 1e-5).mean() > 0.05, "not visible"
    rmse = np.sqrt(((img_c - img_t) ** 2).mean())
    assert rmse <= 1e-3, rmse


def test_derive_unit_kernel_matches_exact_host_mirror():
    """_derive_unit (the in-kernel table derivation, incl. the one-pass
    bit-exact bf16 gathers) reproduces an exact host mirror of the same
    math up to FMA contraction (1 ulp in the crosses): gathers as
    literal lane selections, f32 crosses op-for-op. Pins the exactness
    claim the one-pass gather scheme rests on (interpret mode here; the
    same comparison ran clean for all 51,200 units of the config-9
    scene on a real v5e). The config-9 gate divergence this
    investigation started from was the TILE side: derive_q_jnp's
    gather einsums ran at DEFAULT matmul precision (bf16-rounded
    positions on the MXU) — fixed with Precision.HIGHEST."""
    import functools

    import jax
    import jax.numpy as jnp
    from jax.experimental import pallas as pl

    from rtmm_tpu.ops.pallas_tiled import _derive_unit

    mesh = procedural.make_plane(grid=(8, 8), level=2, amplitude=0.1)
    ds = scene_mod.build_device_scene(mesh, compressed=True)
    lpu = int(ds.leaves_per_unit)
    grid = ds.unit_grid
    U = int(grid.shape[0])
    gmat = jnp.asarray(comp.leaf_gather_matrix(int(ds.sub_level)))
    gr, gl = int(grid.shape[1]), int(grid.shape[2])

    def kernel(grid_ref, gmat_ref, q_out, tn_out, nrm_out):
        q, tn, nrm = _derive_unit(
            grid_ref[0], gmat_ref[...], jnp.float32(0.3),
            jnp.float32(-0.2), jnp.float32(1.7), jnp.float32(0.0),
            jnp.float32(0.0), jnp.float32(0.0), lpu, indexed=False)
        q_out[0] = q
        tn_out[0] = tn
        nrm_out[0] = nrm

    fn = pl.pallas_call(
        kernel, grid=(U,),
        in_specs=[pl.BlockSpec((1, gr, gl), lambda u: (u, 0, 0)),
                  pl.BlockSpec(tuple(gmat.shape), lambda u: (0, 0))],
        out_specs=[pl.BlockSpec((1, 6, 3 * lpu), lambda u: (u, 0, 0)),
                   pl.BlockSpec((1, 1, lpu), lambda u: (u, 0, 0)),
                   pl.BlockSpec((1, 8, lpu), lambda u: (u, 0, 0))],
        out_shape=[jax.ShapeDtypeStruct((U, 6, 3 * lpu), jnp.float32),
                   jax.ShapeDtypeStruct((U, 1, lpu), jnp.float32),
                   jax.ShapeDtypeStruct((U, 8, lpu), jnp.float32)],
        interpret=True)
    q_t = np.asarray(fn(grid, gmat)[0])

    g = np.asarray(grid)
    gm = np.asarray(gmat)
    sel = gm.argmax(axis=0)
    live = gm.max(axis=0) > 0
    for u in range(U):
        pos = g[u, 0:3, :].astype(np.float32)
        vcat = np.where(live[None, :], pos[:, sel], 0.0).astype(np.float32)
        v0, v1, v2 = (vcat[:, j * lpu:(j + 1) * lpu] for j in range(3))
        e1 = (v1 - v0).astype(np.float32)
        e2 = (v2 - v0).astype(np.float32)

        def cross(a, b):
            return np.stack([
                (a[1] * b[2] - a[2] * b[1]).astype(np.float32),
                (a[2] * b[0] - a[0] * b[2]).astype(np.float32),
                (a[0] * b[1] - a[1] * b[0]).astype(np.float32)])

        n = cross(e1, e2)
        w1 = cross(e2, v0)
        w2 = cross(v0, e1)
        q_ref = np.concatenate([
            np.concatenate([-n, -w1, -w2], axis=1),
            np.concatenate([np.zeros((3, lpu), np.float32), e2, -e1],
                           axis=1)], axis=0)
        # rtol 1e-4 admits FMA-contraction ulps on cancelled cross
        # terms (the level-2 k-packed records hit 2.7e-5 on one lane);
        # the failure class this guards against (a lost bf16 split term
        # / default-precision gather) shows up at ~4e-3, 40x above.
        np.testing.assert_allclose(q_t[u], q_ref, rtol=1e-4, atol=1e-30,
                                   err_msg=f"unit {u}")


@pytest.mark.parametrize("level,grid", [(2, (8, 8)), (1, (8, 8))])
def test_compressed_low_level_packs_multiple_triangles(level, grid):
    """Uniform level < 3: one unit packs several Morton-adjacent base
    triangles into one indexed record (level 2: 4 tris = 64/64 leaves,
    level 1: 16 tris) instead of one triangle per unit — otherwise a
    level-2 scene quadruples its unit count AND its (tile, unit) visit
    count while wasting 3/4 of every MT epilogue's leaf lanes (measured:
    config 9 at 23.5 vs config 6's 82.4 Mrays/s before the repack)."""
    mesh = procedural.make_plane(grid=grid, level=level, amplitude=0.1)
    ds = scene_mod.build_device_scene(mesh, compressed=True)
    std = scene_mod.build_device_scene(mesh)
    n_c = int(np.asarray(ds.unit_valid).sum())
    n_s = int(np.asarray(std.unit_valid).sum())
    assert n_c == n_s, (n_c, n_s)
    cfg = dataclasses.replace(CFG, pipeline="tile")
    a = np.asarray(Renderer(ds, cfg).render(_ivp()))
    b = np.asarray(Renderer(std, cfg).render(_ivp()))
    assert _npix(a, b) <= 5, f"{_npix(a, b)} pixels diverge vs standard"
    c = np.asarray(Renderer(
        ds, dataclasses.replace(CFG, pipeline="pallas")).render(_ivp()))
    assert _npix(a, c) <= 5, f"{_npix(a, c)} pixels diverge tile vs pallas"
    bg = np.asarray(cfg.background)
    assert (np.abs(a - bg).max(-1) > 1e-5).mean() > 0.05, "not visible"


def test_compressed_level0_packs_triangles():
    """Level 0 (plain triangles): lane capacity caps packing at 42 tris
    per unit (42 * 3 verts = 126 <= 127 usable lanes) — still 42x fewer
    units than one-per-triangle."""
    mesh = procedural.make_plane(grid=(8, 8), level=0, amplitude=0.0)
    ds = scene_mod.build_device_scene(mesh, compressed=True)
    n_c = int(np.asarray(ds.unit_valid).sum())
    assert n_c <= -(-mesh.num_triangles // 42) + 1, n_c
    cfg = dataclasses.replace(CFG, pipeline="tile")
    a = np.asarray(Renderer(ds, cfg).render(_ivp()))
    b = np.asarray(Renderer(
        scene_mod.build_device_scene(mesh), cfg).render(_ivp()))
    assert _npix(a, b) <= 5, f"{_npix(a, b)} pixels diverge"
