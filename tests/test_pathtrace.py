"""Path tracer tests (benchmark config 5 semantics)."""
import jax.numpy as jnp
import numpy as np
import pytest

from rtmm_tpu.config import RenderConfig
from rtmm_tpu.models import procedural, scene as scene_mod
from rtmm_tpu.render.pathtrace import PathTraceConfig, PathTracer
from rtmm_tpu.utils import camera

CFG = RenderConfig(width=48, height=32, max_candidates=4, ray_chunk=1536)


def _ivp():
    tb = camera.Trackball()
    tb.set_camera([0, 0, 0], [np.radians(-30), np.radians(20), 0.0], 3.0)
    return camera.inv_view_proj(tb, CFG.width, CFG.height)


@pytest.fixture(scope="module")
def scene():
    mesh = procedural.make_plane(grid=(2, 2), level=2, amplitude=0.2)
    return scene_mod.build_device_scene(mesh)


def test_pathtrace_runs_and_is_finite(scene):
    pt = PathTracer(scene, CFG, PathTraceConfig(
        bounces=2, samples_per_pixel=2, ray_chunk=1536))
    img, stats = pt.render(_ivp())
    img = np.asarray(img)
    assert img.shape == (32, 48, 3)
    assert np.isfinite(img).all()
    assert (img >= 0).all()
    live = np.asarray(stats["live_rays_per_bounce"])
    assert live.shape == (3,)
    assert live[0] > 0                 # primaries hit the plane
    assert np.all(np.diff(live) <= 0)  # monotone ray death


def test_pathtrace_deterministic(scene):
    pt = PathTracer(scene, CFG, PathTraceConfig(
        bounces=1, samples_per_pixel=1, ray_chunk=1536))
    a, _ = pt.render(_ivp())
    b, _ = pt.render(_ivp())
    np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_pathtrace_compaction_matches_uncompacted(scene):
    """Pixelwise oracle for the sort/permutation machinery: randoms are
    pixel-indexed and ride every sort, so the estimator must be identical
    whether rays are compacted (live-first permutation between bounces) or
    left in raster order. Any bug in the multi-operand sort permutation —
    a misrouted operand, a dropped lane, a wrong unsort — shows up as a
    per-pixel difference here."""
    import dataclasses
    base = PathTraceConfig(bounces=2, samples_per_pixel=1, ray_chunk=1536,
                           engine="perray")
    a, _ = PathTracer(scene, CFG, base).render(_ivp())
    b, _ = PathTracer(scene, CFG, dataclasses.replace(
        base, compaction=False)).render(_ivp())
    np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-6)


def test_pathtrace_zero_bounces(scene):
    """bounces=0 = primary-only tracing (regression: the bounce loop used
    to index rs[0] from an empty randoms list and crash)."""
    pt = PathTracer(scene, CFG, PathTraceConfig(
        bounces=0, samples_per_pixel=1, ray_chunk=1536))
    img, stats = pt.render(_ivp())
    img = np.asarray(img)
    assert img.shape == (32, 48, 3)
    assert np.isfinite(img).all()
    live = np.asarray(stats["live_rays_per_bounce"])
    assert live.shape == (1,) and live[0] > 0


def test_overflow_stat_key_is_per_engine(scene):
    """The two engines' third trace return means different things
    (grouped: real candidate-list truncation; pallas: extra window passes,
    nothing truncated) — the stats key must name which one it is."""
    import dataclasses
    base = PathTraceConfig(bounces=1, samples_per_pixel=1, ray_chunk=1536)
    _, sg = PathTracer(scene, CFG, dataclasses.replace(
        base, engine="grouped")).render(_ivp())
    assert "overflow_groups_per_bounce" in sg
    assert "extra_window_passes_per_bounce" not in sg
    _, sp = PathTracer(scene, CFG, dataclasses.replace(
        base, engine="pallas")).render(_ivp())
    assert "extra_window_passes_per_bounce" in sp
    assert "overflow_groups_per_bounce" not in sp


def test_grouped_overflow_reports_real_truncation():
    """Force candidate-list saturation on the grouped engine: with a
    1-entry candidate list and a scene whose units all overlap the rays'
    reach box, overflow must be > 0 (it counts truncated groups)."""
    import jax.numpy as jnp

    from rtmm_tpu.ops import grouped
    mesh = procedural.make_plane(grid=(12, 12), level=2, amplitude=0.2)
    ds = scene_mod.build_device_scene(mesh)
    assert ds.num_units > 1
    o = jnp.tile(jnp.asarray([[0.0, 0.0, 2.0]], jnp.float32),
                 (grouped.GROUP, 1))[None]
    d = jnp.tile(jnp.asarray([[0.0, 0.0, -1.0]], jnp.float32),
                 (grouped.GROUP, 1))[None]
    live = jnp.ones((1, grouped.GROUP), bool)
    _, _, overflow = grouped.trace_sorted(ds, o, d, live, CFG,
                                          max_group_candidates=1)
    assert int(np.asarray(overflow)) > 0


def test_pathtrace_miss_collects_background():
    mesh = procedural.make_plane(grid=(1, 1), level=0, amplitude=0.0)
    ds = scene_mod.build_device_scene(mesh)
    tb = camera.Trackball()
    tb.set_camera([0, 0, -5.0], [0.0, np.pi, 0.0], 1.0)   # looking away
    ivp = camera.inv_view_proj(tb, CFG.width, CFG.height)
    pt = PathTracer(ds, CFG, PathTraceConfig(bounces=1, samples_per_pixel=1,
                                             ray_chunk=1536))
    img, stats = pt.render(ivp)
    np.testing.assert_allclose(
        np.asarray(img),
        np.broadcast_to(np.asarray(CFG.background, np.float32),
                        (32, 48, 3)), atol=1e-6)
    assert int(np.asarray(stats["live_rays_per_bounce"])[0]) == 0


def test_grouped_engine_matches_perray(scene):
    import dataclasses
    base = PathTraceConfig(bounces=2, samples_per_pixel=1, ray_chunk=1536,
                           compaction=False)
    a, sa = PathTracer(scene, CFG, dataclasses.replace(
        base, engine="grouped")).render(_ivp())
    b, sb = PathTracer(scene, CFG, dataclasses.replace(
        base, engine="perray")).render(_ivp())
    # Identical RNG; the engines compute u/v/t via different (equivalent)
    # fp expressions, so a few epsilon-boundary pixels may take different
    # paths — everything else must match exactly.
    diff = np.abs(np.asarray(a) - np.asarray(b)).max(-1)
    npix = int((diff > 1e-4).sum())
    assert npix <= 5, f"{npix} pixels diverge between engines"
    la = np.asarray(sa["live_rays_per_bounce"])
    lb = np.asarray(sb["live_rays_per_bounce"])
    np.testing.assert_allclose(la, lb, atol=4)


def test_pallas_engine_matches_grouped(scene):
    """The in-kernel cluster-walk engine (interpret mode on CPU) must agree
    with the XLA grouped engine ray-for-ray."""
    import dataclasses
    base = PathTraceConfig(bounces=2, samples_per_pixel=1, ray_chunk=1536,
                           compaction=False)
    a, sa = PathTracer(scene, CFG, dataclasses.replace(
        base, engine="pallas")).render(_ivp())
    b, sb = PathTracer(scene, CFG, dataclasses.replace(
        base, engine="grouped")).render(_ivp())
    diff = np.abs(np.asarray(a) - np.asarray(b)).max(-1)
    npix = int((diff > 1e-4).sum())
    assert npix <= 5, f"{npix} pixels diverge between engines"
    la = np.asarray(sa["live_rays_per_bounce"])
    lb = np.asarray(sb["live_rays_per_bounce"])
    np.testing.assert_allclose(la, lb, atol=4)


@pytest.mark.parametrize("cap", ["64", "100000"])
def test_live_prefix_compaction_exact(scene, monkeypatch, cap):
    """The live-prefix compaction (slice the bounce loop to a static cap
    after the first secondary sort) must be EXACT in both regimes:
    cap=64 lanes overflows (live > cap -> the lax.cond full-size
    fallback runs), cap=100000 rounds down to the whole buffer (cap >=
    mtotal -> compaction disabled); both must match RTMM_PT_CAP=0
    bit-for-bit. A third point — a cap that genuinely compacts — needs
    live < cap < mtotal, covered by the mid case below."""
    import dataclasses
    base = PathTraceConfig(bounces=2, samples_per_pixel=1, ray_chunk=1536,
                           engine="grouped")
    monkeypatch.setenv("RTMM_PT_CAP", "0")
    a, sa = PathTracer(scene, CFG, base).render(_ivp())
    monkeypatch.setenv("RTMM_PT_CAP", cap)
    b, sb = PathTracer(scene, CFG, dataclasses.replace(base)).render(_ivp())
    np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    np.testing.assert_array_equal(
        np.asarray(sa["live_rays_per_bounce"]),
        np.asarray(sb["live_rays_per_bounce"]))


def test_live_prefix_compaction_exact_mid(scene, monkeypatch):
    """The genuinely-compacting regime: live lanes fit a cap well under
    the buffer size, the bounce loop runs on the sliced prefix, and the
    result still matches the uncompacted pipeline exactly."""
    import dataclasses
    base = PathTraceConfig(bounces=2, samples_per_pixel=1, ray_chunk=1536,
                           engine="grouped")
    monkeypatch.setenv("RTMM_PT_CAP", "0")
    a, _ = PathTracer(scene, CFG, base).render(_ivp())
    # 48x32 = 1,536 rays; the plane covers a minority of them, so 512
    # lanes hold every live secondary while staying under mtotal.
    monkeypatch.setenv("RTMM_PT_CAP", "512")
    b, _ = PathTracer(scene, CFG, dataclasses.replace(base)).render(_ivp())
    np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_pallas_grouped_closed_surface_no_loss():
    """Subdiv-3 closed sphere, bounce rays reach most of the scene (the
    config-5 saturation case): the windowed cluster walk must not lose
    geometry vs the exact per-ray engine."""
    import dataclasses
    mesh = procedural.make_icosphere(subdivisions=0, level=3, amplitude=0.1)
    ds = scene_mod.build_device_scene(mesh)
    base = PathTraceConfig(bounces=1, samples_per_pixel=1, ray_chunk=1536,
                           compaction=False)
    a, sa = PathTracer(ds, CFG, dataclasses.replace(
        base, engine="pallas")).render(_ivp())
    b, sb = PathTracer(ds, CFG, dataclasses.replace(
        base, engine="perray")).render(_ivp())
    diff = np.abs(np.asarray(a) - np.asarray(b)).max(-1)
    npix = int((diff > 1e-4).sum())
    assert npix <= 5, f"{npix} pixels diverge between engines"


def test_pallas_grouped_multi_cluster():
    """A >64-unit scene (2 clusters): the per-sub-group reach culling and
    cluster-window early exit must stay exact across cluster boundaries.

    Compared against the XLA grouped engine (identical MT expressions —
    isolates the in-kernel cluster walk; perray differs from BOTH grouped
    engines on a few epsilon-boundary silhouette pixels by design). A
    pruning bug would lose whole hits (diff ~0.8 vs background); equal-t
    epsilon flips only move shading by <0.01."""
    import dataclasses
    mesh = procedural.make_plane(grid=(12, 12), level=2, amplitude=0.2)
    ds = scene_mod.build_device_scene(mesh)
    assert ds.num_clusters >= 2          # the point of this test
    base = PathTraceConfig(bounces=1, samples_per_pixel=1, ray_chunk=1536,
                           compaction=False)
    a, _ = PathTracer(ds, CFG, dataclasses.replace(
        base, engine="pallas")).render(_ivp())
    b, _ = PathTracer(ds, CFG, dataclasses.replace(
        base, engine="grouped")).render(_ivp())
    diff = np.abs(np.asarray(a) - np.asarray(b)).max(-1)
    npix = int((diff > 1e-4).sum())
    assert npix <= 5, f"{npix} pixels diverge between engines"
    assert float(diff.max()) < 0.05, f"hit lost (maxdiff {diff.max():.3f})"


@pytest.mark.parametrize("engine", ["grouped", "pallas"])
@pytest.mark.parametrize("mixed", [False, True])
def test_pathtrace_compressed_matches_standard(engine, mixed):
    """Direct tracing on the path tracer: a compressed scene (grid
    records only; q16 + normals derived at trace time — in-kernel for
    the pallas engine) must reproduce the standard-table render
    pixel-for-pixel up to epsilon flips. mixed=True covers INDEXED
    records (stitched mixed-level topology) on the secondary engines."""
    mesh = procedural.make_plane(grid=(2, 2), level=2, amplitude=0.2,
                                 mixed_levels=mixed)
    std = scene_mod.build_device_scene(mesh)
    cmp_ = scene_mod.build_device_scene(mesh, compressed=True)
    # Level-2 scenes build INDEXED either way: mixed via stitched
    # topology, uniform via the k-per-unit low-level repack.
    assert cmp_.indexed
    ptc = PathTraceConfig(bounces=2, samples_per_pixel=1, ray_chunk=1536,
                          engine=engine)
    a, _ = PathTracer(std, CFG, ptc).render(_ivp())
    b, _ = PathTracer(cmp_, CFG, ptc).render(_ivp())
    a, b = np.asarray(a), np.asarray(b)
    npix = int((np.abs(a - b).max(-1) > 1e-3).sum())
    assert npix <= 5, f"{npix} pixels diverge"


@pytest.mark.parametrize("compressed", [False, True])
def test_grouped_kernel_subgate_bitwise(compressed, monkeypatch):
    """The grouped kernel's sub-group gated MT stage (RTMM_SUBGATE,
    default on) must be BITWISE identical to the ungated trace: gating
    uses the walk's own per-sub predicates (insides & dist <= worst), so
    skipped sub-groups can only ever contribute non-winning hits."""
    from rtmm_tpu.models import procedural, scene as scene_mod
    from rtmm_tpu.ops import pallas_grouped

    mesh = procedural.make_icosphere(subdivisions=1, level=3,
                                     amplitude=0.15)
    ds = scene_mod.build_device_scene(mesh, compressed=compressed)
    rng = np.random.default_rng(0)
    o = jnp.asarray(rng.uniform(-2.0, 2.0, (2, 1024, 3)).astype(np.float32))
    d = rng.normal(size=(2, 1024, 3)).astype(np.float32)
    d = jnp.asarray(d / np.linalg.norm(d, axis=-1, keepdims=True))
    live = jnp.asarray(rng.uniform(size=(2, 1024)) < 0.6)
    monkeypatch.setenv("RTMM_SUBGATE", "0")
    t0, n0, _ = pallas_grouped.trace_sorted(ds, o, d, live, CFG,
                                            interpret=True)
    monkeypatch.setenv("RTMM_SUBGATE", "1")
    t1, n1, _ = pallas_grouped.trace_sorted(ds, o, d, live, CFG,
                                            interpret=True)
    assert (np.asarray(t0)[np.asarray(live)] < 1e29).sum() > 50
    np.testing.assert_array_equal(np.asarray(t0), np.asarray(t1))
    np.testing.assert_array_equal(np.asarray(n0), np.asarray(n1))
