"""Tests for the jnp intersection primitives (Möller-Trumbore, slab, 2D edge,
height band) against hand-computed oracles."""
import jax.numpy as jnp
import numpy as np
import pytest

from rtmm_tpu.ops import intersect


def test_moller_trumbore_hit():
    o = jnp.array([0.25, 0.25, -1.0])
    d = jnp.array([0.0, 0.0, 1.0])
    v0 = jnp.array([0.0, 0.0, 0.0])
    v1 = jnp.array([1.0, 0.0, 0.0])
    v2 = jnp.array([0.0, 1.0, 0.0])
    ok, t, n = intersect.moller_trumbore(o, d, v0, v1, v2)
    assert bool(ok)
    assert float(t) == pytest.approx(1.0, abs=1e-6)
    np.testing.assert_allclose(np.asarray(n), [0, 0, 1], atol=1e-6)


def test_moller_trumbore_miss_and_behind():
    v0 = jnp.array([0.0, 0.0, 0.0])
    v1 = jnp.array([1.0, 0.0, 0.0])
    v2 = jnp.array([0.0, 1.0, 0.0])
    d = jnp.array([0.0, 0.0, 1.0])
    ok, _, _ = intersect.moller_trumbore(
        jnp.array([2.0, 2.0, -1.0]), d, v0, v1, v2)
    assert not bool(ok)
    # Behind the origin: MT itself reports t<0 (the caller filters by t_min,
    # as DXR filters ReportHit by TMin).
    ok, t, _ = intersect.moller_trumbore(
        jnp.array([0.25, 0.25, 1.0]), d, v0, v1, v2)
    assert bool(ok) and float(t) < 0


def test_ray_aabb():
    o = jnp.array([0.0, 0.0, -5.0])
    inv = 1.0 / jnp.array([1e-12, 1e-12, 1.0])
    hit, t = intersect.ray_aabb(o, inv, jnp.array([-1.0, -1.0, -1.0]),
                                jnp.array([1.0, 1.0, 1.0]))
    assert bool(hit) and float(t) == pytest.approx(4.0)
    # inverted AABB (padding sentinel) never hits
    hit, _ = intersect.ray_aabb(o, inv, jnp.array([1e30] * 3),
                                jnp.array([-1e30] * 3))
    assert not bool(hit)


def test_ray_edge_2d():
    o = jnp.array([0.0, 0.0])
    d = jnp.array([1.0, 0.0])
    hit, t = intersect.ray_edge_2d(o, d, jnp.array([2.0, -1.0]),
                                   jnp.array([2.0, 1.0]))
    assert bool(hit) and float(t) == pytest.approx(2.0)
    # behind origin -> no hit (t1 >= 0 check, intersection.hlsl:216)
    hit, t = intersect.ray_edge_2d(o, d, jnp.array([-2.0, -1.0]),
                                   jnp.array([-2.0, 1.0]))
    assert not bool(hit) and float(t) == -1.0
    # parallel -> no hit
    hit, _ = intersect.ray_edge_2d(o, d, jnp.array([0.0, 1.0]),
                                   jnp.array([5.0, 1.0]))
    assert not bool(hit)


def test_project_ray_2d_height_affine():
    """Closed-form h0/hslope must match the reference's heightTo3DRay
    (intersection.hlsl:55-68) evaluated pointwise."""
    rng = np.random.default_rng(0)
    for _ in range(20):
        o = rng.normal(size=3)
        d = rng.normal(size=3)
        d /= np.linalg.norm(d)
        pt = np.array([1.0, 0.0, 0.0])
        pb = np.array([0.0, 1.0, 0.0])
        pn = np.array([0.0, 0.0, 1.0])
        po = rng.normal(size=3)
        o2, d2, h0, hslope = intersect.project_ray_2d(
            jnp.asarray(o), jnp.asarray(d), jnp.asarray(pt), jnp.asarray(pb),
            jnp.asarray(pn), jnp.asarray(po))
        # reference pointwise computation for a few t2d values
        for t2d in (0.0, 0.7, 3.0):
            d_plane = d - np.dot(d, pn) * pn
            len_plane = np.linalg.norm(d_plane)
            if len_plane < 1e-6:
                continue
            t3 = t2d / len_plane
            p3 = o + t3 * d
            hit2 = np.asarray(o2) + t2d * np.asarray(d2)
            p_pl = po + hit2[0] * pt + hit2[1] * pb
            href = np.dot(p3 - p_pl, pn)
            ours = float(h0) + t2d * float(hslope)
            assert ours == pytest.approx(href, abs=1e-5)


def test_node_test_prunes_by_height_band():
    # 2D triangle around origin; ray crosses it; band far below ray's height.
    verts = jnp.array([[[-1.0, -1.0], [3.0, -1.0], [1.0, 3.0]]])
    o2 = jnp.array([[-5.0, 0.5]])
    d2 = jnp.array([[1.0, 0.0]])
    h0 = jnp.array([5.0])        # ray is 5 above plane everywhere
    hslope = jnp.array([0.0])
    inside = intersect.node_test(o2, d2, verts[0],
                                 jnp.array([-0.1, 0.1]), h0, hslope)
    assert not bool(inside[0])   # band [-0.1, 0.1] excludes height 5
    inside = intersect.node_test(o2, d2, verts[0],
                                 jnp.array([-0.1, 6.0]), h0, hslope)
    assert bool(inside[0])
