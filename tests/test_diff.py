"""Differentiability bridges + dense estimate_distance sampling parity.

The dense sub-cell sampling mirrors the reference's estimate_distance_test
(/root/reference/src/estimate_distance_test.cpp): a rotated-origin grid
sampled at res/8 steps, values checked against the scalar oracle.
"""
import numpy as np
import pytest

import jax
import jax.numpy as jnp

from sdf_tools_tpu.grid import GridMeta, make_origin_transform
from sdf_tools_tpu.ops import diff, edt, query
from sdf_tools_tpu.oracle.reference_query import OracleSdf


def test_straight_through_sdf_gradient():
    occ = jnp.zeros((8, 8, 8)).at[3:5, 3:5, 3:5].set(1.0)
    res = jnp.float32(0.1)

    def loss(o):
        vals = diff.sdf_from_occupancy_st(o, res, "stencil")
        return jnp.sum(vals**2)

    vals = diff.sdf_from_occupancy_st(occ, res, "stencil")
    g = jax.grad(loss)(occ)
    # straight-through: dL/docc = dL/dsdf * (-2 res) elementwise
    expected = 2.0 * np.asarray(vals) * (-2.0 * 0.1)
    np.testing.assert_allclose(np.asarray(g), expected, rtol=1e-5)


def test_straight_through_wrapper_matches_forward():
    occ = jnp.zeros((6, 6, 6)).at[2:4, 2:4, 2:4].set(1.0)
    res = 0.1
    fwd = lambda o: edt.signed_field_from_masks(o > 0.5, res, "stencil")[0]
    st = diff.straight_through_sdf(fwd, res)
    np.testing.assert_allclose(np.asarray(st(occ)), np.asarray(fwd(occ)))
    g = jax.grad(lambda o: jnp.sum(st(o)))(occ)
    np.testing.assert_allclose(np.asarray(g), -2.0 * res, rtol=1e-6)


def test_dense_subcell_sampling_rotated_grid():
    """estimate_distance_test semantics: dense sub-cell queries on a grid
    with a rotated, translated origin; every sample must match the scalar
    oracle (the reference eyeballs this in rviz; we assert it)."""
    rng = np.random.default_rng(0)
    shape = (10, 10, 2)
    mask = np.zeros(shape, bool)
    mask[2:5, 3:7, :] = True
    mask[7, 1, :] = True
    theta = 0.35
    c, s = np.cos(theta), np.sin(theta)
    rot = np.array([[c, -s, 0], [s, c, 0], [0, 0, 1.0]])
    origin = make_origin_transform([0.4, -0.2, 0.05], rot)
    meta = GridMeta.create(origin, 0.1, shape)
    sdf, _ = edt.extract_signed_distance_field(jnp.asarray(mask), meta, oob_value=-10000.0)
    oracle = OracleSdf(np.asarray(sdf.values), 0.1, np.asarray(origin, np.float64), -10000.0)

    # dense sampling at res/8 through the middle slab, in world frame
    gx = np.arange(0.05, 0.95, 0.1 / 8)
    gy = np.arange(0.05, 0.95, 0.1 / 8)
    pts_grid = np.stack(np.meshgrid(gx, gy, indexing="ij"), -1)
    pts_grid = np.concatenate(
        [pts_grid, np.full(pts_grid.shape[:2] + (1,), 0.1)], axis=-1
    )
    pts_world = pts_grid @ rot.T + np.array([0.4, -0.2, 0.05])
    vals, oks = query.estimate_distance(sdf, jnp.asarray(pts_world, jnp.float32))
    vals, oks = np.asarray(vals), np.asarray(oks)
    checked = 0
    for i in range(0, pts_world.shape[0], 7):
        for j in range(0, pts_world.shape[1], 7):
            ov, ook = oracle.estimate_distance(pts_world[i, j].astype(np.float64))
            assert bool(oks[i, j]) == ook
            if ook:
                np.testing.assert_allclose(vals[i, j], ov, rtol=3e-4, atol=3e-5)
                checked += 1
    assert checked > 50


def test_gradient_flavors_agree_in_smooth_regions():
    """Discrete vs smooth vs autodiff gradients roughly agree away from the
    surface (the reference prints these side by side; we assert cosine
    similarity)."""
    n = 16
    c = (n - 1) / 2
    ii = np.arange(n)
    d2 = (
        (ii[:, None, None] - c) ** 2
        + (ii[None, :, None] - c) ** 2
        + (ii[None, None, :] - c) ** 2
    )
    mask = d2 <= 4**2
    meta = GridMeta.create(make_origin_transform([0.0, 0.0, 0.0]), 0.1, (n, n, n))
    sdf, _ = edt.extract_signed_distance_field(jnp.asarray(mask), meta, oob_value=1e3)

    pts = np.asarray(
        meta.index_to_location(jnp.asarray([[2, 8, 8], [13, 8, 8], [8, 2, 8]]))
    )
    idx = jnp.asarray([[2, 8, 8], [13, 8, 8], [8, 2, 8]])
    g_disc, _ = query.gradient(sdf, idx, enable_edge_gradients=True)
    g_smooth, _ = query.smooth_gradient(sdf, jnp.asarray(pts), 0.05)
    g_auto = query.autodiff_gradient(sdf, jnp.asarray(pts))
    for a, b in [(g_disc, g_smooth), (g_smooth, g_auto)]:
        a, b = np.asarray(a), np.asarray(b)
        cos = (a * b).sum(-1) / (
            np.linalg.norm(a, axis=-1) * np.linalg.norm(b, axis=-1) + 1e-12
        )
        assert (cos > 0.97).all()
