"""Query layer vs the scalar oracle + pinned reference semantics."""
import numpy as np
import pytest

import jax
import jax.numpy as jnp

from sdf_tools_tpu.grid import GridMeta, SdfGrid, make_origin_transform
from sdf_tools_tpu.ops import edt, query
from sdf_tools_tpu.oracle.reference_query import OracleSdf


def _rot_z(theta):
    c, s = np.cos(theta), np.sin(theta)
    return np.array([[c, -s, 0.0], [s, c, 0.0], [0.0, 0.0, 1.0]])


def _make_sdf(seed=0, shape=(10, 12, 6), res=0.1, rotate=False, oob=-10000.0):
    rng = np.random.default_rng(seed)
    mask = rng.random(shape) < 0.15
    if not mask.any():
        mask[1, 1, 1] = True
    origin = make_origin_transform(
        [0.3, -0.2, 0.1], _rot_z(0.7) if rotate else None
    )
    meta = GridMeta.create(origin, res, shape)
    sdf, _ = edt.extract_signed_distance_field(jnp.asarray(mask), meta, oob_value=oob)
    oracle = OracleSdf(np.asarray(sdf.values), res, np.asarray(origin, np.float64), oob)
    return sdf, oracle


@pytest.mark.parametrize("rotate", [False, True])
def test_estimate_distance_vs_oracle(rotate):
    sdf, oracle = _make_sdf(rotate=rotate)
    rng = np.random.default_rng(1)
    # sample points inside and slightly outside the volume
    pts = rng.uniform(-0.3, 1.6, size=(200, 3)).astype(np.float32)
    vals, oks = query.estimate_distance(sdf, jnp.asarray(pts))
    vals, oks = np.asarray(vals), np.asarray(oks)
    for k in range(len(pts)):
        ov, ook = oracle.estimate_distance(pts[k].astype(np.float64))
        assert oks[k] == ook, f"in_bounds mismatch at {pts[k]}"
        if ook:
            np.testing.assert_allclose(vals[k], ov, rtol=2e-4, atol=2e-5)


def test_estimate_distance_at_cell_centers():
    """At cell centers the interpolated value equals the corrected distance."""
    sdf, oracle = _make_sdf()
    idx = np.array([[2, 3, 1], [0, 0, 0], [9, 11, 5], [5, 5, 3]])
    centers = np.asarray(sdf.meta.index_to_location(jnp.asarray(idx)))
    vals, oks = query.estimate_distance(sdf, jnp.asarray(centers))
    for k in range(len(idx)):
        ov, ook = oracle.estimate_distance(centers[k].astype(np.float64))
        assert bool(np.asarray(oks)[k]) == ook
        np.testing.assert_allclose(np.asarray(vals)[k], ov, rtol=2e-4, atol=2e-5)


@pytest.mark.parametrize("rotate", [False, True])
@pytest.mark.parametrize("edge", [False, True])
def test_grid_gradients_vs_oracle(rotate, edge):
    sdf, oracle = _make_sdf(rotate=rotate)
    nx, ny, nz = sdf.shape
    rng = np.random.default_rng(2)
    idx = np.stack(
        [rng.integers(0, n, size=60) for n in (nx, ny, nz)], axis=-1
    ).astype(np.int32)
    grads, valid = query.gradient(sdf, jnp.asarray(idx), enable_edge_gradients=edge)
    grads, valid = np.asarray(grads), np.asarray(valid)
    for k in range(len(idx)):
        og = oracle.gradient(*idx[k], enable_edge_gradients=edge)
        if og is None:
            assert not valid[k]
        else:
            assert valid[k]
            np.testing.assert_allclose(grads[k], og, rtol=1e-4, atol=1e-5)


def test_full_gradient_matches_pointwise():
    sdf, oracle = _make_sdf(rotate=True)
    dense = np.asarray(query.full_gradient(sdf, enable_edge_gradients=True))
    nx, ny, nz = sdf.shape
    for (x, y, z) in [(0, 0, 0), (3, 4, 2), (nx - 1, ny - 1, nz - 1), (5, 0, 3)]:
        og = oracle.gradient(x, y, z, enable_edge_gradients=True)
        np.testing.assert_allclose(dense[x, y, z], og, rtol=1e-4, atol=1e-5)


def test_test_bindings_gradient_value():
    """Pinned: /root/reference/test/test_bindings.py asserts gradient [1.5, 0]."""
    res = 0.05
    mask = np.zeros((20, 40, 1), bool)
    mask[3, 1, 0] = True
    meta = GridMeta.create(make_origin_transform([-10.0, -20.0, 0.0]), res, (20, 40, 1))
    sdf, _ = edt.extract_signed_distance_field(jnp.asarray(mask), meta, oob_value=-10000.0)
    g = np.asarray(query.full_gradient(sdf, enable_edge_gradients=True))
    np.testing.assert_allclose(g[4, 1, 0, :2], [1.5, 0.0], atol=1e-6)


def test_autodiff_gradient_matches_analytic():
    """jax.grad through estimate_distance == hand finite differences of it."""
    sdf, _ = _make_sdf(rotate=True)
    rng = np.random.default_rng(3)
    pts = rng.uniform(0.35, 0.75, size=(20, 3)).astype(np.float32)
    ag = np.asarray(query.autodiff_gradient(sdf, jnp.asarray(pts)))
    eps = 1e-3
    for k in range(len(pts)):
        fd = np.zeros(3)
        for a in range(3):
            e = np.zeros(3, np.float32)
            e[a] = eps
            vp, _ = query.estimate_distance(sdf, jnp.asarray(pts[k] + e))
            vm, _ = query.estimate_distance(sdf, jnp.asarray(pts[k] - e))
            fd[a] = (float(vp) - float(vm)) / (2 * eps)
        # trilinear is piecewise-smooth; skip points straddling a cell face
        if np.all(np.abs(ag[k] - fd) < 5e-2):
            np.testing.assert_allclose(ag[k], fd, atol=5e-2)


def test_smooth_gradient_runs_and_is_sane():
    sdf, _ = _make_sdf()
    pts = np.array([[0.55, 0.4, 0.25], [0.31, -0.15, 0.12]], np.float32)
    g, ok = query.smooth_gradient(sdf, jnp.asarray(pts), nominal_window_size=0.05)
    assert np.asarray(ok).all()
    assert np.isfinite(np.asarray(g)).all()


def test_distance_to_boundary():
    sdf, _ = _make_sdf()
    inside_pt = np.asarray(sdf.meta.index_to_location(jnp.array([5, 6, 3])))
    # just past the +x face: displacement on x is small and negative, so it is
    # both the min-|.| axis and the returned value (reference sdf.hpp:976-989)
    sizes = np.asarray(sdf.meta.sizes)
    outside_pt = inside_pt + np.array([sizes[0], 0, 0], np.float32) * 0.55
    d_in, ok_in = query.distance_to_boundary(sdf, jnp.asarray(inside_pt))
    d_out, ok_out = query.distance_to_boundary(sdf, jnp.asarray(outside_pt))
    assert bool(ok_in) and float(d_in) > 0
    assert not bool(ok_out) and float(d_out) < 0


def test_project_out_of_collision():
    sdf, _ = _make_sdf(seed=5, shape=(16, 16, 8), res=0.1)
    vals = np.asarray(sdf.values)
    inside = np.argwhere(vals < -0.05)
    if len(inside) == 0:
        pytest.skip("no interior cells in this random scene")
    pts = np.asarray(sdf.meta.index_to_location(jnp.asarray(inside[:8])))
    out, success = query.project_out_of_collision(sdf, jnp.asarray(pts))
    out = np.asarray(out)
    d_after, _ = query.estimate_distance(sdf, jnp.asarray(out))
    d_after = np.asarray(d_after)
    assert (d_after[np.asarray(success)] > 0).all()
    assert np.asarray(success).mean() > 0.5  # most points should escape


def test_project_into_valid_volume():
    sdf, _ = _make_sdf()
    pts = np.array([[99.0, 99.0, 99.0], [0.5, 0.4, 0.2]], np.float32)
    out = np.asarray(query.project_into_valid_volume(sdf, jnp.asarray(pts)))
    ok = np.asarray(sdf.meta.location_in_bounds(jnp.asarray(out)))
    assert ok.all()
    # in-bounds point is untouched
    np.testing.assert_allclose(out[1], pts[1], atol=1e-6)


def test_estimate_distance_jit_and_grad_to_values():
    """estimate_distance is differentiable w.r.t. grid values (render path)."""
    sdf, _ = _make_sdf()
    pts = jnp.asarray(np.array([[0.5, 0.4, 0.3]], np.float32))

    def loss(values):
        s2 = SdfGrid(values=values, meta=sdf.meta, oob_value=sdf.oob_value)
        v, _ = query.estimate_distance(s2, pts)
        return jnp.sum(v)

    g = jax.jit(jax.grad(loss))(sdf.values)
    assert np.isfinite(np.asarray(g)).all()
    assert float(jnp.sum(jnp.abs(g))) > 0  # 8 corner cells get weight
    np.testing.assert_allclose(float(jnp.sum(g)), 1.0, rtol=1e-5)  # trilinear weights sum to 1


def test_full_gradient_user_function():
    """GetFullGradient's user GradientFunction parameter (sdf.hpp:341-358):
    a custom rule must be applied verbatim; the default must equal the
    built-in finite-difference rule."""
    sdf, _ = _make_sdf()

    def doubled(s, idx, edge):
        g, _ = query.gradient(s, idx, enable_edge_gradients=edge)
        return 2.0 * g

    custom = np.asarray(query.full_gradient(sdf, True, gradient_function=doubled))
    default = np.asarray(query.full_gradient(sdf, True))
    np.testing.assert_allclose(custom, 2.0 * default, rtol=1e-6, atol=1e-7)


def test_interpolation_stencil_matches_autodiff():
    """interpolation_stencil must reproduce estimate_distance's value, the
    autodiff point-gradient (grid frame), and valid scatter weights
    (sum w = 1, d(value)/d(corner) = w)."""
    for rotate in (False, True):
        sdf, _ = _make_sdf(seed=2, rotate=rotate)
        rng = np.random.default_rng(5)
        ext = np.asarray(sdf.meta.sizes)
        pts_grid = rng.uniform(0.01, 0.99, (64, 3)) * ext
        pts = np.asarray(sdf.meta.grid_to_world(jnp.asarray(pts_grid, jnp.float32)))
        pts = jnp.asarray(pts)

        idx8, w8, val, grad_grid, ok = query.interpolation_stencil(sdf, pts)
        ref_val, ref_ok = query.estimate_distance(sdf, pts)
        np.testing.assert_array_equal(np.asarray(ok), np.asarray(ref_ok))
        np.testing.assert_allclose(np.asarray(val), np.asarray(ref_val), rtol=1e-5, atol=1e-6)
        np.testing.assert_allclose(np.asarray(w8).sum(-1), 1.0, rtol=1e-5)

        # world gradient vs autodiff
        from sdf_tools_tpu.grid import rotate_points

        n = np.asarray(rotate_points(sdf.meta.origin_transform[:3, :3], grad_grid))
        ref_n = np.asarray(query.autodiff_gradient(sdf, pts))
        np.testing.assert_allclose(n, ref_n, rtol=1e-4, atol=1e-5)

        # d(value)/d(corner values) == weights (vjp of estimate_distance)
        cot = np.asarray(rng.standard_normal(val.shape), np.float32)

        def f(vals):
            s = SdfGrid(values=vals, meta=sdf.meta, oob_value=sdf.oob_value)
            d, _ = query.estimate_distance(s, pts)
            return jnp.sum(d * cot)

        ref_dv = np.asarray(jax.grad(f)(sdf.values))
        dv = np.zeros(sdf.values.size, np.float32)
        np.add.at(dv, np.asarray(idx8).reshape(-1), (np.asarray(w8) * cot[:, None]).reshape(-1))
        np.testing.assert_allclose(dv.reshape(sdf.values.shape), ref_dv, rtol=1e-4, atol=1e-6)
