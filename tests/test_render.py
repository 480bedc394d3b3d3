"""Voxelization + sphere-traced renderer tests, including pixel gradients."""
import numpy as np
import pytest

import jax
import jax.numpy as jnp

from sdf_tools_tpu.grid import GridMeta, SdfGrid, make_origin_transform
from sdf_tools_tpu.ops import edt, render, voxelize


def _sphere_scene(n=32, res=0.1, radius_cells=8):
    """Occupancy of a solid sphere centered in an n^3 grid at the origin frame."""
    c = (n - 1) / 2.0
    ii = np.arange(n)
    d2 = (
        (ii[:, None, None] - c) ** 2
        + (ii[None, :, None] - c) ** 2
        + (ii[None, None, :] - c) ** 2
    )
    mask = d2 <= radius_cells**2
    meta = GridMeta.create(make_origin_transform([0.0, 0.0, 0.0]), res, (n, n, n))
    sdf, _ = edt.extract_signed_distance_field(jnp.asarray(mask), meta, oob_value=1e3)
    return sdf, meta, mask


def test_voxelize_points_roundtrip():
    meta = GridMeta.create(make_origin_transform([0.0, 0.0, 0.0]), 0.1, (8, 8, 8))
    pts = np.array([[0.05, 0.05, 0.05], [0.75, 0.75, 0.75], [5.0, 5.0, 5.0]], np.float32)
    occ = np.asarray(voxelize.voxelize_points(jnp.asarray(pts), meta))
    assert occ[0, 0, 0] == 1.0
    assert occ[7, 7, 7] == 1.0
    assert occ.sum() == 2.0  # OOB point dropped


def test_soft_voxelize_matches_hard_near_centers():
    meta = GridMeta.create(make_origin_transform([0.0, 0.0, 0.0]), 0.1, (8, 8, 8))
    centers = np.asarray(meta.index_to_location(jnp.asarray([[2, 3, 4], [5, 5, 5]])))
    soft = np.asarray(voxelize.soft_voxelize_points(jnp.asarray(centers), meta, temperature=0.5))
    assert soft[2, 3, 4] > 0.5
    assert soft[5, 5, 5] > 0.5
    assert (soft >= 0).all() and (soft <= 1).all()


def test_soft_voxelize_grad_to_points():
    meta = GridMeta.create(make_origin_transform([0.0, 0.0, 0.0]), 0.1, (8, 8, 8))
    pts = jnp.asarray(np.array([[0.33, 0.41, 0.52]], np.float32))

    def loss(p):
        occ = voxelize.soft_voxelize_points(p, meta)
        return jnp.sum(occ * jnp.arange(8.0)[:, None, None])

    g = jax.grad(loss)(pts)
    assert np.isfinite(np.asarray(g)).all()
    assert float(jnp.abs(g).sum()) > 0


def test_render_sphere_depth():
    sdf, meta, _ = _sphere_scene()
    # camera on -x axis looking at sphere center
    center = np.asarray(meta.index_to_location(jnp.asarray([15, 15, 15]))).astype(float)
    cam = center - np.array([2.0, 0.0, 0.0])
    origins, dirs = render.camera_rays(cam, center, [0.0, 0.0, 1.0], 40.0, 16, 16)
    result = render.render_depth(sdf, origins, dirs, t_max=5.0)
    depth = np.asarray(result.depth)
    hit = np.asarray(result.hit)
    # central rays hit the sphere at distance ~ 2.0 - r (r = 0.8m +- half cell)
    assert hit[8, 8]
    assert abs(depth[8, 8] - (2.0 - 0.8)) < 0.15
    # corner rays (outside the sphere silhouette at 40 deg fov) miss
    assert not hit[0, 0]
    assert depth[0, 0] == 5.0
    # steps diagnostics is real: hitting rays report march work
    steps = np.asarray(result.steps)
    assert steps[8, 8] > 0
    assert steps.max() > 0


def test_render_depth_pixel_gradients_match_finite_difference():
    """IFT backward vs finite differences of the forward w.r.t. grid values."""
    sdf, meta, _ = _sphere_scene(n=24, radius_cells=6)
    center = np.asarray(meta.index_to_location(jnp.asarray([11, 11, 11]))).astype(float)
    cam = center - np.array([1.5, 0.0, 0.0])
    origins, dirs = render.camera_rays(cam, center, [0.0, 0.0, 1.0], 30.0, 5, 5)

    # freeze the hit mask from the unperturbed render so the loss has no
    # hit/miss jump discontinuities (those would contaminate the FD check)
    base = render.render_depth(sdf, origins, dirs, t_max=4.0, eps=1e-4)
    fixed_mask = jnp.asarray(np.asarray(base.hit))

    def loss(values):
        s = SdfGrid(values=values, meta=sdf.meta, oob_value=sdf.oob_value)
        r = render.render_depth(s, origins, dirs, t_max=4.0, eps=1e-4)
        return jnp.sum(jnp.where(fixed_mask, r.depth, 0.0))

    g = jax.grad(loss)(sdf.values)
    g = np.asarray(g)
    assert np.isfinite(g).all()
    nz = np.argwhere(np.abs(g) > 1e-4)
    assert len(nz) > 0, "some grid cells must receive gradient"
    # raising SDF values moves the zero isosurface inward (toward the
    # object), so rays travel farther: the summed gradient must be positive
    assert g.sum() > 0
    # directional derivative vs finite difference (f32-friendly epsilon);
    # perturb only the cells that received gradient
    rng = np.random.default_rng(0)
    delta = np.zeros_like(g)
    for (x, y, z) in nz:
        delta[x, y, z] = rng.standard_normal()
    delta /= np.linalg.norm(delta)
    eps = 3e-2
    vals = np.asarray(sdf.values)
    lp = float(loss(jnp.asarray(vals + eps * delta)))
    lm = float(loss(jnp.asarray(vals - eps * delta)))
    fd = (lp - lm) / (2 * eps)
    analytic = float((g * delta).sum())
    assert np.sign(fd) == np.sign(analytic)
    assert 0.3 < analytic / fd < 3.0


def test_render_grad_to_ray_origin():
    sdf, meta, _ = _sphere_scene(n=24, radius_cells=6)
    center = np.asarray(meta.index_to_location(jnp.asarray([11, 11, 11]))).astype(float)
    cam = center - np.array([1.5, 0.0, 0.0])
    o = jnp.asarray(cam[None, :], jnp.float32)
    d = jnp.asarray(np.array([[1.0, 0.0, 0.0]], np.float32))

    def loss(origin):
        r = render.render_depth(sdf, origin, d, t_max=4.0)
        return jnp.sum(r.depth)

    g = np.asarray(jax.grad(loss)(o))
    # moving the camera toward the sphere (+x) decreases depth ~1:1
    np.testing.assert_allclose(g[0, 0], -1.0, atol=0.1)
    np.testing.assert_allclose(g[0, 1:], 0.0, atol=0.1)


def test_render_jit():
    sdf, meta, _ = _sphere_scene(n=16, radius_cells=4)
    center = np.asarray(meta.index_to_location(jnp.asarray([7, 7, 7]))).astype(float)
    cam = center - np.array([1.0, 0.0, 0.0])
    origins, dirs = render.camera_rays(cam, center, [0.0, 0.0, 1.0], 40.0, 8, 8)
    f = jax.jit(lambda s: render.render_depth(s, origins, dirs, t_max=3.0).depth)
    d1 = np.asarray(f(sdf))
    d2 = np.asarray(render.render_depth(sdf, origins, dirs, t_max=3.0).depth)
    # jit and eager may take +-1 marching step (float reassociation); agree
    # to within the convergence tolerance
    np.testing.assert_allclose(d1, d2, atol=2e-3)
