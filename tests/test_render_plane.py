"""Plane-sweep renderer vs the exact XLA march (interpret mode, CPU).

The plane-sweep kernel must reproduce ops/render.py's hit decisions and
depths (same corrected-trilinear semantics) on coherent camera bundles,
and fall back to the XLA march for rows it cannot handle.
"""
import numpy as np
import jax
import jax.numpy as jnp
import pytest

from sdf_tools_tpu.grid import GridMeta, SdfGrid
from sdf_tools_tpu.ops import render, render_plane


def _sphere_scene(shape=(64, 64, 256), res=0.1):
    """Analytic SDF of two spheres sampled at cell centers."""
    meta = GridMeta.create(
        origin_transform=jnp.eye(4), resolution=res, shape=shape
    )
    nx, ny, nz = shape
    ii, jj, kk = np.meshgrid(
        np.arange(nx), np.arange(ny), np.arange(nz), indexing="ij"
    )
    pts = (np.stack([ii, jj, kk], -1) + 0.5) * res
    c1 = np.array([nx * 0.5, ny * 0.5, nz * 0.45]) * res
    c2 = np.array([nx * 0.65, ny * 0.35, nz * 0.55]) * res
    d1 = np.linalg.norm(pts - c1, axis=-1) - 0.2 * ny * res
    d2 = np.linalg.norm(pts - c2, axis=-1) - 0.12 * ny * res
    values = np.minimum(d1, d2).astype(np.float32)
    return SdfGrid.create(jnp.asarray(values), meta, oob_value=jnp.inf)


def _camera(shape, res, h, w, back=1.5, jitter=0.0):
    nx, ny, nz = shape
    center = np.array([nx, ny, nz]) * res * 0.5
    pos = center + np.array([-nx * res * back, ny * res * 0.1, nz * res * 0.05])
    if jitter:
        pos = pos + jitter
    return render.camera_rays(
        jnp.asarray(pos, jnp.float32),
        jnp.asarray(center, jnp.float32),
        jnp.asarray([0.0, 0.0, 1.0]),
        40.0,
        h,
        w,
    )


@pytest.fixture(scope="module")
def scene():
    return _sphere_scene()


def _run_both(sdf, origins, dirs, t_max=40.0, eps=1e-3, expect_resolved=True):
    d_ref, h_ref, _ = render._trace_depth(
        sdf.values, sdf, origins.reshape(-1, 3), dirs.reshape(-1, 3),
        0.0, t_max, eps, 96, None,
    )
    d_ps, h_ps, s_ps, diag = render_plane.plane_sweep_depth(
        sdf.values, sdf.meta, sdf.oob_value,
        origins, dirs,  # keep (h, w, 3): engages tile regrouping
        0.0, t_max, eps, 96, None, interpret=True, diag=True,
    )
    if expect_resolved:
        # the kernel must actually run (fallback would make the
        # agreement checks vacuous)
        assert int(diag["unresolved"]) == 0, int(diag["unresolved"])
        assert int(diag["n_act"]) > 0
    return map(
        np.asarray,
        (d_ref, h_ref, d_ps.reshape(-1), h_ps.reshape(-1), s_ps.reshape(-1)),
    )


def test_plane_sweep_matches_march(scene):
    o, v = _camera(scene.values.shape, float(scene.resolution), 32, 128)
    d_ref, h_ref, d_ps, h_ps, s_ps = _run_both(scene, o, v)
    res = float(scene.resolution)
    # hit agreement away from grazing rays
    agree = h_ref == h_ps
    assert agree.mean() > 0.98, agree.mean()
    both = h_ref & h_ps
    assert both.sum() > 100  # scene actually hit
    err = np.abs(d_ref[both] - d_ps[both])
    assert np.quantile(err, 0.95) < 0.5 * res, np.quantile(err, 0.95)
    assert np.median(err) < 0.1 * res, np.median(err)
    assert (s_ps[both] > 0).all()  # steps diagnostics are live


def test_plane_sweep_miss_depth_is_tmax(scene):
    o, v = _camera(scene.values.shape, float(scene.resolution), 8, 128)
    _, _, d_ps, h_ps, _ = _run_both(scene, o, v)
    assert np.allclose(d_ps[~h_ps], 40.0)


def test_plane_sweep_ray_starting_inside(scene):
    res = float(scene.resolution)
    shape = scene.values.shape
    center = np.array(shape) * res * 0.5
    center[2] = shape[2] * res * 0.45  # inside sphere 1
    o = np.tile(center, (128, 1)).astype(np.float32)
    v = np.tile([1.0, 0.0, 0.0], (128, 1)).astype(np.float32)
    d_ps, h_ps, _ = map(
        np.asarray,
        render_plane.plane_sweep_depth(
            scene.values, scene.meta, scene.oob_value, o, v,
            0.0, 40.0, 1e-3, 96, None, interpret=True,
        ),
    )
    assert h_ps.all()
    # immediate hit at the ray start (inside an obstacle)
    assert (d_ps < 2 * res).all(), d_ps[:4]


def test_plane_sweep_unresolved_fallback(scene):
    # z-dominant rays: axis 2 is unsupported for this grid shape, the
    # best supported axis violates the slope cap -> exact-march fallback
    res = float(scene.resolution)
    shape = scene.values.shape
    o = np.zeros((128, 3), np.float32)
    o[:, 0] = shape[0] * res * 0.5
    o[:, 1] = shape[1] * res * 0.5
    o[:, 2] = -1.0
    o[:, 0] += np.linspace(-0.5, 0.5, 128)
    v = np.tile([0.0, 0.0, 1.0], (128, 1)).astype(np.float32)
    d_ref, h_ref, _ = map(
        np.asarray,
        render._trace_depth(
            scene.values, scene, o, v, 0.0, 40.0, 1e-3, 96, None
        ),
    )
    d_ps, h_ps, _ = map(
        np.asarray,
        render_plane.plane_sweep_depth(
            scene.values, scene.meta, scene.oob_value, o, v,
            0.0, 40.0, 1e-3, 96, None, interpret=True,
        ),
    )
    np.testing.assert_array_equal(h_ref, h_ps)
    np.testing.assert_allclose(d_ref, d_ps, atol=1e-5)


def test_plane_sweep_negative_direction(scene):
    # camera on the +x side looking back: marching direction reversed
    res = float(scene.resolution)
    shape = scene.values.shape
    center = np.array(shape) * res * 0.5
    pos = center + np.array([shape[0] * res * 1.5, shape[1] * res * 0.1, 0.0])
    o, v = render.camera_rays(
        jnp.asarray(pos, jnp.float32), jnp.asarray(center, jnp.float32),
        jnp.asarray([0.0, 0.0, 1.0]), 40.0, 24, 128,
    )
    d_ref, h_ref, d_ps, h_ps, _ = _run_both(scene, o, v)
    agree = h_ref == h_ps
    assert agree.mean() > 0.98, agree.mean()
    both = h_ref & h_ps
    assert both.sum() > 50
    err = np.abs(d_ref[both] - d_ps[both])
    assert np.quantile(err, 0.95) < 0.5 * res


def test_plane_sweep_boundary_slivers():
    """Obstacles poking through the volume faces: crossings in the sliver
    between a grid face and the nearest plane center need the entry/exit
    virtual samples. Scored against dense-sampled ground truth."""
    shape, res = (64, 64, 256), 0.05
    rng = np.random.default_rng(2)
    meta = GridMeta.create(jnp.eye(4), res, shape)
    ii, jj, kk = np.meshgrid(
        np.arange(shape[0]), np.arange(shape[1]), np.arange(shape[2]),
        indexing="ij",
    )
    pts = (np.stack([ii, jj, kk], -1) + 0.5) * res
    d = np.full(shape, 1e9, np.float32)
    ext = np.array(shape) * res
    for _ in range(30):
        c = ext * rng.random(3)
        face = rng.integers(0, 7)
        if face < 6:
            ax, side = face % 3, face // 3
            c[ax] = (0.0 if side == 0 else ext[ax]) + res * rng.uniform(-6, 6)
        r = res * (5 + 15 * rng.random())
        d = np.minimum(d, np.linalg.norm(pts - c, axis=-1) - r)
    sdf = SdfGrid.create(jnp.asarray(d), meta, oob_value=jnp.inf)
    center = ext * 0.5
    cam = center + np.array([-shape[0] * res * 1.2, 0.0, ext[2] * 0.4])
    o, v = render.camera_rays(
        jnp.asarray(cam, jnp.float32), jnp.asarray(center, jnp.float32),
        jnp.asarray([0.0, 0.0, 1.0]), 50.0, 16, 128,
    )
    t_max, eps = 30.0, 1e-3
    d_ps, h_ps, _, diag = render_plane.plane_sweep_depth(
        sdf.values, sdf.meta, sdf.oob_value, o, v, 0.0, t_max, eps, 96, None,
        interpret=True, diag=True,
    )
    d_ps = np.asarray(d_ps).reshape(-1)
    h_ps = np.asarray(h_ps).reshape(-1)

    from sdf_tools_tpu.ops import query

    of = np.asarray(o).reshape(-1, 3)
    vf = np.asarray(v).reshape(-1, 3)
    ts = np.linspace(0.02, t_max, 4096).astype(np.float32)
    NR = of.shape[0]
    t_true = np.full(NR, np.inf, np.float32)
    for b0 in range(0, NR, 256):
        p = of[b0:b0+256, None, :] + ts[None, :, None] * vf[b0:b0+256, None, :]
        dv, ok = query.estimate_distance(sdf, jnp.asarray(p))
        below = np.asarray(ok & (dv < eps))
        hasb = below.any(axis=1)
        t_true[b0:b0+256] = np.where(hasb, ts[below.argmax(axis=1)], np.inf)
    has = np.isfinite(t_true)
    tol = 2 * (ts[1] - ts[0]) + 2 * res
    rep = np.where(h_ps, d_ps, np.inf)
    e = np.where(has & h_ps, np.abs(np.where(h_ps, d_ps, 0.0)
                                    - np.where(has, t_true, 0.0)), 0.0)
    correct = ((h_ps == has) & (e <= tol)).sum()
    # a handful of near-graze rays (true minimum within O(eps) of the
    # threshold) may resolve either way — same class of ambiguity the
    # march itself has
    assert correct >= NR - 8, (correct, NR)


def test_silhouette_no_net_false_misses():
    """Silhouette-heavy scene (sphere limb fills the image): against dense
    ground truth of the corrected trilinear, the plane-sweep may not lose
    hits on net — near-miss verification (kernel tnear tracking + exact
    window re-query) must recover every true limb hit (VERDICT r2 item 2)."""
    from sdf_tools_tpu.ops import query

    sdf = _sphere_scene(shape=(64, 64, 256), res=0.1)
    shape = sdf.meta.shape
    res = 0.1
    nx, ny, nz = shape
    # camera aimed at the big sphere's limb: a band of rays grazes it
    c1 = np.array([nx * 0.5, ny * 0.5, nz * 0.45]) * res
    r1 = 0.2 * ny * res
    limb = c1 + np.array([0.0, 0.0, r1])  # top of the sphere
    pos = limb + np.array([-nx * res * 1.5, 0.0, 0.0])
    origins, dirs = render.camera_rays(
        jnp.asarray(pos, jnp.float32), jnp.asarray(limb, jnp.float32),
        jnp.asarray([0.0, 0.0, 1.0]), 6.0, 16, 16,
    )
    t_max, eps = 40.0, 1e-3
    d_ps, h_ps, _, diag = render_plane.plane_sweep_depth(
        sdf.values, sdf.meta, jnp.inf, origins, dirs,
        0.0, t_max, eps, 96, None, interpret=True, diag=True,
    )
    assert int(diag["unresolved"]) == 0, "fallback would make this vacuous"

    # dense ground truth: first below-eps crossing of the exact corrected
    # trilinear along each ray (4096 samples over the full window)
    of = np.asarray(origins.reshape(-1, 3))
    vf = np.asarray(dirs.reshape(-1, 3))
    ts = np.linspace(1e-3, t_max, 4096).astype(np.float32)
    pts = of[:, None, :] + ts[None, :, None] * vf[:, None, :]
    dsm, ok = query.estimate_distance(sdf, jnp.asarray(pts))
    below = np.asarray(ok & (dsm < eps))
    truth_hit = below.any(axis=1)
    h = np.asarray(h_ps).reshape(-1)
    assert truth_hit.any() and (~truth_hit).any(), "scene must mix hit/miss"
    false_miss = int((truth_hit & ~h).sum())
    false_hit = int((~truth_hit & h).sum())
    assert false_miss == 0, (
        f"{false_miss} false misses (false hits: {false_hit}); "
        "near-miss verification must recover true silhouette hits"
    )
    # confirmed hits must sit at the true crossing depth (within the
    # ground truth's own sampling step)
    first = below.argmax(axis=1)
    t_true = ts[first]
    both = truth_hit & h
    dt = np.abs(np.asarray(d_ps).reshape(-1)[both] - t_true[both])
    assert float(dt.max()) < 0.15, f"depth err {dt.max():.3f}"
