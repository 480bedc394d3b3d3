#!/usr/bin/env python
"""CPU test-bed for plane-sweep thin-feature misses: cluttered small scene,
compare plane-sweep vs march vs dense-sampled ground truth."""
import sys

sys.path.insert(0, "/root/repo")

import numpy as np
import jax.numpy as jnp

from sdf_tools_tpu.grid import GridMeta, SdfGrid
from sdf_tools_tpu.ops import render, render_plane, query


def main():
    shape, res = (64, 64, 256), 0.05
    rng = np.random.default_rng(1)
    meta = GridMeta.create(jnp.eye(4), res, shape)
    ii, jj, kk = np.meshgrid(*[np.arange(s) for s in shape], indexing="ij")
    pts = (np.stack([ii, jj, kk], -1) + 0.5) * res
    d = np.full(shape, 1e9, np.float32)
    # many small spheres -> lots of grazing silhouettes
    for _ in range(24):
        c = (np.array(shape) * res) * (0.15 + 0.7 * rng.random(3))
        r = res * (4 + 10 * rng.random())
        d = np.minimum(d, np.linalg.norm(pts - c, axis=-1) - r)
    sdf = SdfGrid.create(jnp.asarray(d), meta, oob_value=jnp.inf)

    center = np.array(shape) * res * 0.5
    cam = center + np.array([-shape[0] * res * 1.3, 0.2, 0.1])
    o, v = render.camera_rays(
        jnp.asarray(cam, jnp.float32), jnp.asarray(center, jnp.float32),
        jnp.asarray([0.0, 0.0, 1.0]), 55.0, 32, 128,
    )
    t_max = 30.0
    eps = 1e-3

    d_ps, h_ps, _, diag = render_plane.plane_sweep_depth(
        sdf.values, sdf.meta, sdf.oob_value, o, v, 0.0, t_max, eps, 96, None,
        interpret=True, diag=True,
    )
    d_ref, h_ref, _ = render._trace_depth(
        sdf.values, sdf, o.reshape(-1, 3), v.reshape(-1, 3),
        0.0, t_max, eps, 96, None,
    )
    d_ps = np.asarray(d_ps).reshape(-1)
    h_ps = np.asarray(h_ps).reshape(-1)
    d_ref, h_ref = np.asarray(d_ref), np.asarray(h_ref)
    assert int(diag["unresolved"]) == 0, int(diag["unresolved"])

    # dense ground truth
    of = np.asarray(o).reshape(-1, 3)
    vf = np.asarray(v).reshape(-1, 3)
    ts = np.linspace(0.05, t_max, 8192).astype(np.float32)
    NR = of.shape[0]
    t_true = np.full(NR, np.inf, np.float32)
    B = 256
    for b0 in range(0, NR, B):
        p = of[b0:b0+B, None, :] + ts[None, :, None] * vf[b0:b0+B, None, :]
        dv, ok = query.estimate_distance(sdf, jnp.asarray(p))
        below = np.asarray(ok & (dv < eps))
        has = below.any(axis=1)
        first = below.argmax(axis=1)
        t_true[b0:b0+B] = np.where(has, ts[first], np.inf)
    has = np.isfinite(t_true)
    dt = ts[1] - ts[0]
    tol = 2 * dt + 2 * res

    def score(dd, hh, name):
        rep = np.where(hh, dd, np.inf)
        okhit = (hh == has)
        close = okhit & (np.where(has, np.abs(rep - t_true), 0.0) <= tol)
        fn = (~hh & has).sum()
        fp = (hh & ~has).sum()
        wrong_surface = (hh & has & (np.abs(rep - t_true) > tol)).sum()
        print(f"{name}: correct {close.sum()}/{NR}  false-miss {fn}  "
              f"false-hit {fp}  wrong-surface {wrong_surface}")
        return close

    print(f"true hits: {has.sum()}/{NR}")
    score(d_ps, h_ps, "plane-sweep")
    score(d_ref, h_ref, "march     ")


if __name__ == "__main__":
    main()
