#!/usr/bin/env python
"""Dissect individual plane-sweep vs march disagreement rays from a
PS_DUMP npz (scripts/bench_render_plane.py). Prints, per ray, the exact
corrected-trilinear profile around the disputed depth(s) plus the kernel's
plane-sample values — enough to attribute each false miss / unwitnessed hit
to a mechanism (invalid pair, inactive slab, model blindness, comparison
artifact).

Usage: python scripts/dissect_rays.py /tmp/fm_dump.npz [n_rays]
"""
import sys

sys.path.insert(0, "/root/repo")

import numpy as np
import jax
import jax.numpy as jnp

from bench import make_scene
from sdf_tools_tpu.grid import GridMeta, make_origin_transform, SdfGrid
from sdf_tools_tpu.ops import edt, render, render_plane, query


def main():
    path = sys.argv[1] if len(sys.argv) > 1 else "/tmp/fm_dump.npz"
    nshow = int(sys.argv[2]) if len(sys.argv) > 2 else 6
    d = np.load(path)
    fm, po = d["fm"], d["po"]
    rd, d_ps, tnear = d["rd"], d["d_ps"], d["tnear"]

    n = 512
    res = 0.05
    mask = make_scene(n)
    meta = GridMeta.create(make_origin_transform([0.0, 0.0, 0.0]), res, mask.shape)
    backend = "pallas" if jax.default_backend() in ("tpu", "axon") else "stencil"
    sdf, _ = edt.extract_signed_distance_field(
        jnp.asarray(mask), meta, oob_value=1e3, backend=backend
    )
    center = np.full(3, 0.5 * n * res)
    cam = center + np.array([-1.2 * n * res, 0.0, 0.4 * n * res])
    h = w = 1024
    origins, dirs = render.camera_rays(
        jnp.asarray(cam, jnp.float32), jnp.asarray(center, jnp.float32),
        jnp.asarray([0.0, 0.0, 1.0]), 50.0, h, w,
    )
    perm, _ = render_plane.tile_perm(h, w, h * w)
    of = np.asarray(origins.reshape(-1, 3))[perm]
    vf = np.asarray(dirs.reshape(-1, 3))[perm]

    def profile(i, t_center, label):
        oo = jnp.asarray(of[i])
        vv = jnp.asarray(vf[i])
        ts = jnp.linspace(max(t_center - 0.3, 1e-3), t_center + 0.3, 601)
        pts = oo[None, :] + ts[:, None] * vv[None, :]
        dv, ok = query.estimate_distance(sdf, pts)
        dv = np.asarray(jnp.where(ok, dv, np.inf))
        tsn = np.asarray(ts)
        below = dv < 1e-3
        j = np.argmin(dv)
        # compact profile: d at every 20th sample
        prof = " ".join(
            f"{tsn[k]:.3f}:{dv[k]:+.4f}" for k in range(0, 601, 40)
        )
        print(f"    profile: {prof}")
        # below-eps runs
        runs = []
        k = 0
        while k < 601:
            if below[k]:
                k2 = k
                while k2 < 601 and below[k2]:
                    k2 += 1
                runs.append((tsn[k], tsn[k2 - 1]))
                k = k2
            else:
                k += 1
        print(f"    below-eps runs: {[(round(a,4), round(b,4)) for a,b in runs[:6]]}")
        print(
            f"  [{label}] around t={t_center:.4f}: min d={dv[j]:.5f} at "
            f"t={tsn[j]:.4f}; below-eps span="
            f"{(below.sum() * (tsn[1]-tsn[0])):.4f} "
            f"({below.sum()} of 601 samples)"
        )
        # the sample d at the integer plane crossings nearest the center
        ax = int(np.argmax(np.abs(vf[i])))
        u0 = (of[i] / res)[ax]
        v0 = (vf[i] / res)[ax]
        ux_c = u0 + v0 * t_center
        for k in range(-2, 3):
            uxp = np.floor(ux_c - 0.5) + 0.5 + k
            tp = (uxp - u0) / v0
            p = jnp.asarray(of[i] + tp * vf[i])[None]
            dv2, ok2 = query.estimate_distance(sdf, p)
            print(
                f"    plane x={uxp:7.1f} t={tp:.4f} d_exact="
                f"{float(dv2[0]):.5f} ok={bool(ok2[0])}"
            )

    idx_fm = np.where(fm)[0][:nshow]
    print(f"=== false misses (march hit @ rd, plane missed): {fm.sum()} total")
    for i in idx_fm:
        print(
            f"ray {i}: of={of[i].round(3)} vf={vf[i].round(3)} "
            f"march_d={rd[i]:.4f} plane_d={d_ps[i]:.4f} tnear="
            f"{tnear[i] if tnear[i] < 1e29 else float('inf'):.4f}"
        )
        profile(i, float(rd[i]), "at march depth")

    idx_po = np.where(po)[0][:nshow]
    print(f"=== plane-only hits (march missed): {po.sum()} total")
    for i in idx_po:
        print(
            f"ray {i}: of={of[i].round(3)} vf={vf[i].round(3)} "
            f"plane_d={d_ps[i]:.4f} march_d={rd[i]:.4f}"
        )
        profile(i, float(d_ps[i]), "at plane depth")


if __name__ == "__main__":
    main()
