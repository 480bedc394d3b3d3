#!/usr/bin/env python
"""Cost attribution for the plane-sweep renderer on the real chip.

Times the 512^3/1024^2 bench frame under the trace-time ablation knobs
(PS_TAIL / PS_PROBES / PS_EE) to split the frame into: main-pass kernel,
3-point dip probes, entry/exit virtual samples, and the exact-verification
tail. Production never sets these knobs; this is measurement scratch in the
spirit of scripts/bench_micro_*.py.
"""
import os
import sys
import time

sys.path.insert(0, "/root/repo")

import numpy as np
import jax
import jax.numpy as jnp

from bench import make_scene
from sdf_tools_tpu.grid import GridMeta, make_origin_transform
from sdf_tools_tpu.ops import edt, render, render_plane


def main():
    n, h, w = 512, 1024, 1024
    res = 0.05
    mask = make_scene(n)
    backend = "pallas" if jax.default_backend() in ("tpu", "axon") else "stencil"
    meta = GridMeta.create(make_origin_transform([0.0, 0.0, 0.0]), res, mask.shape)
    sdf, _ = edt.extract_signed_distance_field(
        jnp.asarray(mask), meta, oob_value=1e3, backend=backend
    )
    center = np.full(3, 0.5 * n * res)
    cam = center + np.array([-1.2 * n * res, 0.0, 0.4 * n * res])
    origins, dirs = render.camera_rays(
        jnp.asarray(cam, jnp.float32), jnp.asarray(center, jnp.float32),
        jnp.asarray([0.0, 0.0, 1.0]), 50.0, h, w,
    )
    t_max = 4.0 * n * res
    perm, _ = render_plane.tile_perm(h, w, h * w)
    ofj = jnp.asarray(origins.reshape(-1, 3)[perm])
    vfj = jnp.asarray(dirs.reshape(-1, 3)[perm])

    configs = [
        ("full (tail+probes+ee)", {}, {}),
        ("kernel only (tail off)", {"PS_TAIL": "0"}, {}),
        ("kernel, probes off", {"PS_TAIL": "0", "PS_PROBES": "0"}, {}),
        ("kernel, ee off", {"PS_TAIL": "0", "PS_EE": "0"}, {}),
        ("kernel, probes+ee off", {"PS_TAIL": "0", "PS_PROBES": "0", "PS_EE": "0"}, {}),
        ("kernel, single-buffer", {"PS_TAIL": "0"}, {"double_buffer": False}),
        ("kernel, no early exit", {"PS_TAIL": "0"}, {"early_exit": False}),
        ("kernel, no band select (WRONG)", {"PS_TAIL": "0", "PS_NOSEL": "1"}, {}),
        ("kernel, refine_iters=0", {"PS_TAIL": "0"}, {"refine_iters": 0}),
        ("kernel, secant", {"PS_TAIL": "0"}, {"refine_mode": "secant"}),
        ("kernel, sb+secant", {"PS_TAIL": "0"},
         {"double_buffer": False, "refine_mode": "secant"}),
        ("kernel, sb+refine0", {"PS_TAIL": "0"},
         {"double_buffer": False, "refine_iters": 0}),
        ("full, sb+secant", {},
         {"double_buffer": False, "refine_mode": "secant"}),
        ("kernel, secant+noexit", {"PS_TAIL": "0"},
         {"refine_mode": "secant", "early_exit": False}),
        ("full, db+secant", {}, {"refine_mode": "secant"}),
    ]
    only = os.environ.get("ABL_ONLY")
    if only:
        pats = [p.strip().lower() for p in only.split(",") if p.strip()]
        configs = [c for c in configs if any(p in c[0].lower() for p in pats)]
    knob_names = ["PS_TAIL", "PS_PROBES", "PS_EE", "PS_NOSEL"]
    for label, env, kw in configs:
        for k in knob_names:
            os.environ.pop(k, None)
        os.environ.update(env)

        def core(v, o_, v_, kw=kw):
            kwargs = dict(refine_iters=6)
            kwargs.update(kw)
            r = render_plane._plane_sweep_core(
                v, meta.inv_origin_transform, meta.resolution, o_, v_,
                0.0, float(t_max), 1e-3, **kwargs,
            )
            return jnp.sum(r[0]), jnp.sum(r[1].astype(jnp.int32)), r[11]

        f = jax.jit(core)
        t0 = time.perf_counter()
        out = [float(x) for x in f(sdf.values, ofj, vfj)]
        tc = time.perf_counter() - t0
        times = []
        for _ in range(5):
            t0 = time.perf_counter()
            _ = [float(x) for x in f(sdf.values, ofj, vfj)]
            times.append(time.perf_counter() - t0)
        t = float(np.median(times))
        print(
            f"{label:28s} {t*1e3:7.1f} ms/frame  {h*w/t/1e6:5.2f} Mrays/s  "
            f"hits={out[1]:.0f} exec_slabs={out[2]:.0f} (compile {tc:.0f}s)",
            flush=True,
        )


if __name__ == "__main__":
    main()
