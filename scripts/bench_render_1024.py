#!/usr/bin/env python
"""Sphere-traced render over a 1024^3 SDF on ONE chip (BASELINE config #5's
volume scale, single-device leg).

Scene spheres are rasterized ON DEVICE (the host numpy loop takes ~15 min
at 1024^3 on this box's 4 cores; the same math is milliseconds on the
chip). The signed field is built slab-by-slab into a donated device buffer
(whole-volume lowmem intermediates OOM a 16 GB chip), then the production renderer
(`backend="auto"` -> plane sweep) traces h x w rays.

Usage: python scripts/bench_render_1024.py [n] [h w]
"""
import sys
from functools import partial
import time

sys.path.insert(0, "/root/repo")

import numpy as np
import jax
import jax.numpy as jnp

from sdf_tools_tpu.grid import GridMeta, SdfGrid, make_origin_transform
from sdf_tools_tpu.ops import edt, render


def device_scene(n: int, seed: int = 0):
    """Same sphere distribution as bench.make_scene, rasterized on device."""
    rng = np.random.default_rng(seed)
    c = rng.uniform(0, n, (40, 3)).astype(np.float32)
    r = rng.uniform(n * 0.03, n * 0.12, 40).astype(np.float32)

    @jax.jit
    def build(c, r):
        ii = jnp.arange(n, dtype=jnp.float32)
        mask = jnp.zeros((n, n, n), bool)

        def one(k, m):
            x2 = (ii - c[k, 0]) ** 2
            y2 = (ii - c[k, 1]) ** 2
            z2 = (ii - c[k, 2]) ** 2
            d2 = x2[:, None, None] + y2[None, :, None] + z2[None, None, :]
            return m | (d2 <= r[k] ** 2)

        return jax.lax.fori_loop(0, 40, one, mask)

    return build(jnp.asarray(c), jnp.asarray(r))


def main():
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 1024
    h = int(sys.argv[2]) if len(sys.argv) > 2 else 1024
    w = int(sys.argv[3]) if len(sys.argv) > 3 else 1024
    res = 0.05
    print(f"backend={jax.default_backend()}", flush=True)

    t0 = time.perf_counter()
    mask = device_scene(n)
    fill = float(jnp.mean(mask.astype(jnp.float32)))
    print(f"device scene {n}^3: {time.perf_counter()-t0:.1f}s fill={fill:.3f}",
          flush=True)

    # device-resident slabbed build: signed_field_lowmem's whole-volume
    # intermediates peak ~14 GB at 1024^3 (observed ResourceExhausted on a
    # 16 GB chip); here each slab's d^2 pair combines into a DONATED output
    # buffer, peak = mask 1.1 GB + values 4.3 GB + slab temps ~2 GB.
    t0 = time.perf_counter()
    n_slabs = 8
    sl = n // n_slabs
    resj = jnp.asarray(res, jnp.float32)

    @jax.jit
    def _blank():
        return jnp.zeros((n, n, n), jnp.float32)

    @partial(jax.jit, donate_argnums=(0,))
    def write_slab(buf, d2f, d2e, i):
        vals = edt.d2_to_distance(d2f, resj) - edt.d2_to_distance(d2e, resj)
        return jax.lax.dynamic_update_slice(buf, vals, (i * sl, 0, 0))

    values = _blank()
    fill_iter = edt.squared_edt_slabbed(mask, n_slabs)
    free_iter = edt.squared_edt_slabbed(~mask, n_slabs)
    for i, (d2f, d2e) in enumerate(zip(fill_iter, free_iter)):
        values = write_slab(values, d2f, d2e, jnp.int32(i))
    _ = float(jnp.sum(values))  # force completion (NOTES §8)
    t_field = time.perf_counter() - t0
    print(f"signed field (device slabbed): {t_field:.1f}s "
          f"({n**3/t_field/1e6:.0f} Mvox/s)", flush=True)
    del mask

    meta = GridMeta.create(make_origin_transform([0.0, 0.0, 0.0]), res, (n, n, n))
    sdf = SdfGrid(values=values, meta=meta, oob_value=jnp.float32(1e3))
    center = np.full(3, 0.5 * n * res)
    cam = center + np.array([-1.2 * n * res, 0.0, 0.4 * n * res])
    origins, dirs = render.camera_rays(
        jnp.asarray(cam, jnp.float32), jnp.asarray(center, jnp.float32),
        jnp.asarray([0.0, 0.0, 1.0]), 50.0, h, w,
    )
    f = jax.jit(
        lambda s, o, d: jnp.mean(
            render.render_depth(s, o, d, t_max=4.0 * n * res, max_steps=96).depth
        )
    )
    t0 = time.perf_counter()
    mean_depth = float(f(sdf, origins, dirs))
    print(f"compile+first frame: {time.perf_counter()-t0:.1f}s "
          f"mean_depth={mean_depth:.3f}", flush=True)
    times = []
    for _ in range(3):
        t0 = time.perf_counter()
        mean_depth = float(f(sdf, origins, dirs))
        times.append(time.perf_counter() - t0)
    t = float(np.median(times))
    print(f"render {h}x{w} over {n}^3: {t:.3f}s -> {h*w/t/1e6:.2f} Mrays/s "
          f"(mean_depth {mean_depth:.3f})", flush=True)


if __name__ == "__main__":
    main()
