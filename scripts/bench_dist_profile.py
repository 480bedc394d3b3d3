#!/usr/bin/env python
"""Profile the bench scene's per-pass distance distribution at 512^3.

For each envelope pass (y then z, filled and free fields), report the
distribution of the per-tile adaptive iteration count D under:
  (a) current tiling: full scan axis per tile, footprint (4 x, 128 z)
  (b) chunked tiling: scan axis chunks of L with halo L (proposed)
This predicts the win from scan-axis chunking before building the kernel.
"""
import sys
import numpy as np
import jax
import jax.numpy as jnp

sys.path.insert(0, "/root/repo")
from sdf_tools_tpu.ops import edt

n = 512
L = int(sys.argv[1]) if len(sys.argv) > 1 else 128

sys.path.insert(0, "/root/repo")
import bench

mask = bench.make_scene(n)
print("fill:", mask.mean())

m = jnp.asarray(mask)


def profile(seed_mask, name):
    # pass 1: x line distances
    f = jax.jit(lambda s: edt._line_d2_pallas(s))(seed_mask)
    for axis in (1, 2):
        # winner distance for the envelope pass along `axis`:
        # after the pass, out[i] = min_j f[j]+(i-j)^2; iterations needed at a
        # cell = sqrt(out[i]) (winner offset). Compute out via current pallas.
        out = jax.jit(lambda g: edt._envelope_pass_pallas(g, axis))(f)
        d = np.sqrt(np.asarray(out, np.float64))
        d = np.minimum(d, n)  # clip INF lines
        # current tiling: tiles (4, FULL, 128) for axis=1 / (xt,8,FULL) axis=2
        if axis == 1:
            tiles = d.reshape(128, 4, 512, 4, 128).max(axis=(1, 2, 4))
        else:
            tiles = d.reshape(32, 16, 64, 8, 512).max(axis=(1, 3, 4))
        # chunked tiling: chunks of L along the scan axis, same footprint
        dm = np.moveaxis(d, axis, -1)
        chunks = dm.reshape(-1, n // L, L).max(axis=-1)
        eff_chunk = np.minimum(chunks, L)  # capped by halo; rest -> phase 2
        frac_unfinished = (chunks > L).mean()
        print(
            f"{name} axis={axis}: cell-d mean={d.mean():7.1f} p50={np.median(d):6.0f} "
            f"p95={np.percentile(d,95):6.0f} max={d.max():6.0f}"
        )
        print(
            f"   current tiles: D mean={tiles.mean():7.1f} (work/cell ~{7*tiles.mean():7.0f})"
        )
        print(
            f"   chunked L={L}: phase1 D mean={eff_chunk.mean():6.1f} "
            f"(work/cell ~{3*7*eff_chunk.mean():6.0f}), unfinished chunk frac={frac_unfinished:.3f}"
        )
        f = jnp.asarray(out)


profile(m, "filled")
profile(~m, "free  ")
