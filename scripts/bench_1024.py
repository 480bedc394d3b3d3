#!/usr/bin/env python
"""1024^3 (1.07e9 voxel) exact signed field on ONE chip, slab-streamed.

Measures the beyond-HBM path (ops/edt.signed_field_slabbed) with the async
device->host drain window, and reports the component split the VERDICT asks
for: mask upload (host->device, one bulk transfer), device compute+drain
wall, and the transfer-only floor (re-fetch of the result bytes).

Usage: python scripts/bench_1024.py [n] [n_slabs]
"""
import sys
import time

sys.path.insert(0, "/root/repo")

import numpy as np
import jax
import jax.numpy as jnp

from bench import make_scene
from sdf_tools_tpu.ops import edt


def main():
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 1024
    n_slabs = int(sys.argv[2]) if len(sys.argv) > 2 else 8
    print(f"scene {n}^3, {n_slabs} slabs, backend={jax.default_backend()}",
          flush=True)
    t0 = time.perf_counter()
    mask = make_scene(n)
    print(f"scene gen (host): {time.perf_counter()-t0:.1f}s "
          f"fill={mask.mean():.3f}", flush=True)

    # bulk host->device upload of the bool mask (the only H2D transfer)
    t0 = time.perf_counter()
    m_dev = jax.device_put(jnp.asarray(mask))
    m_dev.block_until_ready()
    # force a real sync through the tunnel: fetch a reduced scalar
    _ = float(jnp.sum(m_dev.astype(jnp.int32)))
    t_upload = time.perf_counter() - t0
    print(f"mask upload + sync: {t_upload:.1f}s "
          f"({mask.nbytes/1e6:.0f} MB)", flush=True)

    t0 = time.perf_counter()
    out = edt.signed_field_slabbed(m_dev, 0.05, n_slabs=n_slabs)
    t_field = time.perf_counter() - t0
    print(f"signed_field_slabbed: {t_field:.1f}s "
          f"-> {n**3/t_field/1e6:.0f} Mvox/s (incl. D2H drain of "
          f"{out.nbytes/1e9:.1f} GB)", flush=True)
    print(f"sanity: min={out.min():.3f} max={out.max():.3f}", flush=True)

    # compute-only estimate: run one field's slabs without draining results
    t0 = time.perf_counter()
    acc = jnp.zeros((), jnp.float32)
    for d2 in edt.squared_edt_slabbed(m_dev, n_slabs):
        acc = acc + jnp.sum(d2.astype(jnp.float32))
    _ = float(acc)
    t_compute_one = time.perf_counter() - t0
    print(f"compute-only, one field (no D2H): {t_compute_one:.1f}s "
          f"(x2 fields ~ {2*t_compute_one:.1f}s)", flush=True)
    print(f"TOTAL wall (upload + field): {t_upload + t_field:.1f}s", flush=True)


if __name__ == "__main__":
    main()
