#!/usr/bin/env python
"""Fused dual-field EDT (NOTES §15 addendum): on-chip exactness + timing.

Compares the fused path (dual line pass + dual envelope kernels) against
the separate per-field path on the 512^3 bench scene, sweeping the free
field's tap width k_free. Scalar-fetch timing discipline (NOTES §8).

Usage: python scripts/bench_r5_dual.py [n] [k_free ...]
"""
import sys
import time

sys.path.insert(0, "/root/repo")

import numpy as np
import jax
import jax.numpy as jnp

from bench import make_scene
from sdf_tools_tpu.ops import edt, edt_pallas


def timeit(fn, *args, repeats=5):
    _ = float(fn(*args))
    ts = []
    for _ in range(repeats):
        t0 = time.perf_counter()
        _ = float(fn(*args))
        ts.append(time.perf_counter() - t0)
    return float(np.median(ts)), float(np.min(ts)), float(np.max(ts))


def main():
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 512
    kfs = [int(a) for a in sys.argv[2:]] or [2, 4, 8, 12]
    mask = jnp.asarray(make_scene(n))

    def chk(a, b):
        return jnp.sum(a % 97) + jnp.sum(b % 97)

    @jax.jit
    def separate(m):
        return chk(edt.squared_edt(m, "pallas"), edt.squared_edt(~m, "pallas"))

    def fused(m, kf):
        fa, fb = edt_pallas.line_pass_dual_pallas(m)
        fa, fb = edt_pallas.envelope_dual_pallas(fa, fb, 1, kb=kf)
        fa, fb = edt_pallas.envelope_dual_pallas(fa, fb, 2, kb=kf)
        return fa, fb

    ref = int(separate(mask))
    med, lo, hi = timeit(separate, mask)
    print(f"separate: {med*1e3:.1f} ms (min {lo*1e3:.1f} max {hi*1e3:.1f}) "
          f"chk={ref}", flush=True)

    for kf in kfs:
        fj = jax.jit(lambda m, kf=kf: chk(*fused(m, kf)))
        got = int(fj(mask))
        med, lo, hi = timeit(fj, mask)
        print(f"fused k_free={kf:2d}: {med*1e3:.1f} ms "
              f"(min {lo*1e3:.1f} max {hi*1e3:.1f}) chk_equal={got == ref}",
              flush=True)

    # full signed field (what bench.py's edt_512 measures)
    res = jnp.float32(0.05)

    @jax.jit
    def signed(m):
        return jnp.sum(edt.signed_field_from_masks(m, res, "pallas")[0])

    med, lo, hi = timeit(signed, mask)
    print(f"signed_field (fused path): {med*1e3:.1f} ms "
          f"(min {lo*1e3:.1f} max {hi*1e3:.1f})", flush=True)


if __name__ == "__main__":
    main()
