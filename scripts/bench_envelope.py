#!/usr/bin/env python
"""Compare full-axis vs chunk-adaptive envelope kernels on the bench scene.

Timing forces a host scalar fetch per rep (docs/NOTES.md §8: on the axon
backend block_until_ready does not wait for device completion).
"""
import sys
import time

import numpy as np
import jax
import jax.numpy as jnp

sys.path.insert(0, "/root/repo")
import bench
from sdf_tools_tpu.ops import edt_pallas

n = int(sys.argv[1]) if len(sys.argv) > 1 else 512
mask = bench.make_scene(n)
m = jnp.asarray(mask)


def timed(fn, x, *static, reps=3):
    f = jax.jit(lambda a: jnp.sum(fn(a, *static).astype(jnp.float32)))
    ref = float(f(x))  # compile + warm
    ts = []
    for _ in range(reps):
        t0 = time.perf_counter()
        chk = float(f(x))
        ts.append(time.perf_counter() - t0)
    assert chk == ref
    out = fn(x, *static)  # for chaining/correctness (async handle)
    return float(np.median(ts)), out, ref


t_line, f_filled, _ = timed(edt_pallas.line_pass_pallas, m)
_, f_free, _ = timed(edt_pallas.line_pass_pallas, ~m)
print(f"line pass: {t_line*1e3:.1f} ms")

variants = [
    ("full-axis", lambda g, a: edt_pallas.envelope_pass_pallas(g, a)),
]
ref_sums = {}
for name, fn in variants:
    tot = 0.0
    for fieldname, f0 in [("filled", f_filled), ("free", f_free)]:
        t1, o1, s1 = timed(fn, f0, 1)
        t2, o2, s2 = timed(fn, o1, 2)
        tot += t1 + t2
        key = (fieldname,)
        print(f"  {name} {fieldname}: y {t1*1e3:7.1f} ms, z {t2*1e3:7.1f} ms")
        if name == "full-axis":
            ref_sums[key] = (s1, s2)
        elif ref_sums.get(key) != (s1, s2):
            print(f"  !!! checksum mismatch vs full-axis on {fieldname}")
    print(f"{name}: TOTAL envelope {tot*1e3:.1f} ms")
