#!/usr/bin/env python
"""Compare full-axis vs chunk-adaptive envelope kernels on the bench scene."""
import sys
import time

import numpy as np
import jax
import jax.numpy as jnp

sys.path.insert(0, "/root/repo")
import bench
from sdf_tools_tpu.ops import edt, edt_pallas

n = int(sys.argv[1]) if len(sys.argv) > 1 else 512
mask = bench.make_scene(n)
m = jnp.asarray(mask)


def timed(fn, *args, reps=3):
    out = jax.block_until_ready(fn(*args))
    t0 = time.perf_counter()
    for _ in range(reps):
        out = fn(*args)
    jax.block_until_ready(out)
    return (time.perf_counter() - t0) / reps, out


line = jax.jit(lambda s: edt_pallas.line_pass_pallas(s))
t_line, f_filled = timed(line, m)
_, f_free = timed(line, ~m)
print(f"line pass: {t_line*1e3:.1f} ms")

for name, fn in [
    ("full-axis", lambda g, a: edt_pallas.envelope_pass_pallas(g, a)),
    ("chunk64", lambda g, a: edt_pallas.envelope_pass_pallas_chunked(g, a, chunk=64)),
    ("chunk32", lambda g, a: edt_pallas.envelope_pass_pallas_chunked(g, a, chunk=32)),
    ("chunk128", lambda g, a: edt_pallas.envelope_pass_pallas_chunked(g, a, chunk=128)),
]:
    tot = 0.0
    outs = {}
    for fieldname, f0 in [("filled", f_filled), ("free", f_free)]:
        g1 = jax.jit(lambda g: fn(g, 1))
        g2 = jax.jit(lambda g: fn(g, 2))
        t1, o1 = timed(g1, f0)
        t2, o2 = timed(g2, o1)
        tot += t1 + t2
        outs[fieldname] = np.asarray(o2)
        print(f"  {name} {fieldname}: y {t1*1e3:7.1f} ms, z {t2*1e3:7.1f} ms")
    print(f"{name}: TOTAL envelope {tot*1e3:.1f} ms")
    if name == "full-axis":
        ref_outs = outs
    else:
        for k in outs:
            if not (outs[k] == ref_outs[k]).all():
                print(f"  !!! MISMATCH vs full-axis on {k}:",
                      (outs[k] != ref_outs[k]).sum(), "cells")
