#!/usr/bin/env python
"""512^3 bit-accuracy validation: TPU pallas EDT vs native C++ exact EDT.

BASELINE target: bit-accurate SDFs vs the reference algorithm class at 512^3.
The TPU field must match the exact EDT everywhere (int32 d^2 equality), and
the f32 signed combine must match the float64 combine to <= 1 ulp.
"""
import sys, time
import numpy as np

sys.path.insert(0, __import__("os").path.dirname(__import__("os").path.dirname(__import__("os").path.abspath(__file__))))

import jax
import jax.numpy as jnp
from bench import make_scene
from sdf_tools_tpu import native
from sdf_tools_tpu.ops import edt

n = int(sys.argv[1]) if len(sys.argv) > 1 else 512
mask = make_scene(n)
backend = "pallas" if jax.default_backend() in ("tpu", "axon") else "stencil"

t0 = time.time()
d2_tpu = np.asarray(jax.jit(lambda m: edt.squared_edt(m, backend=backend))(jnp.asarray(mask)))
print(f"TPU d2: {time.time()-t0:.2f}s")

t0 = time.time()
d2_ref = native.edt_exact(mask)
print(f"native exact d2: {time.time()-t0:.2f}s")

mismatch = int((d2_tpu.astype(np.int64) != d2_ref).sum())
print(f"d2 mismatches: {mismatch} / {mask.size}")
assert mismatch == 0, "TPU EDT is not exact!"

# fused dual-field path (the production signed-field route, NOTES §17):
# on-device elementwise comparison against the oracle-validated single
# path, scalar mismatch counts fetched (full volumes never cross the
# tunnel)
t0 = time.time()
def _dual_mismatches(m, ref_a):
    fa, fb = edt.squared_edt_both(m, backend=backend)  # traced ONCE
    return (
        jnp.sum(fa != ref_a),
        jnp.sum(fb != edt.squared_edt(~m, backend=backend)),
    )

mm_a, mm_b = jax.jit(_dual_mismatches)(jnp.asarray(mask), jnp.asarray(d2_tpu))
print(f"dual-field fused path: {time.time()-t0:.2f}s, "
      f"mismatches filled={int(mm_a)} free={int(mm_b)}")
assert int(mm_a) == 0 and int(mm_b) == 0, "fused dual path deviates!"

# signed combine check (f32 vs f64)
d2_free = np.asarray(jax.jit(lambda m: edt.squared_edt(~m, backend=backend))(jnp.asarray(mask)))
res = 0.05
f64 = (np.sqrt(d2_ref.astype(np.float64)) - np.sqrt(native.edt_exact(~mask).astype(np.float64))) * res
f32_tpu = np.asarray(edt.d2_to_distance(jnp.asarray(d2_tpu), res) - edt.d2_to_distance(jnp.asarray(d2_free), res))
ulp = np.abs(f32_tpu - f64.astype(np.float32)) / np.maximum(np.abs(f64), 1e-12) / np.finfo(np.float32).eps
print(f"signed combine: max ulp error vs f64 = {np.nanmax(ulp):.2f}")
assert np.nanmax(ulp) <= 4.0
print("PASS: bit-exact d2 at %d^3; combine within f32 rounding of f64" % n)
