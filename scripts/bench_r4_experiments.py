#!/usr/bin/env python
"""Round-4 on-chip experiments: (a) envelope tile-size sweep, (b) FT fwd/bwd
split, (c) segsum pass cost. Scalar-fetch timing (docs/NOTES.md §8)."""
import sys
import time

import numpy as np
import jax
import jax.numpy as jnp

sys.path.insert(0, "/root/repo")
import bench
from sdf_tools_tpu.ops import diff, edt, edt_pallas, feature

n = int(sys.argv[1]) if len(sys.argv) > 1 else 512
mask = bench.make_scene(n)
m = jnp.asarray(mask)


def timed(f, *args, reps=3):
    _ = float(f(*args))
    ts = []
    for _ in range(reps):
        t0 = time.perf_counter()
        _ = float(f(*args))
        ts.append(time.perf_counter() - t0)
    return float(np.median(ts))


# inputs for envelope sweeps
f_filled = edt_pallas.line_pass_pallas(m)
f_free = edt_pallas.line_pass_pallas(~m)

# (a) tile-size sweep on the filled-field y pass (the dominant cost)
print("== envelope block-bytes sweep (filled y-pass + z-pass) ==", flush=True)
orig = edt_pallas._BLOCK_BYTES
for bb in (1 << 20, 1 << 19, 1 << 18, 1 << 17):
    edt_pallas._BLOCK_BYTES = bb
    # new jit cache key per block size: close over bb via static wrapper
    def run(f0, bb=bb):
        edt_pallas._BLOCK_BYTES = bb
        g1 = edt_pallas.envelope_pass_pallas.__wrapped__(f0, 1)
        g2 = edt_pallas.envelope_pass_pallas.__wrapped__(g1, 2)
        return jnp.sum(g2.astype(jnp.float32))
    t = timed(jax.jit(run), f_filled)
    t_free = timed(jax.jit(run), f_free)
    print(f"block_bytes={bb>>10}KB: filled y+z {t*1e3:.1f} ms, free {t_free*1e3:.1f} ms", flush=True)
edt_pallas._BLOCK_BYTES = orig

# (b) FT forward (per-axis argmin) vs full grad
print("== FT fwd/bwd split ==", flush=True)
occ = m.astype(jnp.float32) * 0.9 + 0.05

def ft_fwd_only(o):
    msk = o > 0.5
    d2f, _, _, _ = diff._per_axis_argmin_ft(msk)
    d2g, _, _, _ = diff._per_axis_argmin_ft(~msk)
    vals = edt.d2_to_distance(d2f, 0.05) - edt.d2_to_distance(d2g, 0.05)
    return jnp.sum(vals ** 2)

t_fwd = timed(jax.jit(ft_fwd_only), occ)
print(f"FT fwd (2 fields, per-axis argmin): {t_fwd:.3f} s", flush=True)

def ft_grad(o):
    vals = diff.sdf_from_occupancy_ft(o, 0.05, "pallas")
    return jnp.sum(jax.grad(lambda x: jnp.sum(
        diff.sdf_from_occupancy_ft(x, 0.05, "pallas") ** 2))(o))

t_all = timed(jax.jit(lambda o: jnp.sum(jax.grad(
    lambda x: jnp.sum(diff.sdf_from_occupancy_ft(x, 0.05, "pallas") ** 2))(o))), occ)
print(f"FT value+grad total: {t_all:.3f} s  (bwd-ish = {t_all - t_fwd:.3f} s)", flush=True)

# (c) single segsum pass cost per axis
print("== segsum single-pass cost ==", flush=True)
rng = np.random.default_rng(0)
g = jnp.asarray(rng.standard_normal((n, n, n)).astype(np.float32))
# realistic monotone winner map: the actual z-pass argmin of the filled field
_, win_z = edt_pallas.envelope_argmin_pallas(
    edt_pallas.envelope_pass_pallas(f_filled, 1), 2)
for axis, w in ((2, win_z), (1, win_z), (0, win_z)):
    t = timed(jax.jit(lambda gg, ww, a=axis: jnp.sum(
        edt_pallas.winner_segment_sum_pallas(gg, ww, a))), g, w)
    print(f"segsum axis={axis}: {t*1e3:.1f} ms", flush=True)
