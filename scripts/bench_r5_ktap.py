#!/usr/bin/env python
"""Round-5 sweep: (2k+1)-tap envelope schedule x pad-vs-mask edge handling.

Times the four 512^3 envelope passes (filled/free x y/z) for each variant,
checksum-verified against the k=1 masked kernel. Scalar-fetch timing
(docs/NOTES.md §8: block_until_ready does not wait through the axon tunnel).
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

f_filled = edt_pallas.line_pass_pallas(m)
f_free = edt_pallas.line_pass_pallas(~m)
fields = [("filled", f_filled), ("free", f_free)]


def timed(f, *args, reps=3):
    _ = float(f(*args))
    ts = []
    for _ in range(reps):
        t0 = time.perf_counter()
        _ = float(f(*args))
        ts.append(time.perf_counter() - t0)
    return float(np.median(ts))


ref_sums = {}
if len(sys.argv) > 2 and sys.argv[2] == "bb":
    # block-bytes sweep at the production schedule (k=12, serial, masks):
    # the free field looks LAUNCH-bound (~flat vs k; 2048 grid steps/pass
    # at 256KB tiles), so larger tiles may buy it back; the filled field
    # paid 21% for 1MB tiles at k=1 — re-measure at k=12.
    for bb in (256 * 1024, 512 * 1024, 1024 * 1024, 2 * 1024 * 1024):
        total = 0.0
        line = f"bb={bb>>10:5d}K:"
        ok = True
        for fname, f0 in fields:
            def run(g, bb=bb):
                edt_pallas._BLOCK_BYTES = bb
                g1 = edt_pallas.envelope_pass_pallas.__wrapped__(
                    g, 1, k=12, check_every=1)
                g2 = edt_pallas.envelope_pass_pallas.__wrapped__(
                    g1, 2, k=12, check_every=1)
                return jnp.sum(g2.astype(jnp.float32)) + 1e-3 * jnp.sum(
                    (g2 & 0xFF).astype(jnp.float32))
            f = jax.jit(run)
            s = float(f(f0))
            if fname not in ref_sums:
                ref_sums[fname] = s
            elif ref_sums[fname] != s:
                ok = False
            t = timed(f, f0, reps=5)
            total += t
            line += f"  {fname} {t*1e3:7.1f} ms"
        line += f"  TOTAL {total*1e3:7.1f} ms" + ("" if ok else "  !!! CHECKSUM MISMATCH")
        print(line, flush=True)
    sys.exit(0)
if len(sys.argv) > 2 and sys.argv[2] == "ab":
    # head-to-head IN ONE PROCESS: hoisted vs in-body edge masks (serial
    # reduction; tree lost the previous A/B) at the winning tap widths
    variants = [(k, hz) for k in (12, 16) for hz in (True, False)]
    for k, hz in variants:
        total = 0.0
        line = f"k={k:2d} hoist={int(hz)}:"
        ok = True
        for fname, f0 in fields:
            def run(g, k=k, hz=hz):
                g1 = edt_pallas.envelope_pass_pallas(g, 1, k=k, check_every=1, hoist=hz)
                g2 = edt_pallas.envelope_pass_pallas(g1, 2, k=k, check_every=1, hoist=hz)
                return jnp.sum(g2.astype(jnp.float32)) + 1e-3 * jnp.sum(
                    (g2 & 0xFF).astype(jnp.float32))
            f = jax.jit(run)
            s = float(f(f0))
            if fname not in ref_sums:
                ref_sums[fname] = s
            elif ref_sums[fname] != s:
                ok = False
            t = timed(f, f0, reps=5)
            total += t
            line += f"  {fname} {t*1e3:7.1f} ms"
        line += f"  TOTAL {total*1e3:7.1f} ms" + ("" if ok else "  !!! CHECKSUM MISMATCH")
        print(line, flush=True)
    sys.exit(0)
if len(sys.argv) > 2 and sys.argv[2] == "ext":
    # round 2 of the sweep: push tap width until it saturates (mask variant
    # won round 1; ce=1 won for k>=4)
    variants = [(8, False, 1), (12, False, 1), (16, False, 1),
                (24, False, 1), (32, False, 1)]
else:
    variants = []
    for k in (1, 2, 4, 8):
        for pad in (False, True):
            variants.append((k, pad, max(1, 8 // k)))
    # extra check-granularity points for the presumptive winners
    variants += [(4, True, 4), (8, True, 2), (2, True, 8)]

for k, pad, ce in variants:
    total = 0.0
    line = f"k={k} pad={int(pad)} ce={ce}:"
    ok = True
    for fname, f0 in fields:
        def run(g, k=k, pad=pad, ce=ce):
            g1 = edt_pallas.envelope_pass_pallas(g, 1, k=k, pad=pad, check_every=ce)
            g2 = edt_pallas.envelope_pass_pallas(g1, 2, k=k, pad=pad, check_every=ce)
            # two f32 checksums (full + low-byte) — robust enough for a sweep;
            # bit-exactness is re-proven by validate_512.py on the winner
            return jnp.sum(g2.astype(jnp.float32)) + 1e-3 * jnp.sum(
                (g2 & 0xFF).astype(jnp.float32)
            )

        f = jax.jit(run)
        s = float(f(f0))
        key = fname
        if key not in ref_sums:
            ref_sums[key] = s
        elif ref_sums[key] != s:
            ok = False
        t = timed(f, f0)
        total += t
        line += f"  {fname} {t*1e3:7.1f} ms"
    line += f"  TOTAL {total*1e3:7.1f} ms" + ("" if ok else "  !!! CHECKSUM MISMATCH")
    print(line, flush=True)
