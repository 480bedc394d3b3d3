#!/usr/bin/env python
"""Isolate the cost of dynamic VMEM loads inside a Pallas kernel.

The plane-sweep sampler needs a per-ray-row band of the resident plane at a
data-dependent offset. bench_micro_render2 showed that load alone costs
~2 us. Which flavor is slow, and do rolls / unrolling help?
"""
import sys
import time

import numpy as np
import jax
import jax.numpy as jnp
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

ROWS = 128
STEPS = 128


def make_kernel(variant):
    def kernel(plane_ref, y_ref, z_ref, o_ref):
        def row_body(r, acc):
            y = y_ref[pl.ds(r, 1), :]
            z = z_ref[pl.ds(r, 1), :]
            y0 = jnp.floor(y).astype(jnp.int32)
            z0 = jnp.floor(z).astype(jnp.int32)
            ybase = (jnp.min(y0) // 8) * 8
            zbase = (jnp.min(z0) // 128) * 128
            if variant == "dyn2d":
                band = plane_ref[pl.ds(ybase, 16), pl.ds(zbase, 256)]
            elif variant == "dynrow":
                band = plane_ref[pl.ds(ybase, 16), :]
            elif variant == "dyncol":
                band = plane_ref[0:16, pl.ds(zbase, 256)]
            elif variant == "static":
                band = plane_ref[0:16, 0:256]
                band = band + ybase.astype(jnp.float32)  # keep scalars live
            elif variant == "smalldyn":
                band = plane_ref[pl.ds(ybase, 8), pl.ds(zbase, 128)]
            elif variant == "dynrot":
                wide = plane_ref[pl.ds(ybase, 16), :]
                band = pltpu.roll(wide, shift=zbase, axis=1)[:, 0:256]
            elif variant == "scalars":
                # no load at all: just the scalar extractions
                return acc + ybase.astype(jnp.float32) + zbase.astype(jnp.float32)
            else:
                raise ValueError(variant)
            return acc + jnp.sum(band)

        def step_body(s, acc):
            if variant == "unroll8":
                a = acc
                for rr in range(8):
                    def rb(r, a2, rr=rr):
                        return row_body(r * 8 + rr, a2)
                    a = lax.fori_loop(0, ROWS // 8, lambda r, a2, rr=rr: row_body(r * 8 + rr, a2), a)
                return a
            return acc + lax.fori_loop(0, ROWS, row_body, jnp.float32(0.0))

        o_ref[0, 0] = lax.fori_loop(0, STEPS, step_body, jnp.float32(0.0))

    return kernel


def make_unroll_kernel():
    """dyn2d but with the row loop python-unrolled in groups of 8."""
    def kernel(plane_ref, y_ref, z_ref, o_ref):
        def group_body(g, acc):
            for k in range(8):
                r = g * 8 + k
                y = y_ref[pl.ds(r, 1), :]
                z = z_ref[pl.ds(r, 1), :]
                y0 = jnp.floor(y).astype(jnp.int32)
                z0 = jnp.floor(z).astype(jnp.int32)
                ybase = (jnp.min(y0) // 8) * 8
                zbase = (jnp.min(z0) // 128) * 128
                band = plane_ref[pl.ds(ybase, 16), pl.ds(zbase, 256)]
                acc = acc + jnp.sum(band)
            return acc

        def step_body(s, acc):
            return acc + lax.fori_loop(0, ROWS // 8, group_body, jnp.float32(0.0))

        o_ref[0, 0] = lax.fori_loop(0, STEPS, step_body, jnp.float32(0.0))

    return kernel


def run_variant(variant, plane, y, z):
    kernel = make_unroll_kernel() if variant == "unroll8" else make_kernel(variant)

    @jax.jit
    def run(plane, y, z):
        out = pl.pallas_call(
            kernel,
            out_shape=jax.ShapeDtypeStruct((1, 1), jnp.float32),
            in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)] * 3,
            out_specs=pl.BlockSpec(memory_space=pltpu.SMEM),
        )(plane, y, z)
        return out[0, 0]

    try:
        _ = float(run(plane, y, z))
    except Exception as e:
        print(f"{variant:9s}: FAILED {type(e).__name__}: {str(e)[:140]}", flush=True)
        return
    reps = 5
    t0 = time.perf_counter()
    for _ in range(reps):
        _ = float(run(plane, y, z))
    dt = (time.perf_counter() - t0) / reps
    per_step = dt / (ROWS * STEPS)
    print(f"{variant:9s}: {per_step*1e9:7.0f} ns/row-step", flush=True)


def main():
    rng = np.random.default_rng(0)
    plane = jnp.asarray(rng.random((512, 512)), jnp.float32)
    y = jnp.asarray(10 + 400 * rng.random((ROWS, 128)), jnp.float32)
    z = jnp.asarray(10 + 200 * rng.random((ROWS, 128)), jnp.float32)
    for v in (sys.argv[1:] or
              ["scalars", "static", "smalldyn", "dyn2d", "dynrow", "dyncol",
               "dynrot", "unroll8"]):
        run_variant(v, plane, y, z)


if __name__ == "__main__":
    main()
