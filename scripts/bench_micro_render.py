#!/usr/bin/env python
"""Microbenchmark the plane-sweep renderer primitive loop.

Per (plane, ray-row) step: aligned dynamic (16,256) band extraction from a
resident (512,512) plane (sublane offsets must be 8-aligned, lane offsets
128-aligned — Mosaic vector.load constraint), per-lane column gathers via
take_along_axis on 128-wide halves, 16-row one-hot bilinear combine,
marching arithmetic. Measures per-step cost to validate the renderer cost
model (docs/NOTES.md §7 follow-up).

Timing forces a host scalar fetch (docs/NOTES.md §8).
"""
import time

import numpy as np
import jax
import jax.numpy as jnp
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

ROWS = 128  # ray rows per batch (each 128 rays)
STEPS = 256  # plane steps simulated


def _gather_cols(band, zi):
    """band: (16, 256); zi: (16, 128) int32 in [0, 255] -> (16, 128)."""
    lo = jnp.take_along_axis(band[:, :128], jnp.clip(zi, 0, 127), axis=1)
    hi = jnp.take_along_axis(band[:, 128:], jnp.clip(zi - 128, 0, 127), axis=1)
    return jnp.where(zi < 128, lo, hi)


def kernel(plane_ref, y_ref, z_ref, o_ref):
    def row_body(r, acc):
        y = y_ref[pl.ds(r, 1), :]  # (1,128) f32 positions
        z = z_ref[pl.ds(r, 1), :]
        y0 = jnp.floor(y).astype(jnp.int32)
        z0 = jnp.floor(z).astype(jnp.int32)
        ybase = (jnp.min(y0) // 8) * 8
        zbase = (jnp.min(z0) // 128) * 128
        band = plane_ref[pl.ds(ybase, 16), pl.ds(zbase, 256)]  # (16,256)
        zi = jnp.clip(z0 - zbase, 0, 254)
        zb = jnp.broadcast_to(zi, (16, 128))
        g0 = _gather_cols(band, zb)
        g1 = _gather_cols(band, zb + 1)
        ry = jnp.clip(y0 - ybase, 0, 14)
        rows_iota = lax.broadcasted_iota(jnp.int32, (16, 128), 0)
        sel0 = rows_iota == jnp.broadcast_to(ry, (16, 128))
        sel1 = rows_iota == jnp.broadcast_to(ry + 1, (16, 128))
        fy = y - y0.astype(y.dtype)
        fz = z - z0.astype(z.dtype)
        v00 = jnp.sum(jnp.where(sel0, g0, 0.0), axis=0, keepdims=True)
        v01 = jnp.sum(jnp.where(sel0, g1, 0.0), axis=0, keepdims=True)
        v10 = jnp.sum(jnp.where(sel1, g0, 0.0), axis=0, keepdims=True)
        v11 = jnp.sum(jnp.where(sel1, g1, 0.0), axis=0, keepdims=True)
        F = (
            v00 * (1 - fy) * (1 - fz)
            + v01 * (1 - fy) * fz
            + v10 * fy * (1 - fz)
            + v11 * fy * fz
        )
        return acc + jnp.sum(F)

    def step_body(s, acc):
        return acc + lax.fori_loop(0, ROWS, row_body, jnp.float32(0.0))

    o_ref[0, 0] = lax.fori_loop(0, STEPS, step_body, jnp.float32(0.0))


@jax.jit
def run(plane, y, z):
    out = pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((1, 1), jnp.float32),
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)] * 3,
        out_specs=pl.BlockSpec(memory_space=pltpu.SMEM),
    )(plane, y, z)
    return out[0, 0]


def main():
    rng = np.random.default_rng(0)
    plane = jnp.asarray(rng.random((512, 512)), jnp.float32)
    y = jnp.asarray(10 + 400 * rng.random((ROWS, 128)), jnp.float32)
    z = jnp.asarray(10 + 300 * rng.random((ROWS, 128)), jnp.float32)
    ref = float(run(plane, y, z))  # compile + warm
    reps = 5
    t0 = time.perf_counter()
    for _ in range(reps):
        chk = float(run(plane, y, z))
    dt = (time.perf_counter() - t0) / reps
    assert chk == ref
    n_steps = ROWS * STEPS
    per_step = dt / n_steps
    print(f"total {dt*1e3:.2f} ms for {n_steps} row-steps")
    print(f"per 128-ray row-step: {per_step*1e9:.0f} ns")
    print(f"==> projected rays/s, full 512-plane sweep: {128 / (per_step*512) / 1e6:.2f} M")


if __name__ == "__main__":
    main()
