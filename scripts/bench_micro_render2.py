#!/usr/bin/env python
"""Bisect the plane-sweep primitive cost: which part of the row-step is slow?

Variants:
  load    — dynamic (16,256) band load only, sum it
  loadtaa — + 4 take_along_axis lane gathers
  full    — + one-hot-16 row select + bilinear (the real sampler)
  static  — full, but band base fixed at (0,0) (no dynamic addresses/scalars)
  mxu     — full, but column gathers via one-hot matmul on the MXU
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


def _taa_cols(band, zi):
    lo = jnp.take_along_axis(band[:, :128], jnp.clip(zi, 0, 127), axis=1)
    hi = jnp.take_along_axis(band[:, 128:], jnp.clip(zi - 128, 0, 127), axis=1)
    return jnp.where(zi < 128, lo, hi)


def _mxu_cols(band, zrow):
    """band (16,256); zrow (1,128) -> values at per-lane columns via MXU."""
    iota = lax.broadcasted_iota(jnp.int32, (256, 128), 0)
    sel = (iota == jnp.broadcast_to(zrow, (256, 128))).astype(band.dtype)
    g0 = jax.lax.dot_general(
        band, sel, (((1,), (0,)), ((), ())), preferred_element_type=jnp.float32
    )  # (16,128)
    sel1 = pltpu.roll(sel, shift=-1, axis=0)
    g1 = jax.lax.dot_general(
        band, sel1, (((1,), (0,)), ((), ())), preferred_element_type=jnp.float32
    )
    return g0, g1


def make_kernel(variant):
    def kernel(plane_ref, y_ref, z_ref, o_ref):
        def row_body(r, acc):
            y = y_ref[pl.ds(r, 1), :]
            z = z_ref[pl.ds(r, 1), :]
            y0 = jnp.floor(y).astype(jnp.int32)
            z0 = jnp.floor(z).astype(jnp.int32)
            if variant == "static":
                ybase = jnp.int32(0)
                zbase = jnp.int32(0)
            else:
                ybase = (jnp.min(y0) // 8) * 8
                zbase = (jnp.min(z0) // 128) * 128
            band = plane_ref[pl.ds(ybase, 16), pl.ds(zbase, 256)]
            if variant == "load":
                return acc + jnp.sum(band)
            zi = jnp.clip(z0 - zbase, 0, 254)
            ry = jnp.clip(y0 - ybase, 0, 14)
            if variant == "mxu":
                g0, g1 = _mxu_cols(band, zi)
            else:
                zb = jnp.broadcast_to(zi, (16, 128))
                g0 = _taa_cols(band, zb)
                g1 = _taa_cols(band, zb + 1)
            if variant == "loadtaa":
                return acc + jnp.sum(g0) + jnp.sum(g1)
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

    return kernel


def run_variant(variant, plane, y, z):
    @jax.jit
    def run(plane, y, z):
        out = pl.pallas_call(
            make_kernel(variant),
            out_shape=jax.ShapeDtypeStruct((1, 1), jnp.float32),
            in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)] * 3,
            out_specs=pl.BlockSpec(memory_space=pltpu.SMEM),
        )(plane, y, z)
        return out[0, 0]

    try:
        _ = float(run(plane, y, z))
    except Exception as e:
        print(f"{variant:8s}: FAILED {type(e).__name__}: {str(e)[:160]}")
        return
    reps = 5
    t0 = time.perf_counter()
    for _ in range(reps):
        _ = float(run(plane, y, z))
    dt = (time.perf_counter() - t0) / reps
    per_step = dt / (ROWS * STEPS)
    print(f"{variant:8s}: {per_step*1e9:7.0f} ns/row-step "
          f"-> {128/(per_step*512)/1e6:6.2f} M rays/s full-sweep")


def main():
    rng = np.random.default_rng(0)
    plane = jnp.asarray(rng.random((512, 512)), jnp.float32)
    y = jnp.asarray(10 + 400 * rng.random((ROWS, 128)), jnp.float32)
    z = jnp.asarray(10 + 300 * rng.random((ROWS, 128)), jnp.float32)
    for v in (sys.argv[1:] or ["load", "loadtaa", "full", "static", "mxu"]):
        run_variant(v, plane, y, z)


if __name__ == "__main__":
    main()
