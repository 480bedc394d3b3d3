#!/usr/bin/env python
"""Surgically isolate per-iteration costs of Pallas sampler primitives.

CRITICAL: a host scalar fetch costs ~25-35 ms fixed per call through the
axon tunnel, so per-iteration cost MUST be measured as a SLOPE between two
iteration counts (the fixed dispatch+RPC cost cancels). Single-call
"ns/iter" numbers at small iteration counts are pure RPC noise.

Variants (reports slope ns/iteration between ITERS_LO and ITERS_HI):
  fori      — empty fori body (loop overhead floor)
  smem      — 2 SMEM scalar reads
  load_s    — static (24,256) band load (+smem reads)
  load_d0   — dynamic major-dim load: (64,8,512) ref, ds on dim 0 -> (3,8,512)
  load_dsub — dynamic sublane base, full lanes (24,512)
  load_d2d  — dynamic sublane+lane (24,256)
  sample    — load_d0 + full bilinear sample of 128 rays (taa + one-hot-24)
"""
import sys
import time

import numpy as np
import jax
import jax.numpy as jnp
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

ITERS_LO = 4096
ITERS_HI = 32768


def _taa512(band24, zi):
    """band24 (24,512), zi (1,128) in [0,510] -> (24,128) per-lane columns."""
    zb = jnp.broadcast_to(zi, (24, 128))
    out = None
    for h in range(4):
        part = jnp.take_along_axis(
            band24[:, 128 * h : 128 * (h + 1)],
            jnp.clip(zb - 128 * h, 0, 127), axis=1,
        )
        sel = (zb >= 128 * h) & (zb < 128 * (h + 1))
        out = part if out is None else jnp.where(sel, part, out)
    return out


def make_kernel(variant, iters):
    def kernel(ytab_ref, ztab_ref, plane_ref, cube_ref, y_ref, z_ref, o_ref):
        def body(i, acc):
            if variant == "fori":
                return acc + jnp.float32(1.0)
            ybase = (ytab_ref[i] // 8) * 8
            zbase = (ztab_ref[i] // 128) * 128
            if variant == "smem":
                return acc + (ybase + zbase).astype(jnp.float32)
            if variant == "load_s":
                band = plane_ref[0:24, 0:256]
                return acc + jnp.sum(band) + (ybase + zbase).astype(jnp.float32)
            if variant == "load_d0":
                band = cube_ref[pl.ds(ybase // 8, 3), :, :]
                return acc + jnp.sum(band) + zbase.astype(jnp.float32)
            if variant == "load_dsub":
                band = plane_ref[pl.ds(ybase, 24), :]
                return acc + jnp.sum(band) + zbase.astype(jnp.float32)
            if variant == "load_d2d":
                band = plane_ref[pl.ds(ybase, 24), pl.ds(zbase, 256)]
                return acc + jnp.sum(band)
            if variant == "sample":
                r = i & 127
                band = cube_ref[pl.ds(ybase // 8, 3), :, :].reshape(24, 512)
                y = y_ref[pl.ds(r, 1), :]
                z = z_ref[pl.ds(r, 1), :]
                y0 = jnp.floor(y).astype(jnp.int32)
                z0 = jnp.floor(z).astype(jnp.int32)
                zi = jnp.clip(z0, 0, 510)
                ry = jnp.clip(y0 - ybase, 0, 22)
                g0 = _taa512(band, zi)
                g1 = _taa512(band, zi + 1)
                rows_iota = lax.broadcasted_iota(jnp.int32, (24, 128), 0)
                sel0 = rows_iota == jnp.broadcast_to(ry, (24, 128))
                sel1 = rows_iota == jnp.broadcast_to(ry + 1, (24, 128))
                fy = y - y0.astype(y.dtype)
                fz = z - z0.astype(z.dtype)
                v00 = jnp.sum(jnp.where(sel0, g0, 0.0), axis=0, keepdims=True)
                v01 = jnp.sum(jnp.where(sel0, g1, 0.0), axis=0, keepdims=True)
                v10 = jnp.sum(jnp.where(sel1, g0, 0.0), axis=0, keepdims=True)
                v11 = jnp.sum(jnp.where(sel1, g1, 0.0), axis=0, keepdims=True)
                F = (v00 * (1 - fy) * (1 - fz) + v01 * (1 - fy) * fz
                     + v10 * fy * (1 - fz) + v11 * fy * fz)
                return acc + jnp.sum(F)
            raise ValueError(variant)

        o_ref[0, 0] = lax.fori_loop(0, iters, body, jnp.float32(0.0))

    return kernel


def timed_call(variant, iters, args, reps=6):
    @jax.jit
    def run(*a):
        out = pl.pallas_call(
            make_kernel(variant, iters),
            out_shape=jax.ShapeDtypeStruct((1, 1), jnp.float32),
            in_specs=[
                pl.BlockSpec(memory_space=pltpu.SMEM),
                pl.BlockSpec(memory_space=pltpu.SMEM),
                pl.BlockSpec(memory_space=pltpu.VMEM),
                pl.BlockSpec(memory_space=pltpu.VMEM),
                pl.BlockSpec(memory_space=pltpu.VMEM),
                pl.BlockSpec(memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec(memory_space=pltpu.SMEM),
        )(*a)
        return out[0, 0]

    _ = float(run(*args))
    ts = []
    for _ in range(reps):
        t0 = time.perf_counter()
        _ = float(run(*args))
        ts.append(time.perf_counter() - t0)
    return float(np.median(ts))


def run_variant(variant, args):
    try:
        t_lo = timed_call(variant, ITERS_LO, args)
        t_hi = timed_call(variant, ITERS_HI, args)
    except Exception as e:
        print(f"{variant:10s}: FAILED {type(e).__name__}: {str(e)[:300]}", flush=True)
        return
    slope = (t_hi - t_lo) / (ITERS_HI - ITERS_LO)
    print(f"{variant:10s}: {slope*1e9:7.1f} ns/iter  "
          f"(lo {t_lo*1e3:6.1f} ms, hi {t_hi*1e3:6.1f} ms)", flush=True)


def main():
    rng = np.random.default_rng(0)
    plane = jnp.asarray(rng.random((512, 512)), jnp.float32)
    cube = jnp.asarray(rng.random((64, 8, 512)), jnp.float32)
    y = jnp.asarray(10 + 400 * rng.random((128, 128)), jnp.float32)
    z = jnp.asarray(10 + 200 * rng.random((128, 128)), jnp.float32)
    ytab = jnp.asarray(rng.integers(0, 512 - 32, ITERS_HI).astype(np.int32))
    ztab = jnp.asarray(rng.integers(0, 512 - 256, ITERS_HI).astype(np.int32))
    args = (ytab, ztab, plane, cube, y, z)
    for v in (sys.argv[1:] or
              ["fori", "smem", "load_s", "load_d0", "load_dsub", "load_d2d",
               "sample"]):
        run_variant(v, args)


if __name__ == "__main__":
    main()
