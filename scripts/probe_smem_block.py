#!/usr/bin/env python
"""Probe two Pallas TPU capabilities the plane-sweep renderer needs:

  1. SMEM input with a per-grid-step BlockSpec slice ((1, S) block of an
     (R, S) int32 table) — per-row scalar tables without SMEM capacity blowup.
  2. lax.fori_loop with a DYNAMIC trip count read from that SMEM block,
     with a dynamic-offset HBM->VMEM DMA inside the loop body.

Prints OK/FAIL per probe; exact values checked against numpy.
"""
import sys

import numpy as np
import jax
import jax.numpy as jnp
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

R, S = 64, 16
NX, NY, NZ = 64, 32, 256


def probe1():
    def kernel(tab_ref, o_ref):
        acc = jnp.float32(0.0)
        for s in range(S):
            acc = acc + tab_ref[0, 0, s].astype(jnp.float32)
        o_ref[...] = jnp.full((1, 1, 128), acc)

    tab = jnp.arange(R * S, dtype=jnp.int32).reshape(R, 1, S)
    out = pl.pallas_call(
        kernel,
        grid=(R,),
        in_specs=[pl.BlockSpec((1, 1, S), lambda r: (r, 0, 0), memory_space=pltpu.SMEM)],
        out_specs=pl.BlockSpec((1, 1, 128), lambda r: (r, 0, 0)),
        out_shape=jax.ShapeDtypeStruct((R, 1, 128), jnp.float32),
    )(tab)
    want = np.asarray(tab).sum(axis=(1, 2), dtype=np.float64)
    got = np.asarray(out[:, 0, 0])
    assert np.allclose(got, want), (got[:4], want[:4])


def probe2():
    def kernel(tab_ref, vol_ref, o_ref, band, sem):
        n = tab_ref[0, 0, 0]

        def body(s, acc):
            xb = tab_ref[0, 0, 1 + s]
            cp = pltpu.make_async_copy(
                vol_ref.at[pl.ds(xb, 2), :, :], band, sem)
            cp.start()
            cp.wait()
            return acc + band[0, 0, 0:128].astype(jnp.float32).reshape(1, 128)

        o_ref[...] = lax.fori_loop(
            0, n, body, jnp.zeros((1, 128), jnp.float32)).reshape(1, 1, 128)

    rng = np.random.default_rng(0)
    vol = jnp.asarray(rng.random((NX, NY, NZ)), jnp.float32)
    tab = np.zeros((R, S), np.int32)
    counts = rng.integers(0, S - 1, R)
    for r in range(R):
        tab[r, 0] = counts[r]
        tab[r, 1 : 1 + counts[r]] = rng.integers(0, NX - 2, counts[r])
    tabj = jnp.asarray(tab).reshape(R, 1, S)
    out = pl.pallas_call(
        kernel,
        grid=(R,),
        in_specs=[
            pl.BlockSpec((1, 1, S), lambda r: (r, 0, 0), memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pl.ANY),
        ],
        out_specs=pl.BlockSpec((1, 1, 128), lambda r: (r, 0, 0)),
        out_shape=jax.ShapeDtypeStruct((R, 1, 128), jnp.float32),
        scratch_shapes=[
            pltpu.VMEM((2, NY, NZ), jnp.float32),
            pltpu.SemaphoreType.DMA,
        ],
    )(tabj, vol)
    voln = np.asarray(vol)
    want = np.array(
        [sum(voln[tab[r, 1 + i], 0, 0] for i in range(tab[r, 0])) for r in range(R)],
        np.float32,
    )
    got = np.asarray(out[:, 0, 0])
    assert np.allclose(got, want, rtol=1e-5), (got[:4], want[:4])


for name, fn in [("smem_block", probe1), ("dyn_fori_dma", probe2)]:
    try:
        fn()
        print(f"{name}: OK", flush=True)
    except Exception as e:
        print(f"{name}: FAIL {type(e).__name__}: {str(e)[:500]}", flush=True)
