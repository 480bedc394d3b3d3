#!/usr/bin/env python
"""Microbenchmarks deciding the O(N) envelope kernel design (round 2).

Probes, on the real TPU:
  E1  in-kernel take_along_axis along axis 0 of [N, 8, 128] with [1, 8, 128]
      per-element indices (the lockstep-Meijster stack access pattern)
  E2  same along sublanes of [8, N, 128]
  E3  per-element select along lanes of (8, 128)
  E4  sequential fori_loop row-scan throughput over [8, N, 128] slices
  E5  one-hot masked-min select cost (the gather fallback)

Each probe prints compile ok/fail and steady-state time.
"""
import sys
import time
import functools

import numpy as np
import jax
import jax.numpy as jnp
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

N = 512


def timed(fn, *args, reps=20):
    out = fn(*args)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(reps):
        out = fn(*args)
    jax.block_until_ready(out)
    return (time.perf_counter() - t0) / reps


def probe(name, build):
    try:
        fn, args = build()
        t = timed(fn, *args)
        print(f"{name}: OK {t*1e6:9.1f} us")
        return t
    except Exception as e:
        msg = str(e).split("\n")[0][:160]
        print(f"{name}: FAIL {type(e).__name__}: {msg}")
        return None


# --- E1: gather along major axis of [N, 8, 128] ---------------------------

def e1():
    def kernel(x_ref, q_ref, o_ref):
        x = x_ref[:]
        q = q_ref[:]
        o_ref[:] = jnp.take_along_axis(x, q, axis=0)[0]

    @jax.jit
    def run(x, q):
        return pl.pallas_call(
            kernel,
            out_shape=jax.ShapeDtypeStruct((8, 128), jnp.int32),
            in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)] * 2,
            out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        )(x, q)

    x = jnp.arange(N * 8 * 128, dtype=jnp.int32).reshape(N, 8, 128)
    q = jnp.ones((1, 8, 128), jnp.int32) * 77
    return run, (x, q)


# --- E1b: repeated gather inside a fori_loop (amortized cost) -------------

def e1b():
    def kernel(x_ref, q_ref, o_ref):
        x = x_ref[:]
        q = q_ref[:]

        def body(i, acc):
            qi = (q + i) % N
            return acc + jnp.take_along_axis(x, qi, axis=0)[0]

        o_ref[:] = lax.fori_loop(0, 512, body, jnp.zeros((8, 128), jnp.int32))

    @jax.jit
    def run(x, q):
        return pl.pallas_call(
            kernel,
            out_shape=jax.ShapeDtypeStruct((8, 128), jnp.int32),
            in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)] * 2,
            out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        )(x, q)

    x = jnp.arange(N * 8 * 128, dtype=jnp.int32).reshape(N, 8, 128)
    q = jnp.ones((1, 8, 128), jnp.int32) * 3
    return run, (x, q)


# --- E2: gather along sublanes of [8, N, 128] ------------------------------

def e2():
    def kernel(x_ref, q_ref, o_ref):
        x = x_ref[:]
        q = q_ref[:]
        o_ref[:] = jnp.take_along_axis(x, q, axis=1)[:, 0]

    @jax.jit
    def run(x, q):
        return pl.pallas_call(
            kernel,
            out_shape=jax.ShapeDtypeStruct((8, 128), jnp.int32),
            in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)] * 2,
            out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        )(x, q)

    x = jnp.arange(8 * N * 128, dtype=jnp.int32).reshape(8, N, 128)
    q = jnp.ones((8, 1, 128), jnp.int32) * 77
    return run, (x, q)


# --- E3: per-element select along lanes of (8,128) -------------------------

def e3():
    def kernel(x_ref, q_ref, o_ref):
        x = x_ref[:]
        q = q_ref[:]
        o_ref[:] = jnp.take_along_axis(x, q, axis=1)

    @jax.jit
    def run(x, q):
        return pl.pallas_call(
            kernel,
            out_shape=jax.ShapeDtypeStruct((8, 128), jnp.int32),
            in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)] * 2,
            out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        )(x, q)

    x = jnp.arange(8 * 128, dtype=jnp.int32).reshape(8, 128)
    q = (jnp.arange(8 * 128, dtype=jnp.int32).reshape(8, 128) * 7) % 128
    return run, (x, q)


# --- E4: sequential row scan over [8, N, 128] ------------------------------

def e4():
    def kernel(x_ref, o_ref):
        def body(i, carry):
            row = x_ref[:, i, :]
            new = jnp.minimum(carry + 1, row)
            o_ref[:, i, :] = new
            return new

        lax.fori_loop(0, N, body, jnp.zeros((8, 128), jnp.int32), unroll=4)

    @jax.jit
    def run(x):
        return pl.pallas_call(
            kernel,
            out_shape=jax.ShapeDtypeStruct((8, N, 128), jnp.int32),
            in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)],
            out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        )(x)

    x = jnp.arange(8 * N * 128, dtype=jnp.int32).reshape(8, N, 128)
    return run, (x,)


# --- E4b: row scan with layout [N, 8, 128] ---------------------------------

def e4b():
    def kernel(x_ref, o_ref):
        def body(i, carry):
            row = x_ref[i]
            new = jnp.minimum(carry + 1, row)
            o_ref[i] = new
            return new

        lax.fori_loop(0, N, body, jnp.zeros((8, 128), jnp.int32), unroll=4)

    @jax.jit
    def run(x):
        return pl.pallas_call(
            kernel,
            out_shape=jax.ShapeDtypeStruct((N, 8, 128), jnp.int32),
            in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)],
            out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        )(x)

    x = jnp.arange(N * 8 * 128, dtype=jnp.int32).reshape(N, 8, 128)
    return run, (x,)


# --- E5: one-hot masked-min select from [D, 8, 128] ------------------------

def e5():
    D = 64

    def kernel(x_ref, q_ref, o_ref):
        x = x_ref[:]
        q = q_ref[:]

        def body(i, acc):
            iota = lax.broadcasted_iota(jnp.int32, (D, 8, 128), 0)
            sel = jnp.where(iota == q, x, jnp.int32(1 << 30))
            return acc + jnp.min(sel, axis=0)

        o_ref[:] = lax.fori_loop(0, 64, body, jnp.zeros((8, 128), jnp.int32))

    @jax.jit
    def run(x, q):
        return pl.pallas_call(
            kernel,
            out_shape=jax.ShapeDtypeStruct((8, 128), jnp.int32),
            in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)] * 2,
            out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        )(x, q)

    x = jnp.arange(D * 8 * 128, dtype=jnp.int32).reshape(D, 8, 128)
    q = jnp.ones((1, 8, 128), jnp.int32) * 7
    return run, (x, q)


# --- E6: per-element scatter (stack write) along axis 0 of [N, 8, 128] -----

def e6():
    def kernel(x_ref, q_ref, v_ref, o_ref):
        x = x_ref[:]
        q = q_ref[:]
        v = v_ref[:]
        iota = lax.broadcasted_iota(jnp.int32, (N, 8, 128), 0)
        o_ref[:] = jnp.where(iota == q, v, x)

    @jax.jit
    def run(x, q, v):
        return pl.pallas_call(
            kernel,
            out_shape=jax.ShapeDtypeStruct((N, 8, 128), jnp.int32),
            in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)] * 3,
            out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        )(x, q, v)

    x = jnp.arange(N * 8 * 128, dtype=jnp.int32).reshape(N, 8, 128)
    q = jnp.ones((1, 8, 128), jnp.int32) * 77
    v = jnp.ones((1, 8, 128), jnp.int32)
    return run, (x, q, v)


if __name__ == "__main__":
    print("backend:", jax.default_backend(), jax.devices())
    probe("E3 lane-select (8,128)", e3)
    probe("E2 sublane-gather [8,N,128] axis=1", e2)
    probe("E1 major-gather [N,8,128] axis=0", e1)
    probe("E1b 512x major-gather in fori", e1b)
    probe("E4 row-scan [8,N,128] 512 steps", e4)
    probe("E4b row-scan [N,8,128] 512 steps", e4b)
    probe("E5 64x one-hot min-select D=64", e5)
    probe("E6 one-hot scatter [N,8,128]", e6)
