#!/usr/bin/env python
"""Round 2 probes: amortized 2D gather / one-hot costs for the Meijster kernel.

All kernels loop STEPS times inside one pallas_call so launch overhead
amortizes; reported numbers are per-step.
"""
import time

import jax
import jax.numpy as jnp
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

STEPS = 512
N = 512


def timed(fn, *args, reps=10):
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
        print(f"{name}: OK {t*1e6/STEPS:8.3f} us/step   ({t*1e3:.2f} ms total)")
        return t
    except Exception as e:
        msg = str(e).split("\n")[0][:200]
        print(f"{name}: FAIL {type(e).__name__}: {msg}")
        return None


def g1():
    """x (N,128) gather axis=0 with (8,128) idx -> (8,128), in-loop."""
    def kernel(x_ref, q_ref, o_ref):
        x = x_ref[:]
        q0 = q_ref[:]

        def body(i, acc):
            qi = (q0 + i) % N
            return acc + jnp.take_along_axis(x, qi, axis=0)

        o_ref[:] = lax.fori_loop(0, STEPS, body, jnp.zeros((8, 128), jnp.int32))

    @jax.jit
    def run(x, q):
        return pl.pallas_call(
            kernel,
            out_shape=jax.ShapeDtypeStruct((8, 128), jnp.int32),
            in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)] * 2,
            out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        )(x, q)

    x = jnp.arange(N * 128, dtype=jnp.int32).reshape(N, 128)
    q = (jnp.arange(8 * 128, dtype=jnp.int32).reshape(8, 128) * 13) % N
    return run, (x, q)


def g2():
    """x (N,128) gather axis=0 with (1,128) idx, in-loop."""
    def kernel(x_ref, q_ref, o_ref):
        x = x_ref[:]
        q0 = q_ref[:]

        def body(i, acc):
            qi = (q0 + i) % N
            return acc + jnp.take_along_axis(x, qi, axis=0)[0]

        o_ref[:] = lax.fori_loop(0, STEPS, body, jnp.zeros((128,), jnp.int32))

    @jax.jit
    def run(x, q):
        return pl.pallas_call(
            kernel,
            out_shape=jax.ShapeDtypeStruct((128,), jnp.int32),
            in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)] * 2,
            out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        )(x, q)

    x = jnp.arange(N * 128, dtype=jnp.int32).reshape(N, 128)
    q = (jnp.arange(128, dtype=jnp.int32).reshape(1, 128) * 13) % N
    return run, (x, q)


def g3():
    """lane gather (8,128) axis=1, in-loop (known-supported case)."""
    def kernel(x_ref, q_ref, o_ref):
        x = x_ref[:]
        q0 = q_ref[:]

        def body(i, acc):
            qi = (q0 + i) % 128
            return acc + jnp.take_along_axis(x, qi, axis=1)

        o_ref[:] = lax.fori_loop(0, STEPS, body, jnp.zeros((8, 128), jnp.int32))

    @jax.jit
    def run(x, q):
        return pl.pallas_call(
            kernel,
            out_shape=jax.ShapeDtypeStruct((8, 128), jnp.int32),
            in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)] * 2,
            out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        )(x, q)

    x = jnp.arange(8 * 128, dtype=jnp.int32).reshape(8, 128)
    q = (jnp.arange(8 * 128, dtype=jnp.int32).reshape(8, 128) * 13) % 128
    return run, (x, q)


def g4():
    """one-hot select from (64,128) with cached iota, in-loop."""
    D = 64

    def kernel(x_ref, q_ref, o_ref):
        x = x_ref[:]
        q0 = q_ref[:]
        iota = lax.broadcasted_iota(jnp.int32, (D, 128), 0)
        BIG = jnp.int32(1 << 30)

        def body(i, acc):
            qi = (q0 + i) % D
            sel = jnp.min(jnp.where(iota == qi, x, BIG), axis=0)
            return acc + sel

        o_ref[:] = lax.fori_loop(0, STEPS, body, jnp.zeros((128,), jnp.int32))

    @jax.jit
    def run(x, q):
        return pl.pallas_call(
            kernel,
            out_shape=jax.ShapeDtypeStruct((128,), jnp.int32),
            in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)] * 2,
            out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        )(x, q)

    x = jnp.arange(64 * 128, dtype=jnp.int32).reshape(64, 128)
    q = (jnp.arange(128, dtype=jnp.int32).reshape(1, 128) * 13) % 64
    return run, (x, q)


def g5():
    """one-hot write to (64,128) scratch, in-loop."""
    D = 64

    def kernel(x_ref, q_ref, o_ref, scr):
        q0 = q_ref[:]
        scr[:] = x_ref[:]
        iota = lax.broadcasted_iota(jnp.int32, (D, 128), 0)

        def body(i, _):
            qi = (q0 + i) % D
            scr[:] = jnp.where(iota == qi, i, scr[:])
            return 0

        lax.fori_loop(0, STEPS, body, 0)
        o_ref[:] = scr[0]

    @jax.jit
    def run(x, q):
        return pl.pallas_call(
            kernel,
            out_shape=jax.ShapeDtypeStruct((128,), jnp.int32),
            in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)] * 2,
            out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
            scratch_shapes=[pltpu.VMEM((D, 128), jnp.int32)],
        )(x, q)

    x = jnp.arange(D * 128, dtype=jnp.int32).reshape(D, 128)
    q = (jnp.arange(128, dtype=jnp.int32).reshape(1, 128) * 13) % D
    return run, (x, q)


def g6():
    """dynamic row store o[pl.ds(i,1),:] = v, in-loop (scan write pattern)."""
    def kernel(x_ref, o_ref):
        def body(i, carry):
            row = x_ref[pl.ds(i, 1), :]
            new = jnp.minimum(carry + 1, row[0])
            o_ref[pl.ds(i, 1), :] = new[None]
            return new

        lax.fori_loop(0, N, body, jnp.zeros((128,), jnp.int32))

    @jax.jit
    def run(x):
        return pl.pallas_call(
            kernel,
            out_shape=jax.ShapeDtypeStruct((N, 128), jnp.int32),
            in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)],
            out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        )(x)

    x = jnp.arange(N * 128, dtype=jnp.int32).reshape(N, 128)
    return run, (x,)


def g7():
    """row scan over (N, 8, 128): x[i] (8,128) rows, in-loop."""
    def kernel(x_ref, o_ref):
        def body(i, carry):
            row = x_ref[i]
            new = jnp.minimum(carry + 1, row)
            o_ref[i] = new
            return new

        lax.fori_loop(0, N, body, jnp.zeros((8, 128), jnp.int32))

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


def g8():
    """vector ops on (8,128) in-loop: baseline op cost."""
    def kernel(x_ref, o_ref):
        x = x_ref[:]

        def body(i, acc):
            return jnp.minimum(acc * 2 + 1, x + i)

        o_ref[:] = lax.fori_loop(0, STEPS, body, jnp.zeros((8, 128), jnp.int32))

    @jax.jit
    def run(x):
        return pl.pallas_call(
            kernel,
            out_shape=jax.ShapeDtypeStruct((8, 128), jnp.int32),
            in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)],
            out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        )(x)

    x = jnp.arange(8 * 128, dtype=jnp.int32).reshape(8, 128)
    return run, (x,)


if __name__ == "__main__":
    print("backend:", jax.default_backend())
    probe("G8 baseline 2 vec ops (8,128)", g8)
    probe("G1 gather (512,128)ax0 idx(8,128)", g1)
    probe("G2 gather (512,128)ax0 idx(1,128)", g2)
    probe("G3 gather (8,128)ax1 idx(8,128)", g3)
    probe("G4 one-hot select (64,128)", g4)
    probe("G5 one-hot write (64,128)", g5)
    probe("G6 dyn row store (512,128)", g6)
    probe("G7 row scan (512,8,128)", g7)
