#!/usr/bin/env python
"""Round 3: which exact 2D gather configs does Mosaic support, at what cost?"""
import time

import jax
import jax.numpy as jnp
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

STEPS = 256


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
        print(f"{name}: OK {t*1e6/STEPS:8.3f} us/step  ({t*1e3:.2f} ms tot)")
        return t
    except Exception as e:
        msg = str(e).split("\n")[0][:150]
        print(f"{name}: FAIL {type(e).__name__}: {msg}")
        return None


def make(shape_x, shape_idx, axis, mod):
    def build():
        def kernel(x_ref, q_ref, o_ref):
            x = x_ref[:]
            q0 = q_ref[:]

            def body(i, acc):
                qi = (q0 + i) % mod
                g = jnp.take_along_axis(x, qi, axis=axis)
                return acc + g.astype(jnp.int32).sum(
                    axis=tuple(range(g.ndim - 2))
                ) if g.shape != acc.shape else acc + g

            init = jnp.zeros(shape_idx if shape_idx == shape_x else shape_idx, jnp.int32)
            o_ref[:] = lax.fori_loop(0, STEPS, body, init)

        @jax.jit
        def run(x, q):
            return pl.pallas_call(
                kernel,
                out_shape=jax.ShapeDtypeStruct(shape_idx, jnp.int32),
                in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)] * 2,
                out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
            )(x, q)

        import numpy as np

        x = jnp.asarray(np.arange(np.prod(shape_x), dtype=np.int32).reshape(shape_x))
        q = jnp.asarray(
            (np.arange(np.prod(shape_idx), dtype=np.int32).reshape(shape_idx) * 13) % mod
        )
        return run, (x, q)

    return build


if __name__ == "__main__":
    print("backend:", jax.default_backend())
    # sublane-axis gathers (axis=0), full-size idx
    probe("H1 x(8,128) idx(8,128) ax0", make((8, 128), (8, 128), 0, 8))
    probe("H2 x(64,128) idx(64,128) ax0", make((64, 128), (64, 128), 0, 64))
    probe("H3 x(512,128) idx(512,128) ax0", make((512, 128), (512, 128), 0, 512))
    # lane-axis gathers with wide lanes
    probe("H4 x(8,512) idx(8,512) ax1", make((8, 512), (8, 512), 1, 512))
    probe("H5 x(8,256) idx(8,256) ax1", make((8, 256), (8, 256), 1, 256))
    # lane gather with sub-size idx
    probe("H6 x(8,128) idx(8,1) ax1", make((8, 128), (8, 1), 1, 128))
    # bigger sublane count on lane gather
    probe("H7 x(64,128) idx(64,128) ax1", make((64, 128), (64, 128), 1, 128))
    probe("H8 x(512,128) idx(512,128) ax1", make((512, 128), (512, 128), 1, 128))
