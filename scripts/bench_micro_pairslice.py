#!/usr/bin/env python
"""Do 2-element-slice gathers/scatters halve HBM transactions vs scalar ones?

The render backward fetches 8 trilinear corners per hit point and
scatter-adds 8 cotangents back; corners come in z-adjacent pairs
(uz == lz + 1 always, ops/query.py:_axis_interp_indices), so 4 gathers of
[2]-slices and 4 scatter-adds of [2]-windows could halve the transaction
count (the ~85 M/s wall, docs/NOTES.md §7).
"""
import sys
import time

sys.path.insert(0, "/root/repo")

import numpy as np
import jax
import jax.numpy as jnp
from jax import lax


def timed(f, *args, reps=5):
    _ = float(f(*args))
    ts = []
    for _ in range(reps):
        t0 = time.perf_counter()
        _ = float(f(*args))
        ts.append(time.perf_counter() - t0)
    return float(np.median(ts))


def main():
    n = 512
    M = n ** 3
    R = 4 * 1024 * 1024  # index count (≈ rays x 4 column bases)
    rng = np.random.default_rng(0)
    vals = jnp.asarray(rng.standard_normal(M).astype(np.float32))
    # random even-ish bases so idx+1 stays in range
    base = jnp.asarray(rng.integers(0, M - 2, R).astype(np.int32))
    upd = jnp.asarray(rng.standard_normal((R, 2)).astype(np.float32))

    # (a) two scalar flat gathers per pair
    f_scalar = jax.jit(lambda v, b: jnp.sum(v[b] + v[b + 1]))
    t = timed(f_scalar, vals, base)
    print(f"gather 2x scalar: {t*1e3:7.1f} ms  ({2*R/t/1e6:6.1f} M elem/s)")

    # (b) one [2]-slice gather per pair
    dn = lax.GatherDimensionNumbers(
        offset_dims=(1,), collapsed_slice_dims=(), start_index_map=(0,)
    )
    f_slice = jax.jit(
        lambda v, b: jnp.sum(
            lax.gather(v, b[:, None], dn, slice_sizes=(2,))
        )
    )
    t = timed(f_slice, vals, base)
    print(f"gather 1x[2]-slice: {t*1e3:7.1f} ms  ({2*R/t/1e6:6.1f} M elem/s)")

    # (c) scalar scatter-add x2
    f_sc = jax.jit(
        lambda b, u: jnp.sum(
            jnp.zeros(M, jnp.float32)
            .at[b].add(u[:, 0], mode="drop")
            .at[b + 1].add(u[:, 1], mode="drop")
        )
    )
    t = timed(f_sc, base, upd)
    print(f"scatter 2x scalar: {t*1e3:7.1f} ms  ({2*R/t/1e6:6.1f} M upd/s)")

    # (d) [2]-window scatter-add
    sdn = lax.ScatterDimensionNumbers(
        update_window_dims=(1,), inserted_window_dims=(),
        scatter_dims_to_operand_dims=(0,),
    )
    f_sw = jax.jit(
        lambda b, u: jnp.sum(
            lax.scatter_add(
                jnp.zeros(M, jnp.float32), b[:, None], u, sdn,
                mode=lax.GatherScatterMode.FILL_OR_DROP,
            )
        )
    )
    t = timed(f_sw, base, upd)
    print(f"scatter 1x[2]-win: {t*1e3:7.1f} ms  ({2*R/t/1e6:6.1f} M upd/s)")


if __name__ == "__main__":
    main()
