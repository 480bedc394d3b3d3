#!/usr/bin/env python
"""Probe: does a dynamic-offset HBM->VMEM DMA with the LANE offset aligned
to 8 (not 128) copy correctly? Decides whether the renderer band can
shrink from (9,40,256)@zb%128 to (9,40,128)@zb%8.
"""
import numpy as np
import jax
import jax.numpy as jnp
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

NX, NY, NZ = 32, 64, 512
P, BY, BZ = 4, 16, 128


def kernel(tab_ref, vol_ref, o_ref, band, sem):
    xb = tab_ref[0, 0, 0]
    yb = tab_ref[0, 0, 1] * 8  # provable 8-alignment for Mosaic
    zb = tab_ref[0, 0, 2] * 8
    cp = pltpu.make_async_copy(
        vol_ref.at[pl.ds(xb, P), pl.ds(yb, BY), pl.ds(zb, BZ)], band, sem
    )
    cp.start()
    cp.wait()
    o_ref[...] = band[...].reshape(1, P * BY, BZ)


def main():
    rng = np.random.default_rng(0)
    vol = jnp.asarray(rng.random((NX, NY, NZ)), jnp.float32)
    R = 8
    offs = np.zeros((R, 1, 8), np.int32)
    for r in range(R):
        offs[r, 0, 0] = rng.integers(0, NX - P)
        offs[r, 0, 1] = rng.integers(0, (NY - BY) // 8)
        offs[r, 0, 2] = rng.integers(0, (NZ - BZ) // 8)  # 8-aligned lanes
    out = pl.pallas_call(
        kernel,
        grid=(R,),
        in_specs=[
            pl.BlockSpec((1, 1, 8), lambda r: (r, 0, 0), memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pl.ANY),
        ],
        out_specs=pl.BlockSpec((1, P * BY, BZ), lambda r: (r, 0, 0)),
        out_shape=jax.ShapeDtypeStruct((R, P * BY, BZ), jnp.float32),
        scratch_shapes=[
            pltpu.VMEM((P, BY, BZ), jnp.float32),
            pltpu.SemaphoreType.DMA,
        ],
    )(jnp.asarray(offs), vol)
    voln = np.asarray(vol)
    got = np.asarray(out)
    ok = True
    for r in range(R):
        x, y, z = offs[r, 0, 0], offs[r, 0, 1] * 8, offs[r, 0, 2] * 8
        want = voln[x : x + P, y : y + BY, z : z + BZ].reshape(P * BY, BZ)
        if not np.array_equal(got[r], want):
            bad = np.abs(got[r] - want) > 0
            print(f"row {r} MISMATCH at {bad.sum()} of {bad.size} "
                  f"(x={x} y={y} z={z})")
            ok = False
    print("zb%%8 DMA:", "OK" if ok else "FAIL")


if __name__ == "__main__":
    main()
