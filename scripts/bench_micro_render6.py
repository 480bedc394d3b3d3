#!/usr/bin/env python
"""De-risk the group-skipping renderer primitives (slope-timed):

  dma      — dynamic-offset 3D DMA HBM->VMEM of a (9,32,256) bf16 band,
             synchronous (copy + wait), offsets from a packed SMEM table
  dma_ovl  — same, double-buffered (start next, wait current)
  smem_rw  — SMEM scratch read-modify-write per-row counters
  sample9  — dma + one bilinear sample step on the fetched band
"""
import sys
import time

import numpy as np
import jax
import jax.numpy as jnp
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

ITERS_LO = 2048
ITERS_HI = 16384
NB = 9, 32, 256  # band planes, y, z


def make_kernel(variant, iters):
    P, BY, BZ = NB

    def kernel(tab_ref, vol_ref, y_ref, z_ref, o_ref, band, band2, cnt, sem, sem2):
        def body(i, acc):
            if variant == "smem_rw":
                r = i & 127
                c = cnt[r]
                cnt[r] = c + 1
                return acc + c.astype(jnp.float32)
            pack = tab_ref[i]
            xb = pack // 65536
            yb = ((pack // 4) % 64) * 8
            zb = (pack % 4) * 128
            src = vol_ref.at[pl.ds(xb, P), pl.ds(yb, BY), pl.ds(zb, BZ)]
            cp = pltpu.make_async_copy(src, band, sem)
            cp.start()
            cp.wait()
            if variant == "dma":
                return acc + band[0, 0, 0:128].astype(jnp.float32).reshape(1, 128)
            if variant == "sample9":
                r = i & 127
                b = band[:].astype(jnp.float32).reshape(P * BY, BZ)
                y = y_ref[pl.ds(r, 1), :]
                z = z_ref[pl.ds(r, 1), :]
                y0 = jnp.floor(y).astype(jnp.int32)
                z0 = jnp.floor(z).astype(jnp.int32)
                k = jnp.int32(3)  # plane within band
                ry = jnp.clip(y0 % 32, 0, 30) + k * BY
                zi = jnp.clip(z0 % 128, 0, 253)
                zbv = jnp.broadcast_to(zi, (P * BY, 128))
                g0 = None
                for h in range(BZ // 128):
                    part = jnp.take_along_axis(
                        b[:, 128 * h : 128 * (h + 1)],
                        jnp.clip(zbv - 128 * h, 0, 127), axis=1)
                    s = (zbv >= 128 * h) & (zbv < 128 * (h + 1))
                    g0 = part if g0 is None else jnp.where(s, part, g0)
                g1 = g0  # stand-in for the zi+1 gather (same cost class)
                rows_iota = lax.broadcasted_iota(jnp.int32, (P * BY, 128), 0)
                sel0 = rows_iota == jnp.broadcast_to(ry, (P * BY, 128))
                sel1 = rows_iota == jnp.broadcast_to(ry + 1, (P * BY, 128))
                fy = y - y0.astype(y.dtype)
                fz = z - z0.astype(z.dtype)
                v00 = jnp.sum(jnp.where(sel0, g0, 0.0), axis=0, keepdims=True)
                v01 = jnp.sum(jnp.where(sel0, g1, 0.0), axis=0, keepdims=True)
                v10 = jnp.sum(jnp.where(sel1, g0, 0.0), axis=0, keepdims=True)
                v11 = jnp.sum(jnp.where(sel1, g1, 0.0), axis=0, keepdims=True)
                F = (v00 * (1 - fy) * (1 - fz) + v01 * (1 - fy) * fz
                     + v10 * fy * (1 - fz) + v11 * fy * fz)
                return acc + F
            return acc

        def body_ovl(i, acc):
            pack = tab_ref[i]
            xb = pack // 65536
            yb = ((pack // 4) % 64) * 8
            zb = (pack % 4) * 128
            pack2 = tab_ref[i + 1]
            xb2 = pack2 // 65536
            yb2 = ((pack2 // 4) % 64) * 8
            zb2 = (pack2 % 4) * 128
            cur = jax.lax.rem(i, 2)

            @pl.when(cur == 0)
            def _():
                src2 = vol_ref.at[pl.ds(xb2, P), pl.ds(yb2, BY), pl.ds(zb2, BZ)]
                pltpu.make_async_copy(src2, band2, sem2).start()
                pltpu.make_async_copy(
                    vol_ref.at[pl.ds(xb, P), pl.ds(yb, BY), pl.ds(zb, BZ)],
                    band, sem).wait()

            @pl.when(cur == 1)
            def _():
                src2 = vol_ref.at[pl.ds(xb2, P), pl.ds(yb2, BY), pl.ds(zb2, BZ)]
                pltpu.make_async_copy(src2, band, sem).start()
                pltpu.make_async_copy(
                    vol_ref.at[pl.ds(xb, P), pl.ds(yb, BY), pl.ds(zb, BZ)],
                    band2, sem2).wait()

            v = jnp.where(cur == 0,
                          band[0, 0, 0:128].astype(jnp.float32).reshape(1, 128),
                          band2[0, 0, 0:128].astype(jnp.float32).reshape(1, 128))
            return acc + v

        if variant == "dma_ovl":
            # prime: start copy 0
            pack = tab_ref[0]
            xb = pack // 65536
            yb = ((pack // 4) % 64) * 8
            zb = (pack % 4) * 128
            pltpu.make_async_copy(
                vol_ref.at[pl.ds(xb, P), pl.ds(yb, BY), pl.ds(zb, BZ)],
                band, sem).start()
            o_ref[...] = lax.fori_loop(
                0, iters, body_ovl, jnp.zeros((1, 128), jnp.float32))
            # drain the last started copy
            pack = tab_ref[iters]
            xb = pack // 65536
            yb = ((pack // 4) % 64) * 8
            zb = (pack % 4) * 128
            last = jax.lax.rem(jnp.int32(iters), 2)

            @pl.when(last == 0)
            def _():
                pltpu.make_async_copy(
                    vol_ref.at[pl.ds(xb, P), pl.ds(yb, BY), pl.ds(zb, BZ)],
                    band, sem).wait()

            @pl.when(last == 1)
            def _():
                pltpu.make_async_copy(
                    vol_ref.at[pl.ds(xb, P), pl.ds(yb, BY), pl.ds(zb, BZ)],
                    band2, sem2).wait()
        else:
            o_ref[...] = lax.fori_loop(
                0, iters, body, jnp.zeros((1, 128), jnp.float32))

    return kernel


def timed_call(variant, iters, args, reps=6):
    P, BY, BZ = NB

    @jax.jit
    def run(*a):
        out = pl.pallas_call(
            make_kernel(variant, iters),
            out_shape=jax.ShapeDtypeStruct((1, 128), jnp.float32),
            in_specs=[
                pl.BlockSpec(memory_space=pltpu.SMEM),
                pl.BlockSpec(memory_space=pltpu.ANY),
                pl.BlockSpec(memory_space=pltpu.VMEM),
                pl.BlockSpec(memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
            scratch_shapes=[
                pltpu.VMEM((P, BY, BZ), jnp.bfloat16),
                pltpu.VMEM((P, BY, BZ), jnp.bfloat16),
                pltpu.SMEM((128,), jnp.int32),
                pltpu.SemaphoreType.DMA,
                pltpu.SemaphoreType.DMA,
            ],
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
        print(f"{variant:8s}: FAILED {type(e).__name__}: {str(e)[:400]}", flush=True)
        return
    slope = (t_hi - t_lo) / (ITERS_HI - ITERS_LO)
    print(f"{variant:8s}: {slope*1e9:7.1f} ns/iter  "
          f"(lo {t_lo*1e3:6.1f} ms, hi {t_hi*1e3:6.1f} ms)", flush=True)


def main():
    rng = np.random.default_rng(0)
    vol = jnp.asarray(rng.random((512, 512, 512)).astype(np.float32), jnp.bfloat16)
    y = jnp.asarray(10 + 400 * rng.random((128, 128)), jnp.float32)
    z = jnp.asarray(10 + 200 * rng.random((128, 128)), jnp.float32)
    xb = rng.integers(0, 512 - 9, ITERS_HI + 2).astype(np.int64)
    yb8 = rng.integers(0, 60, ITERS_HI + 2).astype(np.int64)
    zb128 = rng.integers(0, 2, ITERS_HI + 2).astype(np.int64)
    tab = jnp.asarray((xb * 65536 + yb8 * 4 + zb128).astype(np.int32))
    args = (tab, vol, y, z)
    for v in (sys.argv[1:] or ["smem_rw", "dma", "dma_ovl", "sample9"]):
        run_variant(v, args)


if __name__ == "__main__":
    main()
