"""Tile-coherent plane-sweep renderer (Pallas TPU kernel).

Replaces the scattered-gather ray march (ops/render.py, ~100 M HBM
gathers/s wall, docs/NOTES.md SS7) with coherent band DMAs + in-VMEM
vectorized sampling:

  * Rays are grouped into 128-ray rows (camera bundles are coherent by
    construction). Each row marches its dominant axis plane-by-plane over
    a volume transposed so that axis is major.
  * The marching axis is cut into slabs of 8 planes. One slab's samples
    for a whole row live in a (9, 40, 256) f32 VMEM band fetched with ONE
    dynamic-offset DMA (~0.7 us measured, double-buffered across slabs)
    instead of ~1000 scattered gathers.
  * Sampling the 9 plane crossings of all 128 rays is ONE vectorized
    bilinear: the x coordinate of a crossing sits exactly at cell-center
    planes, so the reference's center-corrected trilinear
    (sdf.hpp:773-833,903-914 semantics; see ops/query.py) collapses to a
    center-corrected bilinear on that plane.
  * Empty space is skipped at slab granularity: an XLA-side precompute
    marks (row, slab) pairs whose footprint box intersects a dilated
    near-surface coarse map, and compacts them into per-row SMEM tables.
  * Crossing refinement and thin-feature (graze) checks run on the corner
    values already extracted by the main bilinear ("frozen corners") —
    pure (8,128) vector arithmetic, no extra gathers.

Rays the kernel cannot handle (mixed marching direction within a row,
footprint overflow, extreme slopes) are detected in the precompute and
re-rendered with the exact XLA march under a lax.cond (zero cost when no
ray needs it).

Hit semantics match ops/render.py: hit when the corrected trilinear
distance drops below eps; depth refined by bisection; misses get t_max.
"""
from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

Array = jax.Array


def _out_struct(x, shape, dtype):
    """ShapeDtypeStruct carrying x's varying-manual-axes type so the kernel
    composes with shard_map(check_vma=True) (see edt_pallas._out_struct)."""
    try:
        vma = jax.typeof(x).vma
    except Exception:
        vma = None
    if vma:
        return jax.ShapeDtypeStruct(shape, dtype, vma=vma)
    return jax.ShapeDtypeStruct(shape, dtype)

LANES = 128  # rays per row
SLAB = 16  # planes per slab (larger slabs amortize per-slab overheads,
# which ablations show dominate per-slab arithmetic)
PB = SLAB + 1  # planes per band (pair p needs planes p and p+1)
BY = 56  # band y extent (cells; multiple of 8; covers tile footprint
# (~22 cells) + slope*SLAB drift + corner pair after 8-alignment waste)
BZ = 256  # band z extent (cells)
HDR = 8  # header ints per row: [n_active, axis, nx, ny, nz, 0, 0, 0]
BIGF = 1e30
SLOPE_CAP = 3.5  # max |dy/dx| the footprint boxes are sized for

# footprint caps implied by band geometry (aligned base + corner pair):
# the corner-pair range_hi must fit inside the fetched band, i.e. within
# [yb, yb + BY - 1] on sublanes (yb 8-aligned) and [zb, zb + BZ - 1] on
# lanes (zb 128-aligned)
_Y_SPAN = BY - 1
_Z_SPAN = BZ - 1

# pack-field capacities: a slot packs (slab*256 + yb//8)*32 + zb//128, so
# yb//8 gets 8 bits, zb//128 gets 5 bits and slab the rest of the int32;
# band bases beyond these would WRAP silently and fetch the wrong band.
# Axes whose extents could overflow are treated as unsupported (rays fall
# back to the exact march; `plane_sweep_supported` reports it).
_MAX_YB = 255 * 8
_MAX_ZB = 31 * 128
_MAX_SLABS = (1 << 31) // (256 * 32) - 1


def _axis_supported(sh: Tuple[int, int, int]) -> bool:
    """Band geometry + pack-encoding limits for one marching-axis layout."""
    return (
        sh[0] >= PB
        and sh[1] >= BY
        and sh[2] >= BZ
        and sh[1] - BY <= _MAX_YB
        and sh[2] - BZ <= _MAX_ZB
        and (sh[0] + SLAB - 1) // SLAB <= _MAX_SLABS
    )


def _perm(axis: int) -> Tuple[int, int, int]:
    return (axis, (axis + 1) % 3, (axis + 2) % 3)


# ---------------------------------------------------------------------------
# Kernel
# ---------------------------------------------------------------------------


def _taa_lanes(tbl2d, idx2d, width):
    """Gather along lanes: tbl2d (Rrows, width) f32, idx2d (Rrows, 128)
    int32 in [0, width) -> (Rrows, 128). 128-chunked take_along_axis with
    range-select (the only lane-gather pattern Mosaic lowers fast)."""
    out = None
    for h in range(width // 128):
        part = jnp.take_along_axis(
            tbl2d[:, 128 * h : 128 * (h + 1)],
            jnp.clip(idx2d - 128 * h, 0, 127),
            axis=1,
        )
        sel = (idx2d >= 128 * h) & (idx2d < 128 * (h + 1))
        out = part if out is None else jnp.where(sel, part, out)
    return out


def _corner_gather(band_v, ry, rz):
    """band_v (P, BY, BZ) f32 raw cell values; ry, rz (P, 128) int32 band-
    local lower-corner indices. Returns raw corner values v00, v01, v10,
    v11, each (P, 128): v[y-corner][z-corner]."""
    P = band_v.shape[0]
    b2 = band_v.reshape(P * BY, BZ)
    rzb = jnp.broadcast_to(rz[:, None, :], (P, BY, 128)).reshape(P * BY, 128)
    g0 = _taa_lanes(b2, rzb, BZ).reshape(P, BY, 128)
    g1 = _taa_lanes(b2, jnp.clip(rzb + 1, 0, BZ - 1), BZ).reshape(P, BY, 128)
    rows = lax.broadcasted_iota(jnp.int32, (P, BY, 128), 1)
    s0 = rows == ry[:, None, :]
    s1 = rows == (ry + 1)[:, None, :]
    v00 = jnp.sum(jnp.where(s0, g0, 0.0), axis=1)
    v01 = jnp.sum(jnp.where(s0, g1, 0.0), axis=1)
    v10 = jnp.sum(jnp.where(s1, g0, 0.0), axis=1)
    v11 = jnp.sum(jnp.where(s1, g1, 0.0), axis=1)
    return v00, v01, v10, v11


def _make_kernel(eps: float, t_max: float, smax: int, refine_iters: int, double_buffer: bool = True, early_exit: bool = True, nm_mult: float = 0.5, refine_mode: str = "bisect"):
    import os as _os

    # perf-ablation knobs (trace-time; for cost attribution on real chips —
    # tests/production leave them unset): PS_PROBES=0 disables the 3-point
    # frozen-model dip probes (graze detection), PS_EE=0 the entry/exit
    # virtual-sample machinery
    probes_on = _os.environ.get("PS_PROBES", "1") != "0"
    ee_on = _os.environ.get("PS_EE", "1") != "0"
    # PS_NOSEL=1: perf probe ONLY — skip the parity select that
    # materializes the full (PB,BY,BZ) band every slab (reads band A
    # always; WRONG results under double buffering, same DMA/compute
    # pattern). Never set outside cost-attribution runs.
    nosel = _os.environ.get("PS_NOSEL", "0") == "1"

    def kernel(
        tab_ref,
        ch_ref,
        vol0_ref,
        vol1_ref,
        vol2_ref,
        depth_ref,
        hit_ref,
        steps_ref,
        model_ref,
        tnear_ref,
        exec_ref,
        band,
        band2,
        sem,
        sem2,
    ):
        n_act = tab_ref[0, 0, 0]
        axis = tab_ref[0, 0, 1]
        nx = tab_ref[0, 0, 2]
        ny = tab_ref[0, 0, 3]
        nz = tab_ref[0, 0, 4]

        # per-ray channels, each (1, 128) f32
        y0 = ch_ref[0, 0:1, :]
        sy = ch_ref[0, 1:2, :]
        z0 = ch_ref[0, 2:3, :]
        sz = ch_ref[0, 3:4, :]
        tc0 = ch_ref[0, 4:5, :]
        tc1 = ch_ref[0, 5:6, :]
        t_start = ch_ref[0, 6:7, :]
        t_end = ch_ref[0, 7:8, :]
        half = ch_ref[0, 8:9, :]  # res/2, world units
        dirpos = tc1 > 0.0

        nxf = nx.astype(jnp.float32)
        nyf = ny.astype(jnp.float32)
        nzf = nz.astype(jnp.float32)

        p_io9 = lax.broadcasted_iota(jnp.int32, (PB, LANES), 0)
        p_io8 = lax.broadcasted_iota(jnp.int32, (SLAB, LANES), 0)

        def corr(v):
            return jnp.where(v >= 0.0, v - half, v + half)

        def unpack(pack):
            zb = lax.rem(pack, 32) * 128
            yb = lax.rem(pack // 32, 256) * 8
            slab = pack // (32 * 256)
            xb = jnp.minimum(slab * SLAB, nx - PB)
            return slab, xb, yb, zb

        def dma(buf, sem_, xb, yb, zb, do_start, do_wait):
            for a, vol in ((0, vol0_ref), (1, vol1_ref), (2, vol2_ref)):

                @pl.when(axis == a)
                def _(vol=vol):
                    cp = pltpu.make_async_copy(
                        vol.at[pl.ds(xb, PB), pl.ds(yb, BY), pl.ds(zb, BZ)],
                        buf,
                        sem_,
                    )
                    if do_start:
                        cp.start()
                    if do_wait:
                        cp.wait()

        if double_buffer:
            # prologue: start slab 0 into band A
            @pl.when(n_act > 0)
            def _():
                _, xb0, yb0, zb0 = unpack(tab_ref[0, 0, HDR])
                dma(band, sem, xb0, yb0, zb0, True, False)

        def slab_body(s, state):
            depth, hitm, steps, sampled, modelm, tnear, deadm, rcub = state
            slab, xb, yb, zb = unpack(tab_ref[0, 0, HDR + s])
            if double_buffer:
                parity = lax.rem(s, 2)

                # kick off the NEXT slab's copy, then wait ours
                s_next = jnp.minimum(s + 1, n_act - 1)
                _, xbn, ybn, zbn = unpack(tab_ref[0, 0, HDR + s_next])
                have_next = s + 1 < n_act

                @pl.when(jnp.logical_and(parity == 0, have_next))
                def _():
                    dma(band2, sem2, xbn, ybn, zbn, True, False)

                @pl.when(jnp.logical_and(parity == 1, have_next))
                def _():
                    dma(band, sem, xbn, ybn, zbn, True, False)

                @pl.when(parity == 0)
                def _():
                    dma(band, sem, xb, yb, zb, False, True)

                @pl.when(parity == 1)
                def _():
                    dma(band2, sem2, xb, yb, zb, False, True)
            else:
                dma(band, sem, xb, yb, zb, True, True)

            # ---- main pass: sample the 9 plane crossings -----------------
            gx = xb + p_io9  # (9,128) global plane index
            ux = gx.astype(jnp.float32) + 0.5
            ty = tc0 + tc1 * ux
            uy = y0 + sy * ux
            uz = z0 + sz * ux
            valid = (
                (ty >= t_start)
                & (ty <= t_end)
                & (gx >= 0)
                & (gx <= nx - 1)
                & (uy >= 0.0)
                & (uy < nyf)
                & (uz >= 0.0)
                & (uz < nzf)
            )
            loy = jnp.clip(
                jnp.floor(uy - 0.5).astype(jnp.int32), 0, ny - 2
            )
            loz = jnp.clip(
                jnp.floor(uz - 0.5).astype(jnp.int32), 0, nz - 2
            )
            wy = uy - 0.5 - loy.astype(jnp.float32)
            wz = uz - 0.5 - loz.astype(jnp.float32)
            ryb = loy - yb
            rzb = loz - zb
            valid &= (ryb >= 0) & (ryb <= BY - 2) & (rzb >= 0) & (rzb <= BZ - 2)
            ry = jnp.clip(ryb, 0, BY - 2)
            rz = jnp.clip(rzb, 0, BZ - 2)

            if double_buffer and not nosel:
                band_v = jnp.where(parity == 0, band[...], band2[...])
            else:
                band_v = band[...]
            v00, v01, v10, v11 = _corner_gather(band_v, ry, rz)
            c00, c01, c10, c11 = corr(v00), corr(v01), corr(v10), corr(v11)
            d9 = (
                c00 * (1 - wy) * (1 - wz)
                + c01 * (1 - wy) * wz
                + c10 * wy * (1 - wz)
                + c11 * wy * wz
            )
            d9 = jnp.where(valid, d9, BIGF)

            # ---- pair logic (all (8,128) slices / arithmetic) ------------
            dlow, dhigh = d9[0:SLAB], d9[1:PB]
            tlow, thigh = ty[0:SLAB], ty[1:PB]
            vlow, vhigh = valid[0:SLAB], valid[1:PB]
            own = (gx[0:SLAB] >= slab * SLAB) & (gx[0:SLAB] < slab * SLAB + SLAB)
            din = jnp.where(dirpos, dlow, dhigh)
            dout = jnp.where(dirpos, dhigh, dlow)
            ta = jnp.where(dirpos, tlow, thigh)
            tb = jnp.where(dirpos, thigh, tlow)
            pair_valid = own & vlow & vhigh
            cross = pair_valid & (din >= eps) & (dout < eps)

            # frozen-corner model of d along the pair segment:
            #   dhat(t) = (1-wx) * B_p(y(t), z(t)) + wx * B_{p+1}(y(t), z(t))
            # with B_* the corrected bilinears of the corner values the main
            # pass already extracted (each plane's corners at ITS crossing
            # point). Exact at both endpoints; between them it linearly
            # extends each plane's bilinear patch (error only if the segment
            # drifts out of the corner cell, bounded by the slope caps).
            fr = (c00, c01, c10, c11, loy, loz)

            def dhat(t):
                uxm = (t - tc0) / tc1  # (·,128)
                uym = y0 + sy * uxm
                uzm = z0 + sz * uxm
                wxm = uxm - (gx[0:SLAB].astype(jnp.float32) + 0.5)
                c00_, c01_, c10_, c11_, loy_, loz_ = fr

                def bil(p0, p1):
                    wy_ = uym - 0.5 - lax.slice_in_dim(loy_, p0, p1).astype(
                        jnp.float32
                    )
                    wz_ = uzm - 0.5 - lax.slice_in_dim(loz_, p0, p1).astype(
                        jnp.float32
                    )
                    return (
                        lax.slice_in_dim(c00_, p0, p1) * (1 - wy_) * (1 - wz_)
                        + lax.slice_in_dim(c01_, p0, p1) * (1 - wy_) * wz_
                        + lax.slice_in_dim(c10_, p0, p1) * wy_ * (1 - wz_)
                        + lax.slice_in_dim(c11_, p0, p1) * wy_ * wz_
                    )

                return (1 - wxm) * bil(0, SLAB) + wxm * bil(1, PB)

            # graze check: a sub-sample dip below eps between two >=eps
            # samples. The CORRECTED field is up to ~2-Lipschitz along the
            # ray (the +-res/2 center correction doubles corner jumps across
            # sign changes), and the exact march samples every ~res/2: match
            # its fidelity with three frozen-model probes per pair and a
            # 1.1*spacing dip gate.
            spacing = jnp.abs(tc1)
            if probes_on:
                tq1 = ta + 0.25 * (tb - ta)
                tmid = 0.5 * (ta + tb)
                tq3 = ta + 0.75 * (tb - ta)
                dq1 = dhat(tq1)
                dmid = dhat(tmid)
                dq3 = dhat(tq3)
                # earliest probe (marching order: ta is always the earlier t)
                dip_t = jnp.where(
                    dq1 < eps,
                    tq1,
                    jnp.where(dmid < eps, tmid, jnp.where(dq3 < eps, tq3, BIGF)),
                )
                dip_min = jnp.minimum(dq1, jnp.minimum(dmid, dq3))
            else:  # ablation: no sub-sample dip detection
                dip_t = jnp.full_like(ta, BIGF)
                dip_min = jnp.full_like(ta, BIGF)
            # Fire a graze HIT only on DEEP dips (model min clearly below
            # eps): the frozen-corner model's O(res) silhouette error makes
            # shallow dips fire one pair before a genuine crossing on ~10%
            # of all rays (measured 102k flagged hits/Mray), flooding the
            # exact-verification budget. Shallow dips are instead recorded
            # by the tnear tracking below: if a real hit follows they cost
            # nothing; if the ray misses, the near-miss verification pass
            # re-checks them exactly.
            deep = dip_min < eps - 2.0 * half  # eps - res
            graze = (
                pair_valid
                & ~cross
                & (din >= eps)
                & (dout >= eps)
                & (jnp.minimum(din, dout) < 1.1 * spacing)
                & (dip_t < BIGF)
                & deep
            )

            # ---- near-miss tracking --------------------------------------
            # Record the FIRST t (slabs arrive in marching order; within a
            # slab take the min t) where any exact sample or graze probe
            # dips below eps + nm_mult*spacing while the ray is unhit. The
            # frozen-corner model's silhouette error is O(plane spacing), so
            # a miss whose trace came this close may be a false miss; the
            # XLA tail re-checks such rays with exact trilinear queries
            # (the symmetric counterpart of the model-hit verification —
            # NOTES §11(a), VERDICT r2 item 2).
            # (8,128) pair-slice shapes only: Mosaic cannot sublane-broadcast
            # the (1,128) threshold to the (17,128) plane array.
            # Threshold scales with RES (the frozen-corner model's error is
            # O(res) near silhouettes, NOTES §11), NOT with plane spacing —
            # a spacing-scaled threshold flagged ~9% of all rays (every
            # surface-adjacent trace) and cascaded into the full fallback.
            nm_thresh = eps + nm_mult * (2.0 * half)

            # One (SLAB,128) candidate per PAIR: flag when the pair's min
            # observed value (exact endpoint samples + the three model
            # probes) dips below the threshold; the representative t is the
            # pair START ta — the verification window (t +- 1.25*spacing)
            # covers the whole pair segment [ta, ta+spacing], so per-sample
            # ts buy nothing. Accumulate into (SLAB,128) running-min STATE:
            # a per-slab sublane reduce here measured +7 us/slab (bitcast
            # min-reduces inside the loop); the single reduce after the
            # loop is free. min over pairs/slabs == earliest flagged pair
            # (ts are absolute; post-hit slabs only contribute larger ts,
            # so no hit gate is needed).
            dmin_pair = jnp.minimum(jnp.minimum(din, dout), dip_min)
            near_c = jnp.where(
                pair_valid & (dmin_pair < nm_thresh),
                jnp.maximum(ta, 0.0),
                BIGF,
            )
            new_tnear = jnp.minimum(tnear, near_c)
            cand = cross | graze
            tb_eff = jnp.where(graze, dip_t, tb)

            # first candidate pair along the marching direction
            rank = jnp.where(dirpos, p_io8, SLAB - 1 - p_io8)
            key = jnp.where(cand, rank, 99)
            minkey = jnp.min(key, axis=0, keepdims=True)
            sel = cand & (key == minkey)
            found = (minkey < 99) & (hitm == 0)

            def extract_model(sel8):
                """One pair's frozen-corner model, selected by a one-hot
                (SLAB,128) mask: extract its 8 corner values + corner-cell
                coords, return a (1,128)-vector evaluator of
                dhat(t) = (1-wx)*B_p + wx*B_{p+1} (exactly cubic in t;
                linear x-EXTRApolation outside [ta,tb] matches the
                reference's edge interpolation rules)."""

                def es(x):
                    return jnp.sum(
                        jnp.where(sel8, x, jnp.zeros((), x.dtype)),
                        axis=0,
                        keepdims=True,
                    )

                fA = [es(c[0:SLAB]) for c in (c00, c01, c10, c11)]
                fB = [es(c[1:PB]) for c in (c00, c01, c10, c11)]
                lyA = es(loy[0:SLAB]).astype(jnp.float32)
                lzA = es(loz[0:SLAB]).astype(jnp.float32)
                lyB = es(loy[1:PB]).astype(jnp.float32)
                lzB = es(loz[1:PB]).astype(jnp.float32)
                gxs = es(gx[0:SLAB]).astype(jnp.float32)

                def dh(t):
                    uxm = (t - tc0) / tc1
                    uym = y0 + sy * uxm
                    uzm = z0 + sz * uxm
                    wxm = uxm - (gxs + 0.5)

                    def bil(cs, ly, lz):
                        wy_ = uym - 0.5 - ly
                        wz_ = uzm - 0.5 - lz
                        return (
                            cs[0] * (1 - wy_) * (1 - wz_)
                            + cs[1] * (1 - wy_) * wz_
                            + cs[2] * wy_ * (1 - wz_)
                            + cs[3] * wy_ * wz_
                        )

                    return (1 - wxm) * bil(fA, lyA, lzA) + wxm * bil(
                        fB, lyB, lzB
                    )

                return dh

            def selsum(x):
                return jnp.sum(
                    jnp.where(sel, x, jnp.zeros((), x.dtype)),
                    axis=0,
                    keepdims=True,
                )

            lo = selsum(ta)
            hi = selsum(tb_eff)

            # Crossing refinement. Two modes (measured in
            # scripts/bench_plane_ablate.py):
            #  - "secant": per-pair secant to the eps level on values the
            #    main pass already computed (din >= eps > dout / dip_min) —
            #    (SLAB,128) elementwise, no model re-evaluation, ~free.
            #  - "bisect": fit the selected pair's frozen-corner model (an
            #    EXACT cubic in t) and carry its coefficients in loop state;
            #    the sequential bisection chain runs once per row after the
            #    slab loop. The fit + carry measured ~5 us/slab — kept for
            #    parity experiments.
            if refine_mode == "secant":
                d_eff = jnp.where(graze, dip_min, dout)
                den = jnp.maximum(din - d_eff, 1e-20)
                t_sec = ta + (tb_eff - ta) * (din - eps) / den
                t_hit = selsum(t_sec)
            elif refine_iters > 0:
                dhat1 = extract_model(sel)
                span = hi - lo
                d0 = dhat1(lo)
                d1 = dhat1(lo + span * (1.0 / 3.0))
                d2 = dhat1(lo + span * (2.0 / 3.0))
                d3 = dhat1(hi)
                # cubic through (u=0,1,2,3) -> coefficients in u
                fc0 = d0
                fc1 = (-11 * d0 + 18 * d1 - 9 * d2 + 2 * d3) / 6.0
                fc2 = (2 * d0 - 5 * d1 + 4 * d2 - d3) / 2.0
                fc3 = (-d0 + 3 * d1 - 3 * d2 + d3) / 6.0
                t_hit = hi  # placeholder until the post-loop refine
            else:
                t_hit = hi

            # first / last valid plane of this slab (marching order)
            rank9 = jnp.where(dirpos, p_io9, PB - 1 - p_io9)
            key9 = jnp.where(valid, rank9, 99)
            mk9 = jnp.min(key9, axis=0, keepdims=True)
            selfirst = valid & (key9 == mk9)
            key9b = jnp.where(valid, rank9, -1)
            mx9 = jnp.max(key9b, axis=0, keepdims=True)
            sellast = valid & (key9b == mx9)

            def sum9(sel9, x):
                return jnp.sum(jnp.where(sel9, x, 0.0), axis=0, keepdims=True)

            firstd = sum9(selfirst, d9)
            firstt = sum9(selfirst, ty)
            pfv = jnp.sum(
                jnp.where(selfirst, p_io9, 0), axis=0, keepdims=True
            )
            lastd = sum9(sellast, d9)
            lastt = sum9(sellast, ty)
            plv = jnp.sum(jnp.where(sellast, p_io9, 0), axis=0, keepdims=True)
            has_sample = mk9 < 99

            def t_at_eps(t0, d0_, t1, d1_):
                # secant to the eps level inside a bracket (d0_>=eps>d1_)
                den = jnp.where(jnp.abs(d0_ - d1_) > 1e-20, d0_ - d1_, 1e-20)
                return t0 + (t1 - t0) * (d0_ - eps) / den

            # ---- entry / exit virtual samples ----------------------------
            # plane-center sampling cannot see crossings in the sliver
            # between a grid face and the nearest plane center (obstacles
            # poking through the volume boundary). Sample the ray's entry
            # (t_start) and exit (t_end) points by extrapolating the first /
            # last valid pair's frozen-corner model — which reproduces the
            # reference's edge extrapolation exactly up to y/z drift.
            fresh = (jnp.logical_not(sampled.astype(bool))
                     & has_sample & (hitm == 0))
            # the entry probes extrapolate the FIRST-SAMPLE pair's model to
            # t_start: only meaningful when the entry actually lies within
            # ~one plane of it. A farther entry means the entry slab was
            # inactive, i.e. provably interior-free — no entry hit possible
            # (an 80-plane extrapolation otherwise goes arbitrarily negative
            # and hallucinates hits).
            spacing = jnp.abs(tc1)
            if ee_on:
                near_entry = (firstt - t_start) <= 1.5 * spacing
                pv8 = vlow & vhigh  # model needs both planes of the pair valid

                def pair_ok(pair_idx):
                    return (
                        jnp.sum(
                            ((p_io8 == pair_idx) & pv8).astype(jnp.int32),
                            axis=0,
                            keepdims=True,
                        )
                        > 0
                    )

                pair_e = jnp.clip(
                    jnp.where(dirpos, pfv, pfv - 1), 0, SLAB - 1
                )
                # the model-based entry probes need a valid pair; the exact
                # first-sample immediate hit below must NOT be gated on it (a
                # neighboring slab can contribute its single shared boundary
                # plane as the ray's first sample)
                e_ok = fresh & near_entry & pair_ok(pair_e)
                dh_e = extract_model(p_io8 == pair_e)
                d_entry = dh_e(t_start)
                t_mid_e = 0.5 * (t_start + firstt)
                d_mid_e = dh_e(t_mid_e)
                entry_hit = e_ok & (d_entry < eps)
                entry_graze = (
                    e_ok & ~entry_hit & (firstd >= eps) & (d_mid_e < eps)
                )
                t_entry_hit = jnp.where(
                    entry_hit, t_start, t_at_eps(t_start, d_entry, t_mid_e, d_mid_e)
                )

                # the ray's window ends inside this slab if the next crossing
                # (one spacing past the last valid one) is already outside it
                exiting = has_sample & (hitm == 0) & (t_end < lastt + spacing)
                pair_x = jnp.clip(
                    jnp.where(dirpos, plv - 1, plv), 0, SLAB - 1
                )
                exiting &= pair_ok(pair_x)
                dh_x = extract_model(p_io8 == pair_x)
                d_exit = dh_x(t_end)
                t_mid_x = 0.5 * (lastt + t_end)
                d_mid_x = dh_x(t_mid_x)
                exit_cross = exiting & (lastd >= eps) & (d_exit < eps)
                exit_graze = (
                    exiting
                    & (lastd >= eps)
                    & (d_exit >= eps)
                    & (d_mid_x < eps)
                )
                t_exit_hit = jnp.where(
                    exit_cross,
                    t_at_eps(lastt, lastd, t_end, d_exit),
                    t_at_eps(lastt, lastd, t_mid_x, d_mid_x),
                )
            else:  # ablation: no entry/exit virtual samples
                falses = fresh & jnp.zeros_like(fresh)
                entry_hit = entry_graze = exit_cross = exit_graze = falses
                t_entry_hit = t_exit_hit = t_start

            # immediate hit: first-ever valid sample already inside eps
            imm = fresh & (firstd < eps)

            # priority along the ray: entry (t_start) < immediate (first
            # plane) < in-slab crossing < exit sliver
            any_entry = entry_hit | entry_graze
            new_depth = jnp.where(
                any_entry,
                t_entry_hit,
                jnp.where(
                    imm,
                    firstt,
                    jnp.where(
                        found,
                        t_hit,
                        jnp.where(exit_cross | exit_graze, t_exit_hit, depth),
                    ),
                ),
            )
            hit_now = any_entry | imm | found | exit_cross | exit_graze
            new_hit = hitm | hit_now.astype(jnp.int32)
            # stash the fitted cubic for the post-loop refine on lanes whose
            # ACCEPTED hit this slab is the in-slab crossing (entry/imm take
            # priority in the depth chain above; found is gated on unhit, so
            # this is write-once per lane)
            accepted = found & ~any_entry & ~imm
            if refine_mode != "secant" and refine_iters > 0:
                rc0, rc1, rc2, rc3, rlo, rspan, rflag = rcub
                new_rcub = (
                    jnp.where(accepted, fc0, rc0),
                    jnp.where(accepted, fc1, rc1),
                    jnp.where(accepted, fc2, rc2),
                    jnp.where(accepted, fc3, rc3),
                    jnp.where(accepted, lo, rlo),
                    jnp.where(accepted, span, rspan),
                    rflag | accepted.astype(jnp.int32),
                )
            else:
                new_rcub = rcub
            # hits witnessed by EXACT samples (a sign crossing between two
            # in-band samples, or a first sample already < eps) are provably
            # real; hits proposed by the frozen-corner MODEL (graze probes,
            # entry/exit extrapolation) get re-checked with exact queries on
            # the XLA side
            graze_sel = (
                jnp.sum((sel & graze).astype(jnp.int32), axis=0, keepdims=True)
                > 0
            )
            unhit = hitm == 0
            # entry hits on rays whose first EXACT in-band sample is already
            # below eps (imm witness) are provably real — the ray starts
            # inside an obstacle cross-section at the volume boundary
            # (measured: 101k/1M rays on the bench scene, ~ALL of the flag
            # volume) — and the reported t_start matches the march's own
            # inside-start behavior; only witness-less entry hits (true
            # boundary slivers) need exact verification.
            new_model = modelm | jnp.where(
                unhit & any_entry & jnp.logical_not(imm), 1, 0
            ) | jnp.where(
                unhit & (found & graze_sel), 2, 0
            ) | jnp.where(
                unhit & (exit_cross | exit_graze), 4, 0
            )
            new_steps = steps + jnp.sum(
                (valid & (hitm == 0)).astype(jnp.int32), axis=0, keepdims=True
            )
            new_sampled = sampled | has_sample.astype(jnp.int32)
            # ---- dead-lane tracking (drives the early row exit) ----------
            # A lane is DEAD once it has hit OR its ray window is exhausted:
            # slabs arrive in marching order, so the max t reached after
            # this slab (the t of its last plane in marching order) is
            # monotone over slabs — once it passes t_end, no future slab
            # can produce a valid sample for this lane (rows never mix
            # marching directions: mixed rows are unresolved fallbacks).
            # Exit/entry logic for the lane has already fired by then (the
            # exit sliver is detected in the lane's last slab WITH valid
            # samples). This lets rows whose remaining lanes are beyond
            # their windows (background / silhouette tiles) stop streaming
            # slabs instead of running to n_act.
            xbf = xb.astype(jnp.float32)
            t_reach = jnp.where(
                dirpos,
                tc0 + tc1 * (xbf + (PB - 0.5)),
                tc0 + tc1 * (xbf + 0.5),
            )
            new_dead = deadm | new_hit | (t_reach >= t_end).astype(jnp.int32)
            return (
                new_depth, new_hit, new_steps, new_sampled, new_model,
                new_tnear, new_dead, new_rcub,
            )

        zf = lambda: jnp.zeros((1, LANES), jnp.float32)
        init = (
            jnp.full((1, LANES), t_max, jnp.float32),
            jnp.zeros((1, LANES), jnp.int32),
            jnp.zeros((1, LANES), jnp.int32),
            jnp.zeros((1, LANES), jnp.int32),
            jnp.zeros((1, LANES), jnp.int32),
            jnp.full((SLAB, LANES), BIGF, jnp.float32),
            jnp.zeros((1, LANES), jnp.int32),
            (zf(), zf(), zf(), zf(), zf(), zf(),
             jnp.zeros((1, LANES), jnp.int32)),
        )
        if early_exit:
            # stop once every ray in the row is DEAD (hit, or its window
            # exhausted): the vector->scalar reduction costs ~2 us but a
            # skipped slab saves ~6 us; tiles over an object's interior hit
            # within 1-2 slabs and background/silhouette tiles stop at
            # their windows' end instead of streaming all n_act slabs
            def cond(st):
                s, (_, _, _, _, _, _, deadm, _) = st
                return jnp.logical_and(s < n_act, jnp.any(deadm == 0))

            def body(st):
                s, state = st
                return s + 1, slab_body(s, state)

            s_end, (depth, hitm, steps, _, modelm, tnearv, _, rcub) = lax.while_loop(
                cond, body, (jnp.int32(0), init)
            )
            if double_buffer:
                # drain the prefetched copy left in flight by an early exit
                @pl.when(s_end < n_act)
                def _():
                    _, xb_d, yb_d, zb_d = unpack(tab_ref[0, 0, HDR + s_end])
                    par = lax.rem(s_end, 2)

                    @pl.when(par == 0)
                    def _():
                        dma(band, sem, xb_d, yb_d, zb_d, False, True)

                    @pl.when(par == 1)
                    def _():
                        dma(band2, sem2, xb_d, yb_d, zb_d, False, True)

        else:
            s_end = n_act
            depth, hitm, steps, _, modelm, tnearv, _, rcub = lax.fori_loop(
                0, n_act, slab_body, init
            )
        # ---- deferred crossing refinement (once per row) --------------
        # bisection on the stored cubic: same bracket, update rule, and
        # iteration count as the old in-loop chain -> identical depths, at
        # ~0 cost here vs ~5 us on every slab's critical path there
        if refine_mode != "secant" and refine_iters > 0:
            rc0, rc1, rc2, rc3, rlo, rspan, rflag = rcub
            rinv = jnp.where(rspan > 0, 3.0 / jnp.maximum(rspan, 1e-20), 0.0)
            lo_ = rlo
            hi_ = rlo + rspan
            for _ in range(refine_iters):  # python-unrolled (1,128) Horner
                tm = 0.5 * (lo_ + hi_)
                u = (tm - rlo) * rinv
                dm = rc0 + u * (rc1 + u * (rc2 + u * rc3))
                below = dm < eps
                lo_ = jnp.where(below, lo_, tm)
                hi_ = jnp.where(below, tm, hi_)
            depth = jnp.where(rflag > 0, hi_, depth)
        depth_ref[...] = depth.reshape(1, 1, LANES)
        hit_ref[...] = hitm.reshape(1, 1, LANES)
        steps_ref[...] = steps.reshape(1, 1, LANES)
        model_ref[...] = modelm.reshape(1, 1, LANES)
        # single sublane min-reduce of the (SLAB,128) running-min state;
        # Mosaic has no f32 sublane min-reduce, but for non-negative floats
        # IEEE order == int32 order, so reduce the bitcast int32 view (all
        # candidates were clamped >= 0)
        tn_i = jnp.min(
            lax.bitcast_convert_type(tnearv, jnp.int32), axis=0, keepdims=True
        )
        tnear_ref[...] = lax.bitcast_convert_type(tn_i, jnp.float32).reshape(
            1, 1, LANES
        )
        # executed-slab count (early-exit effectiveness diagnostic)
        exec_ref[...] = jnp.full((1, 1, LANES), s_end, jnp.int32)

    return kernel


# ---------------------------------------------------------------------------
# XLA-side precompute: rows, tables, activity
# ---------------------------------------------------------------------------


def _row_tables(meta_shape_by_axis, supported, u0, vg, t_start, t_end, res, smax):
    """Build per-row header+slot tables, channels, and the unresolved mask.

    u0, vg: (R, 128, 3) grid-frame positions (cell units) / directions
    (cells per world unit). t_start/t_end: (R, 128) world-unit ray windows
    (already AABB-clipped; empty window = miss).
    Returns (tab (R,1,HDR+smax) i32, ch (R,16,128) f32, unresolved (R,) bool).
    """
    R = u0.shape[0]
    f32 = jnp.float32

    # ---- axis choice per row (among supported axes) ----------------------
    mean_v = jnp.mean(jnp.abs(vg), axis=1)  # (R, 3)
    scores = jnp.stack(
        [
            jnp.where(supported[a], mean_v[:, a], -1.0)
            for a in range(3)
        ],
        axis=1,
    )
    axis_r = jnp.argmax(scores, axis=1).astype(jnp.int32)  # (R,)

    def pick(arr3, a_idx):
        # arr3 (R,128,3) or (R,3) -> select per-row axis component
        if arr3.ndim == 3:
            sel = jax.nn.one_hot(a_idx, 3, dtype=arr3.dtype)[:, None, :]
            return jnp.sum(arr3 * sel, axis=-1)
        sel = jax.nn.one_hot(a_idx, 3, dtype=arr3.dtype)
        return jnp.sum(arr3 * sel, axis=-1)

    ax_n = (axis_r + 1) % 3
    ax_nn = (axis_r + 2) % 3
    ux0 = pick(u0, axis_r)
    uy0 = pick(u0, ax_n)
    uz0 = pick(u0, ax_nn)
    vx = pick(vg, axis_r)
    vy = pick(vg, ax_n)
    vz = pick(vg, ax_nn)

    dims = jnp.asarray(meta_shape_by_axis, jnp.int32)  # (3,3): per axis (nx',ny',nz')
    nx_r = dims[axis_r, 0]  # (R,)
    ny_r = dims[axis_r, 1]
    nz_r = dims[axis_r, 2]

    # ---- per-ray marching parameters ------------------------------------
    safe_vx = jnp.where(jnp.abs(vx) > 1e-12, vx, 1e-12)
    sy = vy / safe_vx
    sz = vz / safe_vx
    tc1 = 1.0 / safe_vx
    tc0 = -ux0 * tc1
    y0c = uy0 - ux0 * sy
    z0c = uz0 - ux0 * sz

    ray_live = t_start <= t_end  # rays that intersect the volume at all
    pos = vx > 0
    neg = vx < 0
    n_live = jnp.sum(ray_live, axis=1)
    pos_ok = jnp.sum((pos & ray_live), axis=1)
    neg_ok = jnp.sum((neg & ray_live), axis=1)
    mixed = (pos_ok > 0) & (neg_ok > 0)
    slope_bad = jnp.any(
        ray_live
        & ~((jnp.abs(sy) <= SLOPE_CAP) & (jnp.abs(sz) <= SLOPE_CAP)),
        axis=1,
    )
    dir_row = pos_ok >= neg_ok  # marching direction of the row

    # ---- footprints at slab boundaries ----------------------------------
    # y(ux) = y0c + sy*ux is linear per ray; min/max over rays of a linear
    # family is concave/convex, so extrema over a slab are at its endpoints.
    bounds = jnp.arange(smax + 1, dtype=f32) * SLAB + 0.5  # (S+1,)
    yb_v = y0c[:, :, None] + sy[:, :, None] * bounds[None, None, :]
    zb_v = z0c[:, :, None] + sz[:, :, None] * bounds[None, None, :]
    t_bv = tc0[:, :, None] + tc1[:, :, None] * bounds[None, None, :]
    live = ray_live[:, :, None]
    big = jnp.float32(1e9)
    ymin_b = jnp.min(jnp.where(live, yb_v, big), axis=1)  # (R, S+1)
    ymax_b = jnp.max(jnp.where(live, yb_v, -big), axis=1)
    zmin_b = jnp.min(jnp.where(live, zb_v, big), axis=1)
    zmax_b = jnp.max(jnp.where(live, zb_v, -big), axis=1)
    tmin_b = jnp.min(jnp.where(live, t_bv, big), axis=1)
    tmax_b = jnp.max(jnp.where(live, t_bv, -big), axis=1)

    def pairmin(a):
        return jnp.minimum(a[:, :-1], a[:, 1:])

    def pairmax(a):
        return jnp.maximum(a[:, :-1], a[:, 1:])

    ymin_s, ymax_s = pairmin(ymin_b), pairmax(ymax_b)  # (R, S)
    zmin_s, zmax_s = pairmin(zmin_b), pairmax(zmax_b)
    tmin_s, tmax_s = pairmin(tmin_b), pairmax(tmax_b)

    row_t_lo = jnp.min(jnp.where(ray_live, t_start, big), axis=1)
    row_t_hi = jnp.max(jnp.where(ray_live, t_end, -big), axis=1)
    relevant = (tmax_s >= row_t_lo[:, None]) & (tmin_s <= row_t_hi[:, None])
    s_ids = jnp.arange(smax, dtype=jnp.int32)[None, :]
    n_slab_r = (nx_r[:, None] + SLAB - 1) // SLAB
    relevant &= s_ids < n_slab_r

    # band bases (corner-cell index range, kernel-clip aware)
    ny_c = ny_r[:, None]
    nz_c = nz_r[:, None]
    rlo_y = jnp.clip(jnp.floor(ymin_s - 0.5).astype(jnp.int32), 0, ny_c - 2)
    rhi_y = jnp.clip(jnp.floor(ymax_s - 0.5).astype(jnp.int32), 0, ny_c - 2) + 1
    rlo_z = jnp.clip(jnp.floor(zmin_s - 0.5).astype(jnp.int32), 0, nz_c - 2)
    rhi_z = jnp.clip(jnp.floor(zmax_s - 0.5).astype(jnp.int32), 0, nz_c - 2) + 1
    yb_s = jnp.clip((rlo_y // 8) * 8, 0, jnp.maximum(ny_c - BY, 0))
    zb_s = jnp.clip((rlo_z // 128) * 128, 0, jnp.maximum(nz_c - BZ, 0))
    fit = (rhi_y <= yb_s + _Y_SPAN) & (rhi_z <= zb_s + _Z_SPAN)

    return dict(
        axis_r=axis_r,
        nx_r=nx_r,
        ny_r=ny_r,
        nz_r=nz_r,
        dir_row=dir_row,
        mixed=mixed,
        slope_bad=slope_bad,
        n_live=n_live,
        relevant=relevant,
        fit=fit,
        yb_s=yb_s,
        zb_s=zb_s,
        rlo_y=rlo_y,
        rhi_y=rhi_y,
        rlo_z=rlo_z,
        rhi_z=rhi_z,
        sy=sy,
        sz=sz,
        tc0=tc0,
        tc1=tc1,
        y0c=y0c,
        z0c=z0c,
        ux0=ux0,
        ray_live=ray_live,
        s_ids=s_ids,
    )


@functools.partial(
    jax.jit,
    static_argnames=(
        "t_min",
        "t_max",
        "eps",
        "refine_iters",
        "interpret",
        "force_all_active",
        "double_buffer",
        "early_exit",
        "max_steps",
        "min_step",
        "nm_mult",
        "refine_mode",
    ),
)
def _plane_sweep_core(
    values: Array,
    inv_origin_transform: Array,
    resolution: Array,
    origins: Array,
    directions: Array,
    t_min: float,
    t_max: float,
    eps: float,
    refine_iters: int = 8,
    interpret: bool = False,
    force_all_active: bool = False,
    double_buffer: bool = True,
    early_exit: bool = True,
    max_steps: int = 96,
    min_step=None,
    nm_mult: float = 0.5,
    refine_mode: str = None,
):
    """Plane-sweep depth for padded rays (N % 128 == 0). Returns
    (depth (N,), hit (N,) bool, steps (N,) i32, unresolved (N,) bool)."""
    nxyz = values.shape
    res = resolution.astype(jnp.float32)
    N = origins.shape[0]
    R = N // LANES

    # grid-frame cell-unit rays. rotate_points, NOT a matmul: XLA lowers the
    # [N,3]@[3,3] f32 matmul onto the MXU at default (bf16) precision,
    # quantizing ray directions to 8 mantissa bits — measured to displace
    # rays ~0.2-0.5 cells at t~20 grid widths and cause ~1% hit flips (the
    # round-2/3 plane-vs-march disagreement was largely THIS, not model
    # error).
    from ..grid import rotate_points

    rot = inv_origin_transform[:3, :3]
    trans = inv_origin_transform[:3, 3].astype(jnp.float32)
    u0w = rotate_points(rot, origins) + trans  # grid frame, world units
    vgw = rotate_points(rot, directions)
    u0 = (u0w / res).reshape(R, LANES, 3)
    vg = (vgw / res).reshape(R, LANES, 3)

    # AABB window (world-unit t; directions assumed unit-norm)
    sizes = jnp.asarray(nxyz, jnp.float32)[None, None, :]
    safe_v = jnp.where(jnp.abs(vg) > 1e-12, vg, 1e-12)
    t_a = (0.0 - u0) / safe_v
    t_b = (sizes - u0) / safe_v
    t_entry = jnp.max(jnp.minimum(t_a, t_b), axis=-1)
    t_exit = jnp.min(jnp.maximum(t_a, t_b), axis=-1)
    t_start = jnp.maximum(t_entry, t_min)
    t_end = jnp.minimum(t_exit, t_max)
    t_end = jnp.where(t_entry > t_exit, t_start - 1.0, t_end)  # box miss

    # supported marching axes (static)
    supported = []
    shapes_by_axis = []
    for a in range(3):
        p = _perm(a)
        sh = (nxyz[p[0]], nxyz[p[1]], nxyz[p[2]])
        shapes_by_axis.append(sh)
        supported.append(_axis_supported(sh))
    if not any(supported):
        raise ValueError("grid too small for the plane-sweep renderer")
    smax = max(
        (sh[0] + SLAB - 1) // SLAB
        for sh, ok in zip(shapes_by_axis, supported)
        if ok
    )

    info = _row_tables(
        shapes_by_axis,
        supported,
        u0,
        vg,
        t_start,
        t_end,
        res,
        smax,
    )

    # ---- near-surface coarse activity ------------------------------------
    # two indicators packed into one coarse int32 so a single SAT serves
    # both: bit 0 = any |v| < 1.5res in the 8^3 block (a crossing sample's
    # corner cell must be such a cell), bit 13 = any v < 1.5res (obstacle
    # interior; gates entry-slab activation for rays starting inside)
    packed = (jnp.abs(values) < 1.5 * res).astype(jnp.int32) + 8192 * (
        values < 1.5 * res
    ).astype(jnp.int32)
    cs = tuple((s + SLAB - 1) // SLAB for s in nxyz)
    pad = [(0, cs[i] * SLAB - nxyz[i]) for i in range(3)]

    def coarse_any(x):
        # ONE bitwise-OR reduce chain over the packed bits (the bits are
        # independent, so OR == per-bit any). Separable strided windows,
        # NOT a blocked reshape: the (cx,S,cy,S,cz,S) intermediate gets
        # T(8,128) minor-dim padding (S=16 -> 128 on lanes), a measured
        # 32 GB allocation at 1024^3.
        xp = jnp.pad(x, pad)
        for ax in range(3):
            win = [1, 1, 1]
            win[ax] = SLAB
            xp = lax.reduce_window(
                xp, jnp.int32(0), lax.bitwise_or, tuple(win), tuple(win), "VALID"
            )
        return xp

    coarse = coarse_any(packed)
    # summed-area tables per coarse x-layer: exact per-(row, slab) box query
    # (a global-cap dilation over-activates badly — measured 10x waste)
    sat_maps = []
    for a in range(3):
        if not supported[a]:
            sat_maps.append(None)
            continue
        ca = jnp.transpose(coarse, _perm(a))
        sat = jnp.cumsum(jnp.cumsum(ca, axis=1), axis=2)
        sat_maps.append(jnp.pad(sat, ((0, 0), (1, 0), (1, 0))))

    # footprint corner-cell range in coarse coords (inclusive)
    s_ids = info["s_ids"]
    ny_c = info["ny_r"][:, None]
    nz_c = info["nz_r"][:, None]
    y0c8 = jnp.clip(info["rlo_y"] // SLAB, 0, None)
    y1c8 = jnp.clip(info["rhi_y"] // SLAB, 0, None)
    z0c8 = jnp.clip(info["rlo_z"] // SLAB, 0, None)
    z1c8 = jnp.clip(info["rhi_z"] // SLAB, 0, None)
    near_act = jnp.zeros(y0c8.shape, bool)
    interior_act = jnp.zeros(y0c8.shape, bool)
    for a in range(3):
        if sat_maps[a] is None:
            continue
        sm = sat_maps[a]
        cya, cza = sm.shape[1], sm.shape[2]  # cy+1, cz+1
        flat = sm.reshape(-1)
        sc = jnp.clip(s_ids, 0, sm.shape[0] - 1)
        ylo = jnp.clip(y0c8, 0, cya - 1)
        yhi = jnp.clip(y1c8 + 1, 0, cya - 1)
        zlo = jnp.clip(z0c8, 0, cza - 1)
        zhi = jnp.clip(z1c8 + 1, 0, cza - 1)

        def q(yy, zz):
            return flat[(sc * cya + yy) * cza + zz]

        count = q(yhi, zhi) - q(ylo, zhi) - q(yhi, zlo) + q(ylo, zlo)
        on_axis = info["axis_r"][:, None] == a
        near_act = jnp.where(on_axis, lax.rem(count, 8192) > 0, near_act)
        interior_act = jnp.where(on_axis, count // 8192 > 0, interior_act)

    # entry slabs are force-activated (rays starting inside an obstacle
    # must produce their immediate hit even in "far" slabs)
    ux_entry = (
        jnp.where(info["ray_live"], t_start, 0.0) - info["tc0"]
    ) / info["tc1"]
    se = jnp.clip((ux_entry / SLAB).astype(jnp.int32), 0, smax - 1)
    se_oh = jax.nn.one_hot(se, smax, dtype=jnp.int32) * info["ray_live"][
        :, :, None
    ].astype(jnp.int32)
    entry_act = jnp.sum(se_oh, axis=1) > 0
    # the first sampled plane may fall in the NEXT slab along the marching
    # direction; the opposite neighbor can never contain it
    fwd = jnp.where(
        info["dir_row"][:, None],
        jnp.pad(entry_act[:, :-1], ((0, 0), (1, 0))),
        jnp.pad(entry_act[:, 1:], ((0, 0), (0, 1))),
    )
    # entry slabs only matter for immediate hits (ray starting inside an
    # obstacle); a box with no interior cells cannot produce one
    entry_act = (entry_act | fwd) & interior_act

    if force_all_active:
        near_act = jnp.ones_like(near_act)
    active = info["relevant"] & (near_act | entry_act)
    unresolved_row = (
        info["mixed"]
        | info["slope_bad"]
        | jnp.any(active & ~info["fit"], axis=1)
    ) & (info["n_live"] > 0)
    active &= ~unresolved_row[:, None]

    # ---- compact into marching-ordered slot tables ------------------------
    order = jnp.where(info["dir_row"][:, None], s_ids, smax - 1 - s_ids)
    key = jnp.where(active, order, jnp.int32(1 << 20))
    sort_idx = jnp.argsort(key, axis=1)
    act_sorted = jnp.take_along_axis(active, sort_idx, axis=1)
    n_act = jnp.sum(active, axis=1).astype(jnp.int32)
    slab_sorted = jnp.take_along_axis(
        jnp.broadcast_to(s_ids, active.shape), sort_idx, axis=1
    )
    yb_sorted = jnp.take_along_axis(info["yb_s"], sort_idx, axis=1)
    zb_sorted = jnp.take_along_axis(info["zb_s"], sort_idx, axis=1)
    pack = (slab_sorted * 256 + yb_sorted // 8) * 32 + zb_sorted // 128
    pack = jnp.where(act_sorted, pack, 0)

    header = jnp.stack(
        [
            n_act,
            info["axis_r"],
            info["nx_r"],
            info["ny_r"],
            info["nz_r"],
            jnp.zeros_like(n_act),
            jnp.zeros_like(n_act),
            jnp.zeros_like(n_act),
        ],
        axis=1,
    )
    tab = jnp.concatenate([header, pack], axis=1).reshape(R, 1, HDR + smax)

    halfv = jnp.broadcast_to(res * 0.5, (R, LANES))
    ch = jnp.stack(
        [
            info["y0c"],
            info["sy"],
            info["z0c"],
            info["sz"],
            info["tc0"],
            info["tc1"],
            t_start,
            t_end,
            halfv,
        ]
        + [jnp.zeros((R, LANES), jnp.float32)] * 7,
        axis=1,
    )

    # ---- transposed volumes ----------------------------------------------
    # Only materialize a permuted copy when SOME row actually marches that
    # axis: a 512^3 minor-dim transpose costs ~15-25 ms/frame and a typical
    # camera bundle is single-axis-dominant (zeros are ~1 ms). Axis 0's
    # perm is the identity (free).
    vols = []
    for a in range(3):
        if not supported[a]:
            vols.append(jnp.zeros((PB, BY, BZ), values.dtype))
            continue
        p = _perm(a)
        if p == (0, 1, 2):
            vols.append(values)
            continue
        shape_a = tuple(values.shape[i] for i in p)
        vols.append(
            lax.cond(
                jnp.any((info["axis_r"] == a) & (info["n_live"] > 0)),
                lambda p=p: jnp.transpose(values, p),
                lambda shape_a=shape_a: jnp.zeros(shape_a, values.dtype),
            )
        )

    if refine_mode is None:
        # trace-time default (None is the jit-static key, so one env value
        # per compilation; set PS_REFINE_MODE only in measurement scripts).
        # "secant" is the production default: measured equal accuracy to the
        # fitted-cubic bisection (CPU 64^3 and TPU 512^3 comparisons) at
        # lower kernel cost (no model re-evaluation, no coefficient carry).
        import os as _os_rm

        refine_mode = _os_rm.environ.get("PS_REFINE_MODE", "secant")
    kernel = _make_kernel(
        eps, t_max, smax, refine_iters, double_buffer, early_exit, nm_mult,
        refine_mode,
    )
    depth, hitm, steps, modelm, tnearm, execm = pl.pallas_call(
        kernel,
        grid=(R,),
        in_specs=[
            pl.BlockSpec(
                (1, 1, HDR + smax), lambda r: (r, 0, 0), memory_space=pltpu.SMEM
            ),
            pl.BlockSpec((1, 16, LANES), lambda r: (r, 0, 0)),
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec(memory_space=pl.ANY),
        ],
        out_specs=[
            pl.BlockSpec((1, 1, LANES), lambda r: (r, 0, 0)),
            pl.BlockSpec((1, 1, LANES), lambda r: (r, 0, 0)),
            pl.BlockSpec((1, 1, LANES), lambda r: (r, 0, 0)),
            pl.BlockSpec((1, 1, LANES), lambda r: (r, 0, 0)),
            pl.BlockSpec((1, 1, LANES), lambda r: (r, 0, 0)),
            pl.BlockSpec((1, 1, LANES), lambda r: (r, 0, 0)),
        ],
        out_shape=[
            _out_struct(values, (R, 1, LANES), jnp.float32),
            _out_struct(values, (R, 1, LANES), jnp.int32),
            _out_struct(values, (R, 1, LANES), jnp.int32),
            _out_struct(values, (R, 1, LANES), jnp.int32),
            _out_struct(values, (R, 1, LANES), jnp.float32),
            _out_struct(values, (R, 1, LANES), jnp.int32),
        ],
        scratch_shapes=[
            pltpu.VMEM((PB, BY, BZ), jnp.float32),
            pltpu.VMEM((PB, BY, BZ), jnp.float32),
            pltpu.SemaphoreType.DMA,
            pltpu.SemaphoreType.DMA,
        ],
        interpret=interpret,
    )(
        tab.astype(jnp.int32),
        ch.astype(jnp.float32),
        vols[0],
        vols[1],
        vols[2],
    )

    unresolved = jnp.broadcast_to(
        unresolved_row[:, None], (R, LANES)
    ).reshape(N)

    import os as _os

    exec_total = jnp.sum(execm[:, 0, 0])

    if _os.environ.get("PS_TAIL", "1") == "0":  # perf ablation knob
        zero = jnp.zeros((), jnp.int32)
        return (
            depth.reshape(N), hitm.reshape(N) > 0, steps.reshape(N),
            unresolved, jnp.sum(n_act), zero, zero, zero,
            (zero, zero, zero), tnearm.reshape(N), modelm.reshape(N),
            exec_total,
        )

    # ---- exact verification + recovery tail --------------------------------
    # Three correctness passes over the kernel's output, all with bounded
    # static budgets (reference crossing semantics: the corrected-trilinear
    # eps-crossing of /root/reference/include/sdf_tools/sdf.hpp:773-914, via
    # ops/query.estimate_distance):
    #  1. model-proposed HITS (graze / entry / exit classes): re-check with
    #     exact trilinear samples across the proposing segment; confirm with
    #     the exact first below-eps t or demote.
    #  2. near-MISSES (kernel-tracked tnear: first sample/probe below
    #     eps + nm_mult*spacing): the symmetric check — a true dip the
    #     frozen-corner model under-sees becomes a verified hit. Also
    #     applied to hits whose near-dip precedes the reported depth.
    #  3. demoted / budget-overflow rays: RESUME by exact-marching just
    #     those rays (compacted to KD), instead of reporting t_max or
    #     triggering the full-image march fallback.
    depth_f = depth.reshape(N)
    hit_f = hitm.reshape(N) > 0
    model_f = modelm.reshape(N) > 0
    tnear_f = tnearm.reshape(N)
    spacing_f = jnp.maximum(
        jnp.abs(info["tc1"].reshape(N)), jnp.sqrt(3.0) * res
    )
    from ..grid import GridMeta as _GridMeta, SdfGrid as _SdfGrid
    from . import query as _query

    meta_v = _GridMeta(
        origin_transform=jnp.linalg.inv(inv_origin_transform.astype(jnp.float64)).astype(jnp.float32),
        inv_origin_transform=inv_origin_transform,
        resolution=res,
        shape=tuple(values.shape),
        frame="world",
    )
    sdf_v = _SdfGrid(
        values=values, meta=meta_v, oob_value=jnp.asarray(jnp.inf)
    )
    KV = 25

    def exact_window(idxs, t_center, active):
        """Exact corrected-trilinear sampling of KV points across
        t_center ± 1.25*spacing for the selected rays. The window is scaled
        by the per-ray plane spacing |tc1| (up to ~3.6*res at the slope
        cap), NOT a fixed multiple of res, so dips near the ends of the
        proposing pair segment stay covered. Returns (any_below, t_first)."""
        o_s = origins[idxs]
        v_s = directions[idxs]
        sp = spacing_f[idxs]
        offs = jnp.linspace(-1.25, 1.25, KV).astype(jnp.float32)
        tsmp = t_center[:, None] + offs[None, :] * sp[:, None]
        pts = o_s[:, None, :] + tsmp[..., None] * v_s[:, None, :]
        dsm, oksm = _query.estimate_distance(sdf_v, pts)
        below = (
            active[:, None]
            & oksm
            & (dsm < eps)
            & (tsmp >= t_min)
            & (tsmp <= t_max)
        )
        anyb = jnp.any(below, axis=1)
        first = jnp.argmax(below, axis=1)
        t_first = jnp.take_along_axis(tsmp, first[:, None], axis=1)[:, 0]
        return anyb, t_first


    def compact_indices(mask, K, priority=None):
        """First-K (or priority-ranked) true indices of ``mask`` without a
        1M-element top_k (measured to dominate the tail): an exclusive
        cumsum assigns each true element its output slot, a drop-mode
        scatter materializes the index list. With ``priority`` (small int,
        higher = more important), higher classes fill first.
        Returns (idxs [K], sel [K] bool, overflow_mask [N])."""
        if priority is None:
            m = mask.astype(jnp.int32)
            pos = jnp.cumsum(m) - m  # exclusive scan
            slot = jnp.where(mask & (pos < K), pos, K)
            idxs = jnp.zeros((K,), jnp.int32).at[slot].set(
                jnp.arange(N, dtype=jnp.int32), mode="drop"
            )
            sel = jnp.zeros((K,), bool).at[slot].set(mask, mode="drop")
            overflow = mask & (pos >= K)
            return idxs, sel, overflow
        # two classes: fill class-2 first, then class-1 into the remainder
        hi = priority >= 2
        lo = mask & ~hi
        mh = hi.astype(jnp.int32)
        ph = jnp.cumsum(mh) - mh
        n_hi = jnp.minimum(jnp.sum(mh), K)
        ml = lo.astype(jnp.int32)
        pl = jnp.cumsum(ml) - ml + n_hi
        pos = jnp.where(hi, ph, pl)
        ok = (hi & (ph < K)) | (lo & (pl < K))
        slot = jnp.where(ok, pos, K)
        idxs = jnp.zeros((K,), jnp.int32).at[slot].set(
            jnp.arange(N, dtype=jnp.int32), mode="drop"
        )
        sel = jnp.zeros((K,), bool).at[slot].set(mask, mode="drop")
        overflow = mask & ~ok
        return idxs, sel, overflow

    # -- pass 1: verify model-proposed hits --
    flagged = hit_f & model_f
    model_bits = modelm.reshape(N)
    n_entry = jnp.sum((model_bits & 1) > 0)
    n_graze = jnp.sum((model_bits & 2) > 0)
    n_exit = jnp.sum((model_bits & 4) > 0)
    # measured flag volume on the bench scene is ~350/Mray (the deep-dip
    # gate + imm-witness skip removed the ~100k/Mray flood); overflow
    # cascades to the compacted exact-march resume, so a tight budget is
    # safe — it only shifts WHERE overflow rays get their exact answer.
    # Budgets are sized ~3x the measured production counts (352 flagged /
    # 101 resumed at 1Mray): each exact_window lane costs 25x8 scattered
    # gathers whether or not a ray fills it.
    KR = min(1024, N)
    idxs, f_sel, kr_overflow = compact_indices(flagged, KR)
    n_flagged = jnp.sum(flagged)
    anyb, t_ver = exact_window(idxs, depth_f[idxs], f_sel)
    confirmed = f_sel & anyb
    demoted_sel = f_sel & ~anyb
    hit_f = hit_f.at[idxs].set(jnp.where(f_sel, confirmed, hit_f[idxs]))
    depth_f = depth_f.at[idxs].set(
        jnp.where(
            f_sel,
            jnp.where(confirmed, t_ver, jnp.float32(t_max)),
            depth_f[idxs],
        )
    )
    demoted = jnp.zeros((N,), bool).at[idxs].set(demoted_sel)

    # -- pass 2: verify near-misses (and early near-dips of hits) --
    has_near = tnear_f < 0.5 * BIGF
    # miss rays: any near-dip qualifies (these are the VERDICT's near-miss
    # class and take budget priority). hit rays: only a dip CLEARLY earlier
    # than the reported depth is re-dated (a separate surface graze; the
    # approach samples right before a genuine crossing always dip below the
    # threshold and are not near-misses).
    nm_miss = has_near & ~hit_f & ~unresolved
    nm_redate = (
        has_near & hit_f & (tnear_f < depth_f - 4.0 * spacing_f) & ~unresolved
    )
    nm_mask = nm_miss | nm_redate
    KN = min(8192, N)
    nm_idxs, nm_sel, nm_overflow_all = compact_indices(
        nm_mask, KN, priority=2 * nm_miss.astype(jnp.int32) + nm_redate.astype(jnp.int32)
    )
    nm_overflow = nm_overflow_all & ~hit_f  # unverified possible miss
    n_near = jnp.sum(nm_mask)
    nm_anyb, nm_t = exact_window(nm_idxs, tnear_f[nm_idxs], nm_sel)
    nm_conf = nm_sel & nm_anyb
    old_hit = hit_f[nm_idxs]
    old_depth = depth_f[nm_idxs]
    hit_f = hit_f.at[nm_idxs].set(old_hit | nm_conf)
    depth_f = depth_f.at[nm_idxs].set(
        jnp.where(nm_conf, jnp.minimum(old_depth, nm_t), old_depth)
    )
    nm_confirmed = jnp.zeros((N,), bool).at[nm_idxs].set(nm_conf)

    # -- pass 3: exact-march resume for demoted / overflow rays --
    # A demoted model hit means the model was wrong somewhere near the
    # reported depth; the ray's remaining path was never traced. Re-trace
    # exactly from t_min (strictly stronger than resuming at the demotion
    # point) — compacted so the cost is O(KD rays), not a full-image
    # fallback. Budget overflow cascades to the global unresolved fallback.
    march_mask = (demoted & ~nm_confirmed) | kr_overflow | nm_overflow
    KD = min(512, N)
    md_idxs, md_sel, md_overflow = compact_indices(march_mask, KD)
    unresolved = unresolved | md_overflow
    n_resumed = jnp.sum(march_mask)
    from . import render as _render

    o_m = jnp.where(
        md_sel[:, None], origins[md_idxs], jnp.float32(-1e7)
    )  # dead rays miss the AABB instantly
    v_m = directions[md_idxs]
    d_m, h_m, _ = _render._trace_depth(
        values, sdf_v, o_m, v_m, t_min, t_max, eps, max_steps, min_step,
        coarse=False,
    )
    hit_f = hit_f.at[md_idxs].set(
        jnp.where(md_sel, h_m, hit_f[md_idxs])
    )
    depth_f = depth_f.at[md_idxs].set(
        jnp.where(
            md_sel,
            jnp.where(h_m, d_m, jnp.float32(t_max)),
            depth_f[md_idxs],
        )
    )

    return (
        depth_f,
        hit_f,
        steps.reshape(N),
        unresolved,
        jnp.sum(n_act),
        n_flagged,
        n_near,
        n_resumed,
        (n_entry, n_graze, n_exit),
        tnear_f,
        model_bits,
        exec_total,
    )


def tile_regroup(x: Array, h: int, w: int, th: int = 8, tw: int = 16) -> Array:
    """Apply `tile_perm`'s row permutation to [N, ...] as reshape+transpose."""
    trail = x.shape[1:]
    nimg = x.shape[0] // (h * w)
    y = x.reshape((nimg, h // th, th, w // tw, tw) + trail)
    y = jnp.moveaxis(y, 2, 3)
    return y.reshape((x.shape[0],) + trail)


def tile_ungroup(x: Array, h: int, w: int, th: int = 8, tw: int = 16) -> Array:
    """Inverse of :func:`tile_regroup`."""
    trail = x.shape[1:]
    nimg = x.shape[0] // (h * w)
    y = x.reshape((nimg, h // th, w // tw, th, tw) + trail)
    y = jnp.moveaxis(y, 3, 2)
    return y.reshape((x.shape[0],) + trail)


def tile_perm(h: int, w: int, n_rays: int, th: int = 8, tw: int = 16):
    """Ray permutation regrouping an (h, w) image into th x tw pixel tiles
    (tile size th*tw == LANES), plus its inverse. n_rays may cover several
    stacked images of h*w rays each."""
    import numpy as _np

    base = (
        _np.arange(h * w)
        .reshape(h // th, th, w // tw, tw)
        .transpose(0, 2, 1, 3)
        .reshape(-1)
    )
    nimg = n_rays // (h * w)
    perm = (base[None, :] + (_np.arange(nimg) * h * w)[:, None]).reshape(-1)
    return perm, _np.argsort(perm)


def plane_sweep_supported(shape: Tuple[int, int, int]) -> bool:
    """True if at least one marching axis fits the band geometry AND the
    slot-pack encoding (see _axis_supported: oversized extents would wrap
    the packed band base and fetch the wrong band)."""
    for a in range(3):
        p = _perm(a)
        if _axis_supported((shape[p[0]], shape[p[1]], shape[p[2]])):
            return True
    return False


def plane_sweep_depth(
    values: Array,
    meta,
    oob_value,
    origins: Array,
    directions: Array,
    t_min: float,
    t_max: float,
    eps: float,
    max_steps: int,
    min_step,
    refine_iters: int = 8,
    interpret: bool | None = None,
    diag: bool = False,
):
    """Plane-sweep forward trace with XLA-march fallback for unresolved
    rays. Same contract as ops.render._trace_depth (depth, hit, steps);
    with diag=True also returns {"unresolved": count, "n_act": total}.

    2-D ray grids (h, w, 3) are regrouped into 16x8-pixel tiles: a 1x128
    scanline diverges to ~180-cell y footprints at 512^3 (band overflow ->
    everything falls back), while a tile's extent shrinks by ~sqrt(aspect)
    and fits the band with margin."""
    from . import render as _render
    from ..grid import SdfGrid

    if interpret is None:
        interpret = jax.default_backend() not in ("tpu", "axon")
    oob_value = jnp.asarray(oob_value, jnp.float32)

    o = jnp.asarray(origins, jnp.float32)
    v = jnp.asarray(directions, jnp.float32)
    batch_shape = o.shape[:-1]
    of = o.reshape(-1, 3)
    vf = v.reshape(-1, 3)
    N = of.shape[0]

    # tile regrouping for image-shaped bundles
    perm = inv_perm = None
    if len(batch_shape) >= 2:
        h, w = batch_shape[-2], batch_shape[-1]
        TH, TW = 8, 16
        if h % TH == 0 and w % TW == 0:
            # apply the tile permutation as a reshape+transpose (XLA
            # transposes run near HBM bandwidth; `x[perm]` lowers to a
            # generic gather — several ms/frame at 1M rays)
            of = tile_regroup(of, h, w)
            vf = tile_regroup(vf, h, w)
            inv_perm = True
    Np = ((N + LANES - 1) // LANES) * LANES
    if Np != N:
        pado = jnp.broadcast_to(
            jnp.asarray([-1e6, -1e6, -1e6], jnp.float32), (Np - N, 3)
        )
        padv = jnp.broadcast_to(
            jnp.asarray([1.0, 0.0, 0.0], jnp.float32), (Np - N, 3)
        )
        of = jnp.concatenate([of, pado], axis=0)
        vf = jnp.concatenate([vf, padv], axis=0)

    (
        depth,
        hit,
        steps,
        unresolved,
        n_act_total,
        n_flagged,
        n_near,
        n_resumed,
        class_counts,
        _tnear_diag,
        _model_diag,
        exec_total,
    ) = _plane_sweep_core(
        values,
        meta.inv_origin_transform,
        meta.resolution,
        of,
        vf,
        float(t_min),
        float(t_max),
        float(eps),
        refine_iters=refine_iters,
        interpret=interpret,
        max_steps=max_steps,
        min_step=min_step,
    )

    # exact-march fallback, executed only when some ray needs it
    def run_fallback(_):
        sdf = SdfGrid(values=values, meta=meta, oob_value=oob_value)
        d, h, st = _render._trace_depth(
            values, sdf, of, vf, t_min, t_max, eps, max_steps, min_step
        )
        return d, h, st

    def no_fallback(_):
        return (
            jnp.zeros_like(depth),
            jnp.zeros_like(hit),
            jnp.zeros_like(steps),
        )

    any_unres = jnp.any(unresolved)
    fb_d, fb_h, fb_s = lax.cond(any_unres, run_fallback, no_fallback, 0)
    depth = jnp.where(unresolved, fb_d, depth)
    hit = jnp.where(unresolved, fb_h, hit)
    steps = jnp.where(unresolved, fb_s, steps)

    if inv_perm is not None:
        h, w = batch_shape[-2], batch_shape[-1]
        depth = tile_ungroup(depth[:N], h, w)
        hit = tile_ungroup(hit[:N], h, w)
        steps = tile_ungroup(steps[:N], h, w)
    out = (
        depth[:N].reshape(batch_shape),
        hit[:N].reshape(batch_shape),
        steps[:N].reshape(batch_shape),
    )
    if diag:
        return out + (
            {
                "unresolved": jnp.sum(unresolved),
                "n_act": n_act_total,
                "n_flagged": n_flagged,
                "n_near_miss": n_near,
                "n_resumed": n_resumed,
                "n_entry": class_counts[0],
                "n_graze": class_counts[1],
                "n_exit": class_counts[2],
                "exec_slabs": exec_total,
            },
        )
    return out
