"""Exact Euclidean distance transform + signed-field extraction, TPU-native.

Replaces the reference's serial bucket-queue brushfire
(``/root/reference/include/sdf_tools/sdf_generation.hpp:95-207``) with an
exact separable EDT:

  * Axis pass 1 (binary seeds): per-line distance-to-nearest-seed via two
    ``lax.cummax`` prefix scans — fully parallel, O(N).
  * Axis passes 2/3 (parabolic lower envelope over already-squared values):
    two interchangeable exact backends:
      - ``"stencil"``: iterated 3-tap min-plus relaxation with odd weights
        1,3,5,... (i^2 = sum of first i odd numbers, so T iterations exactly
        resolve sources up to distance T), run under ``lax.while_loop`` with a
        sound early-exit: values are non-increasing and weights are strictly
        increasing, so one quiescent sweep certifies global convergence.
        Pure vectorized shifts/mins — zero divergence, halo-shardable.
      - ``"scan"``: lockstep-vectorized integer Meijster envelope scan
        (exact O(n) work per line; all-integer arithmetic, no rationals).
      - ``"brute"``: O(n^2) min-plus by broadcasting (tests / tiny grids).

Distances are **exact int32 squared cell distances** (the reference's own
integer-d^2 representation, ``sdf_generation.hpp:87-93``); note the
reference's propagation is NOT exact — it rarely overestimates d^2 (a known
property of vector-propagation EDTs; verified empirically vs brute force).
We compute the true EDT and document the deviation in tests.

Signed combine (``sdf_generation.hpp:242-268``): every voxel is a seed of
exactly one field, so the signed value is ±sqrt(d^2)·resolution: positive in
free space (distance to nearest filled), negative in filled space (distance
to nearest free; hence filled cells are at most -resolution).
"""
from __future__ import annotations

from functools import partial
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
from jax import lax

from ..grid import GridMeta, SdfGrid

Array = jax.Array

# Sentinel for "no seed reachable": large enough to never be beaten by a real
# d^2 (max real = 3n^2), small enough that sentinel + 2n^2 fits int32 for any
# practical n (<= 16384 per axis). Host-side np scalar: a jnp constant here
# would initialize the XLA backend at import, breaking
# jax.distributed.initialize (must run before any backend init).
import numpy as _np

INF_D2 = _np.int32(1 << 29)


# ---------------------------------------------------------------------------
# Axis pass 1: binary line distance via prefix scans
# ---------------------------------------------------------------------------


def line_distance_to_seed(mask: Array, axis: int) -> Array:
    """Distance (in cells, int32) along ``axis`` to the nearest True in ``mask``.

    Cells in lines with no seed get a large sentinel (~INF). Implemented as
    two cummax scans over seed positions — no sequential loops.
    """
    mask = jnp.asarray(mask, bool)
    n = mask.shape[axis]
    shape = [1] * mask.ndim
    shape[axis] = n
    iota = jnp.arange(n, dtype=jnp.int32).reshape(shape)
    NEG = jnp.int32(-(1 << 30))
    POS = jnp.int32(1 << 30)

    # forward: index of most recent seed at or before i
    last_seed = lax.cummax(jnp.where(mask, iota, NEG), axis=axis)
    fwd = iota - last_seed  # >= 0; huge where no seed yet
    # backward: index of next seed at or after i
    next_seed = -lax.cummax(jnp.where(mask, -iota, NEG), axis=axis, reverse=True)
    bwd = next_seed - iota
    d = jnp.minimum(fwd, bwd)
    # lines without any seed produce values near 2^30; clamp to a clean code
    return jnp.minimum(d, jnp.int32(1 << 24)).astype(jnp.int32)


def _line_d2(mask: Array, axis: int) -> Array:
    d = line_distance_to_seed(mask, axis)
    no_seed = d >= jnp.int32(1 << 24)
    return jnp.where(no_seed, INF_D2, d * d).astype(jnp.int32)


# ---------------------------------------------------------------------------
# Parabolic envelope pass backends (exact 1-D transform of already-squared f)
#   out[i] = min_j f[j] + (i-j)^2   along `axis`, batched over the rest.
# ---------------------------------------------------------------------------


def _shift_with_inf(f: Array, axis: int, shift: int) -> Array:
    """Shift ``f`` along ``axis`` by ``shift`` cells, filling with INF."""
    n = f.shape[axis]
    pad_lo = max(shift, 0)
    pad_hi = max(-shift, 0)
    padded = jnp.pad(
        f,
        [(pad_lo, pad_hi) if a == axis else (0, 0) for a in range(f.ndim)],
        constant_values=INF_D2,
    )
    start = [pad_hi if a == axis else 0 for a in range(f.ndim)]
    return lax.dynamic_slice(padded, start, f.shape)


def envelope_pass_stencil(f: Array, axis: int, max_iters: Optional[int] = None) -> Array:
    """Exact envelope via iterated odd-weight 3-tap min-plus with early exit."""
    n = f.shape[axis]
    if n == 1:
        return f
    if max_iters is None:
        max_iters = n - 1

    def cond(state):
        d, t, done = state
        return jnp.logical_and(~done, t <= max_iters)

    def body(state):
        d, t, _ = state
        c = 2 * t - 1  # odd weight at iteration t
        up = _shift_with_inf(d, axis, 1)
        dn = _shift_with_inf(d, axis, -1)
        # saturating add: INF stays INF-ish (INF + c still > any real value)
        cand = jnp.minimum(up, dn) + c
        new_d = jnp.minimum(d, cand)
        done = jnp.all(new_d == d)
        return new_d, t + 1, done

    d0 = jnp.asarray(f, jnp.int32)
    # initial done flag derived from d0 (always False) so its sharding
    # varying-axis type matches the loop body's data-dependent flag under
    # shard_map
    done0 = jnp.all(d0 != d0)
    out, _, _ = lax.while_loop(cond, body, (d0, jnp.int32(1), done0))
    return out


def envelope_pass_brute(f: Array, axis: int) -> Array:
    """O(n^2) exact min-plus by broadcasting (small n only)."""
    n = f.shape[axis]
    if n == 1:
        return f
    fm = jnp.moveaxis(jnp.asarray(f, jnp.int32), axis, -1)  # [..., n]
    i = jnp.arange(n, dtype=jnp.int32)
    quad = (i[:, None] - i[None, :]) ** 2  # [n_i, n_j]
    out = jnp.min(fm[..., None, :] + quad, axis=-1)
    return jnp.moveaxis(out, -1, axis)


def envelope_pass_scan(f: Array, axis: int) -> Array:
    """Exact envelope via lockstep-vectorized integer Meijster scan.

    Per line: forward scan builds the stack of candidate parabolas (s = apex
    positions, t = integer takeover boundaries); backward scan evaluates.
    All lines are processed in lockstep with masked pops; all arithmetic is
    int32 (valid for n up to ~16k with the INF_D2 sentinel).
    """
    n = f.shape[axis]
    if n == 1:
        return f
    fm = jnp.moveaxis(jnp.asarray(f, jnp.int32), axis, -1)
    batch_shape = fm.shape[:-1]
    B = 1
    for s in batch_shape:
        B *= s
    fb = fm.reshape(B, n)

    def F(x, i, fi):
        d = x - i
        return d * d + fi

    def gather(arr, idx):
        return jnp.take_along_axis(arr, idx[:, None], axis=1)[:, 0]

    rows = jnp.arange(B)

    def fwd_step(carry, u):
        s, t, q, fs = carry
        # fs: f[s[q]] cached per stack slot to avoid re-gathering f
        fu = fb[:, u]

        # pop while F(t[q], s[q]) > F(t[q], u)
        def pop_cond(st):
            s_, t_, q_, fs_, _ = st
            qc = jnp.maximum(q_, 0)
            tq = gather(t_, qc)
            sq = gather(s_, qc)
            fsq = gather(fs_, qc)
            bad = (q_ >= 0) & (F(tq, sq, fsq) > F(tq, u, fu))
            return jnp.any(bad)

        def pop_body(st):
            s_, t_, q_, fs_, _ = st
            qc = jnp.maximum(q_, 0)
            tq = gather(t_, qc)
            sq = gather(s_, qc)
            fsq = gather(fs_, qc)
            bad = (q_ >= 0) & (F(tq, sq, fsq) > F(tq, u, fu))
            return s_, t_, jnp.where(bad, q_ - 1, q_), fs_, jnp.array(0)

        s, t, q, fs, _ = lax.while_loop(
            pop_cond, pop_body, (s, t, q, fs, jnp.array(0))
        )

        revived = q < 0
        qc = jnp.maximum(q, 0)
        sq = gather(s, qc)
        fsq = gather(fs, qc)
        # integer Sep (floor division; operands fit int32):
        #   Sep(i,u) = (u^2 - i^2 + f[u] - f[i]) // (2(u-i))
        den = 2 * (u - sq)
        den = jnp.maximum(den, 1)  # masked when revived
        w = 1 + (u * u - sq * sq + fu - fsq) // den
        push = (~revived) & (w < n)
        new_q = jnp.where(revived, 0, jnp.where(push, q + 1, q))
        write = revived | push
        wq = jnp.where(write, new_q, n)  # out-of-range -> dropped by scatter mode
        s = s.at[rows, wq].set(jnp.where(write, u, 0), mode="drop")
        fs = fs.at[rows, wq].set(jnp.where(write, fu, 0), mode="drop")
        t = t.at[rows, wq].set(jnp.where(revived, 0, w), mode="drop")
        return (s, t, new_q, fs), None

    s0 = jnp.zeros((B, n), jnp.int32)
    t0 = jnp.zeros((B, n), jnp.int32)
    fs0 = jnp.zeros((B, n), jnp.int32).at[:, 0].set(fb[:, 0])
    q0 = jnp.zeros((B,), jnp.int32)
    (s, t, q, fs), _ = lax.scan(
        fwd_step, (s0, t0, q0, fs0), jnp.arange(1, n, dtype=jnp.int32)
    )

    def bwd_step(carry, u):
        q_ = carry
        sq = gather(s, q_)
        fsq = gather(fs, q_)
        d = F(u, sq, fsq)
        tq = gather(t, q_)
        q_ = jnp.where((u == tq) & (q_ > 0), q_ - 1, q_)
        return q_, d

    _, ds = lax.scan(bwd_step, q, jnp.arange(n - 1, -1, -1, dtype=jnp.int32))
    out = jnp.flip(ds.T, axis=1)  # [B, n]
    out = jnp.minimum(out, INF_D2 + jnp.int32(2 * n * n))
    return jnp.moveaxis(out.reshape(batch_shape + (n,)), -1, axis)


def _envelope_pass_pallas(f: Array, axis: int) -> Array:
    """Pallas VMEM-resident kernel (see edt_pallas.py); interpreted off-TPU."""
    from . import edt_pallas

    interpret = jax.default_backend() not in ("tpu", "axon")
    return edt_pallas.envelope_pass_pallas(f, axis, interpret=interpret)


def _line_d2_pallas(mask: Array) -> Array:
    from . import edt_pallas

    interpret = jax.default_backend() not in ("tpu", "axon")
    return edt_pallas.line_pass_pallas(mask, interpret=interpret)


def _envelope_pass_cht(f: Array, axis: int) -> Array:
    """Monotone convex-hull-trick kernel (see edt_cht.py): O(K) work per
    cell instead of the relaxation's O(max winning distance); exact, with
    per-block fallback to the relaxation on register-hull overflow."""
    from . import edt_cht

    return edt_cht.envelope_pass_cht(f, axis)


_ENVELOPE_BACKENDS = {
    "stencil": envelope_pass_stencil,
    "brute": envelope_pass_brute,
    "scan": envelope_pass_scan,
    "pallas": _envelope_pass_pallas,
    "cht": _envelope_pass_cht,
}


def resolve_backend(backend: str) -> str:
    """"auto" -> the Pallas kernels on TPU, the XLA stencil elsewhere."""
    if backend != "auto":
        return backend
    return "pallas" if jax.default_backend() in ("tpu", "axon") else "stencil"


# Grids below this cell count run the XLA stencil even when the pallas
# backend is selected: tiny/degenerate blocks (e.g. (8,40,1) -> a 1-sublane
# 40-lane block, or (5,7,9) full-axis odd dims) have crashed the Mosaic
# compiler or the TPU runtime on real hardware (round 5, measured — the
# interpret-mode tests can't see it), and at this size the stencil runs in
# microseconds anyway. Results are bit-identical (both are exact).
_PALLAS_MIN_CELLS = 32768


def _effective_backend(backend: str, mask) -> str:
    backend = resolve_backend(backend)
    if (
        backend == "pallas"
        and mask.size < _PALLAS_MIN_CELLS
        and jax.default_backend() in ("tpu", "axon")
    ):
        # real Mosaic only: interpret mode handles every shape and stays on
        # the pallas path so CPU tests keep exercising the kernels
        return "stencil"
    return backend


# ---------------------------------------------------------------------------
# Full squared EDT and signed-field extraction
# ---------------------------------------------------------------------------


def squared_edt(seed_mask: Array, backend: str = "auto") -> Array:
    """Exact int32 squared Euclidean cell distances to the True set of ``seed_mask``.

    Equivalent to the d^2 field of the reference's BuildDistanceField
    (``sdf_generation.hpp:95``) except exact (see module docstring). Values
    >= INF_D2 mean "no seed exists anywhere".

    ``backend="reference"`` is the STRICT-PARITY option: it runs the native
    re-implementation of the reference's bucket-queue propagation
    (``sdf_generation.hpp:95-207``; ``native/sdf_native.cpp:136``) on the
    host and reproduces the reference's outputs bit-for-bit INCLUDING its
    rare overestimates (docs/NOTES.md §2, quantified in docs/RESULTS.md).
    Host-offloaded: not jittable, for users who need bit-identical-to-
    upstream fields.
    """
    if backend == "reference":
        import numpy as np

        from .. import native

        mask_np = np.asarray(seed_mask, bool)
        if mask_np.ndim != 3:
            raise ValueError(f"expected 3D mask, got shape {mask_np.shape}")
        d2 = native.edt_reference(mask_np)
        # the reference leaves unreachable cells at the max-bucket ceiling;
        # map "no seed anywhere" to our INF sentinel for combine parity
        if not mask_np.any():
            return jnp.full(mask_np.shape, INF_D2, jnp.int32)
        return jnp.asarray(np.minimum(d2, int(INF_D2)).astype(np.int32))
    mask = jnp.asarray(seed_mask, bool)
    if mask.ndim != 3:
        raise ValueError(f"expected 3D mask, got shape {mask.shape}")
    backend = _effective_backend(backend, mask)
    env = _ENVELOPE_BACKENDS[backend]
    # pass 1 along the axis with the largest extent is not required for
    # correctness; axis 0 keeps things simple.
    if backend == "pallas":
        f = _line_d2_pallas(mask)
    else:
        f = _line_d2(mask, 0)
    f = env(f, 1)
    f = env(f, 2)
    return f


def squared_edt_both(filled_mask: Array, backend: str = "auto") -> Tuple[Array, Array]:
    """(d2_filled, d2_free): squared EDTs to the True set and to the False
    set of ``filled_mask`` — the two fields of the reference's signed
    extraction (``sdf_generation.hpp:242-268``).

    On the pallas backend the two fields run FUSED: one dual line pass
    (mask read once, both seeds from the same latency-bound sweeps) and one
    dual envelope kernel per axis (shared launch/grid/DMA pipeline; the
    free field's standalone pass is overhead-bound, NOTES §15). Bit-
    identical to two `squared_edt` calls; other backends fall back to
    exactly that.
    """
    mask = jnp.asarray(filled_mask, bool)
    if mask.ndim != 3:
        return squared_edt(mask, backend), squared_edt(~mask, backend)
    backend = _effective_backend(backend, mask)
    if backend != "pallas":
        return squared_edt(mask, backend), squared_edt(~mask, backend)
    from . import edt_pallas

    interpret = jax.default_backend() not in ("tpu", "axon")
    fa, fb = edt_pallas.line_pass_dual_pallas(mask, interpret=interpret)
    fa, fb = edt_pallas.envelope_dual_pallas(fa, fb, 1, interpret=interpret)
    fa, fb = edt_pallas.envelope_dual_pallas(fa, fb, 2, interpret=interpret)
    return fa, fb


def d2_to_distance(d2: Array, resolution: Array, dtype=jnp.float32) -> Array:
    """sqrt(d^2) * resolution with the INF sentinel mapped to +inf."""
    v = jnp.where(d2 >= INF_D2, jnp.inf, d2.astype(dtype))
    return jnp.sqrt(v) * jnp.asarray(resolution, dtype)


def signed_field_from_masks(
    filled_mask: Array, resolution: Array, backend: str = "auto", dtype=jnp.float32
) -> Tuple[Array, Array, Array]:
    """Two-field signed distance values (reference sdf_generation.hpp:242-268).

    Returns (sdf_values, max_distance, min_distance); value semantics match
    the reference: positive in free space, negative (<= -res) inside filled.
    """
    filled_mask = jnp.asarray(filled_mask, bool)
    if (
        filled_mask.ndim == 3
        and dtype == jnp.float32
        and jnp.ndim(resolution) == 0
        and _effective_backend(backend, filled_mask) == "pallas"
    ):
        # fully fused pallas route: dual line pass -> dual y envelope ->
        # dual z envelope WITH the combine as kernel epilogue (one f32
        # write instead of two i32 writes + a separate combine pass);
        # bitwise identical to the unfused math (NOTES §17)
        from . import edt_pallas

        interpret = jax.default_backend() not in ("tpu", "axon")
        fa, fb = edt_pallas.line_pass_dual_pallas(
            filled_mask, interpret=interpret
        )
        fa, fb = edt_pallas.envelope_dual_pallas(fa, fb, 1, interpret=interpret)
        dist = edt_pallas.envelope_dual_combine_pallas(
            fa, fb, resolution, interpret=interpret
        )
        return dist, jnp.max(dist), jnp.min(dist)
    d2_filled, d2_free = squared_edt_both(filled_mask, backend=backend)
    dist = d2_to_distance(d2_filled, resolution, dtype) - d2_to_distance(
        d2_free, resolution, dtype
    )
    return dist, jnp.max(dist), jnp.min(dist)


def signed_field_lowmem(filled_mask, resolution, backend: str = "auto") -> Array:
    """Memory-lean signed field for volumes near the HBM limit (e.g. 1024^3
    on one 16 GB chip, ~1.07e9 voxels).

    Host-orchestrated sequencing: each stage runs as its own jit call so XLA
    frees the 4 GB intermediates between stages (the fused version keeps
    both d^2 fields + combine temps live and exhausts HBM). Peak usage is
    one d^2 field + one partial float field (~9 GB at 1024^3).
    """
    mask = jnp.asarray(filled_mask, bool)
    edt_fn = jax.jit(partial(squared_edt, backend=backend))
    conv = jax.jit(lambda d2, r: d2_to_distance(d2, r))
    res = jnp.asarray(resolution, jnp.float32)

    d2f = edt_fn(mask)
    part = conv(d2f, res)
    del d2f
    d2e = edt_fn(~mask)
    neg = conv(d2e, res)
    del d2e
    return jax.jit(lambda a, b: a - b)(part, neg)


def _slab_summaries(mask: Array, n_slabs: int):
    """Per-slab line summaries along axis 0: distance from each slab boundary
    to its nearest in-slab seed per (y, z) line. Same decomposition as
    parallel/sharded.py's boundary-summary collective, run sequentially."""
    nx = mask.shape[0]
    sl = nx // n_slabs
    SENT = jnp.int32(1 << 24)

    @jax.jit
    def summarize(slab):
        n_local = slab.shape[0]
        iota = jnp.arange(n_local, dtype=jnp.int32)[:, None, None]
        first = jnp.min(jnp.where(slab, iota, SENT), axis=0)
        last = jnp.max(jnp.where(slab, iota, -SENT), axis=0)
        low = jnp.where(first >= SENT, SENT, first)
        high = jnp.where(last <= -SENT, SENT, n_local - 1 - last)
        return low, high

    lows, highs = [], []
    for i in range(n_slabs):
        lo, hi = summarize(mask[i * sl : (i + 1) * sl])
        lows.append(lo)
        highs.append(hi)
    return jnp.stack(lows), jnp.stack(highs), sl, SENT


def squared_edt_slabbed(
    seed_mask: Array, n_slabs: int = 2, backend: str = "auto"
):
    """Exact squared EDT computed slab-by-slab along x (HBM-limit volumes).

    Exactness: the x line pass decomposes across slabs via per-line boundary
    summaries (distance from each slab edge to its nearest in-slab seed);
    the y/z envelope passes never cross x, so each slab is independent given
    the summaries. Yields each slab's d^2 in sequence (host assembles or
    consumes them streaming); peak device memory is one slab's working set.
    """
    backend = resolve_backend(backend)
    mask = jnp.asarray(seed_mask, bool)
    if mask.shape[0] % n_slabs != 0:
        raise ValueError(
            f"shape[0]={mask.shape[0]} must be divisible by n_slabs={n_slabs}"
            " (the cross-slab distance decomposition assumes uniform slabs)"
        )
    lows, highs, sl, SENT = _slab_summaries(mask, n_slabs)
    env = _ENVELOPE_BACKENDS[backend]

    @jax.jit
    def slab_d2(slab, idx, lows, highs):
        n_local = slab.shape[0]
        if backend == "pallas":
            f_local = _line_d2_pallas(slab)
            # round, not truncate: above ~4096 cells d^2 is not exactly
            # representable in f32 and a truncated sqrt can come out one short
            d_local = jnp.where(
                f_local >= INF_D2,
                SENT,
                jnp.round(jnp.sqrt(f_local.astype(jnp.float32))).astype(jnp.int32),
            )
        else:
            d_local = jnp.minimum(line_distance_to_seed(slab, 0), SENT)
        sh = jnp.arange(lows.shape[0], dtype=jnp.int32)[:, None, None]
        below = jnp.where(sh < idx, (idx - sh - 1) * n_local + highs + 1, SENT)
        best_below = jnp.min(below, axis=0)
        above = jnp.where(sh > idx, (sh - idx - 1) * n_local + lows + 1, SENT)
        best_above = jnp.min(above, axis=0)
        iota = jnp.arange(n_local, dtype=jnp.int32)[:, None, None]
        d = jnp.minimum(d_local, jnp.minimum(best_below[None] + iota, best_above[None] + (n_local - 1 - iota)))
        d = jnp.minimum(d, SENT)
        f = jnp.where(d >= SENT, INF_D2, d * d).astype(jnp.int32)
        f = env(f, 1)
        f = env(f, 2)
        return f

    for i in range(n_slabs):
        yield slab_d2(mask[i * sl : (i + 1) * sl], jnp.int32(i), lows, highs)


def signed_field_slabbed(
    filled_mask, resolution, n_slabs: int = 4, backend: str = "auto",
    prefetch: int = 2,
) -> "np.ndarray":
    """Exact signed field for volumes beyond single-shot HBM capacity
    (1024^3 = 1.07e9 voxels on one 16 GB chip). Streams slab results to
    host memory.

    Device->host copies are issued with ``copy_to_host_async`` and drained
    through a ``prefetch``-deep window, so slab i+1's compute overlaps slab
    i's transfer (the blocking per-slab fetch serialized compute behind
    transfer and dominated the 1024^3 wall time). Device peak = one slab of
    each d^2 field + ``prefetch`` float slabs in flight.
    """
    import numpy as np

    mask = jnp.asarray(filled_mask, bool)
    if mask.shape[0] % n_slabs != 0:
        raise ValueError(
            f"shape[0]={mask.shape[0]} must be divisible by n_slabs={n_slabs}"
        )
    res = jnp.asarray(resolution, jnp.float32)
    combine = jax.jit(
        lambda a, b, r: d2_to_distance(a, r) - d2_to_distance(b, r)
    )
    out = np.empty(mask.shape, np.float32)
    sl = mask.shape[0] // n_slabs
    fill_iter = squared_edt_slabbed(mask, n_slabs, backend)
    free_iter = squared_edt_slabbed(~mask, n_slabs, backend)
    in_flight = []

    def drain_one():
        j, v = in_flight.pop(0)
        out[j * sl : (j + 1) * sl] = np.asarray(v)

    for i, (d2f, d2e) in enumerate(zip(fill_iter, free_iter)):
        vals = combine(d2f, d2e, res)
        try:
            vals.copy_to_host_async()
        except AttributeError:  # interpret/older runtimes: fetch will block
            pass
        in_flight.append((i, vals))
        if len(in_flight) > max(prefetch, 1):
            drain_one()
    while in_flight:
        drain_one()
    return out


def _virtual_border_masks(filled_mask: Array) -> Tuple[Array, Array, Tuple[slice, ...]]:
    """Enlarged masks for the virtual-border variant (sdf_generation.hpp:289-379)."""
    shape = filled_mask.shape
    offs = tuple(2 if s > 1 else 0 for s in shape)
    qoffs = tuple(1 if s > 1 else 0 for s in shape)
    big = jnp.pad(
        filled_mask,
        [(q, o - q) for q, o in zip(qoffs, offs)],
        constant_values=False,
    )
    border = jnp.zeros(big.shape, bool)
    for ax, o in enumerate(offs):
        if o > 0:
            idx_lo = [slice(None)] * 3
            idx_hi = [slice(None)] * 3
            idx_lo[ax] = 0
            idx_hi[ax] = big.shape[ax] - 1
            border = border.at[tuple(idx_lo)].set(True)
            border = border.at[tuple(idx_hi)].set(True)
    inner = tuple(slice(q, q + s) for q, s in zip(qoffs, shape))
    free_variant = big | border  # border pretended filled
    filled_variant = big & ~border  # border pretended empty
    return free_variant, filled_variant, inner


def signed_field_virtual_border(
    filled_mask: Array, resolution: Array, backend: str = "auto", dtype=jnp.float32
) -> Tuple[Array, Array, Array]:
    """Virtual-border signed field (reference sdf_generation.hpp:273-420).

    Grows the grid by one cell per side (per axis with >1 cells), computes a
    "free" SDF with the border pretended filled and a "filled" SDF with the
    border pretended empty, then combines: free value if >= 0, else filled
    value if <= -0, else 0. Extrema = (free max, filled min) over the
    enlarged grids, matching the reference.
    """
    free_variant, filled_variant, inner = _virtual_border_masks(
        jnp.asarray(filled_mask, bool)
    )
    free_sdf, free_max, _ = signed_field_from_masks(
        free_variant, resolution, backend, dtype
    )
    filled_sdf, _, filled_min = signed_field_from_masks(
        filled_variant, resolution, backend, dtype
    )
    fs = free_sdf[inner]
    bs = filled_sdf[inner]
    combined = jnp.where(fs >= 0.0, fs, jnp.where(bs <= -0.0, bs, jnp.zeros_like(fs)))
    return combined, free_max, filled_min


def extract_signed_distance_field(
    filled_mask: Array,
    meta: GridMeta,
    oob_value=jnp.inf,
    add_virtual_border: bool = False,
    backend: str = "auto",
) -> Tuple[SdfGrid, Tuple[Array, Array]]:
    """Build an SdfGrid from a filled-voxel mask.

    TPU-native equivalent of the reference's primary entry point
    ``CollisionMapGrid::ExtractSignedDistanceField``
    (``/root/reference/include/sdf_tools/collision_map.hpp:680-712`` ->
    ``sdf_generation.hpp:274``). Returns (sdf, (max_distance, min_distance)).
    """
    if add_virtual_border:
        values, mx, mn = signed_field_virtual_border(
            filled_mask, meta.resolution, backend
        )
    else:
        values, mx, mn = signed_field_from_masks(filled_mask, meta.resolution, backend)
    return SdfGrid.create(values, meta, oob_value), (mx, mn)
