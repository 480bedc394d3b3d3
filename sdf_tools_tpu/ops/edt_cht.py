"""O(K)-work exact envelope pass via the monotone convex-hull trick (Pallas).

The envelope pass  out[i] = min_j f[j] + (i-j)^2  (reference semantics:
``/root/reference/include/sdf_tools/sdf_generation.hpp:95-268`` computes the
same d^2 field by serial bucket-queue propagation) has the Legendre form

    out[i] = i^2 - max_j (2 i j - g[j]),      g[j] = f[j] + j^2

— a maximum over LINES y(x) = (2j) x - g[j] whose slopes arrive in strictly
increasing order while the query point x = i also moves right: the textbook
*monotone convex-hull trick*. Work is O(hull ops) per cell instead of the
odd-weight relaxation's O(max winning distance) per cell (ops/edt_pallas.py,
~164 iterations x 7 ops on the 512^3 bench scene).

Why this maps to TPU when Felzenszwalb/Meijster/PBA do not (NOTES §4, §10):
those need per-lane dynamic indexing into per-line stacks — unavailable on
the VPU. Here the hull lives in K *fixed register slots* per lane
(Python-unrolled arrays), manipulated only by per-slot selects:

  * top-aligned stack: slot K-1 = most recent surviving line; an insert
    shifts everything down one slot (uniform select cascade, no dynamic
    positions); slopes are inserted in increasing order so slot order is
    maintained for free.
  * SLOPPY SINGLE POP: per step we pop at most the top slot. Soundness: if
    the pop test x*(C,S) <= x*(T,S) holds for top T with ANY below-line S
    (hull-canonical or not), then for every x >= x*(T,S), v_C(x) >= v_T(x)
    (at x*(T,S): v_T = v_S <= v_C since C overtook S earlier; beyond, C's
    larger slope keeps it ahead), and for x < x*(T,S), v_S(x) >= v_T(x).
    Both witnesses S and C stay in the stack, so max over slots at every
    current-or-future query x is unchanged. Deeper dominated lines linger
    and are evicted off the bottom by later inserts.
  * evaluation = max over ALL slots (dominated/stale lines can never exceed
    the max, so no canonical hull is needed for correctness).
  * OVERFLOW: when an insert pushes the bottom slot off while that line is
    the current maximum (smallest slope => if not winning now it never
    will; if winning now, dropping it could corrupt a future value), the
    lane flags its block. Flagged blocks are recomputed exactly with the
    odd-weight relaxation (ops/edt_pallas.py) — correctness never depends
    on K.

Numerics: all slot state is f32 with *exact* integer arithmetic — for
n <= 1024, every intercept/eval value stays below 2^24 (inputs are d^2
intermediates <= 2 n^2 by the pass contract; outputs <= 3 n^2). Only the pop
test multiplies to ~24 n^3 > 2^24; it is made conservative with a margin
covering the worst f32 product error (a skipped pop merely wastes a slot; it
never changes the max). Sentinel slots are genuine lines y = 0*x - 8 n^2
lying strictly below every real line on [0, n) (real values >= -3 n^2), so
all stack rules apply to them uniformly; outputs produced by a sentinel
"winner" exceed 3 n^2 (impossible for a real source) and are clamped to
INF_D2, preserving the no-source code.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

INF_D2 = 1 << 29  # python int (matches ops/edt.py)

# Per-block input byte budget (in+out double-buffered + ~18 state slices).
_BLOCK_BYTES = 2 * 1024 * 1024


def _out_struct(x, shape, dtype):
    """Carry shard_map varying-manual-axes type (see edt_pallas._out_struct)."""
    try:
        vma = jax.typeof(x).vma
    except Exception:
        vma = None
    if vma:
        return jax.ShapeDtypeStruct(shape, dtype, vma=vma)
    return jax.ShapeDtypeStruct(shape, dtype)


def _cht_scan(read_f, write_out, n: int, K: int, margin: float, shape2d):
    """Run forward (left-envelope) + backward (right-envelope) CHT scans.

    read_f(u) -> [rows, lanes] int32 slice of f at scan position u.
    write_out(u, val_f32, first) stores min-combined output (first=True on
    the forward pass overwrites, else min-combines).
    Returns the per-lane overflow mask [rows, lanes] bool.
    """
    INF_F = float(INF_D2)
    # Constants sized for the GLOBAL max dimension (1024), not the scan
    # length: input f comes from passes over OTHER axes, so f <= 2*1024^2
    # by the pipeline contract regardless of this axis's n.
    NEG_B = -8.0 * 1024 * 1024  # sentinel: below any real line on [0, n)
    CLAMP = 3.0 * 1024 * 1024 + 1024.0  # real outputs <= 3*Nmax^2

    def step(x_idx, fx, state):
        """One CHT step at frame coordinate x (int32 scalar), candidate f=fx.

        state = (m[K] list, b[K] list, of) with m/b f32 [rows, lanes].
        Returns (state', out_val f32 [rows, lanes]).
        """
        ms, bs, of = state
        xf = x_idx.astype(jnp.float32)
        fxf = fx.astype(jnp.float32)
        valid = fx < INF_D2
        mc = 2.0 * xf  # scalar
        bc = -(fxf + xf * xf)
        vc = jnp.where(valid, mc * xf + bc, jnp.float32(NEG_B))

        # slot values at x
        vs = [ms[t] * xf + bs[t] for t in range(K)]

        # sloppy single pop-check: top T = slot K-1, witness S = slot K-2
        d1 = bc - bs[K - 2]
        d2 = ms[K - 1] - ms[K - 2]
        d3 = bs[K - 1] - bs[K - 2]
        d4 = mc - ms[K - 2]
        # x*(C,S) <= x*(T,S)  <=>  (bc-bS)(mT-mS) >= (bT-bS)(mc-mS)
        # (cross-multiplying flips the inequality: both (mC-mS), (mT-mS) > 0
        # for real lines and the numerators carry the minus signs).
        # Conservative by `margin`: an f32-uncertain pop becomes a push,
        # which is always sound.
        bad = d1 * d2 >= d3 * d4 + margin
        pop_ins = valid & bad  # replace top with C
        push_ins = valid & jnp.logical_not(bad)  # shift down, C on top

        # overflow: pushing off an alive REAL bottom line (alive <=> it is
        # the max now; smallest slope => never wins later if not winning
        # now). Sentinel bottoms (b == NEG_B; real b >= -3 n^2) are free.
        vmax = vs[0]
        for t in range(1, K):
            vmax = jnp.maximum(vmax, vs[t])
        alive0 = (vs[0] >= vmax) & (bs[0] > NEG_B + 0.5)
        # carried as f32 0/1: Mosaic cannot legalize bool arrays in loop
        # carries (measured: "failed to legalize scf.for")
        of = jnp.maximum(of, jnp.where(push_ins & alive0, 1.0, 0.0))

        # slot updates (uniform select cascades; no dynamic positions)
        new_ms = [jnp.where(push_ins, ms[t + 1], ms[t]) for t in range(K - 1)]
        new_bs = [jnp.where(push_ins, bs[t + 1], bs[t]) for t in range(K - 1)]
        ins = pop_ins | push_ins
        new_ms.append(jnp.where(ins, mc, ms[K - 1]))
        new_bs.append(jnp.where(ins, bc, bs[K - 1]))

        out_val = xf * xf - jnp.maximum(vmax, vc)
        # a sentinel "winner" means no real source reached this cell
        out_val = jnp.where(out_val > CLAMP, jnp.float32(INF_F), out_val)
        return (new_ms, new_bs, of), out_val

    def init_state():
        z = jnp.zeros(shape2d, jnp.float32)
        ms = [z for _ in range(K)]
        bs = [z + jnp.float32(NEG_B) for _ in range(K)]
        of = jnp.zeros(shape2d, jnp.float32)
        return ms, bs, of

    def fwd_body(u, carry):
        state = carry
        fx = read_f(u)
        state, out_val = step(u, fx, state)
        write_out(u, out_val, True)
        return state

    _, _, of_f = lax.fori_loop(0, n, fwd_body, init_state())

    def bwd_body(t, carry):
        state = carry
        u = n - 1 - t
        fx = read_f(u)
        state, out_val = step(t, fx, state)
        write_out(u, out_val, False)
        return state

    _, _, of_b = lax.fori_loop(0, n, bwd_body, init_state())
    return (of_f + of_b) > 0.0


def _cht_kernel(axis: int, n: int, K: int, margin: float, d_ref, out_ref, of_ref):
    """Block kernel: exact envelope along `axis` (0=leading, 1=middle) of the
    block; of_ref[0,0] = 1 if any lane overflowed K slots (host falls back)."""
    if axis == 0:
        shape2d = d_ref.shape[1:]

        def read_f(u):
            return d_ref[u]

        def write_out(u, val, first):
            v = val.astype(jnp.int32)
            if not first:
                v = jnp.minimum(out_ref[u], v)
            out_ref[u] = v

    else:
        shape2d = (d_ref.shape[0], d_ref.shape[2])

        def read_f(u):
            return d_ref[:, u, :]

        def write_out(u, val, first):
            v = val.astype(jnp.int32)
            if not first:
                v = jnp.minimum(out_ref[:, u, :], v)
            out_ref[:, u, :] = v

    of = _cht_scan(read_f, write_out, n, K, margin, shape2d)
    of_ref[pl.program_id(0), pl.program_id(1)] = jnp.any(of).astype(jnp.int32)


def _pick_tile(total: int, target: int) -> int:
    t = max(1, min(target, total))
    while total % t != 0:
        t -= 1
    return t


def _tiles_for(X: int, Y: int, Z: int):
    zt = 128 if Z % 128 == 0 else Z
    xt = _pick_tile(X, max(1, _BLOCK_BYTES // (Y * zt * 4)))
    return xt, zt


@functools.partial(jax.jit, static_argnames=("K", "interpret"))
def _envelope_cht_axis1(f: jax.Array, K: int = 8, interpret: bool = False):
    """Exact envelope along axis 1 of [X, Y, Z] via the CHT kernel.

    Returns (out int32 [X, Y, Z], overflow flags int32 [gx, gz] per block).
    """
    X, Y, Z = f.shape
    n = Y
    if n > 1024:
        raise ValueError("CHT kernel requires n <= 1024 for f32 exactness")
    # worst pop-test product: |bc - bS| * |slope diff| <= 11*Nmax^2 * 2n
    # (Nmax = 1024; see _cht_scan constants); two products, one rounding
    # each at 2^-24 relative error
    margin = 2.0 * max(1.0, (2.0 * 11.0 * 1024**2 * 2 * n) / 2**24)
    xt, zt = _tiles_for(X, Y, Z)
    grid = (X // xt, Z // zt)
    block = (xt, Y, zt)
    index_map = lambda i, j: (i, 0, j)
    kernel = functools.partial(_cht_kernel, 1, n, K, margin)
    vmem_bytes = min(110 * 1024 * 1024, 6 * xt * Y * zt * 4 + (4 * K + 8) * xt * zt * 4)
    out, of = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[pl.BlockSpec(block, index_map, memory_space=pltpu.VMEM)],
        out_specs=[
            pl.BlockSpec(block, index_map, memory_space=pltpu.VMEM),
            # whole flags array as one SMEM block; the (sequential) grid
            # programs each write their own [program_id] element
            pl.BlockSpec(grid, lambda i, j: (0, 0), memory_space=pltpu.SMEM),
        ],
        out_shape=[
            _out_struct(f, f.shape, jnp.int32),
            _out_struct(f, grid, jnp.int32),
        ],
        compiler_params=pltpu.CompilerParams(vmem_limit_bytes=vmem_bytes),
        interpret=interpret,
    )(f)
    return out, of


def envelope_pass_cht(
    f: jax.Array, axis: int, K: int = 8, interpret: bool | None = None
) -> jax.Array:
    """Exact envelope along `axis` (1 or 2) of a 3D int32 array, CHT kernel
    with automatic per-block fallback to the odd-weight relaxation on slot
    overflow (exactness never depends on K).

    axis=2 runs as axis=1 of the (0, 2, 1)-transposed volume: the scan must
    not run along the lane (minor) dimension. The two extra transposes cost
    ~2 HBM round trips — small next to the envelope pass itself.
    """
    from . import edt_pallas

    if interpret is None:
        interpret = jax.default_backend() not in ("tpu", "axon")
    X, Y, Z = f.shape
    if f.shape[axis] == 1:
        return f
    if axis == 2:
        out = envelope_pass_cht(jnp.transpose(f, (0, 2, 1)), 1, K, interpret)
        return jnp.transpose(out, (0, 2, 1))
    if axis != 1:
        raise ValueError("envelope_pass_cht supports axis 1 or 2")
    if Y < 2 or (Z == 1):
        # degenerate layouts: reuse the relaxation kernels' 2D handling
        return edt_pallas.envelope_pass_pallas(f, axis, interpret=interpret)

    out, of = _envelope_cht_axis1(f, K=K, interpret=interpret)
    xt, zt = _tiles_for(X, Y, Z)

    def with_fallback(_):
        full = edt_pallas.envelope_pass_pallas(f, 1, interpret=interpret)
        mask = jnp.repeat(jnp.repeat(of > 0, xt, axis=0), zt, axis=1)
        return jnp.where(mask[:, None, :], full, out)

    return lax.cond(jnp.any(of > 0), with_fallback, lambda _: out, 0)
