"""Multi-device volume sharding for the EDT and render pipeline.

The reference is single-process/single-thread (SURVEY.md §2: no parallelism
of any kind); this module is the new first-class scaling layer mandated by
BASELINE.json: the voxel volume is tiled over a ``jax.sharding.Mesh`` and the
separable EDT runs with collectives between per-axis sweeps.

Two exact strategies (SURVEY.md §7 asks to measure both):
  * ``sharded_squared_edt`` (boundary-summary method, default): the volume is
    sharded on the x axis and the pass ORDER is chosen so the sharded axis
    runs the *binary* line pass: its cross-shard influence reduces to two
    scalars per line per shard (distance from each shard boundary to its
    nearest local seed), resolved with one tiny ``all_gather`` —
    communication is O(surface), independent of volume AND iteration count.
    The parabolic envelope passes then run along the unsharded y/z axes,
    which are entirely local. Exact by construction.
  * ``sharded_envelope_axis0_halo`` (halo method): runs the odd-weight
    relaxation along the sharded axis with a K-cell halo exchanged via
    ``ppermute`` every K iterations. Traffic scales with iteration count /
    K. Provided for measurement and for future 2-D meshes where two of the
    three axes are sharded.

All functions are written to run inside ``shard_map`` over a mesh axis named
``"x"`` (optionally nested under a data-parallel axis).
"""
from __future__ import annotations

from functools import partial
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax
from jax.sharding import Mesh, PartitionSpec as P

from ..ops import edt

Array = jax.Array


def make_mesh(axis_sizes: dict[str, int], devices=None) -> Mesh:
    """Build a mesh from {axis_name: size}; sizes must multiply to #devices."""
    if devices is None:
        devices = jax.devices()
    names = tuple(axis_sizes.keys())
    sizes = tuple(axis_sizes.values())
    total = int(np.prod(sizes))
    if total > len(devices):
        raise ValueError(f"need {total} devices, have {len(devices)}")
    dev = np.asarray(devices[:total]).reshape(sizes)
    return Mesh(dev, names)


# ---------------------------------------------------------------------------
# Inside-shard_map building blocks (axis name "x" shards array axis 0)
# ---------------------------------------------------------------------------


def _local_line_d2_sharded_axis0(mask_local: Array, axis_name: str) -> Array:
    """Binary line-distance pass along the SHARDED axis 0.

    Each shard computes distance to its local nearest seed with the cummax
    trick, then the cross-shard influence is resolved by exchanging, per
    line, the distance-to-nearest-seed measured from each shard boundary.
    Implemented as: compute global via transpose-free two-scan over shards
    using associative prefix mins through ``lax.all_gather`` of per-shard
    line summaries (cheap: 2 scalars per line per shard).
    """
    n_local = mask_local.shape[0]
    idx = lax.axis_index(axis_name)
    # local pass
    d_local = edt.line_distance_to_seed(mask_local, 0)  # int32, sentinel ~2^24
    SENT = jnp.int32(1 << 24)
    # per-line: distance from the low boundary (cell 0 of this shard) to the
    # nearest local seed, and from the high boundary
    iota = jnp.arange(n_local, dtype=jnp.int32)[:, None, None]
    has = mask_local.astype(jnp.int32)
    first_seed = jnp.min(jnp.where(mask_local, iota, SENT), axis=0)  # [ny,nz]
    last_seed = jnp.max(jnp.where(mask_local, iota, -SENT), axis=0)
    dist_from_low = jnp.where(first_seed >= SENT, SENT, first_seed)
    dist_from_high = jnp.where(last_seed <= -SENT, SENT, n_local - 1 - last_seed)
    # gather all shards' summaries: [P, ny, nz]
    lows = lax.all_gather(dist_from_low, axis_name)
    highs = lax.all_gather(dist_from_high, axis_name)
    P_ = lows.shape[0]
    # nearest seed below my shard (in cells, measured from my cell 0):
    # for shard j < idx: distance = (idx - j - 1)*n_local + highs[j]
    sh = jnp.arange(P_, dtype=jnp.int32)[:, None, None]
    below = jnp.where(
        sh < idx, (idx - sh - 1) * n_local + highs + 1, SENT
    )  # +1: boundary crossing
    best_below = jnp.min(below, axis=0)  # [ny,nz] distance from my cell 0 - 1... see use
    above = jnp.where(sh > idx, (sh - idx - 1) * n_local + lows + 1, SENT)
    best_above = jnp.min(above, axis=0)  # distance from my cell n_local-1 + 1
    d_from_below = best_below[None] + iota[:, :, :]  # dist via low boundary
    d_from_above = best_above[None] + (n_local - 1 - iota)
    d = jnp.minimum(d_local, jnp.minimum(d_from_below, d_from_above))
    return jnp.minimum(d, SENT)


def _sharded_line_pass_d2(mask_local: Array, axis_name: str) -> Array:
    d = _local_line_d2_sharded_axis0(mask_local, axis_name)
    no_seed = d >= jnp.int32(1 << 24)
    return jnp.where(no_seed, edt.INF_D2, d * d).astype(jnp.int32)


def sharded_squared_edt(
    mask_local: Array, axis_name: str = "x", backend: str = "stencil"
) -> Array:
    """Exact squared EDT of an x-sharded volume; call inside shard_map.

    mask_local: [nx_local, ny, nz] bool — this shard's x-slab.
    Returns the local slab of the exact global d^2 (int32).

    Pass order: line pass along sharded x (boundary-summary exchange, exact),
    then local envelope passes along y and z — both have their full axis
    extents locally, so no further communication is needed.
    """
    env = edt._ENVELOPE_BACKENDS[backend]
    f = _sharded_line_pass_d2(mask_local, axis_name)
    f = env(f, 1)
    f = env(f, 2)
    return f


def sharded_signed_field(
    filled_local: Array,
    resolution,
    axis_name: str = "x",
    backend: str = "stencil",
) -> Array:
    """Sharded two-field signed combine (local slab of the global SDF)."""
    d2f = sharded_squared_edt(filled_local, axis_name, backend)
    d2e = sharded_squared_edt(~filled_local, axis_name, backend)
    return edt.d2_to_distance(d2f, resolution) - edt.d2_to_distance(d2e, resolution)


# ---------------------------------------------------------------------------
# Halo variant (for measurement; BASELINE names halo exchange explicitly)
# ---------------------------------------------------------------------------


def _halo_exchange(d_local: Array, axis_name: str, width: int) -> Tuple[Array, Array]:
    """Fetch `width` cells from the axis-0 neighbors via ppermute.

    Returns (lo_halo [width,...], hi_halo [width,...]) filled with INF at the
    volume boundary.
    """
    n_dev = lax.axis_size(axis_name)
    idx = lax.axis_index(axis_name)
    send_up = [(i, (i + 1) % n_dev) for i in range(n_dev)]
    send_dn = [(i, (i - 1) % n_dev) for i in range(n_dev)]
    top = d_local[-width:]
    bot = d_local[:width]
    lo_halo = lax.ppermute(top, axis_name, send_up)  # from idx-1
    hi_halo = lax.ppermute(bot, axis_name, send_dn)  # from idx+1
    INF = jnp.int32(edt.INF_D2)
    lo_halo = jnp.where(idx == 0, INF, lo_halo)
    hi_halo = jnp.where(idx == n_dev - 1, INF, hi_halo)
    return lo_halo, hi_halo


def sharded_envelope_axis0_halo(
    f_local: Array, axis_name: str = "x", halo: int = 16
) -> Array:
    """Exact envelope along the SHARDED axis 0 via halo-iterated relaxation.

    Runs the odd-weight 3-tap relaxation; every `halo` iterations the shards
    exchange `halo` boundary cells, so information crosses shard boundaries
    correctly. Iterates until global quiescence (psum convergence flag).
    """
    n_local = f_local.shape[0]
    n_dev = lax.axis_size(axis_name)
    n_total = n_local * n_dev

    def cond(state):
        t, d, done = state
        return jnp.logical_and(~done, t <= n_total)

    def body(state):
        t, d, _ = state
        lo, hi = _halo_exchange(d, axis_name, halo)
        ext = jnp.concatenate([lo, d, hi], axis=0)

        def one(k, e):
            c = 2 * (t + k) - 1
            up = jnp.concatenate(
                [jnp.full_like(e[:1], edt.INF_D2), e[:-1]], axis=0
            )
            dn = jnp.concatenate(
                [e[1:], jnp.full_like(e[:1], edt.INF_D2)], axis=0
            )
            return jnp.minimum(e, jnp.minimum(up, dn) + c)

        new_ext = lax.fori_loop(0, halo, one, ext)
        new_d = new_ext[halo : halo + n_local]
        changed = jnp.any(new_d != d)
        any_changed = lax.psum(changed.astype(jnp.int32), axis_name) > 0
        return t + halo, new_d, ~any_changed

    _, d_final, _ = lax.while_loop(
        cond, body, (jnp.int32(1), f_local, jnp.array(False))
    )
    return d_final
