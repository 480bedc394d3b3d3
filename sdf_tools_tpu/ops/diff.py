"""Differentiability bridges for non-differentiable stages.

The exact EDT is piecewise constant w.r.t. occupancy (flipping a cell moves
the field in discrete jumps), so gradients cannot flow through it natively.
``sdf_from_occupancy_st`` provides a straight-through surrogate so render /
distance losses can still shape occupancy (BASELINE: "pixel gradients flow
back to voxel occupancy"):

  forward:  hard two-field EDT of (occupancy > 0.5) — exact, same cells as
            the reference pipeline.
  backward: d(sdf[i])/d(occ[i]) = -2 * resolution on the diagonal. Rationale:
            flipping cell i from free (value >= +res) to filled (value <=
            -res) changes its own value by at least -2*res; the surrogate
            uses that slope everywhere, which empirically matches the sign
            and scale of one-cell finite differences near the surface where
            the gradient actually matters.

``sdf_from_occupancy_ft`` is the sharper feature-transform surrogate: the
TRUE sensitivity of sdf[i] lives at i's nearest opposite-side cell (remove
the nearest filled cell and a free cell's distance grows; fill the nearest
free cell and a filled cell sinks deeper), so the backward routes each
cell's cotangent to its EDT feature (closest-point map, ops/feature.py)
with the same -2*resolution slope. The diagonal ST predicts exactly zero
for these cross terms.
"""
from __future__ import annotations

from functools import partial
from typing import Callable

import jax
import jax.numpy as jnp

from . import edt


@partial(jax.custom_vjp, nondiff_argnums=(2,))
def sdf_from_occupancy_st(occupancy, resolution, backend: str = "auto"):
    """Signed distance values from an occupancy grid, straight-through diff."""
    mask = occupancy > 0.5
    values, _, _ = edt.signed_field_from_masks(mask, resolution, backend=backend)
    return values


def _st_fwd(occupancy, resolution, backend):
    values = sdf_from_occupancy_st(occupancy, resolution, backend)
    return values, (resolution,)


def _st_bwd(backend, residuals, g):
    (resolution,) = residuals
    d_occ = g * (-2.0 * resolution)
    return d_occ, None


sdf_from_occupancy_st.defvjp(_st_fwd, _st_bwd)


@partial(jax.custom_vjp, nondiff_argnums=(2,))
def sdf_from_occupancy_ft(occupancy, resolution, backend: str = "auto"):
    """Signed distance values from occupancy; feature-routed backward.

    Forward identical to :func:`sdf_from_occupancy_st`. Backward scatters
    each cell's cotangent onto its nearest OPPOSITE-side cell (the EDT
    feature): free cells route to their nearest filled cell, filled cells
    to their nearest free cell, slope -2*resolution. Exact one-cell finite
    differences have this off-diagonal structure; the diagonal ST misses it
    entirely (tests/test_diff.py::test_ft_surrogate_matches_fd_cross_terms).
    """
    mask = occupancy > 0.5
    values, _, _ = edt.signed_field_from_masks(mask, resolution, backend=backend)
    return values


_FT_NATIVE_BACKENDS = ("auto", "pallas", "stencil")


def _per_axis_argmin_ft(mask):
    """(d2, x0, jy, kz): exact EDT of `mask` plus the PER-PASS winner maps
    (x-line seed, y-pass winner, z-pass winner) via the argmin-carrying
    Pallas envelope kernel. Cheaper than the composed feature transform
    (one payload register per pass instead of 2-3), and the per-pass maps
    are exactly what the segment-sum backward needs."""
    import jax as _jax

    from . import edt_pallas, feature

    interpret = _jax.default_backend() not in ("tpu", "axon")
    d, x0 = feature._line_seed_x(mask)
    no_seed = d >= jnp.int32(1 << 24)
    f = jnp.where(no_seed, jnp.int32(edt.INF_D2), d * d).astype(jnp.int32)
    f, jy = edt_pallas.envelope_argmin_pallas(f, 1, interpret=interpret)
    f, kz = edt_pallas.envelope_argmin_pallas(f, 2, interpret=interpret)
    return f, x0, jy, kz


def _ft_fwd(occupancy, resolution, backend):
    from . import feature

    mask = occupancy > 0.5
    resolution = jnp.asarray(resolution)
    # _effective_backend: tiny grids run the stencil on real TPUs (Mosaic
    # degenerate-shape guard, ops/edt.py); fwd and bwd key on the same rule
    resolved = edt._effective_backend(backend, mask)
    if resolved == "pallas":
        # Per-axis residuals: the forward saves each pass's WINNER map (not
        # the composed feature), so the backward can run as three per-axis
        # segment sums instead of one 134M scattered scatter-add (the
        # scatter wall, ~85 M updates/s — docs/NOTES.md §13a). The d^2 of
        # the winner passes IS the exact EDT, so the signed values come
        # from the same arrays (no duplicate EDT in the grad path).
        d2_filled, x0_f, jy_f, kz_f = _per_axis_argmin_ft(mask)
        d2_free, x0_g, jy_g, kz_g = _per_axis_argmin_ft(~mask)
        values = edt.d2_to_distance(d2_filled, resolution) - edt.d2_to_distance(
            d2_free, resolution
        )
        valid_f = d2_filled < jnp.int32(edt.INF_D2)
        valid_g = d2_free < jnp.int32(edt.INF_D2)
        # winners are axis indices < 32768: int16 residuals halve the
        # 6-array residual footprint (3.2 GB -> 1.6 GB at 512^3); the
        # segsum wrapper upcasts on entry
        winners = tuple(
            tuple(w.astype(jnp.int16) for w in ws)
            for ws in ((x0_f, jy_f, kz_f), (x0_g, jy_g, kz_g))
        )
        return values, (mask, winners, (valid_f, valid_g), resolution)
    if backend in _FT_NATIVE_BACKENDS:
        # stencil path (CPU): composed features + one scatter-add
        nx, ny, nz = mask.shape
        d2_filled, feat_filled = feature.feature_transform(mask, backend)
        d2_free, feat_free = feature.feature_transform(~mask, backend)
        values = edt.d2_to_distance(d2_filled, resolution) - edt.d2_to_distance(
            d2_free, resolution
        )
        free_cell = ~mask
        feat = jnp.where(free_cell[..., None], feat_filled, feat_free)
        flat = (feat[..., 0] * ny + feat[..., 1]) * nz + feat[..., 2]
        valid = jnp.where(free_cell, d2_filled, d2_free) < jnp.int32(edt.INF_D2)
        return values, (flat, valid, resolution)
    # exotic backends (reference/cht/...): preserve their forward values
    # exactly; the backward recomputes features with the default transform
    values = sdf_from_occupancy_ft(occupancy, resolution, backend)
    return values, (mask, resolution)


def _ft_bwd(backend, residuals, g):
    resolved = edt._effective_backend(backend, g)
    if resolved == "pallas":
        import jax as _jax

        from . import edt_pallas

        mask, winners, valids, resolution = residuals
        (x0_f, jy_f, kz_f), (x0_g, jy_g, kz_g) = winners
        valid_f, valid_g = valids
        interpret = _jax.default_backend() not in ("tpu", "axon")

        def route(contrib, x0, jy, kz):
            # adjoint of the winner composition feat(i) = x0[jy*[kz]] —
            # route cotangents back through z, then y, then the x line
            c = edt_pallas.winner_segment_sum_pallas(contrib, kz, 2, interpret)
            c = edt_pallas.winner_segment_sum_pallas(c, jy, 1, interpret)
            return edt_pallas.winner_segment_sum_pallas(c, x0, 0, interpret)

        slope = g * (-2.0 * resolution)
        # free cells' features live in the FILLED transform and vice versa
        c_f = jnp.where(~mask & valid_f, slope, 0.0)
        c_g = jnp.where(mask & valid_g, slope, 0.0)
        d_occ = route(c_f, x0_f, jy_f, kz_f) + route(c_g, x0_g, jy_g, kz_g)
        return d_occ, None
    if backend in _FT_NATIVE_BACKENDS:
        flat, valid, resolution = residuals
        contrib = jnp.where(valid, g * (-2.0 * resolution), 0.0)
        d_occ = (
            jnp.zeros(flat.size, g.dtype)
            .at[flat.reshape(-1)]
            .add(contrib.reshape(-1), mode="drop")
            .reshape(g.shape)
        )
        return d_occ, None

    from . import feature

    mask, resolution = residuals
    nx, ny, nz = mask.shape
    d2_filled, feat_filled = feature.feature_transform(mask)
    d2_free, feat_free = feature.feature_transform(~mask)
    free_cell = ~mask
    feat = jnp.where(free_cell[..., None], feat_filled, feat_free)
    valid = jnp.where(free_cell, d2_filled, d2_free) < jnp.int32(edt.INF_D2)
    flat = (feat[..., 0] * ny + feat[..., 1]) * nz + feat[..., 2]
    contrib = jnp.where(valid, g * (-2.0 * resolution), 0.0)
    d_occ = (
        jnp.zeros(nx * ny * nz, g.dtype)
        .at[flat.reshape(-1)]
        .add(contrib.reshape(-1), mode="drop")
        .reshape(mask.shape)
    )
    return d_occ, None


sdf_from_occupancy_ft.defvjp(_ft_fwd, _ft_bwd)


def straight_through_sdf(forward_fn: Callable, resolution):
    """Wrap an arbitrary occupancy->sdf forward with the same ST backward.

    Used by the sharded pipeline where the forward contains collectives.
    """

    @jax.custom_vjp
    def f(occ):
        return forward_fn(occ)

    def fwd(occ):
        return forward_fn(occ), None

    def bwd(_, g):
        return (g * (-2.0 * jnp.asarray(resolution)),)

    f.defvjp(fwd, bwd)
    return f
