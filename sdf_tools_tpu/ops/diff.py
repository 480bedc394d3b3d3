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

A sharper (feature-transform-weighted) surrogate is a follow-up; see
PROGRESS notes.
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
