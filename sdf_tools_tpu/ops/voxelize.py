"""Voxelization: pointclouds and images -> occupancy grids.

Replaces the reference's Python scatter loop
(``/root/reference/scripts/3d_sdf_demo_rviz.py:22-29``:
``floor((p - origin)/res)`` then per-point assignment) with vectorized
scatter ops, plus differentiable soft variants so gradients can flow from
SDF/render losses back to point positions (BASELINE north star).
"""
from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp

from ..grid import GridMeta

Array = jax.Array


def voxelize_points(points: Array, meta: GridMeta, weights: Array | None = None) -> Array:
    """Hard-scatter points into a binary occupancy grid [nx, ny, nz] f32.

    Points outside the grid are dropped (reference demo clips the same way).
    """
    p = jnp.asarray(points)
    idx = meta.location_to_index(p)  # floor((world->grid)/res)
    in_bounds = meta.index_in_bounds(idx)
    nx, ny, nz = meta.shape
    # flat scatter (TPU lowers multi-dim scatters poorly); OOB -> dropped
    flat_idx = (idx[..., 0] * ny + idx[..., 1]) * nz + idx[..., 2]
    flat_idx = jnp.where(in_bounds, flat_idx, -1)
    occ = jnp.zeros(nx * ny * nz, jnp.float32)
    w = jnp.ones(p.shape[:-1], jnp.float32) if weights is None else jnp.asarray(weights)
    occ = occ.at[flat_idx].max(w, mode="drop")
    return occ.reshape(meta.shape)


def soft_voxelize_points(points: Array, meta: GridMeta, temperature: float = 1.0) -> Array:
    """Differentiable trilinear point splatting -> soft occupancy in [0, 1].

    Each point deposits trilinear weights onto its 8 surrounding cell
    centers; per-cell mass is squashed with ``1 - exp(-mass/temperature)``
    (smooth, saturating, monotone — gradient flows to point positions).
    ``occupancy > 0.5`` then thresholds to the same cells as
    :func:`voxelize_points` for points near cell centers.
    """
    p = jnp.asarray(points)
    res = meta.resolution
    g = meta.world_to_grid(p) / res - 0.5  # continuous cell-center coords
    base = jnp.floor(g)
    frac = g - base
    base = base.astype(jnp.int32)
    nx, ny, nz = meta.shape
    occ = jnp.zeros(nx * ny * nz, jnp.float32)
    shape_arr = jnp.asarray(meta.shape, jnp.int32)
    for dx in (0, 1):
        for dy in (0, 1):
            for dz in (0, 1):
                corner = base + jnp.asarray([dx, dy, dz], jnp.int32)
                w = (
                    (frac[..., 0] if dx else 1.0 - frac[..., 0])
                    * (frac[..., 1] if dy else 1.0 - frac[..., 1])
                    * (frac[..., 2] if dz else 1.0 - frac[..., 2])
                )
                ok = jnp.all((corner >= 0) & (corner < shape_arr), axis=-1)
                flat_idx = (corner[..., 0] * ny + corner[..., 1]) * nz + corner[..., 2]
                flat_idx = jnp.where(ok, flat_idx, -1)
                occ = occ.at[flat_idx].add(jnp.where(ok, w, 0.0), mode="drop")
    occ = occ.reshape(meta.shape)
    return 1.0 - jnp.exp(-occ / temperature)


def image_to_occupancy(image: Array, threshold: float = 0.5) -> Array:
    """Binary image [h, w] (row=y, col=x) -> occupancy [nx=w, ny=h, nz=1].

    Follows the utils_2d axis convention
    (``/root/reference/src/sdf_tools/utils_2d.py:30-36``): image[y, x] == 1
    marks grid cell (x, y) filled.
    """
    img = jnp.asarray(image)
    occ2d = (img > threshold).astype(jnp.float32).T  # [w, h]
    return occ2d[:, :, None]
