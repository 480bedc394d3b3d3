"""NumPy re-implementation of the reference EDT, used as the test oracle.

The catkin/ROS reference stack (``pysdf_tools``) cannot be built in this
environment, so per SURVEY.md §4 we validate against a faithful NumPy
re-implementation of the reference algorithm, itself pinned by the exact
assertions in ``/root/reference/test/test_bindings.py`` (filled cell = -res,
4-neighbors = +res, gradient [1.5, 0]).

Behavioral contract being reproduced (not copied):
  * ``BuildDistanceField`` (``/root/reference/include/sdf_tools/sdf_generation.hpp:95-207``):
    bucket-queue brushfire over integer squared distances. Seeds at d^2=0 with
    update direction 13 (the (0,0,0) direction number). Buckets processed in
    ascending d^2; bucket 0 expands all 26 neighbors, buckets >=1 expand only
    face-adjacent neighbors not opposing the arrival direction
    (``sdf_generation.hpp:60-69``). A neighbor is relaxed to the squared
    distance from the *propagated closest point* (``:179``) and re-enqueued on
    improvement.
  * ``ExtractSignedDistanceField`` (``sdf_generation.hpp:209-271``): two fields
    (distance-to-filled, distance-to-free); signed value =
    sqrt(d2_filled)*res - sqrt(d2_free)*res, computed in float64 and stored
    as float32 (filled cells therefore get -res, not 0).
  * Virtual-border variant (``sdf_generation.hpp:273-420``).

This module is pure NumPy and deliberately simple/slow; it exists only to
generate ground truth for tests up to ~128^3.
"""
from __future__ import annotations

from typing import Tuple

import numpy as np

_NEIGHBORS_26 = [
    (dx, dy, dz)
    for dx in (-1, 0, 1)
    for dy in (-1, 0, 1)
    for dz in (-1, 0, 1)
    if not (dx == 0 and dy == 0 and dz == 0)
]


def _direction_number(dx: int, dy: int, dz: int) -> int:
    return (dx + 1) * 9 + (dy + 1) * 3 + (dz + 1)


def _make_neighborhoods():
    """Neighborhood tables per arrival direction (reference sdf_generation.hpp:34-85)."""
    hoods = [[[] for _ in range(27)] for _ in range(2)]
    for n in range(2):
        for dx in (-1, 0, 1):
            for dy in (-1, 0, 1):
                for dz in (-1, 0, 1):
                    dirno = _direction_number(dx, dy, dz)
                    for tdx, tdy, tdz in _NEIGHBORS_26:
                        if n >= 1:
                            if abs(tdx) + abs(tdy) + abs(tdz) != 1:
                                continue
                            if dx * tdx < 0 or dy * tdy < 0 or dz * tdz < 0:
                                continue
                        hoods[n][dirno].append((tdx, tdy, tdz))
    return hoods


_HOODS = _make_neighborhoods()


def build_distance_field(shape: Tuple[int, int, int], seed_mask: np.ndarray) -> np.ndarray:
    """Bucket-queue EDT: int64 squared distances to the seed set.

    Returns d^2 as int64 (inf -> a value > max_distance_square is impossible
    when seeds exist; with no seeds the array is all `np.iinfo(int64).max`).
    """
    nx, ny, nz = shape
    max_d2 = nx * nx + ny * ny + nz * nz
    INF = np.iinfo(np.int64).max
    d2 = np.full(shape, INF, dtype=np.int64)
    closest = np.zeros(shape + (3,), dtype=np.int64)
    update_dir = np.zeros(shape, dtype=np.int64)

    buckets = [[] for _ in range(max_d2 + 1)]
    seeds = np.argwhere(seed_mask)
    init_dir = _direction_number(0, 0, 0)
    for sx, sy, sz in seeds:
        d2[sx, sy, sz] = 0
        closest[sx, sy, sz] = (sx, sy, sz)
        update_dir[sx, sy, sz] = init_dir
        # the reference pushes a *copy* of the cell struct into the queue
        buckets[0].append((sx, sy, sz, sx, sy, sz, init_dir))

    for bq_idx in range(max_d2 + 1):
        queue = buckets[bq_idx]
        qi = 0
        while qi < len(queue):
            x, y, z, cpx, cpy, cpz, arrdir = queue[qi]
            qi += 1
            level = 0 if bq_idx == 0 else 1
            for tdx, tdy, tdz in _HOODS[level][arrdir]:
                nxi, nyi, nzi = x + tdx, y + tdy, z + tdz
                if not (0 <= nxi < nx and 0 <= nyi < ny and 0 <= nzi < nz):
                    continue
                ddx, ddy, ddz = nxi - cpx, nyi - cpy, nzi - cpz
                nd2 = ddx * ddx + ddy * ddy + ddz * ddz
                if nd2 > max_d2:
                    continue
                if nd2 < d2[nxi, nyi, nzi]:
                    d2[nxi, nyi, nzi] = nd2
                    closest[nxi, nyi, nzi] = (cpx, cpy, cpz)
                    ndir = _direction_number(tdx, tdy, tdz)
                    update_dir[nxi, nyi, nzi] = ndir
                    buckets[nd2].append((nxi, nyi, nzi, cpx, cpy, cpz, ndir))
    return d2


def brute_force_d2(shape: Tuple[int, int, int], seed_mask: np.ndarray) -> np.ndarray:
    """Exact EDT by brute force over all seeds (ground truth for small grids)."""
    INF = np.iinfo(np.int64).max
    seeds = np.argwhere(seed_mask)
    if len(seeds) == 0:
        return np.full(shape, INF, dtype=np.int64)
    idx = np.stack(
        np.meshgrid(*[np.arange(s) for s in shape], indexing="ij"), axis=-1
    )  # [nx,ny,nz,3]
    flat = idx.reshape(-1, 3)
    out = np.full(flat.shape[0], INF, dtype=np.int64)
    # chunk over seeds to bound memory
    chunk = max(1, 10_000_000 // max(1, flat.shape[0]))
    for s0 in range(0, len(seeds), chunk):
        sl = seeds[s0 : s0 + chunk]  # [c,3]
        diff = flat[:, None, :] - sl[None, :, :]
        d2 = np.einsum("ncd,ncd->nc", diff, diff)
        out = np.minimum(out, d2.min(axis=1))
    return out.reshape(shape)


def extract_sdf_reference(
    filled_mask: np.ndarray, resolution: float
) -> Tuple[np.ndarray, float, float]:
    """Two-field signed combine exactly as the reference does it.

    Mirrors sdf_generation.hpp:242-268: d^2 computed in integers, sqrt and
    the subtraction in float64, result stored float32.
    Returns (sdf[nx,ny,nz] float32, max_distance, min_distance).
    """
    shape = filled_mask.shape
    d2_filled = build_distance_field(shape, filled_mask)
    d2_free = build_distance_field(shape, ~filled_mask)
    INF = np.iinfo(np.int64).max
    f1 = np.where(d2_filled == INF, np.inf, d2_filled.astype(np.float64))
    f2 = np.where(d2_free == INF, np.inf, d2_free.astype(np.float64))
    dist = np.sqrt(f1) * resolution - np.sqrt(f2) * resolution
    with np.errstate(invalid="ignore"):
        pass
    max_d = np.max(dist) if dist.size else -np.inf
    min_d = np.min(dist) if dist.size else np.inf
    return dist.astype(np.float32), float(max_d), float(min_d)


def extract_sdf_virtual_border_reference(
    filled_mask: np.ndarray, resolution: float
) -> Tuple[np.ndarray, float, float]:
    """Virtual-border combine per sdf_generation.hpp:273-420."""
    shape = filled_mask.shape
    offs = [2 if s > 1 else 0 for s in shape]
    qoffs = [1 if s > 1 else 0 for s in shape]
    big_shape = tuple(s + o for s, o in zip(shape, offs))

    border = np.zeros(big_shape, dtype=bool)
    for ax, o in enumerate(offs):
        if o > 0:
            sl_lo = [slice(None)] * 3
            sl_hi = [slice(None)] * 3
            sl_lo[ax] = 0
            sl_hi[ax] = big_shape[ax] - 1
            border[tuple(sl_lo)] = True
            border[tuple(sl_hi)] = True

    inner = tuple(
        slice(q, q + s) for q, s in zip(qoffs, shape)
    )
    base = np.zeros(big_shape, dtype=bool)
    base[inner] = filled_mask

    free_fill = base | border  # border pretended filled
    filled_fill = base & ~border  # border pretended empty

    free_sdf, free_max, _ = extract_sdf_reference(free_fill, resolution)
    filled_sdf, _, filled_min = extract_sdf_reference(filled_fill, resolution)

    fs = free_sdf[inner]
    bs = filled_sdf[inner]
    combined = np.where(fs >= 0.0, fs, np.where(bs <= -0.0, bs, np.float32(0.0)))
    return combined.astype(np.float32), float(free_max), float(filled_min)
