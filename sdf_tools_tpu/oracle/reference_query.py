"""Scalar NumPy oracle for the SDF query layer.

Direct, branchy, one-point-at-a-time implementations of the reference's query
semantics (``/root/reference/include/sdf_tools/sdf.hpp``), used to validate
the vectorized JAX implementations in ops/query.py. Written independently
from the behavioral spec (SURVEY.md C7a/C7b) — intentionally the "obvious"
scalar formulation so the two implementations share no code.
"""
from __future__ import annotations

from typing import Optional, Tuple

import numpy as np


class OracleSdf:
    def __init__(self, values: np.ndarray, resolution: float, origin: np.ndarray, oob_value: float):
        self.values = np.asarray(values, np.float64)
        self.res = float(resolution)
        self.origin = np.asarray(origin, np.float64)  # 4x4
        self.inv_origin = np.linalg.inv(self.origin)
        self.oob = float(oob_value)
        self.shape = values.shape

    def world_to_grid(self, p):
        q = self.inv_origin @ np.array([p[0], p[1], p[2], 1.0])
        return q[:3]

    def index_in_bounds(self, i):
        return all(0 <= i[a] < self.shape[a] for a in range(3))

    def corrected(self, ix, iy, iz):
        v = self.values[ix, iy, iz]
        if v >= 0.0:
            return v - self.res * 0.5
        return v + self.res * 0.5

    def axis_indices(self, i, size, off):
        lower = upper = i
        if off >= 0.0:
            upper = i + 1
            if upper >= size:
                upper = i
                lower = i - 1
                if lower < 0:
                    lower = i
        else:
            lower = i - 1
            if lower < 0:
                upper = i + 1
                lower = i
                if upper >= size:
                    upper = i
        return lower, upper

    def estimate_distance(self, p) -> Tuple[float, bool]:
        g = self.world_to_grid(p)
        idx = [int(np.floor(g[a] / self.res)) for a in range(3)]
        if not self.index_in_bounds(idx):
            return self.oob, False
        center = [(idx[a] + 0.5) * self.res for a in range(3)]
        off = [g[a] - center[a] for a in range(3)]
        lx, ux = self.axis_indices(idx[0], self.shape[0], off[0])
        ly, uy = self.axis_indices(idx[1], self.shape[1], off[1])
        lz, uz = self.axis_indices(idx[2], self.shape[2], off[2])
        corner = [(lx + 0.5) * self.res, (ly + 0.5) * self.res, (lz + 0.5) * self.res]

        def bilin(ll, lh, hl, hh):
            d1l, d1h = corner[0], corner[0] + self.res
            d2l, d2h = corner[1], corner[1] + self.res
            mult = 1.0 / ((d1h - d1l) * (d2h - d2l))
            row = np.array([d1h - g[0], g[0] - d1l])
            col = np.array([d2h - g[1], g[1] - d2l])
            vals = np.array([[ll, lh], [hl, hh]])
            return mult * row @ vals @ col

        mz = bilin(
            self.corrected(lx, ly, lz),
            self.corrected(lx, uy, lz),
            self.corrected(ux, ly, lz),
            self.corrected(ux, uy, lz),
        )
        pz = bilin(
            self.corrected(lx, ly, uz),
            self.corrected(lx, uy, uz),
            self.corrected(ux, ly, uz),
            self.corrected(ux, uy, uz),
        )
        slope = (pz - mz) / self.res
        return mz + (g[2] - corner[2]) * slope, True

    def grid_aligned_gradient(self, ix, iy, iz, enable_edge_gradients=False) -> Optional[list]:
        if not self.index_in_bounds((ix, iy, iz)):
            return None
        nx, ny, nz = self.shape
        if 0 < ix < nx - 1 and 0 < iy < ny - 1 and 0 < iz < nz - 1:
            inv = 1.0 / (2.0 * self.res)
            return [
                (self.values[ix + 1, iy, iz] - self.values[ix - 1, iy, iz]) * inv,
                (self.values[ix, iy + 1, iz] - self.values[ix, iy - 1, iz]) * inv,
                (self.values[ix, iy, iz + 1] - self.values[ix, iy, iz - 1]) * inv,
            ]
        if not enable_edge_gradients:
            return None
        lo = [max(0, ix - 1), max(0, iy - 1), max(0, iz - 1)]
        hi = [min(nx - 1, ix + 1), min(ny - 1, iy + 1), min(nz - 1, iz + 1)]
        incr = [(hi[a] - lo[a]) * self.res for a in range(3)]
        out = [0.0, 0.0, 0.0]
        if incr[0] > 0:
            out[0] = (self.values[hi[0], iy, iz] - self.values[lo[0], iy, iz]) / incr[0]
        if incr[1] > 0:
            out[1] = (self.values[ix, hi[1], iz] - self.values[ix, lo[1], iz]) / incr[1]
        if incr[2] > 0:
            out[2] = (self.values[ix, iy, hi[2]] - self.values[ix, iy, lo[2]]) / incr[2]
        return out

    def gradient(self, ix, iy, iz, enable_edge_gradients=False) -> Optional[list]:
        g = self.grid_aligned_gradient(ix, iy, iz, enable_edge_gradients)
        if g is None:
            return None
        r = self.origin[:3, :3]
        return list(r @ np.asarray(g))
