#!/usr/bin/env python
"""Real-chip validation of the round-4 kernels: the windowed segment-sum
(Mosaic lowering, not interpret) against the composed-feature scatter-add
backward, and the per-axis argmin FT against the stencil path.

Run on the TPU: python scripts/validate_r4_kernels.py [n=96]
"""
import sys

sys.path.insert(0, "/root/repo")

import numpy as np
import jax
import jax.numpy as jnp

from sdf_tools_tpu.ops import diff, edt, edt_pallas


def main():
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 96
    rng = np.random.default_rng(5)

    # 1) raw segsum kernel vs scatter-add on device, all 3 axes
    shape = (n, 128, 128)
    g = jnp.asarray(rng.standard_normal(shape).astype(np.float32))
    for axis in (0, 1, 2):
        win = jnp.asarray(
            np.sort(rng.integers(0, shape[axis], shape), axis=axis).astype(np.int32)
        )
        out = np.asarray(edt_pallas.winner_segment_sum_pallas(g, win, axis))
        gm = np.moveaxis(np.asarray(g), axis, -1)
        wm = np.moveaxis(np.asarray(win), axis, -1)
        nn = shape[axis]
        ref2d = np.zeros((g.size // nn, nn), np.float32)
        np.add.at(
            ref2d,
            (np.arange(g.size // nn)[:, None], wm.reshape(-1, nn)),
            gm.reshape(-1, nn),
        )
        ref = np.moveaxis(ref2d.reshape(gm.shape), -1, axis)
        err = np.abs(out - ref).max()
        print(f"segsum axis={axis}: max|err| = {err:.2e}")
        assert err < 1e-4 * max(1.0, np.abs(ref).max())

    # 2) FT surrogate backward: pallas (windowed segsums) vs stencil (scatter)
    occ = (rng.random((n, n, n)) < 0.12).astype(np.float32)
    cot = jnp.asarray(rng.standard_normal(occ.shape).astype(np.float32))

    def grad_via(backend):
        def loss(o):
            vals = diff.sdf_from_occupancy_ft(o, jnp.float32(0.05), backend)
            return jnp.sum(vals * cot)

        return np.asarray(jax.grad(loss)(jnp.asarray(occ)))

    gp = grad_via("pallas")
    gs = grad_via("stencil")
    # routed mass is tie-invariant; per-cell values differ only at argmin ties
    print(f"FT bwd mass: pallas {gp.sum():.6f} vs stencil {gs.sum():.6f}")
    np.testing.assert_allclose(gp.sum(), gs.sum(), rtol=1e-4)
    frac_diff = (np.abs(gp - gs) > 1e-4).mean()
    print(f"FT bwd per-cell disagreement (ties): {frac_diff:.4%}")
    assert frac_diff < 0.02
    print("PASS: round-4 kernels validated on device")


if __name__ == "__main__":
    main()
