"""Exactness of the monotone-CHT envelope kernel (ops/edt_cht.py).

The CHT backend must be bit-equal to the brute-force envelope (and hence to
the exact EDT) on arbitrary inputs INCLUDING adversarial convex profiles
that overflow the K register slots — the per-block relaxation fallback keeps
exactness unconditional. Runs in interpret mode on CPU.
"""
import numpy as np
import pytest

import jax.numpy as jnp

from sdf_tools_tpu.ops import edt, edt_cht


def _remap_inf(a, clamp):
    """Brute keeps INF+offset values; the CHT clamps no-source to INF_D2."""
    return np.where(np.asarray(a) > clamp, int(edt.INF_D2), np.asarray(a))


@pytest.mark.parametrize("k", [2, 4, 8])
def test_cht_matches_brute_random(k):
    rng = np.random.default_rng(7)
    for _ in range(10):
        X = int(rng.choice([2, 5, 8, 16]))
        Y = int(rng.choice([2, 7, 16, 32]))
        Z = int(rng.choice([1, 2, 8, 16]))
        nmax = max(X, Y, Z)
        f = (rng.integers(0, int(np.sqrt(2) * nmax) + 1, (X, Y, Z)) ** 2).astype(
            np.int32
        )
        f = np.where(rng.random((X, Y, Z)) < 0.1, edt.INF_D2, f).astype(np.int32)
        clamp = 2 * nmax**2 + nmax**2
        for axis in (1, 2):
            if f.shape[axis] == 1:
                continue
            want = _remap_inf(edt.envelope_pass_brute(jnp.asarray(f), axis), clamp)
            got = _remap_inf(edt_cht.envelope_pass_cht(jnp.asarray(f), axis, K=k), clamp)
            np.testing.assert_array_equal(want, got)


def test_cht_overflow_fallback_exact():
    """Convex f keeps every parabola on the hull — guaranteed slot overflow
    at K=2; the per-block relaxation fallback must keep the result exact."""
    X, Y, Z = 4, 64, 8
    j = np.arange(Y)
    f = ((j - 32) ** 2 * 3).astype(np.int32)[None, :, None] * np.ones(
        (X, 1, Z), np.int32
    )
    want = np.asarray(edt.envelope_pass_brute(jnp.asarray(f), 1))
    got = np.asarray(edt_cht.envelope_pass_cht(jnp.asarray(f), 1, K=2))
    np.testing.assert_array_equal(want, got)


def test_squared_edt_cht_backend_matches_stencil():
    rng = np.random.default_rng(3)
    mask = rng.random((24, 40, 32)) < 0.02
    mask[0] = False  # include empty x-lines (INF propagation)
    want = np.asarray(edt.squared_edt(jnp.asarray(mask), backend="stencil"))
    got = np.asarray(edt.squared_edt(jnp.asarray(mask), backend="cht"))
    np.testing.assert_array_equal(want, got)


def test_signed_field_cht_backend():
    rng = np.random.default_rng(4)
    mask = rng.random((16, 24, 16)) < 0.05
    want, wmax, wmin = edt.signed_field_from_masks(
        jnp.asarray(mask), 0.1, backend="stencil"
    )
    got, gmax, gmin = edt.signed_field_from_masks(
        jnp.asarray(mask), 0.1, backend="cht"
    )
    np.testing.assert_array_equal(np.asarray(want), np.asarray(got))
