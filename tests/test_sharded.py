"""Sharded EDT on a virtual 8-device CPU mesh vs the single-device result."""
import numpy as np
import pytest

import jax
import jax.numpy as jnp

from jax.sharding import PartitionSpec as P
from jax.experimental.shard_map import shard_map

from sdf_tools_tpu.ops import edt
from sdf_tools_tpu.parallel import sharded


def _mesh_1d(n=8, name="x"):
    return sharded.make_mesh({name: n})


@pytest.mark.parametrize("shape,p", [((32, 16, 8), 0.1), ((16, 8, 24), 0.05), ((8, 12, 4), 0.4)])
def test_sharded_edt_matches_single_device(shape, p):
    rng = np.random.default_rng(0)
    mask = rng.random(shape) < p
    if not mask.any():
        mask[0, 0, 0] = True
    mesh = _mesh_1d(8)

    f = shard_map(
        lambda m: sharded.sharded_squared_edt(m, "x", backend="stencil"),
        mesh=mesh,
        in_specs=P("x"),
        out_specs=P("x"),
    )
    out = np.asarray(jax.jit(f)(jnp.asarray(mask)))
    ref = np.asarray(edt.squared_edt(jnp.asarray(mask), backend="stencil"))
    np.testing.assert_array_equal(out, ref)


def test_sharded_edt_no_seeds_line():
    # lines with seeds only in one shard + lines with no seeds at all
    mask = np.zeros((32, 4, 4), bool)
    mask[3, 0, 0] = True  # only shard 0 has a seed, in one line
    mesh = _mesh_1d(8)
    f = shard_map(
        lambda m: sharded.sharded_squared_edt(m, "x", backend="stencil"),
        mesh=mesh,
        in_specs=P("x"),
        out_specs=P("x"),
    )
    out = np.asarray(jax.jit(f)(jnp.asarray(mask)))
    ref = np.asarray(edt.squared_edt(jnp.asarray(mask), backend="stencil"))
    np.testing.assert_array_equal(out, ref)


def test_sharded_signed_field():
    rng = np.random.default_rng(1)
    mask = rng.random((32, 12, 6)) < 0.15
    mask[0, 0, 0] = True
    res = 0.1
    mesh = _mesh_1d(8)
    f = shard_map(
        lambda m: sharded.sharded_signed_field(m, res, "x", backend="stencil"),
        mesh=mesh,
        in_specs=P("x"),
        out_specs=P("x"),
    )
    out = np.asarray(jax.jit(f)(jnp.asarray(mask)))
    ref, _, _ = edt.signed_field_from_masks(jnp.asarray(mask), res, backend="stencil")
    np.testing.assert_allclose(out, np.asarray(ref), rtol=1e-6, atol=1e-7)


def test_halo_envelope_matches_local():
    rng = np.random.default_rng(2)
    shape = (32, 8, 8)
    f_in = rng.integers(0, 200, shape).astype(np.int32)
    mesh = _mesh_1d(8)
    g = shard_map(
        lambda a: sharded.sharded_envelope_axis0_halo(a, "x", halo=4),
        mesh=mesh,
        in_specs=P("x"),
        out_specs=P("x"),
    )
    out = np.asarray(jax.jit(g)(jnp.asarray(f_in)))
    ref = np.asarray(edt.envelope_pass_brute(jnp.asarray(f_in), 0))
    np.testing.assert_array_equal(out, ref)


def test_sharded_edt_2d_mesh_with_dp():
    """Nested data-parallel axis: batch of scenes, each x-sharded."""
    rng = np.random.default_rng(3)
    masks = rng.random((2, 16, 8, 8)) < 0.2
    masks[:, 0, 0, 0] = True
    mesh = sharded.make_mesh({"dp": 2, "x": 4})

    f = shard_map(
        lambda m: sharded.sharded_squared_edt(m[0], "x", backend="stencil")[None],
        mesh=mesh,
        in_specs=P("dp", "x"),
        out_specs=P("dp", "x"),
    )
    out = np.asarray(jax.jit(f)(jnp.asarray(masks)))
    for b in range(2):
        ref = np.asarray(edt.squared_edt(jnp.asarray(masks[b]), backend="stencil"))
        np.testing.assert_array_equal(out[b], ref)
