"""Sharded end-to-end train step on the virtual CPU mesh."""
import numpy as np

import jax
import jax.numpy as jnp

from sdf_tools_tpu.parallel import sharded, train


def test_train_step_runs_and_reduces_loss():
    mesh = sharded.make_mesh({"dp": 2, "x": 4})
    cfg = train.PipelineConfig(grid_n=16, resolution=0.1, image_h=8, image_w=8, lr=5e-3)
    step = train.make_train_step(mesh, cfg)

    rng = np.random.default_rng(0)
    B, N = 2, 64
    center = np.full(3, 0.5 * cfg.grid_n * cfg.resolution)
    u = rng.normal(size=(B, N, 3))
    u /= np.linalg.norm(u, axis=-1, keepdims=True)
    pts = (center + u * (0.2 * cfg.grid_n * cfg.resolution)).astype(np.float32)
    target = np.full((B, cfg.image_h, cfg.image_w), 1.2, np.float32)

    p = jnp.asarray(pts)
    losses = []
    for _ in range(3):
        p, loss = step(p, jnp.asarray(target))
        losses.append(float(loss))
    assert np.isfinite(losses).all()
    assert p.shape == pts.shape
    # gradient steps actually move the points
    assert float(jnp.abs(p - jnp.asarray(pts)).max()) > 0


def test_train_step_2d_mesh_runs_and_moves_points():
    """(dp, x, y) volume-tile mesh: sharded_squared_edt_2d + 2-D renderer."""
    mesh = sharded.make_mesh({"dp": 2, "x": 2, "y": 2})
    cfg = train.PipelineConfig(grid_n=16, resolution=0.1, image_h=8, image_w=8, lr=5e-3)
    step = train.make_train_step_2d(mesh, cfg)

    rng = np.random.default_rng(0)
    B, N = 2, 64
    center = np.full(3, 0.5 * cfg.grid_n * cfg.resolution)
    u = rng.normal(size=(B, N, 3))
    u /= np.linalg.norm(u, axis=-1, keepdims=True)
    pts = (center + u * (0.2 * cfg.grid_n * cfg.resolution)).astype(np.float32)
    target = np.full((B, cfg.image_h, cfg.image_w), 1.2, np.float32)

    p = jnp.asarray(pts)
    for _ in range(2):
        p, loss = step(p, jnp.asarray(target))
        assert np.isfinite(float(loss))
    assert float(jnp.abs(p - jnp.asarray(pts)).max()) > 0


def test_graft_entry_dryrun():
    import __graft_entry__ as ge

    ge.dryrun_multichip(8)
