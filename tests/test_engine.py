"""SdfEngine serving API."""
import numpy as np

import jax.numpy as jnp

from sdf_tools_tpu.engine import SdfEngine


def test_engine_end_to_end():
    eng = SdfEngine(shape=(32, 32, 32), resolution=0.1, image_hw=(16, 16), render_max_steps=32)
    sdf = eng.warmup(n_points=256, n_queries=128)
    assert sdf.values.shape == (32, 32, 32)

    # a sphere of points -> negative inside, positive outside
    rng = np.random.default_rng(0)
    u = rng.normal(size=(2000, 3))
    u /= np.linalg.norm(u, axis=1, keepdims=True)
    center = np.full(3, 1.6)
    pts = (center + u * 0.8).astype(np.float32)
    sdf = eng.sdf_from_points(jnp.asarray(pts))
    d_in, ok = eng.query(sdf, jnp.asarray(center[None, :], jnp.float32))
    assert bool(np.asarray(ok)[0])
    # center of a hollow sphere shell is far from the shell -> positive
    assert float(np.asarray(d_in)[0]) > 0.3

    d, g, ok = eng.query_with_grad(sdf, jnp.asarray(center[None, :] + 0.2, jnp.float32))
    assert np.isfinite(np.asarray(g)).all()

    depth, hit = eng.render(sdf, center - np.array([3.0, 0, 0]), center)
    assert np.asarray(hit).any()
