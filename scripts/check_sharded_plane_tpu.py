#!/usr/bin/env python
"""Single-real-chip shard_map (mesh size 1) running the plane-sweep kernel
COMPILED inside the sharded render path (VERDICT r2 item 3 second half; the
virtual-mesh interpret coverage lives in tests/test_sharded.py).
"""
import sys
import time

sys.path.insert(0, "/root/repo")

import numpy as np
import jax
import jax.numpy as jnp
from jax import shard_map
from jax.sharding import PartitionSpec as P

from bench import make_scene
from sdf_tools_tpu.grid import GridMeta, make_origin_transform
from sdf_tools_tpu.ops import edt, render
from sdf_tools_tpu.parallel import sharded


def main():
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 256
    res = 0.05
    mask = make_scene(n)
    meta = GridMeta.create(make_origin_transform([0.0, 0.0, 0.0]), res, mask.shape)
    backend = "pallas" if jax.default_backend() in ("tpu", "axon") else "stencil"
    sdf, _ = edt.extract_signed_distance_field(
        jnp.asarray(mask), meta, oob_value=1e3, backend=backend
    )
    center = np.full(3, 0.5 * n * res)
    cam = center + np.array([-1.2 * n * res, 0.0, 0.3 * n * res])
    h = w = 256
    origins, dirs = render.camera_rays(
        jnp.asarray(cam, jnp.float32), jnp.asarray(center, jnp.float32),
        jnp.asarray([0.0, 0.0, 1.0]), 50.0, h, w,
    )
    t_max = 4.0 * n * res

    single = render.render_depth(
        sdf, origins, dirs, t_max=t_max, max_steps=96, backend="plane"
    )

    mesh = sharded.make_mesh({"x": 1})
    f = shard_map(
        lambda v: sharded.sharded_render_depth(
            v, meta, 1e3, origins, dirs, "x", halo=2, t_max=t_max,
            max_steps=96, backend="plane",
        ),
        mesh=mesh,
        in_specs=P("x"),
        out_specs=(P(), P()),
        check_vma=False,
    )
    t0 = time.perf_counter()
    depth, hit = jax.jit(f)(sdf.values)
    hsum = float(jnp.sum(hit.astype(jnp.int32)))
    print(f"shard_map(mesh=1) plane render compiled+ran in "
          f"{time.perf_counter()-t0:.1f}s, hits={hsum:.0f}/{h*w}")
    h1 = np.asarray(single.hit)
    h2 = np.asarray(hit)
    dis = int((h1 != h2).sum())
    both = h1 & h2
    err = np.abs(np.asarray(depth)[both] - np.asarray(single.depth)[both])
    print(f"vs single-device plane: hits {int(h1.sum())} vs {int(h2.sum())}, "
          f"hit disagreements {dis}/{h*w}; depth err mean {err.mean():.5f} "
          f"p99.9 {np.quantile(err, 0.999):.4f} max {err.max():.4f} "
          f"(res={res}); err>2res on {(err > 2 * res).sum()} rays")
    edges = np.array([0, 0.25, 0.5, 1, 1.5, 2, 3, 5, 10, 1e9]) * res
    hist, _ = np.histogram(err, edges)
    print("err histogram (units of res):",
          {f"{a/res:g}-{b/res:g}": int(c) for a, b, c in zip(edges, edges[1:], hist) if c},
          flush=True)
    np.savez("/tmp/sharded_check_dump.npz", d1=np.asarray(single.depth),
             h1=h1, d2=np.asarray(depth), h2=h2)
    # silhouette rays may legitimately land on a different surface between
    # the two plane variants (the halo-padded slab shifts plane positions);
    # a SYSTEMATIC sharding bug (halo offset, window clipping) would move
    # the bulk of rays. Assert the bulk is bit-tight and flips are rare.
    assert dis <= max(4, int(0.005 * h1.size))
    assert float(err.mean()) < 0.25 * res
    assert float(np.quantile(err, 0.999)) < 2 * res
    assert int((err > 2 * res).sum()) <= max(4, int(0.002 * h1.size))
    print("SHARDED PLANE (mesh=1, compiled) OK")


if __name__ == "__main__":
    main()
