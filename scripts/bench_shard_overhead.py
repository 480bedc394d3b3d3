#!/usr/bin/env python
"""Single-chip sharding overhead: shard_map(mesh=1) vs the unsharded path.

VERDICT r3 item 4: the measurable half of BASELINE's >=85% multi-host
scaling-efficiency target on this 1-chip environment is what the sharding
MACHINERY itself costs — shard_map tracing, the boundary-summary exchange in
the sharded line pass, halo exchange + slab min-composite in the sharded
renderer — when the collectives are degenerate (1 device). Run on the real
TPU; scalar-fetch timing per docs/NOTES.md §8.

Usage: python scripts/bench_shard_overhead.py [n=512] [hw=1024]
Prints one JSON line per comparison.
"""
import json
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


def timed(f, *args, repeats=3):
    _ = float(f(*args))  # compile + warm
    ts = []
    for _ in range(repeats):
        t0 = time.perf_counter()
        _ = float(f(*args))
        ts.append(time.perf_counter() - t0)
    return float(np.median(ts))


def main():
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 512
    hw = int(sys.argv[2]) if len(sys.argv) > 2 else 1024
    res = 0.05
    mask = make_scene(n)
    m = jnp.asarray(mask)
    backend = "pallas" if jax.default_backend() in ("tpu", "axon") else "stencil"
    mesh = sharded.make_mesh({"x": 1})

    # ---- EDT: unsharded vs shard_map(mesh=1) ----
    f_plain = jax.jit(
        lambda mm: jnp.sum(edt.signed_field_from_masks(mm, res, backend=backend)[0])
    )
    f_shard = jax.jit(
        shard_map(
            lambda mm: jax.lax.psum(
                jnp.sum(sharded.sharded_signed_field(mm, res, "x", backend)), "x"
            ),
            mesh=mesh,
            in_specs=P("x"),
            out_specs=P(),
            check_vma=False,
        )
    )
    t_plain = timed(f_plain, m)
    t_shard = timed(f_shard, m)
    print(json.dumps({
        "metric": "edt_shard_overhead_mesh1",
        "value": round(t_shard / t_plain - 1.0, 4),
        "unit": "fractional overhead",
        "unsharded_s": round(t_plain, 4),
        "sharded_s": round(t_shard, 4),
        "n": n,
    }), flush=True)

    # ---- render: unsharded (auto) vs sharded slab renderer (mesh=1) ----
    meta = GridMeta.create(make_origin_transform([0.0, 0.0, 0.0]), res, mask.shape)
    sdf, _ = edt.extract_signed_distance_field(m, meta, oob_value=1e3, backend=backend)
    center = np.full(3, 0.5 * n * res)
    cam = center + np.array([-1.2 * n * res, 0.0, 0.4 * n * res])
    origins, dirs = render.camera_rays(
        jnp.asarray(cam, jnp.float32), jnp.asarray(center, jnp.float32),
        jnp.asarray([0.0, 0.0, 1.0]), 50.0, hw, hw,
    )
    t_max = 4.0 * n * res

    from sdf_tools_tpu.grid import SdfGrid

    r_plain = jax.jit(
        lambda v, o, d: jnp.mean(
            render.render_depth(
                SdfGrid(values=v, meta=meta, oob_value=sdf.oob_value),
                o, d, t_max=t_max, max_steps=64,
            ).depth
        )
    )
    r_shard = jax.jit(
        shard_map(
            lambda v, o, d: jnp.mean(
                sharded.sharded_render_depth(
                    v, meta, 1e3, o, d, "x", halo=2, t_max=t_max, max_steps=64,
                )[0]
            ),
            mesh=mesh,
            in_specs=(P("x"), P(), P()),
            out_specs=P(),
            check_vma=False,
        )
    )
    t_rp = timed(r_plain, sdf.values, origins, dirs)
    t_rs = timed(r_shard, sdf.values, origins, dirs)
    print(json.dumps({
        "metric": "render_shard_overhead_mesh1",
        "value": round(t_rs / t_rp - 1.0, 4),
        "unit": "fractional overhead",
        "unsharded_s": round(t_rp, 4),
        "sharded_s": round(t_rs, 4),
        "rays": hw * hw,
        "n": n,
    }), flush=True)


if __name__ == "__main__":
    main()
