#!/usr/bin/env python
"""Round-5 item: measure the hit-corner EMISSION idea for the render
backward (VERDICT r4 #6) instead of arguing the data model.

The proposal: after the plane-sweep forward, a compacted second pass (or
fatter carried state) emits each hit ray's 8 stencil-corner indices+values
from VMEM, eliminating the backward's 8M scattered corner gathers.

This measures the UPPER BOUND of that idea: the backward with every stencil
input (idx8, w8, grad) precomputed and passed as arguments — i.e., corners
emitted at ZERO forward cost. If fwd + free-emission backward still misses
3 Mrays/s, no emission design can reach it and the scattered stencil
stands; the split also shows where the time actually goes.

Scalar-fetch timing throughout (docs/NOTES.md §8).
"""
import sys
import time

import numpy as np
import jax
import jax.numpy as jnp

sys.path.insert(0, "/root/repo")
import bench
from sdf_tools_tpu.grid import GridMeta, SdfGrid, make_origin_transform
from sdf_tools_tpu.ops import edt, query, render

n = int(sys.argv[1]) if len(sys.argv) > 1 else 512
res = 0.05
mask = bench.make_scene(n)
backend = "pallas" if jax.default_backend() in ("tpu", "axon") else "stencil"
meta = GridMeta.create(make_origin_transform([0.0, 0.0, 0.0]), res, mask.shape)
sdf, _ = edt.extract_signed_distance_field(
    jnp.asarray(mask), meta, oob_value=1e3, backend=backend
)
center = np.full(3, 0.5 * n * res)
cam = center + np.array([-1.2 * n * res, 0.0, 0.4 * n * res])
h = w = 1024
origins, dirs = render.camera_rays(
    jnp.asarray(cam, jnp.float32), jnp.asarray(center, jnp.float32),
    jnp.asarray([0.0, 0.0, 1.0]), 50.0, h, w,
)
t_max = 4.0 * n * res


def timed(f, *args, reps=3):
    ref = float(f(*args))
    ts = []
    for _ in range(reps):
        t0 = time.perf_counter()
        chk = float(f(*args))
        ts.append(time.perf_counter() - t0)
    return float(np.median(ts)), ref


# ---- A: production forward ------------------------------------------------
fwd = jax.jit(
    lambda s, o, d: jnp.mean(
        render.render_depth(s, o, d, t_max=t_max, max_steps=64).depth
    )
)
tA, _ = timed(fwd, sdf, origins, dirs)
print(f"A  forward (production depth):            {tA*1e3:7.1f} ms"
      f"  ({h*w/tA/1e6:.2f} Mrays/s)", flush=True)

# ---- B: current full fwd+bwd ---------------------------------------------
def loss(values, o, d):
    s = SdfGrid(values=values, meta=meta, oob_value=sdf.oob_value)
    r = render.render_depth(s, o, d, t_max=t_max, max_steps=64)
    return jnp.sum(r.depth**2)

vg = jax.value_and_grad(loss)
fB = jax.jit(lambda v, o, d: (lambda lv: lv[0] + jnp.sum(lv[1]))(vg(v, o, d)))
tB, _ = timed(fB, sdf.values, origins, dirs)
print(f"B  value_and_grad (current, fwd+bwd):     {tB*1e3:7.1f} ms"
      f"  ({h*w/tB/1e6:.2f} Mrays/s)", flush=True)

# ---- precompute the stencil inputs once (host side of the simulation) ----
r0 = jax.jit(
    lambda s, o, d: render.render_depth(s, o, d, t_max=t_max, max_steps=64)
)(sdf, origins, dirs)
depth0 = r0.depth
hit0 = r0.hit
hit_pts = origins + depth0[..., None] * dirs
idx8, w8, _, grad_grid, in_b = jax.jit(query.interpolation_stencil)(sdf, hit_pts)
idx8, w8, grad_grid, in_b = jax.device_put((idx8, w8, grad_grid, in_b))

from sdf_tools_tpu.grid import rotate_points

# ---- C1: backward alone, stencil gathered from values (current math) -----
def bwd_gather(values, o, d, dep, hitm, g_depth):
    s = SdfGrid(values=values, meta=meta, oob_value=sdf.oob_value)
    pts = o + dep[..., None] * d
    i8, ww8, _, gg, ib = query.interpolation_stencil(s, pts)
    nvec = rotate_points(meta.origin_transform[:3, :3], gg)
    dF_dt = jnp.sum(nvec * d, axis=-1)
    safe = jnp.where(jnp.abs(dF_dt) > 1e-6, dF_dt,
                     jnp.where(dF_dt >= 0, 1e-6, -1e-6))
    scale = jnp.where(hitm & ib, -g_depth / safe, 0.0)
    dv = (jnp.zeros(values.size, values.dtype)
          .at[i8.reshape(-1)].add((ww8 * scale[..., None]).reshape(-1), mode="drop"))
    return jnp.sum(dv)

g_dep = 2.0 * depth0  # cotangent of sum(depth^2)
fC1 = jax.jit(bwd_gather)
tC1, _ = timed(fC1, sdf.values, origins, dirs, depth0, hit0, g_dep)
print(f"C1 backward alone, gathered stencil:      {tC1*1e3:7.1f} ms", flush=True)

# ---- C2: backward with EMITTED corners (idx8/w8/grad passed in) ----------
def bwd_emitted(values, d, i8, ww8, gg, ib, hitm, g_depth):
    nvec = rotate_points(meta.origin_transform[:3, :3], gg)
    dF_dt = jnp.sum(nvec * d, axis=-1)
    safe = jnp.where(jnp.abs(dF_dt) > 1e-6, dF_dt,
                     jnp.where(dF_dt >= 0, 1e-6, -1e-6))
    scale = jnp.where(hitm & ib, -g_depth / safe, 0.0)
    dv = (jnp.zeros(values.size, values.dtype)
          .at[i8.reshape(-1)].add((ww8 * scale[..., None]).reshape(-1), mode="drop"))
    return jnp.sum(dv)

fC2 = jax.jit(bwd_emitted)
tC2, _ = timed(fC2, sdf.values, dirs, idx8, w8, grad_grid, in_b, hit0, g_dep)
print(f"C2 backward with FREE emitted corners:    {tC2*1e3:7.1f} ms", flush=True)

# ---- C3: the scatter-add alone -------------------------------------------
contrib = w8 * (2.0 * depth0)[..., None]
fC3 = jax.jit(
    lambda i8, cc: jnp.sum(
        jnp.zeros(n * n * n, jnp.float32).at[i8.reshape(-1)].add(
            cc.reshape(-1), mode="drop"
        )
    )
)
tC3, _ = timed(fC3, idx8, contrib)
print(f"C3 scatter-add alone (8M updates):        {tC3*1e3:7.1f} ms", flush=True)

best = tA + tC2
cur = tB
print("-" * 60)
print(f"current fwd+bwd: {cur*1e3:.1f} ms = {h*w/cur/1e6:.2f} Mrays/s")
print(f"emission bound (A + C2, zero-cost emission): {best*1e3:.1f} ms = "
      f"{h*w/best/1e6:.2f} Mrays/s")
print(f"gather half eliminated by emission: {max(tC1-tC2,0)*1e3:.1f} ms; "
      f"scatter half (C3) remains: {tC3*1e3:.1f} ms")
