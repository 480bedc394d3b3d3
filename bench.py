"""Benchmark: two-field exact EDT at 512^3 on one TPU chip.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline", ...extras}.

The metric is end-to-end signed-field throughput (both EDT fields + combine)
in voxels/s on the BASELINE scene class (random spheres, ~8% fill).

vs_baseline: the reference (UM-ARM-Lab/sdf_tools) publishes no numbers and
its ROS/catkin stack cannot be built here, so the baseline is
scipy.ndimage.distance_transform_edt — a C implementation of the same exact
separable-EDT algorithm class, run twice (two fields) single-threaded on
this machine's CPU, which is strictly FASTER than the reference's Python
binding path (utils_3d.py per-voxel SetValue loop + bucket-queue).
"""
from __future__ import annotations

import json
import time

import numpy as np


def make_scene(n: int, seed: int = 0) -> np.ndarray:
    rng = np.random.default_rng(seed)
    c = rng.uniform(0, n, (40, 3))
    r = rng.uniform(n * 0.03, n * 0.12, 40)
    ii = np.arange(n)
    mask = np.zeros((n, n, n), bool)
    for k in range(40):
        x2 = (ii - c[k, 0]) ** 2
        y2 = (ii - c[k, 1]) ** 2
        z2 = (ii - c[k, 2]) ** 2
        mask |= (x2[:, None, None] + y2[None, :, None] + z2[None, None, :]) <= r[k] ** 2
    return mask


def _spread(times):
    """{median, min, max} of a timing list (seconds)."""
    return {
        "median": float(np.median(times)),
        "min": float(np.min(times)),
        "max": float(np.max(times)),
    }


def bench_tpu(mask: np.ndarray, repeats: int = 5) -> dict:
    import jax
    import jax.numpy as jnp

    from sdf_tools_tpu.ops import edt

    backend = "pallas" if jax.default_backend() in ("tpu", "axon") else "stencil"
    m = jnp.asarray(mask)
    # Timing MUST fetch a host scalar derived from the full result:
    # block_until_ready() through the axon tunnel does not wait for device
    # completion (measured: 20 chained 512^3 passes "finish" in 0.1 ms, far
    # below the HBM floor). A jnp.sum reduced on device + float() fetch
    # forces true completion and adds only ~1 HBM pass.
    f = jax.jit(
        lambda mm: jnp.sum(edt.signed_field_from_masks(mm, 0.05, backend=backend)[0])
    )
    _ = float(f(m))  # compile + warm
    times = []
    for _ in range(repeats):
        t0 = time.perf_counter()
        _ = float(f(m))
        times.append(time.perf_counter() - t0)
    return _spread(times)


def bench_cpu_baseline(mask: np.ndarray) -> float:
    from scipy import ndimage

    t0 = time.perf_counter()
    d_free = ndimage.distance_transform_edt(~mask)  # distance to filled
    d_fill = ndimage.distance_transform_edt(mask)  # distance to free
    _ = (d_free - d_fill).astype(np.float32)
    return time.perf_counter() - t0


def bench_render(mask: np.ndarray, repeats: int = 3):
    """Sphere-trace rays/s over the 512^3 SDF (BASELINE config #4)."""
    import jax
    import jax.numpy as jnp

    from sdf_tools_tpu.grid import GridMeta, make_origin_transform
    from sdf_tools_tpu.ops import edt, render

    n = mask.shape[0]
    res = 0.05
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
    # scalar-fetch timing: see bench_tpu for why block_until_ready is not
    # sufficient through the axon tunnel
    # origins/dirs passed as ARGS: closing over device arrays constant-folds
    # them into the AOT compile (observed to miscompute scatter patterns)
    f = jax.jit(
        lambda s, o, d: jnp.mean(
            render.render_depth(
                s, o, d, t_max=4.0 * n * res, max_steps=64
            ).depth
        )
    )
    mean_depth = float(f(sdf, origins, dirs))  # compile + warm
    times = []
    for _ in range(repeats):
        t0 = time.perf_counter()
        mean_depth = float(f(sdf, origins, dirs))
        times.append(time.perf_counter() - t0)
    return _spread(times), h * w, mean_depth


def bench_render_bwd(mask: np.ndarray, repeats: int = 3):
    """Backward throughput of the depth render (BASELINE config #4 'with
    pixel gradients'): value_and_grad of a depth loss through
    sphere_trace_depth's IFT custom_vjp, gradients w.r.t. the SDF values.
    The forward inside uses the same backend='auto' as bench_render."""
    import jax
    import jax.numpy as jnp

    from sdf_tools_tpu.grid import GridMeta, make_origin_transform
    from sdf_tools_tpu.ops import edt, render

    n = mask.shape[0]
    res = 0.05
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

    from sdf_tools_tpu.grid import SdfGrid

    def loss(values, o, d):
        s = SdfGrid(values=values, meta=meta, oob_value=sdf.oob_value)
        r = render.render_depth(s, o, d, t_max=4.0 * n * res, max_steps=64)
        return jnp.sum(r.depth**2)

    # scalar-fetch timing (docs/NOTES.md §8): sum the gradient on device;
    # rays passed as args (closure constant-folding hazard, see bench_render)
    # value_and_grad shares ONE forward between value and gradient — the
    # previous grad(loss) + loss(...) form relied on XLA CSE to merge the
    # two forward subgraphs, which is not guaranteed across a custom_vjp
    vg = jax.value_and_grad(loss)

    def _vg_scalar(v, o, d):
        val, g = vg(v, o, d)
        return val + jnp.sum(g)

    f = jax.jit(_vg_scalar)
    _ = float(f(sdf.values, origins, dirs))
    times = []
    for _ in range(repeats):
        t0 = time.perf_counter()
        _ = float(f(sdf.values, origins, dirs))
        times.append(time.perf_counter() - t0)
    return _spread(times), h * w


def bench_edt_bwd(mask: np.ndarray, repeats: int = 3):
    """Backward throughput of the differentiable EDT (feature-transform
    surrogate, ops/diff.sdf_from_occupancy_ft): value_and_grad of a field
    loss w.r.t. soft occupancy."""
    import jax
    import jax.numpy as jnp

    from sdf_tools_tpu.ops import diff

    backend = "pallas" if jax.default_backend() in ("tpu", "axon") else "stencil"
    occ = jnp.asarray(mask, jnp.float32) * 0.9 + 0.05

    def loss(o):
        vals = diff.sdf_from_occupancy_ft(o, 0.05, backend)
        return jnp.sum(vals**2)

    f = jax.jit(lambda o: jnp.sum(jax.grad(loss)(o)))
    _ = float(f(occ))
    times = []
    for _ in range(repeats):
        t0 = time.perf_counter()
        _ = float(f(occ))
        times.append(time.perf_counter() - t0)
    return _spread(times)


def _measure_all(mask, child: bool):
    """One process's measurements. Child processes measure only the two
    headline metrics (EDT forward + render forward) to bound wall time."""
    out = {"edt": bench_tpu(mask, repeats=5)}
    sp_r, rays, _ = bench_render(mask, repeats=5)
    out["render"] = sp_r
    out["rays"] = rays
    if not child:
        sp_rb, rays_b = bench_render_bwd(mask)
        out["render_bwd"] = sp_rb
        out["rays_bwd"] = rays_b
        out["edt_bwd"] = bench_edt_bwd(mask)
    return out


def main():
    import os
    import subprocess
    import sys

    n = int(os.environ.get("SDFT_BENCH_N", "512"))  # test hook; driver: 512
    mask = make_scene(n)
    if "--child" in sys.argv:
        print("CHILD " + json.dumps(_measure_all(mask, child=True)))
        return

    m = _measure_all(mask, child=False)

    # SECOND PROCESS (fresh jit caches, fresh tunnel session): round-4's
    # driver-captured numbers differed ~7% from the builder's in-process
    # numbers; cross-process spread is part of the honest error bar.
    proc2 = None
    try:
        r = subprocess.run(
            [sys.executable, __file__, "--child"],
            capture_output=True, text=True, timeout=3600,
        )
        for line in r.stdout.splitlines():
            if line.startswith("CHILD "):
                proc2 = json.loads(line[6:])
    except Exception:
        proc2 = None

    t_tpu = m["edt"]["median"]
    vox_per_s = n**3 / t_tpu
    rays_per_s = m["rays"] / m["render"]["median"]

    # CPU baseline at 256^3 extrapolated to 512^3 (8x voxels, same per-voxel
    # cost for this algorithm class) to keep bench wall time bounded.
    nb = 256
    t_cpu = bench_cpu_baseline(make_scene(nb)) * (n**3 / nb**3)

    # Honest compute roofline for this algorithm family (docs/NOTES.md §14):
    # exact EDT on a lockstep ISA is COMPUTE-bound at Omega(N * D_eff) VPU
    # ops; ~0.11-0.15 s at 512^3 with perfect lowering. The HBM floor
    # (2 fields x 3 passes x rd+wr) is unreachable by ~12x for ANY exact
    # method expressible on this ISA and is reported only for context.
    hbm_floor_s = 2 * 3 * 2 * 4 * n**3 / 800e9
    compute_roofline_s = 0.13

    def rel_spread(sp):
        return round((sp["max"] - sp["min"]) / sp["median"], 4)

    result = {
        "metric": f"edt_{n}_voxels_per_s",
        "value": round(vox_per_s, 1),
        "unit": "voxel/s",
        "vs_baseline": round(t_cpu / t_tpu, 2),
        "tpu_seconds": round(t_tpu, 4),
        "tpu_seconds_minmax": [round(m["edt"]["min"], 4), round(m["edt"]["max"], 4)],
        "render_rays_per_s": round(rays_per_s, 1),
        "render_seconds_1Mray": round(m["render"]["median"], 4),
        "render_seconds_minmax": [
            round(m["render"]["min"], 4), round(m["render"]["max"], 4)
        ],
        "render_bwd_rays_per_s": round(m["rays_bwd"] / m["render_bwd"]["median"], 1),
        "render_bwd_seconds_1Mray": round(m["render_bwd"]["median"], 4),
        "edt_bwd_voxels_per_s": round(n**3 / m["edt_bwd"]["median"], 1),
        "edt_bwd_seconds": round(m["edt_bwd"]["median"], 4),
        "cpu_baseline_seconds_extrapolated": round(t_cpu, 2),
        "hbm_roofline_seconds": round(hbm_floor_s, 4),
        "compute_roofline_seconds": compute_roofline_s,
        "edt_rel_spread_inproc": rel_spread(m["edt"]),
        "render_rel_spread_inproc": rel_spread(m["render"]),
        "scene": f"{n}^3 random spheres, fill={mask.mean():.3f}",
    }
    if proc2 is not None:
        t2 = proc2["edt"]["median"]
        r2 = proc2["rays"] / proc2["render"]["median"]
        result["tpu_seconds_proc2"] = round(t2, 4)
        result["render_rays_per_s_proc2"] = round(r2, 1)
        result["edt_cross_process_rel"] = round(abs(t2 - t_tpu) / t_tpu, 4)
        result["render_cross_process_rel"] = round(
            abs(r2 - rays_per_s) / rays_per_s, 4
        )
    print(json.dumps(result))


if __name__ == "__main__":
    main()
