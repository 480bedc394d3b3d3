#!/usr/bin/env python
"""BASELINE conformance manifest: the five validation configs
(BASELINE.md `configs`) as ONE command emitting ONE JSON of PASS/metrics.

  #1  256^2 2D image SDF through the utils_2d/test_bindings path vs the
      native exact-EDT oracle.
  #2  64^3 tutorial CollisionMap -> SDF: d^2 bit-equal to the C++ oracle,
      combine within f32 rounding of the f64 math.
  #3  pointcloud -> voxelize -> SDF + trilinear distance/gradient queries vs
      the scalar f64 oracle (estimate_distance_test semantics).
  #4  512^3 SDF (bit-exact + the reference's only-upward deviation pinned) +
      sphere-traced depth + pixel gradients FD-checked (single chip).
  #5  multichip dry run: the full sharded train step on an 8-device mesh
      (both (dp,x) and (dp,x,y) layouts), no volume-sized collectives.

On a CPU-only host configs #3/#4 shrink (noted in the record); run on the
real chip for the BASELINE-scale evidence. Writes BASELINE_VALIDATION.json.
"""
import json
import os
import subprocess
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp

ON_TPU = jax.default_backend() in ("tpu", "axon")
BACKEND = "pallas" if ON_TPU else "stencil"
records = []


def record(config, ok, **metrics):
    rec = {"config": config, "pass": bool(ok), **metrics}
    records.append(rec)
    print(json.dumps(rec), flush=True)


def config1_image_2d():
    from sdf_tools_tpu import native, utils_2d

    n = 256
    rng = np.random.default_rng(3)
    img = np.zeros((n, n), np.uint8)
    for _ in range(12):
        y, x = rng.integers(16, n - 16, 2)
        h, w = rng.integers(4, 24, 2)
        img[y : y + h, x : x + w] = 1
    t0 = time.time()
    sdf, grad = utils_2d.compute_sdf_and_gradient(img, 1.0, [0.0, 0.0])
    dt = time.time() - t0
    # oracle: exact C++ EDT on the [x, y, 1] grid, reference combine
    occ = (img.T == 1)[:, :, None]
    d_to_fill = np.sqrt(native.edt_exact(occ).astype(np.float64))
    d_to_free = np.sqrt(native.edt_exact(~occ).astype(np.float64))
    # positive outside = distance to the filled set; negative inside
    want = (d_to_fill - d_to_free)[:, :, 0].T  # [y, x]
    err = float(np.abs(sdf - want).max())
    inside_neg = bool((sdf[img == 1] < 0).all())
    outside_pos = bool((sdf[img == 0] > 0).all())
    gnorm_interior = np.linalg.norm(grad, axis=-1)[8:-8, 8:-8]
    ok = err < 1e-4 and inside_neg and outside_pos
    record(
        "1_image_sdf_256",
        ok,
        max_abs_err_vs_oracle=err,
        inside_negative=inside_neg,
        outside_positive=outside_pos,
        grad_norm_mean=float(gnorm_interior.mean()),
        seconds=round(dt, 3),
    )


def config2_tutorial_64():
    from sdf_tools_tpu import collision_map_ops as cmo, native
    from sdf_tools_tpu.grid import CollisionMap, GridMeta, make_origin_transform
    from sdf_tools_tpu.ops import edt

    n, res = 64, 0.25  # tutorial semantics (10 m span), BASELINE size 64^3
    meta = GridMeta.create(make_origin_transform([0.0, 0.0, 0.0]), res, (n,) * 3)
    occ = np.zeros((n, n, n), np.float32)
    occ[8:24, 8:24, 8:24] = 1.0  # tutorial's box obstacle
    occ[40:56, 32:48, 8:40] = 1.0
    cmap = CollisionMap.create(occ, meta)
    t0 = time.time()
    sdf, (mx, mn) = cmo.extract_sdf(cmap, oob_value=np.inf, backend=BACKEND)
    dt = time.time() - t0
    mask = occ > 0.5
    d2f = native.edt_exact(mask)
    d2e = native.edt_exact(~mask)
    got_d2f = np.asarray(edt.squared_edt(jnp.asarray(mask), backend=BACKEND))
    mism = int((got_d2f.astype(np.int64) != d2f).sum())
    want = (np.sqrt(d2f.astype(np.float64)) - np.sqrt(d2e.astype(np.float64))) * res
    got = np.asarray(sdf.values)
    finite = np.isfinite(want)
    ulp = (
        np.abs(got - want.astype(np.float32))[finite]
        / np.maximum(np.abs(want[finite]), 1e-12)
        / np.finfo(np.float32).eps
    )
    max_ulp = float(ulp.max())
    ok = mism == 0 and max_ulp <= 4.0
    record(
        "2_tutorial_collision_map_64",
        ok,
        d2_mismatches=mism,
        combine_max_ulp_vs_f64=round(max_ulp, 2),
        max_distance=float(mx),
        min_distance=float(mn),
        seconds=round(dt, 3),
    )


def config3_pointcloud_queries():
    from sdf_tools_tpu.grid import GridMeta, make_origin_transform
    from sdf_tools_tpu.ops import edt, query, voxelize
    from sdf_tools_tpu.oracle.reference_query import OracleSdf

    n = 256 if ON_TPU else 96
    res = 0.02
    rng = np.random.default_rng(0)
    cloud = np.concatenate(
        [
            rng.uniform(0.2 * n * res, 0.5 * n * res, (6000, 3)),
            rng.uniform(0.6 * n * res, 0.9 * n * res, (6000, 3)),
        ]
    ).astype(np.float32)
    meta = GridMeta.create(make_origin_transform([0.0, 0.0, 0.0]), res, (n,) * 3)
    t0 = time.time()
    occ = voxelize.voxelize_points(jnp.asarray(cloud), meta)
    sdf, _ = edt.extract_signed_distance_field(
        occ > 0.5, meta, oob_value=-10000.0, backend=BACKEND
    )
    dt = time.time() - t0
    oracle = OracleSdf(
        np.asarray(sdf.values), res, np.eye(4, dtype=np.float64), -10000.0
    )
    pts = rng.uniform(-0.1, n * res + 0.1, size=(200, 3)).astype(np.float32)
    vals, oks = query.estimate_distance(sdf, jnp.asarray(pts))
    vals, oks = np.asarray(vals), np.asarray(oks)
    gi = meta.location_to_index(jnp.asarray(pts))
    grads, gvalid = query.gradient(sdf, gi, enable_edge_gradients=True)
    grads = np.asarray(grads)
    bad_val = bad_flag = bad_grad = 0
    for k in range(len(pts)):
        ov, ook = oracle.estimate_distance(pts[k].astype(np.float64))
        if bool(oks[k]) != ook:
            bad_flag += 1
        elif ook and not np.allclose(vals[k], ov, rtol=2e-4, atol=2e-5):
            bad_val += 1
        if bool(np.asarray(gvalid)[k]):
            gik = np.asarray(gi)[k]
            og = oracle.gradient(
                int(gik[0]), int(gik[1]), int(gik[2]), enable_edge_gradients=True
            )
            if og is not None and not np.allclose(
                grads[k], og, rtol=2e-3, atol=2e-4
            ):
                bad_grad += 1
    ok = bad_val == 0 and bad_flag == 0 and bad_grad == 0
    record(
        "3_pointcloud_queries",
        ok,
        grid_n=n,
        bad_distance=bad_val,
        bad_bounds_flag=bad_flag,
        bad_gradient=bad_grad,
        n_query_points=len(pts),
        seconds_build=round(dt, 3),
    )


def config4_sdf_render_512():
    import bench
    from sdf_tools_tpu import native
    from sdf_tools_tpu.grid import GridMeta, SdfGrid, make_origin_transform
    from sdf_tools_tpu.ops import edt, render

    n = 512 if ON_TPU else 64
    res = 0.05
    mask = bench.make_scene(n)
    meta = GridMeta.create(make_origin_transform([0.0, 0.0, 0.0]), res, (n,) * 3)

    t0 = time.time()
    d2 = np.asarray(
        jax.jit(lambda m: edt.squared_edt(m, backend=BACKEND))(jnp.asarray(mask))
    )
    dt_edt = time.time() - t0
    exact = native.edt_exact(mask)
    mism = int((d2.astype(np.int64) != exact).sum())
    # pinned strict-parity property at the BASELINE bit-accuracy scale: the
    # reference's bucket-queue may only OVERESTIMATE (NOTES §2 / RESULTS)
    ref = native.edt_reference(mask)
    ref_only_up = bool((ref >= exact).all())
    ref_dev_rate = float((ref != exact).mean())

    sdf, _ = edt.extract_signed_distance_field(
        jnp.asarray(mask), meta, oob_value=1e3, backend=BACKEND
    )
    center = np.full(3, 0.5 * n * res)
    cam = center + np.array([-1.2 * n * res, 0.0, 0.4 * n * res])
    h = w = 1024 if ON_TPU else 128
    origins, dirs = render.camera_rays(
        jnp.asarray(cam, jnp.float32), jnp.asarray(center, jnp.float32),
        jnp.asarray([0.0, 0.0, 1.0]), 50.0, h, w,
    )
    t_max = 4.0 * n * res
    f = jax.jit(
        lambda s, o, d: jnp.mean(
            render.render_depth(s, o, d, t_max=t_max, max_steps=64).depth
        )
    )
    mean_depth = float(f(sdf, origins, dirs))
    t0 = time.time()
    mean_depth = float(f(sdf, origins, dirs))
    dt_render = time.time() - t0

    # pixel gradients: IFT-backward vs per-pixel/per-corner central finite
    # differences. The march's crossing refinement quantizes each depth in
    # ~res/8 staircase steps (measured), so (a) the probe eps must exceed a
    # step, (b) each pixel is probed at two eps values and the better one
    # counts (staircase phase), (c) agreement is a RATIO band, not allclose
    # in the strict sense — the analytic gradient is the true derivative of
    # the implicit surface, the forward is its staircase approximation
    # (same recipe/tolerances as tests/test_render.py:79).
    r0 = jax.jit(
        lambda s, o, d: render.render_depth(s, o, d, t_max=t_max, max_steps=64)
    )(sdf, origins, dirs)
    hits = np.argwhere(np.asarray(r0.hit))
    sel = hits[np.linspace(0, len(hits) - 1, 8).astype(int)]

    # pixel index is TRACED (a static index would recompile the 512^3 grad
    # render once per probe pixel — ~minutes each through the remote
    # compile tunnel)
    def pix_depth(values, pflat):
        s = SdfGrid(values=values, meta=meta, oob_value=sdf.oob_value)
        r = render.render_depth(s, origins, dirs, t_max=t_max, max_steps=64)
        return r.depth.reshape(-1)[pflat]

    dgrad = jax.jit(jax.grad(pix_depth))
    dval = jax.jit(pix_depth)
    ratios = []
    for py, px in sel:
        pflat = jnp.int32(int(py) * w + int(px))
        g = np.asarray(dgrad(sdf.values, pflat))
        c = np.unravel_index(np.abs(g).reshape(-1).argmax(), g.shape)
        ga = float(g[c])
        best = np.inf
        for eps in (0.2 * res, 0.4 * res):
            dp = float(dval(sdf.values.at[c].add(eps), pflat))
            dm = float(dval(sdf.values.at[c].add(-eps), pflat))
            fd = (dp - dm) / (2 * eps)
            if fd != 0.0 and np.sign(fd) == np.sign(ga):
                r = max(ga / fd, fd / ga)
                best = min(best, r)
        ratios.append(best)
    fd_ok = sum(1 for r in ratios if r < 2.5)
    ok = mism == 0 and ref_only_up and fd_ok >= 6
    record(
        "4_sdf_render_gradients",
        ok,
        grid_n=n,
        d2_mismatches=mism,
        reference_only_overestimates=ref_only_up,
        reference_deviation_rate=round(ref_dev_rate, 6),
        edt_seconds=round(dt_edt, 3),
        render_rays_per_s=round(h * w / dt_render, 1),
        mean_depth=round(mean_depth, 4),
        fd_gradient_agree=f"{fd_ok}/{len(ratios)}",
        fd_ratio_worst_per_pixel=[
            round(r, 3) if np.isfinite(r) else None for r in ratios
        ],
    )


def config5_multichip_dryrun():
    env = dict(os.environ)
    env.pop("PALLAS_AXON_POOL_IPS", None)
    env["JAX_PLATFORMS"] = "cpu"
    env["XLA_FLAGS"] = "--xla_force_host_platform_device_count=8"
    env["PYTHONPATH"] = "/root/repo"
    t0 = time.time()
    proc = subprocess.run(
        [sys.executable, "-c",
         "import __graft_entry__ as ge; ge.dryrun_multichip(8); print('ok')"],
        cwd="/root/repo", env=env, capture_output=True, text=True, timeout=1200,
    )
    ok = proc.returncode == 0 and "ok" in proc.stdout
    record(
        "5_multichip_dryrun",
        ok,
        n_devices=8,
        mesh_layouts="(dp,x) + (dp,x,y)",
        seconds=round(time.time() - t0, 1),
        stderr_tail="" if ok else proc.stderr[-400:],
    )


def main():
    t0 = time.time()
    config1_image_2d()
    config2_tutorial_64()
    config3_pointcloud_queries()
    config4_sdf_render_512()
    config5_multichip_dryrun()
    summary = {
        "manifest": "BASELINE validation configs 1-5",
        "device": jax.default_backend(),
        "all_pass": all(r["pass"] for r in records),
        "records": records,
        "total_seconds": round(time.time() - t0, 1),
    }
    out = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                       "BASELINE_VALIDATION.json")
    with open(out, "w") as fh:
        json.dump(summary, fh, indent=1)
    print(json.dumps({"all_pass": summary["all_pass"], "written": out}))


if __name__ == "__main__":
    main()
