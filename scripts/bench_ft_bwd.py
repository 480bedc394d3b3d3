#!/usr/bin/env python
"""EDT feature-transform backward: component cost split at 512^3.

Times (scalar-fetch discipline, docs/NOTES.md §8):
  * full _ft_bwd path (what bench.py's edt_bwd measures),
  * the two feature transforms alone (line-seed + 2 argmin envelopes each),
  * winner-composition gathers alone,
  * the final 134M-element scatter-add alone.

Usage: python scripts/bench_ft_bwd.py [n] [backend]
"""
import sys
import time

sys.path.insert(0, "/root/repo")

import numpy as np
import jax
import jax.numpy as jnp

from bench import make_scene
from sdf_tools_tpu.ops import diff, edt, feature


def timeit(fn, *args, repeats=3):
    _ = float(fn(*args))
    ts = []
    for _i in range(repeats):
        t0 = time.perf_counter()
        _ = float(fn(*args))
        ts.append(time.perf_counter() - t0)
    return float(np.median(ts))


def main():
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 512
    backend = sys.argv[2] if len(sys.argv) > 2 else "auto"
    mask_np = make_scene(n)
    mask = jnp.asarray(mask_np)
    occ = jnp.asarray(mask_np, jnp.float32) * 0.9 + 0.05
    print(f"{n}^3, backend={backend} -> {edt.resolve_backend(backend)}", flush=True)

    # full backward (grad of sum(sdf^2) w.r.t. occupancy)
    def loss(o):
        return jnp.sum(diff.sdf_from_occupancy_ft(o, 0.05, backend) ** 2)

    t_full = timeit(jax.jit(lambda o: jnp.sum(jax.grad(loss)(o))), occ)
    print(f"full fwd+bwd: {t_full:.3f}s ({n**3/t_full/1e6:.1f} Mvox/s)", flush=True)

    # forward alone (so bwd-only = full - fwd)
    t_fwd = timeit(jax.jit(loss), occ)
    print(f"forward alone: {t_fwd:.3f}s", flush=True)

    # one feature transform (filled seeds)
    ftj = jax.jit(lambda m: feature.feature_transform(m, backend))
    t_ft = timeit(lambda m: jnp.sum(ftj(m)[0]), mask)
    print(f"feature_transform x1: {t_ft:.3f}s", flush=True)

    # envelope-argmin passes only (no compose gathers)
    def ft_no_compose(m):
        d, x0 = feature._line_seed_x(m)
        no_seed = d >= jnp.int32(1 << 24)
        f = jnp.where(no_seed, jnp.int32(edt.INF_D2), d * d).astype(jnp.int32)
        if edt.resolve_backend(backend) == "pallas":
            from sdf_tools_tpu.ops import edt_pallas

            interp = jax.default_backend() not in ("tpu", "axon")
            f, jy = edt_pallas.envelope_argmin_pallas(f, 1, interpret=interp)
            f, jz = edt_pallas.envelope_argmin_pallas(f, 2, interpret=interp)
        else:
            f, jy = feature._envelope_argmin(f, 1)
            f, jz = feature._envelope_argmin(f, 2)
        return jnp.sum(f) + jnp.sum(jy) + jnp.sum(jz) + jnp.sum(x0)

    t_env = timeit(jax.jit(ft_no_compose), mask)
    print(f"  argmin passes only: {t_env:.3f}s  (compose gathers ~ {t_ft - t_env:.3f}s)",
          flush=True)

    # plain envelope passes (no argmin) for reference
    t_plain = timeit(
        jax.jit(lambda m: jnp.sum(edt.squared_edt(m, backend=backend))), mask
    )
    print(f"  plain squared_edt: {t_plain:.3f}s", flush=True)

    # scatter-add alone: route a dense cotangent through precomputed features
    d2f, featf = ftj(mask)
    flat = ((featf[..., 0] * n + featf[..., 1]) * n + featf[..., 2]).reshape(-1)
    g = jnp.ones((n, n, n), jnp.float32)

    def scat(fl, gg):
        return jnp.sum(
            jnp.zeros(n * n * n, jnp.float32).at[fl].add(gg.reshape(-1), mode="drop")
        )

    t_scat = timeit(jax.jit(scat), flat, g)
    print(f"scatter-add 134M x1: {t_scat:.3f}s", flush=True)


if __name__ == "__main__":
    main()
