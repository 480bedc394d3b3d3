"""Sphere-traced ray-march renderer over an SdfGrid, with implicit-function
differentiation.

New capability mandated by BASELINE.json ("sphere-traced ray-march renderer
... so pixel gradients flow back to voxel occupancy/point positions"); the
reference has only rviz marker export (SURVEY.md C7g).

Design:
  * Forward: lockstep sphere tracing under ``lax.while_loop`` — every ray
    advances ``t += max(d, min_step)`` until ``|d| < eps``, ``t > t_max``, or
    the ray leaves alive-set; masked updates keep all rays in SIMD lockstep.
  * Backward: reverse-mode through a while_loop is undefined, so depth is
    wrapped in a ``custom_vjp`` using the implicit function theorem: at a hit,
    F(t*, values) = d(o + t* v; values) - eps = 0, hence
    dt*/dtheta = -(dd/dtheta) / (grad d . v). Exact for converged hits, one
    cheap vjp of estimate_distance — no unrolled tape.
"""
from __future__ import annotations

from functools import partial
from typing import NamedTuple, Tuple

import jax
import jax.numpy as jnp
from jax import lax

from ..grid import SdfGrid
from . import query

Array = jax.Array


class RenderResult(NamedTuple):
    depth: Array  # [...]: hit distance along the ray, t_max where missed
    hit: Array  # [...] bool
    steps: Array  # [...] int32 iterations used (diagnostics)


def _trace_depth(
    values: Array,
    sdf: SdfGrid,
    origins: Array,
    directions: Array,
    t_min: float,
    t_max: float,
    eps: float,
    max_steps: int,
    min_step,
) -> Tuple[Array, Array, Array]:
    s = SdfGrid(values=values, meta=sdf.meta, oob_value=sdf.oob_value)
    o = origins
    v = directions

    # Analytic ray/AABB intersection in grid frame: skip straight to the grid
    # entry (no wasted marching, no tunneling through the first cells).
    og = s.meta.world_to_grid(o)
    rot = s.meta.inv_origin_transform[:3, :3].astype(v.dtype)
    vg = v @ rot.T
    sizes = s.meta.sizes.astype(og.dtype)
    safe_v = jnp.where(jnp.abs(vg) > 1e-12, vg, 1e-12)
    t_a = (0.0 - og) / safe_v
    t_b = (sizes - og) / safe_v
    t_entry = jnp.max(jnp.minimum(t_a, t_b), axis=-1)
    t_exit = jnp.min(jnp.maximum(t_a, t_b), axis=-1)
    misses_box = (t_entry > t_exit) | (t_exit < t_min)

    # March at no less than half a cell per step: the SDF is only accurate to
    # the grid anyway, and creeping (the naive min_step ~ eps) makes grazing
    # rays take hundreds of 8-gather estimate_distance evaluations. Any
    # overshoot past the surface is repaired by bisection refinement below,
    # which recovers the crossing to ~min_step/2^6.
    ms = s.resolution * 0.5 if min_step is None else min_step

    def dist_at(t):
        d, ok = query.estimate_distance(s, o + t[..., None] * v)
        # transiently outside (entry/exit skin): creep at one cell per step
        step = jnp.where(ok, d, s.resolution)
        return step, d, ok

    t0 = jnp.maximum(jnp.full(o.shape[:-1], t_min, o.dtype), t_entry)

    # ---- coarse empty-space skipping phase -------------------------------
    # A min-pooled SDF level (factor^3 blocks, one-block overlap, minus the
    # half-cell diagonal slack) is a true LOWER bound of the SDF anywhere in
    # the block, so stepping by it preserves the sphere-tracing invariant.
    # One cheap gather into a ~(n/8)^3 array replaces ~8x as many fine
    # 8-corner evaluations while rays cross open space.
    factor = 8
    nx, ny, nz = s.meta.shape
    if min(nx, ny, nz) >= 4 * factor:
        window = factor + 2
        pooled = lax.reduce_window(
            values,
            jnp.inf,
            lax.min,
            (window, window, window),
            (factor, factor, factor),
            [(1, window - 1), (1, window - 1), (1, window - 1)],
        )
        slack = s.resolution * 0.87
        coarse = pooled - slack
        c_shape = jnp.asarray(coarse.shape, jnp.int32)
        inv_c = 1.0 / (s.resolution * factor)

        def coarse_at(t):
            g = s.meta.world_to_grid(o + t[..., None] * v)
            ci = jnp.floor(g * inv_c).astype(jnp.int32)
            ok = jnp.all((ci >= 0) & (ci < c_shape), axis=-1)
            ci = jnp.clip(ci, 0, c_shape - 1)
            d = coarse[ci[..., 0], ci[..., 1], ci[..., 2]]
            return jnp.where(ok, d, s.resolution * factor)

        switch = 2.0 * s.resolution  # hand off to the fine march below this

        def c_cond(state):
            t, alive, k = state
            return jnp.logical_and(jnp.any(alive), k < max_steps)

        def c_body(state):
            t, alive, k = state
            dc = coarse_at(t)
            can_skip = dc > switch
            step = jnp.maximum(dc, s.resolution)
            t_new = jnp.where(alive & can_skip, t + step, t)
            out = (t_new > t_max) | (t_new > t_exit + s.resolution)
            alive_new = alive & can_skip & ~out
            return t_new, alive_new, k + 1

        t0, _, _ = lax.while_loop(
            c_cond, c_body, (t0, jnp.ones(t0.shape, bool) & ~misses_box, jnp.int32(0))
        )

    d0, _, _ = dist_at(t0)

    def cond(state):
        t, t_prev, d, alive, steps = state
        return jnp.logical_and(jnp.any(alive), steps < max_steps)

    def body(state):
        t, t_prev, d, alive, steps = state
        step = jnp.maximum(d, ms)
        t_new = jnp.where(alive, t + step, t)
        t_prev_new = jnp.where(alive, t, t_prev)
        step_d, real_d, ok = dist_at(t_new)
        hit = ok & (real_d < eps)
        out = (t_new > t_max) | (t_new > t_exit + s.resolution)
        alive_new = alive & ~hit & ~out
        return t_new, t_prev_new, jnp.where(alive, step_d, d), alive_new, steps + 1

    alive0 = jnp.ones(t0.shape, bool) & ~misses_box
    t, t_prev, d, alive, steps = lax.while_loop(
        cond, body, (t0, t0, d0, alive0, jnp.int32(0))
    )
    _, d_final, ok_final = dist_at(t)
    hit = ok_final & (d_final < eps) & (t <= t_max) & ~misses_box

    # bisection refinement: the crossing lies in [t_prev, t] for hit rays
    def refine(_, bounds):
        lo, hi = bounds
        mid = 0.5 * (lo + hi)
        _, d_mid, _ = dist_at(mid)
        outside = d_mid > 0.0
        return jnp.where(outside, mid, lo), jnp.where(outside, hi, mid)

    lo, hi = lax.fori_loop(0, 6, refine, (t_prev, t))
    t_refined = jnp.where(hit, hi, t)

    depth = jnp.where(hit, t_refined, t_max)
    return depth, hit, jnp.broadcast_to(steps, t.shape)


@partial(jax.custom_vjp, nondiff_argnums=(4, 5, 6, 7, 8))
def sphere_trace_depth(
    values: Array,
    meta_and_oob,
    origins: Array,
    directions: Array,
    t_min: float,
    t_max: float,
    eps: float,
    max_steps: int,
    min_step: float,
):
    meta, oob = meta_and_oob
    sdf = SdfGrid(values=values, meta=meta, oob_value=oob)
    depth, hit, steps = _trace_depth(
        values, sdf, origins, directions, t_min, t_max, eps, max_steps, min_step
    )
    return depth, hit


def _std_fwd(values, meta_and_oob, origins, directions, t_min, t_max, eps, max_steps, min_step):
    depth, hit = sphere_trace_depth(
        values, meta_and_oob, origins, directions, t_min, t_max, eps, max_steps, min_step
    )
    return (depth, hit), (values, meta_and_oob, origins, directions, depth, hit)


def _std_bwd(t_min, t_max, eps, max_steps, min_step, residuals, cotangents):
    values, meta_and_oob, origins, directions, depth, hit = residuals
    g_depth, _ = cotangents  # no gradient through the boolean hit mask
    meta, oob = meta_and_oob
    sdf = SdfGrid(values=values, meta=meta, oob_value=oob)

    # Implicit function theorem at the hit surface:
    #   F(t, values, o, v) = d(o + t v; values) = eps
    #   dt/dvalues = -(dd/dvalues) / (grad d . v), similarly for o and v.
    def dist_fn(vals, o, v, t):
        s = SdfGrid(values=vals, meta=meta, oob_value=oob)
        d, _ = query.estimate_distance(s, o + t[..., None] * v)
        return d

    hit_pts = origins + depth[..., None] * directions
    n = query.autodiff_gradient(sdf, hit_pts)  # world-frame surface gradient
    dF_dt = jnp.sum(n * directions, axis=-1)
    # guard near-tangent rays; sign convention: marching outside-in, dF_dt < 0
    safe = jnp.where(jnp.abs(dF_dt) > 1e-6, dF_dt, jnp.where(dF_dt >= 0, 1e-6, -1e-6))
    scale = jnp.where(hit, -g_depth / safe, 0.0)

    _, vjp = jax.vjp(dist_fn, values, origins, directions, depth)
    d_values, d_origins, d_directions, d_t = vjp(scale)
    zero_meta = jax.tree_util.tree_map(jnp.zeros_like, meta_and_oob)
    return d_values, zero_meta, d_origins, d_directions


sphere_trace_depth.defvjp(_std_fwd, _std_bwd)


def render_depth(
    sdf: SdfGrid,
    origins: Array,
    directions: Array,
    t_min: float = 0.0,
    t_max: float = 10.0,
    eps: float = 1e-3,
    max_steps: int = 256,
    min_step: float | None = None,
) -> RenderResult:
    """Sphere-trace depth for rays (origins, directions) -> RenderResult.

    Differentiable w.r.t. ``sdf.values``, ``origins`` and ``directions`` via
    the implicit function theorem (missed rays get zero gradient).
    """
    depth, hit = sphere_trace_depth(
        sdf.values,
        (sdf.meta, sdf.oob_value),
        jnp.asarray(origins),
        jnp.asarray(directions),
        t_min,
        t_max,
        eps,
        max_steps,
        min_step,
    )
    return RenderResult(depth=depth, hit=hit, steps=jnp.zeros_like(depth, jnp.int32))


def camera_rays(
    camera_pos: Array,
    look_at: Array,
    up: Array,
    fov_deg: float,
    height: int,
    width: int,
) -> Tuple[Array, Array]:
    """Pinhole camera ray bundle: returns (origins [h,w,3], directions [h,w,3])."""
    pos = jnp.asarray(camera_pos, jnp.float32)
    fwd = jnp.asarray(look_at, jnp.float32) - pos
    fwd = fwd / jnp.linalg.norm(fwd)
    upv = jnp.asarray(up, jnp.float32)
    right = jnp.cross(fwd, upv)
    right = right / jnp.linalg.norm(right)
    true_up = jnp.cross(right, fwd)
    aspect = width / height
    tan_half = jnp.tan(jnp.deg2rad(fov_deg) / 2.0)
    ys = jnp.linspace(1.0, -1.0, height) * tan_half
    xs = jnp.linspace(-1.0, 1.0, width) * tan_half * aspect
    dirs = (
        fwd[None, None, :]
        + xs[None, :, None] * right[None, None, :]
        + ys[:, None, None] * true_up[None, None, :]
    )
    dirs = dirs / jnp.linalg.norm(dirs, axis=-1, keepdims=True)
    origins = jnp.broadcast_to(pos, dirs.shape)
    return origins, dirs
