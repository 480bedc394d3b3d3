"""Sharded end-to-end differentiable pipeline: the framework's flagship model.

BASELINE north star: *pointcloud -> voxelize -> two-field EDT -> SDF ->
sphere-traced depth -> loss -> gradients back to points*, sharded over a
device mesh. This module provides the jittable training step used by
``__graft_entry__.dryrun_multichip`` and by the scaling benchmarks.

Mesh layout:
  * ``dp``: data parallel over scenes (each dp row owns its scenes + point
    parameters; per-scene gradients need no cross-dp reduction, but the
    scalar loss is psum'd over dp for reporting).
  * ``x``:  the voxel volume is sharded along its x axis; the EDT runs with
    the boundary-summary collective (see parallel/sharded.py), the rendered
    image is row-sharded over the same axis, and point gradients are
    all-reduced over ``x`` (each shard holds a replica of the points and
    backprops its local contribution).
"""
from __future__ import annotations

from functools import partial
from typing import NamedTuple, Tuple

import jax
import jax.numpy as jnp
from jax import lax
from jax.sharding import Mesh, PartitionSpec as P

from ..grid import GridMeta, make_origin_transform
from ..ops import diff, render, voxelize
from . import sharded

Array = jax.Array


class PipelineConfig(NamedTuple):
    grid_n: int = 64  # cubic grid edge (must divide by mesh x size)
    resolution: float = 0.1
    image_h: int = 32  # must divide by mesh x size
    image_w: int = 32
    t_max: float = 20.0
    oob_value: float = 1e3
    lr: float = 1e-2
    edt_backend: str = "auto"
    fov_deg: float = 40.0


def _full_meta(cfg: PipelineConfig) -> GridMeta:
    n = cfg.grid_n
    return GridMeta.create(
        make_origin_transform([0.0, 0.0, 0.0]), cfg.resolution, (n, n, n)
    )


def _camera(cfg: PipelineConfig):
    n = cfg.grid_n
    center = jnp.full((3,), 0.5 * n * cfg.resolution)
    cam = center + jnp.asarray([-1.5 * n * cfg.resolution, 0.0, 0.0])
    return render.camera_rays(
        cam, center, jnp.asarray([0.0, 0.0, 1.0]), cfg.fov_deg, cfg.image_h, cfg.image_w
    )


def _forward_local(points: Array, cfg: PipelineConfig, axis_name: str = "x"):
    """Shard-local forward: returns this shard's rendered image rows.

    points: [N, 3] (replicated across the x axis). Runs inside shard_map.
    """
    n = cfg.grid_n
    n_dev = lax.axis_size(axis_name)
    idx = lax.axis_index(axis_name)
    nx_local = n // n_dev
    res = cfg.resolution

    # shard-local slab metadata: origin shifted along world x
    x_off = (idx * nx_local).astype(jnp.float32) * res
    slab_origin = make_origin_transform([0.0, 0.0, 0.0]).at[0, 3].add(x_off)
    slab_meta = GridMeta.create(slab_origin, res, (nx_local, n, n))

    occ_slab = voxelize.soft_voxelize_points(points, slab_meta, temperature=0.5)

    sdf_fwd = diff.straight_through_sdf(
        lambda occ: sharded.sharded_signed_field(
            occ > 0.5, res, axis_name, backend=cfg.edt_backend
        ),
        res,
    )
    sdf_slab = sdf_fwd(occ_slab)

    # Sharded render: every device traces ALL rays but only inside its own
    # slab (2-cell differentiable halo for boundary trilinear queries), then
    # a min-composite over the x axis picks each ray's first hit. Comm is
    # O(rays + halo surface); the volume is NEVER gathered (the round-1
    # full-volume all_gather here was O(volume)/step — 4 GB at 1024^3).
    depth, hit = sharded.sharded_render_depth(
        sdf_slab,
        _full_meta(cfg),
        cfg.oob_value,
        *_camera(cfg),
        axis_name=axis_name,
        halo=min(2, nx_local),
        t_max=cfg.t_max,
    )
    return depth  # [H, W], replicated across the x axis


def make_train_step(mesh: Mesh, cfg: PipelineConfig):
    """Build the jitted sharded train step.

    step(points [B, N, 3], target_depth [B, H, W]) -> (new_points, loss)
    where B is sharded over ``dp`` and the volume/image over ``x``.
    """

    def local_step(points_local: Array, target_local: Array):
        # points_local: [B_local, N, 3]; target_local: [B_local, H, W]

        def loss_fn(pts):
            def scene_loss(p, tgt):
                # depth is replicated over x (min-composite of slab traces),
                # so the full-image loss needs no further x reduction
                depth = _forward_local(p, cfg, "x")
                return jnp.sum((depth - tgt) ** 2)

            per_scene = jax.vmap(scene_loss)(pts, target_local)
            return jnp.sum(per_scene)

        loss, grads = jax.value_and_grad(loss_fn)(points_local)
        # points are replicated over x: reduce partial grads
        grads = lax.psum(grads, "x")
        new_points = points_local - cfg.lr * grads
        # report the global mean loss (exercises the dp collective)
        global_loss = lax.pmean(loss, "dp") / (cfg.image_h * cfg.image_w)
        return new_points, global_loss

    step = jax.shard_map(
        local_step,
        mesh=mesh,
        in_specs=(P("dp"), P("dp")),
        out_specs=(P("dp"), P()),
        check_vma=False,
    )
    return jax.jit(step)


def _forward_local_2d(points: Array, cfg: PipelineConfig, axis_x: str, axis_y: str):
    """Tile-local forward on a 2-D (x, y) volume mesh: voxelize this tile,
    EDT via ``sharded_squared_edt_2d`` (boundary-summary x pass + one
    all_to_all y/z reshard pair), then the 2-D tile renderer."""
    n = cfg.grid_n
    res = cfg.resolution
    ix, iy = lax.axis_index(axis_x), lax.axis_index(axis_y)
    nx_local = n // lax.axis_size(axis_x)
    ny_local = n // lax.axis_size(axis_y)

    x_off = (ix * nx_local).astype(jnp.float32) * res
    y_off = (iy * ny_local).astype(jnp.float32) * res
    tile_origin = (
        make_origin_transform([0.0, 0.0, 0.0])
        .at[0, 3].add(x_off)
        .at[1, 3].add(y_off)
    )
    tile_meta = GridMeta.create(tile_origin, res, (nx_local, ny_local, n))

    occ_tile = voxelize.soft_voxelize_points(points, tile_meta, temperature=0.5)

    sdf_fwd = diff.straight_through_sdf(
        lambda occ: sharded.sharded_signed_field_2d(
            occ > 0.5, res, axis_x, axis_y, backend=cfg.edt_backend
        ),
        res,
    )
    sdf_tile = sdf_fwd(occ_tile)

    depth, hit = sharded.sharded_render_depth_2d(
        sdf_tile,
        _full_meta(cfg),
        cfg.oob_value,
        *_camera(cfg),
        axis_x=axis_x,
        axis_y=axis_y,
        halo=min(2, nx_local, ny_local),
        t_max=cfg.t_max,
    )
    return depth  # [H, W], replicated across (x, y)


def make_train_step_2d(mesh: Mesh, cfg: PipelineConfig):
    """Jitted train step on a (dp, x, y) mesh: the volume is sharded as 2-D
    tiles (the layout a >= 2-host 1024^3 deployment would use), composing
    ``sharded_squared_edt_2d`` with the 2-D tile renderer.

    step(points [B, N, 3], target_depth [B, H, W]) -> (new_points, loss)
    with B sharded over ``dp`` and the volume over (``x``, ``y``).
    """

    def local_step(points_local: Array, target_local: Array):
        def loss_fn(pts):
            def scene_loss(p, tgt):
                depth = _forward_local_2d(p, cfg, "x", "y")
                return jnp.sum((depth - tgt) ** 2)

            per_scene = jax.vmap(scene_loss)(pts, target_local)
            return jnp.sum(per_scene)

        loss, grads = jax.value_and_grad(loss_fn)(points_local)
        # points are replicated over the volume tiles: reduce partial grads
        grads = lax.psum(grads, ("x", "y"))
        new_points = points_local - cfg.lr * grads
        global_loss = lax.pmean(loss, "dp") / (cfg.image_h * cfg.image_w)
        return new_points, global_loss

    step = jax.shard_map(
        local_step,
        mesh=mesh,
        in_specs=(P("dp"), P("dp")),
        out_specs=(P("dp"), P()),
        check_vma=False,
    )
    return jax.jit(step)
