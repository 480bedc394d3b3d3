"""Tests for viz exports, sparse DSH map, scene builder, image SDF."""
import os

import numpy as np

import jax.numpy as jnp

from sdf_tools_tpu import collision_map_ops as cmo
from sdf_tools_tpu import scene as scene_mod
from sdf_tools_tpu import sparse, viz
from sdf_tools_tpu.grid import CollisionMap, GridMeta, make_origin_transform
from sdf_tools_tpu.ops import image_sdf


def _meta(shape, res=0.1, origin=(0.0, 0.0, 0.0)):
    return GridMeta.create(make_origin_transform(list(origin)), res, shape)


class TestViz:
    def test_sdf_display_colors(self):
        occ = np.zeros((8, 8, 2), np.float32)
        occ[3:5, 3:5, :] = 1.0
        cmap = CollisionMap.create(occ, _meta((8, 8, 2)))
        sdf, _ = cmo.extract_sdf(cmap)
        centers, colors = viz.sdf_display(sdf, alpha=0.5)
        assert centers.shape == (8 * 8 * 2, 3)
        assert colors.shape == (8 * 8 * 2, 4)
        v = np.asarray(sdf.values).reshape(-1)
        assert (colors[v > 0, 1] > 0).all()  # green channel outside
        assert (colors[v < 0, 0] > 0).all()  # red channel inside
        c2, k2 = viz.sdf_display_collision_only(sdf)
        assert len(c2) == int((v <= 0).sum())

    def test_collision_and_component_displays(self):
        occ = np.zeros((8, 8, 2), np.float32)
        occ[3:5, 3:5, :] = 1.0
        cmap = CollisionMap.create(occ, _meta((8, 8, 2)))
        centers, colors = viz.collision_map_display(cmap)
        assert len(centers) == 8  # only filled cells kept (free alpha=0)
        cmap2, n = cmo.update_connected_components(cmap)
        c, k = viz.components_display(cmap2)
        assert len(c) == 8 * 8 * 2  # every cell labeled

    def test_ply_roundtrip(self, tmp_path):
        pts = np.random.default_rng(0).random((10, 3)).astype(np.float32)
        cols = np.random.default_rng(1).random((10, 4)).astype(np.float32)
        p = os.path.join(tmp_path, "x.ply")
        viz.save_ply(p, pts, cols)
        txt = open(p).read()
        assert txt.startswith("ply")
        assert "element vertex 10" in txt


class TestSparse:
    def test_chunk_and_cell_writes(self):
        m = sparse.DynamicSpatialHashedCollisionMap(
            make_origin_transform([0.0, 0.0, 0.0]), resolution=0.1, chunk_cells=4
        )
        # chunk-level fill
        m.set_chunk([0.2, 0.2, 0.2], 1.0)
        v, state = m.get([0.3, 0.1, 0.35])
        assert v == 1.0 and state == sparse.CHUNK_FILLED
        # cell-level write converts chunk
        m.set_cell([0.05, 0.05, 0.05], 0.0)
        v, state = m.get([0.05, 0.05, 0.05])
        assert v == 0.0 and state == sparse.CHUNK_CELLWISE
        v, state = m.get([0.35, 0.35, 0.35])
        assert v == 1.0 and state == sparse.CHUNK_CELLWISE
        # untouched region
        v, state = m.get([5.0, 5.0, 5.0])
        assert state == sparse.CHUNK_UNINITIALIZED

    def test_densify(self):
        m = sparse.DynamicSpatialHashedCollisionMap(
            make_origin_transform([0.0, 0.0, 0.0]), resolution=0.1, chunk_cells=4
        )
        m.set_chunk([0.2, 0.2, 0.2], 1.0)
        m.set_cell([0.85, 0.05, 0.05], 1.0)  # chunk (2,0,0)
        cm = m.densify()
        occ = np.asarray(cm.occupancy)
        assert occ.shape == (12, 4, 4)  # chunks x:0..2, y:0, z:0
        assert occ[0:4, 0:4, 0:4].mean() == 1.0
        assert occ[8, 0, 0] == 1.0
        assert occ[9, 0, 0] == 0.0
        # world location of the cell-level write round-trips via grid meta
        idx = np.asarray(cm.meta.location_to_index(jnp.asarray([[0.85, 0.05, 0.05]])))[0]
        assert occ[tuple(idx)] == 1.0

    def test_display_export(self):
        m = sparse.DynamicSpatialHashedCollisionMap(
            make_origin_transform([0.0, 0.0, 0.0]), resolution=0.1, chunk_cells=4
        )
        m.set_chunk([0.2, 0.2, 0.2], 1.0)
        m.set_cell([0.85, 0.05, 0.05], 1.0)
        pts, cols = m.display_export()
        assert len(pts) == 2  # one chunk cube + one filled cell


class TestScene:
    def test_primitives_to_occupancy(self):
        meta = _meta((16, 16, 16), 0.1)
        prims = [
            scene_mod.Primitive.box([0.4, 0.4, 0.4], [0.4, 0.4, 0.4]),
            scene_mod.Primitive.sphere([1.2, 1.2, 1.2], 0.25),
            scene_mod.Primitive.cylinder([1.2, 0.4, 0.8], 0.15, 0.6),
        ]
        occ = np.asarray(scene_mod.primitives_to_occupancy(prims, meta))
        assert occ[4, 4, 4] == 1.0  # box center
        assert occ[12, 12, 12] == 1.0  # sphere center
        assert occ[12, 4, 8] == 1.0  # cylinder center
        assert occ[0, 0, 15] == 0.0

    def test_builder_modes_and_cache(self):
        meta = _meta((12, 12, 12), 0.1)
        b = scene_mod.SdfBuilder(meta, oob_value=1e3)
        b.add_primitive(scene_mod.Primitive.sphere([0.6, 0.6, 0.6], 0.2))
        octo = np.zeros((12, 12, 12), np.float32)
        octo[9:11, 9:11, 9:11] = 1.0
        b.set_octomap(octo)

        sdf_obj = b.update_sdf(scene_mod.UpdateMode.USE_ONLY_COLLISION_OBJECTS)
        sdf_octo = b.update_sdf(scene_mod.UpdateMode.USE_ONLY_OCTOMAP)
        sdf_full = b.update_sdf(scene_mod.UpdateMode.USE_FULL_PLANNING_SCENE)
        v_obj = np.asarray(sdf_obj.values)
        v_octo = np.asarray(sdf_octo.values)
        v_full = np.asarray(sdf_full.values)
        assert v_obj[6, 6, 6] < 0 and v_obj[10, 10, 10] > 0
        assert v_octo[10, 10, 10] < 0 and v_octo[6, 6, 6] > 0
        assert v_full[6, 6, 6] < 0 and v_full[10, 10, 10] < 0
        # cache: USE_CACHED returns the same object
        assert b.update_sdf(scene_mod.UpdateMode.USE_CACHED) is sdf_full
        b.add_primitive(scene_mod.Primitive.box([0.1, 0.1, 0.1], [0.1, 0.1, 0.1]))
        assert b._cached_sdf is None  # invalidated


def _box_mesh(center, extents, R=None):
    """Watertight 12-triangle box mesh (outward normals)."""
    c = np.asarray(center, float)
    e = np.asarray(extents, float) / 2
    corners = (
        np.array([[sx, sy, sz] for sx in (-1, 1) for sy in (-1, 1) for sz in (-1, 1)])
        * e
    )
    if R is not None:
        corners = corners @ np.asarray(R).T
    verts = corners + c
    quads = [(0, 1, 3, 2), (4, 6, 7, 5), (0, 4, 5, 1),
             (2, 3, 7, 6), (0, 2, 6, 4), (1, 5, 7, 3)]
    faces = []
    for a, b, cc, d in quads:
        faces += [(a, b, cc), (a, cc, d)]
    return verts.astype(np.float32), np.asarray(faces, np.int32)


class TestMeshVoxelize:
    def test_rotated_box_mesh_matches_primitive(self):
        """Ray-parity mesh voxelization == the analytic box containment for
        an arbitrarily rotated box (every cell center is strictly inside or
        outside, so the two filled tests must agree exactly)."""
        from sdf_tools_tpu.ops import voxelize

        meta = _meta((32, 28, 24), 0.1)
        th = 0.5
        Rz = np.array([[np.cos(th), -np.sin(th), 0], [np.sin(th), np.cos(th), 0], [0, 0, 1]])
        Rx = np.array([[1, 0, 0], [0, np.cos(0.3), -np.sin(0.3)], [0, np.sin(0.3), np.cos(0.3)]])
        R = Rz @ Rx
        center, ext = [1.5, 1.4, 1.2], [1.1, 0.8, 0.9]
        verts, faces = _box_mesh(center, ext, R)
        occ_mesh = np.asarray(voxelize.mesh_to_occupancy(verts, faces, meta))
        occ_prim = np.asarray(
            scene_mod.primitives_to_occupancy(
                [scene_mod.Primitive.box(center, ext, R)], meta
            )
        )
        assert occ_mesh.sum() > 100  # non-trivial fill
        np.testing.assert_array_equal(occ_mesh, occ_prim)

    def test_hollow_mesh_parity(self):
        """A box-with-cavity (inner shell wound inward) must fill the shell
        only — ray parity handles nested surfaces."""
        from sdf_tools_tpu.ops import voxelize

        meta = _meta((20, 20, 20), 0.1)
        vo, fo = _box_mesh([1.0, 1.0, 1.0], [1.2, 1.2, 1.2])
        vi, fi = _box_mesh([1.0, 1.0, 1.0], [0.6, 0.6, 0.6])
        verts = np.concatenate([vo, vi])
        faces = np.concatenate([fo, fi[:, ::-1] + 8])  # inner flipped
        occ = np.asarray(voxelize.mesh_to_occupancy(verts, faces, meta))
        assert occ[10, 10, 10] == 0.0  # cavity
        assert occ[5, 10, 10] == 1.0  # shell
        assert occ[1, 1, 1] == 0.0  # outside

    def test_builder_ingests_mesh(self):
        meta = _meta((16, 16, 16), 0.1)
        b = scene_mod.SdfBuilder(meta, oob_value=1e3, backend="stencil")
        verts, faces = _box_mesh([0.8, 0.8, 0.8], [0.6, 0.6, 0.6])
        b.add_mesh(verts, faces)
        sdf = b.update_sdf(scene_mod.UpdateMode.USE_ONLY_COLLISION_OBJECTS)
        v = np.asarray(sdf.values)
        assert v[8, 8, 8] < 0 and v[1, 1, 1] > 0
        assert b.update_sdf(scene_mod.UpdateMode.USE_CACHED) is sdf
        b.clear()
        assert b.meshes == [] and b._cached_sdf is None


class TestImageSdf:
    def test_pixel_units_and_signs(self):
        img = np.zeros((32, 24), np.uint8)
        img[10:14, 8:12] = 1
        signed, dp, dm = image_sdf.image_sdf(jnp.asarray(img))
        signed = np.asarray(signed)
        assert signed.shape == (32, 24)
        assert np.isclose(signed[10, 8], -1.0)  # corner cell: 1 px from free
        assert np.isclose(signed[11, 9], -2.0)  # 2 px from free on all sides
        assert np.isclose(signed[10, 7], 1.0)  # adjacent outside
        assert np.isclose(signed[10, 6], 2.0)
        # channels: dp = dist to filled = 0 at filled; dm = dist to free
        assert float(np.asarray(dp)[11, 9]) == 0.0
        assert float(np.asarray(dm)[11, 9]) == 2.0

    def test_preview(self):
        img = np.zeros((16, 16), np.uint8)
        img[6:10, 6:10] = 1
        signed, _, _ = image_sdf.image_sdf(jnp.asarray(img))
        rgb = image_sdf.false_color_preview(signed)
        assert rgb.shape == (16, 16, 3)
        assert rgb[0, 0, 2] > 0  # blue outside
        assert rgb[7, 7, 0] > 0  # red inside
