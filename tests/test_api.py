"""High-level API: utils_2d/3d parity (reference test_bindings.py), collision
map ops, tagged map ops, serialization round-trips."""
import os

import numpy as np
import pytest

import jax.numpy as jnp

from sdf_tools_tpu import collision_map_ops as cmo
from sdf_tools_tpu import io as sio
from sdf_tools_tpu import utils_2d, utils_3d
from sdf_tools_tpu.grid import (
    CollisionMap,
    GridMeta,
    TaggedCollisionMap,
    make_origin_transform,
)


class TestUtils2D:
    def test_reference_test_bindings(self):
        """Byte-for-byte the scenario of /root/reference/test/test_bindings.py."""
        res = 0.05
        x_width, y_height = 20, 40
        grid_world = np.zeros([y_height, x_width], dtype=np.uint8)
        grid_world[1, 3] = 1
        sdf_origin = [0 - x_width / 2, 0 - y_height / 2]
        sdf, sdf_gradient = utils_2d.compute_sdf_and_gradient(grid_world, res, sdf_origin)
        assert np.isclose(sdf[1, 3], -res)
        assert np.isclose(sdf[2, 3], res)
        assert np.isclose(sdf[0, 3], res)
        assert np.isclose(sdf[1, 2], res)
        assert np.isclose(sdf[1, 4], res)
        assert sdf[3, 6] > 3 * res
        assert sdf.shape == (y_height, x_width)
        assert sdf_gradient.shape == (y_height, x_width, 2)
        np.testing.assert_allclose(sdf_gradient[1, 4], [1.5, 0], atol=1e-6)


class TestUtils3D:
    def test_compute_sdf_and_gradient_shapes(self):
        env = np.zeros((10, 8, 6), np.uint8)  # [y, x, z]
        env[4:6, 3:5, 2:4] = 1
        sdf, grad = utils_3d.compute_sdf_and_gradient(env, 0.1, [0.0, 0.0, 0.0])
        assert sdf.shape == (10, 8, 6)
        assert grad.shape == (10, 8, 6, 3)
        assert np.isclose(sdf[4, 3, 2], -0.1)  # inside
        assert sdf[0, 0, 0] > 0.3

    def test_batched_matches_single(self):
        rng = np.random.default_rng(0)
        envs = (rng.random((3, 8, 8, 4)) < 0.2).astype(np.uint8)
        envs[:, 0, 0, 0] = 1
        bs, bg = utils_3d.compute_sdf_and_gradient_batched(envs, 0.1, [0, 0, 0])
        for b in range(3):
            s, g = utils_3d.compute_sdf_and_gradient(envs[b], 0.1, [0, 0, 0])
            np.testing.assert_allclose(np.asarray(bs)[b], s, rtol=1e-6, atol=1e-7)
            np.testing.assert_allclose(np.asarray(bg)[b], g, rtol=1e-5, atol=1e-6)


def _demo_cmap():
    occ = np.zeros((10, 10, 4), np.float32)
    occ[2:5, 2:5, 1:3] = 1.0
    occ[7:9, 7:9, 1:3] = 1.0
    meta = GridMeta.create(make_origin_transform([0.0, 0.0, 0.0]), 0.1, (10, 10, 4))
    return CollisionMap.create(occ, meta, oob_occupancy=-10000.0)


class TestCollisionMapOps:
    def test_extract_sdf_and_components(self):
        cmap = _demo_cmap()
        sdf, (mx, mn) = cmo.extract_sdf(cmap, oob_value=-10000.0)
        v = np.asarray(sdf.values)
        assert v[3, 3, 1] <= -0.1 and v[0, 0, 0] > 0
        cmap2, n = cmo.update_connected_components(cmap)
        assert int(n) == 3
        surf = np.asarray(cmo.extract_component_surfaces(cmap2, "filled"))
        assert surf[2, 2, 1] and not surf[3, 3, 1] or surf.sum() > 0
        comps = cmo.extract_connected_components(cmap2)
        assert len(comps) == 3
        topo = cmo.compute_component_topology(cmap)
        assert topo.shape == (3, 2)

    def test_resample(self):
        cmap = _demo_cmap()
        up = cmo.resample(cmap, 0.05)
        assert up.shape == (20, 20, 8)
        assert np.asarray(up.occupancy)[5, 5, 2] == 1.0

    def test_unknown_is_filled(self):
        occ = np.full((6, 6, 2), 0.5, np.float32)
        meta = GridMeta.create(make_origin_transform([0.0, 0.0, 0.0]), 0.1, (6, 6, 2))
        cmap = CollisionMap.create(occ, meta)
        sdf_known, _ = cmo.extract_sdf(cmap, unknown_is_filled=False)
        sdf_unk, _ = cmo.extract_sdf(cmap, unknown_is_filled=True)
        assert np.asarray(sdf_known.values).min() > 0 or np.isinf(
            np.asarray(sdf_known.values)
        ).all()  # nothing filled -> +inf
        assert np.asarray(sdf_unk.values).max() < 0  # everything filled


def _demo_tmap():
    occ = np.zeros((12, 12, 4), np.float32)
    obj = np.zeros((12, 12, 4), np.uint32)
    occ[2:5, 2:5, 1:3] = 1.0
    obj[2:5, 2:5, 1:3] = 1
    occ[8:11, 8:11, 1:3] = 1.0
    obj[8:11, 8:11, 1:3] = 2
    meta = GridMeta.create(make_origin_transform([0.0, 0.0, 0.0]), 0.1, (12, 12, 4))
    return TaggedCollisionMap.create(occ, obj, meta)


class TestTaggedOps:
    def test_object_filtered_sdf(self):
        tmap = _demo_tmap()
        sdf_all, _ = cmo.extract_tagged_sdf(tmap)
        sdf_obj1, _ = cmo.extract_tagged_sdf(tmap, objects_to_use=[1])
        v_all = np.asarray(sdf_all.values)
        v_1 = np.asarray(sdf_obj1.values)
        assert v_all[9, 9, 1] < 0  # object 2 filled in all-SDF
        assert v_1[9, 9, 1] > 0  # object 2 excluded from object-1 SDF
        assert v_1[3, 3, 1] < 0

    def test_free_and_named_sdf(self):
        tmap = _demo_tmap()
        # add an unnamed obstacle
        occ = np.asarray(tmap.occupancy).copy()
        occ[5:7, 0:2, 1:3] = 1.0
        import dataclasses

        tmap2 = dataclasses.replace(tmap, occupancy=jnp.asarray(occ))
        sdf, _ = cmo.extract_free_and_named_objects_sdf(tmap2)
        v = np.asarray(sdf.values)
        # free-space distances respect ALL obstacles
        assert v[5, 2, 1] <= 0.1 + 1e-5
        # interior of unnamed obstacle: free value < 0, named value > 0 -> 0
        assert v[5, 0, 1] == 0.0
        # named object interiors stay negative
        assert v[3, 3, 1] < 0

    def test_make_object_sdfs(self):
        tmap = _demo_tmap()
        sdfs = cmo.make_object_sdfs(tmap)
        assert set(sdfs.keys()) == {1, 2}
        assert np.asarray(sdfs[1].values)[3, 3, 1] < 0
        assert np.asarray(sdfs[1].values)[9, 9, 1] > 0

    def test_update_convex_segments(self):
        tmap = _demo_tmap()
        tmap2, count = cmo.update_convex_segments(
            tmap, connected_threshold=0.3, add_virtual_border=True
        )
        seg = np.asarray(tmap2.convex_segment)
        assert int(count) >= 2
        assert seg[3, 3, 1] != 0 and seg[9, 9, 1] != 0
        assert seg[3, 3, 1] != seg[9, 9, 1]
        assert tmap2.convex_segments_valid


class TestSerialization:
    def test_sdf_roundtrip(self, tmp_path):
        cmap = _demo_cmap()
        sdf, _ = cmo.extract_sdf(cmap, oob_value=-10000.0)
        for compress in (True, False):
            p = os.path.join(tmp_path, f"x{compress}.sdf")
            sio.save_sdf(sdf, p, compress=compress)
            sdf2 = sio.load_sdf(p)
            np.testing.assert_array_equal(
                np.asarray(sdf.values), np.asarray(sdf2.values)
            )
            assert sdf2.meta.shape == sdf.meta.shape
            np.testing.assert_allclose(
                np.asarray(sdf2.meta.origin_transform),
                np.asarray(sdf.meta.origin_transform),
                rtol=1e-6,
            )
            assert float(sdf2.oob_value) == float(sdf.oob_value)
        # magic check
        with open(p, "rb") as f:
            assert f.read(4) == b"SDFR"

    def test_sdf_message_blob(self):
        cmap = _demo_cmap()
        sdf, _ = cmo.extract_sdf(cmap)
        blob = sio.sdf_message_blob(sdf)
        sdf2 = sio.sdf_from_message_blob(blob)
        np.testing.assert_array_equal(np.asarray(sdf.values), np.asarray(sdf2.values))

    def test_framed_ros_messages_roundtrip(self):
        """Full ROS wire envelope (header + uint8[] + is_compressed,
        msg/SDF.msg et al., sdf.cpp:472-502) for all three grid types."""
        import struct

        cmap, n = cmo.update_connected_components(_demo_cmap())
        sdf, _ = cmo.extract_sdf(cmap)
        tmap, _ = cmo.update_convex_segments(_demo_tmap(), 0.3)

        msg = sio.sdf_message(sdf, stamp=(12, 34), seq=5)
        # envelope golden bytes: seq, secs, nsecs, len(frame_id)
        seq, secs, nsecs, fl = struct.unpack_from("<IIII", msg, 0)
        assert (seq, secs, nsecs) == (5, 12, 34)
        assert msg[16 : 16 + fl].decode() == sdf.meta.frame
        assert msg[-1] == 1  # is_compressed
        payload, fid, comp = sio.unframe_ros_message(msg)
        assert fid == sdf.meta.frame and comp
        sdf2 = sio.sdf_from_message(msg)
        np.testing.assert_array_equal(np.asarray(sdf.values), np.asarray(sdf2.values))

        cm2 = sio.collision_map_from_message(
            sio.collision_map_message(cmap, n_components=int(n))
        )
        np.testing.assert_array_equal(
            np.asarray(cmap.occupancy), np.asarray(cm2.occupancy)
        )
        np.testing.assert_array_equal(
            np.asarray(cmap.component), np.asarray(cm2.component)
        )

        tm2 = sio.tagged_map_from_message(sio.tagged_map_message(tmap))
        for field in ("occupancy", "object_id", "component", "convex_segment"):
            np.testing.assert_array_equal(
                np.asarray(getattr(tmap, field)), np.asarray(getattr(tm2, field))
            )

    def test_collision_map_roundtrip(self, tmp_path):
        cmap, n = cmo.update_connected_components(_demo_cmap())
        p = os.path.join(tmp_path, "m.cmg")
        sio.save_collision_map(cmap, p, n_components=int(n))
        cm2 = sio.load_collision_map(p)
        np.testing.assert_array_equal(
            np.asarray(cmap.occupancy), np.asarray(cm2.occupancy)
        )
        np.testing.assert_array_equal(
            np.asarray(cmap.component), np.asarray(cm2.component)
        )
        assert cm2.components_valid

    def test_tagged_roundtrip(self, tmp_path):
        tmap, _ = cmo.update_convex_segments(_demo_tmap(), 0.3, add_virtual_border=True)
        p = os.path.join(tmp_path, "m.tcm")
        sio.save_tagged_map(tmap, p)
        tm2 = sio.load_tagged_map(p)
        for field in ("occupancy", "object_id", "component", "convex_segment"):
            np.testing.assert_array_equal(
                np.asarray(getattr(tmap, field)), np.asarray(getattr(tm2, field))
            )
        assert tm2.convex_segments_valid

    def test_tagged_cell_byte_layout_golden(self):
        """The serialized TAGGED_OBJECT_COLLISION_CELL must be the raw memcpy
        of the reference struct: (occupancy f32, component u32, object_id u32,
        convex_segment u32) — tagged_object_collision_map.hpp:22-43. A
        round-trip test can't catch a field swap, so check the bytes."""
        import dataclasses
        import struct

        from sdf_tools_tpu.grid import GridMeta, TaggedCollisionMap

        meta = GridMeta.create(np.eye(4), 1.0, (1, 1, 1), "world")
        tm = TaggedCollisionMap.create(
            np.full((1, 1, 1), 0.75, np.float32),
            np.full((1, 1, 1), 7, np.uint32),  # object_id
            meta,
        )
        tm = dataclasses.replace(
            tm,
            component=np.full((1, 1, 1), 3, np.uint32),
            convex_segment=np.full((1, 1, 1), 9, np.uint32),
        )
        buf = sio.serialize_tagged_map(tm)
        # header: 1 byte initialized_ + 2x128 bytes Isometry3d + 8 byte count
        off = 1 + 128 + 128 + 8
        occupancy, component, object_id, convex_segment = struct.unpack_from(
            "<fIII", buf, off
        )
        assert occupancy == 0.75
        assert component == 3
        assert object_id == 7
        assert convex_segment == 9

    def test_sdf_serializes_default_value_as_oob(self):
        """Reference SDF ctors set default_value_ == oob_value; the serialized
        default slot must carry oob, not 0 (sdf.cpp:241-246)."""
        import struct

        cmap = _demo_cmap()
        sdf, _ = cmo.extract_sdf(cmap, oob_value=-12345.0)
        buf = sio.serialize_sdf(sdf)
        n = int(np.prod(sdf.meta.shape))
        # 1 + 256 header, 8 count, n*4 data, 9*8 footer doubles, 5*8 int64s
        off = 1 + 256 + 8 + n * 4 + 9 * 8 + 5 * 8
        default_value, oob_value = struct.unpack_from("<ff", buf, off)
        assert default_value == -12345.0
        assert oob_value == -12345.0


class TestNative:
    def test_native_exact_edt_matches_oracle(self):
        from sdf_tools_tpu import native
        from sdf_tools_tpu.oracle import reference_edt as oracle

        if not native.available():
            pytest.skip("native toolchain unavailable")
        rng = np.random.default_rng(0)
        for shape, p in [((12, 10, 8), 0.1), ((6, 20, 6), 0.4), ((16, 4, 4), 0.02)]:
            mask = rng.random(shape) < p
            if not mask.any():
                mask[0, 0, 0] = True
            got = native.edt_exact(mask)
            want = oracle.brute_force_d2(shape, mask)
            np.testing.assert_array_equal(got, want)

    def test_native_reference_edt_matches_python_oracle(self):
        from sdf_tools_tpu import native
        from sdf_tools_tpu.oracle import reference_edt as oracle

        if not native.available():
            pytest.skip("native toolchain unavailable")
        rng = np.random.default_rng(42)
        mask = rng.random((8, 8, 8)) < 0.1
        mask[0, 0, 0] = True
        got = native.edt_reference(mask)
        want = oracle.build_distance_field(mask.shape, mask)
        # both encode INF as huge; normalize
        got = np.where(got > 10**12, -1, got)
        want = np.where(want > 10**12, -1, want)
        np.testing.assert_array_equal(got, want)

    def test_native_zlib_roundtrip(self):
        from sdf_tools_tpu import native

        if not native.available():
            pytest.skip("native toolchain unavailable")
        data = np.random.default_rng(0).integers(0, 10, 100000).astype(np.uint8).tobytes()
        comp = native.compress(data)
        out = native.decompress(comp, len(data))
        assert out == data


class TestCheckpoints:
    def test_sdf_checkpoint(self, tmp_path):
        cmap = _demo_cmap()
        sdf, _ = cmo.extract_sdf(cmap, oob_value=-10000.0)
        p = os.path.join(tmp_path, "c.npz")
        sio.save_checkpoint(p, sdf)
        sdf2 = sio.load_checkpoint(p)
        np.testing.assert_array_equal(np.asarray(sdf.values), np.asarray(sdf2.values))

    def test_tagged_checkpoint(self, tmp_path):
        tmap, _ = cmo.update_convex_segments(_demo_tmap(), 0.3, add_virtual_border=True)
        p = os.path.join(tmp_path, "t.npz")
        sio.save_checkpoint(p, tmap)
        tm2 = sio.load_checkpoint(p)
        np.testing.assert_array_equal(
            np.asarray(tmap.convex_segment), np.asarray(tm2.convex_segment)
        )
        assert tm2.convex_segments_valid


class TestTaggedParity:
    def test_resample_tagged(self):
        tmap = _demo_tmap()
        tmap, _ = cmo.update_tagged_connected_components(tmap)
        tmap, _ = cmo.update_convex_segments(tmap, connected_threshold=0.3,
                                             add_virtual_border=True)
        up = cmo.resample_tagged(tmap, 0.05)
        assert up.shape == (24, 24, 8)
        # all four fields resampled by nearest location
        # (tagged_object_collision_map.hpp:671)
        assert np.asarray(up.occupancy)[6, 6, 2] == 1.0
        assert np.asarray(up.object_id)[6, 6, 2] == 1
        assert np.asarray(up.object_id)[18, 18, 2] == 2
        assert np.asarray(up.component)[6, 6, 2] == np.asarray(tmap.component)[3, 3, 1]
        assert (
            np.asarray(up.convex_segment)[6, 6, 2]
            == np.asarray(tmap.convex_segment)[3, 3, 1]
        )
        down = cmo.resample_tagged(tmap, 0.2)
        assert down.shape == (6, 6, 2)
        assert np.asarray(down.object_id)[1, 1, 0] in (0, 1)

    def test_tagged_component_surfaces(self):
        tmap, n = cmo.update_tagged_connected_components(_demo_tmap())
        assert int(n) == 3
        filled = np.asarray(cmo.extract_tagged_component_surfaces(tmap, "filled"))
        empty = np.asarray(cmo.extract_tagged_component_surfaces(tmap, "empty"))
        occ = np.asarray(tmap.occupancy)
        assert filled[2, 2, 1]
        assert not filled[occ <= 0.5].any()  # surface typed by occupancy
        assert empty[0, 0, 0]
        assert not (filled & empty).any()
        m = cmo.extract_tagged_component_surfaces_map(tmap, "filled")
        assert len(m) == 2  # two filled components
        for c, idxs in m.items():
            assert idxs.shape[1] == 3
