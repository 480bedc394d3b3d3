"""Binary serialization compatible with the reference's on-disk formats.

Implements the reference's field-by-field layouts:
  * SignedDistanceField  (``/root/reference/src/sdf_tools/sdf.cpp:213-258``),
    file magic ``SDFZ`` (zlib body) / ``SDFR`` (raw) (``sdf.cpp:392-470``).
  * CollisionMapGrid     (``collision_map.cpp:21-120``), magic ``CMGZ/CMGR``.
  * TaggedObjectCollisionMapGrid (``tagged_object_collision_map.cpp:23-130``),
    magic ``TCMZ/TCMR``.
  * "Message" blobs: zlib-compressed SerializeSelf payload (``sdf.cpp:
    472-502``); ``*_message``/``*_from_message`` additionally apply the full
    ROS wire envelope (``header + uint8[] + is_compressed``, ``msg/*.msg``)
    so the complete message byte format round-trips without ROS.

arc_utilities primitive conventions (little-endian):
  * SerializeFixedSizePOD<T>: raw memcpy of T.
  * SerializeVector<T>: uint64 element count, then each element.
  * SerializeString: uint64 length, then raw bytes (no NUL).
  * SerializeEigen<Isometry3d>: the 4x4 matrix as 16 float64 in Eigen's
    default (column-major) storage order.
  * COLLISION_CELL: float occupancy, uint32 component (8 bytes).
  * TAGGED_OBJECT_COLLISION_CELL: float occupancy, uint32 component,
    uint32 object_id, uint32 convex_segment (16 bytes) — field order per
    ``tagged_object_collision_map.hpp:22-43`` (the struct is serialized by
    raw memcpy, so this declaration order IS the byte layout).

Grid data is x-major / z-fastest (``utils_3d.py:71-75``), which is exactly
the C-order raveling of our ``[nx, ny, nz]`` arrays.
"""
from __future__ import annotations

import struct
import zlib
from typing import Tuple

import numpy as np

from .grid import CollisionMap, GridMeta, SdfGrid, TaggedCollisionMap

_TAGGED_CELL_DT = np.dtype(
    [
        ("occupancy", "<f4"),
        ("component", "<u4"),
        ("object_id", "<u4"),
        ("convex_segment", "<u4"),
    ]
)
_COLLISION_CELL_DT = np.dtype([("occupancy", "<f4"), ("component", "<u4")])


class _Writer:
    def __init__(self):
        self.parts = []

    def pod(self, fmt: str, *vals):
        self.parts.append(struct.pack("<" + fmt, *vals))

    def raw(self, b: bytes):
        self.parts.append(b)

    def eigen_isometry(self, m: np.ndarray):
        self.raw(np.asarray(m, "<f8").T.tobytes())  # column-major

    def string(self, s: str):
        b = s.encode()
        self.pod("Q", len(b))
        self.raw(b)

    def bytes(self) -> bytes:
        return b"".join(self.parts)


class _Reader:
    def __init__(self, buf: bytes):
        self.buf = buf
        self.pos = 0

    def pod(self, fmt: str):
        sz = struct.calcsize("<" + fmt)
        out = struct.unpack_from("<" + fmt, self.buf, self.pos)
        self.pos += sz
        return out if len(out) > 1 else out[0]

    def raw(self, n: int) -> bytes:
        b = self.buf[self.pos : self.pos + n]
        self.pos += n
        return b

    def eigen_isometry(self) -> np.ndarray:
        return np.frombuffer(self.raw(128), "<f8").reshape(4, 4).T.copy()

    def string(self) -> str:
        n = self.pod("Q")
        return self.raw(n).decode()


def _write_common_header(w: _Writer, meta: GridMeta):
    res = float(meta.resolution)
    nx, ny, nz = meta.shape
    w.pod("B", 1)  # initialized_
    origin = np.asarray(meta.origin_transform, np.float64)
    w.eigen_isometry(origin)
    w.eigen_isometry(np.asarray(meta.inv_origin_transform, np.float64))
    # (data vector is written by the caller between header halves)
    return res, (nx, ny, nz)


def _write_common_footer(w: _Writer, meta: GridMeta):
    res = float(meta.resolution)
    nx, ny, nz = meta.shape
    w.pod("ddd", res, res, res)  # cell sizes
    w.pod("ddd", 1.0 / res, 1.0 / res, 1.0 / res)  # inverse cell sizes
    w.pod("ddd", nx * res, ny * res, nz * res)  # grid sizes (meters)
    w.pod("qq", ny * nz, nz)  # stride1, stride2
    w.pod("qqq", nx, ny, nz)


def _read_common_footer(r: _Reader):
    cell_sizes = r.pod("ddd")
    _inv = r.pod("ddd")
    _sizes = r.pod("ddd")
    _strides = r.pod("qq")
    nx, ny, nz = r.pod("qqq")
    return cell_sizes[0], (int(nx), int(ny), int(nz))


# ---------------------------------------------------------------------------
# SignedDistanceField
# ---------------------------------------------------------------------------


def serialize_sdf(sdf: SdfGrid, locked: bool = False) -> bytes:
    w = _Writer()
    _write_common_header(w, sdf.meta)
    data = np.asarray(sdf.values, "<f4").reshape(-1)  # x-major/z-fastest
    w.pod("Q", data.size)
    w.raw(data.tobytes())
    _write_common_footer(w, sdf.meta)
    # The reference's SDF ctor sets default_value_ == oob_value_ (sdf.hpp
    # forwarding ctors), so a reference-written file carries oob in both slots.
    w.pod("f", float(sdf.oob_value))  # default_value
    w.pod("f", float(sdf.oob_value))
    w.string(sdf.meta.frame)
    w.pod("B", int(locked))
    return w.bytes()


def deserialize_sdf(buf: bytes) -> Tuple[SdfGrid, bool]:
    r = _Reader(buf)
    _init = r.pod("B")
    origin = r.eigen_isometry()
    _inv_origin = r.eigen_isometry()
    count = r.pod("Q")
    data = np.frombuffer(r.raw(count * 4), "<f4")
    res, shape = _read_common_footer(r)
    _default = r.pod("f")
    oob = r.pod("f")
    frame = r.string()
    locked = bool(r.pod("B"))
    meta = GridMeta.create(origin, res, shape, frame)
    values = data.reshape(shape)
    return SdfGrid.create(values, meta, oob), locked


def save_sdf(sdf: SdfGrid, filepath: str, compress: bool = True):
    body = serialize_sdf(sdf)
    with open(filepath, "wb") as f:
        if compress:
            f.write(b"SDFZ")
            f.write(zlib.compress(body))
        else:
            f.write(b"SDFR")
            f.write(body)


def load_sdf(filepath: str) -> SdfGrid:
    with open(filepath, "rb") as f:
        magic = f.read(4)
        body = f.read()
    if magic == b"SDFZ":
        body = zlib.decompress(body)
    elif magic != b"SDFR":
        raise ValueError(f"invalid SDF file header {magic!r}")
    return deserialize_sdf(body)[0]


def sdf_message_blob(sdf: SdfGrid) -> bytes:
    """Always-compressed message payload (sdf.cpp:472-483)."""
    return zlib.compress(serialize_sdf(sdf))


def sdf_from_message_blob(blob: bytes, is_compressed: bool = True) -> SdfGrid:
    body = zlib.decompress(blob) if is_compressed else blob
    return deserialize_sdf(body)[0]


# ---------------------------------------------------------------------------
# CollisionMapGrid
# ---------------------------------------------------------------------------


def serialize_collision_map(cmap: CollisionMap, n_components: int = 0) -> bytes:
    w = _Writer()
    _write_common_header(w, cmap.meta)
    n = int(np.prod(cmap.shape))
    cells = np.zeros(n, _COLLISION_CELL_DT)
    cells["occupancy"] = np.asarray(cmap.occupancy, np.float32).reshape(-1)
    cells["component"] = np.asarray(cmap.component, np.uint32).reshape(-1)
    w.pod("Q", n)
    w.raw(cells.tobytes())
    _write_common_footer(w, cmap.meta)
    oob = np.zeros(1, _COLLISION_CELL_DT)
    oob["occupancy"] = float(cmap.oob_occupancy)
    w.raw(oob.tobytes())  # default_value
    w.raw(oob.tobytes())  # oob_value
    w.pod("I", int(n_components))
    w.string(cmap.meta.frame)
    w.pod("B", int(cmap.components_valid))
    return w.bytes()


def deserialize_collision_map(buf: bytes) -> CollisionMap:
    r = _Reader(buf)
    _init = r.pod("B")
    origin = r.eigen_isometry()
    _ = r.eigen_isometry()
    count = r.pod("Q")
    cells = np.frombuffer(r.raw(count * 8), _COLLISION_CELL_DT)
    res, shape = _read_common_footer(r)
    _default = np.frombuffer(r.raw(8), _COLLISION_CELL_DT)
    oob = np.frombuffer(r.raw(8), _COLLISION_CELL_DT)
    _n_components = r.pod("I")
    frame = r.string()
    components_valid = bool(r.pod("B"))
    meta = GridMeta.create(origin, res, shape, frame)
    cm = CollisionMap.create(
        cells["occupancy"].reshape(shape),
        meta,
        oob_occupancy=float(oob["occupancy"][0]),
        component=cells["component"].reshape(shape),
    )
    import dataclasses

    return dataclasses.replace(cm, components_valid=components_valid)


def save_collision_map(cmap: CollisionMap, filepath: str, compress: bool = True, n_components: int = 0):
    body = serialize_collision_map(cmap, n_components)
    with open(filepath, "wb") as f:
        if compress:
            f.write(b"CMGZ")
            f.write(zlib.compress(body))
        else:
            f.write(b"CMGR")
            f.write(body)


def load_collision_map(filepath: str) -> CollisionMap:
    with open(filepath, "rb") as f:
        magic = f.read(4)
        body = f.read()
    if magic == b"CMGZ":
        body = zlib.decompress(body)
    elif magic != b"CMGR":
        raise ValueError(f"invalid CollisionMap file header {magic!r}")
    return deserialize_collision_map(body)


# ---------------------------------------------------------------------------
# TaggedObjectCollisionMapGrid
# ---------------------------------------------------------------------------


def serialize_tagged_map(
    tmap: TaggedCollisionMap, n_components: int = 0, n_convex_segments: int = 0
) -> bytes:
    w = _Writer()
    _write_common_header(w, tmap.meta)
    n = int(np.prod(tmap.shape))
    cells = np.zeros(n, _TAGGED_CELL_DT)
    cells["occupancy"] = np.asarray(tmap.occupancy, np.float32).reshape(-1)
    cells["object_id"] = np.asarray(tmap.object_id, np.uint32).reshape(-1)
    cells["component"] = np.asarray(tmap.component, np.uint32).reshape(-1)
    cells["convex_segment"] = np.asarray(tmap.convex_segment, np.uint32).reshape(-1)
    w.pod("Q", n)
    w.raw(cells.tobytes())
    _write_common_footer(w, tmap.meta)
    oob = np.zeros(1, _TAGGED_CELL_DT)
    oob["occupancy"] = float(tmap.oob_occupancy)
    w.raw(oob.tobytes())
    w.raw(oob.tobytes())
    w.pod("I", int(n_components))
    w.pod("I", int(n_convex_segments))
    w.string(tmap.meta.frame)
    w.pod("B", int(tmap.components_valid))
    w.pod("B", int(tmap.convex_segments_valid))
    return w.bytes()


def deserialize_tagged_map(buf: bytes) -> TaggedCollisionMap:
    r = _Reader(buf)
    _init = r.pod("B")
    origin = r.eigen_isometry()
    _ = r.eigen_isometry()
    count = r.pod("Q")
    cells = np.frombuffer(r.raw(count * 16), _TAGGED_CELL_DT)
    res, shape = _read_common_footer(r)
    _default = np.frombuffer(r.raw(16), _TAGGED_CELL_DT)
    oob = np.frombuffer(r.raw(16), _TAGGED_CELL_DT)
    _nc = r.pod("I")
    _ns = r.pod("I")
    frame = r.string()
    comps_valid = bool(r.pod("B"))
    segs_valid = bool(r.pod("B"))
    meta = GridMeta.create(origin, res, shape, frame)
    tm = TaggedCollisionMap.create(
        cells["occupancy"].reshape(shape),
        cells["object_id"].reshape(shape),
        meta,
        oob_occupancy=float(oob["occupancy"][0]),
    )
    import dataclasses

    return dataclasses.replace(
        tm,
        component=np.ascontiguousarray(cells["component"].reshape(shape)),
        convex_segment=np.ascontiguousarray(cells["convex_segment"].reshape(shape)),
        components_valid=comps_valid,
        convex_segments_valid=segs_valid,
    )


def save_tagged_map(tmap: TaggedCollisionMap, filepath: str, compress: bool = True):
    body = serialize_tagged_map(tmap)
    with open(filepath, "wb") as f:
        if compress:
            f.write(b"TCMZ")
            f.write(zlib.compress(body))
        else:
            f.write(b"TCMR")
            f.write(body)


def load_tagged_map(filepath: str) -> TaggedCollisionMap:
    with open(filepath, "rb") as f:
        magic = f.read(4)
        body = f.read()
    if magic == b"TCMZ":
        body = zlib.decompress(body)
    elif magic != b"TCMR":
        raise ValueError(f"invalid TaggedCollisionMap file header {magic!r}")
    return deserialize_tagged_map(body)


# ---------------------------------------------------------------------------
# Native checkpoints (npz + json metadata) — the fast path for our own
# pytrees; the SDFZ/CMGZ/TCMZ formats above are the reference-interop path.
# ---------------------------------------------------------------------------


def save_checkpoint(path: str, grid) -> None:
    """Save any of SdfGrid / CollisionMap / TaggedCollisionMap as .npz."""
    import json as _json

    arrays = {}
    meta = grid.meta
    header = {
        "kind": type(grid).__name__,
        "shape": list(meta.shape),
        "frame": meta.frame,
    }
    arrays["origin_transform"] = np.asarray(meta.origin_transform, np.float32)
    arrays["resolution"] = np.asarray(meta.resolution, np.float32)
    if isinstance(grid, SdfGrid):
        arrays["values"] = np.asarray(grid.values, np.float32)
        arrays["oob_value"] = np.asarray(grid.oob_value, np.float32)
    elif isinstance(grid, CollisionMap):
        arrays["occupancy"] = np.asarray(grid.occupancy, np.float32)
        arrays["component"] = np.asarray(grid.component, np.uint32)
        arrays["oob_occupancy"] = np.asarray(grid.oob_occupancy, np.float32)
        header["components_valid"] = bool(grid.components_valid)
    elif isinstance(grid, TaggedCollisionMap):
        arrays["occupancy"] = np.asarray(grid.occupancy, np.float32)
        arrays["component"] = np.asarray(grid.component, np.uint32)
        arrays["object_id"] = np.asarray(grid.object_id, np.uint32)
        arrays["convex_segment"] = np.asarray(grid.convex_segment, np.uint32)
        arrays["oob_occupancy"] = np.asarray(grid.oob_occupancy, np.float32)
        header["components_valid"] = bool(grid.components_valid)
        header["convex_segments_valid"] = bool(grid.convex_segments_valid)
    else:
        raise TypeError(type(grid))
    arrays["__header__"] = np.frombuffer(
        _json.dumps(header).encode(), np.uint8
    )
    np.savez_compressed(path, **arrays)


def load_checkpoint(path: str):
    import dataclasses as _dc
    import json as _json

    with np.load(path) as z:
        header = _json.loads(bytes(z["__header__"].tobytes()).decode())
        meta = GridMeta.create(
            z["origin_transform"],
            float(z["resolution"]),
            tuple(header["shape"]),
            header["frame"],
        )
        kind = header["kind"]
        if kind == "SdfGrid":
            return SdfGrid.create(z["values"], meta, float(z["oob_value"]))
        if kind == "CollisionMap":
            cm = CollisionMap.create(
                z["occupancy"], meta, float(z["oob_occupancy"]), z["component"]
            )
            return _dc.replace(cm, components_valid=header["components_valid"])
        if kind == "TaggedCollisionMap":
            tm = TaggedCollisionMap.create(
                z["occupancy"], z["object_id"], meta, float(z["oob_occupancy"])
            )
            return _dc.replace(
                tm,
                component=z["component"],
                convex_segment=z["convex_segment"],
                components_valid=header["components_valid"],
                convex_segments_valid=header["convex_segments_valid"],
            )
        raise ValueError(kind)


def collision_map_message_blob(cmap: CollisionMap, n_components: int = 0) -> bytes:
    """Always-compressed CollisionMap msg payload (collision_map.cpp:285-299)."""
    return zlib.compress(serialize_collision_map(cmap, n_components))


def collision_map_from_message_blob(blob: bytes, is_compressed: bool = True) -> CollisionMap:
    body = zlib.decompress(blob) if is_compressed else blob
    return deserialize_collision_map(body)


def tagged_map_message_blob(tmap: TaggedCollisionMap) -> bytes:
    """Always-compressed TaggedObjectCollisionMap msg payload
    (tagged_object_collision_map.cpp:306-320)."""
    return zlib.compress(serialize_tagged_map(tmap))


def tagged_map_from_message_blob(blob: bytes, is_compressed: bool = True) -> TaggedCollisionMap:
    body = zlib.decompress(blob) if is_compressed else blob
    return deserialize_tagged_map(body)


# ---------------------------------------------------------------------------
# ROS message envelope framing
#
# The reference ships its grids over ROS as `header + uint8[] + bool`
# messages (msg/SDF.msg, msg/CollisionMap.msg, msg/TaggedObjectCollisionMap
# .msg; populated by GetMessageRepresentation, sdf.cpp:472-483). These
# helpers produce/consume that message in the standard ROS wire
# serialization (fields in declaration order; std_msgs/Header = uint32 seq +
# uint32 secs + uint32 nsecs + length-prefixed frame_id; arrays and strings
# are uint32-length-prefixed; bool is one byte) so the full byte format —
# envelope included — is round-trippable without a ROS installation.
# ---------------------------------------------------------------------------


def frame_ros_message(
    payload: bytes,
    frame_id: str,
    is_compressed: bool = True,
    stamp: Tuple[int, int] = (0, 0),
    seq: int = 0,
) -> bytes:
    """Wrap a serialized-grid payload in the ROS wire envelope."""
    fid = frame_id.encode()
    return b"".join(
        [
            struct.pack("<III", seq, stamp[0], stamp[1]),
            struct.pack("<I", len(fid)),
            fid,
            struct.pack("<I", len(payload)),
            payload,
            struct.pack("<B", int(is_compressed)),
        ]
    )


def unframe_ros_message(buf: bytes) -> Tuple[bytes, str, bool]:
    """(payload, frame_id, is_compressed) from a ROS-wire envelope."""
    r = _Reader(buf)
    _seq, _secs, _nsecs = r.pod("III")
    fid = r.raw(r.pod("I")).decode()
    payload = r.raw(r.pod("I"))
    is_compressed = bool(r.pod("B"))
    if r.pos != len(buf):
        raise ValueError(f"trailing bytes in message ({len(buf) - r.pos})")
    return payload, fid, is_compressed


def sdf_message(sdf: SdfGrid, stamp: Tuple[int, int] = (0, 0), seq: int = 0) -> bytes:
    """Full sdf_tools/SDF message bytes (GetMessageRepresentation parity:
    always-compressed payload, header carrying the grid frame)."""
    return frame_ros_message(sdf_message_blob(sdf), sdf.meta.frame, True, stamp, seq)


def sdf_from_message(buf: bytes) -> SdfGrid:
    payload, _fid, is_compressed = unframe_ros_message(buf)
    return sdf_from_message_blob(payload, is_compressed)


def collision_map_message(
    cmap: CollisionMap, n_components: int = 0,
    stamp: Tuple[int, int] = (0, 0), seq: int = 0,
) -> bytes:
    """Full sdf_tools/CollisionMap message bytes (collision_map.cpp:285-299)."""
    return frame_ros_message(
        collision_map_message_blob(cmap, n_components), cmap.meta.frame, True, stamp, seq
    )


def collision_map_from_message(buf: bytes) -> CollisionMap:
    payload, _fid, is_compressed = unframe_ros_message(buf)
    return collision_map_from_message_blob(payload, is_compressed)


def tagged_map_message(
    tmap: TaggedCollisionMap, stamp: Tuple[int, int] = (0, 0), seq: int = 0
) -> bytes:
    """Full sdf_tools/TaggedObjectCollisionMap message bytes
    (tagged_object_collision_map.cpp:306-320)."""
    return frame_ros_message(tagged_map_message_blob(tmap), tmap.meta.frame, True, stamp, seq)


def tagged_map_from_message(buf: bytes) -> TaggedCollisionMap:
    payload, _fid, is_compressed = unframe_ros_message(buf)
    return tagged_map_from_message_blob(payload, is_compressed)
