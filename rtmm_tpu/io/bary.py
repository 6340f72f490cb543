"""`.bary` displacement-micromap container IO.

The reference delegates all .bary reading to the external `umeshtools_core`
library (framework/third_party/CMakeLists.txt:22-23, GPUMesh.cpp:143-152),
which yields per-face micro-vertex positions/displacements. We implement the
semantic content directly:

  * groups:    (triangle range, value range, bias+scale)
  * triangles: (value offset, subdivision level)
  * values:    displacement scalars, float32 or unorm11, u-major vertex order

Two containers are supported:
  1. The NVIDIA bary container (magic 0xAB 'B' 'A' 'R' 'Y' 0xBB 0x0D 0x0A
     0x1A 0x0A + version + property table). Only *uncompressed* value
     formats; the property identifiers below are a best-effort transcription
     of the public bary spec — files using other revisions fail with a clear
     error rather than mis-parsing.
  2. `RTMB`, this framework's own minimal container (same semantic model,
     deterministic layout) used for generated assets and round-trip tests.

Micro-vertex order: uncompressed displacement values are stored u-major on
the barycentric grid — index(u, v) sums full rows of decreasing length,
u along edge w0->w1, v along w0->w2. `umajor_to_grid_order` converts to this
framework's grid-storage order x*(x+1)/2 + y (intersection.hlsl:105-110) with
(u, v) = (x - y, y).
"""
from __future__ import annotations

import dataclasses
import struct

import numpy as np

from ..ops import subdivision

NV_BARY_MAGIC = bytes([0xAB, 0x42, 0x41, 0x52, 0x59, 0xBB,
                       0x0D, 0x0A, 0x1A, 0x0A])
RTMB_MAGIC = b"RTMB\x01\x00"

# Value formats (subset).
FORMAT_FLOAT32 = 1
FORMAT_UNORM11 = 2


@dataclasses.dataclass
class BaryGroup:
    triangle_first: int
    triangle_count: int
    value_first: int
    value_count: int
    bias: float = 0.0
    scale: float = 1.0


@dataclasses.dataclass
class BaryContent:
    """Semantic content of a displacement micromap."""

    groups: list[BaryGroup]
    tri_value_offset: np.ndarray    # (T,) int64, offset into values
    tri_subdiv_level: np.ndarray    # (T,) int32
    values: np.ndarray              # (N,) float32 displacement scalars
    # Per-triangle edge decimation flags (bit e set = the neighbor across
    # edge e has one lower subdivision level, so the finest odd micro-verts
    # on that edge are absent). Edge order: 0 = v0v1, 1 = v1v2, 2 = v2v0.
    tri_edge_flags: np.ndarray = dataclasses.field(
        default_factory=lambda: np.zeros(0, np.uint8))

    def triangle_values_grid_order(self, tri: int) -> np.ndarray:
        """Per-micro-vertex displacement scalars of one triangle in this
        framework's grid order."""
        level = int(self.tri_subdiv_level[tri])
        count = subdivision.verts_for_level(level)
        off = int(self.tri_value_offset[tri])
        vals = self.values[off:off + count]
        return vals[umajor_to_grid_order(level)]


def umajor_index(u: np.ndarray, v: np.ndarray, segments: int) -> np.ndarray:
    """Linear index of micro-vertex (u, v) in u-major order; u+v <= segments."""
    n = segments + 1
    return u * n - (u * (u - 1)) // 2 + v


def umajor_to_grid_order(level: int) -> np.ndarray:
    """Permutation p with grid_vals = umajor_vals[p]."""
    coords = subdivision.grid_coords(level)          # storage order (x, y)
    s = 2**level
    u = coords[:, 0] - coords[:, 1]
    v = coords[:, 1]
    return umajor_index(u, v, s)


def grid_to_umajor_order(level: int) -> np.ndarray:
    p = umajor_to_grid_order(level)
    inv = np.empty_like(p)
    inv[p] = np.arange(p.shape[0])
    return inv


# --- RTMB container ---------------------------------------------------------

def write_rtmb(path: str, content: BaryContent) -> None:
    t = len(content.tri_value_offset)
    with open(path, "wb") as f:
        f.write(RTMB_MAGIC)
        f.write(struct.pack("<III", len(content.groups), t,
                            len(content.values)))
        for g in content.groups:
            f.write(struct.pack("<IIIIff", g.triangle_first, g.triangle_count,
                                g.value_first, g.value_count, g.bias, g.scale))
        f.write(np.asarray(content.tri_value_offset, "<i8").tobytes())
        f.write(np.asarray(content.tri_subdiv_level, "<i4").tobytes())
        flags = content.tri_edge_flags
        if flags.shape[0] != t:
            flags = np.zeros(t, np.uint8)
        f.write(np.asarray(flags, "u1").tobytes())
        f.write(np.asarray(content.values, "<f4").tobytes())


def read_rtmb(path: str) -> BaryContent:
    with open(path, "rb") as f:
        data = f.read()
    if data[:6] != RTMB_MAGIC:
        raise ValueError("not an RTMB file")
    ng, t, nv = struct.unpack_from("<III", data, 6)
    pos = 6 + 12
    groups = []
    for _ in range(ng):
        a, b, c, d, bias, scale = struct.unpack_from("<IIIIff", data, pos)
        groups.append(BaryGroup(a, b, c, d, bias, scale))
        pos += 24
    off = np.frombuffer(data, "<i8", t, pos); pos += 8 * t
    lvl = np.frombuffer(data, "<i4", t, pos); pos += 4 * t
    flags = np.frombuffer(data, "u1", t, pos); pos += t
    vals = np.frombuffer(data, "<f4", nv, pos)
    return BaryContent(groups, off.astype(np.int64), lvl.astype(np.int32),
                       vals.astype(np.float32), flags.astype(np.uint8))


# --- NVIDIA bary container (uncompressed subset, best-effort) ---------------

# Property type identifiers (first 4 bytes of the 16-byte UUID are a
# FourCC-like tag in the public spec revisions we target).
_PROP_GROUPS = b"GRPS"
_PROP_TRIANGLES = b"TRIS"
_PROP_VALUES = b"VALS"
_PROP_INFO = b"INFO"


def read_nvidia_bary(path: str) -> BaryContent:
    with open(path, "rb") as f:
        data = f.read()
    if data[:10] != NV_BARY_MAGIC:
        raise ValueError(
            "not an NVIDIA bary container (or unsupported revision); "
            "convert with micromesh-tools or use RTMB")
    (prop_count,) = struct.unpack_from("<I", data, 16)
    props = {}
    pos = 20
    for _ in range(prop_count):
        ident = data[pos:pos + 16]
        byte_offset, byte_length = struct.unpack_from("<QQ", data, pos + 16)
        props[bytes(ident[:4])] = data[byte_offset:byte_offset + byte_length]
        pos += 32
    if _PROP_TRIANGLES not in props or _PROP_VALUES not in props:
        raise ValueError("bary file missing triangle/value properties")

    tri_raw = props[_PROP_TRIANGLES]
    n_tris = len(tri_raw) // 12
    tri = np.frombuffer(tri_raw, "<u4").reshape(n_tris, 3)
    tri_value_offset = tri[:, 0].astype(np.int64)
    tri_subdiv = tri[:, 1].astype(np.int32)
    tri_flags = (tri[:, 2] & 0x7).astype(np.uint8)

    fmt = FORMAT_FLOAT32
    bias, scale = 0.0, 1.0
    if _PROP_INFO in props:
        fmt, = struct.unpack_from("<I", props[_PROP_INFO], 0)
    if fmt == FORMAT_FLOAT32:
        values = np.frombuffer(props[_PROP_VALUES], "<f4").astype(np.float32)
    elif fmt == FORMAT_UNORM11:
        packed = np.frombuffer(props[_PROP_VALUES], "<u2")
        values = (packed.astype(np.float32) / 2047.0) * scale + bias
    else:
        raise ValueError(f"unsupported bary value format {fmt} "
                         "(only uncompressed float32/unorm11)")

    groups = []
    if _PROP_GROUPS in props:
        graw = props[_PROP_GROUPS]
        for g in range(len(graw) // 24):
            a, b, c, d, bias_, scale_ = struct.unpack_from("<IIIIff", graw,
                                                           g * 24)
            groups.append(BaryGroup(a, b, c, d, bias_, scale_))
    else:
        groups.append(BaryGroup(0, n_tris, 0, len(values)))
    return BaryContent(groups, tri_value_offset, tri_subdiv, values, tri_flags)


def read_bary(path: str) -> BaryContent:
    with open(path, "rb") as f:
        head = f.read(10)
    if head[:6] == RTMB_MAGIC:
        return read_rtmb(path)
    return read_nvidia_bary(path)
