"""LAZ (LASzip) compression/decompression via the native C++ codec.

The reference decompresses LAZ chunks in parallel with the Rust ``laz`` crate
(treee/src/laz.rs:130-180); our codec (native/laszip_core.h,
native/laz_decompress.cpp) implements the LASzip v2 POINT10 algorithm and the
chunked stream framing directly.  Correctness is currently established by
exact encoder/decoder roundtrip (this environment has no ground-truth .laz
sample or third-party codec to cross-check); files from other producers or
with richer point formats are rejected with a clear error.
"""

from __future__ import annotations

import ctypes
import struct

import numpy as np

from . import native_build
from ..utils.errors import CorruptFile, UnsupportedFormat

DEFAULT_CHUNK_SIZE = 50_000  # laz.rs:98 / LASzip default


def parse_vlr(payload: bytes) -> dict:
    """Parse the LASzip VLR record payload."""
    if len(payload) < 34:
        raise CorruptFile("LASzip VLR too short")
    (compressor, coder, vmaj, vmin, rev, options, chunk_size,
     n_special, offset_special, num_items) = struct.unpack_from(
        "<HHBBHIIqqH", payload, 0)
    items = []
    off = 34
    for _ in range(num_items):
        t, size, version = struct.unpack_from("<HHH", payload, off)
        items.append({"type": t, "size": size, "version": version})
        off += 6
    return {
        "compressor": compressor,
        "coder": coder,
        "version": (vmaj, vmin, rev),
        "chunk_size": chunk_size,
        "items": items,
    }


def make_vlr(chunk_size: int = DEFAULT_CHUNK_SIZE, point_length: int = 20) -> bytes:
    """LASzip VLR payload: chunked POINT10 (+ BYTE item for extra payload)."""
    n_extra = point_length - 20
    items = [struct.pack("<HHH", 6, 20, 2)]  # POINT10, 20 bytes, version 2
    if n_extra > 0:
        items.append(struct.pack("<HHH", 0, n_extra, 2))  # BYTE item v2
    head = struct.pack(
        "<HHBBHIIqqH",
        2,            # compressor: pointwise chunked
        0,            # coder: arithmetic
        2, 4, 3,      # version 2.4 r3
        0,            # options
        chunk_size,
        0, 0,         # special EVLRs
        len(items),
    )
    return head + b"".join(items)


def decompress(data: bytes, header, vlr: bytes | None, n_points: int) -> np.ndarray:
    """Decompress LAZ point records -> raw record bytes u8[n*point_length]."""
    if vlr is None:
        raise CorruptFile("compressed flag set but no LASzip VLR found")
    info = parse_vlr(vlr)
    if info["coder"] != 0:
        raise UnsupportedFormat(f"LASzip coder {info['coder']} not supported")
    if info["compressor"] != 2:
        raise UnsupportedFormat(
            f"LASzip compressor {info['compressor']} (only chunked pointwise "
            "POINT10 is implemented so far)"
        )
    items = info["items"]
    ok = (
        len(items) >= 1
        and items[0]["type"] == 6 and items[0]["version"] == 2
        and all(it["type"] == 0 and it["version"] == 2 for it in items[1:])
    )
    if not ok:
        raise UnsupportedFormat(
            f"LASzip items {items} (POINT10 v2 [+ BYTE v2] implemented; "
            "GPSTIME11/RGB12 item codecs are a later round)"
        )
    lib = native_build.load_library(required=True)
    out = np.empty(n_points * header.point_length, np.uint8)
    rc = lib.treee_laz_decompress(
        data, len(data), header.offset_to_point_data, n_points,
        header.point_length, header.point_format,
        info["chunk_size"] or DEFAULT_CHUNK_SIZE,
        out.ctypes.data_as(ctypes.c_void_p), 0,
    )
    if rc == 1:
        raise CorruptFile("LAZ stream corrupt")
    if rc:
        raise UnsupportedFormat(f"LAZ decode unsupported (rc={rc})")
    return out


def compress(records: np.ndarray, point_length: int, base_offset: int,
             chunk_size: int = DEFAULT_CHUNK_SIZE) -> bytes:
    """Compress raw point records (POINT10 core + extra bytes) into a chunked
    LAZ stream."""
    if point_length < 20:
        raise UnsupportedFormat("point record shorter than the POINT10 core")
    lib = native_build.load_library(required=True)
    records = np.ascontiguousarray(records, np.uint8)
    n = records.size // point_length
    cap = records.size + (1 << 20)
    out = np.empty(cap, np.uint8)
    out_len = ctypes.c_uint64(0)
    rc = lib.treee_laz_compress(
        records.ctypes.data_as(ctypes.c_void_p), n, point_length, 0,
        chunk_size, base_offset,
        out.ctypes.data_as(ctypes.c_void_p), cap, ctypes.byref(out_len),
    )
    if rc == 3:  # grow once
        cap = out_len.value
        out = np.empty(cap, np.uint8)
        rc = lib.treee_laz_compress(
            records.ctypes.data_as(ctypes.c_void_p), n, point_length, 0,
            chunk_size, base_offset,
            out.ctypes.data_as(ctypes.c_void_p), cap, ctypes.byref(out_len),
        )
    if rc:
        raise UnsupportedFormat(f"LAZ encode failed (rc={rc})")
    return out[: out_len.value].tobytes()
