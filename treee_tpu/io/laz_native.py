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
    if len(payload) < 34 + 6 * num_items:
        raise CorruptFile(
            f"LASzip VLR item list truncated: {num_items} items need "
            f"{34 + 6 * num_items} bytes, payload has {len(payload)}"
        )
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


# LASzip item types (published constants): BYTE=0, POINT10=6, GPSTIME11=7,
# RGB12=8, WAVEPACKET13=9 (sequential, LAS point formats 0-5; all v2 items
# except the wave packet, which only exists as v1); POINT14=10, RGB14=11,
# RGBNIR14=12, WAVEPACKET14=13, BYTE14=14 (layered v3, LAS 1.4 formats 6+).
ITEM_BYTE, ITEM_POINT10, ITEM_GPSTIME11, ITEM_RGB12 = 0, 6, 7, 8
ITEM_WAVEPACKET13 = 9
ITEM_POINT14, ITEM_RGB14, ITEM_RGBNIR14 = 10, 11, 12
ITEM_WAVEPACKET14, ITEM_BYTE14 = 13, 14

_LAYERED_TYPES = (ITEM_POINT14, ITEM_RGB14, ITEM_RGBNIR14, ITEM_WAVEPACKET14,
                  ITEM_BYTE14)


def standard_items(point_format: int, point_length: int) -> list[dict]:
    """The LASzip item sequence for a LAS point format 0-5 (sequential) or
    6-10 (layered v3) record."""
    if 0 <= point_format <= 5:
        items = [{"type": ITEM_POINT10, "size": 20, "version": 2}]
        used = 20
        if point_format in (1, 3, 4, 5):
            items.append({"type": ITEM_GPSTIME11, "size": 8, "version": 2})
            used += 8
        if point_format in (2, 3, 5):
            items.append({"type": ITEM_RGB12, "size": 6, "version": 2})
            used += 6
        if point_format in (4, 5):
            items.append({"type": ITEM_WAVEPACKET13, "size": 29, "version": 1})
            used += 29
        tail = {"type": ITEM_BYTE, "version": 2}
    elif 6 <= point_format <= 10:
        items = [{"type": ITEM_POINT14, "size": 30, "version": 3}]
        used = 30
        if point_format == 7:
            items.append({"type": ITEM_RGB14, "size": 6, "version": 3})
            used += 6
        if point_format in (8, 10):
            items.append({"type": ITEM_RGBNIR14, "size": 8, "version": 3})
            used += 8
        if point_format in (9, 10):
            items.append({"type": ITEM_WAVEPACKET14, "size": 29, "version": 3})
            used += 29
        tail = {"type": ITEM_BYTE14, "version": 3}
    else:
        raise UnsupportedFormat(
            f"point format {point_format} (0-10 supported)"
        )
    if point_length < used:
        raise CorruptFile(
            f"point length {point_length} shorter than format "
            f"{point_format}'s items ({used})"
        )
    if point_length > used:
        items.append(dict(tail, size=point_length - used))
    return items


def make_vlr(chunk_size: int = DEFAULT_CHUNK_SIZE, point_length: int = 20,
             point_format: int = 0) -> bytes:
    """LASzip VLR payload: sequential chunked (formats 0-5) or layered v3
    (formats 6-10) items for the given point format."""
    items = standard_items(point_format, point_length)
    packed = [struct.pack("<HHH", it["type"], it["size"], it["version"])
              for it in items]
    compressor = 3 if point_format >= 6 else 2  # 3 = layered chunked
    head = struct.pack(
        "<HHBBHIIqqH",
        compressor,
        0,            # coder: arithmetic
        3, 4, 3,      # version
        0,            # options
        chunk_size,
        0, 0,         # special EVLRs
        len(packed),
    )
    return head + b"".join(packed)


def chunk_counts(data: bytes, header, vlr: bytes | None) -> np.ndarray:
    """Per-chunk point counts from the file's LAZ chunk table (u64[n_chunks]).

    The streaming ingest path slabs on chunk boundaries; for variable-size-
    chunk files those boundaries only exist in the table (advisor r4: such
    files used to degrade to a single slab).  Fixed-size framing returns
    ``chunk_size`` per entry with the last chunk clamped to the header
    count.  Raises CorruptFile/UnsupportedFormat like :func:`decompress`.
    """
    if vlr is None:
        raise CorruptFile("compressed flag set but no LASzip VLR found")
    info = parse_vlr(vlr)
    chunk_size = info["chunk_size"] or DEFAULT_CHUNK_SIZE
    lib = native_build.load_library(required=True)
    n = int(header.num_points)
    # two calls: first sizes the buffer (counts_cap=0 still reports
    # *n_chunks_out), so no n-point-sized host allocation is ever faulted
    # (~10-20 MB/s fresh-page path, CLAUDE.md)
    n_chunks = ctypes.c_uint64(0)

    def call(buf, cap):
        return lib.treee_laz_chunk_counts(
            data, len(data), header.offset_to_point_data,
            chunk_size, ctypes.c_uint64(n),
            buf, ctypes.c_uint64(cap), ctypes.byref(n_chunks),
        )

    rc = call(None, 0)
    if rc == 0 and n_chunks.value:
        counts = np.zeros(int(n_chunks.value), np.uint32)
        rc = call(counts.ctypes.data_as(ctypes.c_void_p), len(counts))
    else:
        counts = np.zeros(0, np.uint32)
    if rc == 1:
        raise CorruptFile("LAZ chunk table corrupt")
    if rc:
        raise UnsupportedFormat(f"LAZ chunk table unsupported (rc={rc})")
    out = counts[: int(n_chunks.value)].astype(np.int64)
    # clamp the tail so cumulative sums never exceed the header count
    # (fixed framing reports chunk_size even for the final partial chunk);
    # when the table covers FEWER than n points (truncated table / inflated
    # header) leave the counts untouched — callers stop at the coverage
    cum = np.cumsum(out)
    pos = int(np.searchsorted(cum, n, side="left"))
    if pos < len(out):
        out = out[: pos + 1]
        prev = int(cum[pos - 1]) if pos >= 1 else 0
        out[-1] = min(int(out[-1]), n - prev)
    return out


def decompress(data: bytes, header, vlr: bytes | None, n_points: int,
               first_point: int = 0) -> np.ndarray:
    """Decompress LAZ point records -> raw record bytes u8[n*point_length].

    ``first_point`` decodes the range [first_point, first_point+n_points)
    without touching earlier chunks (they are independent streams) — the
    ingest-streaming path.  Must be a multiple of the VLR chunk size."""
    if vlr is None:
        raise CorruptFile("compressed flag set but no LASzip VLR found")
    info = parse_vlr(vlr)
    if info["coder"] != 0:
        raise UnsupportedFormat(f"LASzip coder {info['coder']} not supported")
    items = info["items"]
    if info["compressor"] == 2:  # sequential chunked (formats 0-5)
        def seq_ok(it):
            # the native codec implements the v2 item coding ONLY (v1 uses
            # different corrector/model layouts, so accepting it here would
            # silently decode garbage instead of raising) — except the wave
            # packet, whose only published sequential coding is v1
            if it["type"] == ITEM_WAVEPACKET13:
                return it["version"] == 1
            return (it["type"] in (ITEM_POINT10, ITEM_GPSTIME11, ITEM_RGB12,
                                   ITEM_BYTE)
                    and it["version"] == 2)

        ok = (
            len(items) >= 1
            and items[0]["type"] == ITEM_POINT10
            and all(seq_ok(it) for it in items)
        )
        entry = "treee_laz_decompress_items"
    elif info["compressor"] == 3:  # layered chunked (LAS 1.4 formats 6+)
        ok = (
            len(items) >= 1
            and items[0]["type"] == ITEM_POINT14
            # v3 only: a hypothetical v4 layered coding would differ, and
            # decoding it with v3 semantics would corrupt silently
            and all(
                it["type"] in _LAYERED_TYPES and it["version"] == 3
                for it in items
            )
        )
        entry = "treee_laz_decompress_layered"
    else:
        raise UnsupportedFormat(
            f"LASzip compressor {info['compressor']} (pointwise chunked and "
            "layered chunked are implemented)"
        )
    if not ok:
        raise UnsupportedFormat(
            f"LASzip items {items} (sequential POINT10-family v2 + "
            "WAVEPACKET13 v1, and layered v3 POINT14-family, implemented)"
        )
    if sum(it["size"] for it in items) != header.point_length:
        raise CorruptFile("LASzip item sizes disagree with the point length")
    lib = native_build.load_library(required=True)
    out = np.empty(n_points * header.point_length, np.uint8)
    types = np.asarray([it["type"] for it in items], np.uint16)
    sizes = np.asarray([it["size"] for it in items], np.uint16)
    chunk_size = info["chunk_size"] or DEFAULT_CHUNK_SIZE
    rc = getattr(lib, entry)(
        data, len(data), header.offset_to_point_data, n_points,
        header.point_length,
        types.ctypes.data_as(ctypes.c_void_p),
        sizes.ctypes.data_as(ctypes.c_void_p), len(items),
        chunk_size,
        out.ctypes.data_as(ctypes.c_void_p), 0,
        ctypes.c_uint64(first_point),
    )
    if rc == 1:
        raise CorruptFile("LAZ stream corrupt")
    if rc == 4:
        # the native decoder's loud-divergence guard: a layer/chunk decode
        # consumed a different symbol sequence than the writer emitted.  On
        # a real upstream .laz the first suspects are the DERIVED adaptive-
        # model details (POINT14 16x16 context tables, chunk-internal
        # layout) — see native/laz_layered.cpp header + CLAUDE.md
        raise CorruptFile(
            "LAZ decode diverged from the writer's stream (overran a "
            "layer/chunk or in-chunk count mismatch). If this file comes "
            "from upstream LASzip, our derived adaptive-model tables "
            "likely differ — report with the file attached rather than "
            "trusting any decoded points.")
    if rc:
        raise UnsupportedFormat(f"LAZ decode unsupported (rc={rc})")
    return out


def compress(records: np.ndarray, point_length: int, base_offset: int,
             chunk_size: int = DEFAULT_CHUNK_SIZE,
             point_format: int = 0) -> bytes:
    """Compress raw point records into a chunked LAZ stream using the
    standard item sequence for ``point_format`` (sequential for formats
    0-5, layered v3 for formats 6-10)."""
    if point_length < 20:
        raise UnsupportedFormat("point record shorter than the POINT10 core")
    items = standard_items(point_format, point_length)
    lib = native_build.load_library(required=True)
    entry = (lib.treee_laz_compress_layered if point_format >= 6
             else lib.treee_laz_compress_items)
    records = np.ascontiguousarray(records, np.uint8)
    n = records.size // point_length
    types = np.asarray([it["type"] for it in items], np.uint16)
    sizes = np.asarray([it["size"] for it in items], np.uint16)
    cap = records.size + (1 << 20)
    out = np.empty(cap, np.uint8)
    out_len = ctypes.c_uint64(0)

    def run(cap, out):
        return entry(
            records.ctypes.data_as(ctypes.c_void_p), n, point_length,
            types.ctypes.data_as(ctypes.c_void_p),
            sizes.ctypes.data_as(ctypes.c_void_p), len(items),
            chunk_size, base_offset,
            out.ctypes.data_as(ctypes.c_void_p), cap, ctypes.byref(out_len),
        )

    rc = run(cap, out)
    if rc == 3:  # grow once
        cap = out_len.value
        out = np.empty(cap, np.uint8)
        rc = run(cap, out)
    if rc:
        raise UnsupportedFormat(f"LAZ encode failed (rc={rc})")
    return out[: out_len.value].tobytes()
