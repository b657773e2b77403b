"""LAS/LAZ ingest: header parse, point-record decode, synthetic-scan writer.

Mirrors the observable behavior of the reference loader (treee/src/laz.rs):

- LAS public header block parsed from the 375-byte packed layout (laz.rs:228-268;
  the layout itself is the public ASPRS LAS 1.4 spec).
- legacy point count fallback (laz.rs:279-281) and "LASF" signature check
  (laz.rs:282-284).
- Point decode: int32 (x,y,z) * scale + offset in f64, then axis swizzle
  (x,y,z) -> (x, z, -y) so y is up, recentered on the scan center and cast to f32
  (laz.rs:202-213).  The world center is the midpoint of the header bounds unless
  a caller supplies one (laz.rs:74; Interactive::add_points passes the session
  offset, interactive/mod.rs:341).

Decode is a single vectorized numpy pass (a strided structured view over the raw
record bytes) instead of the reference's per-point loop + rayon chunk pool; the
optional C++ decoder (native/las_decode.cpp) threads the same transform for large
files.  LAZ (compressed) files are recognized by the LASzip VLR; decompression is
handled by the native codec when built, else a clear error.
"""

from __future__ import annotations

import dataclasses
import io as _io
import struct
import numpy as np

from ..utils.errors import CorruptFile

LAS_SIGNATURE = b"LASF"

# (name, struct format) pairs for the LAS public header block through 1.4.
_HEADER_FMT = "<4sHHIHH8sBB32s32sHHHIIBHI5I12d8sQIQ15Q"
_HEADER_SIZE_V14 = struct.calcsize(_HEADER_FMT)  # 375
assert _HEADER_SIZE_V14 == 375


@dataclasses.dataclass
class LasHeader:
    signature: bytes
    version_major: int
    version_minor: int
    header_size: int
    offset_to_point_data: int
    num_vlrs: int
    point_format: int
    point_length: int
    num_points: int
    scale: np.ndarray    # f64[3]
    offset: np.ndarray   # f64[3]
    min_xyz: np.ndarray  # f64[3] LAS-space min
    max_xyz: np.ndarray  # f64[3] LAS-space max
    compressed: bool = False

    @classmethod
    def parse(cls, data: bytes) -> "LasHeader":
        if len(data) < 227:
            raise CorruptFile("file too small for a LAS header")
        buf = data[:_HEADER_SIZE_V14]
        if len(buf) < _HEADER_SIZE_V14:
            buf = buf + b"\0" * (_HEADER_SIZE_V14 - len(buf))
        f = struct.unpack(_HEADER_FMT, buf)
        (sig, _src, _enc, _g1, _g2, _g3, _g4, vmaj, vmin, _sys, _sw, _day, _yr,
         header_size, offset_to_points, num_vlrs, pt_format, pt_length,
         legacy_count, *rest) = f
        legacy_returns = rest[:5]
        doubles = rest[5:17]
        # rest[17]=waveform offset, rest[18]=first EVLR, rest[19]=#EVLRs
        num_points_14 = rest[20]
        if sig != LAS_SIGNATURE:
            raise CorruptFile("corrupt file: bad LAS signature")
        if pt_length < 12:
            # every record starts with the 12-byte i32 xyz triple; a shorter
            # length would walk decoders (incl. the native path) out of bounds
            raise CorruptFile(
                f"corrupt file: point record length {pt_length} < 12")
        # the 64-bit count field only exists in 1.4's 375-byte header; for a
        # legacy (227-byte) header those bytes are VLR/point data — reading
        # them would turn "legacy count 0" into a garbage point count
        has_14_count = vmin >= 4 and header_size >= _HEADER_SIZE_V14
        num_points = (
            legacy_count if legacy_count != 0
            else (num_points_14 if has_14_count else 0)
        )
        sx, sy, sz, ox, oy, oz, maxx, minx, maxy, miny, maxz, minz = doubles
        # bit 7 of the point format flags LAZ compression (LASzip convention)
        compressed = bool(pt_format & 0x80)
        del legacy_returns
        return cls(
            signature=sig,
            version_major=vmaj,
            version_minor=vmin,
            header_size=header_size,
            offset_to_point_data=offset_to_points,
            num_vlrs=num_vlrs,
            point_format=pt_format & 0x7F,
            point_length=pt_length,
            num_points=int(num_points),
            scale=np.array([sx, sy, sz]),
            offset=np.array([ox, oy, oz]),
            min_xyz=np.array([minx, miny, minz]),
            max_xyz=np.array([maxx, maxy, maxz]),
            compressed=compressed,
        )


def _find_laszip_vlr(data: bytes, header: LasHeader) -> bytes | None:
    """Return the LASzip VLR record payload if present."""
    pos = header.header_size
    for _ in range(header.num_vlrs):
        if pos + 54 > len(data):
            return None
        user_id = data[pos + 2 : pos + 18].rstrip(b"\0")
        record_id, length = struct.unpack_from("<HH", data, pos + 18)
        payload = data[pos + 54 : pos + 54 + length]
        if user_id == b"laszip encoded" and record_id == 22204:
            return payload
        pos += 54 + length
    return None


@dataclasses.dataclass
class LoadedScan:
    """Decoded scan: y-up centered f32 positions + world metadata.

    ``attributes`` carries the non-coordinate point-record fields the format
    defines (decode_attributes) — beyond the reference, whose loader keeps
    only xyz (laz.rs:202-213, Point3 per point)."""

    pos: np.ndarray          # f32[N,3] (x, z_up, -y) - center
    world_offset: np.ndarray # f64[3] center in swizzled LAS space
    lo: np.ndarray           # f32[3] swizzled bounds (laz.rs:120-121)
    hi: np.ndarray
    header: LasHeader
    attributes: dict = dataclasses.field(default_factory=dict)


def swizzle_bounds(header: LasHeader) -> tuple[np.ndarray, np.ndarray]:
    """Header bounds in y-up space: min=(minx, minz, -maxy), max=(maxx, maxz, -miny)
    (laz.rs:72-73)."""
    mn, mx = header.min_xyz, header.max_xyz
    lo = np.array([mn[0], mn[2], -mx[1]])
    hi = np.array([mx[0], mx[2], -mn[1]])
    return lo, hi


def decode_records(
    raw: np.ndarray | bytes,
    point_length: int,
    scale: np.ndarray,
    offset: np.ndarray,
    center: np.ndarray,
) -> np.ndarray:
    """Vectorized i32-record -> centered y-up f32 decode (laz.rs:202-213)."""
    buf = np.frombuffer(raw, dtype=np.uint8) if isinstance(raw, (bytes, bytearray)) else raw
    n = buf.size // point_length
    rec = buf[: n * point_length]
    dt = np.dtype(
        {"names": ["x", "y", "z"], "formats": ["<i4", "<i4", "<i4"],
         "offsets": [0, 4, 8], "itemsize": point_length}
    )
    xyz = rec.view(dt)
    x = xyz["x"].astype(np.float64) * scale[0] + offset[0]
    y = xyz["y"].astype(np.float64) * scale[1] + offset[1]
    z = xyz["z"].astype(np.float64) * scale[2] + offset[2]
    out = np.empty((n, 3), np.float32)
    out[:, 0] = x - center[0]
    out[:, 1] = z - center[1]
    out[:, 2] = (-y) - center[2]
    return out


# Byte offsets of the optional per-format record fields (ASPRS LAS 1.4 spec
# §4.5-4.15): RGB u16 triples and GPS-time f64 per point format.
RGB_OFFSETS = {2: 20, 3: 28, 5: 28, 7: 30, 8: 30, 10: 30}
GPS_OFFSETS = {1: 20, 3: 20, 4: 20, 5: 20, 6: 22, 7: 22, 8: 22, 9: 22, 10: 22}
NIR_OFFSETS = {8: 36, 10: 36}


def decode_attributes(raw, point_format: int, point_length: int,
                      n: int | None = None) -> dict:
    """Non-coordinate per-point fields from raw LAS records, as a dict.

    Always present: ``intensity`` u16, ``file_classification`` u8 (the
    producer's ASPRS class: the 5-bit field of legacy formats 0-5, the full
    byte of formats 6+), ``return_number`` u8.  Format-dependent: ``rgb``
    u16[N,3], ``gps_time`` f64, ``nir`` u16.  The reference loader discards
    all of these (laz.rs:202-213); a forestry user switching from it keeps
    them here for display (Session.attribute_prop) and re-export
    (Session.export_las).
    """
    buf = (np.frombuffer(raw, dtype=np.uint8)
           if isinstance(raw, (bytes, bytearray)) else raw)
    n_rec = buf.size // point_length
    if n is not None:
        n_rec = min(n_rec, n)
    rec = buf[: n_rec * point_length].reshape(n_rec, point_length)

    def field(offset, dtype, count=1):
        # a lying header (point_length shorter than the format's layout)
        # yields no attribute rather than an out-of-bounds view; the
        # ascontiguousarray already materializes a fresh owning copy (the
        # column slice is always strided), so callers must not re-copy —
        # this VM's host-memory path is ~10 MB/s post-device-init (CLAUDE.md)
        w = np.dtype(dtype).itemsize * count
        if offset + w > point_length:
            return None
        a = np.ascontiguousarray(rec[:, offset:offset + w]).view(dtype)
        return a.reshape(n_rec, count) if count > 1 else a.reshape(n_rec)

    attrs = {}
    intensity = field(12, "<u2")
    if intensity is not None:
        attrs["intensity"] = intensity
    if point_format >= 6:
        if point_length > 16:
            attrs["file_classification"] = rec[:, 16].copy()
            attrs["return_number"] = rec[:, 14] & 0x0F
    elif point_length > 15:
        attrs["file_classification"] = rec[:, 15] & 0x1F
        attrs["return_number"] = rec[:, 14] & 0x07
    for name, offsets, dtype, count in (
        ("rgb", RGB_OFFSETS, "<u2", 3),
        ("gps_time", GPS_OFFSETS, "<f8", 1),
        ("nir", NIR_OFFSETS, "<u2", 1),
    ):
        if point_format in offsets:
            v = field(offsets[point_format], dtype, count)
            if v is not None:
                attrs[name] = v
    return attrs


def load(source, center: np.ndarray | None = None, max_points: int | None = None) -> LoadedScan:
    """Load a .las (or .laz via the native codec) file or bytes buffer."""
    if isinstance(source, (bytes, bytearray)):
        data = bytes(source)
    elif hasattr(source, "read"):
        data = source.read()
    else:
        with open(source, "rb") as fh:
            data = fh.read()

    header = LasHeader.parse(data)
    vlr = _find_laszip_vlr(data, header)
    compressed = header.compressed or vlr is not None

    n = header.num_points
    if max_points is not None:
        n = min(n, max_points)

    # world center in swizzled space: midpoint of swizzled bounds (laz.rs:72-74)
    lo_w, hi_w = swizzle_bounds(header)
    if center is None:
        center = (lo_w + hi_w) / 2.0

    if compressed:
        from . import laz_native  # deferred; requires built native codec

        raw = laz_native.decompress(data, header, vlr, n)
    else:
        start = header.offset_to_point_data
        raw = np.frombuffer(
            data, np.uint8, count=n * header.point_length, offset=start
        )

    # threaded C++ decode for big scans, numpy otherwise (same transform)
    from . import native_build

    lib = native_build.load_library(required=False) if n >= 1_000_000 else None
    if lib is not None:
        pos = native_build.las_decode(
            lib, raw, header.point_length, header.scale, header.offset, center
        )[:n]
    else:
        pos = decode_records(
            raw, header.point_length, header.scale, header.offset, center
        )[:n]
    return LoadedScan(
        pos=pos,
        world_offset=center,
        lo=(lo_w - center).astype(np.float32),
        hi=(hi_w - center).astype(np.float32),
        header=header,
        attributes=decode_attributes(
            raw, header.point_format, header.point_length, n
        ),
    )


def load_streaming(source, slab_cb, center: np.ndarray | None = None,
                   max_points: int | None = None,
                   slab_points: int = 4_000_000) -> LoadedScan:
    """:func:`load` with a per-slab callback fired DURING decode.

    The reference streams decoded chunks to the renderer while loading
    (loading.rs:91-115 -> program.rs:508-530); this is that hook for the
    ingest path: points are decoded in chunk-aligned slabs of
    ~``slab_points`` and ``slab_cb(pos_slab f32[k,3], n_done, n_total)``
    fires after each slab, letting a viewer show imagery while a large
    ``.laz`` is still decompressing.  ``.laz`` slabs cover whole LASzip
    chunks (independent streams — native range decode, no re-decoding);
    variable-size-chunk files slab on the chunk table's own boundaries
    (laz_native.chunk_counts), falling back to a single slab only when
    the table is unreadable.  Returns the same :class:`LoadedScan` as
    :func:`load`.
    """
    if isinstance(source, (bytes, bytearray)):
        data = bytes(source)
    elif hasattr(source, "read"):
        data = source.read()
    else:
        with open(source, "rb") as fh:
            data = fh.read()

    header = LasHeader.parse(data)
    vlr = _find_laszip_vlr(data, header)
    compressed = header.compressed or vlr is not None
    n = header.num_points
    if max_points is not None:
        n = min(n, max_points)
    lo_w, hi_w = swizzle_bounds(header)
    if center is None:
        center = (lo_w + hi_w) / 2.0

    if compressed:
        from . import laz_native

        if vlr is None:
            from ..utils.errors import CorruptFile

            raise CorruptFile("compressed flag set but no LASzip VLR found")
        cs = laz_native.parse_vlr(vlr)["chunk_size"]
        if cs in (0, 0xFFFFFFFF):
            # variable-size chunks: boundaries only exist in the chunk
            # table — read it and group chunks into ~slab_points slabs
            # (advisor r4: this used to degrade to ONE slab, silently
            # disabling the mid-decode preview for exactly the large
            # files it targets)
            try:
                counts = laz_native.chunk_counts(data, header, vlr)
                starts = [0]
                for c in np.cumsum(counts):
                    if int(c) >= n:
                        break
                    if int(c) - starts[-1] >= slab_points:
                        starts.append(int(c))
            except Exception:
                starts = [0]  # unreadable table: fall back to one slab
        else:
            slab = max(cs, slab_points // cs * cs)
            starts = list(range(0, n, slab))
    else:
        slab = max(1, slab_points)
        starts = list(range(0, n, slab))

    # preallocate AND pre-touch (np.zeros is calloc-backed and still
    # faults per page on first write): the post-device-init host
    # page-fault path is ~10 MB/s (CLAUDE.md memory rules), and the
    # preview path initializes the device after the FIRST slab
    raw = np.empty(n * header.point_length, np.uint8)
    raw.fill(0)
    pos = np.empty((n, 3), np.float32)
    pos.fill(0)
    from . import native_build

    lib = native_build.load_library(required=False) if n >= 1_000_000 else None
    if n == 0:
        starts = []
    for i, done in enumerate(starts):
        k = (starts[i + 1] if i + 1 < len(starts) else n) - done
        if compressed:
            part = laz_native.decompress(data, header, vlr, k,
                                         first_point=done)
        else:
            start = header.offset_to_point_data + done * header.point_length
            part = np.frombuffer(data, np.uint8,
                                 count=k * header.point_length, offset=start)
        raw[done * header.point_length:(done + k) * header.point_length] = part
        if lib is not None:
            p = native_build.las_decode(
                lib, np.ascontiguousarray(part), header.point_length,
                header.scale, header.offset, center)[:k]
        else:
            p = decode_records(part, header.point_length, header.scale,
                               header.offset, center)[:k]
        pos[done:done + k] = p
        done += k
        if slab_cb is not None:
            slab_cb(p, done, n)
    return LoadedScan(
        pos=pos,
        world_offset=center,
        lo=(lo_w - center).astype(np.float32),
        hi=(hi_w - center).astype(np.float32),
        header=header,
        attributes=decode_attributes(
            raw, header.point_format, header.point_length, n
        ),
    )


# Record length per LAS point format (ASPRS spec).
POINT_LENGTHS = {0: 20, 1: 28, 2: 26, 3: 34, 4: 57, 5: 63,
                 6: 30, 7: 36, 8: 38, 9: 59, 10: 67}


def _legacy_block(n, point_format, point_length, offset_to_points, n_vlrs,
                  scale, offset, mins, maxs, version_minor, header_size,
                  global_encoding=0) -> bytes:
    """The LAS 1.x legacy header block (227 bytes), shared by every header
    generation this writer emits."""
    legacy_fmt = "<4sHHIHH8sBB32s32sHHHIIBHI5I12d"
    return struct.pack(
        legacy_fmt,
        LAS_SIGNATURE, 0, global_encoding, 0, 0, 0, b"\0" * 8,
        1, version_minor,
        b"treee-tpu".ljust(32, b"\0"), b"treee-tpu".ljust(32, b"\0"),
        1, 2026, header_size, offset_to_points, n_vlrs,
        point_format, point_length,
        n, 0, 0, 0, 0, 0,
        scale, scale, scale, offset[0], offset[1], offset[2],
        maxs[0], mins[0], maxs[1], mins[1], maxs[2], mins[2],
    )


def _legacy_header(n, point_format, point_length, offset_to_points, n_vlrs,
                   scale, offset, mins, maxs) -> bytes:
    return _legacy_block(n, point_format, point_length, offset_to_points,
                         n_vlrs, scale, offset, mins, maxs,
                         version_minor=2, header_size=227)


def _header13(n, point_format, point_length, offset_to_points, n_vlrs,
              scale, offset, mins, maxs) -> bytes:
    """LAS 1.3 public header (235 bytes): the legacy block plus the u64
    'Start of Waveform Data Packet Record' field — required for the
    waveform point formats 4/5 (ASPRS LAS 1.3).  Global Encoding bit 2
    (waveform packets EXTERNAL) is set and the start-of-waveform field is
    zero: the records carry no internal waveform block, and LAS 1.3
    requires one of the waveform bits for formats 4/5."""
    head = _legacy_block(n, point_format, point_length, offset_to_points,
                         n_vlrs, scale, offset, mins, maxs,
                         version_minor=3, header_size=235,
                         global_encoding=0x4)
    return head + struct.pack("<Q", 0)


def _header14(n, point_format, point_length, offset_to_points, n_vlrs,
              scale, offset, mins, maxs) -> bytes:
    """LAS 1.4 public header (375 bytes): legacy counts zeroed, extended
    u64 point count set — required for point formats 6+ (ASPRS LAS 1.4)."""
    return struct.pack(
        _HEADER_FMT,
        LAS_SIGNATURE, 0, 0, 0, 0, 0, b"\0" * 8, 1, 4,
        b"treee-tpu".ljust(32, b"\0"), b"treee-tpu".ljust(32, b"\0"),
        1, 2026, _HEADER_SIZE_V14, offset_to_points, n_vlrs,
        point_format, point_length,
        0, 0, 0, 0, 0, 0,  # legacy counts must be zero for formats 6+
        scale, scale, scale, offset[0], offset[1], offset[2],
        maxs[0], mins[0], maxs[1], mins[1], maxs[2], mins[2],
        b"\0" * 8, 0, 0,  # waveform offset, first EVLR, #EVLRs
        n, *([0] * 15),   # extended point count + by-return
    )


def _header_for(n, point_format, point_length, offset_to_points, n_vlrs,
                scale, mins, maxs) -> bytes:
    fmt = point_format & 0x7F
    make = (_header14 if fmt >= 6
            else _header13 if fmt in (4, 5)
            else _legacy_header)
    return make(n, point_format, point_length, offset_to_points, n_vlrs,
                scale, mins, mins, maxs)


def _header_size_for(point_format: int) -> int:
    fmt = point_format & 0x7F
    return 375 if fmt >= 6 else 235 if fmt in (4, 5) else 227


def _records_from_positions(pos_up: np.ndarray, scale: float,
                            point_length: int = 20):
    """y-up f32 -> (raw records with xyz ints at offset 0, LAS-space
    offset/min/max).  Non-coordinate fields are zero; callers may fill them."""
    las = np.empty((pos_up.shape[0], 3), np.float64)
    las[:, 0] = pos_up[:, 0]
    las[:, 1] = -pos_up[:, 2]
    las[:, 2] = pos_up[:, 1]
    mins, maxs = las.min(axis=0), las.max(axis=0)
    n = las.shape[0]
    ints = np.round((las - mins) / scale).astype(np.int32)
    rec = np.zeros((n, point_length), np.uint8)
    rec[:, 0:12] = ints.astype("<i4").view(np.uint8).reshape(n, 12)
    return rec, mins, maxs


def write_las(path: str, pos_up: np.ndarray, scale: float = 0.001,
              point_format: int = 0,
              records: np.ndarray | None = None,
              las_offset: np.ndarray | None = None) -> None:
    """Write y-up positions to a LAS file (1.2 for formats 0-3, 1.4 for 6+).

    Inverse of the load swizzle: (x, y_up, z) -> LAS (x, -z, y_up).  Used by the
    synthetic-scan generators, round-trip tests, and Session.export_las.
    ``records`` optionally supplies full raw records (xyz bytes are
    overwritten from ``pos_up``).  ``las_offset`` georeferences the header:
    a LAS-space f64[3] added to the header offset/min/max only, so the
    stored i32 coordinates stay small while the file reads back in the
    original CRS (the inverse of load()'s recentering).
    """
    point_length = POINT_LENGTHS[point_format]
    rec, mins, maxs = _records_from_positions(pos_up, scale, point_length)
    if las_offset is not None:
        mins = mins + np.asarray(las_offset, np.float64)
        maxs = maxs + np.asarray(las_offset, np.float64)
    if records is not None:
        # copy=True: patching the xyz bytes must not write through into the
        # caller's records buffer (an already-contiguous input would alias)
        patched = np.array(records, np.uint8, copy=True).reshape(rec.shape)
        patched[:, 0:12] = rec[:, 0:12]
        rec = patched
    n = rec.shape[0]
    header_size = _header_size_for(point_format)
    buf = _io.BytesIO()
    buf.write(_header_for(n, point_format, point_length, header_size, 0,
                          scale, mins, maxs))
    buf.write(rec.tobytes())
    with open(path, "wb") as fh:
        fh.write(buf.getvalue())


def write_laz(path: str, pos_up: np.ndarray, scale: float = 0.001,
              chunk_size: int = 50_000, point_format: int = 0,
              records: np.ndarray | None = None,
              las_offset: np.ndarray | None = None) -> None:
    """Write a LASzip-compressed .laz via the native codec: chunked POINT10
    (formats 0-3) or layered POINT14 (formats 6-8, LAS 1.4).  ``las_offset``
    georeferences the header exactly as in write_las."""
    from . import laz_native

    point_length = POINT_LENGTHS[point_format]
    rec, mins, maxs = _records_from_positions(pos_up, scale, point_length)
    if las_offset is not None:
        mins = mins + np.asarray(las_offset, np.float64)
        maxs = maxs + np.asarray(las_offset, np.float64)
    if records is not None:
        # copy=True: see write_las — never write through the caller's buffer
        patched = np.array(records, np.uint8, copy=True).reshape(rec.shape)
        patched[:, 0:12] = rec[:, 0:12]
        rec = patched
    n = rec.shape[0]
    header_size = _header_size_for(point_format)
    vlr_payload = laz_native.make_vlr(chunk_size, point_length, point_format)
    vlr_header = struct.pack(
        "<H16sHH32s", 0, b"laszip encoded".ljust(16, b"\0"), 22204,
        len(vlr_payload), b"treee-tpu laszip".ljust(32, b"\0"),
    )
    offset_to_points = header_size + len(vlr_header) + len(vlr_payload)
    stream = laz_native.compress(rec, point_length, offset_to_points,
                                 chunk_size, point_format)
    buf = _io.BytesIO()
    buf.write(_header_for(n, point_format | 0x80, point_length,
                          offset_to_points, 1, scale, mins, maxs))
    buf.write(vlr_header)
    buf.write(vlr_payload)
    buf.write(stream)
    with open(path, "wb") as fh:
        fh.write(buf.getvalue())


# ---------------------------------------------------------------------------
# Synthetic scans (test/bench data; the reference has none — SURVEY.md §4)
# ---------------------------------------------------------------------------

def synthetic_tree(
    rng: np.random.Generator,
    base: np.ndarray,
    trunk_height: float = 4.0,
    crown_height: float = 6.0,
    crown_radius: float = 2.5,
    trunk_radius: float = 0.25,
    n_points: int = 20_000,
) -> np.ndarray:
    """One tree: trunk cylinder + crown ellipsoid, y-up, rooted at ``base``."""
    n_trunk = n_points // 5
    n_crown = n_points - n_trunk
    theta = rng.uniform(0, 2 * np.pi, n_trunk)
    r = trunk_radius * np.sqrt(rng.uniform(0, 1, n_trunk))
    h = rng.uniform(0, trunk_height, n_trunk)
    trunk = np.stack([r * np.cos(theta), h, r * np.sin(theta)], axis=1)

    u = rng.normal(size=(n_crown, 3))
    u /= np.linalg.norm(u, axis=1, keepdims=True)
    rad = rng.uniform(0, 1, n_crown) ** (1 / 3)
    crown = u * rad[:, None]
    crown[:, 0] *= crown_radius
    crown[:, 2] *= crown_radius
    crown[:, 1] = crown[:, 1] * (crown_height / 2) + trunk_height + crown_height / 2
    pts = np.concatenate([trunk, crown]).astype(np.float32)
    return pts + base.astype(np.float32)


def synthetic_forest_realistic(
    n_trees: int = 24,
    extent: float = 60.0,
    mean_points_per_tree: int = 9_000,
    ground_points: int = 60_000,
    seed: int = 0,
) -> np.ndarray:
    """Stress scene standing in for a real ALS tile (the PANGAEA example the
    reference fetches online, empty.rs:59-122, is unreachable offline):

    - CLUSTERED tree positions (parent-child Thomas process) so crowns
      overlap and inter-tree gaps vary, unlike the jittered grid of
      :func:`synthetic_forest`;
    - log-normal size and point-density variation per tree (big dominant
      trees next to sparse understory), crown ellipsoids squashed at random;
    - flight-strip density banding (scan overlap doubles density in a strip
      across the tile) plus 0.2% outlier noise points (birds/atmosphere);
    - undulating ground with slope.

    Segmentation on this scene exercises touching crowns, density cliffs and
    off-terrain noise; tests assert behavior by invariant (SURVEY.md §4.3).
    """
    rng = np.random.default_rng(seed)
    # Thomas cluster process for stem positions, with self-thinning: real
    # stands keep stems a few meters apart (competition), so reject draws
    # closer than ~3 m to an accepted stem — crowns still overlap heavily
    n_parents = max(2, n_trees // 4)
    parents = rng.uniform(-extent / 2, extent / 2, (n_parents, 2))
    min_stem_dist = 3.0
    stems = []
    attempts = 0
    while len(stems) < n_trees and attempts < n_trees * 60:
        attempts += 1
        p = parents[rng.integers(0, n_parents)]
        cand = p + rng.normal(0.0, extent / 10.0, 2)
        if stems and (np.linalg.norm(np.asarray(stems) - cand, axis=1).min()
                      < min_stem_dist):
            continue
        stems.append(cand)
    stems = np.asarray(stems)

    def ground_y(x, z):
        return (2.0 * np.sin(x * 0.06) * np.cos(z * 0.05)
                + 0.04 * x)  # undulation + slope

    chunks = []
    for t, (sx, sz) in enumerate(stems):
        size = float(np.exp(rng.normal(0.0, 0.35)))
        n_pts = max(400, int(mean_points_per_tree
                             * np.exp(rng.normal(0.0, 0.6))))
        base = np.array([sx, ground_y(sx, sz), sz])
        tree = synthetic_tree(
            rng, base,
            trunk_height=rng.uniform(3.0, 7.0) * size,
            crown_height=rng.uniform(4.0, 9.0) * size,
            crown_radius=rng.uniform(1.8, 4.0) * size,
            trunk_radius=0.2 * size,
            n_points=n_pts,
        )
        # squash the crown ellipsoid at a random azimuth
        ang = rng.uniform(0, 2 * np.pi)
        c, s = np.cos(ang), np.sin(ang)
        sq = rng.uniform(0.6, 1.0)
        dx, dz = tree[:, 0] - sx, tree[:, 2] - sz
        u, v = c * dx + s * dz, -s * dx + c * dz
        u *= sq
        tree[:, 0] = sx + c * u - s * v
        tree[:, 2] = sz + s * u + c * v
        chunks.append(tree)

    gx = rng.uniform(-extent / 2, extent / 2, ground_points)
    gz = rng.uniform(-extent / 2, extent / 2, ground_points)
    gy = ground_y(gx, gz) + rng.normal(0.0, 0.06, ground_points)
    chunks.append(np.stack([gx, gy, gz], axis=1).astype(np.float32))

    pts = np.concatenate(chunks).astype(np.float32)
    # flight-strip overlap: duplicate (with sensor jitter) points in a band
    strip = np.abs(pts[:, 0] - extent / 8) < extent / 6
    dup = pts[strip] + rng.normal(0.0, 0.02, (int(strip.sum()), 3)).astype(np.float32)
    # sparse outliers above the canopy
    n_out = max(1, len(pts) // 500)
    outliers = np.stack([
        rng.uniform(-extent / 2, extent / 2, n_out),
        rng.uniform(15.0, 60.0, n_out),
        rng.uniform(-extent / 2, extent / 2, n_out),
    ], axis=1).astype(np.float32)
    return np.concatenate([pts, dup, outliers]).astype(np.float32)


def synthetic_forest(
    n_trees: int = 16,
    spacing: float = 8.0,
    points_per_tree: int = 20_000,
    ground_points: int = 40_000,
    seed: int = 0,
    jitter: float = 1.5,
) -> np.ndarray:
    """Grid of trees + noisy ground plane; y-up, centered near origin."""
    rng = np.random.default_rng(seed)
    side = int(np.ceil(np.sqrt(n_trees)))
    half = (side - 1) * spacing / 2
    trees = []
    for t in range(n_trees):
        gx, gz = t % side, t // side
        base = np.array(
            [gx * spacing - half + rng.uniform(-jitter, jitter), 0.0,
             gz * spacing - half + rng.uniform(-jitter, jitter)]
        )
        trees.append(
            synthetic_tree(
                rng, base,
                trunk_height=rng.uniform(3.0, 6.0),
                crown_height=rng.uniform(4.0, 8.0),
                crown_radius=rng.uniform(1.5, 3.0),
                n_points=points_per_tree,
            )
        )
    extent = half + spacing
    ground = np.stack(
        [rng.uniform(-extent, extent, ground_points),
         rng.normal(0.0, 0.05, ground_points),
         rng.uniform(-extent, extent, ground_points)],
        axis=1,
    ).astype(np.float32)
    return np.concatenate(trees + [ground]).astype(np.float32)
