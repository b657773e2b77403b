"""LASzip codec tests: exact roundtrip through the full .laz file path.

No ground-truth .laz sample exists in this environment, so validation is by
encoder/decoder roundtrip (both built fresh from the published algorithm) plus
framing checks (VLR layout, chunk table, compressed-flag detection).
"""

import numpy as np
import pytest

from treee_tpu.io import las, laz_native, native_build


pytestmark = pytest.mark.skipif(
    native_build.load_library(required=False) is None,
    reason="native codec not built",
)


def test_laz_file_roundtrip(tmp_path):
    rng = np.random.default_rng(0)
    pos = las.synthetic_forest(n_trees=4, points_per_tree=20000,
                               ground_points=20000, seed=1)
    path = str(tmp_path / "scan.laz")
    las.write_laz(path, pos)
    scan = las.load(path)
    assert scan.header.compressed
    recovered = scan.pos + scan.world_offset.astype(np.float32)
    np.testing.assert_allclose(recovered, pos, atol=2e-3)
    # compression actually compresses
    import os

    las_path = str(tmp_path / "scan.las")
    las.write_las(las_path, pos)
    assert os.path.getsize(path) < 0.7 * os.path.getsize(las_path)


def test_laz_multi_chunk(tmp_path):
    pos = np.random.default_rng(2).uniform(-10, 10, (120_001, 3)).astype(np.float32)
    path = str(tmp_path / "chunky.laz")
    las.write_laz(path, pos, chunk_size=25_000)  # 5 chunks, last partial
    scan = las.load(path)
    recovered = scan.pos + scan.world_offset.astype(np.float32)
    np.testing.assert_allclose(recovered, pos, atol=2e-3)


def test_laz_max_points(tmp_path):
    pos = np.random.default_rng(3).uniform(0, 5, (10_000, 3)).astype(np.float32)
    path = str(tmp_path / "cap.laz")
    las.write_laz(path, pos, chunk_size=4_000)
    scan = las.load(path, max_points=5_000)
    assert scan.pos.shape[0] == 5_000


def test_vlr_parse_roundtrip():
    payload = laz_native.make_vlr(chunk_size=12345)
    info = laz_native.parse_vlr(payload)
    assert info["compressor"] == 2
    assert info["chunk_size"] == 12345
    assert info["items"] == [{"type": 6, "size": 20, "version": 2}]


def test_corrupt_laz_rejected(tmp_path):
    pos = np.random.default_rng(4).uniform(0, 5, (5_000, 3)).astype(np.float32)
    path = str(tmp_path / "x.laz")
    las.write_laz(path, pos)
    data = bytearray(open(path, "rb").read())
    # truncate: the chunk table offset points past the end
    del data[len(data) // 2:]
    from treee_tpu.utils.errors import CorruptFile

    with pytest.raises((CorruptFile, ValueError)):
        las.load(bytes(data))


def _decompress_items(stream, n, length, fmt, chunk_size):
    import ctypes

    lib = native_build.load_library()
    items = laz_native.standard_items(fmt, length)
    types = np.asarray([it["type"] for it in items], np.uint16)
    sizes = np.asarray([it["size"] for it in items], np.uint16)
    out = np.empty(n * length, np.uint8)
    rc = lib.treee_laz_decompress_items(
        stream, len(stream), 0, n, length,
        types.ctypes.data_as(ctypes.c_void_p),
        sizes.ctypes.data_as(ctypes.c_void_p), len(items),
        chunk_size, out.ctypes.data_as(ctypes.c_void_p), 0,
        ctypes.c_uint64(0),
    )
    assert rc == 0
    return out.reshape(n, length)


def _gps_times(rng, n):
    """Realistic pulse times: two interleaved flight lines (sequence switches),
    mostly-constant pulse spacing with jitter, occasional huge jumps (the
    64-bit escape path), and repeated times (multi-return pulses)."""
    base = np.zeros(n, np.float64)
    lines = rng.integers(0, 2, n)  # which flight line each pulse belongs to
    t = np.asarray([1.0e5, 9.77e8])  # far apart -> diffs exceed 32 bits
    dt = np.asarray([1.0e-4, 2.5e-4])
    for i in range(n):
        ln = lines[i]
        if rng.random() > 0.3:  # repeated gps time (same pulse)
            t[ln] = t[ln] + dt[ln] * (1 + 0.01 * rng.standard_normal())
        base[i] = t[ln]
    return base


def test_extended_formats_roundtrip():
    """Point formats 1-3 through the real GPSTIME11/RGB12 v2 item codecs."""
    rng = np.random.default_rng(7)
    n = 20_000
    gps = _gps_times(rng, n).view(np.uint8).reshape(n, 8)
    # correlated 16-bit RGB: 8-bit camera data scaled by 257 (common case)
    r8 = np.clip(rng.normal(120, 40, n), 0, 255).astype(np.uint16)
    g8 = np.clip(r8 + rng.integers(-30, 30, n), 0, 255).astype(np.uint16)
    b8 = np.clip(r8 + rng.integers(-30, 30, n), 0, 255).astype(np.uint16)
    grey = rng.random(n) < 0.2  # r==g==b path (sym bit 6 clear)
    g8 = np.where(grey, r8, g8)
    b8 = np.where(grey, r8, b8)
    rgb = (np.stack([r8, g8, b8], axis=1) * 257).astype("<u2")
    rgb = rgb.view(np.uint8).reshape(n, 6)

    for length, fmt in ((28, 1), (26, 2), (34, 3)):
        rec = np.zeros((n, length), np.uint8)
        xyz = np.cumsum(rng.integers(-80, 80, (n, 3)), axis=0).astype("<i4")
        rec[:, 0:12] = xyz.view(np.uint8).reshape(n, 12)
        rec[:, 14] = 0b001001
        off = 20
        if fmt in (1, 3):
            rec[:, off:off + 8] = gps
            off += 8
        if fmt in (2, 3):
            rec[:, off:off + 6] = rgb
            off += 6
        assert off == length
        stream = laz_native.compress(rec, length, base_offset=0,
                                     chunk_size=8_000, point_format=fmt)
        out = _decompress_items(stream, n, length, fmt, 8_000)
        np.testing.assert_array_equal(out, rec)

    # the VLR advertises the standard item sequence
    info = laz_native.parse_vlr(laz_native.make_vlr(point_length=34,
                                                    point_format=3))
    assert info["items"] == [
        {"type": 6, "size": 20, "version": 2},
        {"type": 7, "size": 8, "version": 2},
        {"type": 8, "size": 6, "version": 2},
    ]


def test_byte_item_extra_payload():
    """Extra bytes beyond the typed items use the BYTE v2 item."""
    rng = np.random.default_rng(11)
    n, length = 10_000, 25  # POINT10 + 5 extra bytes
    rec = np.zeros((n, length), np.uint8)
    xyz = np.cumsum(rng.integers(-50, 50, (n, 3)), axis=0).astype("<i4")
    rec[:, 0:12] = xyz.view(np.uint8).reshape(n, 12)
    rec[:, 14] = 0b001001
    rec[:, 20:] = rng.integers(0, 256, (n, 5))
    stream = laz_native.compress(rec, length, base_offset=0,
                                 chunk_size=4_000, point_format=0)
    out = _decompress_items(stream, n, length, 0, 4_000)
    np.testing.assert_array_equal(out, rec)
    items = laz_native.standard_items(0, length)
    assert items[-1] == {"type": 0, "size": 5, "version": 2}


def test_gpstime_edge_sequences():
    """GPS-time codec edge paths: all-equal, huge alternating jumps (4-sequence
    tracking + 64-bit escapes), and sign-flipping deltas."""
    n = 6_000
    rng = np.random.default_rng(13)
    cases = [
        np.full(n, 123456.789),                                  # unchanged
        np.where(np.arange(n) % 3 == 0, 1e9, 1.0)               # wild jumps
        + np.arange(n) * 1e-3,
        np.cumsum(rng.choice([-5e-4, 5e-4], n)) + 777.0,         # sign flips
    ]
    for times in cases:
        rec = np.zeros((n, 28), np.uint8)
        rec[:, 14] = 0b001001
        rec[:, 20:28] = times.astype(np.float64).view(np.uint8).reshape(n, 8)
        stream = laz_native.compress(rec, 28, base_offset=0,
                                     chunk_size=n, point_format=1)
        out = _decompress_items(stream, n, 28, 1, n)
        np.testing.assert_array_equal(out, rec)


def test_record_fields_roundtrip():
    """All POINT10 fields (not just coordinates) survive the codec."""
    import ctypes

    rng = np.random.default_rng(5)
    n = 30_000
    rec = np.zeros((n, 20), np.uint8)
    xyz = np.cumsum(rng.integers(-100, 100, (n, 3)), axis=0).astype("<i4")
    rec[:, 0:12] = xyz.view(np.uint8).reshape(n, 12)
    rec[:, 12:14] = rng.integers(0, 65535, n).astype("<u2").view(np.uint8).reshape(n, 2)
    ret = rng.integers(1, 6, n)
    nret = np.maximum(ret, rng.integers(1, 6, n))
    rec[:, 14] = (ret | (nret << 3) | (rng.integers(0, 2, n) << 6)).astype(np.uint8)
    rec[:, 15] = rng.integers(0, 32, n)
    rec[:, 16] = rng.integers(0, 256, n)
    rec[:, 17] = rng.integers(0, 256, n)
    rec[:, 18:20] = rng.integers(0, 65535, n).astype("<u2").view(np.uint8).reshape(n, 2)

    stream = laz_native.compress(rec, 20, base_offset=0)
    lib = native_build.load_library()
    out = np.empty(n * 20, np.uint8)
    rc = lib.treee_laz_decompress(
        stream, len(stream), 0, n, 20, 0, 50_000,
        out.ctypes.data_as(ctypes.c_void_p), 0,
    )
    assert rc == 0
    np.testing.assert_array_equal(out.reshape(n, 20), rec)


# ---------------------------------------------------------------------------
# Layered v3 (LAS 1.4 point formats 6-8): POINT14/RGB14/RGBNIR14/BYTE14 items
# ---------------------------------------------------------------------------

def _decompress_layered(stream, n, length, fmt, chunk_size):
    import ctypes

    lib = native_build.load_library()
    items = laz_native.standard_items(fmt, length)
    types = np.asarray([it["type"] for it in items], np.uint16)
    sizes = np.asarray([it["size"] for it in items], np.uint16)
    out = np.empty(n * length, np.uint8)
    rc = lib.treee_laz_decompress_layered(
        stream, len(stream), 0, n, length,
        types.ctypes.data_as(ctypes.c_void_p),
        sizes.ctypes.data_as(ctypes.c_void_p), len(items),
        chunk_size, out.ctypes.data_as(ctypes.c_void_p), 0,
        ctypes.c_uint64(0),
    )
    assert rc == 0
    return out.reshape(n, length)


def _point14_records(rng, n, length, fmt):
    """Rich format-6/7/8 records: scanner-channel runs (context switches),
    multi-return pulses, full attribute coverage."""
    rec = np.zeros((n, length), np.uint8)
    xyz = np.cumsum(rng.integers(-150, 150, (n, 3)), axis=0).astype("<i4")
    rec[:, 0:12] = xyz.view(np.uint8).reshape(n, 12)
    rec[:, 12:14] = rng.integers(0, 65535, n).astype("<u2").view(np.uint8).reshape(n, 2)
    ret = rng.integers(1, 6, n)
    nret = np.maximum(ret, rng.integers(1, 6, n))
    rec[:, 14] = (ret | (nret << 4)).astype(np.uint8)  # 4-bit LAS 1.4 fields
    chan = np.repeat(rng.integers(0, 4, n // 64 + 1), 64)[:n].astype(np.uint8)
    rec[:, 15] = (rng.integers(0, 16, n) | (chan << 4)
                  | (rng.integers(0, 2, n) << 6)
                  | (rng.integers(0, 2, n) << 7)).astype(np.uint8)
    rec[:, 16] = rng.integers(0, 64, n)    # classification (6-bit in 1.4)
    rec[:, 17] = rng.integers(0, 256, n)   # user data
    rec[:, 18:20] = rng.integers(-15000, 15000, n).astype("<i2").view(np.uint8).reshape(n, 2)
    rec[:, 20:22] = rng.integers(0, 8, n).astype("<u2").view(np.uint8).reshape(n, 2)
    rec[:, 22:30] = _gps_times(rng, n).view(np.uint8).reshape(n, 8)
    if fmt == 7:
        rgb = (rng.integers(0, 256, (n, 3)) * 257).astype("<u2")
        rec[:, 30:36] = rgb.view(np.uint8).reshape(n, 6)
    if fmt == 8:
        rgbn = (rng.integers(0, 256, (n, 4)) * 257).astype("<u2")
        rec[:, 30:38] = rgbn.view(np.uint8).reshape(n, 8)
    return rec


def test_layered_formats_roundtrip():
    """Formats 6-8 through the layered POINT14-family v3 item codecs
    (laz.rs:147-159's LayeredPointRecordDecompressor path)."""
    rng = np.random.default_rng(17)
    n = 25_000
    for fmt in (6, 7, 8):
        length = las.POINT_LENGTHS[fmt]
        rec = _point14_records(rng, n, length, fmt)
        stream = laz_native.compress(rec, length, base_offset=0,
                                     chunk_size=8_000, point_format=fmt)
        out = _decompress_layered(stream, n, length, fmt, 8_000)
        np.testing.assert_array_equal(out, rec)
        assert len(stream) < 0.8 * rec.nbytes  # actually compresses


def test_layered_extra_bytes():
    """Format 6 + extra payload -> BYTE14 (one layer per column)."""
    rng = np.random.default_rng(19)
    n, extra = 12_000, 5
    length = 30 + extra
    rec = _point14_records(rng, n, length, 6)
    rec[:, 30:] = rng.integers(0, 256, (n, extra))
    stream = laz_native.compress(rec, length, base_offset=0,
                                 chunk_size=5_000, point_format=6)
    out = _decompress_layered(stream, n, length, 6, 5_000)
    np.testing.assert_array_equal(out, rec)
    items = laz_native.standard_items(6, length)
    assert items[-1] == {"type": 14, "size": extra, "version": 3}


def test_layered_laz_file_roundtrip(tmp_path):
    """Full .laz file path for a LAS 1.4 / format-6 file: 1.4 header with
    extended counts, compressor-3 VLR, layered stream."""
    rng = np.random.default_rng(23)
    pos = rng.uniform(-30, 30, (60_000, 3)).astype(np.float32)
    path = str(tmp_path / "scan14.laz")
    las.write_laz(path, pos, point_format=6, chunk_size=16_000)
    scan = las.load(path)
    assert scan.header.point_format == 6
    assert scan.header.version_minor == 4
    assert scan.header.compressed
    recovered = scan.pos + scan.world_offset.astype(np.float32)
    np.testing.assert_allclose(recovered, pos, atol=2e-3)
    info = laz_native.parse_vlr(
        laz_native.make_vlr(point_length=30, point_format=6))
    assert info["compressor"] == 3
    assert info["items"] == [{"type": 10, "size": 30, "version": 3}]


def test_layered_scanner_channel_contexts():
    """Per-channel model contexts: channel-interleaved streams roundtrip
    (each switch re-seeds the target context from the active one)."""
    rng = np.random.default_rng(29)
    n = 8_000
    rec = _point14_records(rng, n, 30, 6)
    chan = (np.arange(n) % 4).astype(np.uint8)  # worst case: switch every point
    rec[:, 15] = (rec[:, 15] & ~np.uint8(0x30)) | (chan << 4)
    stream = laz_native.compress(rec, 30, base_offset=0,
                                 chunk_size=n, point_format=6)
    out = _decompress_layered(stream, n, 30, 6, n)
    np.testing.assert_array_equal(out, rec)


def test_layered_corrupt_streams(tmp_path):
    """Corrupt/truncated layered streams fail cleanly (rc=1 -> CorruptFile)."""
    rng = np.random.default_rng(31)
    pos = rng.uniform(0, 10, (20_000, 3)).astype(np.float32)
    path = str(tmp_path / "c14.laz")
    las.write_laz(path, pos, point_format=6, chunk_size=6_000)
    data = bytearray(open(path, "rb").read())
    from treee_tpu.utils.errors import CorruptFile

    # truncated: chunk table offset beyond EOF
    with pytest.raises((CorruptFile, ValueError)):
        las.load(bytes(data[: len(data) // 2]))
    # chunk table offset scribbled to a huge value
    scan = las.load(bytes(data))  # sanity: intact file loads
    hdr = las.LasHeader.parse(bytes(data))
    bad = bytearray(data)
    bad[hdr.offset_to_point_data : hdr.offset_to_point_data + 8] = (
        (1 << 62)).to_bytes(8, "little")
    with pytest.raises((CorruptFile, ValueError)):
        las.load(bytes(bad))


def _wavepacket_block(rng, n):
    """Realistic 29-byte wave-packet blocks exercising all four offset cases
    BY CONSTRUCTION: contiguous packets (offset = prev offset + prev size,
    case 1), re-referenced packets (same offset, case 0), +/-32-bit jumps
    (case 2), and >32-bit jumps with a NONZERO HIGH WORD (case 3 — both
    halves of the raw 64-bit escape must survive)."""
    idx = rng.integers(0, 4, n).astype(np.uint8)
    size = rng.integers(100, 5000, n).astype(np.uint64)
    kind = rng.choice(4, n, p=[0.15, 0.6, 0.15, 0.1])
    off = np.zeros(n, np.uint64)
    off[0] = 1000
    for i in range(1, n):
        if kind[i] == 0:    # re-referenced waveform
            off[i] = off[i - 1]
        elif kind[i] == 1:  # contiguous
            off[i] = off[i - 1] + size[i - 1]
        elif kind[i] == 2:  # 32-bit jump, either direction
            jump = np.uint64(rng.integers(1, 1_000_000))
            if rng.random() < 0.5 or off[i - 1] < 2_000_000:
                off[i] = off[i - 1] + jump
            else:
                off[i] = off[i - 1] - jump
        else:               # 64-bit escape, high word nonzero
            off[i] = off[i - 1] + (np.uint64(rng.integers(1, 1000)) << 40)
    off = off.astype("<u8")
    wp = np.zeros((n, 29), np.uint8)
    wp[:, 0] = idx
    wp[:, 1:9] = off.view(np.uint8).reshape(n, 8)
    wp[:, 9:13] = size.astype("<u4").view(np.uint8).reshape(n, 4)
    wp[:, 13:17] = (rng.random(n).astype("<f4") * 100).view(np.uint8).reshape(n, 4)
    d = rng.standard_normal((n, 3)).astype("<f4")
    d /= np.linalg.norm(d, axis=1, keepdims=True)
    wp[:, 17:29] = d.astype("<f4").view(np.uint8).reshape(n, 12)
    return wp


def test_wavepacket_formats_roundtrip():
    """Formats 4/5 (waveform LiDAR) through the sequential WAVEPACKET13 v1
    item codec; the reference ingests these via the laz crate
    (laz.rs:147-159)."""
    rng = np.random.default_rng(41)
    n = 15_000
    for fmt in (4, 5):
        length = las.POINT_LENGTHS[fmt]
        rec = np.zeros((n, length), np.uint8)
        xyz = np.cumsum(rng.integers(-80, 80, (n, 3)), axis=0).astype("<i4")
        rec[:, 0:12] = xyz.view(np.uint8).reshape(n, 12)
        rec[:, 14] = 0b001001
        rec[:, 20:28] = _gps_times(rng, n).view(np.uint8).reshape(n, 8)
        off = 28
        if fmt == 5:
            rgb = (rng.integers(0, 256, (n, 3)) * 257).astype("<u2")
            rec[:, 28:34] = rgb.view(np.uint8).reshape(n, 6)
            off = 34
        rec[:, off:off + 29] = _wavepacket_block(rng, n)
        stream = laz_native.compress(rec, length, base_offset=0,
                                     chunk_size=6_000, point_format=fmt)
        out = _decompress_items(stream, n, length, fmt, 6_000)
        np.testing.assert_array_equal(out, rec)
        assert len(stream) < 0.7 * rec.nbytes  # actually compresses
    items = laz_native.standard_items(4, las.POINT_LENGTHS[4])
    assert items[-1] == {"type": 9, "size": 29, "version": 1}


def test_layered_wavepacket_roundtrip():
    """Formats 9/10 through the layered WAVEPACKET14 v3 codec, including
    scanner-channel context switches mid-stream."""
    rng = np.random.default_rng(43)
    n = 15_000
    for fmt in (9, 10):
        length = las.POINT_LENGTHS[fmt]
        rec = _point14_records(rng, n, length, 6)  # POINT14 core fields
        off = 30
        if fmt == 10:
            rgbn = (rng.integers(0, 256, (n, 4)) * 257).astype("<u2")
            rec[:, 30:38] = rgbn.view(np.uint8).reshape(n, 8)
            off = 38
        rec[:, off:off + 29] = _wavepacket_block(rng, n)
        stream = laz_native.compress(rec, length, base_offset=0,
                                     chunk_size=6_000, point_format=fmt)
        out = _decompress_layered(stream, n, length, fmt, 6_000)
        np.testing.assert_array_equal(out, rec)
    info = laz_native.parse_vlr(
        laz_native.make_vlr(point_length=las.POINT_LENGTHS[9],
                            point_format=9))
    assert info["items"] == [
        {"type": 10, "size": 30, "version": 3},
        {"type": 13, "size": 29, "version": 3},
    ]


def test_wavepacket_bad_size_rejected():
    """A wave-packet item whose size is not 29 is refused (rc=2), not
    misdecoded, in both framing generations."""
    import ctypes

    lib = native_build.load_library()
    out = np.empty(10 * 58, np.uint8)
    for entry, types, core_size in (
        (lib.treee_laz_decompress_layered, [10, 13], 30),
        (lib.treee_laz_decompress_items, [6, 9], 20),
    ):
        t = np.asarray(types, np.uint16)
        s = np.asarray([core_size, 28], np.uint16)  # 28 != the required 29
        rc = entry(
            b"\0" * 128, 128, 0, 10, int(s.sum()),
            t.ctypes.data_as(ctypes.c_void_p),
            s.ctypes.data_as(ctypes.c_void_p), 2,
            50_000, out.ctypes.data_as(ctypes.c_void_p), 0,
            ctypes.c_uint64(0),
        )
        assert rc == 2


def test_v2_truncated_chunk_rejected(tmp_path):
    """v2 path: a stream whose chunk data is cut mid-chunk fails cleanly."""
    pos = np.random.default_rng(37).uniform(0, 5, (30_000, 3)).astype(np.float32)
    path = str(tmp_path / "t2.laz")
    las.write_laz(path, pos, chunk_size=10_000)
    data = bytearray(open(path, "rb").read())
    hdr = las.LasHeader.parse(bytes(data))
    from treee_tpu.utils.errors import CorruptFile

    bad = bytearray(data)
    bad[hdr.offset_to_point_data : hdr.offset_to_point_data + 8] = (
        len(data) * 4).to_bytes(8, "little")
    with pytest.raises((CorruptFile, ValueError)):
        las.load(bytes(bad))


def test_decoder_table_overread_regression(tmp_path):
    """tools/fuzz_laz.py 500k-case campaign (seed=1, batch 457 case 397):
    an 8-byte INT64_MAX fill at offset 15687 of a format-6 file corrupted an
    arithmetic-coded layer so that the decoder's value/length invariant
    broke and decode_symbol indexed past SymbolModel::decoder_table
    (laszip_core.h heap overread -> SIGSEGV).  The table index is now
    clamped; the mutated stream must decode (as garbage) or reject cleanly."""
    from treee_tpu.utils.errors import CorruptFile, UnsupportedFormat

    pos = np.random.default_rng(11).uniform(0, 30, (9_000, 3)).astype(np.float32)
    path = str(tmp_path / "ovr.laz")
    las.write_laz(path, pos, chunk_size=2_500, point_format=6)
    buf = bytearray(open(path, "rb").read())
    assert len(buf) > 15_695, "seed stream shrank; regenerate the offset"
    buf[15_687:15_695] = (2**63 - 1).to_bytes(8, "little")
    try:
        las.load(bytes(buf))
    except (CorruptFile, UnsupportedFormat, ValueError, MemoryError):
        pass


@pytest.mark.parametrize("fmt", [0, 6, 9])  # sequential, layered, wavepacket
def test_corruption_fuzz_no_uncaught_errors(tmp_path, fmt):
    """Single-bit flips and 4-byte field fills anywhere in a .laz either
    decode (garbage points are fine — arithmetic coding has no integrity
    check, matching the reference's laz-crate behavior) or raise the clean
    error taxonomy; never struct.error/IndexError/segfault.  Seeded and
    deterministic; found the VLR num_items truncation hole (laz_native
    .parse_vlr)."""
    import warnings

    from treee_tpu.utils.errors import CorruptFile, UnsupportedFormat

    pos = np.random.default_rng(4).uniform(0, 5, (10_000, 3)).astype(np.float32)
    path = str(tmp_path / "fz.laz")
    las.write_laz(path, pos, chunk_size=4_000, point_format=fmt)
    data = open(path, "rb").read()
    n = len(data)
    rng = np.random.default_rng(7)

    cases = []
    # header + VLR bytes (flip every 3rd), chunk table tail, random payload
    for off in range(0, min(500, n), 3):
        cases.append(("flip", off, 1 << int(rng.integers(0, 8))))
    for off in range(max(0, n - 60), n, 2):
        cases.append(("flip", off, 1 << int(rng.integers(0, 8))))
    for _ in range(20):
        cases.append(("flip", int(rng.integers(0, n)),
                      1 << int(rng.integers(0, 8))))
    for off in range(0, 400, 16):
        cases.append(("zero4", off, None))
        cases.append(("ff4", off, None))

    for kind, off, arg in cases:
        buf = bytearray(data)
        if kind == "flip":
            buf[off] ^= arg
        else:
            buf[off:off + 4] = (b"\0" if kind == "zero4" else b"\xff") * 4
        with warnings.catch_warnings():
            warnings.simplefilter("ignore", RuntimeWarning)
            try:
                las.load(bytes(buf))
            except (CorruptFile, UnsupportedFormat, ValueError, MemoryError):
                pass  # clean rejection


def test_unimplemented_item_versions_rejected():
    """Item versions the native codec does not implement (sequential v1,
    layered v4) must raise UnsupportedFormat — decoding them with v2/v3
    semantics would silently produce garbage coordinates."""
    import struct

    import pytest

    from treee_tpu.io import laz_native
    from treee_tpu.utils.errors import UnsupportedFormat

    for fmt, plen, bad_version in ((0, 20, 1), (6, 30, 4)):
        vlr = bytearray(laz_native.make_vlr(point_format=fmt,
                                            point_length=plen))
        # head is 34 bytes; each item is (type u16, size u16, version u16)
        struct.pack_into("<H", vlr, 34 + 4, bad_version)
        with pytest.raises(UnsupportedFormat):
            laz_native.decompress(b"", None, bytes(vlr), 0)


def _patch_laz(path, mutate):
    """Read a .laz, apply ``mutate(bytearray, offset_to_points) -> bytes``,
    write it back."""
    import struct as _struct

    data = bytearray(open(path, "rb").read())
    off = _struct.unpack_from("<I", data, 96)[0]  # offset to point data
    out = mutate(data, off)
    open(path, "wb").write(out)
    return off


@pytest.mark.parametrize("fmt", [0, 6])
def test_streamed_chunk_table_offset(tmp_path, fmt):
    """table offset == -1 (non-seekable stream writers): the real chunk-table
    offset lives in the file's final 8 bytes (both framing generations)."""
    import struct as _struct

    rng = np.random.default_rng(29)
    pos = rng.uniform(-20, 20, (30_000, 3)).astype(np.float32)
    path = str(tmp_path / f"s{fmt}.laz")
    las.write_laz(path, pos, point_format=fmt, chunk_size=8_000)
    ref = las.load(path).pos.copy()

    def mutate(data, off):
        real = bytes(data[off:off + 8])
        _struct.pack_into("<q", data, off, -1)
        return bytes(data) + real

    _patch_laz(path, mutate)
    got = las.load(path).pos
    np.testing.assert_array_equal(got, ref)


@pytest.mark.parametrize("fmt", [0, 6])
def test_corrupt_chunk_count_no_giant_alloc(tmp_path, fmt):
    """n_chunks=0xFFFFFFFF in the chunk table must not drive a multi-GB
    allocation: fixed-chunk decode clamps to the chunks the point count
    needs (the extra table entries are ignored) and still round-trips."""
    import struct as _struct

    rng = np.random.default_rng(31)
    pos = rng.uniform(-20, 20, (30_000, 3)).astype(np.float32)
    path = str(tmp_path / f"c{fmt}.laz")
    las.write_laz(path, pos, point_format=fmt, chunk_size=8_000)
    ref = las.load(path).pos.copy()

    def mutate(data, off):
        table = _struct.unpack_from("<q", data, off)[0]
        _struct.pack_into("<I", data, table + 4, 0xFFFFFFFF)
        return bytes(data)

    _patch_laz(path, mutate)
    got = las.load(path).pos
    np.testing.assert_array_equal(got, ref)


def _to_variable_framing(path, n, fmt, chunk=8_000):
    """Rewrite a fixed-chunk .laz into variable-size-chunk framing via the
    native test hook (VLR chunk_size -> 0xFFFFFFFF, table gains counts)."""
    import ctypes
    import struct as _struct

    from treee_tpu.io import native_build

    lib = native_build.load_library()
    if lib is None:
        pytest.skip("native library unavailable")

    def mutate(data, off):
        stream = np.frombuffer(bytes(data[off:]), np.uint8)
        out = np.zeros(len(stream) + 1024, np.uint8)
        out_len = ctypes.c_uint64()
        fn = lib.treee_laz_rewrite_table_variable
        fn.restype = ctypes.c_int
        rc = fn(
            stream.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
            ctypes.c_uint64(len(stream)), ctypes.c_uint64(off),
            ctypes.c_uint32(n), ctypes.c_uint32(chunk),
            out.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
            ctypes.c_uint64(len(out)), ctypes.byref(out_len),
        )
        assert rc == 0, rc
        # flag variable chunks in the VLR (header 227/375 + 54-byte VLR
        # header + chunk_size at payload offset 12)
        header_size = 375 if fmt >= 6 else 227
        _struct.pack_into("<I", data, header_size + 54 + 12, 0xFFFFFFFF)
        return bytes(data[:off]) + out[: out_len.value].tobytes()

    _patch_laz(path, mutate)


@pytest.mark.parametrize("fmt", [0, 6])
def test_variable_chunk_table_decodes(tmp_path, fmt):
    """Variable-size-chunk streams (VLR chunk_size == 0xFFFFFFFF; the chunk
    table interleaves per-chunk point counts) decode through both framing
    generations.  The fixture rewrites a fixed-chunk stream into variable
    framing via a native test hook."""
    rng = np.random.default_rng(37)
    n = 30_000
    pos = rng.uniform(-20, 20, (n, 3)).astype(np.float32)
    path = str(tmp_path / f"v{fmt}.laz")
    las.write_laz(path, pos, point_format=fmt, chunk_size=8_000)
    ref = las.load(path).pos.copy()
    _to_variable_framing(path, n, fmt)
    got = las.load(path).pos
    np.testing.assert_array_equal(got, ref)


def test_variable_chunk_prefix_decode(tmp_path):
    """A max_points prefix decode smaller than the file's chunk count is
    LEGAL on variable-size-chunk files (advisor r4: the DoS bound used to
    reject it as corrupt; now both framings clamp the table read)."""
    rng = np.random.default_rng(38)
    n = 30_000
    pos = rng.uniform(-20, 20, (n, 3)).astype(np.float32)
    path = str(tmp_path / "v.laz")
    las.write_laz(path, pos, point_format=0, chunk_size=100)  # 300 chunks
    ref = las.load(path).pos.copy()
    _to_variable_framing(path, n, 0, chunk=100)
    # 5 < 300 chunks: previously tripped `n_chunks > cap` -> CorruptFile
    got = las.load(path, max_points=5).pos
    np.testing.assert_array_equal(got, ref[:5])


def test_variable_chunk_streaming_slabs(tmp_path):
    """load_streaming slabs variable-size-chunk files on the chunk table's
    own boundaries (advisor r4: they used to degrade to ONE slab, so the
    ingest preview never fired mid-decode)."""
    from treee_tpu.io import laz_native

    rng = np.random.default_rng(39)
    n = 30_000
    pos = rng.uniform(-20, 20, (n, 3)).astype(np.float32)
    path = str(tmp_path / "v.laz")
    las.write_laz(path, pos, point_format=0, chunk_size=4_000)
    ref = las.load(path)
    _to_variable_framing(path, n, 0, chunk=4_000)

    with open(path, "rb") as fh:
        data = fh.read()
    header = las.LasHeader.parse(data)
    vlr = las._find_laszip_vlr(data, header)
    counts = laz_native.chunk_counts(data, header, vlr)
    assert counts.sum() == n
    assert len(counts) == (n + 3999) // 4000
    assert (counts[:-1] == 4000).all()

    slabs = []
    scan = las.load_streaming(
        path, lambda p, done, total: slabs.append((len(p), done, total)),
        slab_points=8_000,
    )
    np.testing.assert_array_equal(scan.pos, ref.pos)
    assert len(slabs) >= 3, f"one-slab degradation: {slabs}"
    assert slabs[-1][1] == n and all(t == n for _, _, t in slabs)
    # slab boundaries are chunk-aligned (multiples of 4000)
    done_marks = [d for _, d, _ in slabs[:-1]]
    assert all(d % 4000 == 0 for d in done_marks)


def test_layered_item_size_sum_validated():
    """Layered decompress with item sizes that do not sum to point_length
    must fail cleanly (rc=2 -> exception), never walk the output buffer."""
    import ctypes

    from treee_tpu.io import native_build

    lib = native_build.load_library()
    if lib is None:
        pytest.skip("native library unavailable")
    out = np.zeros(30 * 4, np.uint8)
    types = (ctypes.c_uint16 * 2)(10, 14)   # POINT14 + BYTE14
    sizes = (ctypes.c_uint16 * 2)(30, 99)   # sums to 129 != 30
    fn = lib.treee_laz_decompress_layered
    fn.restype = ctypes.c_int
    rc = fn(
        ctypes.c_char_p(b"\0" * 64), ctypes.c_uint64(64),
        ctypes.c_uint64(0), ctypes.c_uint32(4), ctypes.c_uint32(30),
        types, sizes, ctypes.c_uint32(2), ctypes.c_uint32(8000),
        out.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
        ctypes.c_int32(1), ctypes.c_uint64(0),
    )
    assert rc == 2


def test_short_point_length_rejected(tmp_path):
    """A header with 0 < point_length < 12 (xyz needs 12 bytes) raises the
    clean corrupt-file error instead of reading out of bounds."""
    import struct as _struct

    rng = np.random.default_rng(41)
    pos = rng.uniform(-5, 5, (1000, 3)).astype(np.float32)
    path = str(tmp_path / "short.las")
    las.write_las(path, pos)
    data = bytearray(open(path, "rb").read())
    _struct.pack_into("<H", data, 105, 4)  # point record length field
    open(path, "wb").write(bytes(data))
    with pytest.raises(ValueError):
        las.load(path)


def test_wavepacket_file_header_is_las13(tmp_path):
    """Waveform formats 4/5 must be written as LAS 1.3 (235-byte header with
    the u64 'Start of Waveform Data Packet Record' field) — strict external
    readers reject point formats 4/5 under version 1.2."""
    rng = np.random.default_rng(47)
    pos = rng.uniform(-20, 20, (30_000, 3)).astype(np.float32)
    for fmt, write in ((4, las.write_laz), (5, las.write_las)):
        path = str(tmp_path / f"wp{fmt}.laz")
        write(path, pos, point_format=fmt)
        scan = las.load(path)
        assert scan.header.version_minor == 3
        assert scan.header.header_size == 235
        assert scan.header.point_format == fmt
        # Global Encoding must flag waveform packets (bit 2 = external)
        import struct
        enc = struct.unpack_from("<H", open(path, "rb").read(8), 6)[0]
        assert enc & 0x4
        recovered = scan.pos + scan.world_offset.astype(np.float32)
        np.testing.assert_allclose(recovered, pos, atol=2e-3)
    # formats 0-3 stay 1.2, formats 6+ stay 1.4
    p0 = str(tmp_path / "f0.las")
    las.write_las(p0, pos, point_format=0)
    assert las.load(p0).header.version_minor == 2
    p6 = str(tmp_path / "f6.las")
    las.write_las(p6, pos, point_format=6)
    assert las.load(p6).header.version_minor == 4


def _guard_points(n=900):
    rng = np.random.default_rng(5)
    return rng.uniform(-10, 10, (n, 3)).astype(np.float32)


def test_layered_divergence_guard_count_mismatch(tmp_path):
    """The loud-divergence guard (rc=4): a layered chunk whose in-chunk
    count disagrees with the chunk table must raise CorruptFile naming
    divergence, not decode garbage (VERDICT r3 task 7)."""
    from treee_tpu.utils.errors import CorruptFile

    pts = _guard_points()
    p = tmp_path / "f6.laz"
    las.write_laz(str(p), pts, point_format=6)
    data = bytearray(p.read_bytes())
    header = las.LasHeader.parse(bytes(data))
    # chunk layout: [u64 chunk-table offset][raw first record][u32 count]...
    cnt_at = header.offset_to_point_data + 8 + header.point_length
    stored = int.from_bytes(data[cnt_at:cnt_at + 4], "little")
    assert stored == len(pts)
    # claim FEWER points than the table: decoding past the stored count is
    # certain divergence.  (A LARGER stored count is legal: it is exactly
    # what a deliberate max_points prefix decode of a chunk looks like.)
    data[cnt_at:cnt_at + 4] = (100).to_bytes(4, "little")
    with pytest.raises(CorruptFile, match="diverged"):
        las.load(bytes(data))


def test_layered_max_points_prefix_decode(tmp_path):
    """max_points truncation mid-chunk must NOT trip the count guard
    (review r4): the prefix decodes and matches the full decode's head."""
    pts = _guard_points(900)
    p = tmp_path / "f6.laz"
    las.write_laz(str(p), pts, point_format=6)
    full = las.load(str(p))
    part = las.load(str(p), max_points=257)
    assert part.pos.shape == (257, 3)
    np.testing.assert_array_equal(part.pos, full.pos[:257])


def test_layered_divergence_guard_layer_overrun(tmp_path):
    """Shrinking a declared layer size forces the decoder past its byte
    range -> the Decoder.past_end guard reports divergence (rc=4)."""
    from treee_tpu.utils.errors import CorruptFile

    pts = _guard_points()
    p = tmp_path / "f6.laz"
    las.write_laz(str(p), pts, point_format=6)
    data = bytearray(p.read_bytes())
    header = las.LasHeader.parse(bytes(data))
    size_at = header.offset_to_point_data + 8 + header.point_length + 4
    data[size_at:size_at + 4] = (5).to_bytes(4, "little")
    with pytest.raises(CorruptFile):
        las.load(bytes(data))
