"""Bit-level LASzip codec unit tests (table-driven, hand-derived expectations).

Roundtrip symmetry can't catch a bug encoder and decoder share; these pin the
at-risk details named in CLAUDE.md against independently hand-computed
expectations of the published algorithm:

- StreamingMedian5's alternating high/low insertion bias (incl. the
  no-toggle-in-first-branch subtlety),
- the IntegerCompressor's corrector k-width mapping (k=0 for c in {0,1},
  bit_width(c-1) for c>1, bit_width(|c|) for c<0) and the decoder seeing the
  identical k chain (x->y->z context chaining depends on it),
- POINT10 changed_values bit assignments (flags 32 / intensity 16 /
  classification 8 / scan angle 4 / user data 2 / point source 1) and the
  intensity comparison being against the per-return-map table seeded to 0,
- the chunk-table corrector (IC(32,2), previous size prediction, context 1).
"""

import ctypes

import numpy as np
import pytest

from treee_tpu.io import native_build

lib = native_build.load_library(required=False)
pytestmark = pytest.mark.skipif(lib is None, reason="native codec not built")


def _median5(values):
    vals = np.asarray(values, np.int32)
    out = np.empty(len(vals), np.int32)
    lib.treee_laz_test_median5(
        vals.ctypes.data_as(ctypes.c_void_p), len(vals),
        out.ctypes.data_as(ctypes.c_void_p),
    )
    return out.tolist()


def test_streaming_median5_hand_cases():
    # hand-traced from the published algorithm.  ``high`` toggles ONLY when
    # the insert lands in the half it currently biases toward (high=T + high
    # insert -> F; high=F + low insert -> T); same-side inserts keep it —
    # the CLAUDE.md "first-branch toggling" risk item, pinned here:
    #   [5,7,3,4,6,2]: 5 lands high (toggle F), then 7/3/4/6 all land high
    #   under high=F (no toggle), sliding the window to [3,4,5,6,7]
    assert _median5([5, 7, 3, 4, 6, 2]) == [0, 0, 3, 4, 5, 5]
    # constant stream reaches the constant on the 3rd add (one toggle, then
    # repeated upper-half displacement of the zero seeds)
    assert _median5([10] * 5) == [0, 0, 10, 10, 10]
    # all-below-median inserts under high=T stay in the first branch and
    # never toggle: the zero seeds are displaced from the top down
    assert _median5([-5, -3, -4]) == [0, 0, -3]
    # zeros stay zeros
    assert _median5([0, 0, 0, 0]) == [0, 0, 0, 0]


def _ic_roundtrip(bits, contexts, preds, reals, ctxs):
    n = len(reals)
    preds = np.asarray(preds, np.int32)
    reals = np.asarray(reals, np.int32)
    ctxs = np.asarray(ctxs, np.uint32)
    dec = np.empty(n, np.int32)
    ks = np.empty(n, np.uint32)
    rc = lib.treee_laz_test_ic_roundtrip(
        bits, contexts,
        preds.ctypes.data_as(ctypes.c_void_p),
        reals.ctypes.data_as(ctypes.c_void_p),
        ctxs.ctypes.data_as(ctypes.c_void_p), n,
        dec.ctypes.data_as(ctypes.c_void_p),
        ks.ctypes.data_as(ctypes.c_void_p),
    )
    assert rc == 0, f"decoder diverged from encoder k chain (rc={rc})"
    return dec.tolist(), ks.tolist()


def test_integer_compressor_k_widths():
    reals = [0, 1, 2, 3, 4, 5, 8, 9, -1, -2, -4, -8, 1024, -1024,
             100000, -100000]
    expected_k = [0, 0, 1, 2, 2, 3, 3, 4, 1, 2, 3, 4, 10, 11, 17, 17]
    dec, ks = _ic_roundtrip(32, 1, [0] * len(reals), reals, [0] * len(reals))
    assert dec == reals
    assert ks == expected_k


def test_integer_compressor_16bit_wraparound():
    """bits=16 folds correctors mod 2^16 (intensity/scan-angle/point-source
    semantics): a u16 delta that wraps still reproduces the u16 value."""
    preds = [65000, 10, 0, 40000]
    reals = [5, 65530, 32768, 39999]
    dec, _ = _ic_roundtrip(16, 1, preds, reals, [0] * 4)
    assert dec == reals


def test_integer_compressor_contexts_independent():
    """Each context carries its own models; interleaving contexts must not
    corrupt either stream."""
    preds = [0, 0, 100, 100, 0, 100]
    reals = [7, -7, 100, 228, 9, 95]
    ctxs = [0, 1, 0, 1, 0, 1]
    dec, _ = _ic_roundtrip(32, 2, preds, reals, ctxs)
    assert dec == reals


def _p10(intensity=0, flags=0b001001, classification=0, scan_angle=0,
         user_data=0, point_source=0, xyz=(0, 0, 0)):
    rec = np.zeros(20, np.uint8)
    rec[0:12] = np.asarray(xyz, "<i4").view(np.uint8)
    rec[12:14] = np.asarray([intensity], "<u2").view(np.uint8)
    rec[14] = flags
    rec[15] = classification
    rec[16] = np.asarray([scan_angle], "<i1").view(np.uint8)[0]
    rec[17] = user_data
    rec[18:20] = np.asarray([point_source], "<u2").view(np.uint8)
    return rec


def _changed(first, cur):
    return lib.treee_laz_test_point10_changed_symbol(
        first.ctypes.data_as(ctypes.c_void_p),
        cur.ctypes.data_as(ctypes.c_void_p),
    )


def test_point10_changed_values_bits():
    base = _p10()
    assert _changed(base, _p10()) == 0
    assert _changed(base, _p10(flags=0b101001)) == 32
    assert _changed(base, _p10(classification=3)) == 8
    assert _changed(base, _p10(scan_angle=-4)) == 4
    assert _changed(base, _p10(user_data=9)) == 2
    assert _changed(base, _p10(point_source=2)) == 1
    # combinations OR together
    assert _changed(base, _p10(classification=3, user_data=9)) == 10


def test_point10_intensity_vs_return_map_table():
    """The intensity bit compares against last_intensity[m] (per return map,
    seeded to ZERO at chunk start), not the first record's intensity field:
    a chunk whose first two records share intensity 500 still flags bit 16
    on the second record."""
    first = _p10(intensity=500)
    assert _changed(first, _p10(intensity=500)) == 16
    # and intensity 0 after a 500-intensity first record is "unchanged"
    assert _changed(first, _p10(intensity=0)) == 0


def test_chunk_table_corrector():
    sizes = np.asarray([50_000, 49_712, 51_003, 1_234, 50_000], np.uint32)
    dec = np.empty(len(sizes), np.uint32)
    stream = np.empty(4096, np.uint8)
    slen = ctypes.c_uint32(0)
    rc = lib.treee_laz_test_chunk_table(
        sizes.ctypes.data_as(ctypes.c_void_p), len(sizes),
        dec.ctypes.data_as(ctypes.c_void_p),
        stream.ctypes.data_as(ctypes.c_void_p), len(stream),
        ctypes.byref(slen),
    )
    assert rc == 0
    np.testing.assert_array_equal(dec, sizes)
    # similar sizes compress far below 4 bytes each through the
    # previous-size prediction in context 1
    assert 0 < slen.value < 4 * len(sizes)


def _wp29(index=0, offset=0, size=0, loc=0.0, dxyz=(0.0, 0.0, 0.0)):
    buf = np.zeros(29, np.uint8)
    buf[0] = index
    buf[1:9] = np.asarray([offset], "<u8").view(np.uint8)
    buf[9:13] = np.asarray([size], "<u4").view(np.uint8)
    buf[13:17] = np.asarray([loc], "<f4").view(np.uint8)
    buf[17:29] = np.asarray(dxyz, "<f4").view(np.uint8)
    return buf


def test_wavepacket_offset_case_symbols():
    """WAVEPACKET13/14 offset-case mapping: 0 = same offset (re-referenced
    waveform), 1 = contiguous (prev offset + prev size), 2 = 32-bit delta,
    3 = raw 64-bit escape.  Hand-built transitions, symbol extracted from the
    real encoder's stream."""
    fn = lib.treee_laz_test_wavepacket_offset_sym
    fn.restype = ctypes.c_uint32
    last = _wp29(index=2, offset=10_000, size=500)

    def sym(cur):
        return fn(last.ctypes.data_as(ctypes.c_void_p),
                  cur.ctypes.data_as(ctypes.c_void_p))

    assert sym(_wp29(offset=10_000, size=700)) == 0          # same offset
    assert sym(_wp29(offset=10_500, size=700)) == 1          # prev + size
    assert sym(_wp29(offset=9_000, size=700)) == 2           # small delta
    assert sym(_wp29(offset=10_000 + (1 << 40), size=1)) == 3  # 64-bit escape
    # boundary: a delta of exactly INT32_MAX still rides case 2
    assert sym(_wp29(offset=10_000 + 0x7FFFFFFF, size=1)) == 2
    # one beyond INT32_MAX needs the escape
    assert sym(_wp29(offset=10_000 + 0x80000000, size=1)) == 3


def test_golden_stream_hashes():
    """Byte-exact golden pins of the encoder output for one fixed input per
    point format.  Roundtrip symmetry cannot see a change that lands in both
    directions at once; these hashes make ANY codec-stream change loud and
    deliberate (update the table only with an explicit compatibility note).
    Inputs are pure integer mixing (NO np.random: NumPy does not guarantee
    Generator stream stability across versions, NEP 19) so the pins track
    only the codec."""
    import hashlib

    from treee_tpu.io import las, laz_native

    golden = {
        0: ("c04510c07132308e", 12474),
        1: ("f970c6b78a614f76", 14497),
        2: ("82f9da1f4200dcc3", 37902),
        3: ("952243896318f81c", 39924),
        4: ("0ea84e2624e68ed5", 27925),
        5: ("fbb04d7a05148922", 53351),
        6: ("cc91ee77a06440f0", 17053),
        7: ("ba60360f7bb00aef", 17577),
        8: ("7b80d4f1089b5754", 17629),
        9: ("efe27e3a5596578e", 18813),
        10: ("727cf3b24c18511d", 19389),
    }

    def mix(i, salt):
        # splitmix-style integer hash: deterministic, version-independent
        # (salt product folded in Python ints: numpy warns on scalar wrap)
        add = np.uint64((salt * 0x9E3779B97F4A7C15) % (1 << 64))
        x = np.uint64(i) + add
        x = (x ^ (x >> np.uint64(30))) * np.uint64(0xBF58476D1CE4E5B9)
        x = (x ^ (x >> np.uint64(27))) * np.uint64(0x94D049BB133111EB)
        return x ^ (x >> np.uint64(31))

    def records(fmt):
        n = 4096
        i = np.arange(n, dtype=np.uint64)
        length = las.POINT_LENGTHS[fmt]
        rec = np.zeros((n, length), np.uint8)
        steps = (mix(i, 1) % np.uint64(128)).astype(np.int64) - 64
        xyz = np.stack([np.cumsum(steps), np.cumsum(steps[::-1]),
                        np.cumsum((steps * 3) % 97)], axis=1).astype("<i4")
        rec[:, 0:12] = xyz.view(np.uint8).reshape(n, 12)
        rec[:, 14] = 0b0010001 if fmt >= 6 else 0b001001
        t = (np.arange(n) * 1e-4 + 3e5).astype("<f8")
        if fmt in (1, 3, 4, 5):
            rec[:, 20:28] = t.view(np.uint8).reshape(n, 8)
        if fmt in (2, 3, 5):
            o = 28 if fmt in (3, 5) else 20
            rgb = (np.stack([mix(i, 2) % 256, mix(i, 3) % 256,
                             mix(i, 4) % 256], axis=1) * 257).astype("<u2")
            rec[:, o:o + 6] = rgb.view(np.uint8).reshape(n, 6)
        if fmt in (4, 5):
            o = length - 29
            sz = (np.uint64(100) + mix(i, 5) % np.uint64(900)).astype("<u4")
            off = (np.cumsum(sz.astype(np.uint64)) + 7).astype("<u8")
            rec[:, o] = (mix(i, 6) % np.uint64(3)).astype(np.uint8)
            rec[:, o + 1:o + 9] = off.view(np.uint8).reshape(n, 8)
            rec[:, o + 9:o + 13] = sz.view(np.uint8).reshape(n, 4)
        if fmt >= 6:
            rec[:, 22:30] = t.view(np.uint8).reshape(n, 8)
        return rec, length

    for fmt, (digest, size) in golden.items():
        rec, length = records(fmt)
        stream = laz_native.compress(rec, length, 0, chunk_size=1024,
                                     point_format=fmt)
        assert len(stream) == size, (fmt, len(stream))
        assert hashlib.sha256(stream).hexdigest()[:16] == digest, fmt


# --- POINT14 (layered v3) pins: VERDICT r2 task 7 -------------------------


def _p14(x=0, y=0, z=0, intensity=0, ret=1, n=1, channel=0, cls=0,
         user=0, angle=0, source=0, gps=0.0):
    import struct as _s

    returns = (ret & 15) | ((n & 15) << 4)
    flags = (channel & 3) << 4
    return _s.pack("<iiiHBBBBhHd", x, y, z, intensity, returns, flags,
                   cls, user, angle, source, gps)


def test_point14_context_level_tables():
    """The 16x16 (number_of_returns, return_number) -> 6-context / 8-level
    tables, pinned against HAND-WRITTEN rows (not the formula): these are
    the derived tables laz_layered.cpp:20-29 names as the top ground-truth
    risk — any future 'fix' that silently reshapes them must fail here."""
    m6 = np.zeros(256, np.uint32)
    l8 = np.zeros(256, np.uint32)
    lib.treee_laz_test_p14_tables(
        m6.ctypes.data_as(ctypes.c_void_p),
        l8.ctypes.data_as(ctypes.c_void_p))
    m6 = m6.reshape(16, 16)
    l8 = l8.reshape(16, 16)

    # hand rows (r across 0..7): single(0) first(1) last(2) second(3)
    # second-to-last(4) intermediate(5)
    assert m6[0, :3].tolist() == [0, 0, 5]          # n=0: r<=1 single
    assert m6[1, :4].tolist() == [0, 0, 5, 5]       # n=1: r<=1 single
    # r >= n maps to "last" (covers malformed r > n consistently)
    assert m6[2, :5].tolist() == [5, 1, 2, 2, 2]    # n=2: first, last
    assert m6[3, :6].tolist() == [5, 1, 3, 2, 2, 2]  # n=3: first,second,last
    assert m6[4, :7].tolist() == [5, 1, 3, 4, 2, 2, 2]
    assert m6[5, :8].tolist() == [5, 1, 3, 5, 4, 2, 2, 2]
    assert m6[6, :8].tolist() == [5, 1, 3, 5, 5, 4, 2, 2]
    # r beyond n is "last" exactly at r>=n (n>=2), incl. the 4-bit tail
    assert m6[2, 5] == 2 and m6[7, 15] == 2 and m6[15, 15] == 2

    # level = clamp(|n-r|, 0, 7) — hand rows
    assert l8[0, :8].tolist() == [0, 1, 2, 3, 4, 5, 6, 7]
    assert l8[5, :8].tolist() == [5, 4, 3, 2, 1, 0, 1, 2]
    assert l8[15, 15] == 0 and l8[15, 0] == 7 and l8[8, 0] == 7


def test_point14_changed_values_bits():
    """changed_values bit assignments: channel 64 / point source 32 / gps 16
    / scan angle 8 / n-returns 4 / return-number code 0-3 (same, +1 mod 16,
    -1 mod 16, other) — via the SAME p14_changed_bits the codec calls."""
    def changed(last, cur, channel=0, gps=0, last_gps=0):
        out = lib.treee_laz_test_p14_changed(
            last, cur, channel, gps, last_gps)
        return out & 0xFF, (out >> 8) & 0xFF

    base = _p14(ret=2, n=3, angle=5, source=7)
    assert changed(base, _p14(ret=2, n=3, angle=5, source=7)) == (0, 0)
    # rn codes: same / +1 / -1 (mod 16) / other
    assert changed(base, _p14(ret=3, n=3, angle=5, source=7))[0] == 1
    assert changed(base, _p14(ret=1, n=3, angle=5, source=7))[0] == 2
    assert changed(base, _p14(ret=5, n=3, angle=5, source=7))[0] == 3
    wrap = _p14(ret=15, n=3, angle=5, source=7)
    assert changed(wrap, _p14(ret=0, n=3, angle=5, source=7))[0] == 1
    assert changed(_p14(ret=0, n=3, angle=5, source=7), wrap)[0] == 2
    # single-field bits
    assert changed(base, _p14(ret=2, n=4, angle=5, source=7))[0] == 4
    assert changed(base, _p14(ret=2, n=3, angle=6, source=7))[0] == 8
    assert changed(base, _p14(ret=2, n=3, angle=5, source=8))[0] == 32
    assert changed(base, base, gps=1)[0] == 16
    assert changed(base, base, channel=1)[0] == 64
    # all at once
    assert changed(base, _p14(ret=3, n=4, angle=6, source=8),
                   channel=1, gps=1)[0] == 64 + 32 + 16 + 8 + 4 + 1

    # lpr selector: (last r == 1) + 2*(last r >= last n) + 4*gps_change
    assert changed(_p14(ret=1, n=1), base)[1] == 3
    assert changed(_p14(ret=1, n=3), base)[1] == 1
    assert changed(_p14(ret=3, n=3), base)[1] == 2
    assert changed(_p14(ret=2, n=3), base)[1] == 0
    assert changed(_p14(ret=2, n=3), base, last_gps=1)[1] == 4
    assert changed(_p14(ret=1, n=1), base, last_gps=1)[1] == 7


def test_point14_chunk_framing():
    """Layered chunk-internal layout, pinned against the documented scheme:
    [raw first point (30 B)] [u32 point count] [u32 size x 9 POINT14 layers]
    [layer blobs...], chunk0 at byte 8 after the i64 chunk-table offset."""
    import struct as _s

    from treee_tpu.io import laz_native

    pts = b"".join(
        _p14(x=i * 10, y=i * 3, z=i, intensity=i % 5, gps=float(i))
        for i in range(7)
    )
    records = np.frombuffer(pts, np.uint8)
    blob = laz_native.compress(records, 30, base_offset=0, chunk_size=50,
                               point_format=6)
    (table_off,) = _s.unpack_from("<q", blob, 0)
    # chunk 0 begins after the 8-byte table offset with the RAW first point
    assert blob[8:38] == pts[:30]
    (count,) = _s.unpack_from("<I", blob, 38)
    assert count == 7
    sizes = _s.unpack_from("<9I", blob, 42)
    # layer blobs fill the chunk exactly up to the table
    assert 8 + 30 + 4 + 36 + sum(sizes) == table_off
    # XY layer carries the coordinate entropy; empty-field layers are tiny
    assert sizes[0] > 0
    # the stream decodes back bit-exactly (framing parse = codec parse)
    import types as _t
    out = laz_native.decompress(
        blob, _t.SimpleNamespace(point_length=30, offset_to_point_data=0),
        laz_native.make_vlr(point_length=30, point_format=6, chunk_size=50),
        7)
    assert bytes(out) == pts


def test_point14_context_seeding_roundtrip():
    """4-context (scanner channel) switching: a stream that hops channels
    mid-chunk must seed each fresh context from the previously ACTIVE one
    and roundtrip bit-exactly (the lazy-seeding rule laz_layered.cpp
    documents; a wrong seed source diverges the models and the decode)."""
    from treee_tpu.io import laz_native

    pts = b"".join(
        _p14(x=i * 7, y=-i, z=i * 2, channel=c, gps=float(i % 3))
        for i, c in enumerate([0, 0, 2, 1, 2, 3, 0, 3, 1, 1, 2, 0])
    )
    records = np.frombuffer(pts, np.uint8)
    blob = laz_native.compress(records, 30, base_offset=0, chunk_size=50,
                               point_format=6)
    import types as _t
    out = laz_native.decompress(
        blob, _t.SimpleNamespace(point_length=30, offset_to_point_data=0),
        laz_native.make_vlr(point_length=30, point_format=6, chunk_size=50),
        12)
    assert bytes(out) == pts
