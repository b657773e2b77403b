"""LAS ingest round-trip and synthetic-scan tests."""

import numpy as np
import pytest

from treee_tpu.io import las


def test_write_read_roundtrip(tmp_path):
    rng = np.random.default_rng(0)
    pos = rng.uniform(-50, 50, size=(5000, 3)).astype(np.float32)
    path = str(tmp_path / "scan.las")
    las.write_las(path, pos)
    scan = las.load(path)
    assert scan.header.num_points == 5000
    assert not scan.header.compressed
    # loader recenters on the scan midpoint; undo to compare
    recovered = scan.pos + scan.world_offset.astype(np.float32)
    np.testing.assert_allclose(recovered, pos, atol=2e-3)


def test_load_respects_center_override(tmp_path):
    pos = np.array([[0.0, 0.0, 0.0], [10.0, 10.0, 10.0]], np.float32)
    path = str(tmp_path / "two.las")
    las.write_las(path, pos)
    scan = las.load(path, center=np.zeros(3))
    np.testing.assert_allclose(scan.pos, pos, atol=2e-3)


def test_load_max_points(tmp_path):
    pos = np.random.default_rng(1).uniform(0, 1, (1000, 3)).astype(np.float32)
    path = str(tmp_path / "cap.las")
    las.write_las(path, pos)
    scan = las.load(path, max_points=100)
    assert scan.pos.shape[0] == 100


def test_bad_signature_rejected(tmp_path):
    p = tmp_path / "bad.las"
    p.write_bytes(b"NOPE" + b"\0" * 400)
    try:
        las.load(str(p))
        raise AssertionError("should have raised")
    except ValueError as e:
        assert "signature" in str(e)


def test_header_swizzled_bounds(tmp_path):
    pos = np.array([[1.0, 2.0, 3.0], [4.0, 5.0, 6.0]], np.float32)
    path = str(tmp_path / "b.las")
    las.write_las(path, pos)
    scan = las.load(path)
    # swizzled bounds (y-up) should cover the y-up positions
    lo = scan.lo + scan.world_offset.astype(np.float32)
    hi = scan.hi + scan.world_offset.astype(np.float32)
    assert np.all(pos >= lo - 1e-2) and np.all(pos <= hi + 1e-2)


def test_synthetic_forest_shape():
    pts = las.synthetic_forest(n_trees=4, points_per_tree=1000, ground_points=500)
    assert pts.shape == (4500, 3)
    assert pts[:, 1].min() > -1.0  # ground near y=0
    assert pts[:, 1].max() > 5.0   # crowns above


def test_las_corruption_fuzz_no_uncaught_errors(tmp_path):
    """Header bit flips, field fills, and truncations of a .las file either
    load or raise the clean error taxonomy — e.g. a zeroed point-record
    length must not leak ZeroDivisionError (LasHeader.parse guards it)."""
    import warnings

    from treee_tpu.utils.errors import CorruptFile, UnsupportedFormat

    pos = np.random.default_rng(4).uniform(0, 5, (5_000, 3)).astype(np.float32)
    path = str(tmp_path / "fz.las")
    las.write_las(path, pos)
    data = open(path, "rb").read()
    n = len(data)
    rng = np.random.default_rng(9)

    cases = [("flip", off, 1 << int(rng.integers(0, 8)))
             for off in range(0, 400, 2)]
    cases += [("zero4", off, None) for off in range(0, 375, 4)]
    cases += [("ff4", off, None) for off in range(0, 375, 4)]
    cases += [("trunc", int(rng.integers(1, n)), None) for _ in range(20)]

    for kind, off, arg in cases:
        buf = bytearray(data)
        if kind == "flip":
            buf[off] ^= arg
        elif kind == "zero4":
            buf[off:off + 4] = b"\0" * 4
        elif kind == "ff4":
            buf[off:off + 4] = b"\xff" * 4
        else:
            del buf[off:]
        with warnings.catch_warnings():
            warnings.simplefilter("ignore", RuntimeWarning)
            try:
                las.load(bytes(buf))
            except (CorruptFile, UnsupportedFormat, ValueError, MemoryError):
                pass  # clean rejection


def test_write_las_does_not_mutate_caller_records(tmp_path):
    """write_las/write_laz patch the xyz bytes of supplied raw records into
    the output; they must do so on a COPY — a contiguous caller buffer used
    to be overwritten in place, corrupting roundtrip comparisons."""
    rng = np.random.default_rng(23)
    n = 500
    pos = rng.uniform(0, 10, (n, 3)).astype(np.float32)
    records = rng.integers(0, 256, (n, 20), dtype=np.uint8)
    before = records.copy()
    las.write_las(str(tmp_path / "a.las"), pos, records=records)
    np.testing.assert_array_equal(records, before)
    las.write_laz(str(tmp_path / "a.laz"), pos, records=records)
    np.testing.assert_array_equal(records, before)


def test_export_las_classified_roundtrip(tmp_path):
    """Session.export_las writes a georeferenced, classified LAS 1.4/PDRF6
    file: positions come back in the source CRS (load() recenters and
    reports the offset), classification carries the ASPRS mapping
    (ground=2, trunk=4, crown=5), point_source_id carries the tree id, and
    the .laz flavor decodes identically through the native codec."""
    import struct

    from treee_tpu.config import (
        CharacteristicsConfig, Config, SegmentationConfig, RenderConfig,
    )
    from treee_tpu.pipeline import Session

    cfg = Config(
        segmentation=SegmentationConfig(
            grid_size=128, max_bands=16, max_segments=256,
            max_trees_per_band=32,
        ),
        characteristics=CharacteristicsConfig(max_slices=96),
        render=RenderConfig(width=192, height=108),
    )
    pts = las.synthetic_forest(n_trees=3, points_per_tree=3000,
                               ground_points=3000, seed=5)
    s = Session.from_points(pts, cfg)
    s.world_offset = np.array([700000.0, 0.0, -6600000.0])
    s.segment(0.75)
    s.characteristics()

    path = str(tmp_path / "classified.las")
    n = s.export_las(path)
    live = np.asarray(s.cloud.valid & (s.cloud.segment != 0))
    assert n == int(live.sum())

    # reload: world_offset must round-trip (georeferencing) and positions
    # must match the live subset to quantization
    scan = las.load(path)
    assert scan.pos.shape[0] == n
    # scan recenters around its own bbox center; undo both recenterings
    orig = np.asarray(s.cloud.pos)[live]
    got = scan.pos + (scan.world_offset - np.array(
        [s.world_offset[0], s.world_offset[1], s.world_offset[2]]))
    assert np.allclose(np.sort(got[:, 1]), np.sort(orig[:, 1]), atol=2e-3)
    assert np.allclose(np.sort(got[:, 0]), np.sort(orig[:, 0]), atol=2e-3)

    # parse classification + point_source_id straight from the records
    raw = open(path, "rb").read()
    hdr = las.LasHeader.parse(raw)
    rec = np.frombuffer(
        raw[hdr.offset_to_point_data:
            hdr.offset_to_point_data + n * hdr.point_length],
        np.uint8).reshape(n, hdr.point_length)
    asprs = rec[:, 16]
    assert set(np.unique(asprs)) <= {1, 2, 4, 5}
    cls = np.asarray(s.cloud.classification)[live]
    counts = {code: int((asprs == code).sum()) for code in (2, 4, 5)}
    assert counts[2] == int((cls == 0).sum())  # ground
    assert counts[4] == int((cls == 1).sum())  # trunk
    assert counts[5] == int((cls == 2).sum())  # crown
    psid = rec[:, 20:22].copy().view("<u2").ravel()
    seg = np.asarray(s.cloud.segment)[live]
    assert set(np.unique(psid)) == set(np.unique(seg))

    # the .laz flavor decodes to the same point set
    zpath = str(tmp_path / "classified.laz")
    nz = s.export_las(zpath)
    assert nz == n
    scan_z = las.load(zpath)
    assert np.allclose(np.sort(scan_z.pos[:, 1]), np.sort(scan.pos[:, 1]),
                       atol=1e-6)
    assert np.allclose(scan_z.world_offset, scan.world_offset)


# ---------------------------------------------------------------------------
# Source point-record attributes (io/las.decode_attributes) — the fields the
# reference loader discards (laz.rs:202-213 keeps only xyz).
# ---------------------------------------------------------------------------

def _attr_records(rng, n, point_format):
    """Raw records with known non-coordinate fields for a given format."""
    pl = las.POINT_LENGTHS[point_format]
    rec = np.zeros((n, pl), np.uint8)
    intensity = rng.integers(0, 1 << 16, n, dtype=np.uint16)
    rec[:, 12:14] = intensity.astype("<u2").view(np.uint8).reshape(n, 2)
    if point_format >= 6:
        ret = rng.integers(1, 16, n, dtype=np.uint8)
        rec[:, 14] = ret
        cls = rng.integers(0, 256, n, dtype=np.uint8)
        rec[:, 16] = cls
    else:
        ret = rng.integers(1, 6, n, dtype=np.uint8)
        rec[:, 14] = ret | (ret << 3)  # return k of k
        cls = rng.integers(0, 32, n, dtype=np.uint8)
        rec[:, 15] = cls
    attrs = {"intensity": intensity, "return_number": ret,
             "file_classification": cls}
    if point_format in las.GPS_OFFSETS:
        t = rng.uniform(3.0e8, 3.1e8, n)
        o = las.GPS_OFFSETS[point_format]
        rec[:, o:o + 8] = t.astype("<f8").view(np.uint8).reshape(n, 8)
        attrs["gps_time"] = t
    if point_format in las.RGB_OFFSETS:
        rgb = rng.integers(0, 1 << 16, (n, 3), dtype=np.uint16)
        o = las.RGB_OFFSETS[point_format]
        rec[:, o:o + 6] = rgb.astype("<u2").view(np.uint8).reshape(n, 6)
        attrs["rgb"] = rgb
    return rec, attrs


def test_attributes_format3_las(tmp_path):
    """Format 3 (legacy + gps + rgb): every attribute survives load()."""
    rng = np.random.default_rng(31)
    n = 1200
    pos = rng.uniform(-20, 20, (n, 3)).astype(np.float32)
    rec, attrs = _attr_records(rng, n, 3)
    path = str(tmp_path / "a3.las")
    las.write_las(path, pos, point_format=3, records=rec)
    scan = las.load(path)
    assert set(scan.attributes) == {"intensity", "return_number",
                                    "file_classification", "gps_time", "rgb"}
    np.testing.assert_array_equal(scan.attributes["intensity"],
                                  attrs["intensity"])
    np.testing.assert_array_equal(scan.attributes["return_number"],
                                  attrs["return_number"])
    np.testing.assert_array_equal(scan.attributes["file_classification"],
                                  attrs["file_classification"])
    np.testing.assert_array_equal(scan.attributes["rgb"], attrs["rgb"])
    np.testing.assert_allclose(scan.attributes["gps_time"], attrs["gps_time"])
    # max_points truncates attributes alongside positions
    part = las.load(path, max_points=100)
    np.testing.assert_array_equal(part.attributes["intensity"],
                                  attrs["intensity"][:100])


def test_attributes_format7_laz_roundtrip(tmp_path):
    """Format 7 (layered POINT14+RGB14): attributes survive the native LAZ
    codec bit-exactly."""
    rng = np.random.default_rng(32)
    n = 900
    pos = rng.uniform(-15, 15, (n, 3)).astype(np.float32)
    rec, attrs = _attr_records(rng, n, 7)
    path = str(tmp_path / "a7.laz")
    las.write_laz(path, pos, point_format=7, records=rec)
    scan = las.load(path)
    np.testing.assert_array_equal(scan.attributes["intensity"],
                                  attrs["intensity"])
    np.testing.assert_array_equal(scan.attributes["rgb"], attrs["rgb"])
    np.testing.assert_array_equal(scan.attributes["file_classification"],
                                  attrs["file_classification"])
    np.testing.assert_allclose(scan.attributes["gps_time"], attrs["gps_time"])


def test_attributes_short_record_header_is_safe(tmp_path):
    """A lying header (format 3 layout, point_length 20) must not crash the
    attribute decode; fields beyond the record end are simply absent."""
    rng = np.random.default_rng(33)
    raw = rng.integers(0, 256, 20 * 50, dtype=np.uint8)
    attrs = las.decode_attributes(raw, 3, 20)
    assert "rgb" not in attrs and "gps_time" not in attrs
    assert "intensity" in attrs and len(attrs["intensity"]) == 50


def test_session_attributes_display_export_checkpoint(tmp_path):
    """Session flow for source attributes: display props, classified export
    carrying intensity/RGB (PDRF 7), checkpoint round trip, and zero-filled
    merge with an attribute-less scan."""
    from treee_tpu.config import Config, RenderConfig
    from treee_tpu.pipeline import Session

    rng = np.random.default_rng(34)
    n = 800
    pos = rng.uniform(-10, 10, (n, 3)).astype(np.float32)
    rec, attrs = _attr_records(rng, n, 7)
    src = str(tmp_path / "src.las")
    las.write_las(src, pos, point_format=7, records=rec)

    cfg = Config(render=RenderConfig(width=96, height=64))
    s = Session.from_las(src, cfg)
    # padded row alignment: attributes live at the first n rows
    np.testing.assert_array_equal(
        s.attributes["intensity"][:n], attrs["intensity"])
    assert not s.attributes["intensity"][n:].any()

    prop, pal = s.attribute_prop("intensity")
    assert pal is None
    p = np.asarray(prop)
    assert p.min() >= 0.0 and p.max() <= 1.0 and p.shape[0] == s.cloud.capacity
    prop_rgb, pal_rgb = s.attribute_prop("rgb")
    assert pal_rgb is not None and pal_rgb.shape == (256, 3)
    img = s.render(prop=prop_rgb, palette=pal_rgb)
    assert img.shape == (64, 96, 3)

    # classified export keeps the source color + intensity (PDRF 7)
    out = str(tmp_path / "out.las")
    s.export_las(out)
    back = las.load(out)
    assert back.header.point_format == 7
    np.testing.assert_array_equal(back.attributes["intensity"],
                                  attrs["intensity"])
    np.testing.assert_array_equal(back.attributes["rgb"], attrs["rgb"])

    # checkpoint: attributes survive save/open
    ck = str(tmp_path / "sess.npz")
    s.save(ck)
    s2 = Session.open(ck, cfg)
    np.testing.assert_array_equal(
        s2.attributes["rgb"][:n], attrs["rgb"])

    # merging an attribute-less scan zero-fills its rows
    plain = str(tmp_path / "plain0.las")
    las.write_las(plain, pos[:100] + 100.0, point_format=0)
    s2.add_las(plain)
    inten = s2.attributes["intensity"]
    valid = np.asarray(s2.cloud.valid)
    assert valid.sum() == n + 100
    np.testing.assert_array_equal(inten[:n], attrs["intensity"])
    # format 0 still has an intensity field (zeros from write_las) — rgb is
    # what the plain scan lacks entirely
    assert not s2.attributes["rgb"][n:n + 100].any()


def test_gps_time_display_keeps_its_span(tmp_path):
    """Regression: adjusted-standard GPS times (~3e8 s base, small span)
    must normalize in f64 over LIVE rows — the old f32-first path collapsed
    a 2000 s survey to one palette slot (f32 quantum at 3e8 is ~16 s, and
    the zero padding pinned the min)."""
    from treee_tpu.pipeline import Session

    rng = np.random.default_rng(35)
    n = 800
    pos = rng.uniform(-10, 10, (n, 3)).astype(np.float32)
    pl = las.POINT_LENGTHS[1]
    rec = np.zeros((n, pl), np.uint8)
    t = 3.0e8 + np.sort(rng.uniform(0.0, 2000.0, n))
    rec[:, las.GPS_OFFSETS[1]:las.GPS_OFFSETS[1] + 8] = (
        t.astype("<f8").view(np.uint8).reshape(n, 8))
    path = str(tmp_path / "g1.las")
    las.write_las(path, pos, point_format=1, records=rec)

    s = Session.from_las(path)
    prop = np.asarray(s.attribute_prop("gps_time")[0])[:n]
    assert prop.min() < 0.01 and prop.max() > 0.99
    # the span must survive quantization to the 256 palette slots
    assert len(np.unique((prop * 255).astype(np.int32))) > 100

    # ... and survive merging a scan WITHOUT gps_time: merge_attributes
    # zero-fills the new rows, which must not re-pin the range to 0
    plain = str(tmp_path / "plain.las")
    las.write_las(plain, pos[:50] + 200.0, point_format=0)
    s.add_las(plain)
    prop2 = np.asarray(s.attribute_prop("gps_time")[0])[:n]
    assert prop2.min() < 0.01 and prop2.max() > 0.99
    assert len(np.unique((prop2 * 255).astype(np.int32))) > 100


# ---------------------------------------------------------------------------
# streaming ingest (VERDICT r4 task 6: chunk-streamed loading preview)


def test_load_streaming_matches_load(tmp_path):
    """load_streaming == load bit-for-bit, with one callback per slab and
    monotone progress counters."""
    pos = np.random.default_rng(3).uniform(-8, 8, (30_000, 3)).astype(np.float32)
    p = str(tmp_path / "s.las")
    las.write_las(p, pos)
    calls = []
    scan_s = las.load_streaming(
        p, lambda pts, done, total: calls.append((len(pts), done, total)),
        slab_points=10_000)
    scan = las.load(p)
    np.testing.assert_array_equal(scan.pos, scan_s.pos)
    for k in scan.attributes:
        np.testing.assert_array_equal(scan.attributes[k], scan_s.attributes[k])
    assert [c[1] for c in calls] == [10_000, 20_000, 30_000]
    assert all(c[2] == 30_000 for c in calls)


def test_load_streaming_laz_chunk_aligned(tmp_path):
    """.laz slabs cover whole LASzip chunks via the native range decode
    (first_point) — no re-decoding, same bytes as the one-shot path."""
    from treee_tpu.io import native_build

    if native_build.load_library(required=False) is None:
        pytest.skip("native codec not built")
    pos = np.random.default_rng(4).uniform(-8, 8, (120_001, 3)).astype(np.float32)
    p = str(tmp_path / "s.laz")
    las.write_laz(p, pos)  # 50k-point chunks -> 3 chunks
    calls = []
    scan_s = las.load_streaming(p, lambda pts, d, t: calls.append(d),
                                slab_points=50_000)
    np.testing.assert_array_equal(las.load(p).pos, scan_s.pos)
    assert calls == [50_000, 100_000, 120_001]


def test_from_las_ingest_preview(tmp_path):
    """Session.from_las(preview_cb=...) pushes one coarse frame per slab
    while the scan decodes (the reference's loading.rs:91-115 streaming)."""
    from treee_tpu.config import Config, RenderConfig
    from treee_tpu.pipeline import Session

    pos = np.random.default_rng(5).uniform(-8, 8, (24_000, 3)).astype(np.float32)
    pos[:, 1] = np.abs(pos[:, 1])
    p = str(tmp_path / "s.las")
    las.write_las(p, pos)
    frames = []
    cfg = Config(render=RenderConfig(width=96, height=64))
    s = Session.from_las(p, cfg, preview_cb=frames.append,
                         preview_points=4096, slab_points=8_000)
    assert len(frames) == 3
    for img in frames:
        assert img.shape == (64, 96, 3) and img.dtype == np.uint8
    # later frames have at least as many lit pixels as the first
    lit = [int((f.sum(axis=-1) > 0).sum()) for f in frames]
    assert lit[-1] >= lit[0] > 0
    assert int(s.cloud.count) == 24_000
