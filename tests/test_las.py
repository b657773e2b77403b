"""LAS ingest round-trip and synthetic-scan tests."""

import numpy as np

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
