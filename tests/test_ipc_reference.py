"""Reference-app .ipc (bincode) session import/export.

The golden fixture is constructed byte-by-byte from the bincode 1.3
legacy-default wire rules (LE fixed ints, u64 lengths, u32 enum variants,
one-byte Option tags, unprefixed fixed arrays) applied to
``InteractiveSave`` (treee/src/interactive/mod.rs:44-50) — independent of
our writer, so an encoder/decoder-shared bug cannot self-verify.
"""

import io
import struct

import numpy as np
import pytest

from treee_tpu.io import ipc
from treee_tpu.utils.errors import CorruptFile


def seg_bytes(points, classes, info=(1.5, 4.0, 0.4, 2.1), coords=None):
    p = np.asarray(points, "<f4").reshape(-1, 3)
    c = np.asarray(classes, "<u4")
    assert len(p) == len(c)
    out = struct.pack("<Q", len(p)) + p.tobytes()
    out += struct.pack("<Q", len(c)) + c.tobytes()
    out += struct.pack("<4f", *info)
    lo = p.min(axis=0) if len(p) else np.zeros(3, "<f4")
    hi = p.max(axis=0) if len(p) else np.zeros(3, "<f4")
    out += np.asarray(lo, "<f4").tobytes() + np.asarray(hi, "<f4").tobytes()
    if coords is None:
        out += b"\x00"
    else:
        out += b"\x01" + struct.pack("<2d", *coords)
    return out


def golden_stream():
    """Two live segments (sparse ids 7 and 3), one deleted point."""
    s7 = seg_bytes([[0.0, 1.0, 0.0], [0.5, 2.0, 0.5]], [1, 2],
                   coords=(51.1, 13.7))
    s3 = seg_bytes([[5.0, 0.1, 5.0]], [0])
    deleted = seg_bytes([[9.0, 9.0, 9.0]], [2])
    blob = struct.pack("<Q", 2)
    blob += struct.pack("<I", 7) + s7
    blob += struct.pack("<I", 3) + s3
    blob += deleted
    blob += struct.pack("<3d", 400000.0, 0.0, 5600000.0)
    loc = b"+proj=utm\n+ellps=GRS80\n+zone=32"
    blob += struct.pack("<Q", len(loc)) + loc
    return blob


def test_golden_parse():
    arrays, off, loc = ipc.read_reference_ipc(golden_stream())
    assert loc == "+proj=utm\n+ellps=GRS80\n+zone=32"
    np.testing.assert_allclose(off, [400000.0, 0.0, 5600000.0])
    # densified: deleted first (id 0), then sorted original ids 3 -> 1, 7 -> 2
    np.testing.assert_array_equal(arrays["segment"], [0, 1, 2, 2])
    np.testing.assert_array_equal(arrays["classification"], [2, 0, 1, 2])
    np.testing.assert_allclose(
        arrays["pos"],
        [[9, 9, 9], [5, 0.1, 5], [0, 1, 0], [0.5, 2, 0.5]],
        rtol=1e-6,
    )


def test_load_dispatches_on_magic(tmp_path):
    p = tmp_path / "session.ipc"
    p.write_bytes(golden_stream())
    arrays, off, loc = ipc.load(str(p))
    assert len(arrays["pos"]) == 4 and loc.startswith("+proj=utm")
    # file-like dispatch too
    arrays2, _, _ = ipc.load(io.BytesIO(golden_stream()))
    np.testing.assert_array_equal(arrays2["segment"], arrays["segment"])


def test_session_open_and_merge(tmp_path):
    from treee_tpu.pipeline import Session

    p = tmp_path / "ref.ipc"
    p.write_bytes(golden_stream())
    s = Session.open(str(p))
    assert s.source_location.startswith("+proj=utm")
    assert int(np.asarray(s.cloud.valid).sum()) == 4
    np.testing.assert_allclose(s.world_offset, [400000.0, 0.0, 5600000.0])
    # additive merge of the same .ipc: ids renumber, points double
    s.add_session(str(p))
    data = s.cloud.to_numpy()
    assert len(data["pos"]) == 8
    assert set(np.unique(data["segment"])) == {0, 1, 2, 3, 4}


def test_writer_roundtrip(tmp_path):
    arrays = {
        "pos": np.array([[1, 2, 3], [4, 5, 6], [0, 0, 1]], np.float32),
        "segment": np.array([2, 2, 0], np.int32),
        "classification": np.array([1, 2, 0], np.int32),
    }
    p = tmp_path / "out.ipc"
    ipc.write_reference_ipc(
        str(p), arrays, np.array([1.0, 2.0, 3.0]), "loc",
        info={2: (1.0, 2.0, 3.0, 4.0)},
    )
    got, off, loc = ipc.load(str(p))
    np.testing.assert_allclose(off, [1.0, 2.0, 3.0])
    assert loc == "loc"
    # deleted row first after densify, then segment 2 -> 1
    np.testing.assert_array_equal(got["segment"], [0, 1, 1])
    np.testing.assert_allclose(got["pos"], [[0, 0, 1], [1, 2, 3], [4, 5, 6]])
    np.testing.assert_array_equal(got["classification"], [0, 1, 2])


def test_writer_info_fields_roundtrip(tmp_path):
    """The info block lands at its documented offset (read back by hand)."""
    arrays = {
        "pos": np.array([[1, 2, 3]], np.float32),
        "segment": np.array([5], np.int32),
        "classification": np.array([1], np.int32),
    }
    buf = io.BytesIO()
    ipc.write_reference_ipc(buf, arrays, np.zeros(3), "x",
                            info={5: (9.0, 8.0, 7.0, 6.0)})
    raw = buf.getvalue()
    # u64 map len, u32 id, u64 npts, 12B point, u64 ncls, 4B class, info
    info_off = 8 + 4 + 8 + 12 + 8 + 4
    assert struct.unpack_from("<4f", raw, info_off) == (9.0, 8.0, 7.0, 6.0)


def test_session_save_ipc_dispatch(tmp_path):
    from treee_tpu.pipeline import Session
    from treee_tpu.cloud import PointCloud

    s = Session()
    s.cloud = PointCloud.from_numpy(
        np.array([[0, 0, 0], [1, 1, 1]], np.float32),
        segment=np.array([1, 1], np.int32),
        classification=np.array([1, 2], np.int32),
    )
    p = tmp_path / "sess.ipc"
    s.save(str(p))
    assert p.read_bytes()[:2] != b"PK"  # bincode, not npz
    s2 = Session.open(str(p))
    assert int(np.asarray(s2.cloud.valid).sum()) == 2


@pytest.mark.parametrize("mangle", [
    lambda b: b[:-1],                                   # truncated tail
    lambda b: b[:20],                                   # truncated mid-seg
    lambda b: b + b"\x00",                              # trailing bytes
    lambda b: b[:8 + 4 + 8 + 24 + 8] + b"\x09\x00\x00\x00" + b[8 + 4 + 8 + 24 + 12:],  # class variant 9
    lambda b: struct.pack("<Q", 1 << 60) + b[8:],       # absurd map len
])
def test_corrupt_streams_raise(mangle):
    with pytest.raises(CorruptFile):
        ipc.read_reference_ipc(mangle(golden_stream()))


def test_classification_count_mismatch():
    # hand-build a segment whose classifications vec disagrees with points
    bad = struct.pack("<Q", 0)  # no live segments
    bad += struct.pack("<Q", 1) + np.zeros(3, "<f4").tobytes()
    bad += struct.pack("<Q", 2) + np.zeros(2, "<u4").tobytes()
    bad += struct.pack("<4f", 0, 0, 0, 0) + np.zeros(6, "<f4").tobytes()
    bad += b"\x00" + struct.pack("<3d", 0, 0, 0) + struct.pack("<Q", 0)
    with pytest.raises(CorruptFile):
        ipc.read_reference_ipc(bad)


def test_empty_reference_session():
    """Zero live segments, empty deleted bucket — parse must not choke."""
    blob = struct.pack("<Q", 0)
    blob += seg_bytes(np.zeros((0, 3), np.float32), [])
    blob += struct.pack("<3d", 1.0, 2.0, 3.0)
    blob += struct.pack("<Q", 0)
    arrays, off, loc = ipc.read_reference_ipc(blob)
    assert len(arrays["pos"]) == 0 and loc == ""
    np.testing.assert_allclose(off, [1.0, 2.0, 3.0])


def test_session_save_ipc_pathlib(tmp_path):
    """A pathlib.Path ending .ipc must dispatch to the bincode writer too
    (a str-only check silently wrote npz bytes into the .ipc)."""
    from treee_tpu.cloud import PointCloud
    from treee_tpu.pipeline import Session

    s = Session()
    s.cloud = PointCloud.from_numpy(
        np.array([[0, 0, 0], [2, 2, 2]], np.float32),
        segment=np.array([1, 1], np.int32),
        classification=np.array([1, 2], np.int32),
    )
    p = tmp_path / "p.ipc"  # pathlib.Path, not str
    s.save(p)
    assert p.read_bytes()[:2] != b"PK"
    got, _, _ = ipc.load(str(p))
    assert len(got["pos"]) == 2
