"""Interactive edit transitions + session checkpoint tests
(interactive/mod.rs capability surface)."""

import io

import pytest

import numpy as np
import jax.numpy as jnp

from treee_tpu import interactive as edit
from treee_tpu.cloud import (
    CLASS_CROWN, CLASS_GROUND, CLASS_TRUNK, DELETED_SEGMENT, PointCloud,
)
from treee_tpu.io import ipc


def _cloud():
    rng = np.random.default_rng(0)
    pos = rng.uniform(-5, 5, (1000, 3)).astype(np.float32)
    seg = np.where(pos[:, 0] < 0, 1, 2).astype(np.int32)
    return PointCloud.from_numpy(pos, capacity=1024, segment=seg)


def test_delete_sphere_moves_to_deleted():
    pc = _cloud()
    center = jnp.zeros(3)
    out = edit.remove_points(pc, center, 2.0, DELETED_SEGMENT)
    pos = np.asarray(pc.pos)
    inside = (np.linalg.norm(pos, axis=1) <= 2.0) & np.asarray(pc.valid)
    seg = np.asarray(out.segment)
    assert (seg[inside] == DELETED_SEGMENT).all()
    outside = ~inside & np.asarray(pc.valid)
    np.testing.assert_array_equal(seg[outside], np.asarray(pc.segment)[outside])
    # capacity/positions untouched — edits never reshape
    assert out.capacity == pc.capacity
    np.testing.assert_array_equal(np.asarray(out.pos), pos)


def test_draw_does_not_steal_deleted_unless_restored():
    pc = _cloud()
    center = jnp.zeros(3)
    pc = edit.remove_points(pc, center, 1.0, DELETED_SEGMENT)
    # draw into segment 2 with a bigger brush: deleted core must stay deleted
    out = edit.remove_points(pc, center, 2.0, 2)
    pos = np.asarray(pc.pos)
    core = (np.linalg.norm(pos, axis=1) <= 1.0) & np.asarray(pc.valid)
    assert (np.asarray(out.segment)[core] == DELETED_SEGMENT).all()
    # restore_deleted pulls them back (show_deleted mode, mod.rs:866-869)
    out2 = edit.restore_deleted(out, center, 2.0, 2)
    assert (np.asarray(out2.segment)[core] == 2).all()


def test_change_classification_scoped_to_segment():
    pc = _cloud()
    out = edit.change_classification(pc, jnp.zeros(3), 3.0, CLASS_CROWN, 1)
    pos = np.asarray(pc.pos)
    inside = (np.linalg.norm(pos, axis=1) <= 3.0) & np.asarray(pc.valid)
    seg = np.asarray(pc.segment)
    cls = np.asarray(out.classification)
    assert (cls[inside & (seg == 1)] == CLASS_CROWN).all()
    assert (cls[inside & (seg == 2)] == CLASS_GROUND).all()  # untouched


def test_combine():
    pc = _cloud()
    out = edit.combine_segments(pc, 1, 2)
    seg = np.asarray(out.segment)[np.asarray(pc.valid)]
    assert set(np.unique(seg)) == {2}


def test_spawn_skips_deleted():
    pc = _cloud()
    pc = edit.remove_points(pc, jnp.zeros(3), 1.0, DELETED_SEGMENT)
    out = edit.spawn_segment(pc, jnp.zeros(3), 3.0, 99)
    pos = np.asarray(pc.pos)
    r = np.linalg.norm(pos, axis=1)
    valid = np.asarray(pc.valid)
    seg = np.asarray(out.segment)
    assert (seg[(r <= 1.0) & valid] == DELETED_SEGMENT).all()
    ring = (r > 1.0) & (r <= 3.0) & valid
    assert (seg[ring] == 99).all()


def test_pick_nearest_along_ray():
    pos = np.array([[0.0, 0.0, -5.0], [0.0, 0.0, -9.0], [3.0, 0.0, -7.0]], np.float32)
    pc = PointCloud.from_numpy(pos, capacity=8,
                               segment=np.array([7, 8, 9], np.int32))
    seg, dist, found = edit.pick(
        pc, jnp.zeros(3), jnp.array([0.0, 0.0, -1.0]), 0.5
    )
    assert bool(found)
    assert int(seg) == 7
    assert abs(float(dist) - 5.0) < 1e-5


def test_pick_miss():
    pos = np.array([[10.0, 10.0, -5.0]], np.float32)
    pc = PointCloud.from_numpy(pos, capacity=8)
    seg, dist, found = edit.pick(pc, jnp.zeros(3), jnp.array([0.0, 0.0, -1.0]), 0.5)
    assert not bool(found)
    assert int(seg) == -1


def test_pick_ignores_deleted_by_default():
    pos = np.array([[0.0, 0.0, -5.0]], np.float32)
    pc = PointCloud.from_numpy(pos, capacity=8,
                               segment=np.array([DELETED_SEGMENT], np.int32))
    _, _, found = edit.pick(pc, jnp.zeros(3), jnp.array([0.0, 0.0, -1.0]), 0.5)
    assert not bool(found)
    _, _, found2 = edit.pick(
        pc, jnp.zeros(3), jnp.array([0.0, 0.0, -1.0]), 0.5, include_deleted=True
    )
    assert bool(found2)


def test_ipc_roundtrip():
    pc = _cloud()
    buf = io.BytesIO()
    ipc.save(buf, pc, np.array([100.0, 0.0, 50.0]), "+proj=utm")
    buf.seek(0)
    arrays, offset, loc = ipc.load(buf)
    np.testing.assert_allclose(offset, [100.0, 0.0, 50.0])
    assert loc == "+proj=utm"
    ref = pc.to_numpy()
    np.testing.assert_array_equal(arrays["pos"], ref["pos"])
    np.testing.assert_array_equal(arrays["segment"], ref["segment"])


def test_ipc_merge_shifts_and_renumbers():
    a = {
        "pos": np.zeros((4, 3), np.float32),
        "segment": np.array([1, 1, 2, 2], np.int32),
        "classification": np.zeros(4, np.int32),
    }
    b = {
        "pos": np.ones((2, 3), np.float32),
        "segment": np.array([2, 3], np.int32),
        "classification": np.zeros(2, np.int32),
    }
    merged = ipc.merge(a, np.zeros(3), b, np.array([10.0, 0.0, 0.0]))
    assert merged["pos"].shape == (6, 3)
    # shifted by the offset difference
    np.testing.assert_allclose(merged["pos"][4], [11.0, 1.0, 1.0])
    # colliding id 2 renumbered, non-colliding 3 kept
    assert merged["segment"][4] not in (0, 1, 2)
    assert merged["segment"][5] == 3


def test_lod_refresh_after_edit_reuses_cached_octree():
    """Edits flip valid/segment only, so the Morton sort is reused
    (BASELINE.md config 3: incremental octree/LOD update on edit)."""
    import numpy as np

    from treee_tpu.config import Config, SegmentationConfig
    from treee_tpu.io import las
    from treee_tpu.pipeline import Session

    cfg = Config(
        segmentation=SegmentationConfig(
            grid_size=128, max_bands=16, max_segments=256,
            max_trees_per_band=32,
        )
    )
    pts = las.synthetic_forest(n_trees=2, points_per_tree=3000,
                               ground_points=2000, seed=6)
    s = Session.from_points(pts, cfg)
    s.segment(0.75)
    s.build_lod(level=6)
    tree_before = s._tree
    before = s._lod
    assert before is not None

    center = np.asarray(pts[0], np.float32)
    s.delete_sphere(center, radius=1.5)
    # edits keep the index-compacted subset: the next frame re-reads
    # segment/valid through the cached indices (subset-sized gathers), so
    # neither the octree nor the LOD compaction is redone
    assert s._lod is before
    img = s.render(use_lod=True)  # per-frame refresh through the indices
    assert img.shape[2] == 3
    assert s._tree is tree_before  # no re-sort: positions never moved
    assert s._lod is before
    # the deleted representative is actually masked out of the LOD frame:
    # deleting everything leaves only background
    c = (pts.min(0) + pts.max(0)) / 2.0
    s.delete_sphere(c, radius=float(np.abs(pts - c).max()) * 2.0)
    img2 = s.render(use_lod=True)
    bg = np.clip(
        np.asarray(s.config.render.background, np.float32) * 255.0 + 0.5,
        0, 255,
    ).astype(np.uint8)
    assert (img2 == bg[None, None, :]).all()

    # position-changing merge invalidates the octree too
    import tempfile, os
    with tempfile.TemporaryDirectory() as d:
        p = os.path.join(d, "a.npz")
        s.save(p)
        s.add_session(p)
    assert getattr(s, "_tree", None) is None


def test_save_single_segment(tmp_path):
    """'save PATH SEG' exports one segment as a reloadable checkpoint (the
    focused view's Segment .ipc button, mod.rs:655-668)."""
    import numpy as np

    from treee_tpu.config import Config, SegmentationConfig
    from treee_tpu.io import las
    from treee_tpu.pipeline import Session

    cfg = Config(
        segmentation=SegmentationConfig(
            grid_size=128, max_bands=16, max_segments=256,
            max_trees_per_band=32,
        )
    )
    pts = las.synthetic_forest(n_trees=2, points_per_tree=3000,
                               ground_points=2000, seed=8)
    s = Session.from_points(pts, cfg)
    s.segment(0.75)
    seg = np.asarray(s.cloud.segment)
    sid = int(np.bincount(seg[seg > 0]).argmax())
    n_member = int((seg == sid).sum())

    path = str(tmp_path / "one.npz")
    s.save(path, segment_id=sid)
    s2 = Session.open(path, cfg)
    seg2 = np.asarray(s2.cloud.segment)[np.asarray(s2.cloud.valid)]
    assert len(seg2) == n_member
    assert (seg2 == sid).all()


def test_checkpoint_corruption_fuzz_clean_errors():
    """Bit flips and truncations of a .npz checkpoint raise CorruptFile (or
    ValueError), never raw zipfile/zlib/numpy internals."""
    import io

    from treee_tpu.io import ipc
    from treee_tpu.utils.errors import CorruptFile

    pc = PointCloud.from_numpy(
        np.random.default_rng(0).uniform(0, 5, (1000, 3)).astype(np.float32))
    buf = io.BytesIO()
    ipc.save(buf, pc, np.zeros(3), "src")
    data = buf.getvalue()
    n = len(data)
    rng = np.random.default_rng(11)

    from treee_tpu.utils.errors import UnsupportedFormat

    # byte 0 (zip magic) flip: np.load falls through to its pickle path and
    # raises a plain ValueError — must surface as CorruptFile, not leak
    b0 = bytearray(data)
    b0[0] ^= 0xFF
    try:
        ipc.load(io.BytesIO(bytes(b0)))
        raise AssertionError("corrupted zip magic loaded successfully")
    except CorruptFile:
        pass

    for off in [int(rng.integers(0, n)) for _ in range(120)]:
        b = bytearray(data)
        b[off] ^= 1 << int(rng.integers(0, 8))
        try:
            ipc.load(io.BytesIO(bytes(b)))
        except (CorruptFile, UnsupportedFormat):
            pass  # ONLY taxonomy errors may escape (or a clean load)
    for _ in range(30):
        cut = int(rng.integers(1, n))
        try:
            ipc.load(io.BytesIO(data[:cut]))
        except (CorruptFile, UnsupportedFormat):
            pass


def test_corrupt_npz_named_checkpoint_error_names_npz(tmp_path):
    """A truncated/corrupt file NAMED .npz must fail through the zip/npz
    error taxonomy ("bad session checkpoint"), not be mistaken for a
    reference bincode .ipc (advisor r3: the zip-magic dispatch alone sent
    any corrupt .npz down the bincode parser)."""
    from treee_tpu.utils.errors import CorruptFile

    p = tmp_path / "broken.npz"
    p.write_bytes(b"\x00\x01garbage-that-is-not-zip-framed" * 3)
    with pytest.raises(CorruptFile, match="bad session checkpoint"):
        ipc.load(str(p))
    # same for a seekable buffer carrying a .npz name
    buf = io.BytesIO(p.read_bytes())
    buf.name = str(p)
    with pytest.raises(CorruptFile, match="bad session checkpoint"):
        ipc.load(buf)
