"""Multi-epoch change detection (change.py): matching, deltas, CHM diff.

Unit tests drive the host-side matching on hand-built inventory tables;
the e2e test runs two pipeline epochs of the same synthetic stand (grown,
one tree removed, one added, different recenter offsets) and checks the
growth/mortality/ingrowth report plus the shared-grid CHM change raster.
"""

import numpy as np
import pytest

from treee_tpu import change


def mk_inv(positions, **overrides):
    """Minimal inventory dict: one row per (easting, northing) position."""
    positions = np.asarray(positions, np.float64).reshape(-1, 2)
    n = len(positions)
    inv = {
        "segment": np.arange(1, n + 1, dtype=np.int32),
        "easting": positions[:, 0],
        "northing": positions[:, 1],
        "n_trunk": np.full(n, 10, np.int32),
    }
    for t in change.DELTA_TRAITS:
        inv[t] = np.full(n, 1.0)
    inv.update({k: np.asarray(v) for k, v in overrides.items()})
    return inv


def test_match_mutual_nn_with_loss_and_ingrowth():
    a = mk_inv([(0, 0), (10, 0), (20, 0)])
    # first two survive (small drift), third gone; one new tree appears
    b = mk_inv([(0.5, 0.2), (10.1, -0.3), (40, 40)])
    ia, ib, lost, new = change.match_trees(a, b, max_dist=2.0)
    assert sorted(zip(ia.tolist(), ib.tolist())) == [(0, 0), (1, 1)]
    assert lost.tolist() == [2]
    assert new.tolist() == [2]


def test_match_respects_max_dist():
    a = mk_inv([(0, 0)])
    b = mk_inv([(3, 0)])
    ia, ib, lost, new = change.match_trees(a, b, max_dist=2.0)
    assert len(ia) == 0 and lost.tolist() == [0] and new.tolist() == [0]
    ia, ib, _, _ = change.match_trees(a, b, max_dist=4.0)
    assert len(ia) == 1


def test_match_is_mutual_not_greedy():
    # two b-trees near one a-tree: only the mutual pair may match, the
    # other b row must be reported as new, never double-assigned
    a = mk_inv([(0, 0)])
    b = mk_inv([(0.3, 0), (0.6, 0)])
    ia, ib, lost, new = change.match_trees(a, b, max_dist=2.0)
    assert ia.tolist() == [0] and ib.tolist() == [0]
    assert new.tolist() == [1] and len(lost) == 0


def test_match_empty_epochs():
    empty = mk_inv(np.zeros((0, 2)))
    full = mk_inv([(0, 0)])
    ia, ib, lost, new = change.match_trees(empty, full)
    assert len(ia) == 0 and len(lost) == 0 and new.tolist() == [0]
    ia, ib, lost, new = change.match_trees(full, empty)
    assert len(ia) == 0 and lost.tolist() == [0] and len(new) == 0


def test_tree_changes_deltas():
    a = mk_inv([(0, 0), (10, 0)], tree_height=np.array([10.0, 12.0]))
    b = mk_inv([(0.4, 0.3), (10, 0)], tree_height=np.array([11.5, 12.5]))
    ch = change.tree_changes(a, b, max_dist=2.0)
    m = ch["matched"]
    assert m["segment_a"].tolist() == [1, 2]
    np.testing.assert_allclose(m["delta_tree_height"], [1.5, 0.5])
    np.testing.assert_allclose(m["tree_height_a"], [10.0, 12.0])
    np.testing.assert_allclose(m["moved"], [0.5, 0.0], atol=1e-12)
    # matched table is save_inventory_csv-compatible (equal-length columns)
    n = len(m["segment_a"])
    assert all(len(v) == n for v in m.values())
    assert len(ch["lost"]["segment"]) == 0
    assert len(ch["new"]["segment"]) == 0


def test_trees_only_drops_ground_segments():
    a = mk_inv([(0, 0), (50, 50)], n_trunk=np.array([10, 0], np.int32))
    b = mk_inv([(0, 0)])
    ch = change.tree_changes(a, b, max_dist=2.0)
    # the trunkless (50, 50) row is not reported as a lost tree
    assert len(ch["matched"]["segment_a"]) == 1
    assert len(ch["lost"]["segment"]) == 0
    ch_all = change.tree_changes(a, b, max_dist=2.0, trees_only=False)
    assert ch_all["lost"]["segment"].tolist() == [2]


def test_match_prefers_stem_columns():
    # bbox centers (easting/northing) 10 m apart, stems identical: the
    # stem columns must drive the match when present
    a = mk_inv([(0, 0)], stem_easting=np.array([5.0]),
               stem_northing=np.array([5.0]))
    b = mk_inv([(10, 0)], stem_easting=np.array([5.0]),
               stem_northing=np.array([5.0]))
    ia, ib, lost, new = change.match_trees(a, b, max_dist=2.0)
    assert ia.tolist() == [0] and ib.tolist() == [0]
    m = change.tree_changes(a, b, max_dist=2.0)["matched"]
    assert m["moved"][0] == pytest.approx(0.0)


def test_stand_changes():
    a = {"n_trees": 10, "basal_area_per_ha": 20.0, "note": "x"}
    b = {"n_trees": 9, "basal_area_per_ha": 22.5, "extra": 1.0}
    d = change.stand_changes(a, b)
    assert d["n_trees"] == {"a": 10, "b": 9, "delta": -1}
    assert d["basal_area_per_ha"]["delta"] == pytest.approx(2.5)
    assert "note" not in d and "extra" not in d


# ---------------------------------------------------------------- e2e ----


def _two_epochs():
    """Epoch A: 5-tree stand.  Epoch B: same stand 15% taller, tree 0
    felled, a new tree planted at (8, 0), and the whole scan recentered
    with a different world offset (map positions unchanged)."""
    from treee_tpu.config import Config, SegmentationConfig
    from treee_tpu.io import las
    from treee_tpu.pipeline import Session

    cfg = Config(segmentation=SegmentationConfig(
        grid_size=128, max_bands=16, max_segments=64, max_trees_per_band=16))
    ppt, ground = 3000, 3000
    pts = las.synthetic_forest(n_trees=5, points_per_tree=ppt,
                               ground_points=ground, seed=11)

    grown = pts.copy()
    canopy = np.zeros(len(pts), bool)
    canopy[: 5 * ppt] = pts[: 5 * ppt, 1] > 0.3
    grown[canopy, 1] *= 1.15
    new_tree = grown[ppt: 2 * ppt] + np.array([8.0, 0.0, 8.0], np.float32)
    pts_b_map = np.concatenate([grown[ppt:], new_tree])  # tree 0 felled

    off_b = np.array([10.0, 0.0, 5.0])
    # easting = x + off_x, northing = -(z + off_z): same map points in the
    # shifted local frame
    pts_b = pts_b_map - off_b[None, :].astype(np.float32)

    sa = Session.from_points(pts, cfg)
    sa.segment(0.75)
    sb = Session.from_points(pts_b, cfg, world_offset=off_b)
    sb.segment(0.75)
    return sa, sb


@pytest.fixture(scope="module")
def epochs():
    return _two_epochs()


def test_change_detection_end_to_end(epochs):
    sa, sb = epochs
    inv_a, inv_b = sa.inventory(), sb.inventory()
    ch = change.tree_changes(inv_a, inv_b, max_dist=2.0)
    m = ch["matched"]

    # the four surviving trees match (ground segments may also pair up)
    a_trees = inv_a["segment"][inv_a["n_trunk"] > 0]
    b_trees = inv_b["segment"][inv_b["n_trunk"] > 0]
    matched_trees = (np.isin(m["segment_a"], a_trees)
                     & np.isin(m["segment_b"], b_trees))
    assert matched_trees.sum() >= 4

    # growth: every matched tree got taller, none shrank
    dh = m["delta_tree_height"][matched_trees]
    assert (dh > 0.2).all()
    # stems did not move
    assert (m["moved"][matched_trees] < 1.5).all()

    # mortality: a lost tree near the felled tree 0's map stem (~(-8, 8)
    # +-jitter: northing = -z)
    lost = ch["lost"]
    lt = lost["n_trunk"] > 0
    assert lt.any()
    d0 = np.hypot(lost["stem_easting"][lt] - (-8.0),
                  lost["stem_northing"][lt] - 8.0)
    assert d0.min() < 4.0

    # ingrowth: a new tree near the planted stem (tree 1 ~(0, 8) shifted
    # by (+8, z+8 -> northing -8): ~(8, 0))
    new = ch["new"]
    nt = new["n_trunk"] > 0
    assert nt.any()
    d1 = np.hypot(new["stem_easting"][nt] - 8.0,
                  new["stem_northing"][nt] - 0.0)
    assert d1.min() < 4.0

    # stand-level report moves the right way
    stand = change.stand_changes(sa.forest_summary(inventory=inv_a),
                                 sb.forest_summary(inventory=inv_b))
    assert stand["max_height"]["delta"] > 0


def test_chm_change_shared_grid(epochs):
    sa, sb = epochs
    diff, (xll, yll), cell = change.chm_change(sa, sb, cell=2.0)
    assert diff.ndim == 2 and cell > 0
    valid = diff != change.NODATA
    assert valid.any()
    # canopy grew 15%: the mean canopy-height change over covered cells is
    # positive, and some cell shows a clear gain
    assert float(diff[valid].mean()) > 0.0
    assert float(diff[valid].max()) > 0.5
    # the felled tree leaves a strong negative patch somewhere
    assert float(diff[valid].min()) < -1.0
    # lower-left corner is in the shared map frame: contains epoch A's
    # extent (epoch A offset is zero -> easting = x)
    from treee_tpu import segmentation as seg

    lo, _ = (np.asarray(v) for v in
             seg.scene_bounds(sa.cloud.pos, sa.cloud.alive))
    assert xll <= lo[0] + 1e-5


def test_cli_self_compare_is_null_change(tmp_path, monkeypatch, epochs):
    """app --compare of a session against itself: everything matches with
    zero delta, nothing lost or new — through the argparse surface."""
    import json

    from treee_tpu import app

    monkeypatch.setenv("TREEE_APP_CONFIG", "small")
    sa, _ = epochs
    npz = str(tmp_path / "a.npz")
    sa.save(npz)
    out = str(tmp_path / "changes.json")
    asc = str(tmp_path / "chm_change.asc")
    rc = app.main([npz, "--compare", npz,
                   "--export-changes", out,
                   "--export-chm-change", asc,
                   "--raster-cell", "2.0"])
    assert rc == 0
    rep = json.load(open(out))
    assert len(rep["lost"]) == 0 and len(rep["new"]) == 0
    # tree_changes defaults to trunk-bearing rows (ground Voronoi segments
    # are epoch-unstable and excluded from the report)
    assert len(rep["matched"]) == int((sa.inventory()["n_trunk"] > 0).sum())
    for row in rep["matched"]:
        assert row["delta_tree_height"] == pytest.approx(0.0)
        assert row["moved"] == pytest.approx(0.0)
    assert all(v["delta"] == 0 for v in rep["stand"].values())
    # self CHM diff is exactly zero everywhere it is defined
    grid = np.loadtxt(asc, skiprows=6)
    assert np.all((grid == 0.0) | (grid == change.NODATA))


def test_repl_compare_command(tmp_path, epochs):
    """REPL `compare` against the earlier epoch prints the change report."""
    import io as _io
    import json

    from treee_tpu.repl import Repl

    sa, sb = epochs
    npz = str(tmp_path / "a.npz")
    sa.save(npz)
    r = Repl(sb, out=_io.StringIO())
    assert r.handle(f"compare {npz}") is True
    rep = json.loads(r.out.getvalue())
    assert rep["matched"] >= 4
    assert rep["lost"] >= 1 and rep["new"] >= 1
    assert rep["mean_delta_height"] > 0
    assert rep["stand"]["max_height"]["delta"] > 0


def test_export_changes_requires_compare(tmp_path):
    from treee_tpu import app

    rc = app.main(["--demo", "--export-changes",
                   str(tmp_path / "x.csv"), "--no-segment"])
    assert rc == 2
