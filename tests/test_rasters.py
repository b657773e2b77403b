"""DTM/DSM/CHM raster tests (rasters.py — a treee-tpu addition).

Oracle scenes with known analytic surfaces: a tilted ground plane plus
vertical "tree" columns, so every raster cell has a hand-computable
expected value; the jump-flood fill is checked against a nearest-seed
brute force.
"""

import io

import numpy as np

from treee_tpu import rasters
from treee_tpu.cloud import CLASS_CROWN, CLASS_GROUND
from treee_tpu.io import exports


def _plane_scene(n_side=40, cell=1.0, slope=0.05, hole=None, trees=()):
    """Ground samples at cell centers of an n x n plane y = slope*x, minus a
    rectangular ``hole`` (x0, x1, z0, z1); ``trees`` are (x, z, h) columns."""
    xs, zs = np.meshgrid(
        (np.arange(n_side) + 0.5) * cell, (np.arange(n_side) + 0.5) * cell,
        indexing="ij",
    )
    pts = np.stack([xs.ravel(), slope * xs.ravel(), zs.ravel()], axis=1)
    cls = np.full(len(pts), CLASS_GROUND, np.int32)
    if hole is not None:
        x0, x1, z0, z1 = hole
        keep = ~((pts[:, 0] >= x0) & (pts[:, 0] < x1)
                 & (pts[:, 2] >= z0) & (pts[:, 2] < z1))
        pts, cls = pts[keep], cls[keep]
    for x, z, h in trees:
        col = np.array([[x, slope * x + h, z]], np.float32)
        pts = np.concatenate([pts, col])
        cls = np.concatenate([cls, [CLASS_CROWN]])
    return pts.astype(np.float32), cls


def test_dtm_matches_plane_and_chm_tree_heights():
    pts, cls = _plane_scene(trees=[(10.5, 10.5, 7.0), (20.5, 5.5, 3.0)])
    live = np.ones(len(pts), bool)
    lo = pts.min(axis=0)
    hi = pts.max(axis=0)
    grids, (rows, cols), cell = rasters.compute_rasters(
        pts, cls, live, lo, hi, cell=1.0, cap=64
    )
    assert cell == 1.0
    dtm, chm, dsm = grids["dtm"], grids["chm"], grids["dsm"]
    assert dtm.shape == (rows, cols)
    # every covered cell's DTM is the (unique) ground sample height
    ix = np.clip(((pts[:, 0] - lo[0]) / cell).astype(int), 0, cols - 1)
    iz = np.clip(((pts[:, 2] - lo[2]) / cell).astype(int), 0, rows - 1)
    ground = cls == CLASS_GROUND
    np.testing.assert_allclose(
        dtm[iz[ground], ix[ground]], pts[ground, 1], atol=1e-5
    )
    # tree cells: CHM = column height, DSM = ground + height
    for x, z, h in [(10.5, 10.5, 7.0), (20.5, 5.5, 3.0)]:
        r, c = int((z - lo[2]) / cell), int((x - lo[0]) / cell)
        np.testing.assert_allclose(chm[r, c], h, atol=1e-5)
        np.testing.assert_allclose(dsm[r, c], 0.05 * x + h, atol=1e-5)
    # non-tree cells: CHM == 0 (ground only)
    assert (chm[0, :] == 0).all()


def test_hole_fill_takes_nearest_ground_value():
    pts, cls = _plane_scene(hole=(10.0, 16.0, 10.0, 16.0))
    # a crown point INSIDE the hole keeps those cells live (DSM exists) but
    # contributes no ground, so the DTM there must come from the fill
    pts = np.concatenate([pts, [[13.5, 9.0, 13.5]]]).astype(np.float32)
    cls = np.concatenate([cls, [CLASS_CROWN]])
    live = np.ones(len(pts), bool)
    lo, hi = pts.min(axis=0), pts.max(axis=0)
    grids, (rows, cols), cell = rasters.compute_rasters(
        pts, cls, live, lo, hi, cell=1.0, cap=64
    )
    dtm = grids["dtm"]
    assert (dtm != rasters.NODATA).all()  # fully filled
    # brute-force nearest seeded cell oracle for one interior hole cell;
    # grid cell (i, j) holds exactly the ground sample at (j+0.5, i+0.5)
    # (grid origin lo = 0.5), removed when that sample is in the hole
    r, c = 13, 13
    seeds = [(i, j) for i in range(rows) for j in range(cols)
             if not (10.0 <= j + 0.5 < 16.0 and 10.0 <= i + 0.5 < 16.0)]
    d2 = [((i - r) ** 2 + (j - c) ** 2, i, j) for i, j in seeds]
    dmin = min(d2)[0]
    # any minimum-distance seed is a correct fill (JFA breaks ties by
    # arrival order); accept the value of each tied candidate
    expects = [0.05 * (j + 0.5) for d, i, j in d2 if d == dmin]
    assert any(abs(float(dtm[r, c]) - e) < 1e-4 for e in expects), \
        (float(dtm[r, c]), expects)
    # CHM in the hole: crown height above the filled terrain, not NODATA
    assert grids["chm"][r, c] > 0


def test_no_ground_returns_all_nodata_dtm():
    pts = np.array([[1.0, 5.0, 1.0], [2.0, 6.0, 2.0]], np.float32)
    cls = np.full(2, CLASS_CROWN, np.int32)
    grids, _, _ = rasters.compute_rasters(
        pts, cls, np.ones(2, bool), pts.min(0), pts.max(0), cell=1.0, cap=16
    )
    assert (grids["dtm"] == rasters.NODATA).all()
    assert (grids["chm"] == rasters.NODATA).all()
    assert (grids["dsm"] != rasters.NODATA).any()


def test_grid_dims_cap_grows_cell():
    (rows, cols), (ph, pw), cell = rasters.grid_dims(
        np.zeros(3), np.array([1000.0, 0.0, 500.0]), cell=0.5, cap=256
    )
    assert cols <= 256 and rows <= 256
    assert cell >= 1000.0 / 255
    assert ph % 128 == 0 and pw % 128 == 0


def test_ascii_grid_writer_layout():
    grid = np.array([[1.25, 2.0], [3.0, rasters.NODATA]], np.float32)
    fh = io.StringIO()
    exports.save_ascii_grid(fh, grid, xll=10.0, yll=-20.0, cell=0.5)
    lines = fh.getvalue().strip().splitlines()
    assert lines[0].split() == ["ncols", "2"]
    assert lines[1].split() == ["nrows", "2"]
    assert float(lines[2].split()[1]) == 10.0
    assert float(lines[3].split()[1]) == -20.0
    assert float(lines[4].split()[1]) == 0.5
    assert lines[5].split() == ["NODATA_value", "-9999"]
    assert [float(v) for v in lines[6].split()] == [1.25, 2.0]
    assert [float(v) for v in lines[7].split()] == [3.0, -9999.0]


def test_session_raster_export(tmp_path):
    from treee_tpu.config import Config, SegmentationConfig
    from treee_tpu.io import las
    from treee_tpu.pipeline import Session

    cfg = Config(segmentation=SegmentationConfig(
        grid_size=64, max_bands=16, max_segments=64, max_trees_per_band=32,
        cc_iters=12,
    ))
    pts = las.synthetic_forest(n_trees=3, points_per_tree=400,
                               ground_points=800, seed=3)
    s = Session.from_points(pts, cfg)
    s.segment(0.75)
    s.characteristics()
    path = tmp_path / "chm.asc"
    rows, cols = s.export_raster(str(path), "chm", cell=2.0, cap=128)
    text = path.read_text().splitlines()
    assert text[0] == f"ncols {cols}"
    vals = np.loadtxt(text[6:])
    assert vals.shape == (rows, cols)
    live = vals[vals != rasters.NODATA]
    assert len(live) > 0 and (live >= 0).all()
    # trees exist, so some canopy cells are well above the ground
    assert live.max() > 1.0


def test_y_offset_shifts_dtm_dsm_not_chm():
    """world_offset[1] restores absolute elevations on DTM/DSM; CHM is a
    difference and NODATA cells must stay NODATA."""
    pts, cls = _plane_scene(n_side=8, trees=[(3.5, 3.5, 2.0)])
    live = np.ones(len(pts), bool)
    lo, hi = pts.min(axis=0), pts.max(axis=0)
    base, _, _ = rasters.compute_rasters(
        pts, cls, live, lo, hi, cell=1.0, cap=16
    )
    off, _, _ = rasters.compute_rasters(
        pts, cls, live, lo, hi, cell=1.0, cap=16, y_offset=100.0
    )
    for k in ("dtm", "dsm"):
        m = base[k] != rasters.NODATA
        np.testing.assert_allclose(off[k][m], base[k][m] + 100.0, atol=1e-4)
        assert (off[k][~m] == rasters.NODATA).all()
    np.testing.assert_array_equal(off["chm"], base["chm"])


def test_height_above_ground_per_point():
    """Per-point HAG: ground samples read ~0, tree columns read their height
    above the local plane (rasters.height_above_ground)."""
    import jax.numpy as jnp

    trees = [(10.5, 10.5, 7.0), (20.5, 5.5, 3.0)]
    pts, cls = _plane_scene(trees=trees)
    live = np.ones(len(pts), bool)
    lo, hi = pts.min(axis=0), pts.max(axis=0)
    (rows, cols), (ph, pw), cell = rasters.grid_dims(lo, hi, 1.0, cap=64)
    hag = np.asarray(rasters.height_above_ground(
        jnp.asarray(pts), jnp.asarray(cls), jnp.asarray(live),
        jnp.float32(lo[0]), jnp.float32(lo[2]), jnp.float32(1.0 / cell),
        (ph, pw), (rows, cols),
    ))
    ground = cls == CLASS_GROUND
    np.testing.assert_allclose(hag[ground], 0.0, atol=1e-5)
    np.testing.assert_allclose(hag[~ground], [7.0, 3.0], atol=1e-5)


def test_session_hag_display(tmp_path):
    """Session.hag_prop normalizes to [0,1]; the REPL `display hag` renders
    the whole forest by it."""
    import io as _io

    from treee_tpu.config import Config, RenderConfig
    from treee_tpu.pipeline import Session
    from treee_tpu.repl import Repl

    pts, cls = _plane_scene(trees=[(10.5, 10.5, 7.0)])
    s = Session.from_points(pts, Config(render=RenderConfig(width=96,
                                                            height=64)))
    s.cloud = s.cloud.replace(
        classification=jnp_pad_classification(s.cloud, cls))
    prop = np.asarray(s.hag_prop())
    valid = np.asarray(s.cloud.valid)
    assert prop[valid].max() == 1.0 and prop.min() >= 0.0
    # the tree top is the max; ground points sit at ~0
    assert prop[valid][cls == CLASS_GROUND].max() < 0.01

    r = Repl(s, out=_io.StringIO())
    png = str(tmp_path / "hag.png")
    assert r.handle("display hag") is True
    assert r.handle(f"render {png}") is True
    import os

    assert os.path.exists(png)

    # per-frame consumers hit the cache (the DTM chain is hundreds of ms at
    # scan scale); edits that change the live set or classes invalidate it
    assert s.hag_prop() is s.hag_prop()
    s.delete_sphere([10.5, 7.0, 10.5], radius=1.0)
    assert not s._hag_cache
    p2 = s.hag_prop()
    assert s.hag_prop() is p2
    s.reclassify_sphere([10.5, 7.0, 10.5], 1, 1, radius=1.0)
    assert not s._hag_cache


def jnp_pad_classification(cloud, cls):
    import jax.numpy as jnp

    out = np.zeros(cloud.capacity, np.int32)
    out[: len(cls)] = cls
    return jnp.asarray(out)
