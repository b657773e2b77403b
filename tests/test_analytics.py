"""Golden tests for trunk axis, radial bounding volumes, traits, 3-D hull,
and the camera model."""

import dataclasses
import math

import numpy as np
import jax.numpy as jnp

from treee_tpu import hull3d, rbv, trunk_axis
from treee_tpu.render.camera import Camera


def _cylinder(n=5000, radius=0.3, height=6.0, lean=0.0, seed=0):
    """Points on a (possibly leaning) vertical cylinder shell."""
    rng = np.random.default_rng(seed)
    th = rng.uniform(0, 2 * np.pi, n)
    y = rng.uniform(0, height, n)
    x = radius * np.cos(th) + lean * y
    z = radius * np.sin(th)
    return np.stack([x, y, z], -1).astype(np.float32)


def test_trunk_axis_vertical():
    pts = _cylinder()
    ax = trunk_axis.average_direction(jnp.asarray(pts), jnp.ones(len(pts), bool))
    assert bool(ax.found)
    d = np.asarray(ax.direction)
    assert d[1] > 0.99
    assert abs(np.asarray(ax.origin)[0]) < 0.15


def test_trunk_axis_leaning():
    pts = _cylinder(lean=0.3)  # leans 0.3 in x per unit y
    ax = trunk_axis.average_direction(jnp.asarray(pts), jnp.ones(len(pts), bool))
    d = np.asarray(ax.direction)
    expected = np.array([0.3, 1.0, 0.0])
    expected /= np.linalg.norm(expected)
    assert np.dot(d, expected) > 0.98


def test_trunk_axis_low_high_matches():
    pts = _cylinder(lean=0.2)
    a = trunk_axis.low_high_layer(jnp.asarray(pts), jnp.ones(len(pts), bool), 1.0)
    d = np.asarray(a.direction)
    expected = np.array([0.2, 1.0, 0.0]); expected /= np.linalg.norm(expected)
    assert np.dot(d, expected) > 0.97


def test_trunk_axis_empty():
    ax = trunk_axis.average_direction(jnp.zeros((10, 3)), jnp.zeros(10, bool))
    assert not bool(ax.found)
    np.testing.assert_allclose(np.asarray(ax.direction), [0, 1, 0])


def test_axis_transform_maps_y_to_direction():
    pts = _cylinder(lean=0.3)
    ax = trunk_axis.average_direction(jnp.asarray(pts), jnp.ones(len(pts), bool))
    m = np.asarray(trunk_axis.axis_transform(ax))
    np.testing.assert_allclose(m[:3, 1], np.asarray(ax.direction), atol=1e-5)
    # orthonormal rotation block
    r = m[:3, :3]
    np.testing.assert_allclose(r.T @ r, np.eye(3), atol=1e-5)


def test_rbv_cylinder_distances():
    pts = _cylinder(radius=1.5, height=4.0)
    v = rbv.build_rbv(jnp.asarray(pts), jnp.ones(len(pts), bool),
                      slices=4, sectors=8, method=rbv.METHOD_MAX)
    d = np.asarray(v.distances)
    # every sector of every slice sees the shell at ~1.5 from the center
    assert np.all(np.abs(d - 1.5) < 0.3)
    assert abs(float(v.slice_height) - 1.0) < 0.01


def test_rbv_mean_leq_max():
    pts = _cylinder(radius=1.0) + np.random.default_rng(1).normal(
        0, 0.2, (5000, 3)).astype(np.float32)
    m = jnp.ones(len(pts), bool)
    dmax = np.asarray(rbv.build_rbv(jnp.asarray(pts), m, 4, 8, rbv.METHOD_MAX).distances)
    dmean = np.asarray(rbv.build_rbv(jnp.asarray(pts), m, 4, 8, rbv.METHOD_MEAN).distances)
    assert np.all(dmean <= dmax + 1e-5)


def test_rbv_symmetric():
    pts = _cylinder(radius=1.0)
    pts[:, 0] += 0.5 * (pts[:, 1] > 3.0)  # asymmetric bulge
    v = rbv.build_rbv(jnp.asarray(pts), jnp.ones(len(pts), bool),
                      slices=2, sectors=8, symmetric=True)
    d = np.asarray(v.distances).reshape(2, 8)
    np.testing.assert_allclose(d[:, :4], d[:, 4:], atol=1e-6)


def test_traits_known_cylinder_tree():
    # trunk: radius .25 cylinder 0..4; crown: radius 2 cylinder 4..10
    trunk_pts = _cylinder(radius=0.25, height=4.0, seed=2)
    crown_pts = _cylinder(radius=2.0, height=6.0, seed=3)
    crown_pts[:, 1] += 4.0
    pos = np.concatenate([trunk_pts, crown_pts])
    cls = np.concatenate([
        np.full(len(trunk_pts), 1, np.int32),   # trunk
        np.full(len(crown_pts), 2, np.int32),   # crown
    ])
    crown, trunk = rbv.split_rbv(
        jnp.asarray(pos), jnp.asarray(cls), jnp.ones(len(pos), bool)
    )
    t = rbv.traits(crown, trunk)
    assert abs(float(t.diameter_breast_height) - 0.5) < 0.05
    assert abs(float(t.crown_diameter) - 4.0) < 0.2
    # crown volume ~ pi * r^2 * h = pi*4*6 ~ 75
    assert abs(float(t.crown_volume) - 75.4) / 75.4 < 0.15
    # stem volume: cross area * (trunk_h + (height-trunk_h)/3)
    cross = math.pi * 0.25**2
    expected_stem = cross * (4.0 + 6.0 / 3.0)
    assert abs(float(t.stem_volume) - expected_stem) / expected_stem < 0.25


def _forest_arrays(seed=5):
    """Three trees (trunk+crown cylinders, distinct leans/offsets) with a
    segment-id gap: pos f32[N,3], cls i32[N], segment i32[N], S."""
    rng = np.random.default_rng(seed)
    pos, cls, seg = [], [], []
    for sid, (ox, oz, lean) in zip((1, 2, 4), ((0, 0, 0.0), (12, 3, 0.25),
                                               (-8, 9, -0.15))):
        trunk = _cylinder(n=1200, radius=0.25, height=4.0, lean=lean,
                          seed=seed + sid)
        crown = _cylinder(n=2400, radius=2.0, height=5.0, lean=lean,
                          seed=seed + sid + 10)
        crown[:, 1] += 4.0
        ground = np.stack([rng.uniform(-3, 3, 300), rng.uniform(0, 0.2, 300),
                           rng.uniform(-3, 3, 300)], -1).astype(np.float32)
        for p, c in ((trunk, 1), (crown, 2), (ground, 0)):
            p = p + np.array([ox, 0.0, oz], np.float32)
            pos.append(p)
            cls.append(np.full(len(p), c, np.int32))
            seg.append(np.full(len(p), sid, np.int32))
    return (np.concatenate(pos), np.concatenate(cls), np.concatenate(seg), 6)


def test_batched_trunk_axis_matches_loop():
    """batched_average_direction / batched_low_high_layer row i ==
    the focused-segment algorithms on segment i (empty rows: found=False)."""
    pos, cls, seg, S = _forest_arrays()
    posj, clsj, segj = jnp.asarray(pos), jnp.asarray(cls), jnp.asarray(seg)
    trunk_mask = clsj == 1

    for batched, single, kw in (
        (trunk_axis.batched_average_direction, trunk_axis.average_direction, {}),
        (trunk_axis.batched_low_high_layer, trunk_axis.low_high_layer, {}),
    ):
        axes = batched(posj, trunk_mask, segj, S, **kw)
        for sid in range(S):
            ref = single(posj, trunk_mask & (segj == sid), **kw)
            assert bool(axes.found[sid]) == bool(ref.found)
            np.testing.assert_allclose(
                np.asarray(axes.origin[sid]), np.asarray(ref.origin),
                atol=1e-4)
            np.testing.assert_allclose(
                np.asarray(axes.direction[sid]), np.asarray(ref.direction),
                atol=1e-4)


def test_batched_split_rbv_and_traits_match_loop():
    """batched_split_rbv + batched_traits == per-segment split_rbv/traits
    through each segment's own axis frame, for max AND mean/symmetric."""
    pos, cls, seg, S = _forest_arrays()
    posj, clsj, segj = jnp.asarray(pos), jnp.asarray(cls), jnp.asarray(seg)
    valid = jnp.ones(len(pos), bool)

    axes = trunk_axis.batched_average_direction(posj, clsj == 1, segj, S)
    tfs = trunk_axis.batched_axis_transform(axes)

    for method, symmetric in ((rbv.METHOD_MAX, False), (rbv.METHOD_MEAN, True)):
        crown_b, trunk_b = rbv.batched_split_rbv(
            posj, clsj, valid, segj, S, tfs,
            crown_slices=6, crown_sectors=8, trunk_slices=4, trunk_sectors=8,
            method=method, symmetric=symmetric)
        tr_b = rbv.batched_traits(crown_b, trunk_b)
        for sid in (1, 2, 4):
            member = segj == sid
            ref_axis = trunk_axis.average_direction(
                posj, member & (clsj == 1))
            crown_r, trunk_r = rbv.split_rbv(
                posj, clsj, member,
                transform=trunk_axis.axis_transform(ref_axis),
                crown_slices=6, crown_sectors=8,
                trunk_slices=4, trunk_sectors=8,
                method=method, symmetric=symmetric)
            np.testing.assert_allclose(
                np.asarray(crown_b.distances[sid]),
                np.asarray(crown_r.distances), atol=2e-4)
            np.testing.assert_allclose(
                np.asarray(trunk_b.distances[sid]),
                np.asarray(trunk_r.distances), atol=2e-4)
            np.testing.assert_allclose(
                float(crown_b.min_y[sid]), float(crown_r.min_y), atol=1e-4)
            np.testing.assert_allclose(
                float(crown_b.slice_height[sid]), float(crown_r.slice_height),
                atol=1e-5)
            tr_r = rbv.traits(crown_r, trunk_r)
            for f in ("diameter_breast_height", "trunk_cross_area",
                      "crown_diameter", "crown_projected_area",
                      "crown_volume", "crown_surface", "stem_volume",
                      "wood_volume"):
                np.testing.assert_allclose(
                    float(getattr(tr_b, f)[sid]), float(getattr(tr_r, f)),
                    rtol=2e-3, atol=1e-5)


def test_session_inventory_end_to_end(tmp_path):
    """Session.inventory over a segmented synthetic forest: one row per
    tree, counts add up, DBH positive where a trunk axis was found; the CSV
    export round-trips the row count."""
    from treee_tpu.config import Config, SegmentationConfig
    from treee_tpu.io import exports, las
    from treee_tpu.pipeline import Session

    cfg = Config(segmentation=SegmentationConfig(
        grid_size=128, max_bands=16, max_segments=64, max_trees_per_band=16))
    pts = las.synthetic_forest(n_trees=5, points_per_tree=3000,
                               ground_points=3000, seed=11)
    s = Session.from_points(pts, cfg)
    s.segment(0.75)
    inv = s.inventory()

    n = len(inv["segment"])
    assert n >= 1
    for col in inv.values():
        assert len(col) == n
    np.testing.assert_array_equal(
        inv["n_points"], inv["n_ground"] + inv["n_trunk"] + inv["n_crown"])
    live = int(np.asarray(
        s.cloud.valid & (s.cloud.segment != 0)).sum())
    assert int(inv["n_points"].sum()) == live
    has_axis = inv["axis_found"] & (inv["n_trunk"] > 0)
    assert has_axis.any()
    assert (inv["diameter_breast_height"][has_axis] > 0).all()
    assert (inv["tree_height"][has_axis] > 0).all()

    out = tmp_path / "inv.csv"
    with open(out, "w") as fh:
        rows = exports.save_inventory_csv(fh, inv)
    lines = out.read_text().strip().splitlines()
    assert rows == n and len(lines) == n + 1
    assert lines[0].startswith("segment,n_points,")

    # forest-level aggregates ride the same inventory
    summ = s.forest_summary(inventory=inv)
    assert summ["n_trees"] == int((inv["n_trunk"] > 0).sum()) > 0
    assert summ["stems_per_ha"] > 0 and summ["area_ha"] > 0
    assert 0.0 <= summ["canopy_cover"] <= 1.0
    # QMD >= arithmetic mean DBH (Jensen), equal only for uniform stands
    assert summ["quadratic_mean_dbh"] >= summ["mean_dbh"] - 1e-9
    assert summ["basal_area_per_ha"] > 0
    assert summ["max_height"] >= summ["mean_height"] > 0

    # the REPL surfaces it as one command
    import io as _io
    import json as _json

    from treee_tpu.repl import Repl

    r = Repl(s, out=_io.StringIO())
    assert r.handle("summary") is True
    printed = _json.loads(r.out.getvalue())
    assert printed["n_trees"] == summ["n_trees"]

    # membership edits surface in the NEXT inventory (full_table recomputes
    # when counts are stale): a spawned segment gets its own row
    top = np.asarray(s.cloud.pos)[np.asarray(s.cloud.valid)]
    center = top[np.argmax(top[:, 1])]
    nid = s.spawn(center, radius=1.5)
    inv2 = s.inventory()
    assert nid in inv2["segment"]


def test_inventory_degenerate_sessions():
    """Inventory/summary edge cases: an unsegmented all-ground session
    yields a trunkless row and a zero-tree summary; a fully deleted cloud
    yields an empty table, a header-only CSV, and zeroed aggregates."""
    import io as _io

    from treee_tpu.config import Config, SegmentationConfig
    from treee_tpu.io import exports
    from treee_tpu.pipeline import Session

    cfg = Config(segmentation=SegmentationConfig(
        grid_size=64, max_bands=8, max_segments=32, max_trees_per_band=8))
    rng = np.random.default_rng(21)
    pts = np.stack([rng.uniform(-5, 5, 2000), rng.uniform(0, 0.3, 2000),
                    rng.uniform(-5, 5, 2000)], -1).astype(np.float32)
    s = Session.from_points(pts, cfg)  # default: one segment, all ground

    inv = s.inventory()
    assert len(inv["segment"]) == 1
    assert inv["n_trunk"][0] == 0 and not inv["axis_found"][0]
    summ = s.forest_summary(inventory=inv)
    assert summ["n_trees"] == 0 and summ["mean_dbh"] == 0.0
    assert summ["stems_per_ha"] == 0.0

    s.delete_sphere([0.0, 0.0, 0.0], radius=1e6)  # wipe the cloud
    inv2 = s.inventory()
    assert len(inv2["segment"]) == 0
    buf = _io.StringIO()
    assert exports.save_inventory_csv(buf, inv2) == 0
    assert buf.getvalue().startswith("segment,")
    summ2 = s.forest_summary(inventory=inv2)
    assert summ2["n_trees"] == 0 and summ2["canopy_cover"] == 0.0


def test_hull_sphere_area_volume():
    rng = np.random.default_rng(4)
    u = rng.normal(size=(20000, 3))
    u /= np.linalg.norm(u, axis=1, keepdims=True)
    pts = (u * 2.0).astype(np.float32)
    h = hull3d.convex_hull(pts, np.ones(len(pts), bool), k_dirs=256)
    assert h is not None
    assert abs(h.area - 4 * math.pi * 4) / (4 * math.pi * 4) < 0.05
    assert abs(h.volume - 4 / 3 * math.pi * 8) / (4 / 3 * math.pi * 8) < 0.08
    e = hull3d.hull_edges(h.faces)
    # Euler: V - E + F = 2 for a closed triangulated surface
    assert len(h.vertices) - len(e) + len(h.faces) == 2


def test_hull_reduction_matches_exact():
    rng = np.random.default_rng(5)
    pts = rng.normal(size=(5000, 3)).astype(np.float32)
    m = np.ones(len(pts), bool)
    approx = hull3d.convex_hull(pts, m, k_dirs=512)
    exact = hull3d.convex_hull(pts, m, exact=True)
    assert abs(approx.volume - exact.volume) / exact.volume < 0.02


class _CountingNp:
    """numpy proxy that counts bytes materialized from device arrays via
    np.asarray — catches any stray full-cloud pull inside a module."""

    def __init__(self, real):
        self._real = real
        self.bytes = 0

    def asarray(self, x, *a, **k):
        import jax

        r = self._real.asarray(x, *a, **k)
        if isinstance(x, jax.Array) and not isinstance(x, self._real.ndarray):
            self.bytes += r.nbytes
        return r

    def __getattr__(self, name):
        return getattr(self._real, name)


def test_hull_device_inputs_fetch_o_candidates(monkeypatch):
    """Round-5 VERDICT task 3: convex_hull on DEVICE arrays must move
    O(candidates) bytes host-ward, never the full cloud (display hull used
    to pull all N rows per overlay frame — ~180 MB at 15M)."""
    import jax.numpy as jnp

    from treee_tpu.utils import transfer

    rng = np.random.default_rng(7)
    n = 1_000_000
    pts = rng.normal(size=(n, 3)).astype(np.float32)
    mask = np.ones(n, bool)
    ref = hull3d.convex_hull(pts, mask, k_dirs=256)

    pos_dev = jnp.asarray(pts)
    mask_dev = jnp.asarray(mask)
    proxy = _CountingNp(np)
    monkeypatch.setattr(hull3d, "np", proxy)
    transfer.fetched_bytes = 0
    got = hull3d.convex_hull(pos_dev, mask_dev, k_dirs=256)
    moved = proxy.bytes + transfer.fetched_bytes
    # budget: 256 support indices (1 KB) + <=256 candidate rows (3 KB) +
    # scalars; the full cloud is 12 MB — two orders of magnitude of margin
    assert moved < 64 * 1024, f"hull moved {moved} bytes host-ward"
    assert got is not None
    assert abs(got.volume - ref.volume) / ref.volume < 1e-6
    assert abs(got.area - ref.area) / ref.area < 1e-6


def test_render_focus_hull_stays_on_device(monkeypatch):
    """The display-hull call site hands DEVICE arrays to convex_hull (no
    np.asarray(full cloud) at the boundary)."""
    import jax

    from treee_tpu.pipeline import Session

    rng = np.random.default_rng(8)
    pts = rng.normal(size=(20_000, 3)).astype(np.float32) * 3.0
    s = Session.from_points(pts)
    seg = np.ones(s.cloud.capacity, np.int32)
    s.cloud = dataclasses.replace(
        s.cloud, segment=jnp.asarray(seg),
        classification=jnp.full(s.cloud.capacity, 2, jnp.int32))

    seen = {}
    real = hull3d.convex_hull

    def spy(pos, mask, *a, **k):
        seen["pos_is_device"] = isinstance(pos, jax.Array) and \
            not isinstance(pos, np.ndarray)
        seen["mask_is_device"] = isinstance(mask, jax.Array) and \
            not isinstance(mask, np.ndarray)
        return real(pos, mask, *a, **k)

    import treee_tpu.hull3d as hull_mod
    monkeypatch.setattr(hull_mod, "convex_hull", spy)
    img = s.render_focus(1, show_hull=True, hull_include="all")
    assert img.shape[2] == 3
    assert seen.get("pos_is_device") and seen.get("mask_is_device")


def test_camera_ray_through_center():
    cam = Camera.orbital(distance=10.0)
    d = np.asarray(cam.ray_direction(64.0, 48.0, 128, 96))
    np.testing.assert_allclose(d, [0, 0, -1], atol=1e-6)


def test_camera_orbit_preserves_pivot_distance():
    cam = Camera.orbital(distance=10.0)
    c2 = cam.rotate_orbital(300.0, 150.0)
    # pivot is at origin; distance from camera to origin stays ~10
    assert abs(np.linalg.norm(np.asarray(c2.position)) - 10.0) < 1e-3


def test_camera_zoom():
    cam = Camera.orbital(distance=10.0)
    c2 = cam.scroll_orbital(-1.0)  # zoom in
    assert float(c2.offset) < 10.0
    assert np.linalg.norm(np.asarray(c2.position)) < 10.0


def test_view_projection_roundtrip():
    cam = Camera.orbital(distance=5.0).rotate_orbital(123.0, 45.0)
    v = np.asarray(cam.view_matrix())
    t = np.asarray(cam.transform)
    np.testing.assert_allclose(v @ t, np.eye(4), atol=1e-5)


def test_sorted_rbv_scan_and_gather_branches_equal():
    """_batched_split_rbv_sorted's two fill branches — per-point gathers
    (CPU default) vs the Pallas segmented-scan fills (TPU; interpret mode
    here) — are exact value copies and must agree bit-for-bit, as must the
    scan-vs-scatter y extents."""
    pos, cls, seg, S = _forest_arrays(seed=9)
    posj, clsj, segj = jnp.asarray(pos), jnp.asarray(cls), jnp.asarray(seg)
    valid = jnp.ones(len(pos), bool)
    axes = trunk_axis.batched_average_direction(posj, clsj == 1, segj, S)
    tfs = trunk_axis.batched_axis_transform(axes)

    crown_g, trunk_g = rbv._batched_split_rbv_sorted(
        posj, clsj, valid, segj, S, tfs, 6, 8, 4, 8, False, None,
        interpret=False)   # gather/scatter branch on CPU
    crown_s, trunk_s = rbv._batched_split_rbv_sorted(
        posj, clsj, valid, segj, S, tfs, 6, 8, 4, 8, False, None,
        interpret=True)    # Pallas-scan branch, interpreted
    for a, b in ((crown_g, crown_s), (trunk_g, trunk_s)):
        np.testing.assert_array_equal(np.asarray(a.distances),
                                      np.asarray(b.distances))
        np.testing.assert_array_equal(np.asarray(a.min_y), np.asarray(b.min_y))
        np.testing.assert_array_equal(np.asarray(a.slice_height),
                                      np.asarray(b.slice_height))


def test_sorted_average_direction_matches_scatter():
    """_batched_average_direction_sorted (Pallas scans, interpret mode) vs
    the scatter formulation: min/max/fills exact, sums to float tolerance,
    shared [S]-tail — axes must agree tightly."""
    pos, cls, seg, S = _forest_arrays(seed=13)
    posj, clsj, segj = jnp.asarray(pos), jnp.asarray(cls), jnp.asarray(seg)
    mask = clsj == 1

    ref = trunk_axis.batched_average_direction(posj, mask, segj, S)
    got = trunk_axis._batched_average_direction_sorted(
        posj, mask, segj, S, 10, None, interpret=True)
    np.testing.assert_array_equal(np.asarray(ref.found),
                                  np.asarray(got.found))
    np.testing.assert_allclose(np.asarray(got.origin),
                               np.asarray(ref.origin), rtol=1e-4, atol=1e-4)
    np.testing.assert_allclose(np.asarray(got.direction),
                               np.asarray(ref.direction), rtol=1e-4,
                               atol=1e-4)


def test_scatter_inventory_env_fallback(monkeypatch):
    """TREEE_SCATTER_INVENTORY=1 routes batched_split_rbv through the
    scatter formulation on any backend — the runtime escape hatch for a
    pod where the Pallas-in-shard_map lowering misbehaves (advisor r3) —
    with results matching the sorted fast path."""
    from treee_tpu import config as config_mod

    pos, cls, seg, S = _forest_arrays(seed=7)
    posj, clsj, segj = jnp.asarray(pos), jnp.asarray(cls), jnp.asarray(seg)
    valid = jnp.ones(len(pos), bool)
    axes = trunk_axis.batched_average_direction(posj, clsj == 1, segj, S)
    tfs = trunk_axis.batched_axis_transform(axes)
    kw = dict(crown_slices=6, crown_sectors=8, trunk_slices=4,
              trunk_sectors=8, method=rbv.METHOD_MAX, symmetric=False)

    crown_fast, trunk_fast = rbv.batched_split_rbv(
        posj, clsj, valid, segj, S, tfs, **kw)

    monkeypatch.setenv("TREEE_SCATTER_INVENTORY", "1")
    assert config_mod.scatter_inventory_forced()
    assert not config_mod.use_sorted_inventory()
    # the flag is read at trace time; drop the cached trace so it takes
    rbv.batched_split_rbv.clear_cache()
    try:
        crown_sc, trunk_sc = rbv.batched_split_rbv(
            posj, clsj, valid, segj, S, tfs, **kw)
        for a, b in ((crown_fast, crown_sc), (trunk_fast, trunk_sc)):
            np.testing.assert_allclose(np.asarray(a.distances),
                                       np.asarray(b.distances), atol=2e-4)
            np.testing.assert_allclose(np.asarray(a.min_y),
                                       np.asarray(b.min_y), atol=1e-4)
    finally:
        monkeypatch.delenv("TREEE_SCATTER_INVENTORY")
        rbv.batched_split_rbv.clear_cache()
