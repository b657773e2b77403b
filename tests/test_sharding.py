"""Multi-device tests on the emulated 8-device CPU mesh (SURVEY.md §4 item 4):
shard-vs-single-device equivalence for the sharded segmentation path."""

import numpy as np
import jax
import jax.numpy as jnp

from treee_tpu.config import Config, SegmentationConfig
from treee_tpu.io import las
from treee_tpu.parallel import sharding
from treee_tpu.segmentation import segment_points

CFG = Config(
    segmentation=SegmentationConfig(
        grid_size=128, max_bands=16, max_segments=128, max_trees_per_band=32,
        cc_iters=16,
    )
)


def _forest(n_pad: int):
    pts = las.synthetic_forest(n_trees=4, points_per_tree=2000, ground_points=1500, seed=7)
    n = len(pts)
    pos = np.zeros((n_pad, 3), np.float32)
    pos[:n] = pts
    valid = np.zeros(n_pad, bool)
    valid[:n] = True
    return pos, valid


def test_mesh_has_8_devices():
    assert len(jax.devices()) == 8


def test_sharded_matches_single_device():
    pos, valid = _forest(n_pad=10240)  # divisible by 8
    ref = np.asarray(
        segment_points(jnp.asarray(pos), jnp.asarray(valid), 0.75, CFG.segmentation).segment
    )

    mesh = sharding.make_mesh()
    fn = sharding.sharded_segment(mesh, CFG)
    pos_s, valid_s = sharding.shard_points(mesh, jnp.asarray(pos), jnp.asarray(valid))
    seg_sharded, n_alloc = fn(pos_s, valid_s, jnp.float32(0.75))
    seg_sharded = np.asarray(seg_sharded)

    # BIT-EXACT: the only cross-shard reduction feeding ids is the integer
    # count-grid psum (order-free); everything after runs replicated on
    # identical grids, and assignment is a local gather
    np.testing.assert_array_equal(seg_sharded, ref)


def test_sharded_1m_points_exact():
    """Multi-chip evidence at a meaningful size: 1M points over the 8-device
    mesh, exact id equality vs the single-device pipeline."""
    pts = las.synthetic_forest(n_trees=48, points_per_tree=18000,
                               ground_points=1024 * 1024 - 48 * 18000, seed=9)
    n_pad = 1 << 20
    pos = np.zeros((n_pad, 3), np.float32)
    pos[: len(pts)] = pts[:n_pad]
    valid = np.ones(n_pad, bool)

    ref = np.asarray(
        segment_points(jnp.asarray(pos), jnp.asarray(valid), 0.75,
                       CFG.segmentation).segment
    )
    mesh = sharding.make_mesh()
    fn = sharding.sharded_segment(mesh, CFG)
    pos_s, valid_s = sharding.shard_points(mesh, jnp.asarray(pos),
                                           jnp.asarray(valid))
    seg_sharded, n_alloc = fn(pos_s, valid_s, jnp.float32(0.75))
    assert int(n_alloc) > 10
    np.testing.assert_array_equal(np.asarray(seg_sharded), ref)


def test_sharded_inventory_matches_single_device():
    """sharded_inventory == the single-device batched inventory: integer
    counts and max-method distance grids compose EXACTLY (psum of ints,
    pmax of maxes); the axis directions ride float psums, so traits agree
    to float tolerance."""
    from treee_tpu import rbv as rbv_mod
    from treee_tpu import trunk_axis as ta
    from treee_tpu.pipeline import _segment_class_counts

    pos, valid = _forest(n_pad=10240)
    posj, validj = jnp.asarray(pos), jnp.asarray(valid)
    res = segment_points(posj, validj, 0.75, CFG.segmentation)
    seg = res.segment
    from treee_tpu.characteristics import compute_segments
    S = CFG.segmentation.max_segments + 1
    _, cls = compute_segments(posj, seg, validj, S, CFG.characteristics)

    # single-device reference (Session.inventory's device core)
    live = validj & (seg > 0) & (seg < S)
    axes = ta.batched_average_direction(posj, live & (cls == 1), seg, S)
    tfs = ta.batched_axis_transform(axes)
    crown, trunk = rbv_mod.batched_split_rbv(posj, cls, live, seg, S, tfs)
    tr_ref = rbv_mod.batched_traits(crown, trunk)
    counts_ref = np.asarray(_segment_class_counts(seg, cls, live, S))

    mesh = sharding.make_mesh()
    fn = sharding.sharded_inventory(mesh, CFG)
    pos_s, valid_s = sharding.shard_points(mesh, posj, validj)
    from jax.sharding import NamedSharding, PartitionSpec

    shard1 = lambda a: jax.device_put(
        a, NamedSharding(mesh, PartitionSpec("data")))
    tr_sh, counts_sh, found_sh, origin_sh = fn(pos_s, shard1(seg),
                                               shard1(cls), valid_s)

    np.testing.assert_array_equal(np.asarray(counts_sh), counts_ref)
    np.testing.assert_array_equal(np.asarray(found_sh),
                                  np.asarray(axes.found))
    np.testing.assert_allclose(np.asarray(origin_sh),
                               np.asarray(axes.origin), rtol=1e-4, atol=1e-4)
    for f in ("diameter_breast_height", "crown_volume", "stem_volume",
              "wood_volume", "crown_diameter", "crown_surface"):
        np.testing.assert_allclose(
            np.asarray(getattr(tr_sh, f)), np.asarray(getattr(tr_ref, f)),
            rtol=1e-4, atol=1e-5)


def test_morton_range_sharding_compact():
    """shard_points_morton gives each device a spatially compact range: the
    mean per-shard xz bbox area is far below the scene bbox area (a random
    file order gives every shard ~the whole scene)."""
    pos, valid = _forest(n_pad=10240)
    rng = np.random.default_rng(3)
    perm = rng.permutation(len(pos))  # scatter file order
    pos, valid = pos[perm], valid[perm]
    mesh = sharding.make_mesh()
    pos_s, valid_s, order = sharding.shard_points_morton(
        mesh, jnp.asarray(pos), jnp.asarray(valid)
    )
    assert sorted(order.tolist()) == list(range(len(pos)))

    def shard_area(p, v):
        p = p[v]
        if not len(p):
            return 0.0
        ext = p.max(0) - p.min(0)
        return float(ext[0] * ext[2])

    pos_np = np.asarray(pos_s)
    valid_np = np.asarray(valid_s)
    n_sh = 8
    per = len(pos_np) // n_sh
    areas = [shard_area(pos_np[i * per:(i + 1) * per],
                        valid_np[i * per:(i + 1) * per]) for i in range(n_sh)]
    scene = shard_area(pos_np, valid_np)
    random_areas = [shard_area(pos[i * per:(i + 1) * per],
                               valid[i * per:(i + 1) * per])
                    for i in range(n_sh)]
    assert np.mean(areas) < 0.45 * scene
    assert np.mean(random_areas) > 0.9 * scene  # the contrast being claimed


def test_sharded_pipeline_step_runs():
    pos, valid = _forest(n_pad=10240)
    mesh = sharding.make_mesh()
    step = sharding.sharded_pipeline_step(mesh, CFG)
    pos_s, valid_s = sharding.shard_points(mesh, jnp.asarray(pos), jnp.asarray(valid))
    segment, classification, n_alloc, table = step(
        pos_s, valid_s, jnp.float32(0.75)
    )
    segment = np.asarray(segment)
    count = np.asarray(table.count)
    assert int(n_alloc) > 0
    # counts table matches the actual assignment histogram
    hist = np.bincount(segment[segment > 0], minlength=len(count))[: len(count)]
    np.testing.assert_array_equal(count, hist)
    # replicated per-segment y-extents are consistent (quantized to ~1e-5 of
    # the scene height by the packed sort key)
    min_y, max_y = np.asarray(table.lo[:, 1]), np.asarray(table.hi[:, 1])
    for sid in np.unique(segment[segment > 0])[:5]:
        ys = pos[segment == sid, 1]
        assert abs(min_y[sid] - ys.min()) < 1e-3
        assert abs(max_y[sid] - ys.max()) < 1e-3
    assert set(np.unique(np.asarray(classification)[segment > 0])) <= {0, 1, 2}


def test_sharded_characteristics_match_single_device():
    pos, valid = _forest(n_pad=10240)
    mesh = sharding.make_mesh()
    step = sharding.sharded_pipeline_step(mesh, CFG)
    pos_s, valid_s = sharding.shard_points(mesh, jnp.asarray(pos), jnp.asarray(valid))
    segment, cls_sh, _, table_sh = step(pos_s, valid_s, jnp.float32(0.75))

    from treee_tpu import characteristics as ch

    table_1, cls_1 = ch.compute_segments(
        jnp.asarray(np.asarray(pos)), jnp.asarray(np.asarray(segment)),
        jnp.asarray(valid), CFG.segmentation.max_segments + 1,
        CFG.characteristics, full_bbox=False,
    )
    # same segments in -> near-identical analytics out (single-device path
    # quantizes y the same way; merge order only reorders float maxima)
    np.testing.assert_allclose(
        np.asarray(table_sh.areas), np.asarray(table_1.areas),
        rtol=1e-4, atol=1e-4,
    )
    np.testing.assert_allclose(
        np.asarray(table_sh.ground_sep), np.asarray(table_1.ground_sep),
        atol=1e-3,
    )
    np.testing.assert_allclose(
        np.asarray(table_sh.crown_sep), np.asarray(table_1.crown_sep),
        atol=1e-3,
    )
    agree = (np.asarray(cls_sh) == np.asarray(cls_1)).mean()
    assert agree > 0.999, f"classification agreement {agree:.4f}"


def test_sharded_render_matches_single_device():
    """pmin compositing of packed depth keys is exact, so the sharded frame
    matches single-device up to shading-stage float fusion differences
    (observed: <1% of pixels, <=1e-3 — XLA compiles the replicated shading
    arithmetic slightly differently inside shard_map)."""
    from treee_tpu.render import Camera, palettes, splat

    pos, valid = _forest(n_pad=10240)
    mesh = sharding.make_mesh()
    pos_j = jnp.asarray(pos)
    prop = jnp.asarray(
        (np.arange(len(pos)) % 256 / 255.0).astype(np.float32)
    )
    cam = Camera.orbital(distance=60.0)
    palette = palettes.get("turbo")

    ref = splat.eye_dome(*splat.render_points(
        pos_j, prop, jnp.asarray(valid), cam, palette, CFG.render)[:2],
        CFG.render)

    fn = sharding.sharded_render(mesh, CFG)
    pos_s, valid_s = sharding.shard_points(mesh, pos_j, jnp.asarray(valid))
    prop_s = jax.device_put(
        prop, jax.sharding.NamedSharding(mesh, jax.sharding.PartitionSpec("data"))
    )
    img = np.asarray(fn(pos_s, prop_s, valid_s, cam, palette))
    ref = np.asarray(ref)
    np.testing.assert_allclose(img, ref, atol=5e-3)
    exact = (img == ref).all(axis=-1).mean()
    assert exact > 0.98, f"only {exact:.4f} of pixels bit-identical"


def test_all_padding_shards_do_not_corrupt_bounds():
    """Shards holding ONLY padding must contribute min/max identities to the
    global-bounds collective.  scene_bounds' local (0,1) unit-box fallback
    used to leak into pmin/pmax, pulling the global lo toward the origin and
    silently changing cell size + anchor bins vs the single-device run."""
    pts = las.synthetic_forest(n_trees=3, points_per_tree=1500,
                               ground_points=1000, seed=13)
    pts = pts + np.float32([400.0, 50.0, 400.0])  # far from the origin
    n = len(pts)
    n_pad = 65536  # 8 shards of 8192: only shard 0 holds valid rows
    assert n <= 8192
    pos = np.zeros((n_pad, 3), np.float32)
    pos[:n] = pts
    valid = np.zeros(n_pad, bool)
    valid[:n] = True

    ref = np.asarray(
        segment_points(jnp.asarray(pos), jnp.asarray(valid), 0.75,
                       CFG.segmentation).segment
    )
    mesh = sharding.make_mesh()
    fn = sharding.sharded_segment(mesh, CFG)
    pos_s, valid_s = sharding.shard_points(mesh, jnp.asarray(pos),
                                           jnp.asarray(valid))
    seg_sharded, _ = fn(pos_s, valid_s, jnp.float32(0.75))
    np.testing.assert_array_equal(np.asarray(seg_sharded), ref)


def test_sharded_edit_matches_single_device():
    """Interactive edits are elementwise SoA updates, so they run on a
    point-sharded cloud with NO collectives and NO code changes: jit
    propagates the input sharding through remove_points.  Asserts the edited
    segments equal the single-device result and the output stays sharded
    along the points axis (the edit never gathers the cloud)."""
    from jax.sharding import NamedSharding, PartitionSpec as P

    from treee_tpu import interactive
    from treee_tpu.cloud import PointCloud

    mesh = sharding.make_mesh()
    pos_np, valid_np = _forest(8 * 2048)
    seg_np = (np.arange(8 * 2048) % 7 + 1).astype(np.int32)

    def cloud_with(sharded: bool):
        def put(x, spec):
            x = jnp.asarray(x)
            return jax.device_put(x, NamedSharding(mesh, spec)) if sharded else x
        return PointCloud(
            pos=put(pos_np, P("data", None)),
            segment=put(seg_np, P("data")),
            classification=put(np.zeros(len(seg_np), np.int32), P("data")),
            valid=put(valid_np, P("data")),
        )

    center = jnp.asarray(pos_np[100], jnp.float32)  # on a real point
    edit = jax.jit(lambda c: interactive.remove_points(c, center, 3.0, 0))
    out_s = edit(cloud_with(True))
    out_1 = edit(cloud_with(False))
    np.testing.assert_array_equal(np.asarray(out_s.segment),
                                  np.asarray(out_1.segment))
    assert int(np.asarray((out_s.segment != cloud_with(False).segment).sum())) > 0
    spec = out_s.segment.sharding.spec
    assert tuple(spec) and spec[0] == "data", spec


def test_sharded_rasters_bit_exact():
    """pmin/pmax height-grid compositing == the single-device scatters, so
    every raster (including the jump-flood-filled DTM) is bit-identical."""
    from treee_tpu import rasters as rs

    pos, valid = _forest(n_pad=10240)
    # synthetic classes: lowest quarter ground, rest crown
    y = pos[:, 1]
    cls = np.where(y < np.quantile(y[valid], 0.25), 0, 2).astype(np.int32)
    lo = pos[valid].min(axis=0)
    hi = pos[valid].max(axis=0)

    ref, (rows, cols), cell = rs.compute_rasters(
        jnp.asarray(pos), jnp.asarray(cls), jnp.asarray(valid),
        lo, hi, cell=1.0, cap=256,
    )

    mesh = sharding.make_mesh()
    pos_s, valid_s = sharding.shard_points(mesh, jnp.asarray(pos), jnp.asarray(valid))
    cls_s = jax.device_put(
        jnp.asarray(cls),
        jax.sharding.NamedSharding(mesh, jax.sharding.PartitionSpec("data")),
    )
    got, (rows2, cols2), cell2 = sharding.sharded_rasters(
        mesh, pos_s, cls_s, valid_s, lo, hi, cell=1.0, cap=256,
    )
    assert (rows, cols, cell) == (rows2, cols2, cell2)
    for k in ("dtm", "dsm", "chm"):
        np.testing.assert_array_equal(got[k], ref[k])


# --- sharded interactive path: octree masks + pick (round 3) --------------


def _morton_spanning_cloud(n_pad=4096, seed=3):
    """Cloud with long runs of IDENTICAL positions so leaf-node runs span
    shard boundaries under Morton-range sharding — the hard case for the
    cross-shard rank/count carries."""
    rng = np.random.default_rng(seed)
    centers = rng.uniform(0, 40, (50, 3)).astype(np.float32)
    pos = np.repeat(centers, 60, axis=0)  # 3000 pts, runs of 60
    extra = rng.uniform(0, 40, (500, 3)).astype(np.float32)
    pos = np.concatenate([pos, extra])
    n = len(pos)
    out = np.zeros((n_pad, 3), np.float32)
    out[:n] = pos
    valid = np.zeros(n_pad, bool)
    valid[:n] = True
    live = valid.copy()
    live[::3] = False  # exercise live-aware ranks (deleted points)
    return out, valid, live


def test_sharded_lod_mask_bit_exact():
    from treee_tpu.ops import octree

    pos, valid, live = _morton_spanning_cloud()
    mesh = sharding.make_mesh()
    pos_s, valid_s, order = sharding.shard_points_morton(
        mesh, jnp.asarray(pos), jnp.asarray(valid))
    pos_p, valid_p, live_p = pos[order], valid[order], live[order]

    planes = jnp.zeros((6, 4), jnp.float32)
    for level, ppn in [(3, 1), (6, 2), (9, 1)]:
        ref = np.asarray(octree.lod_mask(
            octree.build(jnp.asarray(pos_p), jnp.asarray(valid_p)),
            level=level, points_per_node=ppn, live=jnp.asarray(live_p)))
        fn = sharding.sharded_lod_mask(mesh, level, ppn)
        got = np.asarray(fn(
            pos_s, valid_s,
            jax.device_put(jnp.asarray(live_p),
                           jax.sharding.NamedSharding(
                               mesh, jax.sharding.PartitionSpec("data"))),
            planes))
        np.testing.assert_array_equal(got, ref, err_msg=f"level={level}")


def test_sharded_lod_mask_frustum_bit_exact():
    from treee_tpu.ops import octree
    from treee_tpu.render import Camera

    pos, valid, live = _morton_spanning_cloud(seed=5)
    mesh = sharding.make_mesh()
    pos_s, valid_s, order = sharding.shard_points_morton(
        mesh, jnp.asarray(pos), jnp.asarray(valid))
    pos_p, valid_p, live_p = pos[order], valid[order], live[order]
    cam = Camera.orbital(distance=60.0)
    planes = cam.frustum_planes(16 / 9)

    ref = np.asarray(octree.lod_mask(
        octree.build(jnp.asarray(pos_p), jnp.asarray(valid_p)),
        level=6, points_per_node=1, live=jnp.asarray(live_p),
        frustum=planes))
    assert 0 < ref.sum() < live_p.sum()  # the cull actually cut something
    fn = sharding.sharded_lod_mask(mesh, 6, 1, use_frustum=True)
    got = np.asarray(fn(
        pos_s, valid_s,
        jax.device_put(jnp.asarray(live_p),
                       jax.sharding.NamedSharding(
                           mesh, jax.sharding.PartitionSpec("data"))),
        planes))
    np.testing.assert_array_equal(got, ref)


def test_sharded_adaptive_mask_bit_exact():
    from treee_tpu.ops import octree

    pos, valid, live = _morton_spanning_cloud(seed=11)
    mesh = sharding.make_mesh()
    pos_s, valid_s, order = sharding.shard_points_morton(
        mesh, jnp.asarray(pos), jnp.asarray(valid))
    pos_p, valid_p, live_p = pos[order], valid[order], live[order]
    cam_pos = jnp.asarray([25.0, 30.0, 25.0], jnp.float32)
    px_scale = 870.0

    ref = np.asarray(octree.adaptive_mask(
        octree.build(jnp.asarray(pos_p), jnp.asarray(valid_p)),
        cam_pos, px_scale, tau_px=2.0, live=jnp.asarray(live_p)))
    assert 0 < ref.sum() < live_p.sum()
    fn = sharding.sharded_adaptive_mask(mesh, px_scale, tau_px=2.0)
    got = np.asarray(fn(
        pos_s, valid_s,
        jax.device_put(jnp.asarray(live_p),
                       jax.sharding.NamedSharding(
                           mesh, jax.sharding.PartitionSpec("data"))),
        cam_pos, jnp.zeros((6, 4), jnp.float32)))
    np.testing.assert_array_equal(got, ref)


def test_sharded_pick_matches_single_device():
    from treee_tpu import interactive as edit
    from treee_tpu.cloud import PointCloud

    pos, valid, _ = _morton_spanning_cloud(seed=13)
    seg = (np.arange(len(pos)) % 7).astype(np.int32)
    mesh = sharding.make_mesh()
    pos_s, valid_s, order = sharding.shard_points_morton(
        mesh, jnp.asarray(pos), jnp.asarray(valid))
    seg_p = seg[order]
    cloud = PointCloud(
        pos=jnp.asarray(pos[order]), segment=jnp.asarray(seg_p),
        classification=jnp.zeros(len(pos), jnp.int32),
        valid=jnp.asarray(valid[order]))

    origin = jnp.asarray([20.0, 50.0, 20.0], jnp.float32)
    direction = jnp.asarray([0.0, -1.0, 0.0], jnp.float32)
    ref_seg, ref_dist, ref_found = edit.pick(cloud, origin, direction, 1.5)

    fn = sharding.sharded_pick(mesh)
    seg_sh = jax.device_put(
        jnp.asarray(seg_p),
        jax.sharding.NamedSharding(mesh, jax.sharding.PartitionSpec("data")))
    got_seg, got_dist, got_found = fn(
        pos_s, seg_sh, valid_s, origin, direction, jnp.float32(1.5))
    assert bool(got_found) == bool(ref_found)
    assert int(got_seg) == int(ref_seg)
    np.testing.assert_allclose(float(got_dist), float(ref_dist), rtol=1e-6)


def test_sharded_pick_miss():
    pos, valid, _ = _morton_spanning_cloud(seed=17)
    mesh = sharding.make_mesh()
    pos_s, valid_s, order = sharding.shard_points_morton(
        mesh, jnp.asarray(pos), jnp.asarray(valid))
    seg_sh = jax.device_put(
        jnp.ones(len(pos), jnp.int32),
        jax.sharding.NamedSharding(mesh, jax.sharding.PartitionSpec("data")))
    fn = sharding.sharded_pick(mesh)
    got_seg, _, got_found = fn(
        pos_s, seg_sh, valid_s,
        jnp.asarray([500.0, 500.0, 500.0], jnp.float32),
        jnp.asarray([0.0, 1.0, 0.0], jnp.float32), jnp.float32(0.5))
    assert not bool(got_found) and int(got_seg) == -1


def test_sorted_inventory_paths_compose_sharded():
    """The TPU-only sorted-scan inventory paths (Pallas kernels, interpret
    mode here) composed over the 8-device mesh == the single-device scatter
    formulation: min/max extents and max grids compose exactly, float-sum
    tables to psum tolerance.  This is the composition a real pod slice
    runs; the CPU suite otherwise only exercises the scatter branches."""
    import functools

    from jax.sharding import NamedSharding, PartitionSpec as P
    from jax import shard_map

    from treee_tpu import rbv as rbv_mod
    from treee_tpu import trunk_axis as ta

    pos, valid = _forest(n_pad=10240)
    rng = np.random.default_rng(3)
    seg = rng.integers(0, 6, len(pos)).astype(np.int32)
    cls = rng.integers(0, 3, len(pos)).astype(np.int32)
    S = 6
    posj, segj, clsj = jnp.asarray(pos), jnp.asarray(seg), jnp.asarray(cls)
    validj = jnp.asarray(valid)
    mask = validj & (clsj == 1)

    ref_axes = ta.batched_average_direction(posj, mask, segj, S)
    tfs = ta.batched_axis_transform(ref_axes)
    ref_crown, ref_trunk = rbv_mod.batched_split_rbv(
        posj, clsj, validj, segj, S, tfs, 6, 8, 4, 8)

    mesh = sharding.make_mesh()

    def local(p, m, s_, c_, v):
        axes = ta._batched_average_direction_sorted(
            p, m, s_, S, 10, "data", interpret=True)
        t = ta.batched_axis_transform(axes)
        crown, trunk = rbv_mod._batched_split_rbv_sorted(
            p, c_, v, s_, S, t, 6, 8, 4, 8, False, "data", interpret=True)
        return axes.direction, crown.distances, trunk.distances

    fn = jax.jit(shard_map(
        local, mesh=mesh,
        in_specs=(P("data", None), P("data"), P("data"), P("data"),
                  P("data")),
        out_specs=(P(), P(), P()),
        check_vma=False,  # Pallas (interpret) inside shard_map has no VMA
    ))
    sh = NamedSharding(mesh, P("data"))
    direction, crown_d, trunk_d = fn(
        jax.device_put(posj, NamedSharding(mesh, P("data", None))),
        jax.device_put(mask, sh), jax.device_put(segj, sh),
        jax.device_put(clsj, sh), jax.device_put(validj, sh))

    np.testing.assert_allclose(np.asarray(direction),
                               np.asarray(ref_axes.direction),
                               rtol=1e-4, atol=1e-4)
    # the sharded transforms ride float-psum'd axes, so grids agree to
    # tolerance (the max composition itself is exact)
    np.testing.assert_allclose(np.asarray(crown_d),
                               np.asarray(ref_crown.distances),
                               rtol=1e-3, atol=1e-3)
    np.testing.assert_allclose(np.asarray(trunk_d),
                               np.asarray(ref_trunk.distances),
                               rtol=1e-3, atol=1e-3)


# --- Session mesh mode (VERDICT r4 task 2: the mesh is a Session MODE) ----


def test_session_mesh_mode_end_to_end():
    """Session(cfg, mesh=...) drives the WHOLE user surface on the 8-CPU
    mesh — segment, characteristics table, render, LOD + adaptive masks
    (cached sharded octree), edits, pick, rasters, inventory — and matches
    a single-device Session fed the SAME Morton-preordered rows bit-exactly
    (integer/key paths) or to float tolerance (shading, float psums)."""
    from treee_tpu.config import (CharacteristicsConfig, RenderConfig)
    from treee_tpu.pipeline import Session

    cfg = Config(
        segmentation=SegmentationConfig(
            grid_size=128, max_bands=16, max_segments=128,
            max_trees_per_band=32, cc_iters=16,
        ),
        characteristics=CharacteristicsConfig(max_slices=96),
        render=RenderConfig(width=128, height=96),
    )
    pts = las.synthetic_forest(n_trees=4, points_per_tree=3000,
                               ground_points=3000, seed=11)

    mesh = sharding.make_mesh()
    sm = Session.from_points(pts, cfg, mesh=mesh)
    assert sm.mesh is mesh
    n_cap = sm.cloud.capacity
    assert n_cap % 8 == 0

    # single-device reference on the SAME rows (mesh mode Morton-preorders
    # at ingest; feed the reordered host rows so arrays compare 1:1)
    host = sm.cloud.to_numpy()
    n_live = int(np.asarray(sm.cloud.valid).sum())
    # explicit capacity: mesh mode rounds to 1024*D blocks (per-shard
    # anchor-stride invariant), the single session to 1024 — match them
    s1 = Session.from_points(np.asarray(host["pos"])[:n_live], cfg,
                             capacity=n_cap)
    assert s1.cloud.capacity == n_cap

    res_m = sm.segment(0.75)
    res_1 = s1.segment(0.75)
    assert int(res_m.n_segments) == int(res_1.n_segments)
    np.testing.assert_array_equal(np.asarray(sm.cloud.segment),
                                  np.asarray(s1.cloud.segment))
    cls_agree = (np.asarray(sm.cloud.classification)
                 == np.asarray(s1.cloud.classification)).mean()
    assert cls_agree > 0.999, f"classification agreement {cls_agree:.4f}"

    # characteristics (full bbox) table
    tm, t1 = sm.characteristics(), s1.characteristics()
    np.testing.assert_array_equal(np.asarray(tm.present),
                                  np.asarray(t1.present))
    np.testing.assert_allclose(np.asarray(tm.ground_sep),
                               np.asarray(t1.ground_sep), atol=1e-3)

    # full-cloud frame: pmin key compositing exact, shading to tolerance
    img_m = sm.render()
    img_1 = s1.render()
    exact = (img_m == img_1).all(axis=-1).mean()
    assert exact > 0.98, f"only {exact:.4f} of pixels identical"

    # focused path (VERDICT r4 task 9): curvature / normals / focus frame
    # with hull+axis overlays on the mesh session match single-device —
    # the k-NN and covariance run on the sharded arrays (GSPMD partitions
    # the tiled brute force; no hand-written gather of the cloud), and the
    # hull fetches only the <=512 candidate rows (utils/transfer)
    counts = np.asarray(tm.count)
    live = np.where(np.asarray(tm.present), counts, 0)
    sid = int(np.argmax(live[1:])) + 1  # biggest real segment
    cm, c1 = np.asarray(sm.curvature(sid)), np.asarray(s1.curvature(sid))
    np.testing.assert_allclose(cm, c1, atol=2e-3)
    nm, n1v = np.asarray(sm.normals(sid)), np.asarray(s1.normals(sid))
    member = np.asarray(sm.cloud.valid & (sm.cloud.segment == sid))
    align = np.abs((nm * n1v).sum(-1))[member]
    # near-degenerate neighborhoods may flip the smallest eigenvector under
    # float psum reordering; the bulk must agree
    assert np.quantile(align, 0.05) > 0.98, float(np.quantile(align, 0.05))
    fm = sm.render_focus(sid, show_hull=True, show_axis=True)
    f1 = s1.render_focus(sid, show_hull=True, show_axis=True)
    focus_exact = (fm == f1).all(axis=-1).mean()
    assert focus_exact > 0.97, f"focus frames diverge: {focus_exact:.4f}"

    # LOD + adaptive masks ride the CACHED sharded octree
    sm.build_lod(level=6)
    s1.build_lod(level=6)
    stree0 = sm._stree
    assert stree0 is not None
    np.testing.assert_array_equal(np.asarray(sm._lod[1]),
                                  np.asarray(s1._lod[1]))  # same indices

    # edit stroke: elementwise on sharded arrays; then adaptive rebuild
    # REUSES the cached tree (positions never moved)
    center = np.asarray(host["pos"])[:n_live].mean(axis=0)
    sm.delete_sphere(jnp.asarray(center, jnp.float32), 2.0)
    s1.delete_sphere(jnp.asarray(center, jnp.float32), 2.0)
    np.testing.assert_array_equal(np.asarray(sm.cloud.segment),
                                  np.asarray(s1.cloud.segment))
    sm.build_lod(camera=sm.camera, adaptive_tau_px=2.0)
    s1.build_lod(camera=s1.camera, adaptive_tau_px=2.0)
    assert sm._stree is stree0, "sharded octree must be cached across edits"
    np.testing.assert_array_equal(np.asarray(sm._lod[1]),
                                  np.asarray(s1._lod[1]))
    img_m = sm.render(use_lod=True)
    img_1 = s1.render(use_lod=True)
    assert (img_m == img_1).all(axis=-1).mean() > 0.98

    # pick: same winner
    pm = sm.pick(64, 48)
    p1 = s1.pick(64, 48)
    assert pm[0] == p1[0] and pm[2] == p1[2]
    np.testing.assert_allclose(pm[1], p1[1], rtol=1e-6)

    # rasters bit-exact; inventory to float tolerance
    gm, _, _ = sm.rasters(2.0, cap=256)
    g1, _, _ = s1.rasters(2.0, cap=256)
    for k in gm:
        np.testing.assert_array_equal(gm[k], g1[k])
    im, i1 = sm.inventory(), s1.inventory()
    np.testing.assert_array_equal(im["segment"], i1["segment"])
    np.testing.assert_array_equal(im["n_points"], i1["n_points"])
    np.testing.assert_allclose(im["diameter_breast_height"],
                               i1["diameter_breast_height"],
                               rtol=1e-4, atol=1e-5)


def test_repl_and_serve_on_mesh_session():
    """REPL and the browser-viewer server run UNCHANGED on a mesh-mode
    Session (VERDICT r4 task 2 done-criterion): commands, a rendered
    frame, LOD toggle, pick-click, and info all work point-sharded."""
    import json as json_mod
    import urllib.request

    from treee_tpu.config import CharacteristicsConfig, RenderConfig
    from treee_tpu.pipeline import Session
    from treee_tpu.serve import ViewerServer

    cfg = Config(
        segmentation=SegmentationConfig(
            grid_size=128, max_bands=16, max_segments=128,
            max_trees_per_band=32, cc_iters=16,
        ),
        characteristics=CharacteristicsConfig(max_slices=96),
        render=RenderConfig(width=128, height=96),
    )
    pts = las.synthetic_forest(n_trees=3, points_per_tree=2500,
                               ground_points=2500, seed=21)
    s = Session.from_points(pts, cfg, mesh=sharding.make_mesh())
    s.segment(0.75)
    v = ViewerServer(s, port=0)
    v.serve_background()
    try:
        def cmd(line):
            req = urllib.request.Request(
                f"http://127.0.0.1:{v.port}/cmd", data=line.encode(),
                method="POST")
            with urllib.request.urlopen(req, timeout=300) as r:
                return json_mod.loads(r.read())

        assert cmd("rotate 20 5")["ok"]
        assert cmd("lod on")["ok"]
        assert cmd("mode view")["ok"]
        assert cmd("click 64 48")["ok"]
        out = cmd("status")
        assert out["ok"] and "points" in out["output"]
        png = v.frame_png()
        assert png[:8] == b"\x89PNG\r\n\x1a\n"
        with urllib.request.urlopen(
                f"http://127.0.0.1:{v.port}/info", timeout=300) as r:
            info = json_mod.loads(r.read())
        assert info["points"] == 10000 and info["segments"] >= 1
    finally:
        v.shutdown()
