"""Segmentation parity-by-invariant tests (SURVEY.md §4 item 3).

The reference segmenter is order-dependent and randomly keyed
(segmenting.rs:425,516-521), so tests assert invariants rather than exact ids:
every point assigned, deterministic re-run (a deliberate improvement), well-
separated trees get distinct coherent ids, distance knob merges/splits.
"""

import numpy as np
import jax.numpy as jnp
import pytest

from treee_tpu.config import SegmentationConfig
from treee_tpu.io import las
from treee_tpu.segmentation import segment_points

CFG = SegmentationConfig(
    grid_size=128, max_bands=16, max_segments=128, max_trees_per_band=32,
    cc_iters=16,
)


def _two_trees(gap: float, n: int = 3000, seed: int = 0):
    rng = np.random.default_rng(seed)
    a = las.synthetic_tree(rng, np.array([0.0, 0.0, 0.0]), n_points=n,
                           crown_radius=1.5, trunk_height=3.0, crown_height=4.0)
    b = las.synthetic_tree(rng, np.array([gap, 0.0, 0.0]), n_points=n,
                           crown_radius=1.5, trunk_height=3.0, crown_height=4.0)
    return np.concatenate([a, b])


def _majority_frac(seg, lo, hi):
    ids = seg[lo:hi]
    ids = ids[ids > 0]
    if len(ids) == 0:
        return 0, 0.0
    maj = np.bincount(ids).argmax()
    return maj, (ids == maj).mean()


def test_every_point_assigned():
    pts = _two_trees(gap=6.0)
    res = segment_points(jnp.asarray(pts), jnp.ones(len(pts), bool), 0.75, CFG)
    seg = np.asarray(res.segment)
    assert (seg > 0).all()


def test_separated_trees_distinct_ids():
    pts = _two_trees(gap=6.0)
    n = len(pts) // 2
    res = segment_points(jnp.asarray(pts), jnp.ones(len(pts), bool), 0.75, CFG)
    seg = np.asarray(res.segment)
    id_a, frac_a = _majority_frac(seg, 0, n)
    id_b, frac_b = _majority_frac(seg, n, len(pts))
    assert frac_a > 0.95 and frac_b > 0.95
    assert id_a != id_b


def test_distance_knob_merges():
    # crowns 3 apart edge-to-edge ~0: with huge d the two trees merge
    pts = _two_trees(gap=3.5)
    n = len(pts) // 2
    res = segment_points(jnp.asarray(pts), jnp.ones(len(pts), bool), 2.0, CFG)
    seg = np.asarray(res.segment)
    id_a, _ = _majority_frac(seg, 0, n)
    id_b, _ = _majority_frac(seg, n, len(pts))
    assert id_a == id_b


def test_deterministic():
    pts = _two_trees(gap=6.0, seed=2)
    v = jnp.ones(len(pts), bool)
    s1 = np.asarray(segment_points(jnp.asarray(pts), v, 0.75, CFG).segment)
    s2 = np.asarray(segment_points(jnp.asarray(pts), v, 0.75, CFG).segment)
    np.testing.assert_array_equal(s1, s2)


def test_permutation_equivalence():
    # segment structure must not depend on point order (the reference's does —
    # shuffled input, segmenting.rs:425; ours fixes that deficiency)
    pts = _two_trees(gap=6.0, seed=3)
    v = jnp.ones(len(pts), bool)
    perm = np.random.default_rng(0).permutation(len(pts))
    s1 = np.asarray(segment_points(jnp.asarray(pts), v, 0.75, CFG).segment)
    s2p = np.asarray(segment_points(jnp.asarray(pts[perm]), v, 0.75, CFG).segment)
    s2 = np.empty_like(s2p)
    s2[perm] = s2p
    # same-segment relation preserved for almost all pairs (scatter-add float
    # order can flip boundary points)
    sample = np.random.default_rng(1).integers(0, len(pts), size=(4000, 2))
    same1 = s1[sample[:, 0]] == s1[sample[:, 1]]
    same2 = s2[sample[:, 0]] == s2[sample[:, 1]]
    assert (same1 == same2).mean() > 0.99


def test_invalid_points_get_zero():
    pts = _two_trees(gap=6.0)
    valid = np.ones(len(pts), bool)
    valid[::7] = False
    res = segment_points(jnp.asarray(pts), jnp.asarray(valid), 0.75, CFG)
    seg = np.asarray(res.segment)
    assert (seg[~valid] == 0).all()
    assert (seg[valid] > 0).all()


def test_empty_input():
    res = segment_points(jnp.zeros((64, 3)), jnp.zeros(64, bool), 0.75, CFG)
    assert (np.asarray(res.segment) == 0).all()
    assert int(res.n_segments) == 0


def test_tracking_coherent_down_the_trunk():
    # a single tall tree: trunk and crown points should share one id
    rng = np.random.default_rng(4)
    pts = las.synthetic_tree(rng, np.zeros(3), trunk_height=6.0,
                             crown_height=5.0, n_points=6000)
    res = segment_points(jnp.asarray(pts), jnp.ones(len(pts), bool), 0.75, CFG)
    seg = np.asarray(res.segment)
    ids = seg[seg > 0]
    maj = np.bincount(ids).argmax()
    assert (ids == maj).mean() > 0.97


def test_realistic_stress_scene_invariants():
    """The clustered/overlapping/density-banded stress scene (the offline
    stand-in for a real ALS tile, SURVEY.md §4.3 parity-by-invariant):
    segmentation still finds roughly one segment per tree, assigns every
    live point, and keeps outliers from spawning phantom trees."""
    import numpy as np
    import jax.numpy as jnp

    from treee_tpu.config import Config, SegmentationConfig
    from treee_tpu.io import las
    from treee_tpu.segmentation import segment_points

    cfg = SegmentationConfig(
        grid_size=160, max_bands=24, max_segments=256, max_trees_per_band=48,
    )
    n_trees = 18
    pts = las.synthetic_forest_realistic(
        n_trees=n_trees, extent=50.0, mean_points_per_tree=3000,
        ground_points=20000, seed=4,
    )
    res = segment_points(jnp.asarray(pts), jnp.ones(len(pts), bool), 0.75, cfg)
    seg = np.asarray(res.segment)
    n_seg = int(res.n_segments)
    # every point got an assignment decision (0 = unassigned is allowed for
    # ground/noise, but the majority of canopy points are labeled)
    assert (seg >= 0).all()
    high = pts[:, 1] > 3.0
    assert (seg[high] > 0).mean() > 0.8
    # tree count is in a sane band: clusters may merge overlapping crowns,
    # so allow down to half and up to 2.5x (density cliffs can split)
    assert n_trees // 2 <= n_seg <= int(n_trees * 2.5) + 8
    # determinism: same input -> identical labels
    seg2 = np.asarray(
        segment_points(jnp.asarray(pts), jnp.ones(len(pts), bool), 0.75,
                       cfg).segment
    )
    np.testing.assert_array_equal(seg, seg2)


def test_bruteforce_voronoi_matches_and_is_optimal():
    """The exact occupied-cell Voronoi (use_bruteforce_voronoi) must (a) give
    the same end-to-end segmentation as the JFA on a generic scene, and (b) be
    distance-optimal at every occupied cell (the JFA may propagate a
    non-optimal seed; brute force never does)."""
    import dataclasses

    import jax

    from treee_tpu import segmentation as sg

    pts = las.synthetic_forest(n_trees=6, points_per_tree=1500,
                               ground_points=2000, seed=11)
    pos = jnp.asarray(pts)
    valid = jnp.ones(len(pts), bool)
    cfg_bf = dataclasses.replace(CFG, use_bruteforce_voronoi=True)
    res_jfa = segment_points(pos, valid, 0.75, CFG)
    res_bf = segment_points(pos, valid, 0.75, cfg_bf)
    np.testing.assert_array_equal(np.asarray(res_jfa.segment),
                                  np.asarray(res_bf.segment))
    assert int(res_jfa.n_segments) == int(res_bf.n_segments)

    # optimality: recompute both slot grids and compare winner distances at
    # occupied cells
    import functools

    @functools.partial(jax.jit, static_argnames=("use_bf",))
    def grids(pos, valid, use_bf):
        d = jnp.float32(0.75)
        lo, hi = sg.scene_bounds(pos, valid)
        s = sg.cell_size(lo, hi, d, CFG)
        top = sg.band_anchor(
            sg.anchor_histogram(pos, valid, lo[1], hi[1]), lo[1], hi[1], CFG)
        band, cx, cz = sg.point_cells(pos, valid, lo, hi, s, CFG, top=top)
        cnt = sg.moment_grids(pos, valid, band, cx, cz, CFG)
        cfg = cfg_bf if use_bf else CFG
        slot_grids, _, tracked, active = sg.band_scan(cnt, lo, s, d, cfg)
        g = CFG.grid_size
        cell_center = jnp.stack([
            lo[0] + (jax.lax.broadcasted_iota(jnp.float32, (g, g), 0) + 0.5) * s,
            lo[2] + (jax.lax.broadcasted_iota(jnp.float32, (g, g), 1) + 0.5) * s,
        ], axis=-1)
        return cnt, slot_grids, tracked, active, cell_center

    # NOTE: use_bf is a Python bool through cfg (static), call twice
    cnt, sg_jfa, tracked, active, cc = grids(pos, valid, False)
    _, sg_bf, _, _, _ = grids(pos, valid, True)
    cnt = np.asarray(cnt)
    sg_jfa, sg_bf = np.asarray(sg_jfa), np.asarray(sg_bf)
    tracked, active, cc = np.asarray(tracked), np.asarray(active), np.asarray(cc)

    occ = np.argwhere(cnt > 0)
    assert len(occ) > 0

    def winner_dist(slotgrid, b, ix, iz):
        slot = slotgrid[b, ix, iz]
        if slot < 0 or not active[b, slot]:
            return np.inf
        d = tracked[b, slot] - cc[ix, iz]
        return float(d @ d)

    for b, ix, iz in occ[:: max(1, len(occ) // 512)]:
        d_bf = winner_dist(sg_bf, b, ix, iz)
        d_jfa = winner_dist(sg_jfa, b, ix, iz)
        assert d_bf <= d_jfa + 1e-5, (b, ix, iz, d_bf, d_jfa)


def test_sorted_extract_matches_topk():
    """The sort-based cluster selection (SegmentationConfig.use_sorted_extract,
    the default — replaces a ~90 ms batched top_k at bench scale) is
    bit-identical to the top_k path: same biggest-first order, same
    lowest-index tie-break, same accumulation-target candidate set.
    Covers a normal forest, a count-tie truncation regime (9 equal clusters,
    4 slots), and an empty cloud."""
    import dataclasses

    cfg_t = dataclasses.replace(CFG, use_sorted_extract=False)
    pts = las.synthetic_forest(n_trees=7, points_per_tree=1200,
                               ground_points=1800, seed=21)
    pos, v = jnp.asarray(pts), jnp.ones(len(pts), bool)
    r_s = segment_points(pos, v, 0.75, CFG)
    r_t = segment_points(pos, v, 0.75, cfg_t)
    assert int(r_s.n_segments) == int(r_t.n_segments)
    np.testing.assert_array_equal(np.asarray(r_s.segment),
                                  np.asarray(r_t.segment))
    np.testing.assert_array_equal(np.asarray(r_s.tracked_pos),
                                  np.asarray(r_t.tracked_pos))

    cfg2 = SegmentationConfig(grid_size=64, max_bands=4, max_segments=32,
                              max_trees_per_band=4, cc_iters=10)
    cfg2t = dataclasses.replace(cfg2, use_sorted_extract=False)
    rng = np.random.default_rng(7)
    clusters = [rng.normal(0, 0.5, (200, 3)).astype(np.float32)
                + np.array([(i % 3) * 15.0, 5.0, (i // 3) * 15.0], np.float32)
                for i in range(9)]
    pos2 = jnp.asarray(np.concatenate(clusters))
    v2 = jnp.ones(pos2.shape[0], bool)
    r_s = segment_points(pos2, v2, 0.75, cfg2)
    r_t = segment_points(pos2, v2, 0.75, cfg2t)
    np.testing.assert_array_equal(np.asarray(r_s.segment),
                                  np.asarray(r_t.segment))

    r_s = segment_points(jnp.zeros((64, 3)), jnp.zeros(64, bool), 0.75, cfg2)
    r_t = segment_points(jnp.zeros((64, 3)), jnp.zeros(64, bool), 0.75, cfg2t)
    np.testing.assert_array_equal(np.asarray(r_s.segment),
                                  np.asarray(r_t.segment))
