"""Pallas kernel equivalence tests (interpreter mode on CPU)."""

import jax
import numpy as np
import jax.numpy as jnp

from treee_tpu import segmentation as sg
from treee_tpu.config import RenderConfig
from treee_tpu.ops import pallas_kernels as pk
from treee_tpu.render import splat


def _seeds(g=64, n_seeds=20, seed=0):
    rng = np.random.default_rng(seed)
    slot_grid = np.full((g, g), -1, np.int32)
    pos_grid = np.zeros((g, g, 2), np.float32)
    cells = rng.choice(g * g, n_seeds, replace=False)
    for s, c in enumerate(cells):
        y, x = divmod(int(c), g)
        slot_grid[y, x] = s
        pos_grid[y, x] = (x + rng.uniform(), y + rng.uniform())
    centers = np.stack(
        np.meshgrid(np.arange(g) + 0.5, np.arange(g) + 0.5, indexing="ij"),
        axis=-1,
    )[..., ::-1].astype(np.float32)  # (x, z) order
    return slot_grid, pos_grid, centers


def test_jump_flood_pallas_matches_jnp():
    slot, pos, centers = _seeds()
    # _jump_flood is batched over bands; the pallas kernel is one band
    ref = np.asarray(sg._jump_flood(jnp.asarray(slot)[None],
                                    jnp.asarray(pos)[None],
                                    jnp.asarray(centers)))[0]
    out = np.asarray(pk.jump_flood_pallas(jnp.asarray(slot), jnp.asarray(pos),
                                          jnp.asarray(centers), interpret=True))
    # JFA is approximate; both variants run the same schedule -> identical
    np.testing.assert_array_equal(out, ref)


def test_jump_flood_pallas_is_voronoi():
    slot, pos, centers = _seeds(g=32, n_seeds=5, seed=1)
    out = np.asarray(pk.jump_flood_pallas(jnp.asarray(slot), jnp.asarray(pos),
                                          jnp.asarray(centers), interpret=True))
    # exact nearest seed per cell
    seeds = {int(slot[y, x]): pos[y, x] for y, x in zip(*np.nonzero(slot >= 0))}
    ids = sorted(seeds)
    sp = np.array([seeds[i] for i in ids])
    d = ((centers[:, :, None, :] - sp[None, None, :, :]) ** 2).sum(-1)
    expect = np.array(ids)[d.argmin(-1)]
    assert (out == expect).mean() > 0.995  # JFA's rare corner-case errors only


def test_eye_dome_pallas_matches_jnp():
    rng = np.random.default_rng(2)
    h, w = 48, 64
    z01 = rng.uniform(0.0, 1.0, (h, w)).astype(np.float32)
    z01[rng.uniform(size=(h, w)) < 0.3] = 1.0  # background holes
    color = rng.uniform(0, 1, (h, w, 3)).astype(np.float32)
    cfg = RenderConfig(width=w, height=h)
    ref = np.asarray(splat.eye_dome(jnp.asarray(color), jnp.asarray(z01), cfg))
    s = max(1.0 - cfg.eye_dome_strength, 0.1) ** 6
    out = np.asarray(pk.eye_dome_pallas(
        jnp.asarray(color), jnp.asarray(z01), cfg.near, cfg.far, s,
        cfg.eye_dome_color, interpret=True,
    ))
    np.testing.assert_allclose(out, ref, atol=1e-5)


def test_dilate_pallas_matches_jnp():
    import dataclasses

    from treee_tpu.config import RenderConfig
    from treee_tpu.render import splat
    from treee_tpu.render.camera import Camera

    rng = np.random.default_rng(4)
    cfg = RenderConfig(width=64, height=48, use_pallas=False)
    cam = Camera.orbital(distance=30.0)
    pos = rng.normal(size=(500, 3)).astype(np.float32) * 5.0
    prop = rng.random(500).astype(np.float32)
    mask = jnp.ones(500, bool)

    kimg = splat.rasterize_keys(jnp.asarray(pos), jnp.asarray(prop), mask,
                                cam, cfg)
    # jnp reference path
    color_ref, z_ref, _ = splat.resolve_keys(kimg, cam, jnp.zeros((256, 3)),
                                             cfg)
    # pallas interpret path: run the kernel directly with the same params
    f_proj = cam.projection_matrix(cfg.width / cfg.height)[1, 1]
    p22 = cfg.far / (cfg.near - cfg.far)
    p23 = cfg.near * cfg.far / (cfg.near - cfg.far)
    k_pal = pk.dilate_pallas(
        kimg, p22, p23, cfg.point_size * f_proj * (cfg.height / 2.0),
        radius=cfg.max_splat_radius, interpret=True,
    )
    cfg_j = dataclasses.replace(cfg, max_splat_radius=0)
    # dilated keys drive everything downstream: compare against the scan by
    # re-resolving with radius 0 on the pallas-dilated image
    color_pal, z_pal, _ = splat.resolve_keys(k_pal, cam, jnp.zeros((256, 3)),
                                             cfg_j)
    np.testing.assert_array_equal(np.asarray(z_pal), np.asarray(z_ref))


def test_segmented_cummax_pallas_matches_xla():
    """Single-pass Pallas scan is bit-identical to the XLA doubling scan."""
    from treee_tpu import characteristics as ch

    rng = np.random.default_rng(3)
    cases = [
        (1000, 1, 256),    # 1-D values, multi-block + padded tail
        (5000, 12, 512),   # support-scan shape, runs spanning blocks
        (300, 3, 512),     # single partial block (pure pad path)
        (2048, 5, 1024),   # exact multiple of block
    ]
    for n, c, block in cases:
        key = np.sort(rng.integers(0, 37, n)).astype(np.int32)
        val = (rng.normal(size=(n, c)) * 100).astype(np.float32)
        v = val[:, 0] if c == 1 else val
        ref = np.asarray(ch._segmented_cummax(jnp.asarray(key), jnp.asarray(v)))
        got = np.asarray(pk.segmented_cummax_pallas(
            jnp.asarray(key), jnp.asarray(v), block=block, interpret=True))
        np.testing.assert_array_equal(ref, got)


def test_segmented_cummax_pallas_run_edges():
    """Degenerate keys: one global run, all-distinct, run == block boundary."""
    from treee_tpu import characteristics as ch

    rng = np.random.default_rng(4)
    n, block = 1024, 256
    val = (rng.normal(size=n) * 10).astype(np.float32)
    for key in (
        np.zeros(n, np.int32),                       # one run spanning all blocks
        np.arange(n, dtype=np.int32),                # every element its own run
        np.repeat(np.arange(4, dtype=np.int32), block),  # runs == blocks exactly
    ):
        ref = np.asarray(ch._segmented_cummax(jnp.asarray(key), jnp.asarray(val)))
        got = np.asarray(pk.segmented_cummax_pallas(
            jnp.asarray(key), jnp.asarray(val), block=block, interpret=True))
        np.testing.assert_array_equal(ref, got)


def test_compute_segments_pallas_scan_flag_matches():
    """Full compute_segments with use_pallas_scan=True (interpret on CPU) is
    bit-identical to the XLA doubling-scan path."""
    import dataclasses

    from treee_tpu import characteristics as ch
    from treee_tpu.config import CharacteristicsConfig
    from treee_tpu.io import las

    pts = las.synthetic_forest(n_trees=4, points_per_tree=800,
                               ground_points=600, seed=7)
    pos = jnp.asarray(pts)
    n = pos.shape[0]
    rng = np.random.default_rng(8)
    segment = jnp.asarray(rng.integers(0, 5, n).astype(np.int32))
    valid = jnp.asarray(rng.random(n) > 0.05)

    cfg0 = CharacteristicsConfig(max_slices=64, use_pallas_scan=False)
    cfg1 = dataclasses.replace(cfg0, use_pallas_scan=True,
                               pallas_scan_block=512)
    tab0, cls0 = ch.compute_segments(pos, segment, valid, 8, cfg0)
    tab1, cls1 = ch.compute_segments(pos, segment, valid, 8, cfg1)
    np.testing.assert_array_equal(np.asarray(cls0), np.asarray(cls1))
    for f0, f1 in zip(jax.tree_util.tree_leaves(tab0),
                      jax.tree_util.tree_leaves(tab1)):
        np.testing.assert_array_equal(np.asarray(f0), np.asarray(f1))


def test_jump_flood_packed_matches_unpacked():
    """Lattice-aligned seeds (multiples of s/64) quantize exactly, so the
    packed-plane JFA is bit-identical to the 4-plane one; random seeds agree
    on >=99% of cells (quantization moves positions by <~1 cm)."""
    g = 64
    s = jnp.float32(0.75)
    lo = jnp.zeros(3, jnp.float32)
    qs = 0.75 / 64.0  # == 3/256, exactly representable

    def centers():
        return jnp.stack(
            [
                (jax.lax.broadcasted_iota(jnp.float32, (g, g), 0) + 0.5) * s,
                (jax.lax.broadcasted_iota(jnp.float32, (g, g), 1) + 0.5) * s,
            ],
            axis=-1,
        )

    rng = np.random.default_rng(5)
    for aligned in (True, False):
        slot_grid = np.full((g, g), -1, np.int32)
        pos_grid = np.zeros((g, g, 2), np.float32)
        cells = rng.choice(g * g, 25, replace=False)
        for si, c in enumerate(cells):
            gx, gz = divmod(int(c), g)
            px, pz = (gx + rng.uniform()) * 0.75, (gz + rng.uniform()) * 0.75
            if aligned:
                px, pz = round(px / qs) * qs, round(pz / qs) * qs
            slot_grid[gx, gz] = si
            pos_grid[gx, gz] = (px, pz)
        ref = np.asarray(sg._jump_flood(jnp.asarray(slot_grid)[None],
                                        jnp.asarray(pos_grid)[None],
                                        centers()))[0]
        out = np.asarray(sg._jump_flood_packed(
            jnp.asarray(slot_grid)[None], jnp.asarray(pos_grid)[None],
            centers(), lo, s))[0]
        if aligned:
            np.testing.assert_array_equal(out, ref)
        else:
            assert (out == ref).mean() > 0.99


def test_segment_points_packed_jfa_flag():
    """segment_points with use_packed_jfa reproduces the default ids on a
    small synthetic forest (seeds well separated: no quantization ties)."""
    import dataclasses

    from treee_tpu.config import SegmentationConfig
    from treee_tpu.io import las

    pts = las.synthetic_forest(n_trees=6, points_per_tree=400,
                               ground_points=400, seed=3)
    pos = jnp.asarray(pts)
    valid = jnp.ones(pos.shape[0], bool)
    # bruteforce Voronoi (the default) would shadow both JFA paths
    cfg0 = SegmentationConfig(grid_size=128, max_bands=32,
                              cc_occupied_cap=1 << 14,
                              use_bruteforce_voronoi=False,
                              use_packed_jfa=False)
    cfg1 = dataclasses.replace(cfg0, use_packed_jfa=True)
    r0 = sg.segment_points(pos, valid, 0.75, cfg0)
    r1 = sg.segment_points(pos, valid, 0.75, cfg1)
    assert (np.asarray(r0.segment) == np.asarray(r1.segment)).mean() > 0.999
    assert int(r0.n_segments) == int(r1.n_segments)


def _blob_grid(b=3, g=64, n_blobs=6, seed=7):
    """Occupancy grids with connected blobs (random walks from seed cells)."""
    rng = np.random.default_rng(seed)
    occ = np.zeros((b, g, g), bool)
    for bi in range(b):
        for _ in range(n_blobs):
            y, x = rng.integers(4, g - 4, 2)
            for _ in range(60):
                occ[bi, y, x] = True
                dy, dx = rng.integers(-1, 2, 2)
                y, x = int(np.clip(y + dy, 0, g - 1)), int(np.clip(x + dx, 0, g - 1))
    return occ


def test_cc_sweep_pallas_matches_reduce_window():
    """One kernel call with k sweeps == k XLA reduce_window sweeps."""
    occ = jnp.asarray(_blob_grid())
    b, g, _ = occ.shape
    idx = (jax.lax.broadcasted_iota(jnp.int32, (b, g, g), 1) * g
           + jax.lax.broadcasted_iota(jnp.int32, (b, g, g), 2))
    lbl = jnp.where(occ, idx, sg.IBIG)
    sweeps = 5
    ref = lbl
    for _ in range(sweeps):
        pooled = jax.lax.reduce_window(
            ref, 0x7FFFFFFF, jax.lax.min, (1, 3, 3), (1, 1, 1), "SAME"
        )
        ref = jnp.where(occ, jnp.minimum(ref, pooled), sg.IBIG)
    out = pk.cc_sweep_pallas(lbl, sweeps, interpret=True)
    np.testing.assert_array_equal(np.asarray(out), np.asarray(ref))


def test_connected_components_pallas_path_matches():
    """_connected_components with pallas sweeps converges to the same labels
    as the XLA path (both fully converged on small blobs)."""
    occ = jnp.asarray(_blob_grid(b=2, g=48, n_blobs=4, seed=11))
    ref, _, _ = sg._connected_components(occ, iters=256, occ_cap=1 << 12)
    out, _, _ = sg._connected_components(occ, iters=256, occ_cap=1 << 12,
                                         pallas_sweeps=8, pallas_bodies=16)
    np.testing.assert_array_equal(np.asarray(out), np.asarray(ref))


def test_match_scan_pallas_matches_xla_scan():
    """Whole-band match kernel == the band_step lax.scan, band by band."""
    rng = np.random.default_rng(13)
    b, c_cap, t_cap, rounds = 6, 32, 64, 4
    cents = rng.uniform(0, 50, (b, c_cap, 2)).astype(np.float32)
    cmask = rng.random((b, c_cap)) < 0.4
    # some clusters recur across bands (should match), some are new
    cents[1:] = np.where(rng.random((b - 1, c_cap, 1)) < 0.5,
                         cents[:1] + rng.normal(0, 0.3, (b - 1, c_cap, 2)),
                         cents[1:]).astype(np.float32)
    radius = jnp.float32(1.5)

    def band_step(carry, xs):
        tracked_pos, active, n_alloc = carry
        c, m = xs
        tracked_pos, active, n_alloc = sg._match_band(
            tracked_pos, active, n_alloc, c, m, radius, rounds)
        return (tracked_pos, active, n_alloc), (tracked_pos, active)

    init = (jnp.zeros((t_cap, 2), jnp.float32), jnp.zeros(t_cap, bool),
            jnp.int32(0))
    (_, _, nal_ref), (tp_ref, act_ref) = jax.lax.scan(
        band_step, init, (jnp.asarray(cents), jnp.asarray(cmask)))

    tp, act, nal = pk.match_scan_pallas(
        jnp.asarray(cents), jnp.asarray(cmask), radius, rounds, t_cap,
        interpret=True)
    np.testing.assert_array_equal(np.asarray(act), np.asarray(act_ref))
    np.testing.assert_array_equal(np.asarray(tp), np.asarray(tp_ref))
    assert int(nal) == int(nal_ref)


def test_segment_points_pallas_match_flag():
    """segment_points with use_pallas_match reproduces the default ids."""
    import dataclasses

    from treee_tpu.config import SegmentationConfig
    from treee_tpu.io import las

    pts = las.synthetic_forest(n_trees=6, points_per_tree=400,
                               ground_points=400, seed=3)
    pos = jnp.asarray(pts)
    valid = jnp.ones(pos.shape[0], bool)
    cfg0 = SegmentationConfig(grid_size=128, max_bands=32,
                              cc_occupied_cap=1 << 14)
    cfg1 = dataclasses.replace(cfg0, use_pallas_match=True)
    r0 = sg.segment_points(pos, valid, 0.75, cfg0)
    r1 = sg.segment_points(pos, valid, 0.75, cfg1)
    np.testing.assert_array_equal(np.asarray(r0.segment),
                                  np.asarray(r1.segment))
    assert int(r0.n_segments) == int(r1.n_segments)


def test_segmented_cumsum_pallas_matches_numpy():
    """Per-run inclusive cumsum kernel (interpret) vs a numpy oracle."""
    from treee_tpu.ops import pallas_kernels as pk

    rng = np.random.default_rng(3)
    n = 3000
    key = np.sort(rng.integers(0, 37, n)).astype(np.int32)
    val = rng.standard_normal((n, 3)).astype(np.float32)
    out = np.asarray(pk.segmented_cumsum_pallas(
        jnp.asarray(key), jnp.asarray(val), block=256, interpret=True))
    # oracle: float64 prefix sums per run, then cast — tolerance covers the
    # kernel's doubling-tree accumulation order
    ref = np.zeros_like(val, np.float64)
    for k in np.unique(key):
        m = key == k
        ref[m] = np.cumsum(val[m].astype(np.float64), axis=0)
    np.testing.assert_allclose(out, ref, rtol=2e-5, atol=2e-5)
    # run-end rows hold exact run totals (the consumers' contract)
    ends = np.nonzero(np.diff(np.append(key, key[-1] + 1)))[0]
    for e, k in zip(ends, np.unique(key)):
        np.testing.assert_allclose(
            out[e], val[key == k].astype(np.float64).sum(axis=0),
            rtol=2e-5, atol=2e-5)


def test_segmented_cumsum_pallas_1d_and_padding():
    from treee_tpu.ops import pallas_kernels as pk

    key = np.repeat(np.arange(5), 61).astype(np.int32)  # n=305, pads to 512
    val = np.ones(len(key), np.float32)
    out = np.asarray(pk.segmented_cumsum_pallas(
        jnp.asarray(key), jnp.asarray(val), block=256, interpret=True))
    np.testing.assert_array_equal(out, np.tile(np.arange(1, 62), 5))
