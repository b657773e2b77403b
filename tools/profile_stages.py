"""Per-stage TPU wall-clock profile of the 15M-point pipeline.

Times each pipeline stage separately (own jit, honest sync via scalar fetch —
see CLAUDE.md on the axon tunnel) so perf work targets the real bottleneck.
Run on the real TPU:  python tools/profile_stages.py
Env: PROF_POINTS (default 15_000_000), PROF_REPS (default 2).
"""

from __future__ import annotations

import functools
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    import jax

    cache_dir = os.environ.get("JAX_CACHE_DIR", "/tmp/treee_jax_cache")
    try:
        jax.config.update("jax_compilation_cache_dir", cache_dir)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    except Exception:
        pass

    import jax.numpy as jnp

    from treee_tpu import characteristics as ch
    from treee_tpu import segmentation as sg
    from treee_tpu.config import DEFAULT_CONFIG
    from treee_tpu.io import las
    from treee_tpu.ops import octree
    from treee_tpu.pipeline import full_pipeline

    n_target = int(os.environ.get("PROF_POINTS", 15_000_000))
    reps = int(os.environ.get("PROF_REPS", 2))
    cfg = DEFAULT_CONFIG
    scfg = cfg.segmentation

    points_per_tree = 12_000
    n_trees = max(1, int(n_target * 0.75) // points_per_tree)
    pts = las.synthetic_forest(
        n_trees=n_trees, spacing=7.0, points_per_tree=points_per_tree,
        ground_points=n_target - n_trees * points_per_tree, seed=0,
    )
    n = len(pts)
    pos = jnp.asarray(pts)
    valid = jnp.ones(n, bool)
    d = jnp.float32(scfg.max_distance)

    def sync(out):
        for leaf in jax.tree_util.tree_leaves(out):
            np.asarray(leaf.reshape(-1)[0])
        return out

    def bench(name, fn, *args):
        t0 = time.time()
        out = sync(fn(*args))
        compile_s = time.time() - t0
        times = []
        for _ in range(reps):
            t0 = time.time()
            out = sync(fn(*args))
            times.append(time.time() - t0)
        print(f"{name:28s} {min(times)*1e3:9.1f} ms   (compile {compile_s:.1f}s)",
              flush=True)
        return out

    print(f"# profiling {n:,} points on {jax.devices()[0]}", flush=True)

    # --- stage jits ---
    octree_build = jax.jit(lambda p, v: octree.build(p, v).keys)

    @jax.jit
    def stage_cells(pos, valid, d):
        lo, hi = sg.scene_bounds(pos, valid)
        s = sg.cell_size(lo, hi, d, scfg)
        band, cx, cz = sg.point_cells(pos, valid, lo, hi, s, scfg)
        return lo, hi, s, band, cx, cz

    @jax.jit
    def stage_grids(pos, valid, band, cx, cz):
        return sg.moment_grids(pos, valid, band, cx, cz, scfg)

    @jax.jit
    def stage_cc(cnt):
        return sg._connected_components(cnt > 0, scfg.cc_iters, scfg.cc_occupied_cap)[0]

    @jax.jit
    def stage_bandscan(cnt, lo, s, d):
        return sg.band_scan(cnt, lo, s, d, scfg)

    @jax.jit
    def stage_assign(slot_grids, band, cx, cz, valid):
        return sg.assign_points(slot_grids, band, cx, cz, valid)

    @jax.jit
    def stage_chars(pos, segment, valid):
        return ch.compute_segments(
            pos, segment, valid, scfg.max_segments + 1,
            cfg.characteristics, full_bbox=False,
        )

    pipe = jax.jit(lambda p, v, dd: full_pipeline(p, v, dd, cfg))

    bench("octree.build", octree_build, pos, valid)
    lo, hi, s, band, cx, cz = bench("cells(bounds+quantize)", stage_cells,
                                    pos, valid, d)
    cnt = bench("moment_grids(scatter)", stage_grids, pos, valid, band, cx, cz)
    bench("connected_components", stage_cc, cnt)
    out = bench("band_scan(cc+track+jfa)", stage_bandscan, cnt, lo, s, d)
    slot_grids = out[0]
    segment = bench("assign_points(gather)", stage_assign,
                    slot_grids, band, cx, cz, valid)
    bench("characteristics", stage_chars, pos, segment, valid)

    # characteristics internals (the remaining big stage): isolate the sort,
    # the [N,K] segmented scan, and the bucket-table searchsorted
    import jax.numpy as jnp2

    @jax.jit
    def chars_sort(pos, segment, valid):
        s_cap = scfg.max_segments + 1
        key = jnp2.where(
            valid & (segment > 0) & (segment < s_cap), segment, s_cap
        ).astype(jnp2.int32)
        return jax.lax.sort((key, pos[:, 0], pos[:, 2]), num_keys=1)[0]

    key_s = bench("  chars: sort(key+2 payloads)", chars_sort,
                  pos, segment, valid)
    k_dirs = cfg.characteristics.hull_directions
    scores = jnp.zeros((pos.shape[0], k_dirs), jnp.float32)
    # time the REAL dispatch path (_seg_cummax: Pallas on TPU, XLA doubling
    # elsewhere) — timing the raw XLA helper here overstated the deployed
    # cost by ~2-3x once use_pallas_scan flipped to auto
    ccfg = cfg.characteristics
    s_cap = scfg.max_segments + 1
    n_buckets = s_cap * ccfg.max_slices
    seg_scan = jax.jit(functools.partial(
        ch._seg_cummax, key_cap=n_buckets + 1, cfg=ccfg))
    bench("  chars: [N,K] segmented scan", seg_scan, key_s, scores)
    # the real support pass is [N, K+4] (areas + x/z extents, full_bbox)
    scores12 = jnp.zeros((pos.shape[0], k_dirs + 4), jnp.float32)
    bench("  chars: [N,K+4] segmented scan", seg_scan, key_s, scores12)
    bench("  chars: [N] min-y fill scan", seg_scan, key_s, pos[:, 1])
    bench("  chars: bucket searchsorted",
          jax.jit(lambda k, v: ch._run_last_table(
              k, v, (scfg.max_segments + 1) * cfg.characteristics.max_slices,
              -3.0e38)),
          key_s, scores)
    # classification broadcast: one [N] gather of a packed per-segment i32
    sep_tab = jnp.zeros(scfg.max_segments + 1, jnp.int32)
    bench("  chars: classification gather",
          jax.jit(lambda t, s: t[jnp.clip(s, 0, scfg.max_segments)]),
          sep_tab, segment)

    bench("FULL full_pipeline", pipe, pos, valid, d)


if __name__ == "__main__":
    main()
