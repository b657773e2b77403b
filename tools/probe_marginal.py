"""Marginal in-pipeline stage costs: time jitted PREFIXES of the fused
pipeline and difference them.

tools/profile_stages.py times stages in separate executables, which adds
~30 ms dispatch each and loses cross-stage fusion; the prefix deltas here
are the truth about where the fused 15M step spends its time (each prefix
returns a scalar derived from the stage output so XLA cannot DCE it).

Run on the real TPU:  python tools/probe_marginal.py
Env: PROBE_POINTS (default 15_000_000), PROBE_REPS (default 3).
"""

from __future__ import annotations

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

    n = int(os.environ.get("PROBE_POINTS", 15_000_000))
    reps = int(os.environ.get("PROBE_REPS", 3))
    cfg = DEFAULT_CONFIG
    scfg, ccfg = cfg.segmentation, cfg.characteristics
    S = scfg.max_segments + 1

    points_per_tree = 12_000
    n_trees = max(1, int(n * 0.75) // points_per_tree)
    pts = las.synthetic_forest(
        n_trees=n_trees, spacing=7.0, points_per_tree=points_per_tree,
        ground_points=n - n_trees * points_per_tree, seed=0)
    pos = jnp.asarray(pts)
    valid = jnp.ones(len(pts), bool)
    d = jnp.float32(scfg.max_distance)
    print(f"# probe_marginal: {len(pts):,} points on {jax.devices()[0]}",
          file=sys.stderr, flush=True)

    def seg_prefix(stop):
        """segment_points cut after a named stage; returns a forcing scalar."""
        def fn(pos, valid, d):
            lo, hi = sg.scene_bounds(pos, valid)
            s = sg.cell_size(lo, hi, d, scfg)
            hist = sg.anchor_histogram(pos, valid, lo[1], hi[1])
            top = sg.band_anchor(hist, lo[1], hi[1], scfg)
            band, cx, cz = sg.point_cells(pos, valid, lo, hi, s, scfg, top=top)
            if stop == "cells":
                return jnp.sum(band) + jnp.sum(cx) + jnp.sum(cz)
            cnt = sg.moment_grids(pos, valid, band, cx, cz, scfg)
            if stop == "grids":
                return jnp.sum(cnt)
            slot_grids, n_alloc, tp, ab = sg.band_scan(cnt, lo, s, d, scfg)
            if stop == "band_scan":
                return jnp.sum(slot_grids) + n_alloc
            segment = sg.assign_points(slot_grids, band, cx, cz, valid)
            return jnp.sum(segment)
        return fn

    def full_prefix(stop):
        """octree + segmentation + characteristics cut inside chars."""
        def fn(pos, valid, d):
            tree_keys = octree.build(pos, valid).keys
            res = sg.segment_points(pos, valid, d, scfg)
            if stop == "segment":
                return jnp.sum(tree_keys) + jnp.sum(res.segment)
            table, classification = ch.compute_segments(
                pos, res.segment, valid, S, ccfg, full_bbox=False)
            if stop == "table":
                # force everything EXCEPT the final [N] classification gather
                leaves = jax.tree_util.tree_leaves(table)
                return sum(jnp.sum(x) for x in leaves)
            return (jnp.sum(classification)
                    + jnp.sum(table.trunk_height)
                    + jnp.sum(tree_keys))
        return fn

    def timeit(name, fn):
        jitted = jax.jit(fn)
        t0 = time.time()
        out = jitted(pos, valid, d)
        np.asarray(out)  # honest sync through the tunnel
        compile_s = time.time() - t0
        best = 1e9
        for _ in range(reps):
            t0 = time.time()
            np.asarray(jitted(pos, valid, d))
            best = min(best, time.time() - t0)
        print(f"{name:24s} {best * 1e3:8.1f} ms   (compile {compile_s:.0f}s)",
              flush=True)
        return best

    ts = {}
    ts["octree_keys"] = timeit(
        "octree.keys only",
        lambda pos, valid, d: jnp.sum(octree.build(pos, valid).keys))
    for stop in ("cells", "grids", "band_scan", "assign"):
        ts[stop] = timeit(f"seg..{stop}", seg_prefix(stop))
    for stop in ("segment", "table", "full"):
        ts[stop] = timeit(f"full..{stop}", full_prefix(stop))

    print("\n# marginals:")
    print(f"  grids      - cells    = {(ts['grids'] - ts['cells']) * 1e3:7.1f} ms")
    print(f"  band_scan  - grids    = {(ts['band_scan'] - ts['grids']) * 1e3:7.1f} ms")
    print(f"  assign     - band     = {(ts['assign'] - ts['band_scan']) * 1e3:7.1f} ms")
    print(f"  chars-table- segment  = {(ts['table'] - ts['segment']) * 1e3:7.1f} ms")
    print(f"  classify   - table    = {(ts['full'] - ts['table']) * 1e3:7.1f} ms")
    print(f"  octree in full (approx) = {(ts['segment'] - ts['assign']) * 1e3:7.1f} ms")


if __name__ == "__main__":
    main()
