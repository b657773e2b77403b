"""100M+ point survey on ONE chip via halo tiling (BASELINE.md config 5).

Generates a wide synthetic survey on the host, runs parallel/tiles.py's
tiled pipeline (every tile reuses one compiled executable), and prints one
JSON line.  Run on the real TPU:  python tools/bench_tiled.py
Env: TILED_POINTS (default 100_000_000), TILED_TILES (default 4).
"""

from __future__ import annotations

import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    import jax

    try:
        jax.config.update("jax_compilation_cache_dir", "/tmp/treee_jax_cache")
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    except Exception:
        pass

    from treee_tpu.config import DEFAULT_CONFIG
    from treee_tpu.io import las
    from treee_tpu.parallel import tiles

    n_target = int(os.environ.get("TILED_POINTS", 100_000_000))
    n_tiles = int(os.environ.get("TILED_TILES", 4))
    cfg = DEFAULT_CONFIG

    # wide survey: tree grid stretched along x so tiles cut real canopy
    ppt = 12_000
    n_trees = max(1, int(n_target * 0.75) // ppt)
    t0 = time.time()
    cache = os.environ.get("TILED_CACHE", "")
    if cache and os.path.exists(cache):
        pts = np.load(cache, mmap_mode=None)
        assert len(pts) >= n_target * 0.99, "stale TILED_CACHE for this size"
    else:
        pts = las.synthetic_forest(
            n_trees=n_trees, spacing=7.0, points_per_tree=ppt,
            ground_points=n_target - n_trees * ppt, seed=0,
        )
        if cache:
            np.save(cache, pts)
    gen_s = time.time() - t0
    n = len(pts)
    print(f"# tiled: generated {n:,} pts in {gen_s:.0f}s, {n_tiles} tiles",
          file=sys.stderr, flush=True)

    def prog(t, total):
        print(f"# tiled: tile {t + 1}/{total}", file=sys.stderr, flush=True)

    t0 = time.time()
    seg, cls, tables, info = tiles.tiled_pipeline(
        pts, n_tiles=n_tiles, max_distance=cfg.segmentation.max_distance,
        cfg=cfg, progress=prog,
    )
    wall = time.time() - t0
    labeled = float((seg > 0).mean())
    # tile 0 pays the (persistently cached) XLA compile; tiles 1+ are the
    # steady state a longer survey would see for every additional tile
    tt = info["tile_times"]
    steady_s = sum(s + r for s, r in tt[1:]) if len(tt) > 1 else None
    steady = (
        round((n / n_tiles) * (n_tiles - 1) / steady_s / 1e6, 3)
        if steady_s else None
    )
    # optional: CHM raster over the full survey (TILED_CHM=1) — exercises
    # the slab-streamed raster path at 100M scale (device-resident min/max
    # accumulators, parallel/tiles.tiled_rasters)
    chm_s = chm_cells = None
    if os.environ.get("TILED_CHM"):
        from treee_tpu import rasters as rs

        t0 = time.time()
        grids, (r_rows, r_cols), r_cell = tiles.tiled_rasters(
            pts, cls, cell=float(os.environ.get("TILED_CHM_CELL", "1.0")),
        )
        chm_s = round(time.time() - t0, 1)
        chm_cells = int((grids["chm"] != rs.NODATA).sum())
        print(f"# tiled: chm {r_rows}x{r_cols} @ {r_cell:.2f} m in {chm_s}s",
              file=sys.stderr, flush=True)

    print(json.dumps({
        "metric": "tiled survey Mpts/s (one chip, halo tiles + reconcile)",
        "value": round(n / wall / 1e6, 3),
        "unit": "Mpts/s",
        "points": n,
        "tiles": n_tiles,
        "tile_capacity": info["capacity"],
        "wall_s": round(wall, 2),
        "gen_s": round(gen_s, 1),
        "sort_s": round(info["sort_s"], 1),
        "tile_slice_s": [round(s, 1) for s, _ in tt],
        "tile_run_s": [round(r, 1) for _, r in tt],
        "steady_mpts_s": steady,
        "n_segments": info["n_segments"],
        "labeled_frac": round(labeled, 4),
        "chm_s": chm_s,
        "chm_live_cells": chm_cells,
        "device": str(jax.devices()[0]),
    }), flush=True)


if __name__ == "__main__":
    main()
