"""TPU probe: DTM/DSM/CHM raster cost at bench scale (15M points).

Times the two full-N height scatters, the grid JFA fill, and the chunked
fetch separately, at the demo-scene grid (~0.5 m cells) and at a forced
4096x4096 grid (the cap) to sanity-check compile/memory at the largest
supported raster.  Run bare (axon TPU): ``python tools/probe_rasters.py``.
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

N = int(os.environ.get("PROBE_POINTS", 15_000_000))


def main():
    import jax
    import jax.numpy as jnp

    from treee_tpu import rasters as rs
    from treee_tpu.io import las

    # pre-touch host buffers before device init (CLAUDE.md fresh-page rule)
    pts_store = np.empty((N, 3), np.float32)
    pts_store.fill(0)

    print(f"device: {jax.devices()[0].device_kind}", flush=True)
    t0 = time.time()
    points_per_tree = 12_000
    n_trees = max(1, int(N * 0.75) // points_per_tree)
    pts = las.synthetic_forest(
        n_trees=n_trees, spacing=7.0, points_per_tree=points_per_tree,
        ground_points=N - n_trees * points_per_tree, seed=5,
    )
    n = len(pts)
    pts_store[:n] = pts
    pos = jnp.asarray(pts_store[:n])
    y = pts_store[:n, 1]
    cls = jnp.asarray((y > np.quantile(y, 0.2)).astype(np.int32) * 2)
    live = jnp.ones(n, bool)
    print(f"gen {n:,} pts: {time.time() - t0:.1f}s", flush=True)

    lo = pts_store[:n].min(axis=0)
    hi = pts_store[:n].max(axis=0)

    for cell, cap, tag in ((0.5, 4096, "demo 0.5m"), (None, 4096, "forced 4096")):
        if cell is None:
            # force the full 4096 grid: cell = extent / (cap-1)
            cell = max(hi[0] - lo[0], hi[2] - lo[2]) / (cap - 1) * 1.0001
        (rows, cols), (ph, pw), cell = rs.grid_dims(lo, hi, cell, cap=cap)
        print(f"[{tag}] grid {rows}x{cols} (padded {ph}x{pw}) cell {cell:.3f}",
              flush=True)

        t0 = time.time()
        dtm_raw, dsm_raw = rs.height_grids(
            pos, cls == 0, live,
            jnp.float32(lo[0]), jnp.float32(lo[2]), jnp.float32(1 / cell),
            (ph, pw), (rows, cols),
        )
        _ = float(dtm_raw[0, 0])  # sync (block_until_ready is a no-op on axon)
        print(f"  scatters(+compile): {time.time() - t0:.2f}s", flush=True)
        t0 = time.time()
        dtm_raw, dsm_raw = rs.height_grids(
            pos, cls == 0, live,
            jnp.float32(lo[0]), jnp.float32(lo[2]), jnp.float32(1 / cell),
            (ph, pw), (rows, cols),
        )
        _ = float(dtm_raw[0, 0])
        print(f"  scatters(warm): {time.time() - t0:.2f}s", flush=True)

        t0 = time.time()
        grids = rs.finalize_rasters(dtm_raw, dsm_raw, rows, cols, y_offset=0.0)
        print(f"  fill+fetch(+compile): {time.time() - t0:.2f}s", flush=True)
        t0 = time.time()
        grids = rs.finalize_rasters(dtm_raw, dsm_raw, rows, cols, y_offset=0.0)
        print(f"  fill+fetch(warm): {time.time() - t0:.2f}s", flush=True)
        chm = grids["chm"]
        livec = chm[chm != rs.NODATA]
        print(f"  chm: {livec.size:,} live cells, max {livec.max():.1f} m",
              flush=True)


if __name__ == "__main__":
    main()
