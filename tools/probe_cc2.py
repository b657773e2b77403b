"""A/B the Pallas CC (sweeps x bodies) budget on the bench-scale grid.

Round-2 measured (48 sweeps x <=3 jump bodies) fully converged at 94 ms;
the jumps (two occ_cap gathers + one scatter each) are the cost, the VMEM
sweeps are nearly free.  If ~96 sweeps propagate further than a tree
cluster's diameter, the while_loop's convergence flag exits after ONE body
and saves a ~40 ms jump phase.  This measures time + agreement vs the
converged reference for several (sweeps, bodies) points on the REAL bench
occupancy (synthetic forest -> moment grids).

Run on the real TPU:  python tools/probe_cc2.py
"""

from __future__ import annotations

import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    import jax

    try:
        jax.config.update("jax_compilation_cache_dir",
                          os.environ.get("JAX_CACHE_DIR",
                                         "/tmp/treee_jax_cache"))
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    except Exception:
        pass

    import jax.numpy as jnp

    from treee_tpu import segmentation as sg
    from treee_tpu.config import DEFAULT_CONFIG
    from treee_tpu.io import las

    n = int(os.environ.get("PROBE_POINTS", 15_000_000))
    scfg = DEFAULT_CONFIG.segmentation
    points_per_tree = 12_000
    n_trees = max(1, int(n * 0.75) // points_per_tree)
    pts = las.synthetic_forest(
        n_trees=n_trees, spacing=7.0, points_per_tree=points_per_tree,
        ground_points=n - n_trees * points_per_tree, seed=0)
    pos = jnp.asarray(pts)
    valid = jnp.ones(len(pts), bool)
    d = jnp.float32(scfg.max_distance)

    @jax.jit
    def grids(pos, valid, d):
        lo, hi = sg.scene_bounds(pos, valid)
        s = sg.cell_size(lo, hi, d, scfg)
        hist = sg.anchor_histogram(pos, valid, lo[1], hi[1])
        top = sg.band_anchor(hist, lo[1], hi[1], scfg)
        band, cx, cz = sg.point_cells(pos, valid, lo, hi, s, scfg, top=top)
        return sg.moment_grids(pos, valid, band, cx, cz, scfg)

    cnt = grids(pos, valid, d)
    occ = cnt > 0
    occ_np_total = int(np.asarray(jnp.sum(occ.astype(jnp.int32))))
    print(f"# occupied cells: {occ_np_total:,} of {occ.size:,}", flush=True)

    def run_cfg(sweeps, bodies, label):
        fn = jax.jit(lambda o: sg._connected_components(
            o, scfg.cc_iters, scfg.cc_occupied_cap,
            pallas_sweeps=sweeps, pallas_bodies=bodies)[0])
        t0 = time.time()
        lbl = fn(occ)
        np.asarray(lbl.reshape(-1)[0])
        compile_s = time.time() - t0
        best = 1e9
        for _ in range(3):
            t0 = time.time()
            lbl = fn(occ)
            np.asarray(lbl.reshape(-1)[0])
            best = min(best, time.time() - t0)
        print(f"{label:16s} {best * 1e3:7.1f} ms  (compile {compile_s:.0f}s)",
              flush=True)
        return np.asarray(lbl)

    ref = run_cfg(scfg.cc_pallas_sweeps, scfg.cc_pallas_bodies,
                  f"({scfg.cc_pallas_sweeps},{scfg.cc_pallas_bodies}) ref")
    # oracle: generous budget, definitely converged
    oracle = run_cfg(64, 6, "(64,6) oracle")
    print(f"# ref vs oracle agreement: "
          f"{float((ref == oracle).mean()):.6f}", flush=True)
    for sweeps, bodies in [(32, 2), (48, 2), (64, 2), (24, 2)]:
        lbl = run_cfg(sweeps, bodies, f"({sweeps},{bodies})")
        agree = float((lbl == oracle).mean())
        print(f"#   agreement vs oracle: {agree:.6f}", flush=True)


if __name__ == "__main__":
    main()
