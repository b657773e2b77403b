"""TPU probe: XLA CC body vs VMEM-resident Pallas sweep variants.

The stage profile pins _connected_components at ~153 ms at 15M points
([64,384,384] grids): 4-6 while bodies x (3 reduce_window sweeps + one
compacted pointer jump + full-stack change test).  cc_sweep_pallas keeps a
band's label plane VMEM-resident for K sweeps per kernel call, so the
question is how the end-to-end CC (same convergence budget) compares:

  - XLA baseline         (cc_iters=24, 3 sweeps/body)
  - pallas sweeps=16     (jump keeps long-range convergence)
  - pallas sweeps=48     (fewer jumps)

Occupancy comes from the bench's synthetic forest at 15M points so the blob
shapes are the real thing.  Also asserts label agreement across variants.

Run:  python tools/probe_cc.py            (on the TPU)
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

    from treee_tpu import segmentation as sg
    from treee_tpu.config import SegmentationConfig
    from treee_tpu.io import las

    n = int(os.environ.get("PB_POINTS", 15_000_000))
    cfg = SegmentationConfig()
    print(f"# probe_cc n={n:,} grid=[{cfg.max_bands},{cfg.grid_size},"
          f"{cfg.grid_size}] on {jax.devices()[0].device_kind}", flush=True)

    n_trees = max(1, int(n * 0.75) // 12_000)
    pts = las.synthetic_forest(
        n_trees=n_trees, spacing=7.0, points_per_tree=12_000,
        ground_points=n - n_trees * 12_000, seed=0,
    )[:n]
    pos = jnp.asarray(pts)
    valid = jnp.ones(pos.shape[0], bool)
    d = jnp.float32(0.75)
    lo, hi = sg.scene_bounds(pos, valid)
    s = sg.cell_size(lo, hi, d, cfg)
    hist = sg.anchor_histogram(pos, valid, lo[1], hi[1])
    top = sg.band_anchor(hist, lo[1], hi[1], cfg)
    band, cx, cz = sg.point_cells(pos, valid, lo, hi, s, cfg, top=top)
    occ = np.asarray(sg.moment_grids(pos, valid, band, cx, cz, cfg) > 0)
    print(f"# occupied cells: {occ.sum():,}", flush=True)
    occ = jnp.asarray(occ)

    def sync(x):
        np.asarray(jax.tree_util.tree_leaves(x)[0].reshape(-1)[0])

    variants = [  # (name, pallas_sweeps, iters, pallas_bodies)
        ("converged       ", 0, 1 << 20, 3),  # run to fixpoint: quality oracle
        ("xla 3-sweep+jump", 0, cfg.cc_iters, 3),
        ("pallas 16+jump  ", 16, cfg.cc_iters, 2),
        ("pallas 48+jump x3", 48, cfg.cc_iters, 3),
    ]
    results = {}
    for name, sweeps, iters, bodies in variants:
        fn = jax.jit(
            lambda o, it=iters, sw=sweeps, bd=bodies: sg._connected_components(
                o, it, cfg.cc_occupied_cap, pallas_sweeps=sw,
                pallas_bodies=bd)[0])
        t0 = time.perf_counter()
        out = fn(occ)
        sync(out)
        t1 = time.perf_counter()
        reps = 10
        t2 = time.perf_counter()
        for _ in range(reps):
            out = fn(occ)
        sync(out)
        dt = (time.perf_counter() - t2) / reps * 1e3
        results[name] = np.asarray(out)
        print(f"{name}  {dt:8.1f} ms/call   (compile+first {t1-t0:.1f}s)",
              flush=True)

    base = results["converged       "]
    m = base < 0x7FFFFFFF
    for name, lbl in results.items():
        agree = (lbl[m] == base[m]).mean()
        print(f"label agreement vs converged {name}: {agree:.6f}", flush=True)


if __name__ == "__main__":
    main()
