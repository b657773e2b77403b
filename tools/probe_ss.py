"""TPU probe: segment-seeded bisection vs scan_unrolled bucket searchsorted.

_run_end_index does searchsorted(bucket_s, arange(S*MS), side=right) with
method="scan_unrolled": 24 lockstep rounds (log2 N) of a [262k] gather,
101.2 ms measured at 15M (probe_extract).  But compute_segments already
knows each SEGMENT's run bounds (left/right from the count searchsorted on
2k queries — cheap), and bucket runs are sub-runs of segment runs: seeding
each bucket query's bisection window with its segment's [left, right) cuts
rounds to log2(max live segment run), and a lax.while_loop stops as soon as
every window closes.  Also sweeps Pallas CC sweep/body configs below the
measured-converged (48, 3) default for a cheaper fully-converged point.

Run:  python tools/probe_ss.py            (on the TPU)
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

    n = int(os.environ.get("PB_POINTS", 15_000_000))
    s_cap = 2049
    ms = 128
    n_buckets = s_cap * ms
    rng = np.random.default_rng(0)
    print(f"# probe_ss n={n:,} buckets={n_buckets:,} "
          f"on {jax.devices()[0].device_kind}", flush=True)

    # realistic run structure: ~2k live segments, lognormal sizes, 15% dead
    n_live = 2000
    sizes = rng.lognormal(0.0, 1.2, n_live)
    sizes = (sizes / sizes.sum() * (n * 0.85)).astype(np.int64)
    dead = n - int(sizes.sum())
    seg = np.repeat(np.arange(n_live) + 1, sizes)
    slc = np.concatenate([
        np.sort(rng.integers(0, ms, sz)) for sz in sizes
    ]).astype(np.int64)
    bucket = seg * ms + slc
    bucket = np.concatenate([bucket, np.full(dead, s_cap * ms, np.int64)])
    bucket_s = jnp.asarray(np.sort(bucket).astype(np.int32))
    print(f"# live {len(seg):,} dead {dead:,} max run {sizes.max():,}",
          flush=True)

    def sync(x):
        np.asarray(jax.tree_util.tree_leaves(x)[0].reshape(-1)[0])

    def timeit(name, fn, *args, reps=5):
        t0 = time.perf_counter()
        out = fn(*args)
        sync(out)
        t1 = time.perf_counter()
        for _ in range(reps):
            out = fn(*args)
        sync(out)
        dt = (time.perf_counter() - t1) / reps * 1e3
        print(f"{name:44s} {dt:8.1f} ms   (compile {t1-t0:.0f}s)", flush=True)
        return out

    q = jnp.arange(n_buckets, dtype=jnp.int32)

    @jax.jit
    def baseline(ks):
        return jnp.searchsorted(ks, q, side="right",
                                method="scan_unrolled").astype(jnp.int32)

    ref = timeit("scan_unrolled searchsorted (baseline)", baseline, bucket_s)

    @jax.jit
    def seg_bounds(ks):
        sq = jnp.arange(s_cap + 1, dtype=jnp.int32) * ms
        return jnp.searchsorted(ks, sq, side="left",
                                method="scan_unrolled").astype(jnp.int32)

    @jax.jit
    def seeded(ks):
        b = seg_bounds(ks)
        segq = q // ms
        lo = b[segq]
        hi = b[segq + 1]

        def cond(c):
            lo, hi = c
            return jnp.any(lo < hi)

        def body(c):
            lo, hi = c
            mid = (lo + hi) >> 1
            le = ks[mid] <= q
            return (jnp.where(le, mid + 1, lo), jnp.where(le, hi, mid))

        lo, _ = jax.lax.while_loop(cond, body, (lo, hi))
        return lo

    got = timeit("seeded bisection (while_loop)", seeded, bucket_s)
    print(f"# seeded == baseline: {bool(jnp.all(got == ref))}", flush=True)

    @jax.jit
    def seeded_fixed(ks):
        b = seg_bounds(ks)
        segq = q // ms
        lo = b[segq]
        hi = b[segq + 1]
        for _ in range(24):  # same round count as baseline, seeded windows
            open_ = lo < hi
            mid = (lo + hi) >> 1
            le = ks[mid] <= q
            lo = jnp.where(open_ & le, mid + 1, lo)
            hi = jnp.where(open_ & ~le, mid, hi)
        return lo

    got2 = timeit("seeded bisection (24 fixed rounds)", seeded_fixed, bucket_s)
    print(f"# fixed  == baseline: {bool(jnp.all(got2 == ref))}", flush=True)

    # ---- CC sweep/body configs below the (48, 3) measured-converged point
    from treee_tpu import segmentation as sg
    from treee_tpu.config import SegmentationConfig

    cfg = SegmentationConfig()
    pos = rng.uniform(0, 250, (4_000_000, 3)).astype(np.float32)
    # clump into tree-ish columns for realistic component shapes
    tcx = rng.uniform(0, 250, 400)
    tcz = rng.uniform(0, 250, 400)
    t = rng.integers(0, 400, len(pos))
    pos[:, 0] = tcx[t] + rng.normal(0, 2.0, len(pos))
    pos[:, 2] = tcz[t] + rng.normal(0, 2.0, len(pos))
    posj = jnp.asarray(pos)
    valid = jnp.ones(len(pos), bool)
    lo3, hi3 = jax.jit(sg.scene_bounds)(posj, valid)
    d = 0.5
    s = sg.cell_size(lo3, hi3, d, cfg)
    hist = sg.anchor_histogram(posj, valid, lo3[1], hi3[1])
    top = sg.band_anchor(hist, lo3[1], hi3[1], cfg)
    band, cxq, czq = sg.point_cells(posj, valid, lo3, hi3, s, cfg, top=top)
    occ = sg.moment_grids(posj, valid, band, cxq, czq, cfg) > 0
    print(f"# occupied cells {int(jnp.sum(occ)):,}", flush=True)

    def cc(sweeps, bodies, iters):
        return jax.jit(lambda o: sg._connected_components(
            o, iters, cfg.cc_occupied_cap,
            pallas_sweeps=sweeps, pallas_bodies=bodies)[0])

    lbl_ref = timeit("cc converged oracle", cc(0, 3, 1 << 20), occ)
    for sweeps, bodies in [(48, 3), (40, 3), (32, 3), (48, 2), (32, 2)]:
        lbl = timeit(f"cc pallas {sweeps}x{bodies}",
                     cc(sweeps, bodies, cfg.cc_iters), occ)
        agree = float(jnp.mean((lbl == lbl_ref) | ~occ))
        print(f"#   agreement {agree:.6f}", flush=True)


if __name__ == "__main__":
    main()
