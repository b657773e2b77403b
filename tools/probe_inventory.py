"""Itemize the whole-forest inventory pass (bench inventory_s = 3.84 s at
15M — 5x the full segmentation pipeline; find out where it goes before
redesigning).

Run on the real TPU:  python tools/probe_inventory.py
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

    from treee_tpu import rbv as rbv_mod
    from treee_tpu import segmentation as sg
    from treee_tpu import trunk_axis as ta
    from treee_tpu.cloud import CLASS_TRUNK
    from treee_tpu.config import DEFAULT_CONFIG
    from treee_tpu.io import las
    from treee_tpu.pipeline import _segment_class_counts, full_pipeline

    n = int(os.environ.get("PROBE_POINTS", 15_000_000))
    cfg = DEFAULT_CONFIG
    S = cfg.segmentation.max_segments + 1
    ppt = 12_000
    nt = int(n * 0.75) // ppt
    pts = las.synthetic_forest(n_trees=nt, spacing=7.0, points_per_tree=ppt,
                               ground_points=n - nt * ppt, seed=0)
    pos = jnp.asarray(pts)
    valid = jnp.ones(len(pts), bool)
    seg, cls, _, _ = jax.jit(
        lambda p, v: full_pipeline(p, v, 0.75, cfg))(pos, valid)
    np.asarray(seg[0])

    def timeit(name, fn, *a):
        j = jax.jit(fn)
        t0 = time.time()
        out = j(*a)
        np.asarray(jax.tree_util.tree_leaves(out)[0].reshape(-1)[0])
        c = time.time() - t0
        best = 1e9
        for _ in range(3):
            t0 = time.time()
            out = j(*a)
            np.asarray(jax.tree_util.tree_leaves(out)[0].reshape(-1)[0])
            best = min(best, time.time() - t0)
        print(f"{name:30s} {best * 1e3:8.1f} ms (compile {c:.0f}s)",
              flush=True)

    live = valid & (seg > 0) & (seg < S)
    trunk_mask = live & (cls == CLASS_TRUNK)

    timeit("average_direction", lambda p, m, s_: ta.batched_average_direction(
        p, m, s_, S).direction.sum(), pos, trunk_mask, seg)
    axes = ta.batched_average_direction(pos, trunk_mask, seg, S)
    tfs = ta.batched_axis_transform(axes)

    def transform_apply(p, s_, t):
        def g(i, j):
            return jnp.take(t[:, i, j], s_)
        px = p[:, 0] - g(0, 3)
        py = p[:, 1] - g(1, 3)
        pz = p[:, 2] - g(2, 3)
        x = px * g(0, 0) + py * g(1, 0) + pz * g(2, 0)
        y = px * g(0, 1) + py * g(1, 1) + pz * g(2, 1)
        z = px * g(0, 2) + py * g(1, 2) + pz * g(2, 2)
        return x.sum() + y.sum() + z.sum()

    timeit("transform (12 gathers)", transform_apply, pos, seg, tfs)
    timeit("split_rbv (full)", lambda p, c_, m, s_, t: rbv_mod.batched_split_rbv(
        p, c_, m, s_, S, t)[0].distances.sum(), pos, cls, live, seg, tfs)
    timeit("class counts", lambda s_, c_, m: _segment_class_counts(
        s_, c_, m, S).sum(), seg, cls, live)

    def inventory_pass(p, s_, c_, v):
        live = v & (s_ > 0) & (s_ < S)
        axes = ta.batched_average_direction(
            p, live & (c_ == CLASS_TRUNK), s_, S)
        tfs = ta.batched_axis_transform(axes)
        crown, trunk = rbv_mod.batched_split_rbv(p, c_, live, s_, S, tfs)
        tr = rbv_mod.batched_traits(crown, trunk)
        counts = _segment_class_counts(s_, c_, live, S)
        return tr.diameter_breast_height, tr.crown_volume, counts

    timeit("inventory_pass (full)", inventory_pass, pos, seg, cls, valid)


if __name__ == "__main__":
    main()
