"""TPU probe: itemize the `cells` stage (~174 ms at 15M — suspicious).

point_cells is elementwise (+3 i32 writes), scene_bounds is two [N,3]
reductions, anchor_histogram is a ~N/64-row scatter: theoretical HBM traffic
is ~550 MB => <1 ms on v5e, yet the stage profile shows ~174 ms.  Times each
piece separately, plus reduction variants, to find where it goes.

Run:  python tools/probe_cells.py            (on the TPU)
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

    cfg = SegmentationConfig()
    n = int(os.environ.get("PROBE_N", 15_000_000))
    rng = np.random.default_rng(0)
    pos_np = rng.uniform(0, 250, (n, 3)).astype(np.float32)
    pos = jnp.asarray(pos_np)
    valid = jnp.ones(n, bool)
    d = jnp.float32(0.75)

    reps = 10

    def timeit(name, fn, *args):
        @jax.jit
        def loop(*a):
            def body(acc, _):
                out = fn(*a)
                leaves = jax.tree_util.tree_leaves(out)
                return acc + sum(
                    jnp.sum(l.reshape(-1)[:1].astype(jnp.float32))
                    for l in leaves
                ), None
            tot, _ = jax.lax.scan(body, jnp.float32(0), None, length=reps)
            return tot
        t0 = time.time()
        float(np.asarray(loop(*args)))
        print(f"{name}: compile+first {time.time() - t0:.1f}s", flush=True)
        t0 = time.time()
        float(np.asarray(loop(*args)))
        print(f"{name}: {(time.time() - t0) / reps * 1e3:.1f} ms/call",
              flush=True)

    # the full stage as profiled
    def stage_cells(pos, valid, d):
        lo, hi = sg.scene_bounds(pos, valid)
        s = sg.cell_size(lo, hi, d, cfg)
        hist = sg.anchor_histogram(pos, valid, lo[1], hi[1])
        top = sg.band_anchor(hist, lo[1], hi[1], cfg)
        return sg.point_cells(pos, valid, lo, hi, s, cfg, top=top)

    timeit("cells full      ", stage_cells, pos, valid, d)

    # pieces
    timeit("scene_bounds    ", sg.scene_bounds, pos, valid)
    lo, hi = jax.jit(sg.scene_bounds)(pos, valid)
    timeit("anchor_histogram", sg.anchor_histogram, pos, valid, lo[1], hi[1])
    s = jax.jit(lambda: sg.cell_size(lo, hi, d, cfg))()
    timeit("point_cells     ", lambda p, v: sg.point_cells(
        p, v, lo, hi, s, cfg, top=hi[1]), pos, valid)

    # reduction variants for scene_bounds
    def bounds_2d(pos, valid):
        # two-stage: [N,3] -> [N/2048, 2048?, 3] is awkward; per-column 1-D
        big = jnp.float32(3.0e38)
        m = jnp.where(valid[:, None], pos, big)
        m2 = m.reshape(-1, 2048, 3)
        return jnp.min(jnp.min(m2, axis=1), axis=0)

    if n % 2048 == 0:
        timeit("bounds 2-stage  ", bounds_2d, pos, valid)

    def bounds_nowhere(pos):
        return jnp.min(pos, axis=0), jnp.max(pos, axis=0)

    timeit("bounds no-where ", bounds_nowhere, pos)

    def cells_only_quant(pos):
        g = cfg.grid_size
        cx = jnp.clip(jnp.floor((pos[:, 0]) / s).astype(jnp.int32), 0, g - 1)
        cz = jnp.clip(jnp.floor((pos[:, 2]) / s).astype(jnp.int32), 0, g - 1)
        band = jnp.clip(jnp.floor((250.0 - pos[:, 1])).astype(jnp.int32),
                        0, cfg.max_bands - 1)
        return band, cx, cz

    timeit("quantize only   ", cells_only_quant, pos)


if __name__ == "__main__":
    main()
