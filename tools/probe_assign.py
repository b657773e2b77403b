"""TPU probe: itemize assign_points and _extract_clusters.

Stage profile attributes 223 ms to assign (an [N] gather should floor at
~144 ms per tools/microbench.py) and ~95 ms to cluster extraction (3
compacted scatters + a [B, G*G] top_k).  Questions:

  - does precomputing the flat cell id (vs the 3-D indexed gather) shave
    the ~80 ms overhead above the gather floor?
  - does gathering from a PRE-FLATTENED [B*G*G] table differ from the
    [B,G,G] 3-D form?
  - what do top_k and the 3 scatters cost inside _extract_clusters?

Run:  python tools/probe_assign.py            (on the TPU)
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

    n = int(os.environ.get("PB_POINTS", 15_000_000))
    cfg = SegmentationConfig()
    b, g = cfg.max_bands, cfg.grid_size
    rng = np.random.default_rng(0)
    print(f"# probe_assign n={n:,} grid=[{b},{g},{g}] "
          f"on {jax.devices()[0].device_kind}", flush=True)

    band = jnp.asarray(rng.integers(0, b, n).astype(np.int32))
    cx = jnp.asarray(rng.integers(0, g, n).astype(np.int32))
    cz = jnp.asarray(rng.integers(0, g, n).astype(np.int32))
    valid = jnp.ones(n, bool)
    slot_grids = jnp.asarray(rng.integers(-1, 200, (b, g, g)).astype(np.int32))

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
        print(f"{name:42s} {dt:8.1f} ms   (compile {t1-t0:.0f}s)", flush=True)
        return out

    timeit("assign_points (3-D indexed gather)",
           jax.jit(sg.assign_points), slot_grids, band, cx, cz, valid)

    @jax.jit
    def assign_flat(sgrid, band, cx, cz, valid):
        flat = (band * g + cx) * g + cz
        slot = sgrid.reshape(-1)[flat]
        return jnp.where(valid & (slot >= 0), slot + 1, 0)

    timeit("assign via precomputed flat id", assign_flat,
           slot_grids, band, cx, cz, valid)

    flat = (band * g + cx) * g + cz
    table = slot_grids.reshape(-1)

    @jax.jit
    def gather_only(table, flat):
        return table[flat]

    timeit("bare [N] gather from flat table", gather_only, table, flat)

    # --- extract_clusters internals ---
    occupied = jnp.asarray(rng.random((b, g, g)) < 0.003)
    lbl, occ_idx, occ_valid = jax.jit(
        lambda o: sg._connected_components(o, cfg.cc_iters,
                                           cfg.cc_occupied_cap)
    )(occupied)
    cnt = jnp.where(occupied, 5, 0).astype(jnp.int32)
    lo0 = jnp.zeros(3, jnp.float32)

    timeit("_extract_clusters (full)",
           jax.jit(lambda l, c: sg._extract_clusters(
               l, c, lo0, jnp.float32(0.75), cfg.max_trees_per_band,
               cfg.min_points, occ_idx, occ_valid)), lbl, cnt)

    score = jnp.asarray(rng.integers(0, 1000, (b, g * g)).astype(np.int32))

    @jax.jit
    def topk_only(s):
        return jax.lax.top_k(s, cfg.max_trees_per_band)

    timeit("top_k alone [B, G*G] k=256", topk_only, score)


if __name__ == "__main__":
    main()
