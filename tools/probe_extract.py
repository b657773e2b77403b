"""TPU probe: itemize the bucket run-end extraction (173 ms in the stage
profile: searchsorted + [262k,12] row gather) and test Mosaic gather support.

Pieces timed at 15M points, s_cap=2048, ms=128 (262,144 buckets):
  - _run_end_index alone (the searchsorted)
  - the [n_buckets, 12] row gather given precomputed (idx, hit)
  - a planar variant: 12 single-row gathers from a (12, N) layout (the Pallas
    scan kernel already produces this internally before transposing back)
  - searchsorted method="sort" for comparison

Also probes whether this Mosaic version lowers jnp.take_along_axis inside a
Pallas kernel (a vectorized VMEM gather would beat the one-hot tricks for the
classification/assign table lookups).

Run:  python tools/probe_extract.py            (on the TPU)
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

    n = int(os.environ.get("PB_POINTS", 15_000_000))
    s_cap, ms = 2048, 128
    n_buckets = s_cap * ms
    rng = np.random.default_rng(0)
    seg_np = np.sort(rng.integers(1, 941, n)).astype(np.int32)
    slice_np = rng.integers(0, ms, n).astype(np.int32)
    bucket_np = np.sort(seg_np * ms + slice_np).astype(np.int32)
    bucket = jnp.asarray(bucket_np)
    val = jnp.asarray(rng.random((n, 12)).astype(np.float32))
    val_t = jnp.asarray(np.ascontiguousarray(np.asarray(val).T))

    def sync(out):
        for leaf in jax.tree_util.tree_leaves(out):
            np.asarray(leaf.reshape(-1)[0])
        return out

    def bench(name, fn, *args, reps=3):
        f = jax.jit(fn)
        t0 = time.time()
        sync(f(*args))
        compile_s = time.time() - t0
        ts = []
        for _ in range(reps):
            t0 = time.time()
            sync(f(*args))
            ts.append(time.time() - t0)
        print(f"{name:44s} {min(ts)*1e3:9.1f} ms   (compile {compile_s:.0f}s)",
              flush=True)
        return min(ts)

    print(f"# probe_extract n={n:,} buckets={n_buckets:,} on "
          f"{jax.devices()[0]}", flush=True)

    bench("run_end_index (searchsorted)",
          lambda b: ch._run_end_index(b, n_buckets), bucket)
    idx, hit = jax.jit(lambda b: ch._run_end_index(b, n_buckets))(bucket)
    idx, hit = jax.block_until_ready(idx), jax.block_until_ready(hit)

    bench("row gather [262k,12] from [N,12]",
          lambda v, i, h: jnp.where(h[:, None], v[i], -3e38), val, idx, hit)
    bench("planar 12x [262k] from (12,N)",
          lambda v, i, h: jnp.where(
              h[None, :], v[:, i], -3e38), val_t, idx, hit)
    bench("searchsorted method=sort",
          lambda b: jnp.searchsorted(
              b, jnp.arange(n_buckets, dtype=b.dtype), side="right",
              method="sort"), bucket)

    # --- Mosaic in-kernel gather feasibility ---
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    def try_kernel(name, kernel, out_shape, *args):
        try:
            r = pl.pallas_call(kernel, out_shape=out_shape)(*args)
            r = np.asarray(r)
            print(f"pallas {name}: SUPPORTED", flush=True)
            return True
        except Exception as e:
            msg = str(e).split("\n")[0][:140]
            print(f"pallas {name}: unsupported ({msg})", flush=True)
            return False

    tab8 = jnp.asarray(rng.random((8, 128)).astype(np.float32))
    idx8 = jnp.asarray(rng.integers(0, 8, (8, 128)).astype(np.int32))

    def k_taa0(tab_ref, idx_ref, out_ref):
        out_ref[:] = jnp.take_along_axis(tab_ref[:], idx_ref[:], axis=0)

    try_kernel("take_along_axis axis=0 (8,128)", k_taa0,
               jax.ShapeDtypeStruct((8, 128), jnp.float32), tab8, idx8)

    tab256 = jnp.asarray(rng.random((256, 128)).astype(np.float32))
    idx256 = jnp.asarray(rng.integers(0, 256, (256, 128)).astype(np.int32))
    try_kernel("take_along_axis axis=0 (256,128)", k_taa0,
               jax.ShapeDtypeStruct((256, 128), jnp.float32), tab256, idx256)

    tabl = jnp.asarray(rng.random((8, 128)).astype(np.float32))
    idxl = jnp.asarray(rng.integers(0, 128, (8, 128)).astype(np.int32))

    def k_taa1(tab_ref, idx_ref, out_ref):
        out_ref[:] = jnp.take_along_axis(tab_ref[:], idx_ref[:], axis=1)

    try_kernel("take_along_axis axis=1 (8,128)", k_taa1,
               jax.ShapeDtypeStruct((8, 128), jnp.float32), tabl, idxl)

    def k_take(tab_ref, idx_ref, out_ref):
        # 1-D table indexed by a 2-D index grid (the classification shape)
        out_ref[:] = tab_ref[0, idx_ref[:]]

    try_kernel("vector index tab[0, idx2d] (8,128)", k_take,
               jax.ShapeDtypeStruct((8, 128), jnp.float32), tabl, idxl)


if __name__ == "__main__":
    main()
