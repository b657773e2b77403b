"""TPU probe: Pallas single-pass segmented cummax vs the XLA doubling scan.

Decides round-2 perf item (1) from CLAUDE.md: the characteristics support
scans ([N, chunk] columns, chunked at score_chunk=4) plus the [N] min-y
fill scan cost 203+44 ms via XLA shifted-doubling passes that move ~8x the
bytes; the Pallas kernel does one load + one store per element with a VMEM
carry across a sequential grid.

Run:  python tools/probe_pallas_scan.py        (on the TPU)
Env:  PB_POINTS (default 15_000_000), PB_BLOCK (default 8192)
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
    from treee_tpu.ops import pallas_kernels as pk

    n = int(os.environ.get("PB_POINTS", 15_000_000))
    block = int(os.environ.get("PB_BLOCK", 8192))
    ms = 384

    rng = np.random.default_rng(0)
    seg_np = np.sort(rng.integers(1, 941, n)).astype(np.int32)
    slice_np = rng.integers(0, 150, n).astype(np.int32)
    bucket_np = np.sort(seg_np * ms + slice_np).astype(np.int32)
    bucket = jnp.asarray(bucket_np)
    seg = jnp.asarray(seg_np)
    sc4 = jnp.asarray(rng.random((n, 4)).astype(np.float32))
    sc12 = jnp.asarray(rng.random((n, 12)).astype(np.float32))
    v1 = jnp.asarray(rng.random(n).astype(np.float32))

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
        print(f"{name:48s} {min(ts)*1e3:9.1f} ms   (compile {compile_s:.0f}s)",
              flush=True)
        return min(ts)

    print(f"# probe_pallas_scan n={n:,} block={block} on {jax.devices()[0]}",
          flush=True)

    # correctness spot-check on device first (small slice)
    m = 100_000
    ref = np.asarray(ch._segmented_cummax(bucket[:m], sc4[:m]))
    got = np.asarray(pk.segmented_cummax_pallas(bucket[:m], sc4[:m],
                                                block=block))
    np.testing.assert_array_equal(ref, got)
    print("device correctness [100k,4]: exact", flush=True)

    bench("xla  doubling  [N,4]", ch._segmented_cummax, bucket, sc4)
    bench("plls seg scan  [N,4]",
          lambda k, v: pk.segmented_cummax_pallas(k, v, block=block),
          bucket, sc4)
    bench("xla  doubling  [N,12]", ch._segmented_cummax, bucket, sc12)
    bench("plls seg scan  [N,12]",
          lambda k, v: pk.segmented_cummax_pallas(k, v, block=block),
          bucket, sc12)
    bench("xla  doubling  [N] min-y", ch._segmented_cummax, seg, v1)
    bench("plls seg scan  [N] min-y",
          lambda k, v: pk.segmented_cummax_pallas(k, v, block=block),
          seg, v1)


if __name__ == "__main__":
    main()
