"""Probe the chars sort variants at 15M on v5e (round-4 perf push).

Variants of ``jax.lax.sort((key, x, z), num_keys=1)``:
  S1  key only
  S2  key + 1 f32 operand
  S3  key + 2 f32 operands          (the pipeline's current form)
  S4  key + 1 i32 packed operand (x,z as 2x16-bit quantized)  [precision
      loss — measurement only]
  S5  2x in-jit repeats of S3 (scan) to cross-check dispatch amortization

Run: python tools/probe_sort4.py  (env PROBE_POINTS)
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
        jax.config.update("jax_compilation_cache_dir", "/tmp/treee_jax_cache")
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    except Exception:
        pass

    import jax.numpy as jnp

    n = int(os.environ.get("PROBE_POINTS", 15_000_000))
    rng = np.random.default_rng(0)
    key = jnp.asarray(rng.integers(0, 2**30, n, dtype=np.int32))
    x = jnp.asarray(rng.uniform(-300, 300, n).astype(np.float32))
    z = jnp.asarray(rng.uniform(-300, 300, n).astype(np.float32))

    def sync1(out):
        np.asarray(jax.tree_util.tree_leaves(out)[0].reshape(-1)[0])

    def timed(label, fn, *args, reps=3):
        sync1(fn(*args))
        t0 = time.time()
        for _ in range(reps):
            out = fn(*args)
        sync1(out)
        print(f"{label}: {(time.time() - t0) / reps * 1e3:.2f} ms",
              flush=True)

    @jax.jit
    def s1(key):
        (ks,) = jax.lax.sort((key,), num_keys=1)
        return ks[::1024]

    @jax.jit
    def s2(key, x):
        ks, xs = jax.lax.sort((key, x), num_keys=1)
        return ks[::1024].astype(jnp.float32) + xs[::1024]

    @jax.jit
    def s3(key, x, z):
        ks, xs, zs = jax.lax.sort((key, x, z), num_keys=1)
        return ks[::1024].astype(jnp.float32) + xs[::1024] + zs[::1024]

    @jax.jit
    def s4(key, x, z):
        qx = jnp.clip((x + 300.0) * (65535.0 / 600.0), 0,
                      65535).astype(jnp.int32)
        qz = jnp.clip((z + 300.0) * (65535.0 / 600.0), 0,
                      65535).astype(jnp.int32)
        packed = (qx << 16) | qz
        ks, ps = jax.lax.sort((key, packed), num_keys=1)
        return ks[::1024].astype(jnp.float32) + ps[::1024].astype(jnp.float32)

    @jax.jit
    def s1u(key):
        (ks,) = jax.lax.sort((key,), num_keys=1, is_stable=False)
        return ks[::1024]

    @jax.jit
    def s3u(key, x, z):
        ks, xs, zs = jax.lax.sort((key, x, z), num_keys=1, is_stable=False)
        return ks[::1024].astype(jnp.float32) + xs[::1024] + zs[::1024]

    @jax.jit
    def s2u(key, x):
        ks, xs = jax.lax.sort((key, x), num_keys=1, is_stable=False)
        return ks[::1024].astype(jnp.float32) + xs[::1024]

    timed("S1 sort key only (stable)", s1, key)
    timed("S1u sort key only (unstable)", s1u, key)
    timed("S2 sort key + 1 f32 (stable)", s2, key, x)
    timed("S2u sort key + 1 f32 (unstable)", s2u, key, x)
    timed("S3 sort key + 2 f32 (current, stable)", s3, key, x, z)
    timed("S3u sort key + 2 f32 (unstable)", s3u, key, x, z)
    timed("S4 sort key + packed i32", s4, key, x, z)


if __name__ == "__main__":
    main()
