"""Probe: [N,3] AoS position layout vs three [N] columns on v5e.

TPU layouts put the MINOR dim on the 128-wide lane axis: a f32[15M,3]
array offers 3/128 lane utilization to every elementwise/reduction pass
that consumes it, unless XLA's layout assignment transposes it.  The
pipeline's "cheap" stages (bounds 40 ms, octree keys 56 ms, cells) sit
~100x above any bandwidth floor (180 MB read = ~0.25 ms at HBM speed) —
this probes whether columnar x/y/z buys those stages back.

Run on the real TPU: python tools/probe_layout.py  (env PROBE_POINTS)
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

    import functools

    import jax.numpy as jnp

    n = int(os.environ.get("PROBE_POINTS", 15_000_000))
    rng = np.random.default_rng(0)
    host = rng.uniform(-300, 300, (n, 3)).astype(np.float32)
    pos = jnp.asarray(host)
    x = jnp.asarray(np.ascontiguousarray(host[:, 0]))
    y = jnp.asarray(np.ascontiguousarray(host[:, 1]))
    z = jnp.asarray(np.ascontiguousarray(host[:, 2]))
    valid = jnp.ones(n, bool)

    def sync1(out):
        np.asarray(jax.tree_util.tree_leaves(out)[0].reshape(-1)[0])

    def timed(label, fn, *args, reps=3):
        sync1(fn(*args))  # compile
        t0 = time.time()
        for _ in range(reps):
            out = fn(*args)
        sync1(out)
        print(f"{label}: {(time.time() - t0) / reps * 1e3:.2f} ms",
              flush=True)

    R = 3  # in-jit repeats via scan so dispatch doesn't dominate

    def scan3(body):
        @jax.jit
        def run(*args):
            def b(acc, i):
                return acc + body(jnp.float32(i) * 1e-20, *args), None

            tot, _ = jax.lax.scan(b, jnp.float32(0), jnp.arange(R))
            return tot / R

        return run

    # --- bounds: masked min+max reduction ---
    def bounds_aos(eps, pos, valid):
        big = jnp.float32(3.0e38)
        p = pos + eps  # defeat LICM
        lo = jnp.min(jnp.where(valid[:, None], p, big), axis=0)
        hi = jnp.max(jnp.where(valid[:, None], p, -big), axis=0)
        return jnp.sum(lo) + jnp.sum(hi)

    def bounds_col(eps, x, y, z, valid):
        big = jnp.float32(3.0e38)
        acc = jnp.float32(0)
        for c in (x, y, z):
            cc = c + eps
            acc += jnp.min(jnp.where(valid, cc, big))
            acc += jnp.max(jnp.where(valid, cc, -big))
        return acc

    timed("bounds [N,3] (x3 in-jit)", scan3(bounds_aos), pos, valid)
    timed("bounds 3x[N] (x3 in-jit)", scan3(bounds_col), x, y, z, valid)

    # --- morton-encode-like: quantize 3 coords + interleave bits ---
    def spread(v):
        v = (v | (v << 16)) & 0x030000FF
        v = (v | (v << 8)) & 0x0300F00F
        v = (v | (v << 4)) & 0x030C30C3
        v = (v | (v << 2)) & 0x09249249
        return v

    def enc(qx, qy, qz):
        return (spread(qx) << 2) | (spread(qy) << 1) | spread(qz)

    def keys_aos(eps, pos, valid):
        p = pos + eps
        q = jnp.clip((p * 0.001 + 0.5) * 1023.0, 0, 1023).astype(jnp.int32)
        k = enc(q[:, 0], q[:, 1], q[:, 2])
        return jnp.sum(k[::1024].astype(jnp.float32))

    def keys_col(eps, x, y, z, valid):
        qs = [jnp.clip((c + eps) * 0.001 * 1023.0 + 511.0, 0,
                       1023).astype(jnp.int32) for c in (x, y, z)]
        k = enc(*qs)
        return jnp.sum(k[::1024].astype(jnp.float32))

    timed("morton keys [N,3] (x3 in-jit)", scan3(keys_aos), pos, valid)
    timed("morton keys 3x[N] (x3 in-jit)", scan3(keys_col), x, y, z, valid)

    # --- cells-like: per-point grid coordinates + flat index ---
    def cells_aos(eps, pos, valid):
        p = pos + eps
        cx = jnp.clip((p[:, 0] * 0.01 + 64.0), 0, 127).astype(jnp.int32)
        cz = jnp.clip((p[:, 2] * 0.01 + 64.0), 0, 127).astype(jnp.int32)
        band = jnp.clip((p[:, 1] * 0.1).astype(jnp.int32), 0, 15)
        f = band * 128 * 128 + cx * 128 + cz
        return jnp.sum(f[::1024].astype(jnp.float32))

    def cells_col(eps, x, y, z, valid):
        cx = jnp.clip((x + eps) * 0.01 + 64.0, 0, 127).astype(jnp.int32)
        cz = jnp.clip((z + eps) * 0.01 + 64.0, 0, 127).astype(jnp.int32)
        band = jnp.clip((y + eps) * 0.1, 0, 15).astype(jnp.int32)
        f = band * 128 * 128 + cx * 128 + cz
        return jnp.sum(f[::1024].astype(jnp.float32))

    timed("cells [N,3] (x3 in-jit)", scan3(cells_aos), pos, valid)
    timed("cells 3x[N] (x3 in-jit)", scan3(cells_col), x, y, z, valid)

    # --- the one-time split cost: [N,3] -> three [N] columns ---
    @jax.jit
    def split(pos):
        return (jnp.squeeze(pos[:, 0:1], -1), jnp.squeeze(pos[:, 1:2], -1),
                jnp.squeeze(pos[:, 2:3], -1))

    timed("split [N,3] -> 3x[N]", split, pos, reps=3)

    # --- grid scatter fed from AoS vs columnar cells ---
    def grids_aos(eps, pos, valid):
        p = pos + eps
        cx = jnp.clip((p[:, 0] * 0.01 + 64.0), 0, 127).astype(jnp.int32)
        cz = jnp.clip((p[:, 2] * 0.01 + 64.0), 0, 127).astype(jnp.int32)
        band = jnp.clip((p[:, 1] * 0.1).astype(jnp.int32), 0, 15)
        f = jnp.where(valid, band * 128 * 128 + cx * 128 + cz, 16 * 128 * 128)
        g = jnp.zeros(16 * 128 * 128 + 1, jnp.int32).at[f].add(1)
        return jnp.sum(g[:8].astype(jnp.float32))

    def grids_col(eps, x, y, z, valid):
        cx = jnp.clip((x + eps) * 0.01 + 64.0, 0, 127).astype(jnp.int32)
        cz = jnp.clip((z + eps) * 0.01 + 64.0, 0, 127).astype(jnp.int32)
        band = jnp.clip((y + eps) * 0.1, 0, 15).astype(jnp.int32)
        f = jnp.where(valid, band * 128 * 128 + cx * 128 + cz, 16 * 128 * 128)
        g = jnp.zeros(16 * 128 * 128 + 1, jnp.int32).at[f].add(1)
        return jnp.sum(g[:8].astype(jnp.float32))

    timed("grid scatter [N,3] (x3 in-jit)", scan3(grids_aos), pos, valid)
    timed("grid scatter 3x[N] (x3 in-jit)", scan3(grids_col), x, y, z, valid)


if __name__ == "__main__":
    main()
