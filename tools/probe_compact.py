"""Probe: compact_indices forms at bench scale (round 5).

Measures the packed-key unstable-sort compaction (ops/octree.compact_indices,
round-5 form) against the cumsum + [N]-operand scatter form it replaced, at
15M rows on the real chip.  Receipt for the curvature_ms drop in BENCH_r05:
the compaction was ~200 ms of the 342 ms focused-segment cost (CLAUDE.md).

Run:  python tools/probe_compact.py [n_points]
"""
from __future__ import annotations

import sys
import time

import jax
import jax.numpy as jnp
import numpy as np


def sync1(x):
    return np.asarray(jax.tree_util.tree_leaves(x)[0].reshape(-1)[0])


def main():
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 15_000_000
    cap = 65536
    rng = np.random.default_rng(0)
    mask_np = rng.random(n) < (40_000 / n)
    mask = jnp.asarray(mask_np)
    reps = 8

    def scatter_form(m, cap):
        pos_idx = jnp.cumsum(m.astype(jnp.int32)) - 1
        tgt = jnp.where(m & (pos_idx < cap), pos_idx, cap)
        count = jnp.minimum(jnp.sum(m.astype(jnp.int32)), cap)
        src = jnp.arange(m.shape[0], dtype=jnp.int32)
        idx = jnp.zeros(cap + 1, jnp.int32).at[tgt].set(src, mode="drop")
        return count, idx[:cap]

    def sort_form(m, cap):
        src = jnp.arange(m.shape[0], dtype=jnp.int32)
        keys = jnp.where(m, src, src | (1 << 30))
        keys = jax.lax.sort(keys, is_stable=False)
        count = jnp.minimum(jnp.sum(m.astype(jnp.int32)), cap)
        head = keys[:cap] & ((1 << 30) - 1)
        idx = jnp.where(jnp.arange(cap, dtype=jnp.int32) < count, head, 0)
        return count, idx

    for name, fn in [("scatter", scatter_form), ("sort", sort_form)]:
        @jax.jit
        def scan_fn(m, d_stack, fn=fn):
            def body(acc, d_i):
                count, idx = fn(m & (d_i > 0), cap)
                return acc + count + idx[-1], None
            tot, _ = jax.lax.scan(body, jnp.int32(0), d_stack)
            return tot

        d = jnp.ones(reps, jnp.int32)
        sync1(scan_fn(mask, d))  # compile
        t0 = time.time()
        sync1(scan_fn(mask, d))
        ms = (time.time() - t0) / reps * 1e3
        print(f"{name:8s} {ms:8.1f} ms  (n={n}, cap={cap})", flush=True)


if __name__ == "__main__":
    main()
