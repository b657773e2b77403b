"""Probe: brute-force k-NN variants at focused-segment scale (round 5).

The focused curvature/normals recompute (ops/neighbors.knn_bruteforce) costs
~250 ms at 39k members post-compaction-fix.  The suspect is lax.top_k over
the [tile, cap] distance rows (cap ~41k columns).  Variants, all EXACT:

  A  current:   top_k(-d, k) over the full row
  B  two-stage: reshape rows into B-column blocks, top_k(k) per block,
                then top_k(k) over the block winners (the global k-th
                smallest must be in its block's top-k -> exact)
  C  bigger query tile (2048) with the two-stage reduce
  D  approx_min_k (NOT exact; reference line only)

Run:  python tools/probe_knn.py [n_points]

RESULT (v5e, 2026-08-21, n=40960): A flat 238.4 ms / B two-stage 606-961 ms
(the [tile, nb, k] blocked top_k lowers 3-4x WORSE than one wide row) /
D approx_max_k 28.4 ms at dist-match 0.796 (recall ladder + downstream
curvature deltas in tools/probe_knn_recall.py — approx is a dead end).
The exact wide-row top_k IS the v5e floor for this shape.
"""
from __future__ import annotations

import functools
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

INF = jnp.float32(3.0e38)


def sync1(x):
    return np.asarray(jax.tree_util.tree_leaves(x)[0].reshape(-1)[0])


def _pairwise_sqdist(q, p):
    qn = jnp.sum(q * q, axis=-1, keepdims=True)
    pn = jnp.sum(p * p, axis=-1)
    cross = jnp.dot(q, p.T, preferred_element_type=jnp.float32,
                    precision=jax.lax.Precision.HIGHEST)
    return jnp.maximum(qn + pn[None, :] - 2.0 * cross, 0.0)


def knn_flat(pos, valid, k, tile):
    n = pos.shape[0]
    pad = (-n) % tile
    qpos = jnp.pad(pos, ((0, pad), (0, 0)))
    p_masked = jnp.where(valid[:, None], pos, INF)

    def one_tile(q):
        d = _pairwise_sqdist(q, p_masked)
        d = jnp.where(valid[None, :], d, INF)
        neg, idx = jax.lax.top_k(-d, k)
        return idx.astype(jnp.int32), -neg

    idx, dist = jax.lax.map(one_tile, qpos.reshape(-1, tile, 3))
    return idx.reshape(-1, k)[:n], dist.reshape(-1, k)[:n]


def knn_two_stage(pos, valid, k, tile, block):
    n = pos.shape[0]
    pad = (-n) % tile
    qpos = jnp.pad(pos, ((0, pad), (0, 0)))
    p_masked = jnp.where(valid[:, None], pos, INF)
    nb = -(-n // block)
    pcols = nb * block

    def one_tile(q):
        d = _pairwise_sqdist(q, p_masked)
        d = jnp.where(valid[None, :], d, INF)
        d = jnp.pad(d, ((0, 0), (0, pcols - n)), constant_values=INF)
        db = d.reshape(tile, nb, block)
        negb, idxb = jax.lax.top_k(-db, k)          # [tile, nb, k]
        cand_idx = (idxb + (jnp.arange(nb, dtype=jnp.int32) * block)[None, :, None])
        neg, sel = jax.lax.top_k(negb.reshape(tile, nb * k), k)
        idx = jnp.take_along_axis(cand_idx.reshape(tile, nb * k), sel, axis=1)
        return idx.astype(jnp.int32), -neg

    idx, dist = jax.lax.map(one_tile, qpos.reshape(-1, tile, 3))
    return idx.reshape(-1, k)[:n], dist.reshape(-1, k)[:n]


def knn_approx(pos, valid, k, tile):
    n = pos.shape[0]
    pad = (-n) % tile
    qpos = jnp.pad(pos, ((0, pad), (0, 0)))
    p_masked = jnp.where(valid[:, None], pos, INF)

    def one_tile(q):
        d = _pairwise_sqdist(q, p_masked)
        d = jnp.where(valid[None, :], d, INF)
        neg, idx = jax.lax.approx_max_k(-d, k)
        return idx.astype(jnp.int32), -neg

    idx, dist = jax.lax.map(one_tile, qpos.reshape(-1, tile, 3))
    return idx.reshape(-1, k)[:n], dist.reshape(-1, k)[:n]


def main():
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 40960
    k = 31
    rng = np.random.default_rng(0)
    pos = jnp.asarray(rng.random((n, 3), dtype=np.float32) * 30.0)
    valid = jnp.asarray(rng.random(n) < 0.96)
    reps = 4

    variants = [
        ("A flat t=1024", functools.partial(knn_flat, tile=1024)),
        ("B 2stage b=256", functools.partial(knn_two_stage, tile=1024, block=256)),
        ("B 2stage b=512", functools.partial(knn_two_stage, tile=1024, block=512)),
        ("B 2stage b=1024", functools.partial(knn_two_stage, tile=1024, block=1024)),
        ("C 2stage t=2048 b=512", functools.partial(knn_two_stage, tile=2048, block=512)),
        ("D approx t=1024", functools.partial(knn_approx, tile=1024)),
    ]

    ref = None
    for name, fn in variants:
        @jax.jit
        def scan_fn(pos, valid, d_stack, fn=fn):
            def body(acc, d_i):
                idx, dist = fn(pos, valid & (d_i > 0), k=k)
                return acc + dist[0, -1] + dist[-1, -1], None
            tot, _ = jax.lax.scan(body, jnp.float32(0.0), d_stack)
            return tot

        d = jnp.ones(reps, jnp.int32)
        try:
            sync1(scan_fn(pos, valid, d))  # compile
            t0 = time.time()
            sync1(scan_fn(pos, valid, d))
            ms = (time.time() - t0) / reps * 1e3
        except Exception as e:
            print(f"{name:24s} FAILED: {e}", flush=True)
            continue
        # exactness: compare sorted distance rows vs variant A
        idx, dist = fn(pos, valid, k=k)
        dh = np.sort(np.asarray(dist), axis=1)
        if ref is None:
            ref = dh
            match = 1.0
        else:
            match = float(np.mean(np.isclose(dh, ref, rtol=1e-5, atol=1e-6)))
        print(f"{name:24s} {ms:8.1f} ms   dist-match {match:.6f}", flush=True)


if __name__ == "__main__":
    main()
