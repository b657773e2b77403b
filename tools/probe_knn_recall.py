"""Probe: approx_max_k recall ladder vs exact top_k for the focused k-NN.

RESULT (v5e, 2026-08-21, 40960 clustered points, k=31): approx_max_k is a
DEAD END for curvature.  recall=0.95 runs 27.7 ms (8.6x) but curvature
|delta| p99 = 5.3e-2 on a [0, 1/3]-range quantity (visible on the
palette); recall=0.99 is 108.6 ms (2.2x) at p99 2.8e-2; recall=0.999 is
251 ms — SLOWER than the exact 238 ms.  The exact lax.top_k row stays the
default (tools/probe_knn.py also shows blocked two-stage exact top-k is
3-4x WORSE on TPU).  The focused k-NN is cached per selection
(pipeline.Session._focus_prop_cache), so the 238 ms is once per
segment+display, not per frame.
"""
import functools, sys, time
import jax, jax.numpy as jnp, numpy as np
sys.path.insert(0, '/root/repo')
INF = jnp.float32(3.0e38)

def sync1(x):
    return np.asarray(jax.tree_util.tree_leaves(x)[0].reshape(-1)[0])

def _pairwise_sqdist(q, p):
    qn = jnp.sum(q*q, axis=-1, keepdims=True); pn = jnp.sum(p*p, axis=-1)
    cross = jnp.dot(q, p.T, preferred_element_type=jnp.float32,
                    precision=jax.lax.Precision.HIGHEST)
    return jnp.maximum(qn + pn[None, :] - 2.0*cross, 0.0)

def knn(pos, valid, k, tile, recall=None):
    n = pos.shape[0]; pad = (-n) % tile
    qpos = jnp.pad(pos, ((0, pad), (0, 0)))
    p_masked = jnp.where(valid[:, None], pos, INF)
    def one_tile(q):
        d = _pairwise_sqdist(q, p_masked)
        d = jnp.where(valid[None, :], d, INF)
        if recall is None:
            neg, idx = jax.lax.top_k(-d, k)
        else:
            neg, idx = jax.lax.approx_max_k(-d, k, recall_target=recall)
        return idx.astype(jnp.int32), -neg
    idx, dist = jax.lax.map(one_tile, qpos.reshape(-1, tile, 3))
    return idx.reshape(-1, k)[:n], dist.reshape(-1, k)[:n]

n, k = 40960, 31
rng = np.random.default_rng(0)
# clustered cloud closer to a real tree crown than uniform
centers = rng.random((64, 3)).astype(np.float32) * 30.0
pos = jnp.asarray((centers[rng.integers(0, 64, n)] +
                   rng.normal(0, 0.8, (n, 3))).astype(np.float32))
valid = jnp.asarray(rng.random(n) < 0.96)
reps = 4

from treee_tpu.ops import eigen

def curvature_from(idx, dist, pos, valid, k):
    # neighborhood covariance -> lambda_min / trace (mirrors
    # characteristics.segment_curvature's covariance step)
    nb = jnp.take(pos, idx, axis=0)              # [n, k, 3]
    mu = jnp.mean(nb, axis=1, keepdims=True)
    d = nb - mu
    cov = jnp.einsum('nki,nkj->nij', d, d,
                     precision=jax.lax.Precision.HIGHEST) / k
    tr = jnp.trace(cov, axis1=1, axis2=2)
    ev = jnp.linalg.eigvalsh(cov)
    return jnp.where(valid, ev[:, 0] / jnp.maximum(tr, 1e-12), 0.0)

exact_idx, exact_dist = knn(pos, valid, k, 1024)
c_exact = np.asarray(curvature_from(exact_idx, exact_dist, pos, valid, k))

for recall in [None, 0.95, 0.99, 0.999]:
    @jax.jit
    def scan_fn(pos, valid, d_stack, recall=recall):
        def body(acc, d_i):
            idx, dist = knn(pos, valid & (d_i > 0), k, 1024, recall)
            return acc + dist[0, -1] + dist[-1, -1], None
        tot, _ = jax.lax.scan(body, jnp.float32(0.0), d_stack)
        return tot
    d = jnp.ones(reps, jnp.int32)
    sync1(scan_fn(pos, valid, d))
    t0 = time.time(); sync1(scan_fn(pos, valid, d))
    ms = (time.time() - t0) / reps * 1e3
    idx, dist = knn(pos, valid, k, 1024, recall)
    # neighbor recall vs exact
    ex = np.sort(np.asarray(exact_dist), axis=1)
    ap = np.sort(np.asarray(dist), axis=1)
    nb_match = float(np.mean(np.isclose(ap, ex, rtol=1e-5, atol=1e-7)))
    c = np.asarray(curvature_from(idx, dist, pos, valid, k))
    dc = np.abs(c - c_exact)[np.asarray(valid)]
    print(f"recall={recall}: {ms:7.1f} ms  nb-match {nb_match:.4f}  "
          f"curv |d| mean {dc.mean():.2e} p99 {np.quantile(dc,0.99):.2e} "
          f"p999 {np.quantile(dc,0.999):.2e} max {dc.max():.2e}", flush=True)
