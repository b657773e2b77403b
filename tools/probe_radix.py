"""Probe: can ANY radix/counting sort beat lax.sort for the chars keys?

VERDICT r4 task 2 receipt.  The characteristics phase sorts packed
(segment|qy) i32 keys with two f32 payloads (characteristics.py:408,
~50 ms at 15M after the unstable-sort flip).  The r3 suggestion was a
Pallas radix/counting sort.  This probe measures the DOMINANCE bound:

Every radix/counting sort ends by applying a data-dependent permutation
to the key and both payload columns (whether materialized as ranks or
fused into the last pass's placement, the final pass must move each of
the 3 arrays through a data-dependent gather or scatter).  So the cost
of ONE permutation-apply over (key, x, z) is a hard lower bound on any
radix sort's LAST PASS ALONE — before the histogram/prefix work and the
earlier passes.  v5e primitive costs (tools/microbench.py, CLAUDE.md):
gathers ~144 ms per 15M lookups, scatters ~165 ms per column; lax.sort
of the whole (key, x, z) tuple is ~50 ms.  If the permutation-apply
alone exceeds the full lax.sort, the radix route is dead on arrival on
this hardware — XLA's fused on-chip sort network moves the payloads
through VMEM, which no HBM-level gather/scatter formulation can match.

Variants (scan-amortized over reps like the bench):
  A  lax.sort (key, x, z) unstable        — the pipeline's current form
  B  lax.sort key-only unstable           — payload overhead reference
  C  gather-apply: key[p], x[p], z[p]     — radix last-pass floor (gather)
  D  scatter-apply: out[p] = key/x/z      — radix last-pass floor (scatter)
  E  C with the 3 gathers fused in one jit (XLA may share index traffic)

Run: python tools/probe_radix.py  (env PROBE_POINTS, PROBE_REPS)
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
    reps = int(os.environ.get("PROBE_REPS", 4))
    rng = np.random.default_rng(0)
    key = jnp.asarray(rng.integers(0, 2**30, n, dtype=np.int32))
    x = jnp.asarray(rng.uniform(-300, 300, n).astype(np.float32))
    z = jnp.asarray(rng.uniform(-300, 300, n).astype(np.float32))
    # a realistic data-dependent permutation (what a radix sort's final
    # pass would apply), precomputed on host so only the APPLY is timed
    perm = jnp.asarray(np.argsort(
        rng.integers(0, 2**30, n, dtype=np.int32)).astype(np.int32))

    def sync1(out):
        np.asarray(jax.tree_util.tree_leaves(out)[0].reshape(-1)[0])

    def timed(label, fn, *args):
        sync1(fn(*args))  # compile + warm
        t0 = time.time()
        for _ in range(reps):
            out = fn(*args)
        sync1(out)
        ms = (time.time() - t0) / reps * 1e3
        print(f"{label}: {ms:.2f} ms", flush=True)
        return ms

    @jax.jit
    def a_sort3(key, x, z):
        ks, xs, zs = jax.lax.sort((key, x, z), num_keys=1, is_stable=False)
        return ks[::1024].astype(jnp.float32) + xs[::1024] + zs[::1024]

    @jax.jit
    def b_sort1(key):
        (ks,) = jax.lax.sort((key,), num_keys=1, is_stable=False)
        return ks[::1024]

    @jax.jit
    def c_gather(key, x, z, p):
        return (key[p][::1024].astype(jnp.float32) + x[p][::1024]
                + z[p][::1024])

    @jax.jit
    def d_scatter(key, x, z, p):
        ko = jnp.zeros_like(key).at[p].set(key, mode="drop",
                                           unique_indices=True)
        xo = jnp.zeros_like(x).at[p].set(x, mode="drop", unique_indices=True)
        zo = jnp.zeros_like(z).at[p].set(z, mode="drop", unique_indices=True)
        return ko[::1024].astype(jnp.float32) + xo[::1024] + zo[::1024]

    @jax.jit
    def e_gather_fused(key, x, z, p):
        kf = jax.lax.bitcast_convert_type(key, jnp.float32)
        stacked = jnp.stack([kf, x, z], axis=-1)
        g = jnp.take(stacked, p, axis=0)
        return g[::1024, 0] + g[::1024, 1] + g[::1024, 2]

    a = timed("A lax.sort key+2 payloads (pipeline form)", a_sort3, key, x, z)
    b = timed("B lax.sort key-only", b_sort1, key)
    c = timed("C permutation gather-apply x3 cols", c_gather, key, x, z, perm)
    d = timed("D permutation scatter-apply x3 cols", d_scatter, key, x, z,
              perm)
    e = timed("E permutation gather-apply fused [N,3]", e_gather_fused,
              key, x, z, perm)

    floor = min(c, d, e)
    print(f"\nfull tuple sort A = {a:.1f} ms; radix LAST-PASS floor "
          f"(min C/D/E) = {floor:.1f} ms "
          f"({floor / a:.2f}x the entire sort, before histogram/prefix "
          f"work and earlier passes)", flush=True)
    if floor > a:
        print("receipt: any radix/counting sort LOSES on v5e — its final "
              "permutation apply alone costs more than the whole fused "
              "lax.sort.", flush=True)


if __name__ == "__main__":
    main()
