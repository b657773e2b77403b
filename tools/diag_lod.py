"""Diagnose the LOD-phase wedge on the axon TPU: time each suspect op alone.

Binary search over the ops build_lod adds beyond the (known-good) pipeline:
flip, flip-based reverse cummax, cumsum, modulo, bool scatter, compact.
"""

import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    import jax

    jax.config.update("jax_compilation_cache_dir", "/tmp/treee_jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    import jax.numpy as jnp

    from treee_tpu.ops import octree

    n = int(os.environ.get("DIAG_POINTS", 15_000_000))

    def sync(out):
        for leaf in jax.tree_util.tree_leaves(out):
            np.asarray(leaf.reshape(-1)[0])
        return out

    def t(name, fn, *args):
        t0 = time.time()
        out = sync(jax.jit(fn)(*args))
        print(f"{name}: compile+run {time.time()-t0:.1f}s", flush=True)
        t0 = time.time()
        out = sync(jax.jit(fn)(*args))
        print(f"{name}: run {time.time()-t0:.2f}s", flush=True)
        return out

    x = jnp.arange(n, dtype=jnp.int32)
    t("flip", lambda v: jnp.flip(v) + 1, x)
    t("cummax(fwd)", octree._cummax, x)
    t("revcummin(flip-based)", octree._revcummin, x)
    t("cumsum", lambda v: jnp.cumsum(v), x)
    t("modulo", lambda v: v % jnp.maximum(v[::-1], 1), x)
    t("bool-scatter", lambda v: jnp.zeros(n, bool).at[v].set(v % 2 == 0), x)

    rng = np.random.default_rng(0)
    pos = jnp.asarray(rng.uniform(-100, 100, (n, 3)).astype(np.float32))
    valid = jnp.ones(n, bool)
    tree = t("build", octree.build, pos, valid)
    mask = t("lod_mask", lambda tr: octree.lod_mask(tr, 7), tree)
    t("compact", lambda m, p: octree.compact(m, 2 << 20, p), mask, pos)
    prop = jnp.zeros(n, jnp.float32)
    t("build_lod(fused)", lambda p, v, pr: octree.compact(
        octree.lod_mask(octree.build(p, v), level=7) & v, 2 << 20, p, pr),
      pos, valid, prop)


if __name__ == "__main__":
    main()
