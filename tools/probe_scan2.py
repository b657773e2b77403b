"""Map the axon compile hang: small assoc-scan, shifted-max cummax, cumsum."""

import time

import jax
import jax.numpy as jnp
import numpy as np

jax.config.update("jax_compilation_cache_dir", "/tmp/treee_jax_cache")


def t(name, fn, *args):
    t0 = time.time()
    out = jax.jit(fn)(*args)
    np.asarray(jax.tree_util.tree_leaves(out)[0].reshape(-1)[0])
    print(f"{name}: compile+run {time.time()-t0:.1f}s", flush=True)
    t0 = time.time()
    out = jax.jit(fn)(*args)
    np.asarray(jax.tree_util.tree_leaves(out)[0].reshape(-1)[0])
    print(f"{name}: run {time.time()-t0:.2f}s", flush=True)
    return out


def cummax_shifted(x):
    n = x.shape[0]
    y = x
    s = 1
    while s < n:
        pad = jnp.broadcast_to(y[:1], (s,))  # filler; masked out below
        shifted = jnp.concatenate([pad, y[:-s]])
        y = jnp.where(jnp.arange(n) >= s, jnp.maximum(y, shifted), y)
        s *= 2
    return y


x1 = jnp.arange(1_000_000, dtype=jnp.int32) % 97
t("assoc-max@1M", lambda v: jax.lax.associative_scan(jnp.maximum, v), x1)

x15 = jnp.arange(15_000_000, dtype=jnp.int32) % 97
t("shifted-max@15M", cummax_shifted, x15)
t("cumsum@15M", lambda v: jnp.cumsum(v), x15)
t("assoc-max@4M", lambda v: jax.lax.associative_scan(jnp.maximum, v),
  jnp.arange(4_000_000, dtype=jnp.int32) % 97)
