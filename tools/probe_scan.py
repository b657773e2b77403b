"""Classify the cummax@15M hang: lowering vs XLA compile vs first execution."""

import time

import jax
import jax.numpy as jnp
import numpy as np

jax.config.update("jax_compilation_cache_dir", "/tmp/treee_jax_cache")

x = jnp.arange(15_000_000, dtype=jnp.int32)
f = jax.jit(lambda v: jax.lax.associative_scan(jnp.maximum, v))
t0 = time.time()
lowered = f.lower(x)
print(f"lowered {time.time()-t0:.1f}s", flush=True)
t0 = time.time()
compiled = lowered.compile()
print(f"compiled {time.time()-t0:.1f}s", flush=True)
t0 = time.time()
out = compiled(x)
np.asarray(out[-1:])
print(f"executed {time.time()-t0:.1f}s", flush=True)
