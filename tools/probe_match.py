"""TPU probe: XLA band_step lax.scan vs match_scan_pallas at real capacities.

The matching scan is ~103 ms at 15M points (tools/probe_bandscan.py):
64 sequential bands x 4 rounds of small [T=2048, C=256] ops — per-op
overhead, not bandwidth.  The kernel runs the whole scan in one sequential
grid with the tracked state VMEM-resident.

Run:  python tools/probe_match.py            (on the TPU)
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

    from treee_tpu import segmentation as sg
    from treee_tpu.config import SegmentationConfig
    from treee_tpu.ops.pallas_kernels import match_scan_pallas

    cfg = SegmentationConfig()
    b, c_cap, t_cap = cfg.max_bands, cfg.max_trees_per_band, cfg.max_segments
    rounds = cfg.match_rounds
    print(f"# probe_match B={b} C={c_cap} T={t_cap} rounds={rounds} "
          f"on {jax.devices()[0].device_kind}", flush=True)

    rng = np.random.default_rng(0)
    cents = rng.uniform(0, 200, (b, c_cap, 2)).astype(np.float32)
    cmask = rng.random((b, c_cap)) < 0.5
    # recurring clusters across bands, like real crowns
    for i in range(1, b):
        keep = rng.random((c_cap, 1)) < 0.6
        cents[i] = np.where(keep, cents[i - 1] + rng.normal(0, 0.2, (c_cap, 2)),
                            cents[i]).astype(np.float32)
    cents_j, cmask_j = jnp.asarray(cents), jnp.asarray(cmask)
    radius = jnp.float32(1.5)

    def sync(x):
        np.asarray(jax.tree_util.tree_leaves(x)[0].reshape(-1)[0])

    @jax.jit
    def xla_scan(cents_b, cmask_b, r):
        def band_step(carry, xs):
            tracked_pos, active, n_alloc = carry
            c, m = xs
            tracked_pos, active, n_alloc = sg._match_band(
                tracked_pos, active, n_alloc, c, m, r, rounds)
            return (tracked_pos, active, n_alloc), (tracked_pos, active)

        init = (jnp.zeros((t_cap, 2), jnp.float32), jnp.zeros(t_cap, bool),
                jnp.int32(0))
        (_, _, nal), (tp, act) = jax.lax.scan(
            band_step, init, (cents_b, cmask_b))
        return tp, act, nal

    @jax.jit
    def pallas(cents_b, cmask_b, r):
        return match_scan_pallas(cents_b, cmask_b, r, rounds, t_cap)

    results = {}
    for name, fn in (("xla scan", xla_scan), ("pallas  ", pallas)):
        t0 = time.perf_counter()
        out = fn(cents_j, cmask_j, radius)
        sync(out)
        t1 = time.perf_counter()
        reps = 20
        for _ in range(reps):
            out = fn(cents_j, cmask_j, radius)
        sync(out)
        dt = (time.perf_counter() - t1) / reps * 1e3
        results[name] = jax.tree_util.tree_map(np.asarray, out)
        print(f"{name}  {dt:8.2f} ms/call   (compile+first {t1-t0:.1f}s)",
              flush=True)

    tp0, act0, nal0 = results["xla scan"]
    tp1, act1, nal1 = results["pallas  "]
    print(f"active agree: {(act0 == act1).mean():.6f}  "
          f"pos agree: {(tp0 == tp1).mean():.6f}  "
          f"n_alloc {int(nal0)} vs {int(nal1)}", flush=True)


if __name__ == "__main__":
    main()
