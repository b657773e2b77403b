"""TPU probe: A/B the Voronoi variants at bench-scale grids.

Times plain JFA vs packed-plane JFA vs the exact occupied-cell brute force
(_bruteforce_voronoi) on a realistic [64,384,384] occupancy with ~2k tracked
centroids — the tail of band_scan (CLAUDE.md round-3 item: band_scan 392 ms).

Run:  python tools/probe_voronoi.py            (on the TPU)
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

    cfg = SegmentationConfig()
    # CPU smoke-test knobs (defaults = bench-scale shapes)
    g = int(os.environ.get("PROBE_G", cfg.grid_size))
    b = int(os.environ.get("PROBE_B", cfg.max_bands))
    t_cap = int(os.environ.get("PROBE_T", cfg.max_segments))
    occ_cap_env = int(os.environ.get("PROBE_OCC", cfg.cc_occupied_cap))

    rng = np.random.default_rng(0)
    # realistic: ~2k tracked centroids spread over bands 4..40 + dense ground
    cnt_np = np.zeros((b, g, g), np.int32)
    tracked_np = np.zeros((b, t_cap, 2), np.float32)
    active_np = np.zeros((b, t_cap), bool)
    s = 0.75
    for bi in range(2, max(3, b - 2)):
        n_cl = min(55, t_cap // max(1, (b - 4)) or 1)
        cx = rng.integers(8, g - 8, n_cl)
        cz = rng.integers(8, g - 8, n_cl)
        for j in range(n_cl):
            cnt_np[bi, cx[j] - 2:cx[j] + 3, cz[j] - 2:cz[j] + 3] = (
                rng.integers(1, 50, (5, 5)))
            slot = (bi - 2) * n_cl + j
            if slot < t_cap:
                tracked_np[bi, slot] = (cx[j] + 0.5) * s, (cz[j] + 0.5) * s
                active_np[bi, slot] = True
    dense = rng.random((g, g)) < 0.5
    cnt_np[b - 1] = np.where(dense, rng.integers(1, 20, (g, g)), 0)
    tracked_np[b - 1, :64, 0] = rng.uniform(0, g * s, 64)
    tracked_np[b - 1, :64, 1] = rng.uniform(0, g * s, 64)
    active_np[b - 1, :64] = True
    print(f"# occupied cells: {int((cnt_np > 0).sum()):,}, "
          f"active slots: {int(active_np.sum()):,}", flush=True)

    cnt = jnp.asarray(cnt_np)
    tracked = jnp.asarray(tracked_np)
    active = jnp.asarray(active_np)
    lo = jnp.zeros(3, jnp.float32)
    sj = jnp.float32(s)
    cell_center = jnp.stack([
        (jax.lax.broadcasted_iota(jnp.float32, (g, g), 0) + 0.5) * sj,
        (jax.lax.broadcasted_iota(jnp.float32, (g, g), 1) + 0.5) * sj,
    ], axis=-1)

    occupied = cnt > 0
    flat_occ = occupied.reshape(-1)
    occ_cap = occ_cap_env
    rank = jnp.cumsum(flat_occ.astype(jnp.int32)) - 1
    gidx = jnp.arange(b * g * g, dtype=jnp.int32)
    tgt = jnp.where(flat_occ & (rank < occ_cap), rank, occ_cap)
    occ_idx = jnp.zeros(occ_cap + 1, jnp.int32).at[tgt].set(
        gidx, mode="drop")[:occ_cap]
    n_occ = jnp.sum(flat_occ.astype(jnp.int32))
    occ_valid = jnp.arange(occ_cap, dtype=jnp.int32) < n_occ

    # seed grids for the JFA variants (same construction as band_scan)
    gg = g * g
    tcx = jnp.clip(jnp.floor(tracked[..., 0] / sj).astype(jnp.int32), 0, g - 1)
    tcz = jnp.clip(jnp.floor(tracked[..., 1] / sj).astype(jnp.int32), 0, g - 1)
    band_off = jnp.arange(b, dtype=jnp.int32)[:, None] * gg
    seed_cell = jnp.where(active, band_off + tcx * g + tcz, b * gg)
    slot_ids = jnp.broadcast_to(
        jnp.arange(t_cap, dtype=jnp.int32)[None, :], (b, t_cap))
    seed_slot = jnp.full(b * gg + 1, -1, jnp.int32).at[
        seed_cell.reshape(-1)].max(slot_ids.reshape(-1), mode="drop")[:b * gg]
    won = seed_slot[jnp.clip(seed_cell.reshape(-1), 0, b * gg - 1)] \
        == slot_ids.reshape(-1)
    pos_tgt = jnp.where(won, seed_cell.reshape(-1), b * gg)
    seed_pos = jnp.zeros((b * gg + 1, 2), jnp.float32).at[pos_tgt].set(
        tracked.reshape(-1, 2), mode="drop")[:b * gg]
    seed_slot = seed_slot.reshape(b, g, g)
    seed_pos = seed_pos.reshape(b, g, g, 2)

    reps = 10

    def timeit(name, fn, *args):
        f = jax.jit(fn)

        @jax.jit
        def loop(*a):
            def body(acc, _):
                out = fn(*a)
                return acc + jnp.sum(out.astype(jnp.float32)), None
            tot, _ = jax.lax.scan(body, jnp.float32(0), None, length=reps)
            return tot
        t0 = time.time()
        float(np.asarray(loop(*args)))
        print(f"{name}: compile+first {time.time() - t0:.1f}s", flush=True)
        t0 = time.time()
        float(np.asarray(loop(*args)))
        print(f"{name}: {(time.time() - t0) / reps * 1e3:.1f} ms/call",
              flush=True)
        del f

    timeit("jfa plain ", sg._jump_flood, seed_slot, seed_pos, cell_center)
    timeit("jfa packed", lambda ss, sp, cc: sg._jump_flood_packed(
        ss, sp, cc, lo, sj), seed_slot, seed_pos, cell_center)
    for chunk in (128, 256, 512):
        timeit(f"bruteforce c{chunk}",
               lambda oi, ov, tr, ac, _c=chunk: sg._bruteforce_voronoi(
                   oi, ov, tr, ac, lo, sj, b, g, _c),
               occ_idx, occ_valid, tracked, active)


if __name__ == "__main__":
    main()
