"""TPU probe: itemize band_scan (CLAUDE.md round-3 item: 392 ms total).

Times the pieces separately at the bench-scale grid ([64,384,384] count
grids, T=2048, C=256): batched CC, cluster extraction, the sequential
match scan, seed scatter, and the batched jump-flood — to find where the
392 ms actually goes before designing a replacement.

Run:  python tools/probe_bandscan.py            (on the TPU)
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
    g = cfg.grid_size
    b = cfg.max_bands
    t_cap = cfg.max_segments
    c_cap = cfg.max_trees_per_band

    rng = np.random.default_rng(0)
    # realistic occupancy: ~2k tree clusters spread over bands 4..40, plus a
    # dense ground band, ~300k occupied cells total
    cnt_np = np.zeros((b, g, g), np.int32)
    for bi in range(4, 40):
        n_cl = 60
        cx = rng.integers(8, g - 8, n_cl)
        cz = rng.integers(8, g - 8, n_cl)
        for j in range(n_cl):
            cnt_np[bi, cx[j]-2:cx[j]+3, cz[j]-2:cz[j]+3] = rng.integers(
                1, 50, (5, 5))
    dense = rng.random((g, g)) < 0.5
    cnt_np[40] = np.where(dense, rng.integers(1, 20, (g, g)), 0)
    cnt = jnp.asarray(cnt_np)
    print(f"# occupied cells: {int((cnt_np > 0).sum()):,}", flush=True)

    lo = jnp.asarray(np.array([0.0, 0.0, 0.0], np.float32))
    s = jnp.float32(0.75)
    d = jnp.float32(0.75)

    def sync(out):
        for leaf in jax.tree_util.tree_leaves(out):
            np.asarray(leaf.reshape(-1)[0])
        return out

    def bench(name, fn, *args, reps=3):
        f = jax.jit(fn)
        t0 = time.time()
        sync(f(*args))
        compile_s = time.time() - t0
        ts = []
        for _ in range(reps):
            t0 = time.time()
            sync(f(*args))
            ts.append(time.time() - t0)
        print(f"{name:44s} {min(ts)*1e3:9.1f} ms   (compile {compile_s:.0f}s)",
              flush=True)
        return min(ts)

    print(f"# probe_bandscan grid=[{b},{g},{g}] T={t_cap} C={c_cap} "
          f"on {jax.devices()[0]}", flush=True)

    bench("band_scan TOTAL", lambda c: sg.band_scan(c, lo, s, d, cfg)[0], cnt)

    def cc_extract(c, use_sorted=True):
        cell_center = jnp.stack(
            [lo[0] + (jax.lax.broadcasted_iota(jnp.float32, (g, g), 0) + 0.5) * s,
             lo[2] + (jax.lax.broadcasted_iota(jnp.float32, (g, g), 1) + 0.5) * s],
            axis=-1)
        # match band_scan's defaults (Pallas CC auto-on on TPU) so this
        # line itemizes honestly against TOTAL; without the flag this
        # measured the slower XLA CC and inflated "extract" by ~30 ms
        labels, occ_idx, occ_valid = sg._connected_components(
            c > 0, cfg.cc_iters, cfg.cc_occupied_cap,
            pallas_sweeps=(cfg.cc_pallas_sweeps
                           if jax.default_backend() == "tpu" else 0),
            pallas_bodies=cfg.cc_pallas_bodies)
        return sg._extract_clusters(labels, c, lo, s, c_cap,
                                    cfg.min_points, occ_idx, occ_valid,
                                    use_sorted=use_sorted)

    bench("cc + extract_clusters (sorted)", cc_extract, cnt)
    bench("cc + extract_clusters (top_k)",
          lambda c: cc_extract(c, use_sorted=False), cnt)
    cs, ms_ = jax.jit(cc_extract)(cnt)
    ct, mt_ = jax.jit(lambda c: cc_extract(c, use_sorted=False))(cnt)
    ms_np, mt_np = np.asarray(ms_), np.asarray(mt_)
    same = (ms_np == mt_np).all() and np.array_equal(
        np.where(ms_np[..., None], np.asarray(cs), 0),
        np.where(mt_np[..., None], np.asarray(ct), 0))
    print(f"# sorted == top_k selection: {bool(same)}", flush=True)

    cents_b, cmask_b = jax.jit(cc_extract)(cnt)
    cents_b = jax.block_until_ready(cents_b)

    def match_scan(cents_b, cmask_b):
        def band_step(carry, xs):
            tracked_pos, active, n_alloc = carry
            cents, cmask = xs
            tracked_pos, active, n_alloc = sg._match_band(
                tracked_pos, active, n_alloc, cents, cmask,
                cfg.match_radius_factor * d, cfg.match_rounds)
            return (tracked_pos, active, n_alloc), (tracked_pos, active)

        init = (jnp.zeros((t_cap, 2), jnp.float32),
                jnp.zeros((t_cap,), bool), jnp.int32(0))
        (_, _, n_alloc), (tp, ab) = jax.lax.scan(
            band_step, init, (cents_b, cmask_b))
        return n_alloc, tp, ab

    bench("match scan (64 bands x 4 rounds)", match_scan, cents_b, cmask_b)

    _, tracked_pos_b, active_b = jax.jit(match_scan)(cents_b, cmask_b)
    tracked_pos_b = jax.block_until_ready(tracked_pos_b)

    def seeds_and_jfa(tracked_pos_b, active_b):
        gg = g * g
        cell_center = jnp.stack(
            [lo[0] + (jax.lax.broadcasted_iota(jnp.float32, (g, g), 0) + 0.5) * s,
             lo[2] + (jax.lax.broadcasted_iota(jnp.float32, (g, g), 1) + 0.5) * s],
            axis=-1)
        tcx = jnp.clip(jnp.floor((tracked_pos_b[..., 0] - lo[0]) / s)
                       .astype(jnp.int32), 0, g - 1)
        tcz = jnp.clip(jnp.floor((tracked_pos_b[..., 1] - lo[2]) / s)
                       .astype(jnp.int32), 0, g - 1)
        band_off = jnp.arange(b, dtype=jnp.int32)[:, None] * gg
        seed_cell = jnp.where(active_b, band_off + tcx * g + tcz, b * gg)
        slot_ids = jnp.broadcast_to(
            jnp.arange(t_cap, dtype=jnp.int32)[None, :], (b, t_cap))
        seed_slot = jnp.full(b * gg + 1, -1, jnp.int32).at[
            seed_cell.reshape(-1)].max(slot_ids.reshape(-1), mode="drop")[:b * gg]
        won = seed_slot[jnp.clip(seed_cell.reshape(-1), 0, b * gg - 1)] \
            == slot_ids.reshape(-1)
        pos_tgt = jnp.where(won, seed_cell.reshape(-1), b * gg)
        seed_pos = jnp.zeros((b * gg + 1, 2), jnp.float32).at[pos_tgt].set(
            tracked_pos_b.reshape(-1, 2), mode="drop")[:b * gg]
        return (seed_slot.reshape(b, g, g), seed_pos.reshape(b, g, g, 2),
                cell_center)

    bench("seed grids (scatters)", seeds_and_jfa, tracked_pos_b, active_b)

    seed_slot, seed_pos, cell_center = jax.jit(seeds_and_jfa)(
        tracked_pos_b, active_b)
    seed_slot = jax.block_until_ready(seed_slot)

    bench("jump flood [64,384,384]", sg._jump_flood,
          seed_slot, seed_pos, cell_center)

    bench("jump flood packed 2-plane", sg._jump_flood_packed,
          seed_slot, seed_pos, cell_center, lo, s)


if __name__ == "__main__":
    main()
