"""TPU probe: screen-error adaptive cut quality/speed vs tau_px at 15M.

The bench's 'adaptive' row (level-10 voxel dedup) reads 53 ms at a 0.79
pixel match (0.65 at 40M); the screen-error cut at tau=1 px matches ~1.0
but keeps nearly everything (109 ms).  Sweep tau to see whether a mid
tau gives level-10's frame budget at a better match — if so the bench's
honest fast path should be the screen-error cut.

Run:  python tools/probe_tau.py          (on the TPU)
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

    from treee_tpu.config import DEFAULT_CONFIG
    from treee_tpu.io import las
    from treee_tpu.ops import octree
    from treee_tpu.render import Camera, palettes, splat

    cfg = DEFAULT_CONFIG
    n_target = int(os.environ.get("BENCH_POINTS", 15_000_000))
    points_per_tree = 12_000
    n_trees = max(1, int(n_target * 0.75) // points_per_tree)
    pts = las.synthetic_forest(
        n_trees=n_trees, spacing=7.0, points_per_tree=points_per_tree,
        ground_points=n_target - n_trees * points_per_tree, seed=0)
    n = len(pts)
    pos = jnp.asarray(pts)
    valid = jnp.ones(n, bool)
    prop = jnp.zeros(n, jnp.int32)  # constant prop: match measures geometry
    palette = palettes.get(cfg.render.palette)
    cam0 = Camera.orbital(distance=120.0)

    def sync(out):
        for leaf in jax.tree_util.tree_leaves(out):
            np.asarray(leaf.reshape(-1)[0])
        return out

    f_proj = cam0.projection_matrix(cfg.render.width / cfg.render.height)[1, 1]
    px_scale = float(f_proj) * (cfg.render.height / 2.0)

    frame_full = jax.jit(
        lambda p, pr, v: splat.to_u8(
            splat.render_frame(p, pr, v, cam0, palette, cfg.render)))
    img_f = np.asarray(frame_full(pos, prop, valid))
    print(f"# n={n:,}", flush=True)

    # level-10 dedup baseline
    count_a, idx_a = sync(jax.jit(
        lambda pos, valid: octree.compact_indices(
            octree.lod_mask(octree.build(pos, valid), level=10) & valid,
            pos.shape[0]))(pos, valid))
    rows = [("level10", int(count_a), idx_a)]

    for tau in (1.0, 1.5, 2.0, 3.0, 4.0):
        count_s, idx_s = sync(jax.jit(
            lambda pos, valid, t=tau: octree.compact_indices(
                octree.adaptive_mask(
                    octree.build(pos, valid), cam0.position, px_scale,
                    tau_px=t) & valid,
                pos.shape[0]))(pos, valid))
        rows.append((f"tau={tau}", int(count_s), idx_s))

    # frame timing through a lax.scan over a camera stack with ONE sync:
    # per-call axon dispatch has a ~30 ms floor (CLAUDE.md), which would
    # otherwise swamp the small-subset rows this probe compares
    n_frames = 8
    cams = [cam0]
    for _ in range(n_frames - 1):
        cams.append(cams[-1].rotate_orbital(40.0, 0.0))
    cam_stack = jax.tree_util.tree_map(lambda *xs: jnp.stack(xs), *cams)

    @jax.jit
    def sweep(p, pr, v, cam_stack):
        def body(acc, cam):
            img = splat.render_frame(p, pr, v, cam, palette, cfg.render)
            return acc + jnp.sum(img), None

        total, _ = jax.lax.scan(body, jnp.float32(0.0), cam_stack)
        return total

    for name, cnt, idx_big in rows:
        cap = min(octree.snug_capacity(cnt, headroom=1.0), n)
        idx = idx_big[:cap]
        pos_s, prop_s = pos[idx], prop[idx]
        mask_s = jnp.arange(cap) < cnt

        sync(sweep(pos_s, prop_s, mask_s, cam_stack))
        t0 = time.time()
        sync(sweep(pos_s, prop_s, mask_s, cam_stack))
        ms = (time.time() - t0) / n_frames * 1e3
        img_s = np.asarray(frame_full(pos_s, prop_s, mask_s))
        match = float((img_f == img_s).all(axis=-1).mean())
        print(f"{name:10s} pts={cnt:>10,} cap={cap:>10,} "
              f"frame={ms:7.1f} ms  match={match:.4f}", flush=True)


if __name__ == "__main__":
    main()
