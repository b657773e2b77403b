"""Break down the interactive edit-loop cost on the real TPU.

Per-call dispatch over the axon tunnel has a ~30 ms floor and chained
output->input dispatches may not pipeline; this probes (a) the pure device
cost via ONE jitted lax.scan over 8 brush strokes (edit + LOD-refresh +
LOD frame each), (b) the per-call version, (c) edit alone, (d) LOD frame
alone.  Run: python tools/probe_edit.py  (env PROBE_POINTS)
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

    from treee_tpu import interactive as edit_mod
    from treee_tpu.cloud import PointCloud
    from treee_tpu.config import DEFAULT_CONFIG
    from treee_tpu.io import las
    from treee_tpu.ops import octree
    from treee_tpu.render import Camera, palettes, splat

    n_target = int(os.environ.get("PROBE_POINTS", 15_000_000))
    cfg = DEFAULT_CONFIG
    ppt = 12_000
    n_trees = max(1, int(n_target * 0.75) // ppt)
    pts = las.synthetic_forest(
        n_trees=n_trees, spacing=7.0, points_per_tree=ppt,
        ground_points=n_target - n_trees * ppt, seed=0,
    )
    n = len(pts)
    pos = jnp.asarray(pts)
    valid = jnp.ones(n, bool)
    seg = (jnp.arange(n, dtype=jnp.int32) % 97) + 1
    cloud = PointCloud(pos=pos, segment=seg,
                       classification=jnp.zeros(n, jnp.int32), valid=valid)
    palette = palettes.get(cfg.render.palette)
    cam = Camera.orbital(distance=120.0)

    count, idx_big = jax.jit(
        lambda pos, valid: octree.compact_indices(
            octree.lod_mask(octree.build(pos, valid), level=7) & valid, 2 << 20
        )
    )(pos, valid)
    lod_n = int(count)
    cap = 1 << max(12, (int(lod_n * 1.25) - 1).bit_length())
    idx = idx_big[:cap]
    pos_l = pos[idx]
    mask_slot = jnp.arange(cap) < count

    def sync(out):
        for leaf in jax.tree_util.tree_leaves(out):
            np.asarray(leaf.reshape(-1)[0])
        return out

    def bench(name, fn, *args, reps=2, per=1):
        t0 = time.time()
        out = sync(fn(*args))
        c = time.time() - t0
        ts = []
        for _ in range(reps):
            t0 = time.time()
            out = sync(fn(*args))
            ts.append(time.time() - t0)
        print(f"{name:34s} {min(ts)/per*1e3:8.2f} ms  (compile {c:.1f}s)",
              flush=True)
        return out

    centers = jnp.stack([jnp.asarray([0.0, 5.0, 0.0]) + i for i in range(8)])

    @jax.jit
    def scan_edit_frames(cloud, centers, cam):
        def body(c, center):
            c2 = edit_mod.remove_points(c, center, 2.0, 0)
            seg_c = c2.segment[idx]
            mask_c = c2.valid[idx] & (seg_c != 0) & mask_slot
            prop_c = splat.prop_from_segment(seg_c)
            img = splat.render_frame(pos_l, prop_c, mask_c, cam, palette,
                                     cfg.render)
            return c2, jnp.sum(img)

        c2, sums = jax.lax.scan(body, cloud, centers)
        return jnp.sum(sums)

    bench("scan: 8x(edit+refresh+lodframe)", scan_edit_frames,
          cloud, centers, cam, per=8)

    @jax.jit
    def edit_only(cloud, center):
        return edit_mod.remove_points(cloud, center, 2.0, 0)

    @jax.jit
    def lod_frame(cloud, cam):
        seg_c = cloud.segment[idx]
        mask_c = cloud.valid[idx] & (seg_c != 0) & mask_slot
        prop_c = splat.prop_from_segment(seg_c)
        return jnp.sum(splat.render_frame(pos_l, prop_c, mask_c, cam, palette,
                                          cfg.render))

    c2 = bench("edit only (1 call)", edit_only, cloud,
               jnp.asarray([0.0, 5.0, 0.0]))
    bench("lod refresh+frame (1 call)", lod_frame, cloud, cam)

    @jax.jit
    def edit_and_frame(cloud, center, cam):
        c2 = edit_mod.remove_points(cloud, center, 2.0, 0)
        seg_c = c2.segment[idx]
        mask_c = c2.valid[idx] & (seg_c != 0) & mask_slot
        prop_c = splat.prop_from_segment(seg_c)
        img = splat.render_frame(pos_l, prop_c, mask_c, cam, palette,
                                 cfg.render)
        return c2, jnp.sum(img)

    # chained per-call (what bench.py round-2 measured)
    c2, _ = sync(edit_and_frame(cloud, centers[0], cam))
    t0 = time.time()
    for i in range(3):
        c2, chk = edit_and_frame(c2, centers[i + 1], cam)
    sync(chk)
    print(f"{'per-call chained edit+frame':34s} "
          f"{(time.time() - t0)/3*1e3:8.2f} ms", flush=True)


if __name__ == "__main__":
    main()
