"""Frame-stage TPU wall-clock profile: where do the 124 ms (full) / 26 ms (LOD)
frames go?

Splits rasterize (scatter) vs resolve (dilate) vs eye-dome, and measures the
LOD frame at several padded capacities to expose over-padded scatter/project
cost (bench.py round 1 padded the 52k-point LOD subset to 2M rows).

Run on the real TPU:  python tools/profile_frame.py
Env: PROF_POINTS (default 15_000_000), PROF_FRAMES (default 8).
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

    n_target = int(os.environ.get("PROF_POINTS", 15_000_000))
    n_frames = int(os.environ.get("PROF_FRAMES", 8))
    cfg = DEFAULT_CONFIG
    rcfg = cfg.render

    points_per_tree = 12_000
    n_trees = max(1, int(n_target * 0.75) // points_per_tree)
    pts = las.synthetic_forest(
        n_trees=n_trees, spacing=7.0, points_per_tree=points_per_tree,
        ground_points=n_target - n_trees * points_per_tree, seed=0,
    )
    n = len(pts)
    pos = jnp.asarray(pts)
    valid = jnp.ones(n, bool)
    prop = jnp.asarray((np.arange(n) % 256 / 255.0).astype(np.float32))
    palette = palettes.get(rcfg.palette)

    cam0 = Camera.orbital(distance=120.0)
    cams = [cam0]
    for _ in range(n_frames - 1):
        cams.append(cams[-1].rotate_orbital(40.0, 0.0))
    cam_stack = jax.tree_util.tree_map(lambda *xs: jnp.stack(xs), *cams)

    def sync(out):
        for leaf in jax.tree_util.tree_leaves(out):
            np.asarray(leaf.reshape(-1)[0])
        return out

    def bench(name, fn, *args, reps=2):
        t0 = time.time()
        out = sync(fn(*args))
        compile_s = time.time() - t0
        times = []
        for _ in range(reps):
            t0 = time.time()
            out = sync(fn(*args))
            times.append(time.time() - t0)
        per = min(times) / n_frames * 1e3
        print(f"{name:36s} {per:9.2f} ms/frame  (compile {compile_s:.1f}s)",
              flush=True)
        return out

    print(f"# frame profile: {n:,} pts, {n_frames} frames, "
          f"{rcfg.width}x{rcfg.height}, {jax.devices()[0]}", flush=True)

    def scan_frames(body):
        def outer(*args):
            def step(acc, cam):
                return acc + body(cam, *args), None
            total, _ = jax.lax.scan(step, jnp.float32(0.0), cam_stack)
            return total
        return jax.jit(outer)

    # stage 1: rasterize only (the 15M scatter)
    raster = scan_frames(
        lambda cam, pos, prop, valid: jnp.sum(
            splat.rasterize_keys(pos, prop, valid, cam, rcfg)
        ).astype(jnp.float32)
    )
    bench("rasterize_keys 15M", raster, pos, prop, valid)

    # one key image for the image-space stages
    kimg = jax.jit(
        lambda pos, prop, valid: splat.rasterize_keys(pos, prop, valid, cam0, rcfg)
    )(pos, prop, valid)
    sync(kimg)

    # stage 2: resolve (dilate + palette) only — camera-varied so scan can't hoist
    resolve = scan_frames(
        lambda cam, kimg: jnp.sum(splat.resolve_keys(kimg, cam, palette, rcfg)[0])
    )
    bench("resolve_keys (dilate r=%d)" % rcfg.max_splat_radius, resolve, kimg)

    # stage 3: eye-dome only
    color0, z010, _ = jax.jit(
        lambda kimg: splat.resolve_keys(kimg, cam0, palette, rcfg)
    )(kimg)
    sync((color0, z010))
    ed = scan_frames(
        lambda cam, color, z01: jnp.sum(splat.eye_dome(color, z01, rcfg))
        + 0.0 * cam.position[0]
    )
    bench("eye_dome", ed, color0, z010)

    # full frame at 15M
    full = scan_frames(
        lambda cam, pos, prop, valid: jnp.sum(
            splat.render_frame(pos, prop, valid, cam, palette, rcfg)
        )
    )
    bench("render_frame 15M", full, pos, prop, valid)

    # LOD frame at several padded capacities (subset ~52k live points)
    lod = octree.lod_mask(octree.build(pos, valid), level=7)
    for cap in (1 << 16, 1 << 17, 1 << 19, 2 << 20):
        count, (pos_l, prop_l) = jax.jit(
            lambda m, p, pr: octree.compact(m & valid, cap, p, pr)
        )(lod, pos, prop)
        sync((count, pos_l))
        mask_l = jnp.arange(cap) < count
        bench(f"render_frame LOD cap={cap}", full, pos_l, prop_l, mask_l)
        if cap == 1 << 16:
            print(f"  (lod live points: {int(count)})", flush=True)


if __name__ == "__main__":
    main()
