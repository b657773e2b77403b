"""Itemize the full-cloud edit+re-render metric (VERDICT r3 weak #3).

bench.py r3 measured edit_full_frame_ms=266 at 15M via a 3-iteration
PER-CALL loop (donated carry), while its components measure edit ~8 ms +
full frame ~120 ms scan-amortized.  This probe separates:

  A. scan-amortized device cost of the SAME fused edit+full-frame step
     (lax.scan, cloud as carry — donation implicit in the scan buffers)
  B. the r3 per-call chained loop (output->input each iteration)
  C. full frame alone, scan-amortized
  D. edit alone, scan-amortized
  E. prop_from_segment + live-mask alone, scan-amortized

If A ~= C + D + E ~= 130-160 ms, the 266 ms was per-call dispatch overhead
(non-pipelined output->input chains over the axon tunnel), not device
work — then bench.py should measure this metric scan-amortized like every
other frame metric, keeping the per-call number as *_dispatch_ms.

Run on the real TPU: python tools/probe_editfull.py  (env PROBE_POINTS)
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

    import functools

    import jax.numpy as jnp

    from treee_tpu import interactive as edit_mod
    from treee_tpu.cloud import PointCloud
    from treee_tpu.config import DEFAULT_CONFIG
    from treee_tpu.io import las
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
    print(f"# points: {n:,}", flush=True)
    pos = jnp.asarray(pts)
    valid = jnp.ones(n, bool)
    seg = (jnp.arange(n, dtype=jnp.int32) % 97) + 1
    cloud = PointCloud(pos=pos, segment=seg,
                       classification=jnp.zeros(n, jnp.int32), valid=valid)
    palette = palettes.get(cfg.render.palette)
    cam = Camera.orbital(distance=120.0)
    centers = jnp.stack([
        jnp.array([(i % 5) * 6.0 - 12.0, 6.0, (i // 5) * 6.0 - 6.0],
                  jnp.float32) for i in range(3)
    ])

    def sync1(x):
        np.asarray(jax.device_get(x.reshape(-1)[0] if hasattr(x, "reshape")
                                  else x))

    def timed(label, fn, *args, reps=1, per=1):
        out = fn(*args)
        sync1(out if not isinstance(out, tuple) else out[-1])  # compile
        t0 = time.time()
        for _ in range(reps):
            out = fn(*args)
        sync1(out if not isinstance(out, tuple) else out[-1])
        dt = (time.time() - t0) / (reps * per) * 1e3
        print(f"{label}: {dt:.1f} ms", flush=True)
        return dt

    # --- A: fused edit + full frame, scan-amortized --------------------------
    @jax.jit
    def scan_edit_full(cloud, centers, cam):
        def body(c, center):
            c2 = edit_mod.remove_points(c, center, 2.0, 0)
            prop = splat.prop_from_segment(c2.segment)
            mask = c2.valid & (c2.segment != 0)
            img = splat.render_frame(c2.pos, prop, mask, cam, palette,
                                     cfg.render)
            return c2, jnp.sum(img)

        c2, sums = jax.lax.scan(body, cloud, centers)
        return jnp.sum(sums)

    timed("A scan edit+full_frame (per stroke)", scan_edit_full,
          cloud, centers, cam, per=3)

    # --- C: full frame alone, scan-amortized --------------------------------
    @functools.partial(jax.jit, static_argnames=("reps",))
    def scan_frame(cloud, cam, reps):
        prop = splat.prop_from_segment(cloud.segment)
        mask = cloud.valid & (cloud.segment != 0)

        def body(acc, i):
            img = splat.render_frame(cloud.pos, prop, mask, cam, palette,
                                     cfg.render)
            return acc + jnp.sum(img) + jnp.float32(i), None

        tot, _ = jax.lax.scan(body, jnp.float32(0), jnp.arange(reps))
        return tot

    timed("C frame alone (prop/mask hoisted)", scan_frame, cloud, cam,
          3, per=3)

    # --- D: edit alone, scan-amortized --------------------------------------
    @jax.jit
    def scan_edit(cloud, centers):
        def body(c, center):
            c2 = edit_mod.remove_points(c, center, 2.0, 0)
            return c2, jnp.sum(c2.segment[:1])

        c2, sums = jax.lax.scan(body, cloud, centers)
        return jnp.sum(sums)

    timed("D edit alone (per stroke)", scan_edit, cloud, centers, per=3)

    # --- E: prop + mask alone, scan-amortized -------------------------------
    @functools.partial(jax.jit, static_argnames=("reps",))
    def scan_prop(cloud, reps):
        def body(acc, i):
            prop = splat.prop_from_segment(cloud.segment + i)
            mask = cloud.valid & (cloud.segment + i != 0)
            return acc + prop[0] + jnp.sum(mask[:1]), None

        tot, _ = jax.lax.scan(body, jnp.float32(0), jnp.arange(reps))
        return tot

    timed("E prop_from_segment + mask (per rep)", scan_prop, cloud, 3, per=3)

    # --- B: the r3 per-call chained loop ------------------------------------
    @functools.partial(jax.jit, donate_argnums=0)
    def edit_and_full_frame(cloud, center, cam):
        c2 = edit_mod.remove_points(cloud, center, 2.0, 0)
        prop = splat.prop_from_segment(c2.segment)
        mask = c2.valid & (c2.segment != 0)
        img = splat.render_frame(c2.pos, prop, mask, cam, palette,
                                 cfg.render)
        return c2, jnp.sum(img)

    cloud_b = jax.tree.map(jnp.copy, cloud)  # B donates its carry
    cloud2, chk = edit_and_full_frame(cloud_b, centers[0], cam)
    sync1(chk)  # compile
    t0 = time.time()
    for i in range(3):
        cloud2, chk = edit_and_full_frame(cloud2, centers[0]
                                          + jnp.float32(i), cam)
    sync1(chk)
    print(f"B per-call chained loop (per stroke): "
          f"{(time.time() - t0) / 3 * 1e3:.1f} ms", flush=True)
    del cloud2



if __name__ == "__main__":
    main()
