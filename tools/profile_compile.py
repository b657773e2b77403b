"""Itemize XLA compile cost per executable (VERDICT r2 task 1).

BENCH_r02 paid 1544 s of cold compile for the 15M pipeline where r1 paid
72 s; nobody knows which executable regressed.  This times jit().lower()
(local tracing + StableHLO emission) and .compile() (XLA) SEPARATELY for
each executable in the bench path, using ShapeDtypeStructs so no 15M-point
host array is ever materialized.

Run on the real TPU (takes ~as long as the cold compile itself):
    python tools/profile_compile.py [component ...]
Components default to all.  The persistent compilation cache is NOT
enabled here, so every timing is a true cold compile (a remote axon
compile service may still cache server-side — compare reruns).

Prints one JSON line per component:
    {"component": ..., "lower_s": ..., "compile_s": ...}
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np


N = int(os.environ.get("PROFILE_POINTS", 15_000_000))


def sds(shape, dtype):
    return jax.ShapeDtypeStruct(shape, dtype)


def timeit(name, fn, *args, static=None, **kwargs):
    """Time lower+compile of jit(fn) on abstract args; print a JSON line."""
    t0 = time.time()
    try:
        jitted = jax.jit(fn, static_argnames=static) if static else jax.jit(fn)
        lowered = jitted.lower(*args, **kwargs)
        t_lower = time.time() - t0
        t0 = time.time()
        lowered.compile()
        t_compile = time.time() - t0
        row = {"component": name, "lower_s": round(t_lower, 1),
               "compile_s": round(t_compile, 1)}
    except Exception as e:  # keep going; a broken component is itself a finding
        row = {"component": name, "error": f"{type(e).__name__}: {e}"[:200]}
    print(json.dumps(row), flush=True)
    return row


def main() -> None:
    from treee_tpu.config import DEFAULT_CONFIG
    from treee_tpu import characteristics as ch
    from treee_tpu import segmentation as sg
    from treee_tpu.ops import octree
    from treee_tpu.render import Camera, palettes, splat

    want = set(sys.argv[1:])

    def on(name):
        return not want or name in want

    cfg = DEFAULT_CONFIG
    scfg = cfg.segmentation
    S = scfg.max_segments + 1
    B, G = scfg.max_bands, scfg.grid_size

    pos = sds((N, 3), jnp.float32)
    valid = sds((N,), jnp.bool_)
    seg = sds((N,), jnp.int32)
    d = sds((), jnp.float32)

    print(json.dumps({"component": "_meta", "n": N,
                      "device": str(jax.devices()[0])}), flush=True)

    if on("octree_build"):
        timeit("octree_build", octree.build, pos, valid)

    if on("segment_points"):
        timeit("segment_points",
               lambda p, v, dd: sg.segment_points(p, v, dd, scfg),
               pos, valid, d)

    if on("band_scan"):
        cnt = sds((B, G, G), jnp.int32)
        lo = sds((3,), jnp.float32)
        timeit("band_scan",
               lambda c, l, s_, dd: sg.band_scan(c, l, s_, dd, scfg),
               cnt, lo, d, d)

    if on("cc"):
        from treee_tpu.config import resolve_use_pallas
        occ = sds((B, G, G), jnp.bool_)
        timeit("cc_pallas" if resolve_use_pallas(scfg.use_pallas_cc) else "cc_xla",
               lambda o: sg._connected_components(
                   o, scfg.cc_iters, scfg.cc_occupied_cap,
                   pallas_sweeps=(scfg.cc_pallas_sweeps
                                  if resolve_use_pallas(scfg.use_pallas_cc)
                                  else 0),
                   pallas_bodies=scfg.cc_pallas_bodies),
               occ)

    if on("match"):
        from treee_tpu.ops.pallas_kernels import match_scan_pallas
        cents = sds((B, scfg.max_trees_per_band, 2), jnp.float32)
        cmask = sds((B, scfg.max_trees_per_band), jnp.bool_)
        timeit("match_scan_pallas",
               lambda c, m, r: match_scan_pallas(
                   c, m, r, scfg.match_rounds, scfg.max_segments),
               cents, cmask, d)

    if on("voronoi"):
        occ_idx = sds((scfg.cc_occupied_cap,), jnp.int32)
        occ_valid = sds((scfg.cc_occupied_cap,), jnp.bool_)
        tp = sds((B, scfg.max_segments, 2), jnp.float32)
        ta = sds((B, scfg.max_segments), jnp.bool_)
        lo = sds((3,), jnp.float32)
        timeit("bruteforce_voronoi",
               lambda oi, ov, p, a, l, s_: sg._bruteforce_voronoi(
                   oi, ov, p, a, l, s_, B, G, scfg.voronoi_chunk),
               occ_idx, occ_valid, tp, ta, lo, d)

    if on("compute_segments"):
        timeit("compute_segments",
               lambda p, s_, v: ch.compute_segments(
                   p, s_, v, S, cfg.characteristics, full_bbox=False),
               pos, seg, valid)

    if on("seg_scan"):
        from treee_tpu.ops.pallas_kernels import segmented_cummax_pallas
        key24 = sds((N,), jnp.int32)
        val12 = sds((N, 12), jnp.float32)
        timeit("segmented_cummax_pallas",
               lambda k, v: segmented_cummax_pallas(k, v, block=32768),
               key24, val12)

    if on("searchsorted"):
        ks = sds((N,), jnp.int32)
        qs = sds((S,), jnp.int32)
        timeit("searchsorted_scan_unrolled",
               lambda k, q: jnp.searchsorted(
                   k, q, side="left", method="scan_unrolled"),
               ks, qs)

    if on("full_step"):
        from treee_tpu.pipeline import full_pipeline

        def build_and_segment(p, v, dd):
            tree = octree.build(p, v)
            s_, c_, table, _ = full_pipeline(p, v, dd, cfg)
            return tree.keys, s_, c_, table.trunk_height

        timeit("full_step", build_and_segment, pos, valid, d)

    # --- render path ---
    palette = palettes.get(cfg.render.palette)
    cam0 = Camera.orbital(distance=120.0)
    cams = [cam0]
    for _ in range(7):
        cams.append(cams[-1].rotate_orbital(40.0, 0.0))
    cam_stack = jax.tree_util.tree_map(lambda *xs: jnp.stack(xs), *cams)
    prop = sds((N,), jnp.int32)

    if on("frame_sweep"):
        def sweep(p, pr, v, cs):
            def body(acc, cam):
                img = splat.render_frame(p, pr, v, cam, palette, cfg.render)
                return acc + jnp.sum(img), None
            total, _ = jax.lax.scan(body, jnp.float32(0.0), cs)
            return total
        timeit("frame_sweep", sweep, pos, prop, valid, cam_stack)

    if on("frame_one"):
        timeit("frame_one",
               lambda p, pr, v: splat.to_u8(splat.render_frame(
                   p, pr, v, cam0, palette, cfg.render)),
               pos, prop, valid)

    if on("lod"):
        timeit("build_lod",
               lambda p, v: octree.compact_indices(
                   octree.lod_mask(octree.build(p, v), level=7) & v, 2 << 20),
               pos, valid)

    if on("adaptive"):
        f_proj = cam0.projection_matrix(
            cfg.render.width / cfg.render.height)[1, 1]
        px_scale = float(f_proj) * (cfg.render.height / 2.0)
        timeit("adaptive_mask",
               lambda p, v: octree.compact_indices(
                   octree.adaptive_mask(
                       octree.build(p, v), cam0.position, px_scale,
                       tau_px=2.0) & v, N),
               pos, valid)

    if on("inventory"):
        from treee_tpu import rbv as rbv_mod
        from treee_tpu import trunk_axis as ta_mod
        from treee_tpu.cloud import CLASS_TRUNK
        from treee_tpu.pipeline import _segment_class_counts

        def inventory_pass(p, s_, c_, v):
            live = v & (s_ > 0) & (s_ < S)
            axes = ta_mod.batched_average_direction(
                p, live & (c_ == CLASS_TRUNK), s_, S)
            tfs = ta_mod.batched_axis_transform(axes)
            crown, trunk = rbv_mod.batched_split_rbv(p, c_, live, s_, S, tfs)
            tr = rbv_mod.batched_traits(crown, trunk)
            counts = _segment_class_counts(s_, c_, live, S)
            return tr.diameter_breast_height, tr.crown_volume, counts

        timeit("inventory", inventory_pass, pos, seg, seg, valid)

    if on("edit_scan"):
        from treee_tpu import interactive as edit_mod
        from treee_tpu.cloud import PointCloud
        lod_cap = 65536
        cloud = PointCloud(pos=pos, segment=seg, classification=seg,
                           valid=valid)
        idx = sds((lod_cap,), jnp.int32)
        pos_l = sds((lod_cap, 3), jnp.float32)
        mask_l = sds((lod_cap,), jnp.bool_)
        centers = sds((8, 3), jnp.float32)

        def scan_edits(cl, ctrs, cam, ix, pl, ml):
            def body(c, center):
                c2 = edit_mod.remove_points(c, center, 2.0, 0)
                seg_c = c2.segment[ix]
                mask_c = c2.valid[ix] & (seg_c != 0) & ml
                prop_c = splat.prop_from_segment(seg_c)
                img = splat.render_frame(pl, prop_c, mask_c, cam, palette,
                                         cfg.render)
                return c2, jnp.sum(img)
            c2, sums = jax.lax.scan(body, cl, ctrs)
            return jnp.sum(sums)

        timeit("edit_scan", scan_edits, cloud, centers, cam0, idx, pos_l,
               mask_l)


if __name__ == "__main__":
    main()
