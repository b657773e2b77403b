"""Benchmark: octree build + segmentation + characteristics throughput, and
splat frame time, on a 15M-point synthetic forest scan (BASELINE.md).

Prints ONE JSON line:
  {"metric": ..., "value": Mpts/s, "unit": "Mpts/s", "vs_baseline": ...,
   extras...}

Baseline: the reference publishes no numbers (SURVEY.md §6); the driver-defined
target is 15M points imported+segmented in < 5 s (=> 3 Mpts/s) and
60 FPS-equivalent frame compute on one v5e chip.  ``vs_baseline`` is measured
throughput / 3 Mpts/s.

Env knobs: BENCH_POINTS (default 15_000_000), BENCH_FRAMES (default 8).
"""

from __future__ import annotations

import functools
import json
import os
import sys
import threading
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

# The axon remote-TPU tunnel occasionally wedges a blocking transfer forever
# (device claim loss).  RESULT is filled incrementally; a watchdog hard-exits
# with whatever was measured so the driver still gets its JSON line.
RESULT: dict = {}
_LAST_PROGRESS = [time.time()]


def touch() -> None:
    _LAST_PROGRESS[0] = time.time()


def _watchdog(limit_s: float) -> None:
    while True:
        time.sleep(20)
        if time.time() - _LAST_PROGRESS[0] > limit_s:
            if "value" in RESULT:
                RESULT["wedged"] = True
                print(json.dumps(RESULT), flush=True)
                os._exit(0)
            # wedged before any measurement: the blocking transfer poisons
            # this process's jax client, so retry ONCE in a fresh process
            # (exec replaces the image; the wedged main thread dies with it)
            if not os.environ.get("BENCH_RETRIED"):
                print("# bench: wedged before any result; one fresh-process "
                      "retry", file=sys.stderr, flush=True)
                os.environ["BENCH_RETRIED"] = "1"
                os.execv(sys.executable,
                         [sys.executable, os.path.abspath(__file__)])
            print("# bench: wedged before any result", file=sys.stderr,
                  flush=True)
            os._exit(1)


def main() -> None:
    import jax

    threading.Thread(
        target=_watchdog,
        args=(float(os.environ.get("BENCH_WEDGE_S", 1800)),),
        daemon=True,
    ).start()

    # persistent compilation cache: first bench pays the (10-minute) XLA
    # compile, reruns load from disk (shared with the product paths)
    from treee_tpu.utils.cache import enable_compilation_cache

    enable_compilation_cache()

    import jax.numpy as jnp

    from treee_tpu.config import DEFAULT_CONFIG
    from treee_tpu.io import las
    from treee_tpu.ops import octree
    from treee_tpu.pipeline import full_pipeline
    from treee_tpu.render import Camera, palettes, splat

    n_target = int(os.environ.get("BENCH_POINTS", 15_000_000))
    n_frames = int(os.environ.get("BENCH_FRAMES", 8))
    cfg = DEFAULT_CONFIG
    # A/B knobs for the measured alternates (1 = on, 0/unset = config default)
    import dataclasses as _dc

    if os.environ.get("BENCH_PALLAS_SCAN"):
        cfg = cfg.replace(characteristics=_dc.replace(
            cfg.characteristics,
            use_pallas_scan=os.environ["BENCH_PALLAS_SCAN"] == "1"))
    if os.environ.get("BENCH_PACKED_JFA"):
        cfg = cfg.replace(segmentation=_dc.replace(
            cfg.segmentation,
            use_packed_jfa=os.environ["BENCH_PACKED_JFA"] == "1"))
    if os.environ.get("BENCH_BF_VORONOI"):
        cfg = cfg.replace(segmentation=_dc.replace(
            cfg.segmentation,
            use_bruteforce_voronoi=os.environ["BENCH_BF_VORONOI"] == "1"))
    if n_target > 24_000_000:
        # tighter column chunking of the support scans: identical results
        # and total work, lower peak HBM (30M at chunk=4 missed v5e HBM by
        # 48 MB of 15.75 GB)
        import dataclasses

        cfg = cfg.replace(
            characteristics=dataclasses.replace(
                cfg.characteristics, score_chunk=2
            )
        )

    # --- synthetic forest scan sized to the target (host) ---
    points_per_tree = 12_000
    ground_frac = 0.25
    n_trees = max(1, int(n_target * (1 - ground_frac)) // points_per_tree)
    t0 = time.time()
    pts = las.synthetic_forest(
        n_trees=n_trees,
        spacing=7.0,
        points_per_tree=points_per_tree,
        ground_points=n_target - n_trees * points_per_tree,
        seed=0,
    )
    gen_s = time.time() - t0
    n = len(pts)

    # --- host -> device (import path) ---
    t0 = time.time()
    pos = jnp.asarray(pts)
    valid = jnp.ones(n, bool)
    jax.block_until_ready(pos)
    upload_s = time.time() - t0

    d = jnp.float32(cfg.segmentation.max_distance)

    def build_and_segment(pos, valid, d):
        # keys-only build: bit-identical sorted keys to octree.build(...)
        # .keys (which is all this step ever returned — the order/rank
        # payloads were already DCE'd), minus the stable-sort tax
        keys = octree.build_keys(pos, valid)
        segment, classification, table, _ = full_pipeline(pos, valid, d, cfg)
        return keys, segment, classification, table.trunk_height

    step = jax.jit(build_and_segment)

    def sync(out):
        # block_until_ready is a no-op on some remote platforms (axon tunnel);
        # fetching one scalar per output forces real completion
        for leaf in jax.tree_util.tree_leaves(out):
            np.asarray(leaf.reshape(-1)[0])
        return out

    def sync1(out):
        # timing variant: ONE element fetch.  All leaves come from the same
        # XLA executable, which completes atomically — the first fetch
        # already waits for the whole program; per-leaf fetches would add
        # ~30 ms of pure tunnel round trips per extra leaf to the
        # measurement (3 leaves = ~90 ms phantom cost at 15M)
        np.asarray(jax.tree_util.tree_leaves(out)[0].reshape(-1)[0])
        return out

    print(f"# bench: generated {n:,} pts, compiling pipeline...", file=sys.stderr, flush=True)
    # warmup/compile
    t0 = time.time()
    out = sync(step(pos, valid, d))
    compile_s = time.time() - t0
    touch()
    print(f"# bench: pipeline compiled in {compile_s:.0f}s", file=sys.stderr, flush=True)

    # timed runs (dispatch-inclusive; reported as pipeline_dispatch_s)
    runs = []
    for i in range(3):
        t0 = time.time()
        out = sync1(step(pos, valid, d))
        runs.append(time.time() - t0)
        touch()
        print(f"# bench: run {i} {runs[-1]:.2f}s", file=sys.stderr, flush=True)
    sync(out)  # every leaf real before downstream consumers

    # device throughput: chain 8 pipeline executions through lax.scan with a
    # single dispatch + sync — the same methodology as the frame sweep below
    # (the ~30-45 ms axon-tunnel dispatch/fetch floor is not device work;
    # amortizing it over 8 in-scan runs instead of r3's 3 converges the
    # estimate toward true device time: residual bias ~5 ms vs ~15).
    # Each iteration's inputs ride the scanned d (valid & (d_i > 0) is
    # bit-identical to valid at runtime but data-dependent at trace time),
    # so XLA's loop-invariant code motion cannot hoist any stage out of the
    # loop — all 8 iterations execute in full.
    @jax.jit
    def pipeline_scan(pos, valid, d_stack):
        def body(acc, d_i):
            v_i = valid & (d_i > 0)
            keys, seg_i, cls_i, th = build_and_segment(pos, v_i, d_i)
            probe = (keys[0] + seg_i[0] + cls_i[0]).astype(jnp.float32)
            return acc + probe + th[0], None

        total, _ = jax.lax.scan(body, jnp.float32(0.0), d_stack)
        return total

    scan_reps = 8
    d_stack = jnp.full(scan_reps, cfg.segmentation.max_distance, jnp.float32)
    sync1(pipeline_scan(pos, valid, d_stack))  # compile
    touch()
    t0 = time.time()
    sync1(pipeline_scan(pos, valid, d_stack))
    pipe_s = (time.time() - t0) / scan_reps
    touch()
    print(f"# bench: scan-timed pipeline {pipe_s:.3f}s/run", file=sys.stderr,
          flush=True)
    mpts_per_s = n / pipe_s / 1e6

    target_mpts = 3.0  # 15M in <5s
    RESULT.update(
        metric="Mpts/sec octree build+segmentation; splat frame ms on 15M-point scan",
        value=round(mpts_per_s, 3),
        unit="Mpts/s",
        vs_baseline=round(mpts_per_s / target_mpts, 3),
        points=n,
        pipeline_s=round(pipe_s, 3),
        pipeline_dispatch_s=round(min(runs), 3),
        # dispatch-inclusive throughput so round-over-round deltas stay
        # apples-to-apples with the pre-r3 metric definition (advisor r3)
        mpts_per_s_dispatch=round(n / min(runs) / 1e6, 3),
        compile_s=round(compile_s, 1),
        upload_s=round(upload_s, 3),
        gen_s=round(gen_s, 1),
        device=str(jax.devices()[0]),
    )

    # --- frame sweep ---
    # One lax.scan over a stack of orbit cameras with a single sync: the axon
    # tunnel wedges on long per-frame host<->device sync chains, and per-frame
    # dispatch latency isn't what we want to measure anyway — pure device
    # frame compute is.
    segment = out[1]
    prop = splat.prop_from_segment(segment)
    palette = palettes.get(cfg.render.palette)
    cam0 = Camera.orbital(distance=120.0)
    cams = [cam0]
    for _ in range(n_frames - 1):
        cams.append(cams[-1].rotate_orbital(40.0, 0.0))
    cam_stack = jax.tree_util.tree_map(lambda *xs: jnp.stack(xs), *cams)

    @jax.jit
    def sweep(pos, prop, valid, cam_stack):
        def body(acc, cam):
            img = splat.render_frame(pos, prop, valid, cam, palette, cfg.render)
            return acc + jnp.sum(img), None

        total, _ = jax.lax.scan(body, jnp.float32(0.0), cam_stack)
        return total

    sync(sweep(pos, prop, valid, cam_stack))  # compile
    touch()
    print("# bench: frame sweep compiled", file=sys.stderr, flush=True)
    t0 = time.time()
    sync(sweep(pos, prop, valid, cam_stack))
    frame_ms = (time.time() - t0) / n_frames * 1e3
    touch()
    RESULT.update(frame_ms=round(frame_ms, 2), fps=round(1000.0 / frame_ms, 1))
    print(f"# bench: full-cloud frame {frame_ms:.0f} ms", file=sys.stderr,
          flush=True)

    # LOD frame sweep: the octree subset the reference lacks (its draw is
    # brute-force, program.rs:309-311).  The subset is INDEX-compacted once,
    # then padded SNUGLY: projection+scatter work scales with the padded row
    # count, so a 52k subset padded to 2M rows cost 26 ms/frame in round 1
    # while the same subset at a 64k cap costs ~7 ms (tools/profile_frame.py).
    build_lod = jax.jit(
        lambda pos, valid: octree.compact_indices(
            octree.lod_mask(octree.build(pos, valid), level=7) & valid,
            2 << 20,
        )
    )
    count, idx_big = sync(build_lod(pos, valid))
    lod_n = int(count)
    lod_cap = min(octree.snug_capacity(lod_n), n)
    idx = idx_big[:lod_cap]
    pos_l = pos[idx]
    prop_l = prop[idx]
    mask_l = jnp.arange(lod_cap) < count
    touch()
    print(f"# bench: lod built ({lod_n} pts, cap {lod_cap})", file=sys.stderr,
          flush=True)
    sync(sweep(pos_l, prop_l, mask_l, cam_stack))  # compile
    touch()
    print("# bench: lod sweep compiled", file=sys.stderr, flush=True)
    t0 = time.time()
    sync(sweep(pos_l, prop_l, mask_l, cam_stack))
    lod_frame_ms = (time.time() - t0) / n_frames * 1e3
    touch()
    RESULT.update(
        lod_frame_ms=round(lod_frame_ms, 2),
        lod_fps=round(1000.0 / lod_frame_ms, 1),
        lod_points=lod_n,
    )

    # ADAPTIVE frame: full-cloud rendering is scatter-bound (~122 ms at 15M
    # rows — the single z-scatter is primitive-optimal, CLAUDE.md), so the
    # honest fast path renders a screen-error cut (octree.adaptive_mask):
    # per-region octree level chosen so cells project <= tau px at the
    # node's camera distance.  tau=2 px beats the old distance-independent
    # level-10 voxel dedup OUTRIGHT — 0.989 vs 0.80 pixel match at the same
    # ~7M-point frame budget (tools/probe_tau.py, v5e 2026-08-19).  Measured
    # separately from the honest full-cloud number, with the fraction of
    # pixels identical to the full render as the quality evidence.
    f_proj = cam0.projection_matrix(cfg.render.width / cfg.render.height)[1, 1]
    px_scale = float(f_proj) * (cfg.render.height / 2.0)
    # AUTO-TAU: solve the screen-error cut from a row budget (n/2) over the
    # candidate ladder in ONE dispatch (octree.adaptive_counts) instead of
    # hand-picking tau per scale; the chosen tau is recorded below.  At 15M
    # this picks the same tau=2 as round 2's hand pick (7.1M rows <= 7.5M).
    from treee_tpu.pipeline import Session as _S

    tau_budget = n // 2
    counts_ladder = np.asarray(sync(jax.jit(
        lambda pos, valid: octree.adaptive_counts(
            octree.build(pos, valid), cam0.position, px_scale, _S.TAU_LADDER,
            live=valid,
        )
    )(pos, valid)))
    fits = np.nonzero(counts_ladder <= tau_budget)[0]
    tau = _S.TAU_LADDER[int(fits[0])] if len(fits) else _S.TAU_LADDER[-1]
    touch()
    print(f"# bench: auto tau = {tau} px (budget {tau_budget:,} rows)",
          file=sys.stderr, flush=True)
    count_a, idx_a_big = sync(jax.jit(
        lambda pos, valid: octree.compact_indices(
            octree.adaptive_mask(
                octree.build(pos, valid), cam0.position, px_scale,
                tau_px=tau,
            ) & valid,
            pos.shape[0],
        )
    )(pos, valid))
    ad_n = int(count_a)
    # render-only snapshot subset: no edit headroom, minimal padded rows
    # (frame cost scales with PADDED rows; snug_capacity keeps waste <~6%)
    ad_cap = min(octree.snug_capacity(ad_n, headroom=1.0), n)
    idx_a = idx_a_big[:ad_cap]
    pos_a, prop_a = pos[idx_a], prop[idx_a]
    mask_a = jnp.arange(ad_cap) < count_a
    touch()
    print(f"# bench: adaptive subset {ad_n} pts (cap {ad_cap})",
          file=sys.stderr, flush=True)
    sync(sweep(pos_a, prop_a, mask_a, cam_stack))  # compile
    touch()
    t0 = time.time()
    sync(sweep(pos_a, prop_a, mask_a, cam_stack))
    ad_ms = (time.time() - t0) / n_frames * 1e3
    touch()

    frame_full = jax.jit(
        lambda p, pr, v: splat.to_u8(
            splat.render_frame(p, pr, v, cam0, palettes.get(cfg.render.palette),
                               cfg.render))
    )
    img_f = np.asarray(frame_full(pos, prop, valid))
    img_a = np.asarray(frame_full(pos_a, prop_a, mask_a))
    match = float((img_f == img_a).all(axis=-1).mean())
    touch()
    RESULT.update(
        adaptive_frame_ms=round(ad_ms, 2),
        adaptive_fps=round(1000.0 / ad_ms, 1),
        adaptive_points=ad_n,
        adaptive_pixel_match=round(match, 4),
        adaptive_tau=tau,
    )
    print(f"# bench: adaptive frame {ad_ms:.1f} ms, {match:.1%} pixels == full",
          file=sys.stderr, flush=True)

    # NEAR-LOSSLESS screen-error cut at tau=1 px: the sub-pixel cells keep
    # full detail, so the image is ~indistinguishable from the full render
    # (pixel match ~1.0) at a fraction of the rows; rebuilt per camera move
    # in Session.build_lod(adaptive_tau_px=...).
    count_s, idx_s_big = sync(jax.jit(
        lambda pos, valid: octree.compact_indices(
            octree.adaptive_mask(
                octree.build(pos, valid), cam0.position, px_scale,
                tau_px=1.0,
            ) & valid,
            pos.shape[0],
        )
    )(pos, valid))
    sc_n = int(count_s)
    sc_cap = min(octree.snug_capacity(sc_n, headroom=1.0), n)
    idx_s = idx_s_big[:sc_cap]
    pos_s, prop_s = pos[idx_s], prop[idx_s]
    mask_s = jnp.arange(sc_cap) < count_s
    touch()
    print(f"# bench: screen-adaptive subset {sc_n} pts (cap {sc_cap})",
          file=sys.stderr, flush=True)
    sync(sweep(pos_s, prop_s, mask_s, cam_stack))  # compile
    touch()
    t0 = time.time()
    sync(sweep(pos_s, prop_s, mask_s, cam_stack))
    sc_ms = (time.time() - t0) / n_frames * 1e3
    touch()
    img_s = np.asarray(frame_full(pos_s, prop_s, mask_s))
    match_s = float((img_f == img_s).all(axis=-1).mean())
    touch()
    RESULT.update(
        screen_adaptive_frame_ms=round(sc_ms, 2),
        screen_adaptive_fps=round(1000.0 / sc_ms, 1),
        screen_adaptive_points=sc_n,
        screen_adaptive_pixel_match=round(match_s, 4),
    )
    print(f"# bench: screen-adaptive frame {sc_ms:.1f} ms, "
          f"{match_s:.1%} pixels == full", file=sys.stderr, flush=True)

    # --- whole-forest inventory: trunk axis + split RBV + all trait fields
    # for EVERY segment in one batched pass (Session.inventory's device
    # core).  The reference computes traits one focused tree at a time; the
    # cost here is a fixed number of [N] gathers/scatters, tree-count-free.
    try:
        from treee_tpu import rbv as rbv_mod
        from treee_tpu import trunk_axis as ta_mod
        from treee_tpu.cloud import CLASS_TRUNK
        from treee_tpu.pipeline import _segment_class_counts

        S = cfg.segmentation.max_segments + 1

        @jax.jit
        def inventory_pass(pos, segment, classification, valid):
            live = valid & (segment > 0) & (segment < S)
            axes = ta_mod.batched_average_direction(
                pos, live & (classification == CLASS_TRUNK), segment, S)
            tfs = ta_mod.batched_axis_transform(axes)
            crown, trunk = rbv_mod.batched_split_rbv(
                pos, classification, live, segment, S, tfs)
            tr = rbv_mod.batched_traits(crown, trunk)
            counts = _segment_class_counts(segment, classification, live, S)
            return tr.diameter_breast_height, tr.crown_volume, counts

        sync(inventory_pass(pos, segment, out[2], valid))  # compile
        touch()
        t0 = time.time()
        dbh, _, counts = sync(inventory_pass(pos, segment, out[2], valid))
        inv_s = time.time() - t0
        n_trees = int((np.asarray(counts).sum(axis=1) > 0).sum())
        RESULT.update(inventory_s=round(inv_s, 3), inventory_trees=n_trees)
        touch()
        print(f"# bench: whole-forest inventory {inv_s:.2f}s "
              f"({n_trees} trees)", file=sys.stderr, flush=True)
    except Exception as e:  # pragma: no cover — aux metric, never fatal
        print(f"# bench: inventory skipped: {e}", file=sys.stderr, flush=True)

    # --- focused-view analytics (VERDICT r4 task 8): the per-tree surface —
    # curvature k-NN recompute + the focus frame — measured on the LARGEST
    # segment of the bench scene (the ground-carrying segment at 15M, which
    # routes through the grid-hash neighbor engine), scan-amortized like
    # every other frame metric.  Reference analogue: the View-phase
    # recompute is interactive there (calculations.rs:269-376).
    try:
        from treee_tpu import characteristics as ch_mod

        try:
            tot = np.asarray(counts).sum(axis=1).astype(np.int64)
        except NameError:
            # inventory (which normally provides the per-segment counts)
            # failed: derive them directly so the focus rows survive
            S_f = cfg.segmentation.max_segments + 1

            @jax.jit
            def _seg_totals(segment, valid):
                live = valid & (segment > 0) & (segment < S_f)
                return jnp.zeros(S_f, jnp.int32).at[
                    jnp.where(live, segment, 0)
                ].add(live.astype(jnp.int32))

            tot = np.asarray(sync(_seg_totals(segment, valid))).astype(
                np.int64)
        tot[0] = 0
        sid = int(np.argmax(tot))
        seg_n = int(tot[sid])
        use_grid = seg_n > cfg.neighbors.brute_force_max
        k_nn = cfg.characteristics.neighbors
        member = valid & (segment == sid)

        reps_c = 2
        cap_sub = min(octree.snug_capacity(max(seg_n, 1), headroom=1.0), n)

        if use_grid:
            # grid path MUST run eagerly: knn_grid_reduce's host-side
            # slab/block dispatch (the only form that survives the v5e
            # in-map array-size limit, ops/neighbors.py) can't execute
            # under jit.  Eager dispatch overhead (~30 ms/block) is
            # noise against the multi-second computation — and one
            # timed rep after the compile warm-up is plenty for a
            # minutes-scale aux row.
            sync1(ch_mod.segment_curvature(pos, member, k=k_nn,
                                           use_grid=True))  # warm-up
            touch()
            t0 = time.time()
            sync1(ch_mod.segment_curvature(pos, member, k=k_nn,
                                           use_grid=True))
            curvature_ms = (time.time() - t0) * 1e3
        else:
            @jax.jit
            def curvature_scan(pos, member, d_stack):
                def body(acc, d_i):
                    # Session.curvature's brute path: compact the member
                    # rows first (a [tile, N] distance slab against full
                    # capacity is 61 GB at 15M — the OOM this round's
                    # first bench run caught), k-NN among members, scatter
                    # back — the full interactive cost
                    m_i = member & (d_i > 0)  # defeat LICM
                    count, idx = octree.compact_indices(m_i, cap_sub)
                    sub_valid = jnp.arange(cap_sub, dtype=jnp.int32) < count
                    sub = ch_mod.segment_curvature(
                        jnp.take(pos, idx, axis=0), sub_valid, k=k_nn,
                        use_grid=False)
                    idx_p = jnp.where(sub_valid, idx, n)
                    cv = jnp.zeros(n, sub.dtype).at[idx_p].set(
                        sub, mode="drop")
                    return acc + cv[0] + cv[-1], None

                total, _ = jax.lax.scan(
                    body, jnp.float32(0.0), d_stack)
                return total

            d_stack_c = jnp.ones(reps_c, jnp.float32)
            sync1(curvature_scan(pos, member, d_stack_c))  # compile
            touch()
            t0 = time.time()
            sync1(curvature_scan(pos, member, d_stack_c))
            curvature_ms = (time.time() - t0) / reps_c * 1e3
        touch()
        RESULT.update(
            curvature_ms=round(curvature_ms, 1),
            curvature_points=seg_n,
            curvature_grid=bool(use_grid),
        )
        print(f"# bench: curvature {curvature_ms:.0f} ms "
              f"({seg_n:,} pts, grid={use_grid})", file=sys.stderr,
              flush=True)

        # focus frame: the classification-colored splat + eye-dome
        # (Session.render_focus's device core).  Since round 5 the
        # brute-path focused frame renders the cached index-compacted
        # subset — splat cost scales with the PADDED row count, so the
        # ~64k-row subset replaces the member-masked full cloud; the
        # per-frame cost HERE includes the subset gathers through the
        # cached indices (what Session pays per frame).  Grid-path
        # (huge) segments still render the masked full cloud.
        cls_prop = jnp.take(
            jnp.asarray([1 / 8, 3 / 8, 6 / 8], jnp.float32), out[2])

        @jax.jit
        def focus_sweep(pos, prop, member, cam_stack):
            if not use_grid:
                count_f, idx_f = octree.compact_indices(member, cap_sub)
                sub_valid_f = (jnp.arange(cap_sub, dtype=jnp.int32)
                               < count_f)

            def body(acc, xs):
                cam, d_i = xs
                if use_grid:
                    color, z01, _ = splat.render_points(
                        pos, prop, member, cam, palette, cfg.render)
                else:
                    # idx_i depends on the scanned d_i so the three
                    # subset gathers stay INSIDE the loop (LICM would
                    # otherwise hoist them and under-report the
                    # per-frame cost Session pays; == idx_f at runtime)
                    idx_i = jnp.where(d_i > 0, idx_f, 0)
                    color, z01, _ = splat.render_points(
                        jnp.take(pos, idx_i, axis=0),
                        jnp.take(prop, idx_i),
                        sub_valid_f & jnp.take(member, idx_i),
                        cam, palette, cfg.render)
                img = splat.eye_dome(color, z01, cfg.render)
                return acc + jnp.sum(img), None

            total, _ = jax.lax.scan(
                body, jnp.float32(0.0),
                (cam_stack, jnp.ones(n_frames, jnp.int32)))
            return total

        sync1(focus_sweep(pos, cls_prop, member, cam_stack))  # compile
        touch()
        t0 = time.time()
        sync1(focus_sweep(pos, cls_prop, member, cam_stack))
        focus_ms = (time.time() - t0) / n_frames * 1e3
        touch()
        RESULT.update(focus_frame_ms=round(focus_ms, 2))
        print(f"# bench: focus frame {focus_ms:.1f} ms", file=sys.stderr,
              flush=True)
        del member, cls_prop
    except Exception as e:  # pragma: no cover — aux metric, never fatal
        print(f"# bench: focus metrics skipped: {e}", file=sys.stderr,
              flush=True)

    # --- interactive edit latency (BASELINE config 3: incremental octree/LOD
    # update).  The reference re-uploads the whole edited segment to the GPU
    # per brush stroke (interactive/mod.rs:182-221); here the edit is a pure
    # jitted transition on the SoA arrays and the next frame re-reads
    # segment/valid through the CACHED LOD indices with subset-sized gathers
    # — no full-N compaction, no octree re-sort (positions never move).
    from treee_tpu import interactive as edit_mod
    from treee_tpu.cloud import PointCloud

    cloud = PointCloud(
        pos=pos, segment=segment, classification=out[2], valid=valid
    )

    # one jitted scan over 8 strokes with a single sync, like the frame
    # sweep: per-call axon-tunnel dispatch (~30 ms floor, chained syncs worse)
    # is not the device cost being measured (see the sweep comment above);
    # measured on v5e: 8.7 ms/stroke device, ~20 ms/stroke dispatch-inclusive
    # (tools/probe_edit.py)
    centers = jnp.stack(
        [jnp.asarray([0.0, 5.0, 0.0], jnp.float32) + i for i in range(8)]
    )

    @jax.jit
    def scan_edits(cloud, centers, cam):
        def body(c, center):
            c2 = edit_mod.remove_points(c, center, 2.0, 0)
            seg_c = c2.segment[idx]
            mask_c = c2.valid[idx] & (seg_c != 0) & mask_l
            prop_c = splat.prop_from_segment(seg_c)
            img = splat.render_frame(pos_l, prop_c, mask_c, cam, palette,
                                     cfg.render)
            return c2, jnp.sum(img)

        c2, sums = jax.lax.scan(body, cloud, centers)
        return jnp.sum(sums)

    sync(scan_edits(cloud, centers, cam0))  # compile
    touch()
    t0 = time.time()
    sync(scan_edits(cloud, centers, cam0))
    edit_ms = (time.time() - t0) / 8 * 1e3
    touch()
    RESULT.update(edit_frame_ms=round(edit_ms, 2))
    print(f"# bench: edit+lod-frame {edit_ms:.1f} ms/stroke", file=sys.stderr,
          flush=True)
    center = centers[0]
    cloud2 = cloud

    # full-cloud edit + re-render (the round-1 metric, kept for comparison):
    # measured scatter floor at 15M rows is ~122 ms/frame (profile_frame.py),
    # so this is ~= edit + full frame by construction.  The cloud is DONATED
    # (it is consumed and rebound every call), so the edit mutates in place
    # instead of allocating a second 15M-point copy — donation does NOT take
    # over the axon tunnel (CLAUDE.md, tried 2026-08-19), so at 30M the
    # second copy plus the retained LOD/adaptive subsets exhausted HBM in
    # round 2.  Free every big subset the earlier metrics materialized
    # FIRST (they are done being measured), then run; on failure record the
    # reason explicitly instead of silently skipping (VERDICT r2 task 6).
    del idx_big, idx_a_big, idx_s_big, pos_a, prop_a, pos_s, prop_s
    del idx_a, idx_s, mask_a, mask_s, img_f, img_a, img_s
    import gc

    gc.collect()
    try:
        # scan-amortized DEVICE cost — the same methodology as every other
        # frame metric.  r3's 266 ms was the per-call chained loop below:
        # tools/probe_editfull.py (2026-08-20, 15M) measured the identical
        # fused step at 131.1 ms scan-amortized vs 292.9 ms per-call — the
        # 2x "gap" (VERDICT r3 weak #3) was non-pipelined output->input
        # dispatch over the axon tunnel, not device work.
        @jax.jit
        def scan_edit_full(cloud, centers3, cam):
            def body(c, center):
                c2 = edit_mod.remove_points(c, center, 2.0, 0)
                prop = splat.prop_from_segment(c2.segment)
                mask = c2.valid & (c2.segment != 0)
                img = splat.render_frame(c2.pos, prop, mask, cam, palette,
                                         cfg.render)
                return c2, jnp.sum(img)

            _, sums = jax.lax.scan(body, cloud, centers3)
            return jnp.sum(sums)

        centers3 = centers[:3] + jnp.float32(0.25)
        sync1(scan_edit_full(cloud, centers3, cam0))  # compile
        touch()
        t0 = time.time()
        sync1(scan_edit_full(cloud, centers3, cam0))
        RESULT.update(
            edit_full_frame_ms=round((time.time() - t0) / 3 * 1e3, 2)
        )
        touch()

        # per-call chained loop (dispatch-inclusive; r1-r3's method, kept
        # so the round-over-round series stays comparable).  Donation
        # consumes `cloud` — this must stay the LAST metric.
        @functools.partial(jax.jit, donate_argnums=0)
        def edit_and_full_frame(cloud, center, cam):
            c2 = edit_mod.remove_points(cloud, center, 2.0, 0)
            prop = splat.prop_from_segment(c2.segment)
            mask = c2.valid & (c2.segment != 0)
            img = splat.render_frame(c2.pos, prop, mask, cam, palette,
                                     cfg.render)
            return c2, jnp.sum(img)

        cloud2, _ = sync(edit_and_full_frame(cloud, center, cam0))
        touch()
        reps = 3
        t0 = time.time()
        for i in range(reps):
            cloud2, chk = edit_and_full_frame(cloud2, center + jnp.float32(i),
                                              cam0)
        sync(chk)
        RESULT.update(
            edit_full_frame_dispatch_ms=round((time.time() - t0) / reps * 1e3,
                                              2)
        )
        touch()
    except Exception as e:  # pragma: no cover
        RESULT["edit_full_frame_reason"] = f"{type(e).__name__}: {e}"[:300]
        print(f"# bench: full-cloud edit re-render skipped: {e}",
              file=sys.stderr, flush=True)
    print(json.dumps(RESULT))


if __name__ == "__main__":
    try:
        main()
    except Exception:
        # always emit the JSON line with whatever was measured
        if "value" in RESULT:
            RESULT["error"] = True
            print(json.dumps(RESULT), flush=True)
            raise
        # nothing measured yet: transient axon-tunnel failures (wedged
        # transfer, remote_compile HTTP 500 after a stale claim) poison the
        # in-process jax client, so retry ONCE in a fresh process
        if not os.environ.get("BENCH_RETRIED"):
            print("# bench: failed before any result; one fresh-process "
                  "retry", file=sys.stderr, flush=True)
            os.environ["BENCH_RETRIED"] = "1"
            os.execv(sys.executable,
                     [sys.executable, os.path.abspath(__file__)])
        raise
