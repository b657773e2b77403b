"""Tiled processing: surveys larger than one chip's HBM on a single chip.

BASELINE.md config 5 calls for 100M+ point surveys; one v5e chip holds ~40M
points (measured ceiling, bench.py).  Without a pod slice, the TPU-native
answer is HALO TILING — the same decomposition the sharded mesh path uses
spatially (parallel/sharding.py Morton ranges), driven sequentially through
one chip:

- the survey splits into x-range tiles, each EXTENDED by a halo at least as
  wide as the largest crown, so every tree lies fully inside >= 1 tile;
- every tile runs the SAME compiled pipeline executable (tiles are padded to
  one fixed capacity -> one XLA compilation);
- trees straddling a tile boundary are segmented by both neighbors; the
  halo points (present in both tiles) VOTE on an id-to-id mapping, and a
  host-side union-find merges the per-tile label spaces into global ids;
- each point takes its id from its PRIMARY tile (the tile whose core region
  contains it); per-segment analytics come from a tile that contains the
  tree's full extent.

The reference has no analogue: its native path holds the entire scan in RAM
and draws it brute-force (program.rs:309-311); its web build hard-caps at
15M points (laz.rs:49-62).
"""

from __future__ import annotations

import logging

import numpy as np

from ..config import Config, DEFAULT_CONFIG

log = logging.getLogger(__name__)


class _UnionFind:
    def __init__(self):
        self.parent: dict[int, int] = {}

    def find(self, x: int) -> int:
        p = self.parent.setdefault(x, x)
        while p != self.parent[p]:
            self.parent[p] = self.parent[self.parent[p]]
            p = self.parent[p]
        self.parent[x] = p
        return p

    def union(self, a: int, b: int) -> None:
        ra, rb = self.find(a), self.find(b)
        if ra != rb:
            self.parent[max(ra, rb)] = min(ra, rb)


def plan_tiles(x: np.ndarray, n_tiles: int, halo: float):
    """Split the x extent into ``n_tiles`` equal core ranges + halos.

    Returns a list of (core_lo, core_hi, ext_lo, ext_hi); cores partition
    [min, max] exactly (points are assigned to cores by x < core_hi, last
    core closed), extended ranges overlap by ``halo`` on interior edges.
    """
    lo, hi = float(x.min()), float(x.max())
    edges = np.linspace(lo, hi, n_tiles + 1)
    tiles = []
    for i in range(n_tiles):
        c0, c1 = float(edges[i]), float(edges[i + 1])
        e0 = c0 - (halo if i > 0 else 0.0)
        e1 = c1 + (halo if i < n_tiles - 1 else 0.0)
        tiles.append((c0, c1, e0, e1))
    return tiles


def tiled_pipeline(
    pos: np.ndarray,
    n_tiles: int,
    max_distance: float = 0.75,
    cfg: Config = DEFAULT_CONFIG,
    halo: float = 12.0,
    progress=None,
):
    """Segment a host-resident survey tile by tile on one chip.

    Args:
      pos: f32[N,3] y-up positions (host memory).
      n_tiles: number of x-range tiles; size each tile's point count to the
        single-chip ceiling (~40M on v5e).
      halo: overlap width [m]; must exceed the largest crown diameter so
        every tree is fully contained in at least one tile.
      progress: optional callable(tile_index, n_tiles).

    Returns (segment i32[N] global ids, tables list[SegmentTable], owners
    i32[S_global] -> (tile, local id) info dict).  Ids are dense from 1.
    """
    import jax
    import jax.numpy as jnp

    from ..pipeline import full_pipeline

    import time as _time

    n = len(pos)
    x = pos[:, 0]
    tiles = plan_tiles(x, n_tiles, halo)

    # fixed capacity so every tile reuses ONE compiled executable
    ext_counts = [
        int(((x >= e0) & (x <= e1)).sum()) for _, _, e0, e1 in tiles
    ]
    cap = max(1024, ((max(ext_counts) + 1023) // 1024) * 1024)

    segment_global = np.zeros(n, np.int32)
    tile_results = []  # (idx_ext, seg_ext, core_mask, table)
    tile_times = []  # per-tile (slice_s, run_s, fetch_s) for bench reporting
    for t, (c0, c1, e0, e1) in enumerate(tiles):
        if progress is not None:
            progress(t, n_tiles)
        t0 = _time.time()
        # int32 indices + small fetch dtypes: at 100M points the host slices
        # and the host<->device transfers are a real cost (the axon tunnel
        # moves ~360 MB up and ~90 MB down per 30M-point tile) — sel as i64
        # and i32 label fetches doubled both
        sel = np.flatnonzero((x >= e0) & (x <= e1)).astype(np.int32)
        tpos = np.zeros((cap, 3), np.float32)
        tpos[: len(sel)] = pos[sel]
        tvalid = np.arange(cap) < len(sel)
        t1 = _time.time()
        seg, classification, table, _ = full_pipeline(
            jnp.asarray(tpos), jnp.asarray(tvalid),
            jnp.float32(max_distance), cfg,
        )
        # fetch compactly: segment ids < max_segments+2 (= 2050 default) fit
        # u16, classification in {0,1,2} fits u8
        seg_dt = (jnp.uint16
                  if cfg.segmentation.max_segments + 2 <= 0xFFFF else jnp.int32)
        seg_np = np.asarray(seg.astype(seg_dt))[: len(sel)].astype(np.int32)
        cls_np = np.asarray(classification.astype(jnp.uint8))[: len(sel)]
        cls_np = cls_np.astype(np.int32)
        t2 = _time.time()
        last = t == n_tiles - 1
        core = (pos[sel, 0] >= c0) & (
            (pos[sel, 0] <= c1) if last else (pos[sel, 0] < c1)
        )
        tile_results.append((sel, seg_np, cls_np, core, table))
        tile_times.append((t1 - t0, t2 - t1))
        log.info("tile %d/%d: slice %.1fs run+fetch %.1fs",
                 t + 1, n_tiles, t1 - t0, t2 - t1)
        # free device buffers before the next tile
        del seg, classification

    # --- cross-tile reconciliation: halo points are in BOTH neighbors; each
    # (left id, right id) co-occurrence votes for a merge ---
    uf = _UnionFind()

    def gid(tile: int, local: int) -> int:
        return tile * (cfg.segmentation.max_segments + 2) + local

    for t in range(n_tiles - 1):
        sel_a, seg_a = tile_results[t][0], tile_results[t][1]
        sel_b, seg_b = tile_results[t + 1][0], tile_results[t + 1][1]
        # shared points: original indices present in both extended
        # selections (flatnonzero outputs are sorted-unique)
        _, ka, kb = np.intersect1d(
            sel_a, sel_b, assume_unique=True, return_indices=True
        )
        ia, ib = seg_a[ka], seg_b[kb]
        m = (ia > 0) & (ib > 0)
        pairs = (ia[m].astype(np.int64) << 32) | ib[m].astype(np.int64)
        uniq, counts = np.unique(pairs, return_counts=True)
        if not len(uniq):
            continue
        left = (uniq >> 32).astype(np.int64)
        right = (uniq & 0xFFFFFFFF).astype(np.int64)
        # majority mapping per left id (a tree split by noise votes low):
        # stable-sort by (left, count); the last row per left id wins
        order = np.lexsort((counts, left))
        left_s, right_s, cnt_s = left[order], right[order], counts[order]
        is_last = np.concatenate([left_s[1:] != left_s[:-1], [True]])
        for ia_, ib_, v in zip(left_s[is_last], right_s[is_last],
                               cnt_s[is_last]):
            if v >= 3:  # noise floor
                uf.union(gid(t, int(ia_)), gid(t + 1, int(ib_)))

    # --- dense global ids; per-point assignment from the PRIMARY tile ---
    remap: dict[int, int] = {}
    next_id = 1
    classification_global = np.zeros(n, np.int32)
    # owner tile per global id: the tile holding the most of the tree's core
    # points — with halo >= crown diameter that tile contains its full extent,
    # so per-segment analytics read from tables[owner_tile] at the local id
    owners: dict[int, tuple[int, int]] = {}
    owner_counts: dict[int, int] = {}
    for t, (sel, seg_np, cls_np, core, _table) in enumerate(tile_results):
        core_idx = sel[core]
        seg_core = seg_np[core]
        # small local->global lookup table, then one vectorized relabel pass
        lut = np.zeros(cfg.segmentation.max_segments + 2, np.int32)
        for sid, cnt in zip(*np.unique(seg_core, return_counts=True)):
            if sid == 0:
                continue
            root = uf.find(gid(t, int(sid)))
            if root not in remap:
                remap[root] = next_id
                next_id += 1
            g = remap[root]
            lut[int(sid)] = g
            if int(cnt) > owner_counts.get(g, 0):
                owner_counts[g] = int(cnt)
                owners[g] = (t, int(sid))
        segment_global[core_idx] = lut[seg_core]
        classification_global[core_idx] = cls_np[core]

    tables = [r[4] for r in tile_results]
    info = {
        "n_tiles": n_tiles,
        "capacity": cap,
        "n_segments": next_id - 1,
        "halo": halo,
        "tile_times": tile_times,
        "owners": owners,
    }
    return segment_global, classification_global, tables, info
