"""Multi-device scaling: point-sharded pipeline over a jax.sharding.Mesh.

The reference is single-process shared-memory (SURVEY.md §2.6: rayon pools +
crossbeam channels; no distributed backend).  Scaling the long axis there means
scaling point count — so the TPU-native distribution is data parallelism over
points with small replicated state:

- points are sharded along N across the ``data`` mesh axis; ``shard_points``
  splits whatever order the caller provides, and ``shard_points_morton``
  pre-orders by Morton key on the host (an ingest-side reorder) so each
  shard's contiguous range is spatially compact — the layout that keeps any
  future halo/neighbor traffic local to few devices;
- segmentation's only cross-shard coupling is the band moment grids: each
  device rasterizes its local points, one ``psum`` over ICI produces the global
  grids, the tracking scan runs replicated (tiny state), and Voronoi assignment
  is local per shard;
- characteristics likewise reduce per-(segment, slice) support maxima with
  ``pmax``;
- rendering composites shards by depth: ``pmin`` on the z-buffer, then a
  winner-takes resolve.

This is the 100M+ point path (BASELINE.md config 5): grid psums are O(B*G^2),
independent of N, so ICI traffic does not grow with the survey size.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from .. import segmentation as seg
from ..config import Config, DEFAULT_CONFIG


def make_mesh(devices=None, axis: str = "data") -> Mesh:
    devices = devices if devices is not None else jax.devices()
    return Mesh(np.asarray(devices), (axis,))


def shard_points(mesh: Mesh, pos, valid, axis: str = "data"):
    """Place padded point arrays with the batch dim sharded over the mesh."""
    sh = NamedSharding(mesh, P(axis))
    return (
        jax.device_put(pos, NamedSharding(mesh, P(axis, None))),
        jax.device_put(valid, sh),
    )


def shard_points_morton(mesh: Mesh, pos, valid, axis: str = "data"):
    """Morton-range sharding: host-side Z-order reorder, then contiguous
    shards.

    Points are sorted once by their Morton key (ops/morton) before upload —
    ingest already passes through the host, so the reorder is one argsort —
    and the contiguous range each device receives is then spatially compact
    (a run of Z-order cells) instead of an arbitrary slice of file order.
    The grid-psum pipeline is layout-agnostic (its collective is O(B*G^2)
    regardless), but compact shards bound each device's touched grid area
    and keep any future halo/neighbor exchange between Morton-adjacent
    devices.  Padding (invalid) rows sort to the end.

    Returns (pos_sharded, valid_sharded, order) where ``order`` maps shard
    row -> original point index (for scattering per-point results back).
    """
    from ..ops import morton

    pos_np = np.asarray(pos)
    valid_np = np.asarray(valid)
    if valid_np.any():
        lo = pos_np[valid_np].min(axis=0)
        hi = pos_np[valid_np].max(axis=0)
    else:
        lo, hi = np.zeros(3, np.float32), np.ones(3, np.float32)
    keys = np.asarray(
        morton.encode_positions(
            jnp.asarray(pos_np), jnp.asarray(lo, jnp.float32),
            jnp.asarray(hi, jnp.float32),
        )
    )
    keys = np.where(valid_np, keys, np.iinfo(np.int32).max)
    order = np.argsort(keys, kind="stable")
    pos_s, valid_s = shard_points(
        mesh, jnp.asarray(pos_np[order]), jnp.asarray(valid_np[order]), axis
    )
    return pos_s, valid_s, order


def sharded_segment(mesh: Mesh, cfg: Config = DEFAULT_CONFIG, axis: str = "data"):
    """Build the sharded segmentation step: (pos f32[N,3], valid, d) -> ids.

    N must be divisible by the mesh size.  Inside ``shard_map`` each device
    sees its local shard; collectives ride the mesh axis.
    """
    scfg = cfg.segmentation

    def local_step(pos, valid, d):
        # global bounds: local reduce + cross-device min/max
        # identity-valued local bounds: an all-padding shard must not pull
        # the global box to scene_bounds' (0,1) fallback (seg.scene_bounds_raw)
        lo_l, hi_l = seg.scene_bounds_raw(pos, valid)
        lo = jax.lax.pmin(lo_l, axis)
        hi = jax.lax.pmax(hi_l, axis)
        any_v = jax.lax.pmax(jnp.any(valid).astype(jnp.float32), axis) > 0
        lo, hi = seg.scene_bounds_finalize(lo, hi, any_v)
        s = seg.cell_size(lo, hi, d, scfg)
        # robust band anchor: local strided histogram + psum is EXACTLY the
        # global histogram (shard sizes are multiples of the stride)
        hist = jax.lax.psum(
            seg.anchor_histogram(pos, valid, lo[1], hi[1]), axis
        )
        top = seg.band_anchor(hist, lo[1], hi[1], scfg)
        band, cx, cz = seg.point_cells(pos, valid, lo, hi, s, scfg, top=top)
        cnt = seg.moment_grids(pos, valid, band, cx, cz, scfg)
        # the one big collective: global band count grids over ICI
        cnt = jax.lax.psum(cnt, axis)
        # replicated tracking scan (identical on every device)
        slot_grids, n_alloc, _, _ = seg.band_scan(cnt, lo, s, d, scfg)
        # local assignment
        segment = seg.assign_points(slot_grids, band, cx, cz, valid)
        return segment, n_alloc

    fn = jax.shard_map(
        local_step,
        mesh=mesh,
        in_specs=(P(axis, None), P(axis), P()),
        out_specs=(P(axis), P()),
    )
    return jax.jit(fn)


def sharded_pipeline_step(mesh: Mesh, cfg: Config = DEFAULT_CONFIG, axis: str = "data"):
    """Full sharded step: segmentation + FULL characteristics + classification.

    This is the multi-chip "training step" shape the driver dry-runs: point
    shards in; collectives are the O(B*G^2) band-grid psum (segmentation) and
    the O(S*MS) support-table pmax (characteristics) — both independent of
    the per-shard point count; per-point outputs stay sharded, the analytics
    table is replicated.
    """
    from .. import characteristics as ch

    scfg = cfg.segmentation

    def local_step(pos, valid, d):
        # identity-valued local bounds: an all-padding shard must not pull
        # the global box to scene_bounds' (0,1) fallback (seg.scene_bounds_raw)
        lo_l, hi_l = seg.scene_bounds_raw(pos, valid)
        lo = jax.lax.pmin(lo_l, axis)
        hi = jax.lax.pmax(hi_l, axis)
        any_v = jax.lax.pmax(jnp.any(valid).astype(jnp.float32), axis) > 0
        lo, hi = seg.scene_bounds_finalize(lo, hi, any_v)
        s = seg.cell_size(lo, hi, d, scfg)
        # robust band anchor: local strided histogram + psum is EXACTLY the
        # global histogram (shard sizes are multiples of the stride)
        hist = jax.lax.psum(
            seg.anchor_histogram(pos, valid, lo[1], hi[1]), axis
        )
        top = seg.band_anchor(hist, lo[1], hi[1], scfg)
        band, cx, cz = seg.point_cells(pos, valid, lo, hi, s, scfg, top=top)
        cnt = seg.moment_grids(pos, valid, band, cx, cz, scfg)
        cnt = jax.lax.psum(cnt, axis)
        slot_grids, n_alloc, _, _ = seg.band_scan(cnt, lo, s, d, scfg)
        segment = seg.assign_points(slot_grids, band, cx, cz, valid)

        table, classification = ch.compute_segments(
            pos, segment, valid, scfg.max_segments + 1, cfg.characteristics,
            full_bbox=False, axis_name=axis,
        )
        return segment, classification, n_alloc, table

    fn = jax.shard_map(
        local_step,
        mesh=mesh,
        in_specs=(P(axis, None), P(axis), P()),
        out_specs=(P(axis), P(axis), P(), P()),
    )
    return jax.jit(fn)


def sharded_inventory(mesh: Mesh, cfg: Config = DEFAULT_CONFIG,
                      axis: str = "data", method: int = 0,
                      symmetric: bool = False, axis_algo: str = "average",
                      **rbv_kw):
    """Whole-forest inventory over point shards: (pos, segment,
    classification, valid) -> (Traits [S], counts i32[S,3], found bool[S]).

    The batched inventory reductions (trunk_axis.batched_*,
    rbv.batched_split_rbv, Session.inventory's device core) are all
    per-segment scatter tables, so the sharded form is shard-local scatters
    + one collective per table: pmin/pmax for extents and max-method
    distance grids (EXACT), psum for the axis means and mean-method grids
    (float sums in shard order).  Collective volume is O(S * slices *
    sectors), independent of the per-shard point count — same scaling shape
    as the segmentation grid psum.  The per-segment [S]-math (directions,
    frames, trait formulas) then runs replicated.
    """
    from .. import rbv as rbv_mod
    from .. import trunk_axis as ta
    from ..cloud import CLASS_TRUNK
    from ..pipeline import _segment_class_counts

    S = cfg.segmentation.max_segments + 1
    axis_fn = (ta.batched_low_high_layer if axis_algo == "lowhigh"
               else ta.batched_average_direction)

    def local(pos, segment, classification, valid):
        live = valid & (segment > 0) & (segment < S)
        axes = axis_fn(pos, live & (classification == CLASS_TRUNK), segment,
                       S, axis_name=axis)
        tfs = ta.batched_axis_transform(axes)  # replicated [S,4,4]
        crown, trunk = rbv_mod.batched_split_rbv(
            pos, classification, live, segment, S, tfs,
            method=method, symmetric=symmetric, axis_name=axis, **rbv_kw)
        tr = rbv_mod.batched_traits(crown, trunk)
        counts = _segment_class_counts(segment, classification, live, S,
                                       axis_name=axis)
        return tr, counts, axes.found

    fn = jax.shard_map(
        local,
        mesh=mesh,
        in_specs=(P(axis, None), P(axis), P(axis), P(axis)),
        out_specs=(P(), P(), P()),
    )
    return jax.jit(fn)


def sharded_render(mesh: Mesh, cfg: Config = DEFAULT_CONFIG, axis: str = "data"):
    """Sharded splat frame: (pos, prop, mask, cam, palette) -> f32[H,W,3].

    Each device rasterizes its local point shard into the packed
    (depth << 8 | palette) key image; ONE ``pmin`` over the mesh composites
    depth — exact at the key level, because the z-test is a min over an
    associative integer key (render/splat.rasterize_keys).  Dilation, palette
    and eye-dome then run replicated on the composited [H,W] image
    (O(pixels), independent of N; the float shading may fuse slightly
    differently than the single-device program, see tests).
    The reference has no multi-GPU analogue; its wgpu pass draws every chunk
    on one queue (program.rs:309-311).
    """
    from ..render import splat

    rcfg = cfg.render

    def local_frame(pos, prop, mask, cam, palette):
        kimg = splat.rasterize_keys(pos, prop, mask, cam, rcfg)
        kimg = jax.lax.pmin(kimg, axis)
        color, z01, _ = splat.resolve_keys(kimg, cam, palette, rcfg)
        return splat.eye_dome(color, z01, rcfg)

    fn = jax.shard_map(
        local_frame,
        mesh=mesh,
        in_specs=(P(axis, None), P(axis), P(axis), P(), P()),
        out_specs=P(),
    )
    return jax.jit(fn)


def sharded_rasters(mesh: Mesh, pos_s, classification_s, live_s, lo, hi,
                    cell: float, cap: int = 4096, y_offset: float = 0.0,
                    axis: str = "data"):
    """DTM/DSM/CHM over a point-sharded cloud; bit-identical to the
    single-device rasters.compute_rasters.

    Each device scatter-min/maxes its local shard into the full [H, W]
    height grid; ONE ``pmin`` (ground) + ``pmax`` (surface) over ICI
    composite them — f32 min/max are exact, so the composited sentinel
    grids equal the single-device scatters bit-for-bit.  Hole fill and
    NODATA conversion then run replicated (O(grid), independent of N).
    Returns (grids dict, (rows, cols), cell) like compute_rasters.
    """
    from .. import rasters as rs

    (rows, cols), (ph, pw), cell = rs.grid_dims(lo, hi, cell, cap=cap)
    fn = _sharded_height_fn(mesh, (ph, pw), (rows, cols), axis)
    dtm_raw, dsm_raw = fn(
        pos_s, classification_s, live_s,
        jnp.float32(lo[0]), jnp.float32(lo[2]), jnp.float32(1.0 / cell),
    )
    return (
        rs.finalize_rasters(dtm_raw, dsm_raw, rows, cols, y_offset=y_offset),
        (rows, cols), cell,
    )


@functools.lru_cache(maxsize=8)
def _sharded_height_fn(mesh: Mesh, shape, live_dims, axis: str):
    """Jitted pmin/pmax height-grid compositor, cached per (mesh, grid) so
    repeated exports at the same cell size reuse the executable (grid
    origin and scale stay traced arguments)."""
    from .. import rasters as rs
    from ..cloud import CLASS_GROUND

    def local(pos, cls, live, lo_x, lo_z, inv_cell):
        ground = live & (cls == CLASS_GROUND)
        dtm, dsm = rs.height_grids(
            pos, ground, live, lo_x, lo_z, inv_cell, shape, live_dims
        )
        return jax.lax.pmin(dtm, axis), jax.lax.pmax(dsm, axis)

    fn = jax.shard_map(
        local, mesh=mesh,
        in_specs=(P(axis, None), P(axis), P(axis), P(), P(), P()),
        out_specs=(P(), P()),
    )
    return jax.jit(fn)
