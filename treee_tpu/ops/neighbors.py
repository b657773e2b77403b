"""k-nearest-neighbor search: tiled brute force (exact) and grid hash (scalable).

Replaces the reference's ``k-nearest`` KD-tree crate (k-nearest/src/kd_tree.rs:19-143)
used for the 31-neighbor curvature property (treee/src/calculations.rs:328-373).
Pointer-chasing KD-trees are hostile to TPUs; the TPU-native designs are:

- ``knn_bruteforce``: tiled exact search.  Distances via the matmul identity
  ``|q-p|^2 = |q|^2 + |p|^2 - 2 q.p`` so the inner product rides the MXU, then
  ``lax.top_k``.  Queries are processed in fixed tiles with ``lax.map`` to bound
  memory; exact for any k, used for segment-sized inputs and as the test oracle.

- ``knn_grid``: grid-hash candidate search.  Points are bucketed into cells of a
  chosen radius via one sort; each query gathers a capped number of candidates
  from its 27 neighboring cells and runs top-k on that pool.  Approximate when a
  cell overflows its cap or all true neighbors lie further than one cell away;
  exactness improves with ``cell_capacity``.

Both return self in the neighbor set (the reference KD-tree does too: the query
point is a member of the tree, distance 0).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

INF = jnp.float32(3.0e38)


def _pairwise_sqdist(q: jax.Array, p: jax.Array) -> jax.Array:
    """|q_i - p_j|^2 for f32[T,3] x f32[N,3] -> f32[T,N] via MXU matmul."""
    qn = jnp.sum(q * q, axis=-1, keepdims=True)
    pn = jnp.sum(p * p, axis=-1)
    # HIGHEST keeps the MXU in f32 passes; the default bf16 truncation is far
    # too coarse for squared-distance cancellation.
    cross = jnp.dot(
        q, p.T, preferred_element_type=jnp.float32,
        precision=jax.lax.Precision.HIGHEST,
    )
    return jnp.maximum(qn + pn[None, :] - 2.0 * cross, 0.0)


@functools.partial(jax.jit, static_argnames=("k", "tile"))
def knn_bruteforce(
    pos: jax.Array,
    valid: jax.Array,
    k: int = 31,
    tile: int = 1024,
) -> tuple[jax.Array, jax.Array]:
    """Exact k-NN of every point against all valid points.

    Returns (indices i32[N,k], sqdist f32[N,k]); rows of invalid queries contain
    self-padding.  Exact counterpart of KDTree::k_nearest with unbounded radius
    (calculations.rs:279-280: k=31, max_distance=f32::MAX).
    """
    n = pos.shape[0]
    pad = (-n) % tile
    qpos = jnp.pad(pos, ((0, pad), (0, 0)))
    p_masked = jnp.where(valid[:, None], pos, INF)

    def one_tile(q: jax.Array) -> tuple[jax.Array, jax.Array]:
        d = _pairwise_sqdist(q, p_masked)
        d = jnp.where(valid[None, :], d, INF)
        neg, idx = jax.lax.top_k(-d, k)
        return idx.astype(jnp.int32), -neg

    tiles = qpos.reshape(-1, tile, 3)
    idx, dist = jax.lax.map(one_tile, tiles)
    return idx.reshape(-1, k)[:n], dist.reshape(-1, k)[:n]


class GridHash:
    """Static-shape spatial hash built from one sort; see module docstring."""

    def __init__(self, pos, valid, cell_size, grid_bits: int = 7):
        """grid_bits: per-axis resolution 2^grid_bits cells (wraps by clipping)."""
        self.cell_size = cell_size
        self.grid_bits = grid_bits
        g = 1 << grid_bits
        lo = jnp.min(jnp.where(valid[:, None], pos, INF), axis=0)
        self.lo = lo
        cell = jnp.clip(
            jnp.floor((pos - lo) / cell_size).astype(jnp.int32), 0, g - 1
        )
        cid = (cell[:, 0] << (2 * grid_bits)) | (cell[:, 1] << grid_bits) | cell[:, 2]
        cid = jnp.where(valid, cid, jnp.int32(0x7FFFFFFF))
        self.cell_ids_sorted, self.point_order = jax.lax.sort(
            (cid, jnp.arange(pos.shape[0], dtype=jnp.int32)), dimension=0, num_keys=1
        )
        self.cell = cell
        self.pos = pos
        self.valid = valid


@functools.partial(jax.jit, static_argnames=("k", "cell_capacity", "tile", "grid_bits"))
def knn_grid(
    pos: jax.Array,
    valid: jax.Array,
    cell_size: jax.Array | float,
    k: int = 31,
    cell_capacity: int = 16,
    tile: int = 2048,
    grid_bits: int = 7,
) -> tuple[jax.Array, jax.Array]:
    """Approximate k-NN via 27-cell candidate gather; see module docstring."""
    n = pos.shape[0]
    grid = GridHash(pos, valid, cell_size, grid_bits)
    g = 1 << grid_bits
    sorted_cids = grid.cell_ids_sorted
    order = grid.point_order

    # 27 neighbor-cell offsets
    offs = jnp.array(
        [(dx, dy, dz) for dx in (-1, 0, 1) for dy in (-1, 0, 1) for dz in (-1, 0, 1)],
        jnp.int32,
    )  # [27, 3]

    pad = (-n) % tile
    q_cells = jnp.pad(grid.cell, ((0, pad), (0, 0)))
    q_pos = jnp.pad(pos, ((0, pad), (0, 0)))

    cap = cell_capacity
    slot_off = jnp.arange(cap, dtype=jnp.int32)

    def one_tile(args):
        qc, qp = args  # [T,3], [T,3]
        nc = qc[:, None, :] + offs[None, :, :]  # [T,27,3]
        in_grid = jnp.all((nc >= 0) & (nc < g), axis=-1)  # [T,27]
        ncid = (nc[..., 0] << (2 * grid_bits)) | (nc[..., 1] << grid_bits) | nc[..., 2]
        # scan_unrolled: ~3x cheaper than the default scan method at these
        # query counts (CLAUDE.md searchsorted rule, tools/microbench.py)
        start = jnp.searchsorted(sorted_cids, ncid, side="left",
                                 method="scan_unrolled")  # [T,27]
        end = jnp.searchsorted(sorted_cids, ncid, side="right",
                               method="scan_unrolled")
        slots = start[..., None] + slot_off  # [T,27,cap]
        cand_ok = in_grid[..., None] & (slots < end[..., None])
        slots = jnp.clip(slots, 0, n - 1)
        cand = order[slots]  # [T,27,cap] point indices
        cand = cand.reshape(cand.shape[0], -1)  # [T, 27*cap]
        cand_ok = cand_ok.reshape(cand_ok.shape[0], -1)
        cpos = pos[cand]  # [T, 27*cap, 3]
        d = jnp.sum((cpos - qp[:, None, :]) ** 2, axis=-1)
        d = jnp.where(cand_ok & valid[cand], d, INF)
        neg, ci = jax.lax.top_k(-d, k)
        return jnp.take_along_axis(cand, ci, axis=1), -neg

    tiles = (q_cells.reshape(-1, tile, 3), q_pos.reshape(-1, tile, 3))
    idx, dist = jax.lax.map(one_tile, tiles)
    return idx.reshape(-1, k)[:n], dist.reshape(-1, k)[:n]


def neighbor_covariance(
    pos: jax.Array, nbr_idx: jax.Array, nbr_valid: jax.Array | None = None
) -> jax.Array:
    """Covariance of each point's neighbor set, f32[N,3,3].

    Mean over neighbors then outer-product accumulation, matching
    calculations.rs:342-365 (division by neighbor count, not count-1).
    """
    nbrs = pos[nbr_idx]  # [N,k,3]
    if nbr_valid is None:
        count = jnp.float32(nbr_idx.shape[1])
        mean = jnp.mean(nbrs, axis=1, keepdims=True)
        diff = nbrs - mean
        return jnp.einsum("nki,nkj->nij", diff, diff) / count
    w = nbr_valid.astype(jnp.float32)[..., None]          # [N,k,1]
    count = jnp.maximum(jnp.sum(w, axis=1, keepdims=True), 1.0)  # [N,1,1]
    mean = jnp.sum(nbrs * w, axis=1, keepdims=True) / count      # [N,1,3]
    diff = (nbrs - mean) * w
    cov = jnp.einsum("nki,nkj->nij", diff, diff)
    return cov / count
