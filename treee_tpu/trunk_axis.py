"""Trunk-axis estimation for a focused segment.

Capability parity with treee/src/interactive/trunk_axis.rs: two algorithms that
fit an origin + direction to the trunk-classified points —

- AverageDirection (:108-178): split the trunk into ``layers`` horizontal
  layers; origin = mean (x,z) of points with y in [min+0.4, min+0.6) (fallback:
  lowest layer mean); direction = normalized sum of unit vectors from the
  origin to each layer's mean.
- LowHighLayer (:181-232): means of the lowest and highest ``layer_width``
  bands, connected.

Both are masked reductions over the segment's points (scatter-mean per layer),
no loops.  ``axis_transform`` reproduces TrunkAxis::transform (:56-70): the
affine frame whose y-axis is the trunk direction, used to align RBVs.
"""

from __future__ import annotations

import functools

import flax.struct
import jax
import jax.numpy as jnp

INF = jnp.float32(3.0e38)


class TrunkAxis(flax.struct.PyTreeNode):
    origin: jax.Array     # f32[3]
    direction: jax.Array  # f32[3] unit, roughly +y
    found: jax.Array      # bool — False when no trunk points


def _masked_minmax_y(pos, mask):
    y = pos[:, 1]
    lo = jnp.min(jnp.where(mask, y, INF))
    hi = jnp.max(jnp.where(mask, y, -INF))
    any_pt = jnp.any(mask)
    return jnp.where(any_pt, lo, 0.0), jnp.where(any_pt, hi, 0.0), any_pt


@functools.partial(jax.jit, static_argnames=("layers",))
def average_direction(pos: jax.Array, mask: jax.Array, layers: int = 10) -> TrunkAxis:
    """AverageDirection algorithm (trunk_axis.rs:108-178)."""
    lo, hi, found = _masked_minmax_y(pos, mask)
    xz = jnp.stack([pos[:, 0], pos[:, 2]], axis=-1)
    y = pos[:, 1]

    # origin: mean of the 0.4-0.6 m band above the base (trunk_axis.rs:133-139)
    band = mask & (y >= lo + 0.4) & (y < lo + 0.6)
    band_n = jnp.sum(band.astype(jnp.float32))
    band_sum = jnp.sum(jnp.where(band[:, None], xz, 0.0), axis=0)

    layer_h = jnp.maximum((hi - lo) / layers, 1e-6)
    li = jnp.clip(((y - lo) / layer_h).astype(jnp.int32), 0, layers - 1)
    tgt = jnp.where(mask, li, layers)
    lsum_x = jnp.zeros(layers + 1).at[tgt].add(jnp.where(mask, pos[:, 0], 0.0))[:layers]
    lsum_z = jnp.zeros(layers + 1).at[tgt].add(jnp.where(mask, pos[:, 2], 0.0))[:layers]
    lcnt = jnp.zeros(layers + 1).at[tgt].add(mask.astype(jnp.float32))[:layers]
    lmean = jnp.stack(
        [lsum_x / jnp.maximum(lcnt, 1.0), lsum_z / jnp.maximum(lcnt, 1.0)], axis=-1
    )

    origin_xz = jnp.where(
        band_n > 0, band_sum / jnp.maximum(band_n, 1.0), lmean[0]
    )
    origin = jnp.array([origin_xz[0], 0.0, origin_xz[1]]) + jnp.array([0.0, 1.0, 0.0]) * lo

    heights = lo + (jnp.arange(layers, dtype=jnp.float32) + 0.5) * layer_h
    means3 = jnp.stack([lmean[:, 0], heights, lmean[:, 1]], axis=-1)
    vecs = means3 - origin
    norms = jnp.linalg.norm(vecs, axis=-1, keepdims=True)
    unit = jnp.where((lcnt > 0)[:, None], vecs / jnp.maximum(norms, 1e-6), 0.0)
    direction = jnp.sum(unit, axis=0)
    direction = direction / jnp.maximum(jnp.linalg.norm(direction), 1e-6)
    direction = jnp.where(found, direction, jnp.array([0.0, 1.0, 0.0]))
    origin = jnp.where(found, origin, jnp.zeros(3))
    return TrunkAxis(origin=origin, direction=direction, found=found)


@jax.jit
def low_high_layer(pos: jax.Array, mask: jax.Array, layer_width=1.0) -> TrunkAxis:
    """LowHighLayer algorithm (trunk_axis.rs:181-232)."""
    lo, hi, found = _masked_minmax_y(pos, mask)
    y = pos[:, 1]
    # floor the layer width: a height-degenerate slice (hi == lo) would
    # otherwise make both band masks empty and the means collapse to x=z=0
    layer = jnp.maximum(
        jnp.minimum(jnp.asarray(layer_width, jnp.float32), (hi - lo) / 2.0),
        1e-3,
    )
    low = mask & (y - lo < layer)
    high = mask & (hi - y < layer)

    def mean_xz(m):
        n = jnp.maximum(jnp.sum(m.astype(jnp.float32)), 1.0)
        sx = jnp.sum(jnp.where(m, pos[:, 0], 0.0))
        sz = jnp.sum(jnp.where(m, pos[:, 2], 0.0))
        return jnp.array([sx / n, sz / n])

    lm, hm = mean_xz(low), mean_xz(high)
    origin = jnp.array([lm[0], lo, lm[1]])
    target = jnp.array([hm[0], hi, hm[1]])
    direction = target - origin
    norm = jnp.linalg.norm(direction)
    # degenerate (zero-extent) axis: report vertical instead of a zero
    # vector, which would make axis_transform singular
    direction = jnp.where(
        norm > 1e-6, direction / jnp.maximum(norm, 1e-6),
        jnp.array([0.0, 1.0, 0.0]),
    )
    direction = jnp.where(found, direction, jnp.array([0.0, 1.0, 0.0]))
    origin = jnp.where(found, origin, jnp.zeros(3))
    return TrunkAxis(origin=origin, direction=direction, found=found)


@jax.jit
def axis_transform(axis: TrunkAxis) -> jax.Array:
    """4x4 affine with y = trunk direction at the origin (trunk_axis.rs:56-70)."""
    yv = axis.direction
    xv = jnp.cross(yv, jnp.array([0.0, 0.0, 1.0]))
    xv = xv / jnp.maximum(jnp.linalg.norm(xv), 1e-6)
    zv = jnp.cross(xv, yv)
    m = jnp.eye(4)
    m = m.at[:3, 0].set(xv).at[:3, 1].set(yv).at[:3, 2].set(zv)
    m = m.at[:3, 3].set(axis.origin)
    return m


def axis_lines(axis: TrunkAxis, scale) -> jax.Array:
    """Render lines: axis + ground cross, f32[6,2,3] endpoints
    (TrunkAxisRender, trunk_axis.rs:24-43 geometry, 3 lines there, axis+2 cross)."""
    o, d = axis.origin, axis.direction
    ex = jnp.array([2.5, 0.0, 0.0])
    ez = jnp.array([0.0, 0.0, 2.5])
    return jnp.stack(
        [
            jnp.stack([o, o + d * scale]),
            jnp.stack([o - ex, o + ex]),
            jnp.stack([o - ez, o + ez]),
        ]
    )
