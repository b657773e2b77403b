"""Pallas TPU kernels for the hot grid ops.

The band-scan's jump-flood Voronoi is a chain of 72 roll/compare/select image
ops per band (segmentation._jump_flood).  As plain XLA ops each step round-trips
[G,G] buffers through HBM; the Pallas kernel pins the whole working set in VMEM
(G=512: 3 f32/i32 buffers = 3 MB) and runs every step + shift in one fused
program, so HBM traffic collapses to one load of the seeds and one store of the
result.

The kernel is numerically identical to the jnp reference path; tests compare
them in interpreter mode on CPU.  Enable with SegmentationConfig.use_pallas
(TPU only — pallas kernels don't run on the CPU backend outside interpret mode).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

INF = 3.0e38  # python literal: pallas kernels may not capture array constants


def _roll(x, shift, axis):
    """pltpu.roll with jnp.roll's sign convention (negative allowed)."""
    return pltpu.roll(x, shift % x.shape[axis], axis)


def _jfa_kernel(seed_slot_ref, sx_ref, sz_ref, cx_ref, cz_ref, out_ref):
    """Full jump-flood in VMEM: nearest seed slot per cell."""
    g = seed_slot_ref.shape[0]
    slot = seed_slot_ref[:]
    sx = sx_ref[:]
    sz = sz_ref[:]
    cx = cx_ref[:]
    cz = cz_ref[:]

    dist = jnp.where(
        slot >= 0, (sx - cx) ** 2 + (sz - cz) ** 2, INF
    )

    step = g // 2
    while step >= 1:
        for dy in (-step, 0, step):
            for dx in (-step, 0, step):
                if dx == 0 and dy == 0:
                    continue
                cs = _roll(_roll(slot, dy, 0), dx, 1)
                csx = _roll(_roll(sx, dy, 0), dx, 1)
                csz = _roll(_roll(sz, dy, 0), dx, 1)
                cd = jnp.where(
                    cs >= 0, (csx - cx) ** 2 + (csz - cz) ** 2, INF
                )
                better = cd < dist
                slot = jnp.where(better, cs, slot)
                sx = jnp.where(better, csx, sx)
                sz = jnp.where(better, csz, sz)
                dist = jnp.where(better, cd, dist)
        step //= 2
    out_ref[:] = slot


@functools.partial(jax.jit, static_argnames=("interpret",))
def jump_flood_pallas(
    seed_slot: jax.Array,   # i32[G,G], -1 where no seed
    seed_pos: jax.Array,    # f32[G,G,2] absolute seed coordinates
    cell_center: jax.Array, # f32[G,G,2]
    interpret: bool = False,
) -> jax.Array:
    """Pallas jump-flood; drop-in for segmentation._jump_flood."""
    g = seed_slot.shape[0]
    return pl.pallas_call(
        _jfa_kernel,
        out_shape=jax.ShapeDtypeStruct((g, g), jnp.int32),
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)] * 5,
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        interpret=interpret,
    )(
        seed_slot,
        seed_pos[..., 0],
        seed_pos[..., 1],
        cell_center[..., 0],
        cell_center[..., 1],
    )


def _eye_dome_kernel(z01_ref, color_ref, params_ref, out_ref):
    """Eye-dome lighting fused in VMEM (eye_dome.wgsl:37-67 semantics)."""
    near = params_ref[0, 0]
    far = params_ref[0, 1]
    strength = params_ref[0, 2]
    z01 = z01_ref[:]

    lin = jnp.where(z01 >= 1.0, 1.0, (2.0 * near) / (far + near - z01 * (far - near)))
    m = lin
    for axis, shift in ((0, 1), (0, -1), (1, 1), (1, -1)):
        nb = _roll(lin, shift, axis)
        # edge clamp: rolled-in wrap values replaced by own value
        idx = jax.lax.broadcasted_iota(jnp.int32, lin.shape, axis)
        edge = idx == (0 if shift == 1 else (lin.shape[axis] - 1))
        nb = jnp.where(edge, lin, nb)
        m = jnp.maximum(m, nb)
    m = jnp.minimum(m, lin + strength)
    alpha = jnp.where(z01 < 1.0, (m - lin) / strength, 0.0)

    ed_r = params_ref[0, 3]
    ed_g = params_ref[0, 4]
    ed_b = params_ref[0, 5]
    for c, ed in ((0, ed_r), (1, ed_g), (2, ed_b)):
        out_ref[c] = color_ref[c] * (1.0 - alpha) + ed * alpha


@functools.partial(jax.jit, static_argnames=("interpret",))
def eye_dome_pallas(
    color: jax.Array,  # f32[H,W,3]
    z01: jax.Array,    # f32[H,W]
    near: float,
    far: float,
    strength: float,
    ed_color: tuple[float, float, float],
    interpret: bool = False,
) -> jax.Array:
    """Fused eye-dome post-process; drop-in for render.splat.eye_dome."""
    h, w = z01.shape
    params = jnp.array(
        [[near, far, strength, ed_color[0], ed_color[1], ed_color[2], 0.0, 0.0]],
        jnp.float32,
    )
    chw = jnp.moveaxis(color, -1, 0)  # [3,H,W] planar for clean tiling
    out = pl.pallas_call(
        _eye_dome_kernel,
        out_shape=jax.ShapeDtypeStruct((3, h, w), jnp.float32),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.SMEM),
        ],
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        interpret=interpret,
    )(z01, chw, params)
    return jnp.moveaxis(out, 0, -1)
