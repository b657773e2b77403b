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


def _dilate_kernel(kimg_ref, params_ref, out_ref, *, radius):
    """Splat dilation fused in VMEM (render/splat.resolve_keys semantics).

    ``radius`` min-depth growth passes over the 8-neighborhood with the
    circle test; the winner's pixel radius is recomputed from its packed key
    each probe (pure ALU) instead of carrying a radius plane, so the live
    state is just (key, sdx, sdy).  As plain XLA ops this stage is ~radius*8
    separate HBM round-trips over [H,W]; here it is one load + one store.
    """
    p22 = params_ref[0, 0]
    p23 = params_ref[0, 1]
    coef = params_ref[0, 2]
    zscale = 1.0 / float((1 << 23) - 1)
    ibig = 0x7FFFFFFF

    def rad(kk):
        z = (kk >> 8).astype(jnp.float32) * zscale
        d = p23 / jnp.minimum(z + p22, -1e-9)
        return jnp.maximum(coef / jnp.maximum(d, 1e-6), 0.71)

    k = kimg_ref[:]
    h, w = k.shape
    row = jax.lax.broadcasted_iota(jnp.int32, (h, w), 0)
    col = jax.lax.broadcasted_iota(jnp.int32, (h, w), 1)
    # source offsets packed ((sdx+8)<<4 | sdy+8) into one plane: |offset| <=
    # radius <= 7, and fewer live [H,W] planes keeps the scoped VMEM budget
    sd = jnp.full_like(k, (8 << 4) | 8)
    for _ in range(radius):
        for dy, dx in ((-1, 0), (1, 0), (0, -1), (0, 1),
                       (-1, -1), (-1, 1), (1, -1), (1, 1)):
            ck = _roll(_roll(k, dy, 0), dx, 1)
            csd = _roll(_roll(sd, dy, 0), dx, 1)
            cdx = (csd >> 4) - 8 + dx
            cdy = (csd & 15) - 8 + dy
            crd = rad(ck)
            inside = (cdx * cdx + cdy * cdy).astype(jnp.float32) <= crd * crd
            # pltpu.roll wraps: mask destinations whose source row/col came
            # from the opposite screen edge (same fix as the XLA scan path)
            src_ok = (
                (row - dy >= 0) & (row - dy < h)
                & (col - dx >= 0) & (col - dx < w)
            )
            better = (ck != ibig) & inside & (ck < k) & src_ok
            k = jnp.where(better, ck, k)
            sd = jnp.where(better, ((cdx + 8) << 4) | (cdy + 8), sd)
    out_ref[:] = k


@functools.partial(jax.jit, static_argnames=("radius", "interpret"))
def dilate_pallas(
    kimg: jax.Array,  # i32[H,W] packed (depth<<8 | palette) keys
    p22: jax.Array | float,
    p23: jax.Array | float,
    coef: jax.Array | float,  # point_size * proj[1,1] * h/2
    radius: int = 3,
    interpret: bool = False,
) -> jax.Array:
    """Fused splat dilation; drop-in for the scan in render/splat.resolve_keys.

    The offset plane packs (sdx+8)<<4 | (sdy+8) into 4-bit biased fields, so
    only radius <= 7 is representable; resolve_keys routes larger radii to the
    XLA scan path, and this guard catches direct callers.
    """
    if radius > 7:
        raise ValueError(
            f"dilate_pallas radius {radius} > 7 would overflow the packed "
            "4-bit offset fields; use the XLA dilation path"
        )
    h, w = kimg.shape
    params = jnp.stack(
        [jnp.float32(p22), jnp.float32(p23), jnp.float32(coef),
         jnp.float32(0.0)]
    )[None, :]
    return pl.pallas_call(
        functools.partial(_dilate_kernel, radius=radius),
        out_shape=jax.ShapeDtypeStruct((h, w), jnp.int32),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.SMEM),
        ],
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        # ~5 [H,W] i32 planes live (in/out/k/sd + roll temp): above the 16MB
        # default scoped budget at 720p but well within v5e's physical VMEM
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024
        ),
        interpret=interpret,
    )(kimg, params)


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
        # [3,H,W] color in+out exceeds the 16MB default scoped budget at 720p
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024
        ),
        interpret=interpret,
    )(z01, chw, params)
    return jnp.moveaxis(out, 0, -1)


_IBIG = 0x7FFFFFFF  # python literal: kernels may not capture jnp constants


def _cc_sweep_kernel(lbl_ref, out_ref, *, sweeps):
    """``sweeps`` 3x3 min-pool label-propagation sweeps over one band, in VMEM.

    Drop-in for the reduce_window sweeps inside segmentation's CC body
    (segmentation._connected_components): each XLA sweep round-trips the full
    [B,G,G] label stack through HBM, while here the band's plane stays VMEM-
    resident for all ``sweeps`` iterations — per-sweep cost collapses from an
    HBM pass to pure VPU work.  Occupancy is recovered from the labels
    themselves (unoccupied cells hold IBIG and must stay IBIG); rolls wrap, so
    wrapped rows/cols are masked to IBIG via iota compares.
    """
    g = lbl_ref.shape[1]
    x0 = lbl_ref[0]
    occ = x0 < _IBIG
    row = jax.lax.broadcasted_iota(jnp.int32, (g, g), 0)
    col = jax.lax.broadcasted_iota(jnp.int32, (g, g), 1)
    first_r = row == 0
    last_r = row == g - 1
    first_c = col == 0
    last_c = col == g - 1

    def sweep(_, x):
        dn = jnp.where(first_r, _IBIG, _roll(x, 1, 0))    # neighbor above
        up = jnp.where(last_r, _IBIG, _roll(x, -1, 0))    # neighbor below
        m = jnp.minimum(jnp.minimum(up, dn), x)
        rt = jnp.where(first_c, _IBIG, _roll(m, 1, 1))    # neighbor left
        lf = jnp.where(last_c, _IBIG, _roll(m, -1, 1))    # neighbor right
        p = jnp.minimum(jnp.minimum(lf, rt), m)
        return jnp.where(occ, p, _IBIG)

    out_ref[0] = jax.lax.fori_loop(0, sweeps, sweep, x0)


@functools.partial(jax.jit, static_argnames=("sweeps", "interpret"))
def cc_sweep_pallas(
    lbl: jax.Array,  # i32[B,G,G]; IBIG where unoccupied
    sweeps: int,
    interpret: bool = False,
) -> jax.Array:
    """``sweeps`` batched min-pool CC sweeps; one grid step per band."""
    b, g, _ = lbl.shape
    return pl.pallas_call(
        functools.partial(_cc_sweep_kernel, sweeps=sweeps),
        grid=(b,),
        out_shape=jax.ShapeDtypeStruct((b, g, g), jnp.int32),
        in_specs=[
            pl.BlockSpec((1, g, g), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, g, g), lambda i: (i, 0, 0),
                               memory_space=pltpu.VMEM),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary",),
        ),
        interpret=interpret,
    )(lbl)


def _match_kernel(
    cx_ref, cz_ref, cm_ref, r_ref,
    tpx_ref, tpz_ref, act_ref, nal_ref,
    st_ref, na_ref, *, rounds,
):
    """One band of the tracked-centroid matching scan, whole state in VMEM.

    Mirrors segmentation._match_band exactly: ``rounds`` mutual-nearest
    pairing passes, then free-slot allocation for unmatched clusters.  The
    tracked state persists across the sequential band grid in a (T,3) VMEM
    scratch (px, pz, active) + an SMEM n_alloc counter, replacing the XLA
    lax.scan whose 64 bands x rounds of small [T,C] ops are per-op-overhead
    bound (~103 ms at T=2048, C=256 on v5e; tools/probe_bandscan.py).

    Argmins are equality-selects (first index of the row/column min), which
    is exactly jnp.argmin's tie rule.  Gathers/scatters of the XLA version
    (cents[row_best], taken.at[col].set, free_order[new_rank]) become one-hot
    (T,C) compare-selects — Mosaic has no vectorized gather.
    """
    i = pl.program_id(0)
    t_cap = st_ref.shape[0]
    c_cap = cx_ref.shape[2]

    @pl.when(i == 0)
    def _init():
        st_ref[:, :] = jnp.zeros((t_cap, 3), jnp.float32)
        na_ref[0, 0] = 0

    px = st_ref[:, 0:1]                     # (T,1)
    pz = st_ref[:, 1:2]
    act = st_ref[:, 2:3] > 0.5              # (T,1) bool
    cx = cx_ref[0]                          # (1,C)
    cz = cz_ref[0]
    cmask = cm_ref[0] > 0
    radius = r_ref[0, 0]

    row_i = jax.lax.broadcasted_iota(jnp.int32, (t_cap, c_cap), 0)
    col_i = jax.lax.broadcasted_iota(jnp.int32, (t_cap, c_cap), 1)
    ibig = 0x7FFFFFFF

    def round_body(carry):
        px, pz, taken = carry
        dx = px - cx
        dz = pz - cz
        d = jnp.sqrt(dx * dx + dz * dz)
        d = jnp.where(act & ~taken, d, INF)
        row_val = jnp.min(d, axis=1, keepdims=True)          # (T,1)
        row_best = jnp.min(
            jnp.where(d == row_val, col_i, ibig), axis=1, keepdims=True
        )
        col_val = jnp.min(d, axis=0, keepdims=True)          # (1,C)
        col_best = jnp.min(
            jnp.where(d == col_val, row_i, ibig), axis=0, keepdims=True
        )
        pair = (
            (col_i == row_best) & (row_i == col_best)
            & (row_val <= radius) & act & ~taken
        )
        mrow = jnp.max(pair.astype(jnp.int32), axis=1, keepdims=True) > 0
        new_px = jnp.sum(jnp.where(pair, cx, 0.0), axis=1, keepdims=True)
        new_pz = jnp.sum(jnp.where(pair, cz, 0.0), axis=1, keepdims=True)
        px = jnp.where(mrow, new_px, px)
        pz = jnp.where(mrow, new_pz, pz)
        taken = taken | (
            jnp.max(pair.astype(jnp.int32), axis=0, keepdims=True) > 0
        )
        return px, pz, taken

    # static unroll: Mosaic fails to legalize scf.for with this mixed-shape
    # tuple carry, and rounds is tiny (default 4)
    carry = (px, pz, ~cmask)
    for _ in range(rounds):
        carry = round_body(carry)
    px, pz, taken = carry

    # --- allocation: k-th new cluster -> k-th free slot by index ---
    is_new = (cmask & ~taken).astype(jnp.int32)              # (1,C)
    cs = is_new
    lane = col_i[0:1, :]
    s = 1
    while s < c_cap:
        cs = cs + jnp.where(lane >= s, _roll(cs, s, 1), 0)
        s *= 2
    new_rank = cs - 1                                        # (1,C)

    ifree = 1 - act.astype(jnp.int32)                        # (T,1)
    n_free = jnp.sum(ifree)
    fs = ifree
    sub = row_i[:, 0:1]
    s = 1
    while s < t_cap:
        fs = fs + jnp.where(sub >= s, _roll(fs, s, 0), 0)
        s *= 2
    freerank = fs - 1                                        # (T,1)

    okc = (is_new > 0) & (new_rank < n_free)                 # (1,C)
    assign = okc & (~act) & (freerank == new_rank)           # (T,C)
    arow = jnp.max(assign.astype(jnp.int32), axis=1, keepdims=True) > 0
    px = jnp.where(arow, jnp.sum(jnp.where(assign, cx, 0.0), axis=1,
                                 keepdims=True), px)
    pz = jnp.where(arow, jnp.sum(jnp.where(assign, cz, 0.0), axis=1,
                                 keepdims=True), pz)
    act = act | arow
    na_ref[0, 0] = na_ref[0, 0] + jnp.sum(okc.astype(jnp.int32))

    st_ref[:, 0:1] = px
    st_ref[:, 1:2] = pz
    st_ref[:, 2:3] = act.astype(jnp.float32)
    tpx_ref[0] = px
    tpz_ref[0] = pz
    act_ref[0] = act.astype(jnp.int32)
    nal_ref[0] = jnp.broadcast_to(na_ref[0, 0], (1, 1))  # no scalar VMEM store


@functools.partial(jax.jit, static_argnames=("rounds", "t_cap", "interpret"))
def match_scan_pallas(
    cents: jax.Array,        # f32[B, C, 2]
    cmask: jax.Array,        # bool[B, C]
    match_radius: jax.Array, # f32 scalar (traced)
    rounds: int,
    t_cap: int,
    interpret: bool = False,
):
    """Tracked-centroid matching over all bands in one sequential-grid kernel.

    Drop-in for the band_step lax.scan in segmentation.band_scan; returns
    (tracked_pos f32[B,T,2], active bool[B,T], n_alloc i32) with per-band
    snapshots exactly matching the scan's stacked ys.
    """
    b, c_cap, _ = cents.shape
    r = jnp.asarray(match_radius, jnp.float32).reshape(1, 1)
    # leading singleton on the (B, C) inputs: Mosaic needs the second-minor
    # block dim to divide 8 or equal the array dim, so blocks are (1, 1, C)
    tpx, tpz, act, nal = pl.pallas_call(
        functools.partial(_match_kernel, rounds=rounds),
        grid=(b,),
        out_shape=[
            jax.ShapeDtypeStruct((b, t_cap, 1), jnp.float32),
            jax.ShapeDtypeStruct((b, t_cap, 1), jnp.float32),
            jax.ShapeDtypeStruct((b, t_cap, 1), jnp.int32),
            jax.ShapeDtypeStruct((b, 1, 1), jnp.int32),
        ],
        in_specs=[
            pl.BlockSpec((1, 1, c_cap), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, c_cap), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, c_cap), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.SMEM),
        ],
        out_specs=[
            pl.BlockSpec((1, t_cap, 1), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, t_cap, 1), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, t_cap, 1), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, 1), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        scratch_shapes=[
            pltpu.VMEM((t_cap, 3), jnp.float32),
            pltpu.SMEM((1, 1), jnp.int32),
        ],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary",),  # sequential: tracking carry
            # the (T,C) work planes put ~18 MB on the kernel's VMEM stack at
            # bench scale (T=2048, C=256, 4 rounds), just over the 16 MB
            # default — whether the default compile fits depends on the
            # surrounding HLO (it first tripped after an unrelated
            # segmentation change recompiled this executable, 2026-08-19)
            vmem_limit_bytes=100 * 1024 * 1024,
        ),
        interpret=interpret,
    )(
        cents[..., 0][:, None, :], cents[..., 1][:, None, :],
        cmask.astype(jnp.int32)[:, None, :], r,
    )
    tracked_pos = jnp.concatenate([tpx, tpz], axis=-1)
    return tracked_pos, act[..., 0] > 0, nal[-1, 0, 0]


def _seg_cumsum_kernel(kv_ref, out_ref, carry_ref):
    """Segmented cumulative SUM twin of :func:`_seg_cummax_kernel`: same
    (C+1, B) layout, carry and key plumbing; the recurrence adds instead of
    maxing and the neutral element is 0.  Per-run prefix sums RESET at run
    boundaries, so the run-end value is the exact per-run total with no
    cross-run accumulation (no catastrophic cancellation against a global
    prefix).  Summation order is the doubling-tree order — callers treat
    results as float sums (tolerance), like any scatter-add."""
    i = pl.program_id(0)
    c1 = kv_ref.shape[0]

    @pl.when(i == 0)
    def _init():
        carry_ref[0:1, :] = jnp.full((1, 1), -1.0, jnp.float32)
        carry_ref[1:, :] = jnp.zeros((c1 - 1, 1), jnp.float32)

    kv = kv_ref[:]
    key = kv[0:1, :]
    val = kv[1:, :]
    b = kv.shape[1]
    lane = jax.lax.broadcasted_iota(jnp.int32, (1, b), 1)
    s = 1
    while s < b:
        ok = (lane >= s) & (key == _roll(key, s, 1))
        cand = _roll(val, s, 1)
        val = val + jnp.where(ok, cand, 0.0)
        s *= 2

    ckey = carry_ref[0:1, :]
    cval = carry_ref[1:, :]
    val = jnp.where(key == ckey, val + cval, val)
    out_ref[:, :] = val
    carry_ref[0:1, :] = key[:, -1:]
    carry_ref[1:, :] = val[:, -1:]


@functools.partial(jax.jit, static_argnames=("block", "interpret"))
def segmented_cumsum_pallas(
    key: jax.Array,   # i32[N], sorted ascending, values in [0, 2^24)
    val: jax.Array,   # f32[N] or f32[N, C]
    block: int = 8192,
    interpret: bool = False,
) -> jax.Array:
    """Forward inclusive per-run cumulative sum (see _seg_cumsum_kernel);
    the run-END element holds the run total — one kernel replaces C
    [N]-operand scatter-adds for sorted keys (rbv/trunk_axis inventory
    reductions, ~130 ms per scattered column at 15M on v5e)."""
    squeeze = val.ndim == 1
    v = val[:, None] if squeeze else val
    n, c = v.shape
    kv = jnp.concatenate(
        [key.astype(jnp.float32)[None, :], v.T], axis=0
    )  # (C+1, N)
    nb = -(-n // block)
    npad = nb * block
    if npad != n:
        pad = jnp.zeros((c + 1, npad - n), jnp.float32)
        pad = pad.at[0, :].set(_PAD_KEY)
        kv = jnp.concatenate([kv, pad], axis=1)
    out = pl.pallas_call(
        _seg_cumsum_kernel,
        grid=(nb,),
        out_shape=jax.ShapeDtypeStruct((c, npad), jnp.float32),
        in_specs=[
            pl.BlockSpec((c + 1, block), lambda i: (0, i),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((c, block), lambda i: (0, i),
                               memory_space=pltpu.VMEM),
        scratch_shapes=[pltpu.VMEM((c + 1, 1), jnp.float32)],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary",),  # sequential carry
            vmem_limit_bytes=100 * 1024 * 1024,
        ),
        interpret=interpret,
    )(kv)
    res = out[:, :n].T
    return res[:, 0] if squeeze else res


def _seg_cummax_kernel(kv_ref, out_ref, carry_ref):
    """One block of the single-pass segmented cumulative max.

    ``kv_ref`` (C+1, B): row 0 is the sorted run key (small non-negative
    ints, exact in f32), rows 1..C are value channels.  The in-block scan is
    log2(B) shifted-doubling passes — the same recurrence XLA runs in
    characteristics._segmented_cummax, but on VMEM-resident data, so the 8+
    full-array HBM round trips collapse to one load + one store.  The carry
    (previous block's trailing run key + running max) lives in a VMEM
    (C+1, 1) scratch that persists across the sequential TPU grid; keys
    being globally sorted makes "continues the previous run" exactly
    ``key == carry_key`` (no other lane can equal an earlier block's key).
    """
    i = pl.program_id(0)
    c1 = kv_ref.shape[0]

    @pl.when(i == 0)
    def _init():
        # key row -1.0 matches no real key (keys are >= 0); piecewise
        # stores — a (1,1)+(C,1) concatenate fails Mosaic layout
        # propagation at C=2 ("offset mismatch on non-concat dimension")
        carry_ref[0:1, :] = jnp.full((1, 1), -1.0, jnp.float32)
        carry_ref[1:, :] = jnp.full((c1 - 1, 1), -INF, jnp.float32)

    kv = kv_ref[:]
    key = kv[0:1, :]          # (1, B)
    val = kv[1:, :]           # (C, B)
    b = kv.shape[1]
    lane = jax.lax.broadcasted_iota(jnp.int32, (1, b), 1)
    s = 1
    while s < b:
        ok = (lane >= s) & (key == _roll(key, s, 1))
        cand = _roll(val, s, 1)
        val = jnp.maximum(val, jnp.where(ok, cand, -INF))
        s *= 2

    ckey = carry_ref[0:1, :]  # (1, 1)
    cval = carry_ref[1:, :]   # (C, 1)
    val = jnp.where(key == ckey, jnp.maximum(val, cval), val)
    out_ref[:, :] = val
    carry_ref[0:1, :] = key[:, -1:]
    carry_ref[1:, :] = val[:, -1:]


# keys must stay exactly representable in f32 for the in-kernel equality
# compares; padding uses PAD_KEY which is > any representable run key
_SEG_KEY_MAX = 1 << 24
_PAD_KEY = 3.0e7


@functools.partial(jax.jit, static_argnames=("block", "interpret"))
def segmented_cummax_pallas(
    key: jax.Array,   # i32[N], sorted ascending, values in [0, 2^24)
    val: jax.Array,   # f32[N] or f32[N, C]
    block: int = 8192,
    interpret: bool = False,
) -> jax.Array:
    """Forward inclusive per-run cumulative max; drop-in for
    characteristics._segmented_cummax when keys are < 2^24.

    Layout: channels ride the sublane axis ((C+1, N) with N on the 128-lane
    axis), so a C=12 support scan wastes no lanes; the [N, C] <-> [C, N]
    transposes at the boundary are two bandwidth-bound passes, amortized
    against the 8+ full-array passes the XLA doubling scan saves.
    """
    squeeze = val.ndim == 1
    v = val[:, None] if squeeze else val
    n, c = v.shape
    kv = jnp.concatenate(
        [key.astype(jnp.float32)[None, :], v.T], axis=0
    )  # (C+1, N)
    nb = -(-n // block)
    npad = nb * block
    if npad != n:
        pad = jnp.full((c + 1, npad - n), -INF, jnp.float32)
        pad = pad.at[0, :].set(_PAD_KEY)
        kv = jnp.concatenate([kv, pad], axis=1)
    out = pl.pallas_call(
        _seg_cummax_kernel,
        grid=(nb,),
        out_shape=jax.ShapeDtypeStruct((c, npad), jnp.float32),
        in_specs=[
            pl.BlockSpec((c + 1, block), lambda i: (0, i),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((c, block), lambda i: (0, i),
                               memory_space=pltpu.VMEM),
        scratch_shapes=[pltpu.VMEM((c + 1, 1), jnp.float32)],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary",),  # sequential: carry dependency
            # (C+1, 64k)-and-up blocks at C=12 exceed the 16MB default scoped
            # budget (in/out double buffering); plenty of physical VMEM left
            vmem_limit_bytes=100 * 1024 * 1024,
        ),
        interpret=interpret,
    )(kv)
    res = out[:, :n].T
    return res[:, 0] if squeeze else res
