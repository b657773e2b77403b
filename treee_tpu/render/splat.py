"""Point-splat rasterizer + eye-dome lighting, fully on device.

Capability parity with the reference render pipeline:

- splats: one circle per point, billboarded in view space with a world-size
  ``scale`` and colored through a 1-D palette, with a property range filter
  (render/src/point_cloud.rs + point_cloud.wgsl:37-80).
- eye-dome lighting: a post-process that darkens pixels whose 4-neighbor
  linearized depth exceeds their own, alpha-blended over the scene
  (render/src/eye_dome.rs + eye_dome.wgsl:37-67).

The reference rasterizes by GPU instancing (3 vertices x N instances, fragment
circle-discard).  The TPU design is scatter-based: project all points with one
matmul, z-test by scatter-min into a flat depth buffer, resolve winners by a
depth-equality scatter of point ids, then shade per pixel — every stage a
vectorized XLA op.  The splat footprint is a static (2R+1)^2 offset unroll with
a per-point circle test, matching the fragment shader's ``x*x+y*y >= 1 discard``.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

from ..config import RenderConfig
from . import palettes
from .camera import Camera

IBIG = jnp.int32(0x7FFFFFFF)
FBIG = jnp.float32(3.0e38)


def prop_from_segment(segment: jax.Array) -> jax.Array:
    """Hash segment ids into well-spread [0,1) palette coordinates.

    Stands in for the reference's random u32 ids feeding the lookup texture
    (segmenting.rs:516-521 + point_cloud.wgsl:78): ours are sequential, so a
    Fibonacci hash decorrelates adjacent ids' colors.
    """
    h = (segment.astype(jnp.uint32) * jnp.uint32(2654435761)) >> 8
    return h.astype(jnp.float32) / jnp.float32(1 << 24)


def _project(pos: jax.Array, cam: Camera, width: int, height: int):
    """Project to (pixel_x, pixel_y, view_depth, z01, radius_px_factor)."""
    view = cam.view_matrix()
    vp = pos @ view[:3, :3].T + view[:3, 3]
    depth = -vp[:, 2]
    proj = cam.projection_matrix(width / height)
    w = jnp.maximum(depth, 1e-6)
    ndc_x = proj[0, 0] * vp[:, 0] / w
    ndc_y = proj[1, 1] * vp[:, 1] / w
    z01 = (proj[2, 2] * vp[:, 2] + proj[2, 3]) / w
    fx = (ndc_x * 0.5 + 0.5) * width
    fy = (1.0 - (ndc_y * 0.5 + 0.5)) * height
    return fx, fy, depth, z01, proj[1, 1]


@functools.partial(jax.jit, static_argnames=("cfg",))
def render_points(
    pos: jax.Array,
    prop: jax.Array,
    mask: jax.Array,
    cam: Camera,
    palette: jax.Array,
    cfg: RenderConfig = RenderConfig(),
) -> tuple[jax.Array, jax.Array, jax.Array]:
    """Rasterize splats; returns (color f32[H,W,3], depth01 f32[H,W], id i32[H,W]).

    ``prop`` is the normalized [0,1] point property; points outside
    [prop_min, prop_max]/2^32 are filtered like the vertex-stage range test
    (point_cloud.wgsl:44-49).
    """
    w, h = cfg.width, cfg.height
    n = pos.shape[0]
    fx, fy, depth, z01, f_proj = _project(pos, cam, w, h)

    pmin = cfg.prop_min / float(0xFFFFFFFF)
    pmax = cfg.prop_max / float(0xFFFFFFFF)
    r_px = cfg.point_size * f_proj * (h / 2.0) / jnp.maximum(depth, 1e-6)
    r_px = jnp.minimum(r_px, cfg.max_splat_radius + 0.5)
    vis = (
        mask
        & (depth > cfg.near)
        & (depth < cfg.far)
        & (prop >= pmin)
        & (prop <= pmax)
        & (fx > -r_px - 1) & (fx < w + r_px + 1)
        & (fy > -r_px - 1) & (fy < h + r_px + 1)
    )

    ix0 = jnp.floor(fx).astype(jnp.int32)
    iy0 = jnp.floor(fy).astype(jnp.int32)
    n_pix = w * h
    r = cfg.max_splat_radius

    # Scatter ONLY the center pixel per point (one colliding-scatter update per
    # point — a (2R+1)^2 footprint scatter is 49x the updates and dominated the
    # frame), then grow splats in IMAGE space: R min-depth dilation passes over
    # the 8-neighborhood with the exact per-splat circle test
    # (point_cloud.wgsl:73 semantics), carrying each winner's subpixel center
    # and radius.  Image passes are pure [H,W] vector ops — microseconds.
    pix = jnp.where(
        vis & (ix0 >= 0) & (ix0 < w) & (iy0 >= 0) & (iy0 < h),
        iy0 * w + ix0,
        n_pix,
    )
    # pass 1: nearest depth per center pixel
    zbuf = jnp.full(n_pix + 1, FBIG).at[pix].min(
        jnp.where(vis, depth, FBIG), mode="drop"
    )
    # pass 2: winning point id (smallest id among equal-depth winners)
    pid = jnp.arange(n, dtype=jnp.int32)
    idbuf = jnp.full(n_pix + 1, IBIG, jnp.int32).at[pix].min(
        jnp.where(vis & (zbuf[pix] >= depth), pid, IBIG), mode="drop"
    )

    zimg = zbuf[:n_pix].reshape(h, w)
    iimg = idbuf[:n_pix].reshape(h, w)
    # per-pixel winner attributes for the dilation circle test
    safe = jnp.clip(iimg, 0, n - 1)
    has = iimg != IBIG
    sfx = jnp.where(has, fx[safe], 0.0)
    sfy = jnp.where(has, fy[safe], 0.0)
    srad = jnp.where(has, jnp.maximum(r_px[safe], 0.71), 0.0)

    px_c = jax.lax.broadcasted_iota(jnp.float32, (h, w), 1) + 0.5
    py_c = jax.lax.broadcasted_iota(jnp.float32, (h, w), 0) + 0.5

    def dilate(state, _):
        z, i, fx_, fy_, rd = state
        for dy, dx in ((-1, 0), (1, 0), (0, -1), (0, 1),
                       (-1, -1), (-1, 1), (1, -1), (1, 1)):
            cz = jnp.roll(z, (dy, dx), (0, 1))
            ci = jnp.roll(i, (dy, dx), (0, 1))
            cfx = jnp.roll(fx_, (dy, dx), (0, 1))
            cfy = jnp.roll(fy_, (dy, dx), (0, 1))
            crd = jnp.roll(rd, (dy, dx), (0, 1))
            inside = (px_c - cfx) ** 2 + (py_c - cfy) ** 2 <= crd * crd
            better = (ci != IBIG) & inside & (cz < z)
            z = jnp.where(better, cz, z)
            i = jnp.where(better, ci, i)
            fx_ = jnp.where(better, cfx, fx_)
            fy_ = jnp.where(better, cfy, fy_)
            rd = jnp.where(better, crd, rd)
        return (z, i, fx_, fy_, rd), None

    if r > 0:
        (zimg, iimg, _, _, _), _ = jax.lax.scan(
            dilate, (zimg, iimg, sfx, sfy, srad), None, length=r
        )

    zbuf = zimg
    idbuf = iimg
    hit = idbuf != IBIG

    color = palettes.sample(palette, prop[jnp.clip(idbuf, 0, n - 1)])
    bg = jnp.asarray(cfg.background, jnp.float32)
    color = jnp.where(hit[..., None], color, bg)

    # store z01 depth like the reference depth texture (1.0 = background)
    z01_px = jnp.where(
        hit,
        (jnp.float32(-1.0) * zbuf * (cfg.far / (cfg.near - cfg.far))
         + cfg.near * cfg.far / (cfg.near - cfg.far)) / jnp.maximum(zbuf, 1e-6),
        1.0,
    )
    return color, z01_px, idbuf


def eye_dome(
    color: jax.Array,
    z01: jax.Array,
    cfg: RenderConfig = RenderConfig(),
) -> jax.Array:
    """Eye-dome lighting post-process (eye_dome.wgsl:37-67 semantics).

    Linearize depth, take the max over the 4-neighborhood (edge-clamped like
    the reference sampler), clamp the excess by ``strength`` and alpha-blend
    the silhouette color.
    """
    s = max(1.0 - cfg.eye_dome_strength, 0.1) ** 6  # eye_dome.rs:226-229
    n, f = cfg.near, cfg.far

    def linearize(d):
        return jnp.where(d >= 1.0, 1.0, (2.0 * n) / (f + n - d * (f - n)))

    lin = linearize(z01)
    pad = jnp.pad(lin, 1, mode="edge")
    m = jnp.maximum(
        jnp.maximum(pad[:-2, 1:-1], pad[2:, 1:-1]),
        jnp.maximum(pad[1:-1, :-2], pad[1:-1, 2:]),
    )
    m = jnp.maximum(m, lin)
    m = jnp.minimum(m, lin + s)
    alpha = jnp.where(z01 < 1.0, (m - lin) / s, 0.0)
    ed = jnp.asarray(cfg.eye_dome_color, jnp.float32)
    return color * (1.0 - alpha[..., None]) + ed * alpha[..., None]


@functools.partial(jax.jit, static_argnames=("cfg",))
def render_frame(
    pos: jax.Array,
    prop: jax.Array,
    mask: jax.Array,
    cam: Camera,
    palette: jax.Array,
    cfg: RenderConfig = RenderConfig(),
) -> jax.Array:
    """Full frame: splat pass + eye-dome post-process -> f32[H,W,3]."""
    color, z01, _ = render_points(pos, prop, mask, cam, palette, cfg)
    return eye_dome(color, z01, cfg)


def to_u8(img: jax.Array) -> jax.Array:
    return jnp.clip(img * 255.0 + 0.5, 0, 255).astype(jnp.uint8)
