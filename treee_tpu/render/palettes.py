"""Property-color lookup palettes.

The reference ships three 1-D palette PNGs — turbo, warm, white
(treee/assets, loaded at treee/src/program.rs:88-95) — and maps a u32 property
to a texel with a mult/shift uniform (render/src/lookup.rs:22-24,
point_cloud.wgsl:72-80).  Here palettes are f32[P,3] arrays generated
analytically and a normalized-in-[0,1] property indexes them directly.

Turbo uses Google's published polynomial approximation (Apache-2.0 formula);
warm is a dark-red -> orange -> light-yellow ramp matching the reference's
gradient in spirit; white is constant.
"""

from __future__ import annotations

import functools

import jax.numpy as jnp
import numpy as np

PALETTE_SIZE = 256

# Turbo colormap polynomial coefficients (Google AI blog, 2019).
_TURBO_R = np.array([0.13572138, 4.61539260, -42.66032258, 132.13108234, -152.94239396, 59.28637943])
_TURBO_G = np.array([0.09140261, 2.19418839, 4.84296658, -14.18503333, 4.27729857, 2.82956604])
_TURBO_B = np.array([0.10667330, 12.64194608, -60.58204836, 110.36276771, -89.90310912, 27.34824973])


def _poly(c: np.ndarray, x: np.ndarray) -> np.ndarray:
    return sum(ci * x**i for i, ci in enumerate(c))


@functools.lru_cache(maxsize=None)
def turbo(size: int = PALETTE_SIZE):
    x = np.linspace(0.0, 1.0, size)
    rgb = np.stack([_poly(_TURBO_R, x), _poly(_TURBO_G, x), _poly(_TURBO_B, x)], -1)
    return jnp.asarray(np.clip(rgb, 0.0, 1.0).astype(np.float32))


@functools.lru_cache(maxsize=None)
def warm(size: int = PALETTE_SIZE):
    x = np.linspace(0.0, 1.0, size)[:, None]
    dark = np.array([[0.35, 0.05, 0.05]])
    orange = np.array([[0.95, 0.55, 0.15]])
    light = np.array([[1.0, 0.97, 0.75]])
    lo = dark + (orange - dark) * np.clip(x * 2, 0, 1)
    hi = orange + (light - orange) * np.clip(x * 2 - 1, 0, 1)
    rgb = np.where(x < 0.5, lo, hi)
    return jnp.asarray(rgb.astype(np.float32))


@functools.lru_cache(maxsize=None)
def white(size: int = PALETTE_SIZE):
    return jnp.ones((size, 3), jnp.float32)


@functools.lru_cache(maxsize=None)
def rgb_cube():
    """256-entry 3-3-2 true-color cube for source-RGB display.

    Index = (r3 << 5) | (g3 << 2) | b2 with channels quantized to 8/8/4
    levels; ``Session.attribute_prop("rgb")`` packs file RGB into this index
    so the per-point color rides the existing one-scatter rasterizer (the
    packed z-key carries 8 palette bits, render/splat.py) instead of needing
    a 24-bit color plane."""
    idx = np.arange(256)
    r = ((idx >> 5) & 0x7) / 7.0
    g = ((idx >> 2) & 0x7) / 7.0
    b = (idx & 0x3) / 3.0
    return jnp.asarray(np.stack([r, g, b], -1).astype(np.float32))


def get(name: str, size: int = PALETTE_SIZE):
    try:
        return {"turbo": turbo, "warm": warm, "white": white}[name](size)
    except KeyError:
        raise ValueError(f"unknown palette {name!r}; pick turbo/warm/white") from None


def sample(palette, t):
    """Palette lookup for normalized t in [0,1] (point_cloud.wgsl:78-79)."""
    idx = jnp.clip((t * palette.shape[0]).astype(jnp.int32), 0, palette.shape[0] - 1)
    return palette[idx]
