"""Pallas kernel equivalence tests (interpreter mode on CPU)."""

import numpy as np
import jax.numpy as jnp

from treee_tpu import segmentation as sg
from treee_tpu.config import RenderConfig
from treee_tpu.ops import pallas_kernels as pk
from treee_tpu.render import splat


def _seeds(g=64, n_seeds=20, seed=0):
    rng = np.random.default_rng(seed)
    slot_grid = np.full((g, g), -1, np.int32)
    pos_grid = np.zeros((g, g, 2), np.float32)
    cells = rng.choice(g * g, n_seeds, replace=False)
    for s, c in enumerate(cells):
        y, x = divmod(int(c), g)
        slot_grid[y, x] = s
        pos_grid[y, x] = (x + rng.uniform(), y + rng.uniform())
    centers = np.stack(
        np.meshgrid(np.arange(g) + 0.5, np.arange(g) + 0.5, indexing="ij"),
        axis=-1,
    )[..., ::-1].astype(np.float32)  # (x, z) order
    return slot_grid, pos_grid, centers


def test_jump_flood_pallas_matches_jnp():
    slot, pos, centers = _seeds()
    # _jump_flood is batched over bands; the pallas kernel is one band
    ref = np.asarray(sg._jump_flood(jnp.asarray(slot)[None],
                                    jnp.asarray(pos)[None],
                                    jnp.asarray(centers)))[0]
    out = np.asarray(pk.jump_flood_pallas(jnp.asarray(slot), jnp.asarray(pos),
                                          jnp.asarray(centers), interpret=True))
    # JFA is approximate; both variants run the same schedule -> identical
    np.testing.assert_array_equal(out, ref)


def test_jump_flood_pallas_is_voronoi():
    slot, pos, centers = _seeds(g=32, n_seeds=5, seed=1)
    out = np.asarray(pk.jump_flood_pallas(jnp.asarray(slot), jnp.asarray(pos),
                                          jnp.asarray(centers), interpret=True))
    # exact nearest seed per cell
    seeds = {int(slot[y, x]): pos[y, x] for y, x in zip(*np.nonzero(slot >= 0))}
    ids = sorted(seeds)
    sp = np.array([seeds[i] for i in ids])
    d = ((centers[:, :, None, :] - sp[None, None, :, :]) ** 2).sum(-1)
    expect = np.array(ids)[d.argmin(-1)]
    assert (out == expect).mean() > 0.995  # JFA's rare corner-case errors only


def test_eye_dome_pallas_matches_jnp():
    rng = np.random.default_rng(2)
    h, w = 48, 64
    z01 = rng.uniform(0.0, 1.0, (h, w)).astype(np.float32)
    z01[rng.uniform(size=(h, w)) < 0.3] = 1.0  # background holes
    color = rng.uniform(0, 1, (h, w, 3)).astype(np.float32)
    cfg = RenderConfig(width=w, height=h)
    ref = np.asarray(splat.eye_dome(jnp.asarray(color), jnp.asarray(z01), cfg))
    s = max(1.0 - cfg.eye_dome_strength, 0.1) ** 6
    out = np.asarray(pk.eye_dome_pallas(
        jnp.asarray(color), jnp.asarray(z01), cfg.near, cfg.far, s,
        cfg.eye_dome_color, interpret=True,
    ))
    np.testing.assert_allclose(out, ref, atol=1e-5)


def test_dilate_pallas_matches_jnp():
    import dataclasses

    from treee_tpu.config import RenderConfig
    from treee_tpu.render import splat
    from treee_tpu.render.camera import Camera

    rng = np.random.default_rng(4)
    cfg = RenderConfig(width=64, height=48, use_pallas=False)
    cam = Camera.orbital(distance=30.0)
    pos = rng.normal(size=(500, 3)).astype(np.float32) * 5.0
    prop = rng.random(500).astype(np.float32)
    mask = jnp.ones(500, bool)

    kimg = splat.rasterize_keys(jnp.asarray(pos), jnp.asarray(prop), mask,
                                cam, cfg)
    # jnp reference path
    color_ref, z_ref, _ = splat.resolve_keys(kimg, cam, jnp.zeros((256, 3)),
                                             cfg)
    # pallas interpret path: run the kernel directly with the same params
    f_proj = cam.projection_matrix(cfg.width / cfg.height)[1, 1]
    p22 = cfg.far / (cfg.near - cfg.far)
    p23 = cfg.near * cfg.far / (cfg.near - cfg.far)
    k_pal = pk.dilate_pallas(
        kimg, p22, p23, cfg.point_size * f_proj * (cfg.height / 2.0),
        radius=cfg.max_splat_radius, interpret=True,
    )
    cfg_j = dataclasses.replace(cfg, max_splat_radius=0)
    # dilated keys drive everything downstream: compare against the scan by
    # re-resolving with radius 0 on the pallas-dilated image
    color_pal, z_pal, _ = splat.resolve_keys(k_pal, cam, jnp.zeros((256, 3)),
                                             cfg_j)
    np.testing.assert_array_equal(np.asarray(z_pal), np.asarray(z_ref))
