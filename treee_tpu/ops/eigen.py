"""Analytic eigenvalues of symmetric 3x3 matrices, batched.

Used by the curvature property: eigenvalues of the 31-neighbor covariance matrix,
curve = 3*lambda_min / trace (treee/src/calculations.rs:328-373,467-498).  The
closed form is the standard trigonometric solution for symmetric 3x3 matrices
(en.wikipedia.org/wiki/Eigenvalue_algorithm#3x3_matrices) — a pure VPU-friendly
elementwise computation, no iteration, batched over N points with plain
broadcasting (no vmap needed).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def eigvals_sym3(m: jax.Array) -> jax.Array:
    """Eigenvalues (descending) of symmetric 3x3 matrices f32[..., 3, 3] -> f32[..., 3]."""
    a00, a01, a02 = m[..., 0, 0], m[..., 0, 1], m[..., 0, 2]
    a11, a12, a22 = m[..., 1, 1], m[..., 1, 2], m[..., 2, 2]

    p1 = a01 * a01 + a02 * a02 + a12 * a12
    q = (a00 + a11 + a22) / 3.0
    b00, b11, b22 = a00 - q, a11 - q, a22 - q
    p2 = b00 * b00 + b11 * b11 + b22 * b22 + 2.0 * p1
    p = jnp.sqrt(jnp.maximum(p2 / 6.0, 1e-30))

    # det of (m - q I) via cofactor expansion
    det_b = (
        b00 * (b11 * b22 - a12 * a12)
        - a01 * (a01 * b22 - a12 * a02)
        + a02 * (a01 * a12 - b11 * a02)
    )
    r = jnp.clip(det_b / 2.0 * p**-3, -1.0, 1.0)
    phi = jnp.arccos(r) / 3.0

    e1 = q + 2.0 * p * jnp.cos(phi)
    e3 = q + 2.0 * p * jnp.cos(phi + 2.0 * jnp.pi / 3.0)
    e2 = 3.0 * q - e1 - e3

    eig = jnp.stack([e1, e2, e3], axis=-1)
    # diagonal matrices (p1 == 0): eigenvalues are the diagonal entries
    diag = jnp.stack([a00, a11, a22], axis=-1)
    diag = jnp.sort(diag, axis=-1)[..., ::-1]
    return jnp.where((p1 <= 1e-30)[..., None], diag, eig)


def curvature_from_cov(cov: jax.Array) -> jax.Array:
    """curve = 3*lambda_3 / (l1+l2+l3)  (calculations.rs:367-368)."""
    e = eigvals_sym3(cov)
    tr = jnp.sum(e, axis=-1)
    return jnp.where(tr > 1e-20, 3.0 * e[..., 2] / tr, 0.0)


def smallest_eigenvector(cov: jax.Array) -> jax.Array:
    """Unit eigenvector of the smallest eigenvalue, f32[..., 3, 3] -> [..., 3].

    The local surface NORMAL of a neighborhood covariance (a capability the
    reference's viewer lacks; its only depth cue is eye-dome lighting).  The
    eigenvector spans the null space of (A - lambda_min I): take the
    largest-norm pairwise cross product of its rows, which stays stable when
    one row degenerates.  Rank-deficient neighborhoods (isolated points,
    perfect lines — no defined normal) fall back to +y; the sign is fixed
    upward (y >= 0) so shading is consistent for an aerial scan.
    """
    e = eigvals_sym3(cov)
    lam = e[..., 2:3]
    a01, a02, a12 = cov[..., 0, 1], cov[..., 0, 2], cov[..., 1, 2]
    r0 = jnp.stack([cov[..., 0, 0] - lam[..., 0], a01, a02], axis=-1)
    r1 = jnp.stack([a01, cov[..., 1, 1] - lam[..., 0], a12], axis=-1)
    r2 = jnp.stack([a02, a12, cov[..., 2, 2] - lam[..., 0]], axis=-1)
    c01 = jnp.cross(r0, r1)
    c02 = jnp.cross(r0, r2)
    c12 = jnp.cross(r1, r2)
    n01 = jnp.sum(c01 * c01, axis=-1, keepdims=True)
    n02 = jnp.sum(c02 * c02, axis=-1, keepdims=True)
    n12 = jnp.sum(c12 * c12, axis=-1, keepdims=True)
    v = jnp.where(n01 >= n02, c01, c02)
    nv = jnp.maximum(n01, n02)
    v = jnp.where(nv >= n12, v, c12)
    nv = jnp.maximum(nv, n12)
    norm = jnp.sqrt(jnp.maximum(nv, 1e-30))
    up = jnp.zeros_like(v).at[..., 1].set(1.0)
    v = jnp.where(nv > 1e-24, v / norm, up)
    return jnp.where(v[..., 1:2] < 0, -v, v)
