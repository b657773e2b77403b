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
