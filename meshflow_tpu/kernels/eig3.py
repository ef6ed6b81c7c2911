"""Eigenvalue magnitudes of affine homographies, closed form.

The reference computes ``np.abs(np.linalg.eigvals(H_affine))`` where
``H_affine`` is a 3x3 homography with its bottom row replaced by [0, 0, 1]
(/root/reference/meshflowstabilizer.py:815-824 for the adaptive weights and
:1206-1210 for the distortion score).

For such a matrix the eigenvalues are exactly {1} union eig(A) where A is the
top-left 2x2 block: det([[A - l I, t], [0, 1 - l]]) = (1 - l) det(A - l I).
The 2x2 eigenvalues come from the characteristic quadratic; a complex
conjugate pair has magnitude sqrt(det A).  No iterative eigensolver needed —
this is a handful of VPU ops and vmaps over any batch of homographies.
"""

from __future__ import annotations

import jax.numpy as jnp


def affine_eigenvalue_magnitudes(h: jnp.ndarray) -> jnp.ndarray:
    """|eigenvalues| of h with bottom row treated as [0, 0, 1].

    h: (..., 3, 3) -> (..., 3) sorted ascending (matches np.sort(np.abs(...))).
    """
    a, b = h[..., 0, 0], h[..., 0, 1]
    c, d = h[..., 1, 0], h[..., 1, 1]
    tr = a + d
    det = a * d - b * c
    disc = tr * tr - 4.0 * det
    sqrt_disc = jnp.sqrt(jnp.abs(disc))
    real = disc >= 0
    m1 = jnp.where(real, jnp.abs((tr + sqrt_disc) * 0.5), jnp.sqrt(jnp.abs(det)))
    m2 = jnp.where(real, jnp.abs((tr - sqrt_disc) * 0.5), jnp.sqrt(jnp.abs(det)))
    ones = jnp.ones_like(m1)
    mags = jnp.stack([ones, m1, m2], axis=-1)
    return jnp.sort(mags, axis=-1)


def affine_eigen_ratio(h: jnp.ndarray) -> jnp.ndarray:
    """Ratio of second-largest to largest eigenvalue magnitude.

    Used for both the adaptive-weight 'affine component'
    (/root/reference/meshflowstabilizer.py:824) and the distortion score
    (:1209).
    """
    mags = affine_eigenvalue_magnitudes(h)
    denom = jnp.where(mags[..., 2] == 0, 1e-10, mags[..., 2])
    return mags[..., 1] / denom
