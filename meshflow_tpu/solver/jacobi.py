"""Banded Jacobi energy minimization over all vertex profiles at once.

The reference builds one dense (F, F) system per video and solves it
sequentially for each of the (rows+1)*(cols+1) vertices with 100 dense-matmul
Jacobi iterations (/root/reference/meshflowstabilizer.py:632-710, 844-878).

Structural facts exploited here (SURVEY.md section 1 coupling notes):

* The off-diagonal matrix is lambda_t-scaled Toeplitz:
  A_offdiag[t, r] = -2 * lambda_t * g(t - r) with Gaussian stencil
  g(d) = exp(-((3/Omega) d)^2), band-masked to |t - r| <= Omega.  The band
  mask in the reference *includes* the main diagonal (the i = 0 term of the
  mask loop at :779), so A_offdiag[t, t] = -2 lambda_t, while the separate
  on-diagonal vector is D[t] = 1 + 2 lambda_t * sum_{r=0}^{F-1} g(t - r)
  (the row sum at :775 is NOT band-masked).  Both quirks are reproduced
  exactly — this is the iteration as written, not textbook Jacobi.
* The iteration x <- (b - A_offdiag x) / D therefore reduces to a 21-tap
  temporal correlation: (A_offdiag x)[t] = -2 lambda_t * sum_d g(d) x[t-d].
* All vertices and both coordinates share the system, so the state is one
  (F, V, 2) tensor; the reference's 289-vertex Python loop becomes a single
  batched update per iteration (its `TODO parallelize` at :692).

Memory is O(F) instead of the reference's O(F^2), which is what makes long
clips and frame-sharded multi-chip execution possible.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np


def gaussian_band(omega: int, dtype=jnp.float32) -> jnp.ndarray:
    """The 2*omega+1 tap stencil g(d) = exp(-((3/omega) d)^2), d in [-omega, omega]."""
    d = np.arange(-omega, omega + 1, dtype=np.float64)
    return jnp.asarray(np.exp(-((3.0 / omega) * d) ** 2), dtype=dtype)


def on_diagonal(lambdas: jnp.ndarray, omega: int) -> jnp.ndarray:
    """D[t] = 1 + 2 lambda_t * sum_{r=0}^{F-1} exp(-((3/omega)(t-r))^2).

    The reference sums over the full row (no band mask).  Terms beyond
    |d| > ~9.1*omega underflow to zero even in float64, so a windowed sum of
    that radius is exact; the window is additionally clamped to the sequence.
    """
    num_frames = lambdas.shape[0]
    # row_sum depends only on the static frame count and omega, so it is a
    # float64 NumPy constant baked into the jitted graph.
    t = np.arange(num_frames, dtype=np.float64)
    radius = min(num_frames - 1, int(np.ceil(omega * np.sqrt(745.0) / 3.0)))
    d = np.arange(-radius, radius + 1, dtype=np.float64)
    g = np.exp(-((3.0 / omega) * d) ** 2)
    r = t[:, None] - d[None, :]  # (F, 2*radius+1) candidate frame indices
    valid = (r >= 0) & (r <= num_frames - 1)
    row_sum = np.sum(np.where(valid, g[None, :], 0.0), axis=1)
    return 1.0 + 2.0 * lambdas * jnp.asarray(row_sum, lambdas.dtype)


def _band_matvec(x: jnp.ndarray, band: jnp.ndarray, omega: int) -> jnp.ndarray:
    """sum_d band[d] * x[t - d] with zero padding outside [0, F).

    x: (F, ...); band: (2*omega+1,).  Unrolled shift-and-accumulate — 21
    fused multiply-adds over the whole state tensor, pure VPU work.
    """
    num_frames = x.shape[0]
    pad = [(omega, omega)] + [(0, 0)] * (x.ndim - 1)
    xp = jnp.pad(x, pad)
    out = jnp.zeros_like(x)
    for j in range(2 * omega + 1):
        # r = t + (j - omega)  ->  contribution g(t - r) = band[2*omega - j]
        out = out + band[2 * omega - j] * jax.lax.slice_in_dim(
            xp, j, j + num_frames, axis=0
        )
    return out


@functools.partial(jax.jit, static_argnames=("omega", "iterations"))
def jacobi_smooth(
    b: jnp.ndarray,
    lambdas: jnp.ndarray,
    omega: int,
    iterations: int,
) -> jnp.ndarray:
    """Run the reference's Jacobi iteration on all vertex profiles at once.

    b: (F, ...) unstabilized displacements (also the initial x, per
    /root/reference/meshflowstabilizer.py:699-703); lambdas: (F,).
    Returns stabilized displacements of the same shape.
    """
    band = gaussian_band(omega, b.dtype)
    diag = on_diagonal(lambdas, omega)  # (F,)
    inv_diag = 1.0 / diag
    extra = (1,) * (b.ndim - 1)
    lam = lambdas.reshape((-1,) + extra)
    inv_d = inv_diag.reshape((-1,) + extra)

    def body(_, x):
        offdiag_x = -2.0 * lam * _band_matvec(x, band, omega)
        return inv_d * (b - offdiag_x)

    return jax.lax.fori_loop(0, iterations, body, b)
