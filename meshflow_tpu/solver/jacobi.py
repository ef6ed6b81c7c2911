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


def _band_matvec_halo(
    x_local: jnp.ndarray,
    band: jnp.ndarray,
    omega: int,
    axis_name: str,
    idx: jnp.ndarray,
    num_shards: int,
) -> jnp.ndarray:
    """_band_matvec over a frame-sharded state: one Omega-frame halo
    exchange per sweep instead of replication.

    x_local: (B, ...) this shard's frames; neighbors contribute their
    Omega adjacent frames via ppermute, and the sequence boundary shards
    substitute the zero padding of the unsharded stencil, so the result
    is bit-identical to _band_matvec on the concatenated state.
    """
    block = x_local.shape[0]
    if num_shards == 1:
        return _band_matvec(x_local, band, omega)
    # Halo only reaches immediate neighbors when a shard holds >= Omega
    # frames (true for any practical chunking: B >= Omega = 10).
    assert block >= omega, (block, omega)
    send_right = [(i, (i + 1) % num_shards) for i in range(num_shards)]
    send_left = [(i, (i - 1) % num_shards) for i in range(num_shards)]
    left = jax.lax.ppermute(x_local[-omega:], axis_name, send_right)
    right = jax.lax.ppermute(x_local[:omega], axis_name, send_left)
    zero = jnp.zeros_like(left)
    left = jnp.where((idx == 0), zero, left)
    right = jnp.where((idx == num_shards - 1), zero, right)
    xp = jnp.concatenate([left, x_local, right], axis=0)
    out = jnp.zeros_like(x_local)
    for j in range(2 * omega + 1):
        out = out + band[2 * omega - j] * jax.lax.slice_in_dim(
            xp, j, j + block, axis=0
        )
    return out


def jacobi_smooth_sharded(
    b_local: jnp.ndarray,
    lambdas_full: jnp.ndarray,
    omega: int,
    iterations: int,
    axis_name: str,
    num_shards: int,
) -> jnp.ndarray:
    """jacobi_smooth with the (F, V, 2) state sharded over the frame axis.

    Call inside shard_map: b_local is this shard's (B, V, 2) block of the
    unstabilized displacements; lambdas_full is the replicated (F,)
    adaptive-weight vector (it is tiny and already needed globally for
    the on-diagonal row sums).  Per sweep the band correlation exchanges
    an Omega-frame halo with each neighbor over ICI (~Omega*V*2*4 bytes)
    rather than all_gathering the state, which is what lets
    multi-minute / many-device clips keep the solver frame-local.
    Bit-identical to jacobi_smooth on the gathered state.
    """
    block = b_local.shape[0]
    idx = jax.lax.axis_index(axis_name)
    band = gaussian_band(omega, b_local.dtype)
    diag_full = on_diagonal(lambdas_full, omega)  # (F,) replicated
    lam_local = jax.lax.dynamic_slice_in_dim(lambdas_full, idx * block, block)
    inv_d_local = 1.0 / jax.lax.dynamic_slice_in_dim(
        diag_full, idx * block, block
    )
    extra = (1,) * (b_local.ndim - 1)
    lam = lam_local.reshape((-1,) + extra)
    inv_d = inv_d_local.reshape((-1,) + extra)

    def body(_, x):
        offdiag_x = -2.0 * lam * _band_matvec_halo(
            x, band, omega, axis_name, idx, num_shards
        )
        return inv_d * (b_local - offdiag_x)

    return jax.lax.fori_loop(0, iterations, body, b_local)
