"""Per-frame-pair feature matching: detect -> track -> per-subframe RANSAC
-> global least-squares homography.

Rebuilds the reference's L2 stack (/root/reference/meshflowstabilizer.py:455-629):

* ``_get_all_matched_features_between_subframes`` (:581-629): FAST keypoints
  on the early frame, pyramidal LK into the late frame, tracked-status
  filtering.  We detect per subframe in one batched kernel and track on
  whole-frame pyramids (the reference tracks subframe views; windows near
  subframe borders therefore see slightly different support — parity is
  gated on end metrics).
* ``_get_features_in_subframe`` (:531-578): per-subframe RANSAC homography
  inlier masks (OpenCV reproj threshold 3.0); subframes with < 4 features
  contribute nothing.
* ``_get_matched_features_and_homography`` (:455-528): all surviving
  features feed one least-squares DLT+refine homography.  The reference
  returns (None, None, None) when fewer than
  homography_min_number_corresponding_features remain — and then crashes
  dereferencing it (SURVEY.md section 8.11).  Here that case is defined
  behavior: ok=False, identity homography, empty feature set.

Ragged OpenCV arrays become fixed-capacity (S, K) tensors with masks; the
LK call runs on a compacted top-N_track slice so padded slots cost nothing.
"""

from __future__ import annotations

import functools
from typing import NamedTuple

import jax
import jax.numpy as jnp

from meshflow_tpu.config import MeshFlowConfig
from meshflow_tpu.kernels.fast import detect_keypoints
from meshflow_tpu.kernels.homography import estimate_homography, ransac_homography
from meshflow_tpu.kernels.lk import lk_track


class MatchResult(NamedTuple):
    """Fixed-capacity match set for one frame pair (N = S*K slots)."""

    early: jnp.ndarray  # (N, 2) float32 positions in the early frame
    late: jnp.ndarray  # (N, 2) float32 tracked positions in the late frame
    inlier: jnp.ndarray  # (N,) bool — survived tracking + subframe RANSAC
    homography: jnp.ndarray  # (3, 3) float32 early->late (identity if not ok)
    ok: jnp.ndarray  # () bool — >= min corresponding features survived


def track_pair(
    early_keypoints,
    prev_levels,
    next_levels,
    config: MeshFlowConfig,
    n_track: int,
):
    """LK-track one frame's keypoints into the next frame.

    Compacts the (S, K) keypoint slots to the top n_track valid ones (LK
    cost is linear in slot count), tracks, and scatters back.
    Returns (late_positions (S, K, 2), tracked (S, K) bool).
    """
    s, k = early_keypoints.valid.shape[-2:]
    flat_pos = early_keypoints.positions.reshape(s * k, 2)
    flat_valid = early_keypoints.valid.reshape(s * k)

    order = jnp.argsort(jnp.logical_not(flat_valid), stable=True)
    sel = order[:n_track]
    pts = flat_pos[sel]
    vm = flat_valid[sel]

    tracked_pts, status = lk_track(
        prev_levels,
        next_levels,
        pts,
        vm,
        win_size=config.lk_window_size,
        max_iters=config.lk_max_iterations,
        eps=config.lk_epsilon,
        min_eig_threshold=config.lk_min_eig_threshold,
    )

    late_flat = jnp.zeros_like(flat_pos).at[sel].set(tracked_pts)
    status_flat = jnp.zeros_like(flat_valid).at[sel].set(status)
    return late_flat.reshape(s, k, 2), status_flat.reshape(s, k)


def match_pair(
    early_keypoints,
    prev_levels,
    next_levels,
    key: jax.Array,
    config: MeshFlowConfig,
) -> MatchResult:
    """Full L2 stack for one frame pair."""
    s, k = early_keypoints.valid.shape[-2:]
    late_pos, tracked = track_pair(
        early_keypoints, prev_levels, next_levels, config,
        min(config.max_features_per_frame, 4096),
    )
    early_pos = early_keypoints.positions
    tracked = tracked & early_keypoints.valid

    # Per-subframe RANSAC outlier rejection (vmapped over subframes).
    keys = jax.random.split(key, s)

    def per_subframe(early_s, late_s, valid_s, key_s):
        _, mask, ok_s = ransac_homography(
            early_s,
            late_s,
            valid_s,
            key_s,
            threshold=config.ransac_reproj_threshold,
            iterations=config.ransac_iterations,
            refine_iterations=config.homography_refine_iterations,
        )
        return mask & ok_s

    inlier = jax.vmap(per_subframe)(early_pos, late_pos, tracked, keys)

    flat_early = early_pos.reshape(s * k, 2)
    flat_late = late_pos.reshape(s * k, 2)
    flat_inlier = inlier.reshape(s * k)

    count = jnp.sum(flat_inlier.astype(jnp.int32))
    ok = count >= config.homography_min_number_corresponding_features

    weights = flat_inlier.astype(jnp.float32)
    h = estimate_homography(
        flat_early, flat_late, weights, config.homography_refine_iterations
    )
    identity = jnp.eye(3, dtype=jnp.float32)
    h = jnp.where(ok & jnp.all(jnp.isfinite(h)), h, identity)

    return MatchResult(
        early=flat_early,
        late=flat_late,
        inlier=flat_inlier & ok,
        homography=h,
        ok=ok,
    )
