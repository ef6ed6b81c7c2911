"""Whole-clip motion estimation: the reference's stage 2
(/root/reference/meshflowstabilizer.py:236-284) as one jitted scan.

The reference loops frame pairs sequentially purely because of the running
cumulative sum at :281; every pair is independent.  Here pair matching runs
under lax.scan (bounded memory; each pair's LK/RANSAC internals are the
dominant allocation) and the displacement integration is a single cumsum —
which becomes an associative scan over the frame-sharded mesh axis in the
multi-chip path (SURVEY.md section 2.3).
"""

from __future__ import annotations

import functools
from typing import NamedTuple

import jax
import jax.numpy as jnp

from meshflow_tpu.config import MeshFlowConfig
from meshflow_tpu.kernels.color import bgr_to_gray
from meshflow_tpu.kernels.fast import detect_keypoints
from meshflow_tpu.kernels.lk import prepare_level
from meshflow_tpu.kernels.pyramid import build_pyramid
from meshflow_tpu.motion.features import match_pair
from meshflow_tpu.motion.propagate import vertex_velocities
from meshflow_tpu.utils import grid


class MotionEstimate(NamedTuple):
    """Stage-2 outputs for a clip of F frames."""

    displacements: jnp.ndarray  # (F, R+1, C+1, 2) float32, frame 0 == 0
    homographies: jnp.ndarray  # (F, 3, 3) float32, index F-1 == identity
    pair_ok: jnp.ndarray  # (F-1,) bool — pair had >= min features


def prepare_frames(frames_bgr: jnp.ndarray, config: MeshFlowConfig):
    """Shared per-frame work: gray, keypoints, padded pyramid levels.

    frames_bgr: (F, H, W, 3) uint8.  Returns (keypoints, levels) where
    levels is a tuple of PaddedLevel pytrees batched over frames.
    """
    f, h, w = frames_bgr.shape[:3]
    gray8 = bgr_to_gray(frames_bgr)
    keypoints = detect_keypoints(gray8, config, h, w)
    max_level = config.lk_max_level(h, w)
    levels = tuple(
        prepare_level(lvl) for lvl in build_pyramid(gray8.astype(jnp.float32), max_level)
    )
    return keypoints, levels


@functools.partial(jax.jit, static_argnames=("config", "frame_height", "frame_width"))
def estimate_motion_scanned(
    keypoints,
    levels,
    key: jax.Array,
    config: MeshFlowConfig,
    frame_height: int,
    frame_width: int,
) -> MotionEstimate:
    """Run match+propagate for every adjacent pair and integrate.

    keypoints/levels: outputs of prepare_frames (leading frame axis F).
    """
    num_frames = keypoints.valid.shape[0]
    vertex_grid = jnp.asarray(grid.vertex_grid(config, frame_height, frame_width))

    def pair_body(carry, t):
        kps_t = jax.tree.map(lambda a: a[t], keypoints)
        prev_lv = tuple(jax.tree.map(lambda a: a[t], lv) for lv in levels)
        next_lv = tuple(jax.tree.map(lambda a: a[t + 1], lv) for lv in levels)
        match = match_pair(
            kps_t, prev_lv, next_lv, jax.random.fold_in(key, t), config
        )
        velocity = vertex_velocities(
            match, vertex_grid, config, frame_height, frame_width
        )
        return carry, (velocity, match.homography, match.ok)

    _, (velocities, homographies, pair_ok) = jax.lax.scan(
        pair_body, None, jnp.arange(num_frames - 1)
    )

    displacements = jnp.concatenate(
        [
            jnp.zeros((1,) + velocities.shape[1:], velocities.dtype),
            jnp.cumsum(velocities, axis=0),
        ],
        axis=0,
    )
    homographies = jnp.concatenate(
        [homographies, jnp.eye(3, dtype=jnp.float32)[None]], axis=0
    )
    return MotionEstimate(
        displacements=displacements, homographies=homographies, pair_ok=pair_ok
    )


def estimate_motion(
    frames_bgr: jnp.ndarray, config: MeshFlowConfig, key: jax.Array
) -> MotionEstimate:
    """Convenience wrapper: frames (F, H, W, 3) uint8 -> MotionEstimate."""
    f, h, w = frames_bgr.shape[:3]
    keypoints, levels = prepare_frames(frames_bgr, config)
    return estimate_motion_scanned(keypoints, levels, key, config, h, w)
