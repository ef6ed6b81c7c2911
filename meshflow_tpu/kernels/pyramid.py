"""Gaussian image pyramids matching cv2.buildOpticalFlowPyramid levels.

cv2.calcOpticalFlowPyrLK (used at /root/reference/meshflowstabilizer.py:618)
builds its pyramid with repeated pyrDown: separable [1 4 6 4 1]/16 blur with
BORDER_REFLECT_101, then even-index decimation, each 8-bit level rounded
half-up.  Levels have shape ceil(h/2) x ceil(w/2).
"""

from __future__ import annotations

from typing import List, Tuple

import jax.numpy as jnp

_K = (1.0, 4.0, 6.0, 4.0, 1.0)


def _blur5_axis(img: jnp.ndarray, axis: int) -> jnp.ndarray:
    """5-tap [1 4 6 4 1] correlation along one axis, REFLECT_101 border."""
    pad = [(0, 0)] * img.ndim
    pad[axis] = (2, 2)
    p = jnp.pad(img, pad, mode="reflect")  # numpy reflect == cv REFLECT_101
    n = img.shape[axis]
    out = None
    for i, k in enumerate(_K):
        sl = [slice(None)] * img.ndim
        sl[axis] = slice(i, i + n)
        term = k * p[tuple(sl)]
        out = term if out is None else out + term
    return out


def pyr_down(img: jnp.ndarray) -> jnp.ndarray:
    """One cv2.pyrDown step on (..., H, W) float32 holding 8-bit values."""
    blurred = _blur5_axis(_blur5_axis(img, -2), -1) * (1.0 / 256.0)
    # 8U pyrDown descale: (sum + 128) >> 8 == floor(x + 0.5) for x >= 0.
    rounded = jnp.floor(blurred + 0.5)
    return rounded[..., ::2, ::2]


def build_pyramid(gray: jnp.ndarray, max_level: int) -> List[jnp.ndarray]:
    """Levels 0..max_level of the LK pyramid.

    gray: (..., H, W) float32 (8-bit values).  Returns max_level+1 arrays;
    level l has shape (..., ceil(H/2^l-ish), ...) following the (n+1)//2
    recurrence.
    """
    levels = [gray]
    for _ in range(max_level):
        levels.append(pyr_down(levels[-1]))
    return levels


def pyramid_shapes(h: int, w: int, max_level: int) -> List[Tuple[int, int]]:
    shapes = [(h, w)]
    for _ in range(max_level):
        h, w = (h + 1) // 2, (w + 1) // 2
        shapes.append((h, w))
    return shapes
