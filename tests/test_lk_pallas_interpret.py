"""Pallas LK kernel parity in interpret mode (runs on CPU, every suite).

The production tracker (kernels/lk_pallas.py) otherwise only executes on
real TPU hardware; interpret=True runs the same kernel body through the
Pallas interpreter so a regression in the kernel fails the default test
tier, not just the manual on-chip script (scripts/test_lk_pallas_chip.py).
Parity target is the XLA tracker (kernels/lk.py), itself oracle-tested
against cv2.calcOpticalFlowPyrLK in test_lk.py.
"""

import numpy as np
import jax.numpy as jnp

from meshflow_tpu.kernels import lk as lk_xla
from meshflow_tpu.kernels import lk_pallas
from meshflow_tpu.kernels.pyramid import build_pyramid, pyramid_shapes


def _trackable_tiles(rng, f, s, c, th, tw, shifts):
    """Blurred-noise tiles shifted per frame: (F, S, C, th, tw) float32."""
    base = rng.integers(0, 256, (c, th + 40, tw + 40)).astype(np.float32)
    for _ in range(2):
        for ax in (1, 2):
            base = (
                0.25 * np.roll(base, 1, ax)
                + 0.5 * base
                + 0.25 * np.roll(base, -1, ax)
            )
    frames = np.zeros((f, s, c, th, tw), np.float32)
    for t, (dy, dx) in enumerate(shifts):
        for si in range(s):
            oy, ox = 15 + dy + 3 * si, 15 + dx - 2 * si
            frames[t, si] = base[:, oy : oy + th, ox : ox + tw]
    return np.round(frames).astype(np.uint8).astype(np.float32)


def test_lk_pallas_interpret_matches_xla_oracle(rng):
    f, s, c, k = 2, 1, 1, 16
    th, tw = 64, 64
    max_level = 1
    max_iters = 10

    frames_u8 = _trackable_tiles(rng, f, s, c, th, tw, [(0, 0), (3, -5)])
    pts = np.stack(
        [
            rng.uniform(12, tw - 12, (f, s, k)),
            rng.uniform(12, th - 12, (f, s, k)),
        ],
        axis=-1,
    ).astype(np.float32)
    valid = rng.random((f, s, k)) < 0.9

    # XLA oracle path (whole-tile pyramids, per (pair, tile))
    xla_pts = np.zeros((f - 1, s, k, 2), np.float32)
    xla_st = np.zeros((f - 1, s, k), bool)
    for t in range(f - 1):
        for si in range(s):
            pl_prev = tuple(
                lk_xla.prepare_level(lvl)
                for lvl in build_pyramid(jnp.asarray(frames_u8[t, si]), max_level)
            )
            pl_next = tuple(
                lk_xla.prepare_level(lvl)
                for lvl in build_pyramid(
                    jnp.asarray(frames_u8[t + 1, si]), max_level
                )
            )
            p, st = lk_xla.lk_track(
                pl_prev,
                pl_next,
                jnp.asarray(pts[t, si]),
                jnp.asarray(valid[t, si]),
                max_iters=max_iters,
            )
            xla_pts[t, si] = np.asarray(p)
            xla_st[t, si] = np.asarray(st)

    # Pallas kernel in interpret mode, same planes layout as production
    levels = build_pyramid(jnp.asarray(frames_u8), max_level)
    planes = tuple(
        lk_pallas.reflect_pad_level(lvl).astype(jnp.uint8) for lvl in levels
    )
    dims = tuple(pyramid_shapes(th, tw, max_level))
    pp, pst = lk_pallas.lk_track_pairs_pallas(
        planes,
        dims,
        jnp.asarray(pts),
        jnp.asarray(valid),
        block=16,
        max_iters=max_iters,
        interpret=True,
    )
    pp = np.asarray(pp)
    pst = np.asarray(pst)

    v = valid[:-1]
    both = xla_st & pst
    assert (xla_st == pst)[v].mean() > 0.97
    assert both[v].any()
    dist = np.linalg.norm(xla_pts - pp, axis=-1)
    assert np.quantile(dist[both], 0.95) < 0.1
    # invalid features pass through untouched
    invalid = ~v
    if invalid.any():
        np.testing.assert_array_equal(pp[invalid], pts[:-1][invalid])
        assert not pst[invalid].any()
