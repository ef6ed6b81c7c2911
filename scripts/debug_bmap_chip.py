#!/usr/bin/env python
"""Localize the chip divergence between the Pallas and XLA backward maps.

Round-3 gate failure (smooth warp, mesh16 640x360): coverage mismatch
0.277% > 0.1%, p99.5 |dmap| 0.105 px, PSNR 37.7 dB — while interpret
mode is bit-identical.  This script replays the failing case and
compares the two paths stage by stage ON CHIP:

  stage 0: h tables bitwise (same producer fn, two jit programs)
  stage k (1..3): fixed-point state (qx, qy, row, col) after k iters
  final: chosen key / coverage / map, with seam-distance histogram of
         the mismatching pixels

Run: python scripts/debug_bmap_chip.py
"""

import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/jax_cache_meshflow_bench")

import numpy as np

import meshflow_tpu  # noqa: F401
import jax
import jax.numpy as jnp

from meshflow_tpu.config import MeshFlowConfig
from meshflow_tpu.kernels.bmap_pallas import backward_map_pallas
from meshflow_tpu.render.stabilize import (
    _apply_h_table,
    _grid_line_x,
    _grid_line_y,
    cell_inverse_homographies,
)
from test_bmap_chip import make_warp


def xla_fixed_point(stab, unstab, config, h, w, n_iters):
    """The XLA path's fixed-point search, stopped after n_iters, returning
    (qx, qy, row, col) exactly as backward_map computes them."""
    rc, cc = config.mesh_row_count, config.mesh_col_count

    @jax.jit
    def run(stab_pos, unstab_grid):
        h_table = cell_inverse_homographies(stab_pos, unstab_grid, config)
        ys = jnp.arange(h, dtype=jnp.float32)
        xs = jnp.arange(w, dtype=jnp.float32)
        px = jnp.tile(xs[None, :], (h, 1)).reshape(-1)
        py = jnp.tile(ys[:, None], (1, w)).reshape(-1)

        def cell_of(qx, qy):
            jx = jnp.arange(1, cc, dtype=jnp.int32)
            lines_x = _grid_line_x(jx, w, cc).astype(jnp.float32)
            jy = jnp.arange(1, rc, dtype=jnp.int32)
            lines_y = _grid_line_y(jy, h, rc).astype(jnp.float32)
            col = jnp.sum(
                (qx[:, None] >= lines_x[None, :]).astype(jnp.int32), axis=1
            )
            row = jnp.sum(
                (qy[:, None] >= lines_y[None, :]).astype(jnp.int32), axis=1
            )
            return jnp.clip(row, 0, rc - 1), jnp.clip(col, 0, cc - 1)

        qx, qy = px, py
        for _ in range(n_iters):
            row, col = cell_of(qx, qy)
            qx, qy = _apply_h_table(row * cc + col, h_table, px, py)
        row, col = cell_of(qx, qy)
        return qx, qy, row, col

    return run(stab, unstab)


def main():
    mesh, h, w, scale, seed = 16, 360, 640, 2.0, 1
    config = MeshFlowConfig(mesh_row_count=mesh, mesh_col_count=mesh)
    rng = np.random.default_rng(seed)
    from meshflow_tpu.utils import grid as gridmod

    unstab = np.asarray(gridmod.vertex_grid(config, h, w), np.float32)
    stab = make_warp(unstab, h, w, scale, rng, smooth=True)
    stab, unstab = jnp.asarray(stab), jnp.asarray(unstab)

    # stage 0: h tables from two separate jit programs
    t1 = np.asarray(
        jax.jit(
            cell_inverse_homographies, static_argnames=("config",)
        )(stab, unstab, config)
    )
    t2 = np.asarray(
        jax.jit(
            lambda a, b: cell_inverse_homographies(a, b, config) + 0.0
        )(stab, unstab)
    )
    same = np.array_equal(t1, t2)
    print(f"stage 0 h-table bitwise across jit programs: {same}", flush=True)
    if not same:
        d = np.abs(t1 - t2)
        print(f"  max |dH| = {d.max():.3e} at {np.unravel_index(d.argmax(), d.shape)}")

    cellw = w / mesh
    cellh = h / mesh
    for k in (1, 2, 3):
        qx_x, qy_x, row_x, col_x = (
            np.asarray(a)
            for a in xla_fixed_point(stab, unstab, config, h, w, k)
        )
        dbg = np.asarray(
            backward_map_pallas(stab, unstab, config, h, w, debug_iters=k)
        )
        qx_p = dbg[0].reshape(-1)
        qy_p = dbg[1].reshape(-1)
        row_p = dbg[2].reshape(-1).astype(np.int32)
        col_p = dbg[3].reshape(-1).astype(np.int32)
        dq = np.maximum(np.abs(qx_p - qx_x), np.abs(qy_p - qy_x))
        cell_diff = (row_p != row_x) | (col_p != col_x)
        n = cell_diff.sum()
        print(
            f"stage {k}: max|dq|={dq.max():.3e}  mean|dq|={dq.mean():.3e}  "
            f"p99.5|dq|={np.quantile(dq, 0.995):.3e}  "
            f"cell diff: {n} px ({100 * n / dq.size:.4f}%)",
            flush=True,
        )
        if n:
            # where do the differing pixels sit relative to cell seams
            # (in the q domain, per the XLA path's q)?
            fx = np.minimum(qx_x % cellw, cellw - (qx_x % cellw))[cell_diff]
            fy = np.minimum(qy_x % cellh, cellh - (qy_x % cellh))[cell_diff]
            seam = np.minimum(fx, fy)
            print(
                f"  seam distance of differing px: "
                f"max={seam.max():.3e} median={np.median(seam):.3e}",
                flush=True,
            )
            dq_at_diff = dq[cell_diff]
            print(
                f"  |dq| at differing px: min={dq_at_diff.min():.3e} "
                f"max={dq_at_diff.max():.3e}",
                flush=True,
            )

    # candidate pass: per-candidate application vs the XLA twin
    rc = cc = mesh
    qx_x, qy_x, row0, col0 = (
        np.asarray(a)
        for a in xla_fixed_point(stab, unstab, config, h, w, 3)
    )
    h_table = jax.jit(
        cell_inverse_homographies, static_argnames=("config",)
    )(stab, unstab, config)
    ys = np.arange(h, dtype=np.float32)
    xs = np.arange(w, dtype=np.float32)
    px = np.tile(xs[None, :], (h, 1)).reshape(-1)
    py = np.tile(ys[:, None], (1, w)).reshape(-1)

    cd = 0
    for dr in (-1, 0, 1):
        for dc in (-1, 0, 1):
            rowc = np.clip(row0 + dr, 0, rc - 1)
            colc = np.clip(col0 + dc, 0, cc - 1)
            cqx, cqy = _apply_h_table(
                jnp.asarray(rowc * cc + colc),
                h_table,
                jnp.asarray(px),
                jnp.asarray(py),
            )
            cqx, cqy = np.asarray(cqx), np.asarray(cqy)
            left = _grid_line_x(colc, w, cc).astype(np.float32)
            right = _grid_line_x(colc + 1, w, cc).astype(np.float32)
            top = _grid_line_y(rowc, h, rc).astype(np.float32)
            bottom = _grid_line_y(rowc + 1, h, rc).astype(np.float32)
            member_x = (
                (cqx > left - 1.0)
                & (cqx < right + 1.0)
                & (cqy > top - 1.0)
                & (cqy < bottom + 1.0)
            )
            dbg = np.asarray(
                backward_map_pallas(
                    stab, unstab, config, h, w, debug_iters=10 + cd
                )
            )
            pqx = dbg[0].reshape(-1)
            pqy = dbg[1].reshape(-1)
            pmem = dbg[2].reshape(-1) > 0.5
            pkey = dbg[3].reshape(-1)
            # only compare where the pallas candidate is valid AND equals
            # the XLA clamped candidate (interior; at borders XLA clamps,
            # pallas discards -- different by design, resolved identically)
            unclamped = ((row0 + dr) == rowc) & ((col0 + dc) == colc)
            cmp = unclamped & (pkey >= -1.0)
            dq = np.maximum(np.abs(pqx - cqx), np.abs(pqy - cqy))[cmp]
            mem_diff = (pmem != member_x) & cmp
            print(
                f"cand ({dr:+d},{dc:+d}): max|dq|={dq.max():.3e}  "
                f"member diff {mem_diff.sum()} px  "
                f"valid-vs-unclamped mismatch "
                f"{np.sum(unclamped != (pkey >= -1.0))}",
                flush=True,
            )
            cd += 1
    return 0


if __name__ == "__main__":
    sys.exit(main())
