#!/usr/bin/env python
"""Where do the real kernel-vs-XLA backward-map mismatches live?

Theory: both lowerings are internally exact (h tables bitwise, select
matmuls exact, same-kernel cand/fp A/B zero) — the divergence is
seam-ambiguous pixels: the 3-iteration cell fixed point is a discrete
map, so program-dependent f32 fusion rounding flips cell choices only
for pixels whose iterate lands within noise of a mesh grid line, and
the ±1 px membership band makes either neighbor a legitimate winner
there (the reference's own last-cell-wins compositing is ambiguous in
the band, /root/reference/meshflowstabilizer.py:1060-1061).

Test: histogram of (coverage mismatches, |dmap|>1e-2 pixels) against
distance-to-nearest-seam of the ORACLE map (f64 host evaluation of the
same algorithm).  If everything sits inside the ±1.5 px band, the paths
agree everywhere the semantics are well-defined.
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
from meshflow_tpu.render.stabilize import backward_map, cell_inverse_homographies
from meshflow_tpu.utils import grid as gridmod
from test_bmap_chip import make_warp


def oracle_backward_map(h_table, config, h, w):
    """f64 host evaluation of the backward-map algorithm, returning
    (map_x, map_y, covered, winner_key, margin) where margin is the
    distance (px) of the winning candidate's application from its
    membership-band edges — small margin == ambiguous pixel."""
    rc, cc = config.mesh_row_count, config.mesh_col_count
    H = h_table.astype(np.float64).reshape(rc * cc, 3, 3)
    ys, xs = np.mgrid[0:h, 0:w].astype(np.float64)
    px = xs.reshape(-1)
    py = ys.reshape(-1)

    def gl_x(c):
        return np.ceil((w - 1) * c / cc)

    def gl_y(r):
        return np.ceil((h - 1) * r / rc)

    lines_x = gl_x(np.arange(1, cc))
    lines_y = gl_y(np.arange(1, rc))

    def cell_of(qx, qy):
        col = (qx[:, None] >= lines_x[None, :]).sum(1)
        row = (qy[:, None] >= lines_y[None, :]).sum(1)
        return np.clip(row, 0, rc - 1), np.clip(col, 0, cc - 1)

    def apply_h(cells, px_, py_):
        hh = H[cells]
        d = hh[:, 2, 0] * px_ + hh[:, 2, 1] * py_ + hh[:, 2, 2]
        d = np.where(np.abs(d) < 1e-10, 1e-10, d)
        qx = (hh[:, 0, 0] * px_ + hh[:, 0, 1] * py_ + hh[:, 0, 2]) / d
        qy = (hh[:, 1, 0] * px_ + hh[:, 1, 1] * py_ + hh[:, 1, 2]) / d
        return qx, qy

    qx, qy = px, py
    for _ in range(3):
        row, col = cell_of(qx, qy)
        qx, qy = apply_h(row * cc + col, px, py)
    row0, col0 = cell_of(qx, qy)

    best_key = np.full(px.shape, -1, np.int64)
    best_qx = np.full(px.shape, float(w + 1), np.float64)
    best_qy = np.full(px.shape, float(h + 1), np.float64)
    best_margin = np.full(px.shape, np.inf)
    for dr in (-1, 0, 1):
        for dc in (-1, 0, 1):
            rowc = row0 + dr
            colc = col0 + dc
            valid = (rowc >= 0) & (rowc < rc) & (colc >= 0) & (colc < cc)
            rcl = np.clip(rowc, 0, rc - 1)
            ccl = np.clip(colc, 0, cc - 1)
            cqx, cqy = apply_h(rcl * cc + ccl, px, py)
            left, right = gl_x(ccl), gl_x(ccl + 1)
            top, bottom = gl_y(rcl), gl_y(rcl + 1)
            margin = np.minimum.reduce(
                [
                    cqx - (left - 1.0),
                    (right + 1.0) - cqx,
                    cqy - (top - 1.0),
                    (bottom + 1.0) - cqy,
                ]
            )
            member = margin > 0.0
            key = rcl * cc + ccl
            take = member & valid & (key > best_key)
            best_key = np.where(take, key, best_key)
            best_qx = np.where(take, cqx, best_qx)
            best_qy = np.where(take, cqy, best_qy)
            best_margin = np.where(take, margin, best_margin)
    covered = best_key >= 0
    return (
        best_qx.reshape(h, w),
        best_qy.reshape(h, w),
        covered.reshape(h, w),
        best_key.reshape(h, w),
        best_margin.reshape(h, w),
    )


def main():
    mesh, h, w, scale, seed = 16, 360, 640, 2.0, 1
    config = MeshFlowConfig(mesh_row_count=mesh, mesh_col_count=mesh)
    rng = np.random.default_rng(seed)
    unstab = np.asarray(gridmod.vertex_grid(config, h, w), np.float32)
    stab = make_warp(unstab, h, w, scale, rng, smooth=True)
    stab_d, unstab_d = jnp.asarray(stab), jnp.asarray(unstab)

    os.environ["MESHFLOW_BMAP"] = "xla"
    ref = backward_map(stab_d, unstab_d, config, h, w)
    out = backward_map_pallas(stab_d, unstab_d, config, h, w)
    h_table = np.asarray(
        jax.jit(
            cell_inverse_homographies, static_argnames=("config",)
        )(stab_d, unstab_d, config)
    )
    oqx, oqy, ocov, okey, omargin = oracle_backward_map(h_table, config, h, w)

    for name, bm in (("xla  ", ref), ("pallas", out)):
        cov = np.asarray(bm.covered)
        mx = np.asarray(bm.map_x)
        my = np.asarray(bm.map_y)
        cov_mm = cov != ocov
        both = cov & ocov
        d = np.maximum(np.abs(mx - oqx), np.abs(my - oqy))[both]
        # margin of the oracle at each mismatching pixel
        mm_margin = omargin[cov_mm & ocov]
        big = both.copy()
        big[both] = d > 1e-2
        big_margin = omargin[big]
        print(
            f"{name} vs oracle: cov mismatch {cov_mm.sum()} px "
            f"({100 * cov_mm.mean():.4f}%)  "
            f"p99.5|dmap| {np.quantile(d, 0.995):.3e}  "
            f"|dmap|>1e-2: {(d > 1e-2).sum()} px",
            flush=True,
        )
        if big_margin.size:
            print(
                f"   margin of |dmap|>1e-2 px: max {big_margin.max():.3f} "
                f"median {np.median(big_margin):.3f}  "
                f"(>2px-margin count: {(big_margin > 2.0).sum()})",
                flush=True,
            )
        if mm_margin.size:
            print(
                f"   margin of covered-mismatch px: max {mm_margin.max():.3f}"
                f"  (>2px-margin count: {(mm_margin > 2.0).sum()})",
                flush=True,
            )

    # kernel vs xla mismatch, margin-resolved
    cov_r = np.asarray(ref.covered)
    cov_p = np.asarray(out.covered)
    mm = cov_r != cov_p
    print(
        f"pallas vs xla: cov mismatch {mm.sum()} px; oracle margin at those"
        f" px: max {omargin[mm].max() if mm.any() else 0:.3f}",
        flush=True,
    )
    return 0


if __name__ == "__main__":
    sys.exit(main())
