#!/usr/bin/env python
"""Debug the f64 oracle against the XLA backward map ON CPU.

The round-4 seam study found both chip paths (XLA + Pallas) agree with
each other but differ from debug_bmap_seams.oracle_backward_map at ~98.6%
of pixels by ~1 px — i.e. the oracle itself disagrees with the algorithm
it claims to model.  The XLA path is backend-portable, so the bug must
reproduce on CPU where iteration is cheap.  This script diffs the two at
360x640/mesh16 and prints one mismatching pixel's full intermediates
(fixed-point iterates, candidate keys, margins) for both evaluations.
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))
os.environ["JAX_PLATFORMS"] = "cpu"
os.environ["MESHFLOW_BMAP"] = "xla"
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/jax_cache_meshflow_tests")

import numpy as np

import meshflow_tpu  # noqa: F401
import jax
import jax.numpy as jnp

from meshflow_tpu.config import MeshFlowConfig
from meshflow_tpu.render.stabilize import backward_map, cell_inverse_homographies
from meshflow_tpu.utils import grid as gridmod
from test_bmap_chip import make_warp
from debug_bmap_seams import oracle_backward_map


def main():
    mesh, h, w, scale, seed = 16, 360, 640, 2.0, 1
    config = MeshFlowConfig(mesh_row_count=mesh, mesh_col_count=mesh)
    rng = np.random.default_rng(seed)
    unstab = np.asarray(gridmod.vertex_grid(config, h, w), np.float32)
    stab = make_warp(unstab, h, w, scale, rng, smooth=True)
    stab_d, unstab_d = jnp.asarray(stab), jnp.asarray(unstab)

    ref = backward_map(stab_d, unstab_d, config, h, w)
    h_table = np.asarray(
        jax.jit(
            cell_inverse_homographies, static_argnames=("config",)
        )(stab_d, unstab_d, config)
    )
    oqx, oqy, ocov, okey, omargin = oracle_backward_map(h_table, config, h, w)

    cov = np.asarray(ref.covered)
    mx = np.asarray(ref.map_x)
    my = np.asarray(ref.map_y)
    both = cov & ocov
    d = np.maximum(np.abs(mx - oqx), np.abs(my - oqy))
    d = np.where(both, d, 0.0)
    print(
        f"cpu-xla vs oracle: cov mismatch {(cov != ocov).sum()} px "
        f"({100 * (cov != ocov).mean():.4f}%)  "
        f"p99.5|dmap| {np.quantile(d[both], 0.995):.3e}  "
        f"|dmap|>1e-2: {(d > 1e-2).sum()} px  "
        f"({100 * (d > 1e-2).mean():.2f}%)"
    )
    if (d > 1e-2).sum() == 0 and (cov != ocov).sum() == 0:
        print("oracle agrees with the CPU XLA path -> divergence is chip-side")
        return 0

    # Pick the mismatching pixel with the LARGEST oracle margin (i.e. the
    # least seam-ambiguous) and dump both evaluations' intermediates.
    cand = np.where(d > 1e-2, omargin, -np.inf)
    py_, px_ = np.unravel_index(np.argmax(cand), cand.shape)
    print(f"\npixel (y={py_}, x={px_}): xla=({mx[py_, px_]:.4f}, {my[py_, px_]:.4f})"
          f" oracle=({oqx[py_, px_]:.4f}, {oqy[py_, px_]:.4f})"
          f" okey={okey[py_, px_]} margin={omargin[py_, px_]:.3f}")

    rc = cc = mesh
    H64 = h_table.astype(np.float64).reshape(rc * cc, 3, 3)
    H32 = h_table.reshape(rc * cc, 3, 3)

    def gl_x(c):
        return np.ceil((w - 1) * np.asarray(c, np.float64) / cc)

    def gl_y(r):
        return np.ceil((h - 1) * np.asarray(r, np.float64) / rc)

    def cell_of(qx, qy):
        col = int((qx >= gl_x(np.arange(1, cc))).sum())
        row = int((qy >= gl_y(np.arange(1, rc))).sum())
        return min(max(row, 0), rc - 1), min(max(col, 0), cc - 1)

    for name, H in (("f64", H64), ("f32", H32.astype(np.float32))):
        ftype = np.float64 if name == "f64" else np.float32
        qx, qy = ftype(px_), ftype(py_)
        print(f"  [{name}] start q=({qx}, {qy})")
        for it in range(3):
            row, col = cell_of(float(qx), float(qy))
            hh = H[row * cc + col].astype(ftype)
            den = hh[2, 0] * ftype(px_) + hh[2, 1] * ftype(py_) + hh[2, 2]
            qx = (hh[0, 0] * ftype(px_) + hh[0, 1] * ftype(py_) + hh[0, 2]) / den
            qy = (hh[1, 0] * ftype(px_) + hh[1, 1] * ftype(py_) + hh[1, 2]) / den
            print(f"  [{name}] iter {it}: cell=({row},{col}) q=({qx:.6f}, {qy:.6f})")
        row0, col0 = cell_of(float(qx), float(qy))
        print(f"  [{name}] row0,col0 = ({row0},{col0})")
        for dr in (-1, 0, 1):
            for dc in (-1, 0, 1):
                r = min(max(row0 + dr, 0), rc - 1)
                c = min(max(col0 + dc, 0), cc - 1)
                hh = H[r * cc + c].astype(ftype)
                den = hh[2, 0] * ftype(px_) + hh[2, 1] * ftype(py_) + hh[2, 2]
                cqx = (hh[0, 0] * ftype(px_) + hh[0, 1] * ftype(py_) + hh[0, 2]) / den
                cqy = (hh[1, 0] * ftype(px_) + hh[1, 1] * ftype(py_) + hh[1, 2]) / den
                left, right = gl_x(c), gl_x(c + 1)
                top, bottom = gl_y(r), gl_y(r + 1)
                member = (
                    (cqx > left - 1.0)
                    and (cqx < right + 1.0)
                    and (cqy > top - 1.0)
                    and (cqy < bottom + 1.0)
                )
                print(
                    f"  [{name}] cand ({dr:+d},{dc:+d}) cell=({r},{c}) key={r * cc + c}"
                    f" q=({cqx:.4f}, {cqy:.4f}) member={member}"
                )
    return 1


if __name__ == "__main__":
    sys.exit(main())
