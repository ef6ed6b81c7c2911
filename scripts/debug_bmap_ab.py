#!/usr/bin/env python
"""Same-kernel A/B: candidate h via rolled cand table vs fp table.

Also verifies on the host that the cand/fp tables the kernel receives
hold identical Dekker pieces (the roll is a pure rearrangement).
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
from meshflow_tpu.kernels import bmap_pallas as bp
from meshflow_tpu.render.stabilize import cell_inverse_homographies
from meshflow_tpu.utils import grid as gridmod
from test_bmap_chip import make_warp


def main():
    mesh, h, w, scale, seed = 16, 360, 640, 2.0, 1
    config = MeshFlowConfig(mesh_row_count=mesh, mesh_col_count=mesh)
    rng = np.random.default_rng(seed)
    unstab = np.asarray(gridmod.vertex_grid(config, h, w), np.float32)
    stab = make_warp(unstab, h, w, scale, rng, smooth=True)
    stab, unstab = jnp.asarray(stab), jnp.asarray(unstab)

    # host check: cand table pieces == rolled fp pieces
    cells = mesh * mesh
    h_table = np.asarray(
        jax.jit(
            cell_inverse_homographies, static_argnames=("config",)
        )(stab, unstab, config)
    )
    bbox, lx, ly = bp._static_tables(config, h, w)
    base13 = np.concatenate([h_table.reshape(cells, 9), bbox], axis=1)
    base16 = np.pad(base13, ((0, 0), (0, 3))).astype(np.float32)
    fp48 = np.asarray(bp._dekker3(jnp.asarray(base16)))
    cand_base = np.concatenate(
        [
            np.roll(base16, -(dr * mesh + dc), axis=0)
            for dr in (-1, 0, 1)
            for dc in (-1, 0, 1)
        ],
        axis=1,
    )
    cand = np.asarray(bp._dekker3(jnp.asarray(cand_base)))
    ok_all = True
    for cd in range(9):
        off = (cd // 3 - 1) * mesh + (cd % 3 - 1)
        for piece in range(3):  # hi/mid/lo
            got = cand[:, piece * 144 + cd * 16 : piece * 144 + cd * 16 + 16]
            want = np.roll(fp48[:, piece * 16 : piece * 16 + 16], -off, axis=0)
            if not np.array_equal(got, want):
                ok_all = False
                print(f"host table mismatch: cand {cd} piece {piece}")
    print(f"host: cand pieces == rolled fp pieces: {ok_all}", flush=True)

    # chip A/B inside one kernel, candidate 4 = (0,0) first, then all
    for cd in (4, 0, 1, 3):
        dbg = np.asarray(
            bp.backward_map_pallas(
                stab, unstab, config, h, w, debug_iters=20 + cd
            )
        )
        cqx, cqy, cqx2, cqy2 = (dbg[i].reshape(-1) for i in range(4))
        d = np.maximum(np.abs(cqx - cqx2), np.abs(cqy - cqy2))
        print(
            f"cand {cd}: same-kernel cand-vs-fp max|d|={d.max():.3e}  "
            f"bad={(d > 0).sum()}/{d.size}",
            flush=True,
        )
    return 0


if __name__ == "__main__":
    sys.exit(main())
