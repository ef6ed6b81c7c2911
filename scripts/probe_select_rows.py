#!/usr/bin/env python
"""Minimal Mosaic probe: one-hot select matmul exactness vs LHS row count.

The bmap kernel's 48-row table select is bit-exact on chip while the
432-row candidate select shows ~bf16-sized errors
(scripts/debug_bmap_chip.py).  This isolates the select: LHS is a
(rows, 256) f32 table of bf16-valued pieces, RHS a (256, bp) exact 0/1
one-hot; every output element is a single product, so ANY row count must
be exact.  Tests rows in {48, 144, 432} with the exact kernel pattern
(jax.lax.dot_general, Precision.DEFAULT, f32 operands).
"""

import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/jax_cache_meshflow_bench")

import numpy as np

import meshflow_tpu  # noqa: F401
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def run_case(nrows, cells_pad=256, bp=7680, seed=0):
    rng = np.random.default_rng(seed)
    # bf16-valued f32 pieces spanning many magnitudes (like Dekker
    # hi/mid/lo of homography coefficients)
    base = rng.normal(0, 1, (nrows, cells_pad)).astype(np.float32)
    scale = 10.0 ** rng.integers(-8, 3, (nrows, cells_pad))
    table = (
        (base * scale).astype(jnp.bfloat16.dtype).astype(np.float32)
    )
    cells = rng.integers(0, cells_pad, (1, bp)).astype(np.int32)

    def kern(tab_ref, cell_ref, out_ref):
        sub_iota = jax.lax.broadcasted_iota(
            jnp.int32, (cells_pad, bp), 0
        )
        onehot = (sub_iota == cell_ref[...]).astype(jnp.float32)
        acc = jax.lax.dot_general(
            tab_ref[...],
            onehot,
            (((1,), (0,)), ((), ())),
            precision=jax.lax.Precision.DEFAULT,
            preferred_element_type=jnp.float32,
        )
        out_ref[...] = acc

    out = pl.pallas_call(
        kern,
        in_specs=[
            pl.BlockSpec((nrows, cells_pad), lambda: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, bp), lambda: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((nrows, bp), lambda: (0, 0), memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((nrows, bp), jnp.float32),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=96 * 1024 * 1024
        ),
    )(jnp.asarray(table), jnp.asarray(cells))
    got = np.asarray(out)
    want = table[:, cells[0]]
    exact = np.array_equal(got, want)
    bad = got != want
    rel = np.zeros_like(got)
    nz = want != 0
    rel[nz] = np.abs((got[nz] - want[nz]) / want[nz])
    print(
        f"rows={nrows:4d}: exact={exact}  bad={bad.sum()}/{bad.size}  "
        f"max rel err={rel.max():.3e}",
        flush=True,
    )
    if not exact:
        rr, cc2 = np.unravel_index(np.argmax(np.abs(got - want)), got.shape)
        print(
            f"  worst at row {rr} lane {cc2}: got {got[rr, cc2]!r} "
            f"want {want[rr, cc2]!r}",
            flush=True,
        )
        bad_rows = np.unique(np.where(bad)[0])
        print(f"  rows with errors: {bad_rows[:20]} ... total {bad_rows.size}", flush=True)
    return exact


def main():
    for nrows in (48, 144, 432):
        run_case(nrows)
    return 0


if __name__ == "__main__":
    sys.exit(main())
