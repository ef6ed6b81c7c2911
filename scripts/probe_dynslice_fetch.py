#!/usr/bin/env python
"""Probe: per-feature aligned-dynamic-slice band fetch cost on chip.

The LK kernel is latency-bound on per-block setup/fetch ops
(scripts/probe_lk_cost.py).  Raising the feature block size needs a fetch
whose VMEM footprint does not scale with B*wpad.  Candidate: per-feature
2D aligned dynamic slices — rows 8-aligned, lanes 128-aligned — into a
(B, rows, 256) band stack, then batched fine one-hot selection.

Measures, at 1080p l0 tile geometry (plane 328x664 f32):
  a) B sequential 2D aligned dyn-slice copies (48, 256) plane -> scratch
  b) the current shared one-hot row+col extraction for one block of 16
  c) batched fine-selection matmuls on the band stack

Run: python scripts/probe_dynslice_fetch.py
"""

import os
import sys
import time
import functools

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/jax_cache_meshflow_bench")

import numpy as np

import meshflow_tpu  # noqa: F401
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

HPAD, WPAD = 328, 664  # 1080p subframe tile padded to sublane/lane multiples
PN = 40
BAND_R, BAND_C = PN + 8, 256
REPS = 50  # fetch rounds per kernel call to avoid measuring call overhead


def copy_kernel(idx_ref, plane_ref, out_ref, band_s, *, b, reps):
    def round_body(r, _):
        def body(i, _):
            # r-dependence defeats loop-invariant hoisting across reps
            rb = ((idx_ref[2 * i] + 8 * (r % 4)) // 8) * 8
            cb = ((idx_ref[2 * i + 1] + 128 * (r % 2)) // 128) * 128
            band_s[i] = plane_ref[pl.ds(rb, BAND_R), pl.ds(cb, BAND_C)]
            return 0

        jax.lax.fori_loop(0, b, body, 0)
        # touch the bands so the loop is not dead
        out_ref[...] = band_s[b - 1, 0:8, 0:128] + r * 0.0
        return 0

    jax.lax.fori_loop(0, reps, round_body, 0)


def fine_kernel(idx_ref, plane_ref, out_ref, band_s, rsel_s, *, b, reps):
    """Copies + batched fine row selection (the full fetch replacement)."""
    def round_body(r, _):
        def body(i, _):
            # r-dependence defeats loop-invariant hoisting across reps
            rb = ((idx_ref[2 * i] + 8 * (r % 4)) // 8) * 8
            cb = ((idx_ref[2 * i + 1] + 128 * (r % 2)) // 128) * 128
            band_s[i] = plane_ref[pl.ds(rb, BAND_R), pl.ds(cb, BAND_C)]
            return 0

        jax.lax.fori_loop(0, b, body, 0)
        # fine row-select: (B, PN, BAND_R) x (B, BAND_R, BAND_C)
        rows = jax.lax.dot_general(
            rsel_s[...], band_s[...],
            (((2,), (1,)), ((0,), (0,))),
            preferred_element_type=jnp.float32,
            precision=jax.lax.Precision.DEFAULT,
        )  # (B, PN, BAND_C)
        out_ref[...] = rows[b - 1, 0:8, 0:128] + r * 0.0
        return 0

    jax.lax.fori_loop(0, reps, round_body, 0)


def onehot_kernel(idx_ref, plane_ref, out_ref, *, b, reps):
    """Current style: shared full-plane one-hot row selection for B rows
    of a PN-stride patch (row stage only; col stage omitted)."""
    def round_body(r, acc):
        tgt = idx_ref[0] + (r % 4) + jax.lax.broadcasted_iota(
            jnp.int32, (b * PN, HPAD), 0
        ) % PN
        lane = jax.lax.broadcasted_iota(jnp.int32, (b * PN, HPAD), 1)
        R = (lane == tgt).astype(jnp.float32)
        band = jax.lax.dot_general(
            R, plane_ref[...], (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
            precision=jax.lax.Precision.DEFAULT,
        )  # (b*PN, WPAD)
        return acc + band[0:8, 0:128]

    out_ref[...] = jax.lax.fori_loop(
        0, reps, round_body, jnp.zeros((8, 128), jnp.float32)
    )


def run(name, kernel, b, scratch, nidx):
    idx = np.zeros(2 * b, np.int32)
    rng = np.random.default_rng(0)
    idx[0::2] = (rng.integers(0, (HPAD - BAND_R) // 8, b)) * 8
    idx[1::2] = (rng.integers(0, (WPAD - BAND_C) // 128 + 1, b)) * 128
    plane = jnp.asarray(rng.random((HPAD, WPAD), np.float32))
    fn = pl.pallas_call(
        functools.partial(kernel, b=b, reps=REPS),
        grid=(),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((8, 128), jnp.float32),
        scratch_shapes=scratch,
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024
        ),
    )
    jfn = jax.jit(lambda i, p: fn(i, p))
    out = jfn(jnp.asarray(idx), plane)
    out.block_until_ready()
    times = []
    for _ in range(5):
        t0 = time.perf_counter()
        jfn(jnp.asarray(idx), plane).block_until_ready()
        times.append(time.perf_counter() - t0)
    t = min(times) / REPS
    print(f"{name} (B={b}): {t * 1e6:.1f} us/round "
          f"({t / b * 1e6:.2f} us/feature)", flush=True)


if __name__ == "__main__":
    for b in (16, 64, 128):
        run("dynslice copies", copy_kernel, b,
            [pltpu.VMEM((b, BAND_R, BAND_C), jnp.float32)], 2 * b)
    for b in (16, 64, 128):
        run("dynslice+fine-rowsel", fine_kernel, b,
            [
                pltpu.VMEM((b, BAND_R, BAND_C), jnp.float32),
                pltpu.VMEM((b, PN, BAND_R), jnp.float32),
            ], 2 * b)
    for b in (16,):
        run("full-plane one-hot rowsel", onehot_kernel, b, [], 2 * b)
