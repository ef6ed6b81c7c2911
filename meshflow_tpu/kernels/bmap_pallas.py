"""Pallas TPU kernel for the per-pixel backward map (render L5).

render/stabilize.backward_map applies per-cell homographies with
(P, cells) one-hot MXU contractions (reference semantics:
/root/reference/meshflowstabilizer.py:1031-1061 compositing, rebuilt
pixel-first).  On XLA those one-hots materialize in HBM — tens of GB of
traffic per 1080p frame across the 12 applications (3 fixed-point
iterations + 9 candidate cells).  This kernel runs the whole search per
pixel block with every intermediate in VMEM: the Dekker-split homography
tables (with per-cell bboxes) are VMEM-resident (rows, cells) operands,
selection matmuls stream from VMEM, and only the final 4-channel map
leaves the chip (pixel coordinates are in-kernel iotas).

Layout: pixels live on LANES ((1, bp) rows; bp = rows_per_block * W),
coefficients on SUBLANES — Dekker reconstruction and per-coefficient
extraction are then static sublane slices (this Mosaic rejects dynamic
vector loads; static slices and one-hot matmuls are the sanctioned
patterns, see kernels/lk_pallas.py).

Exactness: the same arithmetic as the XLA path — identical bf16 Dekker
3-split tables contracted by exact 0/1 one-hots (each output is a single
product, so accumulation order is irrelevant), summed in the same
((hi + mid) + lo) order, then the same f32 apply/membership formulas.
Interpret mode is bit-identical to the XLA path (tests/test_bmap_pallas),
and after the Dekker-split barrier fix (see _dekker3) the ON-CHIP kernel
is bit-identical too: coverage mismatch 0, p99.5 |dmap| 0, crop diff
0 px across 640x360/1080p, mesh 16x16/64x64, smooth + noise warps
(scripts/test_bmap_chip.py, round-4 queue run) — the round-3 seam
divergence was entirely the zeroed mid/lo terms coarsening both paths'
values to bf16, where discrete cell decisions tie far more often.  The
production router keeps the XLA path below ~1 MP (compile cost isn't
worth it there) and engages this kernel where the one-hot traffic binds
(>= ~1 MP frames, 1.5-1.65x faster; see
render.stabilize.use_bmap_pallas).
"""

from __future__ import annotations

import functools
import os

import numpy as np

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from meshflow_tpu.config import MeshFlowConfig

_LANE = 128
_NEG_BIG = -1.0  # best_key init (XLA path: -1)


def _iota(shape, dim):
    return jax.lax.broadcasted_iota(jnp.int32, shape, dim)


def _grid_line(i, length, count):
    """ceil((length-1) * i / count) — the reference's mesh grid lines
    (/root/reference/meshflowstabilizer.py:901-906)."""
    return -(-((length - 1) * i) // count)


def _dekker3(x: jnp.ndarray) -> jnp.ndarray:
    """f32 (n, k) -> (n, 3k) [hi | mid | lo], each bf16-valued f32.

    hi + mid + lo reconstructs x to ~2^-24 relative; identical to the
    split in render.stabilize._apply_h_table_block so the kernel's
    selected coefficients match the XLA path bit for bit.

    This runs in XLA (trace time, outside the kernel), so each bf16
    convert hides behind an optimization_barrier: XLA's algebraic
    simplifier cancels `x - f32(bf16(x))` to ZERO (it treats the convert
    round-trip as identity), which silently zeroed mid/lo and made the
    whole map bf16-precise — the round-3 chip-gate failure's root cause
    (see render.stabilize._apply_h_table_block).
    """
    hi = jax.lax.optimization_barrier(x.astype(jnp.bfloat16)).astype(
        jnp.float32
    )
    rem = x - hi
    mid = jax.lax.optimization_barrier(rem.astype(jnp.bfloat16)).astype(
        jnp.float32
    )
    lo = (rem - mid).astype(jnp.bfloat16).astype(jnp.float32)
    return jnp.concatenate([hi, mid, lo], axis=1)


def _bmap_kernel(
    lx_ref,  # (LANE, 1) f32 column lines (inf padded)
    ly_ref,  # (LANE, 1) f32 row lines (inf padded)
    fp_ref,  # (48, cells_pad) f32: Dekker [hi|mid|lo] x (9 h + 4 bbox + 3 pad)
    cand_ref,  # (432, cells_pad) f32: 9 candidate-rolled copies of fp
    out_ref,  # (1, 4, bp) f32: [map_x, map_y, covered, key]
    *,
    rows_blk: int,
    width: int,
    height: int,
    rc: int,
    cc: int,
    debug_iters: int = 0,
):
    bp = rows_blk * width
    rb = pl.program_id(0)

    pix = _iota((1, bp), 1)
    rowin = jnp.zeros((1, bp), jnp.int32)
    for k in range(1, rows_blk):
        rowin = rowin + (pix >= k * width).astype(jnp.int32)
    px = (pix - rowin * width).astype(jnp.float32)
    py = (rb * rows_blk + rowin).astype(jnp.float32)

    lx = lx_ref[...]  # (LANE, 1)
    ly = ly_ref[...]
    cells_pad = fp_ref.shape[1]

    def cell_of(qx, qy):
        # index of the last grid line <= q (lines padded with +inf so
        # padding lanes never match), clamped — identical to the XLA path.
        col = jnp.sum((qx >= lx).astype(jnp.int32), axis=0, keepdims=True)
        row = jnp.sum((qy >= ly).astype(jnp.int32), axis=0, keepdims=True)
        return (
            jnp.clip(row, 0, rc - 1),
            jnp.clip(col, 0, cc - 1),
        )

    sub_iota = _iota((cells_pad, bp), 0)

    def select(cell, table, nrows):
        """table (3*nrows, cells_pad) -> Dekker-reconstructed (nrows, bp)."""
        onehot = (sub_iota == cell).astype(jnp.float32)
        acc = jax.lax.dot_general(
            table,
            onehot,
            (((1,), (0,)), ((), ())),
            precision=jax.lax.Precision.DEFAULT,
            preferred_element_type=jnp.float32,
        )  # (3*nrows, bp); single exact product per output element
        return (acc[0:nrows] + acc[nrows : 2 * nrows]) + acc[2 * nrows :]

    def apply_h(h, px_, py_):
        """h (16, bp) reconstructed rows -> (qx, qy) each (1, bp)."""
        d = h[6:7] * px_ + h[7:8] * py_ + h[8:9]
        d = jnp.where(jnp.abs(d) < 1e-10, 1e-10, d)
        qx = (h[0:1] * px_ + h[1:2] * py_ + h[2:3]) / d
        qy = (h[3:4] * px_ + h[4:5] * py_ + h[5:6]) / d
        return qx, qy

    # Fixed-point cell search (3 iterations, like the XLA path).
    qx, qy = px, py
    fp_iters = debug_iters if 0 < debug_iters < 10 else 3
    for _ in range(fp_iters):
        row, col = cell_of(qx, qy)
        h = select(row * cc + col, fp_ref[...], 16)
        qx, qy = apply_h(h, px, py)
    row0, col0 = cell_of(qx, qy)
    if 0 < debug_iters < 10:
        # Diagnostic mode (scripts/debug_bmap_chip.py): expose the
        # fixed-point state after `debug_iters` iterations.
        out_ref[...] = jnp.concatenate(
            [
                qx,
                qy,
                row0.astype(jnp.float32),
                col0.astype(jnp.float32),
            ],
            axis=0,
        )[None]
        return
    base = row0 * cc + col0

    # One fused selection for all 9 candidates (rolled tables), then the
    # reference's compositing: strictly inside the 1px-expanded bbox,
    # highest row-major cell index wins.
    acc9 = select(base, cand_ref[...], 9 * 16)  # (144, bp)

    if 10 <= debug_iters < 20:
        # Diagnostic: candidate (debug_iters - 10)'s application.
        cd = debug_iters - 10
        drs = (-1, 0, 1)
        h = acc9[cd * 16 : cd * 16 + 16]
        rowc = row0 + drs[cd // 3]
        colc = col0 + drs[cd % 3]
        valid = (rowc >= 0) & (rowc < rc) & (colc >= 0) & (colc < cc)
        cqx, cqy = apply_h(h, px, py)
        left, right = h[9:10], h[10:11]
        top, bottom = h[11:12], h[12:13]
        member = (
            (cqx > left - 1.0)
            & (cqx < right + 1.0)
            & (cqy > top - 1.0)
            & (cqy < bottom + 1.0)
        )
        key = (rowc * cc + colc).astype(jnp.float32)
        out_ref[...] = jnp.concatenate(
            [
                cqx,
                cqy,
                member.astype(jnp.float32),
                jnp.where(valid, key, -2.0),
            ],
            axis=0,
        )[None]
        return

    if debug_iters >= 20:
        # Diagnostic: candidate h via the rolled cand table vs via the
        # (chip-proven-exact) fp table at the same explicit cell index —
        # a same-kernel A/B that isolates the cand_ref path.
        cd = debug_iters - 20
        drs = (-1, 0, 1)
        h = acc9[cd * 16 : cd * 16 + 16]
        rowc = row0 + drs[cd // 3]
        colc = col0 + drs[cd % 3]
        cellc = (
            jnp.clip(rowc, 0, rc - 1) * cc + jnp.clip(colc, 0, cc - 1)
        )
        h2 = select(cellc, fp_ref[...], 16)
        cqx, cqy = apply_h(h, px, py)
        cqx2, cqy2 = apply_h(h2, px, py)
        out_ref[...] = jnp.concatenate(
            [cqx, cqy, cqx2, cqy2], axis=0
        )[None]
        return

    best_key = jnp.full((1, bp), _NEG_BIG, jnp.float32)
    best_qx = jnp.full((1, bp), float(width + 1), jnp.float32)
    best_qy = jnp.full((1, bp), float(height + 1), jnp.float32)
    c = 0
    for dr in (-1, 0, 1):
        for dc in (-1, 0, 1):
            h = acc9[c * 16 : c * 16 + 16]
            c += 1
            rowc = row0 + dr
            colc = col0 + dc
            valid = (
                (rowc >= 0) & (rowc < rc) & (colc >= 0) & (colc < cc)
            )
            cqx, cqy = apply_h(h, px, py)
            left, right = h[9:10], h[10:11]
            top, bottom = h[11:12], h[12:13]
            member = (
                (cqx > left - 1.0)
                & (cqx < right + 1.0)
                & (cqy > top - 1.0)
                & (cqy < bottom + 1.0)
            )
            key = (rowc * cc + colc).astype(jnp.float32)
            take = member & valid & (key > best_key)
            best_key = jnp.where(take, key, best_key)
            best_qx = jnp.where(take, cqx, best_qx)
            best_qy = jnp.where(take, cqy, best_qy)

    covered = (best_key >= 0.0).astype(jnp.float32)
    # Mosaic requires the last two block dims to be (8,128)-divisible or
    # full-size, so the block is (1, 4, bp) with channels on dim -2.
    out_ref[...] = jnp.concatenate(
        [best_qx, best_qy, covered, best_key], axis=0
    )[None]


def _static_tables(config: MeshFlowConfig, frame_height: int, frame_width: int):
    """Per-cell bbox table and grid-line vectors (numpy, trace-time)."""
    rc, cc = config.mesh_row_count, config.mesh_col_count
    cols = np.arange(cc)
    rows = np.arange(rc)
    left = _grid_line(cols, frame_width, cc)
    right = _grid_line(cols + 1, frame_width, cc)
    top = _grid_line(rows, frame_height, rc)
    bottom = _grid_line(rows + 1, frame_height, rc)
    bbox = np.zeros((rc * cc, 4), np.float32)
    bbox[:, 0] = np.tile(left, rc)
    bbox[:, 1] = np.tile(right, rc)
    bbox[:, 2] = np.repeat(top, cc)
    bbox[:, 3] = np.repeat(bottom, cc)

    lx = np.full((_LANE, 1), np.inf, np.float32)
    lx[: cc - 1, 0] = _grid_line(np.arange(1, cc), frame_width, cc)
    ly = np.full((_LANE, 1), np.inf, np.float32)
    ly[: rc - 1, 0] = _grid_line(np.arange(1, rc), frame_height, rc)
    return bbox, lx, ly


def _rows_per_block(
    frame_height: int, frame_width: int, cells_pad: int
) -> int:
    # Cap the (cells_pad, bp) one-hot operand near 8 MB of VMEM (dense
    # 64x64 meshes shrink the block), and otherwise target ~8K pixels
    # per program to bound per-program dispatch overhead.
    # MESHFLOW_BMAP_ROWS overrides the row count (A/B probing only).
    forced = os.environ.get("MESHFLOW_BMAP_ROWS")
    if forced:
        rows = int(forced)
        if frame_height % rows == 0:
            return rows
    max_bp = max(frame_width, (8 << 20) // (4 * cells_pad))
    target = max(1, min(8192, max_bp) // frame_width)
    rows = 1
    for cand in range(target, 0, -1):
        if frame_height % cand == 0:
            rows = cand
            break
    return rows


@functools.partial(
    jax.jit,
    static_argnames=(
        "config",
        "frame_height",
        "frame_width",
        "interpret",
        "debug_iters",
    ),
)
def backward_map_pallas(
    stab_pos: jnp.ndarray,
    unstab_grid: jnp.ndarray,
    config: MeshFlowConfig,
    frame_height: int,
    frame_width: int,
    interpret: bool = False,
    debug_iters: int = 0,
):
    """Pallas twin of render.stabilize.backward_map (same outputs)."""
    from meshflow_tpu.render.stabilize import (
        BackwardMap,
        cell_inverse_homographies,
    )

    rc, cc = config.mesh_row_count, config.mesh_col_count
    cells = rc * cc
    cells_pad = -(-cells // _LANE) * _LANE
    assert frame_width % 8 == 0, "pallas backward map needs W % 8 == 0"
    assert rc <= _LANE + 1 and cc <= _LANE + 1

    h_table = cell_inverse_homographies(stab_pos, unstab_grid, config)
    bbox, lx, ly = _static_tables(config, frame_height, frame_width)

    base13 = jnp.concatenate(
        [h_table.reshape(cells, 9), jnp.asarray(bbox)], axis=1
    )
    base16 = jnp.pad(base13, ((0, 0), (0, 3)))
    fp48 = _dekker3(base16)  # (cells, 48) = [hi16 | mid16 | lo16]
    cand_base = jnp.concatenate(
        [
            jnp.roll(base16, -(dr * cc + dc), axis=0)
            for dr in (-1, 0, 1)
            for dc in (-1, 0, 1)
        ],
        axis=1,
    )  # (cells, 144), candidate-major
    cand = _dekker3(cand_base)  # (cells, 432) = [hi144 | mid144 | lo144]
    fp_t = jnp.pad(fp48, ((0, cells_pad - cells), (0, 0))).T  # (48, cells_pad)
    cand_t = jnp.pad(cand, ((0, cells_pad - cells), (0, 0))).T  # (432, cp)

    rows_blk = _rows_per_block(frame_height, frame_width, cells_pad)
    bp = rows_blk * frame_width
    nb = frame_height // rows_blk

    kern = functools.partial(
        _bmap_kernel,
        rows_blk=rows_blk,
        width=frame_width,
        height=frame_height,
        rc=rc,
        cc=cc,
        debug_iters=debug_iters,
    )

    def whole(shape):
        return pl.BlockSpec(
            shape, lambda b: (0,) * len(shape), memory_space=pltpu.VMEM
        )

    out = pl.pallas_call(
        kern,
        grid=(nb,),
        in_specs=[
            whole((_LANE, 1)),
            whole((_LANE, 1)),
            whole((48, cells_pad)),
            whole((432, cells_pad)),
        ],
        out_specs=pl.BlockSpec(
            (1, 4, bp), lambda b: (b, 0, 0), memory_space=pltpu.VMEM
        ),
        out_shape=jax.ShapeDtypeStruct((nb, 4, bp), jnp.float32),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=96 * 1024 * 1024
        ),
        interpret=interpret,
    )(jnp.asarray(lx), jnp.asarray(ly), fp_t, cand_t)

    out = out.transpose(1, 0, 2).reshape(4, frame_height, frame_width)
    if debug_iters:
        return out  # (4, H, W): [qx, qy, row, col] after debug_iters
    return BackwardMap(
        map_x=out[0], map_y=out[1], covered=out[2] > 0.5
    )
