"""Pallas TPU kernel for pyramidal Lucas-Kanade sparse tracking.

Replaces the XLA selection-matmul formulation (kernels/lk.py) on TPU
hardware: that version streams multi-MB one-hot matrices and patch
intermediates through HBM on every solver iteration, which measured
~0.4s per frame pair at 640x360 — the whole pipeline's bottleneck
(reference hot loop: /root/reference/meshflowstabilizer.py:618-620).

Here each (tile, feature-block) grid program keeps everything in VMEM:

* the tile's REFLECT_101-padded pyramid level (uint8, converted once),
* per-feature 24x24 prev patches -> Scharr derivatives -> bilinear
  image/gradient windows and the frozen 2x2 gradient matrix,
* per-feature 40x40 next-image patches, re-fetched in up to 4 rounds
  when an iterate wanders past the +-8 px patch margin,
* the 30-iteration solver loop as exact-bf16 one-hot MXU contractions
  (integer row/column window selection) plus f32 VPU bilinear combines
  per iteration.  The iteration loop is CHANNEL-FUSED: next-image
  patches live channel-minor ((B, pn, C*pn)), so row selection is one
  (C*pn)-lane matmul, the bilinear combine / residual / gradient
  products run once on (B*PR, C*PR) instead of C times on 24 of 128
  lanes, and the b-vector segment sums collapse to two dots per
  iteration regardless of C (measured ~1.9x on the convergence-bound
  metric pass).

Patch FETCHES are per-feature 2D aligned dynamic slices: each feature's
(stride+8, 256) band is loaded at an 8-sublane/128-lane-aligned base
(the alignment this Mosaic can prove through `(x // k) * k`), then the
exact (stride, stride) patch is cut out with small batched one-hot
matmuls over the band.  Scalar bases cross from the iteration loop's
vector registers through a VMEM scratch (scalar loads at dynamic
indices lower — scripts/probe_scalar_from_vmem.py).  This replaces the
round-3 full-plane one-hot row/column selection, whose (B, wpad,
stride) selectors capped the feature block at 16; bands scale with B
alone, so blocks of 64 features amortize the latency-bound per-block
setup and per-iteration ops 4x (scripts/probe_lk_cost.py measured the
kernel latency-bound: ~26 us/block setup + ~4 us/iteration at B=16,
nearly independent of plane area).

This Mosaic toolchain imposes hard constraints the layout honors:
UNALIGNED dynamic vector loads are rejected (so in-iteration window
selection is one-hot matmuls / static shifts; dynamic slices appear
only at provably 8/128-aligned bases), per-feature scalars only
broadcast along minor dims (so flat (B*stride, lanes) layouts with
jnp.repeat-expanded scalars), and reshapes only split majors in
multiples of 8 (strides 24/40 both qualify).

Semantics match kernels/lk.py (itself oracle-tested against
cv2.calcOpticalFlowPyrLK): Scharr/32 derivatives zeroed outside the
level extent, bilinear prev windows frozen per level, OpenCV's
convergence/oscillation/min-eigenvalue criteria, level-0-only status
demotion, and a shared 30-iteration budget across patch-refresh rounds.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

WIN = 21  # OpenCV default window (win_size)
HALF = (WIN - 1) * 0.5
PR = 24  # prev patch rows/cols: 22 bilinear support + 1-px Scharr ring
PN_TOP = 72  # top-level next patch: large margin, big motions live here
PN_LOWER = 40  # refinement-level next patch: 22 support + 2*8 margin
PAD = 28  # REFLECT_101 plane padding; >= WIN + PR margin everywhere
BAND_C = 256  # fetch band lanes: 128 alignment slack + 128 fine offset
ROUNDS = 4  # patch-refresh rounds per level
CV_SCALE = 1.0 / 1024.0  # Scharr is 32x unit gradient; OpenCV's FLT_SCALE
FLT_EPSILON = 1.19209290e-07

# This Mosaic rejects bf16 x bf16 -> f32 matmuls ("Bad lhs type"); selection
# matmuls run in f32 (values are exact small integers either way).
_BF = jnp.float32


def _iota(shape, dim):
    return jax.lax.broadcasted_iota(jnp.int32, shape, dim)


def _expand(v, stride):
    """(B, k) per-feature values -> (B*stride, k) flat rows."""
    return jnp.repeat(v, stride, axis=0)


def _lk_level_kernel(
    prev_ref,
    next_ref,
    feat_ref,
    out_ref,
    pimg_s,
    nimg_s,
    win_s,
    jpatch_s,
    jint3_s,
    praw_s,
    band_s,
    csel_s,
    base_s,
    *,
    block: int,
    rows: int,
    cols: int,
    hpad: int,
    wpad: int,
    num_ch: int,
    max_iters: int,
    eps: float,
    min_eig_threshold: float,
    is_level0: bool,
    nb: int,
    pn: int,
    rounds: int,
):
    B = block
    C = num_ch
    margin = (pn - PR) // 2
    eps2 = eps * eps
    win_area = float(WIN * WIN)
    # Patch origins are clipped to the reflect-padded data extent; the
    # array's hpad/wpad additionally include the aligned-fetch slack
    # (zeros, never selected) added by reflect_pad_level.
    hdata = rows + 2 * PAD
    wdata = cols + 2 * PAD
    sub = min(16, B)  # fine-selector construction sub-block

    # Default pass-through (overwritten per block with valid features).
    # feat rows: [px, py, guess_x, guess_y, valid, status, 0, 0]
    out_ref[0, 0, :, :, 0:2] = feat_ref[0, 0, :, :, 2:4]
    out_ref[0, 0, :, :, 2:3] = feat_ref[0, 0, :, :, 5:6]

    # planes: uint8 -> f32 pages once per (pair, tile) program
    def conv_body(c, _):
        pimg_s[c] = prev_ref[0, 0, c].astype(jnp.int32).astype(jnp.float32)
        nimg_s[c] = next_ref[0, 0, c].astype(jnp.int32).astype(jnp.float32)
        return 0

    jax.lax.fori_loop(0, C, conv_body, 0)

    def block_body(jb, _carry):
        blk = feat_ref[0, 0, jb]  # (B, 8)
        pts = blk[:, 0:2]  # level coords - HALF
        guess0 = blk[:, 2:4]
        valid = blk[:, 4:5].astype(jnp.int32)
        st_in = blk[:, 5:6].astype(jnp.int32)

        _run_block(pts, guess0, valid, st_in, jb)
        return 0

    def _run_block(pts, guess0, valid, st_in, jb):
        @pl.when(jnp.any(valid > 0))
        def _run():
            px = pts[:, 0:1]  # (B,1)
            py = pts[:, 1:2]
            ipx = jnp.floor(px)
            ipy = jnp.floor(py)
            fa = px - ipx  # x fraction
            fb = py - ipy
            ipx = ipx.astype(jnp.int32)
            ipy = ipy.astype(jnp.int32)

            inb_prev = (
                (ipx >= -WIN) & (ipx < cols) & (ipy >= -WIN) & (ipy < rows)
            )  # (B,1) bool

            # patch covers plane rows [ipy+PAD-1, +PR), cols [ipx+PAD-1, +PR).
            oy0 = jnp.clip(ipy + PAD - 1, 0, hdata - PR)
            ox0 = jnp.clip(ipx + PAD - 1, 0, wdata - PR)

            def load_bands(img_s, y0, x0, nrows):
                """Per-feature aligned band loads for a patch fetch.

                y0/x0: (B, 1) i32 patch origins in plane coords, already
                clipped to the data extent.  Loads each feature's
                (nrows, BAND_C) band at an 8/128-aligned base with a
                dynamic slice (this Mosaic lowers provably-aligned
                dynamic vector loads — scripts/probe_aligned_dynslice.py)
                into band_s; scalar bases cross from vector to scalar
                registers through the base_s VMEM scratch
                (scripts/probe_scalar_from_vmem.py).  Returns the (B, 1)
                in-band row/lane offsets of the true origin.
                """
                yb = (y0 // 8) * 8
                xb = (x0 // 128) * 128
                base_s[:, 0:1] = yb
                base_s[:, 1:2] = xb

                def body(i, _):
                    ybi = (base_s[i, 0] // 8) * 8  # provably aligned
                    xbi = (base_s[i, 1] // 128) * 128
                    for c in range(C):
                        band_s[c, i, 0:nrows, :] = img_s[
                            c, pl.ds(ybi, nrows), pl.ds(xbi, BAND_C)
                        ]
                    return 0

                jax.lax.fori_loop(0, B, body, 0)
                return y0 - yb, x0 - xb

            def build_csel(dx, stride):
                """Fine column selector into csel_s: csel[b, l, j] =
                [l == dx_b + j].  Built in sub-blocks so no multi-MB
                one-hot value lands on the Mosaic stack."""
                for sb in range(0, B, sub):
                    ctgt = _expand(dx[sb : sb + sub], BAND_C)
                    flat = (
                        (_iota((sub * BAND_C, stride), 0) % BAND_C)
                        == ctgt + _iota((sub * BAND_C, stride), 1)
                    ).astype(jnp.float32)
                    csel_s[sb : sb + sub, :, 0:stride] = flat.reshape(
                        sub, BAND_C, stride
                    )

            def fine_select(c, dy, stride, nrows):
                """One channel's (B, stride, stride) patch from its bands.

                One-hot selectors times 8-bit-integer-valued planes are
                exact under bf16 MXU passes, so these dots override the
                package-wide HIGHEST matmul precision (6x bf16 passes)
                with the fast single-pass DEFAULT.
                """
                cols_sel = jax.lax.dot_general(
                    band_s[c, :, 0:nrows, :],
                    csel_s[:, :, 0:stride],
                    (((2,), (1,)), ((0,), (0,))),
                    preferred_element_type=jnp.float32,
                    precision=jax.lax.Precision.DEFAULT,
                )  # (B, nrows, stride)
                rtgt = _expand(dy, stride)  # (B*stride, 1)
                rsel = (
                    _iota((B * stride, nrows), 1)
                    == rtgt + (_iota((B * stride, nrows), 0) % stride)
                ).astype(jnp.float32).reshape(B, stride, nrows)
                return jax.lax.dot_general(
                    rsel,
                    cols_sel,
                    (((2,), (1,)), ((0,), (0,))),
                    preferred_element_type=jnp.float32,
                    precision=jax.lax.Precision.DEFAULT,
                )  # (B, stride, stride)

            # ---- prev patches -> Scharr -> bilinear windows, per channel ------
            # Derivative grid row q corresponds to praw texel q+1; OpenCV's
            # derivative pyramid is zero outside [0,rows)x[0,cols).
            prow1 = _expand(oy0 - PAD + 1, PR) + (_iota((B * PR, PR), 0) % PR)
            pcol = _expand(ox0 - PAD, PR) + _iota((B * PR, PR), 1)
            colv = ((pcol >= 0) & (pcol < cols)).astype(jnp.float32)
            dmask1 = ((prow1 >= 0) & (prow1 < rows)).astype(jnp.float32) * colv
            dmask2 = (
                ((prow1 + 1 >= 0) & (prow1 + 1 < rows)).astype(jnp.float32) * colv
            )

            # window validity mask (texels 0..20 of the 24-row stride)
            wmask = (
                (_iota((B * PR, PR), 0) % PR < WIN) & (_iota((B * PR, PR), 1) < WIN)
            ).astype(jnp.float32)

            fa_e = _expand(fa, PR)
            fb_e = _expand(fb, PR)

            n = B * PR

            def sh(x, d):
                # lane shift: out[:, cc] = x[:, cc+d].  Cyclic wrap only touches
                # cols outside the 21x21 window, so no masking needed.
                if d == 0:
                    return x
                return pltpu.roll(x, (PR - d) % PR, axis=1)

            dyp, dxp = load_bands(pimg_s, oy0, ox0, PR + 8)
            build_csel(dxp, PR)

            # Unrolled over channels (static lane offsets: dynamic lane
            # slices do not lower on this Mosaic).  Windows land
            # channel-minor in win_s: [iw_all | gx_all | gy_all], each
            # (B*PR, C*PR), so the iteration loop reads them fused.
            def prev_channel(c):
                praw_s[c, 0:n, :] = fine_select(c, dyp, PR, PR + 8).reshape(
                    n, PR
                )
                praw_s[c, n:, :] = jnp.zeros((8, PR), jnp.float32)
                p_ext = praw_s[c]
                # Scharr x/y (/32) over m = n+2 rows so windows can read q+1.
                m = n + 2
                rm1 = p_ext[0:m, :]
                r0 = p_ext[1 : 1 + m, :]
                rp1 = p_ext[2 : 2 + m, :]
                gx = (
                    3.0 * (sh(rm1, 1) - sh(rm1, -1))
                    + 10.0 * (sh(r0, 1) - sh(r0, -1))
                    + 3.0 * (sh(rp1, 1) - sh(rp1, -1))
                ) * (1.0 / 32.0)
                gy = (
                    3.0 * (sh(rp1, -1) - sh(rm1, -1))
                    + 10.0 * (sh(rp1, 0) - sh(rm1, 0))
                    + 3.0 * (sh(rp1, 1) - sh(rm1, 1))
                ) * (1.0 / 32.0)
                gxv = gx[0:n, :] * dmask1
                gyv = gy[0:n, :] * dmask1
                gxh = gx[1 : 1 + n, :] * dmask2
                gyh = gy[1 : 1 + n, :] * dmask2

                # window texel (r, cc): praw texels (r+1+dr, cc+1+dc);
                # derivative grid rows r (lo) and r+1 (hi).
                def window(rlo, rhi):
                    row = (1.0 - fb_e) * rlo + fb_e * rhi
                    return (1.0 - fa_e) * sh(row, 1) + fa_e * sh(row, 2)

                iw = window(p_ext[1 : 1 + n, :], p_ext[2 : 2 + n, :]) * wmask
                gxw = window(gxv, gxh) * wmask
                gyw = window(gyv, gyh) * wmask
                win_s[:, c * PR : (c + 1) * PR] = iw
                win_s[:, (C + c) * PR : (C + c + 1) * PR] = gxw
                win_s[:, (2 * C + c) * PR : (2 * C + c + 1) * PR] = gyw

                def segsum(x_flat):
                    return jnp.dot(
                        seg,
                        jnp.sum(x_flat, axis=1, keepdims=True),
                        preferred_element_type=jnp.float32,
                    )

                return (
                    segsum(gxw * gxw),
                    segsum(gxw * gyw),
                    segsum(gyw * gyw),
                )

            # segment-sum matrix: (B, B*PR) ones over each feature's rows
            seg = (_iota((B, B * PR), 1) // PR == _iota((B, B * PR), 0)).astype(
                jnp.float32
            )

            # channel-fused window mask: (B*PR, C*PR), PR-periodic in lanes
            wmask3 = (
                (_iota((B * PR, C * PR), 0) % PR < WIN)
                & (_iota((B * PR, C * PR), 1) % PR < WIN)
            ).astype(jnp.float32)

            zero_b1 = jnp.zeros((B, 1), jnp.float32)
            a11, a12, a22 = zero_b1, zero_b1, zero_b1
            for c in range(C):
                d11, d12, d22 = prev_channel(c)
                a11, a12, a22 = a11 + d11, a12 + d12, a22 + d22

            a11c = a11 * CV_SCALE
            a12c = a12 * CV_SCALE
            a22c = a22 * CV_SCALE
            det = a11c * a22c - a12c * a12c
            min_eig = (
                a22c + a11c - jnp.sqrt((a11c - a22c) ** 2 + 4.0 * a12c * a12c)
            ) / (2.0 * win_area)
            well_posed = (min_eig >= min_eig_threshold) & (det >= FLT_EPSILON)
            inv_det = jnp.where(det == 0.0, 0.0, 1.0 / det)

            active0 = (valid > 0) & inb_prev & well_posed  # (B,1) bool
            status = st_in > 0
            if is_level0:
                status = status & inb_prev & well_posed

            # ---- rounds x solver iterations ---------------------------------
            # Loop carries are int32 masks: this Mosaic fails to legalize
            # scf.for/scf.while with i1 vector carries.
            def round_body(rd, carry):
                corner0, finished_i, st_i, used = carry
                finished = finished_i > 0
                st = st_i > 0
                icy0 = jnp.floor(corner0[:, 1:2]).astype(jnp.int32)
                icx0 = jnp.floor(corner0[:, 0:1]).astype(jnp.int32)
                py0 = jnp.clip(icy0 + PAD - margin, 0, max(hdata - pn, 0))
                px0 = jnp.clip(icx0 + PAD - margin, 0, max(wdata - pn, 0))

                need = active0 & jnp.logical_not(finished)

                @pl.when(jnp.any(need))
                def _fetch():
                    dyn, dxn = load_bands(nimg_s, py0, px0, pn + 8)
                    build_csel(dxn, pn)
                    for c in range(C):
                        # channel-minor: (B, pn, C*pn)
                        jpatch_s[:, :, c * pn : (c + 1) * pn] = fine_select(
                            c, dyn, pn, pn + 8
                        )

                def iter_cond(state):
                    j, corner, active_i, prev_delta, st_ci, done_i, used_c = state
                    return (j < max_iters) & jnp.any(active_i > 0)

                def iter_body(state):
                    j, corner, active_i, prev_delta, st_ci, done_i, used_c = state
                    active = active_i > 0
                    st_c = st_ci > 0
                    done = done_i > 0
                    cx = corner[:, 0:1]
                    cy = corner[:, 1:2]
                    icx = jnp.floor(cx)
                    icy = jnp.floor(cy)
                    ffa = cx - icx
                    ffb = cy - icy
                    icx = icx.astype(jnp.int32)
                    icy = icy.astype(jnp.int32)
                    inb = (
                        (icx >= -WIN) & (icx < cols) & (icy >= -WIN) & (icy < rows)
                    )
                    if is_level0:
                        st_n = st_c & (inb | jnp.logical_not(active))
                    else:
                        st_n = st_c
                    done = done | (active & jnp.logical_not(inb))
                    still = active & inb

                    oy_raw = icy + PAD - py0  # (B,1) offset in patch
                    ox_raw = icx + PAD - px0
                    oy = jnp.clip(oy_raw, 0, pn - PR)
                    ox = jnp.clip(ox_raw, 0, pn - PR)
                    left_patch = (oy_raw != oy) | (ox_raw != ox)
                    still = still & jnp.logical_not(left_patch)

                    # integer 24-row / 24-col window selection
                    oy_e = _expand(oy, PR)  # (B*PR, 1)
                    rsel = (
                        (_iota((B * PR, pn), 1) - (_iota((B * PR, pn), 0) % PR))
                        == oy_e
                    ).astype(jnp.float32).reshape(B, PR, pn)
                    ox_e = _expand(ox, pn)  # (B*pn, 1)
                    csel = (
                        (_iota((B * pn, PR), 0) % pn - _iota((B * pn, PR), 1))
                        == ox_e
                    ).astype(jnp.float32).reshape(B, pn, PR)

                    ffa_e = _expand(ffa, PR)
                    ffb_e = _expand(ffb, PR)

                    # Channel-fused: one (C*pn)-lane row-selection matmul,
                    # then per-channel column selection into the
                    # channel-minor jint3 scratch; everything after runs
                    # once over C*PR lanes.  Pure 0/1 selectors x integer
                    # image values: exact in single-pass bf16.
                    jrows3 = jax.lax.dot_general(
                        rsel,
                        jpatch_s[...],
                        (((2,), (1,)), ((0,), (0,))),
                        preferred_element_type=jnp.float32,
                        precision=jax.lax.Precision.DEFAULT,
                    )  # (B, PR, C*pn) integer rows
                    for c in range(C):
                        jint_c = jax.lax.dot_general(
                            jrows3[:, :, c * pn : (c + 1) * pn],
                            csel,
                            (((2,), (1,)), ((0,), (0,))),
                            preferred_element_type=jnp.float32,
                            precision=jax.lax.Precision.DEFAULT,
                        )  # (B, PR, PR) integer window grid
                        jint3_s[:, c * PR : (c + 1) * PR] = jint_c.reshape(
                            B * PR, PR
                        )
                    jint3 = jint3_s[...]
                    # bilinear combine: window texel (r, cc) mixes grid
                    # (r..r+1, cc..cc+1); the lane roll wraps across
                    # channel block edges only at texel columns >= WIN,
                    # which wmask3 zeroes.
                    row3 = (1.0 - ffb_e) * jint3 + ffb_e * pltpu.roll(
                        jint3, B * PR - 1, axis=0
                    )
                    jwin3 = (
                        (1.0 - ffa_e) * row3
                        + ffa_e * pltpu.roll(row3, C * PR - 1, axis=1)
                    ) * wmask3
                    diff3 = jwin3 - win_s[:, 0 : C * PR]
                    b1 = jnp.dot(
                        seg,
                        jnp.sum(
                            diff3 * win_s[:, C * PR : 2 * C * PR],
                            axis=1,
                            keepdims=True,
                        ),
                        preferred_element_type=jnp.float32,
                    )
                    b2 = jnp.dot(
                        seg,
                        jnp.sum(
                            diff3 * win_s[:, 2 * C * PR : 3 * C * PR],
                            axis=1,
                            keepdims=True,
                        ),
                        preferred_element_type=jnp.float32,
                    )
                    b1 = b1 * CV_SCALE
                    b2 = b2 * CV_SCALE
                    dx = (a12c * b2 - a22c * b1) * inv_det
                    dy = (a12c * b1 - a11c * b2) * inv_det
                    delta = jnp.concatenate([dx, dy], axis=1)  # (B,2)

                    # masked updates via f32 multiply: bool concat/bitcast does
                    # not lower on this Mosaic
                    still_f = still.astype(jnp.float32)  # (B,1) -> minor bcast
                    new_corner = corner + delta * still_f
                    converged = (dx * dx + dy * dy) <= eps2
                    oscillating = (
                        (j > 0)
                        & (jnp.abs(dx + prev_delta[:, 0:1]) < 0.01)
                        & (jnp.abs(dy + prev_delta[:, 1:2]) < 0.01)
                    )
                    backoff_f = (still & oscillating).astype(jnp.float32)
                    new_corner = new_corner - delta * 0.5 * backoff_f
                    used_n = used_c + still.astype(jnp.int32)
                    exhausted = used_n >= max_iters
                    done = done | (still & (converged | oscillating | exhausted))
                    new_active = (
                        still
                        & jnp.logical_not(converged)
                        & jnp.logical_not(oscillating)
                        & jnp.logical_not(exhausted)
                    )
                    return (
                        j + 1,
                        new_corner,
                        new_active.astype(jnp.int32),
                        delta,
                        st_n.astype(jnp.int32),
                        done.astype(jnp.int32),
                        used_n,
                    )

                init = (
                    jnp.asarray(0, jnp.int32),
                    corner0,
                    need.astype(jnp.int32),
                    jnp.zeros((B, 2), jnp.float32),
                    st.astype(jnp.int32),
                    finished.astype(jnp.int32),
                    used,
                )
                _, corner_e, _, _, st_e, done_e, used_e = jax.lax.while_loop(
                    iter_cond, iter_body, init
                )
                return corner_e, done_e, st_e, used_e

            corner_f, _, status_f, _ = jax.lax.fori_loop(
                0,
                rounds,
                round_body,
                (
                    guess0,
                    jnp.logical_not(active0).astype(jnp.int32),
                    status.astype(jnp.int32),
                    jnp.zeros((B, 1), jnp.int32),
                ),
            )

            out_ref[0, 0, jb] = jnp.concatenate(
                [
                    corner_f,
                    status_f.astype(jnp.float32),
                    jnp.zeros((B, 1), jnp.float32),
                ],
                axis=1,
            )

    jax.lax.fori_loop(0, nb, block_body, 0)


@functools.partial(
    jax.jit,
    static_argnames=(
        "rows",
        "cols",
        "shifted",
        "block",
        "max_iters",
        "eps",
        "min_eig_threshold",
        "is_level0",
        "interpret",
        "pn",
        "rounds",
    ),
)
def lk_level_pallas(
    prev_planes_u8: jnp.ndarray,  # (Fp, S, C, hpad, wpad) uint8
    next_planes_u8: jnp.ndarray,  # (Fn, S, C, hpad, wpad) uint8
    pts: jnp.ndarray,  # (T, S, K, 2) f32 prev corners at this level
    guess: jnp.ndarray,  # (T, S, K, 2) f32 next-corner estimates
    valid: jnp.ndarray,  # (T, S, K) bool
    status_in: jnp.ndarray,  # (T, S, K) bool
    rows: int,
    cols: int,
    shifted: bool = True,
    block: int = 64,
    max_iters: int = 30,
    eps: float = 0.01,
    min_eig_threshold: float = 1e-4,
    is_level0: bool = False,
    interpret: bool = False,
    pn: int = PN_LOWER,
    rounds: int = ROUNDS,
):
    """Run one pyramid level for all frame pairs.

    shifted=True: adjacent-frame pairs — pair t tracks prev plane t into
    next plane t+1 of the same array (pass it twice).  shifted=False:
    parallel pairs (the metric pass) — prev plane t into next plane t
    of a second array.  One grid program per (pair, tile); feature
    blocks iterate inside the kernel so tile planes are fetched and
    converted once.  Returns (corners (T, S, K, 2), status (T, S, K)).
    """
    f, s, c, hpad, wpad = prev_planes_u8.shape
    t, _, k, _ = pts.shape
    assert t == (f - 1 if shifted else f)
    nb = k // block
    assert nb * block == k

    packed = jnp.concatenate(
        [
            pts,
            guess,
            valid.astype(jnp.float32)[..., None],
            status_in.astype(jnp.float32)[..., None],
            jnp.zeros(pts.shape[:3] + (2,), jnp.float32),
        ],
        axis=-1,
    ).reshape(t, s, nb, block, 8)

    kern = functools.partial(
        _lk_level_kernel,
        block=block,
        rows=rows,
        cols=cols,
        hpad=hpad,
        wpad=wpad,
        num_ch=c,
        max_iters=max_iters,
        eps=eps,
        min_eig_threshold=min_eig_threshold,
        is_level0=is_level0,
        nb=nb,
        pn=pn,
        rounds=rounds,
    )

    plane_spec_prev = pl.BlockSpec(
        (1, 1, c, hpad, wpad),
        lambda ti, si: (ti, si, 0, 0, 0),
        memory_space=pltpu.VMEM,
    )
    shift = 1 if shifted else 0
    plane_spec_next = pl.BlockSpec(
        (1, 1, c, hpad, wpad),
        lambda ti, si: (ti + shift, si, 0, 0, 0),
        memory_space=pltpu.VMEM,
    )

    def feat_spec(last):
        return pl.BlockSpec(
            (1, 1, nb, block, last),
            lambda ti, si: (ti, si, 0, 0, 0),
            memory_space=pltpu.VMEM,
        )

    out = pl.pallas_call(
        kern,
        grid=(t, s),
        in_specs=[
            plane_spec_prev,
            plane_spec_next,
            feat_spec(8),
        ],
        out_specs=feat_spec(4),
        out_shape=jax.ShapeDtypeStruct((t, s, nb, block, 4), jnp.float32),
        scratch_shapes=[
            pltpu.VMEM((c, hpad, wpad), jnp.float32),  # pimg
            pltpu.VMEM((c, hpad, wpad), jnp.float32),  # nimg
            # [iw_all | gx_all | gy_all], each channel-minor (B*PR, c*PR)
            pltpu.VMEM((block * PR, 3 * c * PR), jnp.float32),
            pltpu.VMEM((block, pn, c * pn), jnp.float32),  # jpatch (ch-minor)
            pltpu.VMEM((block * PR, c * PR), jnp.float32),  # jint3
            pltpu.VMEM((c, block * PR + 8, PR), jnp.float32),  # praw (+slack)
            # aligned-fetch bands (shared by prev/next patch fetches)
            pltpu.VMEM((c, block, pn + 8, BAND_C), jnp.float32),
            pltpu.VMEM((block, BAND_C, pn), jnp.float32),  # fine col selector
            pltpu.VMEM((block, 128), jnp.int32),  # scalar base handoff
        ],
        # The f32 plane pages scale with tile area: 640x360 tiles fit the
        # default 16 MB scoped-vmem budget, 1080p tiles (326x536 padded)
        # need ~21 MB; the B=64 fetch bands add ~10-16 MB and the pn=72
        # top-level case peaks ~69 MB of scoped allocation.  v5e has
        # 128 MB of VMEM; budget 100 MB and leave the rest for the
        # pipelined block buffers.
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024
        ),
        interpret=interpret,
    )(prev_planes_u8, next_planes_u8, packed)

    out = out.reshape(t, s, k, 4)
    return (out[..., 0:2], out[..., 2] > 0.5)


def lk_track_pairs_pallas(
    levels_u8,  # tuple over levels of (F, S, C, hpad_l, wpad_l) uint8
    level_dims,  # tuple over levels of (rows_l, cols_l)
    pts: jnp.ndarray,  # (F, S, K, 2) f32 tile-local level-0 positions
    valid: jnp.ndarray,  # (F, S, K) bool
    block: int = 64,
    max_iters: int = 30,
    eps: float = 0.01,
    min_eig_threshold: float = 1e-4,
    interpret: bool = False,
):
    """Track each frame's keypoints into the next frame (all pairs).

    Returns (next_pts (F-1, S, K, 2), status (F-1, S, K)).
    """
    return lk_track_parallel_pallas(
        levels_u8,
        levels_u8,
        level_dims,
        pts[:-1],
        valid[:-1],
        shifted=True,
        block=block,
        max_iters=max_iters,
        eps=eps,
        min_eig_threshold=min_eig_threshold,
        interpret=interpret,
    )


def lk_track_parallel_pallas(
    prev_levels_u8,  # tuple over levels of (Fp, S, C, hpad_l, wpad_l) uint8
    next_levels_u8,  # same tile geometry; Fn = Fp (shifted=False) or Fp
    level_dims,  # tuple over levels of (rows_l, cols_l)
    pts: jnp.ndarray,  # (T, S, K, 2) f32 tile-local level-0 prev positions
    valid: jnp.ndarray,  # (T, S, K) bool
    shifted: bool = False,
    block: int = 64,
    max_iters: int = 30,
    eps: float = 0.01,
    min_eig_threshold: float = 1e-4,
    interpret: bool = False,
    init_pts: jnp.ndarray | None = None,
    pn_top: int = PN_TOP,
    pn_lower: int = PN_LOWER,
    rounds: int = ROUNDS,
):
    """Track pts of prev pyramid t into next pyramid t(+1 if shifted).

    Mirrors kernels/lk.lk_track level flow: coarse-to-fine, guesses
    doubled between levels, status carried through with level-0-only
    demotion.  Returns (next_pts (T, S, K, 2), status (T, S, K)).

    init_pts, when given, seeds the top-level search at an analytic
    estimate of the destination (cv2's OPTFLOW_USE_INITIAL_FLOW); the
    default seeds at the source position like cv2's default flags.
    """
    max_level = len(prev_levels_u8) - 1
    prev_pts = pts
    valid_t = valid
    status = valid_t
    start = prev_pts if init_pts is None else init_pts
    next_pts = start / (2.0**max_level)

    for level in range(max_level, -1, -1):
        rows_l, cols_l = level_dims[level]
        prev_l = prev_pts / (2.0**level) - HALF
        if level != max_level:
            next_pts = next_pts * 2.0
        guess = next_pts - HALF
        corner, status = lk_level_pallas(
            prev_levels_u8[level],
            next_levels_u8[level],
            prev_l,
            guess,
            valid_t,
            status,
            rows=rows_l,
            cols=cols_l,
            shifted=shifted,
            block=block,
            max_iters=max_iters,
            eps=eps,
            min_eig_threshold=min_eig_threshold,
            is_level0=(level == 0),
            interpret=interpret,
            # top level: wide patches for large motions, smaller feature
            # blocks to stay inside VMEM; refinement levels: the reverse
            pn=pn_top if level == max_level else pn_lower,
            rounds=rounds,
        )
        next_pts = corner + HALF

    out = jnp.where(valid_t[..., None], next_pts, prev_pts)
    return out, status & valid_t


def reflect_pad_level(img: jnp.ndarray, pad: int = PAD) -> jnp.ndarray:
    """REFLECT_101-pad the last two dims by `pad` (chunked: numpy reflect
    can only pad size-1 per step), then zero-pad to the kernel's aligned
    fetch geometry: rows to a multiple of 8 plus 8 slack rows (so any
    8-aligned (stride+8)-row band starting at or below the clipped patch
    origin stays in range), lanes to a multiple of 128 plus 128 (same for
    the 128-aligned BAND_C-lane bands), with floors of PN_TOP+8 rows and
    BAND_C lanes for the widest patches.  The zero region is never
    selected: patch origins are clipped to the reflect-padded data extent
    before the fine one-hot selection."""
    remaining = pad
    while remaining > 0:
        step = min(remaining, min(img.shape[-2], img.shape[-1]) - 1)
        img = jnp.pad(
            img,
            [(0, 0)] * (img.ndim - 2) + [(step, step), (step, step)],
            mode="reflect",
        )
        remaining -= step
    h, w = img.shape[-2], img.shape[-1]
    ht = max(-(-h // 8) * 8 + 8, PN_TOP + 8)
    wt = max(-(-w // 128) * 128 + 128, BAND_C)
    return jnp.pad(
        img, [(0, 0)] * (img.ndim - 2) + [(0, ht - h), (0, wt - w)]
    )


def pack_tile_planes(tiles: jnp.ndarray, max_level: int):
    """Tile pyramid planes for the Pallas tracker.

    tiles: (F, S, C, th, tw) float32 8-bit-valued level-0 tiles.
    Returns (tuple over levels of (F, S, C, hpad_l, wpad_l) uint8,
    tuple of (rows_l, cols_l)).
    """
    from meshflow_tpu.kernels.pyramid import build_pyramid

    levels = build_pyramid(tiles, max_level)
    planes = tuple(
        reflect_pad_level(lvl).astype(jnp.uint8) for lvl in levels
    )
    dims = tuple((lvl.shape[-2], lvl.shape[-1]) for lvl in levels)
    return planes, dims
