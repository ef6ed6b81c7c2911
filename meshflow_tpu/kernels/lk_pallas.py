"""Pallas TPU pyramidal Lucas-Kanade tracker — fetch-path dispatcher.

Two complete kernel implementations exist, differing only in how patch
pixels are FETCHED from the VMEM-resident pyramid planes (everything
downstream — Scharr windows, channel-fused iteration loop, OpenCV
convergence semantics matching cv2.calcOpticalFlowPyrLK at
/root/reference/meshflowstabilizer.py:618-620 — is shared logic):

* ``onehot`` (default, `_lk_pallas_onehot.py`): full-plane one-hot
  row/column selection matmuls, feature block B=16.  The round-3
  production path: chip-validated bit-parity and the measured e2e
  optimum (video-1 warm 41.8 s / 11.8 fps).
* ``band`` (`_lk_pallas_band.py`): per-feature 8/128-aligned dynamic
  band slices + fine one-hot cut-out, feature block B=64.  A round-4
  experiment whose microbenchmark predicted a 4x per-block setup
  amortization but whose only end-to-end measurement regressed 52%
  (BENCH_r04: 63.6 s) — kept selectable for iteration, not shipped.

Select with ``MESHFLOW_LK_FETCH=onehot|band`` (read once at import:
the choice changes kernel scratch geometry and plane padding, so it is
process-wide).  Both expose the identical public surface re-exported
here; `reflect_pad_level`/`pack_tile_planes` must come from the same
module as the kernel (the band path pads planes with aligned-fetch
slack the one-hot path neither needs nor expects).
"""

from __future__ import annotations

import os

_FETCH = os.environ.get("MESHFLOW_LK_FETCH", "onehot").strip().lower()
if _FETCH == "band":
    from meshflow_tpu.kernels._lk_pallas_band import (  # noqa: F401
        BAND_C,
        CV_SCALE,
        FLT_EPSILON,
        HALF,
        PAD,
        PN_LOWER,
        PN_TOP,
        PR,
        ROUNDS,
        WIN,
        lk_level_pallas,
        lk_track_pairs_pallas,
        lk_track_parallel_pallas,
        pack_tile_planes,
        reflect_pad_level,
    )
elif _FETCH == "onehot":
    from meshflow_tpu.kernels._lk_pallas_onehot import (  # noqa: F401
        CV_SCALE,
        FLT_EPSILON,
        HALF,
        PAD,
        PN_LOWER,
        PN_TOP,
        PR,
        ROUNDS,
        WIN,
        lk_level_pallas,
        lk_track_pairs_pallas,
        lk_track_parallel_pallas,
        pack_tile_planes,
        reflect_pad_level,
    )
else:
    raise ValueError(
        f"MESHFLOW_LK_FETCH={_FETCH!r}: expected 'onehot' or 'band'"
    )

FETCH_PATH = _FETCH
