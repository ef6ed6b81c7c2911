#!/usr/bin/env python
"""Drive the meshflow_tpu library surface on real reference footage.

Used by /verify at each milestone: exercises the currently-built layers end
to end through the public package boundary and prints observable results.
Run: JAX_COMPILATION_CACHE_DIR=/tmp/jax_cache_meshflow_tests python scripts/drive.py
"""

import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import cv2
import numpy as np

import meshflow_tpu  # noqa: F401  (must be first: pins matmul precision)
import jax
import jax.numpy as jnp

from meshflow_tpu.config import MeshFlowConfig
from meshflow_tpu.kernels.color import bgr_to_gray
from meshflow_tpu.kernels.fast import detect_keypoints

CLIP = "/root/reference/videos/video-1/video-1.m4v"


def main():
    print(f"backend: {jax.default_backend()}, devices: {jax.devices()}")
    config = MeshFlowConfig()

    cap = cv2.VideoCapture(CLIP)
    frames = []
    for _ in range(8):
        ok, frame = cap.read()
        assert ok
        frames.append(frame)
    cap.release()
    bgr = jnp.asarray(np.stack(frames))
    h, w = bgr.shape[1:3]
    print(f"clip: {CLIP} ({w}x{h}, read {len(frames)} frames)")

    gray = bgr_to_gray(bgr)
    t0 = time.perf_counter()
    kps = detect_keypoints(gray, config, h, w)
    kps.valid.block_until_ready()
    t1 = time.perf_counter()
    kps2 = detect_keypoints(gray, config, h, w)
    kps2.valid.block_until_ready()
    t2 = time.perf_counter()
    valid = np.asarray(kps.valid)
    per_frame = valid.sum(axis=(1, 2))
    print(
        f"FAST: {per_frame.tolist()} corners/frame "
        f"(compile+run {t1-t0:.1f}s, steady {1000*(t2-t1):.1f}ms for 8 frames)"
    )
    # cross-check frame 0 against OpenCV per-subframe detection
    det = cv2.FastFeatureDetector_create()
    ref_count = 0
    sub_h, sub_w = config.subframe_shape(h, w)
    for sy in range(0, h, sub_h):
        for sx in range(0, w, sub_w):
            ref_count += len(det.detect(frames[0][sy:sy+sub_h, sx:sx+sub_w]))
    print(f"frame 0: ours={int(per_frame[0])} opencv={ref_count}")

    # --- LK tracking frame 0 -> 1 -------------------------------------
    from meshflow_tpu.kernels.lk import lk_track, prepare_level
    from meshflow_tpu.kernels.pyramid import build_pyramid

    max_level = config.lk_max_level(h, w)
    grayf = gray.astype(jnp.float32)
    pyr0 = tuple(prepare_level(l[0]) for l in build_pyramid(grayf, max_level))
    pyr1 = tuple(prepare_level(l[1]) for l in build_pyramid(grayf, max_level))
    pts = kps.positions[0].reshape(-1, 2)
    vmask = kps.valid[0].reshape(-1)
    t0 = time.perf_counter()
    tracked, status = lk_track(pyr0, pyr1, pts, vmask)
    status.block_until_ready()
    t1 = time.perf_counter()
    tracked, status = lk_track(pyr0, pyr1, pts, vmask)
    status.block_until_ready()
    t2 = time.perf_counter()
    st = np.asarray(status)
    flow = np.asarray(tracked)[st] - np.asarray(pts)[st]
    print(
        f"LK: tracked {st.sum()}/{int(np.asarray(vmask).sum())} features, "
        f"median flow ({np.median(flow[:,0]):+.2f}, {np.median(flow[:,1]):+.2f}) px "
        f"(compile {t1-t0:.1f}s, steady {1000*(t2-t1):.1f}ms)"
    )
    g0 = np.asarray(gray[0])
    g1 = np.asarray(gray[1])
    cvpts = np.asarray(pts)[np.asarray(vmask)][:, None, :]
    nxt, stcv, _ = cv2.calcOpticalFlowPyrLK(g0, g1, cvpts, None, maxLevel=max_level)
    cvflow = nxt[stcv.flatten() == 1, 0] - cvpts[stcv.flatten() == 1, 0]
    print(
        f"LK opencv cross-check: {int(stcv.sum())} tracked, "
        f"median flow ({np.median(cvflow[:,0]):+.2f}, {np.median(cvflow[:,1]):+.2f}) px"
    )


if __name__ == "__main__":
    main()
