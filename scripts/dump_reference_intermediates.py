#!/usr/bin/env python
"""Dump the reference implementation's stage outputs on a clip to .npz for
stage-by-stage divergence analysis.

Usage: python scripts/dump_reference_intermediates.py video-1 original
Writes /tmp/ref_intermediates_<clip>_<variant>.npz with unstabilized
displacements, homographies, stabilized displacements, crop boundaries, and
per-frame metric arrays.
"""

import sys
import time

import numpy as np

sys.path.insert(0, "/root/reference")
import meshflowstabilizer as ref_mod

VARIANTS = {"original": 0, "flipped": 1, "constant-high": 2, "constant-low": 3}


def main():
    clip = sys.argv[1]
    variant = sys.argv[2] if len(sys.argv) > 2 else "original"
    inp = f"/root/reference/videos/{clip}/{clip}.m4v"

    s = ref_mod.MeshFlowStabilizer()
    t0 = time.time()
    frames, num_frames, fps, codec = s._get_unstabilized_frames_and_video_features(inp)
    unstab_disp, homographies = s._get_unstabilized_vertex_displacements_and_homographies(
        num_frames, frames
    )
    t1 = time.time()
    stab_disp = s._get_stabilized_vertex_displacements(
        num_frames, frames, VARIANTS[variant], unstab_disp, homographies
    )
    t2 = time.time()
    stabilized, crop = s._get_stabilized_frames_and_crop_boundaries(
        num_frames, frames, unstab_disp, stab_disp
    )
    t3 = time.time()
    cropped = s._crop_frames(stabilized, crop)
    cr, ds = s._compute_cropping_ratio_and_distortion_score(num_frames, frames, cropped)
    ss = s._compute_stability_score(num_frames, stab_disp)
    t4 = time.time()

    out = f"/tmp/ref_intermediates_{clip}_{variant}.npz"
    np.savez_compressed(
        out,
        unstab_disp=unstab_disp,
        homographies=homographies,
        stab_disp=stab_disp,
        crop=np.asarray(crop),
        cropping_ratio=cr,
        distortion_score=ds,
        stability_score=ss,
        stage_seconds=np.asarray([t1 - t0, t2 - t1, t3 - t2, t4 - t3]),
    )
    print("wrote", out)
    print("crop:", crop, "metrics:", cr, ds, ss)
    print("stage seconds:", [t1 - t0, t2 - t1, t3 - t2, t4 - t3])


if __name__ == "__main__":
    main()
