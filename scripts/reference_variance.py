#!/usr/bin/env python
"""RNG sensitivity of the reference's min-distortion statistic.

The distortion score is the MIN over per-frame values
(/root/reference/meshflowstabilizer.py:1212); the worst frame is typically
one whose homography was fit through few features, where cv2.findHomography
(RANSAC)'s inlier set depends on cv::theRNG().  This script measures how
much the reference's own reported metrics move when that RNG is reseeded —
the honest upper bound on achievable distortion parity.

Writes tests/fixtures/reference_seed_variance.json.

Usage: python scripts/reference_variance.py [clip=video-1] [variant=2] [seeds...]
"""

import json
import os
import sys
import time

sys.path.insert(0, "/root/reference")

OUT = os.path.join(
    os.path.dirname(os.path.abspath(__file__)), "..", "tests", "fixtures",
    "reference_seed_variance.json",
)


def main():
    clip = sys.argv[1] if len(sys.argv) > 1 else "video-1"
    variant = int(sys.argv[2]) if len(sys.argv) > 2 else 2
    seeds = [int(s) for s in sys.argv[3:]] or [0x12345678, 1, 2, 3]

    import cv2
    import meshflowstabilizer as ref_mod

    data = {}
    if os.path.exists(OUT):
        with open(OUT) as f:
            data = json.load(f)
    key = f"{clip}/variant-{variant}"
    entry = data.setdefault(key, {})

    inp = f"/root/reference/videos/{clip}/{clip}.m4v"
    for seed in seeds:
        if str(seed) in entry:
            print(f"skip seed {seed} (present)", flush=True)
            continue
        cv2.setRNGSeed(seed)
        stab = ref_mod.MeshFlowStabilizer()
        t0 = time.time()
        cr, ds, ss = stab.stabilize(inp, f"/tmp/refvar-{clip}.m4v", variant)
        entry[str(seed)] = {
            "cropping_ratio": float(cr),
            "distortion_score": float(ds),
            "stability_score": float(ss),
            "seconds": time.time() - t0,
        }
        with open(OUT, "w") as f:
            json.dump(data, f, indent=2, sort_keys=True)
        print(f"seed {seed}: {entry[str(seed)]}", flush=True)

    ds_vals = [v["distortion_score"] for v in entry.values()]
    if len(ds_vals) > 1:
        print(
            "distortion spread: min=%.4f max=%.4f rel=%.2f%%"
            % (min(ds_vals), max(ds_vals), 100 * (max(ds_vals) / min(ds_vals) - 1)),
            flush=True,
        )


if __name__ == "__main__":
    main()
