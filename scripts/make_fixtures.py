#!/usr/bin/env python
"""Generate reference-metric fixtures by running the actual reference
implementation (/root/reference/meshflowstabilizer.py) on demo clips.

Writes/updates tests/fixtures/reference_metrics.json with
{"<clip>/<variant>": {"cropping_ratio": ..., "distortion_score": ...,
 "stability_score": ..., "seconds": ...}}.

Usage: python scripts/make_fixtures.py video-1 original [flipped ...]
"""

import json
import os
import sys
import time

sys.path.insert(0, "/root/reference")

FIXTURES = os.path.join(
    os.path.dirname(__file__), "..", "tests", "fixtures", "reference_metrics.json"
)

VARIANTS = {"original": 0, "flipped": 1, "constant-high": 2, "constant-low": 3}


def main():
    clip = sys.argv[1]
    variants = sys.argv[2:] or ["original"]

    import meshflowstabilizer as ref_mod

    os.makedirs(os.path.dirname(FIXTURES), exist_ok=True)
    data = {}
    if os.path.exists(FIXTURES):
        with open(FIXTURES) as f:
            data = json.load(f)

    for variant in variants:
        key = f"{clip}/{variant}"
        if key in data:
            print(f"skip {key} (already present)", flush=True)
            continue
        inp = f"/root/reference/videos/{clip}/{clip}.m4v"
        out = f"/tmp/ref-{clip}-{variant}.m4v"
        stab = ref_mod.MeshFlowStabilizer()
        t0 = time.time()
        cr, ds, ss = stab.stabilize(inp, out, VARIANTS[variant])
        dt = time.time() - t0
        data[key] = {
            "cropping_ratio": float(cr),
            "distortion_score": float(ds),
            "stability_score": float(ss),
            "seconds": dt,
        }
        with open(FIXTURES, "w") as f:
            json.dump(data, f, indent=2, sort_keys=True)
        print(f"{key}: {data[key]}", flush=True)


if __name__ == "__main__":
    main()
