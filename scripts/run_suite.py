#!/usr/bin/env python
"""Run the full demo-suite parity evaluation on TPU.

Stabilizes every (clip, variant) with a reference fixture
(tests/fixtures/reference_metrics.json) and writes SUITE_RESULTS.json at the
repo root with our metrics, the reference's, relative differences, and
timing.  This is the end-to-end acceptance gate from SURVEY.md section 4 /
BASELINE.md (metric parity +-1%).

Usage: python scripts/run_suite.py [clip ...]   (default: all with fixtures)
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/jax_cache_meshflow_bench")

import meshflow_tpu  # noqa: E402
from meshflow_tpu.api import MeshFlowStabilizer  # noqa: E402

FIXTURES = os.path.join(
    os.path.dirname(os.path.abspath(__file__)), "..", "tests", "fixtures",
    "reference_metrics.json",
)
OUT = os.path.join(os.path.dirname(os.path.abspath(__file__)), "..", "SUITE_RESULTS.json")
VARIANTS = {"original": 0, "flipped": 1, "constant-high": 2, "constant-low": 3}


def main():
    with open(FIXTURES) as f:
        fixtures = json.load(f)
    only_clips = set(sys.argv[1:])

    results = {}
    if os.path.exists(OUT):
        with open(OUT) as f:
            results = json.load(f)

    stabilizer = MeshFlowStabilizer()

    # Absorb the per-process device warmup (~3 min hidden in the first
    # synced stage of any fresh process — see .claude/skills/verify) with a
    # short untimed run so recorded per-config seconds measure the
    # pipeline, not process bring-up.
    warm_key = sorted(fixtures)[0]
    warm_clip = warm_key.split("/")[0]
    stabilizer.stabilize(
        f"/root/reference/videos/{warm_clip}/{warm_clip}.m4v",
        "/tmp/suite-warmup.m4v",
        VARIANTS[warm_key.split("/")[1]],
    )

    for key in sorted(fixtures):
        clip, variant = key.split("/")
        if only_clips and clip not in only_clips:
            continue
        inp = f"/root/reference/videos/{clip}/{clip}.m4v"
        out = f"/tmp/suite-{clip}-{variant}.m4v"
        t0 = time.perf_counter()
        cr, ds, ss = stabilizer.stabilize(inp, out, VARIANTS[variant])
        dt = time.perf_counter() - t0
        ref = fixtures[key]
        entry = {
            "ours": {"cropping_ratio": cr, "distortion_score": ds, "stability_score": ss},
            "reference": {
                k: ref[k]
                for k in ("cropping_ratio", "distortion_score", "stability_score")
            },
            "rel_diff_pct": {
                "cropping_ratio": 100 * (cr / ref["cropping_ratio"] - 1),
                "distortion_score": 100 * (ds / ref["distortion_score"] - 1),
                "stability_score": 100 * (ss / ref["stability_score"] - 1),
            },
            "seconds": dt,
            "reference_seconds": ref.get("seconds"),
            "speedup": (ref.get("seconds") or 0) / dt if dt else None,
        }
        results[key] = entry
        with open(OUT, "w") as f:
            json.dump(results, f, indent=2, sort_keys=True)
        print(
            f"{key}: ours=({cr:.4f},{ds:.4f},{ss:.4f}) "
            f"rel=({entry['rel_diff_pct']['cropping_ratio']:+.2f}%,"
            f"{entry['rel_diff_pct']['distortion_score']:+.2f}%,"
            f"{entry['rel_diff_pct']['stability_score']:+.2f}%) "
            f"{dt:.0f}s (ref {ref.get('seconds', 0):.0f}s)",
            flush=True,
        )


if __name__ == "__main__":
    main()
