#!/usr/bin/env python
"""Our pipeline's RNG sensitivity on a (clip, variant) config.

Companion to scripts/reference_variance.py: the distortion score is a MIN
over per-frame values from the RANSAC-dependent metric tracker, so its
single-draw value carries the estimator's noise.  This measures our own
5-seed spread and records it as a committed fixture; the suite gate test
widens a config's distortion gate ONLY when such a fixture exists
(tests/test_suite_results.py).

Usage: python scripts/our_variance.py CLIP VARIANT [seeds...]
e.g.   python scripts/our_variance.py video-5 constant-high
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/jax_cache_meshflow_bench")

VARIANTS = {"original": 0, "flipped": 1, "constant-high": 2, "constant-low": 3}


def main():
    clip = sys.argv[1]
    variant = sys.argv[2]
    seeds = [int(s) for s in sys.argv[3:]] or [0, 1, 2, 3, 4]
    out = os.path.join(
        os.path.dirname(os.path.abspath(__file__)), "..", "tests", "fixtures",
        f"our_seed_variance_{clip}_{variant}.json",
    )

    import meshflow_tpu  # noqa: F401
    from meshflow_tpu.api import MeshFlowStabilizer

    entries = []
    if os.path.exists(out):
        with open(out) as f:
            entries = json.load(f)
    done = {e["seed"] for e in entries}

    inp = f"/root/reference/videos/{clip}/{clip}.m4v"
    for seed in seeds:
        if seed in done:
            print(f"skip seed {seed} (present)", flush=True)
            continue
        m = MeshFlowStabilizer(seed=seed)
        t0 = time.time()
        cr, ds, ss = m.stabilize(
            inp, f"/tmp/ourvar-{clip}-{variant}.m4v", VARIANTS[variant]
        )
        entries.append(
            {
                "seed": seed,
                "cropping_ratio": cr,
                "distortion_score": ds,
                "stability_score": ss,
                "seconds": time.time() - t0,
            }
        )
        with open(out, "w") as f:
            json.dump(entries, f, indent=1)
        print(f"seed {seed}: ({cr:.4f}, {ds:.4f}, {ss:.4f})", flush=True)

    vals = [e["distortion_score"] for e in entries]
    if vals:
        spread = 100.0 * (max(vals) - min(vals)) / (sum(vals) / len(vals))
        print(f"distortion 5-seed spread: {spread:.1f}%")
    return 0


if __name__ == "__main__":
    sys.exit(main())
