#!/usr/bin/env python
"""Per-frame metric-pass diff: ours vs the reference, for one config.

The distortion score is a MIN over per-frame values of a RANSAC-dependent
estimator (/root/reference/meshflowstabilizer.py:1206-1212); when the
video-level values disagree (video-10/constant-high: +19% on one seed),
the question is *which frame* carries each side's min and how the two
per-frame curves compare.  This tool answers it with data:

  python scripts/metric_frame_diff.py video-10 constant-high

runs both implementations' metric passes over the SAME pair of videos --
the unstabilized clip and each side's own stabilized output -- records
per-frame (cropping ratio, distortion), and writes
tests/fixtures/metric_frame_diff_<clip>_<variant>.json with
  * each side's per-frame distortion curve summary (min, argmin, p5/p50),
  * the cross curve: our tracker on the reference's golden output, which
    isolates estimator disagreement from output-video disagreement.

Run AFTER scripts/run_suite.py (needs /tmp/suite-<clip>-<variant>.m4v).
"""

import json
import os
import sys
import time

REPO = os.path.join(os.path.dirname(os.path.abspath(__file__)), "..")
sys.path.insert(0, REPO)
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/jax_cache_meshflow_bench")

VARIANTS = {"original": 0, "flipped": 1, "constant-high": 2, "constant-low": 3}


def read_frames(path):
    import cv2

    cap = cv2.VideoCapture(path)
    frames = []
    while True:
        ok, f = cap.read()
        if not ok:
            break
        frames.append(f)
    cap.release()
    return frames


def reference_per_frame(unstab, cropped):
    """The reference's own per-frame metric estimator (its :1192-1210 loop
    body, called as an oracle through its private API)."""
    import numpy as np

    sys.path.insert(0, "/root/reference")
    import meshflowstabilizer as ref_mod

    s = ref_mod.MeshFlowStabilizer()
    ratios, dists = [], []
    for u, c in zip(unstab, cropped):
        _, _, h = s._get_matched_features_and_homography(u, c)
        if h is None:
            ratios.append(1.0)
            dists.append(1.0)
            continue
        ratios.append(1.0 / (h[0, 0] * h[1, 1]))
        affine = np.copy(h)
        affine[2] = [0, 0, 1]
        eigs = np.abs(np.linalg.eigvals(affine))
        eigs = np.sort(eigs)[::-1]
        dists.append(float(eigs[1] / eigs[0]))
    return ratios, dists


def ours_per_frame(unstab, cropped, seed=0):
    import numpy as np

    import meshflow_tpu  # noqa: F401
    import jax
    import jax.numpy as jnp
    from meshflow_tpu.config import MeshFlowConfig
    from meshflow_tpu.metrics.quality import cropping_and_distortion_scanned
    from meshflow_tpu.motion.pipeline import prepare_frames, use_pallas_lk

    config = MeshFlowConfig()
    h, w = unstab[0].shape[:2]
    chunk = 64
    key = jax.random.fold_in(jax.random.PRNGKey(seed), 2)
    un = np.stack(unstab)
    cr = np.stack(cropped)
    n = un.shape[0]
    ratios, dists = [], []

    def pad_to(a, m):
        padding = [(0, m - a.shape[0])] + [(0, 0)] * (a.ndim - 1)
        return jnp.pad(a, padding, mode="edge")

    kps_all = None
    for start in range(0, n, chunk):
        stop = min(start + chunk, n)
        un_c = pad_to(jnp.asarray(un[start:stop]), chunk)
        cr_c = pad_to(jnp.asarray(cr[start:stop]), chunk)
        kps_c, _ = prepare_frames(un_c, config)
        r, d = cropping_and_distortion_scanned(
            kps_c, un_c, cr_c, key, jnp.asarray(start, jnp.int32),
            config, h, w, use_pallas=use_pallas_lk(),
        )
        ratios.extend(float(x) for x in r[: stop - start])
        dists.extend(float(x) for x in d[: stop - start])
    return ratios, dists


def summarize(name, ratios, dists):
    import numpy as np

    d = np.asarray(dists)
    r = np.asarray(ratios)
    return {
        "source": name,
        "distortion_min": round(float(d.min()), 5),
        "distortion_argmin_frame": int(d.argmin()),
        "distortion_p5": round(float(np.percentile(d, 5)), 5),
        "distortion_p50": round(float(np.percentile(d, 50)), 5),
        "cropping_mean": round(float(r.mean()), 5),
        "frames_below_ref_min": None,  # filled by caller
    }


def main():
    clip = sys.argv[1]
    variant = sys.argv[2]
    unstab = read_frames(f"/root/reference/videos/{clip}/{clip}.m4v")
    golden = read_frames(
        f"/root/reference/videos/{clip}/stabilized-method-{variant}.m4v"
    )
    ours_path = f"/tmp/suite-{clip}-{variant}.m4v"
    if not os.path.exists(ours_path):
        print(f"missing {ours_path}: run scripts/run_suite.py {clip}")
        return 1
    ours_vid = read_frames(ours_path)

    t0 = time.time()
    entries = {}
    # ours tracker on our output (what SUITE_RESULTS.json reports)
    r, d = ours_per_frame(unstab, ours_vid)
    entries["ours_on_ours"] = summarize("our tracker / our output", r, d)
    ours_curve = d
    # ours tracker on the golden output (isolates estimator vs output)
    r, d = ours_per_frame(unstab, golden)
    entries["ours_on_golden"] = summarize("our tracker / golden output", r, d)
    # reference tracker on the golden output (the fixture's own estimator)
    r, d = reference_per_frame(unstab, golden)
    entries["reference_on_golden"] = summarize(
        "reference tracker / golden output", r, d
    )
    ref_min = entries["reference_on_golden"]["distortion_min"]
    import numpy as np

    for k, curve in (("ours_on_ours", ours_curve),):
        entries[k]["frames_below_ref_min"] = int(
            np.sum(np.asarray(curve) <= ref_min)
        )

    out = os.path.join(
        REPO, "tests", "fixtures", f"metric_frame_diff_{clip}_{variant}.json"
    )
    record = {
        "clip": clip,
        "variant": variant,
        "frames": len(unstab),
        "seconds": round(time.time() - t0, 1),
        **entries,
    }
    with open(out, "w") as f:
        json.dump(record, f, indent=1)
    print(json.dumps(record, indent=1))
    return 0


if __name__ == "__main__":
    sys.exit(main())
