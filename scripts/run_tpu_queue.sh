#!/bin/bash
# Unattended TPU bench queue for this environment's tunneled chip.
#
# The axon tunnel goes down for hours at a time (jax.devices() hangs
# rather than erroring).  This runner waits for the tunnel to answer a
# bounded probe, then runs the round's blocked benchmarks one at a time
# (the chip is shared: never two timed jobs at once), logging each to
# /tmp/tpu_queue/<step>.log and appending one status line per step to
# /tmp/tpu_queue/status.txt.
#
# Usage: bash scripts/run_tpu_queue.sh   (idempotent)
#
# Resume markers are CONTENT-HASHED (round-4 verdict: a stale .ok let a
# kernel rewrite inherit the previous kernel's green).  Each completed
# step records the sha256 of the source tree it validated in
# /tmp/tpu_queue/<step>.srchash; a step is skipped only when its
# artifact exists AND the recorded hash matches the current tree.  Any
# edit under meshflow_tpu/, native/, or scripts/ therefore re-runs
# every step.  FORCE=1 re-runs regardless.

set -u
cd "$(dirname "$0")/.."
mkdir -p /tmp/tpu_queue
STATUS=/tmp/tpu_queue/status.txt
note() { echo "[$(date -u +%H:%M:%S)] $*" | tee -a "$STATUS"; }

# Source-tree hash: everything a step's result can depend on.
SRC_HASH=$(find meshflow_tpu native scripts bench.py -type f \
             \( -name '*.py' -o -name '*.cpp' -o -name '*.h' -o -name '*.sh' \) \
             -print0 | sort -z | xargs -0 sha256sum | sha256sum | cut -d' ' -f1)
note "queue start (src $SRC_HASH)"

# 1. Wait for the tunnel: a fresh process listing devices answers in
# seconds when healthy and hangs when the tunnel is down.
while true; do
  if timeout 180 python - <<'EOF' >/tmp/tpu_queue/probe.log 2>&1
import jax
d = jax.devices()
assert d and d[0].platform != "cpu", d
print(d)
EOF
  then
    note "tunnel UP: $(tail -1 /tmp/tpu_queue/probe.log)"
    break
  else
    note "tunnel still down; sleeping 300s"
    sleep 300
  fi
done

run_step() {
  local name="$1" tmo="$2" artifact="$3"; shift 3
  local hashfile="/tmp/tpu_queue/$name.srchash"
  if [ "${FORCE:-0}" != 1 ] && [ -n "$artifact" ] && [ -e "$artifact" ] \
     && [ -e "$hashfile" ] && [ "$(cat "$hashfile")" = "$SRC_HASH" ]; then
    note "SKIP $name (artifact $artifact matches src $SRC_HASH)"
    return 0
  fi
  note "START $name"
  if timeout "$tmo" "$@" >"/tmp/tpu_queue/$name.log" 2>&1; then
    note "OK    $name"
    echo "$SRC_HASH" > "$hashfile"
    rm -f "QUEUE_FAILURES/${name}_FAILED.json"
  else
    local rc=$?
    note "FAIL  $name (rc=$rc) — see /tmp/tpu_queue/$name.log"
    rm -f "$hashfile"
    # Repo-visible failure evidence (round-3 verdict: /tmp-only logs left
    # the judge unable to tell FAILED from never-ran).
    mkdir -p QUEUE_FAILURES
    python - "$name" "$rc" <<'EOF'
import json, sys, time
name, rc = sys.argv[1], int(sys.argv[2])
try:
    with open(f"/tmp/tpu_queue/{name}.log") as f:
        tail = f.read()[-4000:]
except OSError:
    tail = "(no log)"
with open(f"QUEUE_FAILURES/{name}_FAILED.json", "w") as f:
    json.dump({
        "step": name,
        "rc": rc,
        "utc": time.strftime("%Y-%m-%dT%H:%M:%SZ", time.gmtime()),
        "log_tail": tail,
    }, f, indent=1)
EOF
  fi
}

# 2. The round-5 queue.  Kernel-parity gates first (nothing downstream
# may measure an unvalidated kernel), then the judged artifacts.
run_step lk_chip_parity 3600 /tmp/tpu_queue/lk_chip_parity.ok \
  bash -c 'python scripts/test_lk_pallas_chip.py && touch /tmp/tpu_queue/lk_chip_parity.ok'
run_step bmap_parity  3600 /tmp/tpu_queue/bmap_parity.ok \
  bash -c 'python scripts/test_bmap_chip.py && touch /tmp/tpu_queue/bmap_parity.ok'
run_step bench_self    3600 "" \
  python bench.py
run_step make_1080p_clip 1800 bench_data/video-1-1080p.mp4 \
  python scripts/make_bench_clips.py 1080p
run_step bench_1080p   7200 BENCH_1080P.json \
  python scripts/bench_1080p.py --out BENCH_1080P.json
# Variance fixtures are re-measured with the current estimator and
# committed BEFORE the suite run they gate (round-4 verdict task 4:
# pre-registration; a same-commit fixture refresh bounds nothing).
run_step variance_refresh 14400 tests/fixtures/our_seed_variance_video-10_constant-high.json \
  bash scripts/refresh_variance.sh
run_step suite_refresh 14400 SUITE_RESULTS.json \
  bash -c 'python scripts/run_suite.py && JAX_PLATFORMS=cpu python -m pytest tests/test_suite_results.py::test_suite_parity_gates tests/test_suite_results.py::test_suite_faster_than_reference -q'
# Pixel parity vs the reference's 28 golden videos: pure host
# post-processing of the suite outputs in /tmp/suite-*.m4v.
run_step golden_psnr 7200 GOLDEN_PSNR.json \
  bash -c 'python scripts/golden_psnr.py && JAX_PLATFORMS=cpu python -m pytest tests/test_suite_results.py::test_golden_video_pixel_parity -q'
run_step bench_online  2400 BENCH_ONLINE.json \
  python scripts/bench_online.py 120 --out BENCH_ONLINE.json
run_step bench_1080p_mesh64 10800 BENCH_1080P_MESH64.json \
  python scripts/bench_1080p.py --mesh64 --out BENCH_1080P_MESH64.json
run_step make_4k_clip 1800 bench_data/video-1-4k.mp4 \
  python scripts/make_bench_clips.py 4k
run_step bench_4k 7200 BENCH_4K.json \
  python scripts/bench_4k.py --out BENCH_4K.json

note "queue done"
