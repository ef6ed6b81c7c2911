#!/usr/bin/env python
"""4K multi-chip smoke on the virtual 8-device CPU mesh (BASELINE.md 4K60).

No multi-chip hardware exists in this environment, so this proves the
north-star geometry the same way the driver's dryrun does — 8 virtual CPU
devices — but at full 3840x2160 frames and 4K-scale solver lengths:

  part A: 4K frames through stabilize_sharded (frame-sharded pixel
          path: halo exchange, distributed prefix sum, sharded render +
          metrics) — exercises the render chunk budgets and the
          _ONEHOT_BUDGET cell-lookup chunking at 8.3 MP.  Runs 2 frames
          on a 2-device submesh (1 frame per shard): XLA-CPU executes
          shards as concurrent host threads and materializes far more
          per-frame workspace than the TPU path (measured on this
          125 GB single-core host: 2 frames/shard x 4 shards passed
          95 GB RSS; 1 frame/shard x 4 shards hit 84 GB and died in an
          all-gather rendezvous timeout under memory pressure), so the
          smoke keeps the minimum sharded geometry that still exercises
          the halo exchange and distributed prefix sum.  The 8-device
          geometry itself is covered by part B and the driver dryrun.
  part B: Omega-halo sharded Jacobi vs replicated solver at F=3600
          (one minute of 4K60) on 4K-magnitude displacements —
          bit-identical check at north-star sequence length.

Records wall time and peak RSS.  Writes SMOKE_4K.json at the repo root
(a committed evidence artifact, like SUITE_RESULTS.json).
"""

import json
import os
import resource
import sys
import time

REPO = os.path.join(os.path.dirname(os.path.abspath(__file__)), "..")
sys.path.insert(0, REPO)

os.environ["JAX_PLATFORMS"] = "cpu"
os.environ["MESHFLOW_PLATFORM"] = "cpu"  # axon plugin ignores JAX_PLATFORMS
os.environ["XLA_FLAGS"] = (
    os.environ.get("XLA_FLAGS", "")
    + " --xla_force_host_platform_device_count=8"
    # This host has one core: shard threads reach collectives minutes apart
    # under 4K-scale work, tripping XLA-CPU's default 40 s rendezvous
    # termination. Raise both rendezvous deadlines; real multi-chip TPU
    # shards run concurrently, so the skew is an artifact of the smoke host.
    + " --xla_cpu_collective_call_warn_stuck_timeout_seconds=120"
    + " --xla_cpu_collective_call_terminate_timeout_seconds=1200"
    + " --xla_cpu_collective_timeout_seconds=1200"
)
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/jax_cache_meshflow_4k")

import numpy as np  # noqa: E402

import meshflow_tpu  # noqa: E402,F401
import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402


def synthetic_4k(num_frames: int, h=2160, w=3840, seed=0):
    """Jittered moving checkerboard: trackable structure at 4K."""
    rng = np.random.default_rng(seed)
    yy, xx = np.meshgrid(np.arange(h), np.arange(w), indexing="ij")
    frames = np.empty((num_frames, h, w, 3), np.uint8)
    for t in range(num_frames):
        dx = 6 * t + int(rng.integers(-8, 9))
        dy = 3 * t + int(rng.integers(-8, 9))
        base = (((yy + dy) // 120 + (xx + dx) // 120) % 2) * 160 + 40
        noise = rng.integers(0, 40, size=(h // 8, w // 8))
        noise = np.kron(noise, np.ones((8, 8), dtype=np.int64))
        img = np.clip(base + noise, 0, 255).astype(np.uint8)
        frames[t] = img[..., None]
    return frames


def main():
    from meshflow_tpu.config import MeshFlowConfig
    from meshflow_tpu.parallel.pipeline import (
        frame_sharding,
        make_mesh,
        stabilize_sharded,
    )
    from meshflow_tpu.solver.jacobi import jacobi_smooth

    record = {"devices": len(jax.devices())}
    assert record["devices"] == 8, jax.devices()

    # ---- part A: sharded pixel path on 4K frames (2-device submesh) ----
    import threading

    def _rss_gb():
        return resource.getrusage(resource.RUSAGE_SELF).ru_maxrss / (1 << 20)

    stop = threading.Event()

    def _watch():
        while not stop.wait(15.0):
            print(f"  [rss {_rss_gb():.1f} GB]", flush=True)

    threading.Thread(target=_watch, daemon=True).start()
    config = MeshFlowConfig(optimization_num_iterations=20)
    frames = synthetic_4k(2)
    mesh2 = make_mesh(jax.devices()[:2])
    mesh = make_mesh()
    t0 = time.time()
    frames_dev = jax.device_put(jnp.asarray(frames), frame_sharding(mesh2))
    print(f"uploaded: rss {_rss_gb():.1f} GB", flush=True)
    cropped, crop, cr, ds, ss = stabilize_sharded(
        frames_dev, jax.random.PRNGKey(0), config, 2160, 3840, mesh2, 0
    )
    cropped_np = np.asarray(cropped)
    stop.set()
    record["part_a"] = {
        "frames": 2,
        "devices": 2,
        "resolution": "3840x2160",
        "seconds": round(time.time() - t0, 1),
        "crop": [int(c) for c in np.asarray(crop)],
        "metrics": [float(cr), float(ds), float(ss)],
        "output_shape": list(cropped_np.shape),
    }
    assert cropped_np.shape == (2, 2160, 3840, 3)
    assert np.isfinite(record["part_a"]["metrics"]).all()
    del frames, frames_dev, cropped, cropped_np

    # ---- part B: halo solver at F=3600 (one 4K60 minute) ---------------
    from meshflow_tpu.solver.jacobi import jacobi_smooth_sharded
    from jax.sharding import PartitionSpec as P

    F, vr, vc = 3600, 17, 17
    rng = np.random.default_rng(1)
    # 4K-magnitude displacements: tens of pixels of shake
    du = jnp.asarray(
        np.cumsum(rng.normal(0, 12.0, size=(F, vr, vc, 2)), axis=0),
        jnp.float32,
    )
    lambdas = jnp.asarray(rng.uniform(0.5, 100.0, size=(F,)), jnp.float32)
    t0 = time.time()
    dense = jacobi_smooth(du, lambdas, 10, 100)

    def solve_local(du_local, lam):
        return jacobi_smooth_sharded(du_local, lam, 10, 100, "frames", 8)

    sharded_fn = jax.jit(
        jax.shard_map(
            solve_local,
            mesh=mesh,
            in_specs=(P("frames"), P()),
            out_specs=P("frames"),
            check_vma=False,
        )
    )
    sharded = sharded_fn(jax.device_put(du, frame_sharding(mesh)), lambdas)
    max_abs = float(jnp.max(jnp.abs(dense - sharded)))
    record["part_b"] = {
        "frames": F,
        "solver": "halo vs replicated",
        "seconds": round(time.time() - t0, 1),
        "max_abs_diff_px": max_abs,
    }
    assert max_abs == 0.0, max_abs

    record["peak_rss_gb"] = round(
        resource.getrusage(resource.RUSAGE_SELF).ru_maxrss / (1 << 20), 2
    )
    out = os.path.join(REPO, "SMOKE_4K.json")
    with open(out, "w") as f:
        json.dump(record, f, indent=1)
    print(json.dumps(record, indent=1))
    return 0


if __name__ == "__main__":
    sys.exit(main())
