#!/usr/bin/env python
"""Probe device-sync strategies on big tiled-layout u8 arrays.

Round-3 postmortem: sync()'s ``x.reshape(-1)[0]`` on u8[64,1080,1920,3]
compiled a program whose canonical parameter layout pads the minor dim
3 -> 128 lanes (42.7x, 15.8 GB) and OOMed the chip.  This probe measures,
for each candidate strategy, whether it compiles/runs at all on the
full-size array and what HBM it costs.
"""

import json
import sys
import time

import numpy as np


def hbm_used(dev):
    stats = dev.memory_stats() or {}
    return stats.get("bytes_in_use", -1)


def main():
    import jax
    import jax.numpy as jnp

    dev = jax.devices()[0]
    print("device:", dev, flush=True)
    shape = (64, 1080, 1920, 3)
    host = np.zeros(shape, np.uint8)
    base = hbm_used(dev)
    t0 = time.perf_counter()
    x = jnp.asarray(host)
    x.block_until_ready()
    t_put = time.perf_counter() - t0
    resident = hbm_used(dev) - base
    print(
        json.dumps(
            {
                "step": "device_put",
                "seconds": round(t_put, 3),
                "resident_bytes": resident,
                "unpadded_bytes": int(np.prod(shape)),
            }
        ),
        flush=True,
    )

    def try_strategy(name, fn):
        t0 = time.perf_counter()
        try:
            fn(x)
            ok = True
            err = None
        except Exception as e:  # noqa: BLE001
            ok = False
            err = str(e)[:200]
        dt = time.perf_counter() - t0
        print(
            json.dumps(
                {
                    "step": name,
                    "ok": ok,
                    "seconds": round(dt, 3),
                    "hbm_delta": hbm_used(dev) - base - resident,
                    "err": err,
                }
            ),
            flush=True,
        )

    # 1. block_until_ready only (docstring claims it returns early on the
    #    tunnel -- re-measure: if the put above took ~real wire time, this
    #    is the cheapest correct sync).
    try_strategy("block_until_ready", lambda a: a.block_until_ready())
    # 2. indexed scalar read (dynamic-slice program; parameter layout?)
    try_strategy(
        "indexed_scalar", lambda a: jax.device_get(a[0, 0, 0, 0])
    )
    # 3. lax.slice then pull
    try_strategy(
        "lax_slice",
        lambda a: jax.device_get(
            jax.lax.slice(a, (0, 0, 0, 0), (1, 1, 1, 1))
        ),
    )
    # 4. the round-3 failing strategy, for the record (expected OOM):
    try_strategy(
        "reshape_flat_scalar",
        lambda a: jax.device_get(a.reshape(-1)[0].astype(jnp.float32)),
    )
    return 0


if __name__ == "__main__":
    sys.exit(main())
