#!/usr/bin/env python
"""Probe device->host u8 pull strategies at 1080p chunk scale.

device_to_host_u8's ``x.reshape(-1)`` has the same padded-relayout risk
as the round-3 sync() OOM.  Candidates:
  a) current: reshape(-1) on the device array outside jit
  b) jitted pack: reshape (N,H,W,3)->(N,H,W*3) inside a jit'd fn that
     bitcasts rows to u32 (layout change fused into the program)
  c) plain np.asarray(x) (no bitcast -- measures raw u8 wire speed)
"""

import json
import sys
import time

import numpy as np


def main():
    import jax
    import jax.numpy as jnp

    shape = (8, 1080, 1920, 3)  # one render chunk's worth
    host = np.random.randint(0, 255, shape, np.uint8)
    x = jnp.asarray(host)
    x.block_until_ready()
    n, h, w, c = shape

    def timeit(name, fn):
        t0 = time.perf_counter()
        try:
            out = fn()
            ok = bool(np.array_equal(np.asarray(out).reshape(shape), host))
            err = None
        except Exception as e:  # noqa: BLE001
            ok = False
            err = str(e)[:160]
        dt = time.perf_counter() - t0
        mb = np.prod(shape) / 1e6
        print(
            json.dumps(
                {
                    "step": name,
                    "ok": ok,
                    "seconds": round(dt, 3),
                    "MB_per_s": round(mb / dt, 2) if err is None else None,
                    "err": err,
                }
            ),
            flush=True,
        )

    @jax.jit
    def pack(a):
        rows = a.reshape(n, h, w * c)  # 5760 % 4 == 0
        return jax.lax.bitcast_convert_type(
            rows.reshape(n, h, (w * c) // 4, 4), jnp.uint32
        )

    def via_pack():
        packed = pack(x)
        hostv = np.asarray(packed)
        return hostv.view(np.uint8).reshape(shape)

    def via_old():
        from meshflow_tpu.utils.transfer import device_to_host_u8

        return device_to_host_u8(x)

    timeit("jitted_pack_u32", via_pack)
    timeit("jitted_pack_u32_warm", via_pack)
    timeit("plain_np_asarray", lambda: np.asarray(x))
    timeit("old_device_to_host_u8", via_old)
    return 0


if __name__ == "__main__":
    sys.exit(main())
