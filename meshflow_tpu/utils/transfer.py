"""Device->host transfer helpers.

This environment's TPU tunnel moves uint8 arrays ~180x slower than 32-bit
dtypes (measured 0.17MB/s vs 32MB/s).  Bitcasting to uint32 on device and
viewing back as uint8 on the host restores full transfer speed with zero
copies of extra data.
"""

from __future__ import annotations

import numpy as np

import jax
import jax.numpy as jnp


def sync(*arrays) -> None:
    """Block until the computations producing ``arrays`` have executed.

    On this environment's TPU tunnel ``block_until_ready()`` returns before
    execution finishes; only a data pull synchronizes.  Pulling one scalar
    (4 bytes) is enough and costs only the round-trip latency.
    """
    for x in arrays:
        if isinstance(x, jnp.ndarray) and x.size:
            jax.device_get(x.reshape(-1)[0].astype(jnp.float32))


def device_to_host_u8(x: jnp.ndarray) -> np.ndarray:
    """Fetch a uint8 device array as numpy via a uint32 bitcast."""
    assert x.dtype == jnp.uint8
    shape = x.shape
    total = int(np.prod(shape))
    pad = (-total) % 4
    flat = x.reshape(-1)
    if pad:
        flat = jnp.concatenate([flat, jnp.zeros((pad,), jnp.uint8)])
    packed = jax.lax.bitcast_convert_type(
        flat.reshape(-1, 4), jnp.uint32
    )
    host = np.asarray(packed)
    out = host.view(np.uint8).reshape(-1)[:total]
    return out.reshape(shape)
