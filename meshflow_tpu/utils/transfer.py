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
