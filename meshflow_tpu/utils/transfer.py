"""Device->host transfer helpers.

This environment's TPU tunnel moves uint8 arrays slower than 32-bit
dtypes; bitcasting to uint32 on device and viewing back as uint8 on the
host restores full transfer speed (measured 37 MB/s vs 19 MB/s raw u8,
``scripts/probe_d2h.py``).

Layout hazard (round-3 postmortem): an out-of-jit ``x.reshape(-1)`` on a
u8 NHWC device array compiles a standalone program whose canonical
operand layout pads the minor dim 3 -> 128 lanes — a 42.7x-padded
relayout copy (15.8 GB at ``u8[64,1080,1920,3]``) that OOMs the chip
(``/tmp/tpu_queue/bench_1080p.log``, round 3).  Every helper here must
therefore avoid full linearization at program boundaries: scalar syncs
use ``lax.slice`` (measured zero HBM delta at the failing shape,
``scripts/probe_sync.py``), and the u8 pack merges only trailing dims
inside a single jitted program.
"""

from __future__ import annotations

import functools

import numpy as np

import jax
import jax.numpy as jnp


def sync(*arrays) -> None:
    """Block until the computations producing ``arrays`` have executed.

    On this environment's TPU tunnel ``block_until_ready()`` returns
    before execution finishes; only a data pull synchronizes.  Pulling
    one scalar (4 bytes) via ``lax.slice`` is enough, costs only the
    round-trip latency, and — unlike ``reshape(-1)[0]`` — compiles to a
    slice program with no padded relayout of the operand.
    """
    for x in arrays:
        if isinstance(x, jnp.ndarray) and x.size:
            corner = jax.lax.slice(
                x, (0,) * x.ndim, (1,) * x.ndim
            )
            jax.device_get(corner)


@functools.lru_cache(maxsize=64)
def _pack_fn(shape: tuple, split: int):
    """Jitted u8 -> u32 pack merging only dims ``split:`` (whose product
    is a multiple of 4), keeping leading dims intact so XLA never
    linearizes the whole array through a canonically-tiled temp."""
    lead = shape[:split]
    merged = int(np.prod(shape[split:], dtype=np.int64))

    @jax.jit
    def pack(a):
        rows = a.reshape(*lead, merged // 4, 4)
        return jax.lax.bitcast_convert_type(rows, jnp.uint32)

    return pack


def device_to_host_u8(x: jnp.ndarray) -> np.ndarray:
    """Fetch a uint8 device array as numpy via a uint32 bitcast.

    Finds the shortest (minor-most) dim suffix whose element count is a
    multiple of 4 — preserving as many leading dims as possible — and
    bitcasts groups of 4 bytes along it inside one jitted program.
    Arrays with no such suffix (or tiny ones) fall back to a plain pull.
    """
    assert x.dtype == jnp.uint8
    shape = tuple(int(d) for d in x.shape)
    if x.size < (1 << 16):
        return np.asarray(x)
    split = None
    suffix = 1
    for i in range(len(shape) - 1, -1, -1):
        suffix *= shape[i]
        if suffix % 4 == 0:
            split = i
            break
    if split is None:
        return np.asarray(x)
    packed = _pack_fn(shape, split)(x)
    host = np.asarray(packed)
    return host.view(np.uint8).reshape(shape)
