"""Pixel-chunked evaluation — the reference's split_input / merge_output
(reference utils/general.py:28-58) as a jit-friendly lax.map.

High-spp evaluation (diffuse 1024 / specular 256 per configs/test.conf:10)
would materialize [98k px x 1024 spp] SoA intermediates in one call —
several GB.  `map_chunked` runs the shading closure over fixed-size pixel
chunks inside one jitted computation, bounding peak memory to a single
chunk's intermediates while keeping everything on device.
"""

from __future__ import annotations

from typing import Callable, Tuple

import jax
import jax.numpy as jnp


def map_chunked(
    fn: Callable,
    args: Tuple[jnp.ndarray, ...],
    chunk: int,
):
    """Apply `fn` over leading-axis chunks of `args` and concatenate.

    Args:
        fn: takes the tuple of per-chunk arrays ([chunk, ...] each) and
            returns a tuple of [chunk, ...] arrays.  Closure over unchunked
            values (params, pyramids, scene constants) is fine.
        args: arrays sharing leading dimension B.
        chunk: pixels per chunk; B is zero-padded up to a multiple.
    Returns:
        tuple of [B, ...] outputs.
    """
    b = args[0].shape[0]
    pad = (-b) % chunk

    def prep(x):
        if pad:
            x = jnp.concatenate(
                [x, jnp.zeros((pad,) + x.shape[1:], x.dtype)]
            )
        return x.reshape(-1, chunk, *x.shape[1:])

    stacked = tuple(prep(x) for x in args)
    outs = jax.lax.map(lambda a: fn(a), stacked)
    return tuple(x.reshape(-1, *x.shape[2:])[:b] for x in outs)
