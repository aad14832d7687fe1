"""Device-side bit packing: (..., 8n) 0/1 -> (..., n) uint8, MSB-first.

Decoded bits leave the device as packed bytes (8x less host transfer and
no host-side np.packbits on the hot path).  One tiny matmul with the
powers-of-two vector; matches np.packbits exactly (tested).
"""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np

_POW2 = np.array([128, 64, 32, 16, 8, 4, 2, 1], dtype=np.int32)


def pack_bits(bits: jnp.ndarray) -> jnp.ndarray:
    """(..., 8n) uint8 0/1 bits -> (..., n) uint8 bytes, MSB first."""
    *lead, n = bits.shape
    if n % 8:
        raise ValueError(f"bit count {n} not a multiple of 8")
    grouped = bits.reshape(*lead, n // 8, 8).astype(jnp.int32)
    return jnp.sum(grouped * jnp.asarray(_POW2), axis=-1).astype(jnp.uint8)
