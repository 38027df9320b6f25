"""Packed-byte <-> unpacked-bit conversion, MSB first.

TPU-native replacement for libosmocore's osmo_pbit2ubit{,_ext} /
osmo_ubit2pbit{,_ext} (call sites e.g. reference src/l1/bcch.c:67,100,
src/l1/rach.c:91-92,192-193).  Works on arbitrary leading batch axes;
everything is a reshape + shift, so it fuses into adjacent XLA ops.

Bit conventions used throughout the framework (matching osmocom):
  hard bit ("ubit"): uint8 0/1
  soft bit ("sbit"): int8 in [-127, 127]; positive = bit 0, negative = bit 1
"""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np

_SHIFTS = np.arange(7, -1, -1, dtype=np.uint8)  # MSB first


def unpack_bits(data, nbits: int | None = None):
    """Unpack bytes (..., B) -> bits (..., 8*B or nbits), MSB first."""
    data = jnp.asarray(data, dtype=jnp.uint8)
    bits = (data[..., :, None] >> jnp.asarray(_SHIFTS)) & 1
    bits = bits.reshape(*data.shape[:-1], data.shape[-1] * 8)
    if nbits is not None:
        bits = bits[..., :nbits]
    return bits


def pack_bits(bits, nbytes: int | None = None):
    """Pack bits (..., N) -> bytes (..., ceil(N/8)), MSB first.

    Bits beyond the input length are treated as zero (matching the
    reference's behaviour of leaving trailing nibbles cleared, e.g.
    facch3.c:166-167 where l2[9]'s upper nibble is pre-zeroed).
    """
    bits = jnp.asarray(bits, dtype=jnp.uint8)
    n = bits.shape[-1]
    nb = (n + 7) // 8 if nbytes is None else nbytes
    pad = nb * 8 - n
    if pad:
        bits = jnp.pad(bits, [(0, 0)] * (bits.ndim - 1) + [(0, pad)])
    bits = bits.reshape(*bits.shape[:-1], nb, 8)
    return jnp.sum(bits << jnp.asarray(_SHIFTS), axis=-1).astype(jnp.uint8)


def unpack_bits_np(data: np.ndarray, nbits: int | None = None) -> np.ndarray:
    """NumPy twin of unpack_bits for host-side table building."""
    data = np.asarray(data, dtype=np.uint8)
    bits = np.unpackbits(data, axis=-1)
    if nbits is not None:
        bits = bits[..., :nbits]
    return bits


def pack_bits_np(bits: np.ndarray, nbytes: int | None = None) -> np.ndarray:
    bits = np.asarray(bits, dtype=np.uint8)
    n = bits.shape[-1]
    nb = (n + 7) // 8 if nbytes is None else nbytes
    pad = nb * 8 - n
    if pad:
        bits = np.pad(bits, [(0, 0)] * (bits.ndim - 1) + [(0, pad)])
    return np.packbits(bits, axis=-1)


def sbit_to_ubit(sbits):
    """Soft -> hard decision: negative soft value = bit 1 (osmocom sbit)."""
    return (jnp.asarray(sbits) < 0).astype(jnp.uint8)


def ubit_to_sbit(ubits):
    """Hard -> ideal soft: bit 0 -> +127, bit 1 -> -127."""
    u = jnp.asarray(ubits)
    return jnp.where(u != 0, -127, 127).astype(jnp.int8)
