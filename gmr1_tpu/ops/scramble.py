"""GMR-1 scrambling (ETSI TS 101 376-5-3 §4.9).

The reference (src/l1/scramb.c:39-52) clocks a 15-bit LFSR with feedback
h(D) = 1 + D + D^15 from seed 0x4d4b per output bit.  The sequence is a
fixed constant for any given length, so the TPU-native form precomputes
it once on the host and applies it as a vectorized sign-flip (soft bits)
or XOR (hard bits) — a pure elementwise op that XLA fuses into whatever
surrounds it.  No sequential work on device.
"""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np

_SEED = 0x4D4B
_MAX_LEN = 1024  # longest scrambled block in GMR-1 L1 is 658 (tch9.c)


def _gen_sequence(n: int) -> np.ndarray:
    """Host LFSR: b = (reg>>14 ^ reg) & 1; reg = (reg<<1)|b (scramb.c:48-49)."""
    reg = _SEED
    out = np.empty(n, dtype=np.uint8)
    for i in range(n):
        b = ((reg >> 14) ^ reg) & 1
        reg = ((reg << 1) | b) & 0xFFFF
        out[i] = b
    return out


_SEQ = _gen_sequence(_MAX_LEN)
_SIGN = np.where(_SEQ != 0, -1, 1).astype(np.int32)


def scramble_seq(n: int) -> np.ndarray:
    """The first n scramble bits (host constant)."""
    assert n <= _MAX_LEN
    return _SEQ[:n]


def scramble_ubit(bits):
    """XOR hard bits (..., N) with the scramble sequence."""
    bits = jnp.asarray(bits)
    n = bits.shape[-1]
    return bits ^ jnp.asarray(_SEQ[:n], dtype=bits.dtype)


def scramble_sbit(sbits):
    """Sign-flip soft bits (..., N) where the scramble bit is 1.

    Self-inverse, like the reference gmr1_scramble_sbit (scramb.c:64-73).
    Works for int8 osmocom sbits and float soft values alike.
    """
    sbits = jnp.asarray(sbits)
    n = sbits.shape[-1]
    return sbits * jnp.asarray(_SIGN[:n], dtype=sbits.dtype)
