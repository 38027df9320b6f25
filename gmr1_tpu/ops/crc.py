"""GMR-1 CRCs (ETSI TS 101 376-5-3 §4.3) as GF(2) matrix ops.

The reference defines three codes (src/l1/crc.c:38-63) and delegates the
bit-serial computation to libosmocore's crcgen.  A CRC with init=0 and
zero final XOR is a linear map over GF(2), so the TPU-native form
precomputes, per (polynomial, message length), the generator matrix
A[msg_len, crc_bits] with A[i] = crc(unit_i), and evaluates batched CRCs
as (bits @ A) mod 2 — an MXU matmul instead of a serial LFSR.
"""

from __future__ import annotations

from dataclasses import dataclass
from functools import lru_cache

import jax.numpy as jnp
import numpy as np


@dataclass(frozen=True)
class CrcCode:
    bits: int
    poly: int  # without the implicit top bit


# Reference src/l1/crc.c:38-63
CRC8 = CrcCode(bits=8, poly=0x9B)    # g8  = D8+D7+D4+D3+D+1
CRC12 = CrcCode(bits=12, poly=0x80F)  # g12 = D12+D11+D3+D2+D+1
CRC16 = CrcCode(bits=16, poly=0x1021)  # g16 = D16+D12+D5+1


def crc_bits_serial(code: CrcCode, bits: np.ndarray) -> np.ndarray:
    """Host bit-serial CRC over an unpacked bit array, MSB-first LFSR.

    Matches libosmocore osmo_crcXXgen_compute_bits with init=0,
    remainder=0 (the parameters of all three GMR-1 codes).
    """
    reg = 0
    top = 1 << (code.bits - 1)
    mask = (1 << code.bits) - 1
    for b in np.asarray(bits, dtype=np.uint8):
        fb = ((reg & top) != 0) ^ (b != 0)
        reg = (reg << 1) & mask
        if fb:
            reg ^= code.poly
    out = np.empty(code.bits, dtype=np.uint8)
    for i in range(code.bits):
        out[i] = (reg >> (code.bits - 1 - i)) & 1
    return out


@lru_cache(maxsize=None)
def _gen_matrix(bits: int, poly: int, msg_len: int) -> np.ndarray:
    code = CrcCode(bits=bits, poly=poly)
    a = np.zeros((msg_len, bits), dtype=np.uint8)
    # CRC of a unit vector e_i = remainder of x^(msg_len-1-i) * x^bits;
    # build it by running the serial LFSR once per position.
    eye = np.eye(msg_len, dtype=np.uint8)
    for i in range(msg_len):
        a[i] = crc_bits_serial(code, eye[i])
    return a


def crc_compute(code: CrcCode, bits, msg_len: int):
    """CRC over bits (..., msg_len) -> (..., code.bits), via GF(2) matmul."""
    a = jnp.asarray(_gen_matrix(code.bits, code.poly, msg_len), jnp.int32)
    x = jnp.asarray(bits, jnp.int32)[..., :msg_len]
    return (x @ a & 1).astype(jnp.uint8)


def crc_check(code: CrcCode, bits, msg_len: int, crc_in):
    """0 where the CRC matches, 1 where it fails (per batch element)."""
    calc = crc_compute(code, bits, msg_len)
    bad = jnp.any(calc != jnp.asarray(crc_in, jnp.uint8), axis=-1)
    return bad.astype(jnp.int32)
