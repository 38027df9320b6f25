"""BCCH channel coder (reference src/l1/bcch.c, spec TS 101 376-5-3).

24-byte L2 <-> 424 burst bits:
  192 data bits + CRC16 -> K=5 r=1/2 conv (len 208, flush) ->
  intra-interleave N=53 -> scramble.
"""

from __future__ import annotations

import jax.numpy as jnp

from ..ops import bits, conv, crc, interleave, scramble, viterbi

CODE = conv.K5_12
MSG_BITS = 192
CONV_LEN = 208
EBITS = 424
IL_N = 53


def encode(l2):
    """L2 bytes (..., 24) -> hard burst bits (..., 424)."""
    u = bits.unpack_bits(l2, MSG_BITS)
    c = crc.crc_compute(crc.CRC16, u, MSG_BITS)
    uu = jnp.concatenate([u, c], axis=-1)
    enc = conv.encode(CODE, uu)
    ep = interleave.interleave_intra(enc, IL_N)
    return scramble.scramble_ubit(ep)


def decode(ebits):
    """Soft burst bits (..., 424) -> (l2 (...,24), crc_fail (...,), metric).

    crc_fail is 0 on success per batch element (reference decode
    contract, bcch.c:84-103).
    """
    ep = scramble.scramble_sbit(jnp.asarray(ebits, jnp.float32))
    c = interleave.deinterleave_intra(ep, IL_N)
    u, metric = viterbi.decode(CODE, c, CONV_LEN)
    bad = crc.crc_check(crc.CRC16, u[..., :MSG_BITS], MSG_BITS,
                        u[..., MSG_BITS:CONV_LEN])
    l2 = bits.pack_bits(u[..., :MSG_BITS], 24)
    return l2, bad, metric
