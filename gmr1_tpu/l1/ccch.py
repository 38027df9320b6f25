"""CCCH channel coder (reference src/l1/ccch.c).

Same chain as BCCH but the 424 interleaved bits sit inside a 432-bit
field with 4 zero pad bits at each end (ccch.c:68-69,96), all scrambled.
"""

from __future__ import annotations

import jax.numpy as jnp

from ..ops import bits, conv, crc, interleave, scramble, viterbi

CODE = conv.K5_12
MSG_BITS = 192
CONV_LEN = 208
EBITS = 432
IL_N = 53


def encode(l2):
    """L2 bytes (..., 24) -> hard burst bits (..., 432)."""
    u = bits.unpack_bits(l2, MSG_BITS)
    c = crc.crc_compute(crc.CRC16, u, MSG_BITS)
    uu = jnp.concatenate([u, c], axis=-1)
    enc = conv.encode(CODE, uu)
    ep_core = interleave.interleave_intra(enc, IL_N)
    zeros = jnp.zeros((*ep_core.shape[:-1], 4), ep_core.dtype)
    ep = jnp.concatenate([zeros, ep_core, zeros], axis=-1)
    return scramble.scramble_ubit(ep)


def decode(ebits):
    """Soft burst bits (..., 432) -> (l2 (...,24), crc_fail, metric)."""
    ep = scramble.scramble_sbit(jnp.asarray(ebits, jnp.float32))
    c = interleave.deinterleave_intra(ep[..., 4:428], IL_N)
    u, metric = viterbi.decode(CODE, c, CONV_LEN)
    bad = crc.crc_check(crc.CRC16, u[..., :MSG_BITS], MSG_BITS,
                        u[..., MSG_BITS:CONV_LEN])
    l2 = bits.pack_bits(u[..., :MSG_BITS], 24)
    return l2, bad, metric
