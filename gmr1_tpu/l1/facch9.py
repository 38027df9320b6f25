"""FACCH9 channel coder (reference src/l1/facch9.c).

38-byte L2 in one NT9 burst: 300 bits + CRC16 -> K=5 r=1/2 conv
(len 316, flush) -> 640 coded bits interleaved N=80 inside a 648-bit
field with 4+4 zero pad (facch9.c:76-78) -> scramble -> SACCH(10) mux at
52 -> cipher -> status(4) mux at 52 -> 662 burst bits.
"""

from __future__ import annotations

import jax.numpy as jnp

from ..ops import bits, conv, crc, interleave, scramble, viterbi

CODE = conv.K5_12
MSG_BITS = 300
CONV_LEN = 316
EBITS = 662
IL_N = 80


def encode(l2, bits_sacch, bits_status, ciph=None):
    """(l2 (...,38)B, sacch (...,10), status (...,4)) -> (..., 662)."""
    u = bits.unpack_bits(l2, MSG_BITS)
    c16 = crc.crc_compute(crc.CRC16, u, MSG_BITS)
    uu = jnp.concatenate([u, c16], axis=-1)
    enc = conv.encode(CODE, uu)  # 640
    zeros = jnp.zeros((*enc.shape[:-1], 4), enc.dtype)
    epp = jnp.concatenate(
        [zeros, interleave.interleave_intra(enc, IL_N), zeros], axis=-1
    )
    x = scramble.scramble_ubit(epp)
    my = jnp.concatenate(
        [x[..., :52], jnp.asarray(bits_sacch, x.dtype), x[..., 52:648]], axis=-1
    )
    if ciph is not None:
        my = my ^ jnp.asarray(ciph, my.dtype)
    return jnp.concatenate(
        [my[..., :52], jnp.asarray(bits_status, my.dtype), my[..., 52:658]],
        axis=-1,
    )


def decode(ebits, ciph=None):
    """Soft (..., 662) -> (l2, sacch (...,10), status (...,4), crc, metric)."""
    e = jnp.asarray(ebits, jnp.float32)
    bits_status = (e[..., 52:56] < 0).astype(jnp.uint8)
    my = jnp.concatenate([e[..., :52], e[..., 56:662]], axis=-1)
    if ciph is not None:
        my = my * (1.0 - 2.0 * jnp.asarray(ciph, jnp.float32))
    bits_sacch = my[..., 52:62]
    x = jnp.concatenate([my[..., :52], my[..., 62:658]], axis=-1)
    epp = scramble.scramble_sbit(x)
    c = interleave.deinterleave_intra(epp[..., 4:644], IL_N)
    u, metric = viterbi.decode(CODE, c, CONV_LEN)
    bad = crc.crc_check(crc.CRC16, u[..., :MSG_BITS], MSG_BITS,
                        u[..., MSG_BITS:CONV_LEN])
    l2 = bits.pack_bits(u[..., :MSG_BITS], 38)
    return l2, bits_sacch, bits_status, bad, metric
