"""FACCH3 channel coder (reference src/l1/facch3.c).

10-byte L2 over FOUR bursts: 76 bits + CRC16 -> K=5 r=1/4 conv
(len 92, flush) -> 384 coded bits split column-wise over 4 bursts of 96
(facch3.c:81-82) -> per burst: intra-interleave N=12, scramble, cipher,
8 status bits muxed in at position 22 -> 4 x 104 burst bits.
"""

from __future__ import annotations

from functools import lru_cache

import jax.numpy as jnp
import numpy as np

from ..ops import bits, conv, crc, interleave, scramble, viterbi

CODE = conv.K5_14
MSG_BITS = 76
CONV_LEN = 92
EBITS = 4 * 104


@lru_cache(maxsize=None)
def _split_idx() -> np.ndarray:
    # bits_cp[(i&3)*96 + (i>>2)] = bits_c[i]: burst b gets coded bits
    # with index i % 4 == b, in order.
    i = np.arange(384)
    dst = (i & 3) * 96 + (i >> 2)
    inv = np.empty(384, dtype=np.int32)
    inv[dst] = i
    return inv  # bits_cp = bits_c[inv]


def encode(l2, bits_s, ciph=None):
    """(l2 (...,10)B, status (...,32), ciph (...,384)|None) -> (..., 416)."""
    u = bits.unpack_bits(l2, MSG_BITS)
    c16 = crc.crc_compute(crc.CRC16, u, MSG_BITS)
    uu = jnp.concatenate([u, c16], axis=-1)
    enc = conv.encode(CODE, uu)  # (..., 384)
    cp = jnp.take(enc, jnp.asarray(_split_idx()), axis=-1)
    cp = cp.reshape(*cp.shape[:-1], 4, 96)
    ep = interleave.interleave_intra(cp, 12)
    xmy = scramble.scramble_ubit(ep)
    if ciph is not None:
        cb = jnp.asarray(ciph, xmy.dtype).reshape(*xmy.shape[:-2], 4, 96)
        xmy = xmy ^ cb
    s = jnp.asarray(bits_s, xmy.dtype).reshape(*xmy.shape[:-2], 4, 8)
    out = jnp.concatenate([xmy[..., :22], s, xmy[..., 22:96]], axis=-1)
    return out.reshape(*out.shape[:-2], EBITS)


def decode(ebits, ciph=None):
    """Soft bits (..., 416) -> (l2, bits_s (...,32), crc_fail, metric)."""
    e = jnp.asarray(ebits, jnp.float32).reshape(*jnp.shape(ebits)[:-1], 4, 104)
    bits_s = (e[..., 22:30] < 0).astype(jnp.uint8)
    bits_s = bits_s.reshape(*bits_s.shape[:-2], 32)
    xmy = jnp.concatenate([e[..., :22], e[..., 30:104]], axis=-1)
    if ciph is not None:
        cb = jnp.asarray(ciph, jnp.float32).reshape(*xmy.shape[:-2], 4, 96)
        xmy = xmy * (1.0 - 2.0 * cb)
    ep = scramble.scramble_sbit(xmy)
    cp = interleave.deinterleave_intra(ep, 12)
    cp = cp.reshape(*cp.shape[:-2], 384)
    c = cp[..., jnp.asarray(_split_idx().argsort())]  # inverse of split
    u, metric = viterbi.decode(CODE, c, CONV_LEN)
    bad = crc.crc_check(crc.CRC16, u[..., :MSG_BITS], MSG_BITS,
                        u[..., MSG_BITS:CONV_LEN])
    l2 = bits.pack_bits(u[..., :MSG_BITS], 10)
    return l2, bits_s, bad, metric
