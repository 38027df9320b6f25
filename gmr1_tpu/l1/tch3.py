"""TCH3 speech channel coder (reference src/l1/tch3.c).

Two 80-bit AMBE frames per burst.  Per frame: the first 48 bits go
through the K=7 tail-biting rate-1/2 code punctured P(1;2) to 72 coded
bits; the last 32 bits ride uncoded (tch3.c:82,178-179); a custom
104-bit permutation spreads them (tch3.c:84-90).  The two frames are
bit-multiplexed (mode m), scrambled, optionally ciphered, and 4 status
bits are inserted at position 52 to form the 212 burst bits.

Note: the reference's *encoder* passes its conv buffers in swapped order
(tch3.c:81 `osmo_conv_encode(code, bits_c, bits_d)` — input is the
uninitialized coded buffer), a latent bug in its TX-only path.  This
implementation encodes the documented chain; decode matches the
reference's RX path bit-for-bit.
"""

from __future__ import annotations

from functools import lru_cache

import jax.numpy as jnp
import numpy as np

from ..ops import bits, conv, puncture, scramble, viterbi

CODE = conv.TCH3_K7
CONV_LEN = 48
EBITS = 212


@lru_cache(maxsize=None)
def _keep_idx() -> np.ndarray:
    # 96 coded bits punctured P(1;2) -> 72 survivors
    return puncture.keep_indices(CODE.out_len(CONV_LEN), 2, "k5_12_P12")


@lru_cache(maxsize=None)
def _perm() -> tuple[np.ndarray, np.ndarray]:
    # kep = ij + 5*ii (ii<8) | ij + 4*ii + 8 (ii>=8), ii=kc%24, ij=kc/24
    kc = np.arange(104)
    ii, ij = kc % 24, kc // 24
    kep = np.where(ii < 8, ij + 5 * ii, ij + 4 * ii + 8).astype(np.int32)
    fwd = np.empty(104, dtype=np.int32)
    fwd[kep] = kc  # out[kep] = in[kc]  =>  out = in[fwd]
    return fwd, kep


def _mux_idx(m: int) -> np.ndarray:
    # position of (frame i, bit j) inside the 208-bit multiplexed block
    idx = np.empty((2, 104), dtype=np.int32)
    for i in range(2):
        j = np.arange(104)
        idx[i] = 104 * i + j if m else (j << 1) + i
    return idx


def encode(frame0, frame1, bits_s, ciph=None, m: int = 0):
    """(frames (...,10)B, status (...,4), cipher (...,208)|None) -> (...,212)."""
    fwd, _ = _perm()
    mux = _mux_idx(m)
    parts = []
    for i, frame in enumerate((frame0, frame1)):
        d = bits.unpack_bits(frame, 80)
        enc = conv.encode(CODE, d[..., :CONV_LEN])
        punct = jnp.take(enc, jnp.asarray(_keep_idx()), axis=-1)
        c = jnp.concatenate([punct, d[..., 48:80]], axis=-1)  # 104
        parts.append(jnp.take(c, jnp.asarray(fwd), axis=-1))
    epp = jnp.zeros((*parts[0].shape[:-1], 208), parts[0].dtype)
    epp = epp.at[..., jnp.asarray(mux[0])].set(parts[0])
    epp = epp.at[..., jnp.asarray(mux[1])].set(parts[1])
    xmy = scramble.scramble_ubit(epp)
    if ciph is not None:
        xmy = xmy ^ jnp.asarray(ciph, xmy.dtype)
    return jnp.concatenate(
        [xmy[..., :52], jnp.asarray(bits_s, xmy.dtype), xmy[..., 52:208]],
        axis=-1,
    )


def decode(ebits, ciph=None, m: int = 0):
    """Soft bits (..., 212) -> (frame0, frame1, bits_s, metrics (...,2))."""
    e = jnp.asarray(ebits, jnp.float32)
    bits_s = (e[..., 52:56] < 0).astype(jnp.uint8)
    xmy = jnp.concatenate([e[..., :52], e[..., 56:212]], axis=-1)
    if ciph is not None:
        xmy = xmy * (1.0 - 2.0 * jnp.asarray(ciph, jnp.float32))
    epp = scramble.scramble_sbit(xmy)
    _, kep = _perm()
    mux = _mux_idx(m)
    frames, metrics = [], []
    for i in range(2):
        ep = jnp.take(epp, jnp.asarray(mux[i]), axis=-1)
        c = jnp.take(ep, jnp.asarray(kep), axis=-1)  # undo permutation
        soft_coded = c[..., :72]
        full = viterbi.depuncture(soft_coded, _keep_idx(), CODE.out_len(CONV_LEN))
        d, metric = viterbi.decode(CODE, full, CONV_LEN)
        tail = (c[..., 72:104] < 0).astype(jnp.uint8)
        frames.append(bits.pack_bits(jnp.concatenate([d, tail], axis=-1), 10))
        metrics.append(metric)
    return frames[0], frames[1], bits_s, jnp.stack(metrics, axis=-1)
