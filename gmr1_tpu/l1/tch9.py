"""TCH9 data channel coder (reference src/l1/tch9.c).

2.4/4.8/9.6 kbit/s over NT9 bursts: mode-specific conv code + puncture
triple -> 648 bits -> intra-interleave N=81 -> inter-burst interleave
depth 3 (functional state) -> scramble -> SACCH(10)+status(4) mux ->
cipher.  No CRC; correctness is judged by conv metric alone.
"""

from __future__ import annotations

from dataclasses import dataclass
from functools import lru_cache

import jax
import jax.numpy as jnp
import numpy as np

from ..ops import bits, conv, interleave, puncture, scramble, viterbi
from ..ops.interleave import InterleaverState

IL_N = 81
INTER_DEPTH = 3
INTER_WIDTH = 648
EBITS = 662


@dataclass(frozen=True)
class Tch9Mode:
    name: str
    code: conv.ConvCode
    conv_len: int
    l2_bytes: int
    punct: tuple  # (main, pre, post, repeat)


MODE_2K4 = Tch9Mode("2k4", conv.K5_15, 144, 18,
                    ("k5_15_P23", "k5_15_P53", "k5_15_Ps53", 41))
MODE_4K8 = Tch9Mode("4k8", conv.K5_13, 240, 30,
                    ("k5_13_P25", "k5_13_P15", "k5_13_Ps15", 41))
MODE_9K6 = Tch9Mode("9k6", conv.K5_12, 480, 60,
                    ("k5_12_P23", "k5_12_P25", "k5_12_Ps25", 158))
MODES = {m.name: m for m in (MODE_2K4, MODE_4K8, MODE_9K6)}


@lru_cache(maxsize=None)
def _keep_idx(mode: Tch9Mode) -> np.ndarray:
    main, pre, post, repeat = mode.punct
    keep = puncture.keep_indices(
        mode.code.out_len(mode.conv_len), mode.code.n, main, pre, post, repeat
    )
    assert len(keep) == 648
    return keep


def interleaver_init(dtype=jnp.float32) -> InterleaverState:
    return interleave.interleaver_init(INTER_DEPTH, INTER_WIDTH, dtype=dtype)


def encode(l2, mode: Tch9Mode, bits_sacch, bits_status,
           il: InterleaverState, ciph=None):
    """One burst. Returns (new_il_state, bits_e (..., 662))."""
    u = bits.unpack_bits(l2, mode.conv_len)
    enc = conv.encode(mode.code, u)
    c = jnp.take(enc, jnp.asarray(_keep_idx(mode)), axis=-1)  # 648
    ep = interleave.interleave_intra(c, IL_N)
    il, epp = interleave.interleave_inter(il, ep)
    x = scramble.scramble_ubit(epp)
    my = jnp.concatenate(
        [x[..., :52], jnp.asarray(bits_sacch, x.dtype), x[..., 52:648]], axis=-1
    )
    if ciph is not None:
        my = my ^ jnp.asarray(ciph, my.dtype)
    e = jnp.concatenate(
        [my[..., :52], jnp.asarray(bits_status, my.dtype), my[..., 52:658]],
        axis=-1,
    )
    return il, e


def decode_frames(ebits, mode: Tch9Mode, il: InterleaverState, ciph=None,
                  valid=None):
    """Decode F chained bursts (F, ..., 662) in one call.

    Only the depth-3 deinterleaver ring is sequential across bursts —
    the FEC is not — so the per-frame scan carries just the ring
    (cheap gathers) and the Viterbi runs ONCE over the whole (F, ...)
    batch.  On TPU this cuts the sequential trellis steps F-fold vs
    per-burst decode (profiled 66%-of-step -> ~17% on the mixed
    transponder workload).  `il` may carry leading batch dims matching
    ebits[1:-1].  `valid` (F, ...) bool gates the ring per burst: where
    False the ring state is untouched and that output slot is garbage
    — the batched form of the receiver's "only feed TCH9 bursts"
    walk (gmr1_rx.c:321-347).  Returns (new_il, l2 (F, ..., l2_bytes),
    sacch, status, metric) — identical to sequential decode() calls on
    the valid bursts."""
    e = jnp.asarray(ebits, jnp.float32)
    bits_status = (e[..., 52:56] < 0).astype(jnp.uint8)
    my = jnp.concatenate([e[..., :52], e[..., 56:662]], axis=-1)
    if ciph is not None:
        my = my * (1.0 - 2.0 * jnp.asarray(ciph, jnp.float32))
    bits_sacch = my[..., 52:62]
    x = jnp.concatenate([my[..., :52], my[..., 62:658]], axis=-1)
    epp = scramble.scramble_sbit(x)

    deint = interleave.deinterleave_inter
    for _ in range(il.buf.ndim - 2):
        deint = jax.vmap(deint)
    if valid is None:
        il, ep = jax.lax.scan(deint, il, epp)
    else:
        il, ep = jax.lax.scan(
            lambda st, xv: deint(st, xv[0], xv[1]), il,
            (epp, jnp.asarray(valid)))

    c = interleave.deinterleave_intra(ep, IL_N)
    full = viterbi.depuncture(c, _keep_idx(mode),
                              mode.code.out_len(mode.conv_len))
    u, metric = viterbi.decode(mode.code, full, mode.conv_len)
    l2 = bits.pack_bits(u, mode.l2_bytes)
    return il, l2, bits_sacch, bits_status, metric


def decode(ebits, mode: Tch9Mode, il: InterleaverState, ciph=None):
    """One burst.  Returns (new_il, l2, sacch, status, metric).

    The l2 output corresponds to the burst INTER_DEPTH-1 frames ago once
    the interleaver has filled (reference semantics; tch9.c:167).
    """
    e = jnp.asarray(ebits, jnp.float32)
    bits_status = (e[..., 52:56] < 0).astype(jnp.uint8)
    my = jnp.concatenate([e[..., :52], e[..., 56:662]], axis=-1)
    if ciph is not None:
        my = my * (1.0 - 2.0 * jnp.asarray(ciph, jnp.float32))
    bits_sacch = my[..., 52:62]
    x = jnp.concatenate([my[..., :52], my[..., 62:658]], axis=-1)
    epp = scramble.scramble_sbit(x)
    il, ep = interleave.deinterleave_inter(il, epp)
    c = interleave.deinterleave_intra(ep, IL_N)
    full = viterbi.depuncture(c, _keep_idx(mode), mode.code.out_len(mode.conv_len))
    u, metric = viterbi.decode(mode.code, full, mode.conv_len)
    l2 = bits.pack_bits(u, mode.l2_bytes)
    return il, l2, bits_sacch, bits_status, metric
