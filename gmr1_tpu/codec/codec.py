"""Public AMBE codec API (reference src/codec/codec.c + ambe.c).

Functional, batched, scan-based: decoder state is an explicit pytree,
one 10-byte frame per channel per step produces 160 samples of 8 kHz
PCM.  Frame-type dispatch (speech / silence / tone, ambe.c:65-78) is
branch-free — all paths are computed and the per-channel result
selected — which is the SPMD form of the reference's switch and lets
one jitted kernel serve a whole batch of voice channels.

    state = codec.init(batch_shape)
    state, pcm = codec.decode_frames(state, frames)   # (B, T, 10) -> (B, T, 160)
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

from . import frame as F
from . import synth as S
from . import tone as TN


class CodecState(NamedTuple):
    sf_prev: F.Subframe
    synth: S.SynthState
    tone_phase_f1: jax.Array
    tone_phase_f2: jax.Array


def init(batch_shape=()) -> CodecState:
    return CodecState(
        sf_prev=F.init_subframe(batch_shape),
        synth=S.init_state(batch_shape),
        tone_phase_f1=jnp.zeros(batch_shape, jnp.float32),
        tone_phase_f2=jnp.zeros(batch_shape, jnp.float32))


def _decode_speech(state: CodecState, frames):
    """ambe_decode_speech (ambe.c:88-118): returns (state', pcm float)."""
    rp = F.unpack_raw(frames)
    sf0, sf1 = F.decode_params(rp, state.sf_prev)
    sf0 = F.expand(sf0)
    sf1 = F.expand(sf1)

    syn = state.synth
    syn, sf0 = S.enhance(syn, sf0)
    syn, a0 = S.audio(syn, sf0, state.sf_prev)
    syn, sf1 = S.enhance(syn, sf1)
    syn, a1 = S.audio(syn, sf1, sf0)

    pcm = jnp.concatenate([a0, a1], axis=-1)          # (..., 160)
    return state._replace(sf_prev=sf1, synth=syn), pcm


def decode_frame(state: CodecState, frames) -> tuple[CodecState, jax.Array]:
    """One frame per channel: (..., 10) uint8 -> (state', (..., 160) i16).

    Speech / silence / tone classified on frame[0] & 0xfc
    (ambe_classify_frame, ambe.c:65-78).
    """
    frames = jnp.asarray(frames, jnp.uint8)
    top = frames[..., 0] & 0xFC
    is_tone = top == 0xFC
    is_silence = top == 0xF8
    is_speech = ~(is_tone | is_silence)

    sp_state, sp_pcm = _decode_speech(state, frames)
    t1, t2, tone_pcm, _tone_ok = TN.decode_tone(
        state.tone_phase_f1, state.tone_phase_f2, frames)

    # merge: speech updates sf_prev/synth; tone updates tone phases;
    # silence leaves state untouched and outputs zeros.
    def sel_speech(new, old):
        m = is_speech.reshape(is_speech.shape + (1,) * (new.ndim - is_speech.ndim))
        return jnp.where(m, new, old)

    merged = CodecState(
        sf_prev=jax.tree.map(lambda n, o: sel_speech(n, o),
                             sp_state.sf_prev, state.sf_prev),
        synth=jax.tree.map(lambda n, o: sel_speech(n, o),
                           sp_state.synth, state.synth),
        tone_phase_f1=jnp.where(is_tone, t1, state.tone_phase_f1),
        tone_phase_f2=jnp.where(is_tone, t2, state.tone_phase_f2))

    pcm_f = jnp.where(is_speech[..., None], sp_pcm,
                      jnp.where(is_tone[..., None], tone_pcm, 0.0))
    # the reference casts each float sample straight to int16
    # (synth.c:388, tone.c:110): truncate toward zero, wrap like C.
    pcm = jnp.trunc(pcm_f).astype(jnp.int32).astype(jnp.int16)
    return merged, pcm


@jax.jit
def decode_frames(state: CodecState, frames) -> tuple[CodecState, jax.Array]:
    """Decode a stream: frames (..., T, 10) -> (state', (..., T, 160)).

    lax.scan over time, batched over leading axes — T sequential steps
    of fully-vectorized per-channel work (the frame chain is inherently
    sequential through sf_prev/synth state; parallelism comes from the
    channel batch).
    """
    frames = jnp.asarray(frames, jnp.uint8)
    fr_t = jnp.moveaxis(frames, -2, 0)                # (T, ..., 10)

    def step(st, fr):
        st, pcm = decode_frame(st, fr)
        return st, pcm

    state, pcm_t = jax.lax.scan(step, state, fr_t)
    return state, jnp.moveaxis(pcm_t, 0, -2)


def decode_dtx(state: CodecState, n: int = 160):
    """DTX comfort noise period (ambe_decode_dtx — silence for now,
    matching the reference's FIXME, ambe.c:154-161)."""
    batch = state.tone_phase_f1.shape
    return state, jnp.zeros((*batch, n), jnp.int16)
