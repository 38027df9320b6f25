"""AMBE codec golden tests vs the compiled reference decoder.

The reference codec lib depends only on libm, so the tests compile
src/codec/*.c + gmr1_ambe_decode.c into an oracle binary and compare
PCM output (SURVEY.md §4 strategy (3)).

Note on test-vector choice: ambe_synth_voiced (reference synth.c:220)
reads sf->Vl[l] for l up to max(L_prev, L_cur) while only L_cur entries
are initialized — an uninitialized-stack read whenever L decreases.
The bit-comparable tests therefore use a constant pitch with L=39 (>=
the init L=30) so neither side touches that path; a separate test runs
fully random speech and only checks sanity (finite, bounded, plausible
energy).
"""

import os
import subprocess

import numpy as np
import pytest

from gmr1_tpu import codec

ORACLE = "/tmp/gmr1_ambe_ref/gmr1_ambe_decode"


@pytest.fixture(scope="session")
def oracle(reference_dir):
    os.makedirs(os.path.dirname(ORACLE), exist_ok=True)
    if not os.path.exists(ORACLE):
        srcs = [f"{reference_dir}/src/codec/{f}" for f in
                ("ambe.c", "codec.c", "frame.c", "math.c", "synth.c",
                 "tables.c", "tone.c")]
        subprocess.run(
            ["gcc", "-O2", f"-I{reference_dir}/include", "-o", ORACLE,
             *srcs, f"{reference_dir}/src/gmr1_ambe_decode.c", "-lm"],
            check=True)
    return ORACLE


def run_oracle(oracle, frames: np.ndarray) -> np.ndarray:
    """frames (T, 10) uint8 -> PCM (T, 160) int16 via the reference."""
    p = subprocess.run([oracle, "-", "-"], input=frames.tobytes(),
                       capture_output=True, check=True)
    pcm = np.frombuffer(p.stdout, np.int16)
    return pcm.reshape(-1, 160)


def speech_frames(rng, n, pitch=96):
    """Speech frames with fixed pitch (L=39) and interp rule 0."""
    fr = rng.integers(0, 256, size=(n, 10), dtype=np.uint8)
    fr[:, 0] = (pitch << 1) | (fr[:, 0] & 1)
    fr[:, 6] &= ~0xC0 & 0xFF          # bits 48-49 (pitch_interp) = 0
    return fr


def compare(pcm, ref, rtol=0.02, floor=16.0):
    pcm = np.asarray(pcm, np.float64)
    ref = np.asarray(ref, np.float64)
    err = np.sqrt(np.mean((pcm - ref) ** 2))
    scale = max(np.sqrt(np.mean(ref ** 2)), floor)
    assert err <= rtol * scale + floor, (err, scale)


def test_speech_golden(rng, oracle):
    fr = speech_frames(rng, 25)
    ref = run_oracle(oracle, fr)
    st = codec.init(())
    _, pcm = codec.decode_frames(st, fr)
    assert pcm.shape == (25, 160)
    compare(np.asarray(pcm), ref)


def test_silence_and_speech_golden(rng, oracle):
    fr = speech_frames(rng, 12)
    fr[3, 0] = 0xF8                   # silence frame mid-stream
    fr[7, 0] = 0xFA                   # 0xfa & 0xfc == 0xf8 -> silence
    ref = run_oracle(oracle, fr)
    assert not ref[3].any() and not ref[7].any()
    st = codec.init(())
    _, pcm = codec.decode_frames(st, fr)
    pcm = np.asarray(pcm)
    assert not pcm[3].any() and not pcm[7].any()
    compare(pcm, ref)


def tone_frame(rng, code, sel=3, ampl=200):
    fr = rng.integers(0, 256, size=10, dtype=np.uint8)
    fr[0] = 0xFC | sel
    fr[1] = ampl
    fr[2:8] = code
    return fr


@pytest.mark.parametrize("code", [0x20, 0x85, 0x91, 0xA1, 0xFF])
def test_tone_golden(rng, oracle, code):
    fr = np.stack([tone_frame(rng, code, sel=3),
                   tone_frame(rng, code, sel=2),
                   tone_frame(rng, code, sel=1)])
    ref = run_oracle(oracle, fr)
    st = codec.init(())
    _, pcm = codec.decode_frames(st, fr)
    compare(np.asarray(pcm), ref, rtol=0.01)


def test_batched_matches_single(rng, oracle):
    fr_a = speech_frames(rng, 8)
    fr_b = speech_frames(rng, 8, pitch=110)
    st = codec.init((2,))
    _, pcm = codec.decode_frames(st, np.stack([fr_a, fr_b]))
    st1 = codec.init(())
    _, pa = codec.decode_frames(st1, fr_a)
    st2 = codec.init(())
    _, pb = codec.decode_frames(st2, fr_b)
    # batched and unbatched XLA programs may reassociate float sums
    # differently -> the final int16 cast can flip by 1 LSB.
    assert np.abs(np.asarray(pcm[0], np.int32) - np.asarray(pa, np.int32)).max() <= 1
    assert np.abs(np.asarray(pcm[1], np.int32) - np.asarray(pb, np.int32)).max() <= 1


def test_random_speech_sane(rng):
    """Fully random speech frames: no NaN/inf, bounded, nonzero."""
    fr = rng.integers(0, 256, size=(30, 10), dtype=np.uint8)
    fr[:, 0] = np.minimum(fr[:, 0], 0xF7)     # keep it speech
    st = codec.init(())
    _, pcm = codec.decode_frames(st, fr)
    pcm = np.asarray(pcm)
    assert pcm.shape == (30, 160)
    assert np.isfinite(pcm).all()
    assert pcm.any()


def test_dtx_silence():
    st = codec.init((3,))
    st, pcm = codec.decode_dtx(st)
    assert pcm.shape == (3, 160)
    assert not np.asarray(pcm).any()
