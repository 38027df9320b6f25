"""FCCH sync tests: synthetic dual chirps at known TOA/CFO.

Mirrors the reference's acquisition flow (gmr1_rx.c:605-741): rough
correlation TOA -> fine TOA/freq -> SNR gate, plus the 650 ms
multi-beam scan.
"""

import numpy as np
import pytest

from gmr1_tpu.ops import cplx
from gmr1_tpu.sdr import fcch
from gmr1_tpu.sdr.defs import SYM_RATE


def dual_chirp(burst, sps):
    z = cplx.to_complex(fcch._chirp_np(burst, sps, "dual"))
    return z / np.sqrt(2.0)  # unit average power


def make_capture(rng, burst, sps, pos_list, n_samples, f_hz=0.0, amp=1.0,
                 noise=0.05):
    cap = (rng.standard_normal(n_samples) + 1j * rng.standard_normal(n_samples)
           ).astype(np.complex64) * noise
    ref = dual_chirp(burst, sps)
    for pos in pos_list:
        cap[pos:pos + len(ref)] += amp * ref
    t = np.arange(n_samples) / (SYM_RATE * sps)
    cap = cap * np.exp(2j * np.pi * f_hz * t)
    return cplx.from_complex(cap.astype(np.complex64))


SPS = 4


def test_rough_finds_toa(rng):
    true_pos = 12345
    n = (330 * SYM_RATE * SPS) // 1000
    cap = make_capture(rng, fcch.FCCH, SPS, [true_pos], n)
    toa = int(fcch.rough(fcch.FCCH, cap, SPS))
    assert abs(toa - true_pos) <= 2 * SPS


def test_rough_batched(rng):
    n = (330 * SYM_RATE * SPS) // 1000
    caps = np.stack([
        np.asarray(make_capture(rng, fcch.FCCH, SPS, [p], n))
        for p in (5000, 20000)
    ])
    toa = np.asarray(fcch.rough(fcch.FCCH, caps, SPS))
    assert abs(toa[0] - 5000) <= 2 * SPS
    assert abs(toa[1] - 20000) <= 2 * SPS


@pytest.mark.parametrize("f_hz", [-800.0, 0.0, 1300.0])
def test_fine_freq(rng, f_hz):
    burst = fcch.FCCH
    n = burst.len_syms * SPS
    cap = make_capture(rng, burst, SPS, [0], n, f_hz=f_hz, noise=0.02)
    toa, ferr = fcch.fine(burst, cap, SPS)
    ferr_hz = float(ferr) * SYM_RATE / (2 * np.pi)
    assert abs(ferr_hz - f_hz) < 60.0  # within a fraction of a bin (200 Hz)
    assert abs(int(toa)) <= 2 * SPS


def test_fine_toa_corrects_misalignment(rng):
    burst = fcch.FCCH
    blen = burst.len_syms * SPS
    true_pos = 500
    cap = np.asarray(make_capture(rng, burst, SPS, [true_pos],
                                  true_pos + blen + 400, noise=0.02))
    for guess in (true_pos - 3 * SPS, true_pos + 3 * SPS):
        sl = cap[guess:guess + blen]
        toa, _ = fcch.fine(burst, sl, SPS)
        # gmr1_rx.c:630: align += toa  -> corrected guess approaches truth
        assert abs((guess + int(toa)) - true_pos) <= SPS


def test_snr_gate(rng):
    burst = fcch.FCCH
    n = burst.len_syms * SPS
    clean = make_capture(rng, burst, SPS, [0], n, noise=0.01)
    noise = make_capture(rng, burst, SPS, [], n, noise=1.0)
    s_clean = float(fcch.snr(burst, clean, SPS))
    s_noise = float(fcch.snr(burst, noise, SPS))
    assert s_clean > 2.0          # the rx gate (gmr1_rx.c:706)
    assert s_clean > 5 * s_noise
    assert s_noise < 2.0


def test_rough_multi_two_beams(rng):
    burst = fcch.FCCH
    n = (660 * SYM_RATE * SPS) // 1000
    lp = (320 * SYM_RATE) // 1000 * SPS
    pos_a, pos_b = 4000, 26000
    cap = make_capture(
        rng, burst, SPS, [pos_a, pos_a + lp, pos_b, pos_b + lp], n,
        noise=0.05)
    toas = fcch.rough_multi(burst, cap, SPS)
    assert len(toas) >= 2
    found = sorted(toas[:2])
    assert abs(found[0] - pos_a) <= 2 * SPS
    assert abs(found[1] - pos_b) <= 2 * SPS


def test_rough_multi_dedups_periodic_copies(rng):
    burst = fcch.FCCH
    n = (660 * SYM_RATE * SPS) // 1000
    lp = (320 * SYM_RATE) // 1000 * SPS
    pos = 9000
    cap = make_capture(rng, burst, SPS, [pos, pos + lp], n, noise=0.05)
    toas = fcch.rough_multi(burst, cap, SPS)
    strong = [t for t in toas if abs((t % lp) - (pos % lp)) <= lp // 4]
    assert len(strong) == 1


def test_incremental_scan_matches_one_shot(rng):
    """The block-streamed scan (scan_pwr on windows-ending-in-block
    segments + rough_from_pwr / rough_multi_batch_pwr) finds the same
    TOAs as the one-shot rough()/rough_multi_batch() — the basis of the
    wideband receiver's incremental acquisition."""
    burst = fcch.FCCH
    B = burst.len_syms
    n = (330 * SYM_RATE * SPS) // 1000 + B * SPS
    caps = np.stack([
        np.asarray(make_capture(rng, burst, SPS, [p], n))
        for p in (5000, 20000)])

    # one-shot
    toa_ref = np.asarray(fcch.rough(burst, caps, SPS))

    # block-streamed: symbol-rate decimation, segments overlap B-1
    y = caps[:, ::SPS]
    s_sym = 1872                        # ~block quantum, not a divisor
    parts = []
    for b in range(-(-y.shape[1] // s_sym)):
        lo = max(0, b * s_sym - (B - 1))
        seg = y[:, lo:(b + 1) * s_sym]
        if seg.shape[1] >= B:
            parts.append(np.asarray(fcch.scan_pwr(burst, seg)))
    pwr = np.concatenate(parts, axis=1)
    n_corr = y.shape[1] - B + 1
    assert pwr.shape[1] >= n_corr
    toa_inc = np.asarray(fcch.rough_from_pwr(burst, pwr[:, :n_corr], SPS))
    assert np.array_equal(toa_inc, toa_ref)


def test_incremental_multi_beam_matches_one_shot(rng):
    burst = fcch.FCCH
    B = burst.len_syms
    n = (650 * SYM_RATE * SPS) // 1000 + B * SPS
    lp = (320 * SYM_RATE * SPS) // 1000
    caps = np.stack([
        np.asarray(make_capture(rng, burst, SPS,
                                [3000, 3000 + lp, 21000, 21000 + lp], n))
        for _ in range(2)])
    toa_ref, valid_ref = fcch.rough_multi_batch(burst, caps, SPS, k=3)

    y = caps[:, ::SPS]
    pwr = np.asarray(fcch.scan_pwr(burst, y))
    toa_inc, valid_inc = fcch.rough_multi_batch_pwr(burst, pwr, SPS, k=3)
    assert np.array_equal(valid_inc, valid_ref)
    # scale-free power can flip sub-sample rounding at the last ulp
    assert np.abs(toa_inc - toa_ref).max() <= 1
