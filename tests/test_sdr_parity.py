"""SDR-layer golden parity vs the COMPILED reference C demodulator.

The oracle (tests/sdr_oracle.py) runs the unmodified reference
pi4cxpsk.c / fcch.c / nb.c / dkab.c on the exact same float32 captures
the TPU build sees, so these tests convert the round-1 self-roundtrip
evidence into reference parity (VERDICT.md Missing #1):

  * modulator waveform parity across all 10 burst classes
  * demod parity: identical hard-decision ebits + sync id, TOA/freq
    within tolerance, soft bits within a small LSB bound
  * burst-type detect + blind mod-order parity
  * FCCH rough / rough_multi / fine / snr parity (all 3 chirp variants)
  * DKAB parity
  * Eb/N0 sweep: raw-BER and post-Viterbi parity through gmr1_tpu.l1

Shared foundation note: the oracle links a minimal hand-written
libosmo-dsp shim whose kernels implement the same documented semantics
as gmr1_tpu/ops/dsp.py (libosmo-dsp is not vendored in the reference
tree), so what these tests prove is parity of everything ABOVE that
agreed foundation — the ~2100 LoC of reference demod/sync logic.
"""

import numpy as np
import pytest

from gmr1_tpu.l1 import bcch
from gmr1_tpu.sdr import bursts as BU
from gmr1_tpu.sdr import dkab as dkab_mod
from gmr1_tpu.sdr import fcch as fcch_mod
from gmr1_tpu.sdr import modem

from sdr_oracle import SdrOracle
from test_modem import channel, sbit_to_hard

BURSTS = {
    "bcch": BU.BCCH, "dc2": BU.DC2, "dc6": BU.DC6, "dc12": BU.DC12,
    "nt3_speech": BU.NT3_SPEECH, "nt3_facch": BU.NT3_FACCH,
    "nt6": BU.NT6, "nt9": BU.NT9, "rach": BU.RACH, "sdcch": BU.SDCCH,
}

# NT3_FACCH/SDCCH sync patterns are |corr|-ambiguous at +-1 symbol, so
# use the receiver's constrained window for them (gmr1_rx.c:549-550).
NARROW_WIN = {"nt3_facch", "sdcch"}


@pytest.fixture(scope="session")
def oracle(reference_dir):
    """Verbatim reference SDR layer."""
    return SdrOracle(reference_dir)


@pytest.fixture(scope="session")
def oracle_fixed(reference_dir):
    """Reference with the one-line per-sync-id correlation reset
    (see sdr_oracle.py for the quirk analysis): the strict-parity
    baseline for multi-sync-sequence bursts and burst-type detect."""
    return SdrOracle(reference_dir, fixed=True)


def _win_for(name: str, sps: int) -> int:
    return sps + sps // 2 if name in NARROW_WIN else 5 * sps


@pytest.mark.parametrize("name", sorted(BURSTS), ids=str)
def test_burst_catalog_parity(name, oracle):
    """Burst geometry data matches nb.c (len/ebits/nsync/guards)."""
    bu = BURSTS[name]
    info = oracle.burst_info(name)
    assert info["len"] == bu.len_syms
    assert info["ebits"] == bu.ebits
    assert info["nsync"] == bu.n_sync
    assert info["guard_pre"] == bu.guard_pre
    assert info["guard_post"] == bu.guard_post


@pytest.mark.parametrize("name", sorted(BURSTS), ids=str)
def test_mod_parity(name, oracle, rng):
    """My modulator and gmr1_pi4cxpsk_mod produce the same waveform."""
    bu = BURSTS[name]
    for sid in range(bu.n_sync):
        ebits = rng.integers(0, 2, size=bu.ebits).astype(np.uint8)
        mine = np.asarray(modem.mod(bu, ebits[None], sync_id=sid))[0]
        ref = oracle.mod(name, ebits, sync_id=sid)
        np.testing.assert_allclose(mine, ref, atol=2e-6)


@pytest.mark.parametrize("name", sorted(BURSTS), ids=str)
def test_demod_parity_sps4(name, oracle_fixed, rng):
    """Identical hard bits + sync id; TOA/freq/soft bits within bound.

    Every burst class, both sync sequences where present, on a noisy
    band-limited channel (VERDICT.md Missing #1/#2).
    """
    bu = BURSTS[name]
    sps = 4
    win = _win_for(name, sps)
    delay = win // 2 + 1
    for sid in range(bu.n_sync):
        ebits = rng.integers(0, 2, size=(1, bu.ebits)).astype(np.uint8)
        x1 = np.asarray(modem.mod(bu, ebits, sync_id=sid))
        cap = channel(x1, sps, delay=delay, freq_err_per_sym=0.004,
                      rng=rng, sigma=0.1, win=win)[0]
        e_ref, sid_ref, toa_ref, ferr_ref = oracle_fixed.demod(name, cap,
                                                                sps)
        res = modem.demod(bu, cap[None], sps, win)
        e_my = np.asarray(res.ebits)[0]
        assert int(np.asarray(res.sync_id)[0]) == sid_ref == sid
        np.testing.assert_array_equal(sbit_to_hard(e_my),
                                      sbit_to_hard(e_ref))
        # vs truth: the channel itself may cost a few bits at this SNR;
        # parity is the exact-equality assert above.
        assert (sbit_to_hard(e_my) != ebits[0]).mean() < 0.03
        assert abs(float(np.asarray(res.toa)[0]) - toa_ref) < 0.35
        assert abs(float(np.asarray(res.freq_err)[0]) - ferr_ref) < 1e-4
        # soft values: small LSB deltas from float reassociation only
        diff = np.abs(e_my.astype(np.int32) - e_ref.astype(np.int32))
        assert diff.max() <= 3, diff.max()
        assert (diff > 1).mean() < 0.02


@pytest.mark.parametrize("name,delay",
                         [("nt3_speech", 3.6), ("dc12", 3.5)], ids=str)
def test_demod_parity_sps1_fractional(name, delay, oracle_fixed, rng):
    """sps<4 sinc-interpolation alignment path parity (pi4cxpsk.c:298)."""
    bu = BURSTS[name]
    sps, win = 1, 8
    ebits = rng.integers(0, 2, size=(1, bu.ebits)).astype(np.uint8)
    x1 = np.asarray(modem.mod(bu, ebits))
    cap = channel(x1, sps, delay=delay, rng=rng, sigma=0.03, win=win,
                  pulse="sinc")[0]
    e_ref, sid_ref, toa_ref, _ = oracle_fixed.demod(name, cap, sps)
    # the estimated TOA must have |frac| > 0.1 or the sinc interpolation
    # branch (pi4cxpsk.c:310) is skipped on both sides
    assert abs(toa_ref - round(toa_ref)) > 0.1
    res = modem.demod(bu, cap[None], sps, win)
    e_my = np.asarray(res.ebits)[0]
    np.testing.assert_array_equal(sbit_to_hard(e_my), sbit_to_hard(e_ref))
    # 1-sps demod quality is limited by the reference's own parabolic
    # TOA bias; parity (above) is exact, truth BER just sanity-bounded
    assert (sbit_to_hard(e_my) != ebits[0]).mean() < 0.2
    assert abs(float(np.asarray(res.toa)[0]) - toa_ref) < 0.2


def test_detect_parity(oracle_fixed, rng):
    """gmr1_pi4cxpsk_detect vs modem.detect: same class, sync, toa."""
    sps = 4
    win = sps + sps // 2
    types = ("nt3_facch", "nt3_speech")
    bus = tuple(BURSTS[n] for n in types)
    for true_id, name in enumerate(types):
        bu = BURSTS[name]
        ebits = rng.integers(0, 2, size=(1, bu.ebits)).astype(np.uint8)
        x1 = np.asarray(modem.mod(bu, ebits))
        cap = channel(x1, sps, delay=3, rng=rng, sigma=0.08, win=win)[0]
        bt_ref, sid_ref, toa_ref = oracle_fixed.detect(
            types, float(win // 2), cap, sps)
        bt, sid, toa, _ = modem.detect(bus, cap[None], sps, win,
                                       e_toa=float(win // 2))
        assert int(np.asarray(bt)[0]) == bt_ref == true_id
        assert int(np.asarray(sid)[0]) == sid_ref
        assert abs(float(np.asarray(toa)[0]) - toa_ref) < 0.35


def test_mod_order_parity(oracle, rng):
    sps = 4
    for name, order in (("nt3_speech", 4), ("nt3_facch", 2), ("dc12", 2)):
        bu = BURSTS[name]
        eb = rng.integers(0, 2, size=(1, bu.ebits)).astype(np.uint8)
        cap = channel(np.asarray(modem.mod(bu, eb)), sps, 0, win=0,
                      rng=rng, sigma=0.05)[0]
        ref = oracle.mod_order(cap, sps)
        mine = int(np.asarray(modem.mod_order(cap[None], sps))[0])
        assert mine == ref == order


def test_sync_find_accumulation_quirk(oracle, oracle_fixed, rng):
    """Pin down the verbatim reference's sync-selection quirk.

    _gmr1_pi4cxpsk_sync_find zeroes its combined-correlation buffer once
    outside the sync-id loop (pi4cxpsk.c:207) while accumulating
    |corr| inside it (pi4cxpsk.c:232-233), so each sync id's peak power
    includes all previous ids' energy and the LAST id wins regardless
    of what was transmitted.  The TPU build (and the 'fixed' oracle)
    reset per sync id — the behavior gmr1_rx.c:480's sync_id-mismatch
    flush logic was written for.
    """
    bu = BURSTS["nt3_facch"]
    sps, win = 4, 6
    ebits = rng.integers(0, 2, size=(1, bu.ebits)).astype(np.uint8)
    x1 = np.asarray(modem.mod(bu, ebits, sync_id=0))
    cap = channel(x1, sps, delay=4, freq_err_per_sym=0.004, rng=rng,
                  sigma=0.1, win=win)[0]
    _, sid_verbatim, _, _ = oracle.demod("nt3_facch", cap, sps)
    _, sid_fixed, _, _ = oracle_fixed.demod("nt3_facch", cap, sps)
    res = modem.demod(bu, cap[None], sps, win)
    assert sid_verbatim == 1       # quirk: last id always wins
    assert sid_fixed == 0          # intended behavior
    assert int(np.asarray(res.sync_id)[0]) == 0


# ---------------------------------------------------------------------------
# FCCH
# ---------------------------------------------------------------------------

FCCH_VARIANTS = {
    "fcch": fcch_mod.FCCH,
    "fcch3_lband": fcch_mod.FCCH3_LBAND,
    "fcch3_sband": fcch_mod.FCCH3_SBAND,
}


def _chirp_capture(variant, sps, pos, n, freq_err=0.0, sigma=0.05,
                   rng=None):
    """Noise capture with one dual chirp at sample `pos` (planar)."""
    burst = FCCH_VARIANTS[variant]
    l = burst.len_syms * sps
    t = np.arange(l) / sps - burst.len_syms / 2.0
    phase = burst.freq * 2.0 * np.pi / burst.len_syms * t * t
    chirp = np.sqrt(2.0) * np.cos(phase)
    sig = np.zeros(n, np.complex64)
    sig[pos:pos + l] = chirp
    sig *= np.exp(1j * freq_err / sps * np.arange(n))
    if rng is not None:
        sig = sig + (rng.normal(0, sigma, n) + 1j * rng.normal(0, sigma, n))
    return np.stack([sig.real, sig.imag], -1).astype(np.float32)


@pytest.mark.parametrize("variant", sorted(FCCH_VARIANTS), ids=str)
def test_fcch_fine_snr_parity(variant, oracle, rng):
    """gmr1_fcch_fine/snr on all 3 chirp variants (VERDICT Missing #2:
    FCCH3 L/S fine/snr, fcch.c:59-70)."""
    burst = FCCH_VARIANTS[variant]
    sps = 4
    l = burst.len_syms * sps
    f = 0.012  # rad/sym
    cap = _chirp_capture(variant, sps, 0, l, freq_err=f, sigma=0.05,
                         rng=rng)
    toa_ref, ferr_ref = oracle.fcch_fine(variant, cap, sps)
    snr_ref = oracle.fcch_snr(variant, cap, sps)
    toa, ferr = fcch_mod.fine(burst, cap, sps)
    snr = fcch_mod.snr(burst, cap, sps)
    if burst.len_syms >= 468:
        # 468-sym variants resolve f to sub-bin accuracy; the 117-sym
        # FCCH underestimates sub-bin offsets (reference behavior: the
        # closed loop in gmr1_rx.c:782-789 iterates it out)
        assert abs(ferr_ref - f) < 2e-3      # the oracle works at all
    assert int(np.asarray(toa)) == toa_ref
    assert abs(float(np.asarray(ferr)) - ferr_ref) < 1e-4
    assert abs(float(np.asarray(snr)) - snr_ref) / max(snr_ref, 1.0) < 0.05


def test_fcch_rough_parity(oracle, rng):
    sps = 4
    n = (340 * 23400 // 1000 + fcch_mod.FCCH.len_syms) * sps
    pos = 31 * sps
    cap = _chirp_capture("fcch", sps, pos, n, sigma=0.3, rng=rng)
    toa_ref = oracle.fcch_rough("fcch", cap, sps)
    toa = int(np.asarray(fcch_mod.rough(fcch_mod.FCCH, cap, sps)))
    assert abs(toa - toa_ref) <= 2
    assert abs(toa - pos) <= 2 * sps


def test_fcch_rough_multi_parity(oracle, rng):
    sps = 2
    sym_rate = 23400
    n = (680 * sym_rate // 1000) * sps
    lp = (320 * sym_rate // 1000) * sps
    positions = [40 * sps, 1200 * sps]   # two beams
    sig = np.zeros((n, 2), np.float32)
    for p in positions:
        for rep in range(2):             # SI periodicity
            c = _chirp_capture("fcch", sps, p + rep * lp, n)
            sig += c
    noise = rng.normal(0, 0.05, (n, 2)).astype(np.float32)
    cap = sig + noise
    ref = sorted(oracle.fcch_rough_multi("fcch", cap, sps))
    mine = sorted(fcch_mod.rough_multi(fcch_mod.FCCH, cap, sps))
    assert len(ref) == len(mine) == len(positions)
    for a, b in zip(mine, ref):
        assert abs(a - b) <= 2
    for a, p in zip(mine, sorted(positions)):
        assert abs(a - p) <= 2 * sps


# ---------------------------------------------------------------------------
# DKAB
# ---------------------------------------------------------------------------

def test_dkab_parity(oracle, rng):
    from test_dkab import make_dkab
    sps, p = 4, 5
    bits = [0, 1, 1, 0, 1, 0, 0, 1]
    cap = np.asarray(make_dkab(rng, sps, p, bits, off=6))
    e_ref, toa_ref, found_ref = oracle.dkab(cap, sps, p)
    res = dkab_mod.demod(cap[None], sps, p)
    assert bool(np.asarray(res.found)[0]) == found_ref == True  # noqa: E712
    assert (e_ref < 0).astype(int).tolist() == bits
    assert abs(float(np.asarray(res.toa)[0]) - toa_ref) < 0.25
    diff = np.abs(np.asarray(res.ebits)[0].astype(np.int32)
                  - e_ref.astype(np.int32))
    assert diff.max() <= 2, (np.asarray(res.ebits)[0], e_ref)


def test_dkab_not_found_parity(oracle, rng):
    """Pure noise: both sides report not-found via the 10x power gate."""
    sps, p = 4, 3
    n = dkab_mod.DKAB_SYMS * sps + 16
    cap = rng.normal(0, 0.3, (n, 2)).astype(np.float32)
    _, _, found_ref = oracle.dkab(cap, sps, p)
    res = dkab_mod.demod(cap[None], sps, p)
    assert bool(np.asarray(res.found)[0]) == found_ref == False  # noqa: E712


# ---------------------------------------------------------------------------
# Eb/N0 sweep: raw BER + post-Viterbi parity (BASELINE.md north star)
# ---------------------------------------------------------------------------

def test_ber_sweep_parity(oracle, rng):
    """Raw hard-bit BER of my demod tracks the reference demod across an
    SNR sweep, and my L1 Viterbi+CRC accepts the reference's soft bits
    (post-Viterbi bit-exact, VERDICT Missing #1 done-criterion (b))."""
    sps, win = 4, 12
    n_bursts = 12
    l2 = rng.integers(0, 256, size=(n_bursts, 24), dtype=np.uint8)
    tx_ebits = np.asarray(bcch.encode(l2), np.uint8)
    x1 = np.asarray(modem.mod(BU.BCCH, tx_ebits))

    for sigma, max_delta in ((0.05, 0.0), (0.35, 0.01), (0.6, 0.03)):
        cap = channel(x1, sps, delay=6, rng=rng, sigma=sigma, win=win)
        e_ref = np.stack([oracle.demod("bcch", cap[i], sps)[0]
                          for i in range(n_bursts)])
        res = modem.demod(BU.BCCH, cap, sps, win)
        e_my = np.asarray(res.ebits)
        ber_my = (sbit_to_hard(e_my) != tx_ebits).mean()
        ber_ref = (sbit_to_hard(e_ref) != tx_ebits).mean()
        assert abs(ber_my - ber_ref) <= max_delta, (sigma, ber_my, ber_ref)
        # post-Viterbi: decode BOTH soft-bit streams with my L1 stack
        for ebits in (e_my, e_ref):
            l2_hat, bad, _ = bcch.decode(ebits)
            bad = np.asarray(bad).astype(bool)
            if sigma <= 0.05:
                assert not bad.any()
            if sigma <= 0.35:
                assert bad.sum() <= 2        # ~9 dB SNR: rare CRC loss
            np.testing.assert_array_equal(np.asarray(l2_hat)[~bad],
                                          l2[~bad])
        # identical Viterbi input -> identical decode: cross-decode match
        l2_my, bad_my, _ = bcch.decode(e_my)
        l2_ref, bad_ref, _ = bcch.decode(e_ref)
        ok = ~(np.asarray(bad_my) | np.asarray(bad_ref))
        np.testing.assert_array_equal(np.asarray(l2_my)[ok],
                                      np.asarray(l2_ref)[ok])
