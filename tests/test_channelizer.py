"""Channelizer tests: grid math, tone isolation, end-to-end burst decode."""

import numpy as np
import pytest

from gmr1_tpu.channelizer import (BASE_BANDWIDTH, BASE_SYMRATE, ArbResampler,
                                  Channel, Channelizer, align_freq)
from gmr1_tpu.l1 import bcch
from gmr1_tpu.ops import cplx
from gmr1_tpu.sdr import bursts as BU
from gmr1_tpu.sdr import modem


def test_arfcn_grid():
    c = Channel(100)
    assert c.frequency == 1525e6 + 31.25e3 * 100     # odd width: on grid
    c2 = Channel(100, width=2)
    assert c2.frequency == 1525e6 + 31.25e3 * 100.5  # even width: +0.5
    c3 = Channel.parse("U123x3")
    assert c3.uplink and c3.width == 3 and c3.arfcn == 123
    assert c3.symbol_rate == 3 * BASE_SYMRATE
    assert Channel(10, width=3).arfcns == [9, 10, 11]
    assert align_freq(1525e6 + 31250 * 7 + 900.0) == 1525e6 + 31250 * 7


def test_arb_resampler_tone(rng):
    """A tone must survive resampling with the right frequency."""
    fs_in, ratio = 62500.0, 93600.0 / 62500.0
    f = 5000.0
    n = 4096
    t = np.arange(n) / fs_in
    x = np.exp(2j * np.pi * f * t).astype(np.complex64)
    r = ArbResampler(ratio)
    y = cplx.to_complex(np.asarray(r(cplx.from_complex(x))))
    y = y[200:-200]                      # skip edges
    # measure frequency by phase slope
    dphi = np.angle(y[1:] * np.conj(y[:-1]))
    f_meas = np.median(dphi) * fs_in * ratio / (2 * np.pi)
    assert abs(f_meas - f) < 20.0
    assert np.std(np.abs(y)) < 0.03      # flat envelope


def test_arb_resampler_window_parity(rng):
    """resample_window must reproduce the matching slice of __call__."""
    r = ArbResampler(93600.0 / 62500.0)
    x = rng.standard_normal((3, 2048, 2)).astype(np.float32)
    full = np.asarray(r(x))
    out_start, n_out = 700, 256
    k_min, k_span, k1r, p1, k2r, p2, frac = r.window_geometry(out_start, n_out)
    xw = x[:, k_min:k_min + k_span]
    win = np.asarray(r.resample_window(xw, k1r, p1, k2r, p2, frac))
    np.testing.assert_allclose(win, full[:, out_start:out_start + n_out],
                               rtol=1e-5, atol=1e-5)
    # dense-matrix form must agree too
    k_min2, wmat = r.window_matrix(out_start, n_out)
    assert k_min2 == k_min and wmat.shape == (n_out, k_span)
    dense = np.einsum("ok,bkc->boc", wmat, x[:, k_min:k_min + k_span])
    np.testing.assert_allclose(dense, win, rtol=1e-4, atol=1e-5)


CENTER = 1525e6 + 31250 * 512            # aligned to grid


def make_wideband(rng, fs, sigs, n, noise=1e-4):
    """sigs: list of (freq offset Hz from CENTER, complex stream at fs)."""
    x = (rng.standard_normal(n) + 1j * rng.standard_normal(n)) * noise
    t = np.arange(n) / fs
    for df, s in sigs:
        x[:len(s)] += s[:n] * np.exp(2j * np.pi * df * t[:len(s)])
    return x.astype(np.complex64)


def test_tone_isolation(rng):
    fs = 1e6
    chz = Channelizer(fs, CENTER)
    a1, a2 = Channel(512 + 3), Channel(512 - 5)
    n = 65536
    t = np.arange(n) / fs
    sigs = [(a.frequency - CENTER, np.ones(n, np.complex64)
             * np.exp(2j * np.pi * 1000.0 * t)) for a in (a1, a2)]
    wb = make_wideband(rng, fs, sigs, n)
    bank = np.asarray(chz.process(cplx.from_complex(wb)))
    e = (bank[..., 0] ** 2 + bank[..., 1] ** 2).mean(axis=0)
    i1, i2 = chz.freq2index(a1.frequency), chz.freq2index(a2.frequency)
    # the two occupied channels dominate
    order = np.argsort(e)[::-1]
    assert set(order[:2]) == {i1, i2}
    # rejection in a far-away channel > 40 dB
    far = chz.freq2index(Channel(512 + 10).frequency)
    assert e[far] < e[i1] * 1e-4


def test_channelize_extract_decode(rng):
    """BCCH burst on a carrier inside a wideband capture -> bit-exact."""
    fs = 500e3
    sps = 4
    chz = Channelizer(fs, CENTER, sps=sps)
    ch = Channel(512 + 2)

    l2 = rng.integers(0, 256, size=(1, 24), dtype=np.uint8)
    x1 = np.asarray(modem.mod(BU.BCCH, np.asarray(bcch.encode(l2))))[0]
    # upsample burst to fs via zero-stuff + lowpass-by-sinc interp
    xc = cplx.to_complex(x1)
    ratio = fs / BASE_SYMRATE            # samples per symbol at fs
    n = int((len(xc) + 30) * ratio)
    tt = np.arange(n) / ratio - 10.0     # 10-symbol lead-in
    mat = np.sinc(tt[:, None] - np.arange(len(xc))[None, :])
    s = (mat @ xc).astype(np.complex64)

    wb = make_wideband(rng, fs, [(ch.frequency - CENTER, s)],
                       n + 4096, noise=1e-3)
    bank = chz.process(cplx.from_complex(wb))
    stream = np.asarray(chz.extract(bank, ch))

    # the demod searches a window; feed the whole stream
    blen = BU.BCCH.len_syms * sps
    win = stream.shape[0] - blen
    r = modem.demod(BU.BCCH, stream, sps=sps, win=win)
    l2d, bad, _ = bcch.decode(r.ebits)
    assert not int(np.asarray(bad))
    np.testing.assert_array_equal(np.asarray(l2d), l2[0])


def test_wide_carrier_tone(rng):
    """Width-3 carrier: a tone off-center beyond one subchannel must
    reconstruct cleanly in the recombined stream."""
    fs = 1e6
    chz = Channelizer(fs, CENTER, need_nx=True)
    ch = Channel(512, width=3)
    f_tone = 30e3                        # inside width-3, outside width-1
    n = 65536
    t = np.arange(n) / fs
    s = np.exp(2j * np.pi * (ch.frequency - CENTER + f_tone) * t)
    wb = make_wideband(rng, fs, [(0.0, s * 0 + 0)], n)  # noise base
    wb = (wb + s * np.exp(0j)).astype(np.complex64)
    bank = chz.process(cplx.from_complex(wb))
    y = cplx.to_complex(np.asarray(chz.extract(bank, ch)))[500:-500]
    out_rate = ch.symbol_rate * 4
    dphi = np.angle(y[1:] * np.conj(y[:-1]))
    f_meas = np.median(dphi) * out_rate / (2 * np.pi)
    assert abs(f_meas - f_tone) < 100.0
    assert np.std(np.abs(y)) / np.mean(np.abs(y)) < 0.1


def test_direct_ddc_decode(rng):
    """Direct DDC mode: BCCH at an offset carrier -> bit-exact decode."""
    from gmr1_tpu.channelizer.ddc import DirectDDC, DirectParams

    fs, sps = 1e6, 4
    p = DirectParams(fs, BASE_SYMRATE, sps)
    assert p.decim1 > 1
    l2 = rng.integers(0, 256, size=(1, 24), dtype=np.uint8)
    x1 = np.asarray(modem.mod(BU.BCCH, np.asarray(bcch.encode(l2))))[0]
    xc = cplx.to_complex(x1)
    ratio = fs / BASE_SYMRATE
    n = int((len(xc) + 30) * ratio)
    tt = np.arange(n) / ratio - 10.0
    s = (np.sinc(tt[:, None] - np.arange(len(xc))[None, :]) @ xc
         ).astype(np.complex64)
    f_off = 93.75e3   # 3 channels up
    t = np.arange(n + 4096) / fs
    wb = (rng.standard_normal(n + 4096)
          + 1j * rng.standard_normal(n + 4096)) * 1e-3
    wb[:n] += s * np.exp(2j * np.pi * f_off * t[:n])
    ddc = DirectDDC(p, f_off)
    stream = np.asarray(ddc(cplx.planar_np(wb.astype(np.complex64))))
    blen = BU.BCCH.len_syms * sps
    r = modem.demod(BU.BCCH, stream, sps=sps, win=stream.shape[0] - blen)
    l2d, bad, _ = bcch.decode(r.ebits)
    assert not int(np.asarray(bad))
    np.testing.assert_array_equal(np.asarray(l2d), l2[0])


def test_pallas_branch_filter_parity(rng):
    """Pallas fused analysis (interpret mode) == XLA shifted-accumulate."""
    import jax.numpy as jnp

    from gmr1_tpu.channelizer.pfb import _analyze_block, _analyze_block_fused
    from gmr1_tpu.ops.pallas_pfb import slab_weights

    for (m, p, R) in [(16, 3, 40), (64, 5, 21), (64, 5, 24)]:
        hop = m // 2
        L = R * hop + p * m
        x = jnp.asarray(rng.normal(size=(L, 2)).astype(np.float32))
        h_poly = rng.normal(size=(m, p)).astype(np.float32)
        ref = np.asarray(_analyze_block(x, jnp.asarray(h_poly), m, p, hop))

        wa = jnp.asarray(slab_weights(h_poly, m, p, hop))
        got = np.asarray(_analyze_block_fused(x, wa, m, p, hop,
                                              interpret=True,
                                              dft_bf16=False))
        np.testing.assert_allclose(got, ref, rtol=2e-4, atol=1e-4)
        # default bf16 channel DFT: within quantization-noise tolerance
        got16 = np.asarray(_analyze_block_fused(x, wa, m, p, hop,
                                                interpret=True))
        scale = np.abs(ref).max()
        np.testing.assert_allclose(got16 / scale, ref / scale, atol=3e-2)


@pytest.mark.slow
@pytest.mark.parametrize("width", [3, 5])
def test_wide_carrier_burst_e2e(rng, width):
    """Bit-exact L2 through width-3/5 PFB synthesizer recombination
    (utils/gmr1_rx_sdr.py:566-589): an NT9 FACCH9 burst modulated at
    width*23400 sym/s, channelized, subchannels recombined with
    post-rotation, RRC'd to 4 sps, demodulated and CRC-checked."""
    from gmr1_tpu.l1 import facch9

    fs, sps = 1e6, 4
    chz = Channelizer(fs, CENTER, sps=sps, need_nx=True)
    ch = Channel(512, width=width)
    sym_rate = ch.symbol_rate

    l2 = rng.integers(0, 256, 38, dtype=np.uint8)
    l2[37] &= 0xF0
    ciph = np.zeros(658, np.uint8)
    eb = np.asarray(facch9.encode(l2, np.zeros(10, np.uint8),
                                  np.zeros(4, np.uint8), ciph))
    x1 = np.asarray(modem.mod(BU.NT9, eb[None], sync_id=0))[0]
    xc = cplx.to_complex(x1)
    ratio = fs / sym_rate
    n = int((len(xc) + 30) * ratio)
    tt = np.arange(n) / ratio - 10.0
    s = (np.sinc(tt[:, None] - np.arange(len(xc))[None, :]) @ xc
         ).astype(np.complex64)
    wb = make_wideband(rng, fs, [(ch.frequency - CENTER, s)], n + 8192,
                       noise=1e-3)
    bank = chz.process(cplx.from_complex(wb))
    stream = np.asarray(chz.extract(bank, ch))

    blen = BU.NT9.len_syms * sps
    r = modem.demod(BU.NT9, stream, sps=sps, win=stream.shape[0] - blen)
    assert int(np.asarray(r.sync_id)) == 0
    l2d, _sa, _st, bad, _m = facch9.decode(r.ebits, ciph)
    assert not int(np.asarray(bad))
    np.testing.assert_array_equal(np.asarray(l2d), l2)


def test_wide_streamer_matches_offline_extract(rng):
    """WideStreamer chunks concatenate to exactly the offline
    extract() synthesizer output (state carried across blocks)."""
    fs = 1e6
    chz = Channelizer(fs, CENTER, sps=4, need_nx=True)
    ch = Channel(512, width=3)
    n = 4 * 2500 * chz.analyzer.hop            # 4 blocks of 2500 rows
    wb = make_wideband(rng, fs, [], n, noise=1.0)
    bank = np.asarray(chz.process(cplx.from_complex(wb)))
    ref = np.asarray(chz.extract(bank, ch))

    ws = chz.wide_streamer(ch, block_rows=2500)
    got = np.concatenate([ws.feed(bank[b * 2500:(b + 1) * 2500]
                                  .transpose(1, 0, 2))
                          for b in range(4)], axis=0)
    assert got.shape[0] == ref.shape[0]
    np.testing.assert_allclose(got, ref, rtol=1e-4, atol=1e-4)


def test_off_grid_fs_pre_resample_decode(rng):
    """fs NOT on the 31.25 kHz grid: the pre-resampler path
    (utils/gmr1_rx_sdr.py:411-417) must land the capture on an integer
    channel grid and decode a BCCH bit-exact."""
    fs, sps = 900e3, 4
    chz = Channelizer(fs, CENTER, sps=sps)
    assert chz.pre_resamp is not None      # 900e3 / 31.25e3 = 28.8
    ch = Channel(512 + 3)

    l2 = rng.integers(0, 256, size=(1, 24), dtype=np.uint8)
    x1 = np.asarray(modem.mod(BU.BCCH, np.asarray(bcch.encode(l2))))[0]
    xc = cplx.to_complex(x1)
    ratio = fs / BASE_SYMRATE
    n = int((len(xc) + 30) * ratio)
    tt = np.arange(n) / ratio - 10.0
    s = (np.sinc(tt[:, None] - np.arange(len(xc))[None, :]) @ xc)
    wb = make_wideband(rng, fs, [(ch.frequency - CENTER, s)], n + 8192,
                       noise=1e-3)
    bank = chz.process(cplx.from_complex(wb))
    stream = np.asarray(chz.extract(bank, ch))
    blen = BU.BCCH.len_syms * sps
    r = modem.demod(BU.BCCH, stream, sps=sps, win=stream.shape[0] - blen)
    l2d, bad, _ = bcch.decode(r.ebits)
    assert not int(np.asarray(bad))
    np.testing.assert_array_equal(np.asarray(l2d), l2[0])


def test_ddc_vs_pfb_same_carrier_parity(rng):
    """The SAME BCCH carrier decoded through both front-ends — direct
    DDC chain and PFB channelizer extraction — yields identical L2."""
    from gmr1_tpu.channelizer.ddc import DirectDDC, DirectParams

    fs, sps = 1e6, 4
    ch = Channel(512 + 3)                  # 93.75 kHz off center
    l2 = rng.integers(0, 256, size=(1, 24), dtype=np.uint8)
    x1 = np.asarray(modem.mod(BU.BCCH, np.asarray(bcch.encode(l2))))[0]
    xc = cplx.to_complex(x1)
    ratio = fs / BASE_SYMRATE
    n = int((len(xc) + 30) * ratio)
    tt = np.arange(n) / ratio - 10.0
    s = (np.sinc(tt[:, None] - np.arange(len(xc))[None, :]) @ xc)
    wb = make_wideband(rng, fs, [(ch.frequency - CENTER, s)], n + 8192,
                       noise=1e-3)
    wbp = cplx.from_complex(wb)
    blen = BU.BCCH.len_syms * sps

    def decode(stream):
        stream = np.asarray(stream)
        r = modem.demod(BU.BCCH, stream, sps=sps,
                        win=stream.shape[0] - blen)
        l2d, bad, _ = bcch.decode(r.ebits)
        assert not int(np.asarray(bad))
        return np.asarray(l2d)

    chz = Channelizer(fs, CENTER, sps=sps)
    got_pfb = decode(chz.extract(chz.process(wbp), ch))
    ddc = DirectDDC(DirectParams(fs, BASE_SYMRATE, sps),
                    ch.frequency - CENTER)
    got_ddc = decode(ddc(wbp))
    np.testing.assert_array_equal(got_pfb, got_ddc)
    np.testing.assert_array_equal(got_pfb, l2[0])
