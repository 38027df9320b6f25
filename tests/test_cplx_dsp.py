"""Planar complex arithmetic and DSP primitive tests against NumPy."""

import numpy as np

from gmr1_tpu.ops import cplx, dsp


def rand_c(rng, *shape):
    return (rng.normal(size=shape) + 1j * rng.normal(size=shape)).astype(np.complex64)


def test_mul_conj_abs(rng):
    a = rand_c(rng, 64)
    b = rand_c(rng, 64)
    ap, bp = cplx.planar_np(a), cplx.planar_np(b)
    np.testing.assert_allclose(cplx.to_complex(cplx.mul(ap, bp)), a * b, rtol=1e-5)
    np.testing.assert_allclose(cplx.to_complex(cplx.conj_mul(ap, bp)),
                               np.conj(a) * b, rtol=1e-5)
    np.testing.assert_allclose(np.array(cplx.abs2(ap)), np.abs(a) ** 2, rtol=1e-5)
    np.testing.assert_allclose(np.array(cplx.angle(ap)), np.angle(a), rtol=1e-4)


def test_matmul(rng):
    a = rand_c(rng, 5, 7)
    b = rand_c(rng, 7, 3)
    got = cplx.to_complex(cplx.matmul(cplx.planar_np(a), cplx.planar_np(b)))
    np.testing.assert_allclose(got, a @ b, rtol=1e-4, atol=1e-5)


def test_dft_matches_numpy(rng):
    for n in (8, 117, 128):
        x = rand_c(rng, 3, n)
        got = cplx.to_complex(cplx.dft(cplx.planar_np(x)))
        np.testing.assert_allclose(got, np.fft.fft(x, axis=-1), rtol=1e-3, atol=1e-3)
        gotr = cplx.to_complex(cplx.dft(cplx.planar_np(x), inverse=True))
        np.testing.assert_allclose(gotr, np.fft.ifft(x, axis=-1), rtol=1e-3, atol=1e-3)


def test_correlate_matches_numpy(rng):
    ref = rand_c(rng, 6)
    win = rand_c(rng, 2, 40)
    got = cplx.to_complex(dsp.correlate(cplx.planar_np(ref), cplx.planar_np(win), 2))
    n_out = 40 - 6 * 2 + 1
    want = np.empty((2, n_out), np.complex64)
    for b in range(2):
        for k in range(n_out):
            want[b, k] = np.sum(np.conj(ref) * win[b, k:k + 12:2])
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-5)


def test_correlate_conv_matches_strided(rng):
    ref = rand_c(rng, 16)
    win = rand_c(rng, 3, 200)
    a = cplx.to_complex(dsp.correlate(cplx.planar_np(ref), cplx.planar_np(win), 1))
    b = cplx.to_complex(dsp.correlate_conv(cplx.planar_np(ref), cplx.planar_np(win)))
    np.testing.assert_allclose(a, b, rtol=1e-3, atol=1e-4)


def test_fractional_delay(rng):
    # A bandlimited signal shifted by +0.3 samples
    n = np.arange(256, dtype=np.float64)
    x = np.exp(1j * 0.2 * n).astype(np.complex64)
    out = cplx.to_complex(dsp.fractional_delay(cplx.planar_np(x)[None], np.array([0.3])))
    want = np.exp(1j * 0.2 * (n + 0.3))
    err = np.abs(out[0, 30:-30] - want[30:-30])
    # 21-tap rectangular sinc ripple (same truncation as the reference)
    assert err.max() < 5e-2


def test_peak_energy_find_parabolic():
    # A triangular peak at 10.5 gives toa ~10.5 under parabolic interp
    e = np.zeros(32, np.float32)
    e[10], e[11] = 1.0, 1.0
    e[9] = e[12] = 0.4
    v = np.stack([np.sqrt(e), np.zeros_like(e)], axis=-1)
    toa, _ = dsp.peak_energy_find(v[None], 3, dsp.PEAK_EARLY_LATE)
    assert abs(float(np.array(toa)[0]) - 10.5) < 0.6


def test_sig_normalize_energy(rng):
    x = rand_c(rng, 4, 100) * 7.3
    y = dsp.sig_normalize(cplx.planar_np(x), 1, 0.0)
    np.testing.assert_allclose(np.mean(cplx.abs2(y), axis=-1), 1.0, rtol=1e-4)
