"""DKAB detection/demod tests (reference src/sdr/dkab.c behavior)."""

import numpy as np

from gmr1_tpu.ops import cplx
from gmr1_tpu.sdr import dkab


def make_dkab(rng, sps, p, bits, off=0, n_extra=16, noise=0.01, amp=1.0):
    """Synthesize a DKAB: two 5-symbol tones whose adjacent-symbol
    differential phase encodes 4 bits each (0 -> 0, 1 -> pi), under the
    global pi/4-per-symbol rotation the demod removes."""
    n = dkab.DKAB_SYMS * sps + n_extra
    sig = (rng.standard_normal(n) + 1j * rng.standard_normal(n)) * noise
    for tone, base in enumerate((2 + p, 2 + p + 59)):
        ph = 0.0
        for s in range(5):
            if s > 0:
                ph += np.pi * bits[tone * 4 + (s - 1)]
            for k in range(sps):
                i = off + (base + s) * sps + k
                sym = base + s  # global pi/4 rotation per input sample /sps
                sig[i] += amp * np.exp(1j * (ph + (np.pi / 4) * i / sps))
    return cplx.from_complex(sig.astype(np.complex64))


def test_dkab_demod_bits(rng):
    sps, p, off = 4, 5, 7
    bits = [0, 1, 1, 0, 1, 0, 0, 1]
    x = make_dkab(rng, sps, p, bits, off=off)
    r = dkab.demod(x, sps, p)
    assert bool(r.found)
    # the demod centers energy at toa + (sps-1)/2 (dkab.c:116)
    assert abs(float(r.toa) - (off + (sps - 1) / 2.0)) <= 1.0
    hard = (np.asarray(r.ebits) < 0).astype(int).tolist()
    assert hard == bits
    assert (np.abs(np.asarray(r.ebits)) > 100).all()


def test_dkab_not_found_on_noise(rng):
    sps, p = 4, 5
    n = dkab.DKAB_SYMS * sps + 16
    sig = (rng.standard_normal(n) + 1j * rng.standard_normal(n)).astype(
        np.complex64)
    r = dkab.demod(cplx.from_complex(sig), sps, p)
    assert not bool(r.found)


def test_dkab_batched(rng):
    sps, p = 4, 11
    bits_a = [0, 0, 0, 0, 1, 1, 1, 1]
    bits_b = [1, 0, 1, 0, 0, 1, 0, 1]
    xa = np.asarray(make_dkab(rng, sps, p, bits_a, off=3))
    xb = np.asarray(make_dkab(rng, sps, p, bits_b, off=9))
    r = dkab.demod(np.stack([xa, xb]), sps, p)
    assert np.asarray(r.found).all()
    hard = (np.asarray(r.ebits) < 0).astype(int)
    assert hard[0].tolist() == bits_a
    assert hard[1].tolist() == bits_b
