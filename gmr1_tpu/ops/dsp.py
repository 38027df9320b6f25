"""Complex-vector DSP primitives (TPU-native libosmo-dsp equivalents).

Replaces the osmo_cxvec_* kernels the reference leans on (SURVEY.md
§2.6): signal normalization, strided correlation, windowed peak search
with sub-sample interpolation, sinc fractional-delay, FFT correlation.
Everything is batched over a leading axis and built from gathers +
matmuls + FFTs so XLA maps it onto the MXU/VPU; there are no
data-dependent shapes.

Sub-sample peak interpolation note: libosmo-dsp's PEAK_EARLY_LATE /
PEAK_WEIGH_WIN are reimplemented (parabolic / energy-centroid) to match
within the SNR bound, not bit-exactly (SURVEY.md §7 hard part e).
"""

from __future__ import annotations

from functools import lru_cache

import jax
import jax.numpy as jnp
import numpy as np

PEAK_EARLY_LATE = "early_late"
PEAK_WEIGH_WIN = "weigh_win"


def sig_normalize(x, decim: int, freq_shift):
    """Decimate, frequency-shift, and amplitude-normalize a signal.

    out[..., i] = x[..., i*decim] * exp(1j*freq_shift*i), scaled to unit
    average energy.  freq_shift is radians per OUTPUT sample (matching
    osmo_cxvec_sig_normalize as used at reference fcch.c:230 — rad/sym
    with decim=sps — and pi4cxpsk.c:539 — rad/sample with decim=1).
    freq_shift may be a scalar or a per-batch array (...,).
    """
    x = jnp.asarray(x)
    y = x[..., ::decim]
    n = y.shape[-1]
    i = jnp.arange(n, dtype=jnp.float32)
    shift = jnp.asarray(freq_shift, jnp.float32)[..., None]
    rot = jnp.exp(1j * shift * i).astype(jnp.complex64)
    y = y * rot
    energy = jnp.mean(jnp.abs(y) ** 2, axis=-1, keepdims=True)
    return y * jax.lax.rsqrt(jnp.maximum(energy, 1e-30)).astype(jnp.complex64)


@lru_cache(maxsize=None)
def _window_idx(n_out: int, ref_len: int, step: int) -> np.ndarray:
    """Gather index (n_out, ref_len): idx[k, j] = k + j*step."""
    return (np.arange(n_out)[:, None]
            + np.arange(ref_len)[None, :] * step).astype(np.int32)


def correlate(ref, win, step: int):
    """Strided sliding correlation (osmo_cxvec_correlate semantics).

    out[..., k] = sum_j conj(ref[j]) * win[..., k + j*step]
    for k in [0, win_len - ref_len*step + 1).
    """
    ref = jnp.asarray(ref, jnp.complex64)
    win = jnp.asarray(win, jnp.complex64)
    n_out = win.shape[-1] - ref.shape[-1] * step + 1
    idx = jnp.asarray(_window_idx(n_out, ref.shape[-1], step))
    gath = win[..., idx]  # (..., n_out, ref_len)
    return gath @ jnp.conj(ref)


def peak_energy_find(v, wl: int, mode: str):
    """Windowed peak search with sub-sample refinement.

    Returns (toa, peak_val): fractional peak position (...,) float32 and
    the complex value at the integer peak (...,).  Equivalent role to
    osmo_cxvec_peak_energy_find (used at pi4cxpsk.c:240, fcch.c:238,596).
    """
    v = jnp.asarray(v, jnp.complex64)
    e = jnp.abs(v) ** 2
    n = e.shape[-1]
    half = wl // 2
    ew = _moving_sum(e, wl)
    idx = jnp.argmax(ew, axis=-1)
    peak_val = jnp.take_along_axis(v, idx[..., None], axis=-1)[..., 0]

    if mode == PEAK_EARLY_LATE:
        im = jnp.clip(idx - 1, 0, n - 1)
        ip = jnp.clip(idx + 1, 0, n - 1)
        e0 = jnp.take_along_axis(e, im[..., None], axis=-1)[..., 0]
        e1 = jnp.take_along_axis(e, idx[..., None], axis=-1)[..., 0]
        e2 = jnp.take_along_axis(e, ip[..., None], axis=-1)[..., 0]
        denom = 2.0 * e1 - e0 - e2
        frac = jnp.where(jnp.abs(denom) > 1e-20,
                         0.5 * (e2 - e0) / jnp.maximum(denom, 1e-20), 0.0)
        frac = jnp.clip(frac, -1.0, 1.0)
        toa = idx.astype(jnp.float32) + frac
    else:  # PEAK_WEIGH_WIN: energy centroid over the window
        offs = jnp.arange(-half, half + 1)
        pos = jnp.clip(idx[..., None] + offs, 0, n - 1)
        ew_ = jnp.take_along_axis(e, pos, axis=-1)
        toa = (jnp.sum(ew_ * pos.astype(jnp.float32), axis=-1)
               / jnp.maximum(jnp.sum(ew_, axis=-1), 1e-20))
    return toa, peak_val


def _moving_sum(e, wl: int):
    """Centered moving sum of length wl along the last axis."""
    half = wl // 2
    pad = [(0, 0)] * (e.ndim - 1) + [(half, wl - 1 - half)]
    ep = jnp.pad(e, pad)
    cs = jnp.cumsum(ep, axis=-1)
    zero = jnp.zeros((*cs.shape[:-1], 1), cs.dtype)
    cs = jnp.concatenate([zero, cs], axis=-1)
    return cs[..., wl:] - cs[..., :-wl]


def peaks_scan(v, k: int):
    """Indices of the k highest-energy bins, descending (osmo_cxvec_peaks_scan)."""
    e = jnp.abs(jnp.asarray(v)) ** 2
    _, idx = jax.lax.top_k(e, k)
    return idx


@lru_cache(maxsize=None)
def _sinc_base(n_taps: int) -> np.ndarray:
    return (np.arange(n_taps) - (n_taps // 2)).astype(np.float32)


def fractional_delay(x, frac, n_taps: int = 21):
    """Shift x (..., L) by a per-batch fractional offset via sinc interp.

    Matches the reference's alignment filter (pi4cxpsk.c:310-326):
    out[n] ~= x(n + frac), frac in (-0.5, 0.5), 21-tap windowed sinc.
    """
    x = jnp.asarray(x, jnp.complex64)
    frac = jnp.asarray(frac, jnp.float32)
    base = jnp.asarray(_sinc_base(n_taps))
    taps = jnp.sinc(base - frac[..., None])  # (..., n_taps)
    half = n_taps // 2
    pad = [(0, 0)] * (x.ndim - 1) + [(half, half)]
    xp = jnp.pad(x, pad)
    n = x.shape[-1]
    idx = jnp.asarray(_window_idx(n, n_taps, 1))
    gath = xp[..., idx]  # (..., L, n_taps)
    return jnp.sum(gath * taps[..., None, :], axis=-1)


def fft_correlate(ref, win):
    """Full linear correlation via FFT: out[k] = sum_j conj(ref[j]) win[k+j].

    For long search windows (FCCH rough over 330/650 ms) this replaces
    the O(L*M) time-domain correlate with O(L log L) — the TPU win
    called out in SURVEY.md §7.4.
    """
    ref = jnp.asarray(ref, jnp.complex64)
    win = jnp.asarray(win, jnp.complex64)
    m = ref.shape[-1]
    n_out = win.shape[-1] - m + 1
    size = int(2 ** np.ceil(np.log2(win.shape[-1] + m)))
    wf = jnp.fft.fft(win, size, axis=-1)
    rf = jnp.fft.fft(jnp.conj(ref[::-1]), size, axis=-1)
    full = jnp.fft.ifft(wf * rf, axis=-1)
    return full[..., m - 1:m - 1 + n_out]
