"""Complex-vector DSP primitives (TPU-native libosmo-dsp equivalents).

Replaces the osmo_cxvec_* kernels the reference leans on (SURVEY.md
§2.6): signal normalization, strided correlation, windowed peak search
with sub-sample interpolation, sinc fractional-delay, long correlation.
All signals are PLANAR complex — float32 with a trailing (re, im) axis
(see ops/cplx.py; the axon TPU backend has no complex64) — batched over
leading axes and built from gathers + matmuls so XLA maps everything
onto the MXU/VPU with static shapes.

Sub-sample peak interpolation note: libosmo-dsp's PEAK_EARLY_LATE /
PEAK_WEIGH_WIN are reimplemented (parabolic / energy-centroid) to match
within the SNR bound, not bit-exactly (SURVEY.md §7 hard part e).
"""

from __future__ import annotations

from functools import lru_cache

import jax
import jax.numpy as jnp
import numpy as np

from . import cplx

PEAK_EARLY_LATE = "early_late"
PEAK_WEIGH_WIN = "weigh_win"


def sig_normalize(x, decim: int, freq_shift):
    """Decimate, frequency-shift, and amplitude-normalize a planar signal.

    out[..., i, :] = x[..., i*decim, :] * exp(1j*freq_shift*i), scaled to
    unit average energy.  freq_shift is radians per OUTPUT sample
    (matching osmo_cxvec_sig_normalize as used at reference fcch.c:230 —
    rad/sym with decim=sps — and pi4cxpsk.c:539 — rad/sample, decim=1).
    freq_shift may be scalar or per-batch (...,).
    """
    x = jnp.asarray(x, jnp.float32)
    y = x[..., ::decim, :]
    n = y.shape[-2]
    i = jnp.arange(n, dtype=jnp.float32)
    shift = jnp.asarray(freq_shift, jnp.float32)[..., None]
    y = cplx.mul(y, cplx.expi(shift * i))
    energy = jnp.mean(cplx.abs2(y), axis=-1, keepdims=True)
    return y * jax.lax.rsqrt(jnp.maximum(energy, 1e-30))[..., None]


@lru_cache(maxsize=None)
def _window_idx(n_out: int, ref_len: int, step: int) -> np.ndarray:
    """Gather index (n_out, ref_len): idx[k, j] = k + j*step."""
    return (np.arange(n_out)[:, None]
            + np.arange(ref_len)[None, :] * step).astype(np.int32)


def correlate(ref, win, step: int):
    """Strided sliding correlation (osmo_cxvec_correlate semantics).

    out[..., k, :] = sum_j conj(ref[j]) * win[..., k + j*step, :]
    for k in [0, win_len - ref_len*step + 1).  ref: (L, 2) planar.
    """
    ref = jnp.asarray(ref, jnp.float32)
    win = jnp.asarray(win, jnp.float32)
    n_out = win.shape[-2] - ref.shape[-2] * step + 1
    # Strided correlation as a kernel-dilated conv: XLA tiles it onto
    # the MXU without materializing the (batch, n_out, L, 2) window
    # gather (which cost more than the rest of the demod combined).
    batch_shape = win.shape[:-2]
    x = win.reshape(-1, win.shape[-2], 2).transpose(0, 2, 1)  # (B, 2, W)
    rr, ri = ref[..., 0], ref[..., 1]
    k = jnp.stack([jnp.stack([rr, ri]), jnp.stack([-ri, rr])])
    y = jax.lax.conv_general_dilated(
        x, k, window_strides=(1,), padding="VALID",
        rhs_dilation=(step,),
        dimension_numbers=("NCH", "OIH", "NCH"),
    )  # (B, 2, W - (L-1)*step) — step-1 extra tail positions
    y = y[..., :n_out].transpose(0, 2, 1)
    return y.reshape(*batch_shape, n_out, 2)


def correlate_conv(ref, win):
    """Unstrided linear correlation via XLA convolution for LONG windows.

    out[..., k, :] = sum_j conj(ref[j]) * win[..., k+j, :].  Uses
    conv_general_dilated with 2 feature channels (re, im), which XLA
    tiles onto the MXU — the replacement for the reference's FFT-based
    overlap-save plans (fcch.c:583) on a backend without complex FFTs.
    """
    ref = np.asarray(ref, np.float32)
    win = jnp.asarray(win, jnp.float32)
    batch_shape = win.shape[:-2]
    l = win.shape[-2]
    x = win.reshape(-1, l, 2).transpose(0, 2, 1)  # (B, C=2, W)
    rr, ri = ref[..., 0], ref[..., 1]
    # kernel layout (out_ch, in_ch, K)
    k = np.stack([np.stack([rr, ri]), np.stack([-ri, rr])]).astype(np.float32)
    y = jax.lax.conv_general_dilated(
        x, jnp.asarray(k), window_strides=(1,), padding="VALID",
        dimension_numbers=("NCH", "OIH", "NCH"),
    )  # (B, 2, W-K+1)
    y = y.transpose(0, 2, 1)
    return y.reshape(*batch_shape, y.shape[-2], 2)


def peak_energy_find(v, wl: int, mode: str):
    """Windowed peak search with sub-sample refinement on planar v.

    Returns (toa, peak_val): fractional peak position (...,) float32 and
    the planar complex value at the integer peak (..., 2).  Equivalent
    role to osmo_cxvec_peak_energy_find (pi4cxpsk.c:240, fcch.c:238,596).
    """
    v = jnp.asarray(v, jnp.float32)
    return _peak_from_energy(cplx.abs2(v), v, wl, mode)


def peak_find_energy(e, wl: int, mode: str):
    """peak_energy_find on PRECOMPUTED energies (..., N): returns the
    fractional peak position only.  Both the windowed argmax and the
    sub-sample refinement (energy-ratio / energy-centroid) are invariant
    to a per-batch positive scale of e — which is what lets the
    incremental FCCH scan skip the one-shot global sig_normalize."""
    toa, _ = _peak_from_energy(jnp.asarray(e, jnp.float32), None, wl, mode)
    return toa


def _peak_from_energy(e, v, wl: int, mode: str):
    n = e.shape[-1]
    half = wl // 2
    ew = _moving_sum(e, wl)
    idx = jnp.argmax(ew, axis=-1)
    peak_val = None if v is None else jnp.take_along_axis(
        v, idx[..., None, None], axis=-2)[..., 0, :]

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
    e = cplx.abs2(jnp.asarray(v))
    _, idx = jax.lax.top_k(e, k)
    return idx


@lru_cache(maxsize=None)
def _sinc_base(n_taps: int) -> np.ndarray:
    return (np.arange(n_taps) - (n_taps // 2)).astype(np.float32)


def fractional_delay(x, frac, n_taps: int = 21):
    """Shift planar x (..., L, 2) by per-batch frac: out[n] ~= x(n + frac).

    Matches the reference's alignment filter (pi4cxpsk.c:310-326),
    21-tap windowed sinc, frac in (-0.5, 0.5).
    """
    x = jnp.asarray(x, jnp.float32)
    frac = jnp.asarray(frac, jnp.float32)
    base = jnp.asarray(_sinc_base(n_taps))
    taps = jnp.sinc(base - frac[..., None])  # (..., n_taps)
    half = n_taps // 2
    pad = [(0, 0)] * (x.ndim - 2) + [(half, half), (0, 0)]
    xp = jnp.pad(x, pad)
    n = x.shape[-2]
    idx = jnp.asarray(_window_idx(n, n_taps, 1))
    gath = xp[..., idx, :]  # (..., L, n_taps, 2)
    return jnp.sum(gath * taps[..., None, :, None], axis=-2)
