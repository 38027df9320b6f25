"""FCCH chirp synchronization (reference src/sdr/fcch.c, TS 101 376-5-4 §8).

The FCCH burst is a dual chirp (sum of an up- and a down-chirp).  Four
operations, re-designed TPU-first:

  rough        coarse TOA: dual-chirp correlation over a >320 ms window.
               The reference runs a time-domain O(N*L) correlation
               (fcch.c:233); here it is an XLA conv_general_dilated that
               tiles onto the MXU (ops/dsp.correlate_conv).
  rough_multi  multi-beam scan over >=650 ms: correlate, mix the two
               320 ms SI cycles, threshold at avg+3*stddev, rising-edge
               peak scan + Lp-wrapped dedup (fcch.c:342-496).  Heavy
               math on device; the tiny O(#candidates) dedup on host.
  fine         fine TOA + frequency error: mix with up/down chirps and
               locate the two spectral peaks (fcch.c:513-628).  The
               117/468-pt FFTs become dense planar DFT matmuls
               (ops/cplx.dft) — ideal MXU shapes, no complex dtype.
  snr          FFT-peak-over-noise estimate (fcch.c:644-708).

rough/fine/snr are batched over leading axes and jitted per
(burst_type, sps); all shapes static.
"""

from __future__ import annotations

from dataclasses import dataclass
from functools import lru_cache, partial

import jax
import jax.numpy as jnp
import numpy as np

from ..ops import cplx, dsp
from .defs import SYM_RATE


@dataclass(frozen=True)
class FcchBurst:
    """FCCH burst format (reference fcch.c:50-70)."""
    freq: float      # chirp frequency excursion (cycles/symbol at edges)
    len_syms: int    # burst length in symbols


FCCH = FcchBurst(freq=0.32, len_syms=3 * 39)            # GMR-1 (fcch.c:50)
FCCH3_LBAND = FcchBurst(freq=0.32, len_syms=12 * 39)    # fcch.c:59
FCCH3_SBAND = FcchBurst(freq=0.16, len_syms=12 * 39)    # fcch.c:67


@lru_cache(maxsize=None)
def _chirp_np(burst: FcchBurst, sps: int, kind: str) -> np.ndarray:
    """Planar chirp reference (fcch.c:92-193).

    kind: 'up'   = (sqrt2/2) exp(+j*phi(t))
          'down' = (sqrt2/2) exp(-j*phi(t))
          'dual' = sqrt2 * cos(phi(t))      (real only)
    with phi(t) = 2*pi*freq*(t - T/2)^2 / T, t in symbols.
    """
    l = burst.len_syms * sps
    pos = np.arange(l, dtype=np.float32) / sps - burst.len_syms / 2.0
    phase = (burst.freq * 2.0 * np.pi / burst.len_syms) * pos * pos
    if kind == "dual":
        z = np.sqrt(2.0) * np.cos(phase) + 0j
    elif kind == "up":
        z = np.sqrt(2.0) / 2.0 * np.exp(1j * phase)
    else:
        z = np.sqrt(2.0) / 2.0 * np.exp(-1j * phase)
    return cplx.planar_np(z.astype(np.complex64))


@partial(jax.jit, static_argnames=("burst", "sps"))
def rough(burst: FcchBurst, x, sps: int, freq_shift=0.0):
    """Coarse FCCH TOA over a search window (gmr1_fcch_rough, fcch.c:212).

    x: planar (..., N, 2) with N > (320 ms + burst) * sps.  Returns
    int32 TOA in input samples (...,).
    """
    y = dsp.sig_normalize(x, sps, freq_shift)
    corr = dsp.correlate_conv(_chirp_np(burst, 1, "dual"), y)
    toa, _ = dsp.peak_energy_find(corr, 5, dsp.PEAK_WEIGH_WIN)
    return jnp.round(toa * sps).astype(jnp.int32)


@partial(jax.jit, static_argnames=("burst", "sps"))
def fine(burst: FcchBurst, x, sps: int, freq_shift=0.0):
    """Fine TOA + frequency error (gmr1_fcch_fine, fcch.c:513).

    x: planar (..., len_syms*sps, 2).  Returns (toa int32 in input
    samples, freq_error float32 rad/symbol), both (...,).  freq_error
    excludes the pre-applied freq_shift.
    """
    y = dsp.sig_normalize(x, sps, freq_shift)
    n = burst.len_syms
    assert y.shape[-2] == n, (y.shape, n)
    mid = n >> 1

    up = jnp.asarray(_chirp_np(burst, 1, "up"))
    down = jnp.asarray(_chirp_np(burst, 1, "down"))
    # pre-shift so frequency 0 lands on bin `mid` (centered FFT,
    # fcch.c:574-580), then dense-DFT and peak-search both spectra.
    shift = cplx.expi(2.0 * np.pi * mid / n * jnp.arange(n, dtype=jnp.float32))
    mix = jnp.stack([cplx.mul(y, up), cplx.mul(y, down)], axis=-3)
    spec = cplx.dft(cplx.mul(mix, shift))
    peak, _ = dsp.peak_energy_find(
        jnp.moveaxis(spec, -3, 0), 5, dsp.PEAK_WEIGH_WIN)

    bin_hz = SYM_RATE / n
    peak_up = (peak[0] - mid) * bin_hz
    peak_down = (peak[1] - mid) * bin_hz

    freq_err_hz = (peak_up + peak_down) / 2.0
    freq_error = 2.0 * np.pi * freq_err_hz / SYM_RATE

    chirp_rate = 2.0 * burst.freq * SYM_RATE * SYM_RATE / (n * 1000.0)
    toa_ms = (peak_up - peak_down) / 2.0 / chirp_rate
    toa = jnp.round(toa_ms * SYM_RATE * sps / 1000.0).astype(jnp.int32)
    return toa, freq_error


@partial(jax.jit, static_argnames=("burst", "sps"))
def snr(burst: FcchBurst, x, sps: int, freq_shift=0.0):
    """FFT peak-over-noise SNR estimate (gmr1_fcch_snr, fcch.c:644).

    x: planar (..., len_syms*sps, 2).  SNR = (top 2 peak energies) /
    (energies of peaks 5 and 6) of the dual-chirp-mixed spectrum.
    """
    y = dsp.sig_normalize(x, sps, freq_shift)
    n = burst.len_syms
    assert y.shape[-2] == n, (y.shape, n)
    ref_real = jnp.asarray(_chirp_np(burst, 1, "dual")[:, 0])
    spec = cplx.dft(y * ref_real[:, None])
    e = cplx.abs2(spec)
    top, _ = jax.lax.top_k(e, 6)
    return (top[..., 0] + top[..., 1]) / (top[..., 4] + top[..., 5])


# --------------------------------------------------------------------------
# rough_multi: multi-beam acquisition
# --------------------------------------------------------------------------

_LW_MS = 320   # scan window / SI periodicity (fcch.c:380-383)


@partial(jax.jit, static_argnames=("burst",))
def scan_pwr(burst: FcchBurst, seg):
    """Incremental-scan building block: dual-chirp correlation POWER of
    a symbol-rate segment (..., L, 2) -> (..., L - len_syms + 1).

    Feeding consecutive overlapping segments (each extended len_syms-1
    symbols into the past) and concatenating yields the same power
    series the one-shot rough()/rough_multi() compute over the whole
    window — up to a per-carrier positive scale, because this skips
    sig_normalize.  Every downstream consumer (windowed-argmax +
    centroid refinement, avg+3*std threshold, power-ORDERED beam dedup)
    is invariant to that scale, so the scan can stream block-by-block
    without ever holding the whole prefix (fcch.c:212-342 re-ordered as
    windows-ending-in-this-block)."""
    corr = dsp.correlate_conv(_chirp_np(burst, 1, "dual"), seg)
    return cplx.abs2(corr)


@partial(jax.jit, static_argnames=("burst", "sps"))
def rough_from_pwr(burst: FcchBurst, pwr, sps: int):
    """rough() from accumulated correlation power (..., n): same
    windowed peak + centroid refinement, returns int32 TOA in input
    samples (scale-free; see scan_pwr)."""
    toa = dsp.peak_find_energy(pwr, 5, dsp.PEAK_WEIGH_WIN)
    return jnp.round(toa * sps).astype(jnp.int32)


@partial(jax.jit, static_argnames=("burst", "sps"))
def _rough_multi_device(burst: FcchBurst, x, sps: int, freq_shift):
    """Device half of rough_multi: correlation power, periodicity mix,
    threshold (fcch.c:366-454).  x: planar (N, 2), single window.

    Returns (mixed (Lw,), threshold scalar, nLp scalar, lp_ok bool).
    """
    y = dsp.sig_normalize(x, sps, freq_shift)
    corr = dsp.correlate_conv(_chirp_np(burst, 1, "dual"), y)
    return _rough_multi_pwr(burst, cplx.abs2(corr))


@partial(jax.jit, static_argnames=("burst",))
def _rough_multi_pwr(burst: FcchBurst, pwr):
    """Periodicity mix + threshold from correlation power (pwr may be
    unnormalized — every output is scale-equivariant or -invariant)."""
    lw = (_LW_MS * SYM_RATE) // 1000 + burst.len_syms
    lp = (_LW_MS * SYM_RATE) // 1000

    # strongest peak within the first Lw samples
    idx = jnp.argmax(jnp.where(jnp.arange(pwr.shape[0]) < lw, pwr, -1.0))

    # refine the periodicity: energy centroid +-10 around the peak and
    # around peak+Lp; nLp = centroid distance (fcch.c:399-430)
    offs = jnp.arange(-10, 11)
    def centroid(base):
        j = base + offs
        ok = (j > 0) & (j < pwr.shape[0])
        w = jnp.where(ok, pwr[jnp.clip(j, 0, pwr.shape[0] - 1)], 0.0)
        return jnp.sum(w * j) / jnp.maximum(jnp.sum(w), 1e-20)
    n_lp = jnp.round(centroid(idx + lp) - centroid(idx)).astype(jnp.int32)
    lp_ok = jnp.abs(n_lp - lp) <= 10

    # mix the two SI cycles: geometric mean of pwr[i] and pwr[i+nLp]
    second = jax.lax.dynamic_slice_in_dim(
        pwr, jnp.clip(n_lp, 0, pwr.shape[0] - lw), lw)
    mixed = jnp.sqrt(pwr[:lw] * second)

    avg = jnp.mean(mixed)
    std = jnp.sqrt(jnp.mean((mixed - avg) ** 2))
    return mixed, avg + 3.0 * std, n_lp, lp_ok


def _edge_candidates(mixed: np.ndarray, th: float, sps: int):
    """Rising-edge peak scan (fcch.c:457-483), numpy-vectorized.
    Returns [(toa_in_samples, power), ...]."""
    above = mixed > th
    above[0] = above[-1] = False
    rise = np.flatnonzero(above & ~np.roll(above, 1))
    out = []
    for i in rise:
        p_pwr = float(mixed[i - 1] + mixed[i] + mixed[i + 1])
        p_fpos = float(-mixed[i - 1] + mixed[i + 1]) / p_pwr
        out.append((int(round((i + p_fpos) * sps)), p_pwr))
    return out


def _dedup_insert(cands, lp: int, half: int, n: int) -> list[int]:
    """Power-ordered insert with Lp-wrapped dedup (fcch.c:264-326)."""
    toas: list[int] = []
    pwrs: list[float] = []
    for p_pos, p_pwr in cands:
        dupe_stronger = False
        keep = []
        for t, p in zip(toas, pwrs):
            if abs((t % lp) - (p_pos % lp)) <= half:
                if p > p_pwr:
                    dupe_stronger = True
                else:
                    continue          # drop the weaker duplicate
            keep.append((t, p))
        toas, pwrs = [t for t, _ in keep], [p for _, p in keep]
        if dupe_stronger:
            continue
        k = next((j for j, p in enumerate(pwrs) if p_pwr > p), len(pwrs))
        if k < n:
            toas.insert(k, p_pos)
            pwrs.insert(k, p_pwr)
            del toas[n:], pwrs[n:]
    return toas


def rough_multi(burst: FcchBurst, x, sps: int, freq_shift=0.0,
                n: int = 16) -> list[int]:
    """Multi-FCCH rough acquisition (gmr1_fcch_rough_multi, fcch.c:342).

    x: planar (N, 2) with N >= 650 ms of signal.  Returns up to n TOAs
    (input samples), strongest first.  Device does the O(N*L)
    correlation + mixing; the O(#candidates) rising-edge scan and
    Lp-window dedup run on host (they are sequential and tiny).
    """
    x = np.asarray(x)
    if x.shape[0] < (650 * SYM_RATE * sps) // 1000:
        raise ValueError("need >= 650 ms of signal")
    mixed, th, n_lp, lp_ok = jax.device_get(
        _rough_multi_device(burst, jnp.asarray(x), sps,
                            jnp.asarray(freq_shift, jnp.float32)))
    if not lp_ok:
        raise ValueError(f"SI periodicity mismatch (nLp={int(n_lp)})")
    half = (burst.len_syms * sps) >> 1
    return _dedup_insert(_edge_candidates(mixed, th, sps),
                         int(n_lp), half, n)


def _beams_from_mixed(burst, sps, k, mixed, th, n_lp, lp_ok):
    """Host half of the batched multi-beam scan: per carrier, rising-
    edge candidates + Lp-wrapped power-ordered dedup."""
    half = (burst.len_syms * sps) >> 1
    m = mixed.shape[0]
    toas = np.full((m, k), -1, np.int64)
    for c in range(m):
        if not lp_ok[c]:
            continue
        got = _dedup_insert(_edge_candidates(mixed[c], float(th[c]), sps),
                            int(n_lp[c]), half, k)
        toas[c, :len(got)] = got
    return toas, toas >= 0


def rough_multi_batch(burst: FcchBurst, x, sps: int, k: int = 4,
                      freq_shift=0.0):
    """Batched multi-beam rough acquisition over carriers.

    x: planar (M, N, 2), N >= 650 ms + burst.  Returns (toas (M, k)
    int64, valid (M, k) bool), strongest beam first per carrier.
    Carriers with no SI periodicity (noise channels) get no beams.
    """
    x = jnp.asarray(x)
    m = x.shape[0]
    fs = jnp.broadcast_to(jnp.asarray(freq_shift, jnp.float32), (m,))
    mixed, th, n_lp, lp_ok = jax.device_get(jax.vmap(
        lambda xx, ff: _rough_multi_device(burst, xx, sps, ff))(x, fs))
    return _beams_from_mixed(burst, sps, k, mixed, th, n_lp, lp_ok)


def rough_multi_batch_pwr(burst: FcchBurst, pwr, sps: int, k: int = 4):
    """rough_multi_batch from ACCUMULATED correlation power (M, n) —
    the incremental-scan form (see scan_pwr for why normalization is
    unnecessary)."""
    mixed, th, n_lp, lp_ok = jax.device_get(jax.vmap(
        lambda p: _rough_multi_pwr(burst, p))(jnp.asarray(pwr)))
    return _beams_from_mixed(burst, sps, k, mixed, th, n_lp, lp_ok)
