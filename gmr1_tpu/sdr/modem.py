"""Batched pi/2-CBPSK / pi/4-CBPSK / pi/4-CQPSK modem (planar complex).

TPU-native rebuild of the reference's data-driven burst demodulator
(src/sdr/pi4cxpsk.c, SURVEY.md §2.1/§3.1).  One jitted kernel per
(burst type, sps, search window) configuration processes a whole batch
of burst windows at once:

  normalize/derotate -> per-sync-sequence strided correlation ->
  sub-sample peak (TOA) -> best sync id -> align/decimate (sinc
  fractional delay for sps<4) -> chunk-phase fine frequency estimate ->
  derotate -> sync-phase derotation -> phase -> soft symbols ->
  quantized soft bits (bit-exact re-implementation of the reference's
  quantizer, pi4cxpsk.c:479-499).

All signals are planar complex float32 (..., time, 2) — the axon TPU
backend has no complex64 (ops/cplx.py).  Data-dependent choices
(winning sync sequence, per-burst TOA) are branch-free: every candidate
is computed and the winner selected with jnp.where/take_along_axis, the
XLA form of the reference's sequential scan.
"""

from __future__ import annotations

from functools import partial
from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

from ..ops import cplx, dsp
from .bursts import Burst


class DemodResult(NamedTuple):
    ebits: jax.Array      # (..., ebits) int8 soft bits (osmocom sbit)
    sync_id: jax.Array    # (...,) int32 winning sync sequence
    toa: jax.Array        # (...,) float32 fractional TOA in samples
    freq_err: jax.Array   # (...,) float32 rad/symbol residual
    pwr: jax.Array        # (...,) float32 normalized correlation power


def _ref_planar(burst: Burst, sid: int, ci: int) -> jnp.ndarray:
    return jnp.asarray(cplx.planar_np(burst.sync_ref(sid)[ci]))


def _sync_correlate(burst: Burst, y, sps: int):
    """Per-sync-id combined |correlation| over the search window.

    Returns (corr_abs [S] of (..., w), total_len [S]).
    """
    w = y.shape[-2] - burst.len_syms * sps + 1
    corr_abs, totals = [], []
    for sid in range(burst.n_sync):
        acc = None
        tl = 0
        for ci, chunk in enumerate(burst.sync[sid]):
            b = chunk.pos * sps
            seg = y[..., b:b + chunk.length * sps + w - 1, :]
            c = dsp.correlate(_ref_planar(burst, sid, ci), seg, sps)
            a = cplx.absv(c)
            acc = a if acc is None else acc + a
            tl += chunk.length
        corr_abs.append(acc)
        totals.append(tl)
    return corr_abs, totals


@partial(jax.jit, static_argnames=("burst", "sps", "win"))
def demod(burst: Burst, x, sps: int, win: int, freq_shift=0.0) -> DemodResult:
    """Demodulate burst windows x (..., burst.len_syms*sps + win, 2).

    freq_shift is radians/symbol pre-applied (reference passes
    -freq_err); win is the TOA search window in samples.
    """
    x = jnp.asarray(x, jnp.float32)
    n_len = burst.len_syms
    rot = burst.mod.rotation
    y = dsp.sig_normalize(
        x, 1, (jnp.asarray(freq_shift, jnp.float32) - rot) / sps
    )
    w = y.shape[-2] - n_len * sps + 1
    assert w == win + 1, (w, win)

    # --- sync search over all sequences -------------------------------
    corr_abs, totals = _sync_correlate(burst, y, sps)
    toas, pwrs = [], []
    for sid in range(burst.n_sync):
        # corr_abs is already a magnitude; feed it as a planar vector
        # with zero imag so peak finding sees the same energies.
        planar = jnp.stack([corr_abs[sid], jnp.zeros_like(corr_abs[sid])],
                           axis=-1)
        toa_s, peak = dsp.peak_energy_find(planar, 3, dsp.PEAK_EARLY_LATE)
        toas.append(toa_s)
        pwrs.append(cplx.abs2(peak) / float(totals[sid]) ** 2)
    toa_all = jnp.stack(toas, axis=-1)   # (..., S)
    pwr_all = jnp.stack(pwrs, axis=-1)
    sync_id = jnp.argmax(pwr_all, axis=-1).astype(jnp.int32)
    toa = jnp.take_along_axis(toa_all, sync_id[..., None], axis=-1)[..., 0]
    pwr = jnp.take_along_axis(pwr_all, sync_id[..., None], axis=-1)[..., 0]

    # --- align & decimate to 1 sps ------------------------------------
    # The integer alignment is one of win+1 candidates, so instead of a
    # data-dependent gather (slow general-gather on TPU) we take all
    # win+1 statically-strided views and contract with a one-hot of the
    # winning offset — a small matmul the MXU eats.
    d_int = jnp.round(toa).astype(jnp.int32)
    d_int = jnp.clip(d_int, 0, y.shape[-2] - 1 - (n_len - 1) * sps)
    if sps < 4:
        frac = toa - jnp.round(toa)
        y = dsp.fractional_delay(y, frac)
    n_off = w  # win + 1 candidate alignments
    # Sum of one-hot-masked strided slices: each candidate alignment is
    # a static strided view of y, scaled by its one-hot weight and
    # accumulated — XLA fuses this into one pass with no materialized
    # (batch, w, n_len, 2) gather (which cost ~8x the rest of demod).
    onehot = jax.nn.one_hot(d_int, n_off, dtype=y.dtype)
    z = jnp.zeros((*y.shape[:-2], n_len, 2), y.dtype)
    for s in range(n_off):
        view = jax.lax.slice_in_dim(y, s, s + (n_len - 1) * sps + 1,
                                    stride=sps, axis=-2)
        z = z + onehot[..., s, None, None] * view

    # --- fine frequency from inter-chunk phase slope ------------------
    freq_errs = []
    for sid in range(burst.n_sync):
        chunks = burst.sync[sid]
        if len(chunks) < 2:
            freq_errs.append(jnp.zeros(z.shape[:-2], jnp.float32))
            continue
        corrs, centers = [], []
        for ci, chunk in enumerate(chunks):
            seg = z[..., chunk.pos:chunk.pos + chunk.length, :]
            corrs.append(cplx.conj_dot(_ref_planar(burst, sid, ci), seg))
            centers.append(chunk.pos + chunk.length / 2.0)
        f = 0.0
        for i in range(1, len(corrs)):
            f = f + (cplx.angle(cplx.conj_mul(corrs[i - 1], corrs[i]))
                     / (centers[i] - centers[i - 1]))
        freq_errs.append(f / (len(corrs) - 1))
    freq_err = jnp.stack(freq_errs, axis=-1)
    freq_err = jnp.take_along_axis(freq_err, sync_id[..., None], axis=-1)[..., 0]

    z = cplx.mul(z, cplx.expi(-freq_err[..., None]
                              * jnp.arange(n_len, dtype=jnp.float32)))

    # --- phase alignment via the sync sequence ------------------------
    phasors = []
    for sid in range(burst.n_sync):
        acc = jnp.zeros((*z.shape[:-2], 2), jnp.float32)
        for ci, chunk in enumerate(burst.sync[sid]):
            seg = z[..., chunk.pos:chunk.pos + chunk.length, :]
            acc = acc + cplx.conj_dot(_ref_planar(burst, sid, ci), seg)
        phasors.append(acc)
    phasor = jnp.take_along_axis(
        jnp.stack(phasors, axis=-2), sync_id[..., None, None], axis=-2
    )[..., 0, :]
    phasor = cplx.normalize(phasor)
    z = cplx.mul(z, cplx.conj(phasor)[..., None, :])

    # --- phase -> soft symbols -> soft bits ---------------------------
    nbits = burst.mod.nbits
    m_syms = 1 << nbits
    d_scale = m_syms / (2.0 * np.pi)
    ssyms = cplx.angle(z) * d_scale
    sv = ssyms[..., jnp.asarray(burst.data_positions)]  # (..., nd)
    svr = jnp.round(sv)
    sp = jnp.mod(svr.astype(jnp.int32), m_syms)
    ss = jnp.mod(jnp.where(svr > sv, sp - 1, sp + 1), m_syms)
    d = jnp.round(2.0 * jnp.abs(svr - sv) * 64.0).astype(jnp.int32)

    def sym_bits(s):
        # Gray bit map in arithmetic form (no per-element table gather):
        # BPSK s -> [s]; CQPSK s -> [s>>1, (s>>1)^(s&1)]
        # (pi4cxpsk.c:71-99, same data as burst.mod.bits_of_sym)
        if nbits == 1:
            return s[..., None]
        return jnp.stack([s >> 1, (s >> 1) ^ (s & 1)], axis=-1)

    vp = sym_bits(sp)              # (..., nd, nbits)
    vs = sym_bits(ss)
    dd = d[..., None]
    mag = 127 - jnp.where(vp != vs, dd, dd >> 1)
    ebits = jnp.where(vp != 0, -mag, mag)
    ebits = ebits.reshape(*ebits.shape[:-2], ebits.shape[-2] * nbits)
    ebits = jnp.clip(ebits, -127, 127).astype(jnp.int8)

    return DemodResult(ebits=ebits, sync_id=sync_id, toa=toa,
                       freq_err=freq_err, pwr=pwr)


@partial(jax.jit, static_argnames=("bursts", "sps", "win"))
def detect(bursts: tuple[Burst, ...], x, sps: int, win: int,
           freq_shift=0.0, e_toa=-1.0):
    """Classify which burst type is present (gmr1_pi4cxpsk_detect).

    Returns (bt_id, sync_id, toa, pwr) per batch element.  When
    e_toa >= 0 the candidate powers are divided by |e_toa - toa|
    (pi4cxpsk.c:657-659).
    """
    x = jnp.asarray(x, jnp.float32)
    rot = bursts[0].mod.rotation
    y = dsp.sig_normalize(
        x, 1, (jnp.asarray(freq_shift, jnp.float32) - rot) / sps
    )
    sids, toas, pwrs = [], [], []
    for bt in bursts:
        corr_abs, totals = _sync_correlate(bt, y, sps)
        t_s, p_s = [], []
        for sid in range(bt.n_sync):
            planar = jnp.stack([corr_abs[sid], jnp.zeros_like(corr_abs[sid])],
                               axis=-1)
            toa_s, peak = dsp.peak_energy_find(planar, 3, dsp.PEAK_EARLY_LATE)
            t_s.append(toa_s)
            p_s.append(cplx.abs2(peak) / float(totals[sid]) ** 2)
        t_all = jnp.stack(t_s, axis=-1)
        p_all = jnp.stack(p_s, axis=-1)
        sid = jnp.argmax(p_all, axis=-1)
        toa_b = jnp.take_along_axis(t_all, sid[..., None], axis=-1)[..., 0]
        pwr_b = jnp.take_along_axis(p_all, sid[..., None], axis=-1)[..., 0]
        e_toa_f = jnp.asarray(e_toa, jnp.float32)
        pwr_b = jnp.where(e_toa_f >= 0,
                          pwr_b / jnp.maximum(jnp.abs(e_toa_f - toa_b), 1e-6),
                          pwr_b)
        sids.append(sid.astype(jnp.int32))
        toas.append(toa_b)
        pwrs.append(pwr_b)
    pw = jnp.stack(pwrs, axis=-1)
    bt_id = jnp.argmax(pw, axis=-1).astype(jnp.int32)
    sel = bt_id[..., None]
    sync_id = jnp.take_along_axis(jnp.stack(sids, axis=-1), sel, axis=-1)[..., 0]
    toa = jnp.take_along_axis(jnp.stack(toas, axis=-1), sel, axis=-1)[..., 0]
    pwr = jnp.take_along_axis(pw, sel, axis=-1)[..., 0]
    return bt_id, sync_id, toa, pwr


def mod_order(x, sps: int, freq_shift=0.0):
    """Blind BPSK-vs-QPSK detect by comparing |sum x^2| vs |sum x^4|
    (gmr1_pi4cxpsk_mod_order, pi4cxpsk.c:694-729).  Returns 2 or 4."""
    x = jnp.asarray(x, jnp.float32)
    y = dsp.sig_normalize(
        x, 1, (jnp.asarray(freq_shift, jnp.float32) - np.pi / 4) / sps
    )
    v = cplx.mul(y, y) / jnp.maximum(cplx.abs2(y), 1e-30)[..., None]
    sb = jnp.sum(v, axis=-2)
    sq = jnp.sum(cplx.mul(v, v), axis=-2)
    pb = cplx.abs2(sb)
    pq = cplx.abs2(sq)
    return jnp.where(pb < pq / 2.0, 4, 2)


@partial(jax.jit, static_argnames=("burst", "sync_id"))
def mod(burst: Burst, ebits, sync_id: int = 0):
    """Modulate hard ebits (..., burst.ebits) -> planar (..., len_syms, 2)
    at 1 sps (gmr1_pi4cxpsk_mod, pi4cxpsk.c:742-799)."""
    ebits = jnp.asarray(ebits, jnp.int32)
    nbits = burst.mod.nbits
    nd = burst.ebits // nbits
    grouped = ebits.reshape(*ebits.shape[:-1], nd, nbits)
    packed = jnp.zeros(grouped.shape[:-1], jnp.int32)
    for j in range(nbits):
        packed = (packed << 1) | grouped[..., j]
    sym_idx = jnp.asarray(burst.mod.sym_of_bits)[packed]  # (..., nd)

    syms = jnp.zeros((*ebits.shape[:-1], burst.len_syms), jnp.int32)
    syms = syms.at[..., jnp.asarray(burst.data_positions)].set(sym_idx)
    sym_val = jnp.asarray(cplx.planar_np(burst.mod.sym_val))
    out = sym_val[syms]  # (..., len_syms, 2)
    # sync sequence overrides
    for chunk in burst.sync[sync_id]:
        ref = jnp.asarray(cplx.planar_np(burst.mod.sym_val[np.asarray(chunk.syms)]))
        ref = jnp.broadcast_to(ref, (*out.shape[:-2], chunk.length, 2))
        out = jax.lax.dynamic_update_slice_in_dim(out, ref, chunk.pos, axis=-2)
    # guard symbols zeroed
    guard = np.ones(burst.len_syms, np.float32)
    guard[:burst.guard_pre] = 0
    guard[burst.len_syms - burst.guard_post:] = 0
    out = out * jnp.asarray(guard)[:, None]
    # continuous rotation
    i = jnp.arange(burst.len_syms, dtype=jnp.float32)
    return cplx.mul(out, cplx.expi(burst.mod.rotation * i))
