"""AMBE speech synthesis (reference src/codec/synth.c), batched/static.

TPU-native re-design of the three synthesis stages:

  * spectral enhancement (synth.c:308-369) — masked vectorized over the
    56 padded harmonics;
  * unvoiced synthesis (synth.c:121-198) — the LCG noise sequence in
    closed form (precomputed multiplier/offset powers instead of the
    sequential loop), the 128-pt real DFT/iDFT as dense matmuls against
    cosf_fast-quantized matrices, band magnitude normalization as a
    one-hot segment-sum, weighted overlap-add against carried state;
  * voiced synthesis (synth.c:207-290) — the per-harmonic oscillator
    bank as one masked (56, 80) outer product accumulated over bands,
    with the fine/coarse transition choice branch-free.

Synth state is a NamedTuple carried through lax.scan.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

from . import tables as T
from .frame import Subframe, _cosf

LCG_A, LCG_C, LCG_M = 171, 11213, 53125   # synth.c:110


class SynthState(NamedTuple):
    u_prev: jax.Array    # (...,) int32 last LCG value
    uw_prev: jax.Array   # (..., 121) previous unvoiced window
    psi1: jax.Array      # (...,) fundamental phase
    phi: jax.Array       # (..., 56) per-harmonic phase
    SE: jax.Array        # (...,) energy tracker


def init_state(batch_shape=()) -> SynthState:
    """ambe_synth_init (synth.c:296-301): zeros, u_prev=3147."""
    return SynthState(
        u_prev=jnp.full(batch_shape, 3147, jnp.int32),
        uw_prev=jnp.zeros((*batch_shape, T.UW_LEN), jnp.float32),
        psi1=jnp.zeros(batch_shape, jnp.float32),
        phi=jnp.zeros((*batch_shape, T.L_MAX), jnp.float32),
        SE=jnp.zeros(batch_shape, jnp.float32))


# --- closed-form LCG (synth.c:103-113) -----------------------------------
# u_i = (A^(i+1) u0 + C*(A^i + ... + 1)) mod M, precomputed per step.
_lcg_a = np.zeros(T.UW_LEN, np.int64)
_lcg_b = np.zeros(T.UW_LEN, np.int64)
_a, _b = 1, 0
for _i in range(T.UW_LEN):
    _a = (_a * LCG_A) % LCG_M
    _b = (_b * LCG_A + LCG_C) % LCG_M
    _lcg_a[_i] = _a
    _lcg_b[_i] = _b
# int32-safe split: A = Ah*256 + Al with Ah*u0 < 2^31
_LCG_AH = (_lcg_a >> 8).astype(np.int32)
_LCG_AL = (_lcg_a & 0xFF).astype(np.int32)
_LCG_B = _lcg_b.astype(np.int32)


def lcg_sequence(u_prev):
    """121 LCG values from u_prev (...,) -> (..., 121) int32."""
    u0 = u_prev[..., None]
    hi = ((_LCG_AH * u0) % LCG_M) * 256 % LCG_M
    lo = (_LCG_AL * u0) % LCG_M
    return (hi + lo + _LCG_B) % LCG_M


# --- enhancement (synth.c:307-369) ---------------------------------------

def enhance(state: SynthState, sf: Subframe) -> tuple[SynthState, Subframe]:
    lmask = jnp.arange(T.L_MAX) < sf.L[..., None]
    lp1 = jnp.arange(1, T.L_MAX + 1, dtype=jnp.float32)
    w0 = sf.w0
    sq = sf.Ml * sf.Ml
    rm0 = jnp.sum(jnp.where(lmask, sq, 0.0), axis=-1)
    rm1 = jnp.sum(jnp.where(lmask, sq * _cosf(w0[..., None] * lp1), 0.0),
                  axis=-1)

    k1 = 0.96 * np.pi / (w0 * rm0 * (rm0 * rm0 - rm1 * rm1))
    k2 = rm0 * rm0 + rm1 * rm1
    k3 = 2.0 * rm0 * rm1

    w = jnp.sqrt(sf.Ml) * jnp.power(
        jnp.maximum(k1[..., None] * (k2[..., None]
                                     - k3[..., None] * _cosf(w0[..., None] * lp1)),
                    0.0), 0.25)
    w = jnp.clip(w, 0.5, 1.2)
    low = (lp1 * 8.0) <= sf.L[..., None].astype(jnp.float32)
    ml = sf.Ml * jnp.where(low, 1.0, w)

    gamma_den = jnp.sum(jnp.where(lmask, ml * ml, 0.0), axis=-1)
    gamma = jnp.sqrt(rm0 / jnp.maximum(gamma_den, 1e-30))
    ml = jnp.where(lmask, ml * gamma[..., None], 0.0)

    se = jnp.maximum(0.95 * state.SE + 0.05 * rm0, 1e4)
    return state._replace(SE=se), sf._replace(Ml=ml)


# --- unvoiced synthesis (synth.c:120-198) --------------------------------

def _synth_unvoiced(state: SynthState, sf: Subframe):
    u = lcg_sequence(state.u_prev)                       # (..., 121)
    u_prev_new = u[..., 79]
    uw = u.astype(jnp.float32) * jnp.asarray(T.WS)

    uwi = uw @ jnp.asarray(T.DFT_COS.T)                  # (..., 65)
    uwq = uw @ jnp.asarray(T.DFT_SIN.T)

    # band edges e_l = ceil(128/(2pi) * (l+0.5 or 1.5...) * w0)
    c = np.float32(T.DFT_N / (2.0 * np.pi))
    lidx = jnp.arange(T.L_MAX + 1, dtype=jnp.float32)    # 0..56
    mult = jnp.where(lidx == 0, 0.5, lidx + 0.5)         # e_0 uses 0.5
    edges = jnp.ceil(c * mult * sf.w0[..., None])        # (..., 57)

    bins = jnp.arange(T.DFT_BINS, dtype=jnp.float32)     # (65,)
    # band of bin i: number of edges <= i, minus 1 (-1 = below e_0)
    band = jnp.sum((edges[..., None] <= bins).astype(jnp.int32), axis=-2) - 1

    e = uwi * uwi + uwq * uwq
    onehot = (band[..., None, :] == jnp.arange(T.L_MAX)[:, None])  # (..., 56, 65)
    esum = jnp.einsum("...li,...i->...l", onehot.astype(jnp.float32), e)
    cnt = jnp.sum(onehot, axis=-1).astype(jnp.float32)
    ampl = 76.89 * sf.Ml / jnp.sqrt(
        jnp.maximum(esum / jnp.maximum(cnt, 1.0), 1e-30))

    lmask = jnp.arange(T.L_MAX) < sf.L[..., None]
    keep = lmask & (sf.Vl == 0)                          # unvoiced bands
    factor_l = jnp.where(keep, ampl, 0.0)                # (..., 56)
    valid = (band >= 0) & (band < sf.L[..., None])
    factor = jnp.where(
        valid,
        jnp.take_along_axis(factor_l, jnp.clip(band, 0, T.L_MAX - 1),
                            axis=-1),
        0.0)                                             # (..., 65)

    uwi = uwi * factor
    uwq = uwq * factor
    uw_new = uwi @ jnp.asarray(T.IDFT_COS.T) + uwq @ jnp.asarray(T.IDFT_SIN.T)

    # WOLA (synth.c:184-197)
    ws = jnp.asarray(T.WS)
    head = state.uw_prev[..., 60:81]                     # i in [0,21)
    mid_i = np.arange(21, 60)
    num = (ws[mid_i + 60] * state.uw_prev[..., mid_i + 60]
           + ws[mid_i - 20] * uw_new[..., mid_i - 20])
    den = ws[mid_i + 60] ** 2 + ws[mid_i - 20] ** 2
    mid = num / den
    tail = uw_new[..., 40:60]                            # i in [60,80)
    suv = jnp.concatenate([head, mid, tail], axis=-1)
    return state._replace(u_prev=u_prev_new, uw_prev=uw_new), suv


# --- voiced synthesis (synth.c:206-290) ----------------------------------

def _synth_voiced(state: SynthState, sf: Subframe, sf_prev: Subframe):
    lp1 = jnp.arange(1, T.L_MAX + 1, dtype=jnp.float32)
    L_max = jnp.maximum(sf.L, sf_prev.L)
    band = jnp.arange(T.L_MAX)
    in_max = band < L_max[..., None]

    # L_uv counts unvoiced bands up to L_max (synth.c:219-221); padded
    # Vl is zero beyond sf.L which matches reading "unvoiced" there.
    L_uv = jnp.sum(jnp.where(in_max, (sf.Vl == 0).astype(jnp.int32), 0),
                   axis=-1).astype(jnp.float32)

    two_pi = np.float32(2.0 * np.pi)
    psi_step = (sf.w0 + sf_prev.w0) * 40.0
    psi1_raw = state.psi1 + psi_step
    psi1 = psi1_raw - two_pi * jnp.round(psi1_raw / two_pi)  # remainderf

    Lf = sf.L.astype(jnp.float32)
    rho_term = (L_uv / Lf)[..., None] * jnp.asarray(T.RHO)
    rho_on = band >= (sf.L // 4)[..., None]              # int division

    phi_prev = state.phi
    phi_cur = psi1[..., None] * lp1 + jnp.where(rho_on, rho_term, 0.0)
    # bands >= L_max get the rho term unconditionally (synth.c:288-289)
    phi_new = jnp.where(in_max, phi_cur, psi1[..., None] * lp1 + rho_term)

    vl_cur = sf.Vl != 0                                  # padded 0 beyond L
    vl_prev = sf_prev.Vl != 0
    ml_cur = sf.Ml
    ml_prev = sf_prev.Ml
    w_cur = lp1 * sf.w0[..., None]
    w_prev = lp1 * sf_prev.w0[..., None]

    fine = vl_cur & vl_prev & (band < 7) \
        & (jnp.abs(w_cur - w_prev) < 0.1 * w_cur)

    i = jnp.arange(80, dtype=jnp.float32)                # (80,)
    ws = jnp.asarray(T.WS)

    # fine transition (synth.c:258-270)
    ml_step = (ml_cur - ml_prev) / 80.0
    dpl = phi_cur - phi_prev - (w_cur + w_prev) * 40.0
    dwl = (dpl - two_pi * jnp.floor((dpl + np.pi) / two_pi)) / 80.0
    tha = w_prev + dwl
    thb = (w_cur - w_prev) / 160.0
    ang_f = phi_prev[..., None] + (tha[..., None]
                                   + thb[..., None] * i) * i  # (..., 56, 80)
    sv_fine = (ml_prev[..., None] + i * ml_step[..., None]) * _cosf(ang_f)

    # coarse, current (synth.c:273-277): i in [21, 80)
    wmask_cur = jnp.where(i >= 21, 1.0, 0.0) * ws[jnp.clip(
        (i - 20).astype(jnp.int32), 0, T.UW_LEN - 1)]
    sv_cur = wmask_cur * ml_cur[..., None] * _cosf(
        phi_cur[..., None] + w_cur[..., None] * (i - 80.0))

    # coarse, previous (synth.c:280-284): i in [0, 60)
    wmask_prev = jnp.where(i < 60, 1.0, 0.0) * ws[jnp.clip(
        (i + 60).astype(jnp.int32), 0, T.UW_LEN - 1)]
    sv_prev = wmask_prev * ml_prev[..., None] * _cosf(
        phi_prev[..., None] + w_prev[..., None] * i)

    fine_f = fine[..., None]
    contrib = jnp.where(fine_f, sv_fine,
                        jnp.where(vl_cur[..., None], sv_cur, 0.0)
                        + jnp.where(vl_prev[..., None], sv_prev, 0.0))
    sv = jnp.sum(jnp.where(in_max[..., None], contrib, 0.0), axis=-2)

    return state._replace(psi1=psi1, phi=phi_new), sv


def audio(state: SynthState, sf: Subframe, sf_prev: Subframe):
    """One subframe of audio (ambe_synth_audio, synth.c:377-389).

    Returns (new_state, audio (..., 80) float32 BEFORE the int16 cast —
    the caller quantizes once per frame).
    """
    state, suv = _synth_unvoiced(state, sf)
    state, sv = _synth_voiced(state, sf, sf_prev)
    return state, (suv + 2.0 * sv) * 4.0
