"""DKAB (Dummy Keep-Alive Burst) detection + demod (reference src/sdr/dkab.c).

A DKAB is two 5-symbol keep-alive tones at symbol offsets (2+p) and
(2+p+59) inside a 117-symbol slot triple.  Detection is a sliding
two-window power sum (dkab.c:58-144); demodulation is the differential
phase of 4 symbol pairs per tone -> 8 soft bits (dkab.c:155-172).

TPU-native form: the reference's incremental running-sum loop becomes a
cumsum-based moving sum over the energy track; everything is batched
over leading axes and branch-free — the found/not-found decision is
returned as a boolean alongside the bits (the reference's early-return,
restructured for SPMD).
"""

from __future__ import annotations

from functools import partial
from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

from ..ops import cplx, dsp

DKAB_SYMS = 39 * 3              # dkab.h GMR1_DKAB_SYMS
PWR_RATIO_THRESHOLD = 10.0      # dkab.c:47


class DkabResult(NamedTuple):
    ebits: jax.Array   # (..., 8) int8 soft bits
    toa: jax.Array     # (...,) float32 TOA in input samples
    found: jax.Array   # (...,) bool peak/valley power-ratio gate


@partial(jax.jit, static_argnames=("sps",))
def demod(x, sps: int, p, freq_shift=0.0) -> DkabResult:
    """Find + demodulate a DKAB (gmr1_dkab_demod, dkab.c:188).

    x: planar (..., N, 2) with N >= DKAB_SYMS*sps (extra length is the
    TOA search window).  p is the DKAB position within the slot —
    a scalar or a per-batch (...,) array (the batched wideband receiver
    demodulates many carriers with different assigned positions in one
    call, so the window offsets are gathers rather than static slices).
    """
    x = jnp.asarray(x, jnp.float32)
    y = dsp.sig_normalize(
        x, 1, (jnp.asarray(freq_shift, jnp.float32) - np.pi / 4) / sps)
    e = cplx.abs2(y)                      # (..., N)
    n = e.shape[-1]
    w = n - DKAB_SYMS * sps + 1
    assert w > 0, (n, sps)

    p = jnp.asarray(p, jnp.int32)
    ofs0 = sps * (2 + p)                  # scalar or (...,)
    ofs1 = sps * (2 + p + 59)
    d = sps * 5

    # sliding sum of the two KAB windows (dkab.c:80-107)
    cs = jnp.cumsum(e, axis=-1)
    zero = jnp.zeros((*cs.shape[:-1], 1), cs.dtype)
    cs = jnp.concatenate([zero, cs], axis=-1)   # cs[k] = sum e[:k]
    cs = jnp.broadcast_to(cs, (*jnp.broadcast_shapes(
        cs.shape[:-1], p.shape), cs.shape[-1]))
    iw = jnp.arange(w)
    bshape = cs.shape[:-1]

    def winsum(ofs):
        base = jnp.broadcast_to(ofs[..., None] + iw, (*bshape, w))
        return (jnp.take_along_axis(cs, base + d, axis=-1)
                - jnp.take_along_axis(cs, base, axis=-1))
    pwr = winsum(ofs0) + winsum(ofs1)           # (..., w)

    mi = jnp.argmax(pwr, axis=-1)
    # parabolic refine (dkab.c:112-116)
    im = jnp.clip(mi - 1, 0, w - 1)
    ip = jnp.clip(mi + 1, 0, w - 1)
    p0 = jnp.take_along_axis(pwr, im[..., None], -1)[..., 0]
    p1 = jnp.take_along_axis(pwr, mi[..., None], -1)[..., 0]
    p2 = jnp.take_along_axis(pwr, ip[..., None], -1)[..., 0]
    denom = -p0 + 2.0 * p1 - p2
    frac = jnp.where((mi > 0) & (mi < w - 1) & (jnp.abs(denom) > 1e-20),
                     0.5 * (-p0 + p2) / jnp.where(denom == 0, 1.0, denom),
                     0.0)
    toa = mi.astype(jnp.float32) + frac + (sps - 1) / 2.0

    # peak/valley ratio gate at the rounded TOA (dkab.c:122-138)
    toa_i = jnp.clip(jnp.round(toa).astype(jnp.int32), 0, w - 1)
    egy_peak = (jnp.take_along_axis(pwr, toa_i[..., None], -1)[..., 0]
                / (2 * d))
    l_valley = sps * 54                   # ofs1 - ofs0 - d, p-independent
    base_v = jnp.broadcast_to(ofs0[..., None] + d + iw, (*bshape, w))
    valley = (jnp.take_along_axis(cs, base_v + l_valley, axis=-1)
              - jnp.take_along_axis(cs, base_v, axis=-1))
    egy_valley = (jnp.take_along_axis(valley, toa_i[..., None], -1)[..., 0]
                  / l_valley)
    found = egy_peak > PWR_RATIO_THRESHOLD * egy_valley

    # differential-phase soft bits (dkab.c:155-172)
    i8 = jnp.arange(8)
    rel = (jnp.where(i8 < 4, ofs0[..., None], ofs1[..., None])
           + sps * (i8 & 3))
    idx = toa_i[..., None] + rel
    a = jnp.take_along_axis(y, idx[..., None], axis=-2)
    b = jnp.take_along_axis(y, (idx + sps)[..., None], axis=-2)
    pd = cplx.angle(cplx.conj_mul(b, a))    # arg(a * conj(b))
    ebits = jnp.round((0.5 - jnp.abs(pd) / np.pi) * 254.0)
    ebits = jnp.clip(ebits, -127, 127).astype(jnp.int8)

    return DkabResult(ebits=ebits, toa=toa, found=found)
