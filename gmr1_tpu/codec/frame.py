"""AMBE frame unpacking and parameter decoding (reference src/codec/frame.c).

Batched, static-shape re-design: the reference's variable harmonic
count L in [9, 56] becomes padded arrays of length L_MAX=56 with
validity masks; the per-block iDCTs with data-dependent lengths become
elementwise cos expressions over traced block sizes (no tables of
matrices needed); the bit unpacking becomes one gather + weighted sum.

All functions take/return leading batch axes.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

from . import tables as T


class Subframe(NamedTuple):
    """Decoded subframe parameters (reference private.h:65-77), padded
    to L_MAX harmonics.  Ml is the *enhanced* magnitude when carried as
    the previous-subframe state (ambe.c:107-114 enhances in place
    before saving)."""
    f0log: jax.Array   # (...,) log2 fundamental
    f0: jax.Array      # (...,)
    L: jax.Array       # (...,) int32 harmonics count
    gain: jax.Array    # (...,)
    Mlog: jax.Array    # (..., 56) log2 magnitudes (raw, pre-enhance)
    Ml: jax.Array      # (..., 56) linear magnitudes
    Vl: jax.Array      # (..., 56) int32 per-harmonic voicing

    @property
    def w0(self):
        return self.f0 * (2.0 * np.pi)


def init_subframe(batch_shape=()) -> Subframe:
    """Initial previous-subframe state (ambe_decode_init, ambe.c:39-49):
    w0=0.09378, L=30, everything else zero (f0log included)."""
    z = jnp.zeros(batch_shape, jnp.float32)
    zl = jnp.zeros((*batch_shape, T.L_MAX), jnp.float32)
    w0 = 0.09378
    return Subframe(
        f0log=z, f0=z + np.float32(w0 / (2 * np.pi)),
        L=jnp.full(batch_shape, 30, jnp.int32), gain=z,
        Mlog=zl, Ml=zl, Vl=jnp.zeros((*batch_shape, T.L_MAX), jnp.int32))


# --- raw bit unpacking (frame.c:61-79) -----------------------------------

_FIELDS = {
    "pitch": [(0, 7, 0)],
    "pitch_interp": [(48, 2, 0)],
    "gain": [(7, 6, 2), (50, 2, 0)],
    "v_uv": [(13, 6, 0)],
    "sf1_prba12": [(19, 6, 1), (52, 1, 0)],
    "sf1_prba34": [(25, 3, 3), (53, 3, 0)],
    "sf1_prba57": [(28, 3, 4), (56, 4, 0)],
    "sf1_hoc0": [(31, 3, 4), (60, 4, 0)],
    "sf1_hoc1": [(34, 3, 3), (64, 3, 0)],
    "sf1_hoc2": [(37, 2, 4), (67, 4, 0)],
    "sf1_hoc3": [(39, 2, 3), (71, 3, 0)],
    "sf0_mag_interp": [(46, 2, 0)],
    "sf0_perr_14": [(41, 3, 3), (74, 3, 0)],
    "sf0_perr_58": [(44, 2, 3), (77, 3, 0)],
}

# per field: bit positions and weights so value = sum(bit[pos] * weight)
_FIELD_POS, _FIELD_W = {}, {}
for _name, _segs in _FIELDS.items():
    pos, wgt = [], []
    for p, l, s in _segs:
        for k in range(l):
            pos.append(p + k)
            wgt.append(1 << (l - 1 - k + s))
    _FIELD_POS[_name] = np.asarray(pos, np.int32)
    _FIELD_W[_name] = np.asarray(wgt, np.int32)


def unpack_raw(frames) -> dict[str, jax.Array]:
    """Frames (..., 10) uint8 -> dict of raw parameter ints (...,)."""
    frames = jnp.asarray(frames, jnp.int32)
    bits = (frames[..., :, None] >> (7 - jnp.arange(8))) & 1
    bits = bits.reshape(*frames.shape[:-1], 80)
    return {
        name: jnp.sum(bits[..., _FIELD_POS[name]] * _FIELD_W[name], axis=-1)
        for name in _FIELDS
    }


# --- helpers -------------------------------------------------------------

def _interpolate_f0log(prev, cur, rule):
    """frame.c:87-122."""
    step = np.float32(4.2672e-2)
    neq = jnp.stack([cur, 0.65 * cur + 0.35 * prev, (cur + prev) / 2.0, prev],
                    axis=-1)
    eq = jnp.stack([cur, cur, cur + step, cur - step], axis=-1)
    sel = jnp.where((cur != prev)[..., None], neq, eq)
    return jnp.take_along_axis(sel, rule[..., None], axis=-1)[..., 0]


def _compute_L(f0):
    """frame.c:128-141."""
    return jnp.clip(jnp.floor(0.4751 / f0).astype(jnp.int32),
                    T.L_MIN, T.L_MAX)


def _resample_mag(src, l_src, l_dst):
    """Resample + mean-removal (ambe_resample_mag, frame.c:149-181).

    src (..., 56) valid to l_src; returns (..., 56) valid to l_dst,
    with the mean over the first l_dst entries removed, zeros beyond.
    """
    i = jnp.arange(T.L_MAX, dtype=jnp.float32)
    step = l_src.astype(jnp.float32)[..., None] / l_dst.astype(jnp.float32)[..., None]
    pos = step * (i + 1.0)
    posi = jnp.floor(pos).astype(jnp.int32)
    lo = jnp.take_along_axis(src, jnp.clip(posi - 1, 0, T.L_MAX - 1), axis=-1)
    hi = jnp.take_along_axis(src, jnp.clip(posi, 0, T.L_MAX - 1), axis=-1)
    alpha = pos - posi.astype(jnp.float32)
    mid = lo * (1.0 - alpha) + hi * alpha
    first = src[..., :1]
    last = jnp.take_along_axis(src, (l_src[..., None] - 1), axis=-1)
    val = jnp.where(posi == 0, first,
                    jnp.where(posi >= l_src[..., None], last, mid))
    mask = i < l_dst[..., None]
    val = jnp.where(mask, val, 0.0)
    avg = jnp.sum(val, axis=-1, keepdims=True) / l_dst[..., None]
    return jnp.where(mask, val - avg, 0.0)


def _cosf(angle):
    """cosf_fast on device (math.c:50-55).

    The reference quantizes the angle to a 1024-entry grid (C-style
    truncation toward zero) and reads cos_tbl[i] = cosf(pi*i/512)
    (math.c:38-43).  A table GATHER at (batch, 56, 80) index volume is
    the single slowest op in the whole codec on TPU (general gathers
    don't vectorize); computing cos of the *quantized* angle on the VPU
    is bit-identical up to 1 ulp of libm cosf and ~50x faster.  The
    truncation — the part that actually shapes the audio — is kept
    exactly."""
    idx = (jnp.asarray(angle, jnp.float32) * np.float32(512.0 / np.pi)
           ).astype(jnp.int32) & 1023
    return jnp.cos(idx.astype(jnp.float32) * np.float32(np.pi / 512.0))


def _idct_traced(coef, n, m: int, n_out: int = T.L_MAX):
    """ambe_idct (math.c:99-114) with traced length n.

    coef (..., m); out[i] = coef[0] + 2*sum_{j=1..m-1} coef[j] *
    cosf_fast(pi/n * j * (i+0.5)) for i < n (masked beyond).
    """
    i = jnp.arange(n_out, dtype=jnp.float32)
    j = jnp.arange(1, m, dtype=jnp.float32)
    ang = (np.pi / n.astype(jnp.float32))[..., None, None] \
        * j[:, None] * (i[None, :] + 0.5)          # (..., m-1, n_out)
    c = _cosf(ang)
    out = coef[..., :1] + 2.0 * jnp.einsum("...j,...ji->...i",
                                           coef[..., 1:], c)
    return jnp.where(i < n[..., None], out, 0.0)


# --- main parameter decode (frame.c:308-351) -----------------------------

def decode_params(rp: dict[str, jax.Array], sf_prev: Subframe
                  ) -> tuple[Subframe, Subframe]:
    """Raw params + previous subframe -> (sf0, sf1) with Mlog filled."""
    # Fundamental (frame.c:317-322)
    f0log1 = np.float32(-4.312) - np.float32(2.1336e-2) * rp["pitch"].astype(jnp.float32)
    f01 = jnp.exp2(f0log1)
    f0log0 = _interpolate_f0log(sf_prev.f0log, f0log1, rp["pitch_interp"])
    f00 = jnp.exp2(f0log0)

    L0, L1 = _compute_L(f00), _compute_L(f01)
    Lb1 = jnp.asarray(T.HPG)[L1 - T.L_MIN]          # (..., 4)

    # Voicing (frame.c:329-334)
    vuv = jnp.asarray(T.V_UV)[rp["v_uv"]]
    i8 = jnp.arange(8)
    v0 = (vuv[..., None] >> (7 - i8)) & 1
    v1 = (vuv[..., None] >> (15 - i8)) & 1

    # Gain (frame.c:337-344)
    g = jnp.asarray(T.GAIN)[rp["gain"]]
    gain0 = jnp.minimum(0.5 * sf_prev.gain + g[..., 0], 13.0)
    gain1 = jnp.minimum(0.5 * sf_prev.gain + g[..., 1], 13.0)

    # --- subframe 1 magnitudes (frame.c:188-256) ---
    pred = _resample_mag(sf_prev.Mlog, sf_prev.L, L1) * 0.65

    prba = jnp.concatenate([
        jnp.zeros((*f01.shape, 1), jnp.float32),
        jnp.asarray(T.PRBA12)[rp["sf1_prba12"]],
        jnp.asarray(T.PRBA34)[rp["sf1_prba34"]],
        jnp.asarray(T.PRBA57)[rp["sf1_prba57"]],
    ], axis=-1)                                      # (..., 8)
    Ri = jnp.einsum("...j,ij->...i", prba, jnp.asarray(T.IDCT8))

    rconst = np.float32(1.0 / (2.0 * np.sqrt(2.0)))
    C0 = (Ri[..., 0::2] + Ri[..., 1::2]) * 0.5       # (..., 4)
    C1 = (Ri[..., 0::2] - Ri[..., 1::2]) * rconst
    hoc_idx = jnp.stack([rp[f"sf1_hoc{b}"] for b in range(4)], axis=-1)
    hoc = jnp.asarray(T.HOC_ALL)[jnp.arange(4), hoc_idx]  # (..., 4, 4)
    C = jnp.concatenate([C0[..., None], C1[..., None], hoc], axis=-1)  # (..., 4, 6)

    # per-harmonic block layout for this L (static maps, frame.c:242-246)
    blk = jnp.asarray(T.BLOCK_OF)[L1 - T.L_MIN]          # (..., 56)
    jidx = jnp.asarray(T.IDX_IN_BLOCK)[L1 - T.L_MIN]
    n_b = jnp.take_along_axis(Lb1, blk, axis=-1).astype(jnp.float32)
    Ck = jnp.take_along_axis(C, blk[..., None], axis=-2)  # (..., 56, 6)
    m = jnp.arange(1, 6, dtype=jnp.float32)
    ang = (np.pi / n_b)[..., None] * m * (jidx.astype(jnp.float32) + 0.5)[..., None]
    ck = Ck[..., 0] + 2.0 * jnp.sum(Ck[..., 1:] * _cosf(ang), axis=-1)

    karr = jnp.arange(T.L_MAX)
    mask1 = karr < L1[..., None]
    L1f = L1.astype(jnp.float32)
    blocksum = jnp.sum(C[..., 0] * Lb1.astype(jnp.float32), axis=-1)
    ofs = gain1 - 0.5 * jnp.log2(L1f) - blocksum / L1f
    Mlog1 = jnp.where(mask1, pred + ck + ofs[..., None], 0.0)

    # --- subframe 0 magnitudes (frame.c:264-301) ---
    mag_p = _resample_mag(sf_prev.Mlog, sf_prev.L, L0)
    mag_c = _resample_mag(Mlog1, L1, L0)
    alpha = jnp.asarray(T.SF0_INTERP)[rp["sf0_mag_interp"]]
    perr = jnp.concatenate([
        jnp.zeros((*f01.shape, 1), jnp.float32),
        jnp.asarray(T.SF0_PERR14)[rp["sf0_perr_14"]],
        jnp.asarray(T.SF0_PERR58)[rp["sf0_perr_58"]],
    ], axis=-1)                                      # (..., 9)
    corr = _idct_traced(perr, L0, 9)
    gain0t = gain0 - 0.5 * jnp.log2(L0.astype(jnp.float32))
    mask0 = karr < L0[..., None]
    Mlog0 = jnp.where(
        mask0,
        gain0t[..., None] + corr + alpha[..., None] * mag_p
        + (1.0 - alpha)[..., None] * mag_c,
        0.0)

    sf0 = Subframe(f0log=f0log0, f0=f00, L=L0, gain=gain0, Mlog=Mlog0,
                   Ml=jnp.zeros_like(Mlog0), Vl=_expand_vl(v0, f00, L0))
    sf1 = Subframe(f0log=f0log1, f0=f01, L=L1, gain=gain1, Mlog=Mlog1,
                   Ml=jnp.zeros_like(Mlog1), Vl=_expand_vl(v1, f01, L1))
    return sf0, sf1


def _expand_vl(v_uv, f0, L):
    """Per-harmonic voicing from the 8 band bits (frame.c:366-368)."""
    i = jnp.arange(T.L_MAX, dtype=jnp.float32)
    j = jnp.clip((i * 16.0 * f0[..., None]).astype(jnp.int32), 0, 7)
    vl = jnp.take_along_axis(v_uv, j, axis=-1)
    return jnp.where(i < L[..., None], vl, 0).astype(jnp.int32)


def expand(sf: Subframe) -> Subframe:
    """Fill linear magnitudes Ml (ambe_subframe_expand, frame.c:357-373)."""
    w0 = sf.f0 * (2.0 * np.pi)
    unvc = np.float32(0.2046) / jnp.sqrt(w0)
    ml = jnp.exp2(sf.Mlog) / 6.0
    ml = jnp.where(sf.Vl == 0, ml * unvc[..., None], ml)
    mask = jnp.arange(T.L_MAX) < sf.L[..., None]
    return sf._replace(Ml=jnp.where(mask, ml, 0.0))
