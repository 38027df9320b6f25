"""Polyphase filterbank wideband channelizer, TPU-native.

Replaces the reference's GNURadio flowgraph (utils/gmr1_rx_sdr.py:391-602):

  analysis     2x-oversampled M-channel PFB.  Branch filtering is a
               static gather + per-branch dot; the per-frame M-point
               channel transform is a dense packed-real matmul on the
               MXU (the axon TPU backend has no complex FFT, and for
               M <= ~2048 a dense DFT matmul at bf16/f32 outruns a
               radix FFT on the MXU anyway).
  arb resample 32-phase polyphase fractional resampler with linear
               phase interpolation (pfb.arb_resampler_ccf equivalent).
               All gather geometry is host-precomputed per (ratio,
               length) — on device it is 2 gathers + 2 contractions.
  extraction   per-carrier: channel select -> RRC arbitrary resample to
               sps x symbol rate.  Wide carriers (2/3/5x) recombine
               adjacent subchannels by rotate-and-sum at the output
               rate (the role of pfb_synthesizer_ccf, :566-589).

Everything is batched over frames/channels with static shapes; long
captures stream through in chunks.
"""

from __future__ import annotations

from functools import lru_cache, partial

import jax
import jax.numpy as jnp
import numpy as np

from ..ops import cplx
from . import filters
from .arfcn import BASE_BANDWIDTH, BASE_SYMRATE, Channel, align_freq


# --------------------------------------------------------------------------
# PFB analysis
# --------------------------------------------------------------------------

@lru_cache(maxsize=None)
def _dft_mat(m: int) -> np.ndarray:
    """(M, M, 2) planar matrix W[q, k] = exp(+2j*pi*q*k/M)."""
    q, k = np.meshgrid(np.arange(m), np.arange(m), indexing="ij")
    w = 2.0 * np.pi * q * k / m
    return np.stack([np.cos(w), np.sin(w)], axis=-1).astype(np.float32)


@partial(jax.jit, static_argnames=("m", "p", "hop", "r_cnt", "interpret",
                                   "dft_bf16"))
def _analyze_slab_packed(z, wa, m: int, p: int, hop: int, r_cnt: int,
                         interpret: bool = False, dft_bf16: bool = True):
    """Slab input (2, ROWS, hp) -> PACKED channel bank (R, 2M) = [yr|yi].

    The zero-relayout fast path: Pallas branch filter writes the packed
    DFT activation directly; the channel DFT is one MXU matmul; the 2x
    oversampling sign flip fuses into it.  Callers that can consume the
    packed form (windowed slicing contracts over rows) avoid the planar
    re-stack entirely.

    dft_bf16 runs the channel DFT with bf16 operands and f32
    accumulation (the MXU's native fast path).  Operand rounding sits
    ~-48 dB relative to signal — an order of magnitude below any real
    capture's RF noise floor, and the accumulator stays f32 — so this
    is on by default; pass False for bit-tight comparisons.
    """
    from ..ops.pallas_pfb import branch_filter_slab, dft_packed_slab

    a2 = branch_filter_slab(z, wa, m, p, hop, r_cnt, interpret=interpret)
    b2 = jnp.asarray(dft_packed_slab(m, hop))
    if dft_bf16:
        c2 = jnp.dot(a2.astype(jnp.bfloat16), b2.astype(jnp.bfloat16),
                     preferred_element_type=jnp.float32)
    else:
        # XLA:TPU's default f32 dot also rounds operands to bf16, so the
        # exact path must request HIGHEST explicitly (verified on-chip:
        # default-precision f32 == bf16 bit-for-bit on this backend).
        c2 = jnp.dot(a2, b2, precision=jax.lax.Precision.HIGHEST)
    if hop == m // 2:
        rpar = (jnp.arange(r_cnt) & 1).astype(jnp.float32)
        qpar = jnp.asarray(np.tile(np.arange(m) % 2, 2).astype(np.float32))
        c2 = c2 * (1.0 - 2.0 * rpar[:, None] * qpar[None, :])
    return c2


@partial(jax.jit, static_argnames=("m", "p", "hop", "interpret", "dft_bf16"))
def _analyze_block_fused(x, wa, m: int, p: int, hop: int,
                         interpret: bool = False, dft_bf16: bool = True):
    """Planar-API wrapper over the slab fast path (TPU backends)."""
    from ..ops.pallas_pfb import to_slab

    r_cnt = (x.shape[0] - p * m) // hop
    z = to_slab(x, p, hop, r_cnt)
    c2 = _analyze_slab_packed(z, wa, m, p, hop, r_cnt, interpret=interpret,
                              dft_bf16=dft_bf16)
    return jnp.stack([c2[:, :m], c2[:, m:]], axis=-1)


@partial(jax.jit, static_argnames=("m", "p", "hop"))
def _analyze_block(x, h_poly, m: int, p: int, hop: int):
    """x planar (N + p*m, 2) left-padded; returns (R, M, 2) channels.

    v_q(r) = sum_p h[q+pm] x(r*hop - q - p*m)  [shifted-row accumulate]
    y_m(r) = (-1)^{mr} sum_q v_q(r) e^{+2j pi mq/M}  [packed matmul]

    The branch filter avoids materializing the (R, p*m) commutator
    windows (a ~20x data blow-up of misaligned strided copies — measured
    ~15x slower than everything else combined).  Key identity: with
    q = a*hop + b and M = 2*hop, the tap index r*hop + (P-pp)*M - q
    equals (r + s)*hop - b for the single shift s = 2*(P-pp) - a.  So
    after ONE cheap lane-reversal pass building zr[u, b] = x[(u+1)*hop
    - b], every (branch, tap) pair is a LEADING-dim shifted view of zr
    scaled by a per-lane weight vector, and v is a sum of 2P such
    views — XLA fuses it into one aligned sliding-window loop.
    """
    r_cnt = (x.shape[0] - p * m) // hop
    u_rows = r_cnt + 2 * p              # z rows consumed (incl. +1 lead)
    z = x[:u_rows * hop].reshape(u_rows, hop, 2)
    # zr[u, b] = x[(u+1)*hop - b]:  col 0 from the next row's head,
    # cols 1..hop-1 are this row's tail reversed.
    zr = jnp.concatenate([z[1:, :1], z[:-1, hop - 1:0:-1]], axis=1)
    v_ab = jnp.zeros((r_cnt, 2, hop, 2), jnp.float32)
    for s in range(1, 2 * p + 1):
        a = s & 1
        pp = p - (s + a) // 2
        w = h_poly[a * hop:(a + 1) * hop, pp]          # (hop,)
        v_ab = v_ab.at[:, a].add(w[None, :, None]
                                 * zr[s - 1:s - 1 + r_cnt])
    v = v_ab.reshape(r_cnt, m, 2)
    w = jnp.asarray(_dft_mat(m))
    y = cplx.matmul(v, w)                       # one (R,2M)@(2M,2M) matmul
    r = np.arange(r_cnt)
    q = np.arange(m)
    if hop == m // 2:
        sign = np.where((r[:, None] % 2 == 1) & (q[None, :] % 2 == 1),
                        -1.0, 1.0).astype(np.float32)
        y = y * sign[:, :, None]
    return y


class PFBAnalyzer:
    """M-channel 2x-oversampled analysis bank."""

    def __init__(self, n_chans: int, taps: np.ndarray,
                 chunk_frames: int = 8192, dft_bf16: bool = True):
        """dft_bf16 runs the channel DFT with bf16 operands / f32
        accumulation on TPU (see _analyze_slab_packed); pass False for
        f32-exact analysis on device."""
        assert n_chans % 2 == 0, "need even channel count"
        self.dft_bf16 = dft_bf16
        self.m = n_chans
        self.hop = n_chans // 2
        t = np.asarray(taps, np.float32)
        self.p = int(np.ceil(len(t) / n_chans))
        h = np.zeros(self.p * n_chans, np.float32)
        h[:len(t)] = t
        h_poly_np = h.reshape(self.p, n_chans).T          # (M, P)
        self.h_poly = jnp.asarray(h_poly_np)
        from ..ops.pallas_pfb import slab_weights
        self.wa = jnp.asarray(slab_weights(h_poly_np, self.m, self.p,
                                           self.hop))  # (2(2P+1), hp)
        self.chunk_frames = chunk_frames

    def block(self, xp) -> jax.Array:
        """Analyze one left-padded block ((R*hop + p*m,) + planar).

        Dispatches to the fused Pallas kernel on TPU backends (the
        kernel uses TPU-only DMA/semaphore primitives) and the pure-XLA
        shifted-accumulate form on every other backend (identical
        numerics up to f32 summation order; parity-tested in tests/).
        """
        if jax.default_backend() in ("tpu", "axon"):
            return _analyze_block_fused(xp, self.wa, self.m, self.p,
                                        self.hop, dft_bf16=self.dft_bf16)
        return _analyze_block(xp, self.h_poly, self.m, self.p, self.hop)

    def block_packed(self, z, r_cnt: int) -> jax.Array:
        """Slab fast path: pre-slabbed block -> packed (R, 2M) bank.

        `z` is ops.pallas_pfb.to_slab layout (2, slab_rows, hp); use
        when the caller streams many blocks and consumes the packed
        form (e.g. the transponder pipeline)."""
        return _analyze_slab_packed(z, self.wa, self.m, self.p, self.hop,
                                    r_cnt, dft_bf16=self.dft_bf16)

    def __call__(self, x) -> jax.Array:
        """Planar wideband (N, 2) -> channels (R, M, 2) at rate fs/(M/2)."""
        x = jnp.asarray(x, jnp.float32)
        pad = jnp.zeros((self.p * self.m, 2), jnp.float32)
        xp = jnp.concatenate([pad, x], axis=0)
        n_eff = x.shape[0]
        r_cnt = n_eff // self.hop
        out = []
        cf = self.chunk_frames
        for r0 in range(0, r_cnt, cf):
            r1 = min(r0 + cf, r_cnt)
            beg = r0 * self.hop
            need = (r1 - r0) * self.hop + self.p * self.m
            blk = jax.lax.dynamic_slice_in_dim(
                xp, beg, min(need, xp.shape[0] - beg), axis=0)
            if blk.shape[0] < need:
                blk = jnp.concatenate(
                    [blk, jnp.zeros((need - blk.shape[0], 2), jnp.float32)])
            out.append(self.block(blk))
        return jnp.concatenate(out, axis=0) if len(out) > 1 else out[0]


# --------------------------------------------------------------------------
# Arbitrary polyphase resampler
# --------------------------------------------------------------------------

class ArbResampler:
    """Fractional-ratio polyphase resampler (pfb.arb_resampler_ccf).

    Phase geometry is precomputed per input length; device work is two
    gathers and two weighted contractions (linear interpolation between
    adjacent polyphase branches).
    """

    def __init__(self, ratio: float, taps: np.ndarray | None = None,
                 n_phases: int = 32,
                 ratio_frac: tuple[int, int] | None = None):
        """ratio_frac: optional EXACT (num, den) with ratio = num/den —
        enables integer-exact periodic geometry (periodic_geometry /
        StreamPreResampler)."""
        self.ratio = float(ratio)
        if ratio_frac is not None:
            num, den = ratio_frac
            g = int(np.gcd(num, den))
            self.ratio_frac = (num // g, den // g)
            assert abs(self.ratio - num / den) < 1e-9, (ratio, ratio_frac)
        else:
            self.ratio_frac = None
        self.l = n_phases
        if taps is None:
            # GNURadio default: lowpass at the slower side's Nyquist
            cutoff = 0.5 * min(1.0, self.ratio)
            taps = filters.low_pass_2(n_phases, n_phases, cutoff, 0.2 * cutoff,
                                      80, "blackmanharris")
        t = np.asarray(taps, np.float32)
        self.tpb = int(np.ceil(len(t) / n_phases))
        h = np.zeros(self.tpb * n_phases, np.float32)
        h[:len(t)] = t
        # branch p taps h[p::L], applied to x[k], x[k-1], ...
        self.branches = h.reshape(self.tpb, n_phases).T.copy()  # (L, tpb)

    @lru_cache(maxsize=8)
    def _geometry(self, n_in: int):
        n_out = int(np.floor(n_in * self.ratio))
        n = np.arange(n_out, dtype=np.float64)
        up = n * self.l / self.ratio           # position in upsampled grid
        ip = np.floor(up).astype(np.int64)
        frac = (up - ip).astype(np.float32)
        k1, p1 = ip // self.l, ip % self.l
        k2, p2 = (ip + 1) // self.l, (ip + 1) % self.l
        return (n_out, k1.astype(np.int32), p1.astype(np.int32),
                k2.astype(np.int32), p2.astype(np.int32), frac)

    def __call__(self, x) -> jax.Array:
        """Planar (..., N, 2) -> (..., floor(N*ratio), 2)."""
        x = jnp.asarray(x, jnp.float32)
        n_in = x.shape[-2]
        n_out, k1, p1, k2, p2, frac = self._geometry(n_in)
        return self._run(x, k1, p1, k2, p2, frac)

    def window_geometry(self, out_start: int, n_out: int):
        """Static gather geometry producing output samples
        [out_start, out_start + n_out) from a SLICE of the input stream
        — the burst-window fast path (skips resampling samples nobody
        demodulates).  Returns (k_min, k_span, k1r, p1, k2r, p2, frac):
        slice the input at [k_min, k_min + k_span) along the time axis
        and feed it to resample_window with the rest.
        """
        n = np.arange(out_start, out_start + n_out, dtype=np.float64)
        up = n * self.l / self.ratio
        ip = np.floor(up).astype(np.int64)
        frac = (up - ip).astype(np.float32)
        k1, p1 = ip // self.l, ip % self.l
        k2, p2 = (ip + 1) // self.l, (ip + 1) % self.l
        k_min = int(k1.min()) - self.tpb + 1
        assert k_min >= 0, (out_start, k_min)
        k_span = int(k2.max()) - k_min + 1
        return (k_min, k_span, (k1 - k_min).astype(np.int32),
                p1.astype(np.int32), (k2 - k_min).astype(np.int32),
                p2.astype(np.int32), frac)

    def window_matrix(self, out_start: int, n_out: int):
        """Dense (n_out, k_span) resampling matrix for the burst-window
        fast path: out = W @ x[k_min : k_min + k_span].  Returns
        (k_min, W).  Each row has ~2*tpb nonzeros, but at burst-window
        size a dense f32 matmul on the MXU beats any gather form on
        TPU.  Parity with resample_window / __call__ is exact."""
        k_min, k_span, k1r, p1, k2r, p2, frac = self.window_geometry(
            out_start, n_out)
        w = np.zeros((n_out, k_span), np.float32)
        i = np.arange(self.tpb)
        n = np.arange(n_out)
        br = self.branches
        np.add.at(w, (n[:, None], k1r[:, None] - i[None, :]),
                  br[p1] * (1.0 - frac)[:, None])
        np.add.at(w, (n[:, None], k2r[:, None] - i[None, :]),
                  br[p2] * frac[:, None])
        return k_min, w

    def block_gather(self, n_out: int, hist: int):
        """Static gather geometry for STREAMED resampling: outputs
        [0, n_out) of every block, where the block's first input sample
        sits at index `hist` of rows_full = [carried history | new
        block].  Valid only when the resampling phase is block-periodic
        (n_out * l / ratio is an integral multiple of l), so one
        geometry serves every block.  Feed to resample_window."""
        up_end = n_out * self.l / self.ratio
        assert abs(up_end - round(up_end)) < 1e-6 \
            and round(up_end) % self.l == 0, (n_out, self.ratio)
        n = np.arange(n_out, dtype=np.float64)
        up = n * self.l / self.ratio
        ip = np.floor(up).astype(np.int64)
        frac = (up - ip).astype(np.float32)
        k1, p1 = ip // self.l + hist, ip % self.l
        k2, p2 = (ip + 1) // self.l + hist, (ip + 1) % self.l
        assert k1.min() - self.tpb + 1 >= 0, (hist, self.tpb)
        return (k1.astype(np.int32), p1.astype(np.int32),
                k2.astype(np.int32), p2.astype(np.int32), frac)

    def periodic_geometry(self):
        """EXACT periodic resampling geometry from the rational ratio.

        With ratio = num/den (reduced), the upsampled-grid position of
        output n is up(n) = n*L*den/num, so the (branch, fraction)
        geometry repeats every P = num outputs while the input advances
        exactly K = den samples — integer math, drift-free forever.
        Returns (P, K, W, B): out[q*P + phi] = W[phi] @ x[q*K + B :
        q*K + B + W.shape[1]] with zero-padding for x[<0].
        """
        assert self.ratio_frac is not None, "need exact ratio_frac"
        num, den = self.ratio_frac
        p_out, k_in = num, den
        ll = self.l
        a = np.arange(p_out, dtype=np.int64) * ll * den
        ip = a // num
        frac = (a % num) / num
        k1, p1 = ip // ll, ip % ll
        k2, p2 = (ip + 1) // ll, (ip + 1) % ll
        b = int(k1.min()) - self.tpb + 1
        e = int(k2.max())
        w = np.zeros((p_out, e - b + 1), np.float32)
        i = np.arange(self.tpb)
        phi = np.arange(p_out)
        br = self.branches
        np.add.at(w, (phi[:, None], k1[:, None] - i[None, :] - b),
                  br[p1] * (1.0 - frac)[:, None])
        np.add.at(w, (phi[:, None], k2[:, None] - i[None, :] - b),
                  br[p2] * frac[:, None])
        return p_out, k_in, w, b

    def resample_window(self, xw, k1r, p1, k2r, p2, frac):
        """Resample a pre-sliced window (..., k_span, 2) using static
        geometry from window_geometry (all indices host numpy)."""
        xw = jnp.asarray(xw, jnp.float32)
        i = np.arange(self.tpb)

        def tap(k, p):
            idx = k[:, None] - i[None, :]                # (n_out, tpb)
            g = jnp.take(xw, jnp.asarray(idx), axis=-2)
            rows = jnp.asarray(self.branches)[jnp.asarray(p)]
            return jnp.einsum("...nic,ni->...nc", g, rows)

        y1 = tap(k1r, p1)
        y2 = tap(k2r, p2)
        f = jnp.asarray(frac)[:, None]
        return y1 * (1.0 - f) + y2 * f

    @partial(jax.jit, static_argnames=("self",))
    def _run(self, x, k1, p1, k2, p2, frac):
        pad = jnp.zeros((*x.shape[:-2], self.tpb, 2), jnp.float32)
        xp = jnp.concatenate([pad, x], axis=-2)  # index k -> xp[k + tpb]
        i = np.arange(self.tpb)

        def tap_out(k, p):
            idx = k[:, None] - i[None, :] + self.tpb
            g = jnp.take(xp, jnp.clip(jnp.asarray(idx), 0,
                                      xp.shape[-2] - 1), axis=-2)
            rows = jnp.asarray(self.branches)[jnp.asarray(p)]  # (n, tpb)
            return jnp.einsum("...nic,ni->...nc", g, rows)

        y1 = tap_out(k1, p1)
        y2 = tap_out(k2, p2)
        f = jnp.asarray(frac)[:, None]
        return y1 * (1.0 - f) + y2 * f


@partial(jax.jit, static_argnames=("n_out", "nq", "p_out", "k_in",
                                   "k_span"))
def _periodic_resample(x_rel, w, phi0, n_out: int, nq: int, p_out: int,
                       k_in: int, k_span: int):
    """x_rel (nq*k_in + k_span, 2) -> (n_out, 2) on-grid samples.

    The stride-K window view is built from ceil(k_span/K) shifted
    reshapes (no gathers), the polyphase combine is ONE MXU matmul
    with the (P, k_span) period matrix, and phi0 (the period phase of
    the first output) is the only dynamic operand."""
    segs = [
        jax.lax.dynamic_slice_in_dim(x_rel, c * k_in, nq * k_in, 0)
        .reshape(nq, k_in, 2)
        for c in range(-(-k_span // k_in))]
    xw = jnp.concatenate(segs, axis=1)[:, :k_span]
    out = jnp.einsum("pk,qkc->qpc", w, xw,
                     preferred_element_type=jnp.float32)
    return jax.lax.dynamic_slice_in_dim(
        out.reshape(nq * p_out, 2), phi0, n_out, 0)


class StreamPreResampler:
    """Block-streamed off-grid pre-resampler (VERDICT r03 missing #5).

    Streams arbitrary-fs captures onto the 31.25 kHz channel grid in
    O(block) memory: host carries only the raw-input tail, the device
    work per block is one matmul with the exact-rational period matrix
    (ArbResampler.periodic_geometry), and the phase never drifts —
    integer bookkeeping replaces the reference flowgraph's
    fractional_resampler state (utils/gmr1_rx_sdr.py:411-417).

    `pull(n)` supplies raw planar float32 (m <= n signals EOF);
    produce_block() returns (on-grid (n_out, 2) DEVICE array, n_valid)
    where n_valid < n_out flags the zero-padded tail after EOF.
    """

    P_MAX = 1 << 20     # period bound: integral-Hz rates stay tiny

    def __init__(self, rr: ArbResampler, n_out: int, pull):
        p_out, k_in, w, b = rr.periodic_geometry()
        assert p_out <= self.P_MAX, (p_out, "period too large; use an "
                                     "integral-Hz capture rate")
        self.p, self.k, self.b = p_out, k_in, b
        self.k_span = w.shape[1]
        self.n_out = n_out
        self.nq = n_out // p_out + 2
        self._w = jnp.asarray(w)
        self._pull = pull
        self._n = 0                  # on-grid samples produced
        self._raw0 = 0               # abs raw index of _raw[0]
        self._raw = np.zeros((0, 2), np.float32)
        self._raw_end = None         # abs raw length once EOF is seen
        self.n_total = None          # total on-grid samples (at EOF)
        num, den = rr.ratio_frac
        self._num, self._den, self._l = num, den, rr.l

    def _ensure_raw(self, end_abs: int) -> None:
        """Grow the raw buffer to cover [..., end_abs)."""
        have = self._raw0 + self._raw.shape[0]
        need = end_abs - have
        if need <= 0 or self._raw_end is not None:
            pass
        else:
            got = np.asarray(self._pull(need), np.float32)
            if got.shape[0]:
                self._raw = np.concatenate([self._raw, got]) \
                    if self._raw.shape[0] else got
            if got.shape[0] < need:
                self._raw_end = self._raw0 + self._raw.shape[0]
                # exact total: outputs whose last tap k2(n) fits
                ll, num, den = self._l, self._num, self._den
                n_est = int(self._raw_end * num / den)
                while ((n_est * ll * den) // num + 1) // ll \
                        > self._raw_end - 1:
                    n_est -= 1
                while ((((n_est + 1) * ll * den) // num + 1) // ll
                       <= self._raw_end - 1):
                    n_est += 1
                self.n_total = n_est + 1

    def produce_block(self):
        """Next n_out on-grid samples as a device array + valid count."""
        q0, phi0 = divmod(self._n, self.p)
        start = q0 * self.k + self.b
        length = self.nq * self.k + self.k_span
        self._ensure_raw(start + length)
        # assemble [start, start+length) with zero pads at both ends
        x = np.zeros((length, 2), np.float32)
        lo = max(start, self._raw0)
        hi = min(start + length, self._raw0 + self._raw.shape[0])
        if hi > lo:
            x[lo - start:hi - start] = \
                self._raw[lo - self._raw0:hi - self._raw0]
        out = _periodic_resample(jnp.asarray(x), self._w, phi0,
                                 self.n_out, self.nq, self.p, self.k,
                                 self.k_span)
        n_valid = self.n_out if self.n_total is None \
            else max(0, min(self.n_out, self.n_total - self._n))
        self._n += self.n_out
        # drop raw the next block can no longer need
        nxt = (self._n // self.p) * self.k + self.b
        drop = max(0, nxt - self._raw0)
        if drop:
            self._raw = self._raw[drop:]
            self._raw0 += drop
        return out, n_valid


# --------------------------------------------------------------------------
# Full channelizer front-end
# --------------------------------------------------------------------------

class Channelizer:
    """Wideband capture -> per-carrier streams at sps x symbol rate.

    Mirrors the reference PFBBase/PFBOutputBranch structure
    (utils/gmr1_rx_sdr.py:391-602): grid alignment pre-rotation,
    optional pre-resampling to an integer channel grid, 2x-oversampled
    analysis, per-output RRC resampling (+ subchannel recombination for
    wide carriers).
    """

    def __init__(self, samp_rate: float, center_freq: float, sps: int = 4,
                 need_nx: bool = False):
        self.samp_rate = samp_rate
        self.center_freq = center_freq
        self.sps = sps
        cw = BASE_BANDWIDTH

        mid = align_freq(center_freq)
        self.rotation = (2.0 * np.pi * (center_freq - mid) / samp_rate
                         if abs(mid - center_freq) > 200 else 0.0)
        self.pfb_center_freq = mid

        self.n_chans = (int(np.ceil(samp_rate / cw)) + 1) & ~1
        resamp = (self.n_chans * cw) / samp_rate
        # exact rational ratio when fs is integral Hz: enables the
        # drift-free streaming form (StreamPreResampler)
        frac = (int(self.n_chans * cw), int(samp_rate)) \
            if samp_rate == int(samp_rate) else None
        self.pre_resamp = None if abs(resamp - 1.0) < 1e-5 \
            else ArbResampler(resamp, ratio_frac=frac)
        mid_rate = self.n_chans * cw

        if need_nx:   # perfect-reconstruction prototype (:420-428)
            taps = filters.low_pass_2(1.0, self.n_chans, 0.5, 0.2, 80,
                                      "blackmanharris")
        else:         # looser filter (:430-437)
            taps = filters.low_pass(1.0, mid_rate, cw * 0.5, cw * 0.25)
        self.analyzer = PFBAnalyzer(self.n_chans, taps)
        self.chan_rate = 2.0 * cw                 # 2x oversampled
        self._resamplers: dict = {}

    def freq2index(self, freq: float) -> int | None:
        """(:485-491)"""
        idx = int(round((freq - self.pfb_center_freq) / BASE_BANDWIDTH))
        if idx >= self.n_chans // 2 or idx <= -(self.n_chans // 2):
            return None
        return idx + self.n_chans if idx < 0 else idx

    def process(self, x) -> jax.Array:
        """Wideband planar (N, 2) -> channel bank (R, M, 2)."""
        x = jnp.asarray(x, jnp.float32)
        if self.rotation:
            ph = cplx.expi(self.rotation
                           * jnp.arange(x.shape[0], dtype=jnp.float32))
            x = cplx.mul(x, ph)
        if self.pre_resamp is not None:
            x = self.pre_resamp(x)
        return self.analyzer(x)

    def _rrc_resampler(self, width: int) -> ArbResampler:
        key = ("rrc", width)
        if key not in self._resamplers:
            sym = BASE_SYMRATE * width
            in_rate = self.chan_rate if width == 1 else sym * self.sps
            ratio = (sym * self.sps) / in_rate
            ntaps = int(11.0 * 32 * in_rate / sym)
            taps = filters.root_raised_cosine(32.0, 32.0 * in_rate, sym,
                                              0.35, ntaps)
            self._resamplers[key] = ArbResampler(ratio, taps)
        return self._resamplers[key]

    def _sub_resampler(self, width: int) -> ArbResampler:
        key = ("sub", width)
        if key not in self._resamplers:
            ratio = (BASE_SYMRATE * width * self.sps) / self.chan_rate
            self._resamplers[key] = ArbResampler(ratio)
        return self._resamplers[key]

    def wide_streamer(self, ch: Channel, block_rows: int) -> "WideStreamer":
        """Streamed form of extract() for a wide carrier: feed bank-row
        blocks, get stream chunks that concatenate to exactly the
        offline extract output."""
        return WideStreamer(self, ch, block_rows)

    def extract(self, chans: jax.Array, ch: Channel) -> np.ndarray | None:
        """Channel bank -> one carrier's planar stream at sps*sym_rate."""
        if ch.width == 1:
            idx = self.freq2index(ch.frequency)
            if idx is None:
                return None
            return self._rrc_resampler(1)(chans[:, idx])

        # wide carrier: rotate-and-sum subchannels at the output rate,
        # then RRC (the pfb_synthesizer role, :566-589)
        out_rate = BASE_SYMRATE * ch.width * self.sps
        acc = None
        up = self._sub_resampler(ch.width)
        for sub in ch.subchannels:
            idx = self.freq2index(sub.frequency)
            if idx is None:
                return None
            s = up(chans[:, idx])
            df = sub.frequency - ch.frequency
            # exact wrapped phase: df and out_rate are integer Hz, so
            # the phasor repeats every period samples — index mod keeps
            # the f32 phase argument small over long captures
            period = _phase_period(df, out_rate)
            ph = cplx.expi(
                (2.0 * np.pi * df / out_rate)
                * (jnp.arange(s.shape[0]) % period).astype(jnp.float32))
            s = cplx.mul(s, ph)
            acc = s if acc is None else acc + s
        rrc = self._rrc_resampler(ch.width)
        return rrc(acc)


def _phase_period(df: float, out_rate: float) -> int:
    """Sample period after which 2*pi*df*n/out_rate wraps an integer
    number of turns (df, out_rate integer Hz)."""
    return int(out_rate) // np.gcd(int(abs(df)) or 1, int(out_rate))


class WideStreamer:
    """Streamed wide-carrier synthesizer (the block form of
    Channelizer.extract for width > 1, utils/gmr1_rx_sdr.py:566-589).

    Per block of bank rows: per-subchannel fractional resample to the
    output rate (static block-periodic gather geometry), rotate each
    subchannel to its offset with phase carried across blocks, sum, and
    RRC-filter (the width-RRC at ratio 1 is a plain FIR).  All state —
    subchannel resampler history, FIR history, rotation phase — is
    carried, so chunks concatenate to exactly the offline extract
    output (parity-tested in tests/test_channelizer.py)."""

    def __init__(self, chz: Channelizer, ch: Channel, block_rows: int):
        assert ch.width > 1
        self.ch = ch
        cols = [chz.freq2index(sub.frequency) for sub in ch.subchannels]
        assert all(c is not None for c in cols), (ch, cols)
        self.cols = np.asarray(cols, np.int32)
        w = ch.width
        up = chz._sub_resampler(w)
        rrc = chz._rrc_resampler(w)
        out_rate = BASE_SYMRATE * w * chz.sps
        n_out = block_rows * up.ratio
        self.n_out = int(round(n_out))
        assert abs(self.n_out - n_out) < 1e-6, (block_rows, up.ratio)
        geom = up.block_gather(self.n_out, up.tpb)
        self.h_up = up.tpb
        dfs = np.asarray([sub.frequency - ch.frequency
                          for sub in ch.subchannels], np.float64)
        dphi = (2.0 * np.pi * dfs / out_rate).astype(np.float32)
        periods = np.asarray([_phase_period(df, out_rate) for df in dfs],
                             np.int64)
        fir = np.asarray(rrc.branches[0], np.float32)
        t_fir = len(fir)
        nw = len(cols)

        def step(rows_w, hist_up, hist_fir, n0):
            rows_full = jnp.concatenate([hist_up, rows_w], axis=1)
            s = up.resample_window(rows_full, *geom)      # (W, n_out, 2)
            # exact wrapped rotation (see _phase_period): index mod per
            # subchannel keeps the f32 phase argument small forever
            idx = (n0[:, None] + jnp.arange(self.n_out)) \
                % jnp.asarray(periods)[:, None]
            ph = jnp.asarray(dphi)[:, None] * idx.astype(jnp.float32)
            acc = jnp.sum(cplx.mul(s, cplx.expi(ph)), axis=0)
            xf = jnp.concatenate([hist_fir, acc], axis=0)
            y = jnp.zeros((self.n_out, 2), jnp.float32)
            for i in range(t_fir):                         # ratio-1 FIR
                y = y + fir[i] * jax.lax.slice_in_dim(
                    xf, t_fir - i, t_fir - i + self.n_out, axis=0)
            return y, rows_full[:, -self.h_up:], xf[-t_fir:]

        self._step = jax.jit(step)
        self._periods = periods
        self._state = (jnp.zeros((nw, self.h_up, 2), jnp.float32),
                       jnp.zeros((t_fir, 2), jnp.float32),
                       np.zeros(nw, np.int64))

    def feed(self, bank_rows) -> np.ndarray:
        """bank_rows: carrier-major block rows (M, R_b, 2).  Returns the
        wide stream chunk (n_out, 2) as host numpy."""
        hist_up, hist_fir, n0 = self._state
        rows_w = bank_rows[jnp.asarray(self.cols)]
        y, hist_up, hist_fir = self._step(rows_w, hist_up, hist_fir,
                                          jnp.asarray(n0))
        self._state = (hist_up, hist_fir,
                       (n0 + self.n_out) % self._periods)
        return np.asarray(y)
