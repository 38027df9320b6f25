"""Batched full-transponder wideband receiver, block-streamed + shardable.

The application form of the transponder pipeline: one wideband capture
in, every carrier decoded out.  The reference achieves this with a
GNURadio channelizer process feeding one `gmr1_rx` process per ARFCN
(utils/gmr1_process_recording.py:89-110 + src/gmr1_rx.c:852-895); here
it is a single program where the chip always sees large static-shape
batches and device memory stays O(block), not O(capture):

  TDMA block loop (block_frames frames = 0.32 s per step), ONE ingest
  step per block:
    PFB analysis of the block's wideband samples with the carried
    overlap-save halo (streaming analysis is sample-exact vs offline)
      -> [mesh given] host-overlapped halo shards + all_to_all
         reshard: time-sharded analysis flips to carrier-sharded — the
         distributed-filterbank transpose, riding ICI
      -> per-carrier RRC resample to sps x symbol rate via ONE static
         per-frame window matrix (MXU matmul; geometry repeats exactly
         every frame: 2500 bank rows <-> 936*sps output samples), with
         the carried tpb-row bank history making blocks seamless
      -> rolling stream buffer of (block_frames+1) tail + block_frames
         new frames per carrier (one block of lookahead so every burst
         window of the frames being processed is resident)
  then per block, three batched demod phases over the buffer:
    phase 1  ONE call demodulates + FEC-decodes the BCCH and CCCH
             windows of every (carrier, frame) pair in the block
    phase 2  ONE call runs the whole TCH3 slot path for carriers
             with an assigned channel: window energy, DKAB, burst
             type detect, FACCH *and* speech demod — everything
             computed, winner selected host-side
    phase 3  ONE call demodulates NT9 windows for TCH9 carriers
  The per-carrier channel FSMs (gmr1_rx.c:356-600) then walk the
  batched results on host: they are tiny and sequential, and the
  host pays ~4 device round-trips per 0.32 s block.

With `mesh=jax.sharding.Mesh(...)` the ingest step runs as one SPMD
shard_map program (time-sharded analysis, carrier-sharded back-end) and
the phase calls auto-partition over the carrier-sharded stream buffer —
the multi-chip deployment form.  `mesh=None` is the single-chip form of
the SAME program; both decode identical frames (tests/test_wideband.py).

Differences from the per-carrier `Receiver` (both intentional):
  * one FCCH beam per carrier by default (`beams=1`); `beams=k` runs
    the reference's multi-beam scan (gmr1_rx.c:643-741) batched over
    every carrier and forks up to k beams per ARFCN;
  * closed-loop time/freq corrections from good BCCH bursts and SI1
    slot realignment apply at the NEXT block boundary rather than the
    next burst — at <= 8 frames (0.32 s) of latency the residuals stay
    well inside the demod search window.

The traffic channel (IMM.ASS / ASS.CMD.1) is taken from the same
carrier's stream: the wideband bank holds every ARFCN, so no separate
TCH capture file is needed (gmr1_rx.c's argv tch.cfile).
"""

from __future__ import annotations

import time
from dataclasses import dataclass, field
from functools import partial

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import NamedSharding, PartitionSpec as P

from .. import native
from ..channelizer import Channelizer
from ..channelizer.arfcn import BASE_BANDWIDTH, _BASES
from ..l1 import bcch, ccch, facch3, facch9, tch3, tch9
from ..ops import a5 as a5op
from ..ops import cplx
from ..ops.interleave import InterleaverState
from ..sdr import bursts as BU
from ..sdr import dkab, fcch, modem
from ..sdr.defs import SYM_RATE
from . import gsmtap
from .cfile import BoundedStream
from .receiver import (ChanDesc, Receiver, bcch_tdma_align,
                       ccch_imm_ass_parse, ccch_is_imm_ass,
                       facch3_ass_cmd_1_parse, facch3_is_ass_cmd_1)

ROWS_PER_FRAME = 2500     # bank rows per TDMA frame: 936*62500/23400


def _pad_cnt(n: int) -> int:
    """Pad a batch count to a stable bucket: powers of two up to 128
    (few recompiles while carrier sets grow), then multiples of 128
    (lane-aligned; pow2 doubling would 2x the device work at
    transponder scale — 1088 active carriers must not pad to 2048)."""
    if n <= 128:
        return 1 if n <= 1 else 1 << (n - 1).bit_length()
    return -(-n // 128) * 128


@partial(jax.jit, static_argnames=("ft", "sps", "t_tail"))
def _acq_pwr_block(ft, buf, sps: int, t_tail: int):
    """Incremental FCCH scan, one block: symbol-rate dual-chirp
    correlation power for the windows ENDING in this block's new
    samples.  buf: the (M, T_buf, 2) ingest stream buffer (T_tail tail
    + S_b new); returns (M, S_b/sps) — concatenating blocks yields the
    one-shot scan's power series offset by len_syms-1 (see acquire)."""
    y = buf[:, ::sps]                   # tail start is sps-aligned
    seg = jax.lax.slice_in_dim(
        y, t_tail // sps - (ft.len_syms - 1), y.shape[1], axis=1)
    return fcch.scan_pwr(ft, seg)


@partial(jax.jit, static_argnames=("ft", "sps", "blen"))
def _acq_fine_snr(ft, w3, off, sps: int, blen: int):
    """Fine TOA + freq err + SNR per candidate from its margin window
    w3 (C, 3*blen, 2) with the rough TOA at offset `off` (C,).  Returns
    (rel int32 in [0, 2*blen] — refined TOA relative to the window —,
    freq_err, snr).  The clip only binds for noise channels whose
    spurious fine TOA exceeds +-blen; real carriers' fine TOA is a few
    samples and matches the one-shot form exactly."""
    def cut(w, o):
        return jax.lax.dynamic_slice(w, (o, 0), (blen, 2))
    wf = jax.vmap(cut)(w3, off)
    toa_f, ferr = fcch.fine(ft, wf, sps)
    rel = jnp.clip(off + toa_f, 0, 2 * blen).astype(jnp.int32)
    ws = jax.vmap(cut)(w3, rel)
    return rel, ferr, fcch.snr(ft, ws, sps, -ferr)


def _energy(w):
    """Mean |x|^2 excluding len>>5 border samples (gmr1_rx.c:172-182),
    batched on device."""
    n = w.shape[-2]
    b = n >> 5
    return jnp.sum(cplx.abs2(w[..., b:n - b, :]), axis=-1) / n


@partial(jax.jit, static_argnames=("wlen",))
def _windows_rows(streams, rows, idx, wlen: int):
    """streams (M, Ns, 2), rows (C,), idx (C, F) -> (C, F, wlen, 2).

    Vmapped dynamic_slice: lowers to ONE gather of (1, wlen, 2)-sized
    slices — the form XLA:TPU tiles well.  Fuses the carrier-row select
    with the window slice (`streams[rows]` would copy the whole ~0.5 GB
    stream buffer per phase call) and beats the flat per-element gather
    by ~6x at transponder scale (measured 209 -> 37 ms per phase)."""
    wlen2 = streams.shape[-1]

    def one(r, i):
        return jax.lax.dynamic_slice(streams, (r, i, 0),
                                     (1, wlen, wlen2))[0]
    return jax.vmap(jax.vmap(one, in_axes=(None, 0)))(rows, idx)


# --------------------------------------------------------------------------
# device phases (jitted once per (C, F) shape)
# --------------------------------------------------------------------------

@partial(jax.jit, static_argnames=("sps", "nb"))
def _phase_ctrl(streams, meta, freqs, sps: int, nb: int):
    """BCCH + CCCH demod/decode for the block's scheduled control
    windows.  `meta` (C, 1+NB+NC) int32 packs [row | idx_b | idx_c]
    into ONE transfer (each small device_put costs a full tunnel round
    trip, ~70 ms on the tunneled chip)."""
    win_b, win_c = 20 * sps, 10 * sps
    fs = -freqs[:, None]
    rows, idx_b, idx_c = meta[:, 0], meta[:, 1:1 + nb], meta[:, 1 + nb:]

    wb = _windows_rows(streams, rows, idx_b, BU.BCCH.len_syms * sps + win_b)
    rb = modem.demod(BU.BCCH, wb, sps=sps, win=win_b, freq_shift=fs)
    l2b, badb, _ = bcch.decode(rb.ebits)

    wc = _windows_rows(streams, rows, idx_c, BU.DC6.len_syms * sps + win_c)
    rc = modem.demod(BU.DC6, wc, sps=sps, win=win_c, freq_shift=fs)
    l2c, badc, _ = ccch.decode(rc.ebits)

    return dict(l2b=l2b, badb=badb, toab=rb.toa, ferrb=rb.freq_err,
                eb=_energy(wb), l2c=l2c, badc=badc, ec=_energy(wc))


def _bt_from_demods(rf, rs, e_toa: float):
    """Burst-type classification from the two demod results — the same
    peak powers and e_toa-distance gate modem.detect computes
    (pi4cxpsk.c:657-659), without redoing the sync correlations."""
    def score(r):
        return r.pwr / jnp.maximum(jnp.abs(e_toa - r.toa), 1e-6)
    return jnp.argmax(jnp.stack([score(rf), score(rs)], axis=-1),
                      axis=-1).astype(jnp.int32)


@partial(jax.jit, static_argnames=("sps",))
def _phase_tch3(streams, meta, freqs, sps: int):
    """Full TCH3 slot path: energy, DKAB, type detect, FACCH + speech
    demod for every (carrier, frame) — demod everything, select on
    host (gmr1_rx.c:531-600 restructured).  `meta` (C, 2+F) int32
    packs [row | p | idx]."""
    w = sps + sps // 2
    fs = -freqs[:, None]
    rows, p, idx_t = meta[:, 0], meta[:, 1], meta[:, 2:]
    wt = _windows_rows(streams, rows, idx_t, BU.NT3_FACCH.len_syms * sps + w)
    rd = dkab.demod(wt, sps, p[:, None], fs)
    rf = modem.demod(BU.NT3_FACCH, wt, sps=sps, win=w, freq_shift=fs)
    rs = modem.demod(BU.NT3_SPEECH, wt, sps=sps, win=w, freq_shift=fs)
    bt = _bt_from_demods(rf, rs, float(w >> 1))
    return dict(et=_energy(wt), dk_bits=rd.ebits, dk_found=rd.found,
                bt=bt, f_ebits=rf.ebits, f_sid=rf.sync_id, s_ebits=rs.ebits)


@partial(jax.jit, static_argnames=("sps",))
def _phase_tch9(streams, meta, freqs, sps: int):
    """NT9 demod for every (carrier, frame) (gmr1_rx.c:276-353).
    `meta` (C, 1+F) int32 packs [row | idx]."""
    w = sps + sps // 2
    fs = -freqs[:, None]
    rows, idx_t = meta[:, 0], meta[:, 1:]
    wt = _windows_rows(streams, rows, idx_t, BU.NT9.len_syms * sps + w)
    r = modem.demod(BU.NT9, wt, sps=sps, win=w, freq_shift=fs)
    return dict(ebits=r.ebits, sid=r.sync_id)


@jax.jit
def _tch9_chain(ebits, il, fns, key, valid_f):
    """Chained 9k6 CSD decode, all-device: `ebits` (C9, F, 662) stays
    resident from _phase_tch9 (no 24 MB host round trip), the A5/1
    keystreams compute on device from the frame numbers (ops.a5
    batched scan, parity-tested vs the native C), rings gated per
    burst by `valid_f` (F, C9)."""
    c9, f_cnt = ebits.shape[0], ebits.shape[1]
    ks = a5op.keystream(key, fns.reshape(-1), 658)[0]
    ciph_f = ks.reshape(c9, f_cnt, 658).swapaxes(0, 1)
    ebits_f = jnp.swapaxes(ebits, 0, 1)
    return tch9.decode_frames(ebits_f, tch9.MODE_9K6, il, ciph_f, valid_f)


def _fetch(tree):
    """device_get with async host copies started for EVERY leaf first:
    jax fetches leaves one at a time, and on a tunneled device each
    synchronous fetch pays the full link round trip — batching the
    copy starts collapses N latencies to ~1."""
    for x in jax.tree_util.tree_leaves(tree):
        if hasattr(x, "copy_to_host_async"):
            x.copy_to_host_async()
    return jax.device_get(tree)


# --------------------------------------------------------------------------
# host-side per-carrier state
# --------------------------------------------------------------------------

@dataclass
class _Carrier:
    col: int                 # channel-bank column
    arfcn: int
    cd: ChanDesc
    snr: float
    frames: list = field(default_factory=list)   # (type, fn, tn, bytes)
    speech: list = field(default_factory=list)
    csd: list = field(default_factory=list)
    bcch_energy: float = float("nan")
    done: bool = False


class WidebandReceiver:
    """Decode every carrier of a wideband capture (see module doc).

    `wb` is planar float32 (N, 2) or complex64 (N,) host samples.
    `mesh`: optional jax.sharding.Mesh — runs the ingest step SPMD
    (time-sharded analysis -> carrier-sharded streams).  n_chans must
    divide by the mesh size.
    """

    def __init__(self, wb, samp_rate: float, center_freq: float,
                 sps: int = 4, kc: bytes | None = None,
                 sink: gsmtap.GsmtapSink | None = None,
                 arfcns: list[int] | None = None, snr_min: float = 2.0,
                 block_frames: int = 8, fcch_type: fcch.FcchBurst = fcch.FCCH,
                 band: str = "L", uplink: bool = False,
                 verbose: bool = False, mesh=None, beams: int = 1,
                 wide_channels=None):
        self.sps = sps
        self.kc = np.frombuffer(kc, np.uint8) if kc else np.zeros(8, np.uint8)
        self._kc_dev = jnp.asarray(self.kc)   # hoisted: one H2D, reused
        self.sink = sink
        self.snr_min = snr_min
        self.block_frames = block_frames
        self.fcch_type = fcch_type
        self.verbose = verbose
        self.beams = beams
        self.base_freq = _BASES[(band, uplink)]
        # wide carriers (width 2/3/5) are explicit config, as in the
        # reference channelizer CLI (utils/gmr1_rx_sdr.py:216-339): each
        # gets a streamed synthesizer chain and its own per-carrier
        # Receiver over the recombined stream (run after the block loop)
        self.wide_channels = list(wide_channels or [])

        self.chz = Channelizer(samp_rate, center_freq, sps=sps,
                               need_nx=bool(self.wide_channels))
        self.rrc = self.chz._rrc_resampler(1)
        from .cfile import ArraySource, SampleSource
        if not isinstance(wb, SampleSource):
            wb = np.asarray(wb)
            if wb.ndim == 1:         # complex -> planar
                wb = np.stack([wb.real, wb.imag], axis=-1)
            wb = ArraySource(wb.astype(np.float32))
        # every input streams: samples are consumed strictly forward
        # (live-source role of the reference flowgraph); only the
        # acquisition prefix is buffered for replay.  The grid
        # pre-rotation applies per block (exact float64 phase) and
        # off-grid fs resamples per block through the exact-rational
        # StreamPreResampler — O(block) memory in every mode.
        self._src = wb
        self._rotate = bool(self.chz.rotation)
        self._replay = np.zeros((0, 2), np.float32)
        self._replay_dev: list = []
        self._n_pulled = 0           # samples pulled from the source
        self._n_in = 0               # samples consumed by the block loop
        self._eof = False
        self.n_stream = None         # known at EOF (or for array input)
        self.mesh = mesh
        self.arfcn_filter = arfcns
        self.carriers: list[_Carrier] = []
        self.frames: list[tuple[int, int, int, int, bytes]] = []
        # wall-clock per pipeline section, accumulated across run()
        # (SURVEY §5.1 observability; bench_app.py reports it)
        self.prof: dict[str, float] = {}
        self._build_ingest()
        self._pre = None
        if self.chz.pre_resamp is not None:
            from ..channelizer.pfb import StreamPreResampler
            self._pre = StreamPreResampler(self.chz.pre_resamp,
                                           self.n_block, self._pull)

    def _tick(self, key: str, t0: float) -> float:
        t1 = time.perf_counter()
        self.prof[key] = self.prof.get(key, 0.0) + (t1 - t0)
        return t1

    # --- streamed ingest -------------------------------------------------

    def _build_ingest(self) -> None:
        chz, F, sps = self.chz, self.block_frames, self.sps
        ana = chz.analyzer
        m, hop, p = chz.n_chans, ana.hop, ana.p
        rrc = self.rrc
        frame_out = 936 * sps
        self.frame_out = frame_out
        self.R_b = F * ROWS_PER_FRAME
        self.S_b = F * frame_out
        self.T_tail = (F + 1) * frame_out
        self.T_buf = self.T_tail + self.S_b
        self.n_block = self.R_b * hop
        halo_len = p * m
        H = rrc.tpb

        # one static per-frame RRC window matrix: outputs [f*frame_out,
        # (f+1)*frame_out) of the block from rows_full slice
        # [k0 + f*ROWS_PER_FRAME, + k_span) — the geometry repeats
        # exactly every frame (936*sps out samples per 2500 rows).
        k_min1, W = rrc.window_matrix(frame_out, frame_out)
        k0 = k_min1 - ROWS_PER_FRAME + H
        assert k0 >= 0, (k_min1, H)
        k_span = W.shape[1]
        Wj = jnp.asarray(W)

        def resample(rows_full):          # (Ml, H+R_b, 2) -> (Ml, S_b, 2)
            xw = jnp.stack(
                [jax.lax.slice_in_dim(rows_full, k0 + f * ROWS_PER_FRAME,
                                      k0 + f * ROWS_PER_FRAME + k_span,
                                      axis=1) for f in range(F)], axis=1)
            s = jnp.einsum("nk,mfkp->mfnp", Wj, xw)
            return s.reshape(s.shape[0], self.S_b, 2)

        def tail_half(x_local, halo, stream, rows_full):
            return (x_local[-halo_len:], rows_full[:, -H:],
                    stream[:, -self.T_tail:])

        # wide-carrier streamed synthesizers consume the block's bank
        # rows; only return them from the step when configured.  Each
        # wide channel gets a BoundedStream + an incrementally driven
        # Receiver (stream_run), so wide carriers decode DURING the
        # block loop with O(block) retained memory — the reference
        # splits and decodes wide channels in the same streaming
        # flowgraph (utils/gmr1_rx_sdr.py:566-589).
        self._wide = [self.chz.wide_streamer(ch, self.R_b)
                      for ch in self.wide_channels]
        self._wide_streams = [BoundedStream() for _ in self._wide]
        self._wide_rx = [
            Receiver(bs, self.sps, tch_file=bs, tch_csd_file=bs,
                     kc=self.kc.tobytes(), fcch_type=self.fcch_type,
                     verbose=self.verbose)
            for bs in self._wide_streams]
        self._wide_fwd = [0] * len(self._wide)
        want_rows = bool(self._wide)

        if self.mesh is None:
            def step(x_local, halo, bank_hist, stream_tail):
                blk = jnp.concatenate([halo, x_local], axis=0)
                bank = ana.block(blk)               # (R_b, M, 2)
                rows = jnp.moveaxis(bank, 1, 0)     # (M, R_b, 2)
                rows_full = jnp.concatenate([bank_hist, rows], axis=1)
                stream = jnp.concatenate(
                    [stream_tail, resample(rows_full)], axis=1)
                out = (stream, rows) if want_rows else (stream,)
                return out + tail_half(x_local, halo, stream, rows_full)
            self._step = jax.jit(step)
            self._state = (
                jnp.zeros((halo_len, 2), jnp.float32),
                jnp.zeros((m, H, 2), jnp.float32),
                jnp.zeros((m, self.T_tail, 2), jnp.float32))
            self._put = jnp.asarray
            return

        mesh = self.mesh
        axis = mesh.axis_names[0]
        d = mesh.devices.size
        assert m % d == 0, (m, d)
        r_local = self.R_b // d
        assert self.R_b % d == 0 and r_local % 2 == 0, (self.R_b, d)
        from ..parallel.ingest import (analyze_reshard, ici_bytes_per_step,
                                       overlapped_shards)
        self.ici_bytes_per_block = ici_bytes_per_step(ana, r_local, d)

        def sstep(xh_local, bank_hist, stream_tail):
            # shared SPMD ingest (parallel/ingest.py): host-overlapped
            # halo shards + analysis + bf16 all_to_all -> rows
            rows = analyze_reshard(ana, axis, d, xh_local[0])
            rows_full = jnp.concatenate([bank_hist, rows], axis=1)
            stream = jnp.concatenate(
                [stream_tail, resample(rows_full)], axis=1)
            out = (stream, rows) if want_rows else (stream,)
            return out + (rows_full[:, -H:], stream[:, -self.T_tail:])

        n_out = 4 if want_rows else 3
        self._step = jax.jit(jax.shard_map(
            sstep, mesh=mesh,
            in_specs=(P(axis), P(axis), P(axis)),
            out_specs=(P(axis),) * n_out))
        self._state = (
            jnp.zeros((m, H, 2), jnp.float32),
            jnp.zeros((m, self.T_tail, 2), jnp.float32))
        sh = NamedSharding(mesh, P(axis))
        self._htail = jnp.zeros((halo_len, 2), jnp.float32)

        def put(x):
            shards, self._htail = overlapped_shards(
                jnp.asarray(x), self._htail, halo_len, d)
            return jax.device_put(shards, sh)
        self._put = put

    def _pull(self, n: int) -> np.ndarray:
        """Read n samples from the source (short at EOF), applying the
        grid pre-rotation per block with exact float64 phase."""
        x = np.asarray(self._src.read(n), np.float32)
        if self._rotate and x.shape[0]:
            ph = self.chz.rotation * (
                self._n_pulled + np.arange(x.shape[0], dtype=np.float64))
            ph = np.mod(ph, 2.0 * np.pi).astype(np.float32)
            c, s = np.cos(ph), np.sin(ph)
            x = np.stack([x[:, 0] * c - x[:, 1] * s,
                          x[:, 0] * s + x[:, 1] * c], axis=-1)
        self._n_pulled += x.shape[0]
        return x

    def _next_block(self):
        """Next n_block on-grid samples: acquisition replay buffer
        first, then the source; zero-padded at EOF (which pins
        n_stream).  Off-grid fs: device chunks from the streaming
        pre-resampler."""
        if self._pre is not None:
            if self._replay_dev:
                x, n_valid = self._replay_dev.pop(0)
            else:
                x, n_valid = self._pre.produce_block()
            self._n_in += int(n_valid)
            if n_valid < self.n_block and not self._eof:
                self._eof = True
                rows = self._n_in // self.chz.analyzer.hop
                self.n_stream = int(np.floor(rows * self.rrc.ratio))
            return x
        need = self.n_block
        parts = []
        if self._replay.shape[0]:
            take = self._replay[:need]
            self._replay = self._replay[take.shape[0]:]
            parts.append(take)
            need -= take.shape[0]
        if need:
            parts.append(self._pull(need))
        x = np.concatenate(parts) if len(parts) != 1 else parts[0]
        self._n_in += x.shape[0]
        if x.shape[0] < self.n_block:
            if not self._eof:
                self._eof = True
                rows = self._n_in // self.chz.analyzer.hop
                self.n_stream = int(np.floor(rows * self.rrc.ratio))
            x = np.concatenate(
                [x, np.zeros((self.n_block - x.shape[0], 2), np.float32)])
        return x

    def _ingest_block(self, b: int) -> None:
        """Run the ingest step for block b; sets self.streams (M, T_buf,
        2) and self._buf0 (absolute output sample of buffer index 0)."""
        t = time.perf_counter()
        x = self._next_block()
        out = self._step(self._put(x), *self._state)
        if self._wide:
            self.streams, rows = out[0], out[1]
            self._state = out[2:]
            for ws, bs in zip(self._wide, self._wide_streams):
                bs.feed(ws.feed(rows))
        else:
            self.streams, self._state = out[0], out[1:]
        self._buf0 = b * self.S_b - self.T_tail
        self._tick("ingest_host", t)

    # --- helpers -----------------------------------------------------

    def _log(self, msg: str) -> None:
        if self.verbose:
            print(msg)

    def _col2arfcn(self, col: int) -> int:
        signed = col - self.chz.n_chans if col >= self.chz.n_chans // 2 \
            else col
        f = self.chz.pfb_center_freq + signed * BASE_BANDWIDTH
        return int(round((f - self.base_freq) / BASE_BANDWIDTH))

    def _emit(self, car: _Carrier, chan_type: int, fn: int, tn: int,
              l2) -> None:
        l2b = bytes(bytearray(np.asarray(l2, np.uint8)))
        car.frames.append((chan_type, fn, tn, l2b))
        self.frames.append((car.arfcn, chan_type, fn, tn, l2b))
        if self.sink is not None:
            self.sink.send(chan_type, fn, tn, l2b, arfcn=car.arfcn)

    def _a5(self, fn: int, nbits: int) -> np.ndarray:
        return native.a5_keystream(self.kc, fn, nbits)[0]

    # --- acquisition ---------------------------------------------------

    def _acq_pull_blocks(self, n_abl: int):
        """Pull n_abl ingest blocks from the source, KEEPING them for
        replay into the main loop (samples consume strictly forward).
        Returns (block list padded to n_block, valid input samples)."""
        blocks, valid = [], 0
        if self._pre is not None:
            # off-grid: on-grid blocks from the streaming pre-resampler
            # (device), kept for block-aligned replay into the loop
            for _ in range(n_abl):
                x, nv = self._pre.produce_block()
                self._replay_dev.append((x, nv))
                blocks.append(x)
                valid += int(nv)
            return blocks, valid
        for _ in range(n_abl):
            x = self._pull(self.n_block)
            if x.shape[0]:
                self._replay = np.concatenate([self._replay, x]) \
                    if self._replay.shape[0] else x
            valid += x.shape[0]
            if x.shape[0] < self.n_block:
                x = np.concatenate(
                    [x, np.zeros((self.n_block - x.shape[0], 2),
                                 np.float32)])
            blocks.append(x)
        return blocks, valid

    def _acq_replay(self, blocks):
        """Iterate (block_idx, stream_buffer) by streaming `blocks`
        through the SAME jitted ingest step as the main loop, from
        fresh state (self._state is never mutated; the mesh-mode host
        halo is saved/restored around the pass)."""
        h0 = getattr(self, "_htail", None)
        state, k = self._state, 2 if self._wide else 1
        try:
            for b, x in enumerate(blocks):
                out = self._step(self._put(x), *state)
                state = out[k:]
                yield b, out[0]
        finally:
            if h0 is not None:
                self._htail = h0

    def acquire(self) -> list[_Carrier]:
        """Batched FCCH scan over every grid channel (fcch_single_init
        of gmr1_rx.c:605 vectorized across the whole transponder), with
        optional multi-beam forking (`beams` > 1, gmr1_rx.c:643-741).

        INCREMENTAL: the capture prefix (330 ms primary scan / 650 ms
        multi-beam window) streams through the same block ingest as the
        main loop.  Pass 1 accumulates only symbol-rate dual-chirp
        correlation power per block (the whole-window scan of
        fcch.c:212-342 re-ordered as windows-ending-in-this-block;
        scale-free, see fcch.scan_pwr) — the O(prefix) bank/stream/RRC
        spike of a one-shot analysis (~1 GB at 34 MHz, beams=2) becomes
        one O(block) buffer plus an (M, 650 ms) symbol-rate power map
        (~65 MB).  Pass 2 replays the kept blocks and gathers only each
        candidate's fine/SNR window (+-burst margin).  The block loop
        then streams from sample 0 via the same replay."""
        sps, ft = self.sps, self.fcch_type
        blen = ft.len_syms * sps
        B = ft.len_syms
        n330 = (330 * SYM_RATE * sps) // 1000
        n650 = (650 * SYM_RATE * sps) // 1000
        scan = n330 if self.beams <= 1 else n650
        acq_len = scan + 2 * blen
        m = self.chz.n_chans
        hop = self.chz.analyzer.hop
        n_abl = -(-acq_len // self.S_b)

        blocks, valid_in = self._acq_pull_blocks(n_abl)
        avail_out = int(np.floor((valid_in // hop) * self.rrc.ratio))
        if avail_out < n330 + blen:
            raise ValueError("capture shorter than the 330 ms FCCH scan")
        # clip the scan to the real stream length (one-shot parity on
        # captures shorter than the 650 ms multi-beam window): windows
        # past EOF are zero-padded and would null SI-cycle-mixed
        # candidates in rough_multi_batch_pwr
        n_corr = -(-min(scan + blen, avail_out - blen) // sps) - B + 1

        # ---- pass 1: correlation-power scan -----------------------------
        parts = [_acq_pwr_block(ft, buf, sps, self.T_tail)
                 for _, buf in self._acq_replay(blocks)]
        pwr = jnp.concatenate(parts, axis=1)[:, B - 1:B - 1 + n_corr]
        del parts
        if self.beams <= 1:
            toa_r = np.asarray(jax.device_get(
                fcch.rough_from_pwr(ft, pwr, sps)))[:, None]
            valid = np.ones_like(toa_r, bool)
        else:
            toa_r, valid = fcch.rough_multi_batch_pwr(ft, pwr, sps,
                                                      k=self.beams)
        del pwr
        toa_r = np.clip(toa_r, 0, acq_len - 2 * blen).astype(np.int64)

        # ---- pass 2: gather candidate fine/SNR windows ------------------
        # candidates: every valid (col, beam); an arfcn filter prunes
        # here already (the one-shot form computed fine/snr for all M
        # and filtered at carrier construction — same observable result)
        total = n_abl * self.S_b
        wlen = 3 * blen                     # [toa_r - blen, toa_r + 2*blen)
        cand = []                           # (col, beam, s0)
        per_block: list[list[int]] = [[] for _ in range(n_abl)]
        for col in range(m):
            if self.arfcn_filter is not None \
               and self._col2arfcn(col) not in self.arfcn_filter:
                continue
            for k in range(toa_r.shape[1]):
                if not valid[col, k]:
                    continue
                s0 = min(max(int(toa_r[col, k]) - blen, 0), total - wlen)
                bw = max(0, -(-(s0 + wlen) // self.S_b) - 1)
                per_block[bw].append(len(cand))
                cand.append((col, k, s0))

        gathered: list = [None] * len(cand)
        if cand:
            for b, buf in self._acq_replay(blocks):
                grp = per_block[b]
                if not grp:
                    continue
                n_pad = _pad_cnt(len(grp))
                pad = n_pad - len(grp)
                cols = np.asarray(
                    [cand[ci][0] for ci in grp] + [cand[grp[0]][0]] * pad,
                    np.int32)
                base = b * self.S_b - self.T_tail
                starts = np.asarray(
                    [[cand[ci][2] - base] for ci in grp]
                    + [[cand[grp[0]][2] - base]] * pad, np.int32)
                w = _windows_rows(buf, jnp.asarray(cols),
                                  jnp.asarray(starts), wlen)[:, 0]
                for j, ci in enumerate(grp):
                    gathered[ci] = w[j]

        toa = np.zeros(toa_r.shape, np.int64)
        ferr = np.zeros(toa_r.shape, np.float32)
        snr = np.full(toa_r.shape, np.nan, np.float32)  # non-cand: skip
        if cand:
            n_pad = _pad_cnt(len(cand))
            w3 = jnp.stack(gathered + [gathered[0]] * (n_pad - len(cand)))
            off = np.asarray(
                [int(toa_r[c, k]) - s0 for c, k, s0 in cand]
                + [int(toa_r[cand[0][0], cand[0][1]]) - cand[0][2]]
                * (n_pad - len(cand)), np.int32)
            rel, ferr_c, snr_c = _fetch(_acq_fine_snr(
                ft, w3, jnp.asarray(off), sps, blen))
            for ci, (c, k, s0) in enumerate(cand):
                toa[c, k] = s0 + int(rel[ci])
                ferr[c, k] = float(ferr_c[ci])
                snr[c, k] = float(snr_c[ci])
        self.carriers = []
        for col in range(m):
            arfcn = self._col2arfcn(col)
            if self.arfcn_filter is not None \
               and arfcn not in self.arfcn_filter:
                continue
            finite = np.isfinite(snr[col])
            ref = int(np.nanargmax(snr[col])) if finite.any() else 0
            ref_snr = float(snr[col, ref]) if finite.any() else 0.0
            for k in range(toa.shape[1]):
                s = float(snr[col, k])
                if not np.isfinite(s) or s < self.snr_min:
                    continue
                # multi-beam gates vs the strongest beam on this ARFCN
                # (gmr1_rx.c:706-714): snr >= ref/6, |df| < 500 Hz
                if self.beams > 1:
                    if s < ref_snr / 6.0:
                        continue
                    dhz = abs(float(ferr[col, k]) - float(ferr[col, ref])) \
                        * SYM_RATE / (2 * np.pi)
                    if k != ref and dhz > 500.0:
                        continue
                cd = ChanDesc(sps=sps)
                cd.align = int(toa[col, k])
                cd.freq_err = float(ferr[col, k])
                self.carriers.append(_Carrier(col=col, arfcn=arfcn,
                                              cd=cd, snr=s))
                self._log(f"[+] ARFCN {arfcn} FCCH @{cd.align} "
                          f"snr={s:.1f} "
                          f"freq={cd.freq_err * SYM_RATE / 2 / np.pi:.1f} Hz")
        return self.carriers

    # --- block engine ---------------------------------------------------

    def _block_schedule(self, car: _Carrier, F: int):
        """(is_bcch, is_ccch) masks for the next F frames."""
        fns = car.cd.fn + np.arange(F)
        sirfn = (fns - car.cd.sa_sirfn_delay) & 63
        return (sirfn % 8 == 2), ~np.isin(sirfn % 8, (0, 2))

    def _ready(self, car: _Carrier) -> bool:
        """Carrier's next F frames fully resident in the buffer?"""
        a = car.cd.align - self._buf0
        return 64 <= a <= self.T_buf - (self.block_frames + 2) \
            * self.frame_out

    def _mk_idx(self, cars, slot_of, win, frames=None):
        F, sps, buf0 = self.block_frames, self.sps, self._buf0
        e_toa = win >> 1
        nf = F if frames is None else frames.shape[1]
        idx = np.zeros((len(cars), nf), np.int64)
        for i, car in enumerate(cars):
            fr = np.arange(F) if frames is None else frames[i]
            idx[i] = (car.cd.align - buf0 + sps * slot_of(car) * 39
                      - e_toa + fr * self.frame_out)
        return idx

    def _pad_idx(self, idx, n, wlen):
        """Pad rows to n and clip window starts into the buffer (np)."""
        hi = self.T_buf - wlen - 1
        idx = np.concatenate([idx, np.tile(idx[:1], (n - len(idx), 1))])
        return np.clip(idx, 0, hi).astype(np.int32)

    def _dispatch_tch3(self, tch3_set):
        """Dispatch (async) the TCH3 slot-path phase for these carriers."""
        sps = self.sps
        C3 = _pad_cnt(len(tch3_set))
        rows3 = [c.col for c in tch3_set]
        rows3 += [rows3[0]] * (C3 - len(tch3_set))
        w = sps + sps // 2
        idx_t = self._pad_idx(
            self._mk_idx(tch3_set, lambda c: c.cd.tch3.tn, w), C3,
            BU.NT3_FACCH.len_syms * sps + w)
        p3 = np.zeros(C3, np.int32)
        fr3 = np.zeros(C3, np.float32)
        for i, car in enumerate(tch3_set):
            p3[i] = car.cd.tch3.p
            fr3[i] = car.cd.freq_err
        meta = np.concatenate(
            [np.asarray(rows3, np.int32)[:, None], p3[:, None], idx_t],
            axis=1)
        return _phase_tch3(self.streams, jnp.asarray(meta),
                           jnp.asarray(fr3), sps)

    def _process_block(self, active: list[_Carrier]) -> None:
        t = time.perf_counter()
        sps = self.sps
        F = self.block_frames
        frame_len = self.frame_out
        C = _pad_cnt(len(active))
        rows = [c.col for c in active]
        rows += [rows[0]] * (C - len(active))
        rows = np.asarray(rows, np.int32)

        # ---- dispatch ALL phases on PRE-block state (async) -------------
        # phase 1: packed control schedule — the reference demodulates
        # BCCH only on sirfn%8==2 frames and CCCH on sirfn%8 not in
        # {0, 2} (gmr1_rx.c:867,800): at F=8 that is 1 BCCH + 6 CCCH
        # windows per carrier per block, a ~45% cut of phase-1 work.
        # Phases 2/3 depend only on pre-block channel state (tn/p/align
        # are block-boundary state), so all three dispatch back-to-back
        # and ONE batched fetch collapses the tunnel round trips; the
        # rare same-block activations/realigns re-dispatch a
        # supplemental phase for just those carriers below.
        sched = [self._block_schedule(car, F) for car in active]
        fr_b = [np.flatnonzero(s[0]) for s in sched]
        fr_c = [np.flatnonzero(s[1]) for s in sched]
        nb = max(1, max((len(x) for x in fr_b), default=1))
        nc = max(1, max((len(x) for x in fr_c), default=1))

        def pack_frames(fr, n):
            out = np.zeros((len(active), n), np.int64)
            for i, x in enumerate(fr):
                if len(x):
                    out[i, :len(x)] = x
                    out[i, len(x):] = x[-1]     # dup pad, host ignores
            return out
        frames_b = pack_frames(fr_b, nb)
        frames_c = pack_frames(fr_c, nc)
        idx_b = self._mk_idx(active, lambda c: c.cd.sa_bcch_stn, 20 * sps,
                             frames_b)
        idx_c = self._mk_idx(active, lambda c: c.cd.sa_bcch_stn, 10 * sps,
                             frames_c)
        freqs = np.asarray([c.cd.freq_err for c in active]
                           + [0.0] * (C - len(active)), np.float32)
        meta = np.concatenate(
            [rows[:, None],
             self._pad_idx(idx_b, C, BU.BCCH.len_syms * sps + 20 * sps),
             self._pad_idx(idx_c, C, BU.DC6.len_syms * sps + 10 * sps)],
            axis=1)
        ctrl_fut = _phase_ctrl(self.streams, jnp.asarray(meta),
                               jnp.asarray(freqs), sps, nb)
        tch3_pre = [c for c in active if c.cd.tch3.active]
        align_pre = {id(c): c.cd.align for c in tch3_pre}
        t3_fut = self._dispatch_tch3(tch3_pre) if tch3_pre else None
        tch9_pre = [c for c in active if c.cd.tch9.active]
        state9_pre = {id(c): (c.cd.align, c.cd.fn, c.cd.tch9.tn)
                      for c in tch9_pre}
        t9_fut = self._dispatch_tch9(tch9_pre) if tch9_pre else None
        t = self._tick("dispatch", t)
        # fetch the control results + phase-2 results + ONLY the NT9
        # sync ids: the 24 MB NT9 soft bits stay device-resident for
        # the chained decode (_tch9_chain)
        ctrl, t3, t9sid = _fetch(
            (ctrl_fut, t3_fut, t9_fut["sid"] if t9_fut else None))
        t9 = dict(sid=t9sid, ebits=t9_fut["ebits"]) if t9_fut else None
        t = self._tick("fetch_phases", t)

        # ---- host FSM pass 1: BCCH/CCCH + TCH3/TCH9 activation --------
        tch3_new: list[_Carrier] = []
        tch3_from: dict[int, int] = {}       # carrier -> first active f
        for i, car in enumerate(active):
            cd = car.cd
            is_b, is_c = sched[i]
            bcol = {int(f): j for j, f in enumerate(fr_b[i])}
            ccol = {int(f): j for j, f in enumerate(fr_c[i])}
            d_align, d_freq = 0, 0.0
            for f in range(F):
                fn = cd.fn + f
                if is_b[f]:
                    jb = bcol[f]
                    car.bcch_energy = float(ctrl["eb"][i, jb])
                    if not ctrl["badb"][i, jb]:
                        l2 = ctrl["l2b"][i, jb]
                        # closed-loop tracking (gmr1_rx.c:782-789),
                        # applied at the block boundary
                        d_align = int(round(float(ctrl["toab"][i, jb]))) \
                            - (20 * sps >> 1)
                        d_freq = float(ctrl["ferrb"][i, jb])
                        # SI1 realign sets cd.fn to THIS frame's true fn
                        # (and shifts cd.align for a BCCH slot change);
                        # rebase cd.fn to the block start.  sirfn%8
                        # congruence is preserved by construction, so
                        # the precomputed block schedule stays valid.
                        bcch_tdma_align(cd, l2, sps)
                        fn = cd.fn
                        cd.fn = fn - f
                        self._emit(car, gsmtap.GMR1_BCCH, fn,
                                   cd.sa_bcch_stn, l2)
                if is_c[f] and not ctrl["badc"][i, ccol[f]]:
                    jc = ccol[f]
                    min_e = car.bcch_energy / 2.0
                    if not (float(ctrl["ec"][i, jc]) < min_e):  # nan-safe
                        l2 = ctrl["l2c"][i, jc]
                        if ccch_is_imm_ass(l2):
                            st3 = cd.tch3
                            st3.active = True
                            st3.tn, st3.p = ccch_imm_ass_parse(l2)
                            st3.energy_burst = min_e * 0.75 \
                                if np.isfinite(min_e) else 0.0
                            st3.energy_dkab = st3.energy_burst / 8.0
                            st3.weak_cnt = 0
                            st3.ciph = 0
                            st3.sync_id = 0
                            st3.ebits[:] = 0
                            if id(car) not in {id(c) for c in tch3_new}:
                                tch3_new.append(car)
                            tch3_from[id(car)] = f + 1
                            self._log(f"[+] ARFCN {car.arfcn} TCH3 on "
                                      f"TN {st3.tn}")
                        self._emit(car, gsmtap.GMR1_CCCH, fn,
                                   cd.sa_bcch_stn, l2)
            cd._pending = (d_align, d_freq)   # applied after phases 2/3

        t = self._tick("walk_ctrl", t)

        # ---- phase 2 walk over the pre-dispatched results ---------------
        facch_jobs, speech_jobs = [], []
        new_ids = {id(c) for c in tch3_new}
        if tch3_pre:
            # carriers re-assigned or re-aligned during pass 1 have
            # stale pre-dispatched windows: skip here, re-dispatch below
            skip = {id(c): F for c in tch3_pre
                    if id(c) in new_ids or c.cd.align != align_pre[id(c)]}
            fj, sj = self._walk_tch3(tch3_pre, skip, t3, F)
            facch_jobs += fj
            speech_jobs += sj
        supp = tch3_new + [
            c for c in tch3_pre
            if c.cd.align != align_pre[id(c)] and id(c) not in new_ids
            and c.cd.tch3.active]
        if supp:
            t3n = _fetch(self._dispatch_tch3(supp))
            fj, sj = self._walk_tch3(supp, tch3_from, t3n, F)
            facch_jobs += fj
            speech_jobs += sj

        t = self._tick("walk_tch3", t)

        # ---- dispatch every result decode, then ONE fetch ---------------
        # (each separate readback pays the tunnel's D2H round trip)
        futs = {}
        if facch_jobs:
            futs["facch"] = self._dispatch_facch(facch_jobs)
        if speech_jobs:
            futs["speech"] = self._dispatch_speech(speech_jobs)
        ctx9 = None
        if tch9_pre:
            stale9 = [c for c in tch9_pre
                      if (c.cd.align, c.cd.fn, c.cd.tch9.tn)
                      != state9_pre[id(c)]]
            ctx9, futs["t9"] = self._tch9_decode_futs(
                tch9_pre, t9, skip={id(c) for c in stale9})
        else:
            stale9 = []
        res = _fetch(futs)
        if facch_jobs:
            self._walk_facch(facch_jobs, res["facch"])
        if speech_jobs:
            self._walk_speech(speech_jobs, res["speech"])
        t = self._tick("decode_jobs", t)

        # ---- phase 3 emit + supplemental TCH9 ---------------------------
        if ctx9 is not None:
            self._tch9_emit(tch9_pre, ctx9, res["t9"])
        tch9_new = [c for c in active if c.cd.tch9.active
                    and id(c) not in {id(x) for x in tch9_pre}]
        supp9 = tch9_new + [c for c in stale9 if c.cd.tch9.active]
        if supp9:
            t9f = self._dispatch_tch9(supp9)
            t9n = dict(sid=_fetch(t9f["sid"]), ebits=t9f["ebits"])
            ctx9s, futs9s = self._tch9_decode_futs(supp9, t9n)
            self._tch9_emit(supp9, ctx9s, _fetch(futs9s))

        t = self._tick("tch9", t)

        # ---- advance block ----------------------------------------------
        # one frame of slot offset + the largest burst window fits in
        # two extra frame lengths, so stop when the NEXT block would
        # need samples past the capture end (mirrors gmr1_rx.c:893-894);
        # n_stream is unknown until the source hits EOF
        for car in active:
            cd = car.cd
            d_align, d_freq = cd._pending
            del cd._pending
            cd.align += F * frame_len + d_align
            cd.freq_err += d_freq
            cd.fn += F
            if self.n_stream is not None \
               and cd.align + (F + 2) * frame_len > self.n_stream:
                car.done = True

    # --- TCH3 host FSM (gmr1_rx.c:356-600 over batched results) ---------

    def _walk_tch3(self, tch3_set, tch3_from, t3, F):
        facch_jobs, speech_jobs = [], []
        for i, car in enumerate(tch3_set):
            cd, st = car.cd, car.cd.tch3
            f0 = tch3_from.get(id(car), 0)
            for f in range(f0, F):
                if not st.active:
                    break
                fn = cd.fn + f
                be = float(t3["et"][i, f])
                det = (st.energy_dkab + st.energy_burst) / 4.0
                if be < det:
                    if not bool(t3["dk_found"][i, f]):
                        st.weak_cnt += 1
                        if st.weak_cnt > 8:
                            self._log(f"[-] ARFCN {car.arfcn} TCH3 END "
                                      f"@{fn}")
                            st.active = False
                    else:
                        st.energy_dkab = 0.1 * be + 0.9 * st.energy_dkab
                        self._emit(car, gsmtap.GMR1_TCH3 | gsmtap.GMR1_DKAB,
                                   fn, st.tn,
                                   np.asarray(t3["dk_bits"][i, f],
                                              np.int8).view(np.uint8))
                    continue
                st.weak_cnt = 0
                st.energy_burst = 0.1 * be + 0.9 * st.energy_burst
                if int(t3["bt"][i, f]) == 0:          # FACCH3
                    bi = fn & 3
                    sync_id = int(t3["f_sid"][i, f])
                    if sync_id != st.sync_id:
                        facch_jobs.append(self._facch_flush(car, fn))
                    st.ebits[bi] = np.asarray(t3["f_ebits"][i, f])
                    st.sync_id = sync_id
                    st.bi_fn[bi] = fn
                    st.burst_cnt += 1
                    if st.burst_cnt == 4:
                        facch_jobs.append(self._facch_flush(car, fn))
                else:                                  # speech
                    speech_jobs.append(
                        (car, fn, np.asarray(t3["s_ebits"][i, f])))
        return [j for j in facch_jobs if j is not None], speech_jobs

    def _facch_flush(self, car: _Carrier, fn: int):
        """Snapshot a 4-burst FACCH3 group for batched decode
        (_rx_tch3_facch_flush, gmr1_rx.c:394-451)."""
        st = car.cd.tch3
        job = None
        if (st.bi_fn >= 0).any():
            eb = st.ebits.reshape(-1).astype(np.int8).copy()
            ciph = np.concatenate([
                self._a5(int(st.bi_fn[k]) & 0xFFFFFFFF, 96)
                for k in range(4)])
            job = dict(car=car, eb=eb, ciph=ciph, fn=fn,
                       had_ciph=bool(st.ciph))
        st.sync_id ^= 1
        st.burst_cnt = 0
        st.bi_fn[:] = -1
        st.ebits[:] = 0
        return job

    def _dispatch_facch(self, jobs):
        """Both cipher variants of every flush in one batched decode
        (async dispatch; walk with _walk_facch on the fetched result)."""
        eb = np.stack([j["eb"] for j in jobs] * 2)
        ciphs = np.stack([np.zeros(384, np.uint8) for j in jobs]
                         + [j["ciph"] for j in jobs])
        l2, _sbits, bad, _m = facch3.decode(jnp.asarray(eb),
                                            jnp.asarray(ciphs))
        return l2, bad

    def _walk_facch(self, jobs, res) -> None:
        """The reference's cipher retry/learn rule host-side."""
        l2, bad = res
        n = len(jobs)
        for k, j in enumerate(jobs):
            car, st = j["car"], j["car"].cd.tch3
            if j["had_ciph"]:
                l2k, badk = l2[n + k], bad[n + k]
            else:
                l2k, badk = l2[k], bad[k]
                if badk and not bad[n + k]:       # cipher retry hits
                    l2k, badk = l2[n + k], bad[n + k]
                    st.ciph = 1
            if not badk:
                self._emit(car, gsmtap.GMR1_TCH3 | gsmtap.GMR1_FACCH,
                           j["fn"] - 3, st.tn, l2k)
                if facch3_is_ass_cmd_1(l2k):
                    car.cd.tch9.active = True
                    car.cd.tch9.tn = facch3_ass_cmd_1_parse(l2k)
                    # host-numpy ring state: the batched chain stacks
                    # all carriers' rings every block — device-array
                    # state here would cost one ~40 ms tunnel fetch per
                    # carrier at stack time (measured: 42 s for 1064)
                    car.cd.tch9.il = InterleaverState(
                        buf=np.zeros((tch9.INTER_DEPTH, tch9.INTER_WIDTH),
                                     np.float32),
                        n=np.zeros((), np.int32))
                    # frames before the assignment must not feed the
                    # CSD deinterleaver (the reference only starts
                    # rx_tch9 on the next frame, gmr1_rx.c:437-441)
                    car.cd.tch9.from_fn = j["fn"] + 1
                    self._log(f"[+] ARFCN {car.arfcn} TCH9 on TN "
                              f"{car.cd.tch9.tn}")

    def _dispatch_speech(self, jobs):
        eb = np.stack([e for _c, _f, e in jobs])
        ciph = np.stack([
            self._a5(fn, 208) if car.cd.tch3.ciph
            else np.zeros(208, np.uint8)
            for car, fn, _e in jobs])
        f0, f1, _s, _m = tch3.decode(jnp.asarray(eb), jnp.asarray(ciph))
        return f0, f1

    def _walk_speech(self, jobs, res) -> None:
        f0, f1 = res
        for k, (car, _fn, _e) in enumerate(jobs):
            car.speech.append(bytes(bytearray(f0[k])))
            car.speech.append(bytes(bytearray(f1[k])))

    # --- TCH9 (gmr1_rx.c:276-353 over batched demods) --------------------

    def _dispatch_tch9(self, tch9_set):
        """Dispatch (async) the NT9 demod phase for these carriers."""
        sps = self.sps
        n9 = len(tch9_set)
        C9 = _pad_cnt(n9)
        rows9 = [c.col for c in tch9_set]
        rows9 += [rows9[0]] * (C9 - n9)
        w = sps + sps // 2
        idx = self._pad_idx(
            self._mk_idx(tch9_set, lambda c: c.cd.tch9.tn, w), C9,
            BU.NT9.len_syms * sps + w)
        fr9 = np.zeros(C9, np.float32)
        for i, car in enumerate(tch9_set):
            fr9[i] = car.cd.freq_err
        meta = np.concatenate(
            [np.asarray(rows9, np.int32)[:, None], idx], axis=1)
        return _phase_tch9(self.streams, jnp.asarray(meta),
                           jnp.asarray(fr9), sps)

    def _il9_state(self, tch9_set, C9: int) -> InterleaverState:
        """Batched deinterleaver rings for these carriers, kept
        DEVICE-resident across blocks while the set is stable (the
        host stack + 9 MB/block round trip only happens when carriers
        join or leave)."""
        ids = tuple(id(c) for c in tch9_set)
        cache = getattr(self, "_il9_cache", None)
        if cache is not None and cache[0] == ids:
            return cache[2]
        self._il9_writeback()
        n9 = len(tch9_set)
        buf = np.stack([np.asarray(c.cd.tch9.il.buf) for c in tch9_set])
        n = np.stack([np.asarray(c.cd.tch9.il.n) for c in tch9_set])
        if C9 != n9:
            buf = np.concatenate([buf, np.tile(buf[:1], (C9 - n9, 1, 1))])
            n = np.concatenate([n, np.tile(n[:1], C9 - n9)])
        return InterleaverState(buf=jnp.asarray(buf), n=jnp.asarray(n))

    def _il9_writeback(self) -> None:
        """Flush the device-resident ring cache back to per-carrier
        host state (set membership changed)."""
        cache = getattr(self, "_il9_cache", None)
        if cache is None:
            return
        _ids, cars, il_dev = cache
        il_np = _fetch(il_dev)
        for i, car in enumerate(cars):
            car.cd.tch9.il = InterleaverState(buf=il_np.buf[i],
                                              n=il_np.n[i])
        self._il9_cache = None

    def _tch9_decode_futs(self, tch9_set, t9, skip=frozenset()):
        """Dispatch the NT9 result decodes (sid fetched, soft bits
        device-resident): FACCH9 batch + chained CSD decode.  Carriers
        in `skip` are left untouched (stale windows — their
        supplemental re-dispatch handles this block).  Returns
        (ctx, futures) — fetch the futures and emit via _tch9_emit."""
        F = self.block_frames
        n9 = len(tch9_set)
        C9 = _pad_cnt(n9)

        fns = np.asarray([[car.cd.fn + f for f in range(F)]
                          for car in tch9_set], np.int64)       # (n9, F)
        sid = np.asarray(t9["sid"][:n9])
        started = fns >= np.asarray(
            [getattr(c.cd.tch9, "from_fn", 0) for c in tch9_set])[:, None]
        if skip:
            started &= np.asarray(
                [id(c) not in skip for c in tch9_set])[:, None]
        is_f9 = (sid == 0) & started
        is_t9 = (sid == 1) & started
        ctx = dict(fns=fns, is_f9=is_f9, is_t9=is_t9)
        futs = {}

        # FACCH9: one batched decode of every sync_id==0 burst (rows
        # gathered on device; keystreams native host batch)
        jf = np.argwhere(is_f9)
        ctx["jf"] = jf
        if len(jf):
            eb_dev = t9["ebits"][jnp.asarray(jf[:, 0]),
                                 jnp.asarray(jf[:, 1])]
            ufn, uinv = np.unique(
                np.asarray([fns[i, f] for i, f in jf]) & 0xFFFFFFFF,
                return_inverse=True)
            ciph = native.a5_keystream_batch(self.kc, ufn, 658)[uinv]
            l2, _sa, _st, bad, _m = facch9.decode(eb_dev,
                                                  jnp.asarray(ciph))
            futs["f9"] = (l2, bad)

        # TCH9 CSD: ONE chained decode batched across carriers — the
        # validity mask gates each carrier's depth-3 ring so only real
        # TCH9 bursts advance it (identical to the sequential
        # per-burst walk, gmr1_rx.c:321-347 / tch9.c:109).  Soft bits
        # and rings stay on device; A5 computes in-graph; only the
        # decoded payloads (0.5 MB) come back.
        if is_t9.any():
            ilb = self._il9_state(tch9_set, C9)
            vmask = np.zeros((F, C9), bool)
            vmask[:, :n9] = is_t9.T
            fns_pad = np.zeros((C9, F), np.uint32)
            fns_pad[:n9] = fns & 0xFFFFFFFF
            il2, l2a, _sa, _stb, _m = _tch9_chain(
                t9["ebits"], ilb, jnp.asarray(fns_pad),
                self._kc_dev, jnp.asarray(vmask))
            self._il9_cache = (tuple(id(c) for c in tch9_set),
                               list(tch9_set), il2)
            futs["l2a"] = l2a
        return ctx, futs

    def _tch9_emit(self, tch9_set, ctx, res) -> None:
        """Emit fetched TCH9 results (FACCH9 frames + CSD payloads)."""
        F = self.block_frames
        fns, is_t9, jf = ctx["fns"], ctx["is_t9"], ctx["jf"]
        if "f9" in res:
            l2, bad = res["f9"]
            for k, (i, f) in enumerate(jf):
                car = tch9_set[i]
                if not bad[k]:
                    self._emit(car, gsmtap.GMR1_TCH9 | gsmtap.GMR1_FACCH,
                               int(fns[i, f]), car.cd.tch9.tn, l2[k])
        if "l2a" in res:
            l2a = res["l2a"]
            for i, car in enumerate(tch9_set):
                for f in range(F):
                    if is_t9[i, f]:
                        l2 = np.asarray(l2a[f, i])
                        self._emit(car, gsmtap.GMR1_TCH9, int(fns[i, f]),
                                   car.cd.tch9.tn, l2)
                        car.csd.append(bytes(bytearray(l2)))

    # --- wide carriers (width 2/3/5) --------------------------------------

    def _fwd_wide(self, i: int) -> None:
        """Forward wide channel i's newly decoded frames (ARFCN-tagged)
        as they appear — wide frames emit DURING the run, not at EOF."""
        ch, rxw = self.wide_channels[i], self._wide_rx[i]
        for (t, fn, tn, l2b) in rxw.frames[self._wide_fwd[i]:]:
            self.frames.append((ch.arfcn, t, fn, tn, l2b))
            if self.sink is not None:
                self.sink.send(t, fn, tn, l2b, arfcn=ch.arfcn)
        self._wide_fwd[i] = len(rxw.frames)

    def _step_wide(self, eof: bool = False) -> None:
        """Advance every wide channel's incremental Receiver over the
        samples its BoundedStream currently holds, then trim the stream
        to the receiver's look-back bound: host memory stays O(block)
        for the whole capture (the reference's split-then-decode
        pipeline, utils/gmr1_process_recording.py:89-110, as one
        streaming program)."""
        t = time.perf_counter()
        for i, (bs, rxw) in enumerate(zip(self._wide_streams,
                                          self._wide_rx)):
            rxw.stream_run(eof=eof)
            bs.trim(rxw.stream_keep_from())
            self._fwd_wide(i)
        self._tick("wide_host", t)

    def _process_wide(self) -> None:
        """EOF drain + per-channel result carriers for the wide path
        (incremental decode happens in _step_wide during the run)."""
        if self._wide:
            self._step_wide(eof=True)
        for i, (ch, rxw) in enumerate(zip(self.wide_channels,
                                          self._wide_rx)):
            if not len(self._wide_streams[i]):
                continue
            col = self.chz.freq2index(ch.frequency)
            car = _Carrier(col=-1 if col is None else col, arfcn=ch.arfcn,
                           cd=ChanDesc(sps=self.sps), snr=float("nan"))
            car.speech, car.csd = rxw.speech, rxw.csd
            car.frames = list(rxw.frames)
            self.wide_carriers.append(car)
            self._log(f"[+] wide {ch}: {len(rxw.frames)} L2 frames")

    # --- top level --------------------------------------------------------

    def run(self) -> int:
        """Acquire + decode the whole capture.  Returns #L2 frames."""
        if not self.carriers:
            self.acquire()
        self.wide_carriers: list[_Carrier] = []
        if not self.carriers and not self._wide:
            self._log("[!] no FCCH found on any carrier")
            return 0
        # carriers lag the ingest frontier by up to T_tail + their
        # initial align, so after the source hits EOF keep draining
        # with zero-input blocks until every carrier hits its done
        # bound (align + (F+2) frames > n_stream)
        drain_max = self.T_tail // self.S_b + 3
        b = drained = 0
        pending = None   # prefetched (streams, buf0, was_eof) of block b
        while True:
            narrow_done = all(c.done for c in self.carriers)
            if narrow_done and (not self._wide or self._eof):
                break
            if self._eof and drained >= drain_max:
                break
            if pending is None:
                was_eof = self._eof
                self._ingest_block(b)
                pending = (self.streams, self._buf0, was_eof)
            cur = pending
            # one-block ingest prefetch: block b+1's H2D transfer and
            # SPMD analysis dispatch NOW (JAX dispatch is async) and
            # overlap with block b's demod phases + host FSM walk
            eof_next = self._eof
            self._ingest_block(b + 1)
            pending = (self.streams, self._buf0, eof_next)
            self.streams, self._buf0, was_eof = cur
            if was_eof:
                drained += 1
            active = [c for c in self.carriers
                      if not c.done and self._ready(c)]
            if active:
                self._process_block(active)
            if self._wide:
                self._step_wide()
            b += 1
        self._process_wide()
        return len(self.frames)
