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
  then ONE jitted graph per block (_phase_block) computes EVERYTHING
  speculatively from the pre-block channel state: BCCH+CCCH demod and
  FEC decode on the packed control schedule, the full TCH3 slot path
  (energy, DKAB, burst-type detect, FACCH demod, speech decode with
  in-graph A5), NT9 demod, FACCH9 decode, and the chained TCH9 CSD
  decode over device-resident deinterleaver rings — and every small
  result is packed into a single uint8 array, so the block costs the
  host ONE packed int32 meta upload, one dispatch, and ONE fetch.
  The per-carrier channel FSMs (gmr1_rx.c:356-600) then walk the
  fetched results and SELECT: soft bits never cross the link (FACCH3
  bursts gather on demand; rare mid-block FSM events — activation,
  SI1 realign, reassignment — re-run a small correction phase from
  the pre-block rings).  Steady state is ~1.1 link round trips per
  0.32 s block; the next block's sample upload is enqueued behind the
  fetch and overlaps the walks.

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
# device phases
#
# The whole block is ONE jitted graph (_phase_block): control windows,
# the full TCH3 slot path INCLUDING speculative speech decode, NT9
# demod, speculative FACCH9 decode, and the chained TCH9 CSD decode
# over device-resident deinterleaver rings.  On a tunneled chip every
# host->device transfer and every fetch pays a full link round trip,
# so the design point is: one packed int32 meta upload, one dispatch,
# one batched fetch of SMALL results per block — soft bits never leave
# the device (they are decoded in-graph and only the decoded payloads
# come back).  The host FSMs select from the speculative results; the
# rare mid-block FSM events (activation, SI1 realign) re-dispatch a
# small correction phase for just those carriers.
# --------------------------------------------------------------------------

# meta column layout (int32), shared by the block phase and the
# supplemental subset phases; idx groups follow the fixed prefix:
#   0 row | 1 freq(f32 bitcast) | 2 fn0 | 3 p | 4 flags | 5.. idx groups
# flags: bit0 tch9-active, bit1 tch3-ciph, bits 16..16+F "started" mask
# (fn >= tch9.from_fn per frame, gmr1_rx.c:437-441).
_META_FIXED = 5


def _meta_unpack(meta, counts):
    rows = meta[:, 0]
    freqs = jax.lax.bitcast_convert_type(meta[:, 1], jnp.float32)
    fn0 = meta[:, 2].astype(jnp.uint32)
    p = meta[:, 3]
    flags = meta[:, 4]
    groups, o = [], _META_FIXED
    for n in counts:
        groups.append(meta[:, o:o + n])
        o += n
    return rows, freqs, fn0, p, flags, groups


def _bt_from_demods(rf, rs, e_toa: float):
    """Burst-type classification from the two demod results — the same
    peak powers and e_toa-distance gate modem.detect computes
    (pi4cxpsk.c:657-659), without redoing the sync correlations."""
    def score(r):
        return r.pwr / jnp.maximum(jnp.abs(e_toa - r.toa), 1e-6)
    return jnp.argmax(jnp.stack([score(rf), score(rs)], axis=-1),
                      axis=-1).astype(jnp.int32)


def _ctrl_core(streams, rows, fs, idx_b, idx_c, sps):
    """BCCH + CCCH windows: demod + FEC decode (gmr1_rx.c:746-850)."""
    win_b, win_c = 20 * sps, 10 * sps
    wb = _windows_rows(streams, rows, idx_b, BU.BCCH.len_syms * sps + win_b)
    rb = modem.demod(BU.BCCH, wb, sps=sps, win=win_b, freq_shift=fs)
    l2b, badb, _ = bcch.decode(rb.ebits)
    wc = _windows_rows(streams, rows, idx_c, BU.DC6.len_syms * sps + win_c)
    rc = modem.demod(BU.DC6, wc, sps=sps, win=win_c, freq_shift=fs)
    l2c, badc, _ = ccch.decode(rc.ebits)
    return dict(l2b=l2b, badb=badb, toab=rb.toa, ferrb=rb.freq_err,
                eb=_energy(wb), l2c=l2c, badc=badc, ec=_energy(wc))


def _tch3_core(streams, rows, fs, fn0, p, flags, idx_t, key, sps,
               ks208=None):
    """Full TCH3 slot path (gmr1_rx.c:531-600 restructured): energy,
    DKAB, burst-type detect, FACCH demod AND a speculative speech
    decode — A5 keystream in-graph from the frame numbers, cipher
    gated by the per-carrier learned flag (meta bit1).  Only the
    decoded 2x10-byte frames are fetched; the host FSM selects which
    (carrier, frame) results are real.  `ks208` lets the block phase
    share the NT9 keystream's prefix (A5 is a stream cipher: the
    208-bit stream for (key, fn) IS the first 208 bits of the 658-bit
    one) instead of running a second 730-step scan."""
    w = sps + sps // 2
    f_cnt = idx_t.shape[1]
    wt = _windows_rows(streams, rows, idx_t, BU.NT3_FACCH.len_syms * sps + w)
    rd = dkab.demod(wt, sps, p[:, None], fs)
    rf = modem.demod(BU.NT3_FACCH, wt, sps=sps, win=w, freq_shift=fs)
    rs = modem.demod(BU.NT3_SPEECH, wt, sps=sps, win=w, freq_shift=fs)
    bt = _bt_from_demods(rf, rs, float(w >> 1))
    if ks208 is None:
        fns = fn0[:, None] + jnp.arange(f_cnt, dtype=jnp.uint32)[None, :]
        ks = a5op.keystream(key, fns.reshape(-1), 208)[0]
        ks208 = ks.reshape(*fns.shape, 208)
    ciph = ks208 * ((flags >> 1) & 1)[:, None, None].astype(ks208.dtype)
    f0, f1, _s, _m = tch3.decode(rs.ebits, ciph)
    small = dict(et=_energy(wt), dk_bits=rd.ebits, dk_found=rd.found,
                 bt=bt.astype(jnp.int8), f_sid=rf.sync_id.astype(jnp.int8),
                 s_f0=f0, s_f1=f1)
    return small, rf.ebits


def _tch9_core(streams, rows, fs, fn0, idx_9, key, sps):
    """NT9 windows: demod + speculative FACCH9 decode for every
    (carrier, frame) (gmr1_rx.c:276-353).  The A5/1 keystream (the
    reference hardcodes A5/1 for NT9, gmr1_rx.c:310,326) is computed
    once in-graph and shared with the CSD chain."""
    w = sps + sps // 2
    f_cnt = idx_9.shape[1]
    wt = _windows_rows(streams, rows, idx_9, BU.NT9.len_syms * sps + w)
    r = modem.demod(BU.NT9, wt, sps=sps, win=w, freq_shift=fs)
    fns = fn0[:, None] + jnp.arange(f_cnt, dtype=jnp.uint32)[None, :]
    ks = a5op.keystream(key, fns.reshape(-1), 658)[0]
    ks = ks.reshape(*fns.shape, 658)
    l2f9, _sa, _st, badf9, _m = facch9.decode(r.ebits, ks)
    small = dict(sid9=r.sync_id.astype(jnp.int8), l2f9=l2f9, badf9=badf9)
    return small, r.ebits, ks


def _chain_core(e9, ks, il, sid, flags):
    """Chained 9k6 CSD decode over the device-resident depth-3 rings:
    valid = (sync_id==1) & started & tch9-active, all in-graph, so the
    chain dispatches WITH the block phase (no host round trip between
    demod and chain; identical to the sequential per-burst walk,
    gmr1_rx.c:321-347 / tch9.c:109)."""
    f_cnt = e9.shape[1]
    started = (flags[:, None] >> (16 + jnp.arange(f_cnt))[None, :]) & 1
    act9 = (flags & 1)[:, None]
    valid = (sid == 1) & ((started & act9) != 0)
    il2, l2a, _sa, _st, _m = tch9.decode_frames(
        jnp.swapaxes(e9, 0, 1), tch9.MODE_9K6, il,
        jnp.swapaxes(ks, 0, 1), jnp.swapaxes(valid, 0, 1))
    return il2, l2a


def _small_spec(nb: int, nc: int, f_cnt: int):
    """Byte layout of the block phase's fetched results: every small
    output is packed into ONE (C, total_bytes) uint8 array on device,
    because on a tunneled chip each fetched LEAF pays a full link
    round trip (~0.2 s measured) — 19 leaves/block was most of the r04
    fetch wall.  Host unpacks by viewing byte ranges."""
    f = f_cnt
    return [
        ("l2b", np.uint8, (nb, 24)), ("badb", np.bool_, (nb,)),
        ("toab", np.float32, (nb,)), ("ferrb", np.float32, (nb,)),
        ("eb", np.float32, (nb,)),
        ("l2c", np.uint8, (nc, 24)), ("badc", np.bool_, (nc,)),
        ("ec", np.float32, (nc,)),
        ("et", np.float32, (f,)), ("dk_bits", np.int8, (f, 8)),
        ("dk_found", np.bool_, (f,)), ("bt", np.int8, (f,)),
        ("f_sid", np.int8, (f,)),
        ("s_f0", np.uint8, (f, 10)), ("s_f1", np.uint8, (f, 10)),
        ("sid9", np.int8, (f,)), ("l2f9", np.uint8, (f, 38)),
        ("badf9", np.bool_, (f,)), ("l2a", np.uint8, (f, 60)),
    ]


def _pack_small(small, spec):
    """In-graph: coerce every result to its spec dtype (the decode
    chains return e.g. int32 CRC flags), flatten to (C, bytes) uint8
    and concatenate."""
    parts = []
    for k, dt, _tail in spec:
        v = small[k]
        if k == "l2a":                       # (F, C, 60) -> (C, F, 60)
            v = jnp.moveaxis(v, 0, 1)
        c = v.shape[0]
        if dt == np.bool_:
            v = (v != 0).astype(jnp.uint8)
        else:
            v = v.astype(jnp.dtype(dt))
        if v.dtype != jnp.uint8:
            v = jax.lax.bitcast_convert_type(v, jnp.uint8)
        parts.append(v.reshape(c, -1))
    return jnp.concatenate(parts, axis=1)


def _unpack_small(buf, spec):
    """Host: view the fetched (C, bytes) uint8 back into the result
    dict (l2a is returned in its (F, C, 60) on-device layout)."""
    buf = np.asarray(buf)
    c = buf.shape[0]
    out, o = {}, 0
    for k, dt, tail in spec:
        nby = int(np.prod(tail)) * np.dtype(dt).itemsize
        raw = np.ascontiguousarray(buf[:, o:o + nby])
        out[k] = raw.view(dt).reshape(c, *tail)
        o += nby
    out["l2a"] = np.moveaxis(out["l2a"], 0, 1)
    return out


@partial(jax.jit, static_argnames=("sps", "nb", "nc", "f_cnt"))
def _phase_block(streams, meta, il, key, sps: int, nb: int, nc: int,
                 f_cnt: int):
    """ONE graph for the whole block (see section comment).  Returns
    (packed, big): `packed` is the single (C, bytes) uint8 result
    array (one fetch leaf, one link round trip); `big` (FACCH soft
    bits, NT9 soft bits + keystreams, updated rings) stays
    device-resident for the rare correction dispatches."""
    rows, freqs, fn0, p, flags, (idx_b, idx_c, idx_t, idx_9) = \
        _meta_unpack(meta, (nb, nc, f_cnt, f_cnt))
    fs = -freqs[:, None]
    small = _ctrl_core(streams, rows, fs, idx_b, idx_c, sps)
    s9, e9, ks = _tch9_core(streams, rows, fs, fn0, idx_9, key, sps)
    s3, f_ebits = _tch3_core(streams, rows, fs, fn0, p, flags, idx_t,
                             key, sps, ks208=ks[..., :208])
    small.update(s3)
    small.update(s9)
    il2, l2a = _chain_core(e9, ks, il, s9["sid9"], flags)
    small["l2a"] = l2a
    packed = _pack_small(small, _small_spec(nb, nc, f_cnt))
    big = dict(f_ebits=f_ebits, e9=e9, ks=ks, il2=il2)
    return packed, big


@partial(jax.jit, static_argnames=("sps", "f_cnt"))
def _phase_tch3s(streams, meta, key, sps: int, f_cnt: int):
    """Supplemental TCH3 slot path for a carrier subset (same-block
    activations / realigned carriers whose pre-dispatched windows went
    stale)."""
    rows, freqs, fn0, p, flags, (idx_t,) = _meta_unpack(meta, (f_cnt,))
    return _tch3_core(streams, rows, -freqs[:, None], fn0, p, flags,
                      idx_t, key, sps)


@partial(jax.jit, static_argnames=("sps", "f_cnt"))
def _phase_tch9s(streams, meta, key, sps: int, f_cnt: int):
    """Supplemental NT9 demod + FACCH9 for a carrier subset."""
    rows, freqs, fn0, _p, _fl, (idx_9,) = _meta_unpack(meta, (f_cnt,))
    return _tch9_core(streams, rows, -freqs[:, None], fn0, idx_9, key, sps)


@jax.jit
def _chain_fix(il_prev, il2, fix, e9, ks):
    """Correct the chained CSD decode for a carrier subset: re-run the
    chain from the PRE-BLOCK ring rows (il_prev) with the corrected
    validity (host-computed after its FSM walk) and scatter the
    results into the optimistic post-block rings (il2).  `fix` is
    (Cs, 4) int32 [slot | reset | valid bits | is_pad]; e9/ks are the
    subset's resident soft bits / keystreams.  Pad rows target an
    unfixed slot and write back its current value (identity), so the
    duplicate scatter writers stay deterministic."""
    slots, reset, vbits, pad = fix[:, 0], fix[:, 1], fix[:, 2], fix[:, 3]
    f_cnt = e9.shape[1]
    valid = ((vbits[:, None] >> jnp.arange(f_cnt)[None, :]) & 1) != 0
    keep = (1 - reset)
    sub = InterleaverState(
        buf=il_prev.buf[slots] * keep[:, None, None].astype(il_prev.buf.dtype),
        n=il_prev.n[slots] * keep.astype(il_prev.n.dtype))
    sub2, l2a, _sa, _st, _m = tch9.decode_frames(
        jnp.swapaxes(e9, 0, 1), tch9.MODE_9K6, sub,
        jnp.swapaxes(ks, 0, 1), jnp.swapaxes(valid, 0, 1))
    upd_buf = jnp.where((pad != 0)[:, None, None], il2.buf[slots],
                        sub2.buf)
    upd_n = jnp.where(pad != 0, il2.n[slots], sub2.n)
    il3 = InterleaverState(buf=il2.buf.at[slots].set(upd_buf),
                           n=il2.n.at[slots].set(upd_n))
    return il3, l2a


@jax.jit
def _gather_if(x, ij):
    """Gather (i, f) rows from a device-resident (C, F, L) tensor."""
    return x[ij[:, 0], ij[:, 1]]


@jax.jit
def _gather_rows(x, rows):
    """Gather rows of a device-resident (N, ...) tensor."""
    return x[rows]


_facch3_decode = jax.jit(facch3.decode)


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
                 wide_channels=None, h2d_dtype: str = "float32"):
        self.sps = sps
        # h2d_dtype="int16": quantize ingest blocks host-side and
        # dequantize in-graph, HALVING host->device bytes.  The H2D
        # transfer is the app's hard floor on link-bound attaches; SDR
        # front-ends are 8-12 bit anyway.  The scale is PER BLOCK
        # (peak-normalized — a full transponder's aggregate amplitude
        # is ~sqrt(n_carriers) larger than one carrier's and varies
        # with activity), packed into one extra int16 row so no extra
        # transfer is paid; the overlap-save halo is carried on device
        # in float32 so blocks with different scales splice exactly.
        # bench_app verifies the full decode bit-exact under it.
        if h2d_dtype not in ("float32", "int16"):
            raise ValueError(h2d_dtype)
        self._h2d_int16 = h2d_dtype == "int16"
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
        # acquisition prefix blocks, kept DEVICE-resident and already
        # sharded/_put: the acquire passes and the main loop replay
        # them without paying the H2D transfer again
        self._replay_dev: list = []
        self._n_pulled = 0           # samples pulled from the source
        self._n_in = 0               # samples consumed by the block loop
        self._eof = False
        self.n_stream = None         # known at EOF (or for array input)
        self.mesh = mesh
        self.arfcn_filter = arfcns
        self.carriers: list[_Carrier] = []
        self.frames: list[tuple[int, int, int, int, bytes]] = []
        # device-resident batched TCH9 deinterleaver rings, one row per
        # carrier slot (created at the first block; advanced in-graph)
        self._il: InterleaverState | None = None
        self._last_put = None        # last device input block (bench)
        self._last_meta = None       # last block meta (bench)
        self._q_job = None           # in-flight host read/quant job
        self._q_pool = None
        # wall-clock per pipeline section, accumulated across run()
        # (SURVEY §5.1 observability; bench_app.py reports it)
        self.prof: dict[str, float] = {}
        self._build_ingest()
        self._pre = None
        if self._h2d_int16 and self.chz.pre_resamp is not None:
            raise ValueError("h2d_dtype=int16 requires an on-grid fs "
                             "(the off-grid pre-resampler streams device "
                             "chunks, so there is no host transfer to "
                             "quantize)")
        if self.chz.pre_resamp is not None:
            from ..channelizer.pfb import StreamPreResampler
            self._pre = StreamPreResampler(self.chz.pre_resamp,
                                           self.n_block, self._pull)

    def _quant(self, x):
        """Host-side ingest quantization for h2d_dtype=int16:
        peak-normalize the block and prepend one row carrying the
        dequant factor (f32 bitcast into 2 int16), so the scale rides
        the same transfer.  Works on (n, 2) blocks and (d, n, 2)
        mesh-shard stacks alike (one shared scale)."""
        if not self._h2d_int16:
            return x
        x = np.asarray(x, np.float32)
        # min/max reductions instead of abs(x).max(): no |x| temporary,
        # and peak normalization bounds |q| <= 32000 so no clip pass is
        # needed before the int16 cast (this quant runs once per 87 MB
        # block on the host critical path)
        peak = float(max(x.max(initial=0.0), -x.min(initial=0.0)))
        scale = 32000.0 / peak if peak > 0.0 else 1.0
        inv_row = np.frombuffer(
            np.float32(1.0 / scale).tobytes(), np.int16).reshape(1, 2)
        q32 = x * scale
        np.rint(q32, out=q32)
        q = q32.astype(np.int16)
        if x.ndim == 3:                      # (d, n, 2) shard stack
            rows = np.broadcast_to(inv_row[None], (x.shape[0], 1, 2))
            return np.concatenate([rows, q], axis=1)
        return np.concatenate([inv_row, q], axis=0)

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

        def tail_half(blk, stream, rows_full):
            return (blk[-halo_len:], rows_full[:, -H:],
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

        # int16 H2D: blocks arrive peak-quantized with their dequant
        # factor in an extra leading row (see _quant); the dequant
        # fuses into the analysis filter, and the overlap-save halo is
        # carried on device in float32 so per-block scales splice
        # exactly
        int16 = self._h2d_int16

        def dequant(z):
            if not int16:
                return z
            inv = jax.lax.bitcast_convert_type(z[0], jnp.float32)
            return z[1:].astype(jnp.float32) * inv

        if self.mesh is None:
            def step(x_local, halo, bank_hist, stream_tail):
                blk = jnp.concatenate([halo, dequant(x_local)], axis=0)
                bank = ana.block(blk)               # (R_b, M, 2)
                rows = jnp.moveaxis(bank, 1, 0)     # (M, R_b, 2)
                rows_full = jnp.concatenate([bank_hist, rows], axis=1)
                stream = jnp.concatenate(
                    [stream_tail, resample(rows_full)], axis=1)
                out = (stream, rows) if want_rows else (stream,)
                return out + tail_half(blk, stream, rows_full)
            self._step = jax.jit(step)
            self._state = (
                jnp.zeros((halo_len, 2), jnp.float32),
                jnp.zeros((m, H, 2), jnp.float32),
                jnp.zeros((m, self.T_tail, 2), jnp.float32))
            self._put = lambda x: jnp.asarray(self._quant(x))
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
            rows = analyze_reshard(ana, axis, d, dequant(xh_local[0]))
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
            # overlap in float32 (host), then quantize the shard stack
            # (shared per-block scale, one extra row per shard)
            shards, self._htail = overlapped_shards(
                jnp.asarray(np.asarray(x, np.float32)), self._htail,
                halo_len, d)
            if int16:
                shards = jnp.asarray(self._quant(np.asarray(shards)))
            return jax.device_put(shards, sh)
        self._put = put

    def _rotate_x(self, x: np.ndarray, n0: int) -> np.ndarray:
        """Grid pre-rotation with exact float64 phase from absolute
        sample offset n0 (pure — safe off the main thread)."""
        if not (self._rotate and x.shape[0]):
            return x
        ph = self.chz.rotation * (
            n0 + np.arange(x.shape[0], dtype=np.float64))
        ph = np.mod(ph, 2.0 * np.pi).astype(np.float32)
        c, s = np.cos(ph), np.sin(ph)
        return np.stack([x[:, 0] * c - x[:, 1] * s,
                         x[:, 0] * s + x[:, 1] * c], axis=-1)

    def _pull(self, n: int) -> np.ndarray:
        """Read n samples from the source (short at EOF), applying the
        grid pre-rotation per block with exact float64 phase."""
        x = self._rotate_x(np.asarray(self._src.read(n), np.float32),
                           self._n_pulled)
        self._n_pulled += x.shape[0]
        return x

    def _q_start(self) -> None:
        """Submit the NEXT block's host work (source read + rotation +
        int16 quantization, all pure numpy that releases the GIL) to a
        single worker thread, overlapping it with this block's meta
        build + dispatch.  Only the simple single-chip streaming path
        offloads; counters and EOF state are committed on the main
        thread when the job is consumed (_next_put_block)."""
        if (self._q_job is not None or self.mesh is not None
                or self._pre is not None or self._replay_dev
                or self._eof):
            return
        if self._q_pool is None:
            import concurrent.futures
            self._q_pool = concurrent.futures.ThreadPoolExecutor(
                max_workers=1)
        n0, n = self._n_pulled, self.n_block

        def work():
            x = self._rotate_x(
                np.asarray(self._src.read(n), np.float32), n0)
            nv = x.shape[0]
            if nv < n:
                x = np.concatenate(
                    [x, np.zeros((n - nv, 2), np.float32)])
            return self._quant(x), nv
        self._q_job = self._q_pool.submit(work)

    def _pin_eof(self, n_valid: int) -> None:
        """A short block pins the stream length (EOF)."""
        if n_valid < self.n_block and not self._eof:
            self._eof = True
            rows = self._n_in // self.chz.analyzer.hop
            self.n_stream = int(np.floor(rows * self.rrc.ratio))

    def _next_put_block(self):
        """Next n_block on-grid samples, already _put to the device:
        the acquisition replay list first (no repeated H2D), then the
        pre-quantized worker job (_q_start) or the source; zero-padded
        at EOF (which pins n_stream).  Off-grid fs: device chunks from
        the streaming pre-resampler."""
        if self._replay_dev:
            x, n_valid = self._replay_dev.pop(0)
            self._n_in += int(n_valid)
            self._pin_eof(int(n_valid))
            return x
        if self._q_job is not None:
            xq, nv = self._q_job.result()
            self._q_job = None
            self._n_pulled += nv
            self._n_in += nv
            self._pin_eof(nv)
            return jnp.asarray(xq)
        if self._pre is not None:
            x, n_valid = self._pre.produce_block()
            self._n_in += int(n_valid)
            self._pin_eof(int(n_valid))
            return self._put(x)
        x = self._pull(self.n_block)
        self._n_in += x.shape[0]
        self._pin_eof(x.shape[0])
        if x.shape[0] < self.n_block:
            x = np.concatenate(
                [x, np.zeros((self.n_block - x.shape[0], 2), np.float32)])
        return self._put(x)

    def _ingest_block(self, b: int) -> None:
        """Run the ingest step for block b; sets self.streams (M, T_buf,
        2) and self._buf0 (absolute output sample of buffer index 0)."""
        t = time.perf_counter()
        self._last_put = self._next_put_block()
        out = self._step(self._last_put, *self._state)
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
        """Pull n_abl ingest blocks from the source and _put them to
        the device ONCE, keeping the device handles for replay: the two
        acquire passes and the main loop all stream the same blocks, so
        re-paying the H2D transfer (~87 MB/block at 34 MHz) two extra
        times would dominate acquisition on a slow link.  Returns
        (device block list, valid input samples)."""
        blocks, valid = [], 0
        for _ in range(n_abl):
            if self._pre is not None:
                # off-grid: on-grid blocks from the streaming
                # pre-resampler (device chunks)
                x, nv = self._pre.produce_block()
                nv = int(nv)
            else:
                x = self._pull(self.n_block)
                nv = x.shape[0]
                if nv < self.n_block:
                    x = np.concatenate(
                        [x, np.zeros((self.n_block - nv, 2), np.float32)])
            xd = self._put(x)
            self._replay_dev.append((xd, nv))
            blocks.append(xd)
            valid += nv
        return blocks, valid

    def _acq_replay(self, blocks):
        """Iterate (block_idx, stream_buffer) by streaming the already
        device-resident `blocks` through the SAME jitted ingest step as
        the main loop, from fresh state (self._state and the mesh-mode
        host halo are never touched: blocks were sharded at pull
        time)."""
        state, k = self._state, 2 if self._wide else 1
        for b, x in enumerate(blocks):
            out = self._step(x, *state)
            state = out[k:]
            yield b, out[0]

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

        # per replay block: ONE batched window gather; candidates map
        # to rows of the concatenated result (per-candidate device
        # slicing here used to cost ~1000 eager ops, ~2.5 s host)
        blocks_w: list = []
        row_of = np.full(len(cand), -1, np.int64)
        n_rows = 0
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
                blocks_w.append(_windows_rows(
                    buf, jnp.asarray(cols), jnp.asarray(starts),
                    wlen)[:, 0])
                row_of[grp] = n_rows + np.arange(len(grp))
                n_rows += n_pad

        toa = np.zeros(toa_r.shape, np.int64)
        ferr = np.zeros(toa_r.shape, np.float32)
        snr = np.full(toa_r.shape, np.nan, np.float32)  # non-cand: skip
        if cand:
            n_pad = _pad_cnt(len(cand))
            order = np.concatenate(
                [row_of, np.full(n_pad - len(cand), row_of[0], np.int64)])
            w3 = _gather_rows(
                blocks_w[0] if len(blocks_w) == 1
                else jnp.concatenate(blocks_w, axis=0),
                jnp.asarray(order, np.int32))
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

    def _ready(self, car: _Carrier) -> bool:
        """Carrier's next F frames fully resident in the buffer?"""
        a = car.cd.align - self._buf0
        return 64 <= a <= self.T_buf - (self.block_frames + 2) \
            * self.frame_out

    def _build_meta(self, active_ids, F: int):
        """Vectorized per-block bookkeeping: ONE packed int32 meta
        array for the whole block phase, plus the host-side schedule
        arrays the FSM walks index into.  All per-carrier math is
        whole-array numpy — no per-carrier Python loops (the r04
        profile showed the loop form costing ~3 s of host time per
        0.32 s block at transponder scale)."""
        cars = self.carriers
        sps, buf0, fo = self.sps, self._buf0, self.frame_out
        n = len(cars)

        def vec(get, dt):
            return np.fromiter((get(c) for c in cars), dt, n)

        col = vec(lambda c: c.col, np.int64)
        align = vec(lambda c: c.cd.align, np.int64)
        fn0 = vec(lambda c: c.cd.fn, np.int64)
        delay = vec(lambda c: c.cd.sa_sirfn_delay, np.int64)
        stn = vec(lambda c: c.cd.sa_bcch_stn, np.int64)
        freq = vec(lambda c: c.cd.freq_err, np.float32)
        tn3 = vec(lambda c: c.cd.tch3.tn, np.int64)
        p3 = vec(lambda c: c.cd.tch3.p, np.int64)
        ci3 = vec(lambda c: c.cd.tch3.ciph, np.int64)
        tn9 = vec(lambda c: c.cd.tch9.tn, np.int64)
        a9 = vec(lambda c: c.cd.tch9.active, bool)
        ff9 = vec(lambda c: c.cd.tch9.from_fn, np.int64)
        act = vec(lambda c: id(c) in active_ids, bool)

        # control schedule: BCCH on sirfn%8==2, CCCH on sirfn%8 not in
        # {0,2} (gmr1_rx.c:867,800) — at F=8 that is exactly 1 BCCH +
        # 6 CCCH windows per carrier per block, a ~45% cut of control
        # demod work vs all-frames
        fns = fn0[:, None] + np.arange(F)
        r8 = ((fns - delay[:, None]) & 63) % 8
        is_b = r8 == 2
        is_c = (r8 != 0) & (r8 != 2)
        nb = max(1, int(is_b.sum(1).max(initial=0)))
        nc = max(1, int(is_c.sum(1).max(initial=0)))
        # first-nb true frame indices per carrier, in fn order (stable
        # argsort of the inverted mask); surplus columns demod garbage
        # the walk never reads (jb/jc rank maps gate them)
        fr_b = np.argsort(~is_b, axis=1, kind="stable")[:, :nb]
        fr_c = np.argsort(~is_c, axis=1, kind="stable")[:, :nc]

        def idx(tn, frames, win, wlen):
            out = (align[:, None] - buf0 + sps * 39 * tn[:, None]
                   - (win >> 1) + frames * fo)
            return np.clip(out, 0, self.T_buf - wlen - 1)

        w = sps + sps // 2
        fa = np.arange(F)[None, :]
        idx_b = idx(stn, fr_b, 20 * sps, BU.BCCH.len_syms * sps + 20 * sps)
        idx_c = idx(stn, fr_c, 10 * sps, BU.DC6.len_syms * sps + 10 * sps)
        idx_t = idx(tn3, fa, w, BU.NT3_FACCH.len_syms * sps + w)
        idx_9 = idx(tn9, fa, w, BU.NT9.len_syms * sps + w)

        started = fns >= ff9[:, None]
        sbits = (started.astype(np.int64) << (16 + np.arange(F))).sum(1)
        flags = ((a9 & act).astype(np.int64) | ((ci3 & 1) << 1) | sbits)

        meta = np.empty((n, _META_FIXED + nb + nc + 2 * F), np.int32)
        meta[:, 0] = col
        meta[:, 1] = freq.view(np.int32)
        meta[:, 2] = fn0
        meta[:, 3] = p3
        meta[:, 4] = flags
        o = _META_FIXED
        for part in (idx_b, idx_c, idx_t, idx_9):
            meta[:, o:o + part.shape[1]] = part
            o += part.shape[1]
        C = _pad_cnt(n)
        if C != n:
            meta = np.concatenate([meta, np.tile(meta[:1], (C - n, 1))])
        return dict(meta=meta, nb=nb, nc=nc, fns=fns, is_b=is_b, is_c=is_c,
                    jb=np.cumsum(is_b, 1) - 1, jc=np.cumsum(is_c, 1) - 1,
                    a9=a9, act=act, started=started)

    def _build_sub_meta(self, cars, kind: str, F: int):
        """Packed meta for a supplemental subset phase (idx group =
        the one slot the phase demodulates)."""
        sps, buf0, fo = self.sps, self._buf0, self.frame_out
        n = len(cars)
        w = sps + sps // 2
        wlen = (BU.NT3_FACCH if kind == "tch3" else BU.NT9).len_syms \
            * sps + w
        meta = np.zeros((n, _META_FIXED + F), np.int32)
        for i, c in enumerate(cars):
            cd = c.cd
            tn = cd.tch3.tn if kind == "tch3" else cd.tch9.tn
            meta[i, 0] = c.col
            meta[i, 1] = np.float32(cd.freq_err).view(np.int32)
            meta[i, 2] = cd.fn
            meta[i, 3] = cd.tch3.p
            meta[i, 4] = (cd.tch3.ciph & 1) << 1
            base = cd.align - buf0 + sps * 39 * tn - (w >> 1)
            meta[i, _META_FIXED:] = np.clip(
                base + np.arange(F) * fo, 0, self.T_buf - wlen - 1)
        Cs = _pad_cnt(n)
        if Cs != n:
            meta = np.concatenate([meta, np.tile(meta[:1], (Cs - n, 1))])
        return meta

    def _process_block(self, active: list[_Carrier],
                       prefetch=None) -> None:
        t = time.perf_counter()
        if prefetch is not None:
            self._q_start()     # overlap next block's read+quant (host)
        sps = self.sps
        F = self.block_frames
        frame_len = self.frame_out
        cars = self.carriers
        slot = {id(c): i for i, c in enumerate(cars)}
        active_ids = {id(c) for c in active}

        # ---- ONE packed upload + ONE graph on PRE-block state ----------
        # everything below depends only on block-boundary channel state,
        # so the whole block (control + TCH3 + NT9 + CSD chain over the
        # device-resident rings) dispatches before any fetch; the rare
        # same-block activations/realigns re-dispatch a small correction
        # phase for just those carriers afterwards.
        mb = self._build_meta(active_ids, F)
        self._last_meta = (mb["meta"], mb["nb"], mb["nc"])
        C = mb["meta"].shape[0]
        # mesh mode: shard the per-carrier axis so the block phase's
        # heavy chains (Viterbi, A5 scans, decodes) partition across
        # devices — the windows gather from the M-sharded streams is
        # the one resulting collective (the carrier-axis transpose)
        csh = None
        if self.mesh is not None and C % self.mesh.devices.size == 0:
            csh = NamedSharding(self.mesh, P(self.mesh.axis_names[0]))
        if self._il is None or self._il.buf.shape[0] != C:
            buf = jnp.zeros((C, tch9.INTER_DEPTH, tch9.INTER_WIDTH),
                            jnp.float32)
            n_ = jnp.zeros((C,), jnp.int32)
            if csh is not None:
                buf = jax.device_put(buf, csh)
                n_ = jax.device_put(n_, csh)
            self._il = InterleaverState(buf=buf, n=n_)
        il_prev = self._il
        meta_dev = jnp.asarray(mb["meta"]) if csh is None \
            else jax.device_put(mb["meta"], csh)
        packed, big = _phase_block(self.streams, meta_dev,
                                   il_prev, self._kc_dev, sps,
                                   mb["nb"], mb["nc"], F)
        t = self._tick("dispatch", t)
        if prefetch is not None:
            # enqueue the NEXT block's ingest AFTER this block's phase:
            # its big H2D transfer then shares the link behind this
            # block's small fetch instead of ahead of it (the fetch
            # otherwise drains ~40 MB of queued upload first), and the
            # transfer overlaps the host walks below
            prefetch()
            t = time.perf_counter()   # prefetch wall -> ingest_host
        res = _unpack_small(_fetch(packed), _small_spec(mb["nb"],
                                                        mb["nc"], F))
        t = self._tick("fetch_phases", t)

        # ---- host FSM pass 1: BCCH/CCCH + TCH3/TCH9 activation --------
        pre3 = {id(c): (c.cd.tch3.active, c.cd.align) for c in active}
        pre9 = {id(c): (c.cd.tch9.active, c.cd.align, c.cd.fn,
                        c.cd.tch9.tn) for c in active}
        tch3_new: list[_Carrier] = []
        tch3_from: dict[int, int] = {}       # carrier -> first active f
        is_b, is_c, jb, jc = mb["is_b"], mb["is_c"], mb["jb"], mb["jc"]
        for car in active:
            i = slot[id(car)]
            cd = car.cd
            d_align, d_freq = 0, 0.0
            for f in range(F):
                fn = cd.fn + f
                if is_b[i, f]:
                    j = jb[i, f]
                    car.bcch_energy = float(res["eb"][i, j])
                    if not res["badb"][i, j]:
                        l2 = res["l2b"][i, j]
                        # closed-loop tracking (gmr1_rx.c:782-789),
                        # applied at the block boundary
                        d_align = int(round(float(res["toab"][i, j]))) \
                            - (20 * sps >> 1)
                        d_freq = float(res["ferrb"][i, j])
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
                if is_c[i, f] and not res["badc"][i, jc[i, f]]:
                    j = jc[i, f]
                    min_e = car.bcch_energy / 2.0
                    if not (float(res["ec"][i, j]) < min_e):  # nan-safe
                        l2 = res["l2c"][i, j]
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

        # ---- TCH3 walk over the speculative in-graph results -----------
        new_ids = {id(c) for c in tch3_new}
        fev: list = []
        # carriers re-assigned or re-aligned during pass 1 have stale
        # pre-dispatched windows: walk the supplemental phase instead
        cars3 = [c for c in active if pre3[id(c)][0]
                 and id(c) not in new_ids
                 and c.cd.align == pre3[id(c)][1]]
        if cars3:
            rows3 = np.fromiter((slot[id(c)] for c in cars3), np.int64,
                                len(cars3))
            fev += self._walk_tch3_vec(cars3, rows3, res, {}, F,
                                       big["f_ebits"])
        supp = tch3_new + [
            c for c in active
            if pre3[id(c)][0] and id(c) not in new_ids
            and c.cd.align != pre3[id(c)][1] and c.cd.tch3.active]
        if supp:
            s3, feb_s = _phase_tch3s(
                self.streams, jnp.asarray(self._build_sub_meta(
                    supp, "tch3", F)), self._kc_dev, sps, F)
            res_s = _fetch(s3)
            fev += self._walk_tch3_vec(supp, np.arange(len(supp)), res_s,
                                       tch3_from, F, feb_s)
        jobs = self._facch_collect(fev)
        t = self._tick("walk_tch3", t)

        self._t9_assigned: set[int] = set()
        if jobs:
            self._walk_facch(jobs, *self._decode_facch(jobs))
        t = self._tick("decode_jobs", t)

        # ---- TCH9 emission + corrections --------------------------------
        # the chain already ran in-graph from dispatch-time state; only
        # carriers whose state changed during the walks (activation with
        # in-block start, SI1 realign) need their ring rows re-run from
        # the pre-block rings with corrected windows/validity
        fix9: list[_Carrier] = []
        resets: list[int] = []
        # per-carrier bound on the MAIN chain's emissions: the chain
        # scan is causal, so for a mid-block re-assignment the frames
        # BEFORE the handover decoded correctly on the old slot and
        # must still be emitted (the reference's sequential walk does,
        # gmr1_rx.c:276-353); only frames from the new from_fn onward
        # come from the correction pass
        fix_bound: dict[int, int] = {}
        for c in active:
            a0, al0, f0_, tn0 = pre9[id(c)]
            st9 = c.cd.tch9
            if not st9.active:
                continue
            assigned = id(c) in self._t9_assigned
            if not a0:
                if st9.from_fn <= c.cd.fn + F - 1:
                    fix9.append(c)
                    resets.append(1)     # fresh assignment: zero ring
                    fix_bound[id(c)] = -1 << 62   # nothing from main
            elif assigned and (c.cd.align, c.cd.fn) == (al0, f0_):
                # re-assignment re-inits the ring (rx_tch9_init); main
                # results stay valid up to the handover frame
                fix9.append(c)
                resets.append(1)
                fix_bound[id(c)] = st9.from_fn
            elif assigned or (c.cd.align, c.cd.fn, st9.tn) \
                    != (al0, f0_, tn0):
                # realigned mid-block: the old windows are suspect for
                # the whole block — re-run it all
                fix9.append(c)
                resets.append(1 if assigned else 0)
                fix_bound[id(c)] = -1 << 62
        self._tch9_emit_main(active, slot, mb, res, fix_bound, pre9)
        if fix9:
            self._tch9_fix(fix9, resets, slot, il_prev, big["il2"], F)
        else:
            self._il = big["il2"]
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

    def _walk_tch3_vec(self, tch3_set, rows, res, tch3_from, F, f_ebits):
        """Vectorized TCH3 FSM walk: the energy gates, DKAB/weak
        counting and EMA trackers (gmr1_rx.c:531-600) run as
        whole-array numpy per frame — per-carrier Python only on the
        (rare) events.  Speech results are already decoded in-graph;
        this walk merely selects them.  FACCH bursts are recorded as
        events and returned for the deferred soft-bit gather
        (_facch_collect) — their ebits never leave the device unless a
        FACCH burst actually occurred.

        `rows` maps tch3_set position -> result-array row; `f_ebits`
        is the device-resident (C?, F, 104) tensor the events' soft
        bits will be gathered from."""
        n = len(tch3_set)
        rows = np.asarray(rows)
        act = np.fromiter((c.cd.tch3.active for c in tch3_set), bool, n)
        ebv = np.fromiter((c.cd.tch3.energy_burst for c in tch3_set),
                          np.float64, n)
        edv = np.fromiter((c.cd.tch3.energy_dkab for c in tch3_set),
                          np.float64, n)
        wk = np.fromiter((c.cd.tch3.weak_cnt for c in tch3_set),
                         np.int64, n)
        fn0 = np.fromiter((c.cd.fn for c in tch3_set), np.int64, n)
        f0v = np.fromiter((tch3_from.get(id(c), 0) for c in tch3_set),
                          np.int64, n)
        et = np.asarray(res["et"])[rows].astype(np.float64)
        dkf = np.asarray(res["dk_found"])[rows]
        bt = np.asarray(res["bt"])[rows]
        sidv = np.asarray(res["f_sid"])[rows]
        speech_ok = np.zeros((n, F), bool)
        fev = [[] for _ in range(n)]
        for f in range(F):
            a = act & (f >= f0v)
            if not a.any():
                continue
            be = et[:, f]
            weak = a & (be < (edv + ebv) / 4.0)
            dk = weak & dkf[:, f]
            nodk = weak & ~dkf[:, f]
            wk[nodk] += 1
            tear = nodk & (wk > 8)
            act[tear] = False
            edv[dk] = 0.1 * be[dk] + 0.9 * edv[dk]
            strong = a & ~weak
            wk[strong] = 0
            ebv[strong] = 0.1 * be[strong] + 0.9 * ebv[strong]
            isfa = strong & (bt[:, f] == 0)
            issp = strong & (bt[:, f] != 0)
            speech_ok[issp, f] = True
            for i in np.flatnonzero(dk):
                self._emit(tch3_set[i],
                           gsmtap.GMR1_TCH3 | gsmtap.GMR1_DKAB,
                           int(fn0[i]) + f, tch3_set[i].cd.tch3.tn,
                           np.asarray(res["dk_bits"][rows[i], f],
                                      np.int8).view(np.uint8))
            for i in np.flatnonzero(tear):
                self._log(f"[-] ARFCN {tch3_set[i].arfcn} TCH3 END "
                          f"@{int(fn0[i]) + f}")
            for i in np.flatnonzero(isfa):
                fev[i].append((f, int(fn0[i]) + f, int(sidv[i, f])))
        for i, c in enumerate(tch3_set):
            st = c.cd.tch3
            st.active = bool(act[i])
            st.energy_burst = float(ebv[i])
            st.energy_dkab = float(edv[i])
            st.weak_cnt = int(wk[i])
        sf0, sf1 = res["s_f0"], res["s_f1"]
        for i, f in zip(*np.nonzero(speech_ok)):
            r = rows[i]
            tch3_set[i].speech.append(
                np.asarray(sf0[r, f], np.uint8).tobytes())
            tch3_set[i].speech.append(
                np.asarray(sf1[r, f], np.uint8).tobytes())
        return [(tch3_set[i], f_ebits, int(rows[i]), fev[i])
                for i in range(n) if fev[i]]

    def _facch_collect(self, fev):
        """Gather the FACCH soft bits the walks identified (one
        device gather + fetch per source tensor — zero round trips on
        blocks without FACCH bursts), then replay the 4-burst
        accumulate / sync-flip FSM (gmr1_rx.c:454-493) in fn order."""
        if not fev:
            return []
        by_src: dict[int, tuple[object, list]] = {}
        for car, tensor, row, evs in fev:
            _ten, items = by_src.setdefault(id(tensor), (tensor, []))
            items.extend((row, f) for f, _fn, _s in evs)
        got = {}
        for tid, (tensor, items) in by_src.items():
            npad = _pad_cnt(len(items))
            ij = np.asarray(items + [items[0]] * (npad - len(items)),
                            np.int32)
            rowsnp = _fetch(_gather_if(tensor, jnp.asarray(ij)))
            got[tid] = dict(zip(items, rowsnp))
        jobs = []
        for car, tensor, row, evs in fev:
            st = car.cd.tch3
            for f, fn, sid in evs:
                if sid != st.sync_id:
                    jobs.append(self._facch_flush(car, fn))
                bi = fn & 3
                st.ebits[bi] = got[id(tensor)][(row, f)]
                st.sync_id = sid
                st.bi_fn[bi] = fn
                st.burst_cnt += 1
                if st.burst_cnt == 4:
                    jobs.append(self._facch_flush(car, fn))
        return [j for j in jobs if j is not None]

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

    def _decode_facch(self, jobs):
        """Both cipher variants of every flush in one batched jitted
        decode (padded to a stable bucket so job-count churn does not
        recompile)."""
        n = len(jobs)
        npad = _pad_cnt(n)
        eb = np.zeros((npad, 416), np.int8)
        ciph = np.zeros((2 * npad, 384), np.uint8)
        for k, j in enumerate(jobs):
            eb[k] = j["eb"]
            ciph[npad + k] = j["ciph"]
        eb2 = np.concatenate([eb, eb])
        l2, _sbits, bad, _m = _facch3_decode(jnp.asarray(eb2),
                                             jnp.asarray(ciph))
        return _fetch((l2, bad)), npad

    def _walk_facch(self, jobs, res, npad: int) -> None:
        """The reference's cipher retry/learn rule host-side."""
        l2, bad = res
        for k, j in enumerate(jobs):
            car, st = j["car"], j["car"].cd.tch3
            if j["had_ciph"]:
                l2k, badk = l2[npad + k], bad[npad + k]
            else:
                l2k, badk = l2[k], bad[k]
                if badk and not bad[npad + k]:    # cipher retry hits
                    l2k, badk = l2[npad + k], bad[npad + k]
                    st.ciph = 1
            if not badk:
                self._emit(car, gsmtap.GMR1_TCH3 | gsmtap.GMR1_FACCH,
                           j["fn"] - 3, st.tn, l2k)
                if facch3_is_ass_cmd_1(l2k):
                    car.cd.tch9.active = True
                    car.cd.tch9.tn = facch3_ass_cmd_1_parse(l2k)
                    # frames before the assignment must not feed the
                    # CSD deinterleaver (the reference only starts
                    # rx_tch9 on the next frame, gmr1_rx.c:437-441);
                    # the device-resident ring row is reset by the
                    # correction chain (_chain_fix)
                    car.cd.tch9.from_fn = j["fn"] + 1
                    self._t9_assigned.add(id(car))
                    self._log(f"[+] ARFCN {car.arfcn} TCH9 on TN "
                              f"{car.cd.tch9.tn}")

    # --- TCH9 (gmr1_rx.c:276-353 over batched demods) --------------------

    def _tch9_emit_main(self, active, slot, mb, res, fix_bound,
                        pre9) -> None:
        """Emit the block phase's speculative TCH9 results (FACCH9
        frames + chained CSD payloads) for every (carrier, frame)
        whose dispatch-time state survived the walks — `fix_bound`
        caps the valid frame range of carriers whose state changed
        mid-block (their later frames come from _tch9_fix)."""
        a9, act, started, fns = mb["a9"], mb["act"], mb["started"], \
            mb["fns"]
        sid = np.asarray(res["sid9"])
        badf9 = np.asarray(res["badf9"])
        for car in active:
            i = slot[id(car)]
            if not (a9[i] and act[i]):
                continue
            bound = fix_bound.get(id(car))
            ok = started[i] if bound is None \
                else started[i] & (fns[i] < bound)
            # dispatch-time slot: a mid-block re-assignment changes
            # cd.tch9.tn, but these frames decoded on the OLD slot
            tn = pre9[id(car)][3]
            for f in np.flatnonzero(ok):
                if sid[i, f] == 0:
                    if not badf9[i, f]:
                        self._emit(car,
                                   gsmtap.GMR1_TCH9 | gsmtap.GMR1_FACCH,
                                   int(fns[i, f]), tn, res["l2f9"][i, f])
                else:
                    l2 = np.asarray(res["l2a"][f, i])
                    self._emit(car, gsmtap.GMR1_TCH9, int(fns[i, f]),
                               tn, l2)
                    car.csd.append(bytes(bytearray(l2)))

    def _tch9_fix(self, fix9, resets, slot, il_prev, il2, F: int) -> None:
        """Correction pass for carriers whose TCH9 state changed during
        the walks (same-block activation / SI1 realign): re-demod their
        NT9 windows with the updated state, emit FACCH9 from the fresh
        results, and re-run the CSD chain for just their ring rows from
        the pre-block rings (_chain_fix), scattering into the
        optimistic post-block rings."""
        sps = self.sps
        n = len(fix9)
        s9, e9s, kss = _phase_tch9s(
            self.streams, jnp.asarray(self._build_sub_meta(
                fix9, "tch9", F)), self._kc_dev, sps, F)
        r9 = _fetch(s9)
        fns = np.asarray([[c.cd.fn + f for f in range(F)] for c in fix9],
                         np.int64)
        started = fns >= np.asarray(
            [c.cd.tch9.from_fn for c in fix9])[:, None]
        sid = np.asarray(r9["sid9"][:n])
        is_f9 = (sid == 0) & started
        is_t9 = (sid == 1) & started
        for i, f in np.argwhere(is_f9):
            if not r9["badf9"][i, f]:
                self._emit(fix9[i], gsmtap.GMR1_TCH9 | gsmtap.GMR1_FACCH,
                           int(fns[i, f]), fix9[i].cd.tch9.tn,
                           r9["l2f9"][i, f])
        Cs = _pad_cnt(n)
        fix = np.zeros((Cs, 4), np.int32)
        slots = np.fromiter((slot[id(c)] for c in fix9), np.int64, n)
        fix[:n, 0] = slots
        fix[:n, 1] = resets          # 1 = newly activated: zero the ring
        fix[:n, 2] = (is_t9.astype(np.int64)
                      << np.arange(F)).sum(1).astype(np.int32)
        if Cs != n:
            # pad rows scatter an identity update into a slot that is
            # NOT being fixed (duplicate writers then all write the
            # row's current value — deterministic)
            free = next(s for s in range(self._il.buf.shape[0])
                        if s not in set(slots.tolist()))
            fix[n:, 0] = free
            fix[n:, 3] = 1
        self._il, l2a = _chain_fix(il_prev, il2, jnp.asarray(fix),
                                   e9s, kss)
        l2a = _fetch(l2a)
        for i, car in enumerate(fix9):
            tn = car.cd.tch9.tn
            for f in np.flatnonzero(is_t9[i]):
                l2 = np.asarray(l2a[f, i])
                self._emit(car, gsmtap.GMR1_TCH9, int(fns[i, f]), tn, l2)
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

    def device_block_time(self, iters: int = 4) -> float:
        """Pure device execution time per block (ingest step + block
        phase), measured by re-executing the jitted graphs on the
        current resident state — i.e. the application's throughput
        with the host/link out of the picture (what a production
        PCIe/DMA attach would see).  Call after run()."""
        if self._last_put is None or self._last_meta is None:
            raise RuntimeError("run() first")
        meta_np, nb, nc = self._last_meta
        meta = jnp.asarray(meta_np)
        F = self.block_frames

        def once():
            out = self._step(self._last_put, *self._state)
            small, _big = _phase_block(out[0], meta, self._il,
                                       self._kc_dev, self.sps, nb, nc, F)
            return small
        jax.block_until_ready(once())          # warm
        t0 = time.perf_counter()
        last = None
        for _ in range(iters):
            last = once()
        jax.block_until_ready(last)
        return (time.perf_counter() - t0) / iters

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
        self.block_walls: list[float] = []   # per-iteration wall clock
        self.block_profs: list[dict] = []    # per-iteration section split
        pending = None   # prefetched (streams, buf0, was_eof) of block b
        while True:
            t_iter = time.perf_counter()
            prof0 = dict(self.prof)
            narrow_done = all(c.done for c in self.carriers)
            if narrow_done and (not self._wide or self._eof):
                break
            if self._eof and drained >= drain_max:
                break
            if pending is None:
                was_eof = self._eof
                self._ingest_block(b)
                pending = (self.streams, self._buf0, was_eof)
            self.streams, self._buf0, was_eof = pending
            pending = None
            if was_eof:
                drained += 1

            # one-block ingest prefetch, invoked by _process_block
            # right AFTER it dispatches the block phase: block b+1's
            # H2D transfer + analysis then overlap the phase fetch and
            # the host FSM walks, and the big upload queues BEHIND the
            # small fetch on the link instead of ahead of it
            def prefetch(bb=b):
                nonlocal pending
                save = (self.streams, self._buf0)
                was = self._eof
                self._ingest_block(bb + 1)
                pending = (self.streams, self._buf0, was)
                self.streams, self._buf0 = save

            active = [c for c in self.carriers
                      if not c.done and self._ready(c)]
            if active:
                self._process_block(active, prefetch)
            else:
                prefetch()
            if self._wide:
                self._step_wide()
            b += 1
            self.block_walls.append(time.perf_counter() - t_iter)
            self.block_profs.append(
                {k: v - prof0.get(k, 0.0) for k, v in self.prof.items()
                 if v - prof0.get(k, 0.0) > 0.0})
        self._process_wide()
        return len(self.frames)
