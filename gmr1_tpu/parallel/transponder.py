"""Multi-chip full-transponder pipeline (SURVEY.md §5.8, §7 step 8).

The reference scales by running one GNURadio channelizer process feeding
per-ARFCN FIFOs to demodulator processes (utils/gmr1_process_recording.py).
The TPU-native equivalent is one SPMD program over a device mesh:

  1. TIME-parallel analysis: the wideband stream is sharded in time;
     each chip runs the polyphase analysis on its block, whose P*M
     filter-history samples (overlap-save tail) the host prepends to
     the H2D shard (parallel/ingest.py overlapped_shards).
  2. all_to_all reshard: the channel bank flips from time-sharded to
     CARRIER-sharded — the classic distributed-filterbank transpose,
     riding ICI (the step's only collective).
  3. CARRIER-parallel back-end: each chip RRC-resamples, demodulates
     and FEC-decodes its subset of carriers; CRC metrics psum across
     the mesh; decoded L2 frames stay carrier-sharded for host-0
     GSMTap emission.

Constraints for clean SPMD: local time block divisible by M (so the 2x
oversample sign pattern stays phase-consistent across shards) and
n_chans divisible by the mesh size (for the all_to_all).
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..channelizer.pfb import Channelizer
from ..l1 import bcch
from ..ops import cplx
from ..ops.interleave import InterleaverState
from ..sdr import bursts as BU
from ..sdr import modem
from .ingest import (analyze_reshard, ici_bytes_per_step,
                     overlapped_shards)


class ShardedTransponder:
    """Carrier+time sharded channelize->demod->decode pipeline.

    One instance is bound to (mesh, channelizer geometry, burst type,
    samples-per-device).  `step(x)` takes the time-sharded wideband
    block and returns carrier-sharded decoded frames + psum'd metrics.
    """

    def __init__(self, chz: Channelizer, mesh: Mesh, n_local: int,
                 burst: BU.Burst = BU.BCCH, sps: int = 4,
                 burst_pos: int = 0, win: int | None = None):
        axis = mesh.axis_names[0]
        d = mesh.devices.size
        m = chz.n_chans
        assert m % d == 0, (m, d)
        assert n_local % m == 0, (n_local, m)
        self.chz = chz
        self.mesh = mesh
        self.axis = axis
        self.n_devices = d
        self.n_local = n_local
        self.burst = burst
        self.sps = sps
        self.burst_pos = burst_pos

        ana = chz.analyzer
        rrc = chz._rrc_resampler(1)
        r_local = n_local // ana.hop
        r_total = r_local * d
        blen = burst.len_syms * sps
        # search window: bounded by the resampled stream length
        n_stream = int(np.floor(r_total * rrc.ratio))
        if win is None:
            win = 16 * sps
        win = max(8, min(win, n_stream - burst_pos - blen))
        self.win = win

        halo_len = ana.p * ana.m
        self._halo_len = halo_len

        def step(xh_local):
            # 1-3. shared SPMD ingest (parallel/ingest.py): shards
            # arrive with the overlap-save halo prepended by the host
            # (zero left edge: one-shot form); local analysis + bf16
            # all_to_all reshard to carrier-sharded rows
            bank_c = analyze_reshard(ana, axis, d, xh_local[0])

            # 4. carrier-parallel RRC resample + demod + decode
            streams = rrc(bank_c)                      # (M/D, N_s, 2)
            w = jax.lax.dynamic_slice_in_dim(
                streams, burst_pos, blen + win, axis=1)
            r = modem.demod(burst, w, sps=sps, win=win)
            l2, crc_fail, metric = bcch.decode(r.ebits)

            n_bad = jax.lax.psum(jnp.sum(crc_fail), axis)
            return l2, crc_fail, metric, n_bad

        self._step = jax.jit(jax.shard_map(
            step, mesh=mesh,
            in_specs=P(axis),
            out_specs=(P(axis), P(axis), P(axis), P()),
        ))

    def shard_input(self, x: np.ndarray):
        """Place a host wideband array (D*n_local, 2) onto the mesh:
        overlapped (halo-prepended) time shards, zero left edge."""
        assert x.shape[0] == self.n_devices * self.n_local
        sh, _ = overlapped_shards(
            np.asarray(x, np.float32),
            np.zeros((self._halo_len, 2), np.float32),
            self._halo_len, self.n_devices)
        return jax.device_put(
            jnp.asarray(sh), NamedSharding(self.mesh, P(self.axis)))

    def step(self, x_sharded):
        """Run one SPMD step.  Returns (l2 (M, 24) carrier-sharded,
        crc_fail (M,), metric (M,), n_bad scalar)."""
        return self._step(x_sharded)


class StreamingTransponder:
    """STREAMING multi-chip pipeline: state carried across steps.

    Relationship to the application: `rx.wideband.WidebandReceiver`
    (mesh=...) is the full receiver — the SAME SPMD ingest (host-
    overlapped halo + all_to_all + carrier-sharded RRC) driven by the host
    channel FSMs, with dynamic per-carrier assignments and closed-loop
    tracking.  This class is its fixed-schedule core: every carrier
    runs the full mixed workload on a static slot map with NO host in
    the loop, which is the right shape for throughput benchmarking and
    for bulk workloads whose assignments change rarely (the FSMs then
    only update the static schedule between launches).

    Each `step(x, carry)` consumes the NEXT D*n_local wideband samples
    (time-sharded) and runs a mixed per-carrier workload over F TDMA
    frames on every carrier of the transponder:

      * PFB analysis with a REAL left-edge halo prepended host-side
        to every shard (shard 0's from the previous step's tail) — so
        block boundaries are exact and the output stream is seamless
        across steps (overlap-save rides the H2D transfer).
      * all_to_all reshard to carrier-sharded, then per carrier:
        - BCCH demod + Viterbi + CRC on the sirfn%8==2 frame,
        - NT3 speech demod + TCH3 decode on every frame,
        - DKAB demod with the burst/DKAB energy EMA trackers
          (gmr1_rx.c:570-581) carried across steps,
        - NT9 demod + TCH9 9k6 decode chaining the depth-3 inter-burst
          deinterleaver (tch9.c:109) across frames AND steps.

    Geometry: at sps=4 one TDMA frame is exactly 2500 channel rows
    (936*4 output samples * 625/936), so F frames = F*2500 rows stream
    through with the RRC polyphase at phase 0 every frame — the static
    per-frame window matrices computed once apply to every step.

    ICI traffic per step per device:
      reshard: R_local*M*2*2 bytes (bf16) each way * (D-1)/D
               (all_to_all — the only collective)
    """

    FRAME_ROWS = 2500          # chan rows per TDMA frame at sps=4

    def __init__(self, chz: Channelizer, mesh: Mesh, frames: int = 8,
                 burst_pos: int = 60, win: int = 16, tn_tch: int = 4,
                 tn_tch9: int = 8, dkab_p: int = 9, bcch_frame: int = 2):
        from ..l1 import tch3, tch9
        from ..sdr import dkab

        sps = 4
        axis = mesh.axis_names[0]
        d = mesh.devices.size
        m = chz.n_chans
        ana = chz.analyzer
        assert m % d == 0, (m, d)
        r_total = frames * self.FRAME_ROWS
        assert r_total % d == 0, (r_total, d)
        r_local = r_total // d
        n_local = r_local * ana.hop
        assert n_local % m == 0, (n_local, m)
        self.chz, self.mesh, self.axis = chz, mesh, axis
        self.n_devices, self.n_local, self.frames = d, n_local, frames
        self.sps, self.m_local = sps, m // d
        frame_len = 936 * sps

        rrc = chz._rrc_resampler(1)
        halo_len = ana.p * ana.m
        self.halo_len = halo_len
        self._tail = np.zeros((halo_len, 2), np.float32)
        self.ici_bytes_per_step = ici_bytes_per_step(ana, r_local, d)

        # static per-frame window geometry (phase-0 alignment, see doc)
        def geom(slot, blen_syms, w, frame_list=None):
            out = []
            for f in (range(frames) if frame_list is None else frame_list):
                pos = burst_pos + f * frame_len + slot * 39 * sps - (w >> 1)
                k_min, wmat = rrc.window_matrix(pos, blen_syms * sps + w)
                assert k_min + wmat.shape[1] <= r_total, (
                    "window past block end", f, slot)
                out.append((k_min, jnp.asarray(wmat)))
            return out
        g_bcch = geom(0, BU.BCCH.len_syms, win, [bcch_frame])[0]
        w3 = sps + sps // 2
        g_tch = geom(tn_tch, BU.NT3_SPEECH.len_syms, w3)
        g_tch9 = geom(tn_tch9, BU.NT9.len_syms, w3)

        def init_carry():
            return dict(
                ema_burst=jnp.zeros((self.m_local,), jnp.float32),
                ema_dkab=jnp.zeros((self.m_local,), jnp.float32),
                il=jax.vmap(lambda _: tch9.interleaver_init())(
                    jnp.arange(self.m_local)),
            )
        self.init_carry = init_carry

        def window(bank_c, k_min, wmat):
            xw = jax.lax.slice_in_dim(bank_c, k_min, k_min + wmat.shape[1],
                                      axis=1)                  # (Ml,K,2)
            return jnp.einsum("nk,mkp->mnp", wmat, xw)         # (Ml,n,2)

        def step(xh_local, carry):
            # 1-3. shared SPMD ingest (parallel/ingest.py): host-
            # overlapped halo shards + analysis + bf16 all_to_all
            bank_c = analyze_reshard(ana, axis, d, xh_local[0])

            # 4a. BCCH on the sirfn%8==2 frame
            wb = window(bank_c, *g_bcch)
            rb = modem.demod(BU.BCCH, wb, sps=sps, win=win)
            l2b, crcb, _ = bcch.decode(rb.ebits)

            # 4b. NT3 speech on every frame (batched over F)
            wt = jnp.stack([window(bank_c, *g) for g in g_tch], axis=0)
            rs = modem.demod(BU.NT3_SPEECH, wt, sps=sps, win=w3)
            sf0, sf1, _s, smet = tch3.decode(rs.ebits)

            # 4c. DKAB + EMA trackers, scanned over frames (sequential
            # EMA state, gmr1_rx.c:570-581, branch-free)
            def dk_step(em, wf):
                be = jnp.sum(cplx.abs2(
                    wf[:, wf.shape[1] >> 5: -(wf.shape[1] >> 5)]),
                    axis=-1) / wf.shape[1]
                det = (em["d"] + em["b"]) / 4.0
                rd = dkab.demod(wf, sps, dkab_p)
                is_dkab = be < det
                em = dict(
                    b=jnp.where(is_dkab, em["b"], 0.1 * be + 0.9 * em["b"]),
                    d=jnp.where(is_dkab & rd.found,
                                0.1 * be + 0.9 * em["d"], em["d"]))
                return em, (rd.ebits, rd.found & is_dkab)
            em0 = dict(b=carry["ema_burst"], d=carry["ema_dkab"])
            em, (dk_bits, dk_found) = jax.lax.scan(dk_step, em0, wt)

            # 4d. TCH9 with cross-frame/step deinterleaver chain: one
            # batched Viterbi over all F frames (only the ring scans)
            w9 = jnp.stack([window(bank_c, *g) for g in g_tch9], axis=0)
            r9 = modem.demod(BU.NT9, w9, sps=sps, win=w3)
            il, l2_t9, _sa, _st, met9 = tch9.decode_frames(
                r9.ebits, tch9.MODE_9K6, carry["il"])

            # no psum: CRC totals sum on host from the fetched crcb —
            # a scalar psum would add a collective rendezvous per step
            carry_out = dict(ema_burst=em["b"], ema_dkab=em["d"], il=il)
            out = dict(l2b=l2b, crcb=crcb, sf0=sf0, sf1=sf1,
                       dk_bits=dk_bits, dk_found=dk_found,
                       l2_t9=l2_t9, met9=met9)
            return out, carry_out

        spec_c = dict(ema_burst=P(axis), ema_dkab=P(axis),
                      il=InterleaverState(buf=P(axis), n=P(axis)))
        # carrier-sharded outputs: (Ml, ...) concat on axis 0,
        # frame-major outputs (F, Ml, ...) concat on axis 1
        out_spec = dict(l2b=P(axis), crcb=P(axis),
                        sf0=P(None, axis), sf1=P(None, axis),
                        dk_bits=P(None, axis), dk_found=P(None, axis),
                        l2_t9=P(None, axis), met9=P(None, axis))
        self._step = jax.jit(jax.shard_map(
            step, mesh=mesh, in_specs=(P(axis), spec_c),
            out_specs=(out_spec, spec_c)))

    def shard_input(self, x: np.ndarray):
        """Overlapped halo shards; the raw tail carries on the HOST
        between steps (it owns the stream anyway), so streaming stays
        sample-exact with no per-step ppermute."""
        assert x.shape[0] == self.n_devices * self.n_local, \
            (x.shape, self.n_devices, self.n_local)
        sh, self._tail = overlapped_shards(
            np.asarray(x, np.float32), self._tail, self.halo_len,
            self.n_devices)
        return jax.device_put(
            jnp.asarray(sh), NamedSharding(self.mesh, P(self.axis)))

    def carry_init(self):
        """Initial streaming state, sharded over the mesh."""
        c = self.init_carry()

        def rep(v):
            # per-device state: replicate host value then let shard_map
            # treat it as device-local (P(axis) over a D-tiled array)
            return jnp.tile(v, (self.n_devices,) + (1,) * (v.ndim - 1))
        return dict(
            ema_burst=rep(c["ema_burst"]),
            ema_dkab=rep(c["ema_dkab"]),
            il=type(c["il"])(buf=rep(c["il"].buf), n=rep(c["il"].n)),
        )

    def step(self, x_sharded, carry):
        """One streaming step.  Returns (outputs dict, new carry)."""
        return self._step(x_sharded, carry)
