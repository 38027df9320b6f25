"""Multi-chip full-transponder pipeline (SURVEY.md §5.8, §7 step 8).

The reference scales by running one GNURadio channelizer process feeding
per-ARFCN FIFOs to demodulator processes (utils/gmr1_process_recording.py).
The TPU-native equivalent is one SPMD program over a device mesh:

  1. TIME-parallel analysis: the wideband stream is sharded in time;
     each chip runs the polyphase analysis on its block after a
     ppermute halo exchange of the P*M filter-history samples from its
     left neighbour (the overlap-save tail).
  2. all_to_all reshard: the channel bank flips from time-sharded to
     CARRIER-sharded — the classic distributed-filterbank transpose,
     riding ICI.
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

from ..channelizer.pfb import Channelizer, _analyze_block
from ..l1 import bcch
from ..sdr import bursts as BU
from ..sdr import modem


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

        def step(x_local):
            # 1. halo exchange (overlap-save tail from left neighbour)
            tail = x_local[-halo_len:]
            halo = jax.lax.ppermute(
                tail, axis,
                perm=[(i, (i + 1) % d) for i in range(d)])
            dev = jax.lax.axis_index(axis)
            halo = jnp.where(dev == 0, jnp.zeros_like(halo), halo)
            blk = jnp.concatenate([halo, x_local], axis=0)

            # 2. local PFB analysis (time shard)
            bank = _analyze_block(blk, ana.h_poly, ana.m, ana.p, ana.hop)

            # 3. reshard: time-sharded (R_l, M, 2) -> carrier-sharded
            bank_c = jax.lax.all_to_all(
                bank, axis, split_axis=1, concat_axis=0, tiled=True)
            # (R_total, M/D, 2) -> channels-major
            bank_c = jnp.moveaxis(bank_c, 1, 0)       # (M/D, R, 2)

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
        """Place a host wideband array (D*n_local, 2) onto the mesh,
        time-sharded."""
        assert x.shape[0] == self.n_devices * self.n_local
        return jax.device_put(
            jnp.asarray(x, jnp.float32),
            NamedSharding(self.mesh, P(self.axis)))

    def step(self, x_sharded):
        """Run one SPMD step.  Returns (l2 (M, 24) carrier-sharded,
        crc_fail (M,), metric (M,), n_bad scalar)."""
        return self._step(x_sharded)
