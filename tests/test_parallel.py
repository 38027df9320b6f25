"""Multi-chip pipeline tests on the virtual 8-device CPU mesh.

Validates the full SPMD design: time-sharded PFB analysis with halo
exchange == unsharded analysis, all_to_all reshard, carrier-parallel
demod/decode of a synthetic 32-carrier transponder block.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.sharding import Mesh, PartitionSpec as P

from gmr1_tpu.channelizer import Channel, Channelizer
from gmr1_tpu.l1 import bcch
from gmr1_tpu.ops import cplx
from gmr1_tpu.parallel import ShardedTransponder
from gmr1_tpu.sdr import bursts as BU
from gmr1_tpu.sdr import modem

FS = 1e6                       # -> M = 32 channels, no pre-resample
CENTER = 1525e6 + 31250 * 512
SPS = 4
D = 8


@pytest.fixture(scope="module")
def mesh():
    devs = jax.devices()
    assert len(devs) >= D
    return Mesh(np.array(devs[:D]), ("dev",))


def make_transponder(rng, chz, arfcns, l2s, n_total):
    """Wideband with one BCCH burst per given ARFCN at ~6 ms in."""
    wb = (rng.standard_normal(n_total)
          + 1j * rng.standard_normal(n_total)) * 1e-3
    t = np.arange(n_total) / FS
    ratio = FS / 23400.0
    for ch_arfcn, l2 in zip(arfcns, l2s):
        ch = Channel(ch_arfcn)
        x1 = np.asarray(modem.mod(BU.BCCH, bcch.encode(l2[None])))[0]
        xc = cplx.to_complex(x1)
        n_b = int((len(xc) + 20) * ratio)
        tt = np.arange(n_b) / ratio - 4.0
        s = (np.sinc(tt[:, None] - np.arange(len(xc))[None, :]) @ xc)
        pos = int(0.006 * FS)
        wb[pos:pos + n_b] += s * np.exp(
            2j * np.pi * (ch.frequency - CENTER) * t[pos:pos + n_b])
    return cplx.planar_np(wb.astype(np.complex64))


def test_sharded_analysis_matches_unsharded(rng, mesh):
    chz = Channelizer(FS, CENTER, sps=SPS)
    ana = chz.analyzer
    n_local = 32 * 64
    n_total = n_local * D
    x = rng.standard_normal((n_total, 2)).astype(np.float32)

    ref = np.asarray(ana(x))                       # unsharded

    halo_len = ana.p * ana.m

    def step(x_local):
        tail = x_local[-halo_len:]
        halo = jax.lax.ppermute(
            tail, "dev", perm=[(i, (i + 1) % D) for i in range(D)])
        dev = jax.lax.axis_index("dev")
        halo = jnp.where(dev == 0, jnp.zeros_like(halo), halo)
        blk = jnp.concatenate([halo, x_local], axis=0)
        from gmr1_tpu.channelizer.pfb import _analyze_block
        return _analyze_block(blk, ana.h_poly, ana.m, ana.p, ana.hop)

    f = jax.jit(jax.shard_map(step, mesh=mesh, in_specs=P("dev"),
                              out_specs=P("dev")))
    got = np.asarray(f(jnp.asarray(x)))
    n_frames = ref.shape[0] - ref.shape[0] % (n_local // ana.hop * D)
    np.testing.assert_allclose(got[:n_frames], ref[:n_frames],
                               rtol=1e-4, atol=1e-4)


def test_sharded_transponder_decodes_all_carriers(rng, mesh):
    chz = Channelizer(FS, CENTER, sps=SPS)
    assert chz.n_chans == 32
    n_local = 32 * 128
    n_total = n_local * D

    # 6 carriers spread over the band (indices on several devices)
    arfcns = [512 + d for d in (1, 3, 6, -5, -9, -14)]
    l2s = [rng.integers(0, 256, 24, dtype=np.uint8) for _ in arfcns]
    wb = make_transponder(rng, chz, arfcns, l2s, n_total)

    # locate the burst in the resampled stream via an unsharded probe
    bank = chz.process(wb)
    idx0 = chz.freq2index(Channel(arfcns[0]).frequency)
    stream = np.asarray(chz.extract(bank, Channel(arfcns[0])))
    blen = BU.BCCH.len_syms * SPS
    probe = modem.demod(BU.BCCH, stream, sps=SPS,
                        win=stream.shape[0] - blen)
    l2p, badp, _ = bcch.decode(probe.ebits)
    assert not int(badp)
    toa = int(float(probe.toa))

    win = 16 * SPS
    st = ShardedTransponder(chz, mesh, n_local, burst=BU.BCCH, sps=SPS,
                            burst_pos=max(toa - win // 2, 0), win=win)
    x_sh = st.shard_input(wb)
    l2, crc_fail, metric, n_bad = st.step(x_sh)
    l2 = np.asarray(l2)
    crc_fail = np.asarray(crc_fail)

    for a, want in zip(arfcns, l2s):
        idx = chz.freq2index(Channel(a).frequency)
        assert not crc_fail[idx], f"carrier {a} (chan {idx}) failed CRC"
        np.testing.assert_array_equal(l2[idx], want)
    # noise channels fail CRC; total bad = 32 - 6
    assert int(n_bad) == 32 - len(arfcns)
