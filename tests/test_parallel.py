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

# heavy module-scoped capture fixtures: full tier only
pytestmark = pytest.mark.slow

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


# ---------------------------------------------------------------------------
# Streaming pipeline: state carried across steps (VERDICT round-1 #4)
# ---------------------------------------------------------------------------

def test_streaming_analysis_halo_carry(rng, mesh):
    """Two streaming steps with the carried left-edge halo reproduce the
    unsharded analysis of the concatenated input EXACTLY (no zeroed
    first block)."""
    chz = Channelizer(FS, CENTER, sps=SPS)
    ana = chz.analyzer
    halo_len = ana.p * ana.m
    n_local = 32 * 64
    n_total = n_local * D
    x = rng.standard_normal((2 * n_total, 2)).astype(np.float32)

    ref = np.asarray(ana(x))     # unsharded, both steps' worth

    def step(x_local, halo_carry):
        tail = x_local[-halo_len:]
        recv = jax.lax.ppermute(
            tail, "dev", perm=[(i, (i + 1) % D) for i in range(D)])
        dev = jax.lax.axis_index("dev")
        halo = jnp.where(dev == 0, halo_carry, recv)
        blk = jnp.concatenate([halo, x_local], axis=0)
        from gmr1_tpu.channelizer.pfb import _analyze_block
        return _analyze_block(blk, ana.h_poly, ana.m, ana.p, ana.hop), recv

    f = jax.jit(jax.shard_map(step, mesh=mesh,
                              in_specs=(P("dev"), P("dev")),
                              out_specs=(P("dev"), P("dev"))))
    carry = jnp.zeros((D * halo_len, 2), jnp.float32)
    b1, carry = f(jnp.asarray(x[:n_total]), carry)
    b2, carry = f(jnp.asarray(x[n_total:]), carry)
    got = np.concatenate([np.asarray(b1), np.asarray(b2)], axis=0)
    r = n_total // ana.hop
    np.testing.assert_allclose(got[:2 * r], ref[:2 * r],
                               rtol=1e-4, atol=1e-4)


@pytest.fixture(scope="module")
def streaming(mesh):
    rng = np.random.default_rng(0x57EA)
    """Two seeded carriers streamed through 2 StreamingTransponder steps:
    BCCH at frame 2 of each step, NT3 speech frames 0-5, DKABs 6-7,
    TCH9 9k6 bursts every frame with the encoder interleaver chained
    across the WHOLE 16-frame span (so decode must chain state across
    the step boundary)."""
    from gmr1_tpu.l1 import tch3, tch9
    from gmr1_tpu.parallel.transponder import StreamingTransponder
    from tests.test_receiver import dkab_signal

    chz = Channelizer(FS, CENTER, sps=SPS)
    F, STEPS = 8, 2
    # BCCH occupies slots 0-5 (234 syms); keep TCH3 (3 slots) and TCH9
    # (9 slots) clear of it and of each other.
    TN_T, TN9, DKP = 6, 12, 9
    frame_bb = 936 * SPS                    # 4-sps samples per frame
    n_bb = STEPS * F * frame_bb + 2000

    seeds = [512 + 3, 512 - 9]              # different devices
    truth = {}
    bbs = {}
    for a in seeds:
        bb = np.zeros(n_bb, np.complex64)
        t = {}
        t["bcch"] = [rng.integers(0, 256, 24, dtype=np.uint8)
                     for _ in range(STEPS)]
        for s, l2 in enumerate(t["bcch"]):
            x1 = cplx.to_complex(np.asarray(
                modem.mod(BU.BCCH, bcch.encode(l2[None]))[0]))
            _place(bb, (s * F + 2) * frame_bb, x1)
        t["speech"] = []
        for s in range(STEPS):
            for f in range(6):
                f0 = rng.integers(0, 256, 10, dtype=np.uint8)
                f1 = rng.integers(0, 256, 10, dtype=np.uint8)
                t["speech"].append((s, f, bytes(f0), bytes(f1)))
                e = np.asarray(tch3.encode(f0, f1, np.zeros(4, np.uint8)))
                x1 = cplx.to_complex(np.asarray(
                    modem.mod(BU.NT3_SPEECH, e[None])[0]))
                _place(bb, (s * F + f) * frame_bb + TN_T * 39 * SPS, x1)
        for s in range(STEPS):
            for f in (6, 7):
                sig = dkab_signal(rng, DKP, [0, 1, 1, 0, 1, 0, 0, 1])
                pos = (s * F + f) * frame_bb + TN_T * 39 * SPS
                bb[pos:pos + len(sig)] += sig
        t["csd"] = [rng.integers(0, 256, 60, dtype=np.uint8)
                    for _ in range(STEPS * F)]
        il_e = tch9.interleaver_init(dtype=np.uint8)
        for i, l2 in enumerate(t["csd"]):
            il_e, eb = tch9.encode(l2, tch9.MODE_9K6,
                                   np.zeros(10, np.uint8),
                                   np.zeros(4, np.uint8), il_e)
            x1 = cplx.to_complex(np.asarray(
                modem.mod(BU.NT9, np.asarray(eb)[None], sync_id=1)[0]))
            _place(bb, i * frame_bb + TN9 * 39 * SPS, x1)
        truth[a], bbs[a] = t, bb

    # upsample each carrier to FS and mix
    ratio = FS / (23400.0 * SPS)
    n_wb = int(n_bb * ratio)
    pos = np.arange(n_wb) / ratio
    grid = np.arange(n_bb, dtype=np.float64)
    tt = np.arange(n_wb) / FS
    wb = (rng.standard_normal(n_wb) + 1j * rng.standard_normal(n_wb)) * 5e-3
    for a, bb in bbs.items():
        s = np.interp(pos, grid, bb.real) + 1j * np.interp(pos, grid, bb.imag)
        wb += s * np.exp(2j * np.pi * (Channel(a).frequency - CENTER) * tt)
    wb = cplx.planar_np(wb.astype(np.complex64))

    # calibrate the pipeline delay with an unsharded probe on carrier 0
    # (needs enough rows to cover the frame-2 BCCH: ~5 frames of stream)
    bank = chz.process(wb[:14000 * chz.analyzer.hop])
    stream = np.asarray(chz.extract(bank, Channel(seeds[0])))
    blen = BU.BCCH.len_syms * SPS
    cal = stream[:2 * frame_bb + 3 * frame_bb]
    probe = modem.demod(BU.BCCH, cal, sps=SPS, win=cal.shape[0] - blen)
    l2p, badp, _ = bcch.decode(probe.ebits)
    assert not int(badp)
    p0 = int(round(float(probe.toa))) - 2 * frame_bb
    assert p0 > 24, p0

    st = StreamingTransponder(chz, mesh, frames=F, burst_pos=p0,
                              tn_tch=TN_T, tn_tch9=TN9, dkab_p=DKP)
    n_step = D * st.n_local
    carry = st.carry_init()
    outs = []
    for s in range(STEPS):
        o, carry = st.step(st.shard_input(wb[s * n_step:(s + 1) * n_step]),
                           carry)
        outs.append({k: np.asarray(v) for k, v in o.items()})
    cols = {a: chz.freq2index(Channel(a).frequency) for a in seeds}
    return outs, truth, cols, seeds


def _place(bb, pos, x1):
    """RC-interpolate a 1-sps burst to 4 sps at bb[pos...]."""
    from tests.test_receiver import Capture
    xc = np.asarray(x1)
    nsym = len(xc)
    tt = (np.arange(nsym * SPS)[:, None]) / SPS - np.arange(nsym)[None, :]
    sig = Capture._rc(tt).astype(np.float32) @ xc
    bb[pos:pos + nsym * SPS] += sig


def test_streaming_bcch(streaming):
    outs, truth, cols, seeds = streaming
    for a in seeds:
        for s, out in enumerate(outs):
            assert not out["crcb"][cols[a]], (a, s)
            np.testing.assert_array_equal(out["l2b"][cols[a]],
                                          truth[a]["bcch"][s])


def test_streaming_speech(streaming):
    outs, truth, cols, seeds = streaming
    for a in seeds:
        for (s, f, f0, f1) in truth[a]["speech"]:
            got0 = bytes(bytearray(outs[s]["sf0"][f, cols[a]]))
            got1 = bytes(bytearray(outs[s]["sf1"][f, cols[a]]))
            assert (got0, got1) == (f0, f1), (a, s, f)


def test_streaming_dkab_ema_carry(streaming):
    outs, truth, cols, seeds = streaming
    for a in seeds:
        for s, out in enumerate(outs):
            for f in (6, 7):
                assert out["dk_found"][f, cols[a]], (a, s, f)
                bits = (out["dk_bits"][f, cols[a]] < 0).astype(int).tolist()
                assert bits == [0, 1, 1, 0, 1, 0, 0, 1], (a, s, f)
            # speech frames must NOT be classified as DKAB
            assert not out["dk_found"][:6, cols[a]].any(), (a, s)


def test_streaming_tch9_interleaver_across_steps(streaming):
    """Payload i decodes at burst i+2 (depth-3 interleave): payloads
    from step 1's last frames appear in step 2's first frames — the
    deinterleaver ring carried through the streaming state."""
    outs, truth, cols, seeds = streaming
    F = 8
    for a in seeds:
        for i in range(0, 2 * F - 2):
            s, f = divmod(i + 2, F)
            got = bytes(bytearray(outs[s]["l2_t9"][f, cols[a]]))
            assert got == bytes(bytearray(truth[a]["csd"][i])), (a, i)
