"""End-to-end batched wideband receiver test.

Builds a multi-carrier wideband capture (three ARFCNs with the real
TDMA structure on a 500 kHz band) and runs WidebandReceiver: batched
FCCH acquisition across the grid, per-carrier TDMA lock, BCCH/CCCH,
TCH3 (speech + FACCH3 + DKAB + teardown) and the TCH9 handoff — the
reference's utils/gmr1_process_recording.py:89-110 split-then-decode
workflow as one batched program.
"""

import numpy as np
import pytest

from gmr1_tpu.channelizer.arfcn import Channel
from gmr1_tpu.l1 import bcch, ccch, facch3, facch9, tch3, tch9
from gmr1_tpu.rx import gsmtap as gt
from gmr1_tpu.rx.wideband import WidebandReceiver
from gmr1_tpu.sdr import bursts as BU
from gmr1_tpu.sdr import fcch, modem
from gmr1_tpu.ops import cplx

from tests.test_receiver import (Capture, F0, FRAME_LEN, START, dkab_signal,
                                 imm_ass_l2, si1_l2)

# heavy module-scoped capture fixtures: full tier only
pytestmark = pytest.mark.slow

SPS = 4
FS = 500e3
CENTER_ARFCN = 500
CENTER = 1525e6 + 31250.0 * CENTER_ARFCN
CARRIER_RATE = 23400.0 * SPS

A_BCCH, A_FULL, A_AUX = 495, 500, 504     # seeded ARFCNs


def mix_wideband(captures: dict[int, np.ndarray], rng) -> np.ndarray:
    """Per-carrier baseband at 4 sps -> one wideband capture at FS."""
    n_in = min(len(b) for b in captures.values())
    n_wb = int(np.floor((n_in - 1) * FS / CARRIER_RATE))
    pos = np.arange(n_wb) * CARRIER_RATE / FS
    grid = np.arange(n_in, dtype=np.float64)
    t = np.arange(n_wb) / FS
    wb = np.zeros(n_wb, np.complex128)
    for arfcn, buf in captures.items():
        buf = buf[:n_in]
        bb = np.interp(pos, grid, buf.real) + 1j * np.interp(
            pos, grid, buf.imag)
        df = Channel(arfcn).frequency - CENTER
        wb += bb * np.exp(2j * np.pi * df * t)
    return wb.astype(np.complex64)


def fill_bcch(cap: Capture, rng) -> dict[int, np.ndarray]:
    """FCCH every 8 frames + SI1 BCCH at k%8==2.  Returns {fn: l2}."""
    chirp = cplx.to_complex(
        fcch._chirp_np(fcch.FCCH, SPS, "dual")) / np.sqrt(2)
    si1s = {}
    for k in (0, 8, 16, 24):
        cap.place_raw(k, 0, chirp)
    for k in (2, 10, 18, 26):
        l2 = si1_l2(rng, F0 + k)
        si1s[F0 + k] = l2
        cap.place_syms(k, 0, np.asarray(modem.mod(BU.BCCH, bcch.encode(l2))))
    return si1s


@pytest.fixture(scope="module")
def wb_e2e():
    rng = np.random.default_rng(0xBEEF)
    n_frames = 28
    caps = {a: Capture(rng, n_frames=n_frames, noise=0.005)
            for a in (A_BCCH, A_FULL, A_AUX)}
    si1 = {a: fill_bcch(caps[a], rng) for a in caps}

    # full TCH story on A_FULL (mirrors tests/test_receiver.py e2e)
    cap = caps[A_FULL]
    tn, p = 10, 9
    ia = imm_ass_l2(rng, tn, p)
    cap.place_syms(3, 0, np.asarray(modem.mod(BU.DC6, ccch.encode(ia))))

    speech_frames = []
    for k in (4, 5, 6):
        f0 = rng.integers(0, 256, 10, dtype=np.uint8)
        f1 = rng.integers(0, 256, 10, dtype=np.uint8)
        speech_frames += [bytes(f0), bytes(f1)]
        e = tch3.encode(f0, f1, np.zeros(4, np.uint8))
        cap.place_syms(k, tn, np.asarray(modem.mod(BU.NT3_SPEECH, e)))

    tn9 = 13
    fl2 = rng.integers(0, 256, 10, dtype=np.uint8)
    fl2[3], fl2[4] = 0x06, 0x2E
    fl2[5] = (fl2[5] & 0xFC) | ((tn9 >> 3) & 0x03)
    fl2[6] = (fl2[6] & 0x1F) | ((tn9 & 0x07) << 5)
    fl2[9] &= 0xF0
    fe = np.asarray(facch3.encode(fl2, np.zeros(32, np.uint8))).reshape(4, 104)
    for bi, k in enumerate((8, 9, 10, 11)):
        cap.place_syms(k, tn,
                       np.asarray(modem.mod(BU.NT3_FACCH, fe[bi], sync_id=0)))

    dkab_bits = [0, 1, 1, 0, 1, 0, 0, 1]
    for k in (12, 13):
        cap.place_raw(k, tn, dkab_signal(rng, p, dkab_bits))

    from gmr1_tpu import native
    kc = np.zeros(8, np.uint8)

    def a5(fn, n):
        return native.a5_keystream(kc, fn, n)[0]

    f9l2 = rng.integers(0, 256, 38, dtype=np.uint8)
    f9l2[37] &= 0xF0
    e9 = np.asarray(facch9.encode(f9l2, np.zeros(10, np.uint8),
                                  np.zeros(4, np.uint8), a5(F0 + 12, 658)))
    cap.place_syms(12, tn9, np.asarray(modem.mod(BU.NT9, e9, sync_id=0)))

    csd_payloads = [rng.integers(0, 256, 60, dtype=np.uint8)
                    for _ in range(5)]
    il_e = tch9.interleaver_init(dtype=np.uint8)
    for i, k in enumerate(range(13, 18)):
        il_e, eb = tch9.encode(csd_payloads[i], tch9.MODE_9K6,
                               np.zeros(10, np.uint8),
                               np.zeros(4, np.uint8), il_e, a5(F0 + k, 658))
        cap.place_syms(k, tn9, np.asarray(modem.mod(BU.NT9, np.asarray(eb),
                                                    sync_id=1)))

    wb = mix_wideband({a: c.buf for a, c in caps.items()}, rng)
    rx = WidebandReceiver(wb, FS, CENTER, sps=SPS, verbose=False)
    rx.run()
    return rx, si1, speech_frames, bytes(fl2), bytes(f9l2), [
        bytes(bytearray(c)) for c in csd_payloads], tn, tn9, wb


def _car(rx, arfcn):
    return next(c for c in rx.carriers if c.arfcn == arfcn)


def test_acquisition_finds_seeded_carriers(wb_e2e):
    rx, *_ = wb_e2e
    found = {c.arfcn for c in rx.carriers}
    assert {A_BCCH, A_FULL, A_AUX} <= found


def test_bcch_all_carriers(wb_e2e):
    rx, si1, *_ = wb_e2e
    for arfcn in (A_BCCH, A_FULL, A_AUX):
        car = _car(rx, arfcn)
        got = {fn: l2 for t, fn, tn_, l2 in car.frames if t == gt.GMR1_BCCH}
        decoded = [fn for fn in si1[arfcn] if fn in got]
        assert len(decoded) >= 3, (arfcn, sorted(got), sorted(si1[arfcn]))
        for fn in decoded:
            assert got[fn] == bytes(bytearray(si1[arfcn][fn]))


def test_noise_carriers_stay_quiet(wb_e2e):
    rx, *_ = wb_e2e
    seeded = {A_BCCH, A_FULL, A_AUX}
    for car in rx.carriers:
        if car.arfcn not in seeded:
            assert not any(t == gt.GMR1_BCCH for t, *_ in car.frames)


def test_ccch_imm_ass(wb_e2e):
    rx, *_ = wb_e2e
    car = _car(rx, A_FULL)
    cc = [l2 for t, fn, _, l2 in car.frames if t == gt.GMR1_CCCH]
    assert any(l2[1] == 0x06 and l2[2] == 0x3F for l2 in cc)


def test_tch3_speech(wb_e2e):
    rx, _, speech_frames, *_ = wb_e2e
    car = _car(rx, A_FULL)
    assert car.speech[:6] == speech_frames


def test_facch3_and_dkab(wb_e2e):
    rx, _, _, fl2, *_ , tn, _tn9, _wb = wb_e2e
    car = _car(rx, A_FULL)
    fa = [l2 for t, fn, tn_, l2 in car.frames
          if t == (gt.GMR1_TCH3 | gt.GMR1_FACCH)]
    assert fl2 in fa
    dk = [l2 for t, fn, tn_, l2 in car.frames
          if t == (gt.GMR1_TCH3 | gt.GMR1_DKAB)]
    assert len(dk) == 2
    for d in dk:
        assert (np.frombuffer(d, np.int8) < 0).tolist() == \
            [0, 1, 1, 0, 1, 0, 0, 1]


def test_tch3_teardown(wb_e2e):
    rx, *_ = wb_e2e
    car = _car(rx, A_FULL)
    assert not car.cd.tch3.active        # silence -> weak count -> end


def test_tch9_facch9_and_csd(wb_e2e):
    rx, _, _, _, f9l2, csd_payloads, _tn, tn9, _wb = wb_e2e
    car = _car(rx, A_FULL)
    f9 = [l2 for t, fn, tn_, l2 in car.frames
          if t == (gt.GMR1_TCH9 | gt.GMR1_FACCH)]
    assert f9l2 in f9
    # depth-3 interleave: payload i decodes 2 bursts later; the first
    # three payloads must appear, in order, within the CSD stream
    idx = [car.csd.index(p) for p in csd_payloads[:3] if p in car.csd]
    assert len(idx) == 3 and idx == sorted(idx)


def test_frames_tagged_with_arfcn(wb_e2e):
    rx, *_ = wb_e2e
    arfcns = {a for a, *_ in rx.frames}
    assert {A_BCCH, A_FULL, A_AUX} <= arfcns


def test_sharded_streaming_identical_frames(wb_e2e):
    """The SAME scenario through the 8-device SPMD pipeline (time-
    sharded analysis, all_to_all reshard, carrier-sharded streams)
    decodes identical L2 frames, speech and CSD — the unified
    application/multi-chip form (SURVEY.md §5.8)."""
    import jax
    from jax.sharding import Mesh

    rx, *_, wb = wb_e2e
    mesh = Mesh(np.asarray(jax.devices()[:8]), ("dev",))
    rx2 = WidebandReceiver(wb, FS, CENTER, sps=SPS, mesh=mesh)
    rx2.run()
    assert rx2.frames == rx.frames
    for c1 in rx.carriers:
        c2 = _car(rx2, c1.arfcn)
        assert c2.speech == c1.speech and c2.csd == c1.csd


def test_int16_ingest_same_decoded_content(wb_e2e):
    """h2d_dtype=int16 (half the host->device bytes; per-block
    peak-normalized scale) decodes the same verified content — the
    link-bound deployment form bench_app measures.  CRC-less TCH9
    decodes of NOISE slots (after the seeded bursts end) legitimately
    differ under quantization, so the comparison is against the
    scenario truth, not raw frame-list equality."""
    rx, si1, speech_frames, fl2, f9l2, csd_payloads, _tn, _tn9, wb = wb_e2e
    rx2 = WidebandReceiver(wb, FS, CENTER, sps=SPS, h2d_dtype="int16")
    rx2.run()
    # every CRC-protected frame identical
    crc_types = (gt.GMR1_BCCH, gt.GMR1_CCCH,
                 gt.GMR1_TCH3 | gt.GMR1_FACCH,
                 gt.GMR1_TCH9 | gt.GMR1_FACCH)
    for t in crc_types:
        assert [f for f in rx2.frames if f[1] == t] == \
            [f for f in rx.frames if f[1] == t]
    car = _car(rx2, A_FULL)
    assert car.speech[:6] == speech_frames
    idx = [car.csd.index(p) for p in csd_payloads[:3] if p in car.csd]
    assert len(idx) == 3 and idx == sorted(idx)


def test_multibeam_two_beams_one_arfcn(wb_e2e):
    """Two spot beams on one ARFCN (two FCCHs 11 frames apart on the
    same carrier) both acquire with beams=2 and both decode their own
    BCCH (gmr1_rx.c:643-741 batched).  Uses a dedicated small capture."""
    rng = np.random.default_rng(0xBEA2)
    n_frames = 44
    cap = Capture(rng, n_frames=n_frames, noise=0.005)
    chirp = cplx.to_complex(
        fcch._chirp_np(fcch.FCCH, SPS, "dual")) / np.sqrt(2)
    # beam A: FCCH frames 0,8,...; beam B 3 frames later (both trains
    # inside every 320 ms SI cycle), with sa_sirfn_delay=3 so beam B's
    # BCCH schedule (fn%8 == 5) is self-consistent
    si1s = {}
    for k in (0, 8, 16, 24, 32):
        cap.place_raw(k, 0, chirp)
    for k in (3, 11, 19, 27, 35):
        cap.place_raw(k, 0, chirp)
    for k in (2, 10, 18, 26, 34):
        l2 = si1_l2(rng, F0 + k)
        si1s[F0 + k] = l2
        cap.place_syms(k, 0, np.asarray(modem.mod(BU.BCCH, bcch.encode(l2))))
    for k in (5, 13, 21, 29, 37):
        l2 = si1_l2(rng, F0 + k, delay=3)
        si1s[F0 + k] = l2
        cap.place_syms(k, 0, np.asarray(modem.mod(BU.BCCH, bcch.encode(l2))))
    wb2 = mix_wideband({A_FULL: cap.buf}, rng)
    rx = WidebandReceiver(wb2, FS, CENTER, sps=SPS, beams=2,
                          arfcns=[A_FULL])
    rx.run()
    beams = [c for c in rx.carriers if c.arfcn == A_FULL]
    assert len(beams) == 2, [c.cd.align for c in rx.carriers]
    for car in beams:
        got = {fn: l2 for t, fn, tn_, l2 in car.frames if t == gt.GMR1_BCCH}
        assert len(got) >= 3, sorted(got)
        for fn, l2 in got.items():
            assert fn in si1s and l2 == bytes(bytearray(si1s[fn]))


def test_tch9_reassignment_resets_ring(wb_e2e):
    """A second ASS.CMD.1 while TCH9 is already active moves the
    channel to a new timeslot and re-inits the deinterleaver ring
    (rx_tch9_init semantics): CSD payloads decode bit-exact on BOTH
    slots, before and after the handover — the correction-dispatch
    path for an already-active carrier."""
    from gmr1_tpu import native
    rng = np.random.default_rng(0x9A55)
    cap = Capture(rng, n_frames=28, noise=0.005)
    fill_bcch(cap, rng)
    # NT9 bursts span 9 slots, so both TCH9 slots must start past the
    # TCH3 slot's 3-slot footprint and fit in the 24-slot frame
    tn, tn9a, tn9b = 10, 13, 14
    kc = np.zeros(8, np.uint8)

    def a5(fn, n):
        return native.a5_keystream(kc, fn, n)[0]

    cap.place_syms(3, 0, np.asarray(modem.mod(
        BU.DC6, ccch.encode(imm_ass_l2(rng, tn, 9)))))

    def facch_assign(tn9, ks):
        fl2 = rng.integers(0, 256, 10, dtype=np.uint8)
        fl2[3], fl2[4] = 0x06, 0x2E
        fl2[5] = (fl2[5] & 0xFC) | ((tn9 >> 3) & 0x03)
        fl2[6] = (fl2[6] & 0x1F) | ((tn9 & 0x07) << 5)
        fl2[9] &= 0xF0
        fe = np.asarray(facch3.encode(
            fl2, np.zeros(32, np.uint8))).reshape(4, 104)
        for bi, k in enumerate(ks):
            cap.place_syms(k, tn, np.asarray(modem.mod(
                BU.NT3_FACCH, fe[bi], sync_id=0)))

    facch_assign(tn9a, (4, 5, 6, 7))       # flush at k=7 -> CSD from k=8
    facch_assign(tn9b, (12, 13, 14, 15))   # flush at k=15 -> from k=16

    def csd_train(tn9, ks):
        il = tch9.interleaver_init(dtype=np.uint8)
        pay = [rng.integers(0, 256, 60, dtype=np.uint8) for _ in ks]
        for i, k in enumerate(ks):
            il, eb = tch9.encode(pay[i], tch9.MODE_9K6,
                                 np.zeros(10, np.uint8),
                                 np.zeros(4, np.uint8), il,
                                 a5(F0 + k, 658))
            cap.place_syms(k, tn9, np.asarray(modem.mod(
                BU.NT9, np.asarray(eb), sync_id=1)))
        return [bytes(bytearray(p)) for p in pay]

    pay_a = csd_train(tn9a, range(8, 13))
    pay_b = csd_train(tn9b, range(16, 21))

    wb2 = mix_wideband({A_FULL: cap.buf}, rng)
    rx = WidebandReceiver(wb2, FS, CENTER, sps=SPS, arfcns=[A_FULL])
    rx.run()
    car = _car(rx, A_FULL)
    # depth-3 ring: payload i decodes 2 bursts later -> payloads 0..2
    # of EACH train must appear, in order, and the b-train must start
    # AFTER the a-train (fresh ring on the new slot)
    ia = [car.csd.index(p) for p in pay_a[:3] if p in car.csd]
    ib = [car.csd.index(p) for p in pay_b[:3] if p in car.csd]
    assert len(ia) == 3 and ia == sorted(ia), (ia, len(car.csd))
    assert len(ib) == 3 and ib == sorted(ib), (ib, len(car.csd))
    assert max(ia) < min(ib)


def test_wide_channel_receive(wb_e2e):
    """A width-3 carrier (symbol rate 70.2k) carrying FCCH + SI1 BCCHs
    is configured as a wide channel; WidebandReceiver recombines its
    three subchannels per block (streamed synthesizer) and decodes the
    SI1 frames bit-exact through the per-carrier Receiver."""
    rng = np.random.default_rng(0x3D3)
    ch = Channel(CENTER_ARFCN, width=3)
    cap = Capture(rng, n_frames=28, noise=0.004)
    si1s = fill_bcch(cap, rng)

    # capture buf is 4-sps baseband of the WIDE carrier: resample
    # 4*70.2 kHz -> FS and mix at the wide carrier's center offset
    wide_rate = ch.symbol_rate * SPS
    n_wb = int(np.floor((len(cap.buf) - 1) * FS / wide_rate))
    pos = np.arange(n_wb) * wide_rate / FS
    grid = np.arange(len(cap.buf), dtype=np.float64)
    bb = np.interp(pos, grid, cap.buf.real) \
        + 1j * np.interp(pos, grid, cap.buf.imag)
    t = np.arange(n_wb) / FS
    df = ch.frequency - CENTER
    wb = (bb * np.exp(2j * np.pi * df * t)).astype(np.complex64)

    rx = WidebandReceiver(wb, FS, CENTER, sps=SPS,
                          wide_channels=[ch], arfcns=[])
    rx.run()
    assert len(rx.wide_carriers) == 1
    car = rx.wide_carriers[0]
    got = {fn: l2 for t_, fn, tn_, l2 in car.frames if t_ == gt.GMR1_BCCH}
    assert len(got) >= 2, sorted(got)
    for fn, l2 in got.items():
        assert fn in si1s and l2 == bytes(bytearray(si1s[fn]))


def test_off_grid_fs_wideband_receive():
    """Capture at an off-grid sample rate (fs/31.25k not integer): the
    receiver pre-resamples to the integer channel grid at ingest
    (utils/gmr1_rx_sdr.py:411-417) and still decodes SI1 bit-exact."""
    rng = np.random.default_rng(0x0FF6)
    fs_off = 530e3                       # 16.96 channels -> resamp
    cap = Capture(rng, n_frames=28, noise=0.004)
    si1s = fill_bcch(cap, rng)

    n_in = len(cap.buf)
    n_wb = int(np.floor((n_in - 1) * fs_off / CARRIER_RATE))
    pos = np.arange(n_wb) * CARRIER_RATE / fs_off
    grid = np.arange(n_in, dtype=np.float64)
    bb = np.interp(pos, grid, cap.buf.real) \
        + 1j * np.interp(pos, grid, cap.buf.imag)
    t = np.arange(n_wb) / fs_off
    df = Channel(A_FULL).frequency - CENTER
    wb = (bb * np.exp(2j * np.pi * df * t)).astype(np.complex64)

    rx = WidebandReceiver(wb, fs_off, CENTER, sps=SPS, arfcns=[A_FULL])
    assert rx.chz.pre_resamp is not None
    rx.run()
    car = _car(rx, A_FULL)
    got = {fn: l2 for t_, fn, tn_, l2 in car.frames if t_ == gt.GMR1_BCCH}
    assert len(got) >= 2, sorted(got)
    for fn, l2 in got.items():
        assert fn in si1s and l2 == bytes(bytearray(si1s[fn]))


def test_socket_source_identical_frames(wb_e2e):
    """A live TCP IQ stream (SocketSource — the headless role of the
    reference's osmosdr source) decodes identical frames to the array
    input: samples arrive over a socket, are consumed strictly forward,
    and EOF is the peer closing."""
    import socket
    import threading

    from gmr1_tpu.rx.cfile import SocketSource

    rx, *_, wb = wb_e2e
    raw = np.ascontiguousarray(wb, np.complex64).tobytes()  # cf32 wire

    srv = socket.socket()
    srv.bind(("127.0.0.1", 0))
    srv.listen(1)
    port = srv.getsockname()[1]

    def serve():
        conn, _ = srv.accept()
        for i in range(0, len(raw), 1 << 18):
            conn.sendall(raw[i:i + (1 << 18)])
        conn.close()

    th = threading.Thread(target=serve, daemon=True)
    th.start()
    src = SocketSource("127.0.0.1", port)
    rx2 = WidebandReceiver(src, FS, CENTER, sps=SPS)
    rx2.run()
    th.join(timeout=10)
    src.close()
    srv.close()
    assert rx2.frames == rx.frames


def test_streamed_source_identical_frames(wb_e2e):
    """Consuming the capture strictly forward through a SampleSource
    (live-source mode: only the acquisition prefix is buffered) decodes
    identical frames to the array-input form."""
    from gmr1_tpu.rx.cfile import ArraySource

    rx, *_, wb = wb_e2e
    rx2 = WidebandReceiver(ArraySource(wb), FS, CENTER, sps=SPS)
    rx2.run()
    assert rx2.frames == rx.frames
    for c1 in rx.carriers:
        c2 = _car(rx2, c1.arfcn)
        assert c2.speech == c1.speech and c2.csd == c1.csd


def test_speech_frames_through_codec(wb_e2e):
    """Receive-to-audio integration: the TCH3 vocoder frames decoded by
    the wideband receiver feed the AMBE codec to 160 PCM samples per
    20 ms frame (the reference splits this across gmr1_rx +
    gmr1_ambe_decode; src/gmr1_ambe_decode.c:125-155)."""
    from gmr1_tpu.codec import codec

    rx, *_ = wb_e2e
    car = _car(rx, A_FULL)
    assert len(car.speech) >= 6
    frames = np.stack([np.frombuffer(f, np.uint8) for f in car.speech])
    st = codec.init()
    _st, pcm = codec.decode_frames(st, frames)
    pcm = np.asarray(pcm)
    assert pcm.shape == (len(frames), 160)
    assert pcm.dtype == np.int16
    assert np.isfinite(pcm.astype(np.float64)).all()
