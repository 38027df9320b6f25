"""End-to-end receiver test on a synthetic GMR-1 carrier capture.

Builds a ~1.1 s capture with the real TDMA structure (FCCH every 8
frames, BCCH/SI1 at sirfn%8==2, a CCCH immediate assignment, TCH3
speech bursts, a 4-burst FACCH3 group, DKABs, then silence) and runs
the full Receiver: acquisition, TDMA lock, channel FSMs, teardown.
This is SURVEY.md §7 step 5 realized as a test (the reference validates
the same flow on recorded captures, gmr1_rx.c:913).
"""

import numpy as np
import pytest

from gmr1_tpu.l1 import bcch, ccch, facch3, tch3
from gmr1_tpu.rx import CFile, Receiver
from gmr1_tpu.rx import gsmtap as gt
from gmr1_tpu.sdr import bursts as BU
from gmr1_tpu.sdr import fcch, modem
from gmr1_tpu.ops import cplx

# heavy module-scoped capture fixtures: full tier only
pytestmark = pytest.mark.slow

SPS = 4
FRAME_SYMS = 24 * 39
FRAME_LEN = FRAME_SYMS * SPS
START = 8000 + 600        # START_DISCARD + margin
F0 = 16                   # true fn of capture frame 0 (%8 == 0)


class Capture:
    def __init__(self, rng, n_frames=28, noise=0.01):
        self.n = START + n_frames * FRAME_LEN + 2000
        self.buf = (rng.standard_normal(self.n)
                    + 1j * rng.standard_normal(self.n)) * noise
        self.rng = rng

    @staticmethod
    def _rc(t, beta=0.35):
        """Raised-cosine pulse: what a burst looks like after the TX RRC
        and the channelizer's RX RRC (utils/gmr1_rx_sdr.py:591-598) —
        its 1/t^3 tails keep sync-correlation sidelobes low, unlike a
        brick-wall sinc whose sidelobes bias the sub-sample TOA."""
        den = 1.0 - (2.0 * beta * t) ** 2
        safe = np.where(np.abs(den) < 1e-8, 1.0, den)
        out = np.sinc(t) * np.cos(np.pi * beta * t) / safe
        return np.where(np.abs(den) < 1e-8, np.sinc(t) * np.pi / 4, out)

    def place_syms(self, k, slot, x1):
        """Upsample 1-sps planar burst by RC interp, add at frame k slot."""
        x1 = np.asarray(x1)
        xc = x1[..., 0] + 1j * x1[..., 1]
        nsym = xc.shape[-1]
        total = nsym * SPS
        t = (np.arange(total)[:, None]) / SPS - np.arange(nsym)[None, :]
        sig = xc @ self._rc(t).astype(np.float32).T
        pos = START + k * FRAME_LEN + slot * 39 * SPS
        self.buf[pos:pos + total] += sig

    def place_raw(self, k, slot, sig):
        pos = START + k * FRAME_LEN + slot * 39 * SPS
        self.buf[pos:pos + len(sig)] += sig

    def tofile(self, path):
        self.buf.astype(np.complex64).tofile(path)


def si1_l2(rng, fn, delay=0):
    """SI1 frame w/ Seg2Abis encoding the given BCCH fn (stn=0).
    `delay` = sa_sirfn_delay; a BCCH frame satisfies
    fn % 8 == (2 + delay) % 8 (gmr1_rx.c:194-233)."""
    assert fn % 8 == (2 + delay) % 8
    l2 = rng.integers(0, 256, 24, dtype=np.uint8)
    sf, mf, hb = fn >> 6, (fn >> 4) & 3, (fn >> 3) & 1
    l2[0] = 0x08
    l2[9] = 0x80
    l2[10] = (delay & 0x0F) << 3   # stn top bits 0
    l2[11] = sf >> 7
    l2[12] = ((sf & 0x7F) << 1) | (mf >> 1)
    l2[13] = ((mf & 1) << 7) | (hb << 6)
    return l2


def imm_ass_l2(rng, tn, p):
    l2 = rng.integers(0, 256, 24, dtype=np.uint8)
    l2[1], l2[2] = 0x06, 0x3F
    l2[8] = ((p & 0x3F) << 2) | ((tn >> 3) & 3)
    l2[9] = (tn & 7) << 5
    return l2


def dkab_signal(rng, p, bits):
    """117-symbol DKAB slot triple at SPS with pi/4 rotation."""
    n = 117 * SPS
    sig = np.zeros(n, np.complex64)
    for tone, base in enumerate((2 + p, 2 + p + 59)):
        ph = 0.0
        for s in range(5):
            if s:
                ph += np.pi * bits[tone * 4 + (s - 1)]
            for kk in range(SPS):
                i = (base + s) * SPS + kk
                sig[i] += np.exp(1j * (ph + (np.pi / 4) * i / SPS))
    return sig


@pytest.fixture(scope="module")
def e2e(tmp_path_factory):
    rng = np.random.default_rng(0xE2E)
    cap = Capture(rng)
    tn, p = 10, 9

    # FCCH every 8 frames on slots 0-2
    chirp = cplx.to_complex(fcch._chirp_np(fcch.FCCH, SPS, "dual")) / np.sqrt(2)
    for k in (0, 8, 16, 24):
        cap.place_raw(k, 0, chirp)

    # BCCH (SI1) at k%8 == 2
    si1s = {}
    for k in (2, 10, 18, 26):
        l2 = si1_l2(rng, F0 + k)
        si1s[F0 + k] = l2
        cap.place_syms(k, 0, np.asarray(modem.mod(BU.BCCH, bcch.encode(l2))))

    # CCCH immediate assignment at k=3
    ia = imm_ass_l2(rng, tn, p)
    cap.place_syms(3, 0, np.asarray(modem.mod(BU.DC6, ccch.encode(ia))))

    # TCH3 speech bursts at k=4,5,6
    speech_frames = []
    for k in (4, 5, 6):
        f0 = rng.integers(0, 256, 10, dtype=np.uint8)
        f1 = rng.integers(0, 256, 10, dtype=np.uint8)
        speech_frames += [bytes(f0), bytes(f1)]
        e = tch3.encode(f0, f1, np.zeros(4, np.uint8))
        cap.place_syms(k, tn, np.asarray(modem.mod(BU.NT3_SPEECH, e)))

    # FACCH3 group at k=8..11 (fn&3 == 0..3 since F0%4 == 0).
    # Only 76 bits are coded (facch3.c:48) -> zero the last nibble.
    # Payload = ASS.CMD.1 assigning TCH9 on tn9 (gmr1_rx.c:437-441).
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

    # DKABs at k=12,13
    dkab_bits = [0, 1, 1, 0, 1, 0, 0, 1]
    for k in (12, 13):
        cap.place_raw(k, tn, dkab_signal(rng, p, dkab_bits))

    # silence k>=14 on the TCH slot -> weak counting -> teardown

    # --- TCH9 channel on tn9 after the ASS.CMD.1 handoff --------------
    # The receiver ciphers TCH9 with A5/1 (gmr1_rx.c:306,327); kc is
    # all-zeros here, matching Receiver's default.
    from gmr1_tpu import native
    from gmr1_tpu.l1 import facch9, tch9
    kc = np.zeros(8, np.uint8)

    def a5(fn, n):
        return native.a5_keystream(kc, fn, n)[0]

    # FACCH9 at k=12 (sync_id 0); only 300 of 304 bits are coded
    # (facch9.c:48) -> zero the last nibble
    f9l2 = rng.integers(0, 256, 38, dtype=np.uint8)
    f9l2[37] &= 0xF0
    e9 = np.asarray(facch9.encode(f9l2, np.zeros(10, np.uint8),
                                  np.zeros(4, np.uint8), a5(F0 + 12, 658)))
    cap.place_syms(12, tn9, np.asarray(modem.mod(BU.NT9, e9, sync_id=0)))

    # TCH9 9k6 CSD bursts at k=13..17 (sync_id 1); depth-3 interleave
    # means payload i decodes when burst i+2 is consumed.
    csd_payloads = [rng.integers(0, 256, 60, dtype=np.uint8)
                    for _ in range(5)]
    il_e = tch9.interleaver_init(dtype=np.uint8)
    for i, k in enumerate(range(13, 18)):
        il_e, eb = tch9.encode(csd_payloads[i], tch9.MODE_9K6,
                               np.zeros(10, np.uint8),
                               np.zeros(4, np.uint8), il_e, a5(F0 + k, 658))
        cap.place_syms(k, tn9, np.asarray(modem.mod(BU.NT9, np.asarray(eb),
                                                    sync_id=1)))

    path = tmp_path_factory.mktemp("cap") / "carrier.cfile"
    cap.tofile(str(path))
    cf = CFile(str(path))
    rx = Receiver(cf, SPS, tch_file=cf, tch_csd_file=cf, verbose=False)
    rx.run()
    return rx, si1s, bytes(fl2), speech_frames, tn, bytes(f9l2), [
        bytes(bytearray(c)) for c in csd_payloads]


def test_bcch_lock_and_decode(e2e):
    rx, si1s, *_ = e2e
    got = {fn: l2 for t, fn, tn, l2 in rx.frames if t == gt.GMR1_BCCH}
    # all SI1 bursts present in the processed span decoded bit-exactly
    decoded = [fn for fn in si1s if fn in got]
    assert len(decoded) >= 3
    for fn in decoded:
        assert got[fn] == bytes(bytearray(si1s[fn]))


def test_ccch_imm_ass(e2e):
    rx, _, _, _, tn, *_ = e2e
    cc = [l2 for t, fn, _, l2 in rx.frames if t == gt.GMR1_CCCH]
    assert any(l2[1] == 0x06 and l2[2] == 0x3F for l2 in cc)


def test_tch3_speech(e2e):
    rx, _, _, speech_frames, *_ = e2e
    assert rx.speech[:6] == speech_frames


def test_facch3(e2e):
    rx, _, fl2, _, tn, *_ = e2e
    fa = [l2 for t, fn, tn_, l2 in rx.frames
          if t == (gt.GMR1_TCH3 | gt.GMR1_FACCH)]
    assert fl2 in fa


def test_dkab_and_teardown(e2e):
    rx, *_ = e2e
    dk = [l2 for t, fn, tn_, l2 in rx.frames
          if t == (gt.GMR1_TCH3 | gt.GMR1_DKAB)]
    assert len(dk) == 2
    expected = bytes(bytearray(
        np.where(np.asarray([0, 1, 1, 0, 1, 0, 0, 1]) > 0, -127, 127)
        .astype(np.int8).view(np.uint8)))
    for d in dk:
        assert (np.frombuffer(d, np.int8) < 0).tolist() == \
            [0, 1, 1, 0, 1, 0, 0, 1]


def test_gsmtap_packet_format():
    pkt = gt.make_packet(gt.GMR1_BCCH, 0x12345678, 3, b"\xAA" * 24)
    assert len(pkt) == 16 + 24
    assert pkt[0] == 2 and pkt[1] == 4          # version, hdr words
    assert pkt[2] == gt.GSMTAP_TYPE_GMR1_UM
    assert pkt[3] == 3                          # timeslot
    assert pkt[8:12] == b"\x12\x34\x56\x78"     # fn big-endian
    assert pkt[12] == gt.GMR1_BCCH


def test_tch9_handoff_and_facch9(e2e):
    """ASS.CMD.1 inside FACCH3 activates the TCH9 FSM (gmr1_rx.c:437-441)
    and the FACCH9 burst decodes CRC-clean through the cipher."""
    rx, _, fl2, _, _, f9l2, _ = e2e
    # the FACCH3 that carried the assignment was itself decoded
    fa = [l2 for t, fn, tn_, l2 in rx.frames
          if t == (gt.GMR1_TCH3 | gt.GMR1_FACCH)]
    assert fl2 in fa
    f9 = [l2 for t, fn, tn_, l2 in rx.frames
          if t == (gt.GMR1_TCH9 | gt.GMR1_FACCH)]
    assert f9l2 in f9


def test_stream_run_parity(e2e):
    """Feeding the capture incrementally through a BoundedStream and
    stream_run() (the wideband receiver's wide-carrier drive) decodes
    the same frame/speech/CSD multisets as the offline run(), while
    trim() keeps retained memory at O(acquisition prefix + feed lag)
    instead of O(capture)."""
    from gmr1_tpu.rx.cfile import BoundedStream

    rx, *_ = e2e
    data = np.asarray(rx.bcch.data)
    bs = BoundedStream()
    rx2 = Receiver(bs, SPS, tch_file=bs, tch_csd_file=bs)
    chunk = 2 * FRAME_LEN
    for i in range(0, data.shape[0], chunk):
        bs.feed(data[i:i + chunk])
        rx2.stream_run()
        bs.trim(rx2.stream_keep_from())
    rx2.stream_run(eof=True)
    # parity under trimming proves the keep bound is sufficient (a
    # dropped-but-needed sample would miss its window and diverge);
    # the high-water mark proves trimming actually happens
    assert sorted(rx2.frames) == sorted(rx.frames)
    assert sorted(rx2.speech) == sorted(rx.speech)
    assert sorted(rx2.csd) == sorted(rx.csd)
    assert bs.high_water <= rx2._acq_need() + 2 * chunk


def test_tch9_csd_stream(e2e):
    """9k6 CSD bursts decode through the depth-3 inter-burst
    deinterleaver with the documented 2-burst latency (tch9.c:109)."""
    rx, *_, csd_payloads = e2e
    # payloads 0..2 emerge once bursts 2..4 are consumed, contiguously
    idx = rx.csd.index(csd_payloads[0])
    assert rx.csd[idx:idx + 3] == csd_payloads[:3]
