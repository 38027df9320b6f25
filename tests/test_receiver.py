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

    def place_syms(self, k, slot, x1):
        """Upsample 1-sps planar burst by sinc interp, add at frame k slot."""
        x1 = np.asarray(x1)
        xc = x1[..., 0] + 1j * x1[..., 1]
        nsym = xc.shape[-1]
        total = nsym * SPS
        t = (np.arange(total)[:, None]) / SPS - np.arange(nsym)[None, :]
        sig = xc @ np.sinc(t).astype(np.float32).T
        pos = START + k * FRAME_LEN + slot * 39 * SPS
        self.buf[pos:pos + total] += sig

    def place_raw(self, k, slot, sig):
        pos = START + k * FRAME_LEN + slot * 39 * SPS
        self.buf[pos:pos + len(sig)] += sig

    def tofile(self, path):
        self.buf.astype(np.complex64).tofile(path)


def si1_l2(rng, fn):
    """SI1 frame w/ Seg2Abis encoding the given BCCH fn (delay=0, stn=0)."""
    assert fn % 8 == 2
    l2 = rng.integers(0, 256, 24, dtype=np.uint8)
    sf, mf, hb = fn >> 6, (fn >> 4) & 3, (fn >> 3) & 1
    l2[0] = 0x08
    l2[9] = 0x80
    l2[10] = 0  # delay=0, stn top bits 0
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
    fl2 = rng.integers(0, 256, 10, dtype=np.uint8)
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

    path = tmp_path_factory.mktemp("cap") / "carrier.cfile"
    cap.tofile(str(path))
    cf = CFile(str(path))
    rx = Receiver(cf, SPS, tch_file=cf, verbose=False)
    rx.run()
    return rx, si1s, bytes(fl2), speech_frames, tn


def test_bcch_lock_and_decode(e2e):
    rx, si1s, _, _, _ = e2e
    got = {fn: l2 for t, fn, tn, l2 in rx.frames if t == gt.GMR1_BCCH}
    # all SI1 bursts present in the processed span decoded bit-exactly
    decoded = [fn for fn in si1s if fn in got]
    assert len(decoded) >= 3
    for fn in decoded:
        assert got[fn] == bytes(bytearray(si1s[fn]))


def test_ccch_imm_ass(e2e):
    rx, _, _, _, tn = e2e
    cc = [l2 for t, fn, _, l2 in rx.frames if t == gt.GMR1_CCCH]
    assert any(l2[1] == 0x06 and l2[2] == 0x3F for l2 in cc)


def test_tch3_speech(e2e):
    rx, _, _, speech_frames, _ = e2e
    assert rx.speech[:6] == speech_frames


def test_facch3(e2e):
    rx, _, fl2, _, tn = e2e
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
