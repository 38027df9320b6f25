"""CLI tool tests (reference src/gmr1_rach_gen.c, gmr1_gen_mat.c,
gmr1_ambe_decode.c, utils/ drivers)."""

import os
import subprocess
import sys

import numpy as np
import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def run_cli(args, cwd=None, inp=None):
    env = dict(os.environ)
    env["JAX_PLATFORMS"] = "cpu"
    env.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/.cache/jax-gmr1-tests")
    env["PYTHONPATH"] = REPO
    return subprocess.run([sys.executable, *args], cwd=cwd or REPO,
                          input=inp, capture_output=True, env=env,
                          timeout=400)


def test_rach_gen(tmp_path, rng):
    out = tmp_path / "rach.cfile"
    payload = bytes(rng.integers(0, 256, 18, dtype=np.uint8)).hex()
    r = run_cli(["tools/gmr1_rach_gen.py", str(out), "0x05", payload])
    assert r.returncode == 0, r.stderr.decode()
    data = np.fromfile(out, np.complex64)
    assert len(data) == 351                     # RACH burst symbols
    # guard symbols zeroed, data symbols unit magnitude
    assert np.allclose(np.abs(data[3:-3]), 1.0, atol=1e-5)


def test_gen_mat(tmp_path, rng):
    r = run_cli([os.path.join(REPO, "tools/gmr1_gen_mat.py")],
                cwd=str(tmp_path))
    assert r.returncode == 0, r.stderr.decode()
    with open(tmp_path / "mat_G.pbm") as fh:
        assert fh.readline().strip() == "P1"
        assert fh.readline().split() == ["76", "384"]
        G = np.array([l.split() for l in fh], np.uint8)
    with open(tmp_path / "mat_g.pbm") as fh:
        fh.readline(), fh.readline()
        g = np.array([l.split() for l in fh], np.uint8).reshape(-1)
    assert G.shape == (384, 76)

    # linearity check: enc(u) == G@u ^ g for a random message
    from gmr1_tpu.l1 import facch3
    from gmr1_tpu.ops import bits as B
    u = rng.integers(0, 2, 76).astype(np.uint8)
    l2 = np.asarray(B.pack_bits(u, 10)).astype(np.uint8)
    e = np.asarray(facch3.encode(l2, np.zeros(32, np.uint8))).astype(np.uint8)
    e = e.reshape(4, 104)
    e = np.concatenate([e[:, :22], e[:, 30:]], axis=1).reshape(-1)
    np.testing.assert_array_equal((G @ u + g) % 2, e)


def test_ambe_decode_cli(tmp_path):
    frames = bytes([0xF8] + [0] * 9) * 3        # 3 silence frames
    out = tmp_path / "out.wav"
    r = run_cli(["-m", "gmr1_tpu.codec", "-", str(out)], inp=frames)
    assert r.returncode == 0, r.stderr.decode()
    blob = out.read_bytes()
    assert blob[:4] == b"RIFF" and blob[8:12] == b"WAVE"
    pcm = np.frombuffer(blob[44:], np.int16)
    assert len(pcm) == 480 and not pcm.any()


def test_process_recording_driver():
    from tools.gmr1_process_recording import parse_filename, visible_arfcns
    p = parse_filename("cap-f1545000000-s4000000-t20240101120000.cfile")
    assert p.center == 1545e6 and p.samplerate == 4e6
    band, vis = visible_arfcns(p)
    assert band == "L"
    # 4 MHz span around 1545 MHz covers ~127 ARFCNs near index 640
    assert 100 <= len(vis) <= 130
    assert all(1525e6 < 1525e6 + 31250 * a < 1565e6 for a in vis)


def test_rx_cli(tmp_path):
    """Full receiver CLI over a synthetic capture + pcap output."""
    import tests.test_receiver as tr

    rng = np.random.default_rng(0xE2E)
    cap = tr.Capture(rng)
    chirp = None
    from gmr1_tpu.ops import cplx
    from gmr1_tpu.sdr import bursts as BU
    from gmr1_tpu.sdr import fcch, modem
    from gmr1_tpu.l1 import bcch
    chirp = cplx.to_complex(fcch._chirp_np(fcch.FCCH, tr.SPS, "dual")) \
        / np.sqrt(2)
    for k in (0, 8, 16, 24):
        cap.place_raw(k, 0, chirp)
    for k in (2, 10, 18, 26):
        l2 = tr.si1_l2(rng, tr.F0 + k)
        cap.place_syms(k, 0, np.asarray(modem.mod(BU.BCCH, bcch.encode(l2))))
    path = tmp_path / "cap.cfile"
    cap.tofile(str(path))

    pcap = tmp_path / "out.pcap"
    r = run_cli(["-m", "gmr1_tpu.rx", "4", str(path), "--no-udp",
                 "--pcap", str(pcap)])
    assert r.returncode == 0, r.stderr.decode()
    assert b"L2 frames decoded" in r.stderr
    n = int(r.stderr.split(b"[+] ")[1].split()[0])
    assert n >= 3
    assert pcap.stat().st_size > 24 + n * (16 + 16 + 28)


def test_rx_cli_payload_out(tmp_path):
    """--csd-out / --speech-out append decoded payloads (the
    reference's /tmp/csd.data side-channel, gmr1_rx.c:342-347)."""
    from gmr1_tpu.rx.__main__ import _dump

    p = tmp_path / "csd.data"
    _dump(str(p), [b"abc", b"def"])
    _dump(str(p), [b"gh"])
    assert p.read_bytes() == b"abcdefgh"
    _dump(None, [b"x"])          # disabled -> no-op
    _dump(str(tmp_path / "empty"), [])
    assert not (tmp_path / "empty").exists()
