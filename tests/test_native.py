"""Native C++ runtime component tests: bit-exact vs the Python paths."""

import socket

import numpy as np
import pytest

from gmr1_tpu import native
from gmr1_tpu.ops import a5
from gmr1_tpu.rx import gsmtap


def test_native_lib_builds():
    assert native.AVAILABLE, "C++ toolchain present; native lib must build"


def test_a5_native_matches_python(rng):
    for _ in range(5):
        key = rng.integers(0, 256, 8, dtype=np.uint8)
        fn = int(rng.integers(0, 1 << 19))
        dl_n, ul_n = native.a5_keystream(key, fn, 96)
        dl_p, ul_p = a5.keystream_np(key, fn, 96)
        np.testing.assert_array_equal(dl_n, dl_p)
        np.testing.assert_array_equal(ul_n, ul_p)


def test_a5_batch(rng):
    key = rng.integers(0, 256, 8, dtype=np.uint8)
    fns = rng.integers(0, 1 << 19, 6).astype(np.uint32)
    batch = native.a5_keystream_batch(key, fns, 208)
    for i, fn in enumerate(fns):
        np.testing.assert_array_equal(batch[i],
                                      a5.keystream_np(key, int(fn), 208)[0])


def test_burst_energy(rng):
    win = rng.standard_normal((1000, 2)).astype(np.float32)
    n = win.shape[0]
    b = n >> 5
    want = float(np.sum(win[b:n - b].astype(np.float64) ** 2) / n)
    got = native.burst_energy(win)
    assert abs(got - want) < 1e-4 * want


def test_native_gsmtap_wire_format(rng):
    if not native.AVAILABLE:
        pytest.skip("native lib unavailable")
    rxsock = socket.socket(socket.AF_INET, socket.SOCK_DGRAM)
    rxsock.bind(("127.0.0.1", 0))
    rxsock.settimeout(2.0)
    port = rxsock.getsockname()[1]

    tx = native.NativeGsmtap("127.0.0.1", port)
    l2 = bytes(rng.integers(0, 256, 24, dtype=np.uint8))
    tx.send(gsmtap.GMR1_BCCH, 0xABCDEF, 3, l2)
    pkt, _ = rxsock.recvfrom(4096)
    tx.close()
    rxsock.close()
    assert pkt == gsmtap.make_packet(gsmtap.GMR1_BCCH, 0xABCDEF, 3, l2)
