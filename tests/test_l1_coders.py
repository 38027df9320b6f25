"""Round-trip tests for all eight L1 channel coders.

The reference has no test suite (SURVEY.md §4); these realize the
encode -> (soft) -> decode loopback strategy it implies, plus noisy and
ciphered variants.
"""

import numpy as np
import jax.numpy as jnp
import pytest

from gmr1_tpu.l1 import bcch, ccch, facch3, facch9, rach, tch3, tch9, xch_dc12
from gmr1_tpu.ops import a5


def soft(bits_e, rng=None, sigma=0.0, scale=100.0):
    s = np.where(np.asarray(bits_e) != 0, -scale, scale).astype(np.float32)
    if sigma:
        s = s + rng.normal(0, sigma * scale, s.shape).astype(np.float32)
    return s


def test_bcch_roundtrip(rng):
    l2 = rng.integers(0, 256, size=(6, 24), dtype=np.uint8)
    e = np.array(bcch.encode(l2))
    assert e.shape == (6, 424)
    out, bad, _ = bcch.decode(soft(e, rng, sigma=0.4))
    np.testing.assert_array_equal(np.array(bad), 0)
    np.testing.assert_array_equal(np.array(out), l2)


def test_bcch_detects_garbage(rng):
    noise = rng.normal(0, 100, size=(4, 424)).astype(np.float32)
    _, bad, _ = bcch.decode(noise)
    assert np.all(np.array(bad) == 1)


def test_ccch_roundtrip(rng):
    l2 = rng.integers(0, 256, size=(6, 24), dtype=np.uint8)
    e = np.array(ccch.encode(l2))
    assert e.shape == (6, 432)
    out, bad, _ = ccch.decode(soft(e, rng, sigma=0.4))
    np.testing.assert_array_equal(np.array(bad), 0)
    np.testing.assert_array_equal(np.array(out), l2)


@pytest.mark.parametrize("m", [0, 1])
def test_tch3_roundtrip(rng, m):
    f0 = rng.integers(0, 256, size=(4, 10), dtype=np.uint8)
    f1 = rng.integers(0, 256, size=(4, 10), dtype=np.uint8)
    st = rng.integers(0, 2, size=(4, 4)).astype(np.uint8)
    e = np.array(tch3.encode(f0, f1, st, None, m))
    assert e.shape == (4, 212)
    g0, g1, gs, metrics = tch3.decode(soft(e, rng, sigma=0.2), None, m)
    np.testing.assert_array_equal(np.array(gs), st)
    np.testing.assert_array_equal(np.array(g0), f0)
    np.testing.assert_array_equal(np.array(g1), f1)


def test_tch3_ciphered_roundtrip(rng):
    f0 = rng.integers(0, 256, size=(2, 10), dtype=np.uint8)
    f1 = rng.integers(0, 256, size=(2, 10), dtype=np.uint8)
    st = rng.integers(0, 2, size=(2, 4)).astype(np.uint8)
    key = rng.integers(0, 256, size=8, dtype=np.uint8)
    ciph, _ = a5.keystream(key, np.array([55, 56], dtype=np.uint32), 208)
    e = np.array(tch3.encode(f0, f1, st, np.array(ciph), 0))
    g0, g1, _, _ = tch3.decode(soft(e), np.array(ciph), 0)
    np.testing.assert_array_equal(np.array(g0), f0)
    np.testing.assert_array_equal(np.array(g1), f1)
    # Without the cipher stream the frames must NOT come back
    b0, b1, _, _ = tch3.decode(soft(e), None, 0)
    assert not np.array_equal(np.array(b0), f0)


def test_facch3_roundtrip(rng):
    l2 = rng.integers(0, 256, size=(3, 10), dtype=np.uint8)
    l2[:, 9] &= 0xF0  # only 76 bits carried
    st = rng.integers(0, 2, size=(3, 32)).astype(np.uint8)
    e = np.array(facch3.encode(l2, st))
    assert e.shape == (3, 416)
    out, gs, bad, _ = facch3.decode(soft(e, rng, sigma=0.4))
    np.testing.assert_array_equal(np.array(bad), 0)
    np.testing.assert_array_equal(np.array(gs), st)
    np.testing.assert_array_equal(np.array(out), l2)


def test_facch9_roundtrip(rng):
    l2 = rng.integers(0, 256, size=(3, 38), dtype=np.uint8)
    l2[:, 37] &= 0xF0  # only 300 bits carried
    sacch = rng.integers(0, 2, size=(3, 10)).astype(np.uint8)
    st = rng.integers(0, 2, size=(3, 4)).astype(np.uint8)
    e = np.array(facch9.encode(l2, sacch, st))
    assert e.shape == (3, 662)
    out, gsacch, gst, bad, _ = facch9.decode(soft(e, rng, sigma=0.4))
    np.testing.assert_array_equal(np.array(bad), 0)
    np.testing.assert_array_equal(np.array(gst), st)
    np.testing.assert_array_equal((np.array(gsacch) < 0).astype(np.uint8), sacch)
    np.testing.assert_array_equal(np.array(out), l2)


def test_rach_roundtrip(rng):
    pkt = rng.integers(0, 256, size=(4, 18), dtype=np.uint8)
    pkt[:, 17] &= 0xE0  # 139 info bits: 16 class-1 + 123 class-2
    e = np.array(rach.encode(pkt, np.uint8(0x5A)))
    assert e.shape == (4, 494)
    out, crcs, _ = rach.decode(soft(e, rng, sigma=0.4), np.uint8(0x5A))
    np.testing.assert_array_equal(np.array(crcs), 0)
    np.testing.assert_array_equal(np.array(out), pkt)


def test_rach_wrong_mask_fails_class1(rng):
    pkt = rng.integers(0, 256, size=(1, 18), dtype=np.uint8)
    pkt[:, 17] &= 0xE0
    e = np.array(rach.encode(pkt, np.uint8(0x5A)))
    _, crcs, _ = rach.decode(soft(e), np.uint8(0xA5))
    assert np.array(crcs)[0, 0] == 1  # class-1 CRC8 fails under wrong mask
    assert np.array(crcs)[0, 1] == 0  # class-2 unaffected


def test_xch_dc12_roundtrip(rng):
    l2 = rng.integers(0, 256, size=(3, 24), dtype=np.uint8)
    e = np.array(xch_dc12.encode(l2))
    assert e.shape == (3, 432)
    out, bad, _ = xch_dc12.decode(soft(e, rng, sigma=0.3))
    np.testing.assert_array_equal(np.array(bad), 0)
    np.testing.assert_array_equal(np.array(out), l2)


@pytest.mark.parametrize("mode", [tch9.MODE_2K4, tch9.MODE_4K8, tch9.MODE_9K6],
                         ids=lambda m: m.name)
def test_tch9_stream_roundtrip(rng, mode):
    n_bursts = 6
    l2s = rng.integers(0, 256, size=(n_bursts, mode.l2_bytes), dtype=np.uint8)
    if mode.conv_len % 8:
        l2s[:, -1] &= 0xFF << (8 - mode.conv_len % 8) & 0xFF
    sacch = rng.integers(0, 2, size=(n_bursts, 10)).astype(np.uint8)
    st = rng.integers(0, 2, size=(n_bursts, 4)).astype(np.uint8)

    il_e = tch9.interleaver_init(dtype=jnp.uint8)
    il_d = tch9.interleaver_init(dtype=jnp.float32)
    outs = []
    for i in range(n_bursts):
        il_e, e = tch9.encode(l2s[i], mode, sacch[i], st[i], il_e)
        e = np.array(e)
        assert e.shape == (662,)
        il_d, l2, gsacch, gst, _ = tch9.decode(soft(e, rng, sigma=0.2), mode, il_d)
        np.testing.assert_array_equal(np.array(gst), st[i])
        outs.append(np.array(l2))
    # inter-burst depth 3: burst i pops out at step i+2
    for i in range(n_bursts - 2):
        np.testing.assert_array_equal(outs[i + 2], l2s[i])


def test_a5_jax_matches_numpy(rng):
    key = rng.integers(0, 256, size=8, dtype=np.uint8)
    fns = np.array([0, 1, 63, 1000, 0x7FFFF], dtype=np.uint32)
    dl_j, ul_j = a5.keystream(key, fns, 96)
    for i, fn in enumerate(fns):
        dl_n, ul_n = a5.keystream_np(key, int(fn), 96)
        np.testing.assert_array_equal(np.array(dl_j)[i], dl_n)
        np.testing.assert_array_equal(np.array(ul_j)[i], ul_n)


def test_a5_keystream_properties(rng):
    key = rng.integers(0, 256, size=8, dtype=np.uint8)
    dl0, _ = a5.keystream_np(key, 10, 208)
    dl1, _ = a5.keystream_np(key, 11, 208)
    assert not np.array_equal(dl0, dl1)  # fn-dependent
    assert 0.3 < dl0.mean() < 0.7        # balanced
    # A5/0 = zeros
    z, _ = a5.cipher_stream(0, key, np.array([3], dtype=np.uint32), 16)
    assert np.all(np.array(z) == 0)
    # stream-cipher prefix property: the 208-bit keystream is the
    # first 208 bits of the 658-bit one for the same (key, fn) — the
    # wideband block phase relies on this to run ONE keystream scan
    # for both the TCH3 speech cipher and the NT9 chain
    long_dl, _ = a5.keystream_np(key, 10, 658)
    np.testing.assert_array_equal(dl0, long_dl[:208])


def test_tch9_decode_frames_matches_sequential(rng):
    """decode_frames (one batched Viterbi over F chained bursts) equals
    F sequential decode() calls, including across the carry boundary
    and with a batched interleaver state."""
    from gmr1_tpu.l1 import tch9

    F, B = 6, 3
    il_e = [tch9.interleaver_init(dtype=np.uint8) for _ in range(B)]
    ebs = np.zeros((F, B, 662), np.int8)
    for b in range(B):
        for f in range(F):
            l2 = rng.integers(0, 256, 60, dtype=np.uint8)
            il_e[b], e = tch9.encode(l2, tch9.MODE_9K6,
                                     rng.integers(0, 2, 10).astype(np.uint8),
                                     np.zeros(4, np.uint8), il_e[b])
            ebs[f, b] = np.where(np.asarray(e) > 0, -120, 120)

    # sequential reference (vmapped over the batch, frame by frame)
    import jax
    il_s = jax.vmap(lambda _: tch9.interleaver_init())(np.arange(B))
    seq = []
    for f in range(F):
        il_s, l2, sa, stt, met = jax.vmap(
            lambda i, e: tch9.decode(e, tch9.MODE_9K6, i))(il_s, ebs[f])
        seq.append((np.asarray(l2), np.asarray(sa), np.asarray(met)))

    # split into two chained decode_frames calls (carry across)
    il_b = jax.vmap(lambda _: tch9.interleaver_init())(np.arange(B))
    outs = []
    for part in (ebs[:2], ebs[2:]):
        il_b, l2, sa, stt, met = tch9.decode_frames(
            part, tch9.MODE_9K6, il_b)
        outs.append((np.asarray(l2), np.asarray(sa), np.asarray(met)))
    l2_all = np.concatenate([o[0] for o in outs])
    sa_all = np.concatenate([o[1] for o in outs])
    met_all = np.concatenate([o[2] for o in outs])

    for f in range(F):
        np.testing.assert_array_equal(l2_all[f], seq[f][0])
        np.testing.assert_allclose(sa_all[f], seq[f][1])
        np.testing.assert_allclose(met_all[f], seq[f][2])
    np.testing.assert_array_equal(np.asarray(il_b.buf), np.asarray(il_s.buf))
