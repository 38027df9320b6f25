"""Fast unit tests for the wideband block engine's host<->device
packing (the slow e2e suite lives in test_wideband.py).

The block phase returns every small result as ONE packed uint8 array
(one fetch leaf = one link round trip on a tunneled chip); these tests
pin the byte layout contract between the in-graph packer and the host
unpacker — a dtype drift in any decode chain output (e.g. int32 CRC
flags vs the spec's bool) silently corrupts every later field.
"""

import numpy as np
import jax
import jax.numpy as jnp

from gmr1_tpu.rx.wideband import (_pack_small, _small_spec,
                                  _unpack_small, _pad_cnt)


def _mk_small(spec, C, rng):
    """Random result dict with the MESSY dtypes the decode chains
    actually produce (int32 flags, float32 metrics, int8 soft bits)."""
    messy = {np.bool_: np.int32, np.int8: np.int32}
    small = {}
    for k, dt, tail in spec:
        production = messy.get(dt, dt)
        if np.dtype(dt) == np.float32:
            v = rng.standard_normal((C, *tail)).astype(np.float32)
        elif np.dtype(dt) == np.bool_:
            v = rng.integers(0, 2, (C, *tail)).astype(production)
        else:
            v = rng.integers(0, 127, (C, *tail)).astype(production)
        if k == "l2a":                  # device layout is (F, C, 60)
            v = np.moveaxis(v, 0, 1)
        small[k] = jnp.asarray(v)
    return small


def test_pack_unpack_roundtrip():
    rng = np.random.default_rng(5)
    for nb, nc, f in ((1, 6, 8), (2, 7, 4)):
        spec = _small_spec(nb, nc, f)
        small = _mk_small(spec, 16, rng)
        packed = np.asarray(jax.jit(
            lambda s: _pack_small(s, spec))(small))
        assert packed.dtype == np.uint8 and packed.shape[0] == 16
        out = _unpack_small(packed, spec)
        for k, dt, tail in spec:
            want = np.asarray(small[k])
            if np.dtype(dt) == np.bool_:
                want = want != 0
            else:
                want = want.astype(dt)
            # l2a: both sides use the device layout (F, C, 60) — the
            # unpacker restores it — so every field compares directly
            np.testing.assert_array_equal(np.asarray(out[k]), want,
                                          err_msg=k)


def test_pad_cnt_buckets():
    # powers of two up to 128, then 128-multiples (stable jit shapes)
    assert [_pad_cnt(n) for n in (1, 2, 3, 5, 100, 128)] == \
        [1, 2, 4, 8, 128, 128]
    assert _pad_cnt(129) == 256      # pow2 continues to 256
    assert _pad_cnt(1064) == 1152    # 128-multiple above 256
