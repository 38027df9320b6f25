"""Conv code + Viterbi tests.

Table parity is checked against a parse of the reference's
next_state/next_output tables (src/l1/conv.c) — our tables are generated
from the documented generator polynomials, so this proves the
polynomial -> trellis derivation is bit-exact.
"""

import re

import numpy as np
import pytest

from gmr1_tpu.ops import conv as CV
from gmr1_tpu.ops import viterbi as VT
from gmr1_tpu.ops import puncture as PT


def _parse_ref_tables(path):
    src = open(path).read()
    tables = {}
    pat = re.compile(
        r"static const uint8_t (\w+)\[\]\[2\] = \{(.*?)\};", re.S
    )
    for m in pat.finditer(src):
        name, body = m.groups()
        vals = [int(x) for x in re.findall(r"\d+", body)]
        tables[name] = np.array(vals, dtype=np.int32).reshape(-1, 2)
    return tables


REF_MAP = {
    "k5_12": ("gmr1_conv_k5_next_state", "gmr1_conv_k5_12_next_output"),
    "k5_13": ("gmr1_conv_k5_next_state", "gmr1_conv_k5_13_next_output"),
    "k5_14": ("gmr1_conv_k5_next_state", "gmr1_conv_k5_14_next_output"),
    "k5_15": ("gmr1_conv_k5_next_state", "gmr1_conv_k5_15_next_output"),
    "k6_14": ("gmr1_conv_k6_next_state", "gmr1_conv_k6_14_next_output"),
    "k9_12": ("gmr1_conv_k9_next_state", "gmr1_conv_k9_12_next_output"),
    "k9_13": ("gmr1_conv_k9_next_state", "gmr1_conv_k9_13_next_output"),
    "k9_14": ("gmr1_conv_k9_next_state", "gmr1_conv_k9_14_next_output"),
    "tch3_k7": ("gmr1_conv_tch3_next_state", "gmr1_conv_tch3_next_output"),
}


@pytest.mark.parametrize("code", CV.ALL_CODES, ids=lambda c: c.name)
def test_tables_match_reference(code, reference_dir):
    ref = _parse_ref_tables(reference_dir + "/src/l1/conv.c")
    ns_name, no_name = REF_MAP[code.name]
    ns, no = code.tables
    np.testing.assert_array_equal(ns, ref[ns_name], err_msg=f"{code.name} next_state")
    np.testing.assert_array_equal(no, ref[no_name], err_msg=f"{code.name} next_output")


@pytest.mark.parametrize("code", CV.ALL_CODES, ids=lambda c: c.name)
def test_encode_matrix_matches_serial(code, rng):
    in_len = 48 if code.term == CV.TERM_TAIL_BITING else 60
    x = rng.integers(0, 2, size=(3, in_len)).astype(np.uint8)
    mat = np.array(CV.encode(code, x))
    for i in range(3):
        ser = CV.encode_np(code, x[i])
        np.testing.assert_array_equal(mat[i], ser)


@pytest.mark.parametrize("code", CV.ALL_CODES, ids=lambda c: c.name)
def test_viterbi_noiseless_roundtrip(code, rng):
    in_len = 48 if code.term == CV.TERM_TAIL_BITING else 64
    x = rng.integers(0, 2, size=(4, in_len)).astype(np.uint8)
    enc = np.array(CV.encode(code, x)).astype(np.float32)
    soft = (1.0 - 2.0 * enc) * 127.0  # bit0 -> +127
    bits, metric = VT.decode(code, soft, in_len)
    np.testing.assert_array_equal(np.array(bits), x)
    assert np.all(np.array(metric) > 0)


def test_viterbi_corrects_errors(rng):
    code = CV.K5_12
    in_len = 208  # BCCH configuration
    x = rng.integers(0, 2, size=in_len).astype(np.uint8)
    enc = np.array(CV.encode(code, x)).astype(np.float32)
    soft = (1.0 - 2.0 * enc) * 100.0
    # Flip 8 well-separated coded bits hard
    for pos in range(0, 8 * 50, 50):
        soft[pos] = -soft[pos]
    bits, _ = VT.decode(code, soft, in_len)
    np.testing.assert_array_equal(np.array(bits), x)


def test_viterbi_noisy_awgn(rng):
    code = CV.K5_14
    in_len = 92  # FACCH3 configuration, rate 1/4
    x = rng.integers(0, 2, size=(16, in_len)).astype(np.uint8)
    enc = np.array(CV.encode(code, x)).astype(np.float32)
    clean = 1.0 - 2.0 * enc
    noisy = clean + rng.normal(0, 0.7, size=clean.shape)
    bits, _ = VT.decode(code, noisy * 100.0, in_len)
    # rate 1/4 at ~3dB Eb/N0 equivalent: expect error-free decode
    assert np.mean(np.array(bits) != x) < 0.01


def test_viterbi_punctured_roundtrip(rng):
    # TCH3 speech configuration: K=7 tail-biting, len 48, P(1;2) mask
    code = CV.TCH3_K7
    in_len = 48
    keep = PT.keep_indices(code.out_len(in_len), 2, "k5_12_P12")
    assert len(keep) == 72
    x = rng.integers(0, 2, size=(4, in_len)).astype(np.uint8)
    enc = np.array(CV.encode(code, x))
    punct = enc[:, keep].astype(np.float32)
    soft = (1.0 - 2.0 * punct) * 127.0
    bits, _ = VT.decode_punctured(code, soft, in_len, keep)
    np.testing.assert_array_equal(np.array(bits), x)


def test_rach_custom_puncture_roundtrip(rng):
    # RACH: K=5 r=1/4 len 159, puncture indices 4i+2, 4i+3 for i<135
    # (reference rach.c:53-65) -> 652-270=382 coded bits
    code = CV.K5_14
    in_len = 159
    deleted = np.array(
        [(i << 2) + 2 for i in range(135)] + [(i << 2) + 3 for i in range(135)]
    )
    keep = np.setdiff1d(np.arange(code.out_len(in_len)), deleted)
    assert len(keep) == 382
    x = rng.integers(0, 2, size=in_len).astype(np.uint8)
    enc = np.array(CV.encode(code, x))
    soft = (1.0 - 2.0 * enc[keep].astype(np.float32)) * 127.0
    bits, _ = VT.decode_punctured(code, soft, in_len, keep)
    np.testing.assert_array_equal(np.array(bits), x)


def test_tch9_96_puncture_lengths():
    # 9k6: K5_12 len 480 punctured P25/P23x158/Ps25 -> 648 (tch9.c:73-78)
    code = CV.K5_12
    keep = PT.keep_indices(
        code.out_len(480), 2, "k5_12_P23", "k5_12_P25", "k5_12_Ps25", 158
    )
    assert len(keep) == 648


def test_tch9_24_48_puncture_lengths():
    # 2k4: K5_15 len 144 punctured P53/P23x41/Ps53 -> 648 (tch9.c:59-64)
    keep = PT.keep_indices(
        CV.K5_15.out_len(144), 5, "k5_15_P23", "k5_15_P53", "k5_15_Ps53", 41
    )
    assert len(keep) == 648
    # 4k8: K5_13 len 240 punctured P15/P25x41/Ps15 -> 648 (tch9.c:66-71)
    keep = PT.keep_indices(
        CV.K5_13.out_len(240), 3, "k5_13_P25", "k5_13_P15", "k5_13_Ps15", 41
    )
    assert len(keep) == 648


def test_xch_dc12_puncture_length():
    # K9_13 tail-biting len 208, P(12;13) -> 432 (xch_dc12.c:49-52)
    code = CV.ConvCode("k9_13_tb", 9, CV.K9_13.polys, term=CV.TERM_TAIL_BITING)
    keep = PT.keep_indices(code.out_len(208), 3, "k9_13_P1213")
    assert len(keep) == 432


def test_distance_zero_on_clean(rng):
    code = CV.K5_12
    x = rng.integers(0, 2, size=(2, 32)).astype(np.uint8)
    enc = np.array(CV.encode(code, x)).astype(np.float32)
    soft = (1.0 - 2.0 * enc) * 127.0
    bits, _ = VT.decode(code, soft, 32)
    d = np.array(VT.distance(code, soft, bits))
    np.testing.assert_allclose(d, 0.0, atol=1e-3)


def test_pallas_trellis_parity(rng):
    """Pallas VMEM-resident trellis kernel (interpret mode) is
    bit-exact with the XLA scan decoder over every trellis class:
    same decisions, same first-max argmax, same traceback."""
    from gmr1_tpu.ops import viterbi as VT
    from gmr1_tpu.ops.pallas_viterbi import decode_trellis

    cases = [
        CV.ConvCode("k5_12f", 5, CV.K5_12.polys, term=CV.TERM_FLUSH),
        CV.ConvCode("tch3_tb", 7, CV.TCH3_K7.polys,
                    term=CV.TERM_TAIL_BITING),
        CV.ConvCode("k9_13_tb", 9, CV.K9_13.polys,
                    term=CV.TERM_TAIL_BITING),
    ]
    for code in cases:
        t_steps, b = 26, 200
        bits = rng.integers(0, 2, (b, t_steps), dtype=np.uint8)
        enc = np.asarray(CV.encode(code, bits))
        soft = np.where(enc > 0, -127.0, 127.0).astype(np.float32)
        # integer-valued noise: the kernel's bf16-operand MXU dot is
        # exact only on the sbit domain (integers in [-127, 127]) —
        # which is what every L1 chain feeds it (modem.py:186)
        soft = np.clip(np.round(
            soft + rng.normal(0, 40.0, soft.shape)), -127, 127
        ).astype(np.float32)

        want_bits, want_metric = VT.decode(code, soft, t_steps)
        _, _, sign = VT._acs_tables(code)
        t_total = enc.shape[-1] // code.n     # incl. flush tail steps
        got_bits, got_metric = decode_trellis(
            soft.reshape(b, t_total, code.n),
            sign.reshape(code.num_states * 2, code.n), t_total,
            code.num_states, code.term == CV.TERM_FLUSH, interpret=True)
        np.testing.assert_array_equal(np.asarray(got_bits)[:, :t_steps],
                                      np.asarray(want_bits), err_msg=code.name)
        np.testing.assert_allclose(np.asarray(got_metric),
                                   np.asarray(want_metric), rtol=0, atol=0,
                                   err_msg=code.name)
