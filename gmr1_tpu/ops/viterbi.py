"""Batched soft-decision Viterbi decoding for the GMR-1 code family.

TPU-native replacement for libosmocore's osmo_conv_decode (SURVEY.md
§2.6; call sites e.g. reference src/l1/bcch.c:94, tch3.c:174).  Design
(SURVEY.md §7.1 "the one hard kernel"):

  * Branch metrics for the whole burst are one MXU matmul:
    bm[t, s, b] = sum_n soft[t*N+n] * (+-1 expected sign), computed as
    (T, N) x (N, S*2).  Punctured positions carry soft value 0 and thus
    contribute nothing (erasures) — de-puncturing is a static scatter.
  * The add-compare-select recurrence runs as a lax.scan over time with
    all states and the batch axis vectorized; the radix-2 trellis
    structure (predecessors of state ns are ns>>1 and ns>>1 | S/2, input
    bit = ns & 1) makes the gather indices static.
  * Traceback is a reverse lax.scan over the stored decision bits.

Metric convention: maximize correlation sum(soft * expected_sign) where
positive soft = bit 0 (osmocom sbit).  `distance` converts the winning
metric into the same "soft Hamming distance" flavour libosmocore
reports: sum(|soft|) - metric) / 2 over unpunctured positions.
"""

from __future__ import annotations

from functools import lru_cache, partial

import jax
import jax.numpy as jnp
import numpy as np

from .conv import TERM_FLUSH, TERM_TAIL_BITING, ConvCode

NEG_INF = -1e30


@lru_cache(maxsize=None)
def _acs_tables(code: ConvCode) -> tuple[np.ndarray, np.ndarray, np.ndarray]:
    """(p0[S], p1[S], sign[S, 2, N]) for the ACS step.

    p0/p1 are the two predecessor states of each state; sign is the
    expected-bit sign (+1 for bit 0) of transition (state s, input b).
    """
    s_cnt = code.num_states
    ns = np.arange(s_cnt)
    p0 = (ns >> 1).astype(np.int32)
    p1 = (p0 | (s_cnt >> 1)).astype(np.int32)
    sign = (1 - 2 * code.output_bits.astype(np.int32)).astype(np.float32)
    return p0, p1, sign


def depuncture(soft, keep_idx: np.ndarray, out_len: int):
    """Scatter punctured soft bits (..., P) into erasure zeros (..., out_len)."""
    soft = jnp.asarray(soft, jnp.float32)
    out = jnp.zeros((*soft.shape[:-1], out_len), jnp.float32)
    return out.at[..., jnp.asarray(keep_idx)].set(soft)


@partial(jax.jit, static_argnames=("code", "in_len"))
def decode(code: ConvCode, soft, in_len: int):
    """ML-decode soft bits (..., out_len(in_len)) -> (bits, metric).

    `soft` must already be de-punctured (zeros at erased positions) and
    of full unpunctured length.  Returns decoded input bits
    (..., in_len) as uint8 and the winning path correlation metric
    (...,) float32.  Flush termination constrains both endpoint states
    to zero; tail-biting starts all states equal and ends at the best
    state (the libosmocore CONV_TERM_TAIL_BITING strategy).
    """
    soft = jnp.asarray(soft, jnp.float32)
    n = code.n
    t_steps = soft.shape[-1] // n
    batch_shape = soft.shape[:-1]
    s_cnt = code.num_states
    half = s_cnt // 2

    _, _, sign_np = _acs_tables(code)

    # TPU backends: VMEM-resident Pallas kernel (ops/pallas_viterbi.py),
    # bit-exact with the XLA path below for integer-valued (sbit) soft
    # inputs (tests/test_conv.py::test_pallas_trellis_parity).  Routed
    # by trellis size and batch:
    #   * the 256-state K=9 always (3.8x vs the XLA scan at B=2048);
    #   * K=5/6/7 when the visible batch fills at least one 512-lane
    #     tile — the wide-tile + unrolled-loop kernel form is ~2x the
    #     XLA scan at transponder batch sizes, while tiny batches (the
    #     per-carrier host-loop decodes, B ~ 1) stay on XLA: a vmapped
    #     pallas_call lowers to one kernel launch per element (measured
    #     12x slower on the mixed workload in that form).
    batch = int(np.prod(batch_shape)) if batch_shape else 1
    if jax.default_backend() in ("tpu", "axon") \
            and (s_cnt >= 256 or batch >= 512):
        from .pallas_viterbi import decode_trellis
        sym = soft.reshape(-1, t_steps, n)
        bits, metric = decode_trellis(
            sym, sign_np.reshape(s_cnt * 2, n), t_steps, s_cnt,
            code.term == TERM_FLUSH)
        return (bits.reshape(*batch_shape, t_steps)[..., :in_len],
                metric.reshape(batch_shape))
    sign_t = jnp.asarray(sign_np.reshape(s_cnt * 2, n).T)  # (N, S*2)
    sym = jnp.moveaxis(soft.reshape(*batch_shape, t_steps, n), -2, 0)

    # Branch-metric strategy by trellis size (measured on v5e):
    #  * small S (K<=7): ONE big upfront matmul materializes all branch
    #    metrics — the (..., T, S*2) tensor is small and the scan body
    #    stays pure VPU;
    #  * large S (K=9, S*2=512): compute bm INSIDE the scan — the full
    #    tensor is 0.4 MB/burst and its HBM round-trip dominates.
    bm_inside = s_cnt > 64
    if bm_inside:
        xs = sym
    else:
        bm = jnp.einsum("t...n,ns->t...s", sym, sign_t,
                        preferred_element_type=jnp.float32)
        xs = bm

    # Derive the initial metrics from sym (not from shapes alone) so
    # the scan carry inherits its sharding/varying axes under shard_map.
    zero = jnp.zeros_like(
        jnp.einsum("...n,ns->...s", sym[0], sign_t[:, :s_cnt]))
    if code.term == TERM_FLUSH:
        m0 = zero + jnp.where(jnp.arange(s_cnt) == 0, 0.0, NEG_INF)
    else:
        m0 = zero

    # Gather-free radix-2 ACS: the predecessors of state ns are
    # p0 = ns>>1 and p1 = p0 | S/2 with input bit ns&1, so
    #   m[p0] == repeat(m[:S/2], 2),  m[p1] == repeat(m[S/2:], 2),
    #   bm[p0, ns&1] == bm_flat[ns],  bm[p1, ns&1] == bm_flat[ns + S]
    # — every "gather" is a reshape/broadcast the VPU does for free.
    # No per-step normalization: soft inputs are int8-valued, so every
    # path metric is an exact f32 integer bounded by T*N*127 < 2^24.
    def rep2(v):
        return jnp.repeat(v, 2, axis=-1)

    def acs(m, x_t):
        if bm_inside:
            bm_t = jnp.einsum("...n,ns->...s", x_t, sign_t,
                              preferred_element_type=jnp.float32)
        else:
            bm_t = x_t
        c0 = rep2(m[..., :half]) + bm_t[..., :s_cnt]
        c1 = rep2(m[..., half:]) + bm_t[..., s_cnt:]
        dec = c1 > c0
        return jnp.maximum(c0, c1), dec

    m_final, decisions = jax.lax.scan(acs, m0, xs, unroll=8)

    if code.term == TERM_FLUSH:
        end_state = (m_final[..., 0] * 0).astype(jnp.int32)
        metric_total = m_final[..., 0]
    else:
        end_state = jnp.argmax(m_final, axis=-1).astype(jnp.int32)
        metric_total = jnp.max(m_final, axis=-1)

    # Gather-free traceback: select this state's decision with a
    # one-hot reduce, then compute the predecessor arithmetically.
    states = jnp.arange(s_cnt, dtype=jnp.int32)

    def traceback(s, dec_t):
        bit = (s & 1).astype(jnp.uint8)
        onehot = s[..., None] == states
        took_p1 = jnp.any(onehot & dec_t, axis=-1)
        s_prev = (s >> 1) | jnp.where(took_p1, half, 0)
        return s_prev, bit

    _, bits_rev = jax.lax.scan(traceback, end_state, decisions,
                               reverse=True, unroll=8)
    bits = jnp.moveaxis(bits_rev, 0, -1)  # (..., T)
    return bits[..., :in_len], metric_total


def decode_punctured(code: ConvCode, soft, in_len: int, keep_idx: np.ndarray):
    """Convenience: de-puncture then decode."""
    full = depuncture(soft, keep_idx, code.out_len(in_len))
    return decode(code, full, in_len)


def distance(code: ConvCode, soft, bits_decoded, keep_idx=None):
    """Soft distance of the decoded word, libosmocore-flavoured.

    Re-encodes the decision and scores sum(|soft| - soft*sign)/2 over
    surviving (unpunctured) positions; equals the Hamming distance for
    +-127 hard-decision inputs scaled by 127.
    """
    from .conv import encode

    enc = encode(code, bits_decoded).astype(jnp.float32)
    sign = 1.0 - 2.0 * enc
    if keep_idx is not None:
        sign = sign[..., jnp.asarray(keep_idx)]
    soft = jnp.asarray(soft, jnp.float32)
    return jnp.sum(jnp.abs(soft) - soft * sign, axis=-1) / 2.0
