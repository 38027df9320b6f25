"""Pallas TPU kernels for the radix-2 Viterbi family.

The XLA scan form of ops.viterbi round-trips the (B, S) metric carry
and the per-step decisions through HBM every trellis step; even for the
16-state K=5 codes the per-step launch + HBM traffic dominates.  These
kernels keep the WHOLE decode resident in VMEM per batch tile: forward
ACS and traceback run back-to-back over a (T, S, TB) decision scratch
that never touches HBM.  One generic kernel serves every GMR-1 trellis
(K=5/6/7/9; reference src/l1/conv.c) — they are all radix-2 (one input
bit per step).

Layout: states on SUBLANES, bursts on LANES:
  * TB adapts to the trellis: small trellises (S <= 64) run 512 bursts
    per program (4 lane tiles) so the per-step loop overhead amortizes
    over 4x the work; the 256-state K=9 keeps TB = 128 (its decision
    scratch already fills half of VMEM);
  * branch metrics are one MXU dot  sign (2S, n) @ sym_t (n, TB) with
    BF16 operands / f32 accumulation: soft inputs are integer-valued
    sbits in [-127, 127] (modem.py:186) and signs are +-1, both exact
    in bf16, so the f32-accumulated products are EXACT — bit-identical
    to the f32 path, at the MXU's native fast-path rate;
  * the radix-2 predecessor expansion m[ns>>1] is a SUBLANE
    interleave-repeat (jnp.repeat axis 0), the cheap shuffle direction;
  * decisions write (S, TB) rows straight into the scratch — no
    transposes anywhere;
  * both the ACS and traceback fori_loops run unrolled (x8) — the
    per-step work is tiny, so loop bookkeeping otherwise dominates;
  * traceback keeps the per-burst state as a (1, TB) lane vector: the
    decision lookup is a sublane one-hot reduce, the decoded bit a row
    store into the (T, 1, TB) output (untiled leading dim — Mosaic
    rejects dynamic sublane stores into tiled refs).

Bit-exact with ops.viterbi.decode (same c1 > c0 tie-break, same
first-max argmax, same traceback rule) for integer-valued soft inputs —
the sbit domain every L1 chain feeds; asserted in tests/test_conv.py
and on-chip by bench_viterbi.py.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

NEG_INF = -1e30
UNROLL = 8


VMEM_BUDGET = 15 * 1024 * 1024    # residents cap, under the 16 MB VMEM


def _lanes(s_cnt: int, t_steps: int, n: int, b: int) -> int:
    """Bursts per program: the widest 128-multiple lane tile whose
    VMEM residents (decision scratch + bf16 symbol block + metric)
    fit the budget.  Wide tiles amortize the per-step loop overhead
    over more lanes (measured on v5e: K=5 T=484 5.0 -> 7.2M bursts/s
    going 512 -> 1024 lanes; K=9 0.90 -> 1.2M going 128 -> 256)."""
    want = min(1024, -(-b // 128) * 128)
    per_lane = t_steps * s_cnt + 2 * t_steps * n + 8 * s_cnt
    tb = max(128, min(want, (VMEM_BUDGET // per_lane) // 128 * 128))
    return tb


def _vit_kernel(sym_ref, sign_ref, bits_ref, metric_ref, dec_ref, m_ref,
                *, s_cnt: int, flush: bool, tb: int):
    t_steps = sym_ref.shape[0]
    half = s_cnt // 2
    # manual unroll (Mosaic's fori_loop supports only full/no unroll):
    # largest power of two dividing t_steps, capped at UNROLL
    u = max(d for d in (UNROLL, 4, 2, 1) if t_steps % d == 0)

    if flush:
        state0 = jax.lax.broadcasted_iota(jnp.int32, (s_cnt, tb), 0) == 0
        m_ref[:] = jnp.where(state0, 0.0, NEG_INF)
    else:
        m_ref[:] = jnp.zeros((s_cnt, tb), jnp.float32)  # tail-biting

    def acs(t):
        sym_t = sym_ref[t]                            # (n, TB) bf16
        bm = jax.lax.dot_general(
            sign_ref[:], sym_t, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)       # (2S, TB) exact
        m = m_ref[:]
        c0 = jnp.repeat(m[:half], 2, axis=0) + bm[:s_cnt]
        c1 = jnp.repeat(m[half:], 2, axis=0) + bm[s_cnt:]
        dec = c1 > c0
        dec_ref[t] = dec.astype(jnp.int8)
        m_ref[:] = jnp.maximum(c0, c1)

    def fwd(k, _):
        for j in range(u):
            acs(k * u + j)
        return 0

    jax.lax.fori_loop(0, t_steps // u, fwd, 0)

    m = m_ref[:]
    if flush:
        metric_ref[0, :] = m[0, :]
        s0 = jnp.zeros((1, tb), jnp.int32)
    else:
        metric_ref[0, :] = jnp.max(m, axis=0)
        s0 = jnp.argmax(m, axis=0).astype(jnp.int32)[None, :]
    states = jax.lax.broadcasted_iota(jnp.int32, (s_cnt, tb), 0)

    def step_back(t, s):
        # int32 for the reduce: Mosaic has no int8 reductions
        dec = dec_ref[t].astype(jnp.int32)            # (S, TB)
        onehot = states == s                          # (S, TB)
        took = jnp.max(jnp.where(onehot, dec, 0), axis=0,
                       keepdims=True)                 # (1, TB)
        bits_ref[t] = (s & 1).astype(jnp.int8)        # (1, TB) row
        return (s >> 1) | (took * half)

    def bwd(k, s):
        for j in range(u):
            s = step_back(t_steps - 1 - (k * u + j), s)
        return s

    jax.lax.fori_loop(0, t_steps // u, bwd, s0)


@partial(jax.jit,
         static_argnames=("t_steps", "s_cnt", "flush", "interpret"))
def decode_trellis(sym, sign, t_steps: int, s_cnt: int, flush: bool,
                   interpret: bool = False):
    """Radix-2 trellis decode, VMEM-resident per burst tile.

    sym:  (B, T, n) float32 de-punctured branch symbols — assumed
          INTEGER-valued in [-127, 127] (the sbit domain; bf16-exact)
    sign: (2S, n) float32 expected-sign table (flat index 2s+b)
    flush: True = zero-state start/end; False = tail-biting (equal
    start, best end — the libosmocore CONV_TERM_TAIL_BITING strategy).
    Returns (bits (B, T) uint8, metric (B,) float32).
    """
    b, _, n = sym.shape
    tb = _lanes(s_cnt, t_steps, n, b)
    b_pad = -(-b // tb) * tb
    if b_pad != b:
        sym = jnp.concatenate(
            [sym, jnp.zeros((b_pad - b, t_steps, n), sym.dtype)])
    # (B, T, n) -> (T, n, B): one XLA transpose outside the kernel;
    # bf16 halves the HBM->VMEM stream and is exact (integer sbits)
    sym_t = jnp.transpose(sym, (1, 2, 0)).astype(jnp.bfloat16)

    grid = b_pad // tb
    kernel = partial(_vit_kernel, s_cnt=s_cnt, flush=flush, tb=tb)
    bits, metric = pl.pallas_call(
        kernel,
        grid=(grid,),
        in_specs=[
            pl.BlockSpec((t_steps, n, tb), lambda i: (0, 0, i),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((2 * s_cnt, n), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((t_steps, 1, tb), lambda i: (0, 0, i),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, tb), lambda i: (0, i),
                         memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((t_steps, 1, b_pad), jnp.int8),
            jax.ShapeDtypeStruct((1, b_pad), jnp.float32),
        ],
        scratch_shapes=[
            pltpu.VMEM((t_steps, s_cnt, tb), jnp.int8),
            pltpu.VMEM((s_cnt, tb), jnp.float32),
        ],
        interpret=interpret,
    )(sym_t, jnp.asarray(sign, jnp.bfloat16))
    return (jnp.transpose(bits[:, 0])[:b].astype(jnp.uint8),
            metric[0, :b])


def decode_k9_tb(sym, sign, t_steps: int, interpret: bool = False):
    """Back-compat wrapper: 256-state tail-biting decode."""
    return decode_trellis(sym, sign, t_steps, 256, False,
                          interpret=interpret)
