"""Pallas TPU kernel for the K=9 (256-state) tail-biting Viterbi.

The XLA scan form of ops.viterbi round-trips the (B, 256) metric carry
and the per-step decisions through HBM every trellis step; for the
256-state xCH/DC12 code (reference src/l1/conv.c:335, used by
xch_dc12.c:87) that caps throughput well below the VPU's ability.  This
kernel keeps the WHOLE decode resident in VMEM per batch tile: forward
ACS and traceback run back-to-back over a (T, 256, TB) decision scratch
that never touches HBM.

Layout: states on SUBLANES, bursts on LANES (TB = 128 = one lane tile):
  * branch metrics are one MXU dot  sign (512, 3) @ sym_t (3, TB);
  * the radix-2 predecessor expansion m[ns>>1] is a SUBLANE
    interleave-repeat (jnp.repeat axis 0), the cheap shuffle direction;
  * decisions write (256, TB) rows straight into the scratch — no
    transposes anywhere;
  * traceback keeps the per-burst state as a (1, TB) lane vector: the
    decision lookup is a sublane one-hot reduce, the decoded bit a row
    store into the (T, TB) output.

Bit-exact with ops.viterbi.decode (same c1 > c0 tie-break, same
first-max argmax, same traceback rule); asserted in tests/test_conv.py.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

TB = 128          # bursts per program (one lane tile)


def _k9_kernel(sym_ref, sign_ref, bits_ref, metric_ref, dec_ref, m_ref):
    t_steps = sym_ref.shape[0]
    s_cnt = 256
    half = s_cnt // 2

    m_ref[:] = jnp.zeros((s_cnt, TB), jnp.float32)   # tail-biting init

    def fwd(t, _):
        sym_t = sym_ref[t]                            # (3, TB)
        bm = jax.lax.dot_general(
            sign_ref[:], sym_t, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)       # (512, TB)
        m = m_ref[:]
        c0 = jnp.repeat(m[:half], 2, axis=0) + bm[:s_cnt]
        c1 = jnp.repeat(m[half:], 2, axis=0) + bm[s_cnt:]
        dec = c1 > c0
        dec_ref[t] = dec.astype(jnp.int8)
        m_ref[:] = jnp.maximum(c0, c1)
        return 0

    jax.lax.fori_loop(0, t_steps, fwd, 0)

    m = m_ref[:]
    metric_ref[0, :] = jnp.max(m, axis=0)
    s0 = jnp.argmax(m, axis=0).astype(jnp.int32)[None, :]   # (1, TB)
    states = jax.lax.broadcasted_iota(jnp.int32, (s_cnt, TB), 0)

    def bwd(i, s):
        t = t_steps - 1 - i
        # int32 for the reduce: Mosaic has no int8 reductions
        dec = dec_ref[t].astype(jnp.int32)            # (256, TB)
        onehot = states == s                          # (256, TB)
        took = jnp.max(jnp.where(onehot, dec, 0), axis=0,
                       keepdims=True)                 # (1, TB)
        bits_ref[t] = (s & 1).astype(jnp.int8)        # (1, TB) row
        return (s >> 1) | (took << 7)

    jax.lax.fori_loop(0, t_steps, bwd, s0)


@partial(jax.jit, static_argnames=("t_steps", "interpret"))
def decode_k9_tb(sym, sign, t_steps: int, interpret: bool = False):
    """256-state tail-biting decode.

    sym:  (B, T, 3) float32 de-punctured branch symbols
    sign: (512, 3) float32 expected-sign table (flat index 2s+b)
    Returns (bits (B, T) uint8, metric (B,) float32).
    """
    b = sym.shape[0]
    b_pad = -(-b // TB) * TB
    if b_pad != b:
        sym = jnp.concatenate(
            [sym, jnp.zeros((b_pad - b, t_steps, 3), sym.dtype)])
    # (B, T, 3) -> (T, 3, B): one XLA transpose outside the kernel
    sym_t = jnp.transpose(sym, (1, 2, 0)).astype(jnp.float32)

    grid = b_pad // TB
    bits, metric = pl.pallas_call(
        _k9_kernel,
        grid=(grid,),
        in_specs=[
            pl.BlockSpec((t_steps, 3, TB), lambda i: (0, 0, i),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((512, 3), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=[
            # bits as (T, 1, TB): the per-step row store must hit the
            # UNTILED leading dim (Mosaic rejects dynamic sublane
            # stores into a tiled (T, TB) ref)
            pl.BlockSpec((t_steps, 1, TB), lambda i: (0, 0, i),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, TB), lambda i: (0, i),
                         memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((t_steps, 1, b_pad), jnp.int8),
            jax.ShapeDtypeStruct((1, b_pad), jnp.float32),
        ],
        scratch_shapes=[
            pltpu.VMEM((t_steps, 256, TB), jnp.int8),
            pltpu.VMEM((256, TB), jnp.float32),
        ],
        interpret=interpret,
    )(sym_t, jnp.asarray(sign, jnp.float32))
    return (jnp.transpose(bits[:, 0])[:b].astype(jnp.uint8),
            metric[0, :b])
