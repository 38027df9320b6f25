"""Pallas TPU kernel for the PFB analysis branch filter.

The XLA shifted-accumulate form (channelizer/pfb.py `_analyze_block`)
re-reads each input sample 2P times from HBM (~437 MB/frame-block at
transponder scale).  This kernel streams each zr row through VMEM once:
a grid program DMAs one (TR + 2P - 1, hop) tile of the lane-reversed
row view, then accumulates the 2P weighted sublane-shifted views
entirely on the VPU.  HBM traffic drops ~20x to (read + write) one
pass.

Layout notes (pallas_guide.md): planar (re, im) lives in the LEADING
dim (slabs), never the lane dim; lane dim is `hop`; sublane dim is the
frame index r.  Output is (2, 2, R, hop) = (component, branch-half a,
frame, lane) so the packed-real DFT matmul can consume it with a single
transpose.

Reference behavior: polyphase commutator of utils/gmr1_rx_sdr.py:464
(GNURadio pfb analysis); numerics match channelizer/pfb.py exactly.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _kernel(w_ref, zr_hbm, out_ref, scratch, sem, *, tr: int, p2: int,
            sr: int):
    c = pl.program_id(0)
    i = pl.program_id(1)
    dma = pltpu.make_async_copy(
        zr_hbm.at[c, pl.ds(i * tr, sr)], scratch, sem)
    dma.start()
    dma.wait()
    for alpha in (0, 1):
        acc = None
        for s in range(1, p2 + 1):
            if (s & 1) != alpha:
                continue
            term = w_ref[s - 1:s, :] * scratch[s - 1:s - 1 + tr, :]
            acc = term if acc is None else acc + term
        out_ref[0, alpha] = acc


@functools.partial(jax.jit,
                   static_argnames=("m", "p", "hop", "r_cnt", "interpret"))
def branch_filter(x, w2, m: int, p: int, hop: int, r_cnt: int,
                  interpret: bool = False):
    """Planar left-padded x ((>= r_cnt*hop + p*m), 2) -> v2 (2, 2, R, hop).

    v2[c, a, r, b] = v_q(r) component c for q = a*hop + b, i.e. the
    branch-filtered commutator output before the channel DFT.  `w2` is
    the (2P, hop) shift-weight table from `branch_weights`.
    """
    assert m == 2 * hop
    p2 = 2 * p
    u = r_cnt + p2                    # z rows consumed (incl. +1 lead)
    xt = jnp.transpose(x[:u * hop], (1, 0))         # (2, u*hop)
    z = xt.reshape(2, u, hop)
    # zr[c, j, b] = x[(j+1)*hop - b]
    zr = jnp.concatenate([z[:, 1:, :1], z[:, :-1, hop - 1:0:-1]], axis=2)
    tr = 256 if r_cnt >= 256 else max(8, -(-r_cnt // 8) * 8)
    n_tiles = -(-r_cnt // tr)
    sr = -(-(tr + p2 - 1) // 8) * 8    # DMA rows, sublane (8) aligned
    hp = -(-hop // 128) * 128          # DMA lanes, lane (128) aligned
    pad_rows = (n_tiles - 1) * tr + sr - zr.shape[1]
    zr = jnp.pad(zr, ((0, 0), (0, max(pad_rows, 0)), (0, hp - hop)))
    if w2.shape[-1] < hp:
        w2 = jnp.pad(w2, ((0, 0), (0, hp - w2.shape[-1])))
    v2 = pl.pallas_call(
        functools.partial(_kernel, tr=tr, p2=p2, sr=sr),
        out_shape=jax.ShapeDtypeStruct((2, 2, n_tiles * tr, hp),
                                       jnp.float32),
        grid=(2, n_tiles),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.VMEM),   # w2, whole
            pl.BlockSpec(memory_space=pltpu.ANY),    # zr stays in HBM
        ],
        out_specs=pl.BlockSpec(
            (1, 2, tr, hp), lambda c, i: (c, 0, i, 0),
            memory_space=pltpu.VMEM),
        scratch_shapes=[
            pltpu.VMEM((sr, hp), jnp.float32),
            pltpu.SemaphoreType.DMA,
        ],
        interpret=interpret,
    )(w2, zr)
    return v2[:, :, :r_cnt, :hop]


def branch_weights(h_poly: np.ndarray, m: int, p: int, hop: int) -> np.ndarray:
    """(M, P) polyphase taps -> (2P, hop) shift-weight table.

    Row s-1 holds h_poly[a*hop : (a+1)*hop, pp] for the unique branch
    half a = s&1 and tap pp = p - (s + a)//2 reached at row shift s.
    """
    h = np.asarray(h_poly, np.float32)
    w2 = np.zeros((2 * p, hop), np.float32)
    for s in range(1, 2 * p + 1):
        a = s & 1
        pp = p - (s + a) // 2
        w2[s - 1] = h[a * hop:(a + 1) * hop, pp]
    return w2
