"""Pallas TPU kernel for the PFB analysis branch filter.

The XLA shifted-accumulate form (channelizer/pfb.py `_analyze_block`)
re-reads each input sample 2P times from HBM (~437 MB/frame-block at
transponder scale) and needs several full-tensor relayout passes
(interleave transpose, lane reversal, planar re-stack).  This kernel
removes all of them:

  * input is the natural slab layout z[c, j, t] = x_c[j*hop + t] with
    lanes padded to a 128 multiple — the shape a streaming ingest
    writes directly (.cfile rows land here with one strided memcpy);
  * the commutator's lane REVERSAL is folded into the weight table
    (`slab_weights`) and the channel-DFT row order (`dft_packed_slab`),
    so the kernel is a plain sum of 2P+1 weighted sublane-shifted
    views — no data movement beyond one VMEM pass;
  * the output is written directly as the packed-real DFT activation
    a2[r, c*2hp + a*hp + b'] (grid dims c and a each own a lane block),
    so the M-point channel DFT is ONE (R, 4hp) @ (4hp, 2M) MXU matmul
    with zero intermediate transposes.

Derivation: with q = a*hop + b and M = 2*hop, branch tap pp of channel
q reads x[(r+s)*hop - b] for the single shift s = 2*(P-pp) - a; in slab
rows that is z[r+s-1, hop-b] for b >= 1 and z[r+s, 0] for b = 0 — each
(a, shift) pair is one sublane-shifted view scaled per-lane.

Reference behavior: polyphase commutator of utils/gmr1_rx_sdr.py:464
(GNURadio pfb analysis); numerics match channelizer/pfb.py exactly
(f32, summation order aside).
"""

from __future__ import annotations

import functools
from functools import lru_cache

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _round_up(x: int, m: int) -> int:
    return -(-x // m) * m


def _kernel(wa_ref, z_hbm, out_ref, scratch, sem, *, tr: int, p2: int,
            sr: int):
    c = pl.program_id(0)
    a = pl.program_id(1)
    i = pl.program_id(2)
    dma = pltpu.make_async_copy(
        z_hbm.at[c, pl.ds(i * tr, sr)], scratch, sem)
    dma.start()
    dma.wait()
    base = a * (p2 + 1)
    acc = wa_ref[pl.ds(base, 1), :] * scratch[0:tr, :]
    for u in range(1, p2 + 1):
        acc += wa_ref[pl.ds(base + u, 1), :] * scratch[u:u + tr, :]
    out_ref[:] = acc


@lru_cache(maxsize=None)
def _tiling(r_cnt: int, p: int) -> tuple[int, int, int]:
    """(tr, n_tiles, sr): tile rows, tile count, aligned DMA window."""
    tr = 256 if r_cnt >= 256 else max(8, _round_up(r_cnt, 8))
    n_tiles = -(-r_cnt // tr)
    sr = _round_up(tr + 2 * p, 8)
    return tr, n_tiles, sr


def slab_rows(r_cnt: int, p: int) -> int:
    """Physical row count the slab input must provide (incl. halo+pad)."""
    tr, n_tiles, sr = _tiling(r_cnt, p)
    return (n_tiles - 1) * tr + sr


def to_slab(x, p: int, hop: int, r_cnt: int):
    """Halo-padded planar x ((>= (r_cnt+2p)*hop), 2) -> (2, ROWS, hp).

    The ingest-layout transform: component slabs of hop-sample rows
    with lanes zero-padded to a 128 multiple.  Streaming front-ends
    should write this layout directly; this helper is the generic
    adapter for planar buffers.
    """
    hp = _round_up(hop, 128)
    rows = slab_rows(r_cnt, p)
    u = r_cnt + 2 * p
    xt = jnp.transpose(x[:u * hop], (1, 0)).reshape(2, u, hop)
    return jnp.pad(xt, ((0, 0), (0, rows - u), (0, hp - hop)))


@functools.partial(jax.jit,
                   static_argnames=("m", "p", "hop", "r_cnt", "interpret"))
def branch_filter_slab(z, wa, m: int, p: int, hop: int, r_cnt: int,
                       interpret: bool = False):
    """Slab input (2, ROWS, hp) -> packed DFT activation a2 (R, 4*hp).

    a2[r, c*2hp + a*hp + b'] is the branch-filter output for component
    c and channel q = a*hop + ((hop - b') % hop); feed it straight to
    `dft_packed_slab(m, hop)` for the channel transform.
    """
    assert m == 2 * hop
    p2 = 2 * p
    hp = _round_up(hop, 128)
    assert z.shape[0] == 2 and z.shape[2] == hp, z.shape
    tr, n_tiles, sr = _tiling(r_cnt, p)
    assert z.shape[1] >= (n_tiles - 1) * tr + sr, (z.shape, r_cnt)
    a2 = pl.pallas_call(
        functools.partial(_kernel, tr=tr, p2=p2, sr=sr),
        out_shape=jax.ShapeDtypeStruct((n_tiles * tr, 4 * hp), jnp.float32),
        grid=(2, 2, n_tiles),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.VMEM),   # wa, whole
            pl.BlockSpec(memory_space=pl.ANY),       # z stays in HBM
        ],
        out_specs=pl.BlockSpec(
            (tr, hp), lambda c, a, i: (i, 2 * c + a),
            memory_space=pltpu.VMEM),
        scratch_shapes=[
            pltpu.VMEM((sr, hp), jnp.float32),
            pltpu.SemaphoreType.DMA,
        ],
        interpret=interpret,
    )(wa, z)
    return a2[:r_cnt]


def slab_weights(h_poly: np.ndarray, m: int, p: int, hop: int) -> np.ndarray:
    """(M, P) polyphase taps -> (2*(2P+1), hp) shift-weight table.

    Row a*(2P+1)+u holds the per-lane weight applied to slab row r+u
    when producing branch half a.  Lane b' >= 1 carries channel
    b = hop - b' via shift s = u+1; lane 0 carries b = 0 via s = u.
    Rows/lanes with no contribution are zero.
    """
    h = np.asarray(h_poly, np.float32)
    p2 = 2 * p
    hp = _round_up(hop, 128)
    wa = np.zeros((2 * (p2 + 1), hp), np.float32)

    def pp_of(s: int) -> int:
        return p - (s + (s & 1)) // 2

    for a in (0, 1):
        for u in range(p2 + 1):
            row = a * (p2 + 1) + u
            s = u + 1                      # lanes b' in [1, hop)
            if 1 <= s <= p2 and (s & 1) == a:
                bp = np.arange(1, hop)
                wa[row, bp] = h[a * hop + (hop - bp), pp_of(s)]
            s = u                          # lane 0
            if 1 <= s <= p2 and (s & 1) == a:
                wa[row, 0] = h[a * hop, pp_of(s)]
    return wa


@lru_cache(maxsize=None)
def dft_packed_slab(m: int, hop: int) -> np.ndarray:
    """(4*hp, 2M) channel-DFT matrix consuming branch_filter_slab output.

    Row c*2hp + a*hp + b' is the packed-real DFT row for component c,
    channel q = a*hop + ((hop - b') % hop); pad lanes are zero rows.
    y2 = a2 @ this gives [yr | yi] per frame (before the (-1)^{mr}
    2x-oversampling sign flip).
    """
    q_idx, k = np.meshgrid(np.arange(m), np.arange(m), indexing="ij")
    w = 2.0 * np.pi * q_idx * k / m
    br, bi = np.cos(w), np.sin(w)
    b2 = np.block([[br, bi], [-bi, br]]).astype(np.float32)   # (2M, 2M)
    hp = _round_up(hop, 128)
    out = np.zeros((4 * hp, 2 * m), np.float32)
    for c in (0, 1):
        for a in (0, 1):
            bp = np.arange(hop)
            q = a * hop + ((hop - bp) % hop)
            out[c * 2 * hp + a * hp + bp] = b2[c * m + q]
    return out
