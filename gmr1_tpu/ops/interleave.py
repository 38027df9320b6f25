"""GMR-1 interleaving (ETSI TS 101 376-5-3 §4.8).

Intra-burst: the reference (src/l1/interleave.c:56-61) scatters bit kc of
an 8N-bit block to position kep = N*((5*kc) mod 8) + floor(kc/8).  That
permutation is a fixed gather table per N, precomputed here on the host;
on device both directions are a single jnp.take — ideal XLA form, no
scatter needed.

Inter-burst: the reference keeps a mutable N-row ring buffer
(interleave.c:136-190).  The TPU-native form is functional: the state is
an array carried through lax.scan / the host loop, and each step is a
gather + dynamic row write, so whole burst streams can be processed as a
scan with the state as carry (SURVEY.md §5.7: interleaver carry state at
block boundaries).
"""

from __future__ import annotations

from functools import lru_cache
from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np


@lru_cache(maxsize=None)
def intra_tables(n: int) -> tuple[np.ndarray, np.ndarray]:
    """(forward, inverse) index tables for the 8N-bit intra interleave.

    forward[kep] = kc   such that out[kep] = in[kc]  (interleave)
    inverse[kc]  = kep  such that out[kc]  = in[kep] (deinterleave)
    """
    kc = np.arange(8 * n)
    kep = n * ((5 * kc) & 7) + (kc >> 3)
    fwd = np.empty(8 * n, dtype=np.int32)
    fwd[kep] = kc
    return fwd, kep.astype(np.int32)


def interleave_intra(bits, n: int):
    """Interleave (..., 8n) -> (..., 8n)."""
    fwd, _ = intra_tables(n)
    return jnp.take(jnp.asarray(bits), jnp.asarray(fwd), axis=-1)


def deinterleave_intra(bits, n: int):
    """Deinterleave (..., 8n) -> (..., 8n)."""
    _, inv = intra_tables(n)
    return jnp.take(jnp.asarray(bits), jnp.asarray(inv), axis=-1)


class InterleaverState(NamedTuple):
    """Functional inter-burst (depth N, width K) interleaver state.

    Mirrors struct gmr1_interleaver (reference include .../interleave.h:44-50):
    `buf` is the N x K ring of past bursts, `n` the burst counter.
    """

    buf: jax.Array  # (N, K)
    n: jax.Array    # scalar int32


def interleaver_init(n: int, k: int, dtype=jnp.int8) -> InterleaverState:
    return InterleaverState(
        buf=jnp.zeros((n, k), dtype=dtype), n=jnp.zeros((), jnp.int32)
    )


@lru_cache(maxsize=None)
def _inter_col_offsets(n: int, k: int) -> np.ndarray:
    # Row offset per column jk: (n_cur - jk) mod N, reference interleave.c:152.
    return (np.arange(k, dtype=np.int32) % n).astype(np.int32)


def _row_masks(st: InterleaverState):
    """(N, K) bool: mask[r, jk] = (ring row for column jk) == r.

    Column jk maps to ring row ((n - jk) mod N) (interleave.c:152).
    With depth N tiny (3 for TCH9), expressing the ring access as N
    masked merges beats the general gather/scatter XLA would otherwise
    emit on TPU (the per-burst scatter dominated the whole TCH9 decode
    before this — measured ~10 ms/step on the mixed transponder)."""
    n_depth, k = st.buf.shape[-2:]
    row = st.n % n_depth
    rows = (row[..., None]
            - jnp.asarray(_inter_col_offsets(n_depth, k))) % n_depth
    return rows[..., None, :] == jnp.arange(n_depth)[:, None]


def interleave_inter(st: InterleaverState, bits_ep):
    """One burst through the inter-burst interleaver.

    Returns (new_state, bits_epp).  Matches gmr1_interleave_inter
    (interleave.c:136-158): the current burst is written to ring row
    (n mod N); output column jk is read from ring row ((n - jk) mod N).
    Supports leading batch dims on (st, bits_ep) together.
    """
    n_depth, k = st.buf.shape[-2:]
    row = st.n % n_depth
    wmask = (jnp.arange(n_depth) == row[..., None])[..., None]  # (...,N,1)
    buf = jnp.where(wmask, jnp.asarray(bits_ep, st.buf.dtype)[..., None, :],
                    st.buf)
    out = jnp.sum(jnp.where(_row_masks(st), buf, 0),
                  axis=-2).astype(st.buf.dtype)
    return InterleaverState(buf=buf, n=st.n + 1), out


def deinterleave_inter(st: InterleaverState, bits_epp, valid=None):
    """One burst through the inter-burst de-interleaver.

    Returns (new_state, bits_ep).  Matches gmr1_deinterleave_inter
    (interleave.c:168-190): input column jk is scattered to ring row
    ((n - jk) mod N); the output is ring row ((n+1) mod N), i.e. data
    assembled N-1 bursts ago.  Output is only valid once N bursts have
    been absorbed.  Supports leading batch dims on (st, bits_epp)
    together.

    `valid` (bool, batch-shaped) gates the ring: where False the state
    is unchanged and the output is garbage (callers mask it) — the
    batched form of "only feed the interleaver on real TCH9 bursts"
    (the reference advances its ring only inside gmr1_tch9_decode,
    rx path gmr1_rx.c:321-347).
    """
    n_depth, k = st.buf.shape[-2:]
    buf = jnp.where(_row_masks(st),
                    jnp.asarray(bits_epp, st.buf.dtype)[..., None, :],
                    st.buf)
    out_row = (st.n + 1) % n_depth
    omask = (jnp.arange(n_depth) == out_row[..., None])[..., None]
    out = jnp.sum(jnp.where(omask, buf, 0), axis=-2).astype(st.buf.dtype)
    n2 = st.n + 1
    if valid is not None:
        v = jnp.asarray(valid)
        buf = jnp.where(v[..., None, None], buf, st.buf)
        n2 = jnp.where(v, n2, st.n)
    return InterleaverState(buf=buf, n=n2), out
