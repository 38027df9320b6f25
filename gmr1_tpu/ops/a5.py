"""GMR-1 A5 ciphering (reference src/l1/a5.c, after Driessen et al.).

A5/0 is the null cipher; A5/1 is a 4-LFSR (19/22/23-bit output registers
plus a 17-bit clock-control register R4) majority-clocked generator with
a majority-of-taps nonlinear output filter.  The key schedule byte-swaps
the SIM key and mixes the frame number into specific key bytes
(a5.c:233-241), then runs 64 forced clocks injecting key bits, sets the
LSB of each register, and mixes 250 clocks before output.

Two implementations:
  * keystream_np  — plain NumPy, one (key, fn) at a time; bit-exact
    reference semantics, used for tests and small host-side needs.
  * keystream     — batched JAX over frame numbers: the 314+2*nbits
    sequential clocks run as a lax.scan with the batch axis vectorized
    on the VPU, so generating cipher streams for thousands of frames
    costs one scan.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

_LENS = (19, 22, 23, 17)
_MASKS = tuple((1 << l) - 1 for l in _LENS)
# Feedback tap masks (a5.c:129-132)
_TAPS = (0x072000, 0x311000, 0x660000, 0x013100)
# R4 clock-control bit positions (a5.c:169-171)
_R4_CB = (15, 6, 1)
# Output filter: majority over 3 taps per register, XOR one extra tap
_OUT_MAJ = ((1, 6, 15), (3, 8, 14), (4, 15, 19))
_OUT_XOR = (11, 1, 0)


def _parity32(x):
    x ^= x >> 16
    x ^= x >> 8
    x ^= x >> 4
    x ^= x >> 2
    x ^= x >> 1
    return x & 1


def _mix_key(key: np.ndarray, fn: int) -> np.ndarray:
    lkey = np.asarray(key, dtype=np.uint8)[[1, 0, 3, 2, 5, 4, 7, 6]].copy()
    lkey[6] ^= (fn & 0x0000F) << 4
    lkey[3] ^= (fn & 0x00030) << 2
    lkey[1] ^= (fn & 0x007C0) >> 3
    lkey[0] ^= (fn & 0x0F800) >> 11
    lkey[0] ^= (fn & 0x70000) >> 11
    return lkey


def keystream_np(key, fn: int, nbits: int) -> tuple[np.ndarray, np.ndarray]:
    """Reference-exact A5/1: returns (dl, ul) hard-bit arrays."""
    lkey = _mix_key(key, fn)
    r = [0, 0, 0, 0]

    def clock_one(i):
        r[i] = ((r[i] << 1) & _MASKS[i]) | _parity32(r[i] & _TAPS[i])

    def clock_all():
        cb = [(r[3] >> b) & 1 for b in _R4_CB]
        m = int(sum(cb) >= 2)
        for i in range(3):
            if cb[i] == m:
                clock_one(i)
        clock_one(3)

    for i in range(64):
        b = (lkey[i >> 3] >> (7 - (i & 7))) & 1
        for j in range(4):
            clock_one(j)
        for j in range(4):
            r[j] ^= int(b)
    for j in range(4):
        r[j] |= 1
    for _ in range(250):
        clock_all()

    def output():
        v = 0
        for i in range(3):
            a, b, c = _OUT_MAJ[i]
            maj = int(((r[i] >> a) & 1) + ((r[i] >> b) & 1) + ((r[i] >> c) & 1) >= 2)
            v ^= maj ^ ((r[i] >> _OUT_XOR[i]) & 1)
        return v

    dl = np.empty(nbits, dtype=np.uint8)
    ul = np.empty(nbits, dtype=np.uint8)
    for i in range(nbits):
        clock_all()
        dl[i] = output()
    for i in range(nbits):
        clock_all()
        ul[i] = output()
    return dl, ul


# --- batched JAX version -------------------------------------------------

# numpy on purpose: module-level jnp constants would be STAGED INTO
# whatever trace happens to be active if this module is first imported
# inside a jitted function (a lazy import in a traced callee), and the
# cached tracer then leaks into every later caller (UnexpectedTracerError)
_TAPS_J = np.asarray(_TAPS, dtype=np.uint32)
_MASKS_J = np.asarray(_MASKS, dtype=np.uint32)


def _jparity(x):
    x = x ^ (x >> 16)
    x = x ^ (x >> 8)
    x = x ^ (x >> 4)
    x = x ^ (x >> 2)
    x = x ^ (x >> 1)
    return x & 1


def _jclock_forced(r):
    return ((r << 1) & _MASKS_J) | _jparity(r & _TAPS_J)


def _jclock(r):
    cb = jnp.stack([(r[..., 3] >> b) & 1 for b in _R4_CB], axis=-1)
    m = (jnp.sum(cb, axis=-1) >= 2).astype(jnp.uint32)
    forced = _jclock_forced(r)
    gate = jnp.stack(
        [cb[..., 0] == m, cb[..., 1] == m, cb[..., 2] == m,
         jnp.ones_like(m, dtype=bool)],
        axis=-1,
    )
    return jnp.where(gate, forced, r)


def _joutput(r):
    v = jnp.zeros(r.shape[:-1], dtype=jnp.uint32)
    for i in range(3):
        a, b, c = _OUT_MAJ[i]
        s = ((r[..., i] >> a) & 1) + ((r[..., i] >> b) & 1) + ((r[..., i] >> c) & 1)
        maj = (s >= 2).astype(jnp.uint32)
        v = v ^ maj ^ ((r[..., i] >> _OUT_XOR[i]) & 1)
    return v.astype(jnp.uint8)


@partial(jax.jit, static_argnames=("nbits",))
def keystream(key, fns, nbits: int):
    """Batched A5/1: key (8,) uint8, fns (...,) uint32 -> (dl, ul).

    dl/ul have shape (..., nbits) uint8.  All frame numbers share the
    key, as in the receiver (reference gmr1_rx.c:407,518).
    """
    key = jnp.asarray(key, jnp.uint32)
    fns = jnp.asarray(fns, jnp.uint32)
    lkey = key[jnp.asarray([1, 0, 3, 2, 5, 4, 7, 6])]
    lkey = jnp.broadcast_to(lkey, (*fns.shape, 8))
    updates = jnp.stack(
        [
            ((fns & 0x0F800) >> 11) ^ ((fns & 0x70000) >> 11),  # byte 0
            (fns & 0x007C0) >> 3,                                # byte 1
            (fns & 0x00030) << 2,                                # byte 3
            (fns & 0x0000F) << 4,                                # byte 6
        ],
        axis=-1,
    )
    idx = jnp.asarray([0, 1, 3, 6])
    lkey = lkey.at[..., idx].set(lkey[..., idx] ^ updates)

    r = jnp.zeros((*fns.shape, 4), jnp.uint32)

    def key_mix(r, i):
        b = (lkey[..., i >> 3] >> (7 - (i & 7)).astype(jnp.uint32)) & 1
        r = _jclock_forced(r)
        return r ^ b.astype(jnp.uint32)[..., None], None

    r, _ = jax.lax.scan(key_mix, r, jnp.arange(64))
    r = r | 1

    def mix(r, _):
        return _jclock(r), None

    r, _ = jax.lax.scan(mix, r, None, length=250)

    def gen(r, _):
        r = _jclock(r)
        return r, _joutput(r)

    r, dl = jax.lax.scan(gen, r, None, length=nbits)
    _, ul = jax.lax.scan(gen, r, None, length=nbits)
    return jnp.moveaxis(dl, 0, -1), jnp.moveaxis(ul, 0, -1)


def cipher_stream(n: int, key, fns, nbits: int):
    """gmr1_a5 equivalent: n=0 -> zeros, n=1 -> A5/1 (a5.c:57-77)."""
    if n == 0:
        fns = jnp.asarray(fns)
        z = jnp.zeros((*fns.shape, nbits), jnp.uint8)
        return z, z
    if n == 1:
        return keystream(key, fns, nbits)
    raise ValueError(f"A5/{n} not defined for GMR-1")
