"""Planar complex arithmetic: float32 arrays with a trailing (re, im) axis.

The axon TPU PJRT backend implements no complex64 ops at all (arith,
transfer, FFT are UNIMPLEMENTED — see .claude/skills/verify/SKILL.md),
and planar float is the better TPU-native layout anyway:

  * a .cfile capture IS this format — interleaved float32 re/im pairs —
    so ingest is a zero-copy reshape to (N, 2);
  * complex matmuls/DFTs become single packed real matmuls on the MXU;
  * elementwise ops stay on the VPU with no dtype exotica.

Convention: x[..., 0] = real, x[..., 1] = imag, dtype float32.
"""

from __future__ import annotations

from functools import lru_cache

import jax
import jax.numpy as jnp
import numpy as np


def from_complex(x) -> jax.Array:
    """complex array -> planar (..., 2) float32 (host-side helper)."""
    x = np.asarray(x)
    return jnp.asarray(
        np.stack([x.real.astype(np.float32), x.imag.astype(np.float32)], axis=-1)
    )


def to_complex(x) -> np.ndarray:
    """planar (..., 2) -> host complex64."""
    x = np.asarray(x)
    return (x[..., 0] + 1j * x[..., 1]).astype(np.complex64)


def planar_np(x) -> np.ndarray:
    x = np.asarray(x)
    return np.stack([x.real, x.imag], axis=-1).astype(np.float32)


def mul(a, b):
    """Elementwise complex multiply."""
    ar, ai = a[..., 0], a[..., 1]
    br, bi = b[..., 0], b[..., 1]
    return jnp.stack([ar * br - ai * bi, ar * bi + ai * br], axis=-1)


def conj_mul(a, b):
    """conj(a) * b elementwise."""
    ar, ai = a[..., 0], a[..., 1]
    br, bi = b[..., 0], b[..., 1]
    return jnp.stack([ar * br + ai * bi, ar * bi - ai * br], axis=-1)


def conj(a):
    return jnp.stack([a[..., 0], -a[..., 1]], axis=-1)


def abs2(a):
    return a[..., 0] * a[..., 0] + a[..., 1] * a[..., 1]


def absv(a):
    return jnp.sqrt(abs2(a))


def scale(a, s):
    """Multiply by a real scalar/array broadcast over the planar axis."""
    return a * jnp.asarray(s)[..., None]


def angle(a):
    return jnp.arctan2(a[..., 1], a[..., 0])


def expi(theta):
    """exp(1j*theta) -> planar."""
    theta = jnp.asarray(theta, jnp.float32)
    return jnp.stack([jnp.cos(theta), jnp.sin(theta)], axis=-1)


def normalize(a, eps: float = 1e-30):
    """a / |a| elementwise."""
    return a * jax.lax.rsqrt(jnp.maximum(abs2(a), eps))[..., None]


def dot(a, b, axis: int = -2):
    """Complex dot: sum over `axis` of a*b (planar in, planar out)."""
    return jnp.sum(mul(a, b), axis=axis)


def conj_dot(a, b, axis: int = -2):
    """sum over `axis` of conj(a)*b."""
    return jnp.sum(conj_mul(a, b), axis=axis)


def matmul(a, b):
    """Complex matmul via one packed real matmul on the MXU.

    a: (..., M, K, 2), b: (K, N, 2) -> (..., M, N, 2).
    [Cr | Ci] = [Ar | Ai] @ [[Br, Bi], [-Bi, Br]].
    """
    ar, ai = a[..., 0], a[..., 1]
    br, bi = b[..., 0], b[..., 1]
    a2 = jnp.concatenate([ar, ai], axis=-1)  # (..., M, 2K)
    top = jnp.concatenate([br, bi], axis=-1)      # (K, 2N)
    bot = jnp.concatenate([-bi, br], axis=-1)     # (K, 2N)
    b2 = jnp.concatenate([top, bot], axis=-2)     # (2K, 2N)
    c2 = a2 @ b2
    n = br.shape[-1]
    return jnp.stack([c2[..., :n], c2[..., n:]], axis=-1)


@lru_cache(maxsize=None)
def _dft_matrix(n: int, sign: float) -> np.ndarray:
    """Planar DFT matrix (n, n, 2): W[j, k] = exp(sign*2j*pi*j*k/n)."""
    j, k = np.meshgrid(np.arange(n), np.arange(n), indexing="ij")
    w = sign * 2.0 * np.pi * j * k / n
    return np.stack([np.cos(w), np.sin(w)], axis=-1).astype(np.float32)


def dft(x, inverse: bool = False):
    """DFT along axis -2 of planar x (..., N, 2) as an MXU matmul.

    Matches np.fft.fft (no normalization; inverse carries 1/N).  For the
    GMR-1 FCCH lengths (117/468) and AMBE lengths (<=128) a dense DFT
    matmul is both simpler and faster on the MXU than any radix FFT.
    """
    n = x.shape[-2]
    sign = 1.0 if inverse else -1.0
    w = jnp.asarray(_dft_matrix(n, sign))
    xr, xi = x[..., 0], x[..., 1]
    wr, wi = w[..., 0], w[..., 1]
    yr = xr @ wr - xi @ wi
    yi = xr @ wi + xi @ wr
    y = jnp.stack([yr, yi], axis=-1)
    if inverse:
        y = y / n
    return y
