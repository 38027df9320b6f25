"""ctypes bindings for the C++ runtime components (see src/).

Builds libgmr1_native.so on first import if a compiler is available;
every entry point has a pure-Python fallback so the framework works
without the native lib (`AVAILABLE` tells you which path is active).
"""

from __future__ import annotations

import ctypes
import os
import subprocess

import numpy as np

_DIR = os.path.dirname(os.path.abspath(__file__))
_SO = os.path.join(_DIR, "libgmr1_native.so")

_lib = None


def _load():
    global _lib
    if _lib is not None:
        return _lib
    if not os.path.exists(_SO) or (
            os.path.getmtime(_SO)
            < os.path.getmtime(os.path.join(_DIR, "src/gmr1_native.cpp"))):
        try:
            subprocess.run(["make", "-C", _DIR, "-s"], check=True,
                           capture_output=True)
        except (OSError, subprocess.CalledProcessError):
            return None
    try:
        lib = ctypes.CDLL(_SO)
    except OSError:
        return None
    lib.gmr1_a5_keystream.argtypes = [
        ctypes.c_char_p, ctypes.c_uint32, ctypes.c_int,
        ctypes.c_void_p, ctypes.c_void_p]
    lib.gmr1_a5_keystream_batch.argtypes = [
        ctypes.c_char_p, ctypes.c_void_p, ctypes.c_int, ctypes.c_int,
        ctypes.c_void_p]
    lib.gmr1_gsmtap_open.argtypes = [ctypes.c_char_p, ctypes.c_int]
    lib.gmr1_gsmtap_open.restype = ctypes.c_int
    lib.gmr1_gsmtap_send.argtypes = [
        ctypes.c_int, ctypes.c_uint8, ctypes.c_uint32, ctypes.c_uint8,
        ctypes.c_char_p, ctypes.c_int]
    lib.gmr1_gsmtap_send.restype = ctypes.c_int
    lib.gmr1_gsmtap_close.argtypes = [ctypes.c_int]
    lib.gmr1_burst_energy.argtypes = [ctypes.c_void_p, ctypes.c_long]
    lib.gmr1_burst_energy.restype = ctypes.c_float
    _lib = lib
    return lib


AVAILABLE = _load() is not None


def a5_keystream(key, fn: int, nbits: int):
    """A5/1 (dl, ul) keystreams; native C++ when available."""
    lib = _load()
    if lib is None:
        from ..ops.a5 import keystream_np
        return keystream_np(key, fn, nbits)
    key = bytes(bytearray(np.asarray(key, np.uint8)))
    dl = np.empty(nbits, np.uint8)
    ul = np.empty(nbits, np.uint8)
    lib.gmr1_a5_keystream(key, fn & 0xFFFFFFFF, nbits,
                          dl.ctypes.data_as(ctypes.c_void_p),
                          ul.ctypes.data_as(ctypes.c_void_p))
    return dl, ul


def a5_keystream_batch(key, fns, nbits: int) -> np.ndarray:
    """Downlink keystreams for many frame numbers: (len(fns), nbits)."""
    lib = _load()
    fns = np.asarray(fns, np.uint32)
    if lib is None:
        from ..ops.a5 import keystream_np
        return np.stack([keystream_np(key, int(f), nbits)[0] for f in fns])
    key = bytes(bytearray(np.asarray(key, np.uint8)))
    out = np.empty((len(fns), nbits), np.uint8)
    lib.gmr1_a5_keystream_batch(key, fns.ctypes.data_as(ctypes.c_void_p),
                                len(fns), nbits,
                                out.ctypes.data_as(ctypes.c_void_p))
    return out


def burst_energy(win: np.ndarray) -> float:
    """Mean |x|^2 excluding borders over planar (N, 2) float32."""
    lib = _load()
    win = np.ascontiguousarray(win, np.float32)
    if lib is None:
        n = win.shape[0]
        b = n >> 5
        return float(np.sum(win[b:n - b].astype(np.float64) ** 2) / n)
    return float(lib.gmr1_burst_energy(
        win.ctypes.data_as(ctypes.c_void_p), win.shape[0]))


class NativeGsmtap:
    """UDP GSMTap emitter backed by the C++ sender."""

    def __init__(self, host: str = "127.0.0.1", port: int = 4729):
        lib = _load()
        if lib is None:
            raise RuntimeError("native lib unavailable")
        self.lib = lib
        self.fd = lib.gmr1_gsmtap_open(host.encode(), port)
        if self.fd < 0:
            raise OSError("gsmtap socket failed")

    def send(self, chan_type: int, fn: int, tn: int, l2: bytes) -> None:
        self.lib.gmr1_gsmtap_send(self.fd, chan_type & 0xFF,
                                  fn & 0xFFFFFFFF, tn & 0xFF,
                                  bytes(l2), len(l2))

    def close(self) -> None:
        self.lib.gmr1_gsmtap_close(self.fd)
