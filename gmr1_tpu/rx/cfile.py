"""Capture-file IO (replaces libosmodsp cfile_load, SURVEY.md §2.6).

A .cfile is raw interleaved complex64 (float32 re, im) — exactly the
framework's planar layout, so loading is a zero-copy mmap viewed as
(N, 2) float32.  Burst windows are then numpy slices of the map; only
the slices actually demodulated are ever transferred to the device.
"""

from __future__ import annotations

import numpy as np


class ArrayStream:
    """CFile-compatible view over an in-memory planar (N, 2) stream —
    lets the Receiver run over channelizer output without a file."""

    def __init__(self, data: np.ndarray):
        self.data = np.asarray(data, np.float32)
        assert self.data.ndim == 2 and self.data.shape[1] == 2

    def __len__(self) -> int:
        return self.data.shape[0]

    def window(self, begin: int, length: int) -> np.ndarray:
        """Planar slice [begin, begin+length), or None if out of range."""
        if begin < 0 or begin + length > len(self):
            return None
        return self.data[begin:begin + length]


class CFile(ArrayStream):
    """mmap'd capture: planar float32 (n_samples, 2) view."""

    def __init__(self, path: str):
        self.path = path
        raw = np.memmap(path, dtype=np.float32, mode="r")
        if raw.size % 2:
            raw = raw[:-1]
        self.data = raw.reshape(-1, 2)


def load(path: str) -> CFile:
    return CFile(path)


def save(path: str, planar: np.ndarray) -> None:
    """Write planar (..., 2) float32 as a .cfile (osmo_cxvec_dbg_dump
    equivalent, used by the RACH generator tool)."""
    np.asarray(planar, np.float32).tofile(path)
