"""ctypes binding for the reference SDR parity oracle.

Compiles the UNMODIFIED reference SDR layer
(/root/reference/src/sdr/{pi4cxpsk,fcch,nb,dkab}.c) against the minimal
libosmo-dsp/fftw3f shim in tests/oracle_sdr/ into a shared library, and
exposes the flat wrapper API (tests/oracle_sdr/wrapper.c) to Python.
This is the SDR-layer analogue of the compiled AMBE oracle in
tests/test_codec.py (SURVEY.md §4 strategy (3)).

All IQ buffers are float32 (n, 2) C-contiguous — the same memory layout
as the TPU build's planar complex arrays.
"""

from __future__ import annotations

import ctypes as ct
import os
import subprocess

import numpy as np

BUILD_DIR = "/tmp/gmr1_sdr_ref"
HERE = os.path.dirname(os.path.abspath(__file__))

# Reference quirk (pi4cxpsk.c:207 vs :232): the combined-correlation
# buffer in _gmr1_pi4cxpsk_sync_find is zeroed once OUTSIDE the
# sync-sequence loop, so each sync id's correlation accumulates on top
# of all previous ids' |corr| and the LAST sync id nearly always wins
# (its peak contains every id's energy).  The comment at :231 ("If not
# the first, then combine results") shows per-id reset was the intent.
# The TPU build implements the per-id reset (modem.py resets per sync
# id); the "fixed" oracle variant applies this one-line reset so the
# rest of the reference demod chain can be parity-tested strictly,
# while test_sync_find_accumulation_quirk pins the verbatim behavior.
_QUIRK_ORIG = "\t\tint tl = 0;\n"
_QUIRK_FIXED = ("\t\tint tl = 0;\n"
                "\t\tmemset(corr->data, 0x00, "
                "sizeof(float complex) * corr->max_len); "
                "/* per-sync-id reset (parity fix) */\n")


def build(reference_dir: str, fixed: bool = False) -> str:
    os.makedirs(BUILD_DIR, exist_ok=True)
    lib = os.path.join(
        BUILD_DIR, f"libgmr1_sdr_oracle{'_fixed' if fixed else ''}.so")
    srcs = [os.path.join(HERE, "oracle_sdr", f)
            for f in ("shim.c", "wrapper.c")]
    ref_srcs = [f"{reference_dir}/src/sdr/{f}" for f in
                ("pi4cxpsk.c", "fcch.c", "nb.c", "dkab.c")]
    newest_src = max(os.path.getmtime(s) for s in srcs + ref_srcs)
    if os.path.exists(lib) and os.path.getmtime(lib) >= newest_src:
        return lib
    if fixed:
        src = open(f"{reference_dir}/src/sdr/pi4cxpsk.c").read()
        assert src.count(_QUIRK_ORIG) == 1
        patched = os.path.join(BUILD_DIR, "pi4cxpsk_syncfix.c")
        with open(patched, "w") as f:
            f.write(src.replace(_QUIRK_ORIG, _QUIRK_FIXED))
        ref_srcs[0] = patched
    subprocess.run(
        ["gcc", "-O2", "-fPIC", "-shared",
         "-I", os.path.join(HERE, "oracle_sdr", "include"),
         "-I", f"{reference_dir}/include",
         *srcs, *ref_srcs, "-lm", "-o", lib],
        check=True)
    return lib


def _iq(x: np.ndarray) -> np.ndarray:
    """Planar (n, 2) float32 -> C-contiguous buffer for the oracle."""
    x = np.ascontiguousarray(np.asarray(x, np.float32))
    assert x.ndim == 2 and x.shape[1] == 2, x.shape
    return x


class SdrOracle:
    def __init__(self, reference_dir: str, fixed: bool = False):
        self.lib = ct.CDLL(build(reference_dir, fixed=fixed))
        f32p = ct.POINTER(ct.c_float)
        i8p = ct.POINTER(ct.c_int8)
        u8p = ct.POINTER(ct.c_uint8)
        ip = ct.POINTER(ct.c_int)
        fp = ct.POINTER(ct.c_float)
        L = self.lib
        L.oracle_burst_info.argtypes = [ct.c_char_p, ip, ip, ip, ip, ip]
        L.oracle_demod.argtypes = [ct.c_char_p, f32p, ct.c_int, ct.c_int,
                                   ct.c_float, i8p, ip, fp, fp]
        L.oracle_detect.argtypes = [ct.POINTER(ct.c_char_p), ct.c_int,
                                    ct.c_float, f32p, ct.c_int, ct.c_int,
                                    ct.c_float, ip, ip, fp]
        L.oracle_mod_order.argtypes = [f32p, ct.c_int, ct.c_int, ct.c_float]
        L.oracle_mod.argtypes = [ct.c_char_p, u8p, ct.c_int, f32p]
        for name in ("oracle_fcch_rough", "oracle_fcch_fine",
                     "oracle_fcch_snr"):
            getattr(L, name).argtypes = [
                ct.c_char_p, f32p, ct.c_int, ct.c_int, ct.c_float,
                fp if name == "oracle_fcch_snr" else ip] + (
                    [fp] if name == "oracle_fcch_fine" else [])
        L.oracle_fcch_rough_multi.argtypes = [ct.c_char_p, f32p, ct.c_int,
                                              ct.c_int, ct.c_float, ip,
                                              ct.c_int]
        L.oracle_dkab.argtypes = [f32p, ct.c_int, ct.c_int, ct.c_float,
                                  ct.c_int, i8p, fp]

    @staticmethod
    def _pf(x):
        return x.ctypes.data_as(ct.POINTER(ct.c_float))

    def burst_info(self, name: str):
        vals = [ct.c_int() for _ in range(5)]
        rv = self.lib.oracle_burst_info(name.encode(), *map(ct.byref, vals))
        assert rv == 0, name
        keys = ("len", "ebits", "nsync", "guard_pre", "guard_post")
        return dict(zip(keys, (v.value for v in vals)))

    def demod(self, name: str, iq, sps: int, freq_shift: float = 0.0):
        iq = _iq(iq)
        info = self.burst_info(name)
        ebits = np.zeros(info["ebits"], np.int8)
        sync_id = ct.c_int()
        toa = ct.c_float()
        freq_err = ct.c_float()
        rv = self.lib.oracle_demod(
            name.encode(), self._pf(iq), iq.shape[0], sps, freq_shift,
            ebits.ctypes.data_as(ct.POINTER(ct.c_int8)),
            ct.byref(sync_id), ct.byref(toa), ct.byref(freq_err))
        assert rv == 0, rv
        return ebits, sync_id.value, toa.value, freq_err.value

    def detect(self, names, e_toa: float, iq, sps: int,
               freq_shift: float = 0.0):
        iq = _iq(iq)
        arr = (ct.c_char_p * len(names))(*[n.encode() for n in names])
        bt_id = ct.c_int()
        sync_id = ct.c_int()
        toa = ct.c_float()
        rv = self.lib.oracle_detect(arr, len(names), e_toa, self._pf(iq),
                                    iq.shape[0], sps, freq_shift,
                                    ct.byref(bt_id), ct.byref(sync_id),
                                    ct.byref(toa))
        assert rv == 0, rv
        return bt_id.value, sync_id.value, toa.value

    def mod_order(self, iq, sps: int, freq_shift: float = 0.0) -> int:
        iq = _iq(iq)
        return self.lib.oracle_mod_order(self._pf(iq), iq.shape[0], sps,
                                         freq_shift)

    def mod(self, name: str, ebits: np.ndarray, sync_id: int = 0):
        info = self.burst_info(name)
        ebits = np.ascontiguousarray(ebits, np.uint8)
        assert ebits.shape == (info["ebits"],)
        out = np.zeros((info["len"], 2), np.float32)
        rv = self.lib.oracle_mod(
            name.encode(), ebits.ctypes.data_as(ct.POINTER(ct.c_uint8)),
            sync_id, self._pf(out))
        assert rv == info["len"], rv
        return out

    def fcch_rough(self, variant: str, iq, sps: int,
                   freq_shift: float = 0.0) -> int:
        iq = _iq(iq)
        toa = ct.c_int()
        rv = self.lib.oracle_fcch_rough(variant.encode(), self._pf(iq),
                                        iq.shape[0], sps, freq_shift,
                                        ct.byref(toa))
        assert rv == 0, rv
        return toa.value

    def fcch_rough_multi(self, variant: str, iq, sps: int,
                         freq_shift: float = 0.0, n: int = 16):
        iq = _iq(iq)
        toas = np.zeros(n, np.int32)
        rv = self.lib.oracle_fcch_rough_multi(
            variant.encode(), self._pf(iq), iq.shape[0], sps, freq_shift,
            toas.ctypes.data_as(ct.POINTER(ct.c_int)), n)
        assert rv >= 0, rv
        return list(toas[:rv])

    def fcch_fine(self, variant: str, iq, sps: int, freq_shift: float = 0.0):
        iq = _iq(iq)
        toa = ct.c_int()
        freq_err = ct.c_float()
        rv = self.lib.oracle_fcch_fine(variant.encode(), self._pf(iq),
                                       iq.shape[0], sps, freq_shift,
                                       ct.byref(toa), ct.byref(freq_err))
        assert rv == 0, rv
        return toa.value, freq_err.value

    def fcch_snr(self, variant: str, iq, sps: int,
                 freq_shift: float = 0.0) -> float:
        iq = _iq(iq)
        snr = ct.c_float()
        rv = self.lib.oracle_fcch_snr(variant.encode(), self._pf(iq),
                                      iq.shape[0], sps, freq_shift,
                                      ct.byref(snr))
        assert rv == 0, rv
        return snr.value

    def dkab(self, iq, sps: int, p: int, freq_shift: float = 0.0):
        iq = _iq(iq)
        ebits = np.zeros(8, np.int8)
        toa = ct.c_float()
        rv = self.lib.oracle_dkab(self._pf(iq), iq.shape[0], sps,
                                  freq_shift, p,
                                  ebits.ctypes.data_as(ct.POINTER(ct.c_int8)),
                                  ct.byref(toa))
        assert rv >= 0, rv
        return ebits, toa.value, rv == 0
