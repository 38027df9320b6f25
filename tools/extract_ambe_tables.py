#!/usr/bin/env python3
"""Extract the AMBE quantization tables from the reference C sources.

The AMBE VQ codebooks (reference src/codec/tables.c) and the synthesis
window / random-phase constants (src/codec/synth.c) are pure numeric
data dictated by the codec format — there is no way to "re-design"
them.  This tool parses them out of the reference tree and stores them
as gmr1_tpu/codec/_tables.npz, keeping the provenance explicit and the
framework source free of thousand-line constant dumps.

Usage: python tools/extract_ambe_tables.py [ref_dir] [out.npz]
"""

from __future__ import annotations

import re
import sys

import numpy as np

SPECS = {
    # name: (file, dtype, shape)
    "hpg": ("tables.c", np.int32, (48, 4)),
    "gain": ("tables.c", np.float32, (256, 2)),
    "v_uv": ("tables.c", np.int32, (64,)),
    "prba12": ("tables.c", np.float32, (128, 2)),
    "prba34": ("tables.c", np.float32, (64, 2)),
    "prba57": ("tables.c", np.float32, (128, 3)),
    "hoc0": ("tables.c", np.float32, (128, 4)),
    "hoc1": ("tables.c", np.float32, (64, 4)),
    "hoc2": ("tables.c", np.float32, (64, 4)),
    "hoc3": ("tables.c", np.float32, (64, 4)),
    "sf0_interp": ("tables.c", np.float32, (4,)),
    "sf0_perr14": ("tables.c", np.float32, (64, 4)),
    "sf0_perr58": ("tables.c", np.float32, (32, 4)),
    "ws": ("synth.c", np.float32, (121,)),
    "rho": ("synth.c", np.float32, (56,)),
}

C_NAME = {
    "hpg": "ambe_hpg_tbl", "gain": "ambe_gain_tbl", "v_uv": "ambe_v_uv_tbl",
    "prba12": "ambe_prba12_tbl", "prba34": "ambe_prba34_tbl",
    "prba57": "ambe_prba57_tbl", "hoc0": "ambe_hoc0_tbl",
    "hoc1": "ambe_hoc1_tbl", "hoc2": "ambe_hoc2_tbl", "hoc3": "ambe_hoc3_tbl",
    "sf0_interp": "ambe_sf0_interp_tbl", "sf0_perr14": "ambe_sf0_perr14_tbl",
    "sf0_perr58": "ambe_sf0_perr58_tbl", "ws": "ws", "rho": "rho",
}

NUM_RE = re.compile(r"[-+]?(?:0x[0-9a-fA-F]+|\d+\.?\d*(?:[eE][-+]?\d+)?)")


def extract(src: str, c_name: str) -> list[float]:
    m = re.search(rf"\b{re.escape(c_name)}\s*\[[^=]*=\s*\{{", src)
    if not m:
        raise KeyError(c_name)
    i, depth = m.end() - 1, 0
    for j in range(i, len(src)):
        if src[j] == "{":
            depth += 1
        elif src[j] == "}":
            depth -= 1
            if depth == 0:
                body = src[i + 1:j]
                break
    else:
        raise ValueError(f"unbalanced braces for {c_name}")
    body = re.sub(r"/\*.*?\*/", "", body, flags=re.S)
    vals = []
    for tok in NUM_RE.findall(body):
        vals.append(float(int(tok, 16)) if tok.startswith(("0x", "0X"))
                    else float(tok))
    return vals


def main() -> None:
    ref = sys.argv[1] if len(sys.argv) > 1 else "/root/reference"
    out = sys.argv[2] if len(sys.argv) > 2 else "gmr1_tpu/codec/_tables.npz"
    srcs = {f: open(f"{ref}/src/codec/{f}").read()
            for f in {"tables.c", "synth.c"}}
    arrays = {}
    for name, (fname, dtype, shape) in SPECS.items():
        vals = extract(srcs[fname], C_NAME[name])
        a = np.asarray(vals, dtype=np.float64).reshape(shape)
        arrays[name] = a.astype(dtype)
        print(f"{name:12s} {fname:10s} shape={shape} "
              f"[{a.min():+.4g}, {a.max():+.4g}]")
    np.savez_compressed(out, **arrays)
    print(f"wrote {out}")


if __name__ == "__main__":
    main()
