#!/usr/bin/env python3
"""FACCH3 generator-matrix probe (reference src/gmr1_gen_mat.c).

Derives the code's generator matrix G and offset g by encoding unit
vectors — a linearity self-check of the encode chain — and writes
mat_G.pbm / mat_g.pbm images.
"""

import sys

sys.path.insert(0, __file__.rsplit("/", 2)[0])

import numpy as np


def nonstatus_bits(ebits: np.ndarray) -> np.ndarray:
    """(416,) burst bits -> (384,) dropping the 8 status bits at 22..29
    of each 104-bit burst (gmr1_gen_mat.c copy_bits)."""
    e = ebits.reshape(4, 104)
    return np.concatenate([e[:, :22], e[:, 30:]], axis=1).reshape(-1)


def pbm_save(filename: str, m: np.ndarray) -> None:
    with open(filename, "w") as fh:
        fh.write(f"P1\n{m.shape[1]} {m.shape[0]}\n")
        for row in m:
            fh.write(" ".join(str(int(v)) for v in row) + "\n")


def main() -> int:
    from gmr1_tpu.l1 import facch3
    from gmr1_tpu.ops import bits as B

    zeros_s = np.zeros(32, np.uint8)

    def enc(l2_bytes):
        return nonstatus_bits(np.asarray(
            facch3.encode(l2_bytes, zeros_s)).astype(np.uint8))

    g = enc(np.zeros(10, np.uint8))                    # offset vector
    G = np.zeros((384, 76), np.uint8)
    for i in range(76):
        u = np.zeros(76, np.uint8)
        u[i] = 1
        l2 = np.asarray(B.pack_bits(u, 10)).astype(np.uint8)
        G[:, i] = enc(l2) ^ g

    pbm_save("mat_G.pbm", G)
    pbm_save("mat_g.pbm", g[:, None])
    print("wrote mat_G.pbm (384x76), mat_g.pbm (384x1)")
    return 0


if __name__ == "__main__":
    sys.exit(main())
