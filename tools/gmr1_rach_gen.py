#!/usr/bin/env python3
"""RACH burst generator (reference src/gmr1_rach_gen.c).

    python tools/gmr1_rach_gen.py out.cfile SB_MASK PAYLOAD_36HEX

Encodes an 18-byte RACH payload, modulates the RACH burst at 1 sps and
dumps it as a .cfile.
"""

import sys

sys.path.insert(0, __file__.rsplit("/", 2)[0])

import numpy as np


def main() -> int:
    if len(sys.argv) != 4:
        print(f"Usage: {sys.argv[0]} out.cfile sb_mask payload",
              file=sys.stderr)
        return 1
    filename = sys.argv[1]
    sb_mask = int(sys.argv[2], 0)
    payload = bytes.fromhex(sys.argv[3])
    if len(payload) != 18:
        print("Invalid payload string", file=sys.stderr)
        return 1

    from gmr1_tpu.l1 import rach
    from gmr1_tpu.rx import cfile
    from gmr1_tpu.sdr import bursts as BU
    from gmr1_tpu.sdr import modem

    ebits = rach.encode(np.frombuffer(payload, np.uint8), sb_mask)
    burst = modem.mod(BU.RACH, np.asarray(ebits))
    cfile.save(filename, np.asarray(burst))
    return 0


if __name__ == "__main__":
    sys.exit(main())
