"""AMBE decoder CLI (reference src/gmr1_ambe_decode.c).

    python -m gmr1_tpu.codec [in_file [out_file]]

Reads a stream of 10-byte AMBE frames, writes 8 kHz s16le PCM; a .wav
output path gets a WAV header.  '-' = stdin/stdout.
"""

from __future__ import annotations

import struct
import sys

import numpy as np


def wav_header(n_samples: int) -> bytes:
    """8 kHz mono s16 WAV header (gmr1_ambe_decode.c:26-45)."""
    data = n_samples * 2
    return (b"RIFF" + struct.pack("<I", 36 + data) + b"WAVEfmt "
            + struct.pack("<IHHIIHH", 16, 1, 1, 8000, 16000, 2, 16)
            + b"data" + struct.pack("<I", data))


def main(argv=None) -> int:
    args = argv if argv is not None else sys.argv[1:]
    if len(args) > 2:
        print(f"Usage: python -m gmr1_tpu.codec [in_file [out_file]]",
              file=sys.stderr)
        return 1
    fin = sys.stdin.buffer if not args or args[0] == "-" else \
        open(args[0], "rb")
    is_wave = len(args) > 1 and args[1].endswith(".wav")
    fout = sys.stdout.buffer if len(args) < 2 or args[1] == "-" else \
        open(args[1], "wb")

    raw = fin.read()
    n = len(raw) // 10
    if not n:
        return 0
    frames = np.frombuffer(raw[:n * 10], np.uint8).reshape(n, 10)

    from . import decode_frames, init
    state = init(())
    _, pcm = decode_frames(state, frames)
    pcm = np.asarray(pcm, np.int16).reshape(-1)

    if is_wave:
        fout.write(wav_header(len(pcm)))
    fout.write(pcm.astype("<i2").tobytes())
    fout.flush()
    return 0


if __name__ == "__main__":
    sys.exit(main())
