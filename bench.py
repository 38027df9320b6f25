"""Headline benchmark: full-transponder sustained receive throughput.

Runs the north-star configuration from BASELINE.md — channelize the
entire 34 MHz L-band ARFCN grid (1088 carriers) and run the BCCH
receive pipeline (PFB analysis -> burst-window RRC -> pi4-CQPSK demod
-> descramble/deinterleave -> Viterbi -> CRC16) on EVERY carrier every
TDMA frame, with seeded carriers asserting CRC-clean decode.

vs_baseline is the real-time ratio: the reference (osmo-gmr) is an
offline single-threaded C decoder; decoding the full transponder in
real time (34 Msamples/s of wideband input) is the implicit contract
its GNURadio front-end + process-per-carrier deployment aims at
(BASELINE.md "North-star targets").  vs_baseline = sustained wideband
Msamples/s / 34.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.
Details (bursts/s, carrier count) via `python bench_transponder.py`.
"""

from __future__ import annotations

import contextlib
import io
import json


def main() -> None:
    import bench_transponder

    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        bench_transponder.main([])
    inner = json.loads(buf.getvalue().strip().splitlines()[-1])
    print(json.dumps({
        "metric": "transponder_rx_throughput",
        "value": inner["value"],
        "unit": inner["unit"],
        "vs_baseline": inner["vs_realtime"],
    }))


if __name__ == "__main__":
    main()
