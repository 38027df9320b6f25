"""Headline benchmark: full-transponder sustained receive throughput.

Runs the north-star configuration from BASELINE.md on the whole 34 MHz
L-band grid (1088 carriers), twice:

  mixed (the headline) — bench_mixed.py: the REAL per-carrier workload
      every TDMA frame: BCCH (1/8 frames) + the full TCH3 slot path
      (energy, DKAB, burst-type detect, speech demod + K=7 decode) +
      FACCH3 4-burst groups + TCH9 9k6 with the chained depth-3
      deinterleaver.  This is BASELINE.md's "decode every BCCH+TCH3
      carrier ... in real time" workload.
  bcch-only — bench_transponder.py: the round-1/2 headline (BCCH
      receive pipeline on every carrier every frame), kept for
      round-over-round comparability and gated against the previous
      round's BENCH_r*.json (fail-soft: reported, not asserted).

vs_baseline is the real-time ratio of the MIXED workload: the reference
(osmo-gmr) is an offline single-threaded C decoder; real time for the
full transponder is 34 Msamples/s of wideband input.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline", ...}.
"""

from __future__ import annotations

import contextlib
import glob
import io
import json
import re


def _run(mod_main) -> dict:
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        mod_main([])
    return json.loads(buf.getvalue().strip().splitlines()[-1])


def _last_round_bcch() -> float | None:
    best = None
    for path in glob.glob("BENCH_r*.json"):
        m = re.search(r"BENCH_r(\d+)\.json", path)
        if not m:
            continue
        try:
            with open(path) as f:
                d = json.load(f)
            parsed = d.get("parsed", {})
            if parsed.get("metric") in ("transponder_rx_throughput",):
                val = float(parsed["value"])
            elif "bcch_only_msps" in parsed:
                val = float(parsed["bcch_only_msps"])
            else:
                continue
            n = int(m.group(1))
            if best is None or n > best[0]:
                best = (n, val)
        except Exception:
            continue
    return best[1] if best else None


def main() -> None:
    import bench_mixed
    import bench_transponder

    mixed = _run(bench_mixed.main)
    bcch = _run(bench_transponder.main)

    out = {
        "metric": "transponder_rx_mixed_throughput",
        "value": mixed["value"],
        "unit": mixed["unit"],
        "vs_baseline": mixed["vs_realtime"],
        "bcch_only_msps": bcch["value"],
        "bcch_only_vs_baseline": bcch["vs_realtime"],
    }
    last = _last_round_bcch()
    if last:
        out["bcch_only_vs_last_round_pct"] = round(
            100.0 * (bcch["value"] - last) / last, 2)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
