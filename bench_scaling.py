"""Multi-chip weak-scaling measurement of the streaming pipeline.

BASELINE.md's north star includes ">80% scaling efficiency at N>=2".
Real multi-chip hardware is not available in this environment (one
tunneled chip), so this measures the SPMD program itself on the virtual
CPU mesh: weak scaling 1 -> 2 -> 4 -> 8 devices of the full
StreamingTransponder step (PFB analysis + ppermute halo + all_to_all
reshard + carrier-parallel BCCH/TCH3/DKAB/TCH9 demod/decode with
carried state).

Per-device work is constant by construction: each device owns a fixed
n_local time block (2 TDMA frames of wideband input); the carrier axis
splits M ways across D devices while the frame axis grows D ways, so
demod/decode FLOPs per device stay constant and only the collectives
(halo ppermute + bank all_to_all) grow with D.

Honest-efficiency note: the host has C physical cores (C=2 here), so D
virtual devices TIMESHARE C cores and raw T(1)/T(D) undercounts badly
for D > C.  Two numbers are reported:

  eff_raw(D)   = T(1) / T(D)                      (ideal on D real chips)
  eff_cores(D) = T(1) * D / (T(D) * min(D, C))    (normalized to the
                 physically available concurrency; this is the number
                 comparable to a real pod's weak-scaling efficiency)

plus the analytically known ICI bytes/step of the program
(StreamingTransponder.ici_bytes_per_step).

Writes SCALING_rNN.json-style output to stdout (one JSON line last).

Usage: python bench_scaling.py [--steps 4] [--fper 2]
"""

from __future__ import annotations

import argparse
import json
import os
import time


def main(argv=None) -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--steps", type=int, default=4,
                    help="timed steps per device count")
    ap.add_argument("--fper", type=int, default=2,
                    help="TDMA frames per device per step")
    args = ap.parse_args(argv)

    os.environ["JAX_PLATFORMS"] = "cpu"
    os.environ.setdefault("JAX_COMPILATION_CACHE_DIR",
                          "/root/.cache/jax-gmr1-tests")
    xla_flags = os.environ.get("XLA_FLAGS", "")
    if "xla_force_host_platform_device_count" not in xla_flags:
        os.environ["XLA_FLAGS"] = (
            xla_flags + " --xla_force_host_platform_device_count=8").strip()

    import jax
    jax.config.update("jax_platforms", "cpu")
    jax.config.update("jax_compilation_cache_dir",
                      os.environ["JAX_COMPILATION_CACHE_DIR"])
    import numpy as np
    from jax.sharding import Mesh

    from gmr1_tpu.channelizer import Channelizer
    from gmr1_tpu.parallel.transponder import StreamingTransponder

    assert jax.devices()[0].platform == "cpu"
    n_cores = os.cpu_count() or 1
    rng = np.random.default_rng(0x5CA1)

    chz = Channelizer(1e6, 1525e6 + 31250 * 512, sps=4)
    results = {}
    for d in (1, 2, 4, 8):
        mesh = Mesh(np.asarray(jax.devices()[:d]), ("dev",))
        st = StreamingTransponder(chz, mesh, frames=args.fper * d,
                                  burst_pos=60, tn_tch=6, tn_tch9=12,
                                  bcch_frame=min(2, args.fper * d - 1))
        x = rng.standard_normal(
            (d * st.n_local, 2)).astype(np.float32) * 1e-3
        xs = st.shard_input(x)
        carry = st.carry_init()
        # two warmups: the first compiles for the host-replicated initial
        # carry, the second for the steady-state device-sharded carry
        out, carry = st.step(xs, carry)
        jax.block_until_ready(out)
        out, carry = st.step(xs, carry)
        jax.block_until_ready(out)
        times = []
        for _ in range(args.steps):
            t0 = time.perf_counter()
            out, carry = st.step(xs, carry)
            jax.block_until_ready(out)
            times.append(time.perf_counter() - t0)
        results[d] = dict(
            t_step=float(np.median(times)),
            samples_per_step=int(d * st.n_local),
            ici_bytes_per_step=int(st.ici_bytes_per_step))
        print(f"D={d}: t={results[d]['t_step']:.3f}s "
              f"({min(times):.3f}..{max(times):.3f}) "
              f"ici={st.ici_bytes_per_step / 1e6:.2f} MB/step", flush=True)

    t1 = results[1]["t_step"]
    for d, r in results.items():
        r["eff_raw"] = round(t1 / r["t_step"], 4)
        r["eff_cores"] = round(t1 * d / (r["t_step"] * min(d, n_cores)), 4)

    print(json.dumps({
        "metric": "multichip_weak_scaling",
        "workload": "StreamingTransponder step "
                    f"({args.fper} frames/device, M={chz.n_chans} carriers)",
        "n_cores_physical": n_cores,
        "per_device": results,
        "eff_cores_at_2": results[2]["eff_cores"],
        "eff_cores_at_8": results[8]["eff_cores"],
        "note": "virtual CPU mesh; eff_cores normalizes D virtual devices "
                "timesharing the physical cores (see module doc)",
    }))


if __name__ == "__main__":
    main()
