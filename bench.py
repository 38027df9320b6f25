"""Headline benchmark: batched BCCH receive pipeline throughput.

Runs the flagship step (pi4-CQPSK demod -> descramble/deinterleave ->
Viterbi K=5 -> CRC16) on the local accelerator over a large batch of
carrier burst windows and reports aggregate complex-sample throughput.

Baseline: the reference (osmo-gmr) is an offline single-threaded C
decoder whose implicit contract is ONE carrier in real time — 93,600
complex samples/s at the typical 4 sps (BASELINE.md).  vs_baseline is
therefore "how many real-time carriers one chip sustains".

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.
"""

from __future__ import annotations

import json
import os
import time

import numpy as np

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/.cache/jax-gmr1-bench")
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "0.5")


def main() -> None:
    import jax
    import jax.numpy as jnp

    jax.config.update("jax_compilation_cache_dir",
                      os.environ["JAX_COMPILATION_CACHE_DIR"])

    from gmr1_tpu.l1 import bcch
    from gmr1_tpu.ops import cplx
    from gmr1_tpu.sdr import bursts, modem

    sps, win, batch = 4, 20, 512
    length = bursts.BCCH.len_syms * sps + win

    # Real modulated bursts + noise so decode work is representative.
    # One jitted prep call (zero-stuff upsample keeps it cheap).
    rng = np.random.default_rng(0)
    l2 = jnp.asarray(rng.integers(0, 256, size=(batch, 24), dtype=np.uint8))
    noise = jnp.asarray(
        rng.standard_normal((batch, length, 2)).astype(np.float32) * 0.05)

    @jax.jit
    def prep(l2, noise):
        x1 = modem.mod(bursts.BCCH, bcch.encode(l2))  # (B, L, 2) at 1 sps
        up = jnp.zeros((batch, length, 2), jnp.float32)
        up = up.at[:, 8:8 + x1.shape[1] * sps:sps].set(x1)
        return up + noise

    x = prep(l2, noise)

    @jax.jit
    def step(x):
        r = modem.demod(bursts.BCCH, x, sps=sps, win=win)
        return bcch.decode(r.ebits)

    # warmup/compile
    out = step(x)
    jax.block_until_ready(out)
    assert not np.asarray(out[1]).any(), "CRC failures in bench data"

    iters = 30
    t0 = time.perf_counter()
    for _ in range(iters):
        out = step(x)
    jax.block_until_ready(out)
    dt = time.perf_counter() - t0

    samples = batch * length * iters
    msps = samples / dt / 1e6
    realtime_per_carrier = 93_600 / 1e6  # Msamples/s, 1 carrier at 4 sps
    print(json.dumps({
        "metric": "bcch_rx_throughput",
        "value": round(msps, 3),
        "unit": "Msamples/s",
        "vs_baseline": round(msps / realtime_per_carrier, 1),
    }))


if __name__ == "__main__":
    main()
