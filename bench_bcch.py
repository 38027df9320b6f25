"""Headline benchmark: sustained BCCH receive-pipeline throughput.

Measures the flagship step (pi4-CQPSK demod -> descramble/deinterleave
-> Viterbi K=5 -> CRC16) over HBM-resident burst batches.  The work
loops K times inside ONE compiled graph (lax.scan) with fresh on-device
noise per step, and only a reduced metric is read back — so the number
reflects device compute, not the host link (on this rig the chip sits
behind a ~30 ms RTT tunnel; jax.block_until_ready does not track real
completion, host readback does).

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
    from gmr1_tpu.sdr import bursts, modem

    sps, win, batch, k_steps = 4, 20, 1024, 32
    length = bursts.BCCH.len_syms * sps + win

    # one batch of real modulated bursts, uploaded once
    rng = np.random.default_rng(0)
    l2 = jnp.asarray(rng.integers(0, 256, size=(batch, 24), dtype=np.uint8))

    @jax.jit
    def prep(l2):
        x1 = modem.mod(bursts.BCCH, bcch.encode(l2))
        up = jnp.zeros((batch, length, 2), jnp.float32)
        return up.at[:, 8:8 + x1.shape[1] * sps:sps].set(x1)

    x_clean = prep(l2)

    @jax.jit
    def run(x_clean, seed):
        def step(carry, key):
            noise = 0.05 * jax.random.normal(key, x_clean.shape,
                                             jnp.float32)
            r = modem.demod(bursts.BCCH, x_clean + noise, sps=sps, win=win)
            l2d, crc_fail, metric = bcch.decode(r.ebits)
            return carry + jnp.sum(crc_fail), jnp.sum(metric)
        keys = jax.random.split(jax.random.PRNGKey(seed), k_steps)
        n_bad, metrics = jax.lax.scan(step, jnp.int32(0), keys)
        return n_bad, jnp.sum(metrics)

    # warmup / compile; readback forces real completion
    n_bad, _ = run(x_clean, 0)
    assert int(np.asarray(n_bad)) == 0, "CRC failures in bench data"

    iters = 4
    t0 = time.perf_counter()
    tot = 0
    for i in range(1, iters + 1):
        n_bad, m = run(x_clean, i)
        tot += int(np.asarray(n_bad))   # host readback = completion fence
    dt = time.perf_counter() - t0
    assert tot == 0

    samples = batch * length * k_steps * iters
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
