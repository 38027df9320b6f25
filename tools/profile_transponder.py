"""Stage-attribution profile of the full-transponder pipeline.

Times cumulative prefixes of the pipeline (noise -> PFB analysis ->
burst-window RRC -> demod -> decode) inside identical lax.scan
harnesses so the per-stage cost falls out by subtraction.  Run on the
real chip: python tools/profile_transponder.py
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR",
                      "/root/.cache/jax-gmr1-bench")

import numpy as np


def main() -> None:
    import jax
    import jax.numpy as jnp
    jax.config.update("jax_compilation_cache_dir",
                      os.environ["JAX_COMPILATION_CACHE_DIR"])

    from gmr1_tpu.channelizer import Channelizer
    from gmr1_tpu.channelizer.arfcn import BASE_SYMRATE
    from gmr1_tpu.l1 import bcch
    from gmr1_tpu.sdr import bursts as BU
    from gmr1_tpu.sdr import modem

    FRAME_OUT = 936 * 4
    WIN = 16
    fs, frames, k = 34e6, 2, 32
    chz = Channelizer(fs, 1525e6 + 31250 * 512, sps=4)
    m, hop = chz.n_chans, chz.analyzer.hop
    n_step = int(round(frames * FRAME_OUT * fs / (BASE_SYMRATE * 4)))
    n_step -= n_step % hop
    halo = chz.analyzer.p * m
    rrc = chz._rrc_resampler(1)
    wlen = BU.BCCH.len_syms * 4 + WIN
    burst_pos = 400
    geoms = [rrc.window_matrix(burst_pos + f * FRAME_OUT, wlen)
             for f in range(frames)]

    x_np = np.random.default_rng(0).normal(
        size=(n_step, 2)).astype(np.float32)

    def stage_fn(depth):
        def step(carry, key):
            x = x_np_dev + 0.01 * jax.random.normal(key, x_np_dev.shape,
                                                    jnp.float32)
            if depth == 0:
                return carry + jnp.sum(x[0]), 0.0
            xp = jnp.concatenate([jnp.zeros((halo, 2), jnp.float32), x], 0)
            bankd = chz.analyzer.block(xp)
            if depth == 1:
                return carry + jnp.sum(bankd[0, 0]), 0.0
            bank_c = jnp.moveaxis(bankd, 0, 1)
            wins = []
            for (k_min, wmat) in geoms:
                xw = jax.lax.slice_in_dim(bank_c, k_min,
                                          k_min + wmat.shape[1], axis=1)
                wins.append(jnp.einsum("ok,mkc->moc", jnp.asarray(wmat), xw))
            w = jnp.stack(wins, axis=0)
            if depth == 2:
                return carry + jnp.sum(w[0, 0, 0]), 0.0
            res = modem.demod(BU.BCCH, w, sps=4, win=WIN)
            if depth == 3:
                return carry + jnp.sum(res.ebits[0, 0]), 0.0
            l2d, crc_fail, metric = bcch.decode(res.ebits)
            return carry + jnp.sum(metric), 0.0

        @jax.jit
        def run(seed):
            keys = jax.random.split(jax.random.PRNGKey(seed), k)
            acc, _ = jax.lax.scan(step, jnp.float32(0), keys)
            return acc
        return run

    x_np_dev = jnp.asarray(x_np)
    names = ["noise", "+analysis", "+rrc_window", "+demod", "+decode"]
    times = []
    for d, name in enumerate(names):
        run = stage_fn(d)
        float(np.asarray(run(0)))  # compile+warm
        t0 = time.perf_counter()
        iters = 8
        for i in range(1, iters + 1):
            float(np.asarray(run(i)))
        dt = (time.perf_counter() - t0) / iters
        times.append(dt)
        msps = n_step * k / dt / 1e6
        extra = dt - times[d - 1] if d else dt
        print(f"{name:14s} {dt*1e3:8.1f} ms/launch  {msps:8.1f} Msps  "
              f"(stage +{extra*1e3:.1f} ms)")


if __name__ == "__main__":
    main()
