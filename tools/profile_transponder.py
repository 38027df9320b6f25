"""Stage-attribution profile of the full-transponder pipeline.

Mirrors bench_transponder exactly (prebuilt slab noise bank, packed
fast path) and times cumulative prefixes of the step so per-stage cost
falls out by subtraction.  Run on the real chip.
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
    from gmr1_tpu.ops.pallas_pfb import to_slab
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
    r_cnt = n_step // hop
    rrc = chz._rrc_resampler(1)
    wlen = BU.BCCH.len_syms * 4 + WIN
    burst_pos = 400
    geoms = [rrc.window_matrix(burst_pos + f * FRAME_OUT, wlen)
             for f in range(frames)]

    rng = np.random.default_rng(0)
    x_np = rng.normal(size=(n_step, 2)).astype(np.float32)

    @jax.jit
    def make_bank(x_clean):
        keys = jax.random.split(jax.random.PRNGKey(0), k)
        def mk(key):
            x = x_clean + 0.01 * jax.random.normal(key, x_clean.shape,
                                                   jnp.float32)
            xp = jnp.concatenate(
                [jnp.zeros((halo, 2), jnp.float32), x], axis=0)
            return to_slab(xp, chz.analyzer.p, hop, r_cnt)
        return jax.lax.map(mk, keys)

    bank = make_bank(jnp.asarray(x_np))
    jax.block_until_ready(bank)

    def stage_fn(depth):
        def step(carry, z):
            if depth == 0:
                return carry + jnp.sum(z[0, 0]), 0.0
            c2 = chz.analyzer.block_packed(z, r_cnt)
            if depth == 1:
                return carry + jnp.sum(c2), 0.0
            wins = []
            for (k_min, wmat) in geoms:
                xw = jax.lax.slice_in_dim(c2, k_min,
                                          k_min + wmat.shape[1], axis=0)
                wins.append(jnp.asarray(wmat) @ xw)
            wp = jnp.stack(wins, axis=0)
            wt = jnp.swapaxes(wp, -1, -2)
            w = jnp.stack([wt[:, :m], wt[:, m:]], axis=-1)
            if depth == 2:
                return carry + jnp.sum(w), 0.0
            res = modem.demod(BU.BCCH, w, sps=4, win=WIN)
            if depth == 3:
                return carry + jnp.sum(
                    res.ebits.astype(jnp.float32)), 0.0
            l2d, crc_fail, metric = bcch.decode(res.ebits)
            return carry + jnp.sum(metric), 0.0

        @jax.jit
        def run(bank):
            acc, _ = jax.lax.scan(step, jnp.float32(0), bank)
            return acc
        return run

    names = ["bank_read", "+analysis", "+rrc_window", "+demod", "+decode"]
    times = []
    for d, name in enumerate(names):
        run = stage_fn(d)
        float(np.asarray(run(bank)))  # compile+warm
        iters = 8
        t0 = time.perf_counter()
        for _ in range(iters):
            float(np.asarray(run(bank)))
        dt = (time.perf_counter() - t0) / iters
        times.append(dt)
        msps = n_step * k / dt / 1e6
        extra = dt - times[d - 1] if d else dt
        print(f"{name:14s} {dt*1e3:8.1f} ms/launch  {msps:8.1f} Msps  "
              f"(stage +{extra*1e3:.1f} ms)")


if __name__ == "__main__":
    main()
