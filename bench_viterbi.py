"""Viterbi decode throughput: bursts/s per trellis family (BASELINE.md).

Measures the three trellis classes the L1 stack exercises, each through
its REAL channel-coder decode chain (descramble -> deinterleave ->
depuncture -> Viterbi -> CRC/demux), batched the way the transponder
pipeline batches them (one burst per carrier per frame):

  K=5  r=1/2 flush, 208 steps  -> BCCH    (conv.c:138, bcch.c:84)
  K=7  r=1/2 tail-biting, 48   -> TCH3    (conv.c:564, tch3.c:125)
  K=9  r=1/3 tail-biting, 208  -> xCH/DC12 (conv.c:335, xch_dc12.c:87)

K steps stream through one compiled lax.scan per code; inputs are real
encoded bursts (each decode is asserted bit-exact at the end), and the
final readback is the completion fence (single host RTT).

Usage: python bench_viterbi.py [--batch 1024] [--k 8] [--iters 4] [--json]
"""

from __future__ import annotations

import argparse
import json
import os
import time

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR",
                      "/root/.cache/jax-gmr1-bench")

import numpy as np


def main(argv=None) -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=2048,
                    help="bursts per step (~two full transponder frames)")
    ap.add_argument("--k", type=int, default=32, help="scan steps per launch")
    ap.add_argument("--iters", type=int, default=2)
    args = ap.parse_args(argv)

    import jax
    import jax.numpy as jnp
    jax.config.update("jax_compilation_cache_dir",
                      os.environ["JAX_COMPILATION_CACHE_DIR"])

    from gmr1_tpu.l1 import bcch, tch3, xch_dc12

    rng = np.random.default_rng(3)
    b, k = args.batch, args.k

    def sbits(hard):
        """Hard ebits -> saturated soft bits (the demod's clean output)."""
        return np.where(np.asarray(hard) > 0, -127, 127).astype(np.int8)

    cases = {}

    # --- BCCH: K=5 r=1/2 flush, 208 trellis steps ----------------------
    l2 = rng.integers(0, 256, (b, 24), dtype=np.uint8)
    eb = sbits(bcch.encode(l2))

    def run_bcch(bank):
        def step(c, e):
            l2d, bad, metric = bcch.decode(e)
            return c + jnp.sum(bad), (l2d[0], jnp.sum(metric))
        nbad, (l2s, m) = jax.lax.scan(step, jnp.int32(0), bank)
        return nbad, l2s, jnp.sum(m)

    cases["viterbi_k5_bcch"] = (run_bcch, eb, l2, 208)

    # --- TCH3: K=7 r=1/2 tail-biting, 48 steps (x2 frames/burst) -------
    f0 = rng.integers(0, 256, (b, 10), dtype=np.uint8)
    f1 = rng.integers(0, 256, (b, 10), dtype=np.uint8)
    eb3 = sbits(tch3.encode(f0, f1, np.zeros((b, 4), np.uint8)))

    def run_tch3(bank):
        def step(c, e):
            d0, d1, _s, metric = tch3.decode(e)   # no CRC on TCH3
            return c, (d0[0], d1[0], jnp.sum(metric))
        _, (d0s, d1s, m) = jax.lax.scan(step, jnp.int32(0), bank)
        return jnp.int32(0), (d0s, d1s), jnp.sum(m)

    cases["viterbi_k7tb_tch3"] = (run_tch3, eb3, (f0[0], f1[0]), 96)

    # --- xCH/DC12: K=9 r=1/3 tail-biting, 208 steps ---------------------
    l2x = rng.integers(0, 256, (b, 24), dtype=np.uint8)
    ebx = sbits(xch_dc12.encode(l2x))

    def run_x(bank):
        def step(c, e):
            l2d, bad, metric = xch_dc12.decode(e)
            return c + jnp.sum(bad), (l2d[0], jnp.sum(metric))
        nbad, (l2s, m) = jax.lax.scan(step, jnp.int32(0), bank)
        return nbad, l2s, jnp.sum(m)

    cases["viterbi_k9tb_xch_dc12"] = (run_x, ebx, l2x, 208)

    out = []
    for name, (fn, eb_np, expect, steps) in cases.items():
        jfn = jax.jit(fn)
        bank = jnp.asarray(np.broadcast_to(eb_np, (k, *eb_np.shape)))
        nbad, got, _ = jfn(bank)               # warmup/compile + check
        assert int(np.asarray(nbad)) == 0, name
        if name == "viterbi_k7tb_tch3":
            np.testing.assert_array_equal(np.asarray(got[0][0]), expect[0])
            np.testing.assert_array_equal(np.asarray(got[1][0]), expect[1])
        else:
            np.testing.assert_array_equal(np.asarray(got[0]), expect[0])

        t0 = time.perf_counter()
        res = [jfn(bank) for _ in range(args.iters)]
        tot = sum(int(np.asarray(r[0])) for r in res)   # fence
        dt = time.perf_counter() - t0
        assert tot == 0
        bursts = b * k * args.iters
        out.append({
            "metric": name,
            "value": round(bursts / dt),
            "unit": "bursts/s",
            "batch": b,
            "trellis_steps": steps,
            "msteps_per_s": round(bursts * steps / dt / 1e6, 1),
        })

    for o in out:
        print(json.dumps(o))


if __name__ == "__main__":
    main()
