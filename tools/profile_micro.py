"""Micro-timings of the mixed-workload hot sub-ops. Scratch diagnostic."""
from __future__ import annotations

import os
import time

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR",
                      "/root/.cache/jax-gmr1-bench")

import jax
import jax.numpy as jnp
import numpy as np

jax.config.update("jax_compilation_cache_dir",
                  os.environ["JAX_COMPILATION_CACHE_DIR"])

from gmr1_tpu.ops import conv, interleave, viterbi
from gmr1_tpu.l1 import tch9

F, M = 4, 1088
rng = np.random.default_rng(0)


def bench(name, fn, *args, iters=30):
    fn = jax.jit(fn)
    o = jax.block_until_ready(fn(*args))
    t0 = time.perf_counter()
    for _ in range(iters):
        o = fn(*args)
    jax.block_until_ready(o)
    dt = (time.perf_counter() - t0) / iters * 1e3
    print(f"{name:36s} {dt:8.3f} ms")
    return dt


# tch9 9k6 parts
e = jnp.asarray(rng.integers(-127, 128, (F, M, 662)).astype(np.float32))
il0 = jax.vmap(lambda _: tch9.interleaver_init())(jnp.arange(M))
c648 = jnp.asarray(rng.integers(-127, 128, (F, M, 648)).astype(np.float32))
keep = tch9._keep_idx(tch9.MODE_9K6)
full = jax.block_until_ready(jax.jit(
    lambda c: viterbi.depuncture(c, keep, tch9.MODE_9K6.code.out_len(480)))(c648))

bench("tch9.decode_frames (all)",
      lambda e, i: tch9.decode_frames(e, tch9.MODE_9K6, i)[1], e, il0)
bench("  deinterleave_inter scan F",
      lambda i, x: jax.lax.scan(jax.vmap(interleave.deinterleave_inter),
                                i, x)[1], il0, c648)
bench("  deinterleave_intra", lambda x: interleave.deinterleave_intra(x, 81),
      c648)
bench("  depuncture (scatter)",
      lambda c: viterbi.depuncture(c, keep, tch9.MODE_9K6.code.out_len(480)),
      c648)
bench("  viterbi K5_12 T=480 B=4352",
      lambda f: viterbi.decode(tch9.MODE_9K6.code, f, 480)[0], full)

# small-trellis viterbi latencies at mixed-bench batch sizes
fb = jnp.asarray(rng.integers(
    -127, 128, (M, conv.K5_12.out_len(208))).astype(np.float32))
bench("viterbi K5_12 T=208 B=1088 (bcch)",
      lambda f: viterbi.decode(conv.K5_12, f, 208)[0], fb)
ft = jnp.asarray(rng.integers(
    -127, 128, (F, M, conv.TCH3_K7.out_len(48))).astype(np.float32))
bench("viterbi TCH3 K7 TB T=48 B=4352",
      lambda f: viterbi.decode(conv.TCH3_K7, f, 48)[0], ft)
ff = jnp.asarray(rng.integers(
    -127, 128, (M, conv.K5_14.out_len(92))).astype(np.float32))
bench("viterbi K5_14 T=92 B=1088 (facch3)",
      lambda f: viterbi.decode(conv.K5_14, f, 92)[0], ff)

# dkab parts
from gmr1_tpu.sdr import dkab
from gmr1_tpu.ops import cplx, dsp
ws = jnp.asarray(rng.standard_normal((F, M, 474, 2)).astype(np.float32))
bench("dkab.demod (all)", lambda w: dkab.demod(w, 4, 9).found, ws)
bench("  sig_normalize", lambda w: dsp.sig_normalize(
    w, 1, jnp.float32(-np.pi / 4) / 4), ws)
y = jax.block_until_ready(jax.jit(lambda w: dsp.sig_normalize(
    w, 1, jnp.float32(-np.pi / 4) / 4))(ws))
bench("  abs2+cumsum", lambda v: jnp.cumsum(cplx.abs2(v), axis=-1), y)
