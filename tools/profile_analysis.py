"""Micro-profile of _analyze_block internals on the real chip."""

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
    from gmr1_tpu.channelizer.pfb import _dft_mat
    from gmr1_tpu.ops import cplx

    fs = 34e6
    chz = Channelizer(fs, 1525e6 + 31250 * 512, sps=4)
    m, hop, p = chz.n_chans, chz.analyzer.hop, chz.analyzer.p
    h_poly = chz.analyzer.h_poly
    n_step = 2_720_256 - 2_720_256 % hop
    k = 32
    r_cnt = n_step // hop
    print(f"M={m} hop={hop} P={p} R={r_cnt} k={k}")

    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.normal(size=(n_step + p * m, 2)).astype(np.float32))
    v_pre = jnp.asarray(rng.normal(size=(r_cnt, m, 2)).astype(np.float32))

    def timeit(name, fn, *args):
        run = jax.jit(fn)
        float(np.asarray(run(*args)))
        t0 = time.perf_counter()
        iters = 6
        for _ in range(iters):
            out = run(*args)
        float(np.asarray(out))
        dt = (time.perf_counter() - t0) / iters
        print(f"{name:20s} {dt*1e3:8.1f} ms/launch")
        return dt

    n_rows_win = p * m // hop

    def window_build(x):
        def step(c, i):
            x2 = x * (1.0 + 1e-9 * i)
            xs = x2[1:1 + (r_cnt + n_rows_win - 1) * hop]
            rows = xs.reshape(-1, hop, 2)
            win = jnp.stack([rows[i:i + r_cnt] for i in range(n_rows_win)],
                            axis=1)
            flat = win.reshape(r_cnt, p * m, 2)
            g = flat[:, ::-1].reshape(r_cnt, p, m, 2)
            return c + jnp.sum(g), 0.0
        acc, _ = jax.lax.scan(step, jnp.float32(0), jnp.arange(k, dtype=jnp.float32))
        return acc

    def branch_dot(x):
        def step(c, i):
            x2 = x * (1.0 + 1e-9 * i)
            xs = x2[1:1 + (r_cnt + n_rows_win - 1) * hop]
            rows = xs.reshape(-1, hop, 2)
            win = jnp.stack([rows[i:i + r_cnt] for i in range(n_rows_win)],
                            axis=1)
            flat = win.reshape(r_cnt, p * m, 2)
            g = flat[:, ::-1].reshape(r_cnt, p, m, 2)
            v = jnp.einsum("rpmc,mp->rmc", g, h_poly)
            return c + jnp.sum(v), 0.0
        acc, _ = jax.lax.scan(step, jnp.float32(0), jnp.arange(k, dtype=jnp.float32))
        return acc

    w = jnp.asarray(_dft_mat(m))

    def dft_only(v):
        def step(c, i):
            y = cplx.matmul(v * (1.0 + 1e-9 * i), w)
            return c + jnp.sum(y), 0.0
        acc, _ = jax.lax.scan(step, jnp.float32(0), jnp.arange(k, dtype=jnp.float32))
        return acc

    def dft_bf16(v):
        wb = w.astype(jnp.bfloat16)
        def step(c, i):
            y = cplx.matmul((v * (1.0 + 1e-9 * i)).astype(jnp.bfloat16), wb)
            return c + jnp.sum(y.astype(jnp.float32)), 0.0
        acc, _ = jax.lax.scan(step, jnp.float32(0), jnp.arange(k, dtype=jnp.float32))
        return acc

    timeit("window_build", window_build, x)
    timeit("window+branch_dot", branch_dot, x)
    timeit("dft_matmul_f32", dft_only, v_pre)
    timeit("dft_matmul_bf16", dft_bf16, v_pre)


if __name__ == "__main__":
    main()
