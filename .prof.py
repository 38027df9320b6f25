import time, numpy as np, jax, jax.numpy as jnp, os
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/.cache/jax-gmr1-bench")
jax.config.update("jax_compilation_cache_dir", os.environ["JAX_COMPILATION_CACHE_DIR"])
from gmr1_tpu.l1 import bcch
from gmr1_tpu.ops import cplx
from gmr1_tpu.sdr import bursts, modem

sps, win, batch = 4, 20, 512
L = bursts.BCCH.len_syms * sps + win
rng = np.random.default_rng(0)
l2 = jnp.asarray(rng.integers(0, 256, size=(batch, 24), dtype=np.uint8))
noise = jnp.asarray(rng.standard_normal((batch, L, 2)).astype(np.float32) * 0.05)

@jax.jit
def prep(l2, noise):
    x1 = modem.mod(bursts.BCCH, bcch.encode(l2))
    up = jnp.zeros((batch, L, 2), jnp.float32)
    return up.at[:, 8:8 + x1.shape[1]*4:4].set(x1) + noise
x = prep(l2, noise)

demod = jax.jit(lambda x: modem.demod(bursts.BCCH, x, sps=sps, win=win))
r = demod(x); jax.block_until_ready(r)
dec = jax.jit(lambda e: bcch.decode(e))
d = dec(r.ebits); jax.block_until_ready(d)

def timeit(f, a, iters=30):
    out = f(a); jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(iters): out = f(a)
    jax.block_until_ready(out)
    return (time.perf_counter()-t0)/iters*1000

td = timeit(demod, x)
tv = timeit(dec, r.ebits)
print(f"demod: {td:.2f} ms  decode(viterbi): {tv:.2f} ms  per burst: {td/batch*1000:.1f}/{tv/batch*1000:.1f} us")
samples = batch * L
print(f"demod-only throughput: {samples/td/1e3:.1f} Msps; full: {samples/(td+tv)/1e3:.1f} Msps")
