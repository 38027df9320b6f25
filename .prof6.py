import time, numpy as np, jax, jax.numpy as jnp, os
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/.cache/jax-gmr1-bench")
jax.config.update("jax_compilation_cache_dir", os.environ["JAX_COMPILATION_CACHE_DIR"])
from gmr1_tpu.l1 import bcch
from gmr1_tpu.sdr import bursts, modem

@jax.jit
def trivial(x): return jnp.sum(x) + 1.0
z = jnp.ones((8, 128))
print("trivial warm", float(trivial(z)))
t0=time.perf_counter()
for _ in range(20): v = float(trivial(z))
print(f"trivial RTT: {(time.perf_counter()-t0)/20*1000:.2f} ms")

sps, win = 4, 20
length = bursts.BCCH.len_syms * sps + win
rng = np.random.default_rng(0)
for batch in (512, 2048, 8192):
    x = jnp.asarray(rng.standard_normal((batch, length, 2)).astype(np.float32))
    @jax.jit
    def step(x):
        r = modem.demod(bursts.BCCH, x, sps=sps, win=win)
        l2, bad, m = bcch.decode(r.ebits)
        return jnp.sum(l2.astype(jnp.int32)) + jnp.sum(bad)
    v = int(np.asarray(step(x)))
    iters = 8
    t0=time.perf_counter()
    for _ in range(iters): v = int(np.asarray(step(x)))
    dt=(time.perf_counter()-t0)/iters*1000
    print(f"batch {batch}: {dt:.1f} ms/iter = {batch*length/dt/1e3:.0f} Msps", flush=True)
