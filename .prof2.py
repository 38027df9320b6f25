import time, numpy as np, jax, jax.numpy as jnp, os
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/.cache/jax-gmr1-bench")
jax.config.update("jax_compilation_cache_dir", os.environ["JAX_COMPILATION_CACHE_DIR"])
from gmr1_tpu.l1 import bcch
from gmr1_tpu.sdr import bursts, modem
sps, win, batch = 4, 20, 512
L = bursts.BCCH.len_syms * sps + win
rng = np.random.default_rng(0)
x = jnp.asarray(rng.standard_normal((batch, L, 2)).astype(np.float32))

@jax.jit
def step(x):
    r = modem.demod(bursts.BCCH, x, sps=sps, win=win)
    return bcch.decode(r.ebits)

out = step(x); jax.block_until_ready(out)
# async-queued timing
t0=time.perf_counter()
for _ in range(30): out = step(x)
jax.block_until_ready(out)
ta=(time.perf_counter()-t0)/30*1000
# sync-each timing
t0=time.perf_counter()
for _ in range(10): out = step(x); jax.block_until_ready(out)
ts=(time.perf_counter()-t0)/10*1000
print(f"fused step: queued {ta:.2f} ms/iter, sync-each {ts:.2f} ms/iter -> queued {batch*L/ta/1e3:.0f} Msps")
