import time, numpy as np, jax, jax.numpy as jnp, os
t00=time.time()
def log(m): print(f"[{time.time()-t00:6.1f}s] {m}", flush=True)
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/.cache/jax-gmr1-bench")
jax.config.update("jax_compilation_cache_dir", os.environ["JAX_COMPILATION_CACHE_DIR"])
from gmr1_tpu.l1 import bcch
from gmr1_tpu.sdr import bursts, modem
sps, win, batch = 4, 20, 512
length = bursts.BCCH.len_syms * sps + win
rng = np.random.default_rng(0)
xs = [jnp.asarray(rng.standard_normal((batch, length, 2)).astype(np.float32)) for _ in range(30)]
jax.block_until_ready(xs)
@jax.jit
def step(x):
    r = modem.demod(bursts.BCCH, x, sps=sps, win=win)
    return bcch.decode(r.ebits)
out = step(xs[0]); jax.block_until_ready(out)
log("warm")
# distinct inputs, keep all outputs
t0=time.perf_counter()
outs = [step(x) for x in xs]
jax.block_until_ready(outs)
dt=(time.perf_counter()-t0)/30*1000
log(f"distinct inputs: {dt:.3f} ms/iter = {batch*length/dt/1e3:.0f} Msps")
# same input 30x
t0=time.perf_counter()
outs = [step(xs[0]) for _ in range(30)]
jax.block_until_ready(outs)
dt=(time.perf_counter()-t0)/30*1000
log(f"same input:      {dt:.3f} ms/iter")
