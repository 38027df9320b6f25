import time, numpy as np, jax, jax.numpy as jnp, os
t00=time.time()
def log(m): print(f"[{time.time()-t00:6.1f}s] {m}", flush=True)
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/.cache/jax-gmr1-bench")
jax.config.update("jax_compilation_cache_dir", os.environ["JAX_COMPILATION_CACHE_DIR"])
from gmr1_tpu.l1 import bcch
from gmr1_tpu.sdr import bursts, modem
log(f"imports done {jax.devices()}")
sps, win, batch = 4, 20, 512
length = bursts.BCCH.len_syms * sps + win
rng = np.random.default_rng(0)
l2 = jnp.asarray(rng.integers(0, 256, size=(batch, 24), dtype=np.uint8))
noise = jnp.asarray(rng.standard_normal((batch, length, 2)).astype(np.float32) * 0.05)
log("data up")
@jax.jit
def prep(l2, noise):
    x1 = modem.mod(bursts.BCCH, bcch.encode(l2))
    up = jnp.zeros((batch, length, 2), jnp.float32)
    up = up.at[:, 8:8 + x1.shape[1] * sps:sps].set(x1)
    return up + noise
x = prep(l2, noise); jax.block_until_ready(x)
log("prep done")
@jax.jit
def step(x):
    r = modem.demod(bursts.BCCH, x, sps=sps, win=win)
    return bcch.decode(r.ebits)
out = step(x); jax.block_until_ready(out)
log("warm")
for trial in range(3):
    t0 = time.perf_counter()
    for _ in range(30): out = step(x)
    jax.block_until_ready(out)
    dt = time.perf_counter()-t0
    log(f"trial {trial}: {dt/30*1000:.3f} ms/iter = {batch*length*30/dt/1e6:.0f} Msps")
