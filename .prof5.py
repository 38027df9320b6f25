import time, numpy as np, jax, jax.numpy as jnp, os
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/.cache/jax-gmr1-bench")
jax.config.update("jax_compilation_cache_dir", os.environ["JAX_COMPILATION_CACHE_DIR"])
from gmr1_tpu.l1 import bcch
from gmr1_tpu.sdr import bursts, modem
sps, win, batch = 4, 20, 512
length = bursts.BCCH.len_syms * sps + win
rng = np.random.default_rng(0)
xs = [jnp.asarray(rng.standard_normal((batch, length, 2)).astype(np.float32)) for _ in range(20)]
jax.block_until_ready(xs)
@jax.jit
def step(x):
    r = modem.demod(bursts.BCCH, x, sps=sps, win=win)
    l2, bad, m = bcch.decode(r.ebits)
    return jnp.sum(l2.astype(jnp.int32)), jnp.sum(bad), jnp.sum(m)
out = step(xs[0]); print("warm", [np.asarray(o) for o in out])
t0=time.perf_counter()
acc = 0
for x in xs:
    s, b, m = step(x)
    acc += int(np.asarray(s))   # host readback forces completion
dt=(time.perf_counter()-t0)/len(xs)*1000
print(f"with host readback: {dt:.3f} ms/iter = {batch*length/dt/1e3:.0f} Msps (acc={acc})")
t0=time.perf_counter()
outs=[step(x) for x in xs]
tot = sum(int(np.asarray(o[0])) for o in outs)
dt=(time.perf_counter()-t0)/len(xs)*1000
print(f"queued then readback: {dt:.3f} ms/iter (tot={tot})")
