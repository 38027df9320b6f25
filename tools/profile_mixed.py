"""Stage-level timing of the bench_mixed workload on the live chip.

Times each stage of the mixed per-step workload in isolation (own jit,
realistic shapes) so the optimization target is obvious.
Not part of the bench contract; a scratch diagnostic.
"""
from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR",
                      "/root/.cache/jax-gmr1-bench")

import jax
import jax.numpy as jnp
import numpy as np

jax.config.update("jax_compilation_cache_dir",
                  os.environ["JAX_COMPILATION_CACHE_DIR"])

from gmr1_tpu.channelizer import Channelizer
from gmr1_tpu.channelizer.pfb import _analyze_slab_packed
from gmr1_tpu.ops.pallas_pfb import to_slab
from gmr1_tpu.ops import a5 as a5op
from gmr1_tpu.ops import cplx
from gmr1_tpu.sdr import bursts as BU
from gmr1_tpu.sdr import dkab, modem
from gmr1_tpu.l1 import bcch, facch3, facch9, tch3, tch9

FRAME_OUT = 936 * 4
F = 4
WIN, W3 = 16, 6
fs = 34e6
chz = Channelizer(fs, 1525e6 + 31250 * 512, sps=4)
m, hop = chz.n_chans, chz.analyzer.hop
n_step = int(round(F * FRAME_OUT * fs / (23400 * 4)))
r_cnt = n_step // hop
halo = chz.analyzer.p * m
rng = np.random.default_rng(0)

x = jnp.asarray(rng.standard_normal((n_step, 2)).astype(np.float32))
xp = jnp.concatenate([jnp.zeros((halo, 2), jnp.float32), x], axis=0)
slab = jax.jit(lambda z: to_slab(z, chz.analyzer.p, hop, r_cnt))(xp)
slab = jax.block_until_ready(slab)

pk = jax.jit(lambda z: _analyze_slab_packed(
    z, chz.analyzer.wa, m, chz.analyzer.p, hop, r_cnt, dft_bf16=True))
c2 = jax.block_until_ready(pk(slab))
print("bank", c2.shape)

rrc = chz._rrc_resampler(1)


def geoms(slot, blen_syms, w, frames):
    out = []
    for f in frames:
        pos = 300 + f * FRAME_OUT + slot * 39 * 4 - (w >> 1)
        k_min, wmat = rrc.window_matrix(pos, blen_syms * 4 + w)
        out.append((k_min, jnp.asarray(wmat)))
    return out


g_bcch = geoms(0, BU.BCCH.len_syms, WIN, [2])
g_s = geoms(6, BU.NT3_SPEECH.len_syms, W3, range(F))
g_f = geoms(9, BU.NT3_FACCH.len_syms, W3, range(F))
g_9 = geoms(12, BU.NT9.len_syms, W3, range(F))


def windows(c2, gs):
    outs = []
    for (k_min, wmat) in gs:
        xw = jax.lax.slice_in_dim(c2, k_min, k_min + wmat.shape[1], axis=0)
        outs.append(wmat @ xw)
    wp = jnp.stack(outs, axis=0)
    wt = jnp.swapaxes(wp, -1, -2)
    return jnp.stack([wt[:, :m], wt[:, m:]], axis=-1)


stage_ms = {}


def bench(name, fn, *args, iters=20):
    fn = jax.jit(fn)
    o = jax.block_until_ready(fn(*args))
    t0 = time.perf_counter()
    for _ in range(iters):
        o = fn(*args)
    jax.block_until_ready(o)
    dt = (time.perf_counter() - t0) / iters * 1e3
    stage_ms[name] = dt
    print(f"{name:28s} {dt:8.3f} ms")
    return dt


tot = 0.0
tot += bench("pfb_analysis", lambda z: _analyze_slab_packed(
    z, chz.analyzer.wa, m, chz.analyzer.p, hop, r_cnt, dft_bf16=True), slab)
tot += bench("windows(all)", lambda c: (windows(c, g_bcch), windows(c, g_s),
                                        windows(c, g_f), windows(c, g_9)), c2)

wb_ = jax.block_until_ready(jax.jit(lambda c: windows(c, g_bcch)[0])(c2))
ws = jax.block_until_ready(jax.jit(lambda c: windows(c, g_s))(c2))
wf = jax.block_until_ready(jax.jit(lambda c: windows(c, g_f))(c2))
w9 = jax.block_until_ready(jax.jit(lambda c: windows(c, g_9))(c2))
print("window shapes", wb_.shape, ws.shape, w9.shape)

tot += bench("demod BCCH (M)", lambda w: modem.demod(
    BU.BCCH, w, sps=4, win=WIN).ebits, wb_)
tot += bench("demod NT3_FACCH (F,M) x2", lambda w: (
    modem.demod(BU.NT3_FACCH, w, sps=4, win=W3).ebits,
    modem.demod(BU.NT3_FACCH, w, sps=4, win=W3).ebits), ws)
tot += bench("demod NT3_SPEECH (F,M)", lambda w: modem.demod(
    BU.NT3_SPEECH, w, sps=4, win=W3).ebits, ws)
tot += bench("dkab (F,M)", lambda w: dkab.demod(w, 4, 9).found, ws)
tot += bench("demod NT9 (F,M)", lambda w: modem.demod(
    BU.NT9, w, sps=4, win=W3).ebits, w9)

eb_b = jax.block_until_ready(jax.jit(lambda w: modem.demod(
    BU.BCCH, w, sps=4, win=WIN).ebits)(wb_))
eb_s = jax.block_until_ready(jax.jit(lambda w: modem.demod(
    BU.NT3_SPEECH, w, sps=4, win=W3).ebits)(ws))
eb_f = jax.block_until_ready(jax.jit(lambda w: modem.demod(
    BU.NT3_FACCH, w, sps=4, win=W3).ebits)(wf))
eb_9 = jax.block_until_ready(jax.jit(lambda w: modem.demod(
    BU.NT9, w, sps=4, win=W3).ebits)(w9))

tot += bench("bcch.decode (M)", lambda e: bcch.decode(e)[0], eb_b)
tot += bench("tch3.decode (F,M)", lambda e: tch3.decode(e)[0], eb_s)
tot += bench("facch3.decode (M grp)", lambda e: facch3.decode(
    jnp.moveaxis(e, 0, 1).reshape(m, 4 * 104))[0], eb_f)
il0 = jax.vmap(lambda _: tch9.interleaver_init())(jnp.arange(m))
tot += bench("tch9.decode_frames (F,M)", lambda e, i: tch9.decode_frames(
    e, tch9.MODE_9K6, i)[1], eb_9, il0)

# stages the r05 block phase added (in-graph A5 + speculative decodes)
key = jnp.zeros(8, jnp.uint8)
fns = jnp.arange(F * m, dtype=jnp.uint32)
tot += bench("a5 keystream 658 (F*M)", lambda f: a5op.keystream(
    key, f, 658)[0], fns)
tot += bench("a5 keystream 208 (F*M)", lambda f: a5op.keystream(
    key, f, 208)[0], fns)
ks658 = jax.block_until_ready(
    jax.jit(lambda f: a5op.keystream(key, f, 658)[0])(fns)
).reshape(F, m, 658)
tot += bench("facch9.decode (F,M)", lambda e, c: facch9.decode(e, c)[0],
             eb_9, ks658)

print(f"{'SUM of stages':28s} {tot:8.3f} ms")
budget = n_step / 34e6 * 1e3
print(f"step budget at RT: {budget:.1f} ms for {n_step} samples")

# ---- roofline attribution (VERDICT r04 #8) ---------------------------
# Where does the device time go, and is the dominant stage MXU- or
# HBM-bound?  FLOP/byte models for the two big dense stages; peaks are
# the public TPU v5e figures (197 bf16 TFLOP/s, 819 GB/s HBM).
PEAK_TF, PEAK_GBs = 197e12, 819e9
print("\n-- shares --")
for name, ms in sorted(stage_ms.items(), key=lambda kv: -kv[1]):
    print(f"{name:28s} {ms:8.3f} ms  {100 * ms / tot:5.1f}%")

# PFB analysis: polyphase filter (r_cnt x p x m complex MAC) + DFT as
# an m x m matmul per row (bf16)
fl_filter = r_cnt * chz.analyzer.p * m * 8
fl_dft = r_cnt * m * m * 8
t_pfb = stage_ms.get("pfb_analysis", 0.0) / 1e3
by_pfb = (r_cnt * chz.analyzer.p * m * 8      # slab read (f32 planar)
          + r_cnt * m * 8)                    # bank write
if t_pfb:
    print(f"\npfb_analysis: {(fl_filter + fl_dft) / t_pfb / 1e12:.1f} "
          f"TFLOP/s ({100 * (fl_filter + fl_dft) / t_pfb / PEAK_TF:.1f}% "
          f"MXU peak), {by_pfb / t_pfb / 1e9:.0f} GB/s "
          f"({100 * by_pfb / t_pfb / PEAK_GBs:.1f}% HBM peak)")
# RRC windows: per output sample a k_span-row window matmul
k_span = rrc.window_matrix(FRAME_OUT, FRAME_OUT)[1].shape[1]
t_win = stage_ms.get("windows(all)", 0.0) / 1e3
n_wins = m * (1 + 3 * F)                     # bcch + (s, f, 9) x F
n_out = (BU.BCCH.len_syms * 4 + WIN) + 3 * F * 0  # per-type lens differ;
# use the dominant NT9 length for the estimate
n_out = m * ((BU.BCCH.len_syms * 4 + WIN)
             + F * (2 * (BU.NT3_FACCH.len_syms * 4 + W3)
                    + (BU.NT9.len_syms * 4 + W3)))
fl_win = n_out * k_span * 8
if t_win:
    print(f"windows: {fl_win / t_win / 1e12:.1f} TFLOP/s "
          f"({100 * fl_win / t_win / PEAK_TF:.1f}% MXU peak)")
dom = max(stage_ms, key=stage_ms.get)
print(f"\ndominant stage: {dom} ({stage_ms[dom]:.2f} ms, "
      f"{100 * stage_ms[dom] / tot:.0f}% of device step)")
