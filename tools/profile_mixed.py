"""Stage-attribution profile of the MIXED full-transponder workload.

Mirrors bench_mixed exactly and times cumulative prefixes of the step
(analysis -> windows -> BCCH -> TCH3 demods -> TCH3/FACCH3 decodes ->
NT9 demod -> TCH9 decode chain) so per-stage cost falls out by
subtraction.  Run on the real chip:  python tools/profile_mixed.py
"""

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

    import bench_mixed as bm
    from gmr1_tpu.channelizer import Channel, Channelizer
    from gmr1_tpu.channelizer.arfcn import BASE_SYMRATE
    from gmr1_tpu.l1 import bcch, facch3, tch3, tch9
    from gmr1_tpu.ops import cplx
    from gmr1_tpu.ops.pallas_pfb import to_slab
    from gmr1_tpu.rx.wideband import _bt_from_demods
    from gmr1_tpu.sdr import bursts as BU
    from gmr1_tpu.sdr import dkab, modem

    F, W3, WIN = bm.F, bm.W3, bm.WIN
    FRAME_OUT = bm.FRAME_OUT
    fs, k, iters = 34e6, 8, 3
    chz = Channelizer(fs, 1525e6 + 31250 * 512, sps=4)
    m, hop = chz.n_chans, chz.analyzer.hop
    n_step = int(round(F * FRAME_OUT * fs / (BASE_SYMRATE * 4)))
    r_cnt = n_step // hop
    halo = chz.analyzer.p * m
    rng = np.random.default_rng(5)
    p0 = 36     # nominal pipeline delay; exactness is irrelevant here

    rrc = chz._rrc_resampler(1)

    def geoms(slot, blen_syms, w, frames):
        out = []
        for f in frames:
            pos = p0 + f * FRAME_OUT + slot * 39 * 4 - (w >> 1)
            k_min, wmat = rrc.window_matrix(pos, blen_syms * 4 + w)
            out.append((k_min, jnp.asarray(wmat)))
        return out

    g_bcch = geoms(0, BU.BCCH.len_syms, WIN, [2])
    g_s = geoms(bm.TN_S, BU.NT3_SPEECH.len_syms, W3, range(F))
    g_f = geoms(bm.TN_F, BU.NT3_FACCH.len_syms, W3, range(F))
    g_9 = geoms(bm.TN9, BU.NT9.len_syms, W3, range(F))

    def windows(c2, gs):
        outs = []
        for (k_min, wmat) in gs:
            xw = jax.lax.slice_in_dim(c2, k_min, k_min + wmat.shape[1],
                                      axis=0)
            outs.append(wmat @ xw)
        wp = jnp.stack(outs, axis=0)
        wt = jnp.swapaxes(wp, -1, -2)
        return jnp.stack([wt[:, :m], wt[:, m:]], axis=-1)

    def make_step(level: int):
        def step(il, z):
            acc = jnp.float32(0)
            c2 = chz.analyzer.block_packed(z, r_cnt)
            acc += jnp.sum(c2[:8])
            if level >= 1:
                wb_ = windows(c2, g_bcch)[0]
                ws = windows(c2, g_s)
                wf = windows(c2, g_f)
                w9 = windows(c2, g_9)
                acc += (jnp.sum(wb_[:, :2]) + jnp.sum(ws[:, :, :2])
                        + jnp.sum(wf[:, :, :2]) + jnp.sum(w9[:, :, :2]))
            def use(*ts):
                # DCE-proof: consume every output in full
                return sum(jnp.sum(jnp.abs(t.astype(jnp.float32)))
                           for t in ts)

            if level >= 2:
                rb = modem.demod(BU.BCCH, wb_, sps=4, win=WIN)
                l2b, crcb, _ = bcch.decode(rb.ebits)
                acc += use(rb.ebits, l2b, crcb)
            if level >= 3:
                rd = dkab.demod(ws, 4, bm.DKP)
                rf_s = modem.demod(BU.NT3_FACCH, ws, sps=4, win=W3)
                rs = modem.demod(BU.NT3_SPEECH, ws, sps=4, win=W3)
                bt = _bt_from_demods(rf_s, rs, float(W3 >> 1))
                rf = modem.demod(BU.NT3_FACCH, wf, sps=4, win=W3)
                acc += use(bt, rd.found, rd.ebits, rf_s.ebits, rs.ebits,
                           rf.ebits)
            if level >= 4:
                f0, f1, _sb, _mt = tch3.decode(rs.ebits)
                grp = jnp.moveaxis(rf.ebits, 0, 1).reshape(m, 4 * 104)
                l2f, _sb2, badf, _mf = facch3.decode(grp)
                acc += use(f0, f1, l2f, badf)
            if level >= 5:
                r9 = modem.demod(BU.NT9, w9, sps=4, win=W3)
                acc += use(r9.ebits, r9.sync_id)
            if level >= 6:
                il, l2_t9, _sa, _st, _met = tch9.decode_frames(
                    r9.ebits, tch9.MODE_9K6, il)
                acc += use(l2_t9)
            return il, acc

        @jax.jit
        def run(bank, il0):
            il, accs = jax.lax.scan(step, il0, bank)
            return jnp.sum(accs)
        return run

    x = (rng.standard_normal((n_step, 2)) * 0.01).astype(np.float32)

    @jax.jit
    def make_bank(x_clean, seed):
        keys = jax.random.split(jax.random.PRNGKey(seed), k)
        def mk(key):
            xx = x_clean + 0.01 * jax.random.normal(key, x_clean.shape,
                                                    jnp.float32)
            xp = jnp.concatenate(
                [jnp.zeros((halo, 2), jnp.float32), xx], axis=0)
            return to_slab(xp, chz.analyzer.p, hop, r_cnt)
        return jax.lax.map(mk, keys)

    bank = make_bank(jnp.asarray(x), 0)
    il0 = jax.vmap(lambda _: tch9.interleaver_init())(jnp.arange(m))

    names = ["analysis", "+windows", "+bcch", "+tch3 demods",
             "+tch3/facch3 decode", "+nt9 demod", "+tch9 decode"]
    prev = 0.0
    for level, name in enumerate(names):
        run = make_step(level)
        out = run(bank, il0)
        jax.block_until_ready(out)
        t0 = time.perf_counter()
        outs = [run(bank, il0) for _ in range(iters)]
        jax.block_until_ready(outs)
        dt = (time.perf_counter() - t0) / iters / k * 1e3   # ms/step
        print(f"{name:22s} {dt:8.2f} ms/step  (+{dt - prev:6.2f})",
              flush=True)
        prev = dt


if __name__ == "__main__":
    main()
