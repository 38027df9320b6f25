"""Mixed full-transponder benchmark: the BASELINE.md workload.

BASELINE's north star is "decode every BCCH+TCH3 carrier of a full
30 MHz Thuraya transponder capture in real time"; bench_transponder.py
measures the BCCH-only approximation.  This bench runs the REAL mixed
per-carrier workload on every carrier of the 34 MHz grid, every TDMA
frame:

  per step (F=8 frames = one application block, one compiled
  lax.scan over K steps) — the SAME per-block device graph the
  WidebandReceiver dispatches (rx/wideband.py _phase_ctrl/_phase_tch3/
  _phase_tch9, windows included):
    PFB analysis (Pallas slab path) of the whole band
    per carrier:
      BCCH   the sirfn%8==2 frame, search win 20*sps: demod +
             Viterbi + CRC16                             (bcch.c:84)
      CCCH   the six sirfn%8 not-in {0,2} frames, win 10*sps: DC6
             demod + decode + CRC16                      (gmr1_rx.c:800)
      TCH3   speech slot, every frame: window energy, DKAB demod,
             FACCH/speech burst-type detect, NT3-speech demod,
             TCH3 decode (K=7 tail-biting)               (gmr1_rx.c:531)
      FACCH3 second TCH3 slot, every frame: NT3-FACCH demod; the two
             4-burst groups decode each step (K=5 r=1/4 + CRC16)
      TCH9   NT9 slot, every frame: demod + 9k6 decode with the
             depth-3 inter-burst deinterleaver chained across frames
             AND scan steps                              (tch9.c:109)

  Seeded carriers carry real modulated bursts for every channel and
  are asserted bit-exact inside the scan (steady-state from step 1 for
  the TCH9 chain); the other ~1080 carriers run on noise at identical
  cost.

This is deliberately the fixed-schedule device pipeline (the
StreamingTransponder form): the per-carrier FSMs are host-side control
that executes between blocks and does not gate device throughput.

Prints one JSON line.  Usage: python bench_mixed.py [--k 8] [--iters 4]
"""

from __future__ import annotations

import argparse
import json
import os
import time

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR",
                      "/root/.cache/jax-gmr1-bench")

import numpy as np

FRAME_OUT = 936 * 4
WIN = 20 * 4              # BCCH search window (the app's, wideband.py)
WINC = 10 * 4             # CCCH search window (the app's)
W3 = 6                    # TCH slot search window (sps + sps//2)
TN_S, TN_F, TN9 = 6, 9, 12
CCCH_FRAMES = (1, 3, 4, 5, 6, 7)   # sirfn%8 not in {0, 2}
DKP = 9
F = 8                     # TDMA frames per step = one app block
SEED_STEP = 131


def synth_carrier(rng, truth, fs):
    """One seed carrier's 4-sps baseband for F frames, then -> fs."""
    from gmr1_tpu.channelizer.arfcn import BASE_SYMRATE
    from gmr1_tpu.l1 import bcch, ccch, facch3, tch3, tch9
    from gmr1_tpu.ops import cplx
    from gmr1_tpu.sdr import bursts as BU
    from gmr1_tpu.sdr import modem

    n4 = F * FRAME_OUT
    s4 = np.zeros(n4, np.complex64)

    def rc(t, beta=0.35):
        den = 1.0 - (2.0 * beta * t) ** 2
        safe = np.where(np.abs(den) < 1e-8, 1.0, den)
        out = np.sinc(t) * np.cos(np.pi * beta * t) / safe
        return np.where(np.abs(den) < 1e-8, np.sinc(t) * np.pi / 4, out)

    def place(f, slot, x1):
        xc = cplx.to_complex(np.asarray(x1))
        nsym = len(xc)
        t = (np.arange(nsym * 4)[:, None]) / 4.0 - np.arange(nsym)[None, :]
        sig = rc(t).astype(np.float32) @ xc
        pos = f * FRAME_OUT + slot * 39 * 4
        s4[pos:pos + nsym * 4] += sig

    place(2, 0, modem.mod(BU.BCCH, bcch.encode(truth["bcch"][None]))[0])
    for j, f in enumerate(CCCH_FRAMES):
        place(f, 0, modem.mod(
            BU.DC6, ccch.encode(truth["ccch"][j][None]))[0])
    for f in range(F):
        e = tch3.encode(truth["sf0"][f], truth["sf1"][f],
                        np.zeros(4, np.uint8))
        place(f, TN_S, modem.mod(BU.NT3_SPEECH, np.asarray(e)[None])[0])
    fe = np.asarray(facch3.encode(truth["facch"],
                                  np.zeros(32, np.uint8))).reshape(4, 104)
    for f in range(F):
        place(f, TN_F, modem.mod(BU.NT3_FACCH, fe[f % 4][None],
                                 sync_id=0)[0])
    il = tch9.interleaver_init(dtype=np.uint8)
    # two encoder passes so the ring is in the same steady state the
    # scan sees when the same block repeats every step
    for _ in range(2):
        ebs = []
        for f in range(F):
            il, eb = tch9.encode(truth["csd"][f], tch9.MODE_9K6,
                                 np.zeros(10, np.uint8),
                                 np.zeros(4, np.uint8), il)
            ebs.append(np.asarray(eb))
    for f in range(F):
        place(f, TN9, modem.mod(BU.NT9, ebs[f][None], sync_id=1)[0])

    # 4*23400 -> fs by linear interp (4x oversampled; images far out)
    n = int(round(n4 * fs / (BASE_SYMRATE * 4)))
    pos = np.arange(n) * (BASE_SYMRATE * 4) / fs
    grid = np.arange(n4, dtype=np.float64)
    return (np.interp(pos, grid, s4.real)
            + 1j * np.interp(pos, grid, s4.imag)).astype(np.complex64)


def main(argv=None) -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--fs", type=float, default=34e6)
    ap.add_argument("--k", type=int, default=4, help="scan steps per launch")
    ap.add_argument("--iters", type=int, default=4)
    ap.add_argument("--json", action="store_true")
    args = ap.parse_args(argv)

    import jax
    import jax.numpy as jnp
    jax.config.update("jax_compilation_cache_dir",
                      os.environ["JAX_COMPILATION_CACHE_DIR"])
    if os.environ.get("GMR1_BENCH_CPU"):
        # the container sitecustomize imports jax (and may claim the
        # chip) before env vars are honored — force via live config
        jax.config.update("jax_platforms", "cpu")

    from gmr1_tpu.channelizer import Channel, Channelizer
    from gmr1_tpu.channelizer.arfcn import BASE_SYMRATE
    from gmr1_tpu.l1 import bcch, ccch, facch3, tch3, tch9
    from gmr1_tpu.ops import cplx
    from gmr1_tpu.rx.wideband import _bt_from_demods
    from gmr1_tpu.sdr import bursts as BU
    from gmr1_tpu.sdr import dkab, modem

    fs = args.fs
    assert (fs / 31250.0) == int(fs / 31250.0)
    center_arfcn = 512
    center = 1525e6 + 31250 * center_arfcn
    chz = Channelizer(fs, center, sps=4)
    assert chz.pre_resamp is None and chz.rotation == 0.0
    m, hop = chz.n_chans, chz.analyzer.hop
    n_step = int(round(F * FRAME_OUT * fs / (BASE_SYMRATE * 4)))
    assert n_step % hop == 0
    rng = np.random.default_rng(11)

    # --- seed carriers -------------------------------------------------
    span = m // 2 - 8
    offs = list(range(-span + 5, span - 5, SEED_STEP))
    arfcns = [center_arfcn + o for o in offs]
    truths = []
    wb = np.zeros(n_step, np.complex64)
    t = np.arange(n_step) / fs
    for a in arfcns:
        tr = dict(
            bcch=rng.integers(0, 256, 24, dtype=np.uint8),
            ccch=rng.integers(0, 256, (len(CCCH_FRAMES), 24),
                              dtype=np.uint8),
            sf0=rng.integers(0, 256, (F, 10), dtype=np.uint8),
            sf1=rng.integers(0, 256, (F, 10), dtype=np.uint8),
            facch=rng.integers(0, 256, 10, dtype=np.uint8),
            csd=rng.integers(0, 256, (F, 60), dtype=np.uint8))
        tr["facch"][9] &= 0xF0
        truths.append(tr)
        df = Channel(a).frequency - center
        wb += synth_carrier(rng, tr, fs) \
            * np.exp(2j * np.pi * df * t).astype(np.complex64)
    wb_planar = np.stack([wb.real, wb.imag], -1).astype(np.float32)

    # --- calibrate pipeline delay through analysis + RRC ----------------
    # the burst sits at 2 frames + the (small) analysis/RRC delay, so a
    # 256-sample search suffices (a frames-wide window makes the demod's
    # one-hot alignment matmul large enough to upset the TPU compiler)
    bank = chz.process(wb_planar)
    stream = np.asarray(chz.extract(bank, Channel(arfcns[0])))
    blen = BU.BCCH.len_syms * 4
    cal = stream[2 * FRAME_OUT:2 * FRAME_OUT + blen + 256]
    r = modem.demod(BU.BCCH, cal, sps=4, win=256)
    l2d, bad, _ = bcch.decode(r.ebits)
    assert not int(np.asarray(bad)), "calibration decode failed"
    p0 = int(round(float(np.asarray(r.toa))))
    assert p0 > 16, p0
    seed_idx = np.asarray([chz.freq2index(Channel(a).frequency)
                           for a in arfcns])

    # --- static window geometry (packed-bank form) ----------------------
    rrc = chz._rrc_resampler(1)
    r_cnt = n_step // hop
    halo = chz.analyzer.p * m

    def geoms(slot, blen_syms, w, frames):
        out = []
        for f in frames:
            pos = p0 + f * FRAME_OUT + slot * 39 * 4 - (w >> 1)
            k_min, wmat = rrc.window_matrix(pos, blen_syms * 4 + w)
            assert k_min + wmat.shape[1] <= r_cnt
            out.append((k_min, jnp.asarray(wmat)))
        return out
    g_bcch = geoms(0, BU.BCCH.len_syms, WIN, [2])
    g_ccch = geoms(0, BU.DC6.len_syms, WINC, CCCH_FRAMES)
    g_s = geoms(TN_S, BU.NT3_SPEECH.len_syms, W3, range(F))
    g_f = geoms(TN_F, BU.NT3_FACCH.len_syms, W3, range(F))
    g_9 = geoms(TN9, BU.NT9.len_syms, W3, range(F))

    def windows(c2, gs):
        """Packed bank (R, 2M) -> planar windows (len(gs), M, n, 2)."""
        outs = []
        for (k_min, wmat) in gs:
            xw = jax.lax.slice_in_dim(c2, k_min, k_min + wmat.shape[1],
                                      axis=0)
            outs.append(wmat @ xw)                     # (n, 2M)
        wp = jnp.stack(outs, axis=0)                   # (Fg, n, 2M)
        wt = jnp.swapaxes(wp, -1, -2)                  # (Fg, 2M, n)
        return jnp.stack([wt[:, :m], wt[:, m:]], axis=-1)

    # --- expected values (steady state; device constants) ---------------
    exp_bcch = jnp.asarray(np.stack([tr["bcch"] for tr in truths]))
    exp_ccch = jnp.asarray(np.stack([tr["ccch"] for tr in truths],
                                    axis=1))          # (NC, S, 24)
    exp_sf0 = jnp.asarray(np.stack([tr["sf0"] for tr in truths], axis=1))
    exp_sf1 = jnp.asarray(np.stack([tr["sf1"] for tr in truths], axis=1))
    exp_facch = jnp.asarray(np.stack([tr["facch"] for tr in truths]))
    # depth-3 chain: burst at frame f decodes payload (f-2) mod F of the
    # repeating block (steady state after the first step)
    exp_csd = jnp.asarray(np.stack(
        [np.stack([tr["csd"][(f - 2) % F] for f in range(F)])
         for tr in truths], axis=1))                   # (F, S, 60)
    seed_j = jnp.asarray(seed_idx)

    from gmr1_tpu.channelizer.pfb import _analyze_slab_packed
    from gmr1_tpu.ops.pallas_pfb import to_slab

    interp = bool(os.environ.get("GMR1_BENCH_CPU"))

    def block_packed(z):
        return _analyze_slab_packed(z, chz.analyzer.wa, m, chz.analyzer.p,
                                    hop, r_cnt, interpret=interp,
                                    dft_bf16=not interp)

    @jax.jit
    def make_bank(x_clean, seed):
        keys = jax.random.split(jax.random.PRNGKey(seed), args.k)
        def mk(key):
            x = x_clean + 0.01 * jax.random.normal(key, x_clean.shape,
                                                   jnp.float32)
            xp = jnp.concatenate(
                [jnp.zeros((halo, 2), jnp.float32), x], axis=0)
            return to_slab(xp, chz.analyzer.p, hop, r_cnt)
        return jax.lax.map(mk, keys)

    @jax.jit
    def run(noise_bank, il0):
        def step(carry, z):
            il, first, n_bad = carry
            c2 = block_packed(z)

            # BCCH (the sirfn%8==2 frame, app window)
            wb_ = windows(c2, g_bcch)[0]
            rb = modem.demod(BU.BCCH, wb_, sps=4, win=WIN)
            l2b, crcb, _ = bcch.decode(rb.ebits)
            n_bad += jnp.sum(crcb[seed_j])
            n_bad += jnp.sum(l2b[seed_j] != exp_bcch)

            # CCCH (the six sirfn%8 not-in {0,2} frames, app window)
            wc_ = windows(c2, g_ccch)                  # (NC, M, n, 2)
            rc = modem.demod(BU.DC6, wc_, sps=4, win=WINC)
            l2c, crcc, _ = ccch.decode(rc.ebits)
            n_bad += jnp.sum(crcc[:, seed_j])
            n_bad += jnp.sum(l2c[:, seed_j] != exp_ccch)

            # TCH3 speech slot: energy + DKAB + detect + demod + decode
            # (burst-type detect reuses the demod correlations — the
            # same scores modem.detect computes, rx/wideband.py)
            ws = windows(c2, g_s)                      # (F, M, n, 2)
            _e = jnp.sum(cplx.abs2(ws), axis=-2)
            rd = dkab.demod(ws, 4, DKP)
            rf_s = modem.demod(BU.NT3_FACCH, ws, sps=4, win=W3)
            rs = modem.demod(BU.NT3_SPEECH, ws, sps=4, win=W3)
            bt = _bt_from_demods(rf_s, rs, float(W3 >> 1))
            f0, f1, _sb, _mt = tch3.decode(rs.ebits)
            n_bad += jnp.sum(bt[:, seed_j] != 1)
            n_bad += jnp.sum(f0[:, seed_j] != exp_sf0)
            n_bad += jnp.sum(f1[:, seed_j] != exp_sf1)
            n_bad += jnp.sum(rd.found[:, seed_j])      # speech != DKAB

            # FACCH3 slot: demod every frame, two 4-burst group
            # decodes per 8-frame block
            wf = windows(c2, g_f)
            rf = modem.demod(BU.NT3_FACCH, wf, sps=4, win=W3)
            grp = jnp.moveaxis(rf.ebits.reshape(2, 4, m, 104),
                               2, 0).reshape(m, 2, 4 * 104)
            l2f, _sb2, badf, _mf = facch3.decode(grp)
            n_bad += jnp.sum(badf[seed_j])
            n_bad += jnp.sum(l2f[seed_j] != exp_facch[:, None])

            # TCH9: demod + chained 9k6 decode (one batched Viterbi
            # over all F frames; only the deinterleaver ring scans)
            w9 = windows(c2, g_9)
            r9 = modem.demod(BU.NT9, w9, sps=4, win=W3)
            il, l2_t9, _sa, _st, _met = tch9.decode_frames(
                r9.ebits, tch9.MODE_9K6, il)
            ok = jnp.where(first, 0,
                           jnp.sum(l2_t9[:, seed_j] != exp_csd))
            n_bad += ok
            return (il, jnp.zeros((), jnp.bool_), n_bad), None

        (il, _f, n_bad), _ = jax.lax.scan(
            step, (il0, jnp.ones((), jnp.bool_), jnp.int32(0)), noise_bank)
        return n_bad, il

    il0 = jax.vmap(lambda _: tch9.interleaver_init())(jnp.arange(m))
    x_dev = jnp.asarray(wb_planar)
    n_banks = min(args.iters, 3)
    banks = [make_bank(x_dev, i) for i in range(n_banks + 1)]
    n_bad, il = run(banks[0], il0)                 # warmup/compile
    assert int(np.asarray(n_bad)) == 0, \
        f"seeded carriers failed: {int(np.asarray(n_bad))}"

    t0 = time.perf_counter()
    outs = [run(banks[1 + (i % n_banks)], il0)[0] for i in range(args.iters)]
    tot = sum(int(np.asarray(b)) for b in outs)
    dt = time.perf_counter() - t0
    assert tot == 0

    samples = n_step * args.k * args.iters
    msps = samples / dt / 1e6
    print(json.dumps({
        "metric": "transponder_rx_mixed_throughput",
        "value": round(msps, 3),
        "unit": "Msamples/s wideband",
        "n_carriers": m,
        "workload": "app block graph: BCCH(1/8,win80) + CCCH(6/8,win40)"
                    " + TCH3(speech+DKAB+detect) + FACCH3 + TCH9/9k6"
                    " per carrier",
        "bursts_per_s": round((7 / 8 + 3) * F * m * args.k
                              * args.iters / dt),
        "vs_realtime": round(msps / 34.0, 2),
    }))


if __name__ == "__main__":
    main()
