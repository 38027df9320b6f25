"""Full-transponder sustained benchmark: one chip, every carrier.

Channelizes a 34 MHz synthetic Thuraya downlink (the whole L-band
ARFCN range, 1088 grid channels — BASELINE.md "full 30 MHz transponder")
and runs the BCCH receive pipeline on EVERY carrier every TDMA frame:

  PFB analysis (2x-oversampled, DFT-as-MXU-matmul)
    -> per-carrier windowed RRC resample to 4 sps (burst windows only)
    -> pi4-CQPSK demod -> descramble/deinterleave -> Viterbi -> CRC16

K air blocks stream through ONE compiled lax.scan with fresh on-device
wideband noise per step; only reduced metrics are read back (host
readback is the completion fence — the chip sits behind a ~30 ms RTT
tunnel, so per-iteration block_until_ready would measure the link).

A handful of carriers are seeded with real modulated BCCH bursts and
must decode CRC-clean every frame (alignment is self-calibrated through
the full pipeline at setup); the other ~1080 carriers carry noise but
cost exactly the same compute, so throughput is honest.

North star (BASELINE.md): real time for the full transponder is
34 Msamples/s of wideband input.  vs_realtime reports that ratio.

Usage: python bench_transponder.py [--fs 34e6] [--json]
"""

from __future__ import annotations

import argparse
import json
import os
import time

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR",
                      "/root/.cache/jax-gmr1-bench")

import numpy as np


FRAME_OUT = 936 * 4          # TDMA frame length in 4-sps output samples
B0 = 400                     # burst start offset inside a frame (out samples)
WIN = 16                     # residual demod search window
SEED_STEP = 131              # seeded-carrier spacing on the ARFCN grid


def synth_seed_stream(l2, frames, fs, rng):
    """One carrier's baseband at fs: a BCCH burst at B0 in every frame."""
    import jax.numpy as jnp

    from gmr1_tpu.channelizer.arfcn import BASE_SYMRATE
    from gmr1_tpu.l1 import bcch
    from gmr1_tpu.ops import cplx
    from gmr1_tpu.sdr import bursts as BU
    from gmr1_tpu.sdr import modem

    x1 = cplx.to_complex(
        np.asarray(modem.mod(BU.BCCH, np.asarray(bcch.encode(l2[None])))[0]))
    # sinc-interp 1 sps -> 4 sps (band-limited)
    n4 = BU.BCCH.len_syms * 4
    t4 = np.arange(n4) / 4.0
    b4 = (np.sinc(t4[:, None] - np.arange(len(x1))[None, :]) @ x1)
    s4 = np.zeros(frames * FRAME_OUT, np.complex64)
    for f in range(frames):
        s4[f * FRAME_OUT + B0:f * FRAME_OUT + B0 + n4] = b4
    # linear-interp 4*23400 Hz -> fs (4x oversampled: images are far out)
    n = int(round(frames * FRAME_OUT * fs / (BASE_SYMRATE * 4)))
    pos = np.arange(n) * (BASE_SYMRATE * 4) / fs
    grid = np.arange(len(s4), dtype=np.float64)
    return (np.interp(pos, grid, s4.real)
            + 1j * np.interp(pos, grid, s4.imag)).astype(np.complex64)


def main(argv=None) -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--fs", type=float, default=34e6)
    ap.add_argument("--frames", type=int, default=2,
                    help="TDMA frames per step")
    ap.add_argument("--k", type=int, default=32, help="scan steps per launch")
    ap.add_argument("--iters", type=int, default=6)
    args = ap.parse_args(argv)

    import jax
    import jax.numpy as jnp
    jax.config.update("jax_compilation_cache_dir",
                      os.environ["JAX_COMPILATION_CACHE_DIR"])

    from gmr1_tpu.channelizer import Channel, Channelizer
    from gmr1_tpu.channelizer.arfcn import BASE_SYMRATE
    from gmr1_tpu.l1 import bcch
    from gmr1_tpu.ops import cplx
    from gmr1_tpu.sdr import bursts as BU
    from gmr1_tpu.sdr import modem

    fs = args.fs
    assert (fs / 31250.0) == int(fs / 31250.0), "fs must sit on the grid"
    center_arfcn = 512
    center = 1525e6 + 31250 * center_arfcn
    chz = Channelizer(fs, center, sps=4)
    assert chz.pre_resamp is None and chz.rotation == 0.0
    m, hop = chz.n_chans, chz.analyzer.hop
    n_step = int(round(args.frames * FRAME_OUT * fs / (BASE_SYMRATE * 4)))
    assert n_step % hop == 0, (n_step, hop)
    rng = np.random.default_rng(7)

    # --- seed carriers across the band --------------------------------
    span = m // 2 - 8
    offs = list(range(-span + 5, span - 5, SEED_STEP))
    arfcns = [center_arfcn + o for o in offs]
    l2s = rng.integers(0, 256, (len(arfcns), 24), dtype=np.uint8)
    wb = np.zeros(n_step, np.complex64)
    t = np.arange(n_step) / fs
    for a, l2 in zip(arfcns, l2s):
        df = Channel(a).frequency - center
        wb += synth_seed_stream(l2, args.frames, fs, rng) \
            * np.exp(2j * np.pi * df * t).astype(np.complex64)
    wb_planar = np.stack([wb.real, wb.imag], -1).astype(np.float32)

    # --- self-calibrate pipeline delay through analysis+RRC -----------
    bank = chz.process(wb_planar)
    stream = np.asarray(chz.extract(bank, Channel(arfcns[0])))
    cal_len = BU.BCCH.len_syms * 4 + (FRAME_OUT - BU.BCCH.len_syms * 4)
    r = modem.demod(BU.BCCH, stream[:cal_len], sps=4,
                    win=cal_len - BU.BCCH.len_syms * 4)
    l2d, bad, _ = bcch.decode(r.ebits)
    assert not int(np.asarray(bad)), "calibration decode failed"
    np.testing.assert_array_equal(np.asarray(l2d), l2s[0])
    burst_start = int(round(float(np.asarray(r.toa))))
    burst_pos = burst_start - WIN // 2
    assert burst_pos > 0

    # --- static per-frame RRC window geometry -------------------------
    rrc = chz._rrc_resampler(1)
    wlen = BU.BCCH.len_syms * 4 + WIN
    geoms = [rrc.window_matrix(burst_pos + f * FRAME_OUT, wlen)
             for f in range(args.frames)]
    r_cnt = n_step // hop
    halo = chz.analyzer.p * m
    seed_idx = np.asarray([chz.freq2index(Channel(a).frequency)
                           for a in arfcns])
    l2s_j = jnp.asarray(l2s)

    # Pre-build the per-step noisy inputs ON DEVICE in the ingest slab
    # layout (ops.pallas_pfb.to_slab): the timed loop then models real
    # deployment — every step streams a fresh HBM-resident block
    # through the pipeline.  (Noise synthesis and ingest layout are
    # capture-rig work, not receiver work.)
    from gmr1_tpu.ops.pallas_pfb import to_slab

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
    def run(noise_bank):
        def step(carry, z):
            c2 = chz.analyzer.block_packed(z, r_cnt)     # (R, 2M) [yr|yi]
            wins = []
            for (k_min, wmat) in geoms:
                xw = jax.lax.slice_in_dim(c2, k_min,
                                          k_min + wmat.shape[1], axis=0)
                wins.append(jnp.asarray(wmat) @ xw)      # (wlen, 2M)
            wp = jnp.stack(wins, axis=0)                 # (F, wlen, 2M)
            wt = jnp.swapaxes(wp, -1, -2)                # (F, 2M, wlen)
            w = jnp.stack([wt[:, :m], wt[:, m:]], axis=-1)  # (F,M,wlen,2)
            res = modem.demod(BU.BCCH, w, sps=4, win=WIN)
            l2d, crc_fail, metric = bcch.decode(res.ebits)
            seeded_fail = jnp.sum(crc_fail[:, seed_idx])
            seeded_wrong = jnp.sum(l2d[:, seed_idx] != l2s_j[None])
            return (carry + seeded_fail + seeded_wrong,
                    jnp.sum(metric))
        n_bad, metrics = jax.lax.scan(step, jnp.int32(0), noise_bank)
        return n_bad, jnp.sum(metrics)

    x_dev = jnp.asarray(wb_planar)
    n_banks = min(args.iters, 3)      # distinct noise banks, cycled
    banks = [make_bank(x_dev, i) for i in range(n_banks + 1)]
    n_bad, _ = run(banks[0])          # warmup/compile
    assert int(np.asarray(n_bad)) == 0, "seeded carriers failed CRC"

    # Enqueue all launches asynchronously (the device queue is serial,
    # so total wall = sum of per-launch compute), then pay the host
    # tunnel RTT ONCE on the final readback, which fences everything
    # ordered before it.
    t0 = time.perf_counter()
    n_bads = [run(banks[1 + (i % n_banks)])[0] for i in range(args.iters)]
    tot = sum(int(np.asarray(b)) for b in n_bads)
    dt = time.perf_counter() - t0
    assert tot == 0

    samples = n_step * args.k * args.iters
    msps = samples / dt / 1e6
    print(json.dumps({
        "metric": "transponder_rx_throughput",
        "value": round(msps, 3),
        "unit": "Msamples/s wideband",
        "n_carriers": m,
        "bursts_per_s": round(args.frames * m * args.k * args.iters / dt),
        "vs_realtime": round(msps / 34.0, 2),
    }))


if __name__ == "__main__":
    main()
