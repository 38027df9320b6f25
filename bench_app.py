"""APPLICATION benchmark: WidebandReceiver.run() wall-clock on a
full-transponder synthetic capture.

bench_mixed.py times the fixed-schedule device pipeline; THIS bench
times the actual application — acquisition, the block-streamed SPMD
ingest, the three batched demod phases, and the per-carrier host FSMs
walking every result (the reference's entire deliverable is this loop,
src/gmr1_rx.c:900-991).

Capture: the full 34 MHz L-band grid with EVERY usable grid channel
(~1064 ARFCNs) carrying a live GMR-1 downlink: FCCH every 8 frames,
SI1 BCCH, a CCCH IMM.ASS activating TCH3, a FACCH3 ASS.CMD.1 handing
off TCH9, then steady state with NT3 speech AND NT9 CSD bursts every
frame on every carrier.  Carrier c carries payload stream c%4; the
capture is synthesized as 4 baseband streams multiplied by 4
"frequency combs" (each comb = sum of its carriers' phasors, periodic
in exactly 1088 samples at 34 MHz -> one 1088-point IFFT), so whole-
transponder synthesis costs 4 stream interps instead of 1064.

Block layout (one TDMA 8-frame span == one 10.88 Msample block,
exactly): [noise | prefix0 | prefix1 | steady x 3*cycles].  Every
steady block is DISTINCT: TCH9 bursts carry the true per-frame A5/1
keystream (the reference hardcodes A5/1 for NT9, gmr1_rx.c:310), which
is not periodic in fn — so unlike r04's 3-block cycle, every decoded
CSD payload is verified bit-exact against the schedule (a TCH9-chain
regression that still produces bytes now fails the bench).  Host
memory is (3 + 2 + 3*cycles) blocks (~1 GB at the default 3 cycles).

Verified inside the run: every carrier acquired, SI1 bit-exact, all
speech frames bit-exact vs the stream payloads, the FACCH3 ASS.CMD.1
decoded (TCH9 activation), and every post-warmup CSD payload bit-exact
in schedule order.

Prints ONE JSON line: application_msps (+ acquire_s, steady_msps,
device_msps — the pure device execution rate per block, i.e. what a
production PCIe/DMA attach would see — rtts_per_block,
device_wait_share, frames).
Usage: python bench_app.py [--cycles 3] [--fs 34e6]
"""

from __future__ import annotations

import argparse
import json
import os
import time

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR",
                      "/root/.cache/jax-gmr1-bench")
# most app-phase compiles are ~0.8 s — below the default 1 s persistence
# threshold, so every run was recompiling ~200 graphs (~150 s)
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "0.1")
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_ENTRY_SIZE_BYTES", "0")

import pickle

import numpy as np

SPS = 4
FRAME1 = 936                   # symbols per TDMA frame
FRAME4 = FRAME1 * SPS
F = 8                          # frames per block
BB_BLOCK = F * FRAME4          # baseband samples per block (29952)
F0 = 16                        # true fn of capture frame 0 (%8 == 0)
NS = 4                         # payload streams
PREFIX_BLOCKS = 2              # scripted frames 0..15


def _rc(t, beta=0.35):
    den = 1.0 - (2.0 * beta * t) ** 2
    safe = np.where(np.abs(den) < 1e-8, 1.0, den)
    out = np.sinc(t) * np.cos(np.pi * beta * t) / safe
    return np.where(np.abs(den) < 1e-8, np.sinc(t) * np.pi / 4, out)


def build_stream(rng, s, n_blocks):
    """One payload stream's 4-sps baseband for n_blocks*F frames +
    truth."""
    from gmr1_tpu import native
    from gmr1_tpu.l1 import bcch, ccch, facch3, tch3, tch9
    from gmr1_tpu.sdr import bursts as BU
    from gmr1_tpu.sdr import fcch, modem
    from tests.test_receiver import imm_ass_l2, si1_l2

    n_frames = n_blocks * F
    bb = np.zeros(n_frames * FRAME4, np.complex64)
    tn, tn9 = 6 + s, 12 + s

    def place(k, slot, x1):
        x1 = np.asarray(x1)
        xc = x1[..., 0] + 1j * x1[..., 1]
        nsym = xc.shape[-1]
        t = (np.arange(nsym * SPS)[:, None]) / SPS - np.arange(nsym)[None, :]
        sig = xc @ _rc(t).astype(np.float32).T
        pos = k * FRAME4 + slot * 39 * SPS
        bb[pos:pos + nsym * SPS] += sig

    # FCCH every 8 frames (slots 0-2)
    from gmr1_tpu.ops import cplx
    chirp = cplx.to_complex(
        np.asarray(fcch._chirp_np(fcch.FCCH, SPS, "dual"))) / np.sqrt(2)
    for k in range(0, n_frames, 8):
        pos = k * FRAME4
        bb[pos:pos + len(chirp)] += chirp

    # SI1 BCCH in the prefix (fn-coded, so prefix-only)
    truth = dict(tn=tn, tn9=tn9, si1={}, speech=[], facch=None)
    for k in (2, 10):
        l2 = si1_l2(rng, F0 + k)
        truth["si1"][F0 + k] = bytes(bytearray(l2))
        place(k, 0, np.asarray(modem.mod(BU.BCCH, bcch.encode(l2))))

    # CCCH IMM.ASS at k=3 (activates TCH3 on tn, dkab p unused)
    ia = imm_ass_l2(rng, tn, 9)
    place(3, 0, np.asarray(modem.mod(BU.DC6, ccch.encode(ia))))

    # FACCH3 group k=4..7 carrying ASS.CMD.1 -> TCH9 on tn9
    fl2 = rng.integers(0, 256, 10, dtype=np.uint8)
    fl2[3], fl2[4] = 0x06, 0x2E
    fl2[5] = (fl2[5] & 0xFC) | ((tn9 >> 3) & 0x03)
    fl2[6] = (fl2[6] & 0x1F) | ((tn9 & 0x07) << 5)
    fl2[9] &= 0xF0
    truth["facch"] = bytes(bytearray(fl2))
    fe = np.asarray(facch3.encode(fl2, np.zeros(32, np.uint8))).reshape(4, 104)
    for bi, k in enumerate((4, 5, 6, 7)):
        place(k, tn, np.asarray(modem.mod(BU.NT3_FACCH, fe[bi], sync_id=0)))

    # NT3 speech from k=8, payload pair per k%8 (8-frame periodic)
    pairs = [(rng.integers(0, 256, 10, dtype=np.uint8),
              rng.integers(0, 256, 10, dtype=np.uint8)) for _ in range(8)]
    truth["speech"] = [(bytes(f0), bytes(f1)) for f0, f1 in pairs]
    enc = [np.asarray(modem.mod(
        BU.NT3_SPEECH, tch3.encode(f0, f1, np.zeros(4, np.uint8))))
        for f0, f1 in pairs]
    for k in range(8, n_frames):
        place(k, tn, enc[k % 8])

    # NT9 TCH9 9k6 from k=8 with the TRUE per-frame A5/1 keystream
    # (fn = F0 + k; the reference always ciphers NT9, gmr1_rx.c:310):
    # every burst is distinct, and the depth-3 deinterleaver means the
    # decode at frame k yields the payload fed at k-2 — recorded in
    # truth["csd"] for ordered bit-exact verification
    kc = np.zeros(8, np.uint8)
    il = tch9.interleaver_init(dtype=np.uint8)
    csd = [rng.integers(0, 256, 60, dtype=np.uint8) for _ in range(8)]
    truth["csd"] = [bytes(bytearray(csd[(k - 2) % 8]))
                    for k in range(8, n_frames)]     # decode at frame k
    for k in range(8, n_frames):
        ciph = native.a5_keystream(kc, F0 + k, 658)[0]
        il, eb = tch9.encode(csd[k % 8], tch9.MODE_9K6,
                             np.zeros(10, np.uint8), np.zeros(4, np.uint8),
                             il, ciph)
        place(k, tn9, np.asarray(modem.mod(BU.NT9, np.asarray(eb),
                                           sync_id=1)))
    return bb, truth


from gmr1_tpu.rx.cfile import SampleSource


class CycleSource(SampleSource):
    """SampleSource cycling host blocks: O(6 blocks) memory total."""

    def __init__(self, blocks, order):
        self._blocks = blocks
        self._order = order          # list of block indices
        self._n = blocks[0].shape[0]
        self._pos = 0
        self.total = self._n * len(order)

    def read(self, n: int) -> np.ndarray:
        out = np.empty((min(n, self.total - self._pos), 2), np.float32)
        got = 0
        while got < out.shape[0]:
            bi, off = divmod(self._pos, self._n)
            blk = self._blocks[self._order[bi]]
            take = min(out.shape[0] - got, self._n - off)
            out[got:got + take] = blk[off:off + take]
            got += take
            self._pos += take
        return out


def main(argv=None) -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--fs", type=float, default=34e6)
    ap.add_argument("--cycles", type=int, default=3,
                    help="steady 3-block cycles (each = 0.96 s of capture)")
    ap.add_argument("--verbose", action="store_true")
    args = ap.parse_args(argv)

    import jax
    jax.config.update("jax_compilation_cache_dir",
                      os.environ["JAX_COMPILATION_CACHE_DIR"])
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.1)
    jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)
    if os.environ.get("GMR1_BENCH_CPU"):
        jax.config.update("jax_platforms", "cpu")

    from gmr1_tpu.channelizer import Channel, Channelizer
    from gmr1_tpu.rx import gsmtap
    from gmr1_tpu.rx.wideband import WidebandReceiver

    fs = args.fs
    center_arfcn = 544            # grid channels then map to ARFCN 12..1075
    center = 1525e6 + 31250 * center_arfcn
    chz = Channelizer(fs, center, sps=SPS)
    m = chz.n_chans
    assert chz.pre_resamp is None and chz.rotation == 0.0
    n_block = int(round(F * FRAME4 * fs / (23400 * SPS)))
    assert n_block % m == 0, (n_block, m)     # comb period divides block

    span = m // 2 - 12
    arfcns = [center_arfcn + o for o in range(-span, span)]
    t0 = time.perf_counter()

    # capture synthesis is deterministic (fixed seed) and slow (~10 min
    # at 34 MHz / 3 cycles: build_stream runs eager L1 encodes): cache
    # the blocks + payload truths on disk.  Every content block is
    # distinct (true per-fn A5 on TCH9), so memory/synth scale with
    # --cycles.
    n_blocks = PREFIX_BLOCKS + 3 * args.cycles
    cache = os.path.join(os.environ["JAX_COMPILATION_CACHE_DIR"],
                         f"app-capture-v4-{int(fs)}-c{args.cycles}.pkl")
    if os.path.exists(cache):
        with open(cache, "rb") as f:
            blocks, truths = pickle.load(f)
    else:
        rng = np.random.default_rng(0xA44)
        streams, truths = zip(*[build_stream(rng, s, n_blocks)
                                for s in range(NS)])
        combs = []
        for s in range(NS):
            spec = np.zeros(m, np.complex128)
            for a in arfcns:
                if a % NS == s:
                    spec[(a - center_arfcn) % m] = np.exp(
                        2j * np.pi * rng.random())
            combs.append((np.fft.ifft(spec) * m).astype(np.complex64))

        n_bb = n_blocks * BB_BLOCK
        grid = np.arange(n_bb, dtype=np.float64)
        ratio = (23400.0 * SPS) / fs

        def wb_block(b):
            """Capture block b (0 = first content block)."""
            pos = (np.arange(n_block, dtype=np.float64)
                   + b * n_block) * ratio
            out = np.zeros(n_block, np.complex64)
            for s in range(NS):
                bbs = streams[s]
                re = np.interp(pos, grid, bbs.real).astype(np.float32)
                im = np.interp(pos, grid, bbs.imag).astype(np.float32)
                comb = np.tile(combs[s], n_block // m)
                out += (re + 1j * im) * comb
            out += (rng.standard_normal(n_block)
                    + 1j * rng.standard_normal(n_block)
                    ).astype(np.complex64) * 0.01
            return np.stack([out.real, out.imag], -1).astype(np.float32)

        blocks = [np.stack([rng.standard_normal(n_block),
                            rng.standard_normal(n_block)], -1)
                  .astype(np.float32) * 0.01]             # block A: noise
        blocks += [wb_block(b) for b in range(n_blocks)]
        try:
            with open(cache, "wb") as f:
                pickle.dump((blocks, truths), f)
        except OSError:
            pass
    src = CycleSource(blocks, list(range(1 + n_blocks)))
    t_synth = time.perf_counter() - t0

    # ---- characterize the host<->device link -----------------------------
    # this environment reaches the chip through a tunnel whose D2H path
    # is ~1000x slower than a production PCIe/DMA attach (measured
    # ~25 MB/s vs 1.5 GB/s H2D here), and the FIRST fetch of a process
    # pays a one-time channel setup that has been observed at 1-6 min.
    # Absorb the setup before timing and report the measured link so
    # the wall-clock numbers carry their context.
    import jax.numpy as jnp
    t0 = time.perf_counter()
    _ = np.asarray(jax.device_put(np.zeros(16, np.float32)) + 1)
    link_setup_s = time.perf_counter() - t0
    probe = jax.device_put(np.zeros((1024 * 1024, 2), np.float32))
    probe = probe + 1
    jax.block_until_ready(probe)
    t0 = time.perf_counter()
    _ = np.asarray(probe)
    d2h_mbps = 8.0 / (time.perf_counter() - t0)
    x8 = np.zeros((1024 * 1024, 2), np.float32)
    t0 = time.perf_counter()
    jax.block_until_ready(jax.device_put(x8))
    h2d_mbps = 8.0 / (time.perf_counter() - t0)

    # ---- run the application ---------------------------------------------
    # int16 ingest: halves the H2D bytes (the steady-state wall on any
    # link-bound attach); the full bit-exact verification below runs
    # UNDER it, so the quantized path is what is being proven
    rx = WidebandReceiver(src, fs, center, sps=SPS, verbose=args.verbose,
                          h2d_dtype="int16")

    # instrument device readbacks (the host<->device round trips)
    real_get = jax.device_get
    stats = dict(n=0, wait=0.0)

    def counted_get(x):
        t = time.perf_counter()
        out = real_get(x)
        stats["wait"] += time.perf_counter() - t
        stats["n"] += 1
        return out

    jax.device_get = counted_get
    try:
        t0 = time.perf_counter()
        rx.acquire()
        t_acq = time.perf_counter() - t0
        acq_rtts = stats["n"]
        t0 = time.perf_counter()
        n_frames = rx.run()
        t_loop = time.perf_counter() - t0
    finally:
        jax.device_get = real_get

    # ---- verify ------------------------------------------------------------
    # unseeded edge channels may fire false FCCH candidates from
    # adjacent-channel leakage (they then fail BCCH forever, like the
    # reference's gates) — require every SEEDED carrier acquired and
    # verify those; count the strays separately
    found = {car.arfcn for car in rx.carriers}
    missing = [a for a in arfcns if a not in found]
    assert not missing, (len(missing), missing[:8])
    n_false = len(found - set(arfcns))
    n_carriers = len(arfcns)
    bad = []
    n_speech = n_csd = 0
    for car in rx.carriers:
        if car.arfcn not in set(arfcns):
            continue
        tr = truths[car.arfcn % NS]
        si1 = {fn: l2 for t, fn, tn, l2 in car.frames if t == gsmtap.GMR1_BCCH}
        if not si1 or any(tr["si1"].get(fn) != l2 for fn, l2 in si1.items()):
            bad.append(("si1", car.arfcn))
        fa = [l2 for t, _f, _t, l2 in car.frames
              if t == (gsmtap.GMR1_TCH3 | gsmtap.GMR1_FACCH)]
        if tr["facch"] not in fa:
            bad.append(("facch", car.arfcn))
        ok_pairs = {p for pair in tr["speech"] for p in pair}
        got = car.speech
        if not got or any(p not in ok_pairs for p in got):
            bad.append(("speech", car.arfcn))
        n_speech += len(got)
        # ordered bit-exact CSD check: decode j corresponds to frame
        # 8+j; the first 2 outputs are depth-3 ring warmup (the
        # reference emits those too, gmr1_rx.c:342-347)
        exp = tr["csd"]
        if len(car.csd) < 3 or car.csd[2:] != exp[2:len(car.csd)]:
            bad.append(("csd", car.arfcn))
        n_csd += len(car.csd)
    assert not bad, (len(bad), bad[:8])
    blocks_done = src.total // n_block
    assert n_speech >= n_carriers * (blocks_done - 4) * F, \
        (n_speech, n_carriers, blocks_done)
    assert n_csd >= n_carriers * (blocks_done - 4) * F, (n_csd, n_carriers)

    # pure device execution rate for the same per-block graphs (what a
    # production PCIe/DMA attach would see; the tunnel link dominates
    # the wall-clock numbers above it)
    t_dev = rx.device_block_time(iters=3)
    dev_msps = n_block / t_dev / 1e6

    total = src.total
    msps = total / (t_acq + t_loop) / 1e6
    steady = total / t_loop / 1e6
    # steady-state per-block rate from the median block wall: excludes
    # the one-time in-loop costs (remote executable load is sometimes
    # ~1 min on this tunnel, sometimes ~2 s — run-to-run luck that the
    # whole-loop average would launder into the throughput number)
    walls = sorted(rx.block_walls[2:]) or sorted(rx.block_walls)
    med_wall = walls[len(walls) // 2]
    steady_med = n_block / med_wall / 1e6
    # steady per-section medians (same rationale): the VERDICT-gated
    # dispatch share must reflect the per-block host cost, not the
    # one-time load that lands in whichever section runs first
    def med(key):
        xs = sorted(p.get(key, 0.0) for p in rx.block_profs[2:]) \
            or [0.0]
        return xs[len(xs) // 2]
    sect_med = {k: round(med(k), 3) for k in sorted(rx.prof)}
    rtts = (stats["n"] - acq_rtts) / max(1, blocks_done)
    print(json.dumps({
        "metric": "application_rx_throughput",
        "value": round(msps, 2),
        "unit": "Msamples/s wideband (WidebandReceiver.run wall-clock)",
        "vs_realtime": round(msps / (fs / 1e6), 2),
        "steady_msps": round(steady, 2),
        "steady_vs_realtime": round(steady / (fs / 1e6), 2),
        "steady_median_block_msps": round(steady_med, 2),
        "device_msps": round(dev_msps, 2),
        "device_vs_realtime": round(dev_msps / (fs / 1e6), 2),
        "acquire_s": round(t_acq, 2),
        "synth_s": round(t_synth, 2),
        "n_carriers": n_carriers,
        "false_fcch_carriers": n_false,
        "blocks": blocks_done,
        "rtts_per_block": round(rtts, 1),
        "device_wait_share": round(stats["wait"] / (t_acq + t_loop), 3),
        "frames_decoded": n_frames,
        "speech_frames": n_speech,
        "csd_bursts": n_csd,
        "sections_s": {k: round(v, 2) for k, v in sorted(rx.prof.items())},
        # per-block medians: the steady-state cost of each section
        # (totals above absorb one-time remote executable loads)
        "sections_median_block_s": sect_med,
        "steady_dispatch_share": round(
            sect_med.get("dispatch", 0.0) / med_wall, 3),
        "h2d_dtype": "int16",
        "link": {"h2d_mbps": round(h2d_mbps), "d2h_mbps": round(d2h_mbps),
                 "first_fetch_setup_s": round(link_setup_s, 1)},
    }))


if __name__ == "__main__":
    main()
