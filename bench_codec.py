"""AMBE vocoder decode throughput: realtime 8 kHz voice channels/chip.

Streams C parallel voice channels through the batched lax.scan decoder
(gmr1_tpu.codec.decode_frames — the TPU-native form of the reference's
one-frame-at-a-time gmr1_codec_decode_frame loop, codec.c:84 driven by
gmr1_ambe_decode.c:125-155).  Each AMBE frame is 20 ms of audio, so one
realtime channel consumes 50 frames/s; channels/chip = frames_per_s/50.

The decoder is branch-free (speech/tone/silence all computed, winner
selected), so random frames exercise the full datapath.  Output PCM is
summed on device; the final readback is the completion fence.

Usage: python bench_codec.py [--channels 4096] [--t 50] [--iters 4]
"""

from __future__ import annotations

import argparse
import json
import os
import time

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR",
                      "/root/.cache/jax-gmr1-bench")

import numpy as np


def main(argv=None) -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--channels", type=int, default=4096,
                    help="parallel voice channels")
    ap.add_argument("--t", type=int, default=50,
                    help="frames per channel per launch (50 = 1 s)")
    ap.add_argument("--iters", type=int, default=4)
    args = ap.parse_args(argv)

    import jax
    import jax.numpy as jnp
    jax.config.update("jax_compilation_cache_dir",
                      os.environ["JAX_COMPILATION_CACHE_DIR"])

    from gmr1_tpu import codec

    rng = np.random.default_rng(11)
    c, t = args.channels, args.t
    frames = rng.integers(0, 256, (c, t, 10), dtype=np.uint8)

    @jax.jit
    def run(state, fr):
        state, pcm = codec.decode_frames(state, fr)
        return state, jnp.sum(jnp.abs(pcm.astype(jnp.int32)))

    state = codec.init((c,))
    fr = jnp.asarray(frames)
    state, chk = run(state, fr)            # warmup/compile
    assert int(np.asarray(chk)) > 0

    t0 = time.perf_counter()
    for _ in range(args.iters):
        state, chk = run(state, fr)        # state chains the launches
    float(np.asarray(chk))                 # fence
    dt = time.perf_counter() - t0

    fps = c * t * args.iters / dt
    print(json.dumps({
        "metric": "codec_throughput",
        "value": round(fps / 50.0),
        "unit": "realtime voice channels/chip",
        "frames_per_s": round(fps),
        "channels": c,
    }))


if __name__ == "__main__":
    main()
