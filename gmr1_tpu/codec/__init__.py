"""AMBE speech vocoder, TPU-native (reference src/codec/, SURVEY.md §2.3).

Batched functional decoder: 10-byte AMBE frames -> 8 kHz int16 PCM.

    from gmr1_tpu import codec
    state = codec.init((n_channels,))
    state, pcm = codec.decode_frames(state, frames)  # (B, T, 10) -> (B, T, 160)
"""

from .codec import CodecState, decode_dtx, decode_frame, decode_frames, init

__all__ = ["CodecState", "decode_dtx", "decode_frame", "decode_frames",
           "init"]
