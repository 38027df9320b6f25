"""Wideband capture front-end (reference utils/, SURVEY.md §2.5).

ARFCN grid model + polyphase filterbank channelizer + per-carrier
RRC resampling, all as TPU matmul/gather kernels.
"""

from .arfcn import BASE_BANDWIDTH, BASE_SYMRATE, Channel, align_freq
from .pfb import ArbResampler, Channelizer, PFBAnalyzer

__all__ = ["BASE_BANDWIDTH", "BASE_SYMRATE", "Channel", "align_freq",
           "ArbResampler", "Channelizer", "PFBAnalyzer"]
