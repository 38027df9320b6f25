"""gmr1_tpu — a TPU-native GMR-1 (Thuraya) receive framework.

A from-scratch JAX/XLA/Pallas reimplementation of the capabilities of
osmo-gmr (reference: /root/reference): wideband channelization, FCCH
synchronization, pi4-CxPSK burst demodulation, the full GMR-1 L1 FEC
chain, the A5 cipher, and the AMBE speech vocoder — engineered as
batched, HBM-resident device kernels sharded over TPU meshes rather
than a port of the reference's single-threaded C.

Layering mirrors the reference's public surface (SURVEY.md §1):

  ops/          low-level bit/DSP primitives (scramble, interleave, CRC,
                puncturing, conv codes, Viterbi, A5, DSP helpers)
  l1/           channel coders (BCCH, CCCH, TCH3, TCH9, FACCH3, FACCH9,
                RACH, xCH/DC12)           ~ reference src/l1/
  sdr/          PHY (FCCH, pi4cxpsk modem, burst catalog, DKAB)
                                          ~ reference src/sdr/
  codec/        AMBE vocoder              ~ reference src/codec/
  rx/           receiver application / control loop ~ src/gmr1_rx.c
  channelizer/  wideband polyphase channelizer ~ reference utils/
  parallel/     device-mesh sharding of carriers/time-blocks
  native/       C++ runtime pieces (capture IO, GSMTap UDP)
"""

__version__ = "0.1.0"
