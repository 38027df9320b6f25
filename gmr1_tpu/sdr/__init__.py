"""PHY layer: burst catalog, pi4-CxPSK modem, FCCH sync, DKAB.

TPU-native equivalent of reference src/sdr/ (SURVEY.md §2.1): all
demodulation is batched over bursts/carriers with static shapes per
(burst type, sps, search window) so XLA compiles one kernel per
configuration.
"""
