"""Low-level bit-domain and DSP primitives.

These are the TPU-native equivalents of the primitives osmo-gmr pulls in
from libosmocore / libosmo-dsp (SURVEY.md §2.6), plus the GMR-1-specific
bit manipulations of reference src/l1/.
"""
