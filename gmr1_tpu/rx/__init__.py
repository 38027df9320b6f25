"""Receiver application layer (reference src/gmr1_rx.c, src/gsmtap.c).

Host-side control FSMs over device-kernel math: cfile mmap IO, FCCH
acquisition, TDMA tracking, BCCH/CCCH/TCH3/TCH9 processing, GSMTap out.
"""

from .cfile import CFile, load, save
from .gsmtap import GsmtapSink, make_packet
from .receiver import ChanDesc, Receiver

__all__ = ["CFile", "load", "save", "GsmtapSink", "make_packet",
           "ChanDesc", "Receiver"]
