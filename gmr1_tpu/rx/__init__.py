"""Receiver application layer (reference src/gmr1_rx.c, src/gsmtap.c).

Host-side control FSMs over device-kernel math: cfile mmap IO, FCCH
acquisition, TDMA tracking, BCCH/CCCH/TCH3/TCH9 processing, GSMTap out.
"""

from .cfile import CFile, load, save
from .gsmtap import GsmtapSink, make_packet
from .receiver import ChanDesc, Receiver


def __getattr__(name):
    # lazy: wideband pulls in the channelizer stack
    if name == "WidebandReceiver":
        from .wideband import WidebandReceiver
        return WidebandReceiver
    raise AttributeError(name)


__all__ = ["CFile", "load", "save", "GsmtapSink", "make_packet",
           "ChanDesc", "Receiver", "WidebandReceiver"]
