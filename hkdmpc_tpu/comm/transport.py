"""ctypes bindings for the native hkdcomm transport (csrc/hkdcomm.cpp).

The shared library is built on demand with g++ (no external deps). URL
format parity with the reference: udpm://239.255.76.67:7667?ttl=N
(common/utilities.h:303-306).
"""

from __future__ import annotations

import ctypes
import os
import re
import subprocess

_HERE = os.path.dirname(os.path.abspath(__file__))
_CSRC = os.path.join(_HERE, "..", "..", "csrc")
_LIB_PATH = os.path.join(_CSRC, "libhkdcomm.so")

DEFAULT_URL = "udpm://239.255.76.67:7667?ttl=255"


def _build_lib():
    src = os.path.join(_CSRC, "hkdcomm.cpp")
    if (not os.path.exists(_LIB_PATH)
            or os.path.getmtime(_LIB_PATH) < os.path.getmtime(src)):
        subprocess.check_call(
            ["g++", "-O2", "-std=c++17", "-fPIC", "-shared", "-pthread",
             src, "-o", _LIB_PATH])
    return _LIB_PATH


_lib = None


def _get_lib():
    global _lib
    if _lib is None:
        _lib = ctypes.CDLL(_build_lib())
        _lib.hkdcomm_create.restype = ctypes.c_void_p
        _lib.hkdcomm_create.argtypes = [ctypes.c_char_p, ctypes.c_int,
                                        ctypes.c_int]
        _lib.hkdcomm_destroy.argtypes = [ctypes.c_void_p]
        _lib.hkdcomm_publish.argtypes = [ctypes.c_void_p, ctypes.c_char_p,
                                         ctypes.c_char_p, ctypes.c_int]
        _lib.hkdcomm_subscribe.argtypes = [ctypes.c_void_p, ctypes.c_char_p]
        _lib.hkdcomm_receive.restype = ctypes.c_int
        _lib.hkdcomm_receive.argtypes = [
            ctypes.c_void_p, ctypes.c_char_p, ctypes.c_int, ctypes.c_char_p,
            ctypes.c_int, ctypes.c_int]
        _lib.hkdcomm_bind_ok.restype = ctypes.c_int
        _lib.hkdcomm_bind_ok.argtypes = [ctypes.c_void_p]
        _lib.hkdcomm_stats.restype = None
        _lib.hkdcomm_stats.argtypes = [ctypes.c_void_p,
                                       ctypes.POINTER(ctypes.c_ulonglong)]
    return _lib


class LCMTransport:
    """LCM-wire-compatible UDP multicast pub/sub."""

    def __init__(self, url: str = DEFAULT_URL):
        m = re.match(r"udpm://([\d.]+):(\d+)(?:\?ttl=(\d+))?", url)
        if not m:
            raise ValueError(f"bad udpm url: {url}")
        addr, port, ttl = m.group(1), int(m.group(2)), int(m.group(3) or 0)
        self._lib = _get_lib()
        self._h = self._lib.hkdcomm_create(addr.encode(), port, ttl)

    def publish(self, channel: str, data: bytes) -> None:
        rc = self._lib.hkdcomm_publish(self._h, channel.encode(), data,
                                       len(data))
        if rc != 0:
            raise IOError(f"publish to {channel} failed")

    def subscribe(self, channel: str) -> None:
        self._lib.hkdcomm_subscribe(self._h, channel.encode())

    def receive(self, timeout_ms: int = 100):
        """Returns (channel, bytes) or None on timeout."""
        chan = ctypes.create_string_buffer(256)
        data = ctypes.create_string_buffer(1 << 20)
        n = self._lib.hkdcomm_receive(self._h, chan, 256, data, 1 << 20,
                                      timeout_ms)
        if n < 0:
            return None
        return chan.value.decode(), data.raw[:n]

    def stats(self) -> dict:
        """Drop observability counters from the native transport: messages
        silently dropped on receive-queue overflow and partial fragment
        reassemblies evicted (lost in-flight fragmented messages)."""
        out = (ctypes.c_ulonglong * 2)()
        self._lib.hkdcomm_stats(self._h, out)
        return {"queue_drops": int(out[0]), "frag_evictions": int(out[1])}

    def close(self):
        if self._h:
            self._lib.hkdcomm_destroy(self._h)
            self._h = None

    def __del__(self):
        try:
            self.close()
        except Exception:
            pass
