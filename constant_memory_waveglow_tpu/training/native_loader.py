"""ctypes bindings for the native wav segment loader (native/wav_loader.cpp).

Builds the shared library on first use if a toolchain is available; all
callers fall back transparently to the scipy path when the library can't be
loaded, so the framework never hard-depends on the native build.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
import threading

import numpy as np

_LIB = None
_LIB_LOCK = threading.Lock()
_NATIVE_DIR = os.path.join(
    os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__)))),
    "native")
_SO_PATH = os.path.join(_NATIVE_DIR, "libcmwg_wav.so")


def _load():
    global _LIB
    with _LIB_LOCK:
        if _LIB is not None:
            return _LIB
        if not os.path.exists(_SO_PATH):
            try:
                subprocess.run(["make", "-C", _NATIVE_DIR], check=True,
                               capture_output=True, timeout=120)
            except Exception:
                _LIB = False
                return False
        try:
            lib = ctypes.CDLL(_SO_PATH)
        except OSError:
            _LIB = False
            return False
        lib.cmwg_wav_info.restype = ctypes.c_int64
        lib.cmwg_wav_info.argtypes = [ctypes.c_char_p,
                                      ctypes.POINTER(ctypes.c_int32)]
        lib.cmwg_read_crop.restype = ctypes.c_int32
        lib.cmwg_read_crop.argtypes = [ctypes.c_char_p, ctypes.c_int64,
                                       ctypes.c_int64,
                                       ctypes.POINTER(ctypes.c_float)]
        lib.cmwg_fill_batch.restype = ctypes.c_int32
        lib.cmwg_fill_batch.argtypes = [
            ctypes.POINTER(ctypes.c_char_p), ctypes.POINTER(ctypes.c_int64),
            ctypes.c_int32, ctypes.c_int64, ctypes.POINTER(ctypes.c_float),
            ctypes.c_int32]
        _LIB = lib
        return lib


def available() -> bool:
    return bool(_load())


def wav_info(path):
    """(n_frames, sample_rate) or None if the native lib can't parse it."""
    lib = _load()
    if not lib:
        return None
    sr = ctypes.c_int32(0)
    n = lib.cmwg_wav_info(path.encode(), ctypes.byref(sr))
    if n <= 0:
        return None
    return int(n), int(sr.value)


def fill_batch(paths, starts, frames, n_threads=4):
    """Decode a [len(paths), frames] float32 mono batch in native threads."""
    lib = _load()
    if not lib:
        return None
    batch = len(paths)
    out = np.empty((batch, frames), dtype=np.float32)
    c_paths = (ctypes.c_char_p * batch)(*[p.encode() for p in paths])
    c_starts = (ctypes.c_int64 * batch)(*[int(s) for s in starts])
    rc = lib.cmwg_fill_batch(
        c_paths, c_starts, batch, frames,
        out.ctypes.data_as(ctypes.POINTER(ctypes.c_float)), n_threads)
    if rc != 0:
        return None
    return out
