"""ctypes bindings for the native kernels, with transparent numpy fallback."""

from __future__ import annotations

import ctypes
import logging
import os

import numpy as np

log = logging.getLogger(__name__)

_lib = None
_tried = False


def _load():
    global _lib, _tried
    if _tried:
        return _lib
    _tried = True
    from speaksense_tpu.native.build import build

    path = build()
    if path is None:
        return None
    try:
        lib = ctypes.CDLL(str(path))
        lib.ggml_dequantize.restype = ctypes.c_int
        lib.ggml_dequantize.argtypes = [
            ctypes.c_int, ctypes.c_void_p, ctypes.c_void_p, ctypes.c_int64,
            ctypes.c_int,
        ]
        lib.pcm16_to_f32.restype = None
        lib.pcm16_to_f32.argtypes = [ctypes.c_void_p, ctypes.c_void_p, ctypes.c_int64]
        _lib = lib
    except OSError as e:
        log.warning("failed to load native kernels: %s", e)
        _lib = None
    return _lib


def native_available() -> bool:
    return _load() is not None


def dequantize_native(data: bytes, ttype: int, n: int,
                      nthreads: int | None = None) -> np.ndarray | None:
    """Dequantize via C++ threads; None if unavailable (caller falls back to
    the numpy codec in ckpt/ggml.py). F32 (ttype 0) needs no decode."""
    lib = _load()
    if lib is None:
        return None
    if ttype == 0:
        return np.frombuffer(data, "<f4", count=n).copy()
    out = np.empty((n,), np.float32)
    src = np.frombuffer(data, np.uint8)
    nthreads = nthreads or min(os.cpu_count() or 1, 16)
    rc = lib.ggml_dequantize(
        ttype, src.ctypes.data_as(ctypes.c_void_p),
        out.ctypes.data_as(ctypes.c_void_p), n, nthreads)
    if rc != 0:
        return None
    return out


def pcm16_to_f32_native(data: bytes) -> np.ndarray | None:
    lib = _load()
    if lib is None:
        return None
    n = len(data) // 2
    src = np.frombuffer(data, np.int16, count=n)
    out = np.empty((n,), np.float32)
    lib.pcm16_to_f32(src.ctypes.data_as(ctypes.c_void_p),
                     out.ctypes.data_as(ctypes.c_void_p), n)
    return out
