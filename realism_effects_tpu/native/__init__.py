"""Native (C++) runtime components with on-demand compilation.

The reference's only off-GPU compute is its env-CDF Web Worker
(`EquirectHdrInfoUniform.js`); here that precompute is a small C++
library (``envcdf.cpp``) compiled on first use with g++ and bound via
ctypes. All entry points have numpy fallbacks, so the framework works
without a toolchain; the native path is just faster on large HDR maps.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
import threading

import numpy as np

_DIR = os.path.dirname(os.path.abspath(__file__))
_SRC = os.path.join(_DIR, "envcdf.cpp")
_LIB = os.path.join(_DIR, "_envcdf.so")

_lock = threading.Lock()
_lib = None
_build_failed = False


def _load() -> ctypes.CDLL | None:
    global _lib, _build_failed
    with _lock:
        if _lib is not None:
            return _lib
        if _build_failed:
            return None
        if not os.path.exists(_LIB) or (
            os.path.getmtime(_LIB) < os.path.getmtime(_SRC)
        ):
            try:
                subprocess.run(
                    ["g++", "-O3", "-shared", "-fPIC", "-std=c++17",
                     "-pthread", _SRC, "-o", _LIB],
                    check=True, capture_output=True, timeout=120,
                )
            except (OSError, subprocess.SubprocessError):
                _build_failed = True
                return None
        try:
            lib = ctypes.CDLL(_LIB)
        except OSError:
            _build_failed = True
            return None
        lib.build_equirect_cdf.restype = ctypes.c_double
        lib.build_equirect_cdf.argtypes = [
            ctypes.POINTER(ctypes.c_float), ctypes.c_int, ctypes.c_int,
            ctypes.c_int, ctypes.POINTER(ctypes.c_float),
            ctypes.POINTER(ctypes.c_float),
        ]
        lib.half_to_float.restype = None
        lib.half_to_float.argtypes = [
            ctypes.POINTER(ctypes.c_uint16), ctypes.POINTER(ctypes.c_float),
            ctypes.c_int64,
        ]
        _lib = lib
        return _lib


def available() -> bool:
    return _load() is not None


def build_equirect_cdf(rgb: np.ndarray, num_threads: int = 0):
    """Marginal/conditional inverse-CDF tables + total luminance.

    ``rgb``: (H, W, 3) float32. Returns (marginal (H,), conditional
    (H, W), total) or None if the native library is unavailable.
    """
    lib = _load()
    if lib is None:
        return None
    rgb = np.ascontiguousarray(rgb, np.float32)
    h, w = rgb.shape[:2]
    marginal = np.empty(h, np.float32)
    conditional = np.empty((h, w), np.float32)
    fp = ctypes.POINTER(ctypes.c_float)
    total = lib.build_equirect_cdf(
        rgb.ctypes.data_as(fp), w, h, num_threads,
        marginal.ctypes.data_as(fp), conditional.ctypes.data_as(fp),
    )
    return marginal, conditional, float(total)


def half_to_float(half_bits: np.ndarray) -> np.ndarray | None:
    """uint16 half-float bits -> float32 (None if native unavailable)."""
    lib = _load()
    if lib is None:
        return None
    half_bits = np.ascontiguousarray(half_bits, np.uint16)
    out = np.empty(half_bits.shape, np.float32)
    lib.half_to_float(
        half_bits.ctypes.data_as(ctypes.POINTER(ctypes.c_uint16)),
        out.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
        half_bits.size,
    )
    return out
