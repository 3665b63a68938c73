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


# ---------------------------------------------------------------------------
# Draco decoder (native/draco.cpp) — production path for
# scene/draco.py's pure-Python reference implementation
# ---------------------------------------------------------------------------

_DRACO_SRC = os.path.join(_DIR, "draco.cpp")
_DRACO_LIB = os.path.join(_DIR, "_draco.so")
_draco_lock = threading.Lock()
_draco_lib = None
_draco_failed = False


def _load_draco() -> ctypes.CDLL | None:
    global _draco_lib, _draco_failed
    with _draco_lock:
        if _draco_lib is not None:
            return _draco_lib
        if _draco_failed:
            return None
        if not os.path.exists(_DRACO_LIB) or (
            os.path.getmtime(_DRACO_LIB) < os.path.getmtime(_DRACO_SRC)
        ):
            try:
                subprocess.run(
                    ["g++", "-O2", "-shared", "-fPIC", "-std=c++17",
                     _DRACO_SRC, "-o", _DRACO_LIB],
                    check=True, capture_output=True, timeout=240,
                )
            except (OSError, subprocess.SubprocessError):
                _draco_failed = True
                return None
        try:
            lib = ctypes.CDLL(_DRACO_LIB)
        except OSError:
            _draco_failed = True
            return None
        lib.re_draco_decode.restype = ctypes.c_void_p
        lib.re_draco_decode.argtypes = [
            ctypes.c_char_p, ctypes.c_longlong, ctypes.c_char_p, ctypes.c_int]
        lib.re_draco_num_points.restype = ctypes.c_longlong
        lib.re_draco_num_points.argtypes = [ctypes.c_void_p]
        lib.re_draco_num_faces.restype = ctypes.c_longlong
        lib.re_draco_num_faces.argtypes = [ctypes.c_void_p]
        lib.re_draco_faces.restype = ctypes.POINTER(ctypes.c_int32)
        lib.re_draco_faces.argtypes = [ctypes.c_void_p]
        lib.re_draco_num_attributes.restype = ctypes.c_int
        lib.re_draco_num_attributes.argtypes = [ctypes.c_void_p]
        lib.re_draco_attribute_info.restype = None
        lib.re_draco_attribute_info.argtypes = [
            ctypes.c_void_p, ctypes.c_int,
            ctypes.POINTER(ctypes.c_longlong), ctypes.POINTER(ctypes.c_int),
            ctypes.POINTER(ctypes.c_int)]
        lib.re_draco_attribute_floats.restype = ctypes.POINTER(ctypes.c_float)
        lib.re_draco_attribute_floats.argtypes = [ctypes.c_void_p, ctypes.c_int]
        lib.re_draco_attribute_ints.restype = ctypes.POINTER(ctypes.c_int32)
        lib.re_draco_attribute_ints.argtypes = [ctypes.c_void_p, ctypes.c_int]
        lib.re_draco_release.restype = None
        lib.re_draco_release.argtypes = [ctypes.c_void_p]
        _draco_lib = lib
        return _draco_lib


def draco_available() -> bool:
    return _load_draco() is not None


def draco_decode(data: bytes):
    """Native Draco decode -> (faces (F,3) int32, {unique_id: array},
    num_points), or None if the native library is unavailable.
    Raises ValueError on malformed/unsupported bitstreams."""
    lib = _load_draco()
    if lib is None:
        return None
    err = ctypes.create_string_buffer(256)
    handle = lib.re_draco_decode(data, len(data), err, 256)
    if not handle:
        raise ValueError(f"draco: {err.value.decode()}")
    try:
        num_points = lib.re_draco_num_points(handle)
        num_faces = lib.re_draco_num_faces(handle)
        faces = np.ctypeslib.as_array(
            lib.re_draco_faces(handle), shape=(num_faces, 3)).copy()
        attrs = {}
        for i in range(lib.re_draco_num_attributes(handle)):
            uid = ctypes.c_longlong()
            nc = ctypes.c_int()
            is_float = ctypes.c_int()
            lib.re_draco_attribute_info(
                handle, i, ctypes.byref(uid), ctypes.byref(nc),
                ctypes.byref(is_float))
            if is_float.value:
                arr = np.ctypeslib.as_array(
                    lib.re_draco_attribute_floats(handle, i),
                    shape=(num_points, nc.value)).copy()
            else:
                arr = np.ctypeslib.as_array(
                    lib.re_draco_attribute_ints(handle, i),
                    shape=(num_points, nc.value)).copy()
            attrs[int(uid.value)] = arr
        return faces, attrs, int(num_points)
    finally:
        lib.re_draco_release(handle)
