"""ctypes binding for the native flowio library (native/flowio.cpp).

Provides the C++ fast path for host-side volume IO — threaded slab
read/write and dtype widening — mirroring the reference's native data layer
(cuda-flow3d Data3D/io_utils). Falls back silently when the library isn't
built; volume.py works either way.

Build: ``make -C native`` (done automatically on first use when a compiler
is available).
"""

from __future__ import annotations

import ctypes
import os
import subprocess
import threading

import numpy as np

_REPO_ROOT = os.path.abspath(
    os.path.join(os.path.dirname(__file__), "..", "..", ".."))
_LIB_PATH = os.path.join(_REPO_ROOT, "build", "libflowio.so")
_NATIVE_DIR = os.path.join(_REPO_ROOT, "native")

_lock = threading.Lock()
_lib = None
_tried = False


def _build() -> bool:
    try:
        subprocess.run(["make", "-C", _NATIVE_DIR], check=True,
                       capture_output=True, timeout=120)
        return os.path.exists(_LIB_PATH)
    except Exception:
        return False


def get_lib():
    """The loaded library, or None if unavailable."""
    global _lib, _tried
    with _lock:
        if _lib is not None or _tried:
            return _lib
        _tried = True
        if not os.path.exists(_LIB_PATH) and os.path.isdir(_NATIVE_DIR):
            _build()
        if not os.path.exists(_LIB_PATH):
            return None
        try:
            lib = ctypes.CDLL(_LIB_PATH)
        except OSError:
            return None
        lib.flowio_read.argtypes = [ctypes.c_char_p, ctypes.c_int64,
                                    ctypes.c_int64, ctypes.c_void_p]
        lib.flowio_read.restype = ctypes.c_int
        lib.flowio_write.argtypes = [ctypes.c_char_p, ctypes.c_int64,
                                     ctypes.c_int64, ctypes.c_void_p,
                                     ctypes.c_int64]
        lib.flowio_write.restype = ctypes.c_int
        lib.flowio_to_f32.argtypes = [ctypes.c_void_p, ctypes.c_void_p,
                                      ctypes.c_int64, ctypes.c_int]
        lib.flowio_to_f32.restype = ctypes.c_int
        lib.flowio_minmax_f32.argtypes = [ctypes.c_void_p, ctypes.c_int64,
                                          ctypes.POINTER(ctypes.c_float),
                                          ctypes.POINTER(ctypes.c_float)]
        lib.flowio_minmax_f32.restype = ctypes.c_int
        _lib = lib
        return _lib


def available() -> bool:
    return get_lib() is not None


def read_bytes(path: str, offset: int, nbytes: int) -> np.ndarray | None:
    """Threaded pread into a fresh buffer; None if native unavailable."""
    lib = get_lib()
    if lib is None:
        return None
    buf = np.empty(nbytes, np.uint8)
    rc = lib.flowio_read(path.encode(), offset, nbytes,
                         buf.ctypes.data_as(ctypes.c_void_p))
    if rc != 0:
        raise OSError(-rc, f"flowio_read({path}, {offset}, {nbytes})")
    return buf


def write_bytes(path: str, offset: int, data: np.ndarray,
                total_bytes: int = -1) -> bool:
    lib = get_lib()
    if lib is None:
        return False
    data = np.ascontiguousarray(data)
    rc = lib.flowio_write(path.encode(), offset, data.nbytes,
                          data.ctypes.data_as(ctypes.c_void_p), total_bytes)
    if rc != 0:
        raise OSError(-rc, f"flowio_write({path}, {offset})")
    return True

_KIND = {"uint8": 0, "uint16": 1, "int16": 2}


def to_f32(arr: np.ndarray) -> np.ndarray | None:
    """Threaded widen of u8/u16/i16 to f32; None if not applicable."""
    lib = get_lib()
    kind = _KIND.get(str(arr.dtype))
    if lib is None or kind is None:
        return None
    arr = np.ascontiguousarray(arr)
    out = np.empty(arr.shape, np.float32)
    rc = lib.flowio_to_f32(arr.ctypes.data_as(ctypes.c_void_p),
                           out.ctypes.data_as(ctypes.c_void_p),
                           arr.size, kind)
    if rc != 0:
        raise OSError(-rc, "flowio_to_f32")
    return out


def minmax_f32(arr: np.ndarray):
    lib = get_lib()
    if lib is None or arr.dtype != np.float32:
        return None
    arr = np.ascontiguousarray(arr)
    mn = ctypes.c_float()
    mx = ctypes.c_float()
    rc = lib.flowio_minmax_f32(arr.ctypes.data_as(ctypes.c_void_p), arr.size,
                               ctypes.byref(mn), ctypes.byref(mx))
    if rc != 0:
        raise OSError(-rc, "flowio_minmax_f32")
    return float(mn.value), float(mx.value)
