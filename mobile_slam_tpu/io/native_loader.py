"""ctypes bindings for the native data-loading runtime (native/loader.cpp).

Provides fast CSV parsing, PNG/PGM grayscale decoding, and a background
prefetching image stream — the C++ host runtime mirroring the reference's
MeasurementProcessor + worker ring buffer. Falls back to the pure-Python
loaders (io/dataset.py) when the shared library is absent; `ensure_built()`
compiles it on demand with g++.
"""

from __future__ import annotations

import ctypes
import os
import subprocess

import numpy as np

_NATIVE_DIR = os.path.join(os.path.dirname(os.path.dirname(
    os.path.dirname(os.path.abspath(__file__)))), "native")
_LIB_PATH = os.path.join(_NATIVE_DIR, "libmslam_loader.so")
_lib = None


def ensure_built(force: bool = False) -> bool:
    """Build the shared library if needed. Returns availability."""
    global _lib
    if _lib is not None and not force:
        return True
    if force or not os.path.exists(_LIB_PATH):
        src = os.path.join(_NATIVE_DIR, "loader.cpp")
        if not os.path.exists(src):
            return False
        try:
            subprocess.run(
                ["g++", "-O3", "-std=c++17", "-shared", "-fPIC", "-pthread",
                 src, "-lz", "-o", _LIB_PATH],
                check=True, capture_output=True, timeout=300,
            )
        except Exception:
            return False
    try:
        lib = ctypes.CDLL(_LIB_PATH)
    except OSError:
        return False

    lib.msp_parse_csv.restype = ctypes.c_long
    lib.msp_parse_csv.argtypes = [ctypes.c_char_p, ctypes.c_int,
                                  ctypes.POINTER(ctypes.c_void_p)]
    lib.msp_parse_image_csv.restype = ctypes.c_long
    lib.msp_parse_image_csv.argtypes = [
        ctypes.c_char_p, ctypes.POINTER(ctypes.c_void_p),
        ctypes.POINTER(ctypes.c_void_p)]
    lib.msp_decode_image.restype = ctypes.c_int
    lib.msp_decode_image.argtypes = [ctypes.c_char_p, ctypes.c_void_p,
                                     ctypes.c_int, ctypes.c_int]
    lib.msp_open.restype = ctypes.c_void_p
    lib.msp_open.argtypes = [ctypes.c_char_p, ctypes.c_char_p, ctypes.c_int,
                             ctypes.c_int, ctypes.c_int]
    lib.msp_next.restype = ctypes.c_long
    lib.msp_next.argtypes = [ctypes.c_void_p, ctypes.c_void_p]
    lib.msp_close.argtypes = [ctypes.c_void_p]
    lib.msp_free.argtypes = [ctypes.c_void_p]
    _lib = lib
    return True


def available() -> bool:
    return ensure_built()


def parse_csv(path: str, cols: int) -> np.ndarray:
    """Native CSV parse -> (N, cols) float64; malformed lines skipped."""
    assert ensure_built()
    out = ctypes.c_void_p()
    n = _lib.msp_parse_csv(path.encode(), cols, ctypes.byref(out))
    if n < 0:
        raise IOError(f"cannot parse {path}")
    buf = np.ctypeslib.as_array(
        ctypes.cast(out, ctypes.POINTER(ctypes.c_double)), (n * cols,)
    ).copy().reshape(n, cols)
    _lib.msp_free(out)
    return buf


def parse_image_csv(path: str):
    """Native image-index parse -> (ts seconds (N,), filenames list)."""
    assert ensure_built()
    ts_p = ctypes.c_void_p()
    names_p = ctypes.c_void_p()
    n = _lib.msp_parse_image_csv(path.encode(), ctypes.byref(ts_p),
                                 ctypes.byref(names_p))
    if n < 0:
        raise IOError(f"cannot parse {path}")
    ts = np.ctypeslib.as_array(
        ctypes.cast(ts_p, ctypes.POINTER(ctypes.c_double)), (n,)
    ).copy()
    names = ctypes.cast(names_p, ctypes.c_char_p).value.decode()
    _lib.msp_free(ts_p)
    _lib.msp_free(names_p)
    return ts, [s for s in names.split("\n") if s]


def decode_image(path: str, width: int, height: int) -> np.ndarray:
    """Native PNG/PGM grayscale decode -> (H, W) uint8."""
    assert ensure_built()
    out = np.empty((height, width), np.uint8)
    rc = _lib.msp_decode_image(path.encode(),
                               out.ctypes.data_as(ctypes.c_void_p),
                               width, height)
    if rc != 0:
        raise IOError(f"decode failed ({rc}) for {path}")
    return out


class PrefetchingImageStream:
    """Background-decoded sequential image stream (the worker ring buffer
    equivalent, web/js/vio-worker.js:72-165)."""

    def __init__(self, image_dir: str, filenames: list[str], width: int,
                 height: int, prefetch: int = 4):
        assert ensure_built()
        self.width = width
        self.height = height
        joined = "\n".join(filenames).encode()
        self._h = _lib.msp_open(image_dir.encode(), joined, width, height,
                                prefetch)
        if not self._h:
            raise IOError("msp_open failed")

    def __iter__(self):
        return self

    def __next__(self):
        out = np.empty((self.height, self.width), np.uint8)
        idx = _lib.msp_next(self._h, out.ctypes.data_as(ctypes.c_void_p))
        if idx == -1:
            raise StopIteration
        if idx == -2:
            return self.__next__()  # decode error: skip frame
        return int(idx), out

    def close(self):
        if self._h:
            _lib.msp_close(self._h)
            self._h = None

    def __del__(self):
        try:
            self.close()
        except Exception:
            pass
