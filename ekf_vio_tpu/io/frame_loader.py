"""ctypes binding for the native threaded frame loader.

``native/frameloader.cpp`` overlaps PNG decode with device compute — the
host-side ingest role ROS image_transport plays for the reference
(EKFVIO.cpp:69-71).  Builds on demand with make; falls back to OpenCV
decode when the toolchain or libpng is unavailable.
"""
from __future__ import annotations

import ctypes
import os
import subprocess

import numpy as np

_NATIVE_DIR = os.path.join(os.path.dirname(__file__), "..", "..", "native")
_LIB_PATH = os.path.join(_NATIVE_DIR, "libframeloader.so")
_lib = None


def _load_lib():
    global _lib
    if _lib is not None:
        return _lib
    if not os.path.exists(_LIB_PATH):
        try:
            subprocess.run(["make", "-C", _NATIVE_DIR], check=True,
                           capture_output=True)
        except (subprocess.CalledProcessError, FileNotFoundError):
            return None
    try:
        lib = ctypes.CDLL(_LIB_PATH)
    except OSError:
        return None
    lib.fl_create.restype = ctypes.c_void_p
    lib.fl_create.argtypes = [ctypes.POINTER(ctypes.c_char_p), ctypes.c_int,
                              ctypes.c_int, ctypes.c_int, ctypes.c_int]
    lib.fl_next.restype = ctypes.c_int
    lib.fl_next.argtypes = [ctypes.c_void_p,
                            ctypes.POINTER(ctypes.c_float),
                            ctypes.POINTER(ctypes.c_int),
                            ctypes.POINTER(ctypes.c_int)]
    lib.fl_destroy.argtypes = [ctypes.c_void_p]
    lib.fl_decode_one.restype = ctypes.c_int
    lib.fl_decode_one.argtypes = [ctypes.c_char_p, ctypes.c_int,
                                  ctypes.POINTER(ctypes.c_float), ctypes.c_int,
                                  ctypes.POINTER(ctypes.c_int),
                                  ctypes.POINTER(ctypes.c_int)]
    _lib = lib
    return lib


def native_available() -> bool:
    return _load_lib() is not None


class FrameLoader:
    """In-order streaming frames from PNG paths, decode overlapped with
    compute.  Iterate to get (index, float32 [H, W]) tuples."""

    def __init__(self, paths, inverse_scale: int = 1, n_threads: int = 4,
                 capacity: int = 8):
        self._lib = _load_lib()
        self.paths = list(paths)
        self.inverse_scale = inverse_scale
        if self._lib is None:
            self._handle = None  # cv2 fallback
            self._pos = 0
            return
        arr = (ctypes.c_char_p * len(self.paths))(
            *[p.encode() for p in self.paths])
        self._paths_keepalive = arr
        self._handle = self._lib.fl_create(arr, len(self.paths),
                                           inverse_scale, n_threads, capacity)
        # probe dims from the first frame
        w, h = ctypes.c_int(), ctypes.c_int()
        buf = np.empty(1 << 24, np.float32)
        rc = self._lib.fl_decode_one(
            self.paths[0].encode(), inverse_scale,
            buf.ctypes.data_as(ctypes.POINTER(ctypes.c_float)), buf.size,
            ctypes.byref(w), ctypes.byref(h))
        if rc != 0:
            raise IOError(f"cannot decode {self.paths[0]} (rc={rc})")
        self.width, self.height = w.value, h.value

    def __iter__(self):
        if self._handle is None:
            return self._iter_cv2()
        return self._iter_native()

    def _iter_native(self):
        out = np.empty((self.height, self.width), np.float32)
        w, h = ctypes.c_int(), ctypes.c_int()
        while True:
            rc = self._lib.fl_next(
                self._handle, out.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
                ctypes.byref(w), ctypes.byref(h))
            if rc == -1:
                return
            if rc == -2:
                continue  # undecodable frame skipped
            yield rc, out.copy()

    def _iter_cv2(self):
        import cv2

        for i, p in enumerate(self.paths):
            im = cv2.imread(p, cv2.IMREAD_GRAYSCALE)
            if im is None:
                continue
            s = self.inverse_scale
            if s > 1:
                im = im[: im.shape[0] // s * s, : im.shape[1] // s * s]
                im = im.reshape(im.shape[0] // s, s, im.shape[1] // s, s).mean((1, 3))
            yield i, im.astype(np.float32)

    def close(self):
        if self._handle is not None:
            self._lib.fl_destroy(self._handle)
            self._handle = None

    def __del__(self):
        try:
            self.close()
        except Exception:
            pass
