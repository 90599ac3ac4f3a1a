"""ctypes wrapper for the native async dataset loader.

Builds `native/libslamloader.so` on first use (g++ + libpng/libjpeg, both
baked into the image) and exposes a prefetching iterator over an RGB-D
association list.  Falls back to a synchronous cv2 loader when the native
toolchain is unavailable.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
import threading

import numpy as np

_NATIVE_DIR = os.path.join(os.path.dirname(__file__), "..", "native")
_LIB = None
_LIB_LOCK = threading.Lock()


def _build_and_load():
    global _LIB
    with _LIB_LOCK:
        if _LIB is not None:
            return _LIB
        so = os.path.join(_NATIVE_DIR, "libslamloader.so")
        src = os.path.join(_NATIVE_DIR, "dataloader.cc")
        if (not os.path.exists(so)
                or os.path.getmtime(so) < os.path.getmtime(src)):
            subprocess.run(["make", "-C", _NATIVE_DIR], check=True,
                           capture_output=True)
        lib = ctypes.CDLL(so)
        lib.dl_create.restype = ctypes.c_void_p
        lib.dl_create.argtypes = [ctypes.c_int, ctypes.c_int]
        lib.dl_destroy.argtypes = [ctypes.c_void_p]
        lib.dl_submit.argtypes = [
            ctypes.c_void_p, ctypes.c_long, ctypes.c_char_p, ctypes.c_char_p,
            ctypes.c_float]
        lib.dl_next.restype = ctypes.c_int
        lib.dl_next.argtypes = [
            ctypes.c_void_p, ctypes.c_long,
            ctypes.POINTER(ctypes.c_float), ctypes.POINTER(ctypes.c_float),
            ctypes.c_int, ctypes.c_int]
        _LIB = lib
        return lib


def native_available() -> bool:
    try:
        _build_and_load()
        return True
    except Exception:
        return False


class AsyncRGBDLoader:
    """Prefetching iterator over (gray [H,W] f32, depth [H,W] f32) frames.

    `items`: list of (rgb_path, depth_path_or_None).  Frames are decoded by a
    native thread pool `prefetch` frames ahead and yielded in order.
    """

    def __init__(self, items, height: int, width: int,
                 depth_factor: float = 5000.0,
                 n_threads: int = 2, prefetch: int = 6):
        self.items = list(items)
        self.h, self.w = height, width
        self.depth_factor = depth_factor
        self._lib = _build_and_load()
        self._handle = self._lib.dl_create(n_threads, prefetch)
        self._submitted = 0
        self._prefetch = prefetch

    def _submit_upto(self, n):
        while self._submitted < min(n, len(self.items)):
            rgb, dep = self.items[self._submitted]
            self._lib.dl_submit(
                self._handle, self._submitted, rgb.encode(),
                dep.encode() if dep else None,
                ctypes.c_float(self.depth_factor))
            self._submitted += 1

    def __len__(self):
        return len(self.items)

    def __iter__(self):
        gray = np.empty((self.h, self.w), np.float32)
        depth = np.empty((self.h, self.w), np.float32)
        for i in range(len(self.items)):
            self._submit_upto(i + self._prefetch)
            depth[:] = 0.0
            r = self._lib.dl_next(
                self._handle, i,
                gray.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
                depth.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
                self.h, self.w)
            if r != 1:
                raise IOError(
                    f"failed to load frame {i}: {self.items[i]} (code {r})")
            yield gray.copy(), depth.copy()

    def close(self):
        if self._handle:
            self._lib.dl_destroy(self._handle)
            self._handle = None

    def __del__(self):
        try:
            self.close()
        except Exception:
            pass
