"""ctypes wrapper for the native prefetching image loader.

The C++ runtime (native/dvio_runtime.cpp) overlaps disk reads + image
decode with TPU compute using worker threads and a bounded in-order
queue — the reference's Dataloader/ImageProcess-thread role. Falls back
to cv2 if the shared library is not built.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
from typing import Iterator, List, Optional, Tuple

import numpy as np

_LIB_PATH = os.path.join(os.path.dirname(__file__), "..", "..",
                         "native", "libdvio_runtime.so")
_lib = None


def _load_lib(build_if_missing: bool = True):
    global _lib
    if _lib is not None:
        return _lib
    path = os.path.abspath(_LIB_PATH)
    if not os.path.exists(path) and build_if_missing:
        script = os.path.join(os.path.dirname(path), "build.sh")
        try:
            subprocess.run(["sh", script], check=True,
                           capture_output=True, timeout=120)
        except Exception:
            return None
    if not os.path.exists(path):
        return None
    lib = ctypes.CDLL(path)
    lib.dvio_loader_create.restype = ctypes.c_void_p
    lib.dvio_loader_create.argtypes = [
        ctypes.POINTER(ctypes.c_char_p), ctypes.c_int, ctypes.c_int,
        ctypes.c_int]
    lib.dvio_loader_next.restype = ctypes.c_int
    lib.dvio_loader_next.argtypes = [
        ctypes.c_void_p, ctypes.POINTER(ctypes.c_uint8), ctypes.c_long,
        ctypes.POINTER(ctypes.c_int), ctypes.POINTER(ctypes.c_int)]
    lib.dvio_loader_destroy.argtypes = [ctypes.c_void_p]
    lib.dvio_decode.restype = ctypes.c_int
    lib.dvio_decode.argtypes = [
        ctypes.c_char_p, ctypes.POINTER(ctypes.c_uint8), ctypes.c_long,
        ctypes.POINTER(ctypes.c_int), ctypes.POINTER(ctypes.c_int)]
    _lib = lib
    return lib


def native_available() -> bool:
    return _load_lib() is not None


def decode_image(path: str, max_hw: Tuple[int, int] = (2048, 4096)
                 ) -> Optional[np.ndarray]:
    """Decode one image to grayscale uint8 via the native decoder."""
    lib = _load_lib()
    if lib is None:
        return None
    buf = np.empty(max_hw[0] * max_hw[1], np.uint8)
    h = ctypes.c_int()
    w = ctypes.c_int()
    rc = lib.dvio_decode(
        path.encode(), buf.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
        buf.size, ctypes.byref(h), ctypes.byref(w))
    if rc != 0:
        return None
    return buf[: h.value * w.value].reshape(h.value, w.value).copy()


class PrefetchLoader:
    """Iterate decoded grayscale frames with native multi-threaded
    prefetch; falls back to sequential cv2 decoding."""

    def __init__(self, paths: List[str], workers: int = 2,
                 capacity: int = 8,
                 max_hw: Tuple[int, int] = (2048, 4096)):
        self.paths = list(paths)
        self.max_hw = max_hw
        self._lib = _load_lib()
        self._handle = None
        if self._lib is not None:
            arr = (ctypes.c_char_p * len(self.paths))(
                *[p.encode() for p in self.paths])
            self._handle = self._lib.dvio_loader_create(
                arr, len(self.paths), workers, capacity)

    def __iter__(self) -> Iterator[Tuple[int, np.ndarray]]:
        if self._handle:
            buf = np.empty(self.max_hw[0] * self.max_hw[1], np.uint8)
            h = ctypes.c_int()
            w = ctypes.c_int()
            while True:
                rc = self._lib.dvio_loader_next(
                    self._handle,
                    buf.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
                    buf.size, ctypes.byref(h), ctypes.byref(w))
                if rc == -1:
                    break
                if rc == -2:
                    continue
                yield rc, buf[: h.value * w.value].reshape(
                    h.value, w.value).copy()
        else:
            import cv2

            for i, p in enumerate(self.paths):
                img = cv2.imread(p, cv2.IMREAD_GRAYSCALE)
                if img is not None:
                    yield i, img

    def close(self):
        if self._handle and self._lib:
            self._lib.dvio_loader_destroy(self._handle)
            self._handle = None

    def __del__(self):
        self.close()
