"""ctypes binding for the native C++ preprocessing library.

The reference does all image preprocessing in Python per item
(/root/reference/minimagen/training.py:33-56,145-175); here the batch resize/
normalize hot path runs in `native/preprocess.cpp` (multithreaded antialiased
bicubic, C ABI via ctypes — no pybind11).  Falls back to the PIL path in
dataset.py when the shared library is missing and cannot be built.
"""
from __future__ import annotations

import ctypes
import os
import subprocess
import threading
from typing import List, Optional

import numpy as np

_LIB_NAME = "libminimagen_native.so"
_NATIVE_DIR = os.path.join(os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__)))), "native")

_lock = threading.Lock()
_lib: Optional[ctypes.CDLL] = None
_tried = False


def _build() -> Optional[str]:
    """Attempt to build the shared library with make/g++; None on failure."""
    path = os.path.join(_NATIVE_DIR, _LIB_NAME)
    if os.path.exists(path):
        return path
    try:
        subprocess.run(["make", "-C", _NATIVE_DIR], check=True,
                       capture_output=True, timeout=120)
        return path if os.path.exists(path) else None
    except Exception:
        return None


def _load() -> Optional[ctypes.CDLL]:
    global _lib, _tried
    with _lock:
        if _lib is not None or _tried:
            return _lib
        _tried = True
        if os.environ.get("MINIMAGEN_TPU_DISABLE_NATIVE"):
            return None
        path = _build()
        if path is None:
            return None
        try:
            lib = ctypes.CDLL(path)
        except OSError:
            return None

        lib.mm_preprocess_batch.restype = ctypes.c_int
        lib.mm_preprocess_batch.argtypes = [
            ctypes.POINTER(ctypes.c_uint8), ctypes.POINTER(ctypes.c_int64),
            ctypes.POINTER(ctypes.c_int32), ctypes.POINTER(ctypes.c_int32),
            ctypes.c_int32, ctypes.c_int32, ctypes.c_int32, ctypes.c_int32,
            ctypes.POINTER(ctypes.c_float), ctypes.c_int32,
        ]
        lib.mm_resize_image.restype = ctypes.c_int
        lib.mm_resize_image.argtypes = [
            ctypes.POINTER(ctypes.c_uint8), ctypes.c_int32, ctypes.c_int32,
            ctypes.c_int32, ctypes.POINTER(ctypes.c_float), ctypes.c_int32,
            ctypes.c_int32,
        ]
        _lib = lib
        return _lib


def available() -> bool:
    return _load() is not None


def resize_image_u8(img: np.ndarray, side: int, renorm: bool = True) -> Optional[np.ndarray]:
    """Resize one (h, w, c) uint8 image to (side, side, c) float32 [0,1]
    (min-max renormalized like reference _Rescale when `renorm`)."""
    lib = _load()
    if lib is None:
        return None
    img = np.ascontiguousarray(img, dtype=np.uint8)
    h, w, c = img.shape
    out = np.empty((side, side, c), np.float32)
    rc = lib.mm_resize_image(
        img.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
        np.int32(h), np.int32(w), np.int32(c),
        out.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
        np.int32(side), np.int32(1 if renorm else 0),
    )
    return out if rc == 0 else None


def resize_batch_u8(images: List[np.ndarray], side: int, renorm: bool = True,
                    n_threads: int = 0) -> Optional[np.ndarray]:
    """Resize a list of (h_i, w_i, c) uint8 images into one
    (n, side, side, c) float32 batch; parallel over images in C++."""
    lib = _load()
    if lib is None or not images:
        return None
    c = images[0].shape[2]
    flat = [np.ascontiguousarray(im, dtype=np.uint8) for im in images]
    offsets = np.zeros(len(flat), np.int64)
    heights = np.zeros(len(flat), np.int32)
    widths = np.zeros(len(flat), np.int32)
    total = 0
    for i, im in enumerate(flat):
        offsets[i] = total
        heights[i], widths[i] = im.shape[0], im.shape[1]
        total += im.size
    buf = np.empty(total, np.uint8)
    for i, im in enumerate(flat):
        buf[offsets[i] : offsets[i] + im.size] = im.reshape(-1)

    out = np.empty((len(flat), side, side, c), np.float32)
    rc = lib.mm_preprocess_batch(
        buf.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
        offsets.ctypes.data_as(ctypes.POINTER(ctypes.c_int64)),
        heights.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
        widths.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
        np.int32(len(flat)), np.int32(c), np.int32(side),
        np.int32(1 if renorm else 0),
        out.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
        np.int32(n_threads),
    )
    return out if rc == 0 else None
