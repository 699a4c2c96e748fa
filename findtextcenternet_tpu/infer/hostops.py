"""ctypes bindings for the native host-side OCR ops (native/hostops).

Bit-equivalent C++ versions of the page-level python loops: histogram
contrast over crop rectangles and greedy IoU/fill dedup. The pipeline
falls back to the numpy implementations when the library isn't built.
"""
from __future__ import annotations

import ctypes
import os
import subprocess
from typing import Optional

import numpy as np

_NATIVE_DIR = os.path.abspath(os.path.join(
    os.path.dirname(__file__), "..", "..", "native", "hostops"))
LIB_PATH = os.path.join(_NATIVE_DIR, "libhostops.so")

_lib = None


def _load() -> Optional[ctypes.CDLL]:
    global _lib
    if _lib is None and os.path.exists(LIB_PATH):
        lib = ctypes.CDLL(LIB_PATH)
        lib.hostops_hist_contrast.argtypes = [
            ctypes.POINTER(ctypes.c_uint8), ctypes.c_int, ctypes.c_int,
            ctypes.c_int, ctypes.POINTER(ctypes.c_int32), ctypes.c_int,
            ctypes.POINTER(ctypes.c_float)]
        lib.hostops_greedy_dedup.argtypes = [
            ctypes.POINTER(ctypes.c_float), ctypes.c_int, ctypes.c_float,
            ctypes.c_float, ctypes.c_float,
            ctypes.POINTER(ctypes.c_uint8)]
        _lib = lib
    return _lib


def build_native() -> bool:
    if os.path.exists(LIB_PATH):
        return True
    try:
        subprocess.run(["make", "-C", _NATIVE_DIR], check=True,
                       capture_output=True)
        return True
    except Exception:
        return False


def available() -> bool:
    return _load() is not None


def hist_contrast(img: np.ndarray, rects: np.ndarray) -> np.ndarray:
    """(N,) max-over-channel 2-means histogram distance per crop rect."""
    lib = _load()
    img = np.ascontiguousarray(img, dtype=np.uint8)
    rects = np.ascontiguousarray(rects, dtype=np.int32)
    out = np.zeros(len(rects), np.float32)
    if len(rects) == 0:
        return out
    h, w = img.shape[:2]
    c = img.shape[2] if img.ndim == 3 else 1
    lib.hostops_hist_contrast(
        img.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)), h, w, c,
        rects.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)), len(rects),
        out.ctypes.data_as(ctypes.POINTER(ctypes.c_float)))
    return out


def greedy_dedup(boxes_cxcywh: np.ndarray, iou_th: float,
                 overlap_th: float, fill_th: float) -> np.ndarray:
    """(N,) bool keep mask over score-descending candidates."""
    lib = _load()
    b = np.ascontiguousarray(boxes_cxcywh, dtype=np.float32)
    keep = np.zeros(len(b), np.uint8)
    if len(b) == 0:
        return keep.astype(bool)
    lib.hostops_greedy_dedup(
        b.ctypes.data_as(ctypes.POINTER(ctypes.c_float)), len(b),
        float(iou_th), float(overlap_th), float(fill_th),
        keep.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)))
    return keep.astype(bool)
