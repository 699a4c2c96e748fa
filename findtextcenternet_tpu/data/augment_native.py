"""ctypes binding to the native C++ augmentation kernels.

Drop-in for :func:`.augment.apply_transform_numpy` (the semantics
reference); see ``native/augment/augment.cpp``.
"""
from __future__ import annotations

import ctypes
import os
import subprocess
from typing import Tuple

import numpy as np

from ..const import IMAGE_HEIGHT, IMAGE_WIDTH, SCALE

_NATIVE_DIR = os.path.abspath(os.path.join(
    os.path.dirname(__file__), "..", "..", "native", "augment"))
LIB_PATH = os.path.join(_NATIVE_DIR, "libaugment.so")

_lib = None
_load_failed = False


def build_native() -> bool:
    if os.path.exists(LIB_PATH):
        return True
    try:
        subprocess.run(["make", "-C", _NATIVE_DIR], check=True,
                       capture_output=True)
        return True
    except Exception:
        return False


def native_available() -> bool:
    global _load_failed
    if _load_failed:
        return False
    if _lib is not None:
        return True
    if not os.path.exists(LIB_PATH):
        _load_failed = True
        return False
    try:
        _load()
        return True
    except Exception:
        _load_failed = True
        return False


def _load():
    global _lib
    if _lib is not None:
        return _lib
    lib = ctypes.CDLL(LIB_PATH)
    u8p = ctypes.POINTER(ctypes.c_uint8)
    f32p = ctypes.POINTER(ctypes.c_float)
    i32p = ctypes.POINTER(ctypes.c_int32)
    f64p = ctypes.POINTER(ctypes.c_double)
    lib.augment_apply.restype = ctypes.c_int
    lib.augment_apply.argtypes = [
        u8p, ctypes.c_int, ctypes.c_int,
        u8p, u8p, ctypes.c_int, ctypes.c_int,
        f32p, i32p, ctypes.c_int,
        f64p, ctypes.c_int, ctypes.c_int, ctypes.c_int,
        f32p, f32p, i32p, f32p,
    ]
    _lib = lib
    return lib


def apply_transform_native(image, textline, sepline, position, codelist,
                           params,
                           out_hw: Tuple[int, int] = (IMAGE_HEIGHT,
                                                      IMAGE_WIDTH),
                           scale: int = SCALE):
    lib = _load()
    out_h, out_w = out_hw
    mh, mw = out_h // scale, out_w // scale
    image = np.ascontiguousarray(image, np.uint8)
    textline = np.ascontiguousarray(textline, np.uint8)
    sepline = np.ascontiguousarray(sepline, np.uint8)
    position = np.ascontiguousarray(position, np.float32).reshape(-1, 4)
    codelist = np.ascontiguousarray(codelist, np.int32).reshape(-1, 2)
    n = len(position)

    out_img = np.empty((out_h, out_w), np.float32)
    out_label = np.empty((mh, mw, 5), np.float32)
    out_id = np.empty((mh, mw, 2), np.int32)
    out_pos = np.empty((n, 4), np.float32)
    prm = np.ascontiguousarray(params.as_array(), np.float64)

    u8p = ctypes.POINTER(ctypes.c_uint8)
    f32p = ctypes.POINTER(ctypes.c_float)
    i32p = ctypes.POINTER(ctypes.c_int32)
    f64p = ctypes.POINTER(ctypes.c_double)
    rc = lib.augment_apply(
        image.ctypes.data_as(u8p), image.shape[0], image.shape[1],
        textline.ctypes.data_as(u8p), sepline.ctypes.data_as(u8p),
        textline.shape[0], textline.shape[1],
        position.ctypes.data_as(f32p), codelist.ctypes.data_as(i32p), n,
        prm.ctypes.data_as(f64p), out_h, out_w, scale,
        out_img.ctypes.data_as(f32p), out_label.ctypes.data_as(f32p),
        out_id.ctypes.data_as(i32p), out_pos.ctypes.data_as(f32p))
    if rc != 0:
        raise RuntimeError(f"augment_apply failed: {rc}")
    minsize = 0.0
    if n:
        inb = ((out_pos[:, 0] > 0) & (out_pos[:, 0] < out_w) &
               (out_pos[:, 1] > 0) & (out_pos[:, 1] < out_h))
        sizes = np.maximum(out_pos[:, 2], out_pos[:, 3])[inb]
        if len(sizes):
            minsize = float(sizes.min())
    return out_img, out_label, out_id, minsize, out_pos
