"""Python interface to the native text-line ordering engine.

Two transports to the same C++ pipeline (``native/lineengine``):
  * in-process via ctypes (``liblineengine.so``) — no serialization;
  * subprocess with the reference-compatible stdin/stdout binary protocol
    (`/root/reference/textline_detect/src/main.cpp:100-183`) — used for
    golden-file testing and as a drop-in for the reference binary.
"""
from __future__ import annotations

import ctypes
import os
import struct
import subprocess
from typing import Optional

import numpy as np

_NATIVE_DIR = os.path.abspath(os.path.join(
    os.path.dirname(__file__), "..", "..", "native", "lineengine"))
LIB_PATH = os.path.join(_NATIVE_DIR, "liblineengine.so")
BIN_PATH = os.path.join(_NATIVE_DIR, "linedetect")

_lib = None


def _load_lib():
    global _lib
    if _lib is None:
        lib = ctypes.CDLL(LIB_PATH)
        lib.lineengine_process.restype = ctypes.c_int
        lib.lineengine_process.argtypes = [
            ctypes.POINTER(ctypes.c_float), ctypes.POINTER(ctypes.c_float),
            ctypes.c_int, ctypes.c_int,
            ctypes.POINTER(ctypes.c_float), ctypes.c_int,
            ctypes.POINTER(ctypes.c_double),
            ctypes.POINTER(ctypes.c_int32),
        ]
        _lib = lib
    return _lib


def build_native() -> bool:
    """Build the engine if sources are present; True when ready."""
    if os.path.exists(LIB_PATH) and os.path.exists(BIN_PATH):
        return True
    try:
        subprocess.run(["make", "-C", _NATIVE_DIR], check=True,
                       capture_output=True)
        return True
    except Exception:
        return False


def detect_lines(lineimage: np.ndarray, sepimage: np.ndarray,
                 boxes: np.ndarray, params: Optional[dict] = None,
                 use_subprocess: bool = False) -> np.ndarray:
    """Order character boxes into lines/blocks.

    lineimage/sepimage: (h, w) float32 probability maps at 1/scale.
    boxes: (N, 8) float32 [cx, cy, w, h, code1, code2, code4, code8] in
    image pixels. Returns (N, 7) int32
    [id, block, idx, subidx, subtype, page, section] in reading order.
    """
    lineimage = np.ascontiguousarray(lineimage, dtype=np.float32)
    sepimage = np.ascontiguousarray(sepimage, dtype=np.float32)
    boxes = np.ascontiguousarray(boxes, dtype=np.float32)
    n = len(boxes)
    h, w = lineimage.shape

    if use_subprocess or not os.path.exists(LIB_PATH):
        return _detect_subprocess(lineimage, sepimage, boxes, params)

    lib = _load_lib()
    out = np.zeros((n, 7), dtype=np.int32)
    p10 = None
    if params:
        defaults = [0.25, 0.75, 0.5, 0.5, 0.4, 0.1, 1.5, 0.5, 0, 0.15]
        keys = ["ruby_cutoff", "rubybase_cutoff", "space_cutoff",
                "emphasis_cutoff", "line_valueth", "sep_valueth",
                "allowwidth_next_block", "allow_sizediff", "page_divide",
                "sep_valueth2"]
        vals = [float(params.get(k, d)) for k, d in zip(keys, defaults)]
        p10 = (ctypes.c_double * 10)(*vals)
    count = lib.lineengine_process(
        lineimage.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
        sepimage.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
        w, h,
        boxes.ctypes.data_as(ctypes.POINTER(ctypes.c_float)), n,
        p10,
        out.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)))
    # boxes without a block assignment are dropped by the engine
    return out[:count].copy()


def _detect_subprocess(lineimage, sepimage, boxes, params=None) -> np.ndarray:
    h, w = lineimage.shape
    blob = struct.pack("<III", 0, w, h)
    blob += lineimage.tobytes() + sepimage.tobytes()
    blob += struct.pack("<I", len(boxes))
    blob += boxes.tobytes()

    args = [BIN_PATH]
    for k, v in (params or {}).items():
        args.append(f"--{k}={v}")
    res = subprocess.run(args, input=blob, stdout=subprocess.PIPE,
                         stderr=subprocess.DEVNULL, check=True)
    out = res.stdout
    (count,) = struct.unpack_from("<I", out, 0)
    arr = np.frombuffer(out[4:4 + count * 28], dtype=np.int32)
    return arr.reshape(count, 7).copy()
