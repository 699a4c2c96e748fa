"""Quantization: int8 weights (per-channel symmetric) + bf16 casting.

TPU-native counterpart of the reference's ONNX int8 static quantization
(`/root/reference/quantize1_onnx.py`): weights are stored int8 with
per-output-channel scales and dequantized on use (halving HBM footprint
and weight-load bandwidth); activation calibration collects moving-average
ranges over real batches. Like the reference, the detector's feature head
and the key-heatmap head are excluded from quantization
(`quantize1_onnx.py:96-117`), since downstream CRT decoding is sensitive
to their precision.
"""
from __future__ import annotations

import re
from typing import Dict, Iterable, Tuple

import numpy as np
import jax.numpy as jnp

# parameter paths excluded from quantization (regex on '/'-joined path).
# In the fused-head layout the per-head names live inside shared tensors;
# the sensitive outputs (feature head, key heatmap) are protected by
# excluding the top convs (top_feature_* / top_scalar_* — the latter
# carries the keymap's final conv), while the shared cascades quantize
# with per-output-channel scales (each head's channels scale
# independently).
DEFAULT_EXCLUDE = (
    r".*feature.*",        # 100-d feature head (incl. top_feature_*)
    r".*keyheatmap.*",     # key heatmap head (per-head layout)
    r".*top_scalar.*",     # fused scalar top conv (keymap final conv)
    r".*bn.*", r".*norm.*",  # normalization params stay float
    r".*pos_emb.*",
    r".*embed\d*/embedding$",
)


def _iter_paths(tree, prefix=""):
    if isinstance(tree, dict):
        for k, v in tree.items():
            yield from _iter_paths(v, f"{prefix}/{k}" if prefix else k)
    else:
        yield prefix, tree


def quantize_params(params, exclude: Iterable[str] = DEFAULT_EXCLUDE
                    ) -> Tuple[dict, dict]:
    """Quantize kernel/dense weights to int8.

    Returns (quantized_tree, scales_tree); quantized leaves are int8 with
    per-output-channel scales (last axis), excluded leaves pass through.
    """
    rx = [re.compile(p) for p in exclude]

    def quant(path, leaf):
        leaf = np.asarray(leaf)
        is_weight = path.endswith(("kernel",)) and leaf.ndim >= 2
        if not is_weight or any(r.match(path) for r in rx):
            return leaf, None
        axes = tuple(range(leaf.ndim - 1))
        amax = np.max(np.abs(leaf), axis=axes, keepdims=True)
        scale = np.where(amax > 0, amax / 127.0, 1.0).astype(np.float32)
        q = np.clip(np.round(leaf / scale), -127, 127).astype(np.int8)
        return q, scale

    qflat, sflat = {}, {}
    for path, leaf in _iter_paths(params):
        q, s = quant(path, leaf)
        qflat[path] = q
        if s is not None:
            sflat[path] = s

    def rebuild(tree, flat, prefix=""):
        if isinstance(tree, dict):
            return {k: rebuild(v, flat, f"{prefix}/{k}" if prefix else k)
                    for k, v in tree.items()}
        return flat[prefix]

    qtree = rebuild(params, qflat)
    return qtree, sflat


def dequantize_params(qtree, scales: Dict[str, np.ndarray],
                      dtype=jnp.bfloat16):
    """Materialize float params from an int8-quantized tree."""
    def walk(tree, prefix=""):
        if isinstance(tree, dict):
            return {k: walk(v, f"{prefix}/{k}" if prefix else k)
                    for k, v in tree.items()}
        if prefix in scales:
            return (np.asarray(tree, np.float32)
                    * scales[prefix]).astype(dtype)
        return tree

    return walk(qtree)


def cast_params(params, dtype=jnp.bfloat16, keep_norm_f32: bool = True):
    """Cast float params to bf16 (the TPU analog of the reference's fp16
    graph conversion, `convert_fp16_onnx.py`); norm params stay f32."""
    def walk(tree, prefix=""):
        if isinstance(tree, dict):
            return {k: walk(v, f"{prefix}/{k}" if prefix else k)
                    for k, v in tree.items()}
        arr = jnp.asarray(tree)
        if not jnp.issubdtype(arr.dtype, jnp.floating):
            return arr
        if keep_norm_f32 and re.search(r"(bn|norm)", prefix):
            return arr.astype(jnp.float32)
        return arr.astype(dtype)

    return walk(params)


def fake_quant(x, scale: float):
    """Symmetric int8 quantize-dequantize (the QDQ node pair of the
    reference's static quantization, `quantize1_onnx.py:96-117`)."""
    s = jnp.asarray(scale, jnp.float32)
    return jnp.clip(jnp.round(x / s), -127, 127) * s


def calibrate_detector(detector, variables, batches) -> "ActivationCalibrator":
    """Collect activation ranges at the detector's tensor boundaries
    (input, backbone taps, head outputs) over calibration batches —
    the reference calibrates with a moving average over 200 real
    samples (`quantize1_onnx.py:49-63`)."""
    import jax

    cal = ActivationCalibrator()

    @jax.jit
    def run(v, images):
        # capture only the backbone output (the 4 taps) — capturing every
        # submodule would hold the whole activation tree live (OOMs xl)
        return detector.apply(
            v, images,
            capture_intermediates=lambda mdl, _m: mdl.name == "backbone",
            mutable=["intermediates"])

    for images in batches:
        (heat, feats), st = run(variables, jnp.asarray(images))
        inter = st["intermediates"]
        taps = inter["backbone"]["__call__"][0]
        for i, t in enumerate(taps):
            cal.observe(f"tap{i}", t)
        cal.observe("heatmap", heat)
        cal.observe("features", feats)
    return cal


def calibrate_detector_edges(detector, variables, batches,
                             momentum: float = 0.95
                             ) -> Dict[str, Tuple[float, float]]:
    """Per-edge activation ranges for static QDQ quantization.

    Captures every flax module output and reduces it to (min, max)
    INSIDE the jitted call, so only scalars leave the device and XLA
    frees each intermediate right after its reduction (full-tree capture
    would hold the whole activation set live). Keys are '/'-joined
    module paths (e.g. ``backbone/stage0_block0/expand``) — the same
    paths :func:`..export.onnx_models.emit_detector_qdq` threads through
    emission. Mirrors the reference's moving-average calibration over
    real samples (`/root/reference/quantize1_onnx.py:49-63`).
    """
    import jax

    @jax.jit
    def run(v, images):
        (heat, feats), st = detector.apply(
            v, images, capture_intermediates=True,
            mutable=["intermediates"])
        flat = {}

        def walk(t, path):
            if isinstance(t, dict):
                for k, v2 in t.items():
                    walk(v2, path if k == "__call__" else path + (k,))
            elif isinstance(t, (tuple, list)):
                if len(t) == 1:
                    walk(t[0], path)
                else:
                    for i, v2 in enumerate(t):
                        walk(v2, path + (str(i),))
            else:
                flat["/".join(path)] = (jnp.min(t).astype(jnp.float32),
                                        jnp.max(t).astype(jnp.float32))

        walk(st["intermediates"], ())
        flat["__output_heatmap__"] = (jnp.min(heat).astype(jnp.float32),
                                      jnp.max(heat).astype(jnp.float32))
        flat["__output_features__"] = (jnp.min(feats).astype(jnp.float32),
                                       jnp.max(feats).astype(jnp.float32))
        return flat

    ranges: Dict[str, Tuple[float, float]] = {}
    for images in batches:
        flat = run(variables, jnp.asarray(images))
        for k, (lo, hi) in flat.items():
            lo, hi = float(lo), float(hi)
            if k in ranges:
                plo, phi = ranges[k]
                ranges[k] = (momentum * plo + (1 - momentum) * lo,
                             momentum * phi + (1 - momentum) * hi)
            else:
                ranges[k] = (lo, hi)
    return ranges


def build_int8_detector(detector, variables,
                        calibrator: "ActivationCalibrator" = None,
                        exclude: Iterable[str] = DEFAULT_EXCLUDE):
    """Int8-weight detector: per-channel int8 weights with the
    reference's feature/keymap head exclusions, dequantized on use.

    Returns ``(fn, qvars)`` where ``fn(qvars, images_uint8)`` is
    jittable/exportable (``export.save_exported``) — the StableHLO
    artifact then carries int8 weight tensors with embedded dequant,
    halving weight storage and HBM weight reads on load. ``qvars`` is
    placed on device so repeated live calls don't re-upload the tree.

    The model *outputs* stay float: the reference's exclusion walk
    (`quantize1_onnx.py:96-117`) removes QDQ from every node on the
    feature path and the heatmap tail, so quantizing them here would
    diverge from the artifact being mirrored. Full static activation
    QDQ (internal edges, calibrated) is the ONNX exporter's job
    (``onnx_models --int8``); ``calibrator`` is accepted for API
    symmetry with that path and unused here.
    """
    import jax

    del calibrator
    qparams, scales = quantize_params(variables["params"], exclude)

    def dequant(tree, prefix=""):
        if isinstance(tree, dict):
            return {k: dequant(v, f"{prefix}/{k}" if prefix else k)
                    for k, v in tree.items()}
        if prefix in scales:
            return (jnp.asarray(tree, jnp.float32)
                    * jnp.asarray(scales[prefix])).astype(jnp.bfloat16)
        return jnp.asarray(tree)

    batch_stats = jax.tree_util.tree_map(np.asarray,
                                         variables["batch_stats"])

    def fn(qvars, images):
        params = dequant(qvars["params"])
        x = images.astype(jnp.float32)
        if images.dtype == jnp.uint8:
            x = x / 255.0
        return detector.apply(
            {"params": params, "batch_stats": qvars["batch_stats"]}, x)

    qvars = jax.device_put({"params": qparams,
                            "batch_stats": batch_stats})
    return fn, qvars


class ActivationCalibrator:
    """Moving-average activation ranges over calibration batches
    (reference uses 200 real samples with moving-average calibration)."""

    def __init__(self, momentum: float = 0.95):
        self.momentum = momentum
        self.ranges: Dict[str, Tuple[float, float]] = {}

    def observe(self, name: str, arr) -> None:
        lo = float(jnp.min(arr))
        hi = float(jnp.max(arr))
        if name in self.ranges:
            plo, phi = self.ranges[name]
            m = self.momentum
            self.ranges[name] = (m * plo + (1 - m) * lo,
                                 m * phi + (1 - m) * hi)
        else:
            self.ranges[name] = (lo, hi)

    def scale(self, name: str) -> float:
        lo, hi = self.ranges[name]
        return max(abs(lo), abs(hi)) / 127.0
