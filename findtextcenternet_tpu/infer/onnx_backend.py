"""OCR inference from the exported ONNX artifacts.

The deployment analog of the reference's ``process_ocr_onnx.py`` driver
(`/root/reference/process_ocr_onnx.py:27-104`, selected by
``run_ocr.py onnx``): detection and mask-predict decode call the
serialized ``TextDetector.onnx`` / ``TransformerEncoder.onnx`` /
``TransformerDecoder.onnx`` graphs, while every host pipeline stage
(filters, line engine, stream build, assembly) is shared with the live
pipeline.

Runtime selection mirrors a real deploy: ``onnxruntime`` is used when
importable; otherwise the in-tree numpy evaluator
(:class:`..export.onnx_writer.OnnxEvaluator`) executes the graph — slow
but dependency-free, and exactly the evaluator the export tests validate
against flax.

The artifacts carry a symbolic batch dim with baked spatial / sequence
dims (`..export.onnx_models`; spatial shapes match the reference's
export, `/root/reference/convert1_onnx.py:29-55`), so a whole tile
chunk or window bucket evaluates in one session call; the pipeline's
jitted stages reach the sessions through ``jax.pure_callback``.
"""
from __future__ import annotations

import os
from typing import Dict, Union

import numpy as np

__all__ = ["OnnxSession", "ARTIFACT_NAMES"]

# reference artifact file names (convert1_onnx.py / convert3_onnx.py)
ARTIFACT_NAMES = {
    "detector": "TextDetector.onnx",
    "encoder": "TransformerEncoder.onnx",
    "decoder": "TransformerDecoder.onnx",
    "code_decoder": "CodeDecoder.onnx",
}


class OnnxSession:
    """One loaded ONNX graph; ``session(**feeds) -> {name: array}``."""

    def __init__(self, model: Union[str, bytes, os.PathLike]):
        if isinstance(model, (str, os.PathLike)):
            with open(model, "rb") as f:
                data = f.read()
        else:
            data = bytes(model)
        try:
            import onnxruntime as ort
        except ImportError:
            ort = None
        if ort is not None:
            self._sess = ort.InferenceSession(
                data, providers=["CPUExecutionProvider"])
            self._out_names = [o.name for o in self._sess.get_outputs()]
            self._eval = None
            # current artifacts carry a symbolic batch dim; artifacts
            # exported before that carry a literal 1 — loop per sample
            # for those instead of crashing the session
            self._fixed_batch1 = any(
                (i.shape and i.shape[0] == 1)
                for i in self._sess.get_inputs())
        else:
            from ..export.onnx_writer import OnnxEvaluator
            self._sess = None
            self._eval = OnnxEvaluator(data)
            self._fixed_batch1 = False

    @property
    def backend(self) -> str:
        return "onnxruntime" if self._sess is not None else "numpy"

    def __call__(self, **feeds) -> Dict[str, np.ndarray]:
        feeds = {k: np.asarray(v) for k, v in feeds.items()}
        if self._sess is not None:
            n = max(v.shape[0] for v in feeds.values())
            if self._fixed_batch1 and n > 1:
                per = [self._sess.run(None, {k: v[i:i + 1]
                                             for k, v in feeds.items()})
                       for i in range(n)]
                return {name: np.concatenate([p[j] for p in per], axis=0)
                        for j, name in enumerate(self._out_names)}
            outs = self._sess.run(None, feeds)
            return dict(zip(self._out_names, outs))
        return self._eval(**feeds)
