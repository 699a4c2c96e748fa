"""CLI: page OCR. Equivalent of the reference's ``run_ocr.py``.

Usage:
    python -m findtextcenternet_tpu.infer.run_ocr [--resize=F]
        [--model-size=xl] [--model-pt=path] [--model3-pt=path]
        [--random-weights] [--tiny] [--onnx-dir=DIR] [--coreml-dir=DIR]
        images...

Weights: by default looks for ``model.pt`` / ``model3.pt`` in the CWD and
imports them (`io/torch_import.py`); ``--random-weights`` runs the full
pipeline with randomly initialized weights (smoke/benchmark mode);
``--onnx-dir`` runs from the exported ONNX artifacts instead of live
weights (the reference's ``run_ocr.py onnx`` / ``process_ocr_onnx.py``
backend) — expects TextDetector.onnx, TransformerEncoder.onnx and
TransformerDecoder.onnx in DIR (written by
``python -m findtextcenternet_tpu.export.onnx_models``);
``--coreml-dir`` runs the same artifacts through the CoreML MIL op
mapping under the deployed-mlpackage contract (the reference's
``run_ocr.py coreml`` / ``process_ocr_coreml.py`` backend).
"""
from __future__ import annotations

import dataclasses
import glob
import os
import sys

from ..config import Config
from ..utils.text import decode_ruby
from .pipeline import OCRPipeline, ocr_file


def build_pipeline(model_size: str = "xl", model_pt: str = "model.pt",
                   model3_pt: str = "model3.pt",
                   random_weights: bool = False,
                   onnx_dir: str | None = None,
                   coreml_dir: str | None = None):
    """Construct an OCRPipeline the way the CLIs do: import reference
    checkpoints when present, else random weights; ``tiny`` swaps in the
    fast smoke config; ``onnx_dir`` drives the exported ONNX artifacts;
    ``coreml_dir`` drives them through the CoreML MIL mapping.
    Shared by run_ocr and tools/visualize."""
    cfg = Config()
    if model_size != cfg.detector.model_size:
        cfg = dataclasses.replace(
            cfg, detector=dataclasses.replace(
                cfg.detector, model_size=model_size))
    if model_size == "tiny":
        # true smoke config: small transformer + small tiles so the CPU
        # compile finishes in seconds
        cfg = dataclasses.replace(
            cfg,
            detector=dataclasses.replace(cfg.detector, feature_dim=8,
                                         decoder_mid_dim=32),
            transformer=dataclasses.replace(
                cfg.transformer, enc_input_dim=8 + 6, embed_dim=32,
                head_num=4, enc_block_num=1, dec_block_num=1,
                max_enc_seq_len=32, max_dec_seq_len=32),
            inference=dataclasses.replace(
                cfg.inference, tile_size=256, detector_batch=1,
                max_peaks_per_tile=64),
            mask_predict=dataclasses.replace(cfg.mask_predict,
                                             max_rounds=2))

    if onnx_dir and coreml_dir:
        raise ValueError(
            "--onnx-dir and --coreml-dir are mutually exclusive backends; "
            "pass exactly one")
    if onnx_dir or coreml_dir:
        from .onnx_backend import ARTIFACT_NAMES
        art_dir = onnx_dir or coreml_dir
        paths = {k: os.path.join(art_dir, v)
                 for k, v in ARTIFACT_NAMES.items()}
        if coreml_dir:
            blobs = {k: open(paths[k], "rb").read()
                     for k in ("detector", "encoder", "decoder")}
            pipeline = OCRPipeline.from_coreml(
                blobs["detector"], blobs["encoder"], blobs["decoder"],
                cfg, model_size)
            print(f"loaded artifacts from {art_dir} (CoreML MIL backend)")
        else:
            pipeline = OCRPipeline.from_onnx(
                paths["detector"], paths["encoder"], paths["decoder"],
                cfg, model_size)
            print(f"loaded ONNX artifacts from {onnx_dir}")
    elif not random_weights and os.path.exists(model_pt) and \
            os.path.exists(model3_pt):
        pipeline = OCRPipeline.from_torch_checkpoints(
            model_pt, model3_pt, cfg, model_size)
        print(f"loaded weights: {model_pt}, {model3_pt}")
    else:
        pipeline = OCRPipeline(cfg, model_size=model_size)
        print("using random weights (smoke mode)")
    return pipeline


def main(argv=None):
    argv = list(sys.argv[1:] if argv is None else argv)
    resize = 1.0
    model_size = "xl"
    model_pt, model3_pt = "model.pt", "model3.pt"
    random_weights = False
    twopass = False
    onnx_dir = None
    coreml_dir = None
    files = []
    for a in argv:
        if a.startswith("--resize="):
            resize = float(a.split("=", 1)[1])
        elif a.startswith("--model-size="):
            model_size = a.split("=", 1)[1]
        elif a.startswith("--model-pt="):
            model_pt = a.split("=", 1)[1]
        elif a.startswith("--model3-pt="):
            model3_pt = a.split("=", 1)[1]
        elif a == "--random-weights":
            random_weights = True
        elif a == "--twopass":
            twopass = True
        elif a.startswith("--onnx-dir="):
            onnx_dir = a.split("=", 1)[1]
        elif a.startswith("--coreml-dir="):
            coreml_dir = a.split("=", 1)[1]
        elif a == "--tiny":
            model_size = "tiny"
            random_weights = True
        else:
            files.extend(glob.glob(a))

    if not files:
        print(__doc__)
        return 1

    pipeline = build_pipeline(model_size, model_pt, model3_pt,
                              random_weights, onnx_dir=onnx_dir,
                              coreml_dir=coreml_dir)

    if len(files) > 1:
        # multi-page runs pipeline host stages of page N against device
        # work of page N+1 (ocr_pages' threaded software pipeline)
        import json as _json

        import numpy as np
        from PIL import Image as PILImage

        from .pipeline import ocr_pages
        # bounded groups keep peak memory at a few decoded pages, not
        # the whole book, while the software pipeline still overlaps
        # pages within each group
        group = 8
        for g0 in range(0, len(files), group):
            batch_files = files[g0:g0 + group]
            images = [np.asarray(PILImage.open(f).convert("RGB"))
                      for f in batch_files]
            outs = ocr_pages(pipeline, images, resize=resize,
                             twopass=twopass)
            for f, out in zip(batch_files, outs):
                with open(f + ".json", "w", encoding="utf-8") as fp:
                    _json.dump(out, fp, ensure_ascii=False, indent=1)
                print(f"== {f}")
                print(decode_ruby(out["text"], "aozora"))
        return 0

    for f in files:
        print(f"== {f}")
        out = ocr_file(f, pipeline, resize, twopass=twopass)
        print(decode_ruby(out["text"], "aozora"))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
