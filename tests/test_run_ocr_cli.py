"""run_ocr CLI: --tiny smoke mode OCRs a page end to end and writes the
JSON sidecar (reference run_ocr.py behavior)."""
import json
import os

import numpy as np
import pytest
from PIL import Image

from findtextcenternet_tpu.infer import lineengine


@pytest.fixture(scope="module", autouse=True)
def engine():
    if not lineengine.build_native():
        pytest.skip("native line engine not buildable")


def test_cli_tiny_smoke(tmp_path, capsys, monkeypatch):
    from findtextcenternet_tpu.infer.run_ocr import main

    img = np.full((300, 400, 3), 255, np.uint8)
    for i in range(4):
        img[120:160, 40 + 80 * i:80 + 80 * i] = 0
    path = str(tmp_path / "page.png")
    Image.fromarray(img).save(path)

    monkeypatch.chdir(tmp_path)
    rc = main(["--tiny", path])
    assert rc == 0
    out = capsys.readouterr().out
    assert "random weights" in out
    with open(path + ".json", encoding="utf-8") as f:
        data = json.load(f)
    assert set(data) >= {"box", "line", "block", "text", "aozora",
                         "noruby"}


def test_cli_no_files_prints_usage(capsys):
    from findtextcenternet_tpu.infer.run_ocr import main
    assert main([]) == 1
    assert "Usage" in capsys.readouterr().out


def test_cli_onnx_dir(tmp_path, capsys, monkeypatch):
    """--onnx-dir drives the whole pipeline from exported artifacts
    (the reference's ``run_ocr.py onnx`` backend)."""
    import jax

    from findtextcenternet_tpu.export.onnx_models import (
        emit_detector, emit_transformer_decoder, emit_transformer_encoder)
    from findtextcenternet_tpu.infer.run_ocr import build_pipeline, main

    pipe = build_pipeline("tiny", random_weights=True)
    np_det = jax.tree.map(np.asarray, pipe.det_vars)
    np_tf = jax.tree.map(np.asarray, pipe.tf_vars)
    tile = pipe.cfg.inference.tile_size
    (tmp_path / "TextDetector.onnx").write_bytes(
        emit_detector(np_det, "tiny", height=tile, width=tile,
                      feature_dim=pipe.cfg.detector.feature_dim))
    (tmp_path / "TransformerEncoder.onnx").write_bytes(
        emit_transformer_encoder(np_tf, pipe.transformer.dims))
    (tmp_path / "TransformerDecoder.onnx").write_bytes(
        emit_transformer_decoder(np_tf, pipe.transformer.dims))

    img = np.full((300, 400, 3), 255, np.uint8)
    for i in range(4):
        img[120:160, 40 + 80 * i:80 + 80 * i] = 0
    path = str(tmp_path / "page.png")
    Image.fromarray(img).save(path)

    monkeypatch.chdir(tmp_path)
    rc = main([f"--onnx-dir={tmp_path}", "--tiny", path])
    assert rc == 0
    assert "loaded ONNX artifacts" in capsys.readouterr().out
    with open(path + ".json", encoding="utf-8") as f:
        data = json.load(f)
    assert set(data) >= {"box", "line", "block", "text"}
