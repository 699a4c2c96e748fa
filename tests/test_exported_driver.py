"""Exported-artifact inference driver: pipeline from StableHLO artifacts
reproduces the live-weights pipeline (the TPU analog of the reference's
onnx/coreml backends, `/root/reference/process_ocr_onnx.py:27-72`)."""
import dataclasses

import numpy as np
import pytest

from findtextcenternet_tpu.config import Config
from findtextcenternet_tpu.export.export import (
    export_detector, export_transformer_decoder,
    export_transformer_encoder,
)
from findtextcenternet_tpu.infer import lineengine
from findtextcenternet_tpu.infer.pipeline import OCRPipeline


@pytest.fixture(scope="module")
def tiny_cfg():
    return dataclasses.replace(
        Config(),
        detector=dataclasses.replace(Config().detector, model_size="tiny"),
        transformer=dataclasses.replace(
            Config().transformer, embed_dim=32, head_num=4, enc_block_num=1,
            dec_block_num=1, max_enc_seq_len=24, max_dec_seq_len=24),
        inference=dataclasses.replace(
            Config().inference, tile_size=256, detector_batch=2,
            max_peaks_per_tile=64),
        mask_predict=dataclasses.replace(
            Config().mask_predict, max_rounds=2),
    )


def _page():
    img = np.full((300, 500, 3), 255, np.uint8)
    for i in range(5):
        x = 60 + 70 * i
        img[100:140, x:x + 40] = 0
    return img


def test_exported_pipeline_matches_live(tmp_path_factory, tiny_cfg):
    if not lineengine.build_native():
        pytest.skip("native line engine not buildable")
    tmp = tmp_path_factory.mktemp("artifacts")

    live = OCRPipeline(tiny_cfg, model_size="tiny")

    # export the three graphs from the live pipeline's weights with a
    # SYMBOLIC batch dim: one artifact serves the tile chunks and every
    # power-of-two window bucket
    det_dir = export_detector(str(tmp / "det"), live.detector,
                              live.det_vars,
                              tile=tiny_cfg.inference.tile_size, batch="b")
    enc_dir = export_transformer_encoder(str(tmp / "enc"), live.transformer,
                                         live.tf_vars, batch="b")
    dec_dir = export_transformer_decoder(str(tmp / "dec"), live.transformer,
                                         live.tf_vars, batch="b")

    exported = OCRPipeline.from_exported(det_dir, enc_dir, dec_dir,
                                         tiny_cfg, model_size="tiny")

    img = _page()
    out_live = live(img)
    out_exp = exported(img)

    assert out_exp["text"] == out_live["text"]
    assert len(out_exp["box"]) == len(out_live["box"])
    for a, b in zip(out_exp["box"], out_live["box"]):
        np.testing.assert_allclose(a["cx"], b["cx"], atol=1e-3)
        np.testing.assert_allclose(a["cy"], b["cy"], atol=1e-3)
    assert out_exp["aozora"] == out_live["aozora"]
