"""ONNX-artifact inference driver: `OCRPipeline.from_onnx` reproduces
the live pipeline (the reference's ``process_ocr_onnx.py`` backend,
`/root/reference/process_ocr_onnx.py:27-104`).

The live comparison pipeline runs the detector in f32 via the
``detector_apply`` hook — the ONNX numpy evaluator computes in f32, so a
bf16-backbone comparison would measure dtype noise, not the driver."""
import dataclasses

import numpy as np
import pytest

jax = pytest.importorskip("jax")
import jax.numpy as jnp  # noqa: E402

from findtextcenternet_tpu.config import Config  # noqa: E402
from findtextcenternet_tpu.export.onnx_models import (  # noqa: E402
    emit_detector, emit_transformer_decoder, emit_transformer_encoder,
)
from findtextcenternet_tpu.infer import lineengine  # noqa: E402
from findtextcenternet_tpu.infer.pipeline import OCRPipeline  # noqa: E402
from findtextcenternet_tpu.models.detector import (  # noqa: E402
    CenterNetDetection,
)


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


def test_onnx_pipeline_matches_live(tiny_cfg):
    if not lineengine.build_native():
        pytest.skip("native line engine not buildable")

    seed_vars = OCRPipeline(tiny_cfg, model_size="tiny")
    fdim = tiny_cfg.detector.feature_dim
    det_f32 = CenterNetDetection(model_size="tiny", feature_dim=fdim,
                                 dtype=jnp.float32)
    live = OCRPipeline(tiny_cfg, detector_variables=seed_vars.det_vars,
                       transformer_variables=seed_vars.tf_vars,
                       model_size="tiny", detector_apply=det_f32.apply)

    tile = tiny_cfg.inference.tile_size
    np_det = jax.tree.map(np.asarray, seed_vars.det_vars)
    np_tf = jax.tree.map(np.asarray, seed_vars.tf_vars)
    dims = live.transformer.dims
    det_blob = emit_detector(np_det, "tiny", height=tile, width=tile,
                             feature_dim=fdim)
    enc_blob = emit_transformer_encoder(np_tf, dims)
    dec_blob = emit_transformer_decoder(np_tf, dims)

    onnx = OCRPipeline.from_onnx(det_blob, enc_blob, dec_blob,
                                 tiny_cfg, model_size="tiny")

    img = _page()
    out_live = live(img)
    out_onnx = onnx(img)

    assert out_onnx["text"] == out_live["text"]
    assert len(out_onnx["box"]) == len(out_live["box"])
    for a, b in zip(out_onnx["box"], out_live["box"]):
        np.testing.assert_allclose(a["cx"], b["cx"], atol=1e-2)
        np.testing.assert_allclose(a["cy"], b["cy"], atol=1e-2)
    assert out_onnx["aozora"] == out_live["aozora"]


def test_onnx_pipeline_runs_with_qdq_detector(tiny_cfg):
    """The static-int8 QDQ detector artifact drives the full from_onnx
    pipeline (the reference's quantized-model serving path,
    `/root/reference/quantize1_onnx.py` + `process_ocr_onnx.py`).
    Quantization shifts heatmap values, so this pins structure and
    execution, not text parity."""
    if not lineengine.build_native():
        pytest.skip("native line engine not buildable")
    from findtextcenternet_tpu.export.onnx_models import (
        emit_detector_qdq, emit_transformer_decoder,
        emit_transformer_encoder)
    from findtextcenternet_tpu.export.quantize import (
        calibrate_detector_edges)

    seed = OCRPipeline(tiny_cfg, model_size="tiny")
    fdim = tiny_cfg.detector.feature_dim
    tile = tiny_cfg.inference.tile_size
    det = CenterNetDetection(model_size="tiny", feature_dim=fdim)
    rng = np.random.default_rng(0)
    batches = [np.asarray(rng.random((1, tile, tile, 3)), np.float32)
               for _ in range(2)]
    ranges = calibrate_detector_edges(det, seed.det_vars, batches)
    np_det = jax.tree.map(np.asarray, seed.det_vars)
    np_tf = jax.tree.map(np.asarray, seed.tf_vars)
    qblob = emit_detector_qdq(np_det, ranges, "tiny", height=tile,
                              width=tile, feature_dim=fdim)
    enc = emit_transformer_encoder(np_tf, seed.transformer.dims)
    dec = emit_transformer_decoder(np_tf, seed.transformer.dims)

    pipe = OCRPipeline.from_onnx(qblob, enc, dec, tiny_cfg,
                                 model_size="tiny")
    out = pipe(_page())
    assert set(out) >= {"box", "line", "block", "text"}
