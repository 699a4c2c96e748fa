"""CoreML-mapping inference driver: `OCRPipeline.from_coreml` reproduces
the live pipeline (the reference's ``process_ocr_coreml.py`` backend,
`/root/reference/process_ocr_coreml.py:7-74`).

The driver executes each artifact under the deployed-mlpackage contract
(batch-1 per-sample predicts, int64 cast to int32) through the numpy MIL
backend — the exact op/argument stream ``convert_to_mlpackage`` emits.
The live comparison pipeline runs the detector in f32 (the MIL numpy
backend computes in f32, so a bf16-backbone comparison would measure
dtype noise, not the driver)."""
import dataclasses

import numpy as np
import pytest

jax = pytest.importorskip("jax")
import jax.numpy as jnp  # noqa: E402

from findtextcenternet_tpu.config import Config  # noqa: E402
from findtextcenternet_tpu.export.coreml_models import MilSession  # noqa: E402
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


def test_mil_session_is_batch1_and_int32(tiny_cfg):
    """The session slices feeds to batch 1 and downcasts int64 — the
    CoreML deployment contract (`convert1_coreml.py:40-47` pins batch 1;
    CoreML has no int64)."""
    seed = OCRPipeline(tiny_cfg, model_size="tiny")
    np_tf = jax.tree.map(np.asarray, seed.tf_vars)
    dims = seed.transformer.dims
    sess = MilSession(emit_transformer_encoder(np_tf, dims))

    rng = np.random.default_rng(0)
    e_in = rng.standard_normal(
        (3, dims.max_enc_seq_len, dims.enc_input_dim)).astype(np.float32)
    km = np.zeros((3, 1, 1, dims.max_enc_seq_len), np.float32)
    out = sess(encoder_input=e_in, key_mask=km)["encoder_output"]
    assert out.shape[0] == 3
    # batch independence: sample 1 alone must equal row 1 of the batch
    solo = sess(encoder_input=e_in[1:2], key_mask=km[1:2])
    np.testing.assert_array_equal(out[1:2], solo["encoder_output"])


def test_mil_maps_qdq_detector(tiny_cfg):
    """The static-int8 QDQ detector artifact evaluates through the MIL
    mapping (iOS17 quantize/dequantize ops) identically to the ONNX
    evaluator — the quantized detector is servable via CoreML just like
    via onnxruntime (`quantize1_onnx.py` + `process_ocr_coreml.py`)."""
    from findtextcenternet_tpu.export.onnx_models import emit_detector_qdq
    from findtextcenternet_tpu.export.onnx_writer import OnnxEvaluator
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
    qblob = emit_detector_qdq(np_det, ranges, "tiny", height=tile,
                              width=tile, feature_dim=fdim)

    img = rng.random((1, 3, tile, tile)).astype(np.float32)
    ref = OnnxEvaluator(qblob)(image=img)
    mil = MilSession(qblob)(image=img)
    for k in ref:
        np.testing.assert_allclose(mil[k], ref[k], rtol=1e-4, atol=1e-4)


def test_coreml_pipeline_matches_live(tiny_cfg):
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

    cm = OCRPipeline.from_coreml(det_blob, enc_blob, dec_blob,
                                 tiny_cfg, model_size="tiny")

    img = _page()
    out_live = live(img)
    out_cm = cm(img)

    assert out_cm["text"] == out_live["text"]
    assert len(out_cm["box"]) == len(out_live["box"])
    for a, b in zip(out_cm["box"], out_live["box"]):
        np.testing.assert_allclose(a["cx"], b["cx"], atol=1e-2)
        np.testing.assert_allclose(a["cy"], b["cy"], atol=1e-2)
    assert out_cm["aozora"] == out_live["aozora"]
