"""Multi-device serving: `OCRPipeline(mesh=...)` shards tile batches and
decode window buckets over the mesh data axis (replicated weights) and
reproduces the single-device pipeline exactly — the forward pass needs
no collectives, so GSPMD splits it embarrassingly parallel over ICI.

Runs on the 8-device virtual CPU mesh the conftest provisions. The
reference has no multi-device serving path (SURVEY.md §2.8); this is
TPU-native new design."""
import dataclasses

import numpy as np
import pytest

jax = pytest.importorskip("jax")

from findtextcenternet_tpu.config import Config  # noqa: E402
from findtextcenternet_tpu.infer import lineengine  # noqa: E402
from findtextcenternet_tpu.infer.pipeline import OCRPipeline  # noqa: E402
from findtextcenternet_tpu.parallel import make_mesh  # noqa: E402


@pytest.fixture(scope="module")
def tiny_cfg():
    return dataclasses.replace(
        Config(),
        detector=dataclasses.replace(Config().detector, model_size="tiny"),
        transformer=dataclasses.replace(
            Config().transformer, embed_dim=32, head_num=4, enc_block_num=1,
            dec_block_num=1, max_enc_seq_len=24, max_dec_seq_len=24),
        inference=dataclasses.replace(
            Config().inference, tile_size=256, detector_batch=8,
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


def test_sharded_pipeline_matches_single_device(tiny_cfg):
    if jax.device_count() < 8:
        pytest.skip("needs the 8-device virtual mesh")
    if not lineengine.build_native():
        pytest.skip("native line engine not buildable")

    single = OCRPipeline(tiny_cfg, model_size="tiny")
    mesh = make_mesh(n_data=8, n_model=1)
    sharded = OCRPipeline(tiny_cfg, detector_variables=single.det_vars,
                          transformer_variables=single.tf_vars,
                          model_size="tiny", mesh=mesh)
    assert sharded._min_bucket == 8

    img = _page()
    out_single = single(img)
    out_sharded = sharded(img)

    assert out_sharded["text"] == out_single["text"]
    assert len(out_sharded["box"]) == len(out_single["box"])
    for a, b in zip(out_sharded["box"], out_single["box"]):
        np.testing.assert_allclose(a["cx"], b["cx"], atol=1e-3)
        np.testing.assert_allclose(a["cy"], b["cy"], atol=1e-3)
    assert out_sharded["aozora"] == out_single["aozora"]


def test_sharded_pipeline_fused_attention(tiny_cfg):
    """decode_attention='fused' (Pallas kernel) composes with the DP
    mesh: the sharded-bucket decode reproduces the single-device fused
    pipeline exactly."""
    if jax.device_count() < 8:
        pytest.skip("needs the 8-device virtual mesh")
    if not lineengine.build_native():
        pytest.skip("native line engine not buildable")
    cfg = dataclasses.replace(
        tiny_cfg, inference=dataclasses.replace(
            tiny_cfg.inference, decode_attention="fused"))
    single = OCRPipeline(cfg, model_size="tiny")
    sharded = OCRPipeline(cfg, detector_variables=single.det_vars,
                          transformer_variables=single.tf_vars,
                          model_size="tiny",
                          mesh=make_mesh(n_data=8, n_model=1))
    img = _page()
    assert sharded(img)["text"] == single(img)["text"]


def test_mesh_batch_divisibility_check(tiny_cfg):
    if jax.device_count() < 8:
        pytest.skip("needs the 8-device virtual mesh")
    bad = dataclasses.replace(
        tiny_cfg, inference=dataclasses.replace(
            tiny_cfg.inference, detector_batch=3))
    with pytest.raises(ValueError, match="divisible"):
        OCRPipeline(bad, model_size="tiny", mesh=make_mesh(n_data=8))
