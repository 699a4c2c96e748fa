"""Device-resident glyph features (InferenceConfig.device_features).

The lazy path keeps the detector's per-chunk f16 feature buffers on
device, tracks integer row indices through filter / line engine /
windowing on the host, and gathers the rows inside the decode graph —
eliminating the dominant per-page feature readback AND its re-upload at
decode time (VERDICT r3 #1: the detector page path was transfer-bound
on the tunnel link). These tests pin the contract: the lazy pipeline is
bit-exact with the readback pipeline end to end, and materialization
(`np.asarray`) reads back exactly the kept rows.

Reference behavior being preserved: the torch pipeline reads features
to host and feeds them to the transformer per window
(/root/reference/process_ocr_base.py:100-174).
"""
import dataclasses

import numpy as np
import pytest

from findtextcenternet_tpu.config import Config
from findtextcenternet_tpu.infer import lineengine
from findtextcenternet_tpu.infer.pipeline import (
    FeatureStream, LazyFeatures, OCRPipeline)


@pytest.fixture(scope="module")
def pipes():
    if not lineengine.build_native():
        pytest.skip("native line engine not buildable")
    cfg = Config()
    cfg = dataclasses.replace(
        cfg,
        detector=dataclasses.replace(cfg.detector, model_size="tiny"),
        transformer=dataclasses.replace(
            cfg.transformer, embed_dim=32, head_num=4, enc_block_num=1,
            dec_block_num=1, max_enc_seq_len=24, max_dec_seq_len=24),
        inference=dataclasses.replace(
            cfg.inference, tile_size=256, detector_batch=2,
            max_peaks_per_tile=64, device_features=True),
        mask_predict=dataclasses.replace(cfg.mask_predict, max_rounds=2),
    )
    lazy = OCRPipeline(cfg, model_size="tiny")
    host = OCRPipeline(
        dataclasses.replace(
            cfg, inference=dataclasses.replace(
                cfg.inference, device_features=False)),
        detector_variables=lazy.det_vars,
        transformer_variables=lazy.tf_vars, model_size="tiny")
    return lazy, host


def _page(seed=0):
    rng = np.random.default_rng(seed)
    img = np.full((420, 610, 3), 255, np.uint8)
    for i in range(7):
        x = 40 + 80 * i
        img[60:95, x:x + 35] = int(rng.integers(0, 40))
        img[200:240, x:x + 40] = int(rng.integers(0, 40))
    return img


def test_lazy_features_materialize_bitexact(pipes):
    lazy, host = pipes
    for twopass in (False, True):
        a = lazy.run_detector(_page(), twopass=twopass)
        b = host.run_detector(_page(), twopass=twopass)
        assert isinstance(a.features, LazyFeatures)
        assert isinstance(b.features, np.ndarray)
        np.testing.assert_array_equal(a.locations, b.locations)
        # f16 buffer rows cast to f32 == host's f16 readback cast to f32
        np.testing.assert_array_equal(np.asarray(a.features), b.features)
        assert len(a.locations), "empty page proves nothing"


def test_lazy_indexing_semantics(pipes):
    lazy, _ = pipes
    det = lazy.run_detector(_page())
    f = det.features
    n = len(f)
    assert n and f.shape == (n, np.asarray(f).shape[1]) and f.ndim == 2
    keep = np.arange(n)[::-1][: max(1, n // 2)]
    sub = f[keep]
    assert isinstance(sub, LazyFeatures)
    np.testing.assert_array_equal(np.asarray(sub),
                                  np.asarray(f)[keep])
    # astype materializes
    assert sub.astype(np.float32).dtype == np.float32


def test_lazy_ocr_end_to_end_identical(pipes):
    lazy, host = pipes
    out_a = lazy(_page(1))
    out_b = host(_page(1))
    assert out_a["text"] == out_b["text"]
    assert out_a["box"] == out_b["box"]
    assert out_a["aozora"] == out_b["aozora"]
    assert len(out_a["box"]), "no boxes decoded proves nothing"


def test_lazy_stream_carries_indices(pipes):
    lazy, host = pipes
    det = lazy.run_detector(_page())
    order = lazy.run_line_engine(det)
    stream, fidx = lazy.build_feature_stream(order, det.features)
    assert isinstance(stream, FeatureStream)
    assert stream.glyph_idx is not None
    fdim = det.features.shape[1]
    # glyph rows: zero feature columns + a valid device index;
    # separator rows: index -1
    glyph_rows = stream.glyph_idx >= 0
    assert glyph_rows.sum() == len(det.features)
    assert not stream[glyph_rows, :fdim].any()
    # host stream's feature columns == device gather at those indices
    hstream, hfidx = host.build_feature_stream(
        order, np.asarray(det.features))
    assert fidx == hfidx
    gathered = np.asarray(det.features[np.argsort(np.argsort(
        stream.glyph_idx[glyph_rows]))])  # no-op reorder; same order
    np.testing.assert_array_equal(
        hstream[glyph_rows, :fdim],
        np.asarray(LazyFeatures(stream.glyph_dev,
                                stream.glyph_idx[glyph_rows])))
    np.testing.assert_array_equal(hstream[:, fdim:],
                                  np.asarray(stream[:, fdim:]))


def test_lazy_decode_buckets_identical(pipes):
    """Lazy gather composes with decode_len_buckets (both graph caches
    keyed per bucketed length)."""
    lazy, host = pipes
    cfg = dataclasses.replace(
        lazy.cfg, inference=dataclasses.replace(
            lazy.cfg.inference, decode_len_buckets=(8, 16, 24)))
    lazy_b = OCRPipeline(cfg, detector_variables=lazy.det_vars,
                         transformer_variables=lazy.tf_vars,
                         model_size="tiny")
    host_b = OCRPipeline(
        dataclasses.replace(cfg, inference=dataclasses.replace(
            cfg.inference, device_features=False)),
        detector_variables=lazy.det_vars,
        transformer_variables=lazy.tf_vars, model_size="tiny")
    assert lazy_b(_page(2))["text"] == host_b(_page(2))["text"]
