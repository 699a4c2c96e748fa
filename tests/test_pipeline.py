"""End-to-end OCR pipeline smoke on a synthetic page with a tiny model."""
import numpy as np
import pytest

from findtextcenternet_tpu.config import Config
import dataclasses

from findtextcenternet_tpu.infer import lineengine
from findtextcenternet_tpu.infer.pipeline import (
    OCRPipeline, image_hist_contrast,
)


@pytest.fixture(scope="module")
def tiny_pipeline():
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
            max_peaks_per_tile=64),
        mask_predict=dataclasses.replace(
            cfg.mask_predict, max_rounds=2),
    )
    return OCRPipeline(cfg, model_size="tiny")


def test_image_hist_contrast():
    flat = np.full((20, 20, 3), 128, np.uint8)
    assert image_hist_contrast(flat) == 0.0
    contrasty = np.zeros((20, 20, 3), np.uint8)
    contrasty[5:15, 5:15] = 255
    assert image_hist_contrast(contrasty) > 100


def test_full_pipeline_runs(tiny_pipeline):
    rng = np.random.default_rng(0)
    img = np.full((300, 500, 3), 255, np.uint8)
    # black squares as fake characters
    for i in range(5):
        x = 60 + 70 * i
        img[100:140, x:x + 40] = 0
    out = tiny_pipeline(img)
    assert set(out) == {"box", "line", "block", "text",
                    "aozora", "noruby"}
    # random weights: no guarantee about text, but structure must hold
    assert isinstance(out["text"], str)


def test_split_windows_respects_direction_change():
    from findtextcenternet_tpu.const import ENCODER_DIM
    feats = np.zeros((10, ENCODER_DIM), np.float32)
    feats[:, 0] = 1.0  # non-padding
    feats[5:, -6] = 5.0  # direction flips at 5
    windows = OCRPipeline.split_windows(feats)
    assert windows[0][2] == 5  # first window cut at the direction change


def test_build_feature_stream_separators():
    det = np.array([
        # id, block, idx, subidx, subtype, page, section
        [0, 0, 0, 0, 0, 0, 0],
        [1, 0, 0, 1, 0, 0, 0],
        [2, 0, 1, 0, 0, 0, 0],   # new line -> separator row
        [3, 1, 0, 0, 0, 0, 0],   # new block -> separator row
    ], np.int32)
    feats = np.ones((4, 100), np.float32)
    stream, fidx = OCRPipeline.build_feature_stream(det, feats)
    # 4 boxes + 1 line sep + 2 block/line seps = 7 rows
    assert stream.shape[0] == 7
    sep_rows = [i for i, f in enumerate(fidx) if f[0] < 0]
    assert len(sep_rows) == 3
    for i in sep_rows:
        assert stream[i, -1] == 5.0


def test_build_feature_stream_matches_loop_oracle():
    """The vectorized stream assembly must be bit-identical to the
    straightforward per-row loop (the reference's control flow,
    `/root/reference/process_ocr_base.py:114-174`)."""
    def loop_oracle(detected_boxes, glyphfeatures):
        fdim = glyphfeatures.shape[-1]
        enc_dim = fdim + 6
        features, feature_idx = [], []
        prev_block, prev_idx, vertical = 0, 0, 0
        for rec in detected_boxes:
            bid, block, idx, subidx, subtype = (
                int(rec[0]), int(rec[1]), int(rec[2]), int(rec[3]),
                int(rec[4]))
            if bid < 0:
                continue
            if prev_block != block:
                prev_block = block
                g = np.zeros(enc_dim, np.float32)
                g[fdim] = 5 * vertical
                g[-1] = 5
                features.append(g)
                feature_idx.append((-1, -1, -1, -1, -1))
                prev_idx = -1
            if prev_idx != idx:
                prev_idx = idx
                g = np.zeros(enc_dim, np.float32)
                g[fdim] = 5 * vertical
                g[-1] = 5
                features.append(g)
                feature_idx.append((-1, -1, -1, -1, -1))
            ruby = 1 if (subtype & 6) == 6 else 0
            rubybase = 1 if (subtype & 6) == 2 else 0
            space = 1 if subtype & 8 else 0
            emphasis = 1 if subtype & 16 else 0
            vertical = 1 if subtype & 1 else 0
            g = np.concatenate([
                glyphfeatures[bid],
                5 * np.array([vertical, rubybase, ruby, space,
                              emphasis, 0], np.float32)])
            features.append(g)
            feature_idx.append((bid, block, idx, subidx, subtype))
        if not features:
            return np.zeros((0, enc_dim), np.float32), []
        return np.stack(features), feature_idx

    rng = np.random.default_rng(11)
    for _ in range(10):
        n = int(rng.integers(0, 600))
        feats = rng.standard_normal((max(1, n), 32)).astype(np.float32)
        recs, b, i = [], int(rng.integers(0, 3)), 0
        for k in range(n):
            if rng.uniform() < 0.03:
                b += int(rng.integers(1, 3))
                i = 0
            if rng.uniform() < 0.1:
                i += 1
            recs.append([k if rng.uniform() > 0.02 else -1, b, i,
                         int(rng.integers(0, 4)),
                         int(rng.integers(0, 32))])
        recs = np.asarray(recs, np.int64).reshape(-1, 5)
        a1, f1 = loop_oracle(recs, feats)
        a2, f2 = OCRPipeline.build_feature_stream(recs, feats)
        np.testing.assert_array_equal(a1, a2)
        assert f1 == f2


def test_twopass_detection(tiny_pipeline):
    """Two-pass: big page triggers a low-res pre-pass whose detections
    merge with the tiled pass."""
    img = np.full((700, 900, 3), 255, np.uint8)
    img[300:400, 200:300] = 0   # a big "character"
    page = tiny_pipeline.run_detector(img, twopass=True)
    # structure contract holds; coordinates stay within the padded page
    # (900x700 pads to 1021x715 at tile 256 / stride 153)
    if len(page.locations):
        assert (page.locations[:, 1] <= 1021).all()
        assert (page.locations[:, 2] <= 715).all()


def test_fused_page_merge_matches_host_merge(tiny_pipeline):
    """The device-side page-mosaic merge + 3x3 code sampling
    (InferenceConfig.fused_page_merge) is bit-exact with the host merge
    path on both a grayscale-in-RGB page (single-channel upload fast
    path) and a genuinely colored page."""
    host_pipe = OCRPipeline(
        dataclasses.replace(
            tiny_pipeline.cfg,
            inference=dataclasses.replace(
                tiny_pipeline.cfg.inference, fused_page_merge=False)),
        detector_variables=tiny_pipeline.det_vars,
        transformer_variables=tiny_pipeline.tf_vars,
        model_size="tiny")
    rng = np.random.default_rng(1)

    gray = np.full((420, 610, 3), 255, np.uint8)
    for i in range(7):
        x = 40 + 80 * i
        gray[60:95, x:x + 35] = int(rng.integers(0, 40))
        gray[200:240, x:x + 40] = int(rng.integers(0, 40))
    color = gray.copy()
    color[..., 2] = np.clip(color[..., 2].astype(int) + 7,
                            0, 255).astype(np.uint8)

    for img, twopass in ((gray, False), (color, False), (gray, True)):
        a = tiny_pipeline.run_detector(img, twopass=twopass)
        b = host_pipe.run_detector(img, twopass=twopass)
        np.testing.assert_array_equal(a.locations, b.locations)
        np.testing.assert_array_equal(a.features, b.features)
        np.testing.assert_array_equal(a.lines, b.lines)
        np.testing.assert_array_equal(a.seps, b.seps)
        assert len(a.locations), "empty page proves nothing"


def test_batch_hist_contrast_matches_scalar():
    from findtextcenternet_tpu.infer.pipeline import (
        batch_hist_contrast, image_hist_contrast)
    rng = np.random.default_rng(0)
    img = rng.integers(0, 256, (120, 160, 3)).astype(np.uint8)
    img[20:50, 30:60] = 10      # a high-contrast patch
    img[60:90, 80:110] = 250
    rects = []
    for _ in range(40):
        x0 = int(rng.integers(0, 140))
        y0 = int(rng.integers(0, 100))
        rects.append([x0, y0, x0 + int(rng.integers(2, 20)),
                      y0 + int(rng.integers(2, 20))])
    rects = np.asarray(rects)
    batched = batch_hist_contrast(img, rects)
    for k, (x0, y0, x1, y1) in enumerate(rects):
        scalar = image_hist_contrast(img[y0:y1, x0:x1])
        assert batched[k] == pytest.approx(scalar, rel=1e-5), k


def test_hostops_matches_numpy_fallback():
    from findtextcenternet_tpu.infer import hostops
    from findtextcenternet_tpu.infer.pipeline import batch_hist_contrast
    if not hostops.build_native():
        pytest.skip("hostops not buildable")
    rng = np.random.default_rng(1)
    img = rng.integers(0, 256, (100, 140, 3)).astype(np.uint8)
    rects = []
    for _ in range(30):
        x0 = int(rng.integers(0, 120))
        y0 = int(rng.integers(0, 80))
        rects.append([x0, y0, x0 + int(rng.integers(2, 24)),
                      y0 + int(rng.integers(2, 24))])
    rects = np.asarray(rects, np.int32)
    a = hostops.hist_contrast(img, rects)
    b = batch_hist_contrast(img, rects)
    np.testing.assert_allclose(a, b, rtol=1e-5)

    # dedup parity against the numpy fallback on noisy duplicates
    n = 200
    base = rng.uniform(50, 900, (n, 2))
    boxes = np.concatenate([base + rng.normal(0, 3, (n, 2)),
                            rng.uniform(18, 30, (n, 2))], 1)
    boxes = boxes.astype(np.float32)
    keepm = hostops.greedy_dedup(boxes, 0.5, 0.75, 0.5)

    class _P:
        class cfg:
            class inference:
                iou_threshold = 0.5
                overlap_threshold = 0.75
                fill_ratio_threshold = 0.5
    from findtextcenternet_tpu.infer.pipeline import OCRPipeline
    loc = np.concatenate([np.ones((n, 1), np.float32), boxes], 1)
    ref_keep = OCRPipeline._greedy_dedup_numpy(_P(), loc, list(range(n)))
    np.testing.assert_array_equal(np.where(keepm)[0], np.asarray(ref_keep))


def test_hostops_grid_dedup_adversarial():
    """The spatial-grid dedup must make identical keep/drop decisions to
    the numpy fallback on clustered mixed-size boxes with many near
    duplicates (the regime where a grid bug would bite)."""
    from findtextcenternet_tpu.infer import hostops
    from findtextcenternet_tpu.infer.pipeline import OCRPipeline
    if not hostops.build_native():
        pytest.skip("hostops not buildable")

    class _P:
        class cfg:
            class inference:
                iou_threshold = 0.5
                overlap_threshold = 0.75
                fill_ratio_threshold = 0.5

    rng = np.random.default_rng(7)
    for _ in range(5):
        n = int(rng.integers(50, 1200))
        centers = rng.uniform(0, 1500, (n, 2)).astype(np.float32)
        wh = rng.uniform(0.5, 80, (n, 2)).astype(np.float32)
        dup = rng.integers(0, n, n // 2)
        jitter = rng.uniform(-4, 4, (len(dup), 2)).astype(np.float32)
        scale = rng.uniform(0.7, 1.3, (len(dup), 2)).astype(np.float32)
        exact = rng.integers(0, n, n // 8)     # bit-identical duplicates:
        boxes = np.concatenate([                # IoU == 1.0 exactly, the
            np.concatenate([centers, wh], 1),   # tie-order stress case
            np.concatenate([centers[dup] + jitter, wh[dup] * scale], 1),
            np.concatenate([centers[exact], wh[exact]], 1),
        ]).astype(np.float32)
        keepm = np.asarray(
            hostops.greedy_dedup(boxes, 0.5, 0.75, 0.5), bool)
        loc = np.concatenate(
            [np.ones((len(boxes), 1), np.float32), boxes], 1)
        ref = OCRPipeline._greedy_dedup_numpy(
            _P(), loc, list(range(len(boxes))))
        np.testing.assert_array_equal(np.where(keepm)[0], np.asarray(ref))


def test_decode_windows_chunking_equivalence(tiny_pipeline):
    """decode_max_batch chunking must not change decoded text: a 5-window
    decode at cap=2 (3 chunks, mixed bucket sizes) matches the uncapped
    single-call decode."""
    import dataclasses as dc
    from findtextcenternet_tpu.const import ENCODER_DIM

    rng = np.random.default_rng(3)
    enc_len = tiny_pipeline.transformer.dims.max_enc_seq_len
    feats = rng.standard_normal(
        (5 * (enc_len - 2), ENCODER_DIM)).astype(np.float32)
    step = enc_len - 2
    windows = [(0, i * step, (i + 1) * step, 0) for i in range(5)]

    texts_full = tiny_pipeline.decode_windows(feats, windows)
    capped = dc.replace(
        tiny_pipeline.cfg, inference=dc.replace(
            tiny_pipeline.cfg.inference, decode_max_batch=2))
    tiny_pipeline.cfg = capped
    try:
        texts_chunked = tiny_pipeline.decode_windows(feats, windows)
    finally:
        tiny_pipeline.cfg = dc.replace(
            capped, inference=dc.replace(capped.inference,
                                         decode_max_batch=64))
    assert texts_chunked == texts_full
    assert len(texts_full) == 5


def test_decode_len_buckets(tiny_pipeline):
    """decode_len_buckets groups windows by content length. A bucket at
    the full production length is the identical graph (exact equality
    with the default); short windows route to a smaller graph (cheaper
    quadratic attention) whose full-size windows still match the
    default exactly and whose outputs stay ordered per window."""
    import dataclasses as dc
    from findtextcenternet_tpu.const import ENCODER_DIM

    rng = np.random.default_rng(7)
    enc_len = tiny_pipeline.transformer.dims.max_enc_seq_len
    step = enc_len - 2
    # 2 full-length windows + 3 three-feature windows, interleaved
    feats = rng.standard_normal((2 * step + 9, ENCODER_DIM)).astype(
        np.float32)
    # the ruby/direction budget columns come from real streams; zero
    # them so seq_need is content-driven and deterministic here
    feats[:, -6:] = 0.0
    windows = [(0, 0, step, 0), (0, step, step + 3, 0),
               (0, step + 3, step + 6, 0),
               (0, step + 6, 2 * step + 6, 0),
               (0, 2 * step + 6, 2 * step + 9, 0)]

    texts_default = tiny_pipeline.decode_windows(feats, windows)

    def with_buckets(buckets):
        old = tiny_pipeline.cfg
        tiny_pipeline.cfg = dc.replace(
            old, inference=dc.replace(old.inference,
                                      decode_len_buckets=buckets))
        try:
            return tiny_pipeline.decode_windows(feats, windows)
        finally:
            tiny_pipeline.cfg = old

    # full-length-only bucket: same graph, bit-identical
    assert with_buckets((enc_len,)) == texts_default

    # mixed buckets: 3-feature windows (need 8) go to the 8-graph;
    # full-length windows stay on the exact default graph
    texts_b = with_buckets((8, enc_len))
    assert len(texts_b) == len(windows)
    assert texts_b[0] == texts_default[0]
    assert texts_b[3] == texts_default[3]
    assert 8 in tiny_pipeline._decode_cache


def test_ruby_expansion_oracle():
    """_ruby_expansion (shared by split_windows and decode bucket
    sizing) matches an independently written oracle of the reference
    budget (`/root/reference/process_ocr_base.py:186-203`) on
    adversarial ruby streams: nested-looking groups, groups cut at the
    range edge, ruby glyphs outside any group."""
    from findtextcenternet_tpu.const import ENCODER_DIM

    def oracle(f, i0, i1):
        extra = 0
        in_group = 0   # 0 outside, 1 opened, 2 saw base
        for k in range(i0, i1):
            if f[k, -3] > 0:
                extra += 1
            if in_group == 0 and f[k, -5] > 0:
                extra += 3
                in_group = 1
            elif in_group == 1 and f[k, -4] > 0:
                in_group = 2
            elif in_group == 2 and f[k, -4] == 0:
                in_group = 0
        return extra

    rng = np.random.default_rng(11)
    for trial in range(50):
        n = int(rng.integers(1, 40))
        f = np.zeros((n, ENCODER_DIM), np.float32)
        # cols: -5 rubybase, -4 ruby, -3 also ruby marker in stream
        f[:, -5] = (rng.random(n) < 0.3) * 5
        f[:, -4] = (rng.random(n) < 0.3) * 5
        f[:, -3] = (rng.random(n) < 0.3) * 5
        i0 = int(rng.integers(0, n))
        i1 = int(rng.integers(i0, n + 1))
        assert OCRPipeline._ruby_expansion(f, i0, i1) == oracle(f, i0, i1)


def test_feature_stream_guard_raises_on_lost_indices(tiny_pipeline):
    """A FeatureStream that went through a numpy transform loses its
    device indices (__array_finalize__ drops them); decode_windows must
    refuse it instead of silently decoding the zero glyph columns."""
    from findtextcenternet_tpu.infer.pipeline import FeatureStream

    enc_len = tiny_pipeline.transformer.dims.max_enc_seq_len
    enc_dim = tiny_pipeline.transformer.dims.enc_input_dim
    base = np.zeros((enc_len - 2, enc_dim), np.float32)
    stream = base.view(FeatureStream)   # glyph_idx/glyph_dev stay None
    windows = [(0, 0, base.shape[0], 0)]
    with pytest.raises(ValueError, match="glyph_idx"):
        tiny_pipeline.decode_windows(stream, windows)
    # a copy of a populated stream also drops the attrs
    stream2 = base.view(FeatureStream)
    stream2.glyph_idx = np.zeros(base.shape[0], np.int64)
    copied = stream2.copy()
    assert getattr(copied, "glyph_idx", None) is None


def test_max_windows_guard_bounds_degenerate_stream():
    """A stream whose direction column flips every row is the worst case
    the reference splitter allows: one window per flip, unbounded decode
    work (`/root/reference/process_ocr_base.py:186-283` has no count
    bound). With max_windows, the re-split is budget-only: contiguous
    coverage, ~n/budget windows, hard cap respected."""
    from findtextcenternet_tpu.const import ENCODER_DIM

    n = 600
    feats = np.zeros((n, ENCODER_DIM), np.float32)
    feats[:, 0] = 1.0
    feats[1::2, -6] = 5.0        # direction flips every row

    unbounded = OCRPipeline.split_windows(feats, 400)
    assert len(unbounded) >= n // 2          # degenerate: ~1 window/flip

    guarded = OCRPipeline.split_windows(feats, 400, max_windows=16)
    assert 1 <= len(guarded) <= 16
    # contiguous, non-overlapping coverage of the whole stream
    assert guarded[0][1] == 0
    for (p0, i0, j0, kb0), (p1, i1, j1, kb1) in zip(guarded, guarded[1:]):
        assert i1 == j0 and p1 == i1 and kb1 == 0
    assert guarded[-1][2] == n

    # a healthy stream under the cap is untouched
    feats2 = np.zeros((50, ENCODER_DIM), np.float32)
    feats2[:, 0] = 1.0
    assert (OCRPipeline.split_windows(feats2, 400, max_windows=16)
            == OCRPipeline.split_windows(feats2, 400))


def test_max_windows_guard_truncates_past_cap():
    """Streams longer than cap*budget are hard-truncated: bounded device
    time on garbage input is the whole point of the guard."""
    from findtextcenternet_tpu.const import ENCODER_DIM

    n = 2000
    feats = np.zeros((n, ENCODER_DIM), np.float32)
    feats[:, 0] = 1.0
    feats[1::2, -6] = 5.0
    guarded = OCRPipeline.split_windows(feats, 100, max_windows=4)
    assert len(guarded) == 4
    assert guarded[-1][2] < n    # truncated, not covering everything


def test_detections_hook_replaces_page(tiny_pipeline):
    """detections_hook swaps the detector output before the downstream
    stages — the bench measurement hook. The injected page's boxes must
    drive the final assembly."""
    from findtextcenternet_tpu.infer.pipeline import DetectedPage

    img = np.full((300, 500, 3), 255, np.uint8)
    img[100:140, 60:100] = 0

    calls = []

    mh, mw = 300 // 4 + 10, 500 // 4 + 10
    lines = np.zeros((mh, mw), np.float32)
    lines[25:35, 10:160] = 1.0
    fdim = tiny_pipeline.cfg.detector.feature_dim
    locs = np.array([[0.9, 120, 120, 30, 30, 0, 0, 0, 0],
                     [0.9, 200, 120, 30, 30, 0, 0, 0, 0]], np.float32)
    feats = np.ones((2, fdim), np.float32)

    def hook(page, image):
        calls.append(len(page.locations))
        return DetectedPage(locations=locs, features=feats,
                            lines=lines, seps=np.zeros_like(lines))

    tiny_pipeline.detections_hook = hook
    try:
        out = tiny_pipeline(img)
    finally:
        tiny_pipeline.detections_hook = None
    assert calls, "hook was not invoked"
    # every surviving box in the output is one of the injected ones
    for b in out["box"]:
        assert float(b["cx"]) in (120.0, 200.0)
