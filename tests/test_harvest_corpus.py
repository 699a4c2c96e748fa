"""Feature harvesting + corpus processing."""
import numpy as np
import pytest

from findtextcenternet_tpu.factory.corpus import (
    aozora_html_to_text, check_coverage, load_corpus_dir,
)
from findtextcenternet_tpu.factory.harvest import (
    FeatureHarvester, merge_feature_dirs,
)


def test_aozora_ruby_conversion():
    page = ('<div class="main_text">吾輩は<ruby><rb>猫</rb>'
            "<rp>（</rp><rt>ねこ</rt><rp>）</rp></ruby>である。<br/>"
            "名前はまだない。</div>")
    text = aozora_html_to_text(page)
    assert "￹猫￺ねこ￻" in text
    assert "吾輩は" in text and "名前はまだない。" in text
    assert "<" not in text


def test_aozora_gaiji():
    page = '<div class="main_text">A<img alt="※[U+4E9C]" src="x.png"/>B</div>'
    assert aozora_html_to_text(page) == "A亜B"


def test_check_coverage():
    from findtextcenternet_tpu.data.transformer_data import FeatureBank
    bank = FeatureBank.synthetic([ord("あ"), ord("い")])
    missing = check_coverage(["あいう"], bank)
    assert missing == [ord("う")]


def test_load_corpus_dir(tmp_path):
    (tmp_path / "a.txt").write_text("こんにちは", encoding="utf-8")
    (tmp_path / "sub").mkdir()
    (tmp_path / "sub" / "b.txt").write_text("world", encoding="utf-8")
    texts = load_corpus_dir(str(tmp_path))
    assert len(texts) == 2


class _FakePipeline:
    """Detector stub: returns GT-centered detections with fixed features."""

    def __init__(self, n=3):
        self.n = n

    def run_detector(self, rgb):
        import dataclasses
        from findtextcenternet_tpu.infer.pipeline import DetectedPage
        locs = np.array([[0.9, 100 + 50 * i, 100, 30, 30, 0, 0, 0, 0]
                         for i in range(self.n)], np.float32)
        feats = np.tile(np.arange(self.n, dtype=np.float32)[:, None],
                        (1, 100))
        return DetectedPage(locs, feats, np.zeros((16, 16), np.float32),
                            np.zeros((16, 16), np.float32))

    def run_line_engine(self, det):
        return np.array([[i, 0, 0, i, 0, 0, 0]
                         for i in range(self.n)], np.int32)


class _FakeGenerator:
    def generate(self):
        n = 3
        return {
            "text": "ABC",
            "image": np.zeros((400, 400), np.uint8),
            "textline": np.zeros((200, 200), np.uint8),
            "sepline": np.zeros((200, 200), np.uint8),
            "position": np.array([[100 + 50 * i, 100, 30, 30]
                                  for i in range(n)], np.float32),
            "code_list": np.array([[65 + i, 0] for i in range(n)], np.int32),
        }


def test_harvester_matching(tmp_path, monkeypatch):
    # identity augmentation so detections align with GT
    import findtextcenternet_tpu.factory.harvest as hv

    def fake_transform(image, textline, sepline, position, codelist, rng,
                       return_positions=False, **kw):
        img = image.astype(np.float32) / 255.0
        lm = np.zeros((image.shape[0] // 4, image.shape[1] // 4, 5),
                      np.float32)
        im = np.zeros((image.shape[0] // 4, image.shape[1] // 4, 2),
                      np.int32)
        if return_positions:
            return img, lm, im, 30.0, position
        return img, lm, im, 30.0

    monkeypatch.setattr(hv, "transform_crop", fake_transform)
    h = FeatureHarvester(_FakePipeline(), _FakeGenerator(),
                         str(tmp_path / "banks"))
    matched = h.run(pages=2, flush_every=1)
    assert matched == 6
    import glob, os
    files = sorted(glob.glob(str(tmp_path / "banks" / "*.npy")))
    assert len(files) == 3
    arr = np.load(files[0])
    assert arr.shape == (2, 100)  # 2 pages x 1 match per code


def test_merge_feature_dirs(tmp_path):
    d1, d2 = tmp_path / "a", tmp_path / "b"
    d1.mkdir(); d2.mkdir()
    np.save(d1 / "h00000041.npy", np.ones((2, 4)))
    np.save(d2 / "h00000041.npy", np.zeros((3, 4)))
    np.save(d2 / "v00000042.npy", np.ones((1, 4)))
    names = merge_feature_dirs([str(d1), str(d2)], str(tmp_path / "m"))
    assert names == ["h00000041.npy", "v00000042.npy"]
    assert np.load(tmp_path / "m" / "h00000041.npy").shape == (5, 4)
