"""Stage-3 data fidelity: corpus-style furigana generator, reference
text splitting, and the train_data4 real-page replay loop
(`/root/reference/dataset/data_transformer.py:98-265,303-513`)."""
import json

import numpy as np
import pytest

from findtextcenternet_tpu.const import (
    DECODER_EOT, DECODER_SOT, ENCODER_DIM, FEATURE_DIM,
)
from findtextcenternet_tpu.data.transformer_data import (
    FeatureBank, TransformerDataset, build_realdata_entry,
    find_splitpoint, gen_feature, load_realdata_dir, random_furigana,
    sample_realdata, skip_remainruby, SP_TOKEN,
)


def test_skip_remainruby():
    assert skip_remainruby("ab￻cd") == "cd"
    assert skip_remainruby("￹a￺b￻cd") == "￹a￺b￻cd"
    assert skip_remainruby("plain") == "plain"


def test_find_splitpoint_never_cuts_ruby():
    txt = "aaaa￹漢字漢字￺かんじ￻bbbb"
    j = find_splitpoint(txt, 0, 8)
    # the split must land outside the ruby group markers
    assert txt[:j].count("￹") == txt[:j].count("￻")
    assert find_splitpoint("line\nrest", 0, 20) == 5   # newline wins


def test_furigana_generator_shape():
    rng = np.random.default_rng(0)
    texts = [random_furigana(None, rng) for _ in range(20)]
    joined = "".join(texts)
    # near-balanced markers (the final window cut can strand one group,
    # like the reference's split), reading-aware content, line structure
    n9, na, nb = (joined.count(c) for c in "￹￺￻")
    assert n9 > 10
    assert abs(n9 - na) <= len(texts) and abs(na - nb) <= len(texts)
    assert "\n" in joined
    # ruby bodies contain kana/emphasis/latin readings (not uniform junk)
    has_kana_ruby = any("￺" in t and any(
        "ぁ" <= c <= "ヺ" for c in t.split("￺", 1)[1].split("￻", 1)[0])
        for t in texts if "￺" in t)
    assert has_kana_ruby
    # encodes cleanly
    bank = FeatureBank.synthetic([ord("あ")], seed=0)
    enc = gen_feature(texts[0][:300], bank, rng)
    assert enc.shape == (400, ENCODER_DIM)


def _boxlist_fixture():
    """Two blocks; line 2 has a ruby group; one space-flagged box."""
    boxes = []

    def add(boxid, block, line, subtype, text):
        boxes.append({"boxid": boxid, "blockid": block, "lineid": line,
                      "subidx": 0, "subtype": subtype, "text": text})

    add(0, 1, 1, 0, "A")
    add(1, 1, 1, 8, "B")            # space flag
    add(2, 1, 2, 2, "漢")           # rubybase
    add(3, 1, 2, 2, "字")
    add(4, 1, 2, 6, "か")           # ruby
    add(5, 1, 2, 6, "じ")
    add(6, 2, 3, 1, "縦")           # second block, vertical
    return boxes


def test_build_realdata_entry():
    feats = np.arange(7 * FEATURE_DIM, dtype=np.float32).reshape(
        7, FEATURE_DIM) / 100
    entry = build_realdata_entry(feats, _boxlist_fixture())
    text = entry["text"]
    # block+line separators become newlines (both fire at the first box,
    # like the reference); ruby markers interleave; ascii space flag
    # renders as ' ' not '　'
    assert text == "\n\nA B\n￹漢字￺かじ￻\n\n縦"
    f = entry["feature"]
    # rows: bsep, lsep, A, B, lsep, 漢, 字, か, じ, bsep, lsep, 縦, zero
    assert f.shape == (13, ENCODER_DIM)
    assert f[0, -1] == 5 and f[1, -1] == 5 and f[4, -1] == 5
    assert f[3, FEATURE_DIM + 3] == 5               # space flag on B
    assert f[5, FEATURE_DIM + 1] == 5               # rubybase on 漢
    assert f[7, FEATURE_DIM + 2] == 5               # ruby on か
    assert f[11, FEATURE_DIM + 0] == 5              # vertical on 縦
    np.testing.assert_allclose(f[2, :FEATURE_DIM], feats[0])
    # index maps feature rows to text positions
    idx = entry["index"]
    assert text[idx[2]] == "A"
    assert text[idx[11]] == "縦"


def test_sample_realdata_roundtrip():
    feats = np.random.default_rng(0).normal(
        0, 5, (7, FEATURE_DIM)).astype(np.float32)
    entry = build_realdata_entry(feats, _boxlist_fixture())
    rng = np.random.default_rng(1)
    txt, enc = sample_realdata(entry, rng, noise_ratio=0.0)
    assert enc.shape == (400, ENCODER_DIM)
    assert txt  # a window of the page text
    assert txt in entry["text"]
    # SOT row carries the SP pattern (reference adds the first feature
    # row on top of it — data_transformer.py:508-510)
    assert enc[0, 0] >= SP_TOKEN[0] - 6


def test_process_image4_to_replay(tmp_path):
    """The full annotation -> finetune link: corrected JSON + maps ->
    process_image4 (line engine + feature sampling) -> boxlist/npy ->
    replay entries -> TransformerDataset samples."""
    from PIL import Image

    jax = pytest.importorskip("jax")
    from findtextcenternet_tpu.config import (
        Config, DetectorConfig, TransformerConfig)
    from findtextcenternet_tpu.infer import lineengine
    from findtextcenternet_tpu.infer.pipeline import OCRPipeline
    from findtextcenternet_tpu.tools.annotate import process_image4
    from test_pipeline_differential import (
        fake_decode, fake_detector_apply, page_single_tile)

    if not lineengine.build_native():
        pytest.skip("line engine not buildable")

    page = page_single_tile()
    img = page.render()
    path = str(tmp_path / "page.png")
    Image.fromarray(img).save(path)

    # corrected annotation: every drawn char with its text
    textbox = [{"cx": cx, "cy": cy, "w": w, "h": h,
                "p_code1": 0.0, "p_code2": 0.0, "p_code4": 0.0,
                "p_code8": 0.0, "text": chr(cp)}
               for cx, cy, w, h, cp, _f in page.chars]
    with open(path + ".json", "w", encoding="utf-8") as f:
        json.dump({"textbox": textbox}, f, ensure_ascii=False)
    # map PNGs at half resolution (process_image1's output convention)
    lines8 = np.zeros((img.shape[0] // 2, img.shape[1] // 2), np.uint8)
    for kind, a, b0, b1, tag, thick in page.bands:
        if tag == 200 and kind == "h":
            lines8[(a - 4) // 2:(a + 4) // 2, b0 // 2:b1 // 2] = 255
    Image.fromarray(lines8).save(path + ".lines.png")
    Image.fromarray(np.zeros_like(lines8)).save(path + ".seps.png")

    cfg = Config(detector=DetectorConfig(model_size="tiny"),
                 transformer=TransformerConfig(embed_dim=64, head_num=4,
                                               enc_block_num=1,
                                               dec_block_num=1))
    pipe = OCRPipeline(cfg, detector_apply=fake_detector_apply,
                       decode_fn=fake_decode)
    out = process_image4(pipe, path)
    assert out is not None
    feats = np.load(path + ".npy")
    with open(path + ".json", encoding="utf-8") as f:
        data = json.load(f)
    boxlist = data["boxlist"]
    assert len(boxlist) == len(page.chars) == feats.shape[0]
    # reading order groups by line; text preserved
    texts = "".join(b["text"] for b in boxlist)
    assert sorted(texts) == sorted(chr(cp) for *_, cp, _f in page.chars)

    entries = load_realdata_dir(str(tmp_path))
    assert len(entries) == 1
    bank = FeatureBank.synthetic([ord("A")], seed=0)
    ds = TransformerDataset(bank, real_data=entries, noise_ratio=0.0)
    hits = sum(1 for _ in range(20)
               if ds.sample()["text"] in entries[0]["text"])
    assert hits >= 10   # replay weight x100 dominates the mix


def test_load_realdata_dir_and_mixing(tmp_path):
    feats = np.random.default_rng(0).normal(
        0, 5, (7, FEATURE_DIM)).astype(np.float16)
    np.save(tmp_path / "page.png.npy", feats)
    with open(tmp_path / "page.png.json", "w", encoding="utf-8") as f:
        json.dump({"textbox": [], "boxlist": _boxlist_fixture()}, f,
                  ensure_ascii=False)
    entries = load_realdata_dir(str(tmp_path))
    assert len(entries) == 1

    bank = FeatureBank.synthetic([ord("あ"), ord("A")], seed=0)
    ds = TransformerDataset(bank, real_data=entries, noise_ratio=0.0,
                            seed=0)
    # with 1 replay page (x100) and no corpus files, the replay source
    # dominates: most samples must come from the corrected page
    hits = sum(1 for _ in range(30)
               if ds.sample()["text"] in entries[0]["text"])
    assert hits >= 25
    s = ds.sample()
    assert s["decoder_true"][0] == DECODER_SOT
    assert DECODER_EOT in s["decoder_true"]


def test_block_boundary_same_lineid_emits_both_separators():
    """The reference resets prev_line=-1 inside the block-separator
    branch BEFORE the line check (data_transformer.py:326-348), so a new
    block whose first lineid equals the previous block's last lineid
    still gets both separator rows — and no spurious separator fires at
    the new block's second glyph."""
    boxes = [
        {"boxid": 0, "blockid": 1, "lineid": 2, "subidx": 0,
         "subtype": 0, "text": "A"},
        {"boxid": 1, "blockid": 2, "lineid": 2, "subidx": 0,
         "subtype": 0, "text": "X"},
        {"boxid": 2, "blockid": 2, "lineid": 2, "subidx": 0,
         "subtype": 0, "text": "Y"},
    ]
    feats = np.zeros((3, FEATURE_DIM), np.float32)
    entry = build_realdata_entry(feats, boxes)
    # rows: bsep, lsep, A, bsep, lsep, X, Y, trailing zero row
    assert entry["text"] == "\n\nA\n\nXY"
    assert entry["feature"].shape == (8, ENCODER_DIM)
