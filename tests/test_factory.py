"""Synthetic-data factory: rasterizer, layout engine, page generation."""
import numpy as np
import pytest

from findtextcenternet_tpu.factory import (
    Canvas, GlyphRasterizer, PageGenerator, find_fonts, make_shards,
)

FONTS = [f for f in find_fonts() if "DejaVuSans.ttf" in f]
pytestmark = pytest.mark.skipif(not FONTS, reason="no usable fonts")
ASCII = "".join(chr(c) for c in range(0x41, 0x5B))


@pytest.fixture(scope="module")
def rast():
    return GlyphRasterizer(FONTS[0], 32)


def test_glyph_metrics(rast):
    g = rast.glyph("A")
    assert g is not None
    assert g.bitmap.ndim == 2 and g.bitmap.max() > 0.5
    assert g.advance > 5
    # whitespace: no ink but an advance
    sp = rast.glyph(" ")
    assert sp is not None and sp.bitmap.size == 0 and sp.advance > 0


def test_draw_line_records_boxes(rast):
    c = Canvas(400, 120)
    adv = c.draw_line("HELLO", rast, 20, 50)
    assert adv > 50
    out = c.result()
    assert out["position"].shape[0] == 5
    # boxes ordered left to right
    xs = out["position"][:, 0]
    assert (np.diff(xs) > 0).all()
    # textline map marked under the text
    assert out["textline"].max() == 255
    assert out["image"].max() > 128


def test_space_flag(rast):
    c = Canvas(400, 120)
    c.draw_line("AB C", rast, 20, 50)
    out = c.result()
    assert out["code_list"].shape[0] == 3
    # 'C' follows a space -> bit 8
    assert out["code_list"][2, 1] & 8 == 8
    assert out["code_list"][0, 1] & 8 == 0


def test_ruby_flags(rast):
    ruby_rast = GlyphRasterizer(FONTS[0], 16)
    c = Canvas(500, 160)
    c.draw_line("X￹AB￺cd￻Y", rast, 20, 80, ruby_rast=ruby_rast)
    out = c.result()
    codes = {chr(r[0]): r[1] for r in out["code_list"]}
    assert codes["A"] & 2 == 2 and codes["A"] & 1 == 0     # ruby base
    assert codes["c"] & 3 == 3                             # ruby text
    assert codes["X"] & 3 == 0
    # ruby glyphs sit above the base line
    pos = {chr(r[0]): p for r, p in zip(out["code_list"], out["position"])}
    assert pos["c"][1] < pos["A"][1]


def test_typeset_wraps_lines(rast):
    c = Canvas(300, 400)
    n = c.typeset(ASCII * 3, rast, (20, 40), 260)
    assert n >= 2
    out = c.result()
    ys = out["position"][:, 1]
    assert ys.max() - ys.min() > 20  # multiple rows


def test_grid_has_separators(rast):
    c = Canvas(800, 800)
    c.random_grid(ASCII, rast, rows=3, cols=3)
    out = c.result()
    assert out["sepline"].max() == 255
    assert out["position"].shape[0] == 9


def test_page_generator_all_kinds():
    gen = PageGenerator(FONTS, width=600, height=600, charset=ASCII, seed=0)
    for kind in ("chars", "furigana", "grid", "scatter", "words", "mixed",
                 "textline"):
        page = gen.generate(kind)
        assert page["image"].shape == (600, 600)
        assert page["textline"].shape == (300, 300)
        assert page["position"].shape[0] == page["code_list"].shape[0]
        if kind not in ("furigana",):
            assert page["position"].shape[0] > 0, kind


def test_make_shards_roundtrip(tmp_path):
    from findtextcenternet_tpu.data.shards import iter_tar_samples
    gen = PageGenerator(FONTS, width=400, height=400, charset=ASCII, seed=1)
    paths = make_shards(str(tmp_path / "train%05d.tar"), 4, gen,
                        samples_per_shard=2)
    assert len(paths) == 2
    samples = []
    for p in paths:
        samples.extend(iter_tar_samples(p))
    assert len(samples) == 4
    s = samples[0]
    assert {"image.png", "textline.png", "sepline.png", "position.npy",
            "code_list.npy", "txt", "__key__"} <= set(s)


def test_book_page_columns():
    """Multi-column book pages: separator rules between columns, boxes in
    every column strip."""
    from findtextcenternet_tpu.factory import PageGenerator, find_fonts
    fonts = [f for f in find_fonts() if "DejaVuSans.ttf" in f]
    if not fonts:
        pytest.skip("no fonts")
    gen = PageGenerator(fonts, width=600, height=600, charset="ABCDEFGH",
                        seed=3)
    page = gen.generate(kind="book")
    assert len(page["position"]) > 20
    assert page["sepline"].max() > 0          # gutter/header rules drawn
    # boxes spread over more than half of the page width (multi column)
    xs = page["position"][:, 0]
    assert xs.max() - xs.min() > 300
