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


def test_wrap_is_advance_measured():
    """Proportional Latin text wraps on measured glyph advances, not a
    char-count budget (VERDICT r2: `layout.py` wrap could overflow)."""
    from findtextcenternet_tpu.factory.layout import Canvas
    from findtextcenternet_tpu.factory.rasterizer import GlyphRasterizer
    fonts = [f for f in find_fonts() if "DejaVuSans.ttf" in f]
    if not fonts:
        pytest.skip("no fonts")
    rast = GlyphRasterizer(fonts[0], 32)
    canvas = Canvas(800, 600)
    # 'W' is ~2.4x wider than 'i' in DejaVu; a count-based budget would
    # emit equal-length lines for both
    wide = canvas._wrap("W" * 60, 400, rast, False)
    narrow = canvas._wrap("i" * 60, 400, rast, False)
    assert len(wide) > len(narrow)
    # every wide line measures within the extent (+1 glyph kinsoku slack)
    wadv = rast.glyph("W").advance * 1.02
    for line in wide:
        assert len(line) * wadv <= 400 + wadv
    # kinsoku: a comma never starts a line
    lines = canvas._wrap("aaaaaaaaaa,aaaa", 10 * 32, rast, False)
    assert all(not ln.startswith(",") for ln in lines)


def test_ruby_distribution_and_overhang():
    """Wide ruby overhangs the base by at most half a ruby em; narrow
    ruby distributes across the base span (renderer.py:1917-2202)."""
    from findtextcenternet_tpu.factory.layout import Canvas
    from findtextcenternet_tpu.factory.rasterizer import GlyphRasterizer
    fonts = [f for f in find_fonts() if "DejaVuSans.ttf" in f]
    if not fonts:
        pytest.skip("no fonts")
    rast = GlyphRasterizer(fonts[0], 40)
    ruby = GlyphRasterizer(fonts[0], 20)
    canvas = Canvas(800, 300)
    canvas.draw_line("xx￹AB￺MMMMMMM￻xx", rast, 100, 150,
                     ruby_rast=ruby)
    pos = np.array([[b.cx, b.cy, b.w, b.h, b.code, b.flags]
                    for b in canvas.boxes])
    base = pos[pos[:, 5] == 2]
    rub = pos[pos[:, 5] == 3]
    assert len(base) == 2 and len(rub) == 7
    b_x0 = (base[:, 0] - base[:, 2] / 2).min()
    b_x1 = (base[:, 0] + base[:, 2] / 2).max()
    r_x0 = (rub[:, 0] - rub[:, 2] / 2).min()
    r_x1 = (rub[:, 0] + rub[:, 2] / 2).max()
    # overhang bounded by ~half a ruby em each side
    assert r_x0 >= b_x0 - ruby.size * 0.75
    assert r_x1 <= b_x1 + ruby.size * 0.75
    # ruby sits above the base line
    assert rub[:, 1].max() < base[:, 1].min()


def test_warichu_inline_flow():
    """（...）runs render as two half-size rows inside the line and the
    pen continues after them."""
    from findtextcenternet_tpu.factory.layout import Canvas
    from findtextcenternet_tpu.factory.rasterizer import GlyphRasterizer
    fonts = [f for f in find_fonts() if "DejaVuSans.ttf" in f]
    if not fonts:
        pytest.skip("no fonts")
    rast = GlyphRasterizer(fonts[0], 40)
    half = GlyphRasterizer(fonts[0], 20)
    canvas = Canvas(900, 300)
    canvas.draw_line("AB（abcd）CD", rast, 60, 150, ruby_rast=half,
                     wari=True)
    pos = np.array([[b.cx, b.cy, b.w, b.h, b.code] for b in canvas.boxes])
    assert len(pos) == 8
    small = pos[np.isin(pos[:, 4], [ord(c) for c in "abcd"])]
    big = pos[np.isin(pos[:, 4], [ord(c) for c in "ABCD"])]
    assert small[:, 3].max() < big[:, 3].min()      # half size
    # two rows: two distinct y clusters among the warichu chars
    ys = np.sort(small[:, 1])
    assert ys[-1] - ys[0] > 10
    # CD continues after the note (pen advanced past it)
    assert big[:, 0].max() > small[:, 0].max()


def test_generator_new_kinds():
    gen = PageGenerator(FONTS, width=500, height=500,
                        charset="ABCDEFGHIJKLMNOP", seed=7)
    hw = gen.generate(kind="handwriting")
    assert len(hw["position"]) > 5
    wari = gen.generate(kind="wari")
    assert len(wari["position"]) > 10
    # korean falls back to a char page without hangul coverage (DejaVu)
    kr = gen.generate(kind="korean")
    assert len(kr["position"]) > 10


def test_make_shards_multiprocess_pages_differ(tmp_path):
    """Pool workers receive the generator with the parent's untouched
    rng state; without the per-task reseed every page would replay the
    identical random sequence."""
    from findtextcenternet_tpu.data.shards import iter_tar_samples
    gen = PageGenerator(FONTS, width=400, height=400, charset=ASCII,
                        seed=1)
    paths = make_shards(str(tmp_path / "mp%05d.tar"), 4, gen,
                        samples_per_shard=4, processes=2)
    samples = sorted(
        (s for p in paths for s in iter_tar_samples(p)),
        key=lambda s: s["__key__"])
    assert len(samples) == 4
    imgs = [s["image.png"] for s in samples]
    texts = [s["txt"] for s in samples]
    distinct = {(t, im.tobytes()) for t, im in zip(texts, imgs)}
    assert len(distinct) > 1, "all multiprocess pages identical"
