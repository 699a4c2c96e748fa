"""CJK factory golden (VERDICT r4 item 6): the image ships no CJK
fonts, so the factory-level audits run on DejaVu. Here a small
CJK-subset TTF is built in-test with fontTools (kana + kanji + vert-GSUB
punctuation, the same technique as the rasterizer-level fixtures in
`test_rasterizer_native.py`) and the *factory* stack — GlyphRasterizer →
Canvas layout → PageGenerator — is asserted on real CJK codepoints:
GSUB `vert` substitution in vertical flow, vertical column order,
JIS ruby geometry over kanji bases, and the line/sep training maps.

Reference behavior modeled: vertical + ruby rendering in
`/root/reference/make_traindata/render_font/renderer.py:1917-2202` and
the furigana page generator `generate_random_txt.py:411-577`.
"""
import numpy as np
import pytest

from findtextcenternet_tpu.factory import rasterizer as R
from findtextcenternet_tpu.factory.layout import Canvas
from findtextcenternet_tpu.factory.rasterizer import GlyphRasterizer

# a tiny but real CJK repertoire: hiragana (ruby material), kanji
# (base material), CJK punctuation with vertical substitutes
HIRA = "あいうえおかきくけこ"          # U+3042.. (odd steps) + U+304B..
KANJI = "吾輩猫名前"                    # U+543E U+8F29 U+732B U+540D U+524D
MARU = "。"                             # U+3002 — vert form moves corner
CHOON = "ー"                            # U+30FC — vert form rotates


def _square(x0, y0, x1, y1):
    from fontTools.pens.ttGlyphPen import TTGlyphPen
    pen = TTGlyphPen(None)
    pen.moveTo((x0, y0))
    pen.lineTo((x1, y0))
    pen.lineTo((x1, y1))
    pen.lineTo((x0, y1))
    pen.closePath()
    return pen.glyph()


def _build_cjk_font(path: str):
    """A subset CJK TTF: full-width kana/kanji squares, a small-corner
    。 with a `vert` substitute in the opposite corner (the real-font
    convention), and a horizontal-bar ー whose `vert` substitute is a
    vertical bar (rotation convention)."""
    from fontTools.fontBuilder import FontBuilder

    fb = FontBuilder(1000, isTTF=True)
    glyphs = {".notdef": _square(0, 0, 10, 10)}
    cmap = {}
    order = [".notdef"]
    metrics = {".notdef": (1000, 0)}

    def add(ch, glyph, lsb=None, name=None):
        gname = name or f"uni{ord(ch):04X}"
        glyphs[gname] = glyph
        order.append(gname)
        if name is None:
            cmap[ord(ch)] = gname
        metrics[gname] = (1000, lsb if lsb is not None else 100)
        return gname

    for ch in HIRA:
        add(ch, _square(150, 30, 850, 730), lsb=150)
    for ch in KANJI:
        add(ch, _square(80, -20, 920, 820), lsb=80)
    # 。: bottom-left corner dot horizontally, top-right vertically
    add(MARU, _square(80, 0, 320, 240), lsb=80)
    add(MARU, _square(680, 460, 920, 700), lsb=680, name="uni3002.vert")
    # ー: horizontal bar, rotated to vertical bar in vertical flow
    add(CHOON, _square(100, 330, 900, 480), lsb=100)
    add(CHOON, _square(430, -60, 580, 740), lsb=430, name="uni30FC.vert")

    fb.setupGlyphOrder(order)
    fb.setupCharacterMap(cmap)
    fb.setupGlyf(glyphs)
    fb.setupHorizontalMetrics(metrics)
    fb.setupHorizontalHeader(ascent=880, descent=-120)
    fb.setupNameTable({"familyName": "CJKTest", "styleName": "Regular"})
    fb.setupOS2()
    fb.setupPost()
    fb.addOpenTypeFeatures(
        "feature vert {"
        "  sub uni3002 by uni3002.vert;"
        "  sub uni30FC by uni30FC.vert;"
        "} vert;")
    fb.save(path)


@pytest.fixture(scope="module")
def cjk_font(tmp_path_factory):
    if not R.build_native_rasterizer():
        pytest.skip("native rasterizer not buildable")
    path = str(tmp_path_factory.mktemp("cjkfont") / "cjk_test.ttf")
    _build_cjk_font(path)
    return path


def test_vert_gsub_on_cjk_punctuation(cjk_font):
    """The factory rasterizer applies GSUB `vert` on real CJK
    codepoints: 。 jumps to the opposite corner, ー rotates."""
    rast = GlyphRasterizer(cjk_font, 48)
    mh = rast.glyph(MARU, vertical=False)
    mv = rast.glyph(MARU, vertical=True)
    # horizontal form inks the bottom-left of the em; vert the top-right
    assert mh.offset_x < 10
    # the vertical blit centers the em on the column (offset_x ~ -em/2);
    # the ink column inside the bitmap tells the corner apart
    assert mv.bitmap.shape == mh.bitmap.shape  # same square dot size
    ch = rast.glyph(CHOON, vertical=False)
    cv = rast.glyph(CHOON, vertical=True)
    assert ch.bitmap.shape[1] > 2 * ch.bitmap.shape[0]   # wide bar
    assert cv.bitmap.shape[0] > 2 * cv.bitmap.shape[1]   # tall bar


def test_vertical_furigana_geometry(cjk_font):
    """JIS ruby geometry on kanji bases in a vertical column: ruby runs
    down the right side of the base span, half size, flagged 3; the
    base kanji are flagged 2; plain flow continues below."""
    rast = GlyphRasterizer(cjk_font, 48)
    ruby = GlyphRasterizer(cjk_font, 24)
    canvas = Canvas(400, 700)
    canvas.draw_line("￹吾輩￺あいうえ￻は猫", rast, 200, 40,
                     vertical=True, ruby_rast=ruby)
    pos = np.array([[b.cx, b.cy, b.w, b.h, b.code, b.flags]
                    for b in canvas.boxes])
    base = pos[pos[:, 5] == 2]
    rub = pos[pos[:, 5] == 3]
    plain = pos[pos[:, 5] == 0]
    assert len(base) == 2 and len(rub) == 4
    assert [chr(int(c)) for c in base[:, 4]] == ["吾", "輩"]
    assert all("ぁ" <= chr(int(c)) <= "ゖ" for c in rub[:, 4])
    # vertical flow: base column top-down, centers on one x
    assert base[1, 1] > base[0, 1]
    assert abs(base[0, 0] - base[1, 0]) < 4
    # ruby sits to the RIGHT of the base column (vertical-furigana
    # side), within 1.25 line heights — the corridor the line engine's
    # ruby attachment scans (`src/ruby.cpp`)
    assert rub[:, 0].min() > base[:, 0].max()
    assert rub[:, 0].max() < base[:, 0].mean() + 1.25 * rast.size
    # distributed across the base span (first ruby above last, all
    # within the base ink span +/- half a ruby em)
    b_y0 = (base[:, 1] - base[:, 3] / 2).min() - ruby.size * 0.75
    b_y1 = (base[:, 1] + base[:, 3] / 2).max() + ruby.size * 0.75
    assert rub[:, 1].min() >= b_y0 and rub[:, 1].max() <= b_y1
    # half-size ruby ink
    assert rub[:, 3].max() < base[:, 3].min() * 0.7
    # plain flow continues below the ruby group in the same column
    assert len(plain) == 2
    assert plain[:, 1].min() > base[:, 1].max()
    assert abs(plain[:, 0].mean() - base[:, 0].mean()) < 6


def test_vertical_page_columns_and_maps(cjk_font):
    """A full vertical page: columns advance right-to-left, every CJK
    box center is covered by the textline map, and the 。 vertical
    form lands in the upper-right of its em."""
    rast = GlyphRasterizer(cjk_font, 40)
    ruby = GlyphRasterizer(cjk_font, 20)
    canvas = Canvas(600, 500)
    text = "￹吾輩￺あい￻は￹猫￺ねこ￻。ーかきくけこあいうえお" * 3
    n = canvas.typeset(text, rast, (560, 30), 440, vertical=True,
                       ruby_rast=ruby)
    assert n >= 3
    pos = np.array([[b.cx, b.cy, b.w, b.h, b.code, b.flags]
                    for b in canvas.boxes])
    nonruby = pos[pos[:, 5] != 3]
    # column order: group non-ruby boxes into columns by cx cluster;
    # reading order must be right-to-left (cx non-increasing along the
    # recorded order at each column switch)
    col_x = []
    for row in nonruby:
        if not col_x or abs(row[0] - col_x[-1]) > rast.size:
            col_x.append(row[0])
    assert len(col_x) == n
    assert all(b < a for a, b in zip(col_x, col_x[1:]))
    # training maps: every non-ruby box center hits the textline band
    # (ruby ink is deliberately outside it — the line engine attaches
    # ruby by perpendicular scan, `native/lineengine/src/ruby.cpp`)
    s = canvas.map_scale
    for cx, cy in nonruby[:, :2]:
        assert canvas.textline[int(cy / s), int(cx / s)] == 255
    # the vert 。 substitute: its ink center is in the top-right
    # quadrant of its em (the horizontal form would be bottom-left)
    maru = pos[pos[:, 4] == ord(MARU)]
    assert len(maru) == 3
    kana = pos[(pos[:, 5] == 0) & (pos[:, 4] != ord(MARU))
               & (pos[:, 4] != ord(CHOON))]
    # within its column, 。's ink center sits right of the kana centers
    for m in maru:
        col = kana[np.abs(kana[:, 0] - m[0]) < rast.size]
        assert len(col) and m[0] >= col[:, 0].mean()
    # ー rotated: taller than wide in vertical flow
    choon = pos[pos[:, 4] == ord(CHOON)]
    assert len(choon) == 3 and (choon[:, 3] > choon[:, 2]).all()


def test_generator_furigana_cjk_page(cjk_font):
    """PageGenerator end-to-end on the CJK font: a vertical furigana
    page carries ruby-flagged kana over kanji bases and fills the
    training-sample contract (position/code_list/maps)."""
    from findtextcenternet_tpu.factory.generators import PageGenerator

    gen = PageGenerator([cjk_font], width=520, height=520,
                        charset=HIRA + KANJI, seed=3)
    page = None
    for _ in range(12):   # vertical is a coin flip per page
        p = gen.generate(kind="furigana")
        flags = p["code_list"][:, 1]
        if p["vertical"] and (flags & 1).any():
            page = p
            break
    assert page is not None, "no vertical furigana page in 12 draws"
    pos, codes = page["position"], page["code_list"]
    assert len(pos) == len(codes) and len(pos) > 10
    # real CJK codepoints only
    assert all(chr(c) in HIRA + KANJI + "\n " for c in codes[:, 0])
    rub = pos[(codes[:, 1] & 1) == 1]
    base = pos[(codes[:, 1] & 2) == 2]
    base = base[(codes[(codes[:, 1] & 2) == 2][:, 1] & 1) == 0] \
        if len(base) else base
    kana_rows = codes[(codes[:, 1] & 1) == 1][:, 0]
    assert all("ぁ" <= chr(c) <= "ゖ" for c in kana_rows)
    # ruby ink is genuinely half-scale
    if len(base):
        assert np.median(rub[:, 3]) < np.median(base[:, 3])
    # maps exist at half resolution and the textline map has ink
    assert page["textline"].shape == (260, 260)
    assert page["textline"].max() == 255
    # every box lies inside the page
    assert (pos[:, 0] >= 0).all() and (pos[:, 0] <= 520).all()
    assert (pos[:, 1] >= 0).all() and (pos[:, 1] <= 520).all()
