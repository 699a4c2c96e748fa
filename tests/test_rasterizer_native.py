"""Native C++ TrueType engine: metrics parity vs PIL, GSUB liga/vert,
and the reference-compatible glyphserver wire protocol
(/root/reference/make_traindata/render_font/render_font.cpp:519-596)."""
import ctypes
import os
import struct
import subprocess

import numpy as np
import pytest

from findtextcenternet_tpu.factory import rasterizer as R

DEJAVU = "/usr/share/fonts/truetype/dejavu/DejaVuSans.ttf"


@pytest.fixture(scope="module", autouse=True)
def built():
    if not R.build_native_rasterizer():
        pytest.skip("native rasterizer not buildable")
    if not os.path.exists(DEJAVU):
        pytest.skip("no DejaVuSans")


def test_advance_matches_pil():
    from PIL import ImageFont
    pil = ImageFont.truetype(DEJAVU, 48)
    rast = R.GlyphRasterizer(DEJAVU, 48)
    assert rast._native is not None
    for ch in "AWgj@%0":
        g = rast.glyph(ch)
        assert g is not None and g.bitmap.size > 0
        assert g.advance == pytest.approx(pil.getlength(ch), abs=0.51)


def test_ink_agrees_with_pil():
    """Bitmap ink from the native engine overlaps PIL's render >80%."""
    from PIL import Image, ImageDraw, ImageFont
    pil_font = ImageFont.truetype(DEJAVU, 64)
    rast = R.GlyphRasterizer(DEJAVU, 64)
    for ch in "AOx":
        g = rast.glyph(ch)
        img = Image.new("L", (128, 128), 0)
        ImageDraw.Draw(img).text((10, 10), ch, fill=255, font=pil_font)
        pil_arr = np.asarray(img, np.float32) / 255.0
        native = np.zeros_like(pil_arr)
        y0 = int(round(10 + g.offset_y))
        x0 = int(round(10 + g.offset_x))
        h, w = g.bitmap.shape
        native[y0:y0 + h, x0:x0 + w] = g.bitmap
        inter = np.minimum(native, pil_arr).sum()
        union = np.maximum(native, pil_arr).sum()
        assert inter / union > 0.8, ch


def test_fi_ligature_via_glyphserver():
    cps = [ord("f"), ord("i"), ord("x")]
    blob = b"".join(struct.pack("<I", c) for c in cps) + struct.pack(
        "<I", 0)
    out = subprocess.run([R.GLYPHSERVER_BIN, DEJAVU, "32", "0"],
                         input=blob, stdout=subprocess.PIPE,
                         check=True).stdout
    consumed = []
    off = 0
    while off < len(out):
        (c,) = struct.unpack_from("<I", out, off)
        off += 4
        rows, width = struct.unpack_from("<II", out, off)
        off += 28 + rows * width
        if rows * width:
            r2, w2 = struct.unpack_from("<II", out, off)
            off += 28 + r2 * w2
        consumed.append(c)
    assert consumed == [2, 1]   # "fi" fused into one ligature glyph


def _build_vert_font(path):
    from fontTools.fontBuilder import FontBuilder
    from fontTools.pens.ttGlyphPen import TTGlyphPen

    fb = FontBuilder(1000, isTTF=True)
    fb.setupGlyphOrder([".notdef", "A", "A.vert"])
    fb.setupCharacterMap({0x3042: "A"})   # あ

    def square(x0, y0, x1, y1):
        pen = TTGlyphPen(None)
        pen.moveTo((x0, y0))
        pen.lineTo((x1, y0))
        pen.lineTo((x1, y1))
        pen.lineTo((x0, y1))
        pen.closePath()
        return pen.glyph()

    fb.setupGlyf({".notdef": square(0, 0, 10, 10),
                  "A": square(100, 0, 900, 700),        # wide box
                  "A.vert": square(300, -100, 700, 800)})  # tall box
    fb.setupHorizontalMetrics({".notdef": (1000, 0),
                               "A": (1000, 100),
                               "A.vert": (1000, 300)})
    fb.setupHorizontalHeader(ascent=880, descent=-120)
    fb.setupNameTable({"familyName": "VertTest", "styleName": "Regular"})
    fb.setupOS2()
    fb.setupPost()
    fb.addOpenTypeFeatures(
        "feature vert { sub A by A.vert; } vert;")
    fb.save(path)


def test_gsub_vertical_substitution(tmp_path):
    font_path = str(tmp_path / "vert_test.ttf")
    _build_vert_font(font_path)

    lib = R._load_rast_lib()
    h = lib.rast_open(font_path.encode(), 50.0, 0, 0, 0)
    assert h
    assert lib.rast_has_vert(h, 0x3042) == 1

    rast = R.GlyphRasterizer(font_path, 50)
    hg = rast.glyph("あ", vertical=False)
    vg = rast.glyph("あ", vertical=True)
    # horizontal box is wide (800x700 units @50px/1000upem -> 40x35),
    # the vert substitute is tall (400x900 -> 20x45)
    assert hg.bitmap.shape[1] > hg.bitmap.shape[0]
    assert vg.bitmap.shape[0] > vg.bitmap.shape[1]
    # vertical offsets: centered on the column, top bearing from vmtx-less
    # synthesis; advance is one em
    assert vg.advance == pytest.approx(50.0, abs=1.0)
    assert vg.offset_x < 0


def test_oblique_and_embolden():
    plain = R.GlyphRasterizer(DEJAVU, 48)
    bold = R.GlyphRasterizer(DEJAVU, 48, bold=True)
    italic = R.GlyphRasterizer(DEJAVU, 48, italic=True)
    g0 = plain.glyph("H")
    gb = bold.glyph("H")
    gi = italic.glyph("H")
    assert gb.bitmap.sum() > g0.bitmap.sum() * 1.05   # more ink
    assert gi.bitmap.shape[1] > g0.bitmap.shape[1]    # sheared wider
    assert gb.advance > g0.advance                    # widened advance


def test_glyphserver_golden_protocol():
    """Recorded wire-protocol transcript stays byte-stable (fi ligature,
    plain glyph, space advance-only, unmapped codepoint)."""
    data = os.path.join(os.path.dirname(__file__), "data")
    blob = open(os.path.join(data, "glyphserver_dejavu24.in.bin"),
                "rb").read()
    expect = open(os.path.join(data, "glyphserver_dejavu24.out.bin"),
                  "rb").read()
    out = subprocess.run([R.GLYPHSERVER_BIN, DEJAVU, "24", "0"],
                         input=blob, stdout=subprocess.PIPE,
                         check=True).stdout
    assert out == expect


def _build_cff_font(path, chars="AOgx"):
    """OTF/CFF fixture: DejaVu outlines re-encoded as Type2 charstrings
    (the image ships no OTF fonts; Japanese OTFs are CFF-flavoured)."""
    from fontTools.fontBuilder import FontBuilder
    from fontTools.pens.t2CharStringPen import T2CharStringPen
    from fontTools.ttLib import TTFont

    src = TTFont(DEJAVU)
    gs = src.getGlyphSet()
    upem = src["head"].unitsPerEm
    cmap = src.getBestCmap()
    hmtx = src["hmtx"]
    names = [".notdef"] + [cmap[ord(c)] for c in chars]
    fb = FontBuilder(upem, isTTF=False)
    fb.setupGlyphOrder(names)
    fb.setupCharacterMap({ord(c): cmap[ord(c)] for c in chars})
    cs, metrics = {}, {}
    for n in names:
        width = hmtx[n][0]
        pen = T2CharStringPen(width, gs)
        if n != ".notdef":
            gs[n].draw(pen)
        cs[n] = pen.getCharString()
        metrics[n] = hmtx[n]
    fb.setupCFF("CFFTest", {}, cs, {})
    fb.setupHorizontalMetrics(metrics)
    fb.setupHorizontalHeader(ascent=src["hhea"].ascent,
                             descent=src["hhea"].descent)
    fb.setupNameTable({"familyName": "CFFTest", "styleName": "Regular"})
    fb.setupOS2()
    fb.setupPost()
    fb.save(path)


def test_cff_outlines_match_truetype(tmp_path):
    """Type2 charstring interpreter: same glyphs through the CFF path and
    the glyf path must produce near-identical ink and equal advances."""
    path = str(tmp_path / "cfftest.otf")
    _build_cff_font(path)
    rt = R.GlyphRasterizer(DEJAVU, 64)
    rc = R.GlyphRasterizer(path, 64)
    assert rc._native is not None, "native engine rejected the OTF"
    for ch in "AOgx":
        gt = rt.glyph(ch)
        gc = rc.glyph(ch)
        assert gc is not None and gc.bitmap.size > 0, ch
        assert gc.advance == pytest.approx(gt.advance, abs=1.0), ch
        canvas_t = np.zeros((160, 160), np.float32)
        canvas_c = np.zeros((160, 160), np.float32)
        for canvas, g in ((canvas_t, gt), (canvas_c, gc)):
            y0 = int(round(70 + g.offset_y))
            x0 = int(round(20 + g.offset_x))
            h, w = g.bitmap.shape
            canvas[y0:y0 + h, x0:x0 + w] = g.bitmap
        inter = np.minimum(canvas_t, canvas_c).sum()
        union = np.maximum(canvas_t, canvas_c).sum()
        assert inter / union > 0.9, (ch, inter / union)


def test_truncated_font_no_crash(tmp_path):
    """Corrupt/truncated SFNT files must be rejected or rendered
    best-effort — never read out of bounds (validated offsets)."""
    data = open(DEJAVU, "rb").read()
    lib = R._load_rast_lib()
    m = (ctypes.c_int32 * 10)()
    buf = (ctypes.c_uint8 * (1 << 18))()
    for n in (12, 100, 1000, len(data) // 4, len(data) // 2):
        p = tmp_path / f"trunc{n}.ttf"
        p.write_bytes(data[:n])
        h = lib.rast_open(str(p).encode(), 32.0, 0, 0, 0)
        if h:
            lib.rast_glyph(h, ord("A"), 0, m, buf, 1 << 18)
            lib.rast_close(h)


def test_vertical_metrics_from_vmtx(tmp_path):
    """A font with vhea/vmtx drives vertical advance and top bearing from
    the table instead of the synthesized em-based fallback."""
    from fontTools.fontBuilder import FontBuilder
    from fontTools.pens.ttGlyphPen import TTGlyphPen

    fb = FontBuilder(1000, isTTF=True)
    fb.setupGlyphOrder([".notdef", "A"])
    fb.setupCharacterMap({65: "A"})
    pen = TTGlyphPen(None)
    pen.moveTo((100, 0))
    pen.lineTo((900, 0))
    pen.lineTo((900, 700))
    pen.lineTo((100, 700))
    pen.closePath()
    fb.setupGlyf({".notdef": TTGlyphPen(None).glyph(), "A": pen.glyph()})
    fb.setupHorizontalMetrics({".notdef": (600, 0), "A": (1000, 100)})
    fb.setupHorizontalHeader(ascent=800, descent=-200)
    fb.setupVerticalMetrics({".notdef": (1000, 0), "A": (1500, 120)})
    fb.setupVerticalHeader(ascent=500, descent=-500)
    fb.setupNameTable({"familyName": "VmtxTest", "styleName": "Regular"})
    fb.setupOS2()
    fb.setupPost()
    path = str(tmp_path / "vmtx_test.ttf")
    fb.save(path)

    lib = R._load_rast_lib()
    h = lib.rast_open(path.encode(), 100.0, 0, 0, 0)
    assert h
    m = (ctypes.c_int32 * 10)()
    buf = (ctypes.c_uint8 * (1 << 18))()
    n = lib.rast_glyph(h, 65, 1, m, buf, 1 << 18)
    assert n > 0
    # vmtx advanceHeight 1500 units @100px/1000upem -> 150px = 9600 in 26.6
    assert m[9] == pytest.approx(150 * 64, abs=64)
    # tsb 120 units -> 12px
    assert m[8] == pytest.approx(12 * 64, abs=64)


def test_corrupt_font_fuzz_no_crash():
    """Truncated/bit-flipped SFNT files must never crash the in-process
    parser (every file-internal offset is validated against the mapped
    size — ttf.cpp's bounds-check contract). Runs in a subprocess so a
    regression segfaults the child, not the test session."""
    import sys

    code = r'''
import ctypes, pathlib, random, tempfile, os
from findtextcenternet_tpu.factory.rasterizer import _load_rast_lib, find_fonts
lib = _load_rast_lib()
src = next(f for f in find_fonts()
           if f.lower().endswith((".ttf", ".otf")))
data = pathlib.Path(src).read_bytes()
rng = random.Random(1)
met = (ctypes.c_int32 * 10)()
buf = (ctypes.c_uint8 * (1 << 22))()
for trial in range(150):
    n = rng.randrange(0, len(data))
    blob = bytearray(data[:n])
    for _ in range(rng.randrange(0, 16)):
        if blob:
            blob[rng.randrange(len(blob))] = rng.randrange(256)
    with tempfile.NamedTemporaryFile(suffix=".ttf", delete=False) as tf:
        tf.write(bytes(blob)); tmp = tf.name
    h = lib.rast_open(tmp.encode(), float(24), 0, 0, 0)
    if h:
        for cp in (0x41, 0x3042, 0x4E00):
            lib.rast_glyph(h, cp, trial % 2, met, buf, len(buf))
        lib.rast_close(h)
    os.unlink(tmp)
print("OK")
'''
    r = subprocess.run([sys.executable, "-c", code],
                       capture_output=True, text=True, timeout=300)
    assert r.returncode == 0, (r.returncode, r.stderr[-2000:])
    assert "OK" in r.stdout
