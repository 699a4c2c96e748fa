"""Glyph rasterization for the synthetic-data factory.

The reference drives a C++ FreeType subprocess with hand-parsed GSUB
vertical substitution (`/root/reference/make_traindata/render_font/
render_font.cpp`). Here rasterization goes through PIL's FreeType binding
(with libraqm for vertical shaping, which resolves `vert`/`vrt2` features
natively), giving per-glyph alpha bitmaps + metrics for both orientations,
plus synthetic oblique (shear) and embolden (stroke) variants.
"""
from __future__ import annotations

import dataclasses
import os
from typing import Dict, Optional, Tuple

import numpy as np
from PIL import Image, ImageDraw, ImageFont

from PIL import features as pil_features

HAS_RAQM = bool(pil_features.check("raqm"))


@dataclasses.dataclass
class Glyph:
    bitmap: np.ndarray        # (h, w) float32 alpha in [0, 1]
    offset_x: float           # bitmap origin relative to pen position
    offset_y: float
    advance: float            # pen advance along the text direction


class GlyphRasterizer:
    """Rasterize single glyphs with metrics, horizontal and vertical."""

    def __init__(self, font_path: str, size: int,
                 bold: bool = False, italic: bool = False):
        self.font_path = font_path
        self.size = size
        self.bold = bold
        self.italic = italic
        self.font = ImageFont.truetype(font_path, size)
        self._cache: Dict[Tuple[str, bool], Optional[Glyph]] = {}

    _cmap = None

    def has_glyph(self, ch: str) -> bool:
        """True when the font's cmap really maps the character (a naive
        render test counts .notdef tofu boxes as coverage)."""
        if self._cmap is None:
            try:
                from fontTools.ttLib import TTFont
                tt = TTFont(self.font_path, fontNumber=0, lazy=True)
                self._cmap = tt.getBestCmap()
            except Exception:
                self._cmap = {}
        if self._cmap:
            return ord(ch) in self._cmap
        try:
            mask = self.font.getmask(ch)
            return mask.size[0] > 0 and mask.size[1] > 0
        except Exception:
            return False

    def glyph(self, ch: str, vertical: bool = False) -> Optional[Glyph]:
        key = (ch, vertical)
        if key in self._cache:
            return self._cache[key]
        g = self._render(ch, vertical)
        self._cache[key] = g
        return g

    def _render(self, ch: str, vertical: bool) -> Optional[Glyph]:
        s = self.size
        pad = s  # margin for overshoot
        W = H = 3 * s + 2 * pad
        img = Image.new("L", (W, H), 0)
        draw = ImageDraw.Draw(img)
        direction = "ttb" if (vertical and HAS_RAQM) else "ltr"
        stroke = max(1, s // 24) if self.bold else 0
        try:
            draw.text((W // 2, H // 2), ch, fill=255, font=self.font,
                      direction=direction, stroke_width=stroke,
                      stroke_fill=255)
            if vertical and HAS_RAQM:
                adv = s  # nominal vertical advance (em)
            else:
                adv = draw.textlength(ch, font=self.font,
                                      direction="ltr") + 2 * stroke
        except Exception:
            try:
                draw.text((W // 2, H // 2), ch, fill=255, font=self.font)
                adv = draw.textlength(ch, font=self.font)
            except Exception:
                return None

        arr = np.asarray(img, dtype=np.float32) / 255.0
        if self.italic:
            arr = self._shear(arr)
        ys, xs = np.nonzero(arr > 0.02)
        if len(xs) == 0:
            # whitespace-like glyph: no ink, advance only
            return Glyph(np.zeros((0, 0), np.float32), 0.0, 0.0,
                         float(adv))
        x0, x1 = xs.min(), xs.max() + 1
        y0, y1 = ys.min(), ys.max() + 1
        bitmap = arr[y0:y1, x0:x1].copy()
        return Glyph(bitmap, float(x0 - W // 2), float(y0 - H // 2),
                     float(adv))

    @staticmethod
    def _shear(arr: np.ndarray, slant: float = 0.2) -> np.ndarray:
        h, w = arr.shape
        out = np.zeros((h, w + int(h * slant) + 1), np.float32)
        for y in range(h):
            dx = int((h - y) * slant)
            out[y, dx:dx + w] = arr[y]
        return out


DEFAULT_FONT_DIRS = (
    "/usr/share/fonts",
    os.path.expanduser("~/.fonts"),
)


def find_fonts(extra_dirs=()) -> list:
    """All usable font files on the system + user dirs."""
    out = []
    for d in tuple(extra_dirs) + DEFAULT_FONT_DIRS:
        if not os.path.isdir(d):
            continue
        for root, _, files in os.walk(d):
            for f in files:
                if f.lower().endswith((".ttf", ".otf", ".ttc")):
                    out.append(os.path.join(root, f))
    return sorted(set(out))
