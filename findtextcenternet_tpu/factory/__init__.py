from .rasterizer import GlyphRasterizer, find_fonts  # noqa: F401
from .layout import Canvas  # noqa: F401
from .generators import PageGenerator, make_shards  # noqa: F401
