from .rasterizer import GlyphRasterizer, find_fonts  # noqa: F401
from .layout import Canvas  # noqa: F401
from .generators import PageGenerator, make_shards  # noqa: F401
from .rasterizer import build_native_rasterizer  # noqa: F401
from .charpools import (  # noqa: F401
    build_wordlist,
    char_class,
    weighted_char_sampler,
)
