"""Factory distribution audit (VERDICT r3 item 6).

Asserts that the synthetic-page generator's sampled knobs match the
reference generator's parameter distributions (read from
`/root/reference/make_traindata/render_font/generate_random_txt.py`,
cited per knob in ``factory/generators.py``) and that rendered pages
stay inside per-kind structural envelopes (boxes/page, box sizes,
map densities, flag fractions).
"""
import numpy as np
import pytest

from findtextcenternet_tpu.factory import PageGenerator, find_fonts
from findtextcenternet_tpu.tools.factory_audit import (
    PAGE_ENVELOPES, REFERENCE_MIX, collect, mix_fractions, page_stats)

FONTS = find_fonts()
pytestmark = pytest.mark.skipif(not FONTS, reason="no usable fonts")


@pytest.fixture(scope="module")
def gen():
    return PageGenerator(FONTS, width=800, height=800, seed=7)


@pytest.fixture(scope="module")
def stats(gen):
    return collect(gen, pages_per_kind=4)


def test_kind_mix_matches_reference(gen):
    """Empirical pick_kind fractions vs get_random_text weights
    (`generate_random_txt.py:1025-1061`). n=6000 => 3-sigma of the
    largest weight (0.3) is ~0.018."""
    mix = mix_fractions(gen, n=6000)
    assert abs(sum(mix.values()) - 1.0) < 1e-9
    for kind, want in REFERENCE_MIX.items():
        sigma = (want * (1 - want) / 6000) ** 0.5
        assert abs(mix[kind] - want) < 4 * sigma + 1e-6, \
            f"{kind}: {mix[kind]:.4f} vs {want}"


def test_knob_distributions():
    """Vertical 0.5, bold 0.2, log-uniform font size (reference
    `generate_random_txt.py:606-615`): sampled from generated pages."""
    g = PageGenerator(FONTS, width=800, height=800, seed=3,
                      charset="ABCDEFGHIJKLMNOP")
    pages = [g.generate("chars") for _ in range(40)]
    vert = np.mean([p["vertical"] for p in pages])
    assert 0.25 <= vert <= 0.75          # binomial(40, .5) 3-sigma ~.24
    sizes = np.array([p["font_size"] for p in pages], float)
    lo, hi = max(12.0, 0.015 * 800), 0.10 * 800
    assert sizes.min() >= lo - 1 and sizes.max() <= hi + 1
    # log-uniform: the log-midpoint splits the sample roughly in half
    mid = np.exp((np.log(lo) + np.log(hi)) / 2)
    frac_low = np.mean(sizes < mid)
    assert 0.2 <= frac_low <= 0.8


def test_page_envelopes(stats):
    for kind, rows in stats.items():
        min_boxes, dmin, dmax = PAGE_ENVELOPES[kind]
        boxes = np.mean([r["boxes"] for r in rows])
        assert boxes >= min_boxes, f"{kind}: {boxes} boxes < {min_boxes}"
        dens = np.mean([r["textline_density"] for r in rows])
        assert dmin <= dens <= dmax, f"{kind}: line density {dens}"
        inb = [r["in_bounds"] for r in rows if "in_bounds" in r]
        assert inb and min(inb) >= 0.98, f"{kind}: boxes out of bounds"


def test_box_size_tracks_font_size(gen):
    """Median box height must scale with the sampled font size."""
    for _ in range(6):
        s = page_stats(gen.generate("chars"))
        assert 0.3 * s["font_size"] <= s["median_h"] <= 2.0 * s["font_size"]
        assert 0.1 * s["font_size"] <= s["median_w"] <= 2.5 * s["font_size"]


def test_kind_specific_structure(stats):
    # furigana pages carry ruby flags (both text and base)
    fu = stats["furigana"]
    assert max(r.get("ruby_text_frac", 0) for r in fu) > 0.02
    assert max(r.get("ruby_base_frac", 0) for r in fu) > 0.02
    # word pages mark space-separated boxes
    wo = stats["words"]
    assert max(r.get("space_frac", 0) for r in wo) > 0.1
    # grid pages paint separator lines
    gr = stats["grid"]
    assert max(r["sepline_density"] for r in gr) > 1e-4
    # plain char pages have neither ruby nor separators
    ch = stats["chars"]
    assert max(r.get("ruby_text_frac", 0) for r in ch) == 0.0


def test_mixed_sample_has_every_major_kind(gen):
    kinds = {gen.generate()["kind"] for _ in range(40)}
    assert {"chars", "textline"} <= kinds
    assert len(kinds) >= 5
