"""Character classes, weighted sampling and wordlist building."""
import numpy as np

from findtextcenternet_tpu.factory.charpools import (
    CLASS_DIGIT, CLASS_HIRAGANA, CLASS_KANJI_COMMON, CLASS_KANJI_RARE,
    CLASS_KATAKANA, CLASS_LATIN, CLASS_PUNCT, build_wordlist, char_class,
    classify_pool, weighted_char_sampler)


def test_char_classes():
    assert char_class("5") == CLASS_DIGIT
    assert char_class("a") == CLASS_LATIN
    assert char_class("あ") == CLASS_HIRAGANA
    assert char_class("ア") == CLASS_KATAKANA
    assert char_class("一") == CLASS_KANJI_COMMON
    assert char_class("鬱") == CLASS_KANJI_RARE
    assert char_class("。") == CLASS_PUNCT


def test_weighted_sampler_prefers_common():
    rng = np.random.default_rng(0)
    pool = "あいうえお" + "".join(chr(c) for c in range(0x9000, 0x9080))
    sample = weighted_char_sampler(pool, rng)
    s = sample(4000)
    kana = sum(1 for c in s if char_class(c) == CLASS_HIRAGANA)
    rare = sum(1 for c in s if char_class(c) == CLASS_KANJI_RARE)
    # 5 kana vs 128 rare kanji in the pool; weighting must flip the ratio
    assert kana > rare


def test_classify_pool_covers_everything():
    pool = "あア一鬱a5。"
    groups = classify_pool(pool)
    assert sum(len(v) for v in groups.values()) == len(pool)


def test_build_wordlist_jp():
    corpus = ["吾輩は猫である。名前はまだ無い。どこで生れたかとんと"
              "見当がつかぬ。"] * 3
    words = build_wordlist(corpus, "jp")
    assert "名前" in words
    assert "こと" in words          # seeded common words appended
    # frequency ranking: corpus words come before seed-only words
    assert words.index("名前") < words.index("こと")


def test_build_wordlist_en():
    corpus = ["the quick brown fox jumps over the lazy dog"] * 2
    words = build_wordlist(corpus, "en")
    assert "quick" in words and "the" in words
    assert words[0] == "the"


def test_generator_word_page_uses_wordlists():
    from findtextcenternet_tpu.factory import PageGenerator, find_fonts
    fonts = [f for f in find_fonts() if "DejaVuSans.ttf" in f]
    if not fonts:
        import pytest
        pytest.skip("no fonts")
    gen = PageGenerator(fonts, width=400, height=400, seed=0,
                        corpus_texts=["hello world testing words"])
    assert "hello" in gen.en_words
    page = gen.generate(kind="words")
    assert page["image"].shape == (400, 400)


def test_build_kanji_tiers_shape_and_ranking():
    from findtextcenternet_tpu.factory.charpools import (
        JIS_TIER_SIZES, build_kanji_tiers)
    corpus = ["日本語の文章です。漢字の頻度を数える。" * 3]
    tiers = build_kanji_tiers(corpus)
    # reference tier-list sizes (data/1st..3rd_kanji.txt) + the tail
    assert [len(t) for t in tiers[:3]] == list(JIS_TIER_SIZES)
    assert sum(len(t) for t in tiers) > 20000       # full CJK repertoire
    assert "日" in tiers[0] and "語" in tiers[0]     # corpus kanji promoted
    seen = set()
    for t in tiers:                                  # tiers are disjoint
        assert not (seen & set(t))
        seen |= set(t)


def test_tiered_sampler_weights_common_kanji():
    import numpy as np

    from findtextcenternet_tpu.factory.charpools import (
        build_kanji_tiers, weighted_char_sampler)
    tiers = build_kanji_tiers()
    chars = "あいうえおABC12、。" + tiers[0][:500] + tiers[3][-200:]
    s = weighted_char_sampler(chars, np.random.default_rng(0),
                              kanji_tiers=tiers)
    out = s(2000)
    t1 = sum(1 for c in out if c in set(tiers[0][:500]))
    t4 = sum(1 for c in out if c in set(tiers[3][-200:]))
    assert t1 > 3 * t4 > 0 or (t1 > 50 and t4 >= 0)
