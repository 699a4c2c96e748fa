"""Native line engine: synthetic pages with known reading order."""
import os

import numpy as np
import pytest

from findtextcenternet_tpu.infer import lineengine


@pytest.fixture(scope="module", autouse=True)
def built():
    if not lineengine.build_native():
        pytest.skip("native line engine not buildable")


def _page(w=192, h=192):
    line = np.zeros((h, w), np.float32)
    sep = np.zeros((h, w), np.float32)
    return line, sep


def _box(cx, cy, s=24.0, **codes):
    c = {"code1": 0.0, "code2": 0.0, "code4": 0.0, "code8": 0.0}
    c.update(codes)
    return [cx, cy, s, s, c["code1"], c["code2"], c["code4"], c["code8"]]


def _run(line, sep, boxes, use_subprocess=False, params=None):
    return lineengine.detect_lines(
        line, sep, np.array(boxes, np.float32),
        params=params, use_subprocess=use_subprocess)


def test_horizontal_line_order():
    line, sep = _page()
    # one horizontal textline at y=100 (map y=25), chars at x=40..280
    line[23:28, 5:75] = 1.0
    boxes = [_box(40 + 30 * i, 100) for i in range(8)]
    out = _run(line, sep, boxes)
    assert out.shape == (8, 7)
    # all on one line, order follows x
    assert (out[:, 1] == out[0, 1]).all()      # same block
    assert (out[:, 2] == out[0, 2]).all()      # same line idx
    assert list(out[:, 0]) == list(range(8))   # reading order = x order
    assert (np.diff(out[:, 3]) > 0).all()      # increasing subidx
    # horizontal: no vertical bit
    assert (out[:, 4] & 1 == 0).all()


def test_vertical_columns_right_to_left():
    line, sep = _page()
    # two vertical lines at x=120 (map 30) and x=60 (map 15)
    line[5:45, 28:32] = 1.0
    line[5:45, 13:17] = 1.0
    boxes = []
    for i in range(4):                      # right column (reads first)
        boxes.append(_box(120, 30 + 35 * i))
    for i in range(4):                      # left column
        boxes.append(_box(60, 30 + 35 * i))
    out = _run(line, sep, boxes)
    # vertical bit set
    assert (out[:, 4] & 1 == 1).all()
    # right column (ids 0-3) must come first in reading order
    first_half = out[:4, 0]
    assert set(first_half) == {0, 1, 2, 3}
    # within each column order is top->down
    assert list(out[:4, 0]) == [0, 1, 2, 3]
    assert list(out[4:, 0]) == [4, 5, 6, 7]


def test_separator_splits_blocks():
    line, sep = _page()
    line[23:28, 5:35] = 1.0
    line[23:28, 55:85] = 1.0
    sep[5:45, 45:47] = 1.0    # vertical separator between them
    boxes = [_box(40 + 20 * i, 100) for i in range(4)]     # left of sep
    boxes += [_box(240 + 20 * i, 100) for i in range(4)]   # right of sep
    out = _run(line, sep, boxes)
    left_blocks = {int(b) for i, b in zip(out[:, 0], out[:, 1]) if i < 4}
    right_blocks = {int(b) for i, b in zip(out[:, 0], out[:, 1]) if i >= 4}
    assert left_blocks.isdisjoint(right_blocks)


def test_ruby_interleaving():
    line, sep = _page()
    line[23:28, 5:50] = 1.0
    # base chars at y=100 size 24; ruby at y=80 size 12 above the base run
    boxes = [
        _box(40, 100, code2=0.9),   # base (rubybase)
        _box(70, 100, code2=0.9),   # base
        _box(100, 100),             # plain char after
        _box(46, 82, s=12.0, code1=0.9, code2=0.9),  # ruby
        _box(64, 82, s=12.0, code1=0.9, code2=0.9),  # ruby
    ]
    out = _run(line, sep, boxes)
    order = list(out[:, 0])
    # ruby (3, 4) must directly follow its base run (0, 1), before 2
    assert order.index(3) > order.index(1)
    assert order.index(4) > order.index(3)
    assert order.index(2) > order.index(4)
    # subtype bits: ruby boxes carry 2|4, base carries 2
    st = {int(i): int(s) for i, s in zip(out[:, 0], out[:, 4])}
    assert st[3] & 6 == 6 and st[4] & 6 == 6
    assert st[0] & 6 == 2


def test_wide_gap_splits_block():
    # reference-anchored: a gap over 3 char sizes does NOT become a
    # space; the run after it splits into its own line/block
    # (reference split_doubleline2, split_doubleline.cpp:75-147;
    # verified against the reference binary on this exact input)
    line, sep = _page(256, 64)
    line[23:28, 2:62] = 1.0
    xs = [20, 50, 80, 110, 200, 230]     # big gap before 200
    boxes = [_box(x, 100) for x in xs]
    out = _run(line, sep, boxes)
    blk = {int(i): int(b) for i, b in zip(out[:, 0], out[:, 1])}
    assert blk[0] == blk[1] == blk[2] == blk[3]
    assert blk[4] == blk[5] != blk[0]
    st = {int(i): int(s) for i, s in zip(out[:, 0], out[:, 4])}
    assert st[4] & 8 == 0 and st[1] & 8 == 0


def test_subprocess_protocol_matches_ctypes():
    line, sep = _page()
    line[23:28, 5:75] = 1.0
    boxes = [_box(40 + 30 * i, 100) for i in range(6)]
    a = _run(line, sep, boxes, use_subprocess=False)
    b = _run(line, sep, boxes, use_subprocess=True)
    np.testing.assert_array_equal(a, b)


def test_no_boxes():
    line, sep = _page()
    out = _run(line, sep, np.zeros((0, 8), np.float32))
    assert out.shape == (0, 7)


def test_orphan_boxes_without_lineimage():
    # boxes but empty textline map: orphan clustering must still order them
    line, sep = _page()
    boxes = [_box(40 + 30 * i, 100) for i in range(5)]
    out = _run(line, sep, boxes)
    assert (out[:, 1] >= 0).all()
    assert (out[:, 3] >= 0).all()
    assert list(out[:, 0]) == [0, 1, 2, 3, 4]


def test_fragmented_textline_map_merges_to_one_line():
    """A textline map broken into components must still yield one ordered
    line (merge + force-merge passes)."""
    line, sep = _page()
    line[23:28, 5:40] = 1.0
    line[23:28, 52:62] = 1.0   # disjoint component over the tail boxes
    boxes = [_box(40 + 30 * i, 100) for i in range(8)]
    out = _run(line, sep, boxes)
    assert (out[:, 1] == out[0, 1]).all()
    assert (out[:, 2] == out[0, 2]).all()
    assert list(out[:, 0]) == list(range(8))


def test_transports_agree_with_custom_params():
    """Non-default flags pass identically through ctypes and the
    subprocess protocol (the two transports share one Params contract)."""
    line, sep = _page()
    line[23:28, 5:75] = 1.0
    sep[10:40, 40:42] = 0.2           # weak separator, thresholds matter
    boxes = [_box(40 + 30 * i, 100,
                  code1=0.3 * (i == 2), code2=0.6 * (i == 3),
                  code8=0.4 * (i == 1)) for i in range(6)]
    params = {"ruby_cutoff": 0.2, "rubybase_cutoff": 0.5,
              "space_cutoff": 0.3, "emphasis_cutoff": 0.4,
              "line_valueth": 0.3, "sep_valueth": 0.15,
              "sep_valueth2": 0.25, "allowwidth_next_block": 2.0,
              "allow_sizediff": 0.4, "page_divide": 0}
    a = _run(line, sep, boxes, use_subprocess=False, params=params)
    b = _run(line, sep, boxes, use_subprocess=True, params=params)
    np.testing.assert_array_equal(a, b)
    # the thresholds took effect: code2=0.6 > rubybase_cutoff=0.5
    st = {int(i): int(s) for i, s in zip(a[:, 0], a[:, 4])}
    assert st[1] & 8 == 8       # space flag from the lowered cutoff

