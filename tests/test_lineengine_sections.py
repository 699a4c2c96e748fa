"""Line engine: section assignment via full-width separator rules."""
import numpy as np
import pytest

from findtextcenternet_tpu.infer import lineengine


@pytest.fixture(scope="module", autouse=True)
def built():
    if not lineengine.build_native():
        pytest.skip("native line engine not buildable")


def test_header_rule_splits_blocks():
    # reference-anchored: a full-width rule between two text bands keeps
    # the bands in separate BLOCKS (the separator stops next/prev line
    # linking, make_block.cpp:21-205); the reference's "section" field
    # tracks column layout, not header bands, so both stay section 0
    # (verified against the reference binary on this exact input).
    w = h = 192
    line = np.zeros((h, w), np.float32)
    sep = np.zeros((h, w), np.float32)
    # header text at y=40 (map 10), body at y=400 (map 100)
    line[8:12, 5:60] = 1.0
    line[98:103, 5:60] = 1.0
    # full-width horizontal rule between them at map y=30
    sep[29:31, 2:190] = 1.0
    boxes = [[30 + 25 * i, 40, 20, 20, 0, 0, 0, 0] for i in range(4)]
    boxes += [[30 + 25 * i, 400, 20, 20, 0, 0, 0, 0] for i in range(4)]
    out = lineengine.detect_lines(line, sep, np.array(boxes, np.float32))
    blk = {int(i): int(b) for i, b in zip(out[:, 0], out[:, 1])}
    assert all(blk[i] == blk[0] for i in range(4))
    assert all(blk[i] == blk[4] for i in range(4, 8))
    assert blk[0] != blk[4]
    sec = {int(i): int(s) for i, s in zip(out[:, 0], out[:, 6])}
    assert all(sec[i] == 0 for i in range(8))


def test_page_divide():
    w = h = 192
    line = np.zeros((h, w), np.float32)
    sep = np.zeros((h, w), np.float32)
    # two vertical columns on opposite page halves
    line[10:60, 160:164] = 1.0
    line[10:60, 30:34] = 1.0
    boxes = [[648, 60 + 40 * i, 24, 24, 0, 0, 0, 0] for i in range(3)]
    boxes += [[128, 60 + 40 * i, 24, 24, 0, 0, 0, 0] for i in range(3)]
    out = lineengine.detect_lines(line, sep, np.array(boxes, np.float32),
                                  params={"page_divide": 1})
    pages = {int(i): int(pg) for i, pg in zip(out[:, 0], out[:, 5])}
    assert all(pages[i] == 0 for i in range(3))      # right half = page 0
    assert all(pages[i] == 1 for i in range(3, 6))   # left half = page 1
    # page 0 boxes come first in reading order
    assert set(out[:3, 0]) == {0, 1, 2}


def test_vertical_ruby_interleaving():
    """Vertical text: ruby sits to the RIGHT of its column."""
    w = h = 192
    line = np.zeros((h, w), np.float32)
    sep = np.zeros((h, w), np.float32)
    line[5:45, 23:28] = 1.0   # vertical line at x=100
    boxes = [
        [100, 40, 24, 24, 0, 0.9, 0, 0],    # base
        [100, 70, 24, 24, 0, 0.9, 0, 0],    # base
        [100, 100, 24, 24, 0, 0, 0, 0],     # plain
        [118, 46, 12, 12, 0.9, 0.9, 0, 0],  # ruby (right of column)
        [118, 64, 12, 12, 0.9, 0.9, 0, 0],  # ruby
    ]
    out = lineengine.detect_lines(line, sep, np.array(boxes, np.float32))
    order = list(out[:, 0])
    assert order.index(3) > order.index(1)
    assert order.index(2) > order.index(4)
    st = {int(i): int(s) for i, s in zip(out[:, 0], out[:, 4])}
    assert st[3] & 7 == 7   # vertical + ruby


def test_distributed_helpers_single_process():
    import jax
    from findtextcenternet_tpu.parallel import make_mesh
    from findtextcenternet_tpu.parallel.distributed import (
        global_batch_from_host, host_shard_range, init_distributed)
    assert init_distributed() is False     # no-op single process
    r = host_shard_range(10)
    assert list(r) == list(range(10))
    mesh = make_mesh(n_data=8, n_model=1)
    batch = global_batch_from_host(
        {"x": np.arange(16.0).reshape(16, 1)}, mesh)
    assert batch["x"].shape == (16, 1)
