"""ZMQ loader transport + handwriting compositor."""
import numpy as np
import pytest

from findtextcenternet_tpu.factory.handwriting import (
    StrokeBank, compose_handwriting_page,
)
from findtextcenternet_tpu.factory.rasterizer import (
    GlyphRasterizer, find_fonts,
)

FONTS = [f for f in find_fonts() if "DejaVuSans.ttf" in f]


@pytest.mark.skipif(not FONTS, reason="no fonts")
def test_handwriting_page():
    rng = np.random.default_rng(0)
    rast = GlyphRasterizer(FONTS[0], 28)
    page = compose_handwriting_page("ABCDEF", rast, 400, 300, rng, count=12)
    assert page["image"].max() > 100
    assert page["position"].shape[0] >= 8
    assert page["textline"].max() == 255


def test_stroke_bank(tmp_path):
    from PIL import Image
    d = tmp_path / ("%x" % ord("A"))
    d.mkdir()
    Image.new("L", (20, 20), 0).save(d / "s0.png")
    bank = StrokeBank(str(tmp_path))
    assert ord("A") in bank
    assert ord("B") not in bank
    arr = bank.sample(ord("A"), np.random.default_rng(0))
    assert arr.shape == (20, 20)


def test_zmq_loader_roundtrip(tmp_path):
    pytest.importorskip("zmq")
    from findtextcenternet_tpu.data.shards import ShardWriter
    from findtextcenternet_tpu.data.zmq_loader import ZmqLoader

    rng = np.random.default_rng(0)
    with ShardWriter(str(tmp_path / "s%03d.tar"), 3) as w:
        for i in range(6):
            w.write({
                "__key__": f"k{i}",
                "image.png": np.zeros((128, 128), np.uint8),
                "textline.png": np.zeros((64, 64), np.uint8),
                "sepline.png": np.zeros((64, 64), np.uint8),
                "position.npy": np.array([[64, 64, 16, 16]], np.float32),
                "code_list.npy": np.array([[65, 0]], np.int32),
            })
        paths = list(w.paths)

    def passthrough(sample, rng):
        return {"key": sample["position"].shape}

    loader = ZmqLoader(paths, num_workers=2, process_fn=passthrough)
    got = list(loader)
    assert len(got) == 6
    assert all(g["key"] == (1, 4) for g in got)


def test_zmq_backpressure_four_readers(tmp_path):
    """Readers must pause under a slow consumer (reference multi.py:63-72).

    With N=4 readers and a stalled consumer, each reader may run at most
    ~(consumed/N + 2) samples ahead plus one in flight; after the stall we
    drain with NOBLOCK and the immediately-available backlog must be
    bounded by that window — not the whole remaining stream.
    """
    import pickle
    import time

    pytest.importorskip("zmq")
    import zmq

    from findtextcenternet_tpu.data.shards import ShardWriter
    from findtextcenternet_tpu.data.zmq_loader import ZmqLoader, _EOF

    n_samples = 120
    n_workers = 4
    with ShardWriter(str(tmp_path / "s%03d.tar"), 10) as w:
        for i in range(n_samples):
            w.write({
                "__key__": f"k{i}",
                "image.png": np.zeros((32, 32), np.uint8),
                "textline.png": np.zeros((16, 16), np.uint8),
                "sepline.png": np.zeros((16, 16), np.uint8),
                "position.npy": np.array([[16, 16, 8, 8]], np.float32),
                "code_list.npy": np.array([[65, 0]], np.int32),
            })
        paths = list(w.paths)

    def passthrough(sample, rng):
        return {"n": 1}

    loader = ZmqLoader(paths, num_workers=n_workers,
                       process_fn=passthrough)
    it = iter(loader)
    consumed = 0
    for _ in range(8):  # consume a few, publishing consumed counts
        next(it)
        consumed += 1
    # Stall: give readers time to run as far ahead as they are allowed.
    time.sleep(1.0)
    # Peek at the backlog without publishing further consumed counts.
    pull = loader._pull
    backlog = 0
    while True:
        try:
            msg = pull.recv(zmq.NOBLOCK)
        except zmq.Again:
            break
        if msg == _EOF:
            loader._eofs += 1
            continue
        pickle.loads(msg)
        backlog += 1
    # Per reader: sent may reach consumed/N + 2, +1 already pushed when
    # the check runs => N*(consumed/N + 3) - consumed = 3N ahead max.
    assert backlog <= 3 * n_workers + n_workers, backlog
    assert backlog + consumed < n_samples  # stream NOT fully buffered
    # Resume consumption; every remaining sample must still arrive.
    loader._consumed += backlog
    total = consumed + backlog + sum(1 for _ in it)
    assert total == n_samples
