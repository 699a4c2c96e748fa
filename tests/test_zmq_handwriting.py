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
