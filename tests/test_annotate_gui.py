"""Headless cores of the interactive annotation editors."""
import json

import numpy as np
import pytest
from PIL import Image

from findtextcenternet_tpu.tools.annotate_gui import (
    ATTR_KEYS, BoxDocument, MapDocument)


@pytest.fixture
def box_json(tmp_path):
    p = tmp_path / "page.png.json"
    with open(p, "w", encoding="utf-8") as f:
        json.dump({"textbox": [
            {"cx": 50, "cy": 60, "w": 20, "h": 20, "text": "",
             "p_code1": 0.0, "p_code2": 0.0, "p_code4": 0.0,
             "p_code8": 0.0},
            {"cx": 52, "cy": 62, "w": 40, "h": 40, "text": "x",
             "p_code1": 0.0, "p_code2": 0.9, "p_code4": 0.0,
             "p_code8": 0.0},
        ]}, f)
    return str(p)


def test_box_document_edit_cycle(box_json, tmp_path):
    doc = BoxDocument(box_json)
    # hit test prefers the smaller box on overlap
    assert doc.hit_test(50, 60) == 0
    assert doc.hit_test(70, 62) == 1
    assert doc.hit_test(500, 500) is None

    doc.set_text(0, "あいう")
    assert doc.boxes[0]["text"] == "あ"      # single char, like filter_fixdata
    doc.toggle_attr(0, ATTR_KEYS[1])
    assert doc.boxes[0]["p_code2"] == 1.0
    doc.toggle_attr(0, ATTR_KEYS[1])
    assert doc.boxes[0]["p_code2"] == 0.0
    doc.move(0, 5, -3)
    assert (doc.boxes[0]["cx"], doc.boxes[0]["cy"]) == (55, 57)
    doc.resize(0, -30, -30)
    assert doc.boxes[0]["w"] == 2.0          # clamped

    i = doc.add_box(100, 100)
    assert doc.boxes[i]["cx"] == 100
    doc.delete(i)
    assert len(doc.boxes) == 2

    out = tmp_path / "edited.json"
    doc.save(str(out))
    with open(out, encoding="utf-8") as f:
        saved = json.load(f)
    assert saved["textbox"][0]["text"] == "あ"
    assert not doc.dirty


def test_map_document_paint(tmp_path):
    img_path = str(tmp_path / "page.png")
    Image.new("RGB", (100, 80), (255, 255, 255)).save(img_path)
    doc = MapDocument(img_path)
    assert doc.lines.shape == (40, 50)

    doc.paint("lines", 25, 20, 3)
    assert doc.lines[20, 25] == 1.0
    assert doc.lines[20, 25 + 5] == 0.0      # outside the brush
    doc.paint("lines", 25, 20, 3, erase=True)
    assert doc.lines[20, 25] == 0.0
    doc.paint("seps", 10, 10, 2)
    assert doc.seps[10, 10] == 1.0
    # off-canvas strokes are no-ops
    doc.paint("seps", -50, -50, 3)

    doc.save()
    reloaded = MapDocument(img_path)
    assert reloaded.seps[10, 10] == 1.0
    assert reloaded.lines.max() == 0.0
