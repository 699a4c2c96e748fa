"""tools/visualize CLI: the plot_json replot mode (reference
plot_json.py) and usage handling. The model-backed detect/ocr modes
share build_pipeline with run_ocr, covered by test_run_ocr_cli."""
import json

import numpy as np
from PIL import Image

from findtextcenternet_tpu.tools.visualize import main


def test_cli_json_mode_replots(tmp_path, capsys):
    img = np.full((120, 160, 3), 255, np.uint8)
    path = str(tmp_path / "page.png")
    Image.fromarray(img).save(path)
    result = {
        "box": [{"cx": 40.0, "cy": 40.0, "w": 20.0, "h": 20.0,
                 "text": "A", "ruby": 0}],
        "line": [{"x1": 20.0, "y1": 20.0, "x2": 140.0, "y2": 60.0}],
    }
    with open(path + ".ocr.json", "w", encoding="utf-8") as f:
        json.dump(result, f)

    assert main(["--mode=json", path]) == 0
    out_png = capsys.readouterr().out.strip().splitlines()[-1]
    assert out_png.endswith(".ocr.png")
    # a real PNG with the page's aspect came out
    w, h = Image.open(out_png).size
    assert w > 0 and h > 0


def test_cli_bad_mode_prints_usage(capsys):
    assert main(["--mode=nope", "x.png"]) == 1
    assert "detect|ocr|json" in capsys.readouterr().out


def test_cli_no_files_prints_usage(capsys):
    assert main([]) == 1
    assert "CLI" in capsys.readouterr().out
