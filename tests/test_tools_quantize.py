"""Annotation tools, visual harnesses, quantization."""
import json

import numpy as np
import jax.numpy as jnp
import pytest

from findtextcenternet_tpu.export.quantize import (
    ActivationCalibrator, cast_params, dequantize_params, quantize_params,
)
from findtextcenternet_tpu.tools.annotate import (
    edit_annotation, empty_image,
)


def test_quantize_roundtrip_accuracy(rng):
    params = {
        "layer": {"kernel": rng.standard_normal((16, 8)).astype(np.float32),
                  "bias": rng.standard_normal(8).astype(np.float32)},
        "feature": {"kernel": rng.standard_normal((4, 4)).astype(np.float32)},
        "norm": {"scale": np.ones(8, np.float32)},
    }
    q, scales = quantize_params(params)
    assert q["layer"]["kernel"].dtype == np.int8
    # excluded leaves untouched
    assert q["feature"]["kernel"].dtype == np.float32
    assert q["norm"]["scale"].dtype == np.float32
    assert q["layer"]["bias"].dtype == np.float32

    deq = dequantize_params(q, scales, dtype=jnp.float32)
    err = np.abs(np.asarray(deq["layer"]["kernel"])
                 - params["layer"]["kernel"])
    # int8 per-channel: error bounded by scale/2
    assert err.max() < np.abs(params["layer"]["kernel"]).max() / 127


def test_cast_params_keeps_norm_f32(rng):
    params = {"conv": {"kernel": np.ones((3, 3, 2, 2), np.float32)},
              "bn": {"scale": np.ones(2, np.float32)}}
    out = cast_params(params)
    assert out["conv"]["kernel"].dtype == jnp.bfloat16
    assert out["bn"]["scale"].dtype == jnp.float32


def test_activation_calibrator():
    cal = ActivationCalibrator(momentum=0.5)
    cal.observe("x", jnp.asarray([-2.0, 4.0]))
    cal.observe("x", jnp.asarray([-6.0, 1.0]))
    lo, hi = cal.ranges["x"]
    assert lo == pytest.approx(-4.0)
    assert hi == pytest.approx(2.5)
    assert cal.scale("x") == pytest.approx(4.0 / 127)


def test_empty_and_edit_annotation(tmp_path):
    from PIL import Image
    p = tmp_path / "page.png"
    Image.new("RGB", (100, 80), "white").save(p)
    empty_image(str(p))
    with open(str(p) + ".json") as f:
        assert json.load(f) == {"textbox": []}

    with open(str(p) + ".json", "w") as f:
        json.dump({"textbox": [{"cx": 1, "cy": 2, "w": 3, "h": 4,
                                "text": ""}]}, f)
    tb = edit_annotation(str(p) + ".json", 0, text="あ", cx=10.0)
    assert tb["text"] == "あ" and tb["cx"] == 10.0
    with pytest.raises(KeyError):
        edit_annotation(str(p) + ".json", 0, bogus=1)


def test_plot_ocr_json(tmp_path):
    from findtextcenternet_tpu.tools.visualize import plot_ocr_json
    img = np.full((60, 80, 3), 255, np.uint8)
    result = {"line": [{"x1": 5, "y1": 5, "x2": 70, "y2": 20}],
              "box": [{"cx": 10, "cy": 12, "w": 8, "h": 8, "text": "A",
                       "ruby": 0}]}
    out = plot_ocr_json(img, result, str(tmp_path / "o.png"))
    import os
    assert os.path.getsize(out) > 400  # small figure, nonempty PNG
