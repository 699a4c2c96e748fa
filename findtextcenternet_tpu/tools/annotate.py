"""Annotation & fine-tune tooling (stage-2 data preparation).

Equivalents of the reference's ``fine_image/`` scripts:

* :func:`process_image1` — run the detector over a page and write the
  annotation JSON (textbox list with per-char decode + code probabilities)
  plus ``.lines.png`` / ``.seps.png`` maps for human correction
  (`/root/reference/fine_image/process_image1_torch.py`).
* :func:`process_image4` — after human correction, re-extract the 100-d
  feature vectors at the corrected box centers and write the stage-3
  real-data ``.npy`` + boxlist JSON
  (`/root/reference/fine_image/process_image4_torch.py`).
* :func:`empty_image` — blank annotations for an image
  (`/root/reference/fine_image/empty_image1.py`).
* :func:`edit_annotation` — programmatic box editing (the reference uses
  tkinter GUIs; here edits are batch operations suited to remote hosts).
"""
from __future__ import annotations

import json
import os
from typing import Dict, List, Optional

import numpy as np

from .. import crt


def process_image1(pipeline, image_path: str,
                   out_json: Optional[str] = None) -> Dict:
    """Detector -> annotation JSON + line/sep map PNGs."""
    from PIL import Image

    img = np.asarray(Image.open(image_path).convert("RGB"))
    page = pipeline.run_detector(img)

    textboxes: List[Dict] = []
    for i, loc in enumerate(page.locations):
        p, cx, cy, w, h, c1, c2, c4, c8 = loc[:9]
        entry = {
            "cx": float(cx), "cy": float(cy),
            "w": float(w), "h": float(h),
            "p_det": float(p),
            "p_code1": float(c1), "p_code2": float(c2),
            "p_code4": float(c4), "p_code8": float(c8),
            "text": "",
        }
        textboxes.append(entry)

    # per-box CRT decode via the aux SimpleDecoder when available
    if getattr(pipeline, "simple_decoder_vars", None) is not None:
        model, variables = pipeline.simple_decoder_vars
        outs = model.apply(variables, page.features)
        preds = [np.asarray(o.argmax(-1)) for o in outs]
        codes = crt.decode(*preds)
        for i, tb in enumerate(textboxes):
            c = int(codes[i])
            if 0 < c <= 0x3FFFF and not (0xD800 <= c <= 0xDFFF):
                tb["text"] = chr(c)

    data = {"textbox": textboxes}
    out_json = out_json or image_path + ".json"
    with open(out_json, "w", encoding="utf-8") as f:
        json.dump(data, f, ensure_ascii=False, indent=1)

    from PIL import Image as PILImage
    PILImage.fromarray((page.lines * 255).astype(np.uint8)).resize(
        (img.shape[1] // 2, img.shape[0] // 2)).save(
        image_path + ".lines.png")
    PILImage.fromarray((page.seps * 255).astype(np.uint8)).resize(
        (img.shape[1] // 2, img.shape[0] // 2)).save(
        image_path + ".seps.png")
    return data


def process_image4(pipeline, image_path: str, json_path: Optional[str] = None,
                   out_base: Optional[str] = None):
    """Re-extract features at corrected box centers -> stage-3 real data.

    Writes ``<out_base>.npy`` (N, feature_dim) and ``<out_base>.json``
    (ordered boxlist) consumed as real-data replay by the transformer
    dataset.
    """
    from PIL import Image

    json_path = json_path or image_path + ".json"
    with open(json_path, encoding="utf-8") as f:
        data = json.load(f)
    boxes = data.get("textbox", [])
    if not boxes:
        return None

    img = np.asarray(Image.open(image_path).convert("RGB"))
    page = pipeline.run_detector(img)
    if len(page.locations) == 0:
        return None

    det_centers = page.locations[:, 1:3]
    feats, ordered = [], []
    for tb in boxes:
        if not tb.get("text"):
            continue
        c = np.array([tb["cx"], tb["cy"]])
        d = np.linalg.norm(det_centers - c, axis=1)
        j = int(np.argmin(d))
        if d[j] > max(tb["w"], tb["h"]):
            continue
        feats.append(page.features[j])
        ordered.append(tb)
    if not feats:
        return None

    out_base = out_base or os.path.splitext(image_path)[0] + "_feat"
    np.save(out_base + ".npy", np.stack(feats))
    with open(out_base + ".json", "w", encoding="utf-8") as f:
        json.dump({"textbox": ordered}, f, ensure_ascii=False, indent=1)
    return out_base


def empty_image(image_path: str):
    """Write blank annotations for an image."""
    from PIL import Image

    img = Image.open(image_path)
    w, h = img.size
    with open(image_path + ".json", "w", encoding="utf-8") as f:
        json.dump({"textbox": []}, f)
    blank = Image.new("L", (w // 2, h // 2), 0)
    blank.save(image_path + ".lines.png")
    blank.save(image_path + ".seps.png")


def edit_annotation(json_path: str, index: int, **updates) -> Dict:
    """Update one textbox entry (text / code probabilities / geometry)."""
    with open(json_path, encoding="utf-8") as f:
        data = json.load(f)
    tb = data["textbox"][index]
    for k, v in updates.items():
        if k not in ("cx", "cy", "w", "h", "text", "p_code1", "p_code2",
                     "p_code4", "p_code8"):
            raise KeyError(k)
        tb[k] = v
    with open(json_path, "w", encoding="utf-8") as f:
        json.dump(data, f, ensure_ascii=False, indent=1)
    return tb
