"""CLI: convert trained models to ONNX (and the reference's other
deployment targets) through the torch-checkpoint bridge.

The TPU-native deployment format is StableHLO (`export_models.py`). For
the reference's mobile targets (ONNX + int8 QDQ, CoreML mlprogram) the
supported path is: export reference-format ``model.pt``/``model3.pt``
with :mod:`..io.torch_export` — they load ``strict=True`` into the
reference's torch modules (tested) — then run the reference's own
converters (`/root/reference/convert1_onnx.py`, `convert3_onnx.py`,
`quantize1_onnx.py`, `convert1_coreml.py`, `convert3_coreml.py`)
unchanged.

This driver automates both steps. Step 2 needs the ``onnx`` package and
a checkout of the reference (neither ships in this image; the script
degrades to step 1 with instructions).

Usage:
    python -m findtextcenternet_tpu.export.convert_onnx \
        --detector-ckpt=result1 --transformer-ckpt=result3 \
        --out=exported_onnx [--model-size=xl] \
        [--reference=/path/to/findtextCenterNet]
"""
from __future__ import annotations

import os
import subprocess
import sys


def export_torch_checkpoints(out_dir: str, model_size: str = "xl",
                             detector_ckpt: str = None,
                             transformer_ckpt: str = None,
                             cfg=None) -> dict:
    """Step 1: write reference-format model.pt / model3.pt."""
    import dataclasses

    from ..config import Config
    from ..io.torch_export import (
        export_detector_sd, export_transformer_sd, save_torch_checkpoint)
    from ..models.transformer import TransformerDims
    from ..train import checkpoint as ckpt

    os.makedirs(out_dir, exist_ok=True)
    cfg = cfg or Config()
    out = {}
    if detector_ckpt:
        path = ckpt.latest_checkpoint(detector_ckpt)
        if path is None:
            raise FileNotFoundError(f"no checkpoint under {detector_ckpt}")
        variables = ckpt.load_variables(path)
        sd = export_detector_sd(variables, model_size=model_size)
        out["model.pt"] = save_torch_checkpoint(
            os.path.join(out_dir, "model.pt"), sd)
    if transformer_ckpt:
        path = ckpt.latest_checkpoint(transformer_ckpt)
        if path is None:
            raise FileNotFoundError(
                f"no checkpoint under {transformer_ckpt}")
        variables = ckpt.load_variables(path)
        tc = cfg.transformer
        dims = TransformerDims(
            enc_input_dim=tc.enc_input_dim, embed_dim=tc.embed_dim,
            head_num=tc.head_num, enc_block_num=tc.enc_block_num,
            dec_block_num=tc.dec_block_num,
            max_enc_seq_len=tc.max_enc_seq_len,
            max_dec_seq_len=tc.max_dec_seq_len)
        sd = export_transformer_sd(variables, dims)
        out["model3.pt"] = save_torch_checkpoint(
            os.path.join(out_dir, "model3.pt"), sd,
            config=dataclasses.asdict(tc))
    return out


def run_reference_converters(out_dir: str, reference: str) -> int:
    """Step 2: drive the reference's converters on the exported .pt."""
    try:
        import onnx  # noqa: F401
    except ImportError:
        print("onnx is not installed; stopping after the .pt export.\n"
              "To finish: pip install onnx onnxruntime, then run\n"
              f"  cd {reference} && python convert1_onnx.py && "
              "python convert3_onnx.py\n"
              f"with the exported checkpoints from {out_dir} placed in "
              "the reference root.", file=sys.stderr)
        return 1
    rc = 0
    for script in ("convert1_onnx.py", "convert3_onnx.py"):
        path = os.path.join(reference, script)
        if not os.path.exists(path):
            print(f"missing {path}", file=sys.stderr)
            rc = 1
            continue
        r = subprocess.run([sys.executable, script], cwd=reference)
        rc = rc or r.returncode
    return rc


def main(argv=None):
    argv = list(sys.argv[1:] if argv is None else argv)
    out, model_size = "exported_onnx", "xl"
    det_ckpt = tf_ckpt = None
    reference = None
    for a in argv:
        if a.startswith("--out="):
            out = a.split("=", 1)[1]
        elif a.startswith("--model-size="):
            model_size = a.split("=", 1)[1]
        elif a.startswith("--detector-ckpt="):
            det_ckpt = a.split("=", 1)[1]
        elif a.startswith("--transformer-ckpt="):
            tf_ckpt = a.split("=", 1)[1]
        elif a.startswith("--reference="):
            reference = a.split("=", 1)[1]
    written = export_torch_checkpoints(out, model_size, det_ckpt, tf_ckpt)
    for name, path in written.items():
        print(f"wrote {path}")
    if reference:
        return run_reference_converters(out, reference)
    return 0


if __name__ == "__main__":
    sys.exit(main())
