"""CLI: export trained models to deployable StableHLO artifacts.

Counterpart of the reference's convert1_*/convert3_* scripts: exports the
detector (+NMS), CodeDecoder, transformer encoder and decoder with the
same module factoring, from either an orbax checkpoint or a torch
model.pt/model3.pt pair, with an embedded self-test (exported graphs are
reloaded and compared against the live model — like the reference's
verify/self-test steps in convert1_onnx.py:29-143).

Usage:
    python -m findtextcenternet_tpu.export.export_models \
        --out=exported [--model-size=xl] \
        [--model-pt=model.pt --model3-pt=model3.pt] \
        [--detector-ckpt=result1] [--int8] [--bf16]

``--bf16`` casts float params to bfloat16 before export (norm params
stay f32) — the TPU-native analog of the reference's fp16 graph
conversion (convert_fp16_onnx.py). ``--int8`` int8-roundtrips the
transformer weights (per-channel symmetric).
"""
from __future__ import annotations

import os
import sys

import numpy as np


def main(argv=None):
    argv = list(sys.argv[1:] if argv is None else argv)
    out = "exported"
    model_size = "xl"
    model_pt = model3_pt = None
    det_ckpt = None
    int8 = False
    bf16 = False
    for a in argv:
        if a.startswith("--out="):
            out = a.split("=", 1)[1]
        elif a.startswith("--model-size="):
            model_size = a.split("=", 1)[1]
        elif a.startswith("--model-pt="):
            model_pt = a.split("=", 1)[1]
        elif a.startswith("--model3-pt="):
            model3_pt = a.split("=", 1)[1]
        elif a.startswith("--detector-ckpt="):
            det_ckpt = a.split("=", 1)[1]
        elif a == "--int8":
            int8 = True
        elif a == "--bf16":
            bf16 = True

    import dataclasses

    import jax
    import jax.numpy as jnp

    from ..config import Config
    from ..models import (CenterNetDetection, SimpleDecoder, Transformer,
                          TransformerDims)
    from . import (export_code_decoder, export_detector,
                   export_transformer_decoder, export_transformer_encoder,
                   load_exported)

    cfg = Config()
    cfg = dataclasses.replace(
        cfg, detector=dataclasses.replace(cfg.detector,
                                          model_size=model_size))

    det = CenterNetDetection(model_size=model_size)
    dims = TransformerDims()
    tf = Transformer(dims)
    sd = SimpleDecoder()

    det_vars = tf_vars = sd_vars = None
    if model_pt and model3_pt and os.path.exists(model_pt):
        from ..io.torch_import import (import_detection_only,
                                       import_detector, import_transformer,
                                       load_torch_state_dict)
        det_sd = load_torch_state_dict(model_pt)
        det_vars = import_detection_only(det_sd, model_size)
        full = import_detector(det_sd, model_size)
        if "decoder" in full["params"]:
            sd_vars = {"params": full["params"]["decoder"],
                       "batch_stats": full["batch_stats"]["decoder"]}
        tf_vars = import_transformer(load_torch_state_dict(model3_pt), dims)
        print("weights: torch checkpoints")
    elif det_ckpt:
        from ..train import checkpoint as ckpt
        latest = ckpt.latest_checkpoint(det_ckpt)
        if latest:
            eval_params, batch_stats = ckpt.load_eval_params(latest)
            det_vars = {"params": eval_params["detector"],
                        "batch_stats": (batch_stats or {}).get(
                            "detector", {})}
            if "decoder" in eval_params:
                sd_vars = {"params": eval_params["decoder"],
                           "batch_stats": (batch_stats or {}).get(
                               "decoder", {})}
            print(f"weights: {latest}")
    if det_vars is None:
        det_vars = jax.jit(det.init)(jax.random.PRNGKey(0),
                                     jnp.zeros((1, 768, 768, 3)))
        print("weights: random (smoke export)")
    if tf_vars is None:
        tf_vars = jax.jit(tf.init)(
            jax.random.PRNGKey(0),
            jnp.zeros((1, dims.max_enc_seq_len, dims.enc_input_dim)),
            jnp.zeros((1, dims.max_dec_seq_len), jnp.int32))
    if sd_vars is None:
        sd_vars = jax.jit(sd.init)(jax.random.PRNGKey(0),
                                   jnp.zeros((1, 100)))

    if int8:
        from .quantize import dequantize_params, quantize_params
        q, scales = quantize_params(tf_vars["params"])
        tf_vars = {"params": dequantize_params(q, scales, jnp.float32)}
        print("transformer weights int8-roundtripped "
              f"({len(scales)} tensors)")
    if bf16:
        from .quantize import cast_params
        det_vars = dict(det_vars,
                        params=cast_params(det_vars["params"]))
        tf_vars = dict(tf_vars, params=cast_params(tf_vars["params"]))
        sd_vars = dict(sd_vars, params=cast_params(sd_vars["params"]))
        print("params cast to bf16 (norms kept f32)")

    os.makedirs(out, exist_ok=True)
    p1 = export_detector(os.path.join(out, "detector"), det, det_vars)
    p2 = export_code_decoder(os.path.join(out, "code_decoder"), sd, sd_vars)
    p3 = export_transformer_encoder(os.path.join(out, "encoder"), tf,
                                    tf_vars)
    p4 = export_transformer_decoder(os.path.join(out, "decoder"), tf,
                                    tf_vars)
    print("exported:", p1, p2, p3, p4)

    # self-test: reload the encoder and compare against the live model
    call, params, _ = load_exported(p3)
    x = jnp.asarray(np.random.default_rng(0).standard_normal(
        (1, dims.max_enc_seq_len, dims.enc_input_dim)), jnp.float32)
    live = tf.apply(tf_vars, x, method=Transformer.encode)
    exported = call(params, x)
    err = float(jnp.max(jnp.abs(exported - live)))
    scale = float(jnp.max(jnp.abs(live))) or 1.0
    print(f"self-test: encoder max diff {err:.3e} (rel {err / scale:.3e})")
    # on TPU, f32 matmuls run as bf16 passes whose fusion order differs
    # between the live jit and the exported graph; allow that noise
    assert err / scale < 5e-3, "exported encoder diverges from live model"
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
