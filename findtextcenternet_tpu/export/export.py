"""Deployable model export via jax.export (StableHLO).

The reference snapshots its models into ONNX / CoreML graphs with
encoder-only, decoder-only (softmaxed) and modulo-split-input decoder
wrappers (`/root/reference/models/transformer.py:362-406`,
`convert1_onnx.py`, `convert3_onnx.py`). The TPU-native equivalent is
serialized StableHLO: portable, replayable with jax.export on any JAX
backend, with the same module factoring so ONNX/CoreML conversion tools
can consume the pieces.

Each exported artifact is a directory:
    fn.stablehlo   — serialized jax.export artifact
    params.npz     — flattened parameters (by path)
    meta.json      — input shapes/dtypes + module kind
"""
from __future__ import annotations

import json
import os
from typing import Callable, Dict, Tuple

import numpy as np
import jax
import jax.numpy as jnp
from jax import export as jax_export


def _flatten(tree, prefix=""):
    out = {}
    if isinstance(tree, dict):
        for k, v in tree.items():
            out.update(_flatten(v, f"{prefix}/{k}" if prefix else k))
    else:
        out[prefix] = np.asarray(tree)
    return out


def _unflatten(flat: Dict[str, np.ndarray]):
    tree: dict = {}
    for path, v in flat.items():
        node = tree
        parts = path.split("/")
        for p in parts[:-1]:
            node = node.setdefault(p, {})
        node[parts[-1]] = v
    return tree


def save_exported(outdir: str, fn: Callable, variables, example_args: Tuple,
                  kind: str):
    """Export ``fn(variables, *example_args)`` with variables baked as the
    first argument; saves StableHLO + params + metadata."""
    os.makedirs(outdir, exist_ok=True)
    exp = jax_export.export(jax.jit(fn))(variables, *example_args)
    with open(os.path.join(outdir, "fn.stablehlo"), "wb") as f:
        f.write(exp.serialize())
    flat = _flatten(jax.device_get(variables))
    np.savez(os.path.join(outdir, "params.npz"), **flat)
    meta = {
        "kind": kind,
        "args": [{"shape": list(np.shape(a)),
                  "dtype": str(np.asarray(a).dtype)}
                 for a in example_args],
    }
    with open(os.path.join(outdir, "meta.json"), "w") as f:
        json.dump(meta, f, indent=1)
    return outdir


def load_exported(outdir: str):
    """Returns (callable(variables, *args), variables, meta)."""
    with open(os.path.join(outdir, "fn.stablehlo"), "rb") as f:
        exp = jax_export.deserialize(f.read())
    with np.load(os.path.join(outdir, "params.npz")) as z:
        variables = _unflatten({k: z[k] for k in z.files})
    with open(os.path.join(outdir, "meta.json")) as f:
        meta = json.load(f)
    return exp.call, variables, meta


# ---------------------------------------------------------------------------
# wrappers mirroring the reference's export factoring
# ---------------------------------------------------------------------------

def export_detector(outdir: str, model, variables,
                    tile: int = 768, batch: int = 1):
    """Detector + 3x3 peak NMS -> 10-channel map + features
    (reference ``CenterNetDetector``, `models/detector.py:283-296`)."""
    from ..models.detector import detect_peaks

    def fn(variables, images):
        heatmap, features = model.apply(variables, images)
        return detect_peaks(heatmap), features

    x = jnp.zeros((batch, tile, tile, 3), jnp.float32)
    return save_exported(outdir, fn, variables, (x,), "detector")


def export_code_decoder(outdir: str, model, variables, batch: int = 256):
    """SimpleDecoder with softmaxed outputs (reference ``CodeDecoder``)."""
    def fn(variables, feats):
        outs = model.apply(variables, feats)
        return tuple(jax.nn.softmax(o, axis=-1) for o in outs)

    from ..const import FEATURE_DIM
    x = jnp.zeros((batch, FEATURE_DIM), jnp.float32)
    return save_exported(outdir, fn, variables, (x,), "code_decoder")


def export_transformer_encoder(outdir: str, model, variables,
                               batch: int = 1):
    """Encoder-only (reference ``TransformerEncoderPredictor``)."""
    from ..models.transformer import Transformer

    def fn(variables, enc_input):
        return model.apply(variables, enc_input, method=Transformer.encode)

    d = model.dims
    x = jnp.zeros((batch, d.max_enc_seq_len, d.enc_input_dim), jnp.float32)
    return save_exported(outdir, fn, variables, (x,), "transformer_encoder")


def export_transformer_decoder(outdir: str, model, variables,
                               batch: int = 1):
    """Decoder-only with softmaxed per-modulus outputs
    (reference ``TransformerDecoderPredictor``)."""
    from ..models.transformer import Transformer

    def fn(variables, dec_input, enc_output, key_mask):
        outs = model.apply(variables, dec_input, enc_output, key_mask,
                           method=Transformer.decode)
        return tuple(jax.nn.softmax(o, axis=-1) for o in outs)

    d = model.dims
    dec = jnp.zeros((batch, d.max_dec_seq_len), jnp.int32)
    enc = jnp.zeros((batch, d.max_enc_seq_len, d.embed_dim), jnp.float32)
    km = jnp.zeros((batch, 1, 1, d.max_enc_seq_len), jnp.float32)
    return save_exported(outdir, fn, variables, (dec, enc, km),
                         "transformer_decoder")
