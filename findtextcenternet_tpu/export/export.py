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


def _arg_struct(shape, dtype, batch, scope=None):
    """ShapeDtypeStruct for an export arg; a string ``batch`` makes the
    leading dim symbolic (one artifact serves every batch size — the
    pipeline's tile chunks and power-of-two window buckets). Args of one
    export must share ``scope``."""
    if isinstance(batch, str):
        sym = jax_export.symbolic_shape(batch, scope=scope)[0]
        return jax.ShapeDtypeStruct((sym,) + tuple(shape[1:]), dtype)
    return jax.ShapeDtypeStruct((batch,) + tuple(shape[1:]), dtype)


def _sym_scope(batch):
    return jax_export.SymbolicScope() if isinstance(batch, str) else None


def save_exported(outdir: str, fn: Callable, variables, example_args: Tuple,
                  kind: str):
    """Export ``fn(variables, *example_args)`` with variables baked as the
    first argument; saves StableHLO + params + metadata. Example args may
    be ShapeDtypeStructs with symbolic (polymorphic) dimensions."""
    os.makedirs(outdir, exist_ok=True)
    exp = jax_export.export(jax.jit(fn))(variables, *example_args)
    with open(os.path.join(outdir, "fn.stablehlo"), "wb") as f:
        f.write(exp.serialize())
    flat = _flatten(jax.device_get(variables))
    np.savez(os.path.join(outdir, "params.npz"), **flat)

    def _dims(a):
        return [d if isinstance(d, int) else str(d)
                for d in (a.shape if hasattr(a, "shape") else np.shape(a))]

    meta = {
        "kind": kind,
        "args": [{"shape": _dims(a),
                  "dtype": str(a.dtype if hasattr(a, "dtype")
                               else np.asarray(a).dtype)}
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
                    tile: int = 768, batch=1):
    """Detector + 3x3 peak NMS -> 10-channel map + features
    (reference ``CenterNetDetector``, `models/detector.py:283-296`).

    ``batch`` may be a symbolic-dimension name (e.g. ``"b"``) so the one
    artifact serves every tile-chunk size."""
    from ..models.detector import detect_peaks

    def fn(variables, images):
        heatmap, features = model.apply(variables, images)
        return detect_peaks(heatmap), features

    x = _arg_struct((1, tile, tile, 3), jnp.float32, batch)
    return save_exported(outdir, fn, variables, (x,), "detector")


def export_code_decoder(outdir: str, model, variables, batch=256):
    """SimpleDecoder with softmaxed outputs (reference ``CodeDecoder``)."""
    def fn(variables, feats):
        outs = model.apply(variables, feats)
        return tuple(jax.nn.softmax(o, axis=-1) for o in outs)

    from ..const import FEATURE_DIM
    x = _arg_struct((1, FEATURE_DIM), jnp.float32, batch)
    return save_exported(outdir, fn, variables, (x,), "code_decoder")


def export_transformer_encoder(outdir: str, model, variables,
                               batch=1):
    """Encoder-only (reference ``TransformerEncoderPredictor``)."""
    from ..models.transformer import Transformer

    def fn(variables, enc_input):
        return model.apply(variables, enc_input, method=Transformer.encode)

    d = model.dims
    x = _arg_struct((1, d.max_enc_seq_len, d.enc_input_dim), jnp.float32,
                    batch)
    return save_exported(outdir, fn, variables, (x,), "transformer_encoder")


def export_transformer_decoder(outdir: str, model, variables,
                               batch=1):
    """Decoder-only with softmaxed per-modulus outputs
    (reference ``TransformerDecoderPredictor``)."""
    from ..models.transformer import Transformer

    def fn(variables, dec_input, enc_output, key_mask):
        outs = model.apply(variables, dec_input, enc_output, key_mask,
                           method=Transformer.decode)
        return tuple(jax.nn.softmax(o, axis=-1) for o in outs)

    d = model.dims
    scope = _sym_scope(batch)
    dec = _arg_struct((1, d.max_dec_seq_len), jnp.int32, batch, scope)
    enc = _arg_struct((1, d.max_enc_seq_len, d.embed_dim), jnp.float32,
                      batch, scope)
    km = _arg_struct((1, 1, 1, d.max_enc_seq_len), jnp.float32, batch,
                     scope)
    return save_exported(outdir, fn, variables, (dec, enc, km),
                         "transformer_decoder")
