"""Inverse of :mod:`torch_import`: flax variables -> reference-keyed
torch state dicts and ``model.pt``/``model3.pt`` checkpoints.

This is the bridge to the reference's entire deployment toolchain: a
checkpoint written here loads into `/root/reference` unchanged, so its
`convert1_onnx.py`/`convert3_onnx.py` (ONNX + int8 QDQ) and
`convert1_coreml.py`/`convert3_coreml.py` exporters — and the bunkoOCR
apps behind them — consume models trained in this framework. The key
schedule is shared with the importer (the same ``_import_*`` walkers run
with an exporting sink), so import/export cannot drift apart.
"""
from __future__ import annotations

from typing import Dict

import numpy as np

from .torch_import import (
    _HEAD_NAME_MAP, _import_backbone, _import_leafmap, _import_mha,
    _import_simple_decoder, _import_swiglu)
from ..const import MODULO_LIST
from ..models.transformer import TransformerDims


class _Exporter:
    """Duck-typed sink for the ``_import_*`` schedule walkers: reads the
    flax tree and writes torch-keyed numpy arrays."""

    def __init__(self, params: dict, batch_stats: dict):
        self.params = params
        self.batch_stats = batch_stats
        self.sd: Dict[str, np.ndarray] = {}

    def _get(self, root, path):
        node = root
        for p in path:
            node = node[p]
        return np.asarray(node)

    def _has(self, root, path):
        node = root
        for p in path:
            if not isinstance(node, dict) or p not in node:
                return False
            node = node[p]
        return True

    # --- schedule sink API (mirrors _Importer) -------------------------
    def conv(self, tkey: str, fpath, depthwise: bool = False):
        w = self._get(self.params, fpath + ("kernel",))
        self.sd[tkey + ".weight"] = np.transpose(w, (3, 2, 0, 1))
        if self._has(self.params, fpath + ("bias",)):
            self.sd[tkey + ".bias"] = self._get(self.params,
                                                fpath + ("bias",))

    def bn(self, tkey: str, fpath):
        self.sd[tkey + ".weight"] = self._get(self.params,
                                              fpath + ("scale",))
        self.sd[tkey + ".bias"] = self._get(self.params, fpath + ("bias",))
        self.sd[tkey + ".running_mean"] = self._get(self.batch_stats,
                                                    fpath + ("mean",))
        self.sd[tkey + ".running_var"] = self._get(self.batch_stats,
                                                   fpath + ("var",))
        self.sd[tkey + ".num_batches_tracked"] = np.asarray(0,
                                                            np.int64)

    def linear(self, tkey: str, fpath, bias: bool = True):
        w = self._get(self.params, fpath + ("kernel",))
        self.sd[tkey + ".weight"] = np.transpose(w)
        if bias and self._has(self.params, fpath + ("bias",)):
            self.sd[tkey + ".bias"] = self._get(self.params,
                                                fpath + ("bias",))

    def raw(self, tkey: str, fpath):
        self.sd[tkey] = self._get(self.params, fpath)

    def ln(self, tkey: str, fpath):
        self.sd[tkey + ".weight"] = self._get(self.params,
                                              fpath + ("scale",))
        self.sd[tkey + ".bias"] = self._get(self.params, fpath + ("bias",))

    def embedding(self, tkey: str, fpath):
        self.sd[tkey] = self._get(self.params, fpath + ("embedding",))

    def mark_used(self, key: str):
        # the reference's self-attn modules carry an (unused) k-table;
        # synthesize it from the q-table so strict torch loads succeed
        if key.endswith(".pos_emb_k.encoding"):
            q = key.replace(".pos_emb_k.", ".pos_emb_q.")
            if q in self.sd:
                self.sd[key] = self.sd[q]

    def has(self, key: str) -> bool:
        return False


def export_detector_sd(variables: dict, model_size: str = "xl"
                       ) -> Dict[str, np.ndarray]:
    """Reference-keyed TextDetectorModel state dict from flax variables.

    Accepts either head layout: the fused ``heads`` module is unfused
    into per-head Leafmap trees before the shared key schedule runs.
    """
    params = dict(variables["params"])
    stats = dict(variables["batch_stats"])
    if "heads" in params.get("detector", {}):
        from ..models.detector import unfuse_head_variables
        dp = dict(params["detector"])
        ds = dict(stats["detector"])
        hp, hs = unfuse_head_variables(dp.pop("heads"), ds.pop("heads"))
        dp.update(hp)
        ds.update(hs)
        params["detector"] = dp
        stats["detector"] = ds
    ex = _Exporter(params, stats)
    det = ("detector",)
    _import_backbone(ex, "detector.backbone", det + ("backbone",),
                     model_size)
    for tname, fname in _HEAD_NAME_MAP.items():
        _import_leafmap(ex, f"detector.{tname}", det + (fname,))
    if "decoder" in params:
        _import_simple_decoder(ex, "decoder", ("decoder",))
    return ex.sd


def export_transformer_sd(variables: dict,
                          dims: TransformerDims = TransformerDims()
                          ) -> Dict[str, np.ndarray]:
    """Reference-keyed Transformer state dict from flax variables."""
    ex = _Exporter(variables["params"], {})
    enc = ("encoder",)
    ex.linear("encoder.embed", enc + ("embed",), bias=False)
    ex.raw("encoder.pos_emb.encoding", enc + ("pos_emb", "table"))
    ex.ln("encoder.norm", enc + ("norm",))
    for i in range(dims.enc_block_num):
        t = f"encoder.blocks.{i}"
        f = enc + (f"block{i}",)
        _import_mha(ex, f"{t}.mha", f + ("mha",), cross=False)
        ex.ln(f"{t}.norm1", f + ("norm1",))
        ex.ln(f"{t}.norm2", f + ("norm2",))
        _import_swiglu(ex, f"{t}.ff", f + ("ff",))

    dec = ("decoder",)
    for k in range(len(MODULO_LIST)):
        ex.embedding(f"decoder.embed.{k}.weight", dec + (f"embed{k}",))
    ex.raw("decoder.pos_emb.encoding", dec + ("pos_emb", "table"))
    ex.ln("decoder.norm", dec + ("norm",))
    for i in range(dims.dec_block_num):
        t = f"decoder.blocks.{i}"
        f = dec + (f"block{i}",)
        _import_mha(ex, f"{t}.self_attn", f + ("self_attn",), cross=False)
        _import_mha(ex, f"{t}.cross_attn", f + ("cross_attn",), cross=True)
        ex.ln(f"{t}.norm1", f + ("norm1",))
        ex.ln(f"{t}.norm2", f + ("norm2",))
        ex.ln(f"{t}.norm3", f + ("norm3",))
        _import_swiglu(ex, f"{t}.ff", f + ("ff",))
    for k in range(len(MODULO_LIST)):
        ex.linear(f"decoder.out_layers.{k}", dec + (f"out{k}",))
    return ex.sd


def save_torch_checkpoint(path: str, sd: Dict[str, np.ndarray],
                          epoch: int = 0, config: dict = None) -> str:
    """Write a reference-format .pt: {'epoch', 'model_state_dict'[,
    'config']} (`/root/reference/train1.py:213-216`,
    `train3.py:229-241`)."""
    import torch

    tsd = {k: torch.from_numpy(np.ascontiguousarray(v))
           for k, v in sd.items()}
    out = {"epoch": epoch, "model_state_dict": tsd}
    if config is not None:
        out["config"] = config
    torch.save(out, path)
    return path
