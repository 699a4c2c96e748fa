"""Import reference torch checkpoints (`model.pt` / `model3.pt`) into flax.

The reference trains with torchvision's EfficientNetV2 + custom heads
(`/root/reference/models/detector.py`) and a custom transformer
(`/root/reference/models/transformer.py`); its checkpoints are plain
``state_dict`` tensor maps. This module maps those key names onto our flax
module trees (NHWC / HWIO layouts), without importing torchvision.

Conventions converted:
  * Conv2d  OIHW  -> HWIO  (depthwise (C,1,k,k) -> (k,k,1,C))
  * Linear  (out,in) -> (in,out)
  * BatchNorm weight/bias/running_mean/running_var -> scale/bias/mean/var
  * Embedding (num,dim) unchanged
"""
from __future__ import annotations

from typing import Dict, Mapping

import numpy as np

from ..models.efficientnet import EFFNET_V2_CONFIGS
from ..models.transformer import TransformerDims
from ..const import MODULO_LIST

# torch head-module names -> our head names ('sepatator' is a reference typo)
_HEAD_NAME_MAP = {
    "keyheatmap": "keyheatmap",
    "sizes": "sizes",
    "textline": "textline",
    "sepatator": "separator",
    "code1": "code1",
    "code2": "code2",
    "code4": "code4",
    "code8": "code8",
    "feature": "feature",
}


def load_torch_state_dict(path: str) -> Dict[str, np.ndarray]:
    """Load a reference checkpoint into {name: np.ndarray}."""
    import torch

    ckpt = torch.load(path, map_location="cpu", weights_only=True)
    sd = ckpt.get("model_state_dict", ckpt)
    out = {}
    for k, v in sd.items():
        if k.startswith("_orig_mod."):
            k = k[len("_orig_mod."):]
        if hasattr(v, "numpy"):
            out[k] = v.detach().to(torch.float32).numpy()
        else:
            out[k] = np.asarray(v)
    return out


class _Importer:
    def __init__(self, sd: Mapping[str, np.ndarray]):
        self.sd = dict(sd)
        self.used = set()
        self.params: dict = {}
        self.batch_stats: dict = {}

    def take(self, key: str) -> np.ndarray:
        if key not in self.sd:
            raise KeyError(f"missing torch key: {key}")
        self.used.add(key)
        return self.sd[key]

    def _set(self, root, path, value):
        node = root
        for p in path[:-1]:
            node = node.setdefault(p, {})
        node[path[-1]] = np.asarray(value)

    def conv(self, tkey: str, fpath, depthwise: bool = False):
        w = self.take(tkey + ".weight")
        w = np.transpose(w, (2, 3, 1, 0))  # OIHW -> HWIO (dw same perm)
        self._set(self.params, fpath + ("kernel",), w)
        if self.has(tkey + ".bias"):
            self._set(self.params, fpath + ("bias",), self.take(tkey + ".bias"))

    def bn(self, tkey: str, fpath):
        self._set(self.params, fpath + ("scale",), self.take(tkey + ".weight"))
        self._set(self.params, fpath + ("bias",), self.take(tkey + ".bias"))
        self._set(self.batch_stats, fpath + ("mean",),
                  self.take(tkey + ".running_mean"))
        self._set(self.batch_stats, fpath + ("var",),
                  self.take(tkey + ".running_var"))
        self.mark_used(tkey + ".num_batches_tracked")

    def linear(self, tkey: str, fpath, bias: bool = True):
        w = self.take(tkey + ".weight")
        self._set(self.params, fpath + ("kernel",), np.transpose(w))
        if bias and self.has(tkey + ".bias"):
            self._set(self.params, fpath + ("bias",), self.take(tkey + ".bias"))

    def raw(self, tkey: str, fpath):
        self._set(self.params, fpath, self.take(tkey))

    def ln(self, tkey: str, fpath):
        self._set(self.params, fpath + ("scale",), self.take(tkey + ".weight"))
        self._set(self.params, fpath + ("bias",), self.take(tkey + ".bias"))

    def embedding(self, tkey: str, fpath):
        self._set(self.params, fpath + ("embedding",), self.take(tkey))

    def mark_used(self, key: str):
        self.used.add(key)

    def unconsumed(self):
        return sorted(set(self.sd) - self.used)

    def has(self, key: str) -> bool:
        return key in self.sd


def _import_backbone(im: _Importer, tprefix: str, fprefix, model_size: str):
    cfgs = EFFNET_V2_CONFIGS[model_size]
    im.conv(f"{tprefix}.features.0.0", fprefix + ("stem", "conv"))
    im.bn(f"{tprefix}.features.0.1", fprefix + ("stem", "bn"))
    for si, cfg in enumerate(cfgs):
        fi = si + 1
        for li in range(cfg.num_layers):
            t = f"{tprefix}.features.{fi}.{li}.block"
            f = fprefix + (f"stage{si}_block{li}",)
            if cfg.fused:
                if cfg.expand_ratio == 1:
                    im.conv(f"{t}.0.0", f + ("expand", "conv"))
                    im.bn(f"{t}.0.1", f + ("expand", "bn"))
                else:
                    im.conv(f"{t}.0.0", f + ("expand", "conv"))
                    im.bn(f"{t}.0.1", f + ("expand", "bn"))
                    im.conv(f"{t}.1.0", f + ("project", "conv"))
                    im.bn(f"{t}.1.1", f + ("project", "bn"))
            else:
                im.conv(f"{t}.0.0", f + ("expand", "conv"))
                im.bn(f"{t}.0.1", f + ("expand", "bn"))
                im.conv(f"{t}.1.0", f + ("depthwise", "conv"), depthwise=True)
                im.bn(f"{t}.1.1", f + ("depthwise", "bn"))
                im.conv(f"{t}.2.fc1", f + ("se", "fc1"))
                im.conv(f"{t}.2.fc2", f + ("se", "fc2"))
                im.conv(f"{t}.3.0", f + ("project", "conv"))
                im.bn(f"{t}.3.1", f + ("project", "bn"))
    hi = len(cfgs) + 1
    im.conv(f"{tprefix}.features.{hi}.0", fprefix + ("head", "conv"))
    im.bn(f"{tprefix}.features.{hi}.1", fprefix + ("head", "bn"))


def _import_leafmap(im: _Importer, tprefix: str, fprefix):
    for k in range(4):
        im.bn(f"{tprefix}.in_bn.{k}", fprefix + (f"in_bn{k}",))
    for i in range(4):
        im.conv(f"{tprefix}.upsamplers.{i}.0", fprefix + (f"up{i}_conv",))
        im.bn(f"{tprefix}.upsamplers.{i}.1", fprefix + (f"up{i}_bn",))
    im.conv(f"{tprefix}.top_conv.0", fprefix + ("top_conv",))


def _import_simple_decoder(im: _Importer, tprefix: str, fprefix):
    for bi in range(len(MODULO_LIST)):
        t = f"{tprefix}.blocks.{bi}"
        im.linear(f"{t}.0", fprefix + (f"block{bi}_fc0",), bias=False)
        im.bn(f"{t}.1", fprefix + (f"block{bi}_bn0",))
        im.linear(f"{t}.3", fprefix + (f"block{bi}_fc1",), bias=False)
        im.bn(f"{t}.4", fprefix + (f"block{bi}_bn1",))
        im.linear(f"{t}.6", fprefix + (f"block{bi}_out",))


def import_detector(sd: Mapping[str, np.ndarray], model_size: str = "xl",
                    with_decoder: bool = True, fused: bool = False) -> dict:
    """Build flax variables for ``TextDetectorModel`` from a torch sd.

    Returns ``{'params': ..., 'batch_stats': ...}`` with top-level modules
    ``detector`` (and ``decoder`` when present in the checkpoint).
    ``fused=True`` emits the :class:`FusedLeafmaps` head layout (module
    ``heads``); ``fused=False`` the per-head :class:`Leafmap` layout.
    """
    im = _Importer(sd)
    det = ("detector",)
    _import_backbone(im, "detector.backbone", det + ("backbone",), model_size)
    for tname, fname in _HEAD_NAME_MAP.items():
        _import_leafmap(im, f"detector.{tname}", det + (fname,))
    if fused:
        from ..models.detector import fuse_head_variables
        names = list(_HEAD_NAME_MAP.values())
        hp = {h: im.params["detector"].pop(h) for h in names}
        hs = {h: im.batch_stats["detector"].pop(h) for h in names}
        fp, fs = fuse_head_variables(hp, hs)
        im.params["detector"]["heads"] = fp
        im.batch_stats["detector"]["heads"] = fs
    if with_decoder and any(k.startswith("decoder.") for k in sd):
        _import_simple_decoder(im, "decoder", ("decoder",))
    leftovers = [k for k in im.unconsumed()
                 if not k.endswith("num_batches_tracked")
                 and "minval" not in k]
    if leftovers:
        raise ValueError(f"unconsumed torch keys: {leftovers[:10]} "
                         f"(+{max(0, len(leftovers) - 10)} more)")
    return {"params": im.params, "batch_stats": im.batch_stats}


def import_detection_only(sd, model_size: str = "xl") -> dict:
    """Variables for the bare ``CenterNetDetection`` (no wrapper module)."""
    full = import_detector(sd, model_size)
    return {"params": full["params"]["detector"],
            "batch_stats": full["batch_stats"]["detector"]}


def _import_mha(im: _Importer, t: str, f, cross: bool):
    im.raw(f"{t}.pos_emb_q.encoding", f + ("pos_emb_q", "table"))
    if cross:
        im.raw(f"{t}.pos_emb_k.encoding", f + ("pos_emb_k", "table"))
    else:
        # self-attention never uses its k table; mark consumed
        im.mark_used(f"{t}.pos_emb_k.encoding")
    for p in ("q_proj", "k_proj", "v_proj", "out_proj"):
        im.linear(f"{t}.{p}", f + (p,), bias=False)


def _import_ln(im, t: str, f):
    im.ln(t, f)


def _import_swiglu(im: _Importer, t: str, f):
    for p in ("w1", "wg", "w2"):
        im.linear(f"{t}.{p}", f + (p,))


def import_transformer(sd: Mapping[str, np.ndarray],
                       dims: TransformerDims = TransformerDims()) -> dict:
    """Build flax variables for ``Transformer`` from a `model3.pt` sd."""
    im = _Importer(sd)
    enc = ("encoder",)
    im.linear("encoder.embed", enc + ("embed",), bias=False)
    im.raw("encoder.pos_emb.encoding", enc + ("pos_emb", "table"))
    _import_ln(im, "encoder.norm", enc + ("norm",))
    for i in range(dims.enc_block_num):
        t = f"encoder.blocks.{i}"
        f = enc + (f"block{i}",)
        _import_mha(im, f"{t}.mha", f + ("mha",), cross=False)
        _import_ln(im, f"{t}.norm1", f + ("norm1",))
        _import_ln(im, f"{t}.norm2", f + ("norm2",))
        _import_swiglu(im, f"{t}.ff", f + ("ff",))

    dec = ("decoder",)
    for k in range(len(MODULO_LIST)):
        im.embedding(f"decoder.embed.{k}.weight", dec + (f"embed{k}",))
    im.raw("decoder.pos_emb.encoding", dec + ("pos_emb", "table"))
    _import_ln(im, "decoder.norm", dec + ("norm",))
    for i in range(dims.dec_block_num):
        t = f"decoder.blocks.{i}"
        f = dec + (f"block{i}",)
        _import_mha(im, f"{t}.self_attn", f + ("self_attn",), cross=False)
        _import_mha(im, f"{t}.cross_attn", f + ("cross_attn",), cross=True)
        _import_ln(im, f"{t}.norm1", f + ("norm1",))
        _import_ln(im, f"{t}.norm2", f + ("norm2",))
        _import_ln(im, f"{t}.norm3", f + ("norm3",))
        _import_swiglu(im, f"{t}.ff", f + ("ff",))
    for k in range(len(MODULO_LIST)):
        im.linear(f"decoder.out_layers.{k}", dec + (f"out{k}",))

    leftovers = im.unconsumed()
    if leftovers:
        raise ValueError(f"unconsumed torch keys: {leftovers[:10]}")
    return {"params": im.params}


def assert_tree_matches(imported: dict, initialized: dict, path=""):
    """Recursively compare structure+shapes of imported vs model.init trees."""
    ik = set(imported.keys())
    nk = set(initialized.keys())
    if ik != nk:
        raise ValueError(
            f"tree mismatch at {path or '<root>'}: "
            f"imported-only={sorted(ik - nk)} init-only={sorted(nk - ik)}")
    for k in ik:
        a, b = imported[k], initialized[k]
        if isinstance(b, dict):
            assert_tree_matches(a, b, f"{path}/{k}")
        else:
            if tuple(np.shape(a)) != tuple(np.shape(b)):
                raise ValueError(
                    f"shape mismatch at {path}/{k}: "
                    f"{np.shape(a)} vs {np.shape(b)}")
