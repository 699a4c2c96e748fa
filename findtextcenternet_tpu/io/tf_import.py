"""Pretrained-backbone importer for TF EfficientNetV2 ``.npz`` weights.

The reference initializes its XL backbone from the published
``efficientnetv2-xl-21k.npz`` (TF checkpoint keys like
``efficientnetv2-xl/blocks_3/tpu_batch_normalization_1/moving_mean``),
permuting HWIO kernels into torch OIHW
(`/root/reference/models/detector.py:30-121`). This flax tree is NHWC
with HWIO kernels, so convolution kernels copy over directly; only the
TF depthwise layout (H, W, C, 1) transposes to flax's (H, W, 1, C).

Key schedule per block (reference :77-114):
  FusedMBConv, expand 1:  conv2d + tpu_batch_normalization
  FusedMBConv, expand >1: conv2d + tpu_bn, conv2d_1 + tpu_bn_1
  MBConv: conv2d + tpu_bn, depthwise_conv2d (depthwise_kernel) + tpu_bn_1,
          se/conv2d (+bias), se/conv2d_1 (+bias), conv2d_1 + tpu_bn_2
Blocks are numbered globally across stages; stem and head have their own
prefixes.
"""
from __future__ import annotations

from typing import Dict, List, Tuple

import numpy as np

from ..models.efficientnet import EFFNET_V2_CONFIGS


def _entries(model_size: str, prefix: str) -> List[Tuple]:
    """(npz_key, tree_path, transform) for every backbone tensor.

    tree_path is (collection, module_path..., leaf) with collection in
    {"params", "batch_stats"}.
    """
    out: List[Tuple] = []

    def conv(npz_base, module, kernel_key="kernel", depthwise=False,
             bias=False):
        tr = (lambda a: np.transpose(a, (0, 1, 3, 2))) if depthwise \
            else (lambda a: a)
        out.append((npz_base + kernel_key,
                    ("params",) + module + ("kernel",), tr))
        if bias:
            out.append((npz_base + "bias",
                        ("params",) + module + ("bias",), lambda a: a))

    def bn(npz_base, module):
        ident = lambda a: a  # noqa: E731
        out.append((npz_base + "gamma",
                    ("params",) + module + ("scale",), ident))
        out.append((npz_base + "beta",
                    ("params",) + module + ("bias",), ident))
        out.append((npz_base + "moving_mean",
                    ("batch_stats",) + module + ("mean",), ident))
        out.append((npz_base + "moving_variance",
                    ("batch_stats",) + module + ("var",), ident))

    conv(f"{prefix}/stem/conv2d/", ("stem", "conv"))
    bn(f"{prefix}/stem/tpu_batch_normalization/", ("stem", "bn"))

    idx = 0
    for si, cfg in enumerate(EFFNET_V2_CONFIGS[model_size]):
        for li in range(cfg.num_layers):
            blk = (f"stage{si}_block{li}",)
            base = f"{prefix}/blocks_{idx}/"
            if cfg.fused:
                if cfg.expand_ratio == 1:
                    conv(base + "conv2d/", blk + ("expand", "conv"))
                    bn(base + "tpu_batch_normalization/",
                       blk + ("expand", "bn"))
                else:
                    conv(base + "conv2d/", blk + ("expand", "conv"))
                    bn(base + "tpu_batch_normalization/",
                       blk + ("expand", "bn"))
                    conv(base + "conv2d_1/", blk + ("project", "conv"))
                    bn(base + "tpu_batch_normalization_1/",
                       blk + ("project", "bn"))
            else:
                conv(base + "conv2d/", blk + ("expand", "conv"))
                bn(base + "tpu_batch_normalization/", blk + ("expand", "bn"))
                conv(base + "depthwise_conv2d/", blk + ("depthwise", "conv"),
                     kernel_key="depthwise_kernel", depthwise=True)
                bn(base + "tpu_batch_normalization_1/",
                   blk + ("depthwise", "bn"))
                conv(base + "se/conv2d/", blk + ("se", "fc1"), bias=True)
                conv(base + "se/conv2d_1/", blk + ("se", "fc2"), bias=True)
                conv(base + "conv2d_1/", blk + ("project", "conv"))
                bn(base + "tpu_batch_normalization_2/",
                   blk + ("project", "bn"))
            idx += 1

    conv(f"{prefix}/head/conv2d/", ("head", "conv"))
    bn(f"{prefix}/head/tpu_batch_normalization/", ("head", "bn"))
    return out


def _detect_prefix(keys, model_size: str) -> str:
    for k in keys:
        if k.endswith("/stem/conv2d/kernel"):
            return k[: -len("/stem/conv2d/kernel")]
    return f"efficientnetv2-{model_size}"


def load_backbone_npz(variables: dict, weights, model_size: str = "xl",
                      backbone_path: Tuple[str, ...] = ("backbone",),
                      strict: bool = True) -> dict:
    """Copy TF npz weights into a flax variables dict.

    variables: {"params": ..., "batch_stats": ...} of a model whose
    backbone submodule sits at ``backbone_path`` inside each collection
    (pass ``()`` when `variables` belongs to the bare EfficientNetV2).
    weights: path to an .npz file or a mapping of numpy arrays.
    """
    if isinstance(weights, (str, bytes)):
        weights = dict(np.load(weights))
    prefix = _detect_prefix(weights.keys(), model_size)

    import jax

    flat = dict(variables_flatten(variables))
    n = 0
    for npz_key, path, tr in _entries(model_size, prefix):
        full = (path[0],) + tuple(backbone_path) + tuple(path[1:])
        if npz_key not in weights:
            if strict:
                raise KeyError(f"npz missing {npz_key}")
            continue
        if full not in flat:
            if strict:
                raise KeyError(f"variables missing {'/'.join(full)}")
            continue
        src = tr(np.asarray(weights[npz_key]))
        dst = flat[full]
        if src.shape != dst.shape:
            raise ValueError(
                f"{npz_key}: shape {src.shape} != {dst.shape} at "
                f"{'/'.join(full)}")
        flat[full] = src.astype(np.asarray(dst).dtype)
        n += 1
    if n == 0:
        raise ValueError("no weights imported")

    out = variables_unflatten(flat)
    return jax.tree_util.tree_map(lambda x: x, out)


def variables_flatten(tree: dict, prefix: Tuple[str, ...] = ()) -> list:
    items = []
    for k, v in tree.items():
        if isinstance(v, dict):
            items.extend(variables_flatten(v, prefix + (k,)))
        else:
            items.append((prefix + (k,), v))
    return items


def variables_unflatten(flat: dict) -> dict:
    out: dict = {}
    for path, v in flat.items():
        node = out
        for k in path[:-1]:
            node = node.setdefault(k, {})
        node[path[-1]] = v
    return out


def export_backbone_npz(variables: dict, model_size: str = "xl",
                        backbone_path: Tuple[str, ...] = ("backbone",),
                        prefix: str | None = None) -> Dict[str, np.ndarray]:
    """Inverse of :func:`load_backbone_npz` — a TF-keyed dict from the
    flax tree (used for round-trip tests and publishing)."""
    prefix = prefix or f"efficientnetv2-{model_size}"
    flat = dict(variables_flatten(variables))
    out: Dict[str, np.ndarray] = {}
    for npz_key, path, _tr in _entries(model_size, prefix):
        full = (path[0],) + tuple(backbone_path) + tuple(path[1:])
        a = np.asarray(flat[full])
        if npz_key.endswith("depthwise_kernel"):
            a = np.transpose(a, (0, 1, 3, 2))
        out[npz_key] = a
    return out
