"""CenterNet-style text detector: backbone + 9 map heads + feature head.

Functional equivalents of the reference's model zoo
(`/root/reference/models/detector.py:148-306`), designed TPU-first:

* NHWC everywhere; the 9 scalar heads and the 100-d feature head all share
  the multi-scale taps of the EfficientNetV2 backbone.
* ``Leafmap``: per-head U-Net-style decoder — BN each tap, 3x3 conv -> BN ->
  exact GELU -> 2x align-corners bilinear upsample (as MXU matmuls),
  channel-concat cascade from 1/32 up to 1/4, then a 3x3 output conv.
* ``SimpleDecoder``: 3 parallel MLPs (feature_dim -> 2048 -> 2048 -> m_k),
  one per CRT modulus, used to pre-train the feature space.
* ``TextDetectorModel``: training wrapper gathering the top-k feature pixels
  ranked by the GT heatmap (a static-shape top_k instead of the reference's
  full argsort) and classifying them with the SimpleDecoder.
* ``detect_peaks``: inference NMS — 3x3 local-max suppression, fixed-shape.
"""
from __future__ import annotations

from typing import Any, Sequence

import jax
import jax.numpy as jnp
from flax import linen as nn

from ..const import FEATURE_DIM, MODULO_LIST
from ..ops.resize import upsample2x
from .efficientnet import EfficientNetV2

_gelu_exact = lambda x: nn.gelu(x, approximate=False)  # noqa: E731

HEAD_NAMES = (
    "keyheatmap", "sizes", "textline", "separator",
    "code1", "code2", "code4", "code8",
)
HEAD_DIMS = (1, 2, 1, 1, 1, 1, 1, 1)


class Leafmap(nn.Module):
    """Per-output upsampling decoder over the 4 backbone taps."""
    out_dim: int = 1
    conv_dim: int = 192
    bn_eps: float = 1e-5
    dtype: Any = None

    @nn.compact
    def __call__(self, taps: Sequence[jnp.ndarray], train: bool = False):
        # taps: [1/4, 1/8, 1/16, 1/32]; cascade runs deepest-first.
        y = None
        n = len(taps)
        for i, x in enumerate(reversed(taps)):
            x = nn.BatchNorm(use_running_average=not train, momentum=0.9,
                             epsilon=self.bn_eps, dtype=self.dtype,
                             name=f"in_bn{n - 1 - i}")(x)
            if y is not None:
                # channel order [carry, tap] mirrors the reference concat
                x = jnp.concatenate([y, x], axis=-1)
            x = nn.Conv(self.conv_dim, (3, 3), padding=((1, 1), (1, 1)),
                        use_bias=False, dtype=self.dtype,
                        name=f"up{i}_conv")(x)
            x = nn.BatchNorm(use_running_average=not train, momentum=0.9,
                             epsilon=self.bn_eps, dtype=self.dtype,
                             name=f"up{i}_bn")(x)
            x = _gelu_exact(x)
            if i < n - 1:
                x = upsample2x(x)
            y = x
        return nn.Conv(self.out_dim, (3, 3), padding=((1, 1), (1, 1)),
                       use_bias=True, dtype=self.dtype, name="top_conv")(y)


class CenterNetDetection(nn.Module):
    """Backbone + 8 scalar-map heads (9 channels) + feature head.

    Returns ``(heatmap[B,H/4,W/4,9], features[B,H/4,W/4,feature_dim])``.
    Input is in [0,1]; normalized to [-1,1] inside, like the reference
    (`/root/reference/models/detector.py:218`).
    """
    model_size: str = "xl"
    feature_dim: int = FEATURE_DIM
    bn_eps_backbone: float = 1e-3
    bn_eps_head: float = 1e-5
    remat: bool = False
    dtype: Any = None

    @nn.compact
    def __call__(self, x, train: bool = False):
        x = x * 2.0 - 1.0
        taps = EfficientNetV2(self.model_size, bn_eps=self.bn_eps_backbone,
                              remat=self.remat,
                              dtype=self.dtype, name="backbone")(x, train)
        # under remat the head cascades recompute in the backward pass
        # too: with 10 heads of dense 3x3 convs at up to 192^2 they hold
        # more activation memory than the whole backbone
        Head = nn.remat(Leafmap, static_argnums=(2,)) if self.remat \
            else Leafmap
        maps = []
        for name, dim in zip(HEAD_NAMES, HEAD_DIMS):
            maps.append(Head(dim, bn_eps=self.bn_eps_head,
                             dtype=self.dtype, name=name)(taps, train))
        heatmap = jnp.concatenate(maps, axis=-1)
        features = Head(self.feature_dim, bn_eps=self.bn_eps_head,
                        dtype=self.dtype, name="feature")(taps, train)
        return heatmap, features


class SimpleDecoder(nn.Module):
    """3 parallel MLP classifiers, one per CRT modulus."""
    mid_dim: int = 2048
    dtype: Any = None

    @nn.compact
    def __call__(self, x, train: bool = False):
        outs = []
        for bi, modulo in enumerate(MODULO_LIST):
            h = x
            for li in range(2):
                h = nn.Dense(self.mid_dim, use_bias=False, dtype=self.dtype,
                             name=f"block{bi}_fc{li}")(h)
                h = nn.BatchNorm(use_running_average=not train, momentum=0.9,
                                 epsilon=1e-5, dtype=self.dtype,
                                 name=f"block{bi}_bn{li}")(h)
                h = _gelu_exact(h)
            outs.append(nn.Dense(modulo, use_bias=True, dtype=self.dtype,
                                 name=f"block{bi}_out")(h))
        return outs


def topk_fmask(keymap: jnp.ndarray, k_per_sample: int = 1024):
    """Indices of the top-k GT-heatmap pixels across the whole batch.

    The reference sorts the full flattened batch heatmap
    (`/root/reference/models/detector.py:270-281`); on TPU a static-shape
    ``lax.top_k`` over the flattened batch gives the same selection without
    a full argsort.

    Returns int32 flat indices of shape ``[batch * k_per_sample]`` into the
    ``[batch * H * W]`` flattened pixel axis.
    """
    b = keymap.shape[0]
    flat = keymap.reshape(-1)
    k = k_per_sample * b
    _, idx = jax.lax.top_k(flat, k)
    return idx


class TextDetectorModel(nn.Module):
    """Training wrapper: detector + SimpleDecoder on selected feature pixels.

    ``fmask_idx`` are flat indices (from :func:`topk_fmask` on the GT
    heatmap) into ``[B*H*W]``; the gathered 100-d vectors are classified
    into CRT residues.
    """
    model_size: str = "xl"
    feature_dim: int = FEATURE_DIM
    decoder_mid_dim: int = 2048
    remat: bool = False
    dtype: Any = None

    def setup(self):
        self.detector = CenterNetDetection(
            self.model_size, self.feature_dim, remat=self.remat,
            dtype=self.dtype)
        self.decoder = SimpleDecoder(self.decoder_mid_dim, dtype=self.dtype)

    def __call__(self, x, fmask_idx, train: bool = False):
        heatmap, features = self.detector(x, train)
        feats = features.reshape(-1, features.shape[-1])
        sel = jnp.take(feats, fmask_idx, axis=0)
        decoder_outputs = self.decoder(sel, train)
        return heatmap, decoder_outputs


def detect_peaks(heatmap: jnp.ndarray) -> jnp.ndarray:
    """3x3 local-peak suppression over the keymap channel.

    Equivalent to the reference's inference wrapper
    (`/root/reference/models/detector.py:283-296`): returns a 10-channel
    map ``[keymap, peakmap, sizes(2), textline, sep, code1..8]`` where
    ``peakmap`` is the keymap with non-local-maxima set to -inf.
    """
    keymap = heatmap[..., 0:1]
    neg_inf = jnp.asarray(-jnp.inf, dtype=keymap.dtype)
    local_max = jax.lax.reduce_window(
        keymap, neg_inf, jax.lax.max,
        window_dimensions=(1, 3, 3, 1),
        window_strides=(1, 1, 1, 1),
        padding=((0, 0), (1, 1), (1, 1), (0, 0)),
    )
    peakmap = jnp.where(keymap < local_max, neg_inf, keymap)
    return jnp.concatenate([keymap, peakmap, heatmap[..., 1:]], axis=-1)
