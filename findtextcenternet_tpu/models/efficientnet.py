"""EfficientNetV2 backbone (s/m/l/xl) in flax.linen, NHWC, TPU-first.

Architecturally equivalent to the torchvision EfficientNetV2 used by the
reference detector (`/root/reference/models/detector.py:12-28,123-146`) so
that torch ``model.pt`` checkpoints import 1:1, but written fresh for TPU:
NHWC layout end-to-end (MXU-friendly convolutions), exact-GELU/SiLU,
BatchNorm with eps 1e-3, static shapes. The 'xl' variant is the custom
7-stage config the reference defines; s/m/l follow the published V2 configs.

Multi-scale feature taps are returned at 1/4, 1/8, 1/16 and 1/32 resolution
(after stages 2, 3, 5(6) and the 1x1 head conv), matching
`BackboneModel.forward` (`/root/reference/models/detector.py:139-146`).
"""
from __future__ import annotations

import dataclasses
from typing import Any, Sequence

import jax.numpy as jnp
from flax import linen as nn


@dataclasses.dataclass(frozen=True)
class BlockCfg:
    """One stage of (Fused)MBConv blocks."""
    fused: bool
    expand_ratio: int
    kernel: int
    stride: int
    in_ch: int
    out_ch: int
    num_layers: int


def _cfgs(fused, e, k, s, i, o, n):
    return BlockCfg(fused, e, k, s, i, o, n)


# Stage tables. (expand, kernel, stride, in, out, layers)
EFFNET_V2_CONFIGS: dict[str, list[BlockCfg]] = {
    "s": [
        _cfgs(True, 1, 3, 1, 24, 24, 2),
        _cfgs(True, 4, 3, 2, 24, 48, 4),
        _cfgs(True, 4, 3, 2, 48, 64, 4),
        _cfgs(False, 4, 3, 2, 64, 128, 6),
        _cfgs(False, 6, 3, 1, 128, 160, 9),
        _cfgs(False, 6, 3, 2, 160, 256, 15),
    ],
    "m": [
        _cfgs(True, 1, 3, 1, 24, 24, 3),
        _cfgs(True, 4, 3, 2, 24, 48, 5),
        _cfgs(True, 4, 3, 2, 48, 80, 5),
        _cfgs(False, 4, 3, 2, 80, 160, 7),
        _cfgs(False, 6, 3, 1, 160, 176, 14),
        _cfgs(False, 6, 3, 2, 176, 304, 18),
        _cfgs(False, 6, 3, 1, 304, 512, 5),
    ],
    "l": [
        _cfgs(True, 1, 3, 1, 32, 32, 4),
        _cfgs(True, 4, 3, 2, 32, 64, 7),
        _cfgs(True, 4, 3, 2, 64, 96, 7),
        _cfgs(False, 4, 3, 2, 96, 192, 10),
        _cfgs(False, 6, 3, 1, 192, 224, 19),
        _cfgs(False, 6, 3, 2, 224, 384, 25),
        _cfgs(False, 6, 3, 1, 384, 640, 7),
    ],
    # minimal config for tests / multi-chip dryruns (not in the reference)
    "tiny": [
        _cfgs(True, 1, 3, 1, 8, 8, 1),
        _cfgs(True, 4, 3, 2, 8, 16, 1),
        _cfgs(True, 4, 3, 2, 16, 16, 1),
        _cfgs(False, 4, 3, 2, 16, 24, 1),
        _cfgs(False, 6, 3, 1, 24, 24, 1),
        _cfgs(False, 6, 3, 2, 24, 32, 1),
    ],
    # custom 7-stage xl used by the reference detector
    "xl": [
        _cfgs(True, 1, 3, 1, 32, 32, 4),
        _cfgs(True, 4, 3, 2, 32, 64, 8),
        _cfgs(True, 4, 3, 2, 64, 96, 8),
        _cfgs(False, 4, 3, 2, 96, 192, 16),
        _cfgs(False, 6, 3, 1, 192, 256, 24),
        _cfgs(False, 6, 3, 2, 256, 512, 32),
        _cfgs(False, 6, 3, 1, 512, 640, 8),
    ],
}

LAST_CHANNEL = 1280
STOCHASTIC_DEPTH_PROB = 0.2

# channel widths of the four taps, per model size (1/4, 1/8, 1/16, 1/32)
TAP_CHANNELS: dict[str, tuple[int, int, int, int]] = {
    "tiny": (16, 16, 24, 1280),
    "s": (48, 64, 160, 1280),
    "m": (48, 80, 176, 1280),
    "l": (64, 96, 224, 1280),
    "xl": (64, 96, 256, 1280),
}


class ConvBNAct(nn.Module):
    """Conv (no bias) + BatchNorm + optional activation, NHWC."""
    features: int
    kernel: int
    stride: int = 1
    groups: int = 1
    act: Any = nn.silu          # None to disable
    bn_eps: float = 1e-3
    bn_momentum: float = 0.9
    dtype: Any = None

    @nn.compact
    def __call__(self, x, train: bool = False):
        pad = (self.kernel - 1) // 2
        x = nn.Conv(
            self.features,
            (self.kernel, self.kernel),
            strides=(self.stride, self.stride),
            padding=((pad, pad), (pad, pad)),
            feature_group_count=self.groups,
            use_bias=False,
            dtype=self.dtype,
            name="conv",
        )(x)
        x = nn.BatchNorm(
            use_running_average=not train,
            momentum=self.bn_momentum,
            epsilon=self.bn_eps,
            dtype=self.dtype,
            name="bn",
        )(x)
        if self.act is not None:
            x = self.act(x)
        return x


class SqueezeExcite(nn.Module):
    """SE block: global-avg -> 1x1 reduce (SiLU) -> 1x1 expand (sigmoid)."""
    squeeze_ch: int
    dtype: Any = None

    @nn.compact
    def __call__(self, x):
        c = x.shape[-1]
        s = jnp.mean(x, axis=(1, 2), keepdims=True)
        s = nn.Conv(self.squeeze_ch, (1, 1), use_bias=True, dtype=self.dtype,
                    name="fc1")(s)
        s = nn.silu(s)
        s = nn.Conv(c, (1, 1), use_bias=True, dtype=self.dtype, name="fc2")(s)
        return x * nn.sigmoid(s)


class StochasticDepth(nn.Module):
    """Row-mode stochastic depth on the residual branch."""
    rate: float

    @nn.compact
    def __call__(self, x, train: bool = False):
        if not train or self.rate == 0.0:
            return x
        keep = 1.0 - self.rate
        rng = self.make_rng("dropout")
        shape = (x.shape[0],) + (1,) * (x.ndim - 1)
        mask = jnp.floor(keep + jnp.asarray(
            nn.initializers.uniform(1.0)(rng, shape, jnp.float32)))
        return x / keep * mask


class FusedMBConv(nn.Module):
    cfg: BlockCfg
    stride: int
    in_ch: int
    sd_rate: float
    bn_eps: float = 1e-3
    dtype: Any = None

    @nn.compact
    def __call__(self, x, train: bool = False):
        cfg = self.cfg
        use_res = self.stride == 1 and self.in_ch == cfg.out_ch
        inp = x
        expanded = self.in_ch * cfg.expand_ratio
        if cfg.expand_ratio == 1:
            x = ConvBNAct(cfg.out_ch, cfg.kernel, self.stride,
                          act=nn.silu, bn_eps=self.bn_eps, dtype=self.dtype,
                          name="expand")(x, train)
        else:
            x = ConvBNAct(expanded, cfg.kernel, self.stride,
                          act=nn.silu, bn_eps=self.bn_eps, dtype=self.dtype,
                          name="expand")(x, train)
            x = ConvBNAct(cfg.out_ch, 1, 1, act=None, bn_eps=self.bn_eps,
                          dtype=self.dtype, name="project")(x, train)
        if use_res:
            x = StochasticDepth(self.sd_rate, name="sd")(x, train)
            x = x + inp
        return x


class MBConv(nn.Module):
    cfg: BlockCfg
    stride: int
    in_ch: int
    sd_rate: float
    bn_eps: float = 1e-3
    dtype: Any = None

    @nn.compact
    def __call__(self, x, train: bool = False):
        cfg = self.cfg
        use_res = self.stride == 1 and self.in_ch == cfg.out_ch
        inp = x
        expanded = self.in_ch * cfg.expand_ratio
        x = ConvBNAct(expanded, 1, 1, act=nn.silu, bn_eps=self.bn_eps,
                      dtype=self.dtype, name="expand")(x, train)
        x = ConvBNAct(expanded, cfg.kernel, self.stride, groups=expanded,
                      act=nn.silu, bn_eps=self.bn_eps, dtype=self.dtype,
                      name="depthwise")(x, train)
        x = SqueezeExcite(max(1, self.in_ch // 4), dtype=self.dtype,
                          name="se")(x)
        x = ConvBNAct(cfg.out_ch, 1, 1, act=None, bn_eps=self.bn_eps,
                      dtype=self.dtype, name="project")(x, train)
        if use_res:
            x = StochasticDepth(self.sd_rate, name="sd")(x, train)
            x = x + inp
        return x


class EfficientNetV2(nn.Module):
    """Backbone returning the 4 multi-scale taps (1/4, 1/8, 1/16, 1/32).

    ``remat`` rematerializes each block in the backward pass
    (jax.checkpoint), trading ~30% more FLOPs for activation memory so
    the xl backbone trains at the reference's batch 32 on one chip.
    """
    model_size: str = "xl"
    bn_eps: float = 1e-3
    remat: bool = False
    dtype: Any = None

    @nn.compact
    def __call__(self, x, train: bool = False) -> Sequence[jnp.ndarray]:
        cfgs = EFFNET_V2_CONFIGS[self.model_size]
        total_blocks = sum(c.num_layers for c in cfgs)
        # taps after stage index 2, 3, 5 (0-based stage numbering here;
        # the reference taps features[2],[3],[5] where [0] is the stem)
        tap_stages = {1, 2, 4}

        x = ConvBNAct(cfgs[0].in_ch, 3, 2, act=nn.silu, bn_eps=self.bn_eps,
                      dtype=self.dtype, name="stem")(x, train)

        taps = []
        block_id = 0
        for si, cfg in enumerate(cfgs):
            for li in range(cfg.num_layers):
                stride = cfg.stride if li == 0 else 1
                in_ch = cfg.in_ch if li == 0 else cfg.out_ch
                sd = STOCHASTIC_DEPTH_PROB * block_id / total_blocks
                Block = FusedMBConv if cfg.fused else MBConv
                if self.remat:
                    Block = nn.remat(Block, static_argnums=(2,))
                x = Block(cfg, stride, in_ch, sd, bn_eps=self.bn_eps,
                          dtype=self.dtype,
                          name=f"stage{si}_block{li}")(x, train)
                block_id += 1
            if si in tap_stages:
                taps.append(x)

        x = ConvBNAct(LAST_CHANNEL, 1, 1, act=nn.silu, bn_eps=self.bn_eps,
                      dtype=self.dtype, name="head")(x, train)
        taps.append(x)
        return taps
