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


def _conv_nhwc(x, kernel, groups: int = 1):
    return jax.lax.conv_general_dilated(
        x, kernel, window_strides=(1, 1), padding=((1, 1), (1, 1)),
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        feature_group_count=groups)


def _fused_kernel_init(key, shape, dtype=jnp.float32):
    # variance scaling with fan_in = ky*kx*cin (per-head conv fan), like
    # per-head lecun_normal on (3,3,cin,D)
    fan_in = shape[0] * shape[1] * shape[2]
    std = (1.0 / fan_in) ** 0.5
    return std * jax.random.truncated_normal(key, -2, 2, shape, dtype)


class FusedLeafmaps(nn.Module):
    """All detector heads in one cascade — math-identical to per-head
    :class:`Leafmap` stacks (reference `models/detector.py:148-230`),
    restructured for the MXU:

    * Each head's per-tap BatchNorm is an affine in the raw tap (train:
      batch moments, which the reference's per-head BNs share since they
      see the same tap; eval: per-head running stats). Folding that
      affine into the conv weights lets every head's tap contribution
      come from ONE dense conv over the shared tap — 10 narrow convs
      become one wide MXU matmul reading the tap once.
    * The folded BN bias is border-dependent under zero padding; it is
      materialized exactly by a separable VPU construction (row/column
      validity masks), not a conv.
    * Carry levels run per-head ``[carry | folded-tap]`` convs (fastest
      measured formulation on v5e — see the inline note); the up-BNs
      merge into one BatchNorm over G*D channels (per-channel BN of
      concatenated carries == per-head BN).
    * The 8 scalar top convs run as one grouped conv (2 padded outputs
      per group, channels then selected); the feature top conv is dense.

    Conversion to/from the per-head layout: :func:`fuse_head_variables` /
    :func:`unfuse_head_variables`.
    """
    head_dims: Sequence[int] = HEAD_DIMS
    feature_dim: int = FEATURE_DIM
    conv_dim: int = 192
    bn_eps: float = 1e-5
    dtype: Any = None

    @nn.compact
    def __call__(self, taps: Sequence[jnp.ndarray], train: bool = False):
        G = len(self.head_dims) + 1          # + feature head (last group)
        D = self.conv_dim
        n = len(taps)
        dt = self.dtype or taps[0].dtype
        y = None
        for i, x in enumerate(reversed(taps)):
            level = n - 1 - i
            ch = x.shape[-1]
            scale = self.param(f"in_bn{level}_scale",
                               nn.initializers.ones, (G, ch))
            bias = self.param(f"in_bn{level}_bias",
                              nn.initializers.zeros, (G, ch))
            ra_mean = self.variable("batch_stats", f"in_bn{level}_mean",
                                    jnp.zeros, (G, ch))
            ra_var = self.variable("batch_stats", f"in_bn{level}_var",
                                   jnp.ones, (G, ch))
            if train:
                xf = x.astype(jnp.float32)
                m = jnp.mean(xf, axis=(0, 1, 2))
                v = jnp.var(xf, axis=(0, 1, 2))
                mean_g = jnp.broadcast_to(m, (G, ch))
                var_g = jnp.broadcast_to(v, (G, ch))
                if not self.is_initializing():
                    mom = 0.9
                    ra_mean.value = mom * ra_mean.value + (1 - mom) * mean_g
                    ra_var.value = mom * ra_var.value + (1 - mom) * var_g
            else:
                mean_g, var_g = ra_mean.value, ra_var.value
            inv = scale / jnp.sqrt(var_g + self.bn_eps)        # (G, ch)
            bfold = bias - mean_g * inv

            wt = self.param(f"up{i}_tap_kernel", _fused_kernel_init,
                            (3, 3, ch, G, D))
            wt_f = wt * jnp.transpose(inv)[None, None, :, :, None]
            if y is None:
                # shared input: ONE wide conv (10 narrow N=192 convs -> a
                # single N=G*D MXU matmul; measured 78% vs 27% MFU)
                out = _conv_nhwc(x.astype(dt),
                                 wt_f.reshape(3, 3, ch, G * D).astype(dt))
            else:
                # carry levels: per-head [carry|folded-tap] convs. The
                # combined K=(D+ch)*9 conv is the fastest measured
                # formulation on v5e (grouped carry + wide tap splits the
                # contraction and loses ~30%; N=192 per head caps MFU at
                # ~27% regardless of engine — a Pallas matmul reproduces
                # XLA's number exactly at this shape).
                wc = self.param(f"up{i}_carry_kernel", _fused_kernel_init,
                                (3, 3, D, G, D))
                outs = []
                for g in range(G):
                    kg = jnp.concatenate(
                        [wc[:, :, :, g], wt_f[:, :, :, g]], axis=2)
                    inp = jnp.concatenate([y[..., g * D:(g + 1) * D],
                                           x.astype(y.dtype)], axis=-1)
                    outs.append(_conv_nhwc(inp, kg.astype(dt)))
                out = jnp.concatenate(outs, -1)
            # exact border-aware folded-BN bias (zero padding means a
            # constant conv input is not constant at the border).
            # Separable construction: validity of kernel row ky depends
            # only on y, of column kx only on x, so the 3x3 "ones conv"
            # reduces to broadcasted where-adds (VPU, fused into the conv
            # epilogue; an actual K=9 conv measured ~3 ms/level on v5e).
            s = jnp.einsum("yxcgd,gc->yxgd", wt, bfold
                           ).reshape(3, 3, G * D).astype(dt)
            hh, ww = x.shape[1:3]
            ym = jnp.arange(hh) > 0          # kernel row 0 valid
            yp = jnp.arange(hh) < hh - 1     # kernel row 2 valid
            xm = jnp.arange(ww) > 0
            xp = jnp.arange(ww) < ww - 1

            def row_term(ky):
                t = s[ky, 1][None, :] \
                    + jnp.where(xm[:, None], s[ky, 0][None, :], 0) \
                    + jnp.where(xp[:, None], s[ky, 2][None, :], 0)
                return t                      # (W, G*D)

            bias_map = row_term(1)[None, :, :] \
                + jnp.where(ym[:, None, None], row_term(0)[None], 0) \
                + jnp.where(yp[:, None, None], row_term(2)[None], 0)
            out = out + bias_map[None]        # (1, H, W, G*D) broadcast
            out = nn.BatchNorm(use_running_average=not train, momentum=0.9,
                               epsilon=self.bn_eps, dtype=self.dtype,
                               name=f"up{i}_bn")(out)
            out = _gelu_exact(out)
            if i < n - 1:
                out = upsample2x(out)
            y = out

        S = len(self.head_dims)

        def _top_scalar_init(key, shape, dtype=jnp.float32):
            # zero the padded output slots (heads with dim < 2): they are
            # dropped by the channel selection, receive no gradient, and
            # must stay zero so torch export/import round-trips exactly
            w = _fused_kernel_init(key, shape, dtype)
            mask = jnp.zeros(shape[-2:], dtype)
            for h, dim in enumerate(self.head_dims):
                mask = mask.at[h, :dim].set(1)
            return w * mask

        wts = self.param("top_scalar_kernel", _top_scalar_init,
                         (3, 3, D, S, 2))
        bts = self.param("top_scalar_bias", nn.initializers.zeros, (S, 2))
        scal = _conv_nhwc(y[..., :S * D],
                          wts.reshape(3, 3, D, S * 2).astype(dt),
                          groups=S) + bts.reshape(S * 2).astype(dt)
        sel = []
        for h, dim in enumerate(self.head_dims):
            sel.extend(2 * h + j for j in range(dim))
        heatmap = jnp.take(scal, jnp.asarray(sel), axis=-1)

        wtf = self.param("top_feature_kernel", _fused_kernel_init,
                         (3, 3, D, self.feature_dim))
        btf = self.param("top_feature_bias", nn.initializers.zeros,
                         (self.feature_dim,))
        features = _conv_nhwc(y[..., S * D:], wtf.astype(dt)) \
            + btf.astype(dt)
        return heatmap, features


class CenterNetDetection(nn.Module):
    """Backbone + 8 scalar-map heads (9 channels) + feature head.

    Returns ``(heatmap[B,H/4,W/4,9], features[B,H/4,W/4,feature_dim])``.
    Input is in [0,1]; normalized to [-1,1] inside, like the reference
    (`/root/reference/models/detector.py:218`).

    ``fused=False`` (default) runs the per-head :class:`Leafmap`
    modules — measured fastest on TPU v5e, where XLA's conv at the
    per-head shape (K=2304, N=192) already sits at the platform's
    shape-limited MXU ceiling (~27% MFU; a Pallas matmul reproduces
    XLA's time exactly at this shape, so the narrow-N output is the
    hardware floor, not a compiler artifact). ``fused=True`` runs the
    math-identical :class:`FusedLeafmaps` restructuring (BN-fold +
    merged ops) — useful for ablation; measured ~20% slower end to end
    on v5e because the wide concat/bias fusion boundaries offset the
    merged-op savings.
    """
    model_size: str = "xl"
    feature_dim: int = FEATURE_DIM
    bn_eps_backbone: float = 1e-3
    bn_eps_head: float = 1e-5
    remat: bool = False
    fused: bool = False
    dtype: Any = None
    # Leafmap internal width. 192 is the reference's shape
    # (`/root/reference/models/detector.py:173`); 256 pads the hot conv
    # to 2 full MXU tiles — the train-MFU probe knob (PERFORMANCE.md)
    head_conv_dim: int = 192

    @nn.compact
    def __call__(self, x, train: bool = False):
        x = x * 2.0 - 1.0
        taps = EfficientNetV2(self.model_size, bn_eps=self.bn_eps_backbone,
                              remat=self.remat,
                              dtype=self.dtype, name="backbone")(x, train)
        # under remat the head cascades recompute in the backward pass
        # too: dense 3x3 convs at 192^2 hold more activation memory than
        # the whole backbone
        if self.fused:
            Heads = nn.remat(FusedLeafmaps, static_argnums=(2,)) \
                if self.remat else FusedLeafmaps
            return Heads(HEAD_DIMS, self.feature_dim,
                         bn_eps=self.bn_eps_head, dtype=self.dtype,
                         name="heads")(taps, train)
        Head = nn.remat(Leafmap, static_argnums=(2,)) if self.remat \
            else Leafmap
        maps = []
        for name, dim in zip(HEAD_NAMES, HEAD_DIMS):
            maps.append(Head(dim, conv_dim=self.head_conv_dim,
                             bn_eps=self.bn_eps_head,
                             dtype=self.dtype, name=name)(taps, train))
        heatmap = jnp.concatenate(maps, axis=-1)
        features = Head(self.feature_dim, conv_dim=self.head_conv_dim,
                        bn_eps=self.bn_eps_head,
                        dtype=self.dtype, name="feature")(taps, train)
        return heatmap, features


def fuse_head_variables(head_params: dict, head_stats: dict,
                        feature_dim: int = FEATURE_DIM,
                        conv_dim: int = 192):
    """Per-head :class:`Leafmap` variable trees -> :class:`FusedLeafmaps`.

    ``head_params`` / ``head_stats`` map head name (HEAD_NAMES +
    'feature') to that head's Leafmap params / batch_stats. Returns
    ``(params, batch_stats)`` for the module named ``heads``.
    """
    import numpy as np

    names = list(HEAD_NAMES) + ["feature"]
    G, D, S = len(names), conv_dim, len(HEAD_NAMES)
    p, s = {}, {}
    for level in range(4):
        p[f"in_bn{level}_scale"] = np.stack(
            [head_params[h][f"in_bn{level}"]["scale"] for h in names])
        p[f"in_bn{level}_bias"] = np.stack(
            [head_params[h][f"in_bn{level}"]["bias"] for h in names])
        s[f"in_bn{level}_mean"] = np.stack(
            [head_stats[h][f"in_bn{level}"]["mean"] for h in names])
        s[f"in_bn{level}_var"] = np.stack(
            [head_stats[h][f"in_bn{level}"]["var"] for h in names])
    for i in range(4):
        kernels = [np.asarray(head_params[h][f"up{i}_conv"]["kernel"])
                   for h in names]
        if i == 0:
            p[f"up{i}_tap_kernel"] = np.stack(kernels, axis=3)
        else:
            # reference concat order is [carry, tap]
            p[f"up{i}_carry_kernel"] = np.stack(
                [k[:, :, :D] for k in kernels], axis=3)
            p[f"up{i}_tap_kernel"] = np.stack(
                [k[:, :, D:] for k in kernels], axis=3)
        p[f"up{i}_bn"] = {
            "scale": np.concatenate(
                [head_params[h][f"up{i}_bn"]["scale"] for h in names]),
            "bias": np.concatenate(
                [head_params[h][f"up{i}_bn"]["bias"] for h in names]),
        }
        s[f"up{i}_bn"] = {
            "mean": np.concatenate(
                [head_stats[h][f"up{i}_bn"]["mean"] for h in names]),
            "var": np.concatenate(
                [head_stats[h][f"up{i}_bn"]["var"] for h in names]),
        }
    wts = np.zeros((3, 3, D, S, 2), np.float32)
    bts = np.zeros((S, 2), np.float32)
    for h, (name, dim) in enumerate(zip(HEAD_NAMES, HEAD_DIMS)):
        wts[:, :, :, h, :dim] = head_params[name]["top_conv"]["kernel"]
        bts[h, :dim] = head_params[name]["top_conv"]["bias"]
    p["top_scalar_kernel"] = wts
    p["top_scalar_bias"] = bts
    p["top_feature_kernel"] = np.asarray(
        head_params["feature"]["top_conv"]["kernel"])
    p["top_feature_bias"] = np.asarray(
        head_params["feature"]["top_conv"]["bias"])
    return p, s


def unfuse_head_variables(params: dict, stats: dict,
                          conv_dim: int = 192):
    """Inverse of :func:`fuse_head_variables` (for torch export / the
    per-head oracle path)."""
    import numpy as np

    names = list(HEAD_NAMES) + ["feature"]
    D = conv_dim
    hp = {h: {} for h in names}
    hs = {h: {} for h in names}
    for level in range(4):
        for g, h in enumerate(names):
            hp[h][f"in_bn{level}"] = {
                "scale": np.asarray(params[f"in_bn{level}_scale"][g]),
                "bias": np.asarray(params[f"in_bn{level}_bias"][g]),
            }
            hs[h][f"in_bn{level}"] = {
                "mean": np.asarray(stats[f"in_bn{level}_mean"][g]),
                "var": np.asarray(stats[f"in_bn{level}_var"][g]),
            }
    for i in range(4):
        for g, h in enumerate(names):
            tap = np.asarray(params[f"up{i}_tap_kernel"][:, :, :, g])
            if i == 0:
                kernel = tap
            else:
                carry = np.asarray(
                    params[f"up{i}_carry_kernel"][:, :, :, g])
                kernel = np.concatenate([carry, tap], axis=2)
            hp[h][f"up{i}_conv"] = {"kernel": kernel}
            hp[h][f"up{i}_bn"] = {
                "scale": np.asarray(
                    params[f"up{i}_bn"]["scale"][g * D:(g + 1) * D]),
                "bias": np.asarray(
                    params[f"up{i}_bn"]["bias"][g * D:(g + 1) * D]),
            }
            hs[h][f"up{i}_bn"] = {
                "mean": np.asarray(
                    stats[f"up{i}_bn"]["mean"][g * D:(g + 1) * D]),
                "var": np.asarray(
                    stats[f"up{i}_bn"]["var"][g * D:(g + 1) * D]),
            }
    for h, (name, dim) in enumerate(zip(HEAD_NAMES, HEAD_DIMS)):
        hp[name]["top_conv"] = {
            "kernel": np.asarray(
                params["top_scalar_kernel"][:, :, :, h, :dim]),
            "bias": np.asarray(params["top_scalar_bias"][h, :dim]),
        }
    hp["feature"]["top_conv"] = {
        "kernel": np.asarray(params["top_feature_kernel"]),
        "bias": np.asarray(params["top_feature_bias"]),
    }
    return hp, hs


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
    head_conv_dim: int = 192

    def setup(self):
        self.detector = CenterNetDetection(
            self.model_size, self.feature_dim, remat=self.remat,
            dtype=self.dtype, head_conv_dim=self.head_conv_dim)
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
