"""On-device peak extraction: NMS + top-k + feature gather, batched.

The reference extracts peaks on the host with a python loop over an argsort
of the full 192x192 map and ships the whole 100-channel feature map back per
tile (`/root/reference/process_ocr_base.py:505-538`). Here the whole
reduction runs on the TPU over a *batch* of tiles: sigmoid + 3x3 NMS +
central-region mask + static top-k + gather of box sizes / code probs /
feature vectors. Only ``max_peaks`` rows per tile leave the device.
"""
from __future__ import annotations

from typing import Dict

import jax
import jax.numpy as jnp



def nms_peakmap(keymap_logits: jnp.ndarray) -> jnp.ndarray:
    """(B,H,W) keymap logits -> logits with non-3x3-local-maxima = -inf."""
    x = keymap_logits[..., None]
    neg_inf = jnp.asarray(-jnp.inf, dtype=x.dtype)
    local_max = jax.lax.reduce_window(
        x, neg_inf, jax.lax.max,
        window_dimensions=(1, 3, 3, 1),
        window_strides=(1, 1, 1, 1),
        padding=((0, 0), (1, 1), (1, 1), (0, 0)),
    )
    return jnp.where(x < local_max, neg_inf, x)[..., 0]


def extract_peaks(
    heatmap: jnp.ndarray,     # (B, H, W, 9) detector logits
    features: jnp.ndarray,    # (B, H, W, F)
    max_peaks: int = 1024,
    threshold: float = 0.4,
    region_mask: jnp.ndarray | None = None,  # (B, H, W) bool central region
    use_pallas: bool | None = None,
) -> Dict[str, jnp.ndarray]:
    """Top-k character peaks with decoded boxes and gathered features.

    Returns per-tile fixed-shape arrays:
      score (B,K), x/y (B,K) map-scale int32, w/h (B,K) image-scale float,
      codes (B,K,4) probabilities, feature (B,K,F), valid (B,K) bool.
    Box size decode is ``exp(v - 3) * 1024`` like the reference
    (`/root/reference/process_ocr_base.py:524-525`).
    """
    b, h, w, _ = heatmap.shape
    # a tile smaller than the requested peak budget (e.g. 64 px tiles ->
    # 16x16 maps) can't yield more peaks than it has cells
    max_peaks = min(max_peaks, h * w)
    keymap = heatmap[..., 0]
    if use_pallas is None:
        use_pallas = jax.default_backend() == "tpu"
    if use_pallas:
        # fused sigmoid + 3x3 NMS + mask in one VMEM-resident kernel
        from .pallas_kernels import nms_sigmoid_masked
        mask = (region_mask if region_mask is not None
                else jnp.ones((b, h, w), jnp.float32))
        peak_p = nms_sigmoid_masked(keymap.astype(jnp.float32), mask)
    else:
        peak_logits = nms_peakmap(keymap)
        peak_p = jax.nn.sigmoid(peak_logits.astype(jnp.float32))
        if region_mask is not None:
            peak_p = peak_p * region_mask.astype(peak_p.dtype)

    flat = peak_p.reshape(b, h * w)
    score, idx = jax.lax.top_k(flat, max_peaks)        # (B, K)
    ys = (idx // w).astype(jnp.int32)
    xs = (idx % w).astype(jnp.int32)
    valid = score >= threshold

    def gather_ch(ch):
        return jnp.take_along_axis(
            ch.reshape(b, h * w).astype(jnp.float32), idx, axis=1)

    bw = jnp.exp(gather_ch(heatmap[..., 1]) - 3.0) * 1024.0
    bh = jnp.exp(gather_ch(heatmap[..., 2]) - 3.0) * 1024.0
    codes = jnp.stack(
        [jax.nn.sigmoid(gather_ch(heatmap[..., 5 + k])) for k in range(4)],
        axis=-1)

    feat_flat = features.reshape(b, h * w, features.shape[-1])
    feat = jnp.take_along_axis(feat_flat, idx[..., None], axis=1)

    return {
        "score": score,
        "x": xs,
        "y": ys,
        "w": bw,
        "h": bh,
        "codes": codes,
        "feature": feat,
        "valid": valid,
    }


def central_region_mask(h: int, w: int, step_ratio: float,
                        has_left: bool, has_right: bool,
                        has_top: bool, has_bottom: bool) -> jnp.ndarray:
    """Static (H, W) bool mask of the tile's owned central region.

    Mirrors the page-merge ownership rule of the reference
    (`/root/reference/process_ocr_base.py:498-503`): interior tiles own the
    central ``step_ratio`` band; border tiles own out to the page edge.
    """
    import numpy as np

    x_min = int(w * (1 - step_ratio) / 2) if has_left else 0
    x_max = int(w * (1 - (1 - step_ratio) / 2)) + 1 if has_right else w
    y_min = int(h * (1 - step_ratio) / 2) if has_top else 0
    y_max = int(h * (1 - (1 - step_ratio) / 2)) + 1 if has_bottom else h
    m = np.zeros((h, w), dtype=bool)
    m[y_min:y_max, x_min:x_max] = True
    return jnp.asarray(m)


def sigmoid_maps(heatmap: jnp.ndarray) -> Dict[str, jnp.ndarray]:
    """Per-tile probability maps needed by the page merge / line engine."""
    return {
        "keymap": jax.nn.sigmoid(heatmap[..., 0].astype(jnp.float32)),
        "textline": jax.nn.sigmoid(heatmap[..., 3].astype(jnp.float32)),
        "separator": jax.nn.sigmoid(heatmap[..., 4].astype(jnp.float32)),
        "codes": jax.nn.sigmoid(heatmap[..., 5:9].astype(jnp.float32)),
    }
