"""Loss functions: focal heatmap, composite detector loss, transformer loss,
and coefficient-of-variation multi-loss weighting.

Numerically equivalent to the reference (`/root/reference/loss_func.py`), but
expressed with static shapes for XLA: boolean masked-selects become weighted
sums, and the CoV running statistics are a functional pytree state instead
of module attributes.
"""
from __future__ import annotations

from typing import Dict, Sequence, Tuple

import jax
import jax.numpy as jnp
from flax import struct

from .const import MODULO_LIST

# names and order of the detector sub-losses fed to CoV weighting
DETECTOR_LOSS_NAMES = (
    "keymap_loss", "size_loss", "textline_loss", "separator_loss",
    "id_loss", "code1_loss", "code2_loss", "code4_loss", "code8_loss",
)


def heatmap_loss(true: jnp.ndarray, logits: jnp.ndarray) -> jnp.ndarray:
    """Penalty-reduced focal loss on logits (CenterNet), alpha=2 beta=4."""
    alpha, beta, pos_th = 2.0, 4.0, 1.0
    logits32 = logits.astype(jnp.float32)
    true = true.astype(jnp.float32)
    predict = jax.nn.sigmoid(logits32)

    pos_mask = (true >= pos_th).astype(jnp.float32)
    neg_mask = 1.0 - pos_mask
    neg_weights = jnp.power(1.0 - true, beta)

    pos_loss = -jax.nn.log_sigmoid(logits32) * jnp.power(1 - predict, alpha)
    # -log(1 - sigmoid(x)) = x + softplus(-x)
    neg_loss = (logits32 + jax.nn.softplus(-logits32)) * \
        jnp.power(predict, alpha) * neg_weights
    return jnp.mean(pos_loss * pos_mask + neg_loss * neg_mask)


def _huber(pred, target, delta=1.0):
    err = pred - target
    abs_err = jnp.abs(err)
    quad = jnp.minimum(abs_err, delta)
    return 0.5 * quad * quad + delta * (abs_err - quad)


def _bce_logits(logits, labels, weight=None):
    logits = logits.astype(jnp.float32)
    loss = jnp.maximum(logits, 0) - logits * labels + \
        jax.nn.softplus(-jnp.abs(logits))
    if weight is not None:
        loss = loss * weight
    return jnp.mean(loss)


def detector_loss(
    fmask_idx: jnp.ndarray,
    labelmap: jnp.ndarray,          # (B, H, W, 5) key,xsize,ysize,line,sep
    idmap: jnp.ndarray,             # (B, H, W, 2) int32: code id, flag bits
    heatmap: jnp.ndarray,           # (B, H, W, 9) detector logits
    decoder_outputs: Sequence[jnp.ndarray],  # per-modulus logits at fmask
) -> Dict[str, jnp.ndarray]:
    """Composite detector loss (9 terms) + exact-match id accuracy.

    ``fmask_idx`` indexes the flattened ``[B*H*W]`` pixel axis (from
    :func:`..models.detector.topk_fmask` on the GT keymap).
    Matches `/root/reference/loss_func.py:94-177` with masked-selects
    re-expressed as weighted sums.
    """
    key_th1, key_th3 = 0.85, 0.99

    keylabel = labelmap[..., 0].astype(jnp.float32)
    flat_key = keylabel.reshape(-1)
    flat_id = idmap[..., 0].reshape(-1)

    g_key = jnp.take(flat_key, fmask_idx)          # (N,)
    g_id = jnp.take(flat_id, fmask_idx)            # (N,) int

    # soft weights; weight>0 exactly where the reference masks select
    weight1 = jnp.maximum(keylabel - key_th1, 0.0) / (1 - key_th1)
    weight1_count = jnp.maximum(1.0, jnp.sum(weight1))
    weight2 = weight1  # same threshold in the reference (key_th2 == key_th1)
    mask3 = jnp.logical_and(g_key > key_th3, g_id > 0)
    weight3 = jnp.maximum(g_key - key_th3, 0.0) / (1 - key_th3)
    weight3 = jnp.where(mask3, weight3, 0.0)
    weight3_count = jnp.maximum(1.0, jnp.sum(weight3))

    keymap_loss_ = heatmap_loss(keylabel, heatmap[..., 0]) * 10.0

    xsize_loss = _huber(heatmap[..., 1].astype(jnp.float32), labelmap[..., 1])
    ysize_loss = _huber(heatmap[..., 2].astype(jnp.float32), labelmap[..., 2])
    size_loss = jnp.sum((xsize_loss + ysize_loss) * weight1) / weight1_count

    textline_loss = _bce_logits(heatmap[..., 3], labelmap[..., 3])
    separator_loss = _bce_logits(heatmap[..., 4], labelmap[..., 4])

    code_losses = {}
    flags = idmap[..., 1]
    for i in range(4):
        label = ((flags & (1 << i)) > 0).astype(jnp.float32)
        w = 1.0 + label * weight2 + weight2
        code_losses[f"code{1 << i}_loss"] = _bce_logits(
            heatmap[..., 5 + i], label, weight=w)

    id_loss = 0.0
    for m, logits in zip(MODULO_LIST, decoder_outputs):
        tgt = (g_id % m).astype(jnp.int32)
        ce = _softmax_ce_int(logits, tgt)
        id_loss += jnp.sum(ce * weight3) / weight3_count

    # exact-match accuracy on pixels with keylabel == 1 and a real id
    mask4 = jnp.logical_and(g_key == 1.0, g_id > 0)
    all_correct = jnp.ones_like(g_id, dtype=bool)
    for m, logits in zip(MODULO_LIST, decoder_outputs):
        pred = jnp.argmax(logits, axis=-1).astype(jnp.int32)
        all_correct = jnp.logical_and(all_correct, pred == (g_id % m))
    correct = jnp.sum(jnp.logical_and(all_correct, mask4))
    total = jnp.sum(mask4)

    loss = (keymap_loss_ + size_loss + textline_loss + separator_loss +
            id_loss + sum(code_losses.values()))

    return {
        "loss": loss,
        "keymap_loss": keymap_loss_,
        "size_loss": size_loss,
        "textline_loss": textline_loss,
        "separator_loss": separator_loss,
        "id_loss": id_loss,
        **code_losses,
        "correct": correct,
        "total": total,
    }


def _softmax_ce_int(logits, labels):
    logits = logits.astype(jnp.float32)
    logz = jax.nn.logsumexp(logits, axis=-1)
    picked = jnp.take_along_axis(
        logits, labels[..., None], axis=-1)[..., 0]
    return logz - picked


def transformer_loss(
    outputs: Sequence[jnp.ndarray],   # 3 x (B, L, m) logits
    labelcode: jnp.ndarray,           # (B, L) int32 target codepoints
    mask: jnp.ndarray,                # (B, L) bool: positions that were MSK
) -> Dict[str, jnp.ndarray]:
    """Per-modulus CE at masked positions + exact-match accuracy.

    Matches `/root/reference/loss_func.py:179-213`.
    """
    maskf = mask.astype(jnp.float32)
    count = jnp.maximum(1.0, jnp.sum(maskf))

    loss = 0.0
    all_correct = jnp.ones_like(labelcode, dtype=bool)
    for m, logits in zip(MODULO_LIST, outputs):
        tgt = (labelcode % m).astype(jnp.int32)
        ce = _softmax_ce_int(logits, tgt)
        loss += jnp.sum(ce * maskf) / count
        pred = jnp.argmax(logits, axis=-1).astype(jnp.int32)
        all_correct = jnp.logical_and(all_correct, pred == tgt)

    correct = jnp.sum(jnp.logical_and(all_correct, mask))
    total = jnp.sum(mask)
    return {"loss": loss, "correct": correct, "total": total}


# ---------------------------------------------------------------------------
# CoV multi-loss weighting (arXiv 2009.01717) as functional state
# ---------------------------------------------------------------------------

@struct.dataclass
class CoVState:
    """Welford running statistics over the loss ratios."""
    t: jnp.ndarray            # iteration counter, starts at -1
    mean_L: jnp.ndarray       # running mean of raw losses
    mean_l: jnp.ndarray       # running mean of loss ratios
    S_l: jnp.ndarray          # running sum of squared deviations of ratios


def cov_init(num_losses: int) -> CoVState:
    z = jnp.zeros((num_losses,), dtype=jnp.float32)
    return CoVState(t=jnp.asarray(-1, dtype=jnp.int32),
                    mean_L=z, mean_l=z, S_l=z)


def cov_apply(state: CoVState, losses: Sequence[jnp.ndarray]
              ) -> Tuple[jnp.ndarray, CoVState, jnp.ndarray]:
    """Weight ``losses`` by inverse coefficient-of-variation.

    Returns ``(weighted_total, new_state, alphas)``. Gradients flow through
    ``losses`` but not through the statistics (alphas are stop-gradiented),
    like the reference's ``CoVWeightingLoss.forward``
    (`/root/reference/loss_func.py:24-72`).
    """
    n = len(losses)
    L = jax.lax.stop_gradient(
        jnp.stack([jnp.asarray(l, dtype=jnp.float32) for l in losses]))
    t = state.t + 1

    L0 = jnp.where(t == 0, L, state.mean_L)
    ratio = L / jnp.where(L0 == 0, 1.0, L0)

    # previous-iteration std of the ratios: S / t (t samples so far)
    prev_var = state.S_l / jnp.maximum(1, t).astype(jnp.float32)
    prev_std = jnp.sqrt(jnp.clip(prev_var, 1e-16))
    ls = prev_std / jnp.where(state.mean_l == 0, 1.0, state.mean_l)
    alphas_cov = ls / jnp.sum(ls)
    alphas = jnp.where(t <= 1, jnp.full((n,), 1.0 / n), alphas_cov)

    mean_param = jnp.where(t == 0, 0.0,
                           1.0 - 1.0 / (t.astype(jnp.float32) + 1.0))
    new_mean_l = mean_param * state.mean_l + (1 - mean_param) * ratio
    new_S_l = state.S_l + (ratio - state.mean_l) * (ratio - new_mean_l)
    new_mean_L = mean_param * state.mean_L + (1 - mean_param) * L

    weighted = sum(a * l for a, l in zip(alphas, losses))
    new_state = CoVState(t=t, mean_L=new_mean_L, mean_l=new_mean_l,
                         S_l=new_S_l)
    return weighted, new_state, alphas


def cov_eval(losses: Sequence[jnp.ndarray]) -> jnp.ndarray:
    """Validation path: plain sum (reference returns sum when not training)."""
    return sum(jnp.asarray(l, dtype=jnp.float32) for l in losses)
