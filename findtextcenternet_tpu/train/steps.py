"""Pure jittable train/eval steps for the detector and the transformer.

Equivalents of the reference's per-script step closures
(`/root/reference/train1.py:125-180`, `/root/reference/train3.py:129-186`),
as pjit-ready pure functions: bf16 compute, CoV loss weighting threaded as
state, BN statistics updated functionally, gradients averaged across the
data mesh axis by GSPMD (no explicit collectives).
"""
from __future__ import annotations

from typing import Dict, Tuple

import jax
import jax.numpy as jnp

from ..losses import (
    DETECTOR_LOSS_NAMES,
    cov_apply,
    cov_eval,
    detector_loss,
    transformer_loss,
)
from ..models.detector import topk_fmask
from .state import TrainState


def detector_train_step(state: TrainState, batch: Dict[str, jnp.ndarray],
                        fmask_k: int = 1024, loss_scale: float = 1.0,
                        freeze_detector: bool = False,
                        accum_steps: int = 1, dropout_seed: int = 0,
                        micro_sharding=None
                        ) -> Tuple[TrainState, Dict[str, jnp.ndarray]]:
    """One detector training step.

    batch: image (B,H,W,3) float in [0,1]; labelmap (B,h,w,5);
           idmap (B,h,w,2) int32.
    ``loss_scale`` multiplies the CoV-weighted loss before the gradient
    (per-source weighting in stage-2 finetuning,
    `/root/reference/train2.py:186-204`); ``freeze_detector`` zeroes the
    detector's gradients (the reference's decoder_only mode).
    ``accum_steps > 1`` splits the batch into micro-batches whose
    gradients average into one optimizer update, with BN statistics and
    CoV state threaded through the micro-batches — the reference's
    iters_to_accumulate (`/root/reference/train1.py:176-180`).
    ``micro_sharding`` (``NamedSharding`` over ``P(None, 'data')``)
    must accompany ``accum_steps > 1`` under a mesh — see
    :func:`transformer_train_step`.
    """

    def micro_grads(params, bn_stats, cov, mb, rng):
        keylabel = mb["labelmap"][..., 0]
        fmask_idx = topk_fmask(keylabel, fmask_k)

        def loss_fn(p):
            (heatmap, decoder_outputs), updates = state.apply_fn(
                {"params": p, "batch_stats": bn_stats},
                mb["image"], fmask_idx, True,
                mutable=["batch_stats"],
                rngs={"dropout": rng},
            )
            metrics = detector_loss(fmask_idx, mb["labelmap"], mb["idmap"],
                                    heatmap, decoder_outputs)
            sub = [metrics[k] for k in DETECTOR_LOSS_NAMES]
            weighted, new_cov, _alphas = cov_apply(cov, sub)
            if loss_scale != 1.0:
                weighted = weighted * loss_scale
            return weighted, (metrics, new_cov, updates["batch_stats"])

        return jax.grad(loss_fn, has_aux=True)(params)

    base_rng = jax.random.fold_in(jax.random.PRNGKey(dropout_seed),
                                  state.step)
    if accum_steps <= 1:
        grads, (metrics, new_cov, new_bn) = micro_grads(
            state.params, state.batch_stats, state.cov, batch, base_rng)
    else:
        micro = jax.tree_util.tree_map(
            lambda x: x.reshape((accum_steps, x.shape[0] // accum_steps)
                                + x.shape[1:]), batch)
        if micro_sharding is not None:
            micro = jax.lax.with_sharding_constraint(micro, micro_sharding)

        def body(carry, xs):
            grads_acc, cov, bn = carry
            mb, i = xs
            g, (m, cov, bn) = micro_grads(
                state.params, bn, cov, mb, jax.random.fold_in(base_rng, i))
            grads_acc = jax.tree_util.tree_map(
                lambda a, b: a + b / accum_steps, grads_acc, g)
            return (grads_acc, cov, bn), m

        zero = jax.tree_util.tree_map(jnp.zeros_like, state.params)
        (grads, new_cov, new_bn), stacked = jax.lax.scan(
            body, (zero, state.cov, state.batch_stats),
            (micro, jnp.arange(accum_steps)))
        metrics = jax.tree_util.tree_map(lambda m: jnp.mean(m, axis=0),
                                         stacked)

    if freeze_detector and isinstance(grads, dict) and "detector" in grads:
        grads = dict(grads)
        grads["detector"] = jax.tree_util.tree_map(
            jnp.zeros_like, grads["detector"])
    updates, new_opt = state.tx.update(grads, state.opt_state, state.params)
    new_params = jax.tree_util.tree_map(
        lambda p, u: p + u, state.params, updates)
    new_state = state.replace(
        step=state.step + 1, params=new_params, batch_stats=new_bn,
        opt_state=new_opt, cov=new_cov)
    return new_state, metrics


def detector_eval_step(state: TrainState, batch, fmask_k: int = 1024):
    keylabel = batch["labelmap"][..., 0]
    fmask_idx = topk_fmask(keylabel, fmask_k)
    heatmap, decoder_outputs = state.apply_fn(
        {"params": state.eval_params(), "batch_stats": state.batch_stats},
        batch["image"], fmask_idx, False)
    metrics = detector_loss(fmask_idx, batch["labelmap"], batch["idmap"],
                            heatmap, decoder_outputs)
    metrics["loss"] = cov_eval([metrics[k] for k in DETECTOR_LOSS_NAMES])
    return metrics


def detector_bn_recalib_step(state: TrainState, batch, fmask_k: int = 1024
                             ) -> TrainState:
    """Re-estimate BN statistics with the schedule-free *eval* params.

    The reference runs 50 no-grad train-mode batches after switching the
    optimizer to eval mode before every checkpoint
    (`/root/reference/train1.py:203-211`); this is the functional analog.
    """
    keylabel = batch["labelmap"][..., 0]
    fmask_idx = topk_fmask(keylabel, fmask_k)
    _, updates = state.apply_fn(
        {"params": state.eval_params(), "batch_stats": state.batch_stats},
        batch["image"], fmask_idx, True,
        mutable=["batch_stats"],
        rngs={"dropout": jax.random.PRNGKey(0)},
    )
    return state.replace(batch_stats=updates["batch_stats"])


def transformer_train_step(state: TrainState, batch, dropout_seed: int = 1,
                           accum_steps: int = 1, micro_sharding=None
                           ) -> Tuple[TrainState, Dict[str, jnp.ndarray]]:
    """One transformer training step.

    batch: encoder_input (B,S,106); decoder_input (B,L) int32 with MSK;
           decoder_true (B,L) int32 target codes.
    Loss is computed at positions where input was MSK but target is real
    (`/root/reference/train3.py:141-151` semantics).
    ``accum_steps > 1`` averages micro-batch gradients into one
    optimizer update — the reference's iters_to_accumulate
    (`/root/reference/train3.py:23,176-178`); at the production 400/400
    dims the per-replica activation footprint scales with the
    micro-batch, so this is also the HBM lever that fits the batch-256
    flagship step on a v5e (see tests/test_tpu_aot_compile.py).
    ``micro_sharding`` (a ``NamedSharding`` over ``P(None, 'data')``)
    must accompany ``accum_steps > 1`` under a mesh: the
    ``(B,...) -> (accum, B/accum, ...)`` reshape does not propagate the
    batch axis's ``'data'`` sharding on its own, and GSPMD silently
    replicates the micro-batch stack — measured as every per-device
    activation carrying the FULL per-replica batch (the accumulation
    then saves no memory at all).
    """
    def micro_grads(params, mb, rng):
        mask = jnp.logical_and(mb["decoder_input"] == 3,
                               mb["decoder_true"] != 0)

        def loss_fn(p):
            outputs = state.apply_fn(
                {"params": p},
                mb["encoder_input"], mb["decoder_input"], True,
                rngs={"dropout": rng},
            )
            metrics = transformer_loss(outputs, mb["decoder_true"], mask)
            return metrics["loss"], metrics

        return jax.grad(loss_fn, has_aux=True)(params)

    base_rng = jax.random.fold_in(jax.random.PRNGKey(dropout_seed),
                                  state.step)
    if accum_steps <= 1:
        grads, metrics = micro_grads(state.params, batch, base_rng)
    else:
        micro = jax.tree_util.tree_map(
            lambda x: x.reshape((accum_steps, x.shape[0] // accum_steps)
                                + x.shape[1:]), batch)
        if micro_sharding is not None:
            micro = jax.lax.with_sharding_constraint(micro, micro_sharding)

        def body(grads_acc, xs):
            mb, i = xs
            g, m = micro_grads(state.params, mb,
                               jax.random.fold_in(base_rng, i))
            grads_acc = jax.tree_util.tree_map(
                lambda a, b: a + b / accum_steps, grads_acc, g)
            return grads_acc, m

        zero = jax.tree_util.tree_map(jnp.zeros_like, state.params)
        grads, stacked = jax.lax.scan(
            body, zero, (micro, jnp.arange(accum_steps)))
        metrics = jax.tree_util.tree_map(lambda m: jnp.mean(m, axis=0),
                                         stacked)
    updates, new_opt = state.tx.update(grads, state.opt_state, state.params)
    new_params = jax.tree_util.tree_map(
        lambda p, u: p + u, state.params, updates)
    new_state = state.replace(step=state.step + 1, params=new_params,
                              opt_state=new_opt)
    return new_state, metrics


def transformer_eval_step(state: TrainState, batch):
    mask = jnp.logical_and(batch["decoder_input"] == 3,
                           batch["decoder_true"] != 0)
    outputs = state.apply_fn({"params": state.eval_params()},
                             batch["encoder_input"], batch["decoder_input"],
                             False)
    return transformer_loss(outputs, batch["decoder_true"], mask)
