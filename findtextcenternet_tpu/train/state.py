"""Functional training state for the three training stages.

The reference's stateful training oddities (CoV loss running statistics,
schedule-free optimizer train/eval duality, BN recalibration before save —
`/root/reference/train1.py:104-216`) are re-expressed here as a single
immutable pytree updated by pure step functions, checkpointable with orbax.
"""
from __future__ import annotations

from typing import Any, Optional

import jax
import jax.numpy as jnp
import optax
from flax import struct

from ..losses import CoVState, cov_init


@struct.dataclass
class TrainState:
    step: jnp.ndarray
    params: Any
    batch_stats: Any                 # None for the transformer
    opt_state: optax.OptState
    cov: Optional[CoVState]          # None when CoV weighting is off
    tx: optax.GradientTransformation = struct.field(pytree_node=False)
    apply_fn: Any = struct.field(pytree_node=False)

    def eval_params(self):
        """Parameters to use for evaluation / checkpointing.

        Schedule-free optimizers keep the gradient-descent iterate in
        ``params`` and the Polyak average inside the optimizer state; this
        returns the averaged weights (the reference calls
        ``optimizer.eval()`` around every save — `/root/reference/train1.py:203`).
        """
        try:
            return optax.contrib.schedule_free_eval_params(
                self.opt_state, self.params)
        except Exception:
            return self.params


def make_schedule_free_adamw(learning_rate: float, warmup_steps: int = 0,
                             b1: float = 0.9, weight_decay: float = 0.0
                             ) -> optax.GradientTransformation:
    """AdamW wrapped in schedule-free averaging (train1 equivalent)."""
    return optax.contrib.schedule_free_adamw(
        learning_rate=learning_rate,
        warmup_steps=warmup_steps,
        b1=b1,
        weight_decay=weight_decay,
    )


def make_schedule_free_radam(learning_rate: float, warmup_steps: int = 0,
                             b1: float = 0.9
                             ) -> optax.GradientTransformation:
    """RAdam wrapped in schedule-free averaging (train3 equivalent)."""
    base = optax.radam(learning_rate=learning_rate)
    return optax.contrib.schedule_free(base, learning_rate=learning_rate,
                                       b1=b1)


def create_train_state(apply_fn, variables, tx,
                       num_cov_losses: int = 0) -> TrainState:
    params = variables["params"]
    # schedule-free optimizers initialize their z sequence as the params
    # tree, ALIASING the same device buffers; donated train steps
    # (donate_argnums=0) reject a buffer donated twice, so opt_state
    # leaves get their own copies here
    import jax

    opt_state = jax.tree_util.tree_map(
        lambda x: jnp.array(x, copy=True)
        if isinstance(x, jax.Array) else x, tx.init(params))
    return TrainState(
        step=jnp.asarray(0, dtype=jnp.int32),
        params=params,
        batch_stats=variables.get("batch_stats"),
        opt_state=opt_state,
        cov=cov_init(num_cov_losses) if num_cov_losses else None,
        tx=tx,
        apply_fn=apply_fn,
    )
