"""Checkpoint save/restore via orbax.

Improves on the reference's epoch-granularity ``torch.save`` dicts
(`/root/reference/train1.py:213-216`): full training state (params,
batch stats, optimizer state, CoV statistics, step) is saved atomically,
with the config JSON alongside, so training resumes exactly. The
schedule-free averaged (eval) params are stored separately for inference
consumers, preserving the reference's optimizer.eval()-before-save
semantics (`/root/reference/train1.py:203-211`).
"""
from __future__ import annotations

import os
from typing import Any, Optional

import jax
import numpy as np
import orbax.checkpoint as ocp

from ..config import Config, to_json
from .state import TrainState


def save_checkpoint(ckpt_dir: str, state: TrainState,
                    config: Optional[Config] = None,
                    keep: int = 3) -> str:
    ckpt_dir = os.path.abspath(ckpt_dir)
    os.makedirs(ckpt_dir, exist_ok=True)
    step = int(state.step)
    payload = {
        "step": step,
        "params": jax.device_get(state.params),
        "eval_params": jax.device_get(state.eval_params()),
        "batch_stats": jax.device_get(state.batch_stats)
        if state.batch_stats is not None else {},
        "opt_state": jax.device_get(state.opt_state),
        "cov": jax.device_get(state.cov) if state.cov is not None else {},
    }
    with ocp.StandardCheckpointer() as ckptr:
        path = os.path.join(ckpt_dir, f"step_{step:09d}")
        ckptr.save(path, payload, force=True)
    if config is not None:
        with open(os.path.join(ckpt_dir, "config.json"), "w") as f:
            f.write(to_json(config))
    _prune(ckpt_dir, keep)
    return path


def _prune(ckpt_dir: str, keep: int):
    steps = sorted(d for d in os.listdir(ckpt_dir) if d.startswith("step_"))
    for d in steps[:-keep]:
        import shutil
        shutil.rmtree(os.path.join(ckpt_dir, d), ignore_errors=True)


def latest_checkpoint(ckpt_dir: str) -> Optional[str]:
    if not os.path.isdir(ckpt_dir):
        return None
    steps = sorted(d for d in os.listdir(ckpt_dir) if d.startswith("step_"))
    return os.path.join(ckpt_dir, steps[-1]) if steps else None


def restore_checkpoint(path: str, state: TrainState) -> TrainState:
    """Restore into an initialized state (shapes from state)."""
    template = {
        "step": int(state.step),
        "params": jax.device_get(state.params),
        "eval_params": jax.device_get(state.params),
        "batch_stats": jax.device_get(state.batch_stats)
        if state.batch_stats is not None else {},
        "opt_state": jax.device_get(state.opt_state),
        "cov": jax.device_get(state.cov) if state.cov is not None else {},
    }
    with ocp.StandardCheckpointer() as ckptr:
        restored = ckptr.restore(path, template)
    import jax.numpy as jnp
    return state.replace(
        step=jnp.asarray(restored["step"], dtype=jnp.int32),
        params=restored["params"],
        batch_stats=restored["batch_stats"]
        if state.batch_stats is not None else None,
        opt_state=jax.tree_util.tree_map(
            lambda t, r: r, state.opt_state, restored["opt_state"]),
        cov=restored["cov"] if state.cov is not None else None,
    )


def load_eval_params(path: str) -> Any:
    """Load only the averaged inference params from a checkpoint."""
    with ocp.StandardCheckpointer() as ckptr:
        restored = ckptr.restore(path)
    return restored["eval_params"], restored.get("batch_stats")


def load_variables(path: str) -> dict:
    """Inference-ready flax variables from a checkpoint: the schedule-free
    eval (averaged) params plus BN statistics when present."""
    eval_params, batch_stats = load_eval_params(path)
    out = {"params": eval_params}
    if batch_stats:
        out["batch_stats"] = batch_stats
    return out
