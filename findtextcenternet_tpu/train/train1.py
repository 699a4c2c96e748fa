"""Stage-1 training driver: detector + CRT auxiliary decoder.

Equivalent of `/root/reference/train1.py` redesigned for TPU: pjit
data-parallel over a device mesh, bf16 compute, CoV loss weighting as
functional state, schedule-free AdamW, BN recalibration before every
checkpoint, orbax checkpointing, TensorBoard/JSONL metrics.

Usage:
    python -m findtextcenternet_tpu.train.train1 \
        --shards='data/train*.tar' --val-shards='data/test*.tar' \
        --batch-size=32 --model-size=xl --epochs=40 \
        --steps-per-epoch=1000 --checkpoint-dir=result1
"""
from __future__ import annotations

import sys


def build_detector_state(config, mesh=None, seed: int = 0):
    import jax
    import jax.numpy as jnp

    from ..models import TextDetectorModel
    from .state import create_train_state, make_schedule_free_adamw

    det = config.detector
    model = TextDetectorModel(model_size=det.model_size,
                              feature_dim=det.feature_dim,
                              decoder_mid_dim=det.decoder_mid_dim,
                              remat=getattr(det, "remat", False),
                              head_conv_dim=getattr(det, "head_conv_dim",
                                                    192),
                              dtype=jnp.bfloat16)
    h, w = det.image_size
    img = jnp.zeros((1, h, w, 3), jnp.float32)
    fidx = jnp.zeros((det.fmask_topk_per_sample,), jnp.int32)
    variables = jax.jit(model.init)(jax.random.PRNGKey(seed), img, fidx)
    tx = make_schedule_free_adamw(
        config.train.learning_rate, warmup_steps=config.train.warmup_steps,
        weight_decay=config.train.weight_decay)
    state = create_train_state(model.apply, variables, tx, num_cov_losses=9)
    if mesh is not None:
        from ..parallel import state_shardings
        sh = state_shardings(state, mesh, zero1=config.train.zero1)
        state = jax.tree_util.tree_map(jax.device_put, state, sh)
    return model, state


def train(shards, val_shards=None, config=None, num_workers: int = 4,
          steps_per_epoch: int = 1000, val_steps: int = 50,
          resume: bool = True, mesh=None):
    import jax

    from ..config import Config
    from ..data.loader import DetectorLoader
    from ..parallel import make_mesh, shard_batch
    from . import checkpoint as ckpt
    from .metrics import MetricLogger, RunningMetrics
    from ..utils.profiling import StepTimer
    from .steps import (detector_bn_recalib_step, detector_eval_step,
                        detector_train_step)

    config = config or Config()
    tc = config.train
    mesh = mesh or make_mesh(n_model=1)
    model, state = build_detector_state(config, mesh, tc.seed)

    if resume:
        latest = ckpt.latest_checkpoint(tc.checkpoint_dir)
        if latest:
            state = ckpt.restore_checkpoint(latest, state)
            print(f"resumed from {latest} at step {int(state.step)}")

    fmask_k = config.detector.fmask_topk_per_sample
    micro_sh = None
    if mesh is not None and tc.accum_steps > 1:
        from jax.sharding import NamedSharding, PartitionSpec as P
        micro_sh = NamedSharding(mesh, P(None, "data"))
    train_step = jax.jit(
        lambda s, b: detector_train_step(
            s, b, fmask_k=fmask_k, accum_steps=tc.accum_steps,
            dropout_seed=tc.seed, micro_sharding=micro_sh))
    eval_step = jax.jit(
        lambda s, b: detector_eval_step(s, b, fmask_k=fmask_k))
    recalib_step = jax.jit(
        lambda s, b: detector_bn_recalib_step(s, b, fmask_k=fmask_k))

    out_hw = config.detector.image_size
    loader = DetectorLoader(shards, tc.batch_size, num_workers=num_workers,
                            seed=tc.seed, out_hw=out_hw)
    val_loader = (DetectorLoader(val_shards, tc.batch_size,
                                 num_workers=max(1, num_workers // 2),
                                 seed=tc.seed + 7, out_hw=out_hw)
                  if val_shards else None)

    logger = MetricLogger(f"{tc.checkpoint_dir}/logs")
    running = RunningMetrics()
    timer = StepTimer()
    it = iter(loader)
    start_epoch = int(state.step) // steps_per_epoch
    for epoch in range(start_epoch, tc.epochs):
        for _ in range(steps_per_epoch):
            batch = shard_batch(next(it), mesh)
            state, metrics = train_step(state, batch)
            running.update({k: v for k, v in metrics.items()})
            timer.tick()
            if int(state.step) % tc.log_every == 0:
                logger.log(int(state.step),
                           running.summary() | timer.summary())
                running.reset()
            if tc.checkpoint_every_steps and \
                    int(state.step) % tc.checkpoint_every_steps == 0:
                # preemption-safe mid-epoch save (resume restores the
                # exact step; BN recalibration still runs at epoch end)
                ckpt.save_checkpoint(tc.checkpoint_dir, state, config)

        # BN recalibration with averaged params before checkpointing
        for _ in range(tc.bn_recalib_batches):
            state = recalib_step(state, shard_batch(next(it), mesh))
        path = ckpt.save_checkpoint(tc.checkpoint_dir, state, config)
        print(f"epoch {epoch}: saved {path}")

        if val_loader is not None:
            vrun = RunningMetrics()
            vit = iter(val_loader)
            for _ in range(val_steps):
                vrun.update(eval_step(state, shard_batch(next(vit), mesh)))
            logger.log(int(state.step), vrun.summary(), prefix="val")
    return state


def main(argv=None):
    import dataclasses as dc
    import glob

    from ..config import Config

    argv = list(sys.argv[1:] if argv is None else argv)
    kw = {}
    cfg = Config()
    for a in argv:
        if a.startswith("--shards="):
            kw["shards"] = sorted(glob.glob(a.split("=", 1)[1]))
        elif a.startswith("--val-shards="):
            kw["val_shards"] = sorted(glob.glob(a.split("=", 1)[1]))
        elif a.startswith("--batch-size="):
            cfg = dc.replace(cfg, train=dc.replace(
                cfg.train, batch_size=int(a.split("=", 1)[1])))
        elif a.startswith("--model-size="):
            cfg = dc.replace(cfg, detector=dc.replace(
                cfg.detector, model_size=a.split("=", 1)[1]))
        elif a.startswith("--epochs="):
            cfg = dc.replace(cfg, train=dc.replace(
                cfg.train, epochs=int(a.split("=", 1)[1])))
        elif a.startswith("--lr="):
            cfg = dc.replace(cfg, train=dc.replace(
                cfg.train, learning_rate=float(a.split("=", 1)[1])))
        elif a.startswith("--checkpoint-dir="):
            cfg = dc.replace(cfg, train=dc.replace(
                cfg.train, checkpoint_dir=a.split("=", 1)[1]))
        elif a.startswith("--steps-per-epoch="):
            kw["steps_per_epoch"] = int(a.split("=", 1)[1])
        elif a.startswith("--num-workers="):
            kw["num_workers"] = int(a.split("=", 1)[1])
    if "shards" not in kw or not kw["shards"]:
        print(__doc__)
        return 1
    train(config=cfg, **kw)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
