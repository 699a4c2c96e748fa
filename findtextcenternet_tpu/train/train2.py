"""Stage-2 training driver: detector fine-tune on annotated data.

Equivalent of `/root/reference/train2.py`: alternates steps on the
annotated fixdata set and on streamed stage-1 synthetic shards, with
per-source loss weights; RAdam + exponential LR decay; resumes from the
stage-1 checkpoint.

Usage:
    python -m findtextcenternet_tpu.train.train2 \
        --fixdata=train_data2 --shards='data/train*.tar' \
        --init-from=result1 --checkpoint-dir=result2
"""
from __future__ import annotations

import sys


def train(fixdata_dir, shards=(), config=None, init_from=None,
          steps_per_epoch: int = 500, weight_fix: float = 1.0,
          weight_stream: float = 1.0, lr_decay: float = 0.98,
          num_workers: int = 2, decoder_only: bool = False, mesh=None):
    import jax
    import optax

    from ..config import Config
    from ..data.fixdata import FixDataLoader
    from ..data.loader import DetectorLoader
    from ..parallel import make_mesh, shard_batch
    from . import checkpoint as ckpt
    from .metrics import MetricLogger, RunningMetrics
    from .state import create_train_state
    from .steps import detector_train_step
    from .train1 import build_detector_state

    config = config or Config()
    tc = config.train
    mesh = mesh or make_mesh(n_model=1)
    model, state = build_detector_state(config, mesh, tc.seed)

    # stage-2 optimizer: RAdam + exponential decay
    # (`/root/reference/train2.py:110-112`)
    sched = optax.exponential_decay(tc.learning_rate, steps_per_epoch,
                                    lr_decay)
    tx = optax.radam(learning_rate=sched)
    state = create_train_state(
        model.apply,
        {"params": state.params, "batch_stats": state.batch_stats},
        tx, num_cov_losses=9)

    # resuming OUR OWN dir restores the full state (matching RAdam
    # tree); --init-from a stage-1 run loads weights only — the stage-1
    # checkpoint stores schedule-free AdamW opt state, which does not
    # match (and must not seed) the stage-2 RAdam tree. The reference
    # equivalently loads only result1/model.pt's eval'd weights
    # (`/root/reference/train2.py:99-101`).
    own = ckpt.latest_checkpoint(tc.checkpoint_dir)
    if own:
        state = ckpt.restore_checkpoint(own, state)
        print(f"resumed from {own}")
    elif init_from:
        latest = ckpt.latest_checkpoint(init_from)
        if latest:
            eval_params, batch_stats = ckpt.load_eval_params(latest)
            state = state.replace(
                params=eval_params,
                batch_stats=batch_stats
                if batch_stats else state.batch_stats)
            print(f"initialized weights from {latest}")

    fmask_k = config.detector.fmask_topk_per_sample
    # per-source gradient scaling + optional detector freeze, like the
    # reference's weight1/weight2 and decoder_only
    fix_step = jax.jit(lambda s, b: detector_train_step(
        s, b, fmask_k=fmask_k, loss_scale=weight_fix,
        freeze_detector=decoder_only, dropout_seed=tc.seed))
    stream_step = jax.jit(lambda s, b: detector_train_step(
        s, b, fmask_k=fmask_k, loss_scale=weight_stream,
        freeze_detector=decoder_only, dropout_seed=tc.seed))

    out_hw = config.detector.image_size
    fix_it = iter(FixDataLoader(fixdata_dir, tc.batch_size,
                                seed=tc.seed, out_hw=out_hw).batches())
    stream_it = (iter(DetectorLoader(shards, tc.batch_size,
                                     num_workers=num_workers,
                                     seed=tc.seed, out_hw=out_hw))
                 if shards else None)

    logger = MetricLogger(f"{tc.checkpoint_dir}/logs")
    running = RunningMetrics()
    for epoch in range(tc.epochs):
        for _ in range(steps_per_epoch):
            # reference order per iteration: streamed batch (weight1)
            # first, then the ColorJittered fixdata batch (weight2)
            # (`/root/reference/train2.py:180-204`)
            if stream_it is not None:
                state, m = stream_step(state,
                                       shard_batch(next(stream_it), mesh))
                running.update(m)
            state, m = fix_step(state, shard_batch(next(fix_it), mesh))
            running.update(m)
            if int(state.step) % tc.log_every == 0:
                logger.log(int(state.step), running.summary())
                running.reset()
        path = ckpt.save_checkpoint(tc.checkpoint_dir, state, config)
        print(f"epoch {epoch}: saved {path}")
    return state


def main(argv=None):
    import dataclasses as dc
    import glob

    from ..config import Config

    argv = list(sys.argv[1:] if argv is None else argv)
    kw = {}
    cfg = Config()
    cfg = dc.replace(cfg, train=dc.replace(cfg.train,
                                           checkpoint_dir="result2",
                                           learning_rate=1e-4))
    for a in argv:
        if a.startswith("--fixdata="):
            kw["fixdata_dir"] = a.split("=", 1)[1]
        elif a.startswith("--shards="):
            kw["shards"] = sorted(glob.glob(a.split("=", 1)[1]))
        elif a.startswith("--init-from="):
            kw["init_from"] = a.split("=", 1)[1]
        elif a.startswith("--batch-size="):
            cfg = dc.replace(cfg, train=dc.replace(
                cfg.train, batch_size=int(a.split("=", 1)[1])))
        elif a.startswith("--model-size="):
            cfg = dc.replace(cfg, detector=dc.replace(
                cfg.detector, model_size=a.split("=", 1)[1]))
        elif a.startswith("--checkpoint-dir="):
            cfg = dc.replace(cfg, train=dc.replace(
                cfg.train, checkpoint_dir=a.split("=", 1)[1]))
        elif a.startswith("--weight1="):
            kw["weight_stream"] = float(a.split("=", 1)[1])
        elif a.startswith("--weight2="):
            kw["weight_fix"] = float(a.split("=", 1)[1])
        elif a == "--decoder-only":
            kw["decoder_only"] = True
    if "fixdata_dir" not in kw:
        print(__doc__)
        return 1
    train(config=cfg, **kw)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
