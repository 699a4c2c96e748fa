"""Stage-3 training driver: the text transformer.

Equivalent of `/root/reference/train3.py` on TPU: pjit data-parallel,
schedule-free RAdam, the feature-noise curriculum (noise 1.0 until val
loss < 2.0, then x0.9 per epoch), per-epoch sample decode logging, orbax
checkpointing.

Usage:
    python -m findtextcenternet_tpu.train.train3 \
        --features=train_data3/features.npz --texts='train_data3/*/*.txt' \
        --batch-size=256 --steps-per-epoch=1000 --checkpoint-dir=result3
"""
from __future__ import annotations

import sys


def build_transformer_state(config, mesh=None, seed: int = 0,
                            shard_tp: bool = False):
    import jax
    import jax.numpy as jnp

    from ..models import Transformer, TransformerDims
    from .state import create_train_state, make_schedule_free_radam

    t = config.transformer
    dims = TransformerDims(
        enc_input_dim=t.enc_input_dim, embed_dim=t.embed_dim,
        head_num=t.head_num, enc_block_num=t.enc_block_num,
        dec_block_num=t.dec_block_num, max_enc_seq_len=t.max_enc_seq_len,
        max_dec_seq_len=t.max_dec_seq_len, dropout=t.dropout)
    impl = t.attn_impl
    if impl == "auto":
        # fused wins the train step on the chip (229.6 vs 322.1 ms at
        # batch 32 — docs/PERFORMANCE.md); off-TPU the Pallas kernel
        # would run in interpret mode, so auto keeps the einsum there.
        # The module itself re-guards on dropout/shape support.
        impl = "fused" if jax.default_backend() == "tpu" else "xla"
    model = Transformer(dims, attn_impl=impl)
    enc = jnp.zeros((1, dims.max_enc_seq_len, dims.enc_input_dim))
    dec = jnp.zeros((1, dims.max_dec_seq_len), jnp.int32)
    variables = jax.jit(model.init)(jax.random.PRNGKey(seed), enc, dec)
    tx = make_schedule_free_radam(config.train.learning_rate)
    if mesh is not None:
        if shard_tp:
            from ..parallel import shard_params
            variables = {"params": shard_params(variables["params"], mesh)}
        else:
            from jax.sharding import NamedSharding, PartitionSpec as P
            variables = jax.tree_util.tree_map(
                lambda x: jax.device_put(x, NamedSharding(mesh, P())),
                variables)
    state = create_train_state(model.apply, variables, tx)
    if mesh is not None and config.train.zero1:
        from ..parallel import state_shardings
        sh = state_shardings(state, mesh, zero1=True)
        state = jax.tree_util.tree_map(jax.device_put, state, sh)
    return model, state


def train(features_npz=None, text_files=(), config=None,
          steps_per_epoch: int = 1000, val_steps: int = 20,
          resume: bool = True, synthetic_bank: bool = False, mesh=None,
          realdata_dir=None, train_noise_ratio: float = 1.0, bank=None):
    import jax
    import numpy as np

    from ..config import Config
    from ..data.transformer_data import (
        FeatureBank, TransformerDataset, load_realdata_dir)
    from ..models.transformer import mask_predict
    from ..parallel import make_mesh, shard_batch
    from ..utils.text import codes_to_text
    from . import checkpoint as ckpt
    from .metrics import MetricLogger, RunningMetrics
    from ..utils.profiling import StepTimer
    from .steps import transformer_eval_step, transformer_train_step

    config = config or Config()
    tc = config.train
    mesh = mesh or make_mesh(n_model=1)
    model, state = build_transformer_state(config, mesh, tc.seed)

    if resume:
        latest = ckpt.latest_checkpoint(tc.checkpoint_dir)
        if latest:
            state = ckpt.restore_checkpoint(latest, state)
            print(f"resumed from {latest} at step {int(state.step)}")

    if bank is not None:
        pass                      # caller-supplied FeatureBank
    elif synthetic_bank or not features_npz:
        bank = FeatureBank.synthetic(
            list(range(0x3041, 0x3097)) + list(range(0x4E00, 0x4F00)),
            seed=tc.seed)
    else:
        bank = FeatureBank.load(features_npz)

    enc_len = config.transformer.max_enc_seq_len
    dec_len = config.transformer.max_dec_seq_len
    # train_data4 replay: human-corrected real pages, weighted x100 like
    # the reference (`/root/reference/dataset/data_transformer.py:303,430`)
    real = load_realdata_dir(realdata_dir) if realdata_dir else []
    if real:
        print(f"realdata: {len(real)} corrected pages from "
              f"{realdata_dir} (x100 replay weight)")
    # reference curriculum starts at noise 1.0 (`train3.py:153-156`);
    # synthetic-bank gates (trained_margin_check) start lower — random
    # text has no LM prior, so val loss never crosses the 2.0 curriculum
    # trigger under full noise and training stalls
    train_ds = TransformerDataset(bank, text_files, real_data=real,
                                  noise_ratio=train_noise_ratio,
                                  seed=tc.seed, enc_len=enc_len,
                                  dec_len=dec_len)
    val_ds = TransformerDataset(bank, text_files, noise_ratio=0.0,
                                seed=tc.seed + 99, enc_len=enc_len,
                                dec_len=dec_len)

    micro_sh = None
    if mesh is not None and tc.accum_steps > 1:
        from jax.sharding import NamedSharding, PartitionSpec as P
        micro_sh = NamedSharding(mesh, P(None, "data"))
    train_step = jax.jit(
        lambda s, b: transformer_train_step(
            s, b, dropout_seed=tc.seed, accum_steps=tc.accum_steps,
            micro_sharding=micro_sh))
    eval_step = jax.jit(transformer_eval_step)
    # one jitted decode for the whole run — a fresh lambda per epoch
    # would miss the jit cache and re-trace the mask-predict loop
    sample_decode = jax.jit(lambda p, e: mask_predict(model, p, e))

    logger = MetricLogger(f"{tc.checkpoint_dir}/logs")
    running = RunningMetrics()
    timer = StepTimer()
    it = train_ds.batches(tc.batch_size)
    vit = val_ds.batches(tc.batch_size)

    curriculum_started = False
    start_epoch = int(state.step) // steps_per_epoch
    for epoch in range(start_epoch, tc.epochs):
        for _ in range(steps_per_epoch):
            batch = {k: v for k, v in next(it).items()}
            state, metrics = train_step(state, shard_batch(batch, mesh))
            running.update(metrics)
            timer.tick()
            if int(state.step) % tc.log_every == 0:
                logger.log(int(state.step),
                           running.summary() | timer.summary())
                running.reset()

        path = ckpt.save_checkpoint(tc.checkpoint_dir, state, config)
        print(f"epoch {epoch}: saved {path}")

        vrun = RunningMetrics()
        for _ in range(val_steps):
            vrun.update(eval_step(state, shard_batch(next(vit), mesh)))
        vs = vrun.summary()
        logger.log(int(state.step), vs, prefix="val")

        # noise curriculum (`/root/reference/train3.py:153-156,265-266`)
        if not curriculum_started and vs.get("loss", 1e9) < 2.0:
            curriculum_started = True
        if curriculum_started:
            train_ds.noise_ratio *= 0.9
            print(f"noise_ratio -> {train_ds.noise_ratio:.4f}")

        # sample decode for qualitative tracking
        item = val_ds.sample()
        codes, _ = sample_decode({"params": state.eval_params()},
                                 item["encoder_input"][None])
        pred = codes_to_text(np.asarray(codes)[0])
        logger.log_text(int(state.step), "sample",
                        f"true: {item['text']!r}\npred: {pred!r}")
        print(f"true: {item['text'][:60]!r}\npred: {pred[:60]!r}")
    return state


def main(argv=None):
    import dataclasses as dc
    import glob

    from ..config import Config

    argv = list(sys.argv[1:] if argv is None else argv)
    kw = {}
    cfg = Config()
    for a in argv:
        if a.startswith("--features="):
            kw["features_npz"] = a.split("=", 1)[1]
        elif a.startswith("--texts="):
            kw["text_files"] = sorted(glob.glob(a.split("=", 1)[1]))
        elif a.startswith("--realdata-dir="):
            kw["realdata_dir"] = a.split("=", 1)[1]
        elif a == "--synthetic-bank":
            kw["synthetic_bank"] = True
        elif a.startswith("--batch-size="):
            cfg = dc.replace(cfg, train=dc.replace(
                cfg.train, batch_size=int(a.split("=", 1)[1])))
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
        elif a.startswith("--attn-impl="):
            cfg = dc.replace(cfg, transformer=dc.replace(
                cfg.transformer, attn_impl=a.split("=", 1)[1]))
        elif a.startswith("--accum="):
            cfg = dc.replace(cfg, train=dc.replace(
                cfg.train, accum_steps=int(a.split("=", 1)[1])))
    train(config=cfg, **kw)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
