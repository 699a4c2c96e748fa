"""Training machinery: steps improve loss; checkpoint round trip."""
import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from findtextcenternet_tpu.config import Config
from findtextcenternet_tpu.data.transformer_data import (
    FeatureBank, TransformerDataset,
)
from findtextcenternet_tpu.train import (
    TrainState, create_train_state, detector_bn_recalib_step,
    detector_train_step, make_schedule_free_adamw, make_schedule_free_radam,
    transformer_train_step,
)


def tiny_config():
    cfg = Config()
    return dataclasses.replace(
        cfg,
        detector=dataclasses.replace(
            cfg.detector, model_size="tiny", feature_dim=8,
            decoder_mid_dim=32, image_size=(64, 64),
            fmask_topk_per_sample=8),
        transformer=dataclasses.replace(
            cfg.transformer, embed_dim=32, head_num=4, enc_block_num=1,
            dec_block_num=1, max_enc_seq_len=16, max_dec_seq_len=16),
        train=dataclasses.replace(
            cfg.train, batch_size=2, learning_rate=1e-3, warmup_steps=2),
    )


@pytest.mark.slow
def test_detector_train_step_reduces_loss():
    from findtextcenternet_tpu.train.train1 import build_detector_state
    cfg = tiny_config()
    model, state = build_detector_state(cfg, mesh=None, seed=0)

    rng = np.random.default_rng(0)
    batch = {
        "image": jnp.asarray(rng.uniform(0, 1, (2, 64, 64, 3)), jnp.float32),
        "labelmap": jnp.asarray(
            rng.uniform(0, 1, (2, 16, 16, 5)), jnp.float32),
        "idmap": jnp.asarray(rng.integers(0, 100, (2, 16, 16, 2)),
                             jnp.int32),
    }
    step = jax.jit(lambda s, b: detector_train_step(s, b, fmask_k=8))
    losses = []
    for _ in range(5):
        state, metrics = step(state, batch)
        losses.append(float(metrics["loss"]))
    assert losses[-1] < losses[0]
    assert int(state.step) == 5

    # BN recalibration mutates batch_stats only
    old_params = state.params
    state2 = jax.jit(
        lambda s, b: detector_bn_recalib_step(s, b, fmask_k=8))(state, batch)
    assert state2.params is old_params or jax.tree_util.tree_all(
        jax.tree_util.tree_map(
            lambda a, b: np.array_equal(np.asarray(a), np.asarray(b)),
            state2.params, old_params))


def test_transformer_train_step_reduces_loss():
    from findtextcenternet_tpu.train.train3 import build_transformer_state
    cfg = tiny_config()
    model, state = build_transformer_state(cfg, mesh=None, seed=0)

    bank = FeatureBank.synthetic([ord("あ"), ord("い")], seed=0)
    ds = TransformerDataset(bank, noise_ratio=0.1, seed=0)
    # fixed batch to verify optimization progress
    raw = next(ds.batches(2))
    batch = {
        "encoder_input": jnp.asarray(raw["encoder_input"][:, :16]),
        "decoder_input": jnp.asarray(raw["decoder_input"][:, :16]),
        "decoder_true": jnp.asarray(raw["decoder_true"][:, :16]),
    }
    step = jax.jit(transformer_train_step)
    losses = []
    for _ in range(8):
        state, metrics = step(state, batch)
        losses.append(float(metrics["loss"]))
    assert losses[-1] < losses[0]


def test_transformer_train_step_accum_equivalence():
    """accum_steps=2 on a batch of two identical samples produces the
    same optimizer update as the single full-batch step (each
    micro-gradient equals the full-batch gradient, so their average is
    too; dropout is 0.0 in the production config, so the per-micro RNG
    fold is inert)."""
    from findtextcenternet_tpu.train.train3 import build_transformer_state
    cfg = tiny_config()
    model, state = build_transformer_state(cfg, mesh=None, seed=0)

    bank = FeatureBank.synthetic([ord("あ"), ord("い")], seed=0)
    ds = TransformerDataset(bank, noise_ratio=0.1, seed=0)
    raw = next(ds.batches(1))
    batch = {
        k: jnp.asarray(np.repeat(raw[k][:, :16], 2, axis=0))
        for k in ("encoder_input", "decoder_input", "decoder_true")
    }
    s1, m1 = jax.jit(transformer_train_step)(state, batch)
    s2, m2 = jax.jit(
        lambda s, b: transformer_train_step(s, b, accum_steps=2))(
        state, batch)
    np.testing.assert_allclose(float(m1["loss"]), float(m2["loss"]),
                               rtol=1e-5)
    jax.tree_util.tree_map(
        lambda a, b: np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), rtol=2e-4, atol=1e-6),
        s1.params, s2.params)


def test_checkpoint_roundtrip(tmp_path):
    from findtextcenternet_tpu.train import checkpoint as ckpt
    from findtextcenternet_tpu.train.train3 import build_transformer_state
    cfg = tiny_config()
    _, state = build_transformer_state(cfg, mesh=None, seed=0)
    state = state.replace(step=jnp.asarray(42, jnp.int32))

    path = ckpt.save_checkpoint(str(tmp_path / "ck"), state, cfg)
    assert ckpt.latest_checkpoint(str(tmp_path / "ck")) == path

    _, fresh = build_transformer_state(cfg, mesh=None, seed=1)
    restored = ckpt.restore_checkpoint(path, fresh)
    assert int(restored.step) == 42
    a = jax.tree_util.tree_leaves(state.params)[0]
    b = jax.tree_util.tree_leaves(restored.params)[0]
    np.testing.assert_array_equal(np.asarray(a), np.asarray(b))

    eval_params, _ = ckpt.load_eval_params(path)
    assert eval_params is not None


def test_loss_scale_scales_gradient_updates():
    """stage-2 per-source weights: scale 0 must freeze params entirely,
    and a scaled step must differ from the unscaled one
    (`/root/reference/train2.py:186-204` semantics)."""
    from findtextcenternet_tpu.train.train1 import build_detector_state
    cfg = tiny_config()
    _, state = build_detector_state(cfg, mesh=None, seed=0)

    rng = np.random.default_rng(0)
    batch = {
        "image": jnp.asarray(rng.uniform(0, 1, (2, 64, 64, 3)), jnp.float32),
        "labelmap": jnp.asarray(
            rng.uniform(0, 1, (2, 16, 16, 5)), jnp.float32),
        "idmap": jnp.asarray(rng.integers(0, 100, (2, 16, 16, 2)),
                             jnp.int32),
    }
    step = jax.jit(lambda s, b, w: detector_train_step(
        s, b, fmask_k=8, loss_scale=w), static_argnums=2)
    # several steps so the warmup LR is nonzero
    s0 = s1 = state
    for _ in range(4):
        s0, _ = step(s0, batch, 0.0)
        s1, _ = step(s1, batch, 1.0)

    def flat(tree):
        return np.concatenate([np.asarray(x).ravel()
                               for x in jax.tree_util.tree_leaves(tree)])

    base = flat(state.params)
    d_zero = np.abs(flat(s0.params) - base).max()
    d_one = np.abs(flat(s1.params) - base).max()
    # scale 0: only decoupled weight decay moves params (float noise);
    # scale 1: a real gradient step
    assert d_zero < 1e-5
    assert d_one > 100 * max(d_zero, 1e-12)


def test_midepoch_checkpointing(tmp_path):
    """checkpoint_every_steps writes resumable mid-epoch checkpoints."""
    from findtextcenternet_tpu.train import checkpoint as ckpt
    from findtextcenternet_tpu.train.train1 import build_detector_state
    cfg = tiny_config()
    cfg = dataclasses.replace(
        cfg, train=dataclasses.replace(
            cfg.train, checkpoint_every_steps=2,
            checkpoint_dir=str(tmp_path / "ck")))
    _, state = build_detector_state(cfg, mesh=None, seed=0)
    # simulate the driver's mid-epoch save points
    for step in (1, 2, 3, 4):
        state = state.replace(step=jnp.asarray(step, jnp.int32))
        if step % cfg.train.checkpoint_every_steps == 0:
            ckpt.save_checkpoint(cfg.train.checkpoint_dir, state, cfg)
    latest = ckpt.latest_checkpoint(cfg.train.checkpoint_dir)
    assert latest is not None and latest.endswith("step_000000004")
    restored = ckpt.restore_checkpoint(latest, state)
    assert int(restored.step) == 4
