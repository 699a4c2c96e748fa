"""Integration: the full train1/train3 driver loops on tiny data.

Exercises the real driver code path — factory shards -> loader ->
sharded train step -> BN recalibration -> orbax checkpoint -> resume.
"""
import dataclasses
import glob
import os

import numpy as np
import pytest

from findtextcenternet_tpu.config import Config


@pytest.fixture(scope="module")
def shards(tmp_path_factory):
    from findtextcenternet_tpu.factory import (
        PageGenerator, find_fonts, make_shards)
    fonts = [f for f in find_fonts() if "DejaVuSans.ttf" in f]
    if not fonts:
        pytest.skip("no fonts")
    d = tmp_path_factory.mktemp("shards")
    gen = PageGenerator(fonts, width=300, height=300,
                        charset="ABCDEFG", seed=0)
    return make_shards(str(d / "t%05d.tar"), 6, gen, samples_per_shard=3)


def _tiny_cfg(tmp_path, ckpt_name):
    cfg = Config()
    return dataclasses.replace(
        cfg,
        detector=dataclasses.replace(
            cfg.detector, model_size="tiny", feature_dim=8,
            decoder_mid_dim=32, image_size=(64, 64),
            fmask_topk_per_sample=8),
        transformer=dataclasses.replace(
            cfg.transformer, embed_dim=32, head_num=4, enc_block_num=1,
            dec_block_num=1, max_enc_seq_len=32, max_dec_seq_len=32),
        train=dataclasses.replace(
            cfg.train, batch_size=2, epochs=1, learning_rate=1e-3,
            warmup_steps=2, bn_recalib_batches=1, log_every=2,
            checkpoint_dir=str(tmp_path / ckpt_name)),
    )


@pytest.mark.slow
def test_train1_driver_end_to_end(tmp_path, shards):
    from findtextcenternet_tpu.parallel import make_mesh
    from findtextcenternet_tpu.train import checkpoint as ckpt
    from findtextcenternet_tpu.train.train1 import train

    cfg = _tiny_cfg(tmp_path, "r1")
    mesh = make_mesh(n_data=2, n_model=1)
    state = train(shards, config=cfg, num_workers=1, steps_per_epoch=3,
                  mesh=mesh)
    assert int(state.step) == 3
    latest = ckpt.latest_checkpoint(cfg.train.checkpoint_dir)
    assert latest is not None
    # resume path restores the step counter
    state2 = train(shards, config=dataclasses.replace(
        cfg, train=dataclasses.replace(cfg.train, epochs=0)),
        num_workers=1, steps_per_epoch=3, mesh=mesh)
    assert int(state2.step) == 3
    # metrics log written
    assert os.path.exists(
        os.path.join(cfg.train.checkpoint_dir, "logs", "log.jsonl"))


@pytest.mark.slow
def test_train3_driver_end_to_end(tmp_path):
    from findtextcenternet_tpu.parallel import make_mesh
    from findtextcenternet_tpu.train.train3 import train

    cfg = _tiny_cfg(tmp_path, "r3")
    mesh = make_mesh(n_data=2, n_model=1)
    state = train(config=cfg, steps_per_epoch=2, val_steps=1,
                  synthetic_bank=True, mesh=mesh)
    assert int(state.step) == 2


@pytest.mark.slow
def test_train2_driver_end_to_end(tmp_path, shards):
    import json
    from PIL import Image
    from findtextcenternet_tpu.parallel import make_mesh
    from findtextcenternet_tpu.train.train2 import train as train2

    # synthetic fixdata: one annotated page
    fx = tmp_path / "fixdata"
    fx.mkdir()
    img = np.full((200, 200), 255, np.uint8)
    img[80:120, 40:80] = 0
    Image.fromarray(img).convert("L").save(fx / "page.png")
    with open(fx / "page.json", "w", encoding="utf-8") as f:
        json.dump({"textbox": [
            {"cx": 60, "cy": 100, "w": 40, "h": 40, "text": "A",
             "p_code1": 0, "p_code2": 0, "p_code4": 0, "p_code8": 0},
        ]}, f)

    cfg = _tiny_cfg(tmp_path, "r2")
    mesh = make_mesh(n_data=2, n_model=1)
    state = train2(str(fx), shards=shards, config=cfg, steps_per_epoch=2,
                   num_workers=1, mesh=mesh, decoder_only=False)
    assert int(state.step) == 4  # 2 fix + 2 stream steps


@pytest.mark.slow
def test_train2_init_from_stage1_checkpoint(tmp_path, shards):
    """--init-from a stage-1 run loads weights only: the stage-1
    checkpoint carries schedule-free AdamW opt state, which must not be
    forced into (or crash against) stage-2's RAdam tree."""
    import json
    from PIL import Image
    from findtextcenternet_tpu.parallel import make_mesh
    from findtextcenternet_tpu.train import checkpoint as ckpt
    from findtextcenternet_tpu.train.train1 import build_detector_state
    from findtextcenternet_tpu.train.train2 import train as train2

    cfg = _tiny_cfg(tmp_path, "r2init")
    mesh = make_mesh(n_data=2, n_model=1)
    _, s1 = build_detector_state(cfg, mesh, seed=0)
    stage1_dir = str(tmp_path / "r1")
    ckpt.save_checkpoint(stage1_dir, s1, cfg)

    fx = tmp_path / "fixdata2"
    fx.mkdir()
    img = np.full((200, 200), 255, np.uint8)
    img[80:120, 40:80] = 0
    Image.fromarray(img).convert("L").save(fx / "page.png")
    with open(fx / "page.json", "w", encoding="utf-8") as f:
        json.dump({"textbox": [
            {"cx": 60, "cy": 100, "w": 40, "h": 40, "text": "A",
             "p_code1": 0, "p_code2": 0, "p_code4": 0, "p_code8": 0},
        ]}, f)

    state = train2(str(fx), shards=None, config=cfg, steps_per_epoch=1,
                   num_workers=1, mesh=mesh, decoder_only=False,
                   init_from=stage1_dir)
    assert int(state.step) == 1


@pytest.mark.slow
def test_zero1_opt_state_sharding_equivalence(tmp_path):
    """ZeRO-1 (`TrainConfig.zero1`): sharding the schedule-free z copy
    and Adam/RAdam second moment over the 'data' axis must be a pure
    layout change — the optimizer trajectory is bit-compatible with the
    replicated run. GSPMD turns the update into reduce-scatter(grads)
    -> sharded update -> all-gather(params); numerics are unchanged
    because every elementwise update reads the same values.

    This is the functional gate behind the flagship AOT evidence
    (`test_tpu_aot_compile.py::test_xl_detector_dp_train_step_mesh_aot`):
    replicated xl state reads 16.28 GB/device at 8 chips (> v5e HBM),
    ZeRO-1 fits. Reference anchor: the reference is single-GPU
    (`/root/reference/train3.py`); this layout is new TPU-first design.
    """
    import jax
    import jax.numpy as jnp
    from findtextcenternet_tpu.parallel import make_mesh
    from findtextcenternet_tpu.train.steps import transformer_train_step
    from findtextcenternet_tpu.train.train3 import build_transformer_state

    cfg = _tiny_cfg(tmp_path, "zero1")
    mesh = make_mesh(n_data=8, n_model=1)

    rng = np.random.default_rng(0)
    t = cfg.transformer
    batch = {
        "encoder_input": rng.normal(0, 1, (8, t.max_enc_seq_len, 106)
                                    ).astype(np.float32),
        "decoder_input": rng.integers(0, 9, (8, t.max_dec_seq_len)
                                      ).astype(np.int32),
        "decoder_true": rng.integers(0, 9, (8, t.max_dec_seq_len)
                                     ).astype(np.int32),
    }

    def run(zero1):
        c = dataclasses.replace(
            cfg, train=dataclasses.replace(cfg.train, zero1=zero1))
        _, state = build_transformer_state(c, mesh=mesh, seed=0)
        if zero1:
            z = state.opt_state.z
            leaves = jax.tree_util.tree_leaves(
                jax.tree_util.tree_map(lambda x: x.sharding.spec, z),
                is_leaf=lambda s: True)
            assert any(any(s) for s in leaves), "no z leaf sharded"
        step = jax.jit(lambda s, b: transformer_train_step(s, b))
        from findtextcenternet_tpu.parallel import shard_batch
        b = shard_batch(batch, mesh)
        for _ in range(2):
            state, metrics = step(state, b)
        return state.eval_params(), metrics

    p_rep, m_rep = run(zero1=False)
    p_z1, m_z1 = run(zero1=True)
    assert np.allclose(float(m_rep["loss"]), float(m_z1["loss"]),
                       rtol=1e-5)
    jax.tree_util.tree_map(
        lambda a, b: np.testing.assert_allclose(
            np.asarray(a, np.float32), np.asarray(b, np.float32),
            rtol=2e-5, atol=2e-6), p_rep, p_z1)


def test_attn_impl_auto_resolution(tmp_path):
    """`attn_impl="auto"` (the default) resolves per backend at model
    build: the fused Pallas kernel on TPU, the einsum elsewhere (off-TPU
    Pallas runs in interpret mode). Explicit values pass through
    unchanged. Measured basis for the TPU default: 322.1 -> 229.6
    ms/step at the production train3 load (docs/PERFORMANCE.md)."""
    import jax

    from findtextcenternet_tpu.train.train3 import build_transformer_state

    cfg = _tiny_cfg(tmp_path, "auto")
    assert cfg.transformer.attn_impl == "auto"
    model, _ = build_transformer_state(cfg, seed=0)
    expect = "fused" if jax.default_backend() == "tpu" else "xla"
    assert model.attn_impl == expect

    for impl in ("xla", "fused"):
        c = dataclasses.replace(cfg, transformer=dataclasses.replace(
            cfg.transformer, attn_impl=impl))
        m, _ = build_transformer_state(c, seed=0)
        assert m.attn_impl == impl
