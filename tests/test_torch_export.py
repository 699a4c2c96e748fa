"""flax -> torch export: round-trips through the importer bit-exactly
and loads into the reference torch Transformer strictly."""
import os
import sys

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from findtextcenternet_tpu.io.torch_export import (
    export_detector_sd, export_transformer_sd, save_torch_checkpoint)
from findtextcenternet_tpu.io.torch_import import (
    import_detector, import_transformer)
from findtextcenternet_tpu.models import (
    TextDetectorModel, Transformer, TransformerDims)

REF = "/root/reference"


def _flat(tree, prefix=()):
    for k, v in tree.items():
        if isinstance(v, dict):
            yield from _flat(v, prefix + (k,))
        else:
            yield prefix + (k,), np.asarray(v)


def test_detector_export_import_roundtrip():
    model = TextDetectorModel(model_size="s", feature_dim=16,
                              decoder_mid_dim=64)
    variables = jax.jit(model.init)(
        jax.random.PRNGKey(0), jnp.zeros((1, 64, 64, 3)),
        jnp.zeros((4,), dtype=jnp.int32))
    variables = jax.tree_util.tree_map(np.asarray, dict(variables))

    sd = export_detector_sd(variables, model_size="s")
    back = import_detector(sd, model_size="s")

    a = dict(_flat(variables["params"]))
    b = dict(_flat(back["params"]))
    assert set(a) == set(b)
    for k in a:
        np.testing.assert_array_equal(a[k], b[k], err_msg="/".join(k))
    a = dict(_flat(variables["batch_stats"]))
    b = dict(_flat(back["batch_stats"]))
    for k in a:
        np.testing.assert_array_equal(a[k], b[k], err_msg="/".join(k))


def test_transformer_export_loads_into_reference(tmp_path):
    torch = pytest.importorskip("torch")
    if not os.path.isdir(REF):
        pytest.skip("reference not mounted")
    if REF not in sys.path:
        sys.path.insert(0, REF)
    ref_tf = pytest.importorskip("models.transformer")

    tiny = dict(enc_input_dim=106, embed_dim=32, head_num=4,
                enc_block_num=2, dec_block_num=2,
                max_enc_seq_len=12, max_dec_seq_len=12, dropout=0.0)
    dims = TransformerDims(**tiny)
    jmodel = Transformer(dims)
    variables = jax.jit(jmodel.init)(
        jax.random.PRNGKey(0), jnp.zeros((1, 12, 106)),
        jnp.zeros((1, 12), jnp.int32))
    variables = jax.tree_util.tree_map(np.asarray, dict(variables))

    sd = export_transformer_sd(variables, dims)
    path = save_torch_checkpoint(str(tmp_path / "model3.pt"), sd,
                                 epoch=3, config=tiny)

    ck = torch.load(path, weights_only=True)
    assert ck["epoch"] == 3 and ck["config"] == tiny
    tmodel = ref_tf.Transformer(**tiny)
    tmodel.load_state_dict(ck["model_state_dict"], strict=True)
    tmodel.eval()

    # forward parity through the exported weights
    rng = np.random.default_rng(0)
    enc_in = rng.standard_normal((1, 12, 106)).astype(np.float32)
    dec_in = rng.integers(0, 0x3000, (1, 12)).astype(np.int64)
    with torch.no_grad():
        t_out = tmodel(torch.from_numpy(enc_in), torch.from_numpy(dec_in))
    j_out = jmodel.apply(variables, jnp.asarray(enc_in),
                         jnp.asarray(dec_in.astype(np.int32)))
    for a, b in zip(j_out, t_out):
        np.testing.assert_allclose(np.asarray(a), b.numpy(),
                                   rtol=2e-3, atol=2e-4)


def test_transformer_export_import_roundtrip():
    dims = TransformerDims(enc_input_dim=106, embed_dim=32, head_num=4,
                           enc_block_num=1, dec_block_num=1,
                           max_enc_seq_len=8, max_dec_seq_len=8)
    jmodel = Transformer(dims)
    variables = jax.jit(jmodel.init)(
        jax.random.PRNGKey(1), jnp.zeros((1, 8, 106)),
        jnp.zeros((1, 8), jnp.int32))
    variables = jax.tree_util.tree_map(np.asarray, dict(variables))
    sd = export_transformer_sd(variables, dims)
    back = import_transformer(sd, dims)
    a = dict(_flat(variables["params"]))
    b = dict(_flat(back["params"]))
    assert set(a) == set(b)
    for k in a:
        np.testing.assert_array_equal(a[k], b[k], err_msg="/".join(k))


def test_convert_onnx_step1_from_checkpoint(tmp_path):
    """convert_onnx's .pt export drives from a real orbax checkpoint."""
    import dataclasses
    torch = pytest.importorskip("torch")
    from findtextcenternet_tpu.config import Config
    from findtextcenternet_tpu.export.convert_onnx import (
        export_torch_checkpoints)
    from findtextcenternet_tpu.train import checkpoint as ckpt
    from findtextcenternet_tpu.train.train3 import build_transformer_state

    cfg = Config()
    cfg = dataclasses.replace(
        cfg, transformer=dataclasses.replace(
            cfg.transformer, embed_dim=32, head_num=4, enc_block_num=1,
            dec_block_num=1, max_enc_seq_len=8, max_dec_seq_len=8))
    _, state = build_transformer_state(cfg, mesh=None, seed=0)
    ckpt.save_checkpoint(str(tmp_path / "r3"), state, cfg)

    written = export_torch_checkpoints(
        str(tmp_path / "out"), "xl", None, str(tmp_path / "r3"), cfg=cfg)
    assert "model3.pt" in written
    ck = torch.load(written["model3.pt"], weights_only=True)
    assert "decoder.pos_emb.encoding" in ck["model_state_dict"]
