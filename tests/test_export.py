"""StableHLO export round trips: exported graphs reproduce live outputs."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from findtextcenternet_tpu.export import (
    export_transformer_decoder, export_transformer_encoder, load_exported,
)
from findtextcenternet_tpu.models import Transformer, TransformerDims
from findtextcenternet_tpu.models.transformer import make_key_mask

TINY = TransformerDims(enc_input_dim=12, embed_dim=16, head_num=2,
                       enc_block_num=1, dec_block_num=1,
                       max_enc_seq_len=8, max_dec_seq_len=8)


@pytest.fixture(scope="module")
def model_and_vars():
    model = Transformer(TINY)
    variables = model.init(jax.random.PRNGKey(0),
                           jnp.zeros((1, 8, 12)),
                           jnp.zeros((1, 8), jnp.int32))
    return model, variables


def test_encoder_export_roundtrip(tmp_path, model_and_vars, rng):
    model, variables = model_and_vars
    out = export_transformer_encoder(str(tmp_path / "enc"), model, variables)
    call, params, meta = load_exported(out)
    assert meta["kind"] == "transformer_encoder"

    enc_in = jnp.asarray(rng.standard_normal((1, 8, 12)), jnp.float32)
    live = model.apply(variables, enc_in, method=Transformer.encode)
    exported = call(params, enc_in)
    np.testing.assert_allclose(np.asarray(exported), np.asarray(live),
                               rtol=1e-5, atol=1e-5)


def test_decoder_export_roundtrip(tmp_path, model_and_vars, rng):
    model, variables = model_and_vars
    out = export_transformer_decoder(str(tmp_path / "dec"), model, variables)
    call, params, meta = load_exported(out)

    enc_in = jnp.asarray(rng.standard_normal((1, 8, 12)), jnp.float32)
    km = make_key_mask(enc_in)
    enc_out = model.apply(variables, enc_in, method=Transformer.encode)
    dec_in = jnp.asarray(rng.integers(0, 100, (1, 8)), jnp.int32)
    live = model.apply(variables, dec_in, enc_out, km,
                       method=Transformer.decode)
    live = [jax.nn.softmax(o, axis=-1) for o in live]
    exported = call(params, dec_in, enc_out, km.astype(jnp.float32))
    for a, b in zip(exported, live):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-5, atol=1e-5)
