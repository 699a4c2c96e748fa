"""Mask-predict loop parity vs the reference TransformerPredictor (torch).

With identical (imported) weights and the same encoder input, the full
iterative decode must produce the same code sequence. Random weights make
per-modulus top-k ties vanishingly unlikely, so tie-breaking differences
don't trigger.
"""
import os
import sys

import numpy as np
import jax
import jax.numpy as jnp
import pytest

torch = pytest.importorskip("torch")

REF = "/root/reference"


@pytest.mark.skipif(not os.path.isdir(REF), reason="reference not mounted")
def test_mask_predict_matches_reference(rng, monkeypatch):
    if REF not in sys.path:
        sys.path.insert(0, REF)
    ref_tf = pytest.importorskip("models.transformer")
    import const as ref_const

    # shrink the reference's global decode length for a fast oracle run
    monkeypatch.setattr(ref_tf, "max_decoderlen", 12, raising=False)

    tiny = dict(enc_input_dim=106, embed_dim=32, head_num=4,
                enc_block_num=2, dec_block_num=2,
                max_enc_seq_len=12, max_dec_seq_len=12, dropout=0.0)
    tmodel = ref_tf.Transformer(**tiny)
    tmodel.eval()
    g = torch.Generator().manual_seed(0)
    with torch.no_grad():
        for p in tmodel.parameters():
            p.copy_(torch.randn(p.shape, generator=g) * 0.1)

    from findtextcenternet_tpu.io.torch_import import import_transformer
    from findtextcenternet_tpu.models import (
        Transformer, TransformerDims, mask_predict)

    sd = {k: v.detach().numpy() for k, v in tmodel.state_dict().items()}
    dims = TransformerDims(**tiny)
    variables = import_transformer(sd, dims)
    jmodel = Transformer(dims)

    enc_in = rng.standard_normal((1, 12, 106)).astype(np.float32) * 2
    enc_in[:, 8:] = 0.0

    predictor = ref_tf.TransformerPredictor(tmodel.encoder, tmodel.decoder)
    predictor.eval()
    with torch.no_grad():
        ref_codes = predictor(torch.from_numpy(enc_in)).numpy()[0]
    # reference pads its decoder input to the global max_decoderlen, which
    # the monkeypatch pins to 12

    codes, probs = mask_predict(jmodel, variables, jnp.asarray(enc_in),
                                max_rounds=8)
    codes = np.asarray(codes)[0]

    np.testing.assert_array_equal(codes[:12], ref_codes[:12])


@pytest.mark.slow
@pytest.mark.skipif(not os.path.isdir(REF), reason="reference not mounted")
def test_mask_predict_matches_reference_full_scale(rng, monkeypatch):
    """Production dims + full 400-token window: the vectorized k^3 CRT
    product search and fixed-shape remask loop reproduce the reference's
    decode exactly, at the scale where near-ties can occur."""
    if REF not in sys.path:
        sys.path.insert(0, REF)
    ref_tf = pytest.importorskip("models.transformer")

    monkeypatch.setattr(ref_tf, "max_decoderlen", 400, raising=False)

    dims = dict(enc_input_dim=106, embed_dim=768, head_num=12,
                enc_block_num=10, dec_block_num=10,
                max_enc_seq_len=400, max_dec_seq_len=400, dropout=0.0)
    tmodel = ref_tf.Transformer(**dims)
    tmodel.eval()
    with torch.no_grad():
        for p in tmodel.parameters():
            p.mul_(0.25)

    from findtextcenternet_tpu.io.torch_import import import_transformer
    from findtextcenternet_tpu.models import (
        Transformer, TransformerDims, mask_predict)

    sd = {k: v.detach().numpy() for k, v in tmodel.state_dict().items()}
    jdims = TransformerDims(**dims)
    variables = import_transformer(sd, jdims)
    jmodel = Transformer(jdims)

    enc_in = rng.standard_normal((1, 400, 106)).astype(np.float32)
    enc_in[:, 350:] = 0.0

    predictor = ref_tf.TransformerPredictor(tmodel.encoder, tmodel.decoder)
    predictor.eval()
    with torch.no_grad():
        ref_codes = predictor(torch.from_numpy(enc_in)).numpy()[0]

    codes, probs = mask_predict(jmodel, variables, jnp.asarray(enc_in),
                                max_rounds=8)
    codes = np.asarray(codes)[0]
    n = min(len(codes), len(ref_codes))
    match = (codes[:n] == ref_codes[:n]).mean()
    assert match == 1.0, f"decode mismatch: {match:.4f} agreement"
