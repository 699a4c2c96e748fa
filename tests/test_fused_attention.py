"""Fused (Pallas) attention vs the einsum composition.

The kernel must reproduce ``MultiheadAttn.attend``'s math exactly
(modulo f32 reduction order): same scaling, same additive key mask,
same softmax semantics — so ``attn_impl='fused'`` is a pure layout
optimization of the inference decode, not a numerics change.
"""
import numpy as np
import pytest

jax = pytest.importorskip("jax")
import jax.numpy as jnp  # noqa: E402

from findtextcenternet_tpu.models.transformer import (  # noqa: E402
    Transformer, TransformerDims, make_key_mask, mask_predict,
)
from findtextcenternet_tpu.ops.attention import (  # noqa: E402
    fused_attention, supported,
)


def _einsum_attention(q, k, v, key_mask=None):
    hd = q.shape[-1]
    logits = jnp.einsum("bqhd,bkhd->bhqk", q, k,
                        preferred_element_type=jnp.float32)
    logits = logits / jnp.sqrt(jnp.asarray(hd, dtype=logits.dtype))
    if key_mask is not None:
        logits = logits + key_mask.astype(logits.dtype)
    attn = jax.nn.softmax(logits, axis=-1).astype(v.dtype)
    return jnp.einsum("bhqk,bkhd->bqhd", attn, v,
                      preferred_element_type=jnp.float32).astype(v.dtype)


@pytest.mark.parametrize("tq,tk", [(16, 16), (48, 32)])
def test_matches_einsum(tq, tk):
    rng = np.random.default_rng(0)
    b, h, hd = 3, 4, 16
    q = jnp.asarray(rng.standard_normal((b, tq, h, hd)), jnp.float32)
    k = jnp.asarray(rng.standard_normal((b, tk, h, hd)), jnp.float32)
    v = jnp.asarray(rng.standard_normal((b, tk, h, hd)), jnp.float32)
    got = fused_attention(q, k, v)
    want = _einsum_attention(q, k, v)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=1e-5, atol=1e-5)


def test_key_mask_matches_einsum():
    rng = np.random.default_rng(1)
    b, t, h, hd = 2, 24, 4, 16
    q = jnp.asarray(rng.standard_normal((b, t, h, hd)), jnp.float32)
    k = jnp.asarray(rng.standard_normal((b, t, h, hd)), jnp.float32)
    v = jnp.asarray(rng.standard_normal((b, t, h, hd)), jnp.float32)
    # mask the tail keys of each row, like make_key_mask on padded input
    mask = jnp.where(
        jnp.arange(t)[None, :] >= jnp.asarray([[20], [8]]),
        -jnp.inf, 0.0)[:, None, None, :]
    got = fused_attention(q, k, v, key_mask=mask)
    want = _einsum_attention(q, k, v, key_mask=mask)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=1e-5, atol=1e-5)


def test_all_masked_rows_stay_nan():
    """A fully-masked key set must produce NaN exactly like the XLA
    path (such rows belong to copied padding windows and are dropped
    downstream — silently zeroing them would hide bucket-packing bugs).
    """
    b, t, h, hd = 1, 16, 2, 8
    q = jnp.ones((b, t, h, hd), jnp.float32)
    k = jnp.ones((b, t, h, hd), jnp.float32)
    v = jnp.ones((b, t, h, hd), jnp.float32)
    mask = jnp.full((b, 1, 1, t), -jnp.inf)
    got = np.asarray(fused_attention(q, k, v, key_mask=mask))
    want = np.asarray(_einsum_attention(q, k, v, key_mask=mask))
    assert np.isnan(got).all() and np.isnan(want).all()


def test_supported_bounds():
    assert supported(400, 400, 64)
    assert not supported(4096, 4096, 64)      # score tile over VMEM budget
    assert not supported(100, 400, 64)        # sublane misalignment


def test_mask_predict_parity_between_impls():
    """End-to-end: mask_predict with attn_impl='fused' decodes the same
    codes as 'xla' on random weights (tolerance-level logits -> after
    CRT top-k combine the argmax agrees away from exact ties)."""
    dims = TransformerDims(enc_input_dim=20, embed_dim=32, head_num=4,
                           enc_block_num=2, dec_block_num=2,
                           max_enc_seq_len=16, max_dec_seq_len=16)
    rng = np.random.default_rng(2)
    enc_in = jnp.asarray(rng.standard_normal((2, 16, 20)), jnp.float32)
    enc_in = enc_in.at[1, 8:].set(0.0)       # padded tail rows
    base = Transformer(dims)
    params = base.init(jax.random.PRNGKey(0),
                       jnp.zeros((1, 16, 20)),
                       jnp.zeros((1, 16), jnp.int32))
    fused = Transformer(dims, attn_impl="fused")
    c0, p0 = mask_predict(base, params, enc_in, max_rounds=3)
    c1, p1 = mask_predict(fused, params, enc_in, max_rounds=3)
    np.testing.assert_array_equal(np.asarray(c0), np.asarray(c1))
    np.testing.assert_allclose(np.asarray(p0), np.asarray(p1),
                               rtol=1e-4, atol=1e-5)


def test_topk_descending_impls_bit_identical():
    """'argmax' must reproduce jax.lax.top_k exactly — values, indices,
    tie order (lower index first) — including tie-heavy inputs."""
    from findtextcenternet_tpu.models.transformer import topk_descending
    rng = np.random.default_rng(5)
    for trial in range(4):
        p = rng.random((3, 9, 257)).astype(np.float32)
        if trial >= 2:
            p = np.round(p * 4) / 4          # force many exact ties
        sv, si = topk_descending(jnp.asarray(p), 3, impl="sort")
        av, ai = topk_descending(jnp.asarray(p), 3, impl="argmax")
        np.testing.assert_array_equal(np.asarray(sv), np.asarray(av))
        np.testing.assert_array_equal(np.asarray(si), np.asarray(ai))


def test_train_bench_transformer_tiny_smoke(capsys):
    """train_bench --transformer runs both attention impls on CPU and
    produces the same first-step loss (fused custom VJP consistency at
    the train-step level)."""
    import json
    from findtextcenternet_tpu.tools import train_bench
    losses = {}
    for impl in ("xla", "fused"):
        train_bench.main(["--transformer", "--tiny", "--batch", "2",
                          "--iters", "1", "--attn-impl", impl])
        out = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
        losses[impl] = out["loss"]
    np.testing.assert_allclose(losses["xla"], losses["fused"],
                               rtol=1e-5, atol=1e-6)


def test_decode_bench_tiny_smoke(capsys):
    """The measurement tool itself keeps running on CPU (tiny config)."""
    from findtextcenternet_tpu.tools import decode_bench
    decode_bench.main(["--tiny", "--batch", "2", "--rounds", "2",
                       "--iters", "1"])
    import json
    out = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert out["topk3_impls_agree"]
    assert out["f32_fused_attn_codes_agree"]


def _train_grads(dims, attn_impl, enc_in, dec_in, params):
    model = Transformer(dims, attn_impl=attn_impl)

    def loss(p):
        outs = model.apply(p, enc_in, dec_in, train=True,
                           rngs={"dropout": jax.random.PRNGKey(7)})
        return sum(jnp.sum(o) for o in outs)

    return jax.grad(loss)(params)


def test_train_grads_match_fused_custom_vjp():
    """With zero attention dropout (the reference's training config)
    the fused path serves training too: custom-VJP gradients must match
    the einsum autodiff within float tolerance."""
    dims = TransformerDims(enc_input_dim=12, embed_dim=16, head_num=2,
                           enc_block_num=1, dec_block_num=1,
                           max_enc_seq_len=16, max_dec_seq_len=16)
    rng = np.random.default_rng(3)
    enc_in = jnp.asarray(rng.standard_normal((1, 16, 12)), jnp.float32)
    dec_in = jnp.zeros((1, 16), jnp.int32)
    params = Transformer(dims).init(jax.random.PRNGKey(0), enc_in, dec_in)
    g0 = _train_grads(dims, "xla", enc_in, dec_in, params)
    g1 = _train_grads(dims, "fused", enc_in, dec_in, params)
    # sum-loss amplifies f32 reassociation through the layernorm chain:
    # observed worst |diff| ~1.5e-4 on ~27-magnitude grads (rel ~1e-5);
    # the tight op-level check lives in
    # test_fused_core_grads_match_einsum_directly
    jax.tree_util.tree_map(
        lambda a, b: np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), rtol=1e-3, atol=1e-3), g0, g1)


def test_train_dropout_keeps_einsum_path():
    """Non-zero attention dropout must fall back to the einsum path —
    gradients bit-identical to the base module under the same RNG."""
    dims = TransformerDims(enc_input_dim=12, embed_dim=16, head_num=2,
                           enc_block_num=1, dec_block_num=1,
                           max_enc_seq_len=16, max_dec_seq_len=16,
                           dropout=0.1)
    rng = np.random.default_rng(4)
    enc_in = jnp.asarray(rng.standard_normal((1, 16, 12)), jnp.float32)
    dec_in = jnp.zeros((1, 16), jnp.int32)
    params = Transformer(dims).init(jax.random.PRNGKey(0), enc_in, dec_in)
    g0 = _train_grads(dims, "xla", enc_in, dec_in, params)
    g1 = _train_grads(dims, "fused", enc_in, dec_in, params)
    jax.tree_util.tree_map(
        lambda a, b: np.testing.assert_array_equal(
            np.asarray(a), np.asarray(b)), g0, g1)


def test_fused_core_grads_match_einsum_directly():
    """Op-level VJP check: d/d{q,k,v} of a scalar loss through
    fused_attention equals autodiff through the einsum composition."""
    rng = np.random.default_rng(6)
    b, tq, tk, h, hd = 2, 16, 24, 2, 8
    q = jnp.asarray(rng.standard_normal((b, tq, h, hd)), jnp.float32)
    k = jnp.asarray(rng.standard_normal((b, tk, h, hd)), jnp.float32)
    v = jnp.asarray(rng.standard_normal((b, tk, h, hd)), jnp.float32)
    mask = jnp.where(jnp.arange(tk)[None, :] >= 20, -jnp.inf,
                     0.0)[:, None, None, :]
    mask = jnp.broadcast_to(mask, (b, 1, 1, tk))
    w = jnp.asarray(rng.standard_normal((b, tq, h, hd)), jnp.float32)

    def loss(fn, q, k, v):
        return jnp.sum(fn(q, k, v, mask) * w)

    g_fused = jax.grad(lambda *a: loss(
        lambda q, k, v, m: fused_attention(q, k, v, key_mask=m),
        *a), argnums=(0, 1, 2))(q, k, v)
    g_ein = jax.grad(lambda *a: loss(
        lambda q, k, v, m: _einsum_attention(q, k, v, key_mask=m),
        *a), argnums=(0, 1, 2))(q, k, v)
    for a, b_ in zip(g_fused, g_ein):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b_),
                                   rtol=1e-5, atol=1e-5)
