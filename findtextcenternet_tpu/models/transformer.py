"""Encoder-decoder text transformer with mask-predict NAR decoding.

Capability-equivalent to the reference transformer
(`/root/reference/models/transformer.py:12-360`), redesigned for TPU:

* trainable sinusoid-initialized positional tables injected inside *every*
  attention layer (separate q/k tables), SwiGLU feed-forward, B2T residuals
  (``x + ffn_in + block_skip``), modulo-sum token embedding, and 3 output
  heads (one per CRT modulus);
* the mask-predict inference loop is a fixed-shape ``lax.while_loop`` with
  masked updates and vectorized top-k^3 CRT product-space search — no
  data-dependent python control flow, everything jits once;
* attention is einsum-based at static (400,) sequence lengths, batched over
  many windows at once (the reference decodes one window at a time).
"""
from __future__ import annotations

import dataclasses
from typing import Any, Optional, Sequence

import numpy as np
import jax
import jax.numpy as jnp
from flax import linen as nn

from .. import crt
from ..const import (
    DECODER_MSK,
    ENCODER_DIM,
    MAX_CODEPOINT,
    MAX_DECODER_LEN,
    MAX_ENCODER_LEN,
    MODULO_LIST,
)
from ..ops import attention


@dataclasses.dataclass(frozen=True)
class TransformerDims:
    """Model dimensions (matches the trained reference checkpoints)."""
    enc_input_dim: int = ENCODER_DIM
    embed_dim: int = 768
    head_num: int = 12
    enc_block_num: int = 10
    dec_block_num: int = 10
    max_enc_seq_len: int = MAX_ENCODER_LEN
    max_dec_seq_len: int = MAX_DECODER_LEN
    dropout: float = 0.0


def sinusoid_init(max_len: int, d_model: int) -> np.ndarray:
    enc = np.zeros((max_len, d_model), dtype=np.float32)
    pos = np.arange(max_len, dtype=np.float32)[:, None]
    i2 = np.arange(0, d_model, 2, dtype=np.float32)
    div = np.power(10000.0, i2 / d_model)
    enc[:, 0::2] = np.sin(pos / div)
    enc[:, 1::2] = np.cos(pos / div)
    return enc


class PositionalEncoding(nn.Module):
    """Trainable positional table, sinusoid-initialized."""
    max_len: int
    d_model: int

    @nn.compact
    def __call__(self, x):
        table = self.param(
            "table",
            lambda key, shape: jnp.asarray(sinusoid_init(*shape)),
            (self.max_len, self.d_model),
        )
        seq = x.shape[1]
        return x + table[None, :seq, :].astype(x.dtype)


class SwiGLU(nn.Module):
    dim: int
    dropout: float = 0.1
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        x1 = nn.Dense(self.dim * 2, name="w1", dtype=self.dtype)(x)
        xg = nn.silu(nn.Dense(self.dim * 2, name="wg",
                              dtype=self.dtype)(x))
        x = x1 * xg
        x = nn.Dropout(self.dropout, deterministic=not train)(x)
        return nn.Dense(self.dim, name="w2", dtype=self.dtype)(x)


class MultiheadAttn(nn.Module):
    """MHA with per-layer positional tables added to q/k inputs.

    Self-attention (``key is None``) adds the *query* table to both sides;
    cross-attention uses a separate key table. ``kv_heads``/``attend``
    split the key/value projection from the query-side attention so
    mask-predict can hoist the loop-invariant cross K/V out of the
    refinement loop explicitly — guaranteed at trace time instead of
    left to the backend's while-loop LICM heuristics (which weigh the
    hoisted buffers against memory pressure).
    """
    embed_dim: int
    num_heads: int
    dropout: float = 0.1
    max_seq_len: int = 5000
    key_max_seq_len: Optional[int] = None   # cross-attn key table length
    dtype: Any = jnp.float32
    attn_impl: str = "xla"                  # "xla" einsum | "fused" Pallas

    def setup(self):
        d = self.embed_dim
        self.pos_emb_q = PositionalEncoding(self.max_seq_len, d)
        # only materializes params when a cross-attn call uses it, so
        # self-attention modules keep the exact same variable tree as
        # the previous compact definition
        self.pos_emb_k = PositionalEncoding(
            self.key_max_seq_len or self.max_seq_len, d)
        self.q_proj = nn.Dense(d, use_bias=False, dtype=self.dtype)
        self.k_proj = nn.Dense(d, use_bias=False, dtype=self.dtype)
        self.v_proj = nn.Dense(d, use_bias=False, dtype=self.dtype)
        self.out_proj = nn.Dense(d, use_bias=False, dtype=self.dtype)
        self.attn_drop = nn.Dropout(self.dropout)

    def _heads(self, t):
        b, tl, _ = t.shape
        h = self.num_heads
        return t.reshape(b, tl, h, self.embed_dim // h)

    def kv_heads(self, key, value):
        """(B,Tk,H,hd) key/value head projections; ``key`` is the
        positional-encoded key input, ``value`` the raw one."""
        return self._heads(self.k_proj(key)), self._heads(self.v_proj(value))

    def attend(self, query, kh, vh, key_mask=None, train: bool = False):
        """Query-side attention over precomputed key/value heads.
        ``query`` is positional-encoded here."""
        q = self._heads(self.q_proj(self.pos_emb_q(query)))
        b, tq = q.shape[0], q.shape[1]
        hd = self.embed_dim // self.num_heads
        if (self.attn_impl == "fused"
                and attention.supported(tq, kh.shape[1], hd)
                and (not train or (self.dropout == 0.0
                                   and q.dtype == jnp.float32))
                and (key_mask is None
                     or (key_mask.ndim == 4 and key_mask.shape[1] == 1
                         and key_mask.shape[2] == 1))):
            # single-tile Pallas attention: scores never leave VMEM.
            # Differentiable (custom VJP recomputes the softmax in
            # VMEM); training routes here only with zero attention
            # dropout — the reference's actual training configuration
            # (`/root/reference/models/transformer.py:264` ModelDimensions
            # dropout=0.0) — else the einsum path keeps dropout RNG
            out = attention.fused_attention(q, kh, vh, key_mask)
            return self.out_proj(out.reshape(b, tq, self.embed_dim))
        logits = jnp.einsum("bqhd,bkhd->bhqk", q, kh,
                            preferred_element_type=jnp.float32)
        logits = logits / jnp.sqrt(jnp.asarray(hd, dtype=logits.dtype))
        if key_mask is not None:
            # additive mask, broadcastable to (B, H, Tq, Tk)
            logits = logits + key_mask.astype(logits.dtype)
        attn = jax.nn.softmax(logits, axis=-1).astype(vh.dtype)
        attn = self.attn_drop(attn, deterministic=not train)
        out = jnp.einsum("bhqk,bkhd->bqhd", attn, vh,
                         preferred_element_type=jnp.float32).astype(vh.dtype)
        return self.out_proj(out.reshape(b, tq, self.embed_dim))

    def cross_kv(self, key):
        """Cached-decode entry: cross-attention K/V heads for ``key``
        (the encoder output)."""
        return self.kv_heads(self.pos_emb_k(key), key)

    def __call__(self, query, key=None, value=None, key_mask=None,
                 train: bool = False):
        if key is None:
            kh, vh = self.kv_heads(self.pos_emb_q(query), query)
        else:
            if value is None:
                value = key
            kh, vh = self.kv_heads(self.pos_emb_k(key), value)
        return self.attend(query, kh, vh, key_mask=key_mask, train=train)


class EncoderBlock(nn.Module):
    embed_dim: int
    num_heads: int
    dropout: float = 0.1
    max_seq_len: int = 5000
    dtype: Any = jnp.float32
    attn_impl: str = "xla"

    @nn.compact
    def __call__(self, x, key_mask=None, train: bool = False):
        # norms always compute in f32 (cheap VPU work); only the matmuls
        # follow self.dtype, so bf16 inference keeps f32-stable statistics
        skip = x
        x = MultiheadAttn(self.embed_dim, self.num_heads, self.dropout,
                          self.max_seq_len, dtype=self.dtype,
                          attn_impl=self.attn_impl, name="mha")(
            x, key_mask=key_mask, train=train)
        x = nn.Dropout(self.dropout, deterministic=not train)(x)
        x = nn.LayerNorm(dtype=jnp.float32, name="norm1")(x + skip)
        ffn_in = x
        x = SwiGLU(self.embed_dim, self.dropout, dtype=self.dtype,
                   name="ff")(x, train)
        x = nn.Dropout(self.dropout, deterministic=not train)(x)
        # B2T residual: add both the ffn input and the block input
        return nn.LayerNorm(dtype=jnp.float32, name="norm2")(
            x + ffn_in + skip)


class DecoderBlock(nn.Module):
    embed_dim: int
    num_heads: int
    dropout: float = 0.1
    max_seq_len: int = 5000
    enc_max_seq_len: Optional[int] = None
    dtype: Any = jnp.float32
    attn_impl: str = "xla"

    def setup(self):
        self.self_attn = MultiheadAttn(self.embed_dim, self.num_heads,
                                       self.dropout, self.max_seq_len,
                                       dtype=self.dtype,
                                       attn_impl=self.attn_impl)
        self.cross_attn = MultiheadAttn(self.embed_dim, self.num_heads,
                                        self.dropout, self.max_seq_len,
                                        key_max_seq_len=self.enc_max_seq_len,
                                        dtype=self.dtype,
                                        attn_impl=self.attn_impl)
        self.norm1 = nn.LayerNorm(dtype=jnp.float32)
        self.norm2 = nn.LayerNorm(dtype=jnp.float32)
        self.norm3 = nn.LayerNorm(dtype=jnp.float32)
        self.ff = SwiGLU(self.embed_dim, self.dropout, dtype=self.dtype)
        self.drop = nn.Dropout(self.dropout)

    def cross_kv(self, enc):
        return self.cross_attn.cross_kv(enc)

    def _body(self, x, cross_fn, train):
        skip = x
        x = self.self_attn(x, train=train)
        x = self.drop(x, deterministic=not train)
        x = self.norm1(x + skip)
        cross_in = x
        x = cross_fn(x)
        x = self.drop(x, deterministic=not train)
        x = self.norm2(x + cross_in)
        ffn_in = x
        x = self.ff(x, train)
        x = self.drop(x, deterministic=not train)
        return self.norm3(x + ffn_in + skip)

    def __call__(self, x, enc, key_mask=None, train: bool = False):
        return self._body(
            x, lambda q: self.cross_attn(q, key=enc, key_mask=key_mask,
                                         train=train), train)

    def call_cached(self, x, kh, vh, key_mask=None):
        """Decode with precomputed cross-attention K/V heads (inference
        only; identical math to ``__call__``)."""
        return self._body(
            x, lambda q: self.cross_attn.attend(q, kh, vh,
                                                key_mask=key_mask),
            False)


class Encoder(nn.Module):
    dims: TransformerDims
    dtype: Any = jnp.float32
    attn_impl: str = "xla"

    @nn.compact
    def __call__(self, x, key_mask=None, train: bool = False):
        d = self.dims
        x = nn.Dense(d.embed_dim, use_bias=False, name="embed",
                     dtype=self.dtype)(x)
        x = PositionalEncoding(d.max_enc_seq_len, d.embed_dim,
                               name="pos_emb")(x)
        x = nn.LayerNorm(dtype=jnp.float32, name="norm")(x)
        x = nn.Dropout(d.dropout, deterministic=not train)(x)
        for i in range(d.enc_block_num):
            x = EncoderBlock(d.embed_dim, d.head_num, d.dropout,
                             d.max_enc_seq_len, dtype=self.dtype,
                             attn_impl=self.attn_impl,
                             name=f"block{i}")(
                x, key_mask=key_mask, train=train)
        return x


class Decoder(nn.Module):
    dims: TransformerDims
    dtype: Any = jnp.float32
    attn_impl: str = "xla"

    def setup(self):
        d = self.dims
        for i, m in enumerate(MODULO_LIST):
            setattr(self, f"embed{i}", nn.Embed(m, d.embed_dim))
        self.pos_emb = PositionalEncoding(d.max_dec_seq_len, d.embed_dim)
        self.norm = nn.LayerNorm(dtype=jnp.float32)
        self.drop = nn.Dropout(d.dropout)
        for i in range(d.dec_block_num):
            setattr(self, f"block{i}", DecoderBlock(
                d.embed_dim, d.head_num, d.dropout, d.max_dec_seq_len,
                enc_max_seq_len=d.max_enc_seq_len, dtype=self.dtype,
                attn_impl=self.attn_impl))
        for i, m in enumerate(MODULO_LIST):
            setattr(self, f"out{i}", nn.Dense(m, dtype=self.dtype))

    def _blocks(self):
        return [getattr(self, f"block{i}")
                for i in range(self.dims.dec_block_num)]

    def _embed(self, tokens, train):
        # modulo-sum embedding: sum of one embedding per CRT residue
        x = None
        for i, m in enumerate(MODULO_LIST):
            e = getattr(self, f"embed{i}")(tokens % m)
            x = e if x is None else x + e
        x = self.pos_emb(x)
        x = self.norm(x)
        return self.drop(x, deterministic=not train)

    def _out(self, x):
        # residue logits always leave as f32: the CRT product-space
        # search compares probability products, where bf16 resolution
        # would coarsen near-tie decisions for no speed gain (tiny head)
        return [getattr(self, f"out{i}")(x).astype(jnp.float32)
                for i, m in enumerate(MODULO_LIST)]

    def __call__(self, tokens, enc, key_mask=None, train: bool = False):
        x = self._embed(tokens, train)
        for blk in self._blocks():
            x = blk(x, enc, key_mask=key_mask, train=train)
        return self._out(x)

    def cross_kv(self, enc):
        """Per-block cross-attention K/V heads for the mask-predict
        refinement loop (loop-invariant, computed once per window)."""
        return [blk.cross_kv(enc) for blk in self._blocks()]

    def decode_cached(self, tokens, kv, key_mask=None):
        x = self._embed(tokens, False)
        for blk, (kh, vh) in zip(self._blocks(), kv):
            x = blk.call_cached(x, kh, vh, key_mask=key_mask)
        return self._out(x)


def make_key_mask(enc_input: jnp.ndarray) -> jnp.ndarray:
    """Additive (B,1,1,S) mask: -inf where the encoder vector is all-zero."""
    pad = jnp.all(enc_input == 0, axis=-1)
    return jnp.where(pad[:, None, None, :], -jnp.inf, 0.0)


class Transformer(nn.Module):
    """``dtype`` is the matmul compute dtype (params stay f32): f32
    matches the reference torch backend exactly; bf16 is the TPU analog
    of its fp16 ONNX/CoreML deployments (norms and residue logits stay
    f32 either way). Wired to ``InferenceConfig.decode_dtype``.

    ``attn_impl='fused'`` routes inference attention through the
    single-tile Pallas kernel (:mod:`..ops.attention`) — same math,
    scores never round-trip HBM; training always uses the einsum path
    (dropout + autodiff). Wired to ``InferenceConfig.decode_attention``.
    """
    dims: TransformerDims = TransformerDims()
    dtype: Any = jnp.float32
    attn_impl: str = "xla"

    def setup(self):
        self.encoder = Encoder(self.dims, dtype=self.dtype,
                               attn_impl=self.attn_impl)
        self.decoder = Decoder(self.dims, dtype=self.dtype,
                               attn_impl=self.attn_impl)

    def __call__(self, enc_input, dec_input, train: bool = False):
        key_mask = make_key_mask(enc_input)
        enc = self.encoder(enc_input, key_mask=key_mask, train=train)
        return self.decoder(dec_input, enc, key_mask=key_mask, train=train)

    def encode(self, enc_input, train: bool = False):
        key_mask = make_key_mask(enc_input)
        return self.encoder(enc_input, key_mask=key_mask, train=train)

    def decode(self, dec_input, enc_output, key_mask, train: bool = False):
        return self.decoder(dec_input, enc_output, key_mask=key_mask,
                            train=train)

    def cross_kv(self, enc_output):
        return self.decoder.cross_kv(enc_output)

    def decode_cached(self, dec_input, kv, key_mask):
        return self.decoder.decode_cached(dec_input, kv, key_mask=key_mask)


# ---------------------------------------------------------------------------
# Mask-predict inference
# ---------------------------------------------------------------------------

def topk_descending(p: jnp.ndarray, k: int, impl: str = "sort"):
    """Top-k (values, indices) along the last axis, descending, ties to
    the lower index.

    Bit-identical between impls (pinned by tests): ``"sort"`` is
    ``jax.lax.top_k`` (XLA's TopK lowering); ``"argmax"`` runs k masked
    argmax passes — pure VPU reductions with no sort network, a
    measurement lever for the decode hot loop where k=3 and the axis is
    a ~1100-wide CRT residue vocabulary (``tools/decode_bench``).
    """
    if impl == "sort":
        return jax.lax.top_k(p, k)
    iota = jax.lax.broadcasted_iota(jnp.int32, p.shape, p.ndim - 1)
    x = p
    vals, idxs = [], []
    for _ in range(k):
        i = jnp.argmax(x, axis=-1)
        vals.append(jnp.take_along_axis(x, i[..., None], axis=-1)[..., 0])
        idxs.append(i)
        x = jnp.where(iota == i[..., None], -jnp.inf, x)
    return jnp.stack(vals, axis=-1), jnp.stack(idxs, axis=-1)


def crt_combine_topk(logits: Sequence[jnp.ndarray], topk: int = 3):
    """Product-space CRT combine over per-modulus top-k candidates.

    For each position, take the top-k residues per modulus, form all k^3
    combinations, CRT-decode each, score by the geometric mean of the three
    probabilities, zero out invalid (> MAX_CODEPOINT) reconstructions, and
    return the best (code, prob) per position.

    Matches the semantics of the reference's python-side product search
    (`/root/reference/models/transformer.py:306-323`) but fully vectorized.
    """
    probs = [jax.nn.softmax(lg.astype(jnp.float32), axis=-1)
             for lg in logits]
    return crt_combine_topk_probs(probs, topk)


def crt_combine_topk_probs(probs: Sequence[jnp.ndarray], topk: int = 3,
                           topk_impl: str = "sort"):
    """:func:`crt_combine_topk` over already-softmaxed probabilities
    (the form the exported decoder artifacts emit)."""
    tops = []
    for p in probs:
        tp, ti = topk_descending(p.astype(jnp.float32), topk,
                                 impl=topk_impl)  # (B, L, k)
        tops.append((tp, ti))

    (p0, i0), (p1, i1), (p2, i2) = tops
    # broadcast to (B, L, k, k, k); combo axis order (i0, i1, i2) with the
    # last index fastest — the same enumeration order as itertools.product.
    b, l, k = p0.shape
    i0b = i0[..., :, None, None]
    i1b = i1[..., None, :, None]
    i2b = i2[..., None, None, :]
    codes = crt.decode(
        jnp.broadcast_to(i0b, (b, l, k, k, k)),
        jnp.broadcast_to(i1b, (b, l, k, k, k)),
        jnp.broadcast_to(i2b, (b, l, k, k, k)),
    ).reshape(b, l, k * k * k)

    logp = (
        jnp.log(jnp.clip(p0[..., :, None, None], 1e-10))
        + jnp.log(jnp.clip(p1[..., None, :, None], 1e-10))
        + jnp.log(jnp.clip(p2[..., None, None, :], 1e-10))
    )
    prob = jnp.exp(logp / 3.0).reshape(b, l, k * k * k)
    prob = jnp.where(codes > MAX_CODEPOINT, 0.0, prob)

    best = jnp.argmax(prob, axis=-1)
    code = jnp.take_along_axis(codes, best[..., None], axis=-1)[..., 0]
    p = jnp.take_along_axis(prob, best[..., None], axis=-1)[..., 0]
    return code, p


def mask_predict(model: Transformer, params, enc_input,
                 max_rounds: int = 8, topk: int = 3,
                 remask_threshold: float = 0.9,
                 early_stop_threshold: float = 0.99,
                 dec_len: int | None = None):
    """Non-autoregressive iterative decode; fully jittable, batched.

    Starts from an all-MSK decoder input, refines up to ``max_rounds``
    times, remasking low-confidence positions, with the same early-stop
    rules as the reference predictor
    (`/root/reference/models/transformer.py:274-360`).

    ``dec_len`` (default ``dims.max_dec_seq_len``) sets the decoder
    sequence length: every weight (positional tables slice to the
    actual length) and every rule is unchanged, but decoder
    self-attention runs over ``dec_len`` positions instead of the full
    400 — the cost is quadratic in it. Exact reference parity requires
    the full length (the reference always decodes 400 positions and its
    decoder self-attention is unmasked, so the padded tail participates
    in every softmax); shorter lengths are the opt-in
    ``decode_len_buckets`` throughput lever.

    Returns ``(codes[B, dec_len], probs[B, dec_len])``.
    """
    def decode_probs(dec_input, kv, key_mask):
        logits = model.apply(params, dec_input, kv, key_mask,
                             method=Transformer.decode_cached)
        return [jax.nn.softmax(lg.astype(jnp.float32), axis=-1)
                for lg in logits]

    return mask_predict_fns(
        lambda e: model.apply(params, e, method=Transformer.encode),
        decode_probs, enc_input,
        dec_len if dec_len is not None else model.dims.max_dec_seq_len,
        max_rounds=max_rounds, topk=topk,
        remask_threshold=remask_threshold,
        early_stop_threshold=early_stop_threshold,
        # hoist the loop-invariant cross-attention K/V out of the
        # refinement loop: 2*Le*D^2 MACs per decoder block (~12% of the
        # per-round decoder matmul FLOPs at the production 400/400
        # shapes) are paid once per window instead of once per round —
        # guaranteed at trace time, not left to the backend's
        # while-loop LICM heuristics
        prepare_fn=lambda enc_out: model.apply(
            params, enc_out, method=Transformer.cross_kv))


def mask_predict_fns(encode_fn, decode_probs_fn, enc_input, dec_len: int,
                     max_rounds: int = 8, topk: int = 3,
                     remask_threshold: float = 0.9,
                     early_stop_threshold: float = 0.99,
                     prepare_fn=None):
    """:func:`mask_predict` over opaque encode/decode callables.

    ``encode_fn(enc_input) -> enc_output``;
    ``decode_probs_fn(dec_input, ctx, key_mask) -> per-modulus
    softmaxed probabilities`` where ``ctx`` is ``enc_output`` or, when
    ``prepare_fn`` is given, ``prepare_fn(enc_output)`` — a one-time
    per-window context (the live model passes precomputed cross-attn
    K/V heads through it). This is the driver for *exported*
    encoder/decoder artifacts (the TPU-native analog of the reference's
    onnx/coreml backends, `/root/reference/process_ocr_onnx.py:27-72`),
    and the backend of :func:`mask_predict` itself.
    """
    key_mask = make_key_mask(enc_input)
    enc_output = encode_fn(enc_input)
    if prepare_fn is not None:
        enc_output = prepare_fn(enc_output)

    b = enc_input.shape[0]
    init_input = jnp.full((b, dec_len), DECODER_MSK, dtype=jnp.int32)
    init_output = jnp.zeros((b, dec_len), dtype=jnp.int32)
    init_p = jnp.zeros((b, dec_len), dtype=jnp.float32)

    # early-stop bookkeeping is PER WINDOW (a (b,) done vector with the
    # converged rows' code/p frozen), matching the reference driver,
    # which decodes one window per call so its batch-global stop
    # (models/transformer.py:326-358 upstream) is per-window by
    # construction (process_ocr_base.py:230-235 builds batch-1 inputs).
    # A batch-global stop would keep refining converged windows while a
    # straggler finishes — making decoded text depend on which windows
    # happen to share a batch.
    def cond(carry):
        _, _, _, k, done = carry
        return jnp.logical_and(k < max_rounds,
                               jnp.logical_not(jnp.all(done)))

    def body(carry):
        dec_input, code0, p0, k, done0 = carry
        probs = decode_probs_fn(dec_input, enc_output, key_mask)
        code, p = crt_combine_topk_probs(probs, topk)
        invalid = p <= 0.0  # invalid reconstructions got prob 0

        newly = jnp.logical_and(dec_input == DECODER_MSK, code > 0)
        all_conf = jnp.all(
            jnp.where(newly, p > early_stop_threshold, True), axis=1)

        remask = jnp.logical_or(p < remask_threshold, invalid)
        any_remask = jnp.any(remask, axis=1)
        done = jnp.logical_or(all_conf, jnp.logical_not(any_remask))

        keep = done0[:, None]           # rows finished before this round
        new_code = jnp.where(keep, code0, code.astype(jnp.int32))
        new_p = jnp.where(keep, p0, p)
        new_input = jnp.where(
            keep, dec_input,
            jnp.where(remask, DECODER_MSK, code).astype(jnp.int32))
        return (new_input, new_code, new_p, k + 1,
                jnp.logical_or(done0, done))

    _, code, p, _, _ = jax.lax.while_loop(
        cond, body, (init_input, init_output, init_p,
                     jnp.asarray(0), jnp.zeros((b,), bool)))
    return code, p
