"""Fused multi-head attention for the mask-predict decode hot path.

XLA:TPU does not flash-fuse the ``matmul -> mask -> softmax -> matmul``
attention composition: at the production decode shapes (B=16 windows,
H=12 heads, L=400 tokens) the f32 score tensor is ``16*12*400*400*4 B
= 123 MB`` and round-trips HBM several times per attention site — the
decoder has 20 sites (10 self + 10 cross) *per refinement round*
(`/root/reference/models/transformer.py:281-359` runs up to 8 rounds).
At ~820 GB/s HBM that overhead dwarfs the attention FLOPs (~8 GFLOP per
site, ~40 us of MXU time).

Here one Pallas program handles one ``(batch, head)`` pair: at L<=512
the whole Q/K/V set (3 x 400x64 f32 = 300 KB) *and* the 400x400 score
tile (640 KB) fit VMEM comfortably, so no online-softmax streaming is
needed — scores are materialised once on-chip, softmaxed, and consumed
by the PV matmul without ever touching HBM.

Numerics mirror ``MultiheadAttn.attend`` exactly: f32 score
accumulation (``preferred_element_type``), additive key mask, the same
``jax.nn.softmax`` (all ``-inf`` rows stay NaN, as in the XLA path),
and the same cast chain back to the value dtype.
"""
from __future__ import annotations

import functools
import math

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

# one (b, h) program's VMEM footprint must stay well under the ~16 MB
# core budget: Q/K/V/O tiles + the (Tq, Tk) f32 score tile (+ compiler
# double-buffering headroom)
_MAX_SCORE_BYTES = 4 * 1024 * 1024


def supported(tq: int, tk: int, hd: int) -> bool:
    """Whether the single-tile kernel can hold this shape in VMEM."""
    return (tq * tk * 4 <= _MAX_SCORE_BYTES
            and tq % 8 == 0 and tk % 8 == 0 and hd % 8 == 0)


def _attn_kernel(q_ref, k_ref, v_ref, m_ref, o_ref, *, scale: float):
    q = q_ref[0, 0]                      # (Tq, hd)
    k = k_ref[0, 0]                      # (Tk, hd)
    v = v_ref[0, 0]                      # (Tk, hd)
    scores = jax.lax.dot_general(
        q, k, (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32)          # (Tq, Tk)
    scores = scores * scale + m_ref[0, 0]            # additive key mask row
    attn = jax.nn.softmax(scores, axis=-1).astype(v.dtype)
    o_ref[0, 0] = jnp.dot(
        attn, v, preferred_element_type=jnp.float32).astype(v.dtype)


@functools.partial(jax.jit, static_argnames=("interpret",))
def _fused_bhtd(q, k, v, mask, interpret: bool):
    b, h, tq, hd = q.shape
    tk = k.shape[2]
    scale = 1.0 / math.sqrt(hd)
    flops = 2 * 2 * b * h * tq * tk * hd
    return pl.pallas_call(
        functools.partial(_attn_kernel, scale=scale),
        grid=(b, h),
        in_specs=[
            pl.BlockSpec((1, 1, tq, hd), lambda i, j: (i, j, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, tk, hd), lambda i, j: (i, j, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, tk, hd), lambda i, j: (i, j, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, tk), lambda i, j: (i, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, 1, tq, hd), lambda i, j: (i, j, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((b, h, tq, hd), v.dtype),
        cost_estimate=pl.CostEstimate(
            flops=flops,
            bytes_accessed=(q.size + k.size + v.size) * q.dtype.itemsize
            + b * h * tq * hd * v.dtype.itemsize,
            transcendentals=b * h * tq * tk,
        ),
        interpret=interpret,
    )(q, k, v, mask)


def _attn_bwd_kernel(q_ref, k_ref, v_ref, m_ref, g_ref,
                     dq_ref, dk_ref, dv_ref, *, scale: float):
    """Single-tile backward: recompute the softmax in VMEM (cheaper than
    storing 123 MB of attention weights per site), then the standard
    attention VJP — all (Tq, Tk) intermediates stay on-chip."""
    q = q_ref[0, 0]
    k = k_ref[0, 0]
    v = v_ref[0, 0]
    g = g_ref[0, 0]                                   # dOut (Tq, hd)
    scores = jax.lax.dot_general(
        q, k, (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32)
    scores = scores * scale + m_ref[0, 0]
    attn = jax.nn.softmax(scores, axis=-1)            # (Tq, Tk) f32
    d_attn = jax.lax.dot_general(
        g, v, (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32)           # (Tq, Tk)
    # transposed contractions as explicit .T + plain dot — the pattern
    # Mosaic is known to lower (same as jax's in-tree flash_attention
    # backward); dimension-number (0,)x(0,) contractions are avoided
    dv_ref[0, 0] = jax.lax.dot(
        attn.T, g, preferred_element_type=jnp.float32).astype(v.dtype)
    # softmax VJP: ds = a * (dA - sum(dA * a, axis=-1))
    ds = attn * (d_attn
                 - jnp.sum(d_attn * attn, axis=-1, keepdims=True))
    dq_ref[0, 0] = (jnp.dot(
        ds, k, preferred_element_type=jnp.float32)
        * scale).astype(q.dtype)
    dk_ref[0, 0] = (jax.lax.dot(
        ds.T, q, preferred_element_type=jnp.float32)
        * scale).astype(k.dtype)


@functools.partial(jax.jit, static_argnames=("interpret",))
def _fused_bwd_bhtd(q, k, v, mask, g, interpret: bool):
    b, h, tq, hd = q.shape
    tk = k.shape[2]
    scale = 1.0 / math.sqrt(hd)
    tile = lambda t: pl.BlockSpec((1, 1, t, hd), lambda i, j: (i, j, 0, 0),
                                  memory_space=pltpu.VMEM)
    return pl.pallas_call(
        functools.partial(_attn_bwd_kernel, scale=scale),
        grid=(b, h),
        in_specs=[tile(tq), tile(tk), tile(tk),
                  pl.BlockSpec((1, 1, tk), lambda i, j: (i, 0, 0),
                               memory_space=pltpu.VMEM),
                  tile(tq)],
        out_specs=(tile(tq), tile(tk), tile(tk)),
        out_shape=(jax.ShapeDtypeStruct((b, h, tq, hd), q.dtype),
                   jax.ShapeDtypeStruct((b, h, tk, hd), k.dtype),
                   jax.ShapeDtypeStruct((b, h, tk, hd), v.dtype)),
        cost_estimate=pl.CostEstimate(
            flops=5 * 2 * b * h * tq * tk * hd,
            bytes_accessed=4 * (q.size + k.size + v.size) * q.dtype.itemsize,
            transcendentals=b * h * tq * tk,
        ),
        interpret=interpret,
    )(q, k, v, mask, g)


@functools.partial(jax.custom_vjp, nondiff_argnums=(4,))
def _attention_core(q, k, v, mask, interpret):
    return _fused_bhtd(q, k, v, mask, interpret)


def _attention_core_fwd(q, k, v, mask, interpret):
    return _fused_bhtd(q, k, v, mask, interpret), (q, k, v, mask)


def _attention_core_bwd(interpret, res, g):
    q, k, v, mask = res
    dq, dk, dv = _fused_bwd_bhtd(q, k, v, mask, g, interpret)
    # the mask is produced by comparisons (make_key_mask) — its
    # cotangent is structurally dead; zeros keeps custom_vjp's contract
    return dq, dk, dv, jnp.zeros_like(mask)


_attention_core.defvjp(_attention_core_fwd, _attention_core_bwd)


def fused_attention(q, k, v, key_mask=None, interpret: bool | None = None):
    """Attention over per-head tensors in the model's (B, T, H, hd) layout.

    Drop-in for the einsum composition in ``MultiheadAttn.attend``
    (``bqhd,bkhd->bhqk`` -> mask -> softmax -> ``bhqk,bkhd->bqhd``):
    same operands, same f32 score accumulation, same output layout.
    ``key_mask`` is the additive (0 / -inf) mask broadcastable to
    (B, H, Tq, Tk); only key-dimension masks — shape (..., Tk) with
    singleton Tq/H axes, what :func:`make_key_mask` produces — are
    representable in the fused layout.
    """
    b, tq, h, hd = q.shape
    tk = k.shape[1]
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    if key_mask is None:
        # (B, 1, Tk): the singleton middle dim keeps the Mosaic block
        # rule satisfied (each block dim equals the array dim)
        mask = jnp.zeros((b, 1, tk), jnp.float32)
    else:
        mask = jnp.broadcast_to(key_mask.astype(jnp.float32),
                                (b, 1, 1, tk)).reshape(b, 1, tk)
    # relayout to (B, H, T, hd) so each program's tile is (T, hd) —
    # sublane-major, contiguous per (b, h); XLA fuses the transpose
    # into the producing projection reshape
    qt = jnp.transpose(q, (0, 2, 1, 3))
    kt = jnp.transpose(k, (0, 2, 1, 3))
    vt = jnp.transpose(v, (0, 2, 1, 3))
    out = _attention_core(qt, kt, vt, mask, interpret)
    return jnp.transpose(out, (0, 2, 1, 3))         # back to (B, Tq, H, hd)
