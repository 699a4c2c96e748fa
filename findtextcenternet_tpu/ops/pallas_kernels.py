"""Pallas TPU kernels for the peak-extraction hot path.

Fuses the per-tile keymap post-processing — sigmoid + 3x3 local-max
suppression + ownership masking — into one VMEM-resident kernel (one grid
step per tile). The 192x192 map fits VMEM comfortably; the kernel reads
the logits once and writes the suppressed probabilities once, where the
XLA composition (pad -> reduce_window -> select -> sigmoid -> mul)
round-trips intermediates. Top-k and gathers stay in XLA.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

NEG = -1e30


def _shift2d(x, dy: int, dx: int):
    """Shift with -inf fill, static offsets (VPU-friendly slicing)."""
    h, w = x.shape
    if dy > 0:
        x = jnp.concatenate([jnp.full((dy, w), NEG, x.dtype), x[:-dy]], 0)
    elif dy < 0:
        x = jnp.concatenate([x[-dy:], jnp.full((-dy, w), NEG, x.dtype)], 0)
    if dx > 0:
        x = jnp.concatenate([jnp.full((h, dx), NEG, x.dtype), x[:, :-dx]], 1)
    elif dx < 0:
        x = jnp.concatenate([x[:, -dx:], jnp.full((h, -dx), NEG, x.dtype)], 1)
    return x


def _nms_kernel(x_ref, m_ref, o_ref):
    # refs carry a leading block dim of 1
    x = x_ref[0].astype(jnp.float32)
    best = x
    for dy in (-1, 0, 1):
        for dx in (-1, 0, 1):
            if dy == 0 and dx == 0:
                continue
            best = jnp.maximum(best, _shift2d(x, dy, dx))
    p = jax.nn.sigmoid(x)
    p = jnp.where(x >= best, p, 0.0)
    o_ref[0] = p * m_ref[0].astype(jnp.float32)


@functools.partial(jax.jit, static_argnames=("interpret",))
def nms_sigmoid_masked(keymap_logits: jnp.ndarray,
                       region_mask: jnp.ndarray,
                       interpret: bool = False) -> jnp.ndarray:
    """(B, H, W) logits + (B, H, W) mask -> suppressed probabilities.

    Equivalent to sigmoid(nms_peakmap(x)) * mask with non-peaks at 0.
    """
    b, h, w = keymap_logits.shape
    mask = region_mask.astype(jnp.float32)
    return pl.pallas_call(
        _nms_kernel,
        grid=(b,),
        in_specs=[
            pl.BlockSpec((1, h, w), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, h, w), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, h, w), lambda i: (i, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((b, h, w), jnp.float32),
        interpret=interpret,
    )(keymap_logits, mask)
