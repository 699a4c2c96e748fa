"""Bilinear resize with align_corners=True, as MXU matmuls.

The reference upsampler uses ``nn.UpsamplingBilinear2d`` (align_corners=True,
`/root/reference/models/detector.py:170,177`), whose sampling grid differs
from ``jax.image.resize``. On TPU the cleanest speed-of-light formulation is
two small dense interpolation matrices contracted on the MXU:
``out = A_h @ x @ A_w^T`` over the spatial axes — static shapes, fuses with
surrounding convs, no gathers.
"""
from __future__ import annotations

import functools

import numpy as np
import jax
import jax.numpy as jnp


@functools.lru_cache(maxsize=64)
def _interp_matrix(in_size: int, out_size: int) -> np.ndarray:
    """(out, in) align-corners bilinear interpolation matrix."""
    A = np.zeros((out_size, in_size), dtype=np.float32)
    if in_size == 1:
        A[:, 0] = 1.0
        return A
    if out_size == 1:
        A[0, 0] = 1.0
        return A
    src = np.arange(out_size, dtype=np.float64) * (in_size - 1) / (out_size - 1)
    lo = np.floor(src).astype(np.int64)
    hi = np.minimum(lo + 1, in_size - 1)
    w = (src - lo).astype(np.float32)
    rows = np.arange(out_size)
    A[rows, lo] += 1.0 - w
    A[rows, hi] += w
    return A


def resize_bilinear_align_corners(x: jnp.ndarray, out_h: int, out_w: int,
                                  dtype=None) -> jnp.ndarray:
    """Resize NHWC ``x`` to (out_h, out_w) with align_corners semantics."""
    _, h, w, _ = x.shape
    ah = jnp.asarray(_interp_matrix(h, out_h), dtype=dtype or x.dtype)
    aw = jnp.asarray(_interp_matrix(w, out_w), dtype=dtype or x.dtype)
    # (B,H,W,C) -> (B,out_h,W,C) -> (B,out_h,out_w,C)
    # f32 inputs need HIGHEST precision (the MXU would round the
    # interpolation weights to bf16, breaking parity with the reference's
    # fp32 bilinear upsample); bf16 inputs are single-pass either way.
    prec = (jax.lax.Precision.HIGHEST if x.dtype == jnp.float32
            else jax.lax.Precision.DEFAULT)
    x = jnp.einsum("oh,bhwc->bowc", ah, x, precision=prec,
                   preferred_element_type=jnp.float32).astype(x.dtype)
    x = jnp.einsum("ow,bhwc->bhoc", aw, x, precision=prec,
                   preferred_element_type=jnp.float32).astype(x.dtype)
    return x


def upsample2x(x: jnp.ndarray) -> jnp.ndarray:
    """2x align-corners bilinear upsample (the Leafmap cascade step)."""
    _, h, w, _ = x.shape
    return resize_bilinear_align_corners(x, 2 * h, 2 * w)
