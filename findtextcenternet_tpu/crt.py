"""Chinese-Remainder-Theorem codec for UTF-32 codepoints.

A codepoint ``x`` is represented by its residues ``(x % 1091, x % 1093,
x % 1097)``; classification heads predict each residue independently and
Garner's algorithm reconstructs ``x``. Mirrors the behavior of the
reference's ``calc_predid`` (`/root/reference/util_func.py:92-126`) but is a
fresh vectorized implementation: fixed 3-modulus Garner with precomputed
modular inverses, jit/vmap-safe, int32-only on device (the product of the
moduli, ~1.308e9, fits int32).
"""
from __future__ import annotations

import numpy as np
import jax.numpy as jnp

from .const import MODULO_LIST, MODULO_PRODUCT, MAX_CODEPOINT

_M0, _M1, _M2 = MODULO_LIST
# Precomputed modular inverses (Python ints; pow with -1 is exact).
_INV_M0_MOD_M1 = pow(_M0, -1, _M1)
_INV_M0_MOD_M2 = pow(_M0, -1, _M2)
_INV_M1_MOD_M2 = pow(_M1, -1, _M2)


def encode(x):
    """codepoint(s) -> tuple of 3 residue arrays (works for np/jnp/int)."""
    return tuple(x % m for m in MODULO_LIST)


def decode(b0, b1, b2):
    """Residues -> codepoint via Garner's algorithm. Array-friendly.

    Accepts numpy or jax arrays (or ints); promotes to int32 internally.
    The result is only meaningful when it is <= MAX_CODEPOINT; use
    :func:`is_valid` to check.
    """
    xp = jnp if any(isinstance(a, jnp.ndarray) for a in (b0, b1, b2)) else np
    b0 = xp.asarray(b0, dtype=xp.int32)
    b1 = xp.asarray(b1, dtype=xp.int32)
    b2 = xp.asarray(b2, dtype=xp.int32)

    t0 = b0 % _M0
    t1 = ((b1 - t0) % _M1) * _INV_M0_MOD_M1 % _M1
    u = t0 + t1 * _M0                       # < m0*m1 ~ 1.19e6
    t2 = ((b2 - u) % _M2) * _INV_M0_MOD_M2 % _M2
    t2 = t2 * _INV_M1_MOD_M2 % _M2
    x = (t0 + t1 * _M0 + t2 * (_M0 * _M1)) % MODULO_PRODUCT
    return x


def is_valid(x):
    """True where a reconstructed value is a representable codepoint."""
    return x <= MAX_CODEPOINT


def decode_checked(b0, b1, b2, fill=0):
    """Decode and replace out-of-range reconstructions with ``fill``."""
    x = decode(b0, b1, b2)
    xp = jnp if isinstance(x, jnp.ndarray) else np
    return xp.where(is_valid(x), x, xp.asarray(fill, dtype=x.dtype))
