"""Exact f32 -> 3 x bf16 splitting that survives XLA:TPU folding.

The obvious split (``hi = x.astype(bf16); r = x - hi.astype(f32); ...``)
is CORRECT in eager execution but silently WRONG under jit on TPU:
XLA's excess-precision/algebraic simplification folds the
``f32 -> bf16 -> f32`` round-trip to the identity, so ``r`` cancels to
zero and the mid/lo parts vanish — measured on v5e (round 4): every
"reconstructed" value came back as plain ``bf16(x)``, a ~1e-3 relative
error that the 1/255 golden tolerances masked.

This module splits by INTEGER mantissa masking instead, which XLA
cannot fold: a f32 with its low 16 mantissa bits cleared is exactly a
bf16 value (truncation split: 24 mantissa bits = 8 + 8 + 8), each
residual subtraction is exact (Sterbenz: the parts share the leading
exponent), and the bf16 casts of the parts are exact conversions of
already-representable values.  ``hi + mid + lo == x`` bit-exactly in
f32 for every finite x whose lo part stays in bf16's normal range
(|x| >~ 1e-32; geometry lives many orders inside it).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np
from jax import Array

__all__ = ["bf16_split3"]

_MASK = np.uint32(0xFFFF0000)


def _trunc_bf16(x: Array) -> Array:
    """f32 -> f32 with the low 16 mantissa bits cleared (== the nearest
    bf16 toward zero, exactly representable in bf16)."""
    u = jax.lax.bitcast_convert_type(x, jnp.uint32)
    return jax.lax.bitcast_convert_type(u & _MASK, jnp.float32)


def bf16_split3(x: Array):
    """Split f32 ``x`` into (hi, mid, lo) bf16 with
    ``hi.astype(f32) + mid.astype(f32) + lo.astype(f32) == x`` exactly
    (see module docstring for the range caveat)."""
    hi_f = _trunc_bf16(x)
    r1 = x - hi_f  # exact: 16-bit tail at a shared exponent
    mid_f = _trunc_bf16(r1)
    lo_f = r1 - mid_f  # exact: <= 8 significant bits remain
    return (hi_f.astype(jnp.bfloat16), mid_f.astype(jnp.bfloat16),
            lo_f.astype(jnp.bfloat16))
