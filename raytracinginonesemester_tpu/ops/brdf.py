"""BRDF evaluation: normalized Lambert + Blinn-Phong.

Vectorized port of ``EvaluateBRDF`` (``CPUOnly/include/brdf.h:12-37``,
identical GPU variant ``GPUandCPU/include/brdf.h:12-40``): returns
f(wo, wi) — does NOT include the N.L factor.
"""

from __future__ import annotations

import jax.numpy as jnp
from jax import Array

from ..scene.material import MaterialTable

__all__ = ["evaluate_brdf"]

_INV_PI = 0.31830988618
_INV_2PI = 0.15915494309


def evaluate_brdf(mat: MaterialTable, n: Array, v: Array, l: Array) -> Array:
    """f(wo, wi) for per-ray gathered materials.

    ``mat`` holds per-ray (R,)/(R,3) fields (see ``MaterialTable.gather``);
    n/v/l are (R, 3) unit vectors (normal, to-viewer, to-light).
    """
    ndotl = jnp.maximum(jnp.sum(n * l, axis=-1), 0.0)
    ndotv = jnp.maximum(jnp.sum(n * v, axis=-1), 0.0)
    lit = (ndotl > 0.0) & (ndotv > 0.0)

    # Lambert: rho/pi (brdf.h:22-23)
    fd = mat.albedo * (mat.kd * _INV_PI)[:, None]

    # Normalized Blinn-Phong: (n+2)/(2 pi) * (N.H)^n (brdf.h:26-35)
    h = l + v
    # clamp must be a NORMAL float: 1e-38 is subnormal and XLA flushes it
    # to zero, so h=0 (parked miss lanes: l = v = -0) became 0/0 = NaN and
    # poisoned reverse-mode cross terms even under zero cotangents
    h = h / jnp.sqrt(jnp.maximum(jnp.sum(h * h, axis=-1, keepdims=True), 1e-24))
    ndoth = jnp.maximum(jnp.sum(n * h, axis=-1), 0.0)
    spec_norm = (mat.shininess + 2.0) * _INV_2PI
    # double-where safe pow: when shininess is itself differentiated (the
    # soft renderer aggregates it from vertices), pow's exponent gradient
    # is ndoth^s * ln(ndoth) = 0 * -inf = NaN at ndoth == 0 even under a
    # zero cotangent.  ndoth == 0 implies unlit (h lies between l and v),
    # so the forward value is unchanged.
    ndoth_pos = ndoth > 0.0
    safe_ndoth = jnp.where(ndoth_pos, ndoth, 1.0)
    spec_lobe = spec_norm * jnp.where(
        ndoth_pos, jnp.power(safe_ndoth, mat.shininess), 0.0)
    fs = mat.specular_color * (mat.ks * spec_lobe)[:, None]

    return jnp.where(lit[:, None], fd + fs, 0.0)
