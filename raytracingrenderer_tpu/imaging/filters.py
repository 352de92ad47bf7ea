"""Reconstruction filter kernels.

Parity with reference ImageFilter/BoxFilter/GaussianFilter/MitchellFilter
(Imaging.h:132-199) — except MitchellFilter is actually implemented here
(the reference's returns 0, a stub).  Filter weights are evaluated by
film.splat over the (2s+1)^2 footprint.
"""
from __future__ import annotations

import jax.numpy as jnp
import numpy as np


def box(dx, dy, size: int):
    """size 0 => single pixel (the reference's active config)."""
    if size == 0:
        return jnp.ones_like(dx)
    inside = (jnp.abs(dx) <= size + 0.5) & (jnp.abs(dy) <= size + 0.5)
    return inside.astype(jnp.float32)


def gaussian(dx, dy, size: int, alpha: float = 2.0):
    d2 = dx * dx + dy * dy
    return jnp.maximum(
        jnp.exp(-alpha * d2) - np.exp(-alpha * size * size), 0.0)


def _mitchell_1d(x, b: float, c: float):
    x = jnp.abs(2.0 * x)  # domain scaled to [-2, 2]
    x2 = x * x
    x3 = x2 * x
    inner = ((12 - 9 * b - 6 * c) * x3 + (-18 + 12 * b + 6 * c) * x2
             + (6 - 2 * b)) / 6.0
    outer = ((-b - 6 * c) * x3 + (6 * b + 30 * c) * x2
             + (-12 * b - 48 * c) * x + (8 * b + 24 * c)) / 6.0
    return jnp.where(x < 1.0, inner, jnp.where(x < 2.0, outer, 0.0))


def mitchell(dx, dy, size: int, b: float = 1.0 / 3.0, c: float = 1.0 / 3.0):
    """Separable Mitchell-Netravali; size is the half-width in pixels."""
    s = max(size, 1)
    return _mitchell_1d(dx / s, b, c) * _mitchell_1d(dy / s, b, c)
