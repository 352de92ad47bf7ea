"""Deterministic counter-based RNG for rendering.

The reference uses one MT19937 per worker thread, all seeded identically
(/root/reference/RTBase/Sampling.h:13-26, Renderer.h:55) — which correlates
tiles.  Here every random decision is keyed by (base seed, spp index,
bounce, decision id), and each lane of the flat ray batch draws an
independent value from a single batched threefry call, so renders are
bit-reproducible regardless of device count or sharding.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp

# Decision ids: stable enumeration of every RNG consumption point so that
# adding a new decision never perturbs existing streams.
PIXEL_JITTER_X = 0
PIXEL_JITTER_Y = 1
LIGHT_PICK = 2
LIGHT_POS_U = 3
LIGHT_POS_V = 4
RR = 5
BSDF_U = 6
BSDF_V = 7
BSDF_LOBE = 8
LENS_U = 9
LENS_V = 10
LIGHT_AUX = 11   # alias-table accept test + in-texel u offset
_NUM_DECISIONS = 16


def spp_key(base_key: jax.Array, spp_index) -> jax.Array:
    return jax.random.fold_in(base_key, spp_index)


def decision_key(key: jax.Array, bounce, decision: int) -> jax.Array:
    return jax.random.fold_in(key, bounce * _NUM_DECISIONS + decision)


def uniform(key: jax.Array, bounce, decision: int, shape) -> jax.Array:
    """U[0,1) array of `shape` for one decision point of one bounce."""
    return jax.random.uniform(decision_key(key, bounce, decision), shape,
                              dtype=jnp.float32)
