"""Analytic primitives: plane and sphere intersection (batched).

Parity with reference Plane::rayIntersect (Geometry.h:33-57) and
Sphere::rayIntersect (Geometry.h:194-229).  The shipped scenes are
triangle-only, but these are part of the reference's geometry API (and
its unit tests, RTtest.cpp:22-103), so they are first-class here too.
"""
from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp

from ..core.vec import V3


def ray_plane(o: V3, d: V3, n: V3, dist) -> Tuple[jax.Array, jax.Array]:
    """Plane n.x = dist.  Returns (t, hit); hit False for parallel rays
    or intersections behind the origin (t < 0), matching the reference.
    """
    denom = n.dot(d)
    safe = jnp.where(jnp.abs(denom) < 1e-12, 1e-12, denom)
    t = (dist - n.dot(o)) / safe
    hit = (jnp.abs(denom) >= 1e-12) & (t >= 0.0)
    return t, hit


def ray_sphere(o: V3, d: V3, centre: V3, radius
               ) -> Tuple[jax.Array, jax.Array]:
    """Sphere |x - c| = r.  Returns (t, hit) with the nearest positive
    root (reference Geometry.h:199-228: quadratic, nearest t > 0)."""
    l = o - centre
    b = 2.0 * d.dot(l)
    c = l.dot(l) - radius * radius
    disc = b * b - 4.0 * c  # a == 1 for unit direction
    sq = jnp.sqrt(jnp.maximum(disc, 0.0))
    t0 = (-b - sq) * 0.5
    t1 = (-b + sq) * 0.5
    t = jnp.where(t0 > 0.0, t0, t1)
    hit = (disc >= 0.0) & (t > 0.0)
    return jnp.where(hit, t, 0.0), hit


def ray_aabb(o: V3, inv_d: V3, lo: V3, hi: V3
             ) -> Tuple[jax.Array, jax.Array, jax.Array]:
    """Slab test; returns (tmin, tmax, hit) — reference AABB::rayAABB
    (Geometry.h:151-183)."""
    t0x = (lo.x - o.x) * inv_d.x
    t1x = (hi.x - o.x) * inv_d.x
    t0y = (lo.y - o.y) * inv_d.y
    t1y = (hi.y - o.y) * inv_d.y
    t0z = (lo.z - o.z) * inv_d.z
    t1z = (hi.z - o.z) * inv_d.z
    tmin = jnp.maximum(jnp.maximum(jnp.minimum(t0x, t1x),
                                   jnp.minimum(t0y, t1y)),
                       jnp.minimum(t0z, t1z))
    tmax = jnp.minimum(jnp.minimum(jnp.maximum(t0x, t1x),
                                   jnp.maximum(t0y, t1y)),
                       jnp.maximum(t0z, t1z))
    return tmin, tmax, tmax >= jnp.maximum(tmin, 0.0)
