"""Primitive-sharded intersection: the model-parallel axis.

Ray data-parallelism (parallel/mesh.py) replicates the scene; for scenes
exceeding a chip's HBM the triangle arrays shard across the mesh instead
(SURVEY.md §2.11 "scene-sharding by primitive").  Each device intersects
the full ray batch against its local triangle shard, then the per-shard
closest hits merge with an all-gather + argmin over t — one small
collective of (rays, 4) floats per traversal instead of any triangle
movement.

Triangle ids stay global (each shard knows its base offset), so shading
gathers work unchanged on the replicated-materials side.
"""
from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..core.vec import V3
from ..geometry.intersect import BIG_T, Hit, closest_hit_brute
from ..scene.types import Triangles
from .mesh import RAY_AXIS


def pad_triangles(tris: Triangles, multiple: int) -> Triangles:
    """Pad the triangle SoA to a device-count multiple with degenerate
    (never-hit) triangles."""
    t = tris.count
    pad = (-t) % multiple
    if pad == 0:
        return tris

    def pz(x, fill=0.0):
        return jnp.pad(x, [(0, pad)] + [(0, 0)] * (x.ndim - 1),
                       constant_values=fill)

    def pv(v: V3, fill=0.0) -> V3:
        return V3(pz(v.x, fill), pz(v.y, fill), pz(v.z, fill))

    return Triangles(
        p0=pv(tris.p0), e1=pv(tris.e1), e2=pv(tris.e2), gn=pv(tris.gn),
        n0=pv(tris.n0), n1=pv(tris.n1), n2=pv(tris.n2),
        uv0=pz(tris.uv0), uv1=pz(tris.uv1), uv2=pz(tris.uv2),
        area=pz(tris.area), mat_id=pz(tris.mat_id, 0),
        light_id=pz(tris.light_id, -1))


def closest_hit_sharded(tris: Triangles, o: V3, d: V3,
                        mesh: Mesh) -> Hit:
    """Closest hit with triangles sharded over mesh axis `rays`.

    Call under the mesh; `tris` must be padded to a device-count
    multiple (pad_triangles).  Rays are replicated.
    """
    n_dev = mesh.shape[RAY_AXIS]
    shard_size = tris.count // n_dev

    @functools.partial(
        jax.shard_map, mesh=mesh,
        in_specs=(P(RAY_AXIS), P(), P()),
        out_specs=P(RAY_AXIS))
    def run(local_tris: Triangles, o: V3, d: V3) -> Hit:
        idx = jax.lax.axis_index(RAY_AXIS)
        # rays arrive replicated; mark them device-varying so internal
        # scan carries match the varying results of the sharded data
        o, d = jax.tree_util.tree_map(
            lambda x: jax.lax.pcast(x, (RAY_AXIS,), to="varying"), (o, d))
        local = closest_hit_brute(local_tris, o, d)
        tri_g = jnp.where(local.tri >= 0,
                          local.tri + idx * shard_size, -1)
        return Hit(local.t, tri_g, local.u, local.v)

    # per-shard results concatenate on axis 0: (D*N,) -> (D, N);
    # merge by min-t outside the shard_map (XLA inserts the gather)
    n = o.x.shape[0]
    h = run(tris, o, d)
    t = h.t.reshape(n_dev, n)
    best = jnp.argmin(t, axis=0)
    lane = jnp.arange(n)
    return Hit(t[best, lane],
               h.tri.reshape(n_dev, n)[best, lane],
               h.u.reshape(n_dev, n)[best, lane],
               h.v.reshape(n_dev, n)[best, lane])


def shard_triangles(mesh: Mesh, tris: Triangles) -> Triangles:
    """Place the (padded) triangle SoA sharded on its leading axis."""
    s = NamedSharding(mesh, P(RAY_AXIS))
    return jax.tree_util.tree_map(lambda x: jax.device_put(x, s), tris)
