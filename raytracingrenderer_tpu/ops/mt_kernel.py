"""Pallas TPU kernel: blocked Moller-Trumbore closest-hit.

The hot inner op of small/medium scenes (reference Triangle::rayIntersect
inside BVHNode::traverse, Geometry.h:89-105,399-427) as a hand-scheduled
TPU kernel: rays are tiled into (8, 128)-aligned VMEM blocks (one grid
program per block); the triangle SoA streams through VMEM in chunks and
every ray lane tests every triangle of the chunk on the VPU — dense,
divergence-free, no gathers.  This is the speed-of-light form of
brute-force intersection on a vector machine; the BVH path composes it
per-leaf-cluster later.

Works under `interpret=True` on CPU (used by tests); compiled path is
gated by `use_pallas()` so the renderer can fall back to the lax.scan
version on backends where Mosaic is unavailable.
"""
from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..core.vec import V3
from ..geometry.intersect import BIG_T, DET_EPS, Hit
from ..scene.types import Triangles

RAY_BLOCK = 1024       # rays per grid program (8x128 VREG-aligned)
TRI_CHUNK = 256        # triangles resident per inner step


def _kernel(tris_ref, o_ref, d_ref, t_ref, tri_ref, u_ref, v_ref,
            *, n_tri: int):
    """One program: RAY_BLOCK rays vs all triangles.

    tris_ref: (T_pad, 9) triangle SoA rows [p0, e1, e2].
    o_ref/d_ref: (RAY_BLOCK, 3); outputs (RAY_BLOCK,).
    """
    ox = o_ref[:, 0]
    oy = o_ref[:, 1]
    oz = o_ref[:, 2]
    dx = d_ref[:, 0]
    dy = d_ref[:, 1]
    dz = d_ref[:, 2]

    t_best = jnp.full((RAY_BLOCK,), BIG_T, jnp.float32)
    tri_best = jnp.full((RAY_BLOCK,), -1, jnp.int32)
    u_best = jnp.zeros((RAY_BLOCK,), jnp.float32)
    v_best = jnp.zeros((RAY_BLOCK,), jnp.float32)

    n_chunks = pl.cdiv(n_tri, TRI_CHUNK)

    def chunk_body(c, carry):
        t_best, tri_best, u_best, v_best = carry
        base = c * TRI_CHUNK
        rows = tris_ref[pl.ds(base, TRI_CHUNK), :]  # (TRI_CHUNK, 9)

        def tri_body(k, inner):
            t_b, tri_b, u_b, v_b = inner
            p0x = rows[k, 0]
            p0y = rows[k, 1]
            p0z = rows[k, 2]
            e1x = rows[k, 3]
            e1y = rows[k, 4]
            e1z = rows[k, 5]
            e2x = rows[k, 6]
            e2y = rows[k, 7]
            e2z = rows[k, 8]
            # pvec = d x e2 (per ray lane; triangle is scalar-broadcast)
            pvx = dy * e2z - dz * e2y
            pvy = dz * e2x - dx * e2z
            pvz = dx * e2y - dy * e2x
            det = e1x * pvx + e1y * pvy + e1z * pvz
            inv_det = jnp.where(jnp.abs(det) < DET_EPS, 0.0, 1.0 / det)
            tvx = ox - p0x
            tvy = oy - p0y
            tvz = oz - p0z
            u = (tvx * pvx + tvy * pvy + tvz * pvz) * inv_det
            qvx = tvy * e1z - tvz * e1y
            qvy = tvz * e1x - tvx * e1z
            qvz = tvx * e1y - tvy * e1x
            v = (dx * qvx + dy * qvy + dz * qvz) * inv_det
            t = (e2x * qvx + e2y * qvy + e2z * qvz) * inv_det
            idx = base + k
            hit = ((jnp.abs(det) >= DET_EPS) & (u >= 0.0) & (v >= 0.0)
                   & (u + v <= 1.0) & (t > 0.0) & (t < t_b)
                   & (idx < n_tri))
            return (jnp.where(hit, t, t_b),
                    jnp.where(hit, idx, tri_b).astype(jnp.int32),
                    jnp.where(hit, u, u_b),
                    jnp.where(hit, v, v_b))

        return jax.lax.fori_loop(0, TRI_CHUNK, tri_body,
                                 (t_best, tri_best, u_best, v_best))

    t_best, tri_best, u_best, v_best = jax.lax.fori_loop(
        0, n_chunks, chunk_body, (t_best, tri_best, u_best, v_best))
    t_ref[:] = t_best
    tri_ref[:] = tri_best
    u_ref[:] = u_best
    v_ref[:] = v_best


def _pack_tris(tris: Triangles) -> jax.Array:
    """(T, 9) rows [p0 e1 e2], padded to TRI_CHUNK multiples."""
    rows = jnp.stack([
        tris.p0.x, tris.p0.y, tris.p0.z,
        tris.e1.x, tris.e1.y, tris.e1.z,
        tris.e2.x, tris.e2.y, tris.e2.z], axis=-1)
    t = rows.shape[0]
    pad = (-t) % TRI_CHUNK
    if pad:
        rows = jnp.pad(rows, ((0, pad), (0, 0)))
    return rows


def closest_hit_pallas(tris: Triangles, o: V3, d: V3,
                       interpret: bool = False) -> Hit:
    """Drop-in for intersect.closest_hit_brute via the Pallas kernel."""
    n = o.x.shape[0]
    n_tri = tris.count
    pad = (-n) % RAY_BLOCK
    rows = _pack_tris(tris)
    o_arr = jnp.pad(o.stacked(), ((0, pad), (0, 0)))
    d_arr = jnp.pad(d.stacked(), ((0, pad), (0, 0)), constant_values=1.0)
    n_blocks = (n + pad) // RAY_BLOCK

    kernel = functools.partial(_kernel, n_tri=n_tri)
    out_shapes = (
        jax.ShapeDtypeStruct((n + pad,), jnp.float32),
        jax.ShapeDtypeStruct((n + pad,), jnp.int32),
        jax.ShapeDtypeStruct((n + pad,), jnp.float32),
        jax.ShapeDtypeStruct((n + pad,), jnp.float32),
    )
    ray_spec = pl.BlockSpec((RAY_BLOCK, 3), lambda i: (i, 0),
                            memory_space=pltpu.VMEM)
    out_spec = pl.BlockSpec((RAY_BLOCK,), lambda i: (i,),
                            memory_space=pltpu.VMEM)
    t, tri, u, v = pl.pallas_call(
        kernel,
        grid=(n_blocks,),
        in_specs=[
            pl.BlockSpec(rows.shape, lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
            ray_spec, ray_spec,
        ],
        out_specs=(out_spec, out_spec, out_spec, out_spec),
        out_shape=out_shapes,
        interpret=interpret,
    )(rows, o_arr, d_arr)
    return Hit(t[:n], tri[:n], u[:n], v[:n])


def use_pallas() -> bool:
    """Compiled Pallas path is TPU-only (Mosaic)."""
    try:
        return jax.default_backend() == "tpu"
    except Exception:  # pragma: no cover
        return False
