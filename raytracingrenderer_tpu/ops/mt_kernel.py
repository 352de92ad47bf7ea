"""Pallas TPU kernel: blocked Moller-Trumbore intersection.

The hot inner op of small/medium scenes (reference Triangle::rayIntersect
inside BVHNode::traverse, Geometry.h:89-105,399-427) as a hand-scheduled
TPU kernel: rays are tiled into VREG-aligned VMEM blocks (one grid
program per ray block); the triangle SoA sits in SMEM and each triangle
is scalar-broadcast against the whole ray block on the VPU — dense,
divergence-free, no gathers, no HBM intermediates.  This is the
speed-of-light form of brute-force intersection on a vector machine.

One kernel serves both query types: `t_init` seeds the per-ray search
radius, so closest-hit passes +inf and any-hit passes the segment length
(an occlusion exists iff a triangle id was recorded).

Works under `interpret=True` on CPU (used by tests); the compiled path is
gated by `use_pallas()` so the renderer falls back to the lax.scan
version on backends where Mosaic is unavailable.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..core.vec import V3
from ..geometry.intersect import BIG_T, DET_EPS, Hit
from ..scene.types import Triangles

RAY_SUB = 16           # sublane rows per ray block
RAY_LANE = 128         # lane columns (fixed by the VREG shape)
RAY_BLOCK = RAY_SUB * RAY_LANE   # rays per grid program
MAX_SMEM_TRIS = 4096   # 9 f32 each = 147 KB of SMEM; dispatch cap

_BLK = (RAY_SUB, RAY_LANE)


def _kernel(rows_ref, ox_ref, oy_ref, oz_ref, dx_ref, dy_ref, dz_ref,
            t0_ref, t_ref, tri_ref, u_ref, v_ref, *, n_tri: int):
    """One program: RAY_BLOCK rays vs every triangle.

    rows_ref: (T, 9) SMEM triangle rows [p0, e1, e2].  Ray components and
    outputs are (RAY_SUB, RAY_LANE) VMEM blocks — strictly 2-D shapes so
    Mosaic's vector layout inference never sees implicit dims.
    """
    ox = ox_ref[...]
    oy = oy_ref[...]
    oz = oz_ref[...]
    dx = dx_ref[...]
    dy = dy_ref[...]
    dz = dz_ref[...]

    init = (t0_ref[...],
            jnp.full(_BLK, -1, jnp.int32),
            jnp.zeros(_BLK, jnp.float32),
            jnp.zeros(_BLK, jnp.float32))

    def tri_body(k, carry):
        t_b, tri_b, u_b, v_b = carry
        p0x = rows_ref[k, 0]
        p0y = rows_ref[k, 1]
        p0z = rows_ref[k, 2]
        e1x = rows_ref[k, 3]
        e1y = rows_ref[k, 4]
        e1z = rows_ref[k, 5]
        e2x = rows_ref[k, 6]
        e2y = rows_ref[k, 7]
        e2z = rows_ref[k, 8]
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
        hit = ((jnp.abs(det) >= DET_EPS) & (u >= 0.0) & (v >= 0.0)
               & (u + v <= 1.0) & (t > 0.0) & (t < t_b))
        return (jnp.where(hit, t, t_b),
                jnp.where(hit, k, tri_b).astype(jnp.int32),
                jnp.where(hit, u, u_b),
                jnp.where(hit, v, v_b))

    t_b, tri_b, u_b, v_b = jax.lax.fori_loop(0, n_tri, tri_body, init)
    t_ref[...] = t_b
    tri_ref[...] = tri_b
    u_ref[...] = u_b
    v_ref[...] = v_b


def _pack_tris(tris: Triangles) -> jax.Array:
    """(T, 9) rows [p0 e1 e2]."""
    return jnp.stack([
        tris.p0.x, tris.p0.y, tris.p0.z,
        tris.e1.x, tris.e1.y, tris.e1.z,
        tris.e2.x, tris.e2.y, tris.e2.z], axis=-1)


def intersect_pallas(tris: Triangles, o: V3, d: V3, t_init,
                     interpret: bool = False) -> Hit:
    """All-pairs MT via the Pallas kernel; t_init bounds the search."""
    n = o.x.shape[0]
    n_tri = tris.count
    if n_tri > MAX_SMEM_TRIS:
        raise ValueError(f"{n_tri} triangles exceed the SMEM-resident "
                         f"brute-force cap {MAX_SMEM_TRIS}; use the BVH")
    pad = (-n) % RAY_BLOCK
    n_pad = n + pad
    rows = _pack_tris(tris)

    def grid2d(x, fill=0.0):
        x = jnp.pad(x.astype(jnp.float32), (0, pad),
                    constant_values=fill)
        return x.reshape(n_pad // RAY_LANE, RAY_LANE)

    t0 = jnp.broadcast_to(t_init, (n,)).astype(jnp.float32)
    n_blocks = n_pad // RAY_BLOCK

    kernel = functools.partial(_kernel, n_tri=n_tri)
    grid_rows = n_pad // RAY_LANE
    out_shapes = (
        jax.ShapeDtypeStruct((grid_rows, RAY_LANE), jnp.float32),
        jax.ShapeDtypeStruct((grid_rows, RAY_LANE), jnp.int32),
        jax.ShapeDtypeStruct((grid_rows, RAY_LANE), jnp.float32),
        jax.ShapeDtypeStruct((grid_rows, RAY_LANE), jnp.float32),
    )
    blk_spec = pl.BlockSpec(_BLK, lambda i: (i, 0),
                            memory_space=pltpu.VMEM)
    t, tri, u, v = pl.pallas_call(
        kernel,
        grid=(n_blocks,),
        in_specs=[pl.BlockSpec(memory_space=pltpu.SMEM)]
        + [blk_spec] * 7,
        out_specs=(blk_spec, blk_spec, blk_spec, blk_spec),
        out_shape=out_shapes,
        interpret=interpret,
    )(rows, grid2d(o.x), grid2d(o.y), grid2d(o.z),
      grid2d(d.x), grid2d(d.y, 1.0), grid2d(d.z), grid2d(t0))
    return Hit(t.reshape(-1)[:n], tri.reshape(-1)[:n],
               u.reshape(-1)[:n], v.reshape(-1)[:n])


def closest_hit_pallas(tris: Triangles, o: V3, d: V3,
                       interpret: bool = False) -> Hit:
    """Drop-in for intersect.closest_hit_brute via the Pallas kernel."""
    n = o.x.shape[0]
    return intersect_pallas(tris, o, d, jnp.full(n, BIG_T, jnp.float32),
                            interpret=interpret)


def any_hit_pallas(tris: Triangles, o: V3, d: V3, max_t,
                   interpret: bool = False) -> jax.Array:
    """True where segment [0, max_t] is occluded."""
    hit = intersect_pallas(tris, o, d, max_t, interpret=interpret)
    return hit.tri >= 0


def use_pallas() -> bool:
    """Compiled Pallas path is TPU-only (Mosaic)."""
    try:
        return jax.default_backend() == "tpu"
    except Exception:  # pragma: no cover
        return False
