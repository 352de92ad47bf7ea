"""Shared integrator pieces: shading-data construction and NEE.

Vectorized equivalents of reference Scene::calculateShadingData
(/root/reference/RTBase/Scene.h:174-203) and RayTracer::computeDirect /
computeDirectMIS (Renderer.h:423-557).
"""
from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from ..config import EPSILON
from ..core.frame import Frame
from ..core.vec import V3, vwhere
from ..geometry.intersect import Hit, occluded
from ..lights import lights as lights_mod
from ..materials import bsdf as bsdf_mod
from ..scene.types import Scene


class Shading(NamedTuple):
    x: V3              # hit position
    sn: V3             # shading normal (two-sided-flipped where the
                       # material is two-sided)
    gn: V3             # geometric normal (same flip rule)
    gn_raw: V3         # canonical geometric normal (no flip) — emission
                       # sidedness keys off this (AreaLight::evaluate is
                       # one-sided, Lights.h:40-47)
    frame: Frame
    wo_local: V3
    uv_u: jax.Array
    uv_v: jax.Array
    mp: bsdf_mod.MatParams
    light_id: jax.Array  # light-table row if the hit triangle is emissive


def shading_data(scene: Scene, hit: Hit, o: V3, d: V3) -> Shading:
    """Interpolate attributes at the hit (reference Scene.h:174-203:
    barycentric normal/uv, two-sided flip toward wo, frame build)."""
    tris = scene.triangles
    tri = jnp.maximum(hit.tri, 0)
    beta = hit.u
    gamma = hit.v
    alpha = 1.0 - beta - gamma
    n = (tris.n0.gather(tri) * alpha + tris.n1.gather(tri) * beta
         + tris.n2.gather(tri) * gamma).normalize()
    uv = (tris.uv0[tri] * alpha[:, None] + tris.uv1[tri] * beta[:, None]
          + tris.uv2[tri] * gamma[:, None])
    # tris.gn is canonicalized at load time to agree with vertex normal 0
    # (reference Triangle::gNormal semantics).
    gn = tris.gn.gather(tri)
    x = o + d * hit.t
    wo = -d
    mid = tris.mat_id[tri]
    mp = bsdf_mod.gather_params(scene.materials, scene.textures, mid,
                                uv[:, 0], uv[:, 1])
    two = bsdf_mod.is_two_sided(mp.mtype)
    flip_s = two & (wo.dot(n) < 0.0)
    flip_g = two & (wo.dot(gn) < 0.0)
    sn = vwhere(flip_s, -n, n)
    gn_raw = gn
    gn = vwhere(flip_g, -gn, gn)
    frame = Frame.from_normal(sn)
    return Shading(x=x, sn=sn, gn=gn, gn_raw=gn_raw, frame=frame,
                   wo_local=frame.to_local(wo),
                   uv_u=uv[:, 0], uv_v=uv[:, 1], mp=mp,
                   light_id=tris.light_id[tri])


def balance_heuristic(pdf_a, pdf_b):
    """Reference Renderer.h:408-410."""
    return pdf_a / jnp.maximum(pdf_a + pdf_b, 1e-20)


def compute_direct(scene: Scene, sh: Shading, active, r_pick, r1, r2,
                   mis: bool) -> V3:
    """One-light one-sample NEE; with `mis` the light-strategy term is
    balance-weighted against the BSDF pdf (computeDirectMIS light half,
    Renderer.h:474-512).  The BSDF-strategy half lives in the bounce loop
    (emission weighting), unlike the reference's extra scout ray."""
    ls = lights_mod.sample_one(scene, sh.x, sh.sn, r_pick, r1, r2)
    specular = bsdf_mod.is_specular(sh.mp.mtype)
    cand = active & ls.valid & ~specular
    wi_local = sh.frame.to_local(ls.wi)
    f = bsdf_mod.evaluate(sh.mp, sh.wo_local, wi_local)
    contrib = f * ls.emitted * ls.g_over_pdf
    if mis:
        pdf_b = bsdf_mod.pdf_fn(sh.mp, sh.wo_local, wi_local)
        contrib = contrib * balance_heuristic(ls.pdf_solid, pdf_b)
    worth = cand & (contrib.max_comp() > 0.0)
    # shadow ray (reference Scene::visible: epsilon pullback both ends)
    shadow_o = sh.x + ls.wi * EPSILON
    max_t = jnp.where(ls.dist >= lights_mod.INF_DIST, 1e30,
                      ls.dist - 2.0 * EPSILON)
    # mask inactive lanes by zero-length rays to save traversal work
    occ = occluded(scene, shadow_o,
                   vwhere(worth, ls.wi, V3.full(jnp.shape(r1), 0.0, 0.0, 1.0)),
                   jnp.where(worth, max_t, -1.0))
    lit = worth & ~occ
    return vwhere(lit, contrib, V3.zeros(jnp.shape(r1)))
