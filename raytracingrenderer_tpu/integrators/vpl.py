"""Instant radiosity: VPL generation + camera-ray gather.

Wavefront re-design of reference traceVPLs/VPLTracePath/
computeVPLsContribution (/root/reference/RTBase/Renderer.h:81-218):
pass 1 traces a fixed-size batch of light paths whose diffuse vertices
deposit VPLs into a static-shape table (MAX_VPL paths x (max_depth+1)
slots, invalid slots masked); pass 2 shoots camera rays and gathers
sum(Le_vpl * f * G * V) with a lax.scan over VPL slots — each iteration
is one full-width shadow-ray batch, so the O(pixels x VPLs) loop stays
data-parallel.

Estimator math is the corrected form (emission pdf included; the
reference drops the direction pdf at the first vertex, Renderer.h:174).
"""
from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from ..config import EPSILON, MAX_VPL, RenderConfig
from ..core.frame import Frame
from ..core.vec import V3, vwhere
from ..geometry import intersect
from ..imaging import film as film_mod
from ..materials import bsdf as bsdf_mod
from ..sampling import rng, warps
from ..scene.camera import generate_rays
from ..scene.types import Scene
from ..render import pixel_grid
from .common import shading_data


class VPLs(NamedTuple):
    x: V3        # position
    n: V3        # normal
    le: V3       # carried radiance (already /pdfs/N)
    valid: jax.Array


def trace_vpls(scene: Scene, key, cfg: RenderConfig,
               n_paths: int = MAX_VPL) -> VPLs:
    n_area = scene.num_lights
    n = n_paths
    slots = cfg.max_depth + 2  # light vertex + bounces
    if n_area == 0:
        z = V3.zeros((slots * n,))
        return VPLs(z, z, z, jnp.zeros(slots * n, bool))

    r_pick = rng.uniform(key, 0, rng.LIGHT_PICK, (n,))
    li = jnp.minimum((r_pick * n_area).astype(jnp.int32), n_area - 1)
    tri = scene.lights.tri[li]
    tris = scene.triangles
    r1 = rng.uniform(key, 0, rng.LIGHT_POS_U, (n,))
    r2 = rng.uniform(key, 0, rng.LIGHT_POS_V, (n,))
    _, b, g = warps.uniform_triangle(r1, r2)
    p = tris.p0.gather(tri) + tris.e1.gather(tri) * b \
        + tris.e2.gather(tri) * g
    ln = tris.gn.gather(tri)
    le = scene.lights.le.gather(li)
    pmf = 1.0 / n_area
    pdf_pos = 1.0 / jnp.maximum(scene.lights.area[li], 1e-12)
    inv_np = 1.0 / n_paths

    # VPL 0: on the light itself (radiance, not irradiance)
    vpl_x = [p]
    vpl_n = [ln]
    vpl_le = [le * (inv_np / (pmf * pdf_pos))]
    vpl_ok = [jnp.ones(n, bool)]

    r3 = rng.uniform(key, 0, rng.BSDF_U, (n,))
    r4 = rng.uniform(key, 0, rng.BSDF_V, (n,))
    wl = warps.cosine_hemisphere(r3, r4)
    wi = Frame.from_normal(ln).to_world(wl)
    pdf_dir = warps.cosine_hemisphere_pdf(wl)
    # flux-ish carried term: Le cos / (pmf pdf_pos pdf_dir N)
    carried = le * (wl.z * inv_np
                    / jnp.maximum(pmf * pdf_pos * pdf_dir, 1e-12))

    o = p + wi * EPSILON
    d = wi
    beta = V3.full(n, 1.0, 1.0, 1.0)
    alive = jnp.ones(n, bool)
    for depth in range(cfg.max_depth + 1):
        hit = intersect.closest_hit(scene, o, d)
        found = hit.valid & alive
        sh = shading_data(scene, hit, o, d)
        specular = bsdf_mod.is_specular(sh.mp.mtype)
        deposit = found & ~sh.mp.is_emissive & ~specular
        # Deposited VPL "radiosity" = incident flux estimate (beta *
        # carried) times the vertex's BRDF toward the (diffuse-assumed)
        # gather direction; the receiver-side f applies in vpl_pass.
        up = V3.full(n, 0.0, 0.0, 1.0)
        f_vpl = bsdf_mod.evaluate(sh.mp, sh.wo_local, up, cfg.mat_types)
        vpl_x.append(sh.x)
        vpl_n.append(sh.sn)
        vpl_le.append(beta * carried * f_vpl)
        vpl_ok.append(deposit)

        rr_p = jnp.minimum(beta.lum(), cfg.rr_cap)
        r_rr = rng.uniform(key, depth + 1, rng.RR, (n,))
        survive = deposit & (r_rr < rr_p)
        beta = vwhere(survive, beta / jnp.maximum(rr_p, 1e-9), beta)
        b1 = rng.uniform(key, depth + 1, rng.BSDF_U, (n,))
        b2 = rng.uniform(key, depth + 1, rng.BSDF_V, (n,))
        bl = rng.uniform(key, depth + 1, rng.BSDF_LOBE, (n,))
        wi2, colour, pdf, ok = bsdf_mod.sample(sh.mp, sh.wo_local, b1, b2,
                                               bl, cfg.mat_types)
        weight = colour * (jnp.abs(wi2.z) / jnp.maximum(pdf, 1e-9))
        alive = survive & ok & (weight.max_comp() > 0.0)
        beta = vwhere(alive, beta * weight, beta)
        w_world = sh.frame.to_world(wi2)
        o = vwhere(alive, sh.x + w_world * EPSILON, o)
        d = vwhere(alive, w_world, d)

    cat = lambda vs: jnp.concatenate(vs)  # noqa: E731
    return VPLs(
        x=V3(cat([v.x for v in vpl_x]), cat([v.y for v in vpl_x]),
             cat([v.z for v in vpl_x])),
        n=V3(cat([v.x for v in vpl_n]), cat([v.y for v in vpl_n]),
             cat([v.z for v in vpl_n])),
        le=V3(cat([v.x for v in vpl_le]), cat([v.y for v in vpl_le]),
              cat([v.z for v in vpl_le])),
        valid=cat(vpl_ok))


def vpl_pass(scene: Scene, film: film_mod.Film, key,
             cfg: RenderConfig) -> film_mod.Film:
    """One instant-radiosity frame (both passes)."""
    vpls = trace_vpls(scene, rng.decision_key(key, 0, 15), cfg)
    cam = scene.camera
    xs, ys = pixel_grid(cam.height, cam.width)
    o, d = generate_rays(cam, xs + 0.5, ys + 0.5)
    hit = intersect.closest_hit(scene, o, d)
    sh = shading_data(scene, hit, o, d)
    shade = hit.valid & ~sh.mp.is_emissive \
        & ~bsdf_mod.is_specular(sh.mp.mtype)
    npix = o.x.shape[0]

    def gather_one(acc, slot):
        vx = vpls.x.gather(slot)
        vn = vpls.n.gather(slot)
        vle = vpls.le.gather(slot)
        ok = vpls.valid[slot]
        to_v = V3(vx.x - sh.x.x, vx.y - sh.x.y, vx.z - sh.x.z)
        d2 = to_v.length_sq()
        near = d2 < 1e-4  # reference skips near VPLs (Renderer.h:135)
        dir_ = to_v * jax.lax.rsqrt(jnp.maximum(d2, 1e-12))
        cos_v = vn.dot(-dir_)
        cos_x = sh.sn.dot(dir_)
        cand = shade & ok & ~near & (cos_v > 0.0) & (cos_x > 0.0)
        g_term = jnp.where(cand, cos_v * cos_x / jnp.maximum(d2, 1e-12),
                           0.0)
        dist = jnp.sqrt(jnp.maximum(d2, 1e-12))
        occ = intersect.occluded(
            scene, sh.x + dir_ * EPSILON, dir_,
            jnp.where(cand, dist - 2.0 * EPSILON, -1.0))
        f = bsdf_mod.evaluate(sh.mp, sh.wo_local, sh.frame.to_local(dir_),
                              cfg.mat_types)
        contrib = vle * f * jnp.where(occ, 0.0, g_term)
        return acc + contrib, None

    n_slots = vpls.valid.shape[0]
    acc = V3.zeros(npix)
    acc, _ = jax.lax.scan(gather_one, acc,
                          jnp.arange(n_slots, dtype=jnp.int32))
    # direct emission for camera rays that hit lights
    acc = acc + vwhere(hit.valid & sh.mp.is_emissive
                       & (d.dot(sh.gn_raw) < 0.0), sh.mp.emission,
                       V3.zeros(npix))
    img = acc.stacked().reshape(cam.height, cam.width, 3)
    return film_mod.add_sample_image(film, img)
