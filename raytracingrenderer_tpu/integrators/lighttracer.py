"""Light tracer (adjoint transport): light paths splatted to the camera.

Wavefront re-design of reference lightTracer/connectToCamera/
lightTracePath (/root/reference/RTBase/Renderer.h:220-326): a batch of
light paths advances through a lax.scan over bounces; every vertex
connects to the camera with importance W_e = 1/(A_film cos^4 theta) and
geometry G, and contributions scatter-add into the film.  The reference
runs this single-threaded because film splats race (SURVEY.md §3.3);
here the scatter-add is race-free by construction and shards cleanly
(per-shard partial films psum-reduced).
"""
from __future__ import annotations

import jax
import jax.numpy as jnp

from ..config import EPSILON, RenderConfig
from ..core.frame import Frame
from ..core.vec import V3, vwhere
from ..geometry import intersect
from ..imaging import film as film_mod
from ..materials import bsdf as bsdf_mod
from ..sampling import rng, warps
from ..scene import camera as camera_mod
from ..scene.types import Scene
from .common import shading_data


def _connect(scene: Scene, film_buf, p: V3, n: V3, col: V3, active):
    """Project p onto the camera; splat col * W_e * G where visible
    (reference connectToCamera, Renderer.h:234-259)."""
    cam = scene.camera
    x, y, proj_ok = camera_mod.project_onto_camera(cam, p)
    to_cam = V3(cam.origin.x - p.x, cam.origin.y - p.y, cam.origin.z - p.z)
    dist2 = jnp.maximum(to_cam.length_sq(), 1e-12)
    dir_ = to_cam * jax.lax.rsqrt(dist2)
    cos_s = n.dot(dir_)
    fwd = camera_mod.view_direction(cam)
    cos_cam = fwd.dot(-dir_)
    ok = active & proj_ok & (cos_s > 0.0) & (cos_cam > 0.0)
    g = cos_s * cos_cam / dist2
    w_e = 1.0 / (cam.a_film * jnp.maximum(cos_cam ** 4, 1e-9))
    contrib = col * (g * w_e)
    dist = jnp.sqrt(dist2)
    occ = intersect.occluded(scene, p + dir_ * EPSILON, dir_,
                             jnp.where(ok, dist - 2.0 * EPSILON, -1.0))
    ok = ok & ~occ
    rgb = jnp.where(ok[:, None], contrib.stacked(), 0.0)
    return film_mod.splat(film_mod.Film(film_buf, jnp.float32(0)),
                          x, y, rgb).buffer


def light_trace_pass(scene: Scene, film: film_mod.Film, key,
                     cfg: RenderConfig, n_paths: int,
                     mesh=None) -> film_mod.Film:
    """One pass of n_paths light paths; increments film spp by 1 (the
    reference shoots width*height paths per frame, Renderer.h:222-229).

    With `mesh`, the path axis is sharded across its `rays` axis and the
    film stays replicated: XLA partitions the whole bounce scan SPMD and
    reduces the per-shard scatter-add partials with an inserted psum —
    the sharded-film-accumulation design SURVEY §2.11 calls for (the
    reference must run this single-threaded because its splats race,
    Renderer.h:223-229)."""
    n_area = scene.num_lights
    buf = film.buffer
    if n_area == 0:
        return film_mod.Film(buf, film.spp + 1.0)
    n = n_paths
    pmf = 1.0 / max(lights_mod_num(scene), 1)

    # ---- sample light position + direction ---------------------------
    r_pick = rng.uniform(key, 0, rng.LIGHT_PICK, (n,))
    li = jnp.minimum((r_pick * n_area).astype(jnp.int32), n_area - 1)
    tri = scene.lights.tri[li]
    tris = scene.triangles
    r1 = rng.uniform(key, 0, rng.LIGHT_POS_U, (n,))
    r2 = rng.uniform(key, 0, rng.LIGHT_POS_V, (n,))
    a, b, g = warps.uniform_triangle(r1, r2)
    p = tris.p0.gather(tri) + tris.e1.gather(tri) * b \
        + tris.e2.gather(tri) * g
    ln = tris.gn.gather(tri)
    pdf_pos = 1.0 / jnp.maximum(scene.lights.area[li], 1e-12)
    le = scene.lights.le.gather(li)

    # cosine-sampled emission direction (AreaLight::sampleDirectionFromLight)
    r3 = rng.uniform(key, 0, rng.BSDF_U, (n,))
    r4 = rng.uniform(key, 0, rng.BSDF_V, (n,))
    wl = warps.cosine_hemisphere(r3, r4)
    lf = Frame.from_normal(ln)
    wi = lf.to_world(wl)
    pdf_dir = warps.cosine_hemisphere_pdf(wl)

    # radiance-over-pdf carried along the path (lightTrace_init,
    # Renderer.h:260-286)
    le_over = le * (wl.z / jnp.maximum(pmf * pdf_dir * pdf_pos, 1e-12))
    # connect the light vertex itself (emitted radiance toward camera)
    buf = _connect(scene, buf, p, ln,
                   le * (1.0 / jnp.maximum(pmf * pdf_pos, 1e-12)),
                   jnp.ones(n, bool))

    state = dict(o=p + wi * EPSILON, d=wi,
                 throughput=V3.full(n, 1.0, 1.0, 1.0),
                 alive=jnp.ones(n, bool), buf=buf)
    if mesh is not None:
        from jax.sharding import NamedSharding, PartitionSpec as P
        from ..parallel.mesh import RAY_AXIS
        ray_s = NamedSharding(mesh, P(RAY_AXIS))
        rep = NamedSharding(mesh, P())
        state = {k: (jax.lax.with_sharding_constraint(v, rep)
                     if k == "buf" else jax.tree_util.tree_map(
                         lambda a: jax.lax.with_sharding_constraint(
                             a, ray_s), v))
                 for k, v in state.items()}

    def bounce(state, depth):
        o, d, beta = state["o"], state["d"], state["throughput"]
        alive = state["alive"]
        buf = state["buf"]
        hit = intersect.closest_hit(scene, o, d)
        found = hit.valid & alive
        sh = shading_data(scene, hit, o, d)
        specular = bsdf_mod.is_specular(sh.mp.mtype)
        connectable = found & ~sh.mp.is_emissive & ~specular

        to_cam = V3(scene.camera.origin.x - sh.x.x,
                    scene.camera.origin.y - sh.x.y,
                    scene.camera.origin.z - sh.x.z).normalize()
        f = bsdf_mod.evaluate(sh.mp, sh.wo_local,
                              sh.frame.to_local(to_cam),
                              cfg.mat_types)
        col = beta * f * le_over
        buf = _connect(scene, buf, sh.x, sh.sn, col, connectable)

        # RR + BSDF continue (lightTracePath, Renderer.h:303-324)
        rr_p = jnp.minimum(beta.lum(), cfg.rr_cap)
        r_rr = rng.uniform(key, depth + 1, rng.RR, (n,))
        survive = connectable & (r_rr < rr_p)
        beta = vwhere(survive, beta / jnp.maximum(rr_p, 1e-9), beta)
        b1 = rng.uniform(key, depth + 1, rng.BSDF_U, (n,))
        b2 = rng.uniform(key, depth + 1, rng.BSDF_V, (n,))
        bl = rng.uniform(key, depth + 1, rng.BSDF_LOBE, (n,))
        wi2, colour, pdf, ok = bsdf_mod.sample(sh.mp, sh.wo_local, b1, b2,
                                               bl, cfg.mat_types)
        weight = colour * (jnp.abs(wi2.z) / jnp.maximum(pdf, 1e-9))
        alive_next = survive & ok & (weight.max_comp() > 0.0)
        beta = vwhere(alive_next, beta * weight, beta)
        w_world = sh.frame.to_world(wi2)
        return dict(o=vwhere(alive_next, sh.x + w_world * EPSILON, o),
                    d=vwhere(alive_next, w_world, d),
                    throughput=beta, alive=alive_next, buf=buf), None

    state, _ = jax.lax.scan(bounce, state,
                            jnp.arange(cfg.max_depth + 1, dtype=jnp.int32))
    return film_mod.Film(state["buf"], film.spp + 1.0)


def lights_mod_num(scene: Scene) -> int:
    from ..lights.lights import num_lights
    return num_lights(scene)
