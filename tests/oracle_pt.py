"""Independent numpy path-tracer oracle (diffuse + area lights + NEE).

Written against the reference algorithm (RTBase/Renderer.h:328-473)
directly in vectorized numpy, sharing NO code with the JAX framework —
used by tests to arbitrate radiometric correctness of the real renderer.
Supports diffuse-only scenes (cornell-box class).
"""
from __future__ import annotations

import numpy as np

BIG = 1e30
EPS = 1e-4


class OracleScene:
    def __init__(self, scene):
        """Extract numpy arrays from a loaded Scene pytree."""
        t = scene.triangles
        self.p0 = np.asarray(t.p0.stacked())
        self.e1 = np.asarray(t.e1.stacked())
        self.e2 = np.asarray(t.e2.stacked())
        self.gn = np.asarray(t.gn.stacked())
        self.n0 = np.asarray(t.n0.stacked())
        self.n1 = np.asarray(t.n1.stacked())
        self.n2 = np.asarray(t.n2.stacked())
        self.area = np.asarray(t.area)
        self.mat_id = np.asarray(t.mat_id)
        m = scene.materials
        self.albedo = np.asarray(m.albedo.stacked())
        self.emission = np.asarray(m.emission.stacked())
        self.light_tri = np.asarray(scene.lights.tri)
        self.light_le = np.asarray(scene.lights.le.stacked())
        self.light_area = np.asarray(scene.lights.area)
        cam = scene.camera
        self.p_inv = np.asarray(cam.p_inv)
        self.c2w = np.asarray(cam.cam_to_world)
        self.origin = np.array([float(cam.origin.x), float(cam.origin.y),
                                float(cam.origin.z)])
        self.width, self.height = cam.width, cam.height


def _normalize(v):
    return v / np.maximum(np.linalg.norm(v, axis=-1, keepdims=True), 1e-20)


def intersect_all(sc, o, d):
    """Brute force closest hit. o,d: (N,3). Returns t, tri, bary(b,g)."""
    p0 = sc.p0[None]  # (1,T,3)
    e1 = sc.e1[None]
    e2 = sc.e2[None]
    dN = d[:, None]
    oN = o[:, None]
    pvec = np.cross(dN, e2)                       # (N,T,3)
    det = (e1 * pvec).sum(-1)
    inv = np.where(np.abs(det) < 1e-12, 0.0, 1.0 / det)
    tvec = oN - p0
    u = (tvec * pvec).sum(-1) * inv
    qvec = np.cross(tvec, np.broadcast_to(e1, tvec.shape))
    v = (dN * qvec).sum(-1) * inv
    t = (e2 * qvec).sum(-1) * inv
    hit = (np.abs(det) >= 1e-12) & (u >= 0) & (v >= 0) & (u + v <= 1) & (t > 0)
    t = np.where(hit, t, BIG)
    j = np.argmin(t, axis=1)
    n = np.arange(len(o))
    return t[n, j], np.where(t[n, j] < BIG, j, -1), u[n, j], v[n, j]


def occluded(sc, o, d, max_t):
    t, tri, _, _ = intersect_all(sc, o, d)
    return (tri >= 0) & (t < max_t)


def cosine_sample(rng, n, normal):
    r1 = rng.random(n)
    r2 = rng.random(n)
    theta = np.arccos(np.sqrt(r1))
    phi = 2 * np.pi * r2
    lz = np.cos(theta)
    lx = np.sin(theta) * np.cos(phi)
    ly = np.sin(theta) * np.sin(phi)
    # build frame
    s = np.where(normal[:, 2] >= 0, 1.0, -1.0)
    a = -1.0 / (s + normal[:, 2])
    b = normal[:, 0] * normal[:, 1] * a
    t = np.stack([1 + s * normal[:, 0] ** 2 * a, s * b,
                  -s * normal[:, 0]], -1)
    bt = np.stack([b, s + normal[:, 1] ** 2 * a, -normal[:, 1]], -1)
    return (t * lx[:, None] + bt * ly[:, None] + normal * lz[:, None],
            lz / np.pi)


def render_mean(scene, spp=8, max_depth=4, seed=0,
                double_count_direct=False):
    """Render and return the (H, W, 3) image (pixel centres, NEE, RR).
    `double_count_direct=True` disables the canHitLight gate (adds
    emissive hits on top of NEE) to test the hypothesis that a reference
    artifact was rendered without the gate."""
    sc = OracleScene(scene)
    rng = np.random.default_rng(seed)
    H, W = sc.height, sc.width
    xs, ys = np.meshgrid(np.arange(W) + 0.5, np.arange(H) + 0.5)
    xp = (xs.ravel() / W) * 2 - 1
    yp = (1 - ys.ravel() / H) * 2 - 1
    npix = H * W
    ones = np.ones(npix)
    dirh = np.stack([xp, yp, ones, ones], -1) @ sc.p_inv.T
    d0 = _normalize((dirh[:, :3] / dirh[:, 3:]) @ sc.c2w[:3, :3].T)
    img = np.zeros((npix, 3))
    n_lights = len(sc.light_tri)
    for s in range(spp):
        o = np.repeat(sc.origin[None], npix, 0)
        d = d0.copy()
        beta = np.ones((npix, 3))
        L = np.zeros((npix, 3))
        can_hit = np.ones(npix, bool)
        alive = np.ones(npix, bool)
        for depth in range(max_depth + 2):
            t, tri, u, v = intersect_all(sc, o, d)
            found = alive & (tri >= 0)
            tri_s = np.maximum(tri, 0)
            mid = sc.mat_id[tri_s]
            em = sc.emission[mid]
            is_light = found & (em.max(1) > 0)
            gate = can_hit | double_count_direct
            L += np.where((is_light & gate)[:, None], beta * em, 0.0)
            shade = found & ~is_light
            x = o + d * t[:, None]
            a = 1 - u - v
            sn = _normalize(sc.n0[tri_s] * a[:, None]
                            + sc.n1[tri_s] * u[:, None]
                            + sc.n2[tri_s] * v[:, None])
            sn = np.where((np.einsum('nk,nk->n', -d, sn) < 0)[:, None],
                          -sn, sn)
            # NEE
            li = rng.integers(0, n_lights, npix)
            lt = sc.light_tri[li]
            r1 = rng.random(npix)
            r2 = rng.random(npix)
            sq = np.sqrt(r1)
            al = 1 - sq
            be = r2 * sq
            p = (sc.p0[lt] + sc.e1[lt] * be[:, None]
                 + sc.e2[lt] * (1 - al - be)[:, None])
            ln = sc.gn[lt]
            ln = np.where((np.einsum('nk,nk->n', sc.n0[lt], ln)
                           > 0)[:, None], ln, -ln)
            tol = p - x
            d2 = np.maximum(np.einsum('nk,nk->n', tol, tol), 1e-12)
            dist = np.sqrt(d2)
            wi = tol / dist[:, None]
            cos_s = np.maximum(np.einsum('nk,nk->n', wi, sn), 0)
            cos_l = np.maximum(-np.einsum('nk,nk->n', wi, ln), 0)
            g = cos_s * cos_l / d2
            cand = shade & (g > 0)
            occ = occluded(sc, x + wi * EPS, wi, dist - 2 * EPS)
            lit = cand & ~occ
            f = sc.albedo[mid] / np.pi
            contrib = f * sc.light_le[li] * (
                g * sc.light_area[li] * n_lights)[:, None]
            L += np.where(lit[:, None], beta * contrib, 0.0)
            if depth > max_depth:
                break
            # RR
            lum = (0.2126 * beta[:, 0] + 0.7152 * beta[:, 1]
                   + 0.0722 * beta[:, 2])
            p_rr = np.minimum(lum, 0.9)
            survive = shade & (rng.random(npix) < p_rr)
            beta = np.where(survive[:, None],
                            beta / np.maximum(p_rr, 1e-9)[:, None], beta)
            # cosine bounce
            wi_b, pdf = cosine_sample(rng, npix, sn)
            # f*cos/pdf = albedo
            beta = np.where(survive[:, None], beta * sc.albedo[mid], beta)
            o = x + wi_b * EPS
            d = wi_b
            can_hit = np.zeros(npix, bool)
            alive = survive
            if not alive.any():
                break
        img += L
    return (img / spp).reshape(H, W, 3)
