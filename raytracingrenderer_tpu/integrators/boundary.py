"""Silhouette/visibility boundary-term estimator for NEE (edge sampling).

The detached-sampling strategy (diff.py) differentiates only the
INTERIOR term of the rendering integral: occlusion bits are
stop-gradiented, so the edge integral of a moving silhouette — the
dominant gradient on shadow-edge losses — is missing, measured at 253%
wrong-signed bias on the r4 shadow-edge probe (docs/BOUNDARY_BIAS_r4.md).

This module estimates that boundary term for the DIRECT (NEE) integral
over area lights, the dominant boundary for area-lit scenes, via edge
sampling in the style of Li et al. 2018 ("Differentiable Monte Carlo Ray
Tracing through Edge Sampling"), with the radiance jump evaluated
numerically by two-sided visibility probes (robust to overlapping
occluders, no silhouette/adjacency data structure needed):

    dL/dtheta |boundary = sum over occlusion-boundary curves C on the
    light surface of  INT_C  -J(y) h(y) (dy/dtheta . m) dsigma(y)

where h = f * Le * G is the (continuous) direct integrand without V,
m is a unit normal of C in the light plane, and J = lit(y + eps*m) -
lit(y - eps*m) in {-1, 0, +1} is the visibility jump.  Monte Carlo:
sample a point z on a mesh edge (length-weighted over ALL triangle
edges), project it from the shading point x onto the light plane to get
a candidate boundary point y, probe both sides, and weight by the
curve-measure Jacobian |dy/dt| / pmf(edge).  Non-silhouette edges and
edges buried behind other occluders get J = 0 automatically.

The estimator is injected as a ZERO-PRIMAL term: the contribution is
    -J * detach(h * w) * ((y(theta) - detach(y(theta))) . m)
whose value is 0 (forward images are bit-unchanged) and whose
jax.grad is the boundary integral — same straight-through pattern as
the interior reparameterization in common.shading_data.

The boundary velocity dy/dtheta differentiates the projection through
both the edge endpoints AND the shading point x (sh.x carries
d(hit)/d(vertex) under geom_grads), so shading points riding moving
geometry contribute their own boundary sweep.

Scope (documented descopes, all higher-order relative to the NEE
visibility boundary this fixes):
  - area lights only (environment/constant-background visibility
    boundaries are not estimated);
  - indirect visibility boundaries (BSDF-sampled paths crossing
    silhouettes) and the PRIMARY camera-silhouette boundary (pixels
    whose primary hit flips as geometry moves) are not estimated —
    the latter is not even a well-defined continuum derivative for
    centre-sampled pixels (jitter=False).

Enabled by cfg.boundary_grads (off by default: costs
2*boundary_samples extra shadow batches per bounce).
"""
from __future__ import annotations

import jax
import jax.numpy as jnp

from ..config import EPSILON, RenderConfig
from ..core.vec import V3, vwhere
from ..geometry.intersect import occluded
from ..lights import lights as lights_mod
from ..materials import bsdf as bsdf_mod
from ..sampling import rng
from ..scene.types import Scene
from .common import Shading

sg = jax.lax.stop_gradient


def _edge_table(scene: Scene):
    """(3T,) edge lengths + cdf for length-weighted edge sampling.

    Detached: the sampling density is part of the estimator, not the
    integrand.  Loop-invariant, so XLA hoists it out of the bounce scan.
    """
    tr = jax.lax.stop_gradient(scene.triangles)
    l0 = tr.e1.length()
    l1 = (tr.e2 - tr.e1).length()
    l2 = tr.e2.length()
    lens = jnp.stack([l0, l1, l2], axis=1).reshape(-1)  # (3T,) edge k=3j+w
    cdf = jnp.cumsum(lens)
    total = jnp.maximum(cdf[-1], 1e-20)
    return lens, cdf, total


def _edge_endpoints(scene: Scene, tri: jax.Array, which: jax.Array):
    """Differentiable endpoints of edge `which` of triangle `tri`.

    Edges: 0 = (p0, p0+e1), 1 = (p0+e1, p0+e2), 2 = (p0+e2, p0).
    Gathered from the live triangle SoA so d(endpoint)/d(tri_p0) flows.
    """
    tr = scene.triangles
    p0 = tr.p0.gather(tri)
    e1 = tr.e1.gather(tri)
    e2 = tr.e2.gather(tri)
    a = vwhere(which == 0, p0, vwhere(which == 1, p0 + e1, p0 + e2))
    b = vwhere(which == 0, p0 + e1, vwhere(which == 1, p0 + e2, p0))
    return a, b


def _pick_area_light(scene: Scene, r_pick, power: bool):
    """Area-light pick matching sample_one's selection distribution
    (uniform or power-weighted over area lights + background); lanes
    that draw the background are dropped (is_area=False) — the env
    boundary term is a documented descope."""
    n_area = scene.num_lights
    has_bg = lights_mod.background_enabled(scene)
    n_total = n_area + (1 if has_bg else 0)
    shape = jnp.shape(r_pick)
    if power:
        pmf_tab, pmf_bg = lights_mod.selection_pmf(scene, True)
        concat = [pmf_tab] if n_area else []
        if has_bg:
            concat.append(pmf_bg[None])
        pmf_all = jnp.concatenate(concat)
        cdf = jnp.cumsum(pmf_all)
        pick = jnp.clip(
            jnp.searchsorted(cdf, r_pick, side="right").astype(jnp.int32),
            0, n_total - 1)
        pmf_pick = jnp.maximum(pmf_all[pick], 1e-12)
    else:
        pick = jnp.minimum((r_pick * n_total).astype(jnp.int32),
                           n_total - 1)
        pmf_pick = jnp.full(shape, 1.0 / n_total)
    is_area = pick < n_area
    return jnp.minimum(pick, n_area - 1), pmf_pick, is_area


def boundary_direct(scene: Scene, sh: Shading, active, key, depth, ids,
                    cfg: RenderConfig) -> V3:
    """Zero-primal V3 whose gradient is the NEE visibility boundary
    term at this bounce's shading points.  Add (scaled by throughput)
    to the radiance alongside compute_direct's output."""
    if scene.num_lights == 0:
        return V3.zeros(jnp.shape(sh.uv_u))
    n = jnp.shape(sh.uv_u)[0] if jnp.ndim(sh.uv_u) else ()
    lens, cdf, total_len = _edge_table(scene)
    # The boundary velocity differentiates the edge->light projection
    # through BOTH the edge endpoints and the shading point x: when x
    # itself rides moving geometry (a path vertex on the occluder),
    # the boundary sweeps with x's motion too, and sh.x carries
    # d(hit point)/d(vertex) under geom_grads.  (Detaching x here
    # left a systematic residual on losses that include pixels on the
    # moving object.)  Probe rays still originate from the detached x.
    x = sh.x
    x_det = jax.tree_util.tree_map(sg, sh.x)
    lt = scene.lights
    out = V3.zeros(jnp.shape(sh.uv_u))

    for e in range(cfg.boundary_samples):
        ekey = jax.random.fold_in(key, 0xB0 + e)
        r_pick = rng.uniform_ids(ekey, depth, rng.BND_PICK, ids)
        r_edge = rng.uniform_ids(ekey, depth, rng.BND_EDGE, ids)
        r_t = rng.uniform_ids(ekey, depth, rng.BND_T, ids)

        li, pmf_pick, is_area = _pick_area_light(scene, r_pick,
                                                 cfg.power_lights)
        # --- light geometry (differentiable when geom_grads) ----------
        if cfg.geom_grads:
            ltri = lt.tri[li]
            q0 = scene.triangles.p0.gather(ltri)
            le1 = scene.triangles.e1.gather(ltri)
            le2 = scene.triangles.e2.gather(ltri)
        else:
            q0 = lt.p0.gather(li)
            le1 = lt.e1.gather(li)
            le2 = lt.e2.gather(li)
        n_l = le1.cross(le2)
        area2 = jnp.maximum(n_l.length(), 1e-20)   # 2*area
        n_l = n_l * (1.0 / area2)
        # canonical one-sided emission normal (the raw cross can point
        # the other way — tris.gn was canonicalized at load; using the
        # raw n_l here zeroed cos_l on every real silhouette sample)
        gn_l = jax.tree_util.tree_map(sg, lt.gn.gather(li))
        light_le = jax.tree_util.tree_map(sg, lt.le.gather(li))

        def inside(p):
            d00 = le1.dot(le1)
            d01 = le1.dot(le2)
            d11 = le2.dot(le2)
            pq = p - q0
            dp1 = pq.dot(le1)
            dp2 = pq.dot(le2)
            det = jnp.maximum(d00 * d11 - d01 * d01, 1e-20)
            al = (d11 * dp1 - d01 * dp2) / det
            be = (d00 * dp2 - d01 * dp1) / det
            return (al >= 0.0) & (be >= 0.0) & (al + be <= 1.0)

        num_det = sg(n_l.dot(q0 - x))
        S_CELLS = 8

        def valid_cells(ae, be_):
            """(N, S_CELLS) bool: grid cells of edge (ae,be_) whose
            endpoint projections land inside the light with s>1."""
            def probe_t(tv):
                zt = sg(ae + (be_ - ae) * tv)
                den_t = sg(n_l).dot(zt - sg(x))
                sd = jnp.where(jnp.abs(den_t) < 1e-12, 1.0, den_t)
                st = jnp.where(jnp.abs(den_t) < 1e-12, -1.0,
                               num_det / sd)
                yt = sg(x) + (zt - sg(x)) * st
                return (st > 1.0 + 1e-5) & sg(inside(yt))

            vend = [probe_t(jnp.float32(j / S_CELLS))
                    for j in range(S_CELLS + 1)]
            return jnp.stack([vend[j] | vend[j + 1]
                              for j in range(S_CELLS)], axis=-1)

        # --- RIS edge selection (detached structure) ------------------
        # A single length-weighted edge draw almost never projects into
        # the light (~0.04% measured on cornell): resample-importance-
        # sample E_TRY length-weighted candidates with target
        # p_hat = n_valid_cells + eps (eps > 0 keeps the estimator
        # unbiased: p_hat is positive wherever the integrand can be),
        # pick one ~ p_hat/p_len, and carry the standard Talbot-RIS
        # factor (mean of p_hat/p_len over candidates) / p_hat_pick in
        # place of 1/p_len.
        E_TRY = 4
        RIS_EPS = 0.05
        cand_k, cand_ph, cand_w = [], [], []
        for j in range(E_TRY):
            r_ej = rng.uniform_ids(jax.random.fold_in(ekey, 0xE0 + j),
                                   depth, rng.BND_EDGE, ids)
            kj = jnp.clip(
                jnp.searchsorted(cdf, r_ej * total_len, side="right")
                .astype(jnp.int32), 0, lens.shape[0] - 1)
            tj = kj // 3
            aj, bj = _edge_endpoints(scene, tj, kj - 3 * tj)
            aj = jax.tree_util.tree_map(sg, aj)
            bj = jax.tree_util.tree_map(sg, bj)
            ph = (jnp.sum(valid_cells(aj, bj), axis=-1)
                  .astype(jnp.float32) + RIS_EPS)
            cand_k.append(kj)
            cand_ph.append(ph)
            cand_w.append(ph / sg(jnp.maximum(lens[kj], 1e-12)
                                  / total_len))
        wsum = sum(cand_w)
        r_ris = rng.uniform_ids(jax.random.fold_in(ekey, 0xEF),
                                depth, rng.BND_EDGE, ids)
        target = r_ris * wsum
        acc = jnp.zeros_like(wsum)
        pick_j = jnp.zeros_like(cand_k[0])
        for j in range(E_TRY):
            prev = acc
            acc = acc + cand_w[j]
            pick_j = jnp.where((target >= prev) & (target < acc), j,
                               pick_j)
        k = jnp.stack(cand_k, 1)[jnp.arange(pick_j.shape[0]), pick_j]
        ph_pick = jnp.stack(cand_ph, 1)[jnp.arange(pick_j.shape[0]),
                                        pick_j]
        ris_w = sg(wsum / (E_TRY * jnp.maximum(ph_pick, 1e-6)))

        tri = k // 3
        which = k - 3 * tri
        a, b = _edge_endpoints(scene, tri, which)
        # never sample the picked light's own edges (its domain boundary
        # is handled by differentiable area sampling, not visibility)
        on_light = tri == jax.lax.stop_gradient(lt.tri[li])

        # --- guided t-sampling along the picked edge ------------------
        # t is drawn from a mixture: 90% from the valid cells, 10%
        # uniform so the density is positive wherever the integrand is
        # (unbiased; contributions divide by the mixture density).
        vcell = valid_cells(jax.tree_util.tree_map(sg, a),
                            jax.tree_util.tree_map(sg, b))
        n_valid = jnp.sum(vcell, axis=-1)
        csum = jnp.cumsum(vcell.astype(jnp.int32), axis=-1)
        u = rng.uniform_ids(ekey, depth, rng.BND_CELL, ids)
        guided = (u < 0.9) & (n_valid > 0)
        # k-th (0-based) valid cell, k = floor(u/0.9 * n_valid)
        kth = jnp.minimum((u / 0.9 * n_valid).astype(jnp.int32),
                          jnp.maximum(n_valid - 1, 0))
        cell = jnp.sum((csum <= kth[:, None]).astype(jnp.int32), axis=-1)
        t_guided = (cell.astype(jnp.float32) + r_t) / S_CELLS
        t_unif = jnp.clip((u - 0.9) / 0.1, 0.0, 1.0 - 1e-7)
        t_unif = jnp.where(n_valid > 0, t_unif, r_t)
        t_s = jnp.where(guided, t_guided, t_unif)
        # mixture density AT the sampled t (NOT at the guided pick —
        # the uniform branch can land in any cell)
        cell_at = jnp.minimum((t_s * S_CELLS).astype(jnp.int32),
                              S_CELLS - 1)
        g_at = jnp.where(
            jnp.take_along_axis(vcell, cell_at[:, None], axis=-1)[:, 0],
            jnp.float32(S_CELLS) / jnp.maximum(n_valid, 1), 0.0)
        dens = sg(jnp.where(n_valid > 0, 0.9 * g_at + 0.1, 1.0))
        z = a + (b - a) * t_s

        # --- project z from x onto the light plane --------------------
        zx = z - x
        denom = n_l.dot(zx)
        num = n_l.dot(q0 - x)
        safe_den = jnp.where(jnp.abs(denom) < 1e-12, 1.0, denom)
        s = jnp.where(jnp.abs(denom) < 1e-12, -1.0, num / safe_den)
        y = x + zx * s
        # z strictly between x and the light plane => it can occlude
        valid = is_area & ~on_light & (s > 1.0 + 1e-5) & active

        # --- curve tangent / normal (detached) ------------------------
        dz = b - a
        ds = -(s / safe_den) * n_l.dot(dz)
        dy = jax.tree_util.tree_map(sg, dz * s + zx * ds)   # dy/dt
        speed = dy.length()
        m_hat = jax.tree_util.tree_map(sg, n_l).cross(dy).normalize()
        valid = valid & (speed > 1e-12)

        # --- two-sided probes -----------------------------------------
        eps_y = 1e-3 * jnp.sqrt(jnp.maximum(sg(area2) * 0.5, 1e-12))
        y_det = jax.tree_util.tree_map(sg, y)

        def probe(p, worth):
            """lit(x -> p): inside light and unoccluded."""
            seg = p - x_det
            dist = jnp.maximum(seg.length(), 1e-12)
            wi = seg * (1.0 / dist)
            ok = worth & sg(inside(p))
            occ = occluded(
                scene, x_det + wi * EPSILON,
                vwhere(ok, wi, V3.full(jnp.shape(dist), 0.0, 0.0, 1.0)),
                jnp.where(ok, dist - 2.0 * EPSILON, -1.0))
            return ok & ~occ, wi, dist

        off = m_hat * eps_y
        ins_p = sg(inside(y_det + off))
        ins_m = sg(inside(y_det - off))
        worth = valid & ins_p & ins_m
        lit_p, wi, dist = probe(y_det + off, worth)
        lit_m, _, _ = probe(y_det - off, worth)
        jump = lit_p.astype(jnp.float32) - lit_m.astype(jnp.float32)

        # --- h(y) = f * Le * G (detached) ------------------------------
        wi_local = sh.frame.to_local(wi)
        f = bsdf_mod.evaluate(sh.mp, sh.wo_local, wi_local, cfg.mat_types)
        cos_s = jnp.maximum(wi.dot(sh.sn), 0.0)
        cos_l = jnp.maximum(-wi.dot(gn_l), 0.0)      # one-sided emission
        g_term = cos_s * cos_l / jnp.maximum(dist * dist, 1e-12)
        h = jax.tree_util.tree_map(sg, f * light_le * g_term)

        # --- zero-primal injection ------------------------------------
        vel = y.dot(m_hat) - sg(y.dot(m_hat))     # primal 0, grad = dy.m
        # ris_w replaces the 1/p_len(k) factor of a plain length-
        # weighted edge draw (see the RIS block above); edge_mult
        # divides out shared-edge double counting (a closed mesh's
        # silhouette edge appears in two triangles — Scene.edge_mult)
        mult = (scene.edge_mult[k]
                if scene.edge_mult is not None else 1.0)
        w = sg(jnp.where(worth, speed * ris_w / (pmf_pick * dens * mult
                                                 * cfg.boundary_samples),
                         0.0))
        out = out + h * (-(jump) * w * vel)
    return out
