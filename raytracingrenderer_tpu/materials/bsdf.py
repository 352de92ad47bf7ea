"""Branchless batched BSDFs over an enum-tagged material table.

Replaces the reference's virtual-dispatch BSDF hierarchy
(/root/reference/RTBase/Materials.h:94-511) with mask-select evaluation:
every lobe family is evaluated for every lane (each is cheap closed-form
VPU math) and the per-lane material type selects the result.  This is the
TPU-idiomatic form of the 8-subclass vtable — no divergence, no gather of
function pointers.

The microfacet models (GGX conductor, rough dielectric, Oren-Nayar,
plastic) are *implemented* here; the reference declares them but
substitutes Lambert placeholders (Materials.h:203-465) and returns 1.0
from its GGX helpers (Materials.h:40-54).  Scene files ship real
roughness/eta/k parameters, so the real models are required for parity
with intent (SURVEY.md §2.5).

Conventions (matching reference BSDF::sample usage, Renderer.h:362-374):
- all directions in the local shading frame, +z = shading normal;
  `wo` points away from the surface (toward the previous vertex).
- `sample` returns (wi, colour, pdf, valid): the integrator multiplies
  throughput by colour*|wi.z|/pdf for non-specular and colour/pdf for
  specular lanes.
- `evaluate`/`pdf_fn` return the f term / solid-angle pdf used by
  NEE+MIS; both are 0 for delta lobes (mirror, glass).
"""
from __future__ import annotations

from typing import NamedTuple, Tuple

import jax
import jax.numpy as jnp

from ..core.vec import V3, reflect_z, vwhere
from ..sampling import warps
from ..scene.types import (MAT_CONDUCTOR, MAT_DIELECTRIC, MAT_DIFFUSE,
                           MAT_GLASS, MAT_MIRROR, MAT_OREN_NAYAR,
                           MAT_PLASTIC, MaterialTable, TextureAtlas)
from . import fresnel

INV_PI = 1.0 / jnp.pi
MIN_ALPHA = 1e-3

# Static sentinel appended to cfg.mat_types by render.specialize_config
# when any material carries a coat (coat_thickness > 0), so the coat
# lobe compiles only for scenes that use it (same devirtualization
# trick as the MAT_* gating in _has).
COAT = 99

# The reference's LayeredBSDF stores a SMOOTH coating (no coat
# roughness parameter, Materials.h:467-476); a near-smooth GGX lobe
# keeps the highlight visually sharp while giving NEE/MIS a finite pdf
# (a true delta coat would need per-lane specular-flag plumbing).
COAT_ALPHA = 0.01


class MatParams(NamedTuple):
    """Per-lane gathered material parameters."""
    mtype: jax.Array
    albedo: V3
    eta: V3
    k: V3
    int_ior: jax.Array
    ext_ior: jax.Array
    alpha: jax.Array
    sigma: jax.Array
    emission: V3
    is_emissive: jax.Array
    # layered coating (0 thickness = uncoated); see _coat_terms
    coat_thickness: jax.Array = None
    coat_sigma_a: V3 = None
    coat_int_ior: jax.Array = None
    coat_ext_ior: jax.Array = None


def gather_params(materials: MaterialTable, textures: TextureAtlas,
                  mat_id: jax.Array, u: jax.Array, v: jax.Array
                  ) -> MatParams:
    """Gather material rows for hit lanes; albedo resolves textures."""
    from ..imaging import texture as tex_mod
    albedo = materials.albedo.gather(mat_id)
    tid = materials.albedo_tex[mat_id]
    tex_col = tex_mod.sample(textures, tid, u, v)
    albedo = vwhere(tid >= 0, tex_col, albedo)
    return MatParams(
        mtype=materials.mtype[mat_id],
        albedo=albedo,
        eta=materials.eta.gather(mat_id),
        k=materials.k.gather(mat_id),
        int_ior=materials.int_ior[mat_id],
        ext_ior=materials.ext_ior[mat_id],
        alpha=jnp.maximum(materials.alpha[mat_id], MIN_ALPHA),
        sigma=materials.sigma[mat_id],
        emission=materials.emission.gather(mat_id),
        is_emissive=materials.is_emissive[mat_id],
        coat_thickness=materials.coat_thickness[mat_id],
        coat_sigma_a=materials.coat_sigma_a.gather(mat_id),
        coat_int_ior=materials.coat_int_ior[mat_id],
        coat_ext_ior=materials.coat_ext_ior[mat_id])


def is_specular(mtype: jax.Array) -> jax.Array:
    """Mirror + glass are delta lobes (reference isPureSpecular flags)."""
    return (mtype == MAT_MIRROR) | (mtype == MAT_GLASS)


def is_two_sided(mtype: jax.Array) -> jax.Array:
    """All but glass/dielectric flip their shading frame toward wo
    (reference isTwoSided flags; calculateShadingData Scene.h:185-195)."""
    return ~((mtype == MAT_GLASS) | (mtype == MAT_DIELECTRIC))


# ---------------------------------------------------------------------------
# helpers

def _reflect_about(w: V3, h: V3) -> V3:
    return h * (2.0 * w.dot(h)) - w


def _mirror_z(w: V3, s: jax.Array) -> V3:
    """Conditionally mirror z so that transformed wo.z > 0 (used by the
    two transmissive lobes to canonicalize inside/outside)."""
    return V3(w.x, w.y, w.z * s)


def _oren_nayar_f(albedo: V3, sigma, wo: V3, wi: V3) -> V3:
    """Full Oren-Nayar (the model the reference's OrenNayarBSDF declares
    with its sigma parameter, Materials.h:369-412)."""
    s2 = sigma * sigma
    a = 1.0 - s2 / (2.0 * (s2 + 0.33))
    b = 0.45 * s2 / (s2 + 0.09)
    # azimuthal cos(phi_i - phi_o) from projections onto tangent plane
    sin2_i = jnp.maximum(1.0 - wi.z * wi.z, 0.0)
    sin2_o = jnp.maximum(1.0 - wo.z * wo.z, 0.0)
    sin_i = jnp.sqrt(sin2_i)
    sin_o = jnp.sqrt(sin2_o)
    denom = jnp.maximum(sin_i * sin_o, 1e-7)
    cos_dphi = jnp.clip((wi.x * wo.x + wi.y * wo.y) / denom, -1.0, 1.0)
    cos_dphi = jnp.maximum(cos_dphi, 0.0)
    # sin(alpha) = sin of larger angle; tan(beta) = tan of smaller
    sin_alpha = jnp.maximum(sin_i, sin_o)
    cos_max = jnp.maximum(jnp.abs(wi.z), jnp.abs(wo.z))
    tan_beta = jnp.minimum(sin_i, sin_o) / jnp.maximum(cos_max, 1e-7)
    return albedo * (INV_PI * (a + b * cos_dphi * sin_alpha * tan_beta))


def _ggx_reflect_eval(alpha, f0: V3, wo: V3, wi: V3
                      ) -> Tuple[V3, jax.Array]:
    """(f, pdf) of a GGX reflection lobe with Fresnel colour f0 already
    evaluated at the half vector by the caller."""
    h = (wo + wi).normalize()
    h = vwhere(h.z >= 0.0, h, -h)
    d = warps.ggx_d(h, alpha)
    g = warps.ggx_g(wo, wi, alpha)
    denom = jnp.maximum(4.0 * jnp.abs(wo.z) * jnp.abs(wi.z), 1e-7)
    f = f0 * (d * g / denom)
    pdf = warps.ggx_half_pdf(h, alpha) / jnp.maximum(
        4.0 * jnp.abs(wo.dot(h)), 1e-7)
    ok = (wo.z > 0.0) & (wi.z > 0.0)
    return vwhere(ok, f, V3.zeros(())), jnp.where(ok, pdf, 0.0)


def _plastic_fresnel(mp: MatParams, cos_x) -> jax.Array:
    r, _ = fresnel.fresnel_dielectric(cos_x, mp.ext_ior, mp.int_ior)
    return r


# ---------------------------------------------------------------------------
# layered coating (reference LayeredBSDF, Materials.h:467-511)
#
# The reference STORES sigma_a/thickness/IORs and passes every call
# through to the base; the intent — a smooth dielectric coat over an
# arbitrary base lobe — is implemented here in the Smits/Weidlich-Wilkie
# single-scattering approximation:
#
#   f = f_coat(Fresnel-weighted near-smooth GGX)
#       + T(wo) * T(wi) * A(wo,wi) * f_base
#
# with T(w) = 1 - Fr_coat(|w.z|) the coat-interface transmittance and
# A = exp(-sigma_a * thickness * (1/|wo.z| + 1/|wi.z|)) Beer-Lambert
# absorption along both coat crossings.  Refraction bending inside the
# coat is ignored (standard in this approximation), and the coat is
# applied only over non-delta bases (coated mirror/glass keep the
# reference's pass-through semantics).  Energy-conserving by
# construction: Fc + T_o*T_i*A <= 1 per direction pair.

def _coat_applies(mp: MatParams) -> jax.Array:
    return ((mp.coat_thickness > 0.0) & ~is_specular(mp.mtype))


def _coat_fresnel(mp: MatParams, cos_x) -> jax.Array:
    r, _ = fresnel.fresnel_dielectric(jnp.abs(cos_x), mp.coat_ext_ior,
                                      mp.coat_int_ior)
    return r


def _coat_absorb(mp: MatParams, wo: V3, wi: V3) -> V3:
    path = mp.coat_thickness * (1.0 / jnp.maximum(jnp.abs(wo.z), 1e-4)
                                + 1.0 / jnp.maximum(jnp.abs(wi.z), 1e-4))
    return V3(jnp.exp(-mp.coat_sigma_a.x * path),
              jnp.exp(-mp.coat_sigma_a.y * path),
              jnp.exp(-mp.coat_sigma_a.z * path))


def _coat_layer_eval(mp: MatParams, wo: V3, wi: V3, f_base: V3) -> V3:
    h = (wo + wi).normalize()
    fc_h = _coat_fresnel(mp, wo.dot(h))
    f_coat, _ = _ggx_reflect_eval(COAT_ALPHA, V3.of(1.0, 1.0, 1.0) * fc_h,
                                  wo, wi)
    t_o = 1.0 - _coat_fresnel(mp, wo.z)
    t_i = 1.0 - _coat_fresnel(mp, wi.z)
    return f_coat + f_base * _coat_absorb(mp, wo, wi) * (t_o * t_i)


# ---------------------------------------------------------------------------
# evaluate / pdf (non-delta lobes; used by NEE + MIS)

def _has(types, *ms) -> bool:
    """Static presence test: `types` is the (trace-time constant) set of
    MAT_* values present in the scene, or None for "assume all".  Lobes
    for absent types are never built, so an all-diffuse scene compiles
    to pure Lambert (the TPU analogue of devirtualization)."""
    return types is None or any(m in types for m in ms)


def evaluate(mp: MatParams, wo: V3, wi: V3, types=None) -> V3:
    """f(wo, wi) without the cosine term."""
    zero = V3.zeros(jnp.shape(wo.z))
    up = (wo.z > 0.0) & (wi.z > 0.0)
    out = zero

    if _has(types, MAT_DIFFUSE):
        f_diff = vwhere(up, mp.albedo * INV_PI, zero)
        out = vwhere(mp.mtype == MAT_DIFFUSE, f_diff, out)
    if _has(types, MAT_OREN_NAYAR):
        f_on = vwhere(up, _oren_nayar_f(mp.albedo, mp.sigma, wo, wi),
                      zero)
        out = vwhere(mp.mtype == MAT_OREN_NAYAR, f_on, out)
    if _has(types, MAT_CONDUCTOR, MAT_PLASTIC):
        h = (wo + wi).normalize()
    if _has(types, MAT_CONDUCTOR):
        # conductor: tinted microfacet with conductor Fresnel at h
        fr_cond = (fresnel.fresnel_conductor(wo.dot(h), mp.eta, mp.k)
                   * mp.albedo)
        f_cond, _ = _ggx_reflect_eval(mp.alpha, fr_cond, wo, wi)
        out = vwhere(mp.mtype == MAT_CONDUCTOR, f_cond, out)
    if _has(types, MAT_PLASTIC):
        # plastic: Fresnel-weighted specular + diffuse
        fr_h = _plastic_fresnel(mp, wo.dot(h))
        spec, _ = _ggx_reflect_eval(mp.alpha,
                                    V3.of(1.0, 1.0, 1.0) * fr_h, wo, wi)
        fr_o = _plastic_fresnel(mp, wo.z)
        f_plastic = spec + vwhere(up, mp.albedo * (INV_PI * (1.0 - fr_o)),
                                  zero)
        out = vwhere(mp.mtype == MAT_PLASTIC, f_plastic, out)
    if _has(types, MAT_DIELECTRIC):
        f_diel = _dielectric_eval_pdf(mp, wo, wi)[0]
        out = vwhere(mp.mtype == MAT_DIELECTRIC, f_diel, out)
    if _has(types, COAT) and mp.coat_thickness is not None:
        out = vwhere(_coat_applies(mp), _coat_layer_eval(mp, wo, wi, out),
                     out)
    return out  # mirror/glass stay zero (delta)


def pdf_fn(mp: MatParams, wo: V3, wi: V3, types=None) -> jax.Array:
    """Solid-angle pdf of `sample` for non-delta lobes (0 for deltas)."""
    cos_pdf = jnp.where((wo.z > 0.0) & (wi.z > 0.0), wi.z * INV_PI, 0.0)
    out = jnp.where((mp.mtype == MAT_DIFFUSE)
                    | (mp.mtype == MAT_OREN_NAYAR), cos_pdf, 0.0)
    if _has(types, MAT_CONDUCTOR, MAT_PLASTIC):
        _, pdf_ggx = _ggx_reflect_eval(mp.alpha, V3.of(1.0, 1.0, 1.0),
                                       wo, wi)
    if _has(types, MAT_CONDUCTOR):
        out = jnp.where(mp.mtype == MAT_CONDUCTOR, pdf_ggx, out)
    if _has(types, MAT_PLASTIC):
        fr_o = _plastic_fresnel(mp, wo.z)
        pdf_plastic = fr_o * pdf_ggx + (1.0 - fr_o) * cos_pdf
        out = jnp.where(mp.mtype == MAT_PLASTIC, pdf_plastic, out)
    if _has(types, MAT_DIELECTRIC):
        pdf_diel = _dielectric_eval_pdf(mp, wo, wi)[1]
        out = jnp.where(mp.mtype == MAT_DIELECTRIC, pdf_diel, out)
    if _has(types, COAT) and mp.coat_thickness is not None:
        # mixture pdf matching sample(): coat lobe with prob Fc(wo)
        fc_o = _coat_fresnel(mp, wo.z)
        _, pdf_coat = _ggx_reflect_eval(COAT_ALPHA, V3.of(1.0, 1.0, 1.0),
                                        wo, wi)
        out = jnp.where(_coat_applies(mp),
                        fc_o * pdf_coat + (1.0 - fc_o) * out, out)
    return out


def _dielectric_eval_pdf(mp: MatParams, wo: V3, wi: V3
                         ) -> Tuple[V3, jax.Array]:
    """Rough dielectric f and pdf (Walter et al. 2007 microfacet
    refraction), canonicalized so the macro-normal side of wo is +z."""
    s = jnp.where(wo.z >= 0.0, 1.0, -1.0)
    wo_c = _mirror_z(wo, s)
    wi_c = _mirror_z(wi, s)
    eta_i = jnp.where(s > 0.0, mp.ext_ior, mp.int_ior)
    eta_t = jnp.where(s > 0.0, mp.int_ior, mp.ext_ior)
    reflecting = wi_c.z > 0.0

    # reflection branch
    h_r = (wo_c + wi_c).normalize()
    h_r = vwhere(h_r.z >= 0.0, h_r, -h_r)
    r_r, _ = fresnel.fresnel_dielectric(wo_c.dot(h_r), eta_i, eta_t)
    d_r = warps.ggx_d(h_r, mp.alpha)
    g_r = warps.ggx_g(wo_c, vwhere(reflecting, wi_c, reflect_z(wi_c)),
                      mp.alpha)
    f_refl = r_r * d_r * g_r / jnp.maximum(
        4.0 * jnp.abs(wo_c.z) * jnp.abs(wi_c.z), 1e-7)
    pdf_refl = (r_r * warps.ggx_half_pdf(h_r, mp.alpha)
                / jnp.maximum(4.0 * jnp.abs(wo_c.dot(h_r)), 1e-7))

    # transmission branch: half vector of refraction
    ht = -(wo_c * eta_i + wi_c * eta_t)
    ht = ht.normalize()
    ht = vwhere(ht.z >= 0.0, ht, -ht)
    oh = wo_c.dot(ht)
    ih = wi_c.dot(ht)
    r_t, _ = fresnel.fresnel_dielectric(oh, eta_i, eta_t)
    d_t = warps.ggx_d(ht, mp.alpha)
    g_t = warps.ggx_g(wo_c, reflect_z(wi_c), mp.alpha)
    denom_t = jnp.square(eta_i * oh + eta_t * ih)
    jac = eta_t * eta_t * jnp.abs(ih) / jnp.maximum(denom_t, 1e-10)
    f_trans = ((1.0 - r_t) * d_t * g_t
               * jnp.abs(oh) * jnp.abs(ih) * eta_t * eta_t
               / jnp.maximum(jnp.abs(wo_c.z) * jnp.abs(wi_c.z) * denom_t,
                             1e-10))
    pdf_trans = (1.0 - r_t) * warps.ggx_half_pdf(ht, mp.alpha) * jac

    f = vwhere(reflecting, mp.albedo * f_refl, mp.albedo * f_trans)
    pdf = jnp.where(reflecting, pdf_refl, pdf_trans)
    ok = jnp.abs(wo.z) > 1e-6
    return vwhere(ok, f, V3.zeros(())), jnp.where(ok, pdf, 0.0)


# ---------------------------------------------------------------------------
# sampling

def sample(mp: MatParams, wo: V3, r1: jax.Array, r2: jax.Array,
           rl: jax.Array, types=None
           ) -> Tuple[V3, V3, jax.Array, jax.Array]:
    """Sample an incident direction per lane.

    Returns (wi, colour, pdf, valid).  colour/pdf follow the reference's
    BSDF::sample contract (see module docstring); valid=False lanes
    (below-horizon microfacet rejects) should terminate the path.
    `types` statically gates which lobe families are built (see _has).
    """
    mt = mp.mtype

    # -- layered coat lobe select (before base lobes consume rl) -------
    coat_on = (_has(types, COAT) and mp.coat_thickness is not None)
    if coat_on:
        coated = _coat_applies(mp)
        fc_o = _coat_fresnel(mp, wo.z)
        pick_coat = coated & (rl < fc_o)
        # renormalize rl for the base's own lobe selects so the coat
        # pick doesn't bias them
        rl = jnp.where(coated,
                       jnp.clip((rl - fc_o)
                                / jnp.maximum(1.0 - fc_o, 1e-6),
                                0.0, 1.0 - 1e-7), rl)

    # -- cosine lobe (diffuse / oren-nayar / plastic-diffuse) ----------
    wi_cos = warps.cosine_hemisphere(r1, r2)
    wi = wi_cos

    # -- mirror --------------------------------------------------------
    if _has(types, MAT_MIRROR):
        wi = vwhere(mt == MAT_MIRROR, reflect_z(wo), wi)

    # -- ggx half-vector (conductor / plastic-spec / rough dielectric) -
    if _has(types, MAT_CONDUCTOR, MAT_PLASTIC, MAT_DIELECTRIC):
        h = warps.ggx_sample_half(r1, r2, mp.alpha)
        wi_ggx = _reflect_about(wo, h)
    if _has(types, MAT_CONDUCTOR):
        wi = vwhere(mt == MAT_CONDUCTOR, wi_ggx, wi)

    # -- glass (smooth dielectric, stochastic Fresnel select) ----------
    if _has(types, MAT_GLASS):
        enter = wo.z > 0.0
        g_eta_i = jnp.where(enter, mp.ext_ior, mp.int_ior)
        g_eta_t = jnp.where(enter, mp.int_ior, mp.ext_ior)
        r_glass, cos_t = fresnel.fresnel_dielectric(wo.z, g_eta_i,
                                                    g_eta_t)
        glass_reflect = rl < r_glass
        wi_glass = vwhere(glass_reflect, reflect_z(wo),
                          fresnel.refract_dir(wo, cos_t,
                                              g_eta_i / g_eta_t))
        col_glass = vwhere(glass_reflect, mp.albedo * r_glass,
                           mp.albedo * (1.0 - r_glass))
        pdf_glass = jnp.where(glass_reflect, r_glass, 1.0 - r_glass)
        wi = vwhere(mt == MAT_GLASS, wi_glass, wi)

    # -- rough dielectric ---------------------------------------------
    if _has(types, MAT_DIELECTRIC):
        s = jnp.where(wo.z >= 0.0, 1.0, -1.0)
        wo_c = _mirror_z(wo, s)
        d_eta_i = jnp.where(s > 0.0, mp.ext_ior, mp.int_ior)
        d_eta_t = jnp.where(s > 0.0, mp.int_ior, mp.ext_ior)
        r_d, cos_td = fresnel.fresnel_dielectric(wo_c.dot(h), d_eta_i,
                                                 d_eta_t)
        d_reflect = rl < r_d
        wi_d_refl = _reflect_about(wo_c, h)
        eta_ratio = d_eta_i / d_eta_t
        # refract about microfacet h
        c = wo_c.dot(h)
        wi_d_trans = (h * (eta_ratio * c - cos_td) - wo_c * eta_ratio)
        wi_dc = vwhere(d_reflect, wi_d_refl, wi_d_trans)
        wi_diel = _mirror_z(wi_dc, s)
        valid_diel = jnp.where(d_reflect, wi_dc.z > 0.0, wi_dc.z < 0.0)
        wi = vwhere(mt == MAT_DIELECTRIC, wi_diel, wi)

    # -- plastic lobe select ------------------------------------------
    if _has(types, MAT_PLASTIC):
        fr_o = _plastic_fresnel(mp, wo.z)
        plastic_spec = rl < fr_o
        wi_plastic = vwhere(plastic_spec, wi_ggx, wi_cos)
        wi = vwhere(mt == MAT_PLASTIC, wi_plastic, wi)

    # -- layered coat reflection override ------------------------------
    if coat_on:
        h_coat = warps.ggx_sample_half(r1, r2,
                                       jnp.full_like(wo.z, COAT_ALPHA))
        wi = vwhere(pick_coat, _reflect_about(wo, h_coat), wi)

    # ---- per-type (colour, pdf, valid) -------------------------------
    f_eval = evaluate(mp, wo, wi, types)  # correct for all non-delta
    pdf = pdf_fn(mp, wo, wi, types)
    colour = f_eval
    # deltas override
    if _has(types, MAT_MIRROR):
        colour = vwhere(mt == MAT_MIRROR, mp.albedo, colour)
        pdf = jnp.where(mt == MAT_MIRROR, 1.0, pdf)
    if _has(types, MAT_GLASS):
        colour = vwhere(mt == MAT_GLASS, col_glass, colour)
        pdf = jnp.where(mt == MAT_GLASS, pdf_glass, pdf)

    valid = pdf > 1e-9
    if _has(types, MAT_DIELECTRIC):
        valid = jnp.where(mt == MAT_DIELECTRIC, valid & valid_diel,
                          valid)
    valid = jnp.where(is_specular(mt), True, valid)
    valid = valid & (jnp.abs(wi.z) > 1e-7)
    return wi, colour, pdf, valid
