"""Branchless vectorized BSDF: a fixed 6-slot lobe stack evaluated for whole
wavefronts.

TPU-native replacement for lib/core/reflection/ (bsdf.dart:41-255, bxdf.dart,
lambertian.dart, oren_nayar.dart, specular_reflection.dart,
specular_transmission.dart, microfacet.dart, blinn.dart, fresnel_blend.dart,
fresnel_dielectric.dart, fresnel_conductor.dart, brdf_to_btdf.dart). The
reference's up-to-8 dynamically-typed BxDF stack becomes six *fixed* lobe
slots — diffuse/glossy/specular x reflection/transmission — whose per-ray
parameters come from the material system; unused slots carry zero weight.
Every lobe's f/pdf/sample is computed for ALL lanes and combined by masks,
exactly reproducing BSDF.sample_f's lobe-choice, pdf-averaging and
side-test semantics (bsdf.dart:53-133, Appendix A.11).

LAYOUT: all directions and colors are component-SoA (vm.V3 of (R,) arrays)
end-to-end — (R, 3) arrays use 3 of 128 TPU lanes per tile; component
arrays are fully lane-packed (the round-4 SoA wavefront refactor).

Slots: 0=DIFF_R (Lambertian/OrenNayar), 1=DIFF_T, 2=GLOSS_R (Blinn
Torrance-Sparrow / FresnelBlend), 3=GLOSS_T, 4=SPEC_R, 5=SPEC_T.
"""
from __future__ import annotations

from typing import NamedTuple

import numpy as np
import jax.numpy as jnp

from .core import math as vm
from .core.math import V3, V2
from .core import sampling as smp

INV_PI = float(1.0 / np.pi)

# slot indices
DIFF_R, DIFF_T, GLOSS_R, GLOSS_T, SPEC_R, SPEC_T = range(6)
N_SLOTS = 6

# fresnel modes for glossy/specular reflection
FR_NOOP = 0
FR_DIELECTRIC = 1
FR_CONDUCTOR = 2
FR_BLEND = 3      # FresnelBlend (substrate) — glossy slot only

# BxDF flag masks (bsdf.dart:23-31)
REFLECTION = 1
TRANSMISSION = 2
DIFFUSE = 4
GLOSSY = 8
SPECULAR = 16
ALL_TYPES = DIFFUSE | GLOSSY | SPECULAR
ALL_REFLECTION = REFLECTION | ALL_TYPES
ALL = REFLECTION | TRANSMISSION | ALL_TYPES

SLOT_FLAGS = (
    REFLECTION | DIFFUSE, TRANSMISSION | DIFFUSE,
    REFLECTION | GLOSSY, TRANSMISSION | GLOSSY,
    REFLECTION | SPECULAR, TRANSMISSION | SPECULAR,
)


class BSDFParams(NamedTuple):
    """Per-ray lobe parameters (outputs of the material/texture system).

    Colors are V3 of (R,) arrays, scalars (R,). Zero weight disables a slot.
    """
    kd: V3                   # DIFF_R weight
    sigma: jnp.ndarray       # Oren-Nayar sigma in degrees=0 -> Lambertian
    kd_t: V3                 # DIFF_T weight
    ks: V3                   # GLOSS_R weight
    exponent: jnp.ndarray    # Blinn exponent
    gloss_fresnel: jnp.ndarray   # int32 FR_* for GLOSS_R
    ks_t: V3                 # GLOSS_T weight
    kr: V3                   # SPEC_R weight
    spec_fresnel: jnp.ndarray    # int32 FR_* for SPEC_R
    kt: V3                   # SPEC_T weight
    eta: jnp.ndarray         # dielectric ior (R,)
    eta_c: V3                # conductor eta
    k_c: V3                  # conductor k
    # measured BRDF (RegularHalfangleBRDF): None, or a tuple
    # (idx (R, 4) int32 [pool_off, nThetaH, nThetaD, nPhiD] with off = -1
    #  for non-measured rays, pool V3 of (P,) f32). Evaluated as an extra
    # reflection lobe sampled through the DIFF_R cosine machinery (the
    # reference's default BxDF sampling for measured data).
    meas: tuple = None
    # Ashikhmin-Shirley anisotropic exponent ey (anisotropic.dart). None or
    # == exponent -> isotropic Blinn (the anisotropic formulas reduce to
    # Blinn exactly at ex == ey, so one code path serves both).
    exponent_v: jnp.ndarray = None


def zero_params(r) -> BSDFParams:
    z3 = vm.v3zeros((r,))
    z1 = jnp.zeros((r,), jnp.float32)
    zi = jnp.zeros((r,), jnp.int32)
    return BSDFParams(kd=z3, sigma=z1, kd_t=z3, ks=z3,
                      exponent=jnp.ones((r,), jnp.float32),
                      gloss_fresnel=zi, ks_t=z3, kr=z3, spec_fresnel=zi,
                      kt=z3, eta=jnp.ones((r,), jnp.float32), eta_c=z3,
                      k_c=z3)


class Frame(NamedTuple):
    """Shading frame (nn, sn, tn) per ray (bsdf.dart constructor)."""
    s: V3
    t: V3
    n: V3    # shading normal
    ng: V3   # geometric normal

    def to_local(self, w: V3) -> V3:
        return V3(vm.dot(w, self.s), vm.dot(w, self.t), vm.dot(w, self.n))

    def to_world(self, w: V3) -> V3:
        return self.s * w.x + self.t * w.y + self.n * w.z


def make_frame(ns: V3, dpdu: V3, ng: V3) -> Frame:
    s = vm.normalize(dpdu - ns * vm.dot(ns, dpdu))
    degen = vm.length_sq(s) < 1e-12
    s_fb, _ = vm.coordinate_system(ns)
    s = vm.where3(degen, s_fb, s)
    t = vm.cross(ns, s)
    return Frame(s=s, t=t, n=ns, ng=ng)


def cos_theta(w: V3):
    return w.z


def abs_cos_theta(w: V3):
    return jnp.abs(w.z)


def same_hemisphere(w: V3, wp: V3):
    return w.z * wp.z > 0.0


def _flip_z(w: V3) -> V3:
    return V3(w.x, w.y, -w.z)


# --- Fresnel (fresnel_dielectric.dart, fresnel_conductor.dart) -------------

def fr_dielectric(cos_i, eta):
    """Unpolarized dielectric Fresnel; handles both sides. cos_i signed.
    Returns (R,) reflectance in [0, 1]."""
    entering = cos_i > 0.0
    ei = jnp.where(entering, 1.0, eta)
    et = jnp.where(entering, eta, 1.0)
    ci = jnp.abs(jnp.clip(cos_i, -1.0, 1.0))
    sint = ei / et * jnp.sqrt(jnp.maximum(0.0, 1.0 - ci * ci))
    tir = sint >= 1.0
    ct = jnp.sqrt(jnp.maximum(0.0, 1.0 - sint * sint))
    r_parl = ((et * ci - ei * ct) /
              jnp.maximum(et * ci + ei * ct, 1e-12))
    r_perp = ((ei * ci - et * ct) /
              jnp.maximum(ei * ci + et * ct, 1e-12))
    f = 0.5 * (r_parl * r_parl + r_perp * r_perp)
    return jnp.where(tir, 1.0, f)


def fr_conductor(cos_i, eta: V3, k: V3) -> V3:
    """Conductor Fresnel (fresnel_conductor.dart), cos_i abs; eta/k V3."""
    ci = jnp.abs(cos_i)
    ci2 = ci * ci

    def chan(e, kk):
        tmp = (e * e + kk * kk) * ci2
        r_parl2 = ((tmp - 2.0 * e * ci + 1.0)
                   / jnp.maximum(tmp + 2.0 * e * ci + 1.0, 1e-12))
        tmp_f = e * e + kk * kk
        r_perp2 = ((tmp_f - 2.0 * e * ci + ci2)
                   / jnp.maximum(tmp_f + 2.0 * e * ci + ci2, 1e-12))
        return 0.5 * (r_parl2 + r_perp2)

    return V3(chan(eta.x, k.x), chan(eta.y, k.y), chan(eta.z, k.z))


def schlick(cos_i, rs: V3) -> V3:
    """Schlick Fresnel approximation (fresnel_blend.dart)."""
    c = jnp.clip(1.0 - jnp.abs(cos_i), 0.0, 1.0)
    c5 = c * c * c * c * c
    return rs + (1.0 - rs) * c5


def _glossy_fresnel(p: BSDFParams, cos_h) -> V3:
    """F at the half-angle for the glossy slot, per mode (V3)."""
    fd = fr_dielectric(cos_h, p.eta)
    fd3 = V3(fd, fd, fd)
    fc = fr_conductor(cos_h, p.eta_c, p.k_c)
    m = p.gloss_fresnel
    return vm.where3(m == FR_DIELECTRIC, fd3,
                     vm.where3(m == FR_CONDUCTOR, fc, 1.0))


# --- Lobe evaluation (all directions in shading-local space) ---------------

def _oren_nayar_ab(sigma_deg):
    s = jnp.radians(sigma_deg)
    s2 = s * s
    a = 1.0 - s2 / (2.0 * (s2 + 0.33))
    b = 0.45 * s2 / (s2 + 0.09)
    return a, b


def _diff_f(kd: V3, sigma, wo: V3, wi: V3) -> V3:
    """Lambertian or Oren-Nayar (lambertian.dart, oren_nayar.dart)."""
    a, b = _oren_nayar_ab(sigma)
    sinto = jnp.sqrt(jnp.maximum(0.0, 1.0 - wo.z * wo.z))
    sinti = jnp.sqrt(jnp.maximum(0.0, 1.0 - wi.z * wi.z))
    # cos(phi_i - phi_o)
    denom = jnp.maximum(sinti * sinto, 1e-8)
    dcos = (wi.x * wo.x + wi.y * wo.y) / denom
    maxcos = jnp.where((sinti > 1e-4) & (sinto > 1e-4),
                       jnp.maximum(dcos, 0.0), 0.0)
    sinalpha = jnp.maximum(sinti, sinto)
    tanbeta = jnp.minimum(sinti, sinto) / jnp.maximum(
        jnp.minimum(abs_cos_theta(wi), abs_cos_theta(wo)), 1e-8)
    on = a + b * maxcos * sinalpha * tanbeta
    on = jnp.where(sigma > 0.0, on, 1.0)
    return kd * (INV_PI * on)


def _blinn_d(exponent, cos_h):
    return (exponent + 2.0) * (0.5 * INV_PI) * jnp.power(
        jnp.maximum(jnp.abs(cos_h), 1e-8), exponent)


def _ey(p: BSDFParams):
    return p.exponent if p.exponent_v is None else p.exponent_v


def _aniso_d(ex, ey, wh: V3):
    """Ashikhmin-Shirley anisotropic D (anisotropic.dart D); equals Blinn D
    when ex == ey."""
    costh = jnp.abs(wh.z)
    ds = jnp.maximum(1.0 - costh * costh, 1e-12)
    e = (ex * wh.x * wh.x + ey * wh.y * wh.y) / ds
    return jnp.sqrt(jnp.maximum((ex + 2.0) * (ey + 2.0), 0.0)) \
        * (0.5 * INV_PI) * jnp.power(jnp.maximum(costh, 1e-8), e)


def _ts_g(wo: V3, wi: V3, wh: V3):
    """Torrance-Sparrow geometric term (microfacet.dart G)."""
    ndoth = abs_cos_theta(wh)
    ndoto = abs_cos_theta(wo)
    ndoti = abs_cos_theta(wi)
    odoth = jnp.maximum(jnp.abs(vm.dot(wo, wh)), 1e-8)
    return jnp.minimum(1.0, jnp.minimum(2.0 * ndoth * ndoto / odoth,
                                        2.0 * ndoth * ndoti / odoth))


def _gloss_f(p: BSDFParams, ks: V3, wo: V3, wi: V3) -> V3:
    """Microfacet Torrance-Sparrow with Blinn D; or FresnelBlend.
    (Glossy transmission is evaluated by the caller via the BRDFToBTDF
    direction flip, brdf_to_btdf.dart.)"""
    wh = wi + wo
    wh_len = jnp.sqrt(jnp.maximum(vm.length_sq(wh), 1e-12))
    wh = wh * (1.0 / wh_len)
    wh = vm.where3(wh.z < 0, -wh, wh)
    cos_o = abs_cos_theta(wo)
    cos_i = abs_cos_theta(wi)
    d = _aniso_d(p.exponent, _ey(p), wh)
    g = _ts_g(wo, wi, wh)
    f_h = _glossy_fresnel(p, vm.dot(wi, wh))
    micro = ks * f_h * (d * g / jnp.maximum(4.0 * cos_i * cos_o, 1e-8))
    # FresnelBlend (substrate): kd (Rd) and ks (Rs) combined
    # (fresnel_blend.dart f): diffuse term + specular term
    pow5 = lambda x: x * x * x * x * x
    diff = p.kd * (1.0 - p.ks) * (
        (28.0 / (23.0 * np.pi))
        * (1.0 - pow5(1.0 - 0.5 * cos_i))
        * (1.0 - pow5(1.0 - 0.5 * cos_o)))
    spec_blend = schlick(vm.dot(wi, wh), p.ks) * (d / jnp.maximum(
        4.0 * jnp.abs(vm.dot(wi, wh)) * jnp.maximum(cos_i, cos_o), 1e-8))
    blend = diff + spec_blend
    return vm.where3(p.gloss_fresnel == FR_BLEND, blend, micro)


def _blinn_sample_wh(exponent, u: V2) -> V3:
    """Blinn half-vector sampling (blinn.dart sample_f)."""
    ct = jnp.power(jnp.maximum(u.x, 1e-9), 1.0 / (exponent + 1.0))
    st = jnp.sqrt(jnp.maximum(0.0, 1.0 - ct * ct))
    phi = u.y * 2.0 * np.pi
    return V3(st * jnp.cos(phi), st * jnp.sin(phi), ct)


def _aniso_sample_wh(ex, ey, u: V2) -> V3:
    """Anisotropic half-vector sampling (anisotropic.dart sample_f /
    sampleFirstQuadrant + 4-quadrant mirroring); uniform-phi Blinn sampling
    when ex == ey."""
    u1, u2 = u.x, u.y
    q = jnp.minimum((u1 * 4.0).astype(jnp.int32), 3)
    u1q = jnp.clip(u1 * 4.0 - q.astype(jnp.float32), 0.0, 1.0 - 1e-7)
    phi_q = jnp.arctan(jnp.sqrt((ex + 1.0) / (ey + 1.0))
                       * jnp.tan(0.5 * np.pi * u1q))
    cph = jnp.cos(phi_q)
    sph = jnp.sin(phi_q)
    ct = jnp.power(jnp.maximum(u2, 1e-9),
                   1.0 / (ex * cph * cph + ey * sph * sph + 1.0))
    phi = jnp.where(q == 0, phi_q,
                    jnp.where(q == 1, np.pi - phi_q,
                              jnp.where(q == 2, np.pi + phi_q,
                                        2.0 * np.pi - phi_q)))
    st = jnp.sqrt(jnp.maximum(0.0, 1.0 - ct * ct))
    return V3(st * jnp.cos(phi), st * jnp.sin(phi), ct)


def _aniso_pdf(ex, ey, wo: V3, wi: V3):
    """pdf of _aniso_sample_wh mapped to wi (anisotropic.dart pdf);
    equals the Blinn pdf when ex == ey."""
    wh = vm.normalize(wo + wi)
    costh = abs_cos_theta(wh)
    ds = jnp.maximum(1.0 - costh * costh, 1e-12)
    e = (ex * wh.x * wh.x + ey * wh.y * wh.y) / ds
    d = jnp.sqrt(jnp.maximum((ex + 1.0) * (ey + 1.0), 0.0)) \
        * (0.5 * INV_PI) * jnp.power(jnp.maximum(costh, 1e-8), e)
    wodoth = jnp.abs(vm.dot(wo, wh))
    pdf_h = d / jnp.maximum(4.0 * wodoth, 1e-8)
    return jnp.where(same_hemisphere(wo, wi), pdf_h, 0.0)


def refract(wo: V3, eta):
    """Specular transmission direction in local frame
    (specular_transmission.dart sample_f). Returns (wi, valid, ei, et)."""
    entering = cos_theta(wo) > 0.0
    ei = jnp.where(entering, 1.0, eta)
    et = jnp.where(entering, eta, 1.0)
    sini2 = jnp.maximum(0.0, 1.0 - cos_theta(wo) ** 2)
    eta_r = ei / et
    sint2 = eta_r * eta_r * sini2
    valid = sint2 < 1.0
    cost = jnp.sqrt(jnp.maximum(0.0, 1.0 - sint2))
    cost = jnp.where(entering, -cost, cost)
    wi = V3(-eta_r * wo.x, -eta_r * wo.y, cost)
    return wi, valid, ei, et


# --- combined BSDF interface -----------------------------------------------

def _slot_weights(p: BSDFParams):
    return (p.kd, p.kd_t, p.ks, p.ks_t, p.kr, p.kt)


def _slot_active(p: BSDFParams, flags: int):
    """list of (R,) bool: slot has weight and matches requested flags."""
    act = []
    for s, w in enumerate(_slot_weights(p)):
        fl = SLOT_FLAGS[s]
        match = (fl & flags) == fl
        if match:
            has_w = (w.x != 0.0) | (w.y != 0.0) | (w.z != 0.0)
        else:
            has_w = jnp.zeros(jnp.shape(w.x), bool)
        # substrate uses kd in the glossy slot with ks possibly dark
        if s == GLOSS_R and match:
            has_w = has_w | ((p.gloss_fresnel == FR_BLEND)
                             & ((p.kd.x != 0.0) | (p.kd.y != 0.0)
                                | (p.kd.z != 0.0)))
        # measured BRDF rides the DIFF_R slot's cosine sampling/pdf
        if s == DIFF_R and match and p.meas is not None:
            has_w = has_w | (p.meas[0][:, 0] >= 0)
        act.append(has_w)
    return act      # list of 6 (R,) bools


def n_specular_components(p: BSDFParams):
    """(R,) int32 count of active specular components (BSDF.numComponents(
    BSDF_SPECULAR | BSDF_REFLECTION | BSDF_TRANSMISSION), used by the
    Metropolis bidirectional connection weights,
    metropolis_renderer.dart:636-637)."""
    act = _slot_active(p, ALL)
    return (act[SPEC_R].astype(jnp.int32) + act[SPEC_T].astype(jnp.int32))


def measured_f(meas, wo: V3, wi: V3) -> V3:
    """RegularHalfangleBRDF.f (regular_halfangle_brdf.dart:23-81): map
    (wo, wi) to the half/difference-angle table index, gather RGB.
    Inputs are LOCAL (shading-frame) directions."""
    idx, pool = meas
    wh = wo + wi
    flip = wh.z < 0.0
    wo = vm.where3(flip, -wo, wo)
    wi = vm.where3(flip, -wi, wi)
    wh = vm.where3(flip, -wh, wh)
    ok = vm.length_sq(wh) > 1e-12
    wh = wh * (1.0 / jnp.maximum(vm.length(wh), 1e-12))
    cth = jnp.clip(wh.z, -1.0, 1.0)
    sth = jnp.sqrt(jnp.maximum(1.0 - cth * cth, 0.0))
    inv_s = 1.0 / jnp.maximum(sth, 1e-9)
    cph = jnp.where(sth < 1e-9, 1.0, wh.x * inv_s)
    sph = jnp.where(sth < 1e-9, 0.0, wh.y * inv_s)
    whx = V3(cph * cth, sph * cth, -sth)
    why = V3(-sph, cph, jnp.zeros_like(sph))
    wd = V3(vm.dot(wi, whx), vm.dot(wi, why), vm.dot(wi, wh))
    wd_theta = jnp.arccos(jnp.clip(wd.z, -1.0, 1.0))
    wd_phi = jnp.arctan2(wd.y, wd.x)
    wd_phi = jnp.where(wd_phi < 0, wd_phi + 2 * np.pi, wd_phi)
    wd_phi = jnp.where(wd_phi > np.pi, wd_phi - np.pi, wd_phi)
    wh_theta = jnp.arccos(cth)
    nth = idx[:, 1]
    ntd = idx[:, 2]
    npd = idx[:, 3]

    def remap(v, vmax, count):
        i = (v / vmax * count.astype(jnp.float32)).astype(jnp.int32)
        return jnp.clip(i, 0, jnp.maximum(count - 1, 0))

    i_h = remap(jnp.sqrt(jnp.maximum(wh_theta / (np.pi / 2), 0.0)), 1.0,
                nth)
    i_d = remap(wd_theta, np.pi / 2, ntd)
    i_p = remap(wd_phi, np.pi, npd)
    flat = idx[:, 0] + i_p + npd * (i_d + i_h * ntd)
    val = vm.gather3(pool, jnp.maximum(flat, 0))
    return vm.where3(ok & (idx[:, 0] >= 0), val, 0.0)


def f(p: BSDFParams, frame: Frame, wo_w: V3, wi_w: V3, flags: int = ALL) -> V3:
    """BSDF value, non-specular lobes only (bsdf.dart f :135-156).
    Side test uses the GEOMETRIC normal (Appendix A.11)."""
    wo = frame.to_local(wo_w)
    wi = frame.to_local(wi_w)
    reflect = (vm.dot(wi_w, frame.ng) * vm.dot(wo_w, frame.ng)) > 0.0
    out = vm.v3zeros(jnp.shape(wo.z))
    act = _slot_active(p, flags)

    def eff_match(fl):
        # flags with TRANSMISSION/REFLECTION stripped by the geometric side
        m_refl = (fl & (flags & ~TRANSMISSION)) == fl
        m_trans = (fl & (flags & ~REFLECTION)) == fl
        return jnp.where(reflect, m_refl, m_trans)

    # diffuse reflection
    fl = SLOT_FLAGS[DIFF_R]
    m = act[DIFF_R] & eff_match(fl) & same_hemisphere(wo, wi)
    out = out + vm.where3(m, _diff_f(p.kd, p.sigma, wo, wi), 0.0)
    if p.meas is not None:   # measured BRDF lobe (same mask family)
        mm = m & (p.meas[0][:, 0] >= 0)
        out = out + vm.where3(mm, measured_f(p.meas, wo, wi), 0.0)
    # diffuse transmission (brdf_to_btdf: evaluate with wi flipped)
    fl = SLOT_FLAGS[DIFF_T]
    wif = _flip_z(wi)
    m = act[DIFF_T] & eff_match(fl) & same_hemisphere(wo, wif)
    out = out + vm.where3(m, _diff_f(p.kd_t, p.sigma, wo, wif), 0.0)
    # glossy reflection
    fl = SLOT_FLAGS[GLOSS_R]
    m = act[GLOSS_R] & eff_match(fl) & same_hemisphere(wo, wi)
    out = out + vm.where3(m, _gloss_f(p, p.ks, wo, wi), 0.0)
    # glossy transmission
    fl = SLOT_FLAGS[GLOSS_T]
    m = act[GLOSS_T] & eff_match(fl) & same_hemisphere(wo, wif)
    out = out + vm.where3(m, _gloss_f(p, p.ks_t, wo, wif), 0.0)
    return out


def pdf(p: BSDFParams, frame: Frame, wo_w: V3, wi_w: V3, flags: int = ALL):
    """Average pdf over matching lobes (bsdf.dart pdf :158-176)."""
    wo = frame.to_local(wo_w)
    wi = frame.to_local(wi_w)
    act = _slot_active(p, flags)
    n_match = sum(a.astype(jnp.float32) for a in act)
    total = jnp.zeros(jnp.shape(wo.z), jnp.float32)
    # diffuse lobes: cosine-hemisphere pdf on their side
    pd = smp.cosine_hemisphere_pdf(abs_cos_theta(wi))
    total += jnp.where(act[DIFF_R] & same_hemisphere(wo, wi), pd, 0.0)
    total += jnp.where(act[DIFF_T] & ~same_hemisphere(wo, wi), pd, 0.0)
    pg = _aniso_pdf(p.exponent, _ey(p), wo, wi)
    total += jnp.where(act[GLOSS_R], pg, 0.0)
    wif = _flip_z(wi)
    pgt = _aniso_pdf(p.exponent, _ey(p), wo, wif)
    total += jnp.where(act[GLOSS_T], pgt, 0.0)
    # specular lobes contribute 0 to pdf but count in the average
    return total / jnp.maximum(n_match, 1.0)


class BSDFSample(NamedTuple):
    wi: V3                # world-space sampled direction
    f: V3                 # BSDF value (NOT divided by pdf)
    pdf: jnp.ndarray      # (R,)
    flags: jnp.ndarray    # (R,) int32 sampled-lobe flags
    valid: jnp.ndarray    # (R,) bool


def sample_f(p: BSDFParams, frame: Frame, wo_w: V3, u2, uc,
             flags: int = ALL) -> BSDFSample:
    """Sample the stack (bsdf.dart sample_f :53-133).

    Lobe chosen by uc * matchingComps; pdf averaged over matching lobes
    (specular excluded from others' pdf); for non-specular choices f is
    re-evaluated over all matching lobes with the geometric side test.
    """
    u2 = vm.from_arr2(u2)
    wo = frame.to_local(wo_w)
    act = _slot_active(p, flags)                       # 6 x (R,)
    n_match = sum(a.astype(jnp.int32) for a in act)    # (R,)
    # which = index (among matching) chosen
    which = jnp.minimum((uc * n_match.astype(jnp.float32)).astype(jnp.int32),
                        jnp.maximum(n_match - 1, 0))
    # chosen_slot[r] = s where act[s] and (# active below s) == which
    cum = jnp.zeros_like(n_match)
    chosen = jnp.zeros_like(n_match)
    found = jnp.zeros(jnp.shape(n_match), bool)
    for s in range(N_SLOTS):
        a = act[s]
        hit = a & (cum == which) & ~found
        chosen = jnp.where(hit, s, chosen)
        found = found | hit
        cum = cum + a.astype(jnp.int32)

    # candidate wi per slot family
    wi_dr = smp.cosine_sample_hemisphere(u2)
    wi_dr = vm.where3(wo.z < 0, _flip_z(wi_dr), wi_dr)
    wi_dt = _flip_z(wi_dr)
    wh = _aniso_sample_wh(p.exponent, _ey(p), u2)
    wh = vm.where3(wo.z < 0, _flip_z(wh), wh)
    wi_gr = -wo + wh * (2.0 * vm.dot(wo, wh))
    wi_gt = _flip_z(wi_gr)
    wi_sr = V3(-wo.x, -wo.y, wo.z)
    wi_st, st_valid, ei, et = refract(wo, p.eta)

    wi = vm.where3(chosen == DIFF_R, wi_dr,
         vm.where3(chosen == DIFF_T, wi_dt,
         vm.where3(chosen == GLOSS_R, wi_gr,
         vm.where3(chosen == GLOSS_T, wi_gt,
         vm.where3(chosen == SPEC_R, wi_sr, wi_st)))))

    is_spec = (chosen == SPEC_R) | (chosen == SPEC_T)
    wi_w = frame.to_world(wi)

    # --- specular f/pdf (delta): f/|cos|, pdf = 1 (per chosen lobe) -------
    acx = jnp.maximum(abs_cos_theta(wi), 1e-8)
    fr_d = fr_dielectric(cos_theta(wo), p.eta)
    fr_d3 = V3(fr_d, fr_d, fr_d)
    fr_c = fr_conductor(cos_theta(wo), p.eta_c, p.k_c)
    ones = jnp.ones_like(fr_d)
    fr_sel = vm.where3(p.spec_fresnel == FR_DIELECTRIC, fr_d3,
                       vm.where3(p.spec_fresnel == FR_CONDUCTOR, fr_c,
                                 V3(ones, ones, ones)))
    inv_acx = 1.0 / acx
    f_sr = p.kr * fr_sel * inv_acx
    # transmission: (1-F) * kt * (ei^2/et^2) / |cos|
    f_st = p.kt * ((1.0 - fr_d) * (ei * ei) / (et * et) * inv_acx)
    f_st = vm.where3(st_valid, f_st, 0.0)
    f_spec = vm.where3(chosen == SPEC_R, f_sr, f_st)

    # --- non-specular combined f and averaged pdf -------------------------
    f_ns = f(p, frame, wo_w, wi_w, flags)
    pdf_ns = pdf(p, frame, wo_w, wi_w, flags)

    out_f = vm.where3(is_spec, f_spec, f_ns)
    out_pdf = jnp.where(is_spec,
                        1.0 / jnp.maximum(n_match.astype(jnp.float32), 1.0),
                        pdf_ns)
    valid = (n_match > 0) & (out_pdf > 0.0) \
        & jnp.where(chosen == SPEC_T, st_valid, True)
    slot_flags = jnp.asarray(SLOT_FLAGS, jnp.int32)[chosen]
    return BSDFSample(wi=wi_w, f=out_f, pdf=out_pdf, flags=slot_flags,
                      valid=valid)


def slot_count(p: BSDFParams, flags: int = ALL):
    return sum(a.astype(jnp.int32) for a in _slot_active(p, flags))
