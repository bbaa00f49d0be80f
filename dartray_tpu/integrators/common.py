"""Shared integrator machinery: MIS direct-lighting estimation over wavefronts.

TPU-native replacement for lib/core/integrator.dart:32-303 —
UniformSampleAllLights (:39-77), UniformSampleOneLight (:79-117),
EstimateDirect (:119-185, the single most reused shading routine), and the
specular-recursion helpers. All functions operate on whole wavefronts with
per-ray masks; shadow rays are full any-hit traversal waves. All vectors and
colors are component-SoA (vm.V3).
"""
from __future__ import annotations

import jax
import jax.numpy as jnp

from .. import bsdf as bx
from .. import lights as lt_mod
from ..accel import traverse
from ..core import math as vm
from ..core import sampling as smp
from ..core import spectrum as spec
from ..scene import types as st


def shadow_ray(p, ng, n_side, wi, dist, eps, time=None):
    """Offset shadow ray (VisibilityTester.setSegment semantics); `time`
    carries the surface ray's shutter time (motion-blur occlusion)."""
    ng_f = vm.face_forward(ng, wi)
    o = p + ng_f * eps
    return vm.Rays(o=o, d=wi,
                   tmin=jnp.zeros_like(dist),
                   tmax=dist * (1.0 - 1e-3) - eps,
                   time=jnp.zeros_like(dist) if time is None else time)


def estimate_direct(scene, it, frame, params, wo, light_idx,
                    u_light, uc_light, u_bsdf, uc_bsdf,
                    flags=bx.ALL & ~bx.SPECULAR):
    """MIS light+BSDF sampling toward one light (integrator.dart:119-185,
    Appendix A.3). Returns V3 direct radiance estimate."""
    geom = scene.geometry
    lt = scene.lights
    p = it["p"]
    eps = st.ray_epsilon(it["t"])
    ns = frame.n

    # ---- light-sampling term --------------------------------------------
    ls = lt_mod.sample_li(lt, geom, light_idx, p, u_light, uc_light)
    f_l = bx.f(params, frame, wo, ls.wi, flags)
    cos_l = vm.absdot(ls.wi, ns)
    usable = (ls.pdf > 0.0) & spec.any_nonzero(ls.li) & spec.any_nonzero(f_l)
    sray = shadow_ray(p, it["ng"], ns, ls.wi, ls.dist, eps,
                      time=it.get("time"))
    occluded = st.intersect_p(geom, sray)
    # delta lights: plain estimate; others: power heuristic vs bsdf pdf
    bsdf_pdf = bx.pdf(params, frame, wo, ls.wi, flags)
    w_l = jnp.where(ls.is_delta, 1.0,
                    smp.power_heuristic(1.0, ls.pdf, 1.0, bsdf_pdf))
    contrib_l = f_l * ls.li * (cos_l * w_l / jnp.maximum(ls.pdf, 1e-20))
    ld = vm.where3(usable & ~occluded, contrib_l, 0.0)

    # ---- BSDF-sampling term (non-delta lights only) ----------------------
    bs = bx.sample_f(params, frame, wo, u_bsdf, uc_bsdf, flags)
    cos_b = vm.absdot(bs.wi, ns)
    sampled_specular = (bs.flags & bx.SPECULAR) != 0
    b_usable = bs.valid & (bs.pdf > 0.0) & spec.any_nonzero(bs.f) \
        & ~ls.is_delta
    # trace toward the light
    ng_f = vm.face_forward(it["ng"], bs.wi)
    bray = vm.Rays(o=p + ng_f * eps, d=bs.wi,
                   tmin=jnp.zeros_like(eps),
                   tmax=jnp.full_like(eps, lt_mod.INF_DIST),
                   time=jnp.zeros_like(eps))
    bh = st.intersect(geom, bray)
    hit_prim = jnp.maximum(bh.prim, 0)
    # attr rows: prefetched by the traversal finish on the Pallas path,
    # else one wide row gather (precomputed ng + light id)
    hrows = bh.rows if getattr(bh, "rows", None) is not None \
        else st.attr_rows(geom, hit_prim)
    hit_lid = jax.lax.bitcast_convert_type(hrows[34], jnp.int32)
    hit_light = jnp.where(bh.prim >= 0, hit_lid, -1)
    same_light = (hit_light >= 0) & (hit_light == light_idx)
    # emitted radiance from the hit light point (facing test)
    n_hit = st.attr_v3(hrows, 9)
    cos_hit = vm.dot(n_hit, -bs.wi)
    li_hit = vm.where3(same_light & (cos_hit > 0),
                       lt_mod._g3(lt.intensity, jnp.maximum(hit_light, 0)),
                       0.0)
    light_pdf_area = lt_mod.pdf_li_area(lt, light_idx, p, bs.wi, bh.t,
                                        jnp.abs(cos_hit))
    # escaped to the infinite light?
    is_env = lt.kind[jnp.maximum(light_idx, 0)] == lt_mod.INFINITE
    escaped = (bh.prim < 0) & is_env
    if lt.env_light_index >= 0:
        li_env = lt_mod.env_le(lt, bs.wi)
        env_pdf = lt_mod.env_pdf(lt, bs.wi)
    else:
        li_env = vm.v3zeros(jnp.shape(bh.t))
        env_pdf = jnp.zeros_like(bh.t)
    li_b = vm.where3(escaped, li_env, li_hit)
    light_pdf_b = jnp.where(escaped, env_pdf,
                            jnp.where(same_light, light_pdf_area, 0.0))
    got_light = escaped | same_light
    w_b = jnp.where(sampled_specular, 1.0,
                    smp.power_heuristic(1.0, bs.pdf, 1.0, light_pdf_b))
    contrib_b = bs.f * li_b * (cos_b * w_b / jnp.maximum(bs.pdf, 1e-20))
    ld = ld + vm.where3(b_usable & got_light, contrib_b, 0.0)
    return ld


def nee_prepare(scene, it, frame, params, wo, u_select, u_light, uc_light,
                mask, flags=bx.ALL & ~bx.SPECULAR):
    """The shade half of next-event estimation: sample one light, evaluate
    the BSDF toward it, build the (masked) shadow ray — WITHOUT tracing it.
    Returns (sray, usable, contrib): trace sray any-hit, then add
    where3(usable & ~occluded, contrib). Split out so the path integrator
    can batch the shadow ray with the next bounce's extension ray into one
    merged traversal launch (scene/types.intersect_pair)."""
    geom = scene.geometry
    lt = scene.lights
    n_lights = lt.n
    light_idx = jnp.minimum((u_select * n_lights).astype(jnp.int32),
                            n_lights - 1)
    p = it["p"]
    eps = st.ray_epsilon(it["t"])
    ns = frame.n
    ls = lt_mod.sample_li(lt, geom, light_idx, p, u_light, uc_light)
    f_l = bx.f(params, frame, wo, ls.wi, flags)
    cos_l = vm.absdot(ls.wi, ns)
    usable = mask & (ls.pdf > 0.0) & spec.any_nonzero(ls.li) \
        & spec.any_nonzero(f_l)
    sray = shadow_ray(p, it["ng"], ns, ls.wi, ls.dist, eps,
                      time=it.get("time"))
    sray = sray._replace(tmax=jnp.where(usable, sray.tmax, -1.0))
    pdf_nee = ls.pdf / float(n_lights)
    bsdf_pdf = bx.pdf(params, frame, wo, ls.wi, flags)
    w_l = jnp.where(ls.is_delta, 1.0,
                    smp.power_heuristic(1.0, pdf_nee, 1.0, bsdf_pdf))
    contrib = f_l * ls.li * (cos_l * w_l / jnp.maximum(pdf_nee, 1e-20))
    return sray, usable, contrib


def nee_one_light(scene, it, frame, params, wo, u_select, u_light, uc_light,
                  mask, flags=bx.ALL & ~bx.SPECULAR, order=None):
    """Next-event estimation toward one uniformly chosen light — the
    light-sampling HALF of EstimateDirect (integrator.dart:119-152). The
    BSDF-sampling half is folded into the path-extension ray instead (the
    wavefront restructure: one closest-hit ray serves both path extension and
    MIS light hits, so each bounce costs 2 traversals, not 3).

    The MIS weight compares the full NEE direction pdf (light pdf / nLights)
    against the BSDF pdf, matching the weight applied to emitter hits on the
    extension ray in integrators/path.py. `mask`: lanes that need a shadow
    ray; dead lanes get tmax < tmin so the sorted traversal skips them."""
    del order
    if scene.lights.n == 0:
        return vm.v3zeros(jnp.shape(it["t"]))
    sray, usable, contrib = nee_prepare(scene, it, frame, params, wo,
                                        u_select, u_light, uc_light, mask,
                                        flags)
    occluded = st.intersect_p(scene.geometry, sray)
    return vm.where3(usable & ~occluded, contrib, 0.0)


def emitter_hit_mis(scene, cur, hits, it, prev_pdf, prev_specular,
                    first_vertex):
    """MIS-weighted emitted radiance gathered by the path-extension ray
    (the BSDF-sampling half of EstimateDirect: integrator.dart:153-185,
    evaluated at the extension hit instead of with a dedicated ray).

    Returns V3: weighted Le for lanes whose extension ray hit an emissive
    prim or escaped to the infinite light. first_vertex / prev_specular lanes
    get weight 1 (delta-sampled or primary visibility)."""
    lt = scene.lights
    geom = scene.geometry
    if lt is None or lt.n == 0:
        return vm.v3zeros(jnp.shape(cur.tmin))
    n_l = float(lt.n)
    out = vm.v3zeros(jnp.shape(cur.tmin))
    # emissive surface hit (light id comes from the interaction attr row —
    # no extra gather)
    lid = jnp.where(hits.prim >= 0, it["light_id"], -1)
    le = lt_mod.le_emitted(lt, geom, hits.prim, it["wo"], it["ns"],
                           lid=it["light_id"])
    cos_hit = vm.absdot(it["ng"], it["wo"])
    pdf_area = lt_mod.pdf_li_area(lt, jnp.maximum(lid, 0), cur.o, cur.d,
                                  hits.t, cos_hit) / n_l
    w_surf = jnp.where(first_vertex | prev_specular, 1.0,
                       smp.power_heuristic(1.0, prev_pdf, 1.0, pdf_area))
    out = out + vm.where3(lid >= 0, le * w_surf, 0.0)
    # escaped to the environment light
    if lt.env_light_index >= 0:
        le_env = lt_mod.env_le(lt, cur.d)
        pdf_env = lt_mod.env_pdf(lt, cur.d) / n_l
        w_env = jnp.where(first_vertex | prev_specular, 1.0,
                          smp.power_heuristic(1.0, prev_pdf, 1.0, pdf_env))
        out = out + vm.where3(hits.prim < 0, le_env * w_env, 0.0)
    return out


def uniform_sample_one_light(scene, it, frame, params, wo, u_select,
                             u_light, uc_light, u_bsdf, uc_bsdf,
                             flags=bx.ALL & ~bx.SPECULAR):
    """Pick one light uniformly, scale by nLights (integrator.dart:79-117)."""
    n_lights = scene.lights.n
    if n_lights == 0:
        return vm.v3zeros(jnp.shape(it["t"]))
    light_idx = jnp.minimum((u_select * n_lights).astype(jnp.int32),
                            n_lights - 1)
    ld = estimate_direct(scene, it, frame, params, wo, light_idx,
                         u_light, uc_light, u_bsdf, uc_bsdf, flags)
    return ld * float(n_lights)


def uniform_sample_all_lights(scene, it, frame, params, wo, sctx, dim0,
                              n_samples_per_light=1,
                              flags=bx.ALL & ~bx.SPECULAR):
    """Sum direct light over every light (integrator.dart:39-77).

    Wavefront restructure: one `lax.fori_loop` over (light, sample) pairs —
    compile time and program size are FLAT in the light count (the round-2
    Python loop recompiled/retraced per light, scaling the directlighting
    "all"-strategy and whitted compile linearly in n_lights). Each iteration
    runs a full estimate_direct wave (2 traversals) with a traced light index
    and traced sample dimensions; the counter-based samplers hash the traced
    dim, so each (light, sample) pair draws independent stratified points."""
    from .. import samplers as smp_mod
    n_lights = scene.lights.n
    r = jnp.shape(it["t"])[0]
    ns = int(n_samples_per_light)
    inv_ns = 1.0 / float(ns)

    def body(i, total):
        li = (i // ns).astype(jnp.int32)
        dim = dim0 + i * 6
        u_l = smp_mod.sample_2d(sctx["sampler"], sctx["px"], sctx["py"],
                                sctx["s_idx"], dim)
        uc_l = smp_mod.sample_1d(sctx["sampler"], sctx["px"], sctx["py"],
                                 sctx["s_idx"], dim + 2)
        u_b = smp_mod.sample_2d(sctx["sampler"], sctx["px"], sctx["py"],
                                sctx["s_idx"], dim + 3)
        uc_b = smp_mod.sample_1d(sctx["sampler"], sctx["px"], sctx["py"],
                                 sctx["s_idx"], dim + 5)
        idx = jnp.full((r,), 0, jnp.int32) + li
        ld = estimate_direct(scene, it, frame, params, wo, idx,
                             u_l, uc_l, u_b, uc_b, flags)
        return total + ld * inv_ns

    total = jax.lax.fori_loop(0, n_lights * ns, body, vm.v3zeros((r,)))
    return total
