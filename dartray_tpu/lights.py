"""Light table: all lights flattened into typed parameter rows + CDF arrays.

TPU-native replacement for lib/lights/ (point (109 LoC), spot (131),
distant (102), projection (181), goniometric (117), infinite_area_light.dart:37,
diffuse_area_light.dart:102) and lib/core/light.dart:27-131 /
shape_set.dart:23-50 / visibility_tester.dart. sample_li is evaluated for a
wavefront with per-ray light indices: each light type's math runs for all
lanes and the row's type selects the result (types are few and cheap; the
expensive part — the envmap 2D-CDF sampling — is shared machinery).

Area lights reference contiguous triangle ranges of the global prim arrays
with a per-light area CDF (ShapeSet semantics); the emitted-radiance check
after BSDF sampling is geometric (hit prim's light_id), matching
EstimateDirect's "same primitive" test (integrator.dart:119-185).
"""
from __future__ import annotations

import dataclasses
from functools import partial
from typing import NamedTuple, Optional

import numpy as np
import jax
import jax.numpy as jnp

from .core import math as vm
from .core import sampling as smp
from .core import spectrum as spec

POINT = 0
SPOT = 1
DISTANT = 2
AREA = 3
INFINITE = 4
PROJECTION = 5
GONIOMETRIC = 6

INF_DIST = 1e7  # "escaped" shadow-ray length for distant/infinite lights


@partial(jax.tree_util.register_dataclass,
         data_fields=["kind", "p", "intensity", "params", "w2l",
                      "tri_offset", "tri_count", "tri_area_cdf", "cdf_offset",
                      "total_area", "scene_radius", "power_cdf",
                      "env_map", "env_cond_cdf", "env_cond_func",
                      "env_cond_int", "env_marg_cdf", "env_marg_func",
                      "env_marg_int", "proj_map"],
         meta_fields=["n", "env_light_index", "env_w", "env_h"])
@dataclasses.dataclass
class LightTable:
    kind: jnp.ndarray        # (L,) int32
    p: jnp.ndarray           # (L, 3) position (point/spot) | direction (distant)
    intensity: jnp.ndarray   # (L, 3) I / L / radiance scale
    params: jnp.ndarray      # (L, 8): spot: [cosTotal, cosFalloff, ...]
    w2l: jnp.ndarray         # (L, 4, 4) world->light (spot/proj/gonio/inf)
    # area lights
    tri_offset: jnp.ndarray  # (L,) int32 first prim id
    tri_count: jnp.ndarray   # (L,) int32
    tri_area_cdf: jnp.ndarray  # (sum_tris + L,) flattened per-light CDFs
    cdf_offset: jnp.ndarray  # (L,) int32 offset into tri_area_cdf
    total_area: jnp.ndarray  # (L,)
    scene_radius: jnp.ndarray  # () world bound radius (for power/infinite)
    power_cdf: jnp.ndarray   # (L+1,) power distribution CDF
    # infinite light (at most one; None-shaped placeholders otherwise)
    env_map: jnp.ndarray       # (He, We, 3) radiance texels
    env_cond_cdf: jnp.ndarray  # Distribution2D internals (lat-long)
    env_cond_func: jnp.ndarray
    env_cond_int: jnp.ndarray
    env_marg_cdf: jnp.ndarray
    env_marg_func: jnp.ndarray
    env_marg_int: jnp.ndarray
    proj_map: jnp.ndarray      # (Hp, Wp, 3) projection/gonio map (shared slot)
    n: int
    env_light_index: int     # -1 if no infinite light
    env_w: int
    env_h: int


class LightSpec(NamedTuple):
    """Host-side description used by the scene compiler."""
    kind: int
    p: tuple = (0.0, 0.0, 0.0)
    intensity: tuple = (1.0, 1.0, 1.0)
    params: tuple = (0.0,) * 8
    w2l: Optional[np.ndarray] = None
    tri_offset: int = 0
    tri_count: int = 0
    tri_areas: Optional[np.ndarray] = None
    env_map: Optional[np.ndarray] = None     # (He, We, 3)
    proj_map: Optional[np.ndarray] = None


def point_light(p, intensity=(1.0,) * 3):
    return LightSpec(POINT, p=tuple(p), intensity=tuple(intensity))


def spot_light(p, w2l, intensity=(1.0,) * 3, cone_angle=30.0,
               cone_delta=5.0):
    """spot_light.dart: falloff between cos(total) and cos(total-delta)."""
    ct = float(np.cos(np.radians(cone_angle)))
    cf = float(np.cos(np.radians(cone_angle - cone_delta)))
    return LightSpec(SPOT, p=tuple(p), intensity=tuple(intensity),
                     params=(ct, cf) + (0.0,) * 6, w2l=w2l)


def distant_light(direction, radiance=(1.0,) * 3):
    d = np.asarray(direction, np.float64)
    d = d / np.linalg.norm(d)
    return LightSpec(DISTANT, p=tuple(d), intensity=tuple(radiance))


def area_light(tri_offset, tri_areas, L=(1.0,) * 3, n_samples=1):
    return LightSpec(AREA, intensity=tuple(L), tri_offset=tri_offset,
                     tri_count=len(tri_areas),
                     tri_areas=np.asarray(tri_areas, np.float64),
                     params=(float(n_samples),) + (0.0,) * 7)


def infinite_light(env_map, w2l=None, L_scale=(1.0,) * 3):
    return LightSpec(INFINITE, intensity=tuple(L_scale),
                     env_map=np.asarray(env_map, np.float32), w2l=w2l)


def projection_light(p, w2l, intensity=(1.0,) * 3, fov=45.0, proj_map=None):
    """projection_light.dart: perspective-projected texture light."""
    if proj_map is None:
        proj_map = np.ones((1, 1, 3), np.float32)
    aspect = proj_map.shape[1] / proj_map.shape[0]
    t = np.tan(np.radians(fov) / 2.0)
    if aspect > 1.0:
        s1, s0 = t, t / aspect
    else:
        s1, s0 = t * aspect, t
    cos_total = float(1.0 / np.sqrt(1.0 + s0 * s0 + s1 * s1))
    return LightSpec(PROJECTION, p=tuple(p), intensity=tuple(intensity),
                     params=(cos_total, float(s1), float(s0)) + (0.0,) * 5,
                     w2l=w2l, proj_map=np.asarray(proj_map, np.float32))


def goniometric_light(p, w2l, intensity=(1.0,) * 3, gonio_map=None):
    """goniometric_light.dart: lat-long angular intensity map."""
    if gonio_map is None:
        gonio_map = np.ones((1, 1, 3), np.float32)
    return LightSpec(GONIOMETRIC, p=tuple(p), intensity=tuple(intensity),
                     w2l=w2l, proj_map=np.asarray(gonio_map, np.float32))


def build_table(specs, scene_radius=10.0) -> LightTable:
    l = max(len(specs), 1)
    kind = np.zeros(l, np.int32)
    p = np.zeros((l, 3), np.float32)
    inten = np.zeros((l, 3), np.float32)
    params = np.zeros((l, 8), np.float32)
    w2l = np.tile(np.eye(4, dtype=np.float32), (l, 1, 1))
    tri_offset = np.zeros(l, np.int32)
    tri_count = np.zeros(l, np.int32)
    cdf_offset = np.zeros(l, np.int32)
    total_area = np.zeros(l, np.float32)
    cdfs = []
    env_idx, env_map = -1, np.zeros((1, 1, 3), np.float32)
    proj_map = np.ones((1, 1, 3), np.float32)
    off = 0
    for i, s in enumerate(specs):
        kind[i] = s.kind
        p[i] = s.p
        inten[i] = s.intensity
        params[i] = s.params
        if s.w2l is not None:
            w2l[i] = np.asarray(s.w2l, np.float32)
        if s.kind == AREA:
            areas = s.tri_areas
            cdf = np.concatenate([[0.0], np.cumsum(areas)])
            total_area[i] = cdf[-1]
            cdf = cdf / max(cdf[-1], 1e-20)
            tri_offset[i] = s.tri_offset
            tri_count[i] = s.tri_count
            cdf_offset[i] = off
            cdfs.append(cdf.astype(np.float32))
            off += len(cdf)
        if s.kind == INFINITE:
            env_idx = i
            env_map = s.env_map
        if s.kind in (PROJECTION, GONIOMETRIC) and s.proj_map is not None:
            proj_map = s.proj_map
    tri_area_cdf = (np.concatenate(cdfs) if cdfs
                    else np.zeros(1, np.float32))
    # power CDF (ComputeLightSamplingCDF, integrator.dart:292-302)
    powers = np.zeros(l, np.float32)
    _lum_w = (spec.BANDS_TO_XYZ[1] if spec.mode() == "sampled"
              else spec.RGB_TO_XYZ[1])
    for i, s in enumerate(specs):
        lum = float(np.dot(_lum_w, np.asarray(s.intensity)))
        if s.kind == POINT:
            powers[i] = 4 * np.pi * lum
        elif s.kind == SPOT:
            powers[i] = 2 * np.pi * (1 - 0.5 * (params[i, 0] + params[i, 1])) * lum
        elif s.kind == DISTANT:
            powers[i] = np.pi * scene_radius ** 2 * lum
        elif s.kind == AREA:
            powers[i] = np.pi * total_area[i] * lum
        elif s.kind == INFINITE:
            m = float(np.dot(np.asarray(s.env_map).reshape(-1, 3).mean(0),
                             _lum_w)) * lum
            powers[i] = np.pi * scene_radius ** 2 * m
        else:
            powers[i] = 4 * np.pi * lum
    pc = np.concatenate([[0.0], np.cumsum(powers)])
    pc = pc / max(pc[-1], 1e-20)

    # infinite-light importance distribution: luminance * sin(theta)
    # (infinite_area_light.dart:240-306)
    if spec.mode() == "sampled":
        # RGB map files -> band averages (importance luminance recomputed
        # below from the banded radiance)
        env_map = spec.rgb_to_bands(env_map).astype(np.float32)
        proj_map = spec.rgb_to_bands(proj_map).astype(np.float32)
    he, we = env_map.shape[:2]
    lum_w = (spec.BANDS_TO_XYZ[1] if spec.mode() == "sampled"
             else spec.RGB_TO_XYZ[1])
    lum_img = env_map @ lum_w
    sin_t = np.sin(np.pi * (np.arange(he) + 0.5) / he)
    # host numpy end-to-end — one device_put at render entry (to_device)
    d2 = smp.Distribution2D(np.asarray(lum_img * sin_t[:, None] + 1e-9))
    return LightTable(
        kind=kind, p=p, intensity=inten,
        params=params, w2l=w2l,
        tri_offset=tri_offset, tri_count=tri_count,
        tri_area_cdf=tri_area_cdf,
        cdf_offset=cdf_offset,
        total_area=total_area,
        scene_radius=np.float32(scene_radius),
        power_cdf=np.asarray(pc, np.float32),
        env_map=np.asarray(env_map, np.float32),
        env_cond_cdf=d2.cond_cdf, env_cond_func=d2.cond_func,
        env_cond_int=d2.cond_int, env_marg_cdf=d2.marg_cdf,
        env_marg_func=d2.marg_func, env_marg_int=d2.marg_int,
        proj_map=np.asarray(proj_map, np.float32),
        n=len(specs), env_light_index=env_idx, env_w=we, env_h=he)


class LiSample(NamedTuple):
    wi: jnp.ndarray        # (R, 3) direction to light
    li: jnp.ndarray        # (R, 3) incident radiance
    pdf: jnp.ndarray       # (R,) solid-angle pdf
    dist: jnp.ndarray      # (R,) shadow-ray length
    is_delta: jnp.ndarray  # (R,) bool


def _env_lookup(lt: LightTable, uv):
    """Bilinear texel fetch of the lat-long radiance map (MIPMap.lookup on
    the envmap, infinite_area_light.dart Le/sampleL): phi wraps, theta
    clamps."""
    xx = uv[..., 0] * lt.env_w - 0.5
    yy = uv[..., 1] * lt.env_h - 0.5
    x0 = jnp.floor(xx).astype(jnp.int32)
    y0 = jnp.floor(yy).astype(jnp.int32)
    fx = (xx - x0)[..., None]
    fy = (yy - y0)[..., None]

    def at(x, y):
        x = x % lt.env_w                              # phi wraps
        y = jnp.clip(y, 0, lt.env_h - 1)              # theta clamps
        return lt.env_map[y, x]

    c00 = at(x0, y0)
    c10 = at(x0 + 1, y0)
    c01 = at(x0, y0 + 1)
    c11 = at(x0 + 1, y0 + 1)
    return ((c00 * (1 - fx) + c10 * fx) * (1 - fy)
            + (c01 * (1 - fx) + c11 * fx) * fy)


def _env_sample(lt: LightTable, u):
    """Distribution2D sample over the lat-long map -> (dir_l, L, pdf_sa)."""
    nu, nv = lt.env_w, lt.env_h
    # marginal over v
    u0, u1 = u[..., 0], u[..., 1]
    v_off = jnp.clip(jnp.searchsorted(lt.env_marg_cdf, u1, side="right") - 1,
                     0, nv - 1)
    mlo = lt.env_marg_cdf[v_off]
    mhi = lt.env_marg_cdf[v_off + 1]
    dv = (u1 - mlo) / jnp.maximum(mhi - mlo, 1e-30)
    pdf_v = lt.env_marg_func[v_off] / jnp.maximum(lt.env_marg_int, 1e-30)
    v = (v_off.astype(jnp.float32) + dv) / nv
    row_cdf = lt.env_cond_cdf[v_off]
    u_off = jnp.clip(
        jax.vmap(lambda c, x: jnp.searchsorted(c, x, side="right"))(
            row_cdf.reshape(-1, nu + 1), u0.reshape(-1)).reshape(u0.shape)
        - 1, 0, nu - 1)
    clo = jnp.take_along_axis(row_cdf, u_off[..., None], axis=-1)[..., 0]
    chi = jnp.take_along_axis(row_cdf, u_off[..., None] + 1, axis=-1)[..., 0]
    du = (u0 - clo) / jnp.maximum(chi - clo, 1e-30)
    pdf_u = lt.env_cond_func[v_off, u_off] / jnp.maximum(
        lt.env_cond_int[v_off], 1e-30)
    uu = (u_off.astype(jnp.float32) + du) / nu
    map_pdf = pdf_u * pdf_v
    theta = v * jnp.pi
    phi = uu * 2.0 * jnp.pi
    sin_t = jnp.sin(theta)
    dir_l = jnp.stack([sin_t * jnp.cos(phi), sin_t * jnp.sin(phi),
                       jnp.cos(theta)], axis=-1)
    pdf_sa = map_pdf / jnp.maximum(2.0 * jnp.pi * jnp.pi * sin_t, 1e-8)
    L = _env_lookup(lt, jnp.stack([uu, v], axis=-1))
    return dir_l, L, jnp.where(sin_t > 1e-8, pdf_sa, 0.0)


def env_le(lt: LightTable, d_world):
    """Escaped-ray radiance Le(ray) for the infinite light
    (infinite_area_light.dart Le)."""
    if lt.env_light_index < 0:
        return jnp.zeros(d_world.shape, jnp.float32)
    w2l = lt.w2l[lt.env_light_index]
    d = vm.normalize(d_world @ w2l[:3, :3].T)
    uv = jnp.stack([vm.spherical_phi(d) * (0.5 / jnp.pi),
                    vm.spherical_theta(d) / jnp.pi], axis=-1)
    return _env_lookup(lt, uv) * lt.intensity[lt.env_light_index]


def env_pdf(lt: LightTable, d_world):
    """Solid-angle pdf of sampling direction d from the envmap
    (infinite_area_light.dart:190-204)."""
    if lt.env_light_index < 0:
        return jnp.zeros(d_world.shape[:-1], jnp.float32)
    w2l = lt.w2l[lt.env_light_index]
    d = vm.normalize(d_world @ w2l[:3, :3].T)
    theta = vm.spherical_theta(d)
    phi = vm.spherical_phi(d)
    sin_t = jnp.sin(theta)
    iu = jnp.clip((phi * (0.5 / jnp.pi) * lt.env_w).astype(jnp.int32),
                  0, lt.env_w - 1)
    iv = jnp.clip((theta / jnp.pi * lt.env_h).astype(jnp.int32),
                  0, lt.env_h - 1)
    map_pdf = lt.env_cond_func[iv, iu] / jnp.maximum(lt.env_marg_int, 1e-30)
    return jnp.where(sin_t > 1e-8,
                     map_pdf / jnp.maximum(2.0 * jnp.pi * jnp.pi * sin_t,
                                           1e-8), 0.0)


def sample_li(lt: LightTable, geom, light_idx, p_surf, u, uc=None) -> LiSample:
    """Per-ray light sampling (Light.sampleLAtPoint, light.dart:60-97).

    geom: scene geometry (for area-light triangle lookup). light_idx: (R,)
    int32. u: (R, 2). uc: optional (R,) component sample for triangle choice
    (LightSample.uComponent).
    """
    li_ = jnp.maximum(light_idx, 0)
    kind = lt.kind[li_]
    lp = lt.p[li_]
    inten = lt.intensity[li_]
    prm = lt.params[li_]
    w2l = lt.w2l[li_]
    r = p_surf.shape[0]
    if uc is None:
        uc = u[..., 0]  # reference draws a separate uComponent; reuse is fine

    # --- point / spot / projection / goniometric (delta, at position) -----
    to_l = lp - p_surf
    d2 = jnp.maximum(vm.length_sq(to_l), 1e-12)
    dist = jnp.sqrt(d2)
    wi_point = to_l / dist[..., None]
    li_point = inten / d2[..., None]
    # spot falloff (spot_light.dart:131 falloff): local -wi angle vs cone
    wl = vm.normalize(jnp.einsum("rij,rj->ri", w2l[:, :3, :3], -wi_point))
    cos_t = wl[..., 2]
    ct, cf = prm[..., 0], prm[..., 1]
    delta = (cos_t - ct) / jnp.maximum(cf - ct, 1e-8)
    falloff = jnp.clip(delta, 0.0, 1.0) ** 4
    falloff = jnp.where(cos_t < ct, 0.0, jnp.where(cos_t > cf, 1.0, falloff))
    li_spot = li_point * falloff[..., None]
    # projection: map lookup in projective coords
    s1, s0 = prm[..., 1], prm[..., 2]
    pz = jnp.maximum(cos_t, 1e-6)
    px_ = wl[..., 0] / pz
    py_ = wl[..., 1] / pz
    inside = ((cos_t > prm[..., 0]) & (jnp.abs(px_) < s1 + 1e-9)
              & (jnp.abs(py_) < s0 + 1e-9))
    puv = jnp.stack([(px_ / jnp.maximum(s1, 1e-9) + 1) * 0.5,
                     (py_ / jnp.maximum(s0, 1e-9) + 1) * 0.5], axis=-1)
    hp, wp = lt.proj_map.shape[0], lt.proj_map.shape[1]
    pxi = jnp.clip((puv[..., 0] * wp).astype(jnp.int32), 0, wp - 1)
    pyi = jnp.clip((puv[..., 1] * hp).astype(jnp.int32), 0, hp - 1)
    proj_tex = lt.proj_map[pyi, pxi]
    li_proj = li_point * jnp.where(inside[..., None], proj_tex, 0.0)
    # goniometric: lat-long of local direction
    gphi = vm.spherical_phi(wl) * (0.5 / jnp.pi)
    gth = vm.spherical_theta(wl) / jnp.pi
    gxi = jnp.clip((gphi * wp).astype(jnp.int32), 0, wp - 1)
    gyi = jnp.clip((gth * hp).astype(jnp.int32), 0, hp - 1)
    li_gonio = li_point * lt.proj_map[gyi, gxi]

    # --- distant (delta, at infinity) -------------------------------------
    wi_dist = jnp.broadcast_to(lp, (r, 3))
    li_dist = jnp.broadcast_to(inten, (r, 3))

    # --- area: CDF-sample a triangle, uniform barycentric -----------------
    nt = jnp.maximum(lt.tri_count[li_], 1)
    # searchsorted per-ray within its light's cdf segment: do a fixed-trip
    # binary search over the flat cdf array
    lo = lt.cdf_offset[li_]
    # binary search for uc in cdf[lo : lo + nt + 1]
    left = jnp.zeros((r,), jnp.int32)
    right = nt
    max_iter = int(np.ceil(np.log2(max(int(lt.tri_area_cdf.shape[0]), 2)))) + 1

    def bs_body(_, lr):
        left, right = lr
        mid = (left + right) // 2
        cv = lt.tri_area_cdf[lo + mid]
        go_right = cv <= uc
        return (jnp.where(go_right, mid + 1, left),
                jnp.where(go_right, right, mid))

    left, right = jax.lax.fori_loop(0, max_iter, bs_body, (left, right))
    tri_k = jnp.clip(left - 1, 0, nt - 1)
    tri_id = lt.tri_offset[li_] + tri_k
    b1, b2 = smp.uniform_sample_triangle(u)
    tv0 = geom.v0[tri_id]
    te1 = geom.e1[tri_id]
    te2 = geom.e2[tri_id]
    ps = tv0 + te1 * b1[..., None] + te2 * b2[..., None]
    ns = vm.normalize(vm.cross(te1, te2))
    to_s = ps - p_surf
    d2a = jnp.maximum(vm.length_sq(to_s), 1e-12)
    dist_a = jnp.sqrt(d2a)
    wi_area = to_s / dist_a[..., None]
    cos_l = vm.dot(ns, -wi_area)
    # one-sided emission L(p,n,w) (diffuse_area_light.dart L)
    li_area = jnp.where((cos_l > 0)[..., None], inten, 0.0)
    # pdf: uniform-by-area -> solid angle (shape.dart pdf2: dist^2/(cos*A))
    pdf_area = d2a / jnp.maximum(jnp.abs(cos_l) * lt.total_area[li_], 1e-9)

    # --- infinite ---------------------------------------------------------
    dir_l, li_env, pdf_env = _env_sample(lt, u)
    l2w = jnp.transpose(w2l[:, :3, :3], (0, 2, 1))
    wi_env = vm.normalize(jnp.einsum("rij,rj->ri", l2w, dir_l))
    li_env = li_env * inten

    # --- select by kind ---------------------------------------------------
    k = kind[..., None]
    wi = jnp.where(k == DISTANT, wi_dist,
         jnp.where(k == AREA, wi_area,
         jnp.where(k == INFINITE, wi_env, wi_point)))
    li_v = jnp.where(k == SPOT, li_spot,
           jnp.where(k == DISTANT, li_dist,
           jnp.where(k == AREA, li_area,
           jnp.where(k == INFINITE, li_env,
           jnp.where(k == PROJECTION, li_proj,
           jnp.where(k == GONIOMETRIC, li_gonio, li_point))))))
    pdf = jnp.where(kind == AREA, pdf_area,
          jnp.where(kind == INFINITE, pdf_env, jnp.ones((r,), jnp.float32)))
    dist_out = jnp.where(kind == DISTANT, INF_DIST,
               jnp.where(kind == INFINITE, INF_DIST,
               jnp.where(kind == AREA, dist_a, dist)))
    is_delta = (kind != AREA) & (kind != INFINITE)
    return LiSample(wi=wi, li=li_v, pdf=pdf, dist=dist_out,
                    is_delta=is_delta)


def pdf_li_area(lt: LightTable, light_idx, p_surf, wi, hit_t, hit_cos):
    """Solid-angle pdf that area light `light_idx` generates direction wi
    from p_surf, given the BSDF ray actually hit it at distance hit_t with
    |cos| hit_cos (geometric form of ShapeSet.pdf)."""
    return (hit_t * hit_t) / jnp.maximum(
        hit_cos * lt.total_area[jnp.maximum(light_idx, 0)], 1e-9)


def le_emitted(lt: LightTable, geom, prim_id, wo, ns):
    """Emitted radiance when a ray hits an emissive prim
    (intersection.dart Le / diffuse_area_light L)."""
    lid = geom.light_id[jnp.maximum(prim_id, 0)]
    emissive = (prim_id >= 0) & (lid >= 0)
    l_emit = lt.intensity[jnp.maximum(lid, 0)]
    facing = vm.dot(ns, wo) > 0.0
    return jnp.where((emissive & facing)[..., None], l_emit, 0.0)


class LeSample(NamedTuple):
    """Photon-emission sample (Light.sampleL(scene, ...), light.dart:98+)."""
    o: jnp.ndarray        # (R, 3) ray origin
    d: jnp.ndarray        # (R, 3) ray direction
    alpha: jnp.ndarray    # (R, 3) power / (pdf_pos * pdf_dir * light_pdf)


def sample_light_index(lt: LightTable, u):
    """Sample a light ~ power CDF (ComputeLightSamplingCDF) -> (idx, pdf)."""
    idx = jnp.clip(jnp.searchsorted(lt.power_cdf, u, side="right") - 1,
                   0, lt.n - 1)
    pdf = lt.power_cdf[idx + 1] - lt.power_cdf[idx]
    return idx.astype(jnp.int32), jnp.maximum(pdf, 1e-12)


def sample_le(lt: LightTable, geom, light_idx, light_pdf,
              u_pos, uc, u_dir) -> LeSample:
    """Emit photon rays from lights (the sampleL overload used by photon
    shooting, photon_map_integrator.dart:383-430, and IGI VPL generation).

    light_idx (R,) int32; light_pdf (R,); u_pos/u_dir (R, 2); uc (R,).
    alpha carries radiance/intensity over all pdfs so that sum(alpha) over
    photons estimates total power.
    """
    li_ = jnp.maximum(light_idx, 0)
    kind = lt.kind[li_]
    lp = lt.p[li_]
    inten = lt.intensity[li_]
    prm = lt.params[li_]
    w2l = lt.w2l[li_]
    r = light_idx.shape[0]
    radius = lt.scene_radius
    center = jnp.zeros((3,), jnp.float32)   # world bound assumed centered;
    # distant/infinite use geometry's bound center instead:
    wb = geom.world_bound
    center = 0.5 * (wb[0] + wb[1])
    radius = 0.5 * jnp.linalg.norm(wb[1] - wb[0]) + 1e-3

    # POINT: uniform sphere direction from position
    d_sph = smp.uniform_sample_sphere(u_dir)
    alpha_point = inten * (1.0 / smp.UNIFORM_SPHERE_PDF)

    # SPOT: uniform cone around local -z?? spot shines along light-space +z
    ct = prm[..., 0]
    d_cone_l = smp.uniform_sample_cone(u_dir, ct)
    l2w = jnp.transpose(w2l[:, :3, :3], (0, 2, 1))
    d_spot = vm.normalize(jnp.einsum("rij,rj->ri", l2w, d_cone_l))
    # falloff at sampled angle
    cos_s = d_cone_l[..., 2]
    cf = prm[..., 1]
    delta = jnp.clip((cos_s - ct) / jnp.maximum(cf - ct, 1e-8), 0.0, 1.0)
    falloff = jnp.where(cos_s < ct, 0.0,
                        jnp.where(cos_s > cf, 1.0, delta ** 4))
    alpha_spot = inten * (falloff / smp.uniform_cone_pdf(ct))[..., None]

    # DISTANT: origin on a world-radius disk, direction = -light dir
    dx, dy = smp.concentric_sample_disk(u_pos)
    ldir = vm.normalize(lp)                       # stored direction TO light
    t1, t2 = vm.coordinate_system(ldir)
    o_dist = center + radius * (ldir + dx[..., None] * t1 + dy[..., None] * t2)
    d_dist = -ldir
    area_disk = jnp.pi * radius * radius
    alpha_dist = inten * area_disk

    # AREA: CDF triangle + cosine hemisphere
    nt = jnp.maximum(lt.tri_count[li_], 1)
    lo = lt.cdf_offset[li_]
    left = jnp.zeros((r,), jnp.int32)
    right = nt
    max_iter = int(np.ceil(np.log2(max(int(lt.tri_area_cdf.shape[0]), 2)))) + 1

    def bs_body(_, lr):
        l_, r_ = lr
        mid = (l_ + r_) // 2
        cv = lt.tri_area_cdf[lo + mid]
        go_right = cv <= uc
        return (jnp.where(go_right, mid + 1, l_),
                jnp.where(go_right, r_, mid))

    left, _ = jax.lax.fori_loop(0, max_iter, bs_body, (left, right))
    tri_k = jnp.clip(left - 1, 0, nt - 1)
    tri_id = lt.tri_offset[li_] + tri_k
    b1, b2 = smp.uniform_sample_triangle(u_pos)
    tv0 = geom.v0[tri_id]
    te1 = geom.e1[tri_id]
    te2 = geom.e2[tri_id]
    p_area = tv0 + te1 * b1[..., None] + b2[..., None] * te2
    n_area = vm.normalize(vm.cross(te1, te2))
    d_loc = smp.cosine_sample_hemisphere(u_dir)
    ta1, ta2 = vm.coordinate_system(n_area)
    d_area = vm.normalize(d_loc[..., 0:1] * ta1 + d_loc[..., 1:2] * ta2
                          + d_loc[..., 2:3] * n_area)
    # alpha = L * cos / (pdf_pos * pdf_dir) = L * pi * A
    alpha_area = inten * (jnp.pi * lt.total_area[li_])[..., None]

    # INFINITE: env-CDF direction toward scene; origin on far disk
    dir_l, li_env, pdf_env = _env_sample(lt, u_dir)
    d_env = -vm.normalize(jnp.einsum("rij,rj->ri", l2w, dir_l))
    t1e, t2e = vm.coordinate_system(d_env)
    o_env = center - radius * d_env + radius * (dx[..., None] * t1e
                                                + dy[..., None] * t2e)
    alpha_env = (li_env * inten * area_disk
                 / jnp.maximum(pdf_env, 1e-9)[..., None])

    k = kind[..., None]
    o = jnp.where(k == DISTANT, o_dist,
        jnp.where(k == AREA, p_area + n_area * 1e-4,
        jnp.where(k == INFINITE, o_env,
                  jnp.broadcast_to(lp, (r, 3)))))
    d = jnp.where(k == SPOT, d_spot,
        jnp.where(k == DISTANT, jnp.broadcast_to(d_dist, (r, 3)),
        jnp.where(k == AREA, d_area,
        jnp.where(k == INFINITE, d_env, d_sph))))
    alpha = jnp.where(k == SPOT, alpha_spot,
            jnp.where(k == DISTANT, alpha_dist,
            jnp.where(k == AREA, alpha_area,
            jnp.where(k == INFINITE, alpha_env, alpha_point))))
    alpha = alpha / light_pdf[..., None]
    return LeSample(o=o, d=vm.normalize(d), alpha=alpha)
