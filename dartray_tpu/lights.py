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
                      "env_marg_int", "proj_map", "tri_rows",
                      "tri_row_offset"],
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
    # COMPACT area-light triangle rows (T, 12): [v0 e1 e2 ng] copied out of
    # the geometry attr table at build — NEE's per-bounce sampled-triangle
    # fetch gathers from this tiny table instead of the (F, 48) scene attr
    # table (a 262k-index gather from a big table is ~8 ms on v5e; from a
    # few-row table it is ~free). None when built without geometry attrs
    # (sample_li falls back to the big-table gather).
    tri_rows: Optional[jnp.ndarray] = None
    tri_row_offset: Optional[jnp.ndarray] = None  # (L,) int32


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


def build_table(specs, scene_radius=10.0, attr=None) -> LightTable:
    """attr: the geometry's (F, 48) attr-row table (scene/types._pack_attr).
    When given, area-light triangle rows [v0 e1 e2 ng] are copied into the
    compact LightTable.tri_rows so NEE sampling never gathers from the big
    per-face table."""
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
    tri_row_offset = np.zeros(l, np.int32)
    tri_row_chunks = []
    tri_row_off = 0
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
            if attr is not None:
                tri_row_offset[i] = tri_row_off
                tri_row_chunks.append(np.ascontiguousarray(
                    attr[s.tri_offset:s.tri_offset + s.tri_count, :12]))
                tri_row_off += s.tri_count
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
        # light maps are ILLUMINANTS: D65-shaped basis (spectrum.rgb_to_bands)
        env_map = spec.rgb_to_bands(env_map, illuminant=True) \
            .astype(np.float32)
        proj_map = spec.rgb_to_bands(proj_map, illuminant=True) \
            .astype(np.float32)
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
        n=len(specs), env_light_index=env_idx, env_w=we, env_h=he,
        tri_rows=(np.concatenate(tri_row_chunks)
                  if (attr is not None and tri_row_chunks)
                  else (np.zeros((1, 12), np.float32)
                        if attr is not None else None)),
        tri_row_offset=tri_row_offset if attr is not None else None)


from .core.math import V3, V2


def _g3(a, idx):
    """(L, 3) table -> V3 of (R,) component gathers (lane-packed)."""
    return V3(a[:, 0][idx], a[:, 1][idx], a[:, 2][idx])


def _w2l_rows(lt: LightTable, idx):
    """Per-ray world->light 3x4 rows as component gathers."""
    return [[lt.w2l[:, i, j][idx] for j in range(4)] for i in range(3)]


def _rows_xform_v(mr, v: V3) -> V3:
    return V3(mr[0][0] * v.x + mr[0][1] * v.y + mr[0][2] * v.z,
              mr[1][0] * v.x + mr[1][1] * v.y + mr[1][2] * v.z,
              mr[2][0] * v.x + mr[2][1] * v.y + mr[2][2] * v.z)


def _rows_xform_v_t(mr, v: V3) -> V3:
    """Transpose (light->world rotation) applied to v."""
    return V3(mr[0][0] * v.x + mr[1][0] * v.y + mr[2][0] * v.z,
              mr[0][1] * v.x + mr[1][1] * v.y + mr[2][1] * v.z,
              mr[0][2] * v.x + mr[1][2] * v.y + mr[2][2] * v.z)


class LiSample(NamedTuple):
    wi: V3                 # direction to light
    li: V3                 # incident radiance
    pdf: jnp.ndarray       # (R,) solid-angle pdf
    dist: jnp.ndarray      # (R,) shadow-ray length
    is_delta: jnp.ndarray  # (R,) bool


def _env_lookup(lt: LightTable, u, v):
    """Bilinear texel fetch of the lat-long radiance map (MIPMap.lookup on
    the envmap, infinite_area_light.dart Le/sampleL): phi wraps, theta
    clamps. u/v (R,) -> V3."""
    xx = u * lt.env_w - 0.5
    yy = v * lt.env_h - 0.5
    x0 = jnp.floor(xx).astype(jnp.int32)
    y0 = jnp.floor(yy).astype(jnp.int32)
    fx = xx - x0
    fy = yy - y0
    flat = jnp.asarray(lt.env_map).reshape(-1, 3)
    er, eg, eb = flat[:, 0], flat[:, 1], flat[:, 2]

    def at(x, y):
        x = x % lt.env_w                              # phi wraps
        y = jnp.clip(y, 0, lt.env_h - 1)              # theta clamps
        i = y * lt.env_w + x
        return V3(er[i], eg[i], eb[i])

    c00 = at(x0, y0)
    c10 = at(x0 + 1, y0)
    c01 = at(x0, y0 + 1)
    c11 = at(x0 + 1, y0 + 1)
    return ((c00 * (1 - fx) + c10 * fx) * (1 - fy)
            + (c01 * (1 - fx) + c11 * fx) * fy)


def _env_sample(lt: LightTable, u):
    """Distribution2D sample over the lat-long map -> (dir_l, L, pdf_sa)."""
    u = vm.from_arr2(u)
    nu, nv = lt.env_w, lt.env_h
    # marginal over v
    u0, u1 = u.x, u.y
    v_off = jnp.clip(jnp.searchsorted(lt.env_marg_cdf, u1, side="right") - 1,
                     0, nv - 1)
    mlo = lt.env_marg_cdf[v_off]
    mhi = lt.env_marg_cdf[v_off + 1]
    dv = (u1 - mlo) / jnp.maximum(mhi - mlo, 1e-30)
    pdf_v = lt.env_marg_func[v_off] / jnp.maximum(lt.env_marg_int, 1e-30)
    v = (v_off.astype(jnp.float32) + dv) / nv
    # conditional over u given row v_off: binary search on the flat cdf
    # (fixed-trip; avoids the (R, nu+1) row-gather a vmap'd searchsorted
    # materializes)
    flat_cdf = jnp.asarray(lt.env_cond_cdf).reshape(-1)
    base = v_off * (nu + 1)
    left = jnp.zeros_like(v_off)
    right = jnp.full_like(v_off, nu)
    n_iter = int(np.ceil(np.log2(max(nu + 1, 2)))) + 1

    def bs(_, lr):
        l_, r_ = lr
        mid = (l_ + r_) // 2
        go = flat_cdf[base + mid] <= u0
        return jnp.where(go, mid + 1, l_), jnp.where(go, r_, mid)

    left, _ = jax.lax.fori_loop(0, n_iter, bs, (left, right))
    u_off = jnp.clip(left - 1, 0, nu - 1)
    clo = flat_cdf[base + u_off]
    chi = flat_cdf[base + u_off + 1]
    du = (u0 - clo) / jnp.maximum(chi - clo, 1e-30)
    pdf_u = jnp.asarray(lt.env_cond_func).reshape(-1)[v_off * nu + u_off] \
        / jnp.maximum(jnp.asarray(lt.env_cond_int)[v_off], 1e-30)
    uu = (u_off.astype(jnp.float32) + du) / nu
    map_pdf = pdf_u * pdf_v
    theta = v * jnp.pi
    phi = uu * 2.0 * jnp.pi
    sin_t = jnp.sin(theta)
    dir_l = V3(sin_t * jnp.cos(phi), sin_t * jnp.sin(phi), jnp.cos(theta))
    pdf_sa = map_pdf / jnp.maximum(2.0 * jnp.pi * jnp.pi * sin_t, 1e-8)
    L = _env_lookup(lt, uu, v)
    return dir_l, L, jnp.where(sin_t > 1e-8, pdf_sa, 0.0)


def env_le(lt: LightTable, d_world: V3) -> V3:
    """Escaped-ray radiance Le(ray) for the infinite light
    (infinite_area_light.dart Le)."""
    d_world = vm.from_arr(d_world)
    if lt.env_light_index < 0:
        z = jnp.zeros(jnp.shape(d_world.x), jnp.float32)
        return V3(z, z, z)
    w2l = lt.w2l[lt.env_light_index]
    d = vm.normalize(vm.xform_vector3(w2l, d_world))
    u = vm.spherical_phi(d) * (0.5 / jnp.pi)
    v = vm.spherical_theta(d) / jnp.pi
    inten = lt.intensity[lt.env_light_index]
    return _env_lookup(lt, u, v) * V3(inten[0], inten[1], inten[2])


def env_pdf(lt: LightTable, d_world: V3):
    """Solid-angle pdf of sampling direction d from the envmap
    (infinite_area_light.dart:190-204)."""
    d_world = vm.from_arr(d_world)
    if lt.env_light_index < 0:
        return jnp.zeros(jnp.shape(d_world.x), jnp.float32)
    w2l = lt.w2l[lt.env_light_index]
    d = vm.normalize(vm.xform_vector3(w2l, d_world))
    theta = vm.spherical_theta(d)
    phi = vm.spherical_phi(d)
    sin_t = jnp.sin(theta)
    iu = jnp.clip((phi * (0.5 / jnp.pi) * lt.env_w).astype(jnp.int32),
                  0, lt.env_w - 1)
    iv = jnp.clip((theta / jnp.pi * lt.env_h).astype(jnp.int32),
                  0, lt.env_h - 1)
    map_pdf = jnp.asarray(lt.env_cond_func).reshape(-1)[iv * lt.env_w + iu] \
        / jnp.maximum(lt.env_marg_int, 1e-30)
    return jnp.where(sin_t > 1e-8,
                     map_pdf / jnp.maximum(2.0 * jnp.pi * jnp.pi * sin_t,
                                           1e-8), 0.0)


def sample_li(lt: LightTable, geom, light_idx, p_surf: V3, u,
              uc=None) -> LiSample:
    """Per-ray light sampling (Light.sampleLAtPoint, light.dart:60-97).

    geom: scene geometry (for area-light triangle lookup). light_idx: (R,)
    int32. u: V2 (or (R, 2)). uc: optional (R,) component sample for
    triangle choice (LightSample.uComponent).
    """
    u = vm.from_arr2(u)
    p_surf = vm.from_arr(p_surf)
    li_ = jnp.maximum(light_idx, 0)
    kind = lt.kind[li_]
    lp = _g3(lt.p, li_)
    inten = _g3(lt.intensity, li_)
    w2l = _w2l_rows(lt, li_)
    r = jnp.shape(p_surf.x)[0]
    if uc is None:
        uc = u.x  # reference draws a separate uComponent; reuse is fine

    # --- point / spot / projection / goniometric (delta, at position) -----
    to_l = lp - p_surf
    d2 = jnp.maximum(vm.length_sq(to_l), 1e-12)
    dist = jnp.sqrt(d2)
    wi_point = to_l * (1.0 / dist)
    li_point = inten * (1.0 / d2)
    # spot falloff (spot_light.dart:131 falloff): local -wi angle vs cone
    wl = vm.normalize(_rows_xform_v(w2l, -wi_point))
    cos_t = wl.z
    ct = lt.params[:, 0][li_]
    cf = lt.params[:, 1][li_]
    delta = (cos_t - ct) / jnp.maximum(cf - ct, 1e-8)
    falloff = jnp.clip(delta, 0.0, 1.0) ** 4
    falloff = jnp.where(cos_t < ct, 0.0, jnp.where(cos_t > cf, 1.0, falloff))
    li_spot = li_point * falloff
    # projection: map lookup in projective coords
    s1 = lt.params[:, 1][li_]
    s0 = lt.params[:, 2][li_]
    pz = jnp.maximum(cos_t, 1e-6)
    px_ = wl.x / pz
    py_ = wl.y / pz
    inside = ((cos_t > ct) & (jnp.abs(px_) < s1 + 1e-9)
              & (jnp.abs(py_) < s0 + 1e-9))
    pu = (px_ / jnp.maximum(s1, 1e-9) + 1) * 0.5
    pv = (py_ / jnp.maximum(s0, 1e-9) + 1) * 0.5
    hp, wp = lt.proj_map.shape[0], lt.proj_map.shape[1]
    pflat = jnp.asarray(lt.proj_map).reshape(-1, 3)
    pr, pg, pb = pflat[:, 0], pflat[:, 1], pflat[:, 2]
    pxi = jnp.clip((pu * wp).astype(jnp.int32), 0, wp - 1)
    pyi = jnp.clip((pv * hp).astype(jnp.int32), 0, hp - 1)
    pi_ = pyi * wp + pxi
    proj_tex = V3(pr[pi_], pg[pi_], pb[pi_])
    li_proj = li_point * vm.where3(inside, proj_tex, 0.0)
    # goniometric: lat-long of local direction
    gphi = vm.spherical_phi(wl) * (0.5 / jnp.pi)
    gth = vm.spherical_theta(wl) / jnp.pi
    gxi = jnp.clip((gphi * wp).astype(jnp.int32), 0, wp - 1)
    gyi = jnp.clip((gth * hp).astype(jnp.int32), 0, hp - 1)
    gi_ = gyi * wp + gxi
    li_gonio = li_point * V3(pr[gi_], pg[gi_], pb[gi_])

    # --- distant (delta, at infinity) -------------------------------------
    wi_dist = lp
    li_dist = inten

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
    b1, b2 = smp.uniform_sample_triangle(u)
    from .scene import types as _st
    if lt.tri_rows is not None:
        # compact light-tri table: T is a handful of rows, so this gather
        # is ~free (XLA lowers small-table gathers to selects/loads) vs the
        # ~8 ms 262k-index fetch from the (F, 48) scene attr table
        ridx = jnp.clip(lt.tri_row_offset[li_] + tri_k, 0,
                        lt.tri_rows.shape[0] - 1)
        rows = jnp.transpose(lt.tri_rows[ridx])
    else:
        # one wide attr-row gather (v0|e1|e2|ng), 9 component gathers saved
        rows = _st.attr_rows(geom, lt.tri_offset[li_] + tri_k)
    tv0 = _st.attr_v3(rows, 0)
    te1 = _st.attr_v3(rows, 3)
    te2 = _st.attr_v3(rows, 6)
    ps = tv0 + te1 * b1 + te2 * b2
    ns = _st.attr_v3(rows, 9)
    to_s = ps - p_surf
    d2a = jnp.maximum(vm.length_sq(to_s), 1e-12)
    dist_a = jnp.sqrt(d2a)
    wi_area = to_s * (1.0 / dist_a)
    cos_l = vm.dot(ns, -wi_area)
    # one-sided emission L(p,n,w) (diffuse_area_light.dart L)
    li_area = vm.where3(cos_l > 0, inten, 0.0)
    # pdf: uniform-by-area -> solid angle (shape.dart pdf2: dist^2/(cos*A))
    pdf_area = d2a / jnp.maximum(jnp.abs(cos_l) * lt.total_area[li_], 1e-9)

    # --- infinite ---------------------------------------------------------
    dir_l, li_env, pdf_env = _env_sample(lt, u)
    wi_env = vm.normalize(_rows_xform_v_t(w2l, dir_l))
    li_env = li_env * inten

    # --- select by kind ---------------------------------------------------
    wi = vm.where3(kind == DISTANT, wi_dist,
         vm.where3(kind == AREA, wi_area,
         vm.where3(kind == INFINITE, wi_env, wi_point)))
    li_v = vm.where3(kind == SPOT, li_spot,
           vm.where3(kind == DISTANT, li_dist,
           vm.where3(kind == AREA, li_area,
           vm.where3(kind == INFINITE, li_env,
           vm.where3(kind == PROJECTION, li_proj,
           vm.where3(kind == GONIOMETRIC, li_gonio, li_point))))))
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


def le_emitted(lt: LightTable, geom, prim_id, wo: V3, ns: V3,
               lid=None) -> V3:
    """Emitted radiance when a ray hits an emissive prim
    (intersection.dart Le / diffuse_area_light L). Pass `lid` (the
    interaction's light_id) to skip the per-prim gather."""
    if lid is None:
        lid = geom.light_id[jnp.maximum(prim_id, 0)]
    emissive = (prim_id >= 0) & (lid >= 0)
    l_emit = _g3(lt.intensity, jnp.maximum(lid, 0))
    facing = vm.dot(ns, wo) > 0.0
    return vm.where3(emissive & facing, l_emit, 0.0)


class LeSample(NamedTuple):
    """Photon-emission sample (Light.sampleL(scene, ...), light.dart:98+)."""
    o: V3                 # ray origin
    d: V3                 # ray direction
    alpha: V3             # power / (pdf_pos * pdf_dir * light_pdf)


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
    u_pos = vm.from_arr2(u_pos)
    u_dir = vm.from_arr2(u_dir)
    li_ = jnp.maximum(light_idx, 0)
    kind = lt.kind[li_]
    lp = _g3(lt.p, li_)
    inten = _g3(lt.intensity, li_)
    w2l = _w2l_rows(lt, li_)
    r = light_idx.shape[0]
    # distant/infinite use geometry's bound center:
    wb = geom.world_bound
    center = vm.V3(0.5 * (wb[0, 0] + wb[1, 0]), 0.5 * (wb[0, 1] + wb[1, 1]),
                   0.5 * (wb[0, 2] + wb[1, 2]))
    radius = 0.5 * jnp.sqrt((wb[1, 0] - wb[0, 0]) ** 2
                            + (wb[1, 1] - wb[0, 1]) ** 2
                            + (wb[1, 2] - wb[0, 2]) ** 2) + 1e-3

    # POINT: uniform sphere direction from position
    d_sph = smp.uniform_sample_sphere(u_dir)
    alpha_point = inten * (1.0 / smp.UNIFORM_SPHERE_PDF)

    # SPOT: uniform cone around light-space +z
    ct = lt.params[:, 0][li_]
    d_cone_l = smp.uniform_sample_cone(u_dir, ct)
    d_spot = vm.normalize(_rows_xform_v_t(w2l, d_cone_l))
    # falloff at sampled angle
    cos_s = d_cone_l.z
    cf = lt.params[:, 1][li_]
    delta = jnp.clip((cos_s - ct) / jnp.maximum(cf - ct, 1e-8), 0.0, 1.0)
    falloff = jnp.where(cos_s < ct, 0.0,
                        jnp.where(cos_s > cf, 1.0, delta ** 4))
    alpha_spot = inten * (falloff / smp.uniform_cone_pdf(ct))

    # DISTANT: origin on a world-radius disk, direction = -light dir
    dx, dy = smp.concentric_sample_disk(u_pos)
    ldir = vm.normalize(lp)                       # stored direction TO light
    t1, t2 = vm.coordinate_system(ldir)
    o_dist = center + (ldir + t1 * dx + t2 * dy) * radius
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
    b1, b2 = smp.uniform_sample_triangle(u_pos)
    from .scene import types as _st
    if lt.tri_rows is not None:
        ridx = jnp.clip(lt.tri_row_offset[li_] + tri_k, 0,
                        lt.tri_rows.shape[0] - 1)
        rows = jnp.transpose(lt.tri_rows[ridx])
    else:
        rows = _st.attr_rows(geom, lt.tri_offset[li_] + tri_k)
    tv0 = _st.attr_v3(rows, 0)
    te1 = _st.attr_v3(rows, 3)
    te2 = _st.attr_v3(rows, 6)
    p_area = tv0 + te1 * b1 + te2 * b2
    n_area = _st.attr_v3(rows, 9)
    d_loc = smp.cosine_sample_hemisphere(u_dir)
    ta1, ta2 = vm.coordinate_system(n_area)
    d_area = vm.normalize(ta1 * d_loc.x + ta2 * d_loc.y + n_area * d_loc.z)
    # alpha = L * cos / (pdf_pos * pdf_dir) = L * pi * A
    alpha_area = inten * (jnp.pi * lt.total_area[li_])

    # INFINITE: env-CDF direction toward scene; origin on far disk
    dir_l, li_env, pdf_env = _env_sample(lt, u_dir)
    d_env = -vm.normalize(_rows_xform_v_t(w2l, dir_l))
    t1e, t2e = vm.coordinate_system(d_env)
    o_env = center - d_env * radius + (t1e * dx + t2e * dy) * radius
    alpha_env = (li_env * inten * (area_disk
                                   / jnp.maximum(pdf_env, 1e-9)))

    o = vm.where3(kind == DISTANT, o_dist,
        vm.where3(kind == AREA, p_area + n_area * 1e-4,
        vm.where3(kind == INFINITE, o_env, lp)))
    d = vm.where3(kind == SPOT, d_spot,
        vm.where3(kind == DISTANT, d_dist,
        vm.where3(kind == AREA, d_area,
        vm.where3(kind == INFINITE, d_env, d_sph))))
    alpha = vm.where3(kind == SPOT, alpha_spot,
            vm.where3(kind == DISTANT, alpha_dist,
            vm.where3(kind == AREA, alpha_area,
            vm.where3(kind == INFINITE, alpha_env, alpha_point))))
    alpha = alpha * (1.0 / light_pdf)
    return LeSample(o=o, d=vm.normalize(d), alpha=alpha)
