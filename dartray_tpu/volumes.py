"""Volume regions: homogeneous / exponential / 3D density grid.

TPU-native replacement for lib/core/volume/ (volume.dart (229 LoC),
density_region.dart, aggregate_volume.dart) and lib/volume_regions/
(homogeneous (95), exponential (72), volume_grid.dart:23-76). Regions are
rows of a typed table; property lookups (sigma_a/sigma_s/Lve/density) are
evaluated for whole wavefronts with per-region masks and summed
(AggregateVolume union semantics). The density grid is one shared
(nz, ny, nx) device array with trilinear interpolation
(volume_grid.dart:44-66).
"""
from __future__ import annotations

import dataclasses
from functools import partial
from typing import List, Optional

import numpy as np
import jax
import jax.numpy as jnp

from .core import math as vm

HOMOGENEOUS = 0
EXPONENTIAL = 1
GRID = 2


@partial(jax.tree_util.register_dataclass,
         data_fields=["kind", "w2v", "bounds", "sigma_a", "sigma_s", "le",
                      "g", "params", "grid"],
         meta_fields=["n", "grid_shape"])
@dataclasses.dataclass
class VolumeData:
    kind: jnp.ndarray      # (V,)
    w2v: jnp.ndarray       # (V, 4, 4) world -> volume space
    bounds: jnp.ndarray    # (V, 2, 3) in volume space
    sigma_a: jnp.ndarray   # (V, 3)
    sigma_s: jnp.ndarray   # (V, 3)
    le: jnp.ndarray        # (V, 3)
    g: jnp.ndarray         # (V,)
    params: jnp.ndarray    # (V, 4): exponential a, b, updir xyz? (a,b + up in w2v)
    grid: jnp.ndarray      # (nz, ny, nx) density (shared; zeros if unused)
    n: int
    grid_shape: tuple


def build_volume(specs: List[tuple]) -> Optional[VolumeData]:
    """specs: list of (name, ParamSet, o2w 4x4) from the API."""
    if not specs:
        return None
    n = len(specs)
    kind = np.zeros(n, np.int32)
    w2v = np.tile(np.eye(4, dtype=np.float32), (n, 1, 1))
    bounds = np.zeros((n, 2, 3), np.float32)
    sa = np.zeros((n, 3), np.float32)
    ss = np.zeros((n, 3), np.float32)
    le = np.zeros((n, 3), np.float32)
    g = np.zeros(n, np.float32)
    params = np.zeros((n, 4), np.float32)
    grid = np.zeros((1, 1, 1), np.float32)
    grid_shape = (1, 1, 1)
    for i, (name, p, o2w) in enumerate(specs):
        w2v[i] = np.linalg.inv(np.asarray(o2w, np.float64)).astype(np.float32)
        p0 = p.find_one_point("p0", (0, 0, 0))
        p1 = p.find_one_point("p1", (1, 1, 1))
        bounds[i, 0] = np.minimum(p0, p1)
        bounds[i, 1] = np.maximum(p0, p1)
        sa[i] = p.find_one_spectrum("sigma_a", (1.0,) * 3)
        ss[i] = p.find_one_spectrum("sigma_s", (1.0,) * 3)
        le[i] = p.find_one_spectrum("Le", (0.0,) * 3)
        g[i] = p.find_one_float("g", 0.0)
        if name == "homogeneous":
            kind[i] = HOMOGENEOUS
        elif name == "exponential":
            kind[i] = EXPONENTIAL
            params[i, 0] = p.find_one_float("a", 1.0)
            params[i, 1] = p.find_one_float("b", 1.0)
        elif name == "volumegrid":
            kind[i] = GRID
            nx = p.find_one_int("nx", 1)
            ny = p.find_one_int("ny", 1)
            nz = p.find_one_int("nz", 1)
            d = p.find_floats("density")
            if d is not None:
                grid = np.asarray(d, np.float32).reshape(nz, ny, nx)
                grid_shape = (nz, ny, nx)
        else:
            raise ValueError(f"unknown volume {name!r}")
    # host numpy — one device_put at render entry
    return VolumeData(kind=np.asarray(kind), w2v=np.asarray(w2v),
                      bounds=np.asarray(bounds), sigma_a=np.asarray(sa),
                      sigma_s=np.asarray(ss), le=np.asarray(le),
                      g=np.asarray(g), params=np.asarray(params),
                      grid=np.asarray(grid), n=n, grid_shape=grid_shape)


def _density(vol: VolumeData, i: int, p_local):
    """Density multiplier at a volume-space point (V3) for region i
    (DensityRegion subclasses)."""
    kind = vol.kind[i]
    lo = vol.bounds[i, 0]
    hi = vol.bounds[i, 1]
    inside = ((p_local.x >= lo[0]) & (p_local.x <= hi[0])
              & (p_local.y >= lo[1]) & (p_local.y <= hi[1])
              & (p_local.z >= lo[2]) & (p_local.z <= hi[2]))
    # exponential: a * exp(-b * h), h = height above p0 along up (+z here;
    # the region's transform orients it — exponential.dart)
    a = vol.params[i, 0]
    b = vol.params[i, 1]
    h = p_local.z - lo[2]
    d_exp = a * jnp.exp(-b * h)
    # grid: trilinear over [p0,p1] normalized coords (volume_grid.dart:44-66)
    nz, ny, nx = vol.grid_shape
    ext = jnp.maximum(hi - lo, 1e-9)
    gx = (p_local.x - lo[0]) / ext[0] * nx - 0.5
    gy = (p_local.y - lo[1]) / ext[1] * ny - 0.5
    gz = (p_local.z - lo[2]) / ext[2] * nz - 0.5
    x0 = jnp.clip(jnp.floor(gx).astype(jnp.int32), 0, nx - 1)
    y0 = jnp.clip(jnp.floor(gy).astype(jnp.int32), 0, ny - 1)
    z0 = jnp.clip(jnp.floor(gz).astype(jnp.int32), 0, nz - 1)
    x1 = jnp.minimum(x0 + 1, nx - 1)
    y1 = jnp.minimum(y0 + 1, ny - 1)
    z1 = jnp.minimum(z0 + 1, nz - 1)
    fx = jnp.clip(gx - x0, 0.0, 1.0)
    fy = jnp.clip(gy - y0, 0.0, 1.0)
    fz = jnp.clip(gz - z0, 0.0, 1.0)
    g_ = vol.grid
    c00 = g_[z0, y0, x0] * (1 - fx) + g_[z0, y0, x1] * fx
    c01 = g_[z0, y1, x0] * (1 - fx) + g_[z0, y1, x1] * fx
    c10 = g_[z1, y0, x0] * (1 - fx) + g_[z1, y0, x1] * fx
    c11 = g_[z1, y1, x0] * (1 - fx) + g_[z1, y1, x1] * fx
    d_grid = (c00 * (1 - fy) + c01 * fy) * (1 - fz) \
        + (c10 * (1 - fy) + c11 * fy) * fz
    d = jnp.where(kind == HOMOGENEOUS, 1.0,
                  jnp.where(kind == EXPONENTIAL, d_exp, d_grid))
    return jnp.where(inside, d, 0.0)


def _to_local(vol: VolumeData, i: int, p):
    return vm.xform_point3(vol.w2v[i], vm.from_arr(p))


def sigma_t(vol: VolumeData, p, _w=None):
    """V3 extinction at world points p (sum over regions)."""
    p = vm.from_arr(p)
    out = vm.v3zeros(jnp.shape(p.x))
    for i in range(vol.n):
        d = _density(vol, i, _to_local(vol, i, p))
        se = vol.sigma_a[i] + vol.sigma_s[i]
        out = out + vm.V3(d * se[0], d * se[1], d * se[2])
    return out


def sigma_s(vol: VolumeData, p, _w=None):
    p = vm.from_arr(p)
    out = vm.v3zeros(jnp.shape(p.x))
    for i in range(vol.n):
        d = _density(vol, i, _to_local(vol, i, p))
        ss = vol.sigma_s[i]
        out = out + vm.V3(d * ss[0], d * ss[1], d * ss[2])
    return out


def lve(vol: VolumeData, p, _w=None):
    p = vm.from_arr(p)
    out = vm.v3zeros(jnp.shape(p.x))
    for i in range(vol.n):
        d = _density(vol, i, _to_local(vol, i, p))
        le = vol.le[i]
        out = out + vm.V3(d * le[0], d * le[1], d * le[2])
    return out


def phase(vol: VolumeData, p, wo, wi):
    """Density-weighted HG phase (AggregateVolume.p)."""
    from .core import sampling as smp
    p = vm.from_arr(p)
    out = jnp.zeros(jnp.shape(p.x), jnp.float32)
    wsum = jnp.zeros(jnp.shape(p.x), jnp.float32)
    for i in range(vol.n):
        d = _density(vol, i, _to_local(vol, i, p))
        out = out + d * smp.hg_pdf(vm.dot(-wo, wi), vol.g[i])
        wsum = wsum + d
    return out / jnp.maximum(wsum, 1e-9)


def intersect_bounds(vol: VolumeData, rays):
    """(t0, t1, hit): union of region [t0,t1] overlaps along each ray
    (AggregateVolume.intersectP)."""
    t0 = jnp.full(rays.tmin.shape, jnp.inf)
    t1 = jnp.full(rays.tmin.shape, -jnp.inf)
    ro = vm.from_arr(rays.o)
    rd = vm.from_arr(rays.d)
    for i in range(vol.n):
        m = vol.w2v[i]
        o = vm.xform_point3(m, ro)
        d = vm.xform_vector3(m, rd)

        def slab(oc, dc, lo_c, hi_c):
            inv = 1.0 / jnp.where(jnp.abs(dc) < 1e-12,
                                  jnp.where(dc < 0, -1e-12, 1e-12), dc)
            ta = (lo_c - oc) * inv
            tb = (hi_c - oc) * inv
            return jnp.minimum(ta, tb), jnp.maximum(ta, tb)

        nx_, fx_ = slab(o.x, d.x, vol.bounds[i, 0, 0], vol.bounds[i, 1, 0])
        ny_, fy_ = slab(o.y, d.y, vol.bounds[i, 0, 1], vol.bounds[i, 1, 1])
        nz_, fz_ = slab(o.z, d.z, vol.bounds[i, 0, 2], vol.bounds[i, 1, 2])
        tn = jnp.maximum(jnp.maximum(nx_, ny_),
                         jnp.maximum(nz_, rays.tmin))
        tf = jnp.minimum(jnp.minimum(fx_, fy_),
                         jnp.minimum(fz_, rays.tmax))
        ok = tn <= tf
        t0 = jnp.where(ok, jnp.minimum(t0, tn), t0)
        t1 = jnp.where(ok, jnp.maximum(t1, tf), t1)
    hit = t1 > t0
    return jnp.where(hit, t0, 0.0), jnp.where(hit, t1, 0.0), hit


def tau(vol: VolumeData, rays, step: float, offset, n_steps: int = 64):
    """Optical thickness along [tmin, tmax] by jittered ray marching
    (density_region.dart tau / volume.dart). offset: (R,) jitter in [0,1).
    Returns V3."""
    t0, t1, hit = intersect_bounds(vol, rays)
    length = t1 - t0
    dt = jnp.maximum(length / n_steps, 1e-8)

    def body(k, acc):
        t = t0 + (k.astype(jnp.float32) + offset) * dt
        return acc + sigma_t(vol, rays.at(t)) * dt

    acc = jax.lax.fori_loop(0, n_steps, body,
                            vm.v3zeros(jnp.shape(rays.tmin)))
    return vm.where3(hit, acc, 0.0)
