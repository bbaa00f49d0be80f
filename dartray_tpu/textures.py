"""Texture system: all texture plugins as a typed device table.

TPU-native replacement for lib/textures/ (constant, scale, mix, bilerp,
imagemap (image_texture.dart), uv, checkerboard, dots, fbm, wrinkled, marble,
windy) and the Perlin Noise/FBm/Turbulence utilities in
lib/core/texture.dart:27-203. Image maps live in one flat texel pool with
per-texture (offset, width, height) — bilinear lookups are two gathers; the
procedural family is pure VPU math. Texture graphs evaluate leaves first,
then one combinator level (scale/mix/checker/dots/bilerp over leaf children),
which covers the reference scenes' graphs.
"""
from __future__ import annotations

import dataclasses
from functools import partial
from typing import List, Optional

import numpy as np
import jax
import jax.numpy as jnp

CONST = 0
IMAGEMAP = 1
UV = 2
FBM = 3
WRINKLED = 4
MARBLE = 5
WINDY = 6
SCALE = 7
MIX = 8
CHECKER2D = 9
CHECKER3D = 10
DOTS = 11
BILERP = 12

_LEAF_KINDS = (CONST, IMAGEMAP, UV, FBM, WRINKLED, MARBLE, WINDY)

# 2D texture mappings (lib/core/texture/*.dart: UVMapping2D,
# SphericalMapping2D, CylindricalMapping2D, PlanarMapping2D), stored in
# params[..., 7]
MAP_UV = 0
MAP_SPHERICAL = 1
MAP_CYLINDRICAL = 2
MAP_PLANAR = 3         # vs = world2tex row 0, vt = row 1; offsets du/dv


MAX_MIP = 16


@partial(jax.tree_util.register_dataclass,
         data_fields=["kind", "value", "params", "sub", "img_meta",
                      "mip_off", "texels", "world2tex"],
         meta_fields=["n", "kinds_present", "has_mapping"])
@dataclasses.dataclass
class TextureData:
    kind: jnp.ndarray     # (T,) int32
    value: jnp.ndarray    # (T, 3) const value / v00 for bilerp
    params: jnp.ndarray   # (T, 10): [su, sv, du, dv, octaves, omega/rough,
                          #           scale/variation, extra, map2d, spare]
    sub: jnp.ndarray      # (T, 2) int32 child texture ids (-1)
    img_meta: jnp.ndarray  # (T, 4) int32 [offset, width, height, n_levels]
    mip_off: jnp.ndarray  # (T, MAX_MIP) int32 per-level pool offsets
    texels: jnp.ndarray   # (P, 3) flat texel pool (all mip levels)
    world2tex: jnp.ndarray  # (T, 4, 4) 3D-mapping transform
    n: int
    kinds_present: tuple  # static: sorted tuple of kinds in the table
                          # (gates tracing of the expensive families)
    has_mapping: bool = False   # static: any non-UV 2D mapping present


def _round_up_pow2(x):
    return 1 << max(int(np.ceil(np.log2(max(x, 1)))), 0)


def _lanczos_resample_1d(img, new_n, axis):
    """Separable Lanczos-windowed sinc resample to a pow-2 size
    (mipmap.dart:64-168 resampleWeights, tau=2, 4 taps)."""
    old_n = img.shape[axis]
    if old_n == new_n:
        return img
    filt = 2.0
    centers = (np.arange(new_n) + 0.5) * old_n / new_n
    first = np.floor(centers - filt + 0.5).astype(np.int64)
    offs = np.arange(4)
    pos = first[:, None] + offs[None, :]                    # (new_n, 4)
    x = np.abs(pos + 0.5 - centers[:, None]) / filt
    x = np.minimum(x, 1.0 - 1e-6)
    w = np.sinc(x) * np.sinc(x)        # Lanczos tau=2 approx window
    w /= np.maximum(w.sum(axis=1, keepdims=True), 1e-9)
    pos = np.clip(pos, 0, old_n - 1)
    moved = np.moveaxis(img, axis, 0)                       # (old_n, ...)
    out = np.einsum("nk,nk...->n...", w, moved[pos])
    return np.moveaxis(out, 0, axis)


def build_pyramid(image: np.ndarray):
    """Full mip pyramid (mipmap.dart:64-208): pow-2 Lanczos resample, then
    2x2 box levels down to 1x1. Returns list of (H_l, W_l, 3) arrays."""
    img = np.asarray(image, np.float32)
    h, w = img.shape[0], img.shape[1]
    pw, ph = _round_up_pow2(w), _round_up_pow2(h)
    if (pw, ph) != (w, h):
        img = _lanczos_resample_1d(img, pw, axis=1)
        img = _lanczos_resample_1d(img, ph, axis=0)
    levels = [img]
    while levels[-1].shape[0] > 1 or levels[-1].shape[1] > 1:
        prev = levels[-1]
        hh = max(prev.shape[0] // 2, 1)
        ww = max(prev.shape[1] // 2, 1)
        p = prev
        if prev.shape[0] > 1 and prev.shape[0] % 2:
            p = p[:-1]
        if prev.shape[1] > 1 and prev.shape[1] % 2:
            p = p[:, :-1]
        if prev.shape[0] == 1:
            nxt = 0.5 * (p[:, 0::2] + p[:, 1::2])
        elif prev.shape[1] == 1:
            nxt = 0.5 * (p[0::2] + p[1::2])
        else:
            nxt = 0.25 * (p[0::2, 0::2] + p[1::2, 0::2]
                          + p[0::2, 1::2] + p[1::2, 1::2])
        levels.append(nxt.astype(np.float32))
        if len(levels) >= MAX_MIP:
            break
    return levels


class TextureBuilder:
    def __init__(self):
        self.rows: List[dict] = []
        self.pool: List[np.ndarray] = []
        self.pool_len = 0

    def add(self, kind, value=(0.0, 0.0, 0.0), params=(1, 1, 0, 0, 8, 0.5, 1, 0),
            sub=(-1, -1), image: Optional[np.ndarray] = None,
            world2tex=None, mapping: int = MAP_UV) -> int:
        off, w, h, nlev = 0, 0, 0, 0
        mip_off = np.zeros(MAX_MIP, np.int32)
        if image is not None:
            levels = build_pyramid(image)
            nlev = len(levels)
            off = self.pool_len
            h, w = levels[0].shape[0], levels[0].shape[1]
            for li, lv in enumerate(levels):
                mip_off[li] = self.pool_len
                flat = lv.reshape(-1, 3)
                self.pool.append(flat)
                self.pool_len += flat.shape[0]
            mip_off[nlev:] = mip_off[nlev - 1]
        p = np.zeros(10, np.float32)
        p[:len(params)] = params
        p[8] = float(mapping)
        self.rows.append(dict(
            kind=kind, value=np.asarray(value, np.float32), params=p,
            sub=np.asarray(sub, np.int32),
            img_meta=np.asarray([off, w, h, nlev], np.int32),
            mip_off=mip_off,
            world2tex=np.eye(4, dtype=np.float32) if world2tex is None
            else np.asarray(world2tex, np.float32)))
        return len(self.rows) - 1

    def build(self) -> TextureData:
        if not self.rows:
            self.add(CONST, (1.0, 1.0, 1.0))
        texels = (np.concatenate(self.pool) if self.pool
                  else np.zeros((1, 3), np.float32))
        from .core import spectrum as spec
        if spec.mode() == "sampled":
            # image files are RGB: convert texel pools to band averages
            texels = spec.rgb_to_bands(texels).astype(np.float32)
        col = lambda k, dt=np.float32: \
            np.stack([r[k] for r in self.rows]).astype(dt)
        return TextureData(
            kind=np.asarray([r["kind"] for r in self.rows], np.int32),
            value=col("value"), params=col("params"),
            sub=col("sub", np.int32), img_meta=col("img_meta", np.int32),
            mip_off=col("mip_off", np.int32),
            texels=texels, world2tex=col("world2tex"),
            n=len(self.rows),
            kinds_present=tuple(sorted({r["kind"] for r in self.rows})),
            has_mapping=any(float(r["params"][8]) != 0.0
                            for r in self.rows))


# --- Perlin noise (texture.dart Noise/FBm/Turbulence) ----------------------

_PERM = np.random.RandomState(151).permutation(256)
_PERM2 = np.concatenate([_PERM, _PERM]).astype(np.int32)
_G = np.random.RandomState(7).randn(256, 3)
_G /= np.linalg.norm(_G, axis=-1, keepdims=True)


def perlin(p):
    """Classic gradient noise at V3 points, in [-1, 1]."""
    from .core import math as vm
    p = vm.from_arr(p)
    perm = jnp.asarray(_PERM2)
    gx = jnp.asarray(_G[:, 0], jnp.float32)
    gy = jnp.asarray(_G[:, 1], jnp.float32)
    gz = jnp.asarray(_G[:, 2], jnp.float32)
    fx, fy, fz = jnp.floor(p.x), jnp.floor(p.y), jnp.floor(p.z)
    pix = fx.astype(jnp.int32)
    piy = fy.astype(jnp.int32)
    piz = fz.astype(jnp.int32)
    pfx, pfy, pfz = p.x - fx, p.y - fy, p.z - fz
    sm = lambda t: t * t * t * (t * (t * 6.0 - 15.0) + 10.0)  # smootherstep
    wx, wy, wz = sm(pfx), sm(pfy), sm(pfz)

    def g(dx, dy, dz):
        ix = (pix + dx) & 255
        iy = (piy + dy) & 255
        iz = (piz + dz) & 255
        h = perm[perm[perm[ix] + iy] + iz]
        return (gx[h] * (pfx - dx) + gy[h] * (pfy - dy)
                + gz[h] * (pfz - dz))

    def lerp(t, a, b):
        return a + t * (b - a)

    x00 = lerp(wx, g(0, 0, 0), g(1, 0, 0))
    x10 = lerp(wx, g(0, 1, 0), g(1, 1, 0))
    x01 = lerp(wx, g(0, 0, 1), g(1, 0, 1))
    x11 = lerp(wx, g(0, 1, 1), g(1, 1, 1))
    y0 = lerp(wy, x00, x10)
    y1 = lerp(wy, x01, x11)
    return lerp(wz, y0, y1)


def fbm(p, octaves=8, omega=0.5):
    """(texture.dart FBm) fixed-octave fractal sum. p: V3."""
    from .core import math as vm
    p = vm.from_arr(p)
    out = jnp.zeros(jnp.shape(p.x), jnp.float32)
    lam, o = 1.0, 1.0
    for _ in range(int(octaves)):
        out = out + o * perlin(p * lam)
        lam *= 1.99
        o *= omega
    return out


def turbulence(p, octaves=8, omega=0.5):
    from .core import math as vm
    p = vm.from_arr(p)
    out = jnp.zeros(jnp.shape(p.x), jnp.float32)
    lam, o = 1.0, 1.0
    for _ in range(int(octaves)):
        out = out + o * jnp.abs(perlin(p * lam))
        lam *= 1.99
        o *= omega
    return out


# --- evaluation ------------------------------------------------------------
# All color values flow as component-SoA vm.V3; it["uv"] is a vm.V2 and
# it["p"] a vm.V3 (the round-4 SoA wavefront layout).

def _gp(prm_col, tid):
    """Lane-packed scalar-param gather: params column c at tid."""
    return prm_col[tid]


def _xform_pt(tex: TextureData, tid, p):
    """Per-ray world2tex point transform with component gathers."""
    from .core import math as vm
    w = tex.world2tex
    m = [[w[:, i, j][tid] for j in range(4)] for i in range(3)]
    return vm.V3(m[0][0] * p.x + m[0][1] * p.y + m[0][2] * p.z + m[0][3],
                 m[1][0] * p.x + m[1][1] * p.y + m[1][2] * p.z + m[1][3],
                 m[2][0] * p.x + m[2][1] * p.y + m[2][2] * p.z + m[2][3])


def _map_uv(tex: TextureData, tid, it):
    """2D mapping -> (u, v) per ray (lib/core/texture/*.dart).

    MAP_UV: u = su*u + du (uv_mapping2d.dart). MAP_SPHERICAL: theta/pi,
    phi/2pi of the world2tex-transformed point. MAP_CYLINDRICAL: phi/2pi, z.
    MAP_PLANAR: p.vs + du, p.vt + dv with vs/vt as world2tex rows 0/1."""
    su = tex.params[:, 0][tid]
    sv = tex.params[:, 1][tid]
    du = tex.params[:, 2][tid]
    dv = tex.params[:, 3][tid]
    uv = it["uv"]
    u0 = uv.x * su + du
    v0 = uv.y * sv + dv
    if not tex.has_mapping:
        return u0, v0
    mode = tex.params[:, 8][tid].astype(jnp.int32)
    pt = _xform_pt(tex, tid, it["p"])
    r_len = jnp.sqrt(jnp.maximum(pt.x * pt.x + pt.y * pt.y + pt.z * pt.z,
                                 1e-18))
    theta = jnp.arccos(jnp.clip(pt.z / r_len, -1.0, 1.0))
    phi = jnp.arctan2(pt.y, pt.x)
    phi = jnp.where(phi < 0, phi + 2.0 * np.pi, phi)
    u_s = theta * (1.0 / np.pi)
    v_s = phi * (0.5 / np.pi)
    u_c = phi * (0.5 / np.pi)
    v_c = pt.z
    u_p = pt.x + du
    v_p = pt.y + dv
    u = jnp.where(mode == MAP_SPHERICAL, u_s,
                  jnp.where(mode == MAP_CYLINDRICAL, u_c,
                            jnp.where(mode == MAP_PLANAR, u_p, u0)))
    v = jnp.where(mode == MAP_SPHERICAL, v_s,
                  jnp.where(mode == MAP_CYLINDRICAL, v_c,
                            jnp.where(mode == MAP_PLANAR, v_p, v0)))
    return u, v


def _bilinear_level(tex: TextureData, tid, u, v, level):
    """Bilinear lookup at an integer mip level (MIPMap.triangle,
    mipmap.dart:342-...), repeat wrap. Returns V3."""
    from .core import math as vm
    w0 = tex.img_meta[:, 1][tid]
    h0 = tex.img_meta[:, 2][tid]
    off = tex.mip_off[tid, level]
    w = jnp.maximum(w0 >> level, 1)
    h = jnp.maximum(h0 >> level, 1)
    wf = w.astype(jnp.float32)
    hf = h.astype(jnp.float32)
    uu = (u % 1.0) * wf - 0.5
    vv = (v % 1.0) * hf - 0.5
    x0 = jnp.floor(uu).astype(jnp.int32)
    y0 = jnp.floor(vv).astype(jnp.int32)
    fx = uu - x0
    fy = vv - y0
    tr = tex.texels[:, 0]
    tg = tex.texels[:, 1]
    tb = tex.texels[:, 2]

    def at(x, y):
        xm = jnp.where(w0 > 0, x % w, 0)
        ym = jnp.where(h0 > 0, y % h, 0)
        i = off + ym * w + xm
        return vm.V3(tr[i], tg[i], tb[i])

    c00 = at(x0, y0)
    c10 = at(x0 + 1, y0)
    c01 = at(x0, y0 + 1)
    c11 = at(x0 + 1, y0 + 1)
    return ((c00 * (1 - fx) + c10 * fx) * (1 - fy)
            + (c01 * (1 - fx) + c11 * fx) * fy)


def _img_lookup(tex: TextureData, tid, u, v, width=None):
    """Trilinear mip lookup (MIPMap.lookup, mipmap.dart:209-224): level =
    nLevels-1 + log2(max(width, tiny)), lerp between the two bracketing
    bilinear levels. width = uv-space footprint from ray differentials
    (zero/None -> finest level, the reference's no-differentials behavior)."""
    nlev = tex.img_meta[:, 3][tid]
    if width is None:
        return _bilinear_level(tex, tid, u, v, jnp.zeros_like(nlev))
    lvl_f = (nlev - 1).astype(jnp.float32) + \
        jnp.log2(jnp.maximum(width, 1e-8))
    lvl_f = jnp.clip(lvl_f, 0.0, jnp.maximum(nlev - 1, 0).astype(jnp.float32))
    l0 = jnp.floor(lvl_f).astype(jnp.int32)
    l1 = jnp.minimum(l0 + 1, jnp.maximum(nlev - 1, 0))
    t = lvl_f - l0
    c0 = _bilinear_level(tex, tid, u, v, l0)
    c1 = _bilinear_level(tex, tid, u, v, l1)
    return c0 * (1 - t) + c1 * t


ANISO_PROBES = 4       # fixed probe count (TPU-static replacement for the
MAX_ANISO = 8.0        # data-dependent EWA texel loop, mipmap.dart:226-340)


def _img_lookup_aniso(tex: TextureData, tid, u, v, duv):
    """Anisotropic imagemap filtering (MIPMap.lookup2 / EWA semantics,
    mipmap.dart:226-340), TPU redesign: instead of rasterizing the screen
    ellipse over a data-dependent texel box, take ANISO_PROBES trilinear
    probes spaced along the MAJOR ellipse axis at the mip level chosen by
    the MINOR axis (the hardware "Feline" construction — same sharpening of
    grazing-angle footprints, fixed gather count). Anisotropy is clamped to
    MAX_ANISO by widening the minor axis, exactly as lookup2 does.

    duv: 4-tuple (dudx, dvdx, dudy, dvdy) of (R,) uv-footprint axes."""
    dudx, dvdx, dudy, dvdy = duv
    l0 = dudx * dudx + dvdx * dvdx
    l1 = dudy * dudy + dvdy * dvdy
    swap = l1 > l0
    major_u = jnp.where(swap, dudy, dudx)
    major_v = jnp.where(swap, dvdy, dvdx)
    maj_len = jnp.sqrt(jnp.maximum(jnp.maximum(l0, l1), 1e-16))
    min_len = jnp.sqrt(jnp.maximum(jnp.minimum(l0, l1), 1e-16))
    # clamp anisotropy (mipmap.dart:245-252): widen minor, keep major
    min_len = jnp.maximum(min_len, maj_len / MAX_ANISO)
    acc = None
    wsum = 0.0
    for i in range(ANISO_PROBES):
        t = (i + 0.5) / ANISO_PROBES - 0.5          # [-0.5, 0.5)
        w_i = float(np.exp(-2.0 * (2.0 * t) ** 2))  # gaussian falloff
        ui = u + major_u * t
        vi = v + major_v * t
        c = _img_lookup(tex, tid, ui, vi, min_len)
        acc = c * w_i if acc is None else acc + c * w_i
        wsum += w_i
    return acc * (1.0 / wsum)


def _value3(tex: TextureData, tid):
    from .core import math as vm
    return vm.V3(tex.value[:, 0][tid], tex.value[:, 1][tid],
                 tex.value[:, 2][tid])


def _eval_leaf(tex: TextureData, tid, it):
    """Evaluate leaf kinds for all rays (masked select). Families absent
    from the table are skipped at trace time (kinds_present gating).
    Returns V3."""
    from .core import math as vm
    present = set(tex.kinds_present)
    kind = tex.kind[tid]
    su = tex.params[:, 0][tid]
    sv = tex.params[:, 1][tid]
    u, v = _map_uv(tex, tid, it)
    out = _value3(tex, tid)                                # CONST
    if IMAGEMAP in present:
        duv = it.get("tex_duv")
        if duv is not None:
            # scale the uv footprint axes by the mapping scale (image_texture
            # passes dsdx = dudx * su etc.)
            sc = (duv[0] * su, duv[1] * sv, duv[2] * su, duv[3] * sv)
            img = _img_lookup_aniso(tex, tid, u, v, sc) * _value3(tex, tid)
        else:
            width = it.get("tex_width")
            if width is not None:
                width = width * jnp.maximum(jnp.abs(su), jnp.abs(sv))
            img = _img_lookup(tex, tid, u, v, width) * _value3(tex, tid)
        out = vm.where3(kind == IMAGEMAP, img, out)
    if UV in present:
        uvv = vm.V3(u % 1.0, v % 1.0, jnp.zeros_like(u))
        out = vm.where3(kind == UV, uvv, out)
    if present & {FBM, WRINKLED, MARBLE, WINDY}:
        pt = _xform_pt(tex, tid, it["p"])
        octv = 8
        if FBM in present:
            fv = fbm(pt, octv, 0.5)
            out = vm.where3(kind == FBM, _value3(tex, tid) * fv, out)
        if WRINKLED in present:
            t = turbulence(pt, octv, 0.5)
            out = vm.where3(kind == WRINKLED, _value3(tex, tid) * t, out)
        if MARBLE in present:
            p6 = tex.params[:, 6][tid]
            p7 = tex.params[:, 7][tid]
            scale_ = jnp.where(p6 == 0.0, 1.0, p6)
            var = jnp.where(p7 == 0.0, 0.2, p7)
            mar = jnp.sin(pt.y * scale_ + var * fbm(pt * scale_, octv, 0.5))
            mar01 = 0.5 + 0.5 * mar
            marble_rgb = vm.V3(0.35 + 0.6 * mar01, 0.3 + 0.5 * mar01,
                               0.27 + 0.4 * mar01)
            out = vm.where3(kind == MARBLE, marble_rgb, out)
        if WINDY in present:
            wind = jnp.abs(fbm(pt * 0.1, 3, 0.5)) * fbm(pt, 6, 0.5)
            out = vm.where3(kind == WINDY, vm.V3(wind, wind, wind), out)
    return out


_COMBINATORS = {SCALE, MIX, CHECKER2D, CHECKER3D, DOTS, BILERP}


def evaluate(tex: TextureData, tid, it):
    """Full evaluation: leaves + one combinator level (statically gated).
    Returns V3."""
    from .core import math as vm
    present = set(tex.kinds_present)
    tid = jnp.maximum(tid, 0)
    kind = tex.kind[tid]
    out = _eval_leaf(tex, tid, it)
    if not (present & _COMBINATORS):
        return out
    sub1 = jnp.maximum(tex.sub[:, 0][tid], 0)
    sub2 = jnp.maximum(tex.sub[:, 1][tid], 0)
    c1 = _eval_leaf(tex, sub1, it)
    c2 = _eval_leaf(tex, sub2, it)
    u, v = _map_uv(tex, tid, it)
    if SCALE in present:
        out = vm.where3(kind == SCALE, c1 * c2, out)
    if MIX in present:
        amt = tex.params[:, 4][tid]
        out = vm.where3(kind == MIX, c1 * (1 - amt) + c2 * amt, out)
    if CHECKER2D in present:
        # (closed-form antialiasing pending; point-sampled)
        check = ((jnp.floor(u) + jnp.floor(v)).astype(jnp.int32) % 2) == 0
        out = vm.where3(kind == CHECKER2D, vm.where3(check, c1, c2), out)
    if CHECKER3D in present:
        pt = _xform_pt(tex, tid, it["p"])
        check3 = ((jnp.floor(pt.x) + jnp.floor(pt.y)
                   + jnp.floor(pt.z)).astype(jnp.int32) % 2) == 0
        out = vm.where3(kind == CHECKER3D, vm.where3(check3, c1, c2), out)
    if DOTS in present:
        cx = jnp.floor(u + 0.5)
        cy = jnp.floor(v + 0.5)
        rad = 0.35
        zero = jnp.zeros_like(cx)
        jx = perlin(vm.V3(cx + 0.5, cy + 0.5, zero)) * 0.5
        jy = perlin(vm.V3(cx + 1.5, cy + 2.8, zero)) * 0.5
        inside = ((u - (cx + jx)) ** 2 + (v - (cy + jy)) ** 2) < rad * rad
        out = vm.where3(kind == DOTS, vm.where3(inside, c1, c2), out)
    if BILERP in present:
        v00 = _value3(tex, tid)
        v01 = vm.V3(tex.params[:, 4][tid], tex.params[:, 5][tid],
                    tex.params[:, 6][tid])
        p7 = tex.params[:, 7][tid]
        v10 = vm.V3(p7, p7, p7)
        bl = (v00 * ((1 - u) * (1 - v)) + v01 * ((1 - u) * v)
              + v10 * (u * (1 - v)) + c1 * (u * v))
        out = vm.where3(kind == BILERP, bl, out)
    return out


def eval_or(tex: Optional[TextureData], tid, it, fallback):
    """Evaluate textures where tid >= 0, else use fallback values.
    fallback: V3 (or scalar); returns V3."""
    from .core import math as vm
    if tex is None:
        return fallback
    has = tid >= 0
    vals = evaluate(tex, tid, it)
    return vm.where3(has, vals, fallback)


def eval_or_scalar(tex: Optional[TextureData], tid, it, fallback):
    """Scalar-parameter texture override: first channel, (R,) in/out."""
    if tex is None:
        return fallback
    has = tid >= 0
    vals = evaluate(tex, tid, it)
    return jnp.where(has, vals.x, fallback)
