"""Image film: XYZ + weight accumulation with filter-table splatting.

TPU-native replacement for lib/film/image_film.dart:37-325 and lib/filters/
(box/triangle/gaussian/mitchell/sinc). The reference rasterizes each sample's
filter support serially (image_film.dart:99-185) with a 16x16 precomputed
filter table (:74-82). Here the film is a device (H, W, 4) accumulator
[X, Y, Z, weightSum] plus an (H, W, 3) splat buffer for MLT (:187-245), and a
whole wavefront of samples is deposited with one scatter-add per filter-
footprint tap — the footprint loop is a static Python loop over the (small)
filter extent, each tap fully vectorized across the wave.
"""
from __future__ import annotations

import dataclasses
from functools import partial
from typing import NamedTuple

import numpy as np
import jax
import jax.numpy as jnp

from .core import spectrum as spec

FILTER_TABLE_SIZE = 16  # image_film.dart:74


# --- filters (lib/filters/*.dart Create defaults in Appendix B) ------------

def filter_eval(name: str, params, x, y):
    """Evaluate filter kernel on host (numpy); x/y in filter-width units."""
    xw, yw = params["xwidth"], params["ywidth"]
    ax, ay = np.abs(x), np.abs(y)
    if name == "box":
        return np.ones_like(x)
    if name == "triangle":
        return np.maximum(xw - ax, 0.0) * np.maximum(yw - ay, 0.0)
    if name == "gaussian":
        a = params.get("alpha", 2.0)
        ex = np.exp(-a * xw * xw)
        ey = np.exp(-a * yw * yw)
        gx = np.maximum(np.exp(-a * x * x) - ex, 0.0)
        gy = np.maximum(np.exp(-a * y * y) - ey, 0.0)
        return gx * gy
    if name == "mitchell":
        b = params.get("B", 1.0 / 3.0)
        c = params.get("C", 1.0 / 3.0)

        def m1d(t):
            t = np.abs(2.0 * t)
            out = np.where(
                t > 1,
                ((-b - 6 * c) * t ** 3 + (6 * b + 30 * c) * t ** 2
                 + (-12 * b - 48 * c) * t + (8 * b + 24 * c)) * (1.0 / 6.0),
                ((12 - 9 * b - 6 * c) * t ** 3 + (-18 + 12 * b + 6 * c) * t ** 2
                 + (6 - 2 * b)) * (1.0 / 6.0))
            return out
        return m1d(x / xw) * m1d(y / yw)
    if name == "sinc":
        tau = params.get("tau", 3.0)

        def s1d(t, w):
            t = np.abs(t / w)
            lanczos = np.where(
                t < 1e-5, 1.0,
                np.where(t > 1.0, 0.0,
                         (np.sin(np.pi * t * tau) / np.maximum(np.pi * t * tau, 1e-9))
                         * (np.sin(np.pi * t) / np.maximum(np.pi * t, 1e-9))))
            return lanczos
        return s1d(x, xw) * s1d(y, yw)
    raise ValueError(f"unknown filter {name}")


FILTER_DEFAULTS = {
    # Appendix B: box 0.5; triangle 2; gaussian 2 (alpha 2); mitchell 2
    # (B=C=1/3); sinc 4 (tau 3)
    "box": {"xwidth": 0.5, "ywidth": 0.5},
    "triangle": {"xwidth": 2.0, "ywidth": 2.0},
    "gaussian": {"xwidth": 2.0, "ywidth": 2.0, "alpha": 2.0},
    "mitchell": {"xwidth": 2.0, "ywidth": 2.0, "B": 1 / 3, "C": 1 / 3},
    "sinc": {"xwidth": 4.0, "ywidth": 4.0, "tau": 3.0},
}


def filter_table(name: str, params=None):
    """Precompute the 16x16 filter table (image_film.dart:74-82)."""
    p = dict(FILTER_DEFAULTS[name])
    if params:
        p.update(params)
    xw, yw = p["xwidth"], p["ywidth"]
    fx = (np.arange(FILTER_TABLE_SIZE) + 0.5) / FILTER_TABLE_SIZE * xw
    fy = (np.arange(FILTER_TABLE_SIZE) + 0.5) / FILTER_TABLE_SIZE * yw
    gx, gy = np.meshgrid(fx, fy, indexing="ij")
    table = filter_eval(name, p, gx, gy).astype(np.float32)
    return jnp.asarray(table), float(xw), float(yw)


@partial(jax.tree_util.register_dataclass,
         data_fields=["pixels", "splat", "ftable"],
         meta_fields=["width", "height", "xwidth", "ywidth", "x0", "y0"])
@dataclasses.dataclass
class Film:
    """Device film state. x0/y0: crop-window offset of this film's pixel
    (0,0) in full-image raster coords (OutputImage sub-window semantics,
    core/output_image.dart:35-56 — used for multi-shard tile compositing)."""
    pixels: jnp.ndarray   # (H, W, 4) [X, Y, Z, weight]
    splat: jnp.ndarray    # (H, W, 3) XYZ splat (Metropolis)
    ftable: jnp.ndarray   # (16, 16)
    width: int
    height: int
    xwidth: float
    ywidth: float
    x0: int
    y0: int


def make_film(width, height, filter_name="box", filter_params=None,
              x0=0, y0=0) -> Film:
    table, xw, yw = filter_table(filter_name, filter_params)
    return Film(pixels=jnp.zeros((height, width, 4), jnp.float32),
                splat=jnp.zeros((height, width, 3), jnp.float32),
                ftable=table, width=width, height=height,
                xwidth=xw, ywidth=yw, x0=x0, y0=y0)


def add_samples(film: Film, image_xy, L_rgb, mask=None) -> Film:
    """Deposit a wavefront of radiance samples (image_film.dart:99-185).

    image_xy: V2 (or (R, 2)) continuous raster coords (film-local); L: V3
    (or (R, 3)) RGB. XYZ accumulation with filter weights from the table,
    discrete-continuous offset dimage = sample - 0.5 (:101-102).
    NaN/negative/inf samples are zeroed (sampler_renderer.dart:181-193
    invariant). All math is component-SoA; the single (R, 4) stack happens
    at the scatter boundary.
    """
    from .core import math as vm
    xy = vm.from_arr2(image_xy)
    L = vm.from_arr(L_rgb)
    finite = spec.all_finite(L)
    lum = spec.luminance(L)
    ok = finite & (lum > -1e-5) & jnp.isfinite(lum)
    if mask is not None:
        ok = ok & mask
    L = vm.where3(ok, L, 0.0)
    w_ok = ok.astype(jnp.float32)
    xyz = spec.to_xyz(L)

    dx = xy.x - 0.5 - film.x0
    dy = xy.y - 0.5 - film.y0

    def deposit(pixels, ix, iy, w):
        ixc = jnp.clip(ix, 0, film.width - 1)
        iyc = jnp.clip(iy, 0, film.height - 1)
        contrib = jnp.stack([xyz.x * w, xyz.y * w, xyz.z * w, w], axis=-1)
        return pixels.at[iyc, ixc].add(contrib)

    # FAST PATH, box filter <= 0.5: the footprint is exactly the owning
    # pixel -> ONE scatter-add instead of four (a 262k-wave deposit measured
    # 46 ms -> ~11 ms on the v5e; the only deviation from the slow path is
    # the measure-zero case of a sample exactly on a pixel boundary, which
    # the reference deposits to both neighbors)
    if film.xwidth <= 0.5 and film.ywidth <= 0.5:
        ix = jnp.floor(xy.x - film.x0).astype(jnp.int32)
        iy = jnp.floor(xy.y - film.y0).astype(jnp.int32)
        in_img = ((ix >= 0) & (ix < film.width)
                  & (iy >= 0) & (iy < film.height))
        w = jnp.where(in_img, 1.0, 0.0) * w_ok
        return dataclasses.replace(film, pixels=deposit(film.pixels, ix,
                                                        iy, w))
    # static footprint loop over the filter support [dx-w, dx+w]
    # (image_film.dart:120-141: x0 = ceil(dx - w), x1 = floor(dx + w))
    ext_x = int(np.floor(2.0 * film.xwidth)) + 1
    ext_y = int(np.floor(2.0 * film.ywidth)) + 1
    x_base = jnp.ceil(dx - film.xwidth).astype(jnp.int32)
    y_base = jnp.ceil(dy - film.ywidth).astype(jnp.int32)
    pixels = film.pixels
    inv_xw = 1.0 / film.xwidth
    inv_yw = 1.0 / film.ywidth
    for oy in range(ext_y):
        for ox in range(ext_x):
            ix = x_base + ox
            iy = y_base + oy
            adx = jnp.abs(ix.astype(jnp.float32) - dx)
            ady = jnp.abs(iy.astype(jnp.float32) - dy)
            fx = adx * inv_xw
            fy = ady * inv_yw
            in_support = (adx <= film.xwidth) & (ady <= film.ywidth)
            tx = jnp.minimum((fx * FILTER_TABLE_SIZE).astype(jnp.int32),
                             FILTER_TABLE_SIZE - 1)
            ty = jnp.minimum((fy * FILTER_TABLE_SIZE).astype(jnp.int32),
                             FILTER_TABLE_SIZE - 1)
            fw = film.ftable[tx, ty]
            in_img = ((ix >= 0) & (ix < film.width)
                      & (iy >= 0) & (iy < film.height))
            w = jnp.where(in_support & in_img, fw, 0.0) * w_ok
            pixels = deposit(pixels, ix, iy, w)
    return dataclasses.replace(film, pixels=pixels)


def splat(film: Film, image_xy, L_rgb, mask=None) -> Film:
    """Unweighted splat accumulation for MLT (image_film.dart:187-245)."""
    from .core import math as vm
    xy = vm.from_arr2(image_xy)
    L = vm.from_arr(L_rgb)
    finite = spec.all_finite(L)
    if mask is not None:
        finite = finite & mask
    xyz = spec.to_xyz(vm.where3(finite, L, 0.0))
    fx = xy.x - film.x0
    fy = xy.y - film.y0
    ix = jnp.clip(fx.astype(jnp.int32), 0, film.width - 1)
    iy = jnp.clip(fy.astype(jnp.int32), 0, film.height - 1)
    inb = ((fx >= 0) & (fx < film.width) & (fy >= 0) & (fy < film.height))
    xyz = vm.where3(inb, xyz, 0.0)
    contrib = jnp.stack([xyz.x, xyz.y, xyz.z], axis=-1)
    return dataclasses.replace(film, splat=film.splat.at[iy, ix].add(contrib))


def save_checkpoint(path, film: Film, next_s: int):
    """Film + sample-counter checkpoint (SURVEY §5: the additive
    [XYZ|weight] film is a resumable accumulator by construction; adding the
    next sample index + the deterministic (pixel, s_idx, dim)-keyed samplers
    makes (film, next_s) a COMPLETE render checkpoint)."""
    tmp = str(path) + ".tmp.npz"
    np.savez(tmp, pixels=np.asarray(film.pixels),
             splat=np.asarray(film.splat),
             next_s=np.asarray(next_s, np.int64),
             meta=np.asarray([film.width, film.height, film.x0, film.y0]))
    import os
    os.replace(tmp, str(path))


def load_checkpoint(path, film: Film):
    """Restore (film, next_s) saved by save_checkpoint; the passed film
    supplies the filter table / static meta and must match the saved shape."""
    d = np.load(str(path))
    meta = d["meta"]
    if tuple(meta[:2]) != (film.width, film.height):
        raise ValueError(f"checkpoint resolution {tuple(meta[:2])} != "
                         f"film ({film.width}, {film.height})")
    film = dataclasses.replace(film, pixels=jnp.asarray(d["pixels"]),
                               splat=jnp.asarray(d["splat"]))
    return film, int(d["next_s"])


def to_rgb(film: Film, splat_scale=0.0) -> jnp.ndarray:
    """Resolve to (H, W, 3) linear RGB: XYZToRGB(Lxyz)/weightSum +
    splatScale * XYZToRGB(splatXYZ) (image_film.dart:268-299)."""
    w = film.pixels[..., 3:4]
    xyz = film.pixels[..., :3] / jnp.maximum(w, 1e-12)
    rgb = spec.xyz_to_rgb(jnp.where(w > 0, xyz, 0.0))
    rgb = jnp.maximum(rgb, 0.0)
    if splat_scale:
        rgb = rgb + jnp.maximum(spec.xyz_to_rgb(film.splat), 0.0) * splat_scale
    return rgb
