"""Precomputed radiance transfer integrators: diffuseprt / glossyprt /
useprobes.

TPU-native replacement for lib/surface_integrators/diffuse_prt_integrator.dart
(92 LoC), glossy_prt_integrator.dart (134 LoC) and
use_probes_integrator.dart (185 LoC), built on core/sh.py
(lib/core/spherical_harmonics.dart).

Design notes (idiomatic-TPU deviations, same math):
- The reference projects incident direct radiance onto SH once in preprocess
  (SHProjectIncidentDirectRadiance, spherical_harmonics.dart:145) at the
  scene-bound center; we do the same with a visibility-traced uniform-sphere
  wave (project_incident_radiance below).
- diffuseprt's per-point transfer vector (visibility x clamped-cosine
  projected onto SH) is estimated by a lax.fori over a static sample count:
  each iteration is one full shadow wave + one fused SH-basis block.
- glossyprt's rotate-then-BSDF-matrix pipeline (K = B R c_in) is replaced by
  direct MC of the identical integral: L(wo) = int f(wo,wi) V(wi)
  [sum_i c_i Y_i(wi)] |cos| dwi — same expectation, no per-pixel (T,T)
  rotation matrices (which would be gather-heavy on TPU).
- useprobes trilinearly interpolates a baked SH-probe grid (see
  renderers/probes.py) and evaluates cosine-convolved irradiance at the
  shading normal.

Defaults match Appendix B: lmax 4, nsamples 4096 (diffuse/glossy PRT).
"""
from __future__ import annotations

import dataclasses
from functools import partial
from typing import Any

import numpy as np
import jax
import jax.numpy as jnp

from .. import bsdf as bx
from .. import lights as lt_mod
from .. import materials as mat_mod
from ..accel import traverse
from ..core import math as vm
from ..core import sampling as smp
from ..core import sh
from ..scene import types as st

FOUR_PI = float(4.0 * np.pi)


@partial(jax.tree_util.register_dataclass, data_fields=[],
         meta_fields=["lmax", "n_samples"])
@dataclasses.dataclass
class DiffusePRTIntegrator:
    lmax: int = 4
    n_samples: int = 4096


@partial(jax.tree_util.register_dataclass, data_fields=[],
         meta_fields=["lmax", "n_samples"])
@dataclasses.dataclass
class GlossyPRTIntegrator:
    lmax: int = 4
    n_samples: int = 4096


def _ld_sphere_dirs(i, scramble):
    """(0,2)-sequence direction on the unit sphere for iteration i."""
    u = smp.sample02(i, scramble)
    return smp.uniform_sample_sphere(u)


def project_incident_radiance(scene: st.CompiledScene, p, lmax: int,
                              n_samples: int = 4096, seed: int = 7):
    """SH-project incident direct radiance at point p (3,) — the preprocess
    step of both PRT integrators (diffuse_prt_integrator.dart preprocess /
    SHProjectIncidentDirectRadiance). Returns (T, 3) device array.

    Batched: all n_samples directions traced as ONE wave; radiance per
    direction = env Le on escape, or emitted Le of the hit primitive."""
    from ..scene import types as _st
    scene = _st.to_device(scene)
    geom = scene.geometry
    lt = scene.lights
    n = int(n_samples)
    scr_np = np.random.default_rng(seed).integers(0, 2 ** 32, 2,
                                                  dtype=np.uint32)
    scr = (jnp.uint32(int(scr_np[0])), jnp.uint32(int(scr_np[1])))
    idx = jnp.arange(n, dtype=jnp.uint32)
    u = smp.sample02(idx, scr)
    d = smp.uniform_sample_sphere(u)
    pj = jnp.asarray(p, jnp.float32)
    o = vm.bcast3(vm.V3(pj[0], pj[1], pj[2]), (n,))
    rays = vm.Rays(o=o, d=d, tmin=jnp.full((n,), 1e-4, jnp.float32),
                   tmax=jnp.full((n,), jnp.inf, jnp.float32),
                   time=jnp.zeros((n,), jnp.float32))
    hits = st.intersect(geom, rays)
    L = vm.v3zeros((n,))
    if lt is not None and lt.env_light_index >= 0:
        L = L + vm.where3(hits.hit, 0.0, lt_mod.env_le(lt, d))
    if lt is not None:
        it = st.interaction(geom, rays, hits)
        le = lt_mod.le_emitted(lt, geom, hits.prim, it["wo"], it["ns"])
        L = L + vm.where3(hits.hit, le, 0.0)
    w = jnp.full((n,), FOUR_PI / n, jnp.float32)   # uniform-sphere pdf
    return sh.project_directions(vm.to_arr(d), vm.to_arr(L), w, lmax)


def _transfer_loop(scene, it, frame, hit_mask, lmax, n_samples, body_weight,
                   seed_scr):
    """Shared MC loop over LD sphere directions with occlusion tests.

    body_weight(wi, cos_s, vis) -> (R, K) weights accumulated per sample.
    Returns the (R, K) MC mean * 4pi (uniform-sphere inverse pdf)."""
    geom = scene.geometry
    r = jnp.shape(it["t"])[0]
    eps = st.ray_epsilon(it["t"])

    def body(i, acc):
        wi = _ld_sphere_dirs(jnp.uint32(i), seed_scr)
        wi = vm.bcast3(wi, (r,))
        cos_s = vm.dot(wi, frame.n)
        sray = vm.Rays(
            o=it["p"] + vm.face_forward(it["ng"], wi) * eps,
            d=wi, tmin=jnp.zeros((r,), jnp.float32),
            tmax=jnp.full((r,), jnp.inf, jnp.float32),
            time=jnp.zeros((r,), jnp.float32))
        occ = st.intersect_p(geom, sray)
        vis = (~occ) & hit_mask
        return acc + body_weight(wi, cos_s, vis)

    # a different wi per ray would need per-ray scrambles; the reference uses
    # one LD sequence per *pixel* — here per-ray scramble via pixel hash:
    zf = jnp.zeros((r,), jnp.float32)
    acc0 = jax.tree_util.tree_map(
        lambda a: a * 0.0,
        body_weight(vm.V3(zf, zf, zf), zf, jnp.zeros((r,), bool)))
    acc = jax.lax.fori_loop(0, n_samples, body, acc0)
    return jax.tree_util.tree_map(lambda a: a * (FOUR_PI / n_samples), acc)


def diffuse_li(ig: DiffusePRTIntegrator, scene: st.CompiledScene, rays,
               diffs, sctx, c_in):
    """L = rho/pi * dot(c_in, T_p), T_p = int V(p,w) max(0, n.w) Y(w) dw
    (diffuse_prt_integrator.dart Li)."""
    geom = scene.geometry
    r = rays.n
    hits = st.intersect(geom, rays)
    it = st.interaction(geom, rays, hits)
    # two-sided: transfer hemisphere on the viewer side (matte convention)
    ns_v = vm.face_forward(it["ns"], it["wo"])
    frame = bx.make_frame(ns_v, it["dpdu"], it["ng"])
    params = mat_mod.eval_params(scene.materials, it["mat_id"],
                                 scene.textures, it)
    T = sh.n_terms(ig.lmax)
    scr = (jnp.uint32(0x9e3779b9), jnp.uint32(0x85ebca6b))

    def w_fn(wi, cos_s, vis):
        Y = sh.eval_basis(wi, ig.lmax)                    # (R, T)
        w = jnp.where(vis, jnp.maximum(cos_s, 0.0), 0.0)
        return Y * w[:, None]

    transfer = _transfer_loop(scene, it, frame, hits.hit, ig.lmax,
                              ig.n_samples, w_fn, scr)     # (R, T)
    rho = params.kd                                        # diffuse albedo
    E = vm.from_arr(transfer @ c_in)                       # V3
    L = rho * E * (1.0 / np.pi)
    le = vm.v3zeros((r,))
    lt = scene.lights
    if lt is not None:
        le = lt_mod.le_emitted(lt, geom, hits.prim, it["wo"], it["ns"])
        if lt.env_light_index >= 0:
            le = vm.where3(hits.hit, le, lt_mod.env_le(lt, rays.d))
    return vm.where3(hits.hit, L + le, le)


def glossy_li(ig: GlossyPRTIntegrator, scene: st.CompiledScene, rays,
              diffs, sctx, c_in):
    """MC of L(wo) = int f(wo,wi) V(wi) L_SH(wi) |cos| dwi — the integral the
    reference evaluates as K = B (R c_in) (glossy_prt_integrator.dart Li)."""
    geom = scene.geometry
    r = rays.n
    hits = st.intersect(geom, rays)
    it = st.interaction(geom, rays, hits)
    ns_v = vm.face_forward(it["ns"], it["wo"])
    frame = bx.make_frame(ns_v, it["dpdu"], it["ng"])
    params = mat_mod.eval_params(scene.materials, it["mat_id"],
                                 scene.textures, it)
    wo = it["wo"]
    scr = (jnp.uint32(0xc2b2ae35), jnp.uint32(0x27d4eb2f))

    def w_fn(wi, cos_s, vis):
        Y = sh.eval_basis(wi, ig.lmax)
        L_in = vm.from_arr(jnp.maximum(Y @ c_in, 0.0))     # V3
        f_v = bx.f(params, frame, wo, wi, bx.ALL & ~bx.SPECULAR)
        w = jnp.where(vis, jnp.abs(cos_s), 0.0)
        return f_v * L_in * w

    L = _transfer_loop(scene, it, frame, hits.hit, ig.lmax, ig.n_samples,
                       w_fn, scr)
    lt = scene.lights
    le = vm.v3zeros((r,))
    if lt is not None:
        le = lt_mod.le_emitted(lt, geom, hits.prim, it["wo"], it["ns"])
        if lt.env_light_index >= 0:
            le = vm.where3(hits.hit, le, lt_mod.env_le(lt, rays.d))
    return vm.where3(hits.hit, L + le, le)


# --------------------------------------------------------------------------
# useprobes (use_probes_integrator.dart): interpolate baked SH probes.
# --------------------------------------------------------------------------

@partial(jax.tree_util.register_dataclass,
         data_fields=["coeffs", "bbox_lo", "bbox_hi"],
         meta_fields=["lmax", "res"])
@dataclasses.dataclass
class SHProbes:
    """Baked probe grid: coeffs (nx*ny*nz, T, 3) raveled z-major like the
    reference's probes file; bbox in world space."""
    coeffs: Any
    bbox_lo: Any
    bbox_hi: Any
    lmax: int
    res: tuple


@partial(jax.tree_util.register_dataclass, data_fields=[],
         meta_fields=["lmax"])
@dataclasses.dataclass
class UseProbesIntegrator:
    lmax: int = 4


def probe_lookup(probes: SHProbes, p):
    """Trilinear interpolation of SH coefficients at points p (V3)."""
    p = vm.from_arr(p)
    nx, ny, nz = probes.res
    lo = probes.bbox_lo
    hi = probes.bbox_hi
    ext = jnp.maximum(hi - lo, 1e-9)
    gx = jnp.clip((p.x - lo[0]) / ext[0] * nx - 0.5, 0.0, nx - 1.0)
    gy = jnp.clip((p.y - lo[1]) / ext[1] * ny - 0.5, 0.0, ny - 1.0)
    gz = jnp.clip((p.z - lo[2]) / ext[2] * nz - 0.5, 0.0, nz - 1.0)
    x0 = jnp.floor(gx).astype(jnp.int32)
    y0 = jnp.floor(gy).astype(jnp.int32)
    z0 = jnp.floor(gz).astype(jnp.int32)
    fx = (gx - x0)[:, None, None]
    fy = (gy - y0)[:, None, None]
    fz = (gz - z0)[:, None, None]
    x1 = jnp.minimum(x0 + 1, nx - 1)
    y1 = jnp.minimum(y0 + 1, ny - 1)
    z1 = jnp.minimum(z0 + 1, nz - 1)

    def at(xi, yi, zi):
        return probes.coeffs[(xi * ny + yi) * nz + zi]

    c = (at(x0, y0, z0) * (1 - fx) * (1 - fy) * (1 - fz)
         + at(x1, y0, z0) * fx * (1 - fy) * (1 - fz)
         + at(x0, y1, z0) * (1 - fx) * fy * (1 - fz)
         + at(x1, y1, z0) * fx * fy * (1 - fz)
         + at(x0, y0, z1) * (1 - fx) * (1 - fy) * fz
         + at(x1, y0, z1) * fx * (1 - fy) * fz
         + at(x0, y1, z1) * (1 - fx) * fy * fz
         + at(x1, y1, z1) * fx * fy * fz)
    return c                                               # (R, T, 3)


def probes_li(ig: UseProbesIntegrator, scene: st.CompiledScene, rays, diffs,
              sctx, probes: SHProbes):
    """E(n) via cosine-convolved interpolated coefficients; L = kd/pi * E
    (use_probes_integrator.dart Li)."""
    geom = scene.geometry
    r = rays.n
    hits = st.intersect(geom, rays)
    it = st.interaction(geom, rays, hits)
    params = mat_mod.eval_params(scene.materials, it["mat_id"],
                                 scene.textures, it)
    c = probe_lookup(probes, it["p"])                      # (R, T, 3)
    c = sh.convolve_cos_theta(jnp.moveaxis(c, 1, 0), ig.lmax)
    c = jnp.moveaxis(c, 0, 1)
    ns_v = vm.face_forward(it["ns"], it["wo"])
    Y = sh.eval_basis(ns_v, ig.lmax)                       # (R, T)
    E = vm.from_arr(jnp.einsum("rt,rtc->rc", Y, c))
    L = params.kd * E.map(lambda a: jnp.maximum(a, 0.0)) * (1.0 / np.pi)
    lt = scene.lights
    le = vm.v3zeros((r,))
    if lt is not None:
        le = lt_mod.le_emitted(lt, geom, hits.prim, it["wo"], it["ns"])
        if lt.env_light_index >= 0:
            le = vm.where3(hits.hit, le, lt_mod.env_le(lt, rays.d))
    return vm.where3(hits.hit, L + le, le)
