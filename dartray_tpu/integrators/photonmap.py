"""Photon mapping surface integrator.

TPU-native replacement for lib/surface_integrators/
photon_map_integrator.dart:23-818 ("photonmap"/"exphotonmap"):
- Photon shooting (PhotonShootingTask :364-470): the reference shoots 4096-
  photon blocks of Halton-driven light paths on the host; here ALL photons
  are one SoA wavefront — emission via lights.sample_le, a static bounce
  loop with BSDF sampling, depositing (p, wi, alpha) at every non-specular
  hit, classified caustic (all-specular prefix) / direct (first hit) /
  indirect.
- The kd-tree photon maps (core/kdtree.dart:29) become **sorted hash grids**
  with cell size = the gather radius: queries scan the 27 neighbor cells
  with a static per-cell photon budget — gather-friendly static shapes
  instead of pointer-chasing (SURVEY §7 "hard parts").
- Radiance estimate: Simpson-kernel density over gathered photons
  (the reference's LPhoton filter).
- Final gather (:84-152): BSDF-sampled gather rays whose hit radiance is
  estimated on the fly from the direct+indirect+caustic maps (the
  reference caches the same quantity in "radiance photons";
  ComputeRadianceTask :614 — here it is cheap enough to recompute).

Defaults per Appendix B: causticphotons 20k, indirectphotons 100k,
nused(n_lookup) 50, maxphotondepth 5, finalgather on (32 samples),
maxdist 0.1.
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
from .. import samplers as smp_mod
from ..accel import traverse
from ..core import math as vm
from ..core import sampling as smp
from ..scene import types as st
from . import common

INV_PI = float(1.0 / np.pi)
MAX_SCAN = 64          # static photons scanned per hash cell


@partial(jax.tree_util.register_dataclass, data_fields=[],
         meta_fields=["n_caustic", "n_indirect", "n_lookup", "max_dist",
                      "max_specular_depth", "max_photon_depth",
                      "final_gather", "gather_samples", "seed"])
@dataclasses.dataclass
class PhotonMapIntegrator:
    n_caustic: int = 20_000
    n_indirect: int = 100_000
    n_lookup: int = 50
    max_dist: float = 0.1
    max_specular_depth: int = 5
    max_photon_depth: int = 5
    final_gather: bool = True
    gather_samples: int = 32
    seed: int = 0


@partial(jax.tree_util.register_dataclass,
         data_fields=["p", "wi", "alpha", "cell"],
         meta_fields=["cell_size", "n"])
@dataclasses.dataclass
class PhotonMap:
    """Photons sorted by spatial-hash cell id (the kd-tree replacement).
    p/wi/alpha are component-SoA V3 of (N,)."""
    p: vm.V3
    wi: vm.V3             # incident direction (toward photon origin)
    alpha: vm.V3          # power / n_paths
    cell: jnp.ndarray     # (N,) int32 sorted hash ids
    cell_size: float
    n: int


def _hash_cells(ix, iy, iz):
    """int cell coords -> int32 hash (pbrt-style spatial hash)."""
    h = (ix * np.int32(73856093)
         ^ iy * np.int32(19349663)
         ^ iz * np.int32(83492791))
    return (h & np.int32(0x7fffffff)).astype(jnp.int32)


def build_map(p, wi, alpha, cell_size: float) -> PhotonMap:
    """Sort photons by hash cell (host arrays ok; runs fine jitted too)."""
    p = vm.from_arr(p)
    wi = vm.from_arr(wi)
    alpha = vm.from_arr(alpha)
    cl = lambda c: jnp.floor(c / cell_size).astype(jnp.int32)
    cell = _hash_cells(cl(p.x), cl(p.y), cl(p.z))
    order = jnp.argsort(cell)
    g = lambda v: vm.gather3(v, order)
    return PhotonMap(p=g(p), wi=g(wi), alpha=g(alpha),
                     cell=cell[order], cell_size=float(cell_size),
                     n=int(jnp.shape(p.x)[0]))


_NEIGHBORS = np.array([(i, j, k) for i in (-1, 0, 1) for j in (-1, 0, 1)
                       for k in (-1, 0, 1)], np.int32)


def gather_photons(pm: PhotonMap, q, accum_fn, init):
    """Scan photons within the 27 neighbor cells of query points q (R, 3).

    accum_fn(carry, ph_p, ph_wi, ph_alpha, valid_mask) -> carry, applied for
    MAX_SCAN slots per cell (static shapes). Returns final carry. q: V3."""
    q = vm.from_arr(q)
    cl = lambda c: jnp.floor(c / pm.cell_size).astype(jnp.int32)
    iqx, iqy, iqz = cl(q.x), cl(q.y), cl(q.z)
    carry = init
    for off in _NEIGHBORS:
        hid = _hash_cells(iqx + int(off[0]), iqy + int(off[1]),
                          iqz + int(off[2]))
        lo = jnp.searchsorted(pm.cell, hid, side="left")
        hi = jnp.searchsorted(pm.cell, hid, side="right")
        hi = jnp.minimum(hi, lo + MAX_SCAN)

        def body(k, c):
            idx = jnp.minimum(lo + k, pm.n - 1)
            valid = (lo + k) < hi
            return accum_fn(c, vm.gather3(pm.p, idx),
                            vm.gather3(pm.wi, idx),
                            vm.gather3(pm.alpha, idx), valid)

        carry = jax.lax.fori_loop(0, MAX_SCAN, body, carry)
    return carry


def density_radiance(pm: PhotonMap, q, frame, params, wo, max_dist,
                     diffuse_only=False):
    """L = sum_j k(d_j) f(wo, wi_j) alpha_j (LPhoton, with the Simpson
    kernel 3/(pi r^2) (1 - d^2/r^2)^2)."""
    r2max = max_dist * max_dist
    q = vm.from_arr(q)
    rr = jnp.shape(q.x)[0]

    def acc(c, pp, pwi, pal, valid):
        d2 = vm.length_sq(pp - q)
        inside = valid & (d2 < r2max)
        k = 3.0 * INV_PI / r2max * (1.0 - d2 / r2max) ** 2
        if diffuse_only:
            f_v = params.kd * INV_PI
        else:
            f_v = bx.f(params, frame, wo, pwi, bx.ALL & ~bx.SPECULAR)
        return c + vm.where3(inside, f_v * pal * k, 0.0)

    return gather_photons(pm, q, acc, vm.v3zeros((rr,)))


def shoot_photons(ig: PhotonMapIntegrator, scene: st.CompiledScene):
    """Trace photon paths; returns (caustic, direct, indirect) PhotonMaps.

    One emission wave of n_paths photons, bounced max_photon_depth times;
    deposits are collected per (bounce, photon) slot then compacted on host
    (preprocess is host-time, matching the reference's preprocess phase)."""
    scene = st.to_device(scene)   # scene tables are host numpy until here
    geom = scene.geometry
    lt = scene.lights
    n = max(ig.n_caustic + ig.n_indirect, 1)
    rng = np.random.default_rng(ig.seed + 101)
    key = jnp.asarray(rng.integers(0, 2 ** 32, 2, dtype=np.uint32))

    def u1(ctr):
        i = jnp.arange(n, dtype=jnp.uint32)
        return smp.rng_uniform(key[0] ^ smp.hash_u32(jnp.uint32(ctr)), i)

    def u2(ctr):
        return vm.V2(u1(ctr * 2 + 1), u1(ctr * 2 + 2))

    @jax.jit
    def run():
        li_idx, li_pdf = lt_mod.sample_light_index(lt, u1(0))
        em = lt_mod.sample_le(lt, geom, li_idx, li_pdf, u2(1), u1(2), u2(3))
        alpha = em.alpha / float(n)   # estimator: sum alpha / n_paths
        cur = vm.Rays(o=em.o, d=em.d,
                      tmin=jnp.full((n,), 1e-4, jnp.float32),
                      tmax=jnp.full((n,), jnp.inf, jnp.float32),
                      time=jnp.zeros((n,), jnp.float32))
        active = jnp.ones((n,), bool)
        specular_only = jnp.ones((n,), bool)   # all-specular prefix so far
        ps, wis, als, kinds = [], [], [], []   # kind: 0 direct,1 caustic,2 ind
        for bounce in range(ig.max_photon_depth):
            hits = st.intersect(geom, cur)
            hit = hits.hit & active
            it = st.interaction(geom, cur, hits)
            frame = bx.make_frame(it["ns"], it["dpdu"], it["ng"])
            params = mat_mod.eval_params(scene.materials, it["mat_id"],
                                         scene.textures, it)
            has_diffuse = ((params.kd.x > 0) | (params.kd.y > 0)
                           | (params.kd.z > 0) | (params.ks.x > 0)
                           | (params.ks.y > 0) | (params.ks.z > 0))
            deposit = hit & has_diffuse
            kind = jnp.where(bounce == 0, 0,
                             jnp.where(specular_only, 1, 2))
            ps.append(vm.where3(deposit, it["p"], 1e30))
            wis.append(it["wo"])
            als.append(vm.where3(deposit, alpha, 0.0))
            kinds.append(jnp.where(deposit, kind, -1))
            # continue the path: BSDF sample, RR on throughput ratio
            ub = u2(10 + bounce * 4)
            uc = u1(12 + bounce * 4)
            bs = bx.sample_f(params, frame, it["wo"], ub, uc, flags=bx.ALL)
            cos_s = vm.absdot(bs.wi, frame.n)
            anew = alpha * bs.f * (cos_s / jnp.maximum(bs.pdf, 1e-20))
            # RR (photon_map_integrator.dart continue probability)
            ratio = ((anew.x + anew.y + anew.z)
                     / jnp.maximum(alpha.x + alpha.y + alpha.z, 1e-12))
            cprob = jnp.minimum(1.0, ratio)
            u_rr = u1(13 + bounce * 4)
            survive = u_rr < cprob
            anew = anew * (1.0 / jnp.maximum(cprob, 1e-8))
            cont = hit & bs.valid & (bs.pdf > 0) & survive
            alpha = vm.where3(cont, anew, alpha)
            specular_only = specular_only & ((bs.flags & bx.SPECULAR) != 0)
            eps = st.ray_epsilon(it["t"])
            ng_f = vm.face_forward(it["ng"], bs.wi)
            cur = vm.Rays(o=it["p"] + ng_f * eps, d=bs.wi,
                          tmin=jnp.zeros((n,), jnp.float32),
                          tmax=jnp.full((n,), jnp.inf, jnp.float32),
                          time=cur.time)
            active = cont
        cat3 = lambda vs: vm.V3(jnp.concatenate([v.x for v in vs]),
                                jnp.concatenate([v.y for v in vs]),
                                jnp.concatenate([v.z for v in vs]))
        return (vm.to_arr(cat3(ps)), vm.to_arr(cat3(wis)),
                vm.to_arr(cat3(als)), jnp.concatenate(kinds))

    p, wi, al, kind = (np.asarray(x) for x in run())

    def compact(sel):
        m = np.asarray(sel)
        if not m.any():
            z3 = jnp.zeros((1, 3), jnp.float32)
            return build_map(z3 + 1e30, z3, z3 * 0, ig.max_dist)
        return build_map(jnp.asarray(p[m]), jnp.asarray(wi[m]),
                         jnp.asarray(al[m]), ig.max_dist)

    return compact(kind == 1), compact(kind == 0), compact(kind == 2)


def li(ig: PhotonMapIntegrator, scene: st.CompiledScene, rays, diffs, sctx,
       maps):
    """Li (photon_map_integrator.dart:60-160): direct lighting (MIS) +
    caustic map + indirect (final gather or map) + specular continuation."""
    caustic_map, direct_map, indirect_map = maps
    geom = scene.geometry
    lt = scene.lights
    r = rays.n
    L = vm.v3zeros((r,))
    throughput = vm.v3ones((r,))
    active = jnp.ones((r,), bool)
    cur = rays
    dim = 5
    for depth in range(ig.max_specular_depth + 1):
        hits = st.intersect(geom, cur)
        hit = hits.hit & active
        if lt is not None and lt.env_light_index >= 0:
            L = L + vm.where3(active & ~hits.hit,
                              throughput * lt_mod.env_le(lt, cur.d), 0.0)
        it = st.interaction(geom, cur, hits)
        frame = bx.make_frame(it["ns"], it["dpdu"], it["ng"])
        if lt is not None:
            le = lt_mod.le_emitted(lt, geom, hits.prim, it["wo"], it["ns"])
            L = L + vm.where3(hit, throughput * le, 0.0)
        params = mat_mod.eval_params(scene.materials, it["mat_id"],
                                     scene.textures, it)
        wo = it["wo"]
        # direct lighting via MIS (reference uses EstimateDirect here)
        if lt is not None and lt.n > 0:
            sd = lambda d: smp_mod.sample_1d(sctx["sampler"], sctx["px"],
                                             sctx["py"], sctx["s_idx"], d)
            sd2 = lambda d: smp_mod.sample_2d(sctx["sampler"], sctx["px"],
                                              sctx["py"], sctx["s_idx"], d)
            ld = common.uniform_sample_one_light(
                scene, it, frame, params, wo,
                sd(dim), sd2(dim + 1), sd(dim + 3), sd2(dim + 4), sd(dim + 6))
            L = L + vm.where3(hit, throughput * ld, 0.0)
        # caustics: density estimate at the hit
        lc = density_radiance(caustic_map, it["p"], frame, params, wo,
                              ig.max_dist)
        L = L + vm.where3(hit, throughput * lc, 0.0)
        if depth == 0:     # indirect only at the first (non-specular) hit
            if ig.final_gather:
                li_ind = _final_gather(ig, scene, it, frame, params, wo,
                                       (caustic_map, direct_map,
                                        indirect_map), sctx, dim + 10)
            else:
                li_ind = density_radiance(indirect_map, it["p"], frame,
                                          params, wo, ig.max_dist)
            L = L + vm.where3(hit, throughput * li_ind, 0.0)
        if depth == ig.max_specular_depth:
            break
        u_s = smp_mod.sample_2d(sctx["sampler"], sctx["px"], sctx["py"],
                                sctx["s_idx"], dim + 7)
        uc_s = smp_mod.sample_1d(sctx["sampler"], sctx["px"], sctx["py"],
                                 sctx["s_idx"], dim + 9)
        dim += 60
        bs = bx.sample_f(params, frame, wo, u_s, uc_s,
                         flags=bx.SPECULAR | bx.REFLECTION | bx.TRANSMISSION)
        cos_s = vm.absdot(bs.wi, frame.n)
        cont = hit & bs.valid & (bs.pdf > 0.0) & (
            (bs.f.x != 0.0) | (bs.f.y != 0.0) | (bs.f.z != 0.0))
        throughput = vm.where3(
            cont,
            throughput * bs.f * (cos_s / jnp.maximum(bs.pdf, 1e-20)),
            throughput)
        eps = st.ray_epsilon(it["t"])
        ng_f = vm.face_forward(it["ng"], bs.wi)
        cur = vm.Rays(o=it["p"] + ng_f * eps, d=bs.wi,
                      tmin=jnp.zeros((r,), jnp.float32),
                      tmax=jnp.full((r,), jnp.inf, jnp.float32),
                      time=cur.time)
        active = cont
    return L


def _final_gather(ig, scene, it, frame, params, wo, maps, sctx, dim):
    """BSDF-sampled final gather: radiance at the gather hit estimated from
    all three photon maps as diffuse exitance (the radiance-photon value,
    photon_map_integrator.dart:84-152 / ComputeRadianceTask)."""
    caustic_map, direct_map, indirect_map = maps
    geom = scene.geometry
    r = jnp.shape(it["t"])[0]
    eps = st.ray_epsilon(it["t"])
    acc = vm.v3zeros((r,))
    for g in range(ig.gather_samples):
        u_g = smp_mod.sample_2d(sctx["sampler"], sctx["px"], sctx["py"],
                                sctx["s_idx"], dim + g * 3)
        uc_g = smp_mod.sample_1d(sctx["sampler"], sctx["px"], sctx["py"],
                                 sctx["s_idx"], dim + g * 3 + 2)
        bs = bx.sample_f(params, frame, wo, u_g, uc_g,
                         flags=bx.ALL & ~bx.SPECULAR)
        ok = bs.valid & (bs.pdf > 0)
        ng_f = vm.face_forward(it["ng"], bs.wi)
        gray = vm.Rays(o=it["p"] + ng_f * eps, d=bs.wi,
                       tmin=jnp.zeros((r,), jnp.float32),
                       tmax=jnp.full((r,), jnp.inf, jnp.float32),
                       time=jnp.zeros((r,), jnp.float32))
        gh = st.intersect(geom, gray)
        git = st.interaction(geom, gray, gh)
        gframe = bx.make_frame(git["ns"], git["dpdu"], git["ng"])
        gparams = mat_mod.eval_params(scene.materials, git["mat_id"],
                                      scene.textures, git)
        lrad = vm.v3zeros((r,))
        for pm in (caustic_map, direct_map, indirect_map):
            lrad = lrad + density_radiance(pm, git["p"], gframe, gparams,
                                           git["wo"], ig.max_dist,
                                           diffuse_only=True)
        cos_g = vm.absdot(bs.wi, frame.n)
        w = jnp.where(ok & gh.hit,
                      cos_g / jnp.maximum(bs.pdf, 1e-20), 0.0)
        acc = acc + bs.f * lrad * w
    return acc * (1.0 / float(ig.gather_samples))
