"""Irradiance caching surface integrator.

TPU-native replacement for lib/surface_integrators/
irradiance_cache_integrator.dart:23-406: the reference lazily inserts
octree-cached hemispherical irradiance samples during rendering
(IrradProcess :360) after an IrradiancePrimeTask pre-pass (:325). Lazy
insertion is inherently sequential, so the TPU redesign makes the prime pass
the *only* producer: a strided primary-ray wave computes irradiance samples
(cosine-weighted hemisphere MC with occlusion-aware incident radiance),
stored in a sorted hash grid; the render pass interpolates with the
reference's error weight w = 1/(|p-pi|/d_i + sqrt(1 - n.ni)) and minWeight
threshold, falling back to a small per-pixel hemisphere MC where the cache
has no coverage (the reference would insert a new sample there).

Defaults per Appendix B: minweight 0.5, maxangle 10 deg, nsamples 4096.
"""
from __future__ import annotations

import dataclasses
from functools import partial

import numpy as np
import jax
import jax.numpy as jnp

from .. import bsdf as bx
from .. import lights as lt_mod
from .. import materials as mat_mod
from .. import samplers as smp_mod
from ..core import math as vm
from ..core import sampling as smp
from ..scene import types as st
from . import common

INV_PI = float(1.0 / np.pi)
MAX_SCAN = 32


@partial(jax.tree_util.register_dataclass, data_fields=[],
         meta_fields=["min_weight", "max_angle_deg", "n_samples",
                      "max_depth", "fallback_samples", "prime_stride",
                      "spacing"])
@dataclasses.dataclass
class IrradianceCacheIntegrator:
    min_weight: float = 0.5
    max_angle_deg: float = 10.0
    n_samples: int = 4096
    max_depth: int = 5
    fallback_samples: int = 16
    prime_stride: int = 8       # prime-pass pixel stride
    spacing: float = 0.0        # world-space gather radius (0 = auto)


@partial(jax.tree_util.register_dataclass,
         data_fields=["p", "n", "E", "dmean", "cell"],
         meta_fields=["cell_size", "count"])
@dataclasses.dataclass
class IrradianceCache:
    p: jnp.ndarray      # (P, 3)
    n: jnp.ndarray      # (P, 3)
    E: jnp.ndarray      # (P, 3)
    dmean: jnp.ndarray  # (P,) harmonic-mean hit distance
    cell: jnp.ndarray   # (P,) sorted hash ids
    cell_size: float
    count: int


def _hash_cells(ip):
    h = (ip[..., 0] * np.int32(73856093)
         ^ ip[..., 1] * np.int32(19349663)
         ^ ip[..., 2] * np.int32(83492791))
    return (h & np.int32(0x7fffffff)).astype(jnp.int32)


def _hash_cells3(ix, iy, iz):
    h = (ix * np.int32(73856093) ^ iy * np.int32(19349663)
         ^ iz * np.int32(83492791))
    return (h & np.int32(0x7fffffff)).astype(jnp.int32)


_NEIGHBORS = np.array([(i, j, k) for i in (-1, 0, 1) for j in (-1, 0, 1)
                       for k in (-1, 0, 1)], np.int32)


def _hemisphere_E(scene, p, n_vec, ng, t_hit, n_samples, seed, max_dist):
    """Cosine-weighted MC irradiance at points p with incident radiance
    from env/emissive hits (IrradProcess hemisphere sampling). Also returns
    the harmonic-mean hit distance."""
    geom = scene.geometry
    lt = scene.lights
    p = vm.from_arr(p)
    n_vec = vm.from_arr(n_vec)
    r = jnp.shape(p.x)[0]
    eps = st.ray_epsilon(t_hit)
    t1, t2 = vm.coordinate_system(n_vec)
    scr_np = np.random.default_rng(seed).integers(
        0, 2 ** 32, 2, dtype=np.uint32)
    scr = (jnp.uint32(int(scr_np[0])), jnp.uint32(int(scr_np[1])))

    def body(i, carry):
        E, inv_d_sum = carry
        u = smp.sample02(jnp.uint32(i), scr)
        d_loc = smp.cosine_sample_hemisphere(u)          # scalar shared dir
        wi = vm.normalize(t1 * d_loc.x + t2 * d_loc.y + n_vec * d_loc.z)
        rays = vm.Rays(o=p + vm.face_forward(ng, wi) * eps, d=wi,
                       tmin=jnp.zeros((r,), jnp.float32),
                       tmax=jnp.full((r,), jnp.inf, jnp.float32),
                       time=jnp.zeros((r,), jnp.float32))
        hits = st.intersect(geom, rays)
        it = st.interaction(geom, rays, hits)
        li_v = vm.v3zeros((r,))
        if lt is not None:
            le = lt_mod.le_emitted(lt, geom, hits.prim, it["wo"], it["ns"])
            li_v = vm.where3(hits.hit, le, li_v)
            if lt.env_light_index >= 0:
                li_v = vm.where3(hits.hit, li_v, lt_mod.env_le(lt, wi))
        # cosine-sampled: E += Li * cos / pdf = Li * pi
        E = E + li_v * np.pi
        inv_d = jnp.where(hits.hit, 1.0 / jnp.maximum(hits.t, 1e-6),
                          1.0 / max_dist)
        return (E, inv_d_sum + inv_d)

    E, inv_d_sum = jax.lax.fori_loop(0, n_samples, body,
                                     (vm.v3zeros((r,)),
                                      jnp.zeros((r,), jnp.float32)))
    E = E * (1.0 / n_samples)
    dmean = n_samples / jnp.maximum(inv_d_sum, 1e-9)
    return E, jnp.minimum(dmean, max_dist)


def build_cache(ig: IrradianceCacheIntegrator, scene, camera, width, height,
                seed: int = 5) -> IrradianceCache:
    """Prime pass (IrradiancePrimeTask): strided primary rays -> irradiance
    samples at their hit points."""
    from ..scene import types as _st
    scene = _st.to_device(scene)
    from .. import cameras as cam_mod
    from ..renderers import sampler as rend

    geom = scene.geometry
    wb = np.asarray(geom.world_bound)
    diag = float(np.linalg.norm(wb[1] - wb[0]))
    max_dist = diag
    stride = ig.prime_stride
    xs = np.arange(stride // 2, width, stride, dtype=np.int32)
    ys = np.arange(stride // 2, height, stride, dtype=np.int32)
    gx, gy = np.meshgrid(xs, ys, indexing="xy")
    px = jnp.asarray(gx.reshape(-1))
    py = jnp.asarray(gy.reshape(-1))
    smp_s = smp_mod.make_sampler("lowdiscrepancy", spp=1, seed=seed)
    s_idx = jnp.zeros(px.shape, jnp.int32)
    cs = smp_mod.camera_samples(smp_s, px, py, s_idx)
    rays, _, _ = cam_mod.generate_rays(camera, cs, width, height, 1.0)
    hits = st.intersect(geom, rays)
    it = st.interaction(geom, rays, hits)
    ns_v = vm.face_forward(it["ns"], it["wo"])
    E, dmean = _hemisphere_E(scene, it["p"], ns_v, it["ng"], it["t"],
                             ig.n_samples, seed, max_dist)
    keep = np.asarray(hits.hit)
    p_np = np.asarray(vm.to_arr(it["p"]))[keep]
    n_np = np.asarray(vm.to_arr(ns_v))[keep]
    E_np = np.asarray(vm.to_arr(E))[keep]
    d_np = np.asarray(dmean)[keep]
    if p_np.shape[0] == 0:
        p_np = np.full((1, 3), 1e30, np.float32)
        n_np = np.zeros((1, 3), np.float32)
        E_np = np.zeros((1, 3), np.float32)
        d_np = np.ones((1,), np.float32)
    cell_size = ig.spacing if ig.spacing > 0 else diag / 16.0
    ip = np.floor(p_np / cell_size).astype(np.int32)
    cell = np.asarray(_hash_cells(jnp.asarray(ip)))
    order = np.argsort(cell)
    return IrradianceCache(
        p=jnp.asarray(p_np[order]), n=jnp.asarray(n_np[order]),
        E=jnp.asarray(E_np[order]), dmean=jnp.asarray(d_np[order]),
        cell=jnp.asarray(cell[order]), cell_size=float(cell_size),
        count=int(p_np.shape[0]))


def interpolate(cache: IrradianceCache, ig: IrradianceCacheIntegrator,
                q, nq):
    """Weighted interpolation (IrradProcess.successful/getIrradiance):
    returns (E, weight_sum). q/nq: V3."""
    q = vm.from_arr(q)
    nq = vm.from_arr(nq)
    cl = lambda c: jnp.floor(c / cache.cell_size).astype(jnp.int32)
    iqx, iqy, iqz = cl(q.x), cl(q.y), cl(q.z)
    r = jnp.shape(q.x)[0]
    cos_max = float(np.cos(np.radians(ig.max_angle_deg)))
    E_acc = vm.v3zeros((r,))
    w_acc = jnp.zeros((r,), jnp.float32)
    cp = vm.from_arr(cache.p)
    cn = vm.from_arr(cache.n)
    cE = vm.from_arr(cache.E)
    for off in _NEIGHBORS:
        hid = _hash_cells3(iqx + int(off[0]), iqy + int(off[1]),
                           iqz + int(off[2]))
        lo = jnp.searchsorted(cache.cell, hid, side="left")
        hi = jnp.searchsorted(cache.cell, hid, side="right")
        hi = jnp.minimum(hi, lo + MAX_SCAN)

        def body(k, carry):
            E_a, w_a = carry
            idx = jnp.minimum(lo + k, cache.count - 1)
            valid = (lo + k) < hi
            pi = vm.gather3(cp, idx)
            ni = vm.gather3(cn, idx)
            Ei = vm.gather3(cE, idx)
            di = cache.dmean[idx]
            perr = vm.length(q - pi) / jnp.maximum(di, 1e-6)
            ndot = vm.dot(nq, ni)
            nerr = jnp.sqrt(jnp.maximum(1.0 - ndot, 0.0) /
                            max(1.0 - cos_max, 1e-6))
            w = 1.0 / jnp.maximum(perr + nerr, 1e-6)
            ok = valid & (w > ig.min_weight) & (ndot > 0.0)
            w = jnp.where(ok, w, 0.0)
            return (E_a + Ei * w, w_a + w)

        E_acc, w_acc = jax.lax.fori_loop(0, MAX_SCAN, body, (E_acc, w_acc))
    E = E_acc * (1.0 / jnp.maximum(w_acc, 1e-9))
    return E, w_acc


def li(ig: IrradianceCacheIntegrator, scene: st.CompiledScene, rays, diffs,
       sctx, cache: IrradianceCache):
    """direct lighting (MIS) + cached-irradiance diffuse indirect +
    fallback hemisphere MC where uncovered."""
    geom = scene.geometry
    lt = scene.lights
    r = rays.n
    hits = st.intersect(geom, rays)
    hit = hits.hit
    L = vm.v3zeros((r,))
    if lt is not None and lt.env_light_index >= 0:
        L = L + vm.where3(hit, 0.0, lt_mod.env_le(lt, rays.d))
    it = st.interaction(geom, rays, hits)
    ns_v = vm.face_forward(it["ns"], it["wo"])
    frame = bx.make_frame(ns_v, it["dpdu"], it["ng"])
    params = mat_mod.eval_params(scene.materials, it["mat_id"],
                                 scene.textures, it)
    wo = it["wo"]
    if lt is not None:
        le = lt_mod.le_emitted(lt, geom, hits.prim, wo, it["ns"])
        L = L + vm.where3(hit, le, 0.0)
    if lt is not None and lt.n > 0:
        sd = lambda d: smp_mod.sample_1d(sctx["sampler"], sctx["px"],
                                         sctx["py"], sctx["s_idx"], d)
        sd2 = lambda d: smp_mod.sample_2d(sctx["sampler"], sctx["px"],
                                          sctx["py"], sctx["s_idx"], d)
        ld = common.uniform_sample_one_light(
            scene, it, frame, params, wo, sd(5), sd2(6), sd(8), sd2(9),
            sd(11))
        L = L + vm.where3(hit, ld, 0.0)
    E, w_sum = interpolate(cache, ig, it["p"], ns_v)
    covered = w_sum > 0.0
    E_fb, _ = _hemisphere_E(scene, it["p"], ns_v, it["ng"], it["t"],
                            ig.fallback_samples, 17,
                            cache.cell_size * 16.0)
    E = vm.where3(covered, E, E_fb)
    L = L + vm.where3(hit, params.kd * E * INV_PI, 0.0)
    return L
