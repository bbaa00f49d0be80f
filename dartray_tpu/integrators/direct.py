"""Direct-lighting surface integrator.

TPU-native replacement for lib/surface_integrators/
direct_lighting_integrator.dart:23-118 (the pipeline default): strategy
'all' (UniformSampleAllLights) or 'one' (UniformSampleOneLight), plus
specular reflection/transmission recursion to maxdepth.

Wavefront note: the reference recurses into BOTH SpecularReflect and
SpecularTransmit branches; a wavefront follows ONE stochastically-chosen
specular continuation per ray (weighted by the lobe-choice probability, which
keeps the estimator unbiased) — same expected value, slightly higher variance
on glass, no ray-count explosion.
"""
from __future__ import annotations

import dataclasses
from functools import partial

import jax
import jax.numpy as jnp

from .. import bsdf as bx
from .. import lights as lt_mod
from .. import materials as mat_mod
from .. import samplers as smp_mod
from ..accel import traverse
from ..core import math as vm
from ..core import spectrum as spec
from ..scene import types as st
from . import common

STRATEGY_ALL = 0
STRATEGY_ONE = 1


@partial(jax.tree_util.register_dataclass, data_fields=[],
         meta_fields=["strategy", "max_depth"])
@dataclasses.dataclass
class DirectLightingIntegrator:
    strategy: int = STRATEGY_ALL   # default 'all' (Appendix B)
    max_depth: int = 5


def li(ig: DirectLightingIntegrator, scene: st.CompiledScene, rays, diffs,
       sctx):
    geom = scene.geometry
    lt = scene.lights
    r = rays.n
    L = vm.v3zeros((r,))
    throughput = vm.v3ones((r,))
    active = jnp.ones((r,), bool)
    cur = rays
    dim = 5
    for depth in range(ig.max_depth + 1):
        hits = st.intersect(geom, cur)
        hit = hits.hit & active
        # escaped: env light Le
        if lt is not None and lt.env_light_index >= 0:
            L = L + vm.where3(active & ~hits.hit,
                              throughput * lt_mod.env_le(lt, cur.d), 0.0)
        it = st.interaction(geom, cur, hits,
                            diffs=diffs if depth == 0 else None)
        it["ns"] = mat_mod.bump_shading_normal(scene.materials, it["mat_id"],
                                               scene.textures, it)
        frame = bx.make_frame(it["ns"], it["dpdu"], it["ng"])
        # emitted radiance at the hit (area lights are visible)
        if lt is not None:
            le = lt_mod.le_emitted(lt, geom, hits.prim,
                                   it["wo"], it["ns"])
            L = L + vm.where3(hit, throughput * le, 0.0)
        params = mat_mod.eval_params(scene.materials, it["mat_id"],
                                     scene.textures, it)
        wo = it["wo"]
        if lt is not None and lt.n > 0:
            if ig.strategy == STRATEGY_ALL:
                ld = common.uniform_sample_all_lights(
                    scene, it, frame, params, wo, sctx, dim0=dim)
                dim += 6 * lt.n
            else:
                u_sel = smp_mod.sample_1d(sctx["sampler"], sctx["px"],
                                          sctx["py"], sctx["s_idx"], dim)
                u_l = smp_mod.sample_2d(sctx["sampler"], sctx["px"],
                                        sctx["py"], sctx["s_idx"], dim + 1)
                uc_l = smp_mod.sample_1d(sctx["sampler"], sctx["px"],
                                         sctx["py"], sctx["s_idx"], dim + 3)
                u_b = smp_mod.sample_2d(sctx["sampler"], sctx["px"],
                                        sctx["py"], sctx["s_idx"], dim + 4)
                uc_b = smp_mod.sample_1d(sctx["sampler"], sctx["px"],
                                         sctx["py"], sctx["s_idx"], dim + 6)
                dim += 7
                ld = common.uniform_sample_one_light(
                    scene, it, frame, params, wo, u_sel, u_l, uc_l, u_b, uc_b)
            L = L + vm.where3(hit, throughput * ld, 0.0)
        if depth == ig.max_depth:
            break
        # specular continuation (SpecularReflect/Transmit,
        # integrator.dart:187-290) — one stochastic branch per ray
        u_s = smp_mod.sample_2d(sctx["sampler"], sctx["px"], sctx["py"],
                                sctx["s_idx"], dim)
        uc_s = smp_mod.sample_1d(sctx["sampler"], sctx["px"], sctx["py"],
                                 sctx["s_idx"], dim + 2)
        dim += 3
        bs = bx.sample_f(params, frame, wo, u_s, uc_s,
                         flags=bx.SPECULAR | bx.REFLECTION | bx.TRANSMISSION)
        cos_s = vm.absdot(bs.wi, frame.n)
        cont = hit & bs.valid & (bs.pdf > 0.0) & spec.any_nonzero(bs.f)
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
