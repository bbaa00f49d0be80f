"""Whitted surface integrator.

TPU-native replacement for lib/surface_integrators/whitted_integrator.dart
(classic Whitted ray tracing): at each hit, sample EVERY light with a single
unshadowed-tested sample (no MIS — f * Li * |cos| / pdf), then follow
specular reflection/transmission to maxdepth (default 5, Appendix B).

Wavefront form mirrors integrators/direct.py: a static depth loop over the
whole ray wave, masked lanes, one stochastically-chosen specular continuation
per ray (unbiased; see direct.py's wavefront note).
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


@partial(jax.tree_util.register_dataclass, data_fields=[],
         meta_fields=["max_depth"])
@dataclasses.dataclass
class WhittedIntegrator:
    max_depth: int = 5


def li(ig: WhittedIntegrator, scene: st.CompiledScene, rays, diffs, sctx):
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
        if lt is not None and lt.env_light_index >= 0:
            L = L + vm.where3(active & ~hits.hit,
                              throughput * lt_mod.env_le(lt, cur.d), 0.0)
        it = st.interaction(geom, cur, hits,
                            diffs=diffs if depth == 0 else None)
        it["ns"] = mat_mod.bump_shading_normal(scene.materials, it["mat_id"],
                                               scene.textures, it)
        frame = bx.make_frame(it["ns"], it["dpdu"], it["ng"])
        if lt is not None:
            le = lt_mod.le_emitted(lt, geom, hits.prim, it["wo"], it["ns"])
            L = L + vm.where3(hit, throughput * le, 0.0)
        params = mat_mod.eval_params(scene.materials, it["mat_id"],
                                     scene.textures, it)
        wo = it["wo"]
        # all lights, one sample each, no MIS (whitted_integrator.dart:40-66)
        if lt is not None and lt.n > 0:
            eps = st.ray_epsilon(it["t"])
            for li_idx in range(lt.n):
                u_l = smp_mod.sample_2d(sctx["sampler"], sctx["px"],
                                        sctx["py"], sctx["s_idx"], dim)
                uc_l = smp_mod.sample_1d(sctx["sampler"], sctx["px"],
                                         sctx["py"], sctx["s_idx"], dim + 2)
                dim += 3
                idx = jnp.full((r,), li_idx, jnp.int32)
                ls = lt_mod.sample_li(lt, geom, idx, it["p"], u_l, uc_l)
                f_l = bx.f(params, frame, wo, ls.wi,
                           bx.ALL & ~bx.SPECULAR)
                cos_l = vm.absdot(ls.wi, frame.n)
                usable = (ls.pdf > 0.0) & spec.any_nonzero(ls.li) \
                    & spec.any_nonzero(f_l)
                sray = common.shadow_ray(it["p"], it["ng"], frame.n, ls.wi,
                                         ls.dist, eps)
                occluded = st.intersect_p(geom, sray)
                contrib = f_l * ls.li * (cos_l
                                         / jnp.maximum(ls.pdf, 1e-20))
                L = L + vm.where3(hit & usable & ~occluded,
                                  throughput * contrib, 0.0)
        if depth == ig.max_depth:
            break
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
