"""Path-tracing surface integrator (the headline benchmark integrator).

TPU-native replacement for lib/surface_integrators/path_integrator.dart:26-151
(Appendix A.4 semantics): iterative bounce loop; emitted light added only at
bounce 0 or after a specular bounce; one-light NEE with MIS each bounce
(UniformSampleOneLight x nLights); Russian roulette after bounce 3 with
continueProb = min(0.5, throughput.luminance()); hard stop at maxdepth
(default 5). The recursion becomes a static bounce loop over the wavefront
with an active mask — SoA state is O(1) per ray (throughput/ray/flags).
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

SAMPLE_DEPTH = 3  # structured sample dims for first bounces (:124-131)


@partial(jax.tree_util.register_dataclass, data_fields=[],
         meta_fields=["max_depth", "rr_depth", "remat"])
@dataclasses.dataclass
class PathIntegrator:
    max_depth: int = 5
    rr_depth: int = 3
    # rematerialize each bounce under reverse-mode AD: activations of the
    # bounce body are recomputed in the backward sweep instead of stored,
    # so differentiable-render memory is O(1) in depth (VERDICT r3 #7).
    # None = auto: remat on for max_depth > 3 (forward-only cost is zero;
    # checkpoint only changes the AD tape).
    remat: bool = None


def li(ig: PathIntegrator, scene: st.CompiledScene, rays, diffs, sctx,
       skip_direct: bool = False):
    """Wavefront path tracer, single-BSDF-sample MIS formulation.

    Estimator restructure vs path_integrator.dart:44-119 (which calls
    EstimateDirect with its OWN BSDF sample each bounce, i.e. 3 traversals
    per bounce): here the path-extension ray doubles as the MIS BSDF-sample
    ray — emitter hits on it are weighted by power-heuristic against the NEE
    pdf (common.emitter_hit_mis), and NEE traces only the shadow ray
    (common.nee_one_light). 2 traversals per bounce, statistically the same
    MIS estimator. Dead lanes carry tmax < tmin so the sorted Pallas
    traversal skips them (compaction without gathers).

    skip_direct: omit camera-vertex direct light (bounce-0 Le and the first
    vertex's direct illumination, whether sampled by NEE or by the extension
    ray) — the Metropolis renderer's dodirectseparately split
    (metropolis_renderer.dart:86-109); specular-prefix paths remain."""
    geom = scene.geometry
    lt = scene.lights
    r = rays.n
    L = vm.v3zeros((r,))
    throughput = vm.v3ones((r,))
    active = jnp.ones((r,), bool)
    specular_bounce = jnp.zeros((r,), bool)
    prev_pdf = jnp.zeros((r,), jnp.float32)

    # bounce 0 extension = the camera wave (already Morton-coherent: no
    # sort); every later bounce's extension ray is traced MERGED with the
    # current bounce's NEE shadow ray in one 2R-lane mixed launch
    # (st.intersect_pair) — one coherence sort + one chunked dispatch per
    # bounce instead of two (VERDICT r5 #1a)
    hits0 = st.intersect(geom, rays, sort=False)

    def bounce_body(carry, bounce):
        L, throughput, active, specular_bounce, prev_pdf, cur, hits = carry
        dim = 5 + bounce * 10
        hit = hits.hit & active
        it = st.interaction(geom, cur, hits,
                            diffs=diffs if bounce == 0 else None)
        it["ns"] = mat_mod.bump_shading_normal(scene.materials, it["mat_id"],
                                               scene.textures, it)
        frame = bx.make_frame(it["ns"], it["dpdu"], it["ng"])
        # emitted light gathered by the extension ray (MIS weighted)
        if lt is not None:
            first = bounce == 0
            le_w = common.emitter_hit_mis(scene, cur, hits, it, prev_pdf,
                                          specular_bounce, first)
            if skip_direct and bounce == 0:
                gate = jnp.zeros((r,), bool)
            elif skip_direct and bounce == 1:
                gate = active & specular_bounce
            else:
                gate = active
            L = L + vm.where3(gate, throughput * le_w, 0.0)
        params = mat_mod.eval_params(scene.materials, it["mat_id"],
                                     scene.textures, it)
        wo = it["wo"]
        sd = lambda d: smp_mod.sample_1d(sctx["sampler"], sctx["px"],
                                         sctx["py"], sctx["s_idx"], d)
        sd2 = lambda d: smp_mod.sample_2d(sctx["sampler"], sctx["px"],
                                          sctx["py"], sctx["s_idx"], d)
        # NEE shade half: one light, shadow ray built but not yet traced
        # (MIS partner is the extension ray)
        do_nee = (lt is not None and lt.n > 0
                  and not (skip_direct and bounce == 0))
        if do_nee:
            sray, usable, contrib = common.nee_prepare(
                scene, it, frame, params, wo, sd(dim), sd2(dim + 1),
                sd(dim + 3), mask=hit)
        last = bounce == ig.max_depth
        if not last:
            # BSDF sampling for the next ray (also the MIS light-hit sample)
            bs = bx.sample_f(params, frame, wo, sd2(dim + 7), sd(dim + 9),
                             flags=bx.ALL)
            cos_s = vm.absdot(bs.wi, frame.n)
            cont = hit & bs.valid & (bs.pdf > 0.0) & spec.any_nonzero(bs.f)
            new_tp = throughput * bs.f * (cos_s / jnp.maximum(bs.pdf, 1e-20))
            # Russian roulette (path_integrator.dart:93-99)
            if bounce > ig.rr_depth:
                u_rr = sd(dim + 8)
                cprob = jnp.minimum(0.5, spec.luminance(new_tp))
                survive = u_rr <= cprob
                new_tp = new_tp * (1.0 / jnp.maximum(cprob, 1e-8))
                cont = cont & survive
            eps = st.ray_epsilon(it["t"])
            ng_f = vm.face_forward(it["ng"], bs.wi)
            next_ray = vm.Rays(o=it["p"] + ng_f * eps, d=bs.wi,
                               tmin=jnp.zeros((r,), jnp.float32),
                               tmax=jnp.where(cont, jnp.inf, -1.0),
                               time=cur.time)
        # the merged traversal: extension closest-hit + shadow any-hit
        if do_nee and not last:
            hits_next, occluded = st.intersect_pair(geom, next_ray, sray)
        elif do_nee:
            occluded = st.intersect_p(geom, sray)
            hits_next = hits
        elif not last:
            hits_next = st.intersect(geom, next_ray)
            occluded = None
        if do_nee:
            # NEE contribution uses the PRE-update throughput
            L = L + vm.where3(usable & ~occluded, throughput * contrib, 0.0)
        if last:
            return (L, throughput, active, specular_bounce, prev_pdf, cur,
                    hits)
        throughput = vm.where3(cont, new_tp, throughput)
        specular_bounce = (bs.flags & bx.SPECULAR) != 0
        prev_pdf = bs.pdf
        return (L, throughput, cont, specular_bounce, prev_pdf, next_ray,
                hits_next)

    carry = (L, throughput, active, specular_bounce, prev_pdf, rays, hits0)
    use_remat = ig.remat if ig.remat is not None else (ig.max_depth > 3)
    for bounce in range(ig.max_depth + 1):
        body = partial(bounce_body, bounce=bounce)
        if use_remat:
            # recompute this bounce's activations in the backward sweep
            # instead of storing them: grad memory O(1) in path depth
            body = jax.checkpoint(body)
        carry = body(carry)
    return carry[0]
