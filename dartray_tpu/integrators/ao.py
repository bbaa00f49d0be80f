"""Ambient-occlusion surface integrator.

TPU-native replacement for lib/surface_integrators/
ambient_occlusion_integrator.dart:24-59: per hit point, N (0,2)-sequence
sphere samples flipped into the normal hemisphere, occlusion probes limited
to [minDist, maxDist], returning nClear/nSamples. Probes run as full shadow
wavefronts (R rays each) inside a fori_loop.
"""
from __future__ import annotations

import dataclasses
from functools import partial

import jax
import jax.numpy as jnp

from ..accel import traverse
from ..core import math as vm
from ..core import sampling as smp
from ..scene import types as st

U32 = jnp.uint32


@partial(jax.tree_util.register_dataclass, data_fields=[],
         meta_fields=["n_samples", "min_dist", "max_dist"])
@dataclasses.dataclass
class AOIntegrator:
    # defaults: nsamples 2048 (pow2-rounded), mindist 1e-4, maxdist inf
    # (ambient_occlusion_integrator.dart:55-60)
    n_samples: int = 2048
    min_dist: float = 1e-4
    max_dist: float = float("inf")


def li(ig: AOIntegrator, scene: st.CompiledScene, rays, diffs, sctx):
    geom = scene.geometry
    hits = st.intersect(geom, rays)
    it = st.interaction(geom, rays, hits)
    hit = hits.hit
    n = vm.face_forward(it["ns"], it["wo"])
    p = it["p"]
    r = rays.n
    # per-(pixel, camera-sample) scramble, matching the reference's per-Li
    # rng.randomUint() scrambles driving Sample02
    base = smp.hash_u32(sctx["px"].astype(U32)
                        ^ (sctx["py"].astype(U32) << 16)
                        ^ smp.hash_u32(sctx["s_idx"].astype(U32)))
    scr = (smp.hash_u32(base ^ U32(0x1234567)),
           smp.hash_u32(base ^ U32(0x89abcdef)))
    eps = st.ray_epsilon(it["t"])
    # offset on the probe-hemisphere side of the surface (ng may face away
    # from the shading hemisphere for back-lit/unoriented geometry)
    ng_f = vm.face_forward(it["ng"], n)
    o = p + ng_f * eps

    def body(i, n_clear):
        u = smp.sample02(jnp.full((r,), i, U32), scr)
        w = smp.uniform_sample_sphere(u)
        w = vm.face_forward(w, n)
        probe = vm.Rays(o=o, d=w,
                        tmin=jnp.full((r,), ig.min_dist, jnp.float32),
                        tmax=jnp.full((r,), ig.max_dist, jnp.float32),
                        time=rays.time)
        occ = st.intersect_p(geom, probe)
        return n_clear + jnp.where(hit & ~occ, 1.0, 0.0)

    n_clear = jax.lax.fori_loop(0, ig.n_samples, body,
                                jnp.zeros((r,), jnp.float32))
    ao = n_clear / ig.n_samples
    return vm.where3(hit, vm.V3(ao, ao, ao), 0.0)
