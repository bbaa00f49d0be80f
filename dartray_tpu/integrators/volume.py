"""Volume integrators: emission + single scattering.

TPU-native replacement for lib/volume_integrators/
(emission_integrator.dart:23 — ray-marched emission+absorption;
single_scatter_integrator.dart:23-140 — per-step transmittance, LD light
sampling, phase-weighted direct light; Appendix A.14 semantics). Fixed-trip
marching loops with jittered starts; transmittance() = exp(-tau) with
RNG-offset sampling (:26-43).
"""
from __future__ import annotations

import dataclasses
from functools import partial

import jax
import jax.numpy as jnp

from .. import lights as lt_mod
from .. import volumes as vol_mod
from ..accel import traverse
from ..core import math as vm
from ..scene import types as sct
from ..core import sampling as smp


@partial(jax.tree_util.register_dataclass, data_fields=[],
         meta_fields=["step_size", "n_steps"])
@dataclasses.dataclass
class EmissionIntegrator:
    step_size: float = 1.0     # Appendix B: stepsize 1.0
    n_steps: int = 32


@partial(jax.tree_util.register_dataclass, data_fields=[],
         meta_fields=["step_size", "n_steps"])
@dataclasses.dataclass
class SingleScatteringIntegrator:
    step_size: float = 1.0
    n_steps: int = 32


def transmittance(vol, rays, u_offset, n_steps=32):
    """T = exp(-tau) with jittered tau estimate (Appendix A.14). V3."""
    if vol is None:
        return vm.v3ones(jnp.shape(rays.tmin))
    t = vol_mod.tau(vol, rays, 1.0, u_offset, n_steps=n_steps)
    return t.map(lambda c: jnp.exp(-c))


def emission_li(ig: EmissionIntegrator, scene, rays, seg_tmax, sctx):
    """Lv = sum T(t_k) Lve(t_k) dt over [tmin, min(hit, tmax)]."""
    vol = scene.volume
    r = rays.n
    if vol is None:
        return (vm.v3zeros((r,)), vm.v3ones((r,)))
    seg = rays._replace(tmax=seg_tmax)
    t0, t1, hit = vol_mod.intersect_bounds(vol, seg)
    from .. import samplers as smp_mod
    u = smp_mod.sample_1d(sctx["sampler"], sctx["px"], sctx["py"],
                          sctx["s_idx"], 200)
    dt = jnp.maximum((t1 - t0) / ig.n_steps, 1e-8)

    def body(k, carry):
        tau_acc, lv = carry
        t = t0 + (k.astype(jnp.float32) + u) * dt
        p = seg.at(t)
        st = vol_mod.sigma_t(vol, p)
        tr_ = tau_acc.map(lambda c: jnp.exp(-c))
        lv = lv + tr_ * vol_mod.lve(vol, p) * dt
        return (tau_acc + st * dt, lv)

    tau_acc, lv = jax.lax.fori_loop(
        0, ig.n_steps, body, (vm.v3zeros((r,)), vm.v3zeros((r,))))
    T = tau_acc.map(lambda c: jnp.exp(-c))
    lv = vm.where3(hit, lv, 0.0)
    T = vm.where3(hit, T, 1.0)
    return lv, T


def single_scatter_li(ig: SingleScatteringIntegrator, scene, rays, seg_tmax,
                      sctx):
    """Single scattering with one light sample per step
    (single_scatter_integrator.dart:50-130)."""
    vol = scene.volume
    lt = scene.lights
    geom = scene.geometry
    r = rays.n
    if vol is None:
        return (vm.v3zeros((r,)), vm.v3ones((r,)))
    seg = rays._replace(tmax=seg_tmax)
    t0, t1, hit = vol_mod.intersect_bounds(vol, seg)
    from .. import samplers as smp_mod
    sd = lambda d: smp_mod.sample_1d(sctx["sampler"], sctx["px"],
                                     sctx["py"], sctx["s_idx"], d)
    sd2 = lambda d: smp_mod.sample_2d(sctx["sampler"], sctx["px"],
                                      sctx["py"], sctx["s_idx"], d)
    u0 = sd(210)
    dt = jnp.maximum((t1 - t0) / ig.n_steps, 1e-8)
    w = -seg.d

    def body(k, carry):
        tau_acc, lv = carry
        t = t0 + (k.astype(jnp.float32) + u0) * dt
        p = seg.at(t)
        st = vol_mod.sigma_t(vol, p)
        tr_ = tau_acc.map(lambda c: jnp.exp(-c))
        # emission
        lv = lv + tr_ * vol_mod.lve(vol, p) * dt
        # direct in-scattering: one light, one sample per step
        if lt is not None and lt.n > 0:
            ss = vol_mod.sigma_s(vol, p)
            u_sel = sd(211 + 7 * k)
            u_l = sd2(212 + 7 * k)
            light_idx = jnp.minimum((u_sel * lt.n).astype(jnp.int32),
                                    lt.n - 1)
            ls = lt_mod.sample_li(lt, geom, light_idx, p, u_l)
            sray = vm.Rays(o=p, d=ls.wi,
                           tmin=jnp.full((r,), 1e-4, jnp.float32),
                           tmax=ls.dist * (1 - 1e-3),
                           time=seg.time)
            occ = sct.intersect_p(geom, sray)
            tr_l = transmittance(vol, sray, sd(215 + 7 * k), n_steps=8)
            ph = vol_mod.phase(vol, p, w, ls.wi)
            contrib = (ss * tr_l * ls.li
                       * (ph * float(lt.n) / jnp.maximum(ls.pdf, 1e-20)))
            lv = lv + tr_ * vm.where3(occ, 0.0, contrib) * dt
        return (tau_acc + st * dt, lv)

    tau_acc, lv = jax.lax.fori_loop(
        0, ig.n_steps, body, (vm.v3zeros((r,)), vm.v3zeros((r,))))
    T = tau_acc.map(lambda c: jnp.exp(-c))
    lv = vm.where3(hit, lv, 0.0)
    T = vm.where3(hit, T, 1.0)
    return lv, T
