"""Differentiable rendering: gradients of the film w.r.t. scene parameters.

This has no counterpart in the reference (DartRay/PBRT-v2 is forward-only);
it is the framework's differentiator (BASELINE.md metric #2, SURVEY §7 item
8). Design — the *detached-sampling* estimator:

* Traversal/visibility is a gradient boundary (scene/types.py `_detach`):
  hit records carry no derivative, so geometry-edge (silhouette) gradients
  are NOT captured — interior derivatives only. Reparameterized edge
  sampling is future work.
* Sampling decisions (BSDF lobe choice, sampled directions, light picks,
  Russian-roulette survival) are differentiated *as if fixed*: gradients flow
  through the f/pdf/Le evaluations at the sampled points. Unbiased for
  parameters that scale radiance (albedo kd/ks/kr/kt, light emission,
  texture values); biased-but-useful for parameters that also steer sampling
  (roughness), exactly like detached-mode Mitsuba 3.
* The counter-based samplers are deterministic in (pixel, sample idx, dim),
  so finite differences with common random numbers are a sharp oracle for
  the scale-type parameters above (tests/test_grad.py).

Typical use::

    theta, inject = grad.select(scene, ["materials.kd", "lights.intensity"])
    loss = lambda img: ((img - target) ** 2).mean()
    val, grads = grad.render_loss_grad(scene, cam, smp, li_fn, W, H,
                                       theta, inject, loss)
"""
from __future__ import annotations

import dataclasses
from functools import partial
from typing import Callable, Dict, List, Tuple

import numpy as np
import jax
import jax.numpy as jnp

from . import film as film_mod
from . import samplers as smp_mod
from .renderers import sampler as rend


def _get_path(obj, path: str):
    cur = obj
    for part in path.split("."):
        cur = getattr(cur, part)
    return cur


def _set_path(obj, path: str, value):
    """Functional deep-set through nested frozen dataclasses."""
    parts = path.split(".")
    if len(parts) == 1:
        return dataclasses.replace(obj, **{parts[0]: value})
    child = getattr(obj, parts[0])
    new_child = _set_path(child, ".".join(parts[1:]), value)
    return dataclasses.replace(obj, **{parts[0]: new_child})


def select(scene, paths: List[str]) -> Tuple[Dict[str, jnp.ndarray],
                                             Callable]:
    """Extract a {path: array} theta dict + an inject(scene, theta) closure.

    Paths are dotted attribute paths into the CompiledScene pytree, e.g.
    "materials.kd", "lights.intensity", "textures.const_values"."""
    theta = {p: _get_path(scene, p) for p in paths}

    def inject(scene, theta):
        for p, v in theta.items():
            scene = _set_path(scene, p, v)
        return scene

    return theta, inject


def render_image(scene, camera, sampler, li_fn, width, height,
                 spp: int | None = None):
    """Differentiable full render -> (H, W, 3) linear RGB.

    The spp loop is a `lax.scan` with each wave under `jax.checkpoint`:
    under reverse-mode AD the backward sweep RECOMPUTES each wave's
    activations instead of storing spp full tapes, so differentiable-render
    memory is O(1) in spp (VERDICT r3 #7; pair with PathIntegrator's
    per-bounce remat for O(1) in depth too). Program size is O(1) in spp
    (one traced wave) — compile time no longer scales with sample count."""
    spp = spp or sampler.spp
    from .scene import types as st
    scene = st.to_device(scene)   # numpy-leaved scenes -> device once
    film = film_mod.make_film(width, height)
    px, py = rend.pixel_grid(width, height)

    @jax.checkpoint
    def wave(film, s):
        s_idx = jnp.full(px.shape, s, jnp.int32)
        film = rend.render_wave(scene, camera, sampler, film, px, py, s_idx,
                                li_fn=li_fn, width=width, height=height,
                                spp=spp)
        return film, None

    film, _ = jax.lax.scan(wave, film, jnp.arange(spp, dtype=jnp.int32))
    return film_mod.to_rgb(film)


def _grad_compiler_options():
    """On TPU backends, raise XLA's scoped-VMEM budget for gradient jits.

    The backward sweep of the remat'd wave recomputes several traversal
    Pallas calls whose scoped-VMEM stacks (scene residency + ray planes,
    ~6.5 MB each) the scheduler is free to overlap; with the default 16 MB
    limit the grad executable fails AOT compile (measured round 5 on v5e:
    26.2 MB requested). 64 MB is well inside the chip's 128 MB VMEM and
    only applies to gradient executables — the forward render keeps the
    default limit (its chunked dispatch was tuned against it)."""
    if jax.default_backend() in ("tpu", "axon"):
        return {"xla_tpu_scoped_vmem_limit_kib": 65536}
    return None


def render_loss_grad(scene, camera, sampler, li_fn, width, height,
                     theta, inject, loss_fn, spp: int | None = None):
    """(loss, d loss / d theta) with the detached estimator.

    theta/inject from `select`. loss_fn: (H,W,3) image -> scalar."""

    def run(theta):
        s = inject(scene, theta)
        img = render_image(s, camera, sampler, li_fn, width, height, spp=spp)
        return loss_fn(img)

    grad_fn = jax.jit(jax.value_and_grad(run),
                      compiler_options=_grad_compiler_options())
    return grad_fn(theta)


def render_pixel_jacobian_sum(scene, camera, sampler, li_fn, width, height,
                              theta, inject, spp: int | None = None):
    """Gradient of the film MEAN w.r.t. theta — the 'pixel gradient' probe
    used by the finite-difference correctness tests."""
    return render_loss_grad(scene, camera, sampler, li_fn, width, height,
                            theta, inject, lambda img: img.mean(), spp=spp)


def finite_difference(scene, camera, sampler, li_fn, width, height,
                      theta, inject, loss_fn, eps: float = 1e-3,
                      spp: int | None = None):
    """Central finite differences with common random numbers (the samplers
    are deterministic), one render pair per scalar component. Test oracle —
    O(2 * n_params) renders."""
    @jax.jit
    def run(theta):
        s = inject(scene, theta)
        img = render_image(s, camera, sampler, li_fn, width, height, spp=spp)
        return loss_fn(img)

    grads = {}
    for p, v in theta.items():
        v = np.asarray(v, np.float64)
        g = np.zeros_like(v)
        it = np.nditer(v, flags=["multi_index"])
        while not it.finished:
            idx = it.multi_index
            vp = v.copy()
            vp[idx] += eps
            vm_ = v.copy()
            vm_[idx] -= eps
            tp = dict(theta)
            tp[p] = jnp.asarray(vp, jnp.float32)
            tm = dict(theta)
            tm[p] = jnp.asarray(vm_, jnp.float32)
            g[idx] = (float(run(tp)) - float(run(tm))) / (2 * eps)
            it.iternext()
        grads[p] = g
    return grads
