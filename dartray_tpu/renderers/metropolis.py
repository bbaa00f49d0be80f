"""Metropolis light transport renderer (wavefront PSSMLT).

TPU-native replacement for lib/renderers/metropolis_renderer.dart:45-940.
The reference runs bidirectional MLT with explicit _MLTSample path-vertex
mutations on a single host thread; the TPU-native reformulation is
**primary-sample-space MLT** (Kelemen et al.) over THOUSANDS of parallel
Markov chains — each chain is one wavefront lane, its state a vector of
primary samples u in [0,1)^D that drives the ordinary path integrator
through samplers.vector_sampler. Same renderer contract as the reference:

- bootstrap phase estimating the normalization b (metropolis_renderer.dart
  :111-150) and resampling chain seeds ~ I;
- large-step / small-step mutations with `largestepprobability` (:664);
- Metropolis accept/reject with expected-value splatting of BOTH states
  into the additive splat film (image_film.dart:187-245);
- optional separate direct-lighting pass (`dodirectseparately`, :86-109) —
  the MLT pass then measures the path suffix only (indirect transport);
- maxconsecutiverejects forcing (:664-674 defaults).

Mutation transitions are exactly measure-preserving on [0,1): small steps
use the reference-style exponential kernel wrapped modulo 1.
"""
from __future__ import annotations

from functools import partial

import numpy as np
import jax
import jax.numpy as jnp

from .. import cameras as cam_mod
from .. import film as film_mod
from .. import samplers as smp_mod
from ..core import sampling as smp
from ..core import spectrum as spec
from ..integrators import path as pi


def _mutate_small(u, r1, r2):
    """Exponential small-step kernel (MutateValue,
    metropolis_renderer.dart small-step), wrapped to [0,1)."""
    s1, s2 = 1.0 / 1024.0, 1.0 / 64.0
    log_ratio = -np.log(s2 / s1)
    delta = s2 * jnp.exp(log_ratio * r1)
    new_u = jnp.where(r2 < 0.5, u + delta, u - delta)
    return new_u - jnp.floor(new_u)


def _radiance_for(scene, camera, width, height, li_fn, u, max_depth):
    """Path radiance driven by the primary-sample vector u (R, D).

    Dims 0,1 = continuous image position over the full film; 2,3 lens;
    4 time; >=5 integrator (path.li's dim convention)."""
    from ..core import math as vm
    r = u.shape[0]
    img_x = u[:, 0] * width
    img_y = u[:, 1] * height
    px = jnp.clip(img_x.astype(jnp.int32), 0, width - 1)
    py = jnp.clip(img_y.astype(jnp.int32), 0, height - 1)
    image_xy = vm.V2(img_x, img_y)
    cs = cam_mod.CameraSamples(image_xy=image_xy,
                               lens_uv=vm.V2(u[:, 2], u[:, 3]),
                               time_u=u[:, 4])
    rays, diffs, weight = cam_mod.generate_rays(camera, cs, width, height,
                                                1.0)
    vs = smp_mod.vector_sampler(u)
    sctx = {"sampler": vs, "px": px, "py": py,
            "s_idx": jnp.zeros((r,), jnp.int32)}
    L = li_fn(scene, rays, diffs, sctx)
    L = L.map(lambda c: jnp.where(jnp.isfinite(c), c, 0.0)) * weight
    return L, image_xy


def render(scene, camera, width, height, spp=100, n_chains=8192,
           n_bootstrap=4096, large_step_prob=0.25, max_depth=7,
           max_consecutive_rejects=512, do_direct_separately=True,
           direct_spp=4, seed=0, progress=None, bidirectional=True):
    """Full MLT render -> (H, W, 3) linear RGB.

    spp = mutations per pixel (`samplesperpixel`, Appendix B default 100).
    bidirectional (reference default TRUE, metropolis_renderer.dart:42,
    :664-674): each mutation evaluates the bidirectional radiance
    (integrators/bdpt.path_l — eye+light subpaths with visibility-tested
    connections), the scene class MLT exists for (caustics, hard indirect
    visibility). False = eye-path-only PSSMLT over the plain path
    integrator.
    """
    from ..scene import types as _st
    from ..integrators import bdpt
    scene = _st.to_device(scene)
    key = jax.random.PRNGKey(seed)

    if bidirectional:
        n_dims = bdpt.dims_for(max_depth, True)
        li_fn = partial(bdpt.path_l, max_depth=max_depth,
                        bidirectional=True,
                        skip_direct=do_direct_separately)
    else:
        n_dims = 16 + 10 * (max_depth + 2)
        ig = pi.PathIntegrator(max_depth=max_depth)
        if do_direct_separately:
            # MLT measures the indirect suffix; direct light +
            # directly-visible emission come from a sampler-renderer pass.
            li_fn = partial(pi.li, ig, skip_direct=True)
        else:
            li_fn = partial(pi.li, ig)

    rad = jax.jit(partial(_radiance_for, scene, camera, width, height,
                          li_fn, max_depth=max_depth))

    # ---- bootstrap: estimate b = E[I] and resample chain seeds ----------
    # The image dims (u[0:2]) use a scrambled (0,2)-sequence: I(u) is
    # heavy-tailed in the pixel position (bright emitter pixels), so pure
    # random bootstraps typically UNDERESTIMATE b (median < mean) — a
    # consistent few-percent-dark MLT image. Stratifying the pixel dims
    # captures the bright tail proportionally (the bootstrap phase of
    # metropolis_renderer.dart:111-150 likewise draws structured samples).
    kb, key = jax.random.split(key)
    u_boot = jax.random.uniform(kb, (n_bootstrap, n_dims))
    from ..core import sampling as smp_core
    bidx = jnp.arange(n_bootstrap, dtype=jnp.uint32)
    scr = jax.random.randint(kb, (2,), 0, 2**31 - 1,
                             dtype=jnp.int32).astype(jnp.uint32)
    b2 = smp_core.sample02(bidx, (scr[0], scr[1]))
    u_boot = u_boot.at[:, 0].set(b2.x).at[:, 1].set(b2.y)
    L_boot, _ = rad(u_boot)
    I_boot = spec.luminance(L_boot)
    b = float(jnp.mean(I_boot))
    if b <= 0.0:
        b = 1e-9
    cdf = jnp.cumsum(jnp.maximum(I_boot, 0.0))
    cdf = cdf / jnp.maximum(cdf[-1], 1e-30)
    kr, key = jax.random.split(key)
    picks = jnp.searchsorted(cdf, jax.random.uniform(kr, (n_chains,)))
    u0 = u_boot[jnp.clip(picks, 0, n_bootstrap - 1)]

    n_total = int(spp) * width * height
    n_steps = max(n_total // n_chains, 1)

    film = film_mod.make_film(width, height)

    @jax.jit
    def mlt_step(carry, k):
        u, L_cur, I_cur, rejects, splat_img = carry
        k1, k2, k3, k4, k5 = jax.random.split(k, 5)
        is_large = jax.random.uniform(k1, (n_chains,)) < large_step_prob
        u_fresh = jax.random.uniform(k2, (n_chains, n_dims))
        r1 = jax.random.uniform(k3, (n_chains, n_dims))
        r2 = jax.random.uniform(k4, (n_chains, n_dims))
        u_small = _mutate_small(u, r1, r2)
        u_prop = jnp.where(is_large[:, None], u_fresh, u_small)
        L_prop, xy_prop = rad(u_prop)
        I_prop = spec.luminance(L_prop)
        a = jnp.minimum(1.0, I_prop / jnp.maximum(I_cur, 1e-30))
        a = jnp.where(I_cur <= 0.0, 1.0, a)
        # expected-value splatting (both states, weighted)
        _, xy_cur = rad(u)   # image position of current state
        w_prop = a * b / jnp.maximum(I_prop, 1e-30)
        w_cur = (1.0 - a) * b / jnp.maximum(I_cur, 1e-30)
        w_prop = jnp.where(I_prop > 0, w_prop, 0.0)
        w_cur = jnp.where(I_cur > 0, w_cur, 0.0)
        sp = spec.to_xyz(L_prop * w_prop)
        sc = spec.to_xyz(L_cur * w_cur)

        def scatter(img, xy, v):
            from ..core import math as vm
            ix = jnp.clip(xy.x.astype(jnp.int32), 0, width - 1)
            iy = jnp.clip(xy.y.astype(jnp.int32), 0, height - 1)
            return img.at[iy, ix].add(vm.to_arr(v))

        splat_img = scatter(splat_img, xy_prop, sp)
        splat_img = scatter(splat_img, xy_cur, sc)
        # accept / reject (+ forced acceptance cap, maxconsecutiverejects)
        accept = jax.random.uniform(k5, (n_chains,)) < a
        accept = accept | (rejects >= max_consecutive_rejects)
        rejects = jnp.where(accept, 0, rejects + 1)
        from ..core import math as vm
        u = jnp.where(accept[:, None], u_prop, u)
        L_cur = vm.where3(accept, L_prop, L_cur)
        I_cur = jnp.where(accept, I_prop, I_cur)
        return (u, L_cur, I_cur, rejects, splat_img), None

    L0, _ = rad(u0)
    I0 = spec.luminance(L0)
    splat0 = jnp.zeros((height, width, 3), jnp.float32)
    carry = (u0, L0, I0, jnp.zeros((n_chains,), jnp.int32), splat0)
    keys = jax.random.split(key, n_steps)
    chunk = max(min(n_steps, 64), 1)
    done = 0
    scan = jax.jit(lambda c, ks: jax.lax.scan(mlt_step, c, ks))
    while done < n_steps:
        ks = keys[done:done + chunk]
        carry, _ = scan(carry, ks)
        done += ks.shape[0]
        if progress is not None:
            progress(done, n_steps, None)
    splat_img = carry[4]

    mutations_done = n_steps * n_chains
    film = film_mod.Film(pixels=film.pixels, splat=splat_img,
                         ftable=film.ftable, width=width, height=height,
                         xwidth=film.xwidth, ywidth=film.ywidth,
                         x0=0, y0=0)
    splat_scale = float(width * height) / float(mutations_done)

    if do_direct_separately:
        from . import sampler as rend
        from ..integrators import direct as di
        igd = di.DirectLightingIntegrator(strategy=di.STRATEGY_ONE,
                                          max_depth=0)
        smp_d = smp_mod.make_sampler("lowdiscrepancy", spp=direct_spp)
        img_direct = rend.render(scene, camera, smp_d,
                                 lambda s, r, d, c: di.li(igd, s, r, d, c),
                                 width, height)
        return np.asarray(img_direct) + np.asarray(
            film_mod.to_rgb(film, splat_scale=splat_scale))
    return np.asarray(film_mod.to_rgb(film, splat_scale=splat_scale))
