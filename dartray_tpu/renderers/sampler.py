"""SamplerRenderer: the main wavefront render loop.

TPU-native replacement for lib/renderers/sampler_renderer.dart:28-227. The
reference's per-pixel-batch getMoreSamples loop becomes: one *wave* = every
film pixel x one sample index, fully vectorized; a jitted wave step generates
camera samples/rays, evaluates the surface integrator's Li over the wave, and
scatter-adds into the film. Waves iterate over sample indices (Python loop
over a jitted step — each step is hundreds of ms of device work, so dispatch
overhead is negligible; bench can lax.fori the whole loop).

Li composition semantics (sampler_renderer.dart:67-98, Appendix A.1):
L = T * Li_surface + Lvi with NaN/negative/inf clamping to black handled in
film.add_samples.
"""
from __future__ import annotations

from functools import partial
from typing import Callable, Optional

import numpy as np
import jax
import jax.numpy as jnp

from .. import cameras as cam_mod
from .. import film as film_mod
from .. import samplers as smp_mod


def pixel_grid(width, height, x0=0, y0=0, morton: bool = True):
    """Flattened pixel index arrays for a film window (GetSubWindow analog:
    a shard renders [x0, x0+width) x [y0, y0+height)).

    morton: order pixels along a Z-curve so consecutive 128-ray packets are
    compact image tiles (~12x11 px), maximizing camera-packet frustum
    coherence for the traversal kernel. Pure host-side reordering — the film
    scatter-add is order-independent."""
    ys, xs = np.meshgrid(np.arange(height, dtype=np.int32),
                         np.arange(width, dtype=np.int32), indexing="ij")
    xs = xs.reshape(-1)
    ys = ys.reshape(-1)
    if morton and width > 1 and height > 1:
        def spread(v):
            v = (v | (v << 8)) & 0x00FF00FF
            v = (v | (v << 4)) & 0x0F0F0F0F
            v = (v | (v << 2)) & 0x33333333
            v = (v | (v << 1)) & 0x55555555
            return v
        key = spread(xs.astype(np.int64)) | (spread(ys.astype(np.int64)) << 1)
        order = np.argsort(key, kind="stable")
        xs, ys = xs[order], ys[order]
    return (jnp.asarray(xs + x0), jnp.asarray(ys + y0))


def render_wave(scene, camera: cam_mod.Camera, sampler: smp_mod.Sampler,
                film: film_mod.Film, px, py, s_idx, *,
                li_fn: Callable, width: int, height: int, spp: int):
    """One wave: (pixels x one sample index) -> film' (jit-friendly)."""
    cs = smp_mod.camera_samples(sampler, px, py, s_idx)
    diff_scale = 1.0 / np.sqrt(max(spp, 1))  # sampler_renderer.dart:166
    rays, diffs, weight = cam_mod.generate_rays(camera, cs, width, height,
                                                diff_scale)
    sctx = {"sampler": sampler, "px": px, "py": py, "s_idx": s_idx}
    L = li_fn(scene, rays, diffs, sctx)
    L = L * weight
    return film_mod.add_samples(film, cs.image_xy, L)


def render(scene, camera, sampler, li_fn, width, height,
           progress: Optional[Callable] = None, filter_name="box",
           filter_params=None, stats=None, checkpoint_path=None,
           checkpoint_every=8, on_error: str = "raise", log=None,
           sampling_mode: str = "iterative"):
    """Full render: returns (H, W, 3) linear RGB. Pass a stats.RenderStats
    to collect per-phase timings + exact wavefront counters.

    sampling_mode (core/sampler.dart:27-38 FULL/TWO_PASS/ITERATIVE): the
    wavefront always executes 1-spp full-image sweeps, so the modes only
    set the PREVIEW cadence via `progress` — "iterative": after every
    wave; "twopass": after the first wave and at the end; "full": no
    intermediate previews. Pixel values are identical across modes
    (samples are (pixel, s_idx, dim)-keyed; the film is additive) — true
    of the reference's modes too, which reorder the same sample set.

    checkpoint_path: when set, the film + next-sample counter are saved
    every `checkpoint_every` waves and a pre-existing checkpoint at that
    path resumes the render mid-stream. Samples are keyed by (pixel,
    sample index, dimension), so a killed-and-resumed render is bit-exact
    vs an uninterrupted one (failure recovery, SURVEY §5).

    on_error="partial": a mid-render failure resolves and returns the film
    accumulated so far instead of raising (the reference's worker-error
    path completes the job with partial output,
    dartray_web/render_manager.dart:134-140)."""
    import os
    from ..scene import types as st
    scene = st.to_device(scene)
    film = film_mod.make_film(width, height, filter_name=filter_name,
                              filter_params=filter_params)
    px, py = pixel_grid(width, height)
    spp = sampler.spp
    resume_s = 0
    if checkpoint_path is not None and os.path.exists(checkpoint_path):
        film, resume_s = film_mod.load_checkpoint(checkpoint_path, film)

    step = jax.jit(partial(render_wave, li_fn=li_fn, width=width,
                           height=height, spp=spp),
                   static_argnames=())
    if resume_s > 0:
        stats = None   # resumed renders skip the first-wave compile split
    if stats is not None:
        with stats.time("time/compile+first_wave"):
            film = step(scene, camera, sampler, film=film, px=px, py=py,
                        s_idx=jnp.zeros(px.shape, jnp.int32))
            jax.block_until_ready(film.pixels)
        stats.add("waves", 1)
        stats.add("rays/camera", px.shape[0])
        start = 1
        if progress is not None and sampling_mode in ("iterative",
                                                      "twopass"):
            progress(1, spp, film)
    else:
        start = resume_s
    ctx = stats.time("time/render") if stats is not None else None
    if ctx is not None:
        ctx.__enter__()
    for s in range(start, spp):
        try:
            s_idx = jnp.full(px.shape, s, jnp.int32)
            film = step(scene, camera, sampler, film=film, px=px, py=py,
                        s_idx=s_idx)
            jax.block_until_ready(film.pixels)
            if progress is not None and (
                    sampling_mode == "iterative"
                    or (sampling_mode in ("twopass", "full")
                        and s + 1 == spp)):
                progress(s + 1, spp, film)
        except Exception as e:  # noqa: BLE001
            if on_error != "partial":
                raise
            # failure recovery: resolve the partial accumulator (the
            # additive film is valid at every wave boundary)
            (log or print)(f"error: render failed at wave {s + 1}/{spp} "
                           f"({type(e).__name__}: {e}); returning the "
                           f"partial image accumulated so far")
            break
        if stats is not None:
            stats.add("waves", 1)
            stats.add("rays/camera", px.shape[0])
        if checkpoint_path is not None and (s + 1) % checkpoint_every == 0 \
                and s + 1 < spp:
            film_mod.save_checkpoint(checkpoint_path, film, s + 1)
    out = np.asarray(film_mod.to_rgb(film))
    if ctx is not None:
        ctx.__exit__(None, None, None)
    return out


def render_adaptive(scene, camera, sampler, li_fn, width, height,
                    min_spp=4, max_spp=32, contrast_threshold=0.5,
                    progress: Optional[Callable] = None, filter_name="box",
                    filter_params=None):
    """Adaptive supersampling (adaptive_sampler.dart:36-220), wavefront
    formulation: a first pass renders min_spp waves while tracking per-pixel
    luminance min/max; pixels whose sample contrast
    (maxL-minL)/(maxL+minL) exceeds the threshold
    (ADAPTIVE_CONTRAST_THRESHOLD, :37) get the remaining max_spp-min_spp
    waves — traced with every non-refined lane dead (tmax<tmin), which the
    sorted traversal kernel short-circuits, so refinement cost scales with
    the refined-pixel count. The additive film normalizes by per-pixel
    weight, so uneven spp is exact."""
    import jax.numpy as jnp
    from .. import film as film_mod
    from ..scene import types as st

    scene = st.to_device(scene)
    film = film_mod.make_film(width, height, filter_name=filter_name,
                              filter_params=filter_params)
    px, py = pixel_grid(width, height)
    n = px.shape[0]

    def wave_lum(scene, camera, sampler, film, px, py, s_idx):
        from ..core import spectrum as spec_mod
        cs = smp_mod.camera_samples(sampler, px, py, s_idx)
        diff_scale = 1.0 / np.sqrt(max(max_spp, 1))
        rays, diffs, weight = cam_mod.generate_rays(camera, cs, width,
                                                    height, diff_scale)
        sctx = {"sampler": sampler, "px": px, "py": py, "s_idx": s_idx}
        L = li_fn(scene, rays, diffs, sctx)
        L = L * weight
        lum = spec_mod.luminance(L)
        return film_mod.add_samples(film, cs.image_xy, L), lum

    step = jax.jit(partial(wave_lum), donate_argnames=("film",))
    lmin = jnp.full((n,), jnp.inf)
    lmax = jnp.full((n,), -jnp.inf)
    for s in range(min_spp):
        film, lum = step(scene, camera, sampler, film, px, py,
                         jnp.full((n,), s, jnp.int32))
        lmin = jnp.minimum(lmin, lum)
        lmax = jnp.maximum(lmax, lum)
        if progress is not None:
            progress(s + 1, max_spp, film)
    contrast = (lmax - lmin) / jnp.maximum(lmax + lmin, 1e-6)
    refine = (contrast > contrast_threshold) & jnp.isfinite(contrast)

    def wave_masked(scene, camera, sampler, film, px, py, s_idx, refine):
        cs = smp_mod.camera_samples(sampler, px, py, s_idx)
        diff_scale = 1.0 / np.sqrt(max(max_spp, 1))
        rays, diffs, weight = cam_mod.generate_rays(camera, cs, width,
                                                    height, diff_scale)
        rays = rays._replace(tmax=jnp.where(refine, rays.tmax, -1.0))
        sctx = {"sampler": sampler, "px": px, "py": py, "s_idx": s_idx}
        L = li_fn(scene, rays, diffs, sctx)
        L = L * weight
        return film_mod.add_samples(film, cs.image_xy, L, mask=refine)

    step2 = jax.jit(partial(wave_masked), donate_argnames=("film",))
    for s in range(min_spp, max_spp):
        film = step2(scene, camera, sampler, film, px, py,
                     jnp.full((n,), s, jnp.int32), refine)
        if progress is not None:
            progress(s + 1, max_spp, film)
    n_refined = int(jnp.sum(refine))
    return np.asarray(film_mod.to_rgb(film)), n_refined
