"""RenderManager: RenderJob -> image (the user-facing render orchestration).

Python replacement for lib/dartray_io/render_manager.dart and
lib/dartray_web/render_manager.dart:28-210 plus renderer/integrator selection
(dartray.dart:637-764). Composes surface and volume integrators per
sampler_renderer.dart:67-98: L = T * Li_surface + Lvi (Appendix A.1).
"""
from __future__ import annotations

from typing import Callable, Optional

import numpy as np
import jax.numpy as jnp

from .. import film as film_mod
from .. import samplers as smp_mod
from ..accel import traverse
from ..integrators import ao as ao_mod
from ..integrators import direct as di_mod
from ..integrators import path as pi_mod
from ..integrators import volume as vi_mod
from ..scene import types as st
from ..scene.api import RenderJob
from . import sampler as rend


def build_surface_li(job: RenderJob) -> Callable:
    name = job.surf_integrator
    p = job.surf_params
    if name == "ambientocclusion":
        ig = ao_mod.AOIntegrator(
            n_samples=p.find_one_int("nsamples", 2048),
            min_dist=p.find_one_float("mindist", 1e-4),
            max_dist=p.find_one_float("maxdist", float("inf")))
        return lambda s, r, d, c: ao_mod.li(ig, s, r, d, c)
    if name in ("directlighting", "whitted"):
        strat = p.find_one_string("strategy", "all")
        ig = di_mod.DirectLightingIntegrator(
            strategy=di_mod.STRATEGY_ONE if strat == "one"
            else di_mod.STRATEGY_ALL,
            max_depth=p.find_one_int("maxdepth", 5))
        return lambda s, r, d, c: di_mod.li(ig, s, r, d, c)
    if name == "path":
        ig = pi_mod.PathIntegrator(max_depth=p.find_one_int("maxdepth", 5))
        return lambda s, r, d, c: pi_mod.li(ig, s, r, d, c)
    if name == "igi":
        from ..integrators import igi as igi_mod
        ig = igi_mod.IGIIntegrator(
            n_light_paths=p.find_one_int("nlights", 64),
            n_light_sets=p.find_one_int("nsets", 4),
            max_depth=p.find_one_int("maxdepth", 5),
            g_limit=p.find_one_float("glimit", 10.0))
        return lambda s, r, d, c: igi_mod.li(ig, s, r, d, c)
    # photonmap/irradiancecache/dipolesubsurface/PRT pending: path fallback
    ig = pi_mod.PathIntegrator(max_depth=p.find_one_int("maxdepth", 5))
    return lambda s, r, d, c: pi_mod.li(ig, s, r, d, c)


def build_li(job: RenderJob) -> Callable:
    surf_li = build_surface_li(job)
    vol_name = job.vol_integrator
    vp = job.vol_params

    def li(scene, rays, diffs, sctx):
        ls = surf_li(scene, rays, diffs, sctx)
        if scene.volume is None:
            return ls
        # camera-segment volume integration needs the first-hit distance
        hits = st.intersect(scene.geometry, rays)
        seg_tmax = jnp.where(hits.hit, hits.t, 1e7)
        if vol_name == "single":
            ig = vi_mod.SingleScatteringIntegrator(
                step_size=vp.find_one_float("stepsize", 1.0))
            lv, T = vi_mod.single_scatter_li(ig, scene, rays, seg_tmax, sctx)
        else:  # "emission" default
            ig = vi_mod.EmissionIntegrator(
                step_size=vp.find_one_float("stepsize", 1.0))
            lv, T = vi_mod.emission_li(ig, scene, rays, seg_tmax, sctx)
        return T * ls + lv

    return li


def run(job: RenderJob, progress: Optional[Callable] = None) -> np.ndarray:
    li = build_li(job)
    return rend.render(job.scene, job.camera, job.sampler, li,
                       job.width, job.height, progress=progress,
                       filter_name=job.filter_name,
                       filter_params=job.filter_params)


def render_pbrt(text_or_path: str, search_paths=None,
                progress: Optional[Callable] = None,
                overrides: Optional[dict] = None) -> np.ndarray:
    """Parse + render a PBRT scene (RenderManager.render analog).

    overrides: RenderOverrides analog (core/render_overrides.dart) — keys:
    resolution_scale, spp, max_depth, quick_render.
    """
    import os
    from ..scene import parser as parser_mod
    from ..scene import resources

    if os.path.exists(text_or_path):
        resolver = resources.Resolver(
            [os.path.dirname(os.path.abspath(text_or_path))]
            + list(search_paths or []))
        text = resolver(os.path.basename(text_or_path))
    else:
        resolver = resources.Resolver(list(search_paths or ["."]))
        text = text_or_path
    job = parser_mod.parse(text, resolver=resolver)
    if overrides:
        job = apply_overrides(job, overrides)
    return run(job, progress=progress)


def apply_overrides(job: RenderJob, ov: dict) -> RenderJob:
    import dataclasses
    if ov.get("quick_render"):
        ov = {"resolution_scale": 0.25, "spp": 1, **ov}
    if "resolution_scale" in ov:
        s = float(ov["resolution_scale"])
        job = dataclasses.replace(job, width=max(int(job.width * s), 1),
                                  height=max(int(job.height * s), 1))
    if "spp" in ov:
        job = dataclasses.replace(
            job, sampler=smp_mod.make_sampler("lowdiscrepancy",
                                              spp=int(ov["spp"])))
    return job
