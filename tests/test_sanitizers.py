"""Numeric sanitizers (SURVEY §5 race-detection/sanitizer row): the core
path-tracing wave must be NaN-free under jax_debug_nans — the analog of the
reference's per-sample NaN radiance guards (sampler_renderer.dart:181-193),
enforced at op granularity instead of output granularity."""
import numpy as np
import jax
import pytest

from dartray_tpu import cameras, materials as mat_mod, samplers
from dartray_tpu.core import transform as tr
from dartray_tpu.integrators import path as pi
from dartray_tpu.renderers import sampler as rend
from dartray_tpu.scene import build as sb, mesh


def test_path_wave_nan_free_under_debug_nans():
    b = sb.SceneBuilder()
    white = b.add_material(mat_mod.matte(kd=(0.6, 0.6, 0.6)))
    glass = b.add_material(mat_mod.glass())
    dark = b.add_material(mat_mod.matte(kd=(0.0, 0.0, 0.0)))
    b.add_mesh(mesh.make_mesh([[-1, 0, -1], [1, 0, -1], [1, 0, 1],
                               [-1, 0, 1]], [[0, 1, 2], [0, 2, 3]]), white)
    s = mesh.sphere(radius=0.3, nu=10, nv=5).transformed(
        np.asarray(tr.translate([0.0, 0.35, 0.0]).m))
    b.add_mesh(s, glass)
    b.add_mesh(mesh.make_mesh([[-0.4, 1.9, -0.4], [0.4, 1.9, -0.4],
                               [0.4, 1.9, 0.4], [-0.4, 1.9, 0.4]],
                              [[0, 1, 2], [0, 2, 3]]), dark,
               area_light_L=(6.0, 6.0, 6.0))
    scene = b.build()
    c2w = tr.look_at([0, 1.0, -3.0], [0, 0.5, 0], [0, 1, 0])
    cam = cameras.perspective(c2w, 35.0, 8, 8)
    smp = samplers.make_sampler("lowdiscrepancy", spp=2)
    ig = pi.PathIntegrator(max_depth=3)
    li = lambda s_, r, d, c: pi.li(ig, s_, r, d, c)
    jax.config.update("jax_debug_nans", True)
    try:
        img = rend.render(scene, cam, smp, li, 8, 8)
    finally:
        jax.config.update("jax_debug_nans", False)
    assert np.isfinite(img).all()
