"""Default-gate statistical correctness check (VERDICT r3 #9): a CHEAP
integrator-agreement assertion that runs in the fast suite, so integrator
correctness is not exclusively slow-marked.

IGI (VPL gather) and the path tracer estimate the same light transport; on
a small diffuse scene their image means must agree within a loose Monte-
Carlo tolerance. The heavyweight chi-square/statistical suites stay
@slow (tests/test_mlt_igi_stats.py)."""
import numpy as np
import jax.numpy as jnp

from tests.scenehelp import tiny_scene
from dartray_tpu.core import transform as tr
from dartray_tpu import cameras, samplers
from dartray_tpu.integrators import path as pi, igi as igi_mod
from dartray_tpu.renderers import sampler as rend


def test_igi_matches_path_mean_quick():
    scene = tiny_scene()
    W = H = 12
    c2w = tr.look_at([0, 1.5, -4.0], [0, 0.3, 0], [0, 1, 0])
    cam = cameras.perspective(c2w, 45.0, W, H)
    smp = samplers.make_sampler("lowdiscrepancy", spp=16)

    igp = pi.PathIntegrator(max_depth=3)
    img_path = rend.render(scene, cam, smp,
                           lambda s, r, d, c: pi.li(igp, s, r, d, c), W, H)

    igi = igi_mod.IGIIntegrator(n_light_paths=24, n_light_sets=2,
                                max_depth=3)
    vpls = igi_mod.preprocess(igi, scene, seed=3)
    img_igi = rend.render(
        scene, cam, smp,
        lambda s, r, d, c: igi_mod.li(igi, s, r, d, c, vpls), W, H)

    mp = float(img_path.mean())
    mi = float(img_igi.mean())
    assert mp > 1e-3, mp
    # tight enough that an energy-factor bug (e.g. a missing rho/pi ~ 3.1x)
    # cannot slip through (VERDICT r4 weak #9: 35% -> 15%)
    assert abs(mi - mp) / mp < 0.15, (mp, mi)
