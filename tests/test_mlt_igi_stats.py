"""Statistical consistency of Metropolis (PSSMLT) and IGI vs the path
tracer (VERDICT r3 #8: b-normalized MLT must reproduce the path tracer's
mean image on a diffuse scene; igi likewise approximates GI).

Both are slow-marked statistical tests (minutes on the 2-core CPU box).
Reference semantics: metropolis_renderer.dart:111-150 bootstrap b
normalization; igi_integrator.dart.
"""
import numpy as np
import pytest

from dartray_tpu import cameras, materials as mat_mod, samplers
from dartray_tpu.core import transform as tr
from dartray_tpu.integrators import path as pi
from dartray_tpu.renderers import sampler as rend
from dartray_tpu.scene import build as sb, mesh


def _diffuse_box():
    """All-matte Cornell-ish box (no specular: MLT and path converge fast)."""
    b = sb.SceneBuilder()
    white = b.add_material(mat_mod.matte(kd=(0.6, 0.6, 0.6)))
    red = b.add_material(mat_mod.matte(kd=(0.7, 0.15, 0.15)))
    green = b.add_material(mat_mod.matte(kd=(0.15, 0.7, 0.15)))
    dark = b.add_material(mat_mod.matte(kd=(0.0, 0.0, 0.0)))
    quads = [
        ([[-1, 0, -1], [1, 0, -1], [1, 0, 1], [-1, 0, 1]], white),   # floor
        ([[-1, 2, -1], [-1, 2, 1], [1, 2, 1], [1, 2, -1]], white),   # ceil
        ([[-1, 0, 1], [1, 0, 1], [1, 2, 1], [-1, 2, 1]], white),     # back
        ([[-1, 0, -1], [-1, 0, 1], [-1, 2, 1], [-1, 2, -1]], red),
        ([[1, 0, 1], [1, 0, -1], [1, 2, -1], [1, 2, 1]], green),
    ]
    for pts, m in quads:
        b.add_mesh(mesh.make_mesh(pts, [[0, 1, 2], [0, 2, 3]]), m)
    b.add_mesh(mesh.make_mesh(
        [[-0.4, 1.98, -0.4], [0.4, 1.98, -0.4], [0.4, 1.98, 0.4],
         [-0.4, 1.98, 0.4]], [[0, 1, 2], [0, 2, 3]]), dark,
        area_light_L=(8.0, 8.0, 8.0))
    return b.build()


def _cam(wh):
    c2w = tr.look_at([0, 1.0, -3.4], [0, 1.0, 0], [0, 1, 0])
    return cameras.perspective(c2w, 38.0, wh, wh)


@pytest.mark.slow
def test_metropolis_matches_path_mean():
    """b-normalized PSSMLT mean image tracks the path tracer within a few
    percent on a diffuse box (metropolis_renderer.dart:111-150)."""
    from dartray_tpu.renderers import metropolis as mlt
    scene = _diffuse_box()
    wh = 24
    cam = _cam(wh)
    smp = samplers.make_sampler("lowdiscrepancy", spp=64)
    ig = pi.PathIntegrator(max_depth=4)
    li = lambda s, r, d, c: pi.li(ig, s, r, d, c)
    ref = rend.render(scene, cam, smp, li, wh, wh)
    img = mlt.render(scene, cam, wh, wh, spp=200, n_chains=1024,
                     n_bootstrap=8192, max_depth=4,
                     do_direct_separately=False)
    # global brightness from the bootstrap b (the load-bearing constant)
    rel_mean = abs(img.mean() - ref.mean()) / ref.mean()
    assert rel_mean < 0.05, (img.mean(), ref.mean())
    # per-pixel: normalized L1 over the (noisy) low-res images
    l1 = np.abs(img - ref).mean() / ref.mean()
    assert l1 < 0.35, l1


@pytest.mark.slow
def test_igi_matches_path_mean():
    """IGI total flux within ~10% of the path tracer on the diffuse box
    (igi_integrator.dart VPL estimator)."""
    from dartray_tpu.renderers import manager
    from dartray_tpu.scene import api as api_mod
    scene = _diffuse_box()
    wh = 24
    cam = _cam(wh)
    smp = samplers.make_sampler("lowdiscrepancy", spp=16)
    ig = pi.PathIntegrator(max_depth=4)
    li_path = lambda s, r, d, c: pi.li(ig, s, r, d, c)
    ref = rend.render(scene, cam, smp, li_path, wh, wh)
    from dartray_tpu.integrators import igi as igi_mod
    igi_ig = igi_mod.IGIIntegrator(n_light_paths=64, n_light_sets=4,
                                   max_depth=4)
    vpl = igi_mod.preprocess(igi_ig, scene)
    li_igi = lambda s, r, d, c: igi_mod.li(igi_ig, s, r, d, c, vpls=vpl)
    img = rend.render(scene, cam, smp, li_igi, wh, wh)
    rel = abs(img.mean() - ref.mean()) / ref.mean()
    assert rel < 0.15, (img.mean(), ref.mean())


def _caustic_scene():
    """The scene class MLT exists for (metropolis_renderer.dart:664-674
    bidirectional default): a SMALL bright area light focused through a
    glass sphere onto a diffuse floor — the caustic is light->glass->floor,
    a specular chain NEE cannot sample, so plain path tracing sees it only
    through rare BSDF-sampling spikes."""
    b = sb.SceneBuilder()
    white = b.add_material(mat_mod.matte(kd=(0.75, 0.75, 0.75)))
    glass = b.add_material(mat_mod.glass())
    dark = b.add_material(mat_mod.matte(kd=(0.0, 0.0, 0.0)))
    b.add_mesh(mesh.make_mesh([[-3, 0, -3], [3, 0, -3], [3, 0, 3],
                               [-3, 0, 3]], [[0, 1, 2], [0, 2, 3]]), white)
    b.add_mesh(mesh.sphere(radius=0.5, nu=48, nv=24).transformed(
        np.asarray(tr.translate([0.0, 0.85, 0.0]).m)), glass)
    # small light above-RIGHT of the sphere, wound to emit down: the
    # refracted focus lands on the floor LEFT of the sphere (x ~ -0.5),
    # directly visible to the camera (not occluded by the sphere)
    s = 0.12
    cx = 0.8
    b.add_mesh(mesh.make_mesh(
        [[cx - s, 2.2, -s], [cx + s, 2.2, -s], [cx + s, 2.2, s],
         [cx - s, 2.2, s]],
        [[0, 1, 2], [0, 2, 3]]), dark, area_light_L=(400.0,) * 3)
    return b.build()


@pytest.mark.slow
def test_metropolis_caustic_bidirectional():
    """Caustic-scene gate for the BIDIRECTIONAL Metropolis mode (VERDICT
    r5 #7, metropolis_renderer.dart:664-674 `bidirectional` default-on):
    on the glass-sphere caustic scene the bidirectional MLT must agree
    with path tracing on caustic-region energy. Measured r5 on the real
    TPU kernels: rel err 0.9% (eye-only PSSMLT at the same budget needs
    the separate direct pass to carry the region — the bidirectional
    light-subpath connections are what make the INDIRECT estimate
    self-sufficient; see integrators/bdpt.py and
    tests/test_bdpt.py for the pure-estimator agreement gate)."""
    from dartray_tpu.renderers import metropolis as mlt
    scene = _caustic_scene()
    W = H = 24
    spp = 64
    c2w = tr.look_at([0, 2.6, -2.6], [0, 0.2, 0], [0, 1, 0])
    cam = cameras.perspective(c2w, 42.0, W, H)
    ig = pi.PathIntegrator(max_depth=4)
    smp = samplers.make_sampler("lowdiscrepancy", spp=spp)
    img_path = rend.render(scene, cam, smp,
                           lambda s, r, d, c: pi.li(ig, s, r, d, c), W, H)
    img_mlt = mlt.render(scene, cam, W, H, spp=spp, n_chains=4096,
                         n_bootstrap=4096, max_depth=4, seed=5,
                         do_direct_separately=True, direct_spp=spp,
                         bidirectional=True)
    # caustic region: the floor patch under the sphere (image center-bottom)
    reg = (slice(14, 22), slice(8, 16))
    cp = img_path[reg].mean(axis=-1).ravel()
    cm = img_mlt[reg].mean(axis=-1).ravel()
    assert np.isfinite(img_mlt).all() and np.isfinite(img_path).all()
    # caustic-region energy parity (measured 0.9%; 20% allows MC noise)
    assert cm.mean() > 1e-3, cm.mean()
    assert abs(cm.mean() - cp.mean()) / max(cp.mean(), 1e-9) < 0.2, \
        (cp.mean(), cm.mean())
