"""Differentiability v1: jax.grad through the path integrator vs central
finite differences with common random numbers (deterministic samplers make
FD a sharp oracle for radiance-scaling parameters). BASELINE.md metric #2;
no reference counterpart (DartRay is forward-only)."""
import numpy as np
import pytest

import jax
import jax.numpy as jnp

from dartray_tpu import cameras, grad, materials as mat_mod, samplers
from dartray_tpu import lights as lt_mod
from dartray_tpu.core import transform as tr
from dartray_tpu.integrators import path as pi
from dartray_tpu.scene import build as sb, mesh


@pytest.fixture(scope="module")
def box_scene():
    """Small Cornell-ish box: matte walls, area light, one glass sphere."""
    b = sb.SceneBuilder()
    white = b.add_material(mat_mod.matte(kd=(0.6, 0.6, 0.6)))
    red = b.add_material(mat_mod.matte(kd=(0.7, 0.1, 0.1)))
    glass = b.add_material(mat_mod.glass())
    dark = b.add_material(mat_mod.matte(kd=(0.0, 0.0, 0.0)))
    # floor + back wall + one side wall
    b.add_mesh(mesh.make_mesh([[-1, 0, -1], [1, 0, -1], [1, 0, 1],
                               [-1, 0, 1]], [[0, 1, 2], [0, 2, 3]]), white)
    b.add_mesh(mesh.make_mesh([[-1, 0, 1], [1, 0, 1], [1, 2, 1],
                               [-1, 2, 1]], [[0, 1, 2], [0, 2, 3]]), white)
    b.add_mesh(mesh.make_mesh([[-1, 0, -1], [-1, 0, 1], [-1, 2, 1],
                               [-1, 2, -1]], [[0, 1, 2], [0, 2, 3]]), red)
    s = mesh.sphere(radius=0.3, nu=12, nv=6).transformed(
        np.asarray(tr.translate([0.3, 0.35, 0.2]).m))
    b.add_mesh(s, glass)
    b.add_mesh(mesh.make_mesh([[-0.4, 1.95, -0.4], [0.4, 1.95, -0.4],
                               [0.4, 1.95, 0.4], [-0.4, 1.95, 0.4]],
                              [[0, 1, 2], [0, 2, 3]]), dark,
               area_light_L=(6.0, 6.0, 6.0))
    return b.build()


def _setup(scene, spp=8, wh=12):
    c2w = tr.look_at([0, 1.0, -3.2], [0, 0.8, 0], [0, 1, 0])
    cam = cameras.perspective(c2w, 35.0, wh, wh)
    smp = samplers.make_sampler("lowdiscrepancy", spp=spp)
    ig = pi.PathIntegrator(max_depth=3)
    li = lambda s, r, d, c: pi.li(ig, s, r, d, c)
    return cam, smp, li, wh


@pytest.mark.slow
def test_grad_kd_matches_fd(box_scene):
    """d mean(img) / d kd (matte albedo) — kd scales f only (cosine lobe
    sampling is albedo-independent), so detached == full derivative."""
    cam, smp, li, wh = _setup(box_scene)
    theta, inject = grad.select(box_scene, ["materials.kd"])
    val, g = grad.render_pixel_jacobian_sum(box_scene, cam, smp, li, wh, wh,
                                            theta, inject)
    g_kd = np.asarray(g["materials.kd"])
    assert np.isfinite(g_kd).all()
    # FD only on the two matte rows (white=0, red=1), green channel
    mask = np.zeros_like(g_kd)
    fd = {}
    for row in (0, 1):
        for ch in (1,):
            theta_1 = {"materials.kd": theta["materials.kd"]}
            full_fd = grad.finite_difference(
                box_scene, cam, smp, li, wh, wh,
                {"k": theta_1["materials.kd"][row, ch]},
                lambda s, t: grad.select(s, ["materials.kd"])[1](
                    s, {"materials.kd":
                        theta_1["materials.kd"].at[row, ch].set(t["k"])}),
                lambda img: img.mean(), eps=2e-3)
            fd[(row, ch)] = full_fd["k"]
            mask[row, ch] = 1.0
    for (row, ch), f in fd.items():
        a = g_kd[row, ch]
        assert f != 0.0 or a == 0.0
        assert abs(a - f) < 0.03 * max(abs(f), 1e-3), \
            f"kd[{row},{ch}]: autodiff {a} vs FD {f}"


def test_grad_light_intensity_exact(box_scene):
    """Radiance is LINEAR in light emission given fixed paths, so
    g = d mean / d L must satisfy mean(img(L)) == g . L + const with the
    direct-emission constant — check against FD tightly.

    Kept in the default (fast) suite: small spp/res keeps it ~1 min."""
    cam, smp, li, wh = _setup(box_scene, spp=4, wh=8)
    theta, inject = grad.select(box_scene, ["lights.intensity"])
    val, g = grad.render_pixel_jacobian_sum(box_scene, cam, smp, li, wh, wh,
                                            theta, inject)
    g_l = np.asarray(g["lights.intensity"])
    assert np.isfinite(g_l).all()
    assert g_l[0, 1] > 0.0      # brighter light -> brighter image
    inten = jnp.asarray(theta["lights.intensity"])   # tables are host numpy
    fd = grad.finite_difference(
        box_scene, cam, smp, li, wh, wh,
        {"L": inten[0, 1]},
        lambda s, t: grad.select(s, ["lights.intensity"])[1](
            s, {"lights.intensity": inten.at[0, 1].set(t["L"])}),
        lambda img: img.mean(), eps=5e-2)
    assert abs(g_l[0, 1] - fd["L"]) < 0.02 * max(abs(fd["L"]), 1e-4), \
        f"autodiff {g_l[0, 1]} vs FD {fd['L']}"


@pytest.mark.slow
def test_grad_through_specular_chain(box_scene):
    """Paths through the glass sphere (specular refraction chain) still
    propagate albedo gradients — finite and nonzero overall."""
    cam, smp, li, wh = _setup(box_scene)
    theta, inject = grad.select(
        box_scene, ["materials.kd", "materials.kt", "lights.intensity"])
    val, g = grad.render_pixel_jacobian_sum(box_scene, cam, smp, li, wh, wh,
                                            theta, inject)
    for k, v in g.items():
        assert np.isfinite(np.asarray(v)).all(), k
    # glass row is index 2; kt gradient reflects transmission paths
    kt_g = np.asarray(g["materials.kt"])[2]
    assert np.isfinite(kt_g).all()
    assert float(np.abs(np.asarray(g["materials.kd"])).sum()) > 0.0


def test_remat_grad_matches_unremat(box_scene):
    """jax.checkpoint around the bounce body must not change gradients
    (VERDICT r3 #7: grads that scale — O(1) memory in depth)."""
    cam, smp, li, wh = _setup(box_scene, spp=2, wh=8)
    ig_r = pi.PathIntegrator(max_depth=3, remat=True)
    li_r = lambda s, r, d, c: pi.li(ig_r, s, r, d, c)
    theta, inject = grad.select(box_scene, ["materials.kd"])
    _, g0 = grad.render_pixel_jacobian_sum(box_scene, cam, smp, li, wh, wh,
                                           theta, inject)
    _, g1 = grad.render_pixel_jacobian_sum(box_scene, cam, smp, li_r, wh,
                                           wh, theta, inject)
    np.testing.assert_allclose(np.asarray(g1["materials.kd"]),
                               np.asarray(g0["materials.kd"]),
                               rtol=1e-4, atol=1e-7)


@pytest.mark.slow
def test_remat_grad_64px_spp8_runs(box_scene):
    """A 64x64 spp-8 depth-5 differentiable render completes under remat
    (the r2 docstring warned the unrolled tape blows memory)."""
    c2w = tr.look_at([0, 1.0, -3.2], [0, 0.8, 0], [0, 1, 0])
    cam = cameras.perspective(c2w, 35.0, 64, 64)
    smp = samplers.make_sampler("lowdiscrepancy", spp=8)
    ig = pi.PathIntegrator(max_depth=5, remat=True)
    li = lambda s, r, d, c: pi.li(ig, s, r, d, c)
    theta, inject = grad.select(box_scene, ["materials.kd"])
    val, g = grad.render_pixel_jacobian_sum(box_scene, cam, smp, li, 64, 64,
                                            theta, inject)
    assert np.isfinite(float(val))
    assert np.isfinite(np.asarray(g["materials.kd"])).all()
    assert np.abs(np.asarray(g["materials.kd"])).max() > 0


def test_grad_through_pallas_interpret_path(box_scene):
    """Gradients flow through the TPU (Pallas) traversal code path: the
    kernel is a detached visibility oracle; shading at the returned hits is
    differentiable. Run in interpret mode on CPU, compare vs the XLA
    cluster path."""
    from dartray_tpu.scene import types as st
    cam, smp, li, wh = _setup(box_scene, spp=1, wh=6)
    theta, inject = grad.select(box_scene, ["materials.kd"])
    _, g_cl = grad.render_pixel_jacobian_sum(box_scene, cam, smp, li, wh,
                                             wh, theta, inject)
    st.FORCE_PALLAS_INTERPRET = True
    try:
        _, g_pl = grad.render_pixel_jacobian_sum(box_scene, cam, smp, li,
                                                 wh, wh, theta, inject)
    finally:
        st.FORCE_PALLAS_INTERPRET = False
    np.testing.assert_allclose(np.asarray(g_pl["materials.kd"]),
                               np.asarray(g_cl["materials.kd"]),
                               rtol=5e-3, atol=1e-6)


@pytest.mark.slow
def test_inverse_render_recovers_albedo_and_light(box_scene):
    """End-to-end inverse rendering: optimize materials.kd +
    lights.intensity by gradient descent to match a target render; loss
    must drop by 10x (VERDICT r3 #7 done criterion)."""
    cam, smp, li, wh = _setup(box_scene, spp=4, wh=16)
    target = grad.render_image(box_scene, cam, smp, li, wh, wh)
    theta0, inject = grad.select(box_scene,
                                 ["materials.kd", "lights.intensity"])
    # perturb: dim the albedo, brighten the light
    theta = {
        "materials.kd": theta0["materials.kd"] * 0.4,
        "lights.intensity": theta0["lights.intensity"] * 2.5,
    }
    loss_fn = lambda img: ((img - target) ** 2).mean()

    @jax.jit
    def step(theta):
        def run(th):
            return loss_fn(grad.render_image(inject(box_scene, th), cam,
                                             smp, li, wh, wh))
        return jax.value_and_grad(run)(theta)

    lr = {"materials.kd": 2.0, "lights.intensity": 40.0}
    losses = []
    for i in range(30):
        val, g = step(theta)
        losses.append(float(val))
        theta = {k: jnp.clip(theta[k] - lr[k] * g[k], 0.0, 50.0)
                 for k in theta}
    assert losses[-1] < 0.1 * losses[0], (losses[0], losses[-1])
