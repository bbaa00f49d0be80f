"""SH library, PRT/probes integrators, whitted, photon mapping tests."""
import numpy as np
import jax.numpy as jnp

from dartray_tpu.scene import build as sb, mesh
from dartray_tpu.core import transform as tr, sh
from dartray_tpu import cameras, samplers, materials as mat_mod, \
    lights as lt_mod
from dartray_tpu.integrators import direct as di, path as pi, prt, \
    whitted as wh, photonmap as ph
from dartray_tpu.renderers import sampler as rend, probes as probes_mod


def _render(scene, li, w=16, h=16, spp=4, eye=(0, 1.0, -3.6), at=(0, 1, 0),
            fov=40.0):
    c2w = tr.look_at(eye, at, [0, 1, 0])
    cam = cameras.perspective(c2w, fov, w, h)
    smp = samplers.make_sampler("lowdiscrepancy", spp=spp)
    return rend.render(scene, cam, smp, li, w, h)


def test_sh_orthonormal_and_rotation():
    lmax = 3
    d, w = sh._quadrature_dirs(lmax)
    Y = np.asarray(sh.eval_basis(jnp.asarray(d), lmax))
    G = (Y * w[:, None]).T @ Y
    assert np.abs(G - np.eye(sh.n_terms(lmax))).max() < 1e-5
    rng = np.random.default_rng(0)
    A = rng.normal(size=(3, 3))
    q, _ = np.linalg.qr(A)
    if np.linalg.det(q) < 0:
        q[:, 0] *= -1
    c = rng.normal(size=(sh.n_terms(lmax),)).astype(np.float32)
    cr = sh.rotate(c, q, lmax)
    dirs = rng.normal(size=(64, 3))
    dirs /= np.linalg.norm(dirs, axis=1, keepdims=True)
    f_rot = np.asarray(sh.eval_basis(jnp.asarray(dirs @ q), lmax)) @ c
    f_new = np.asarray(sh.eval_basis(jnp.asarray(dirs), lmax)) @ cr
    assert np.abs(f_rot - f_new).max() < 1e-4


def test_sh_cosine_convolution_constant_env():
    """Constant unit radiance: cosine-convolved irradiance == pi exactly."""
    lmax = 4
    c = np.zeros((sh.n_terms(lmax), 1), np.float32)
    c[0, 0] = 2.0 * np.sqrt(np.pi)          # SH projection of f == 1
    e = sh.convolve_cos_theta(jnp.asarray(c), lmax)
    n = jnp.asarray([[0.0, 0.0, 1.0]])
    E = np.asarray(sh.eval_basis(n, lmax) @ e)[0, 0]
    assert abs(E - np.pi) < 1e-4


def test_diffuse_prt_furnace():
    """Unoccluded matte plane under constant env: diffuseprt -> rho * L."""
    rho = 0.5
    b = sb.SceneBuilder()
    m = b.add_material(mat_mod.matte(kd=(rho,) * 3))
    b.add_mesh(mesh.make_mesh([[-50, -50, 0], [50, -50, 0], [50, 50, 0],
                               [-50, 50, 0]], [[0, 1, 2], [0, 2, 3]]), m)
    b.add_light(lt_mod.infinite_light(np.ones((8, 16, 3), np.float32)))
    scene = b.build()
    ig = prt.DiffusePRTIntegrator(lmax=4, n_samples=128)
    c_in = prt.project_incident_radiance(scene, (0.0, 0.0, -1.0), 4, 2048)
    img = _render(scene, lambda s, r, d, c: prt.diffuse_li(ig, s, r, d, c,
                                                           c_in),
                  eye=(0, 0, -4), at=(0, 0, 0), fov=30.0, spp=1)
    # plane fills the view; interior pixels see the unoccluded hemisphere
    assert abs(img[..., 0].mean() - rho) < 0.08


def test_whitted_matches_direct_on_diffuse_scene():
    scene = sb.cornell_box().build()
    igw = wh.WhittedIntegrator(max_depth=1)
    igd = di.DirectLightingIntegrator(strategy=di.STRATEGY_ALL, max_depth=1)
    img_w = _render(scene, lambda s, r, d, c: wh.li(igw, s, r, d, c), spp=8)
    img_d = _render(scene, lambda s, r, d, c: di.li(igd, s, r, d, c), spp=8)
    assert np.isfinite(img_w).all()
    # same lighting estimator up to MIS weighting on an area light: means
    # should agree loosely (whitted lacks the BSDF-sampling half of MIS)
    assert abs(img_w.mean() - img_d.mean()) / max(img_d.mean(), 1e-6) < 0.35


def test_photon_shooting_power_accounting():
    """Closed box: nearly all photons deposit; total deposited alpha at the
    first bounce approximates emitted power / n_paths * n_paths."""
    scene = sb.cornell_box(light_scale=10.0).build()
    ig = ph.PhotonMapIntegrator(n_caustic=256, n_indirect=1024,
                                max_photon_depth=2, final_gather=False)
    caustic, direct, indirect = ph.shoot_photons(ig, scene)
    # area light power = pi * A * L; direct map alphas sum to ~that
    A = 0.8 * 0.8 * 2 / 2  # two tris, total quad area 0.8^2
    total_power = np.pi * (0.8 * 0.8) * 10.0
    got = float(jnp.sum(direct.alpha.x + direct.alpha.y
                        + direct.alpha.z)) / 3.0  # 3 identical channels
    assert 0.5 * total_power < got < 1.3 * total_power


def test_photonmap_li_vs_path_cornell():
    """Photon map (no final gather) should land near path tracing."""
    scene = sb.cornell_box().build()
    igp = ph.PhotonMapIntegrator(n_caustic=512, n_indirect=8192,
                                 max_photon_depth=4, final_gather=False,
                                 max_dist=0.25, max_specular_depth=2)
    maps = ph.shoot_photons(igp, scene)
    img_ph = _render(scene,
                     lambda s, r, d, c: ph.li(igp, s, r, d, c, maps), spp=4)
    igpath = pi.PathIntegrator(max_depth=4)
    img_pt = _render(scene,
                     lambda s, r, d, c: pi.li(igpath, s, r, d, c), spp=16)
    assert np.isfinite(img_ph).all()
    # loose: density estimation bias + low stats; compare image means
    assert abs(img_ph.mean() - img_pt.mean()) / img_pt.mean() < 0.5


def test_probes_roundtrip_and_useprobes(tmp_path):
    scene = sb.cornell_box().build()
    igd = di.DirectLightingIntegrator(strategy=di.STRATEGY_ONE, max_depth=1)
    pr = probes_mod.render(scene, lambda s, r, d, c: di.li(igd, s, r, d, c),
                           res=(2, 2, 2), lmax=2, n_samples=32, chunk=4)
    f = str(tmp_path / "probes.npz")
    probes_mod.save(f, pr)
    p2 = probes_mod.load(f)
    assert np.allclose(np.asarray(p2.coeffs), np.asarray(pr.coeffs))
    igu = prt.UseProbesIntegrator(lmax=2)
    img = _render(scene,
                  lambda s, r, d, c: prt.probes_li(igu, s, r, d, c, p2),
                  spp=2)
    assert np.isfinite(img).all() and img.mean() > 0
