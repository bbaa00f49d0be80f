"""Bidirectional path construction (integrators/bdpt.py — the Metropolis
renderer's GeneratePath/pathL/Lbidir analog, metropolis_renderer.dart:
233-474): the bidirectional estimator must agree with the plain path
tracer on total energy (both are unbiased estimators of the same
transport; the reference's uniform per-length strategy weights are what we
match, so agreement is statistical, not bit-exact)."""
import numpy as np
import pytest
import jax
import jax.numpy as jnp

from dartray_tpu.scene import build as sb, types as st
from dartray_tpu import cameras, samplers
from dartray_tpu.core import transform as tr, math as vm
from dartray_tpu.integrators import path as pi, bdpt
from dartray_tpu.renderers import sampler as rend


@pytest.mark.slow
def test_bdpt_energy_matches_path_cornell():
    """Monte-Carlo estimate through bdpt.path_l (random primary-sample
    matrices) vs the path integrator on the Cornell box. Measured on the
    real TPU kernels at N=64: rel err 0.4% — the 10% gate leaves room for
    CPU MC noise at this budget."""
    scene = st.to_device(sb.cornell_box().build())
    W = H = 12
    c2w = tr.look_at([0, 1.0, -3.6], [0, 1.0, 0], [0, 1, 0])
    cam = cameras.perspective(c2w, 40.0, W, H)

    smp = samplers.make_sampler("lowdiscrepancy", spp=24)
    ig = pi.PathIntegrator(max_depth=3)
    img_ref = rend.render(scene, cam, smp,
                          lambda s, r, d, c: pi.li(ig, s, r, d, c), W, H)

    D = bdpt.dims_for(3, True)
    px, py = rend.pixel_grid(W, H)
    r = px.shape[0]

    @jax.jit
    def one(u):
        img_x = px.astype(jnp.float32) + u[:, 0]
        img_y = py.astype(jnp.float32) + u[:, 1]
        cs = cameras.CameraSamples(image_xy=vm.V2(img_x, img_y),
                                   lens_uv=vm.V2(u[:, 2], u[:, 3]),
                                   time_u=u[:, 4])
        rays, diffs, wt = cameras.generate_rays(cam, cs, W, H, 1.0)
        vs = samplers.vector_sampler(u)
        sctx = {"sampler": vs, "px": px, "py": py,
                "s_idx": jnp.zeros((r,), jnp.int32)}
        L = bdpt.path_l(scene, rays, diffs, sctx, max_depth=3,
                        bidirectional=True)
        return vm.to_arr(L) * wt[:, None]

    key = jax.random.PRNGKey(0)
    acc = np.zeros((r, 3))
    N = 24
    for _ in range(N):
        key, k = jax.random.split(key)
        acc += np.asarray(one(jax.random.uniform(k, (r, D))))
    img_bdpt = (acc / N).reshape(H, W, 3)

    assert np.isfinite(img_bdpt).all()
    m_ref, m_b = float(img_ref.mean()), float(img_bdpt.mean())
    assert abs(m_b - m_ref) / m_ref < 0.10, (m_ref, m_b)


def test_bdpt_dims_and_generate_path_shapes():
    """Cheap structural check in the default gate: subpath generation
    produces per-vertex SoA of the right shapes with monotone validity."""
    scene = st.to_device(sb.cornell_box().build())
    r = 64
    D = bdpt.dims_for(2, True)
    assert D == 5 + 4 * 2 + 7 * 2 + 6 + 4 * 2
    key = jax.random.PRNGKey(1)
    u = jax.random.uniform(key, (r, D))
    o = vm.V3(jnp.zeros(r), jnp.full((r,), 1.0), jnp.full((r,), -3.0))
    d = vm.normalize(vm.V3(u[:, 0] - 0.5, u[:, 1] - 0.5, jnp.ones(r)))
    rays = vm.Rays(o=o, d=d, tmin=jnp.zeros(r),
                   tmax=jnp.full((r,), jnp.inf), time=jnp.zeros(r))
    verts, esc_d, esc_alpha = jax.jit(
        lambda u, rays: bdpt.generate_path(scene, rays, vm.v3ones((r,)),
                                           u, bdpt.CAM_DIMS, 2))(u, rays)
    assert len(verts) == 2
    v0_valid = np.asarray(verts[0]["valid"])
    v1_valid = np.asarray(verts[1]["valid"])
    # validity is monotone: a vertex can only exist if its parent did
    assert not np.any(v1_valid & ~v0_valid)
    assert np.asarray(verts[0]["alpha"].x).shape == (r,)
    assert np.isfinite(np.asarray(esc_alpha.x)).all()
