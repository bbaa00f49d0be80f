"""Multi-device sharding tests on the 8-device virtual CPU mesh
(SURVEY §4: DP/tile sharding testable without TPUs)."""
import numpy as np
import jax
import pytest

from dartray_tpu.scene import build as sb, mesh
from dartray_tpu.core import transform as tr
from dartray_tpu import cameras, samplers, materials as mat_mod, \
    lights as lt_mod
from dartray_tpu.integrators import path as pi
from dartray_tpu.parallel import mesh as pmesh
from dartray_tpu.renderers import sampler as rend


def _scene():
    b = sb.SceneBuilder()
    m = b.add_material(mat_mod.matte(kd=(0.5,) * 3))
    b.add_mesh(mesh.sphere(radius=1.0, nu=16, nv=8), m)
    b.add_mesh(mesh.make_mesh([[-5, -1.2, -5], [5, -1.2, -5], [5, -1.2, 5],
                               [-5, -1.2, 5]], [[0, 1, 2], [0, 2, 3]]), m)
    b.add_light(lt_mod.infinite_light(
        np.ones((4, 8, 3), np.float32) * [[[1.0, 0.8, 0.6]]]))
    return b.build()


@pytest.mark.parametrize("shape", [(8, 1), (4, 2), (2, 2)])
def test_sharded_matches_single(shape):
    """N-device render must match the single-device render (same sample keys
    -> identical up to f32 reduction order)."""
    scene = _scene()
    W = H = 16
    c2w = tr.look_at([0, 0.5, -4], [0, 0, 0], [0, 1, 0])
    cam = cameras.perspective(c2w, 35.0, W, H)
    smp = samplers.make_sampler("lowdiscrepancy", spp=4)
    ig = pi.PathIntegrator(max_depth=3)
    li = lambda s, r, d, c: pi.li(ig, s, r, d, c)

    ref = rend.render(scene, cam, smp, li, W, H)
    m = pmesh.make_device_mesh(*shape)
    img = pmesh.render_sharded(scene, cam, smp, li, W, H, m)
    np.testing.assert_allclose(img, ref, rtol=2e-3, atol=2e-4)


def test_mesh_uses_all_devices():
    assert len(jax.devices()) == 8
    m = pmesh.make_device_mesh(4, 2)
    assert m.shape == {"tiles": 4, "spp": 2}


def test_sharded_band_compose_bitexact_box():
    """Tile-local band films (box filter -> disjoint bands, no margin):
    the composed sharded image must be BIT-exact vs single-device (every
    sample keyed by (pixel, s_idx, dim), deposits to disjoint pixels)."""
    scene = _scene()
    W = H = 16
    c2w = tr.look_at([0, 0.5, -4], [0, 0, 0], [0, 1, 0])
    cam = cameras.perspective(c2w, 35.0, W, H)
    smp = samplers.make_sampler("lowdiscrepancy", spp=2)
    ig = pi.PathIntegrator(max_depth=2)
    li = lambda s, r, d, c: pi.li(ig, s, r, d, c)
    ref = rend.render(scene, cam, smp, li, W, H)
    m = pmesh.make_device_mesh(4, 1)   # tiles only: no spp reduction order
    img = pmesh.render_sharded(scene, cam, smp, li, W, H, m)
    np.testing.assert_array_equal(img, ref)


@pytest.mark.slow
def test_sharded_gaussian_margin_compose():
    """Wide (gaussian) filter: footprints spill across band edges into the
    margin rows; overlap composition must reproduce the unsharded film."""
    scene = _scene()
    W = H = 16
    c2w = tr.look_at([0, 0.5, -4], [0, 0, 0], [0, 1, 0])
    cam = cameras.perspective(c2w, 35.0, W, H)
    smp = samplers.make_sampler("lowdiscrepancy", spp=2)
    ig = pi.PathIntegrator(max_depth=2)
    li = lambda s, r, d, c: pi.li(ig, s, r, d, c)
    ref = rend.render(scene, cam, smp, li, W, H, filter_name="gaussian")
    m = pmesh.make_device_mesh(4, 2)
    img = pmesh.render_sharded(scene, cam, smp, li, W, H, m,
                               filter_name="gaussian")
    np.testing.assert_allclose(img, ref, rtol=2e-3, atol=2e-4)


def test_checkpoint_kill_and_resume(tmp_path):
    """Failure recovery: render killed after 2/4 waves resumes from the
    checkpoint and produces the EXACT uninterrupted image."""
    from dartray_tpu import film as film_mod  # noqa: F401
    scene = _scene()
    W = H = 12
    c2w = tr.look_at([0, 0.5, -4], [0, 0, 0], [0, 1, 0])
    cam = cameras.perspective(c2w, 35.0, W, H)
    smp = samplers.make_sampler("lowdiscrepancy", spp=4)
    ig = pi.PathIntegrator(max_depth=2)
    li = lambda s, r, d, c: pi.li(ig, s, r, d, c)
    ref = rend.render(scene, cam, smp, li, W, H)
    ck = str(tmp_path / "film.ckpt.npz")

    class Die(Exception):
        pass

    def killer(s, spp, film):
        # s is the 1-based completed-wave count; the wave-2 checkpoint is
        # written after progress(2), so kill on wave 3
        if s > 2:
            raise Die()

    with pytest.raises(Die):
        rend.render(scene, cam, smp, li, W, H, checkpoint_path=ck,
                    checkpoint_every=2, progress=killer)
    import os
    assert os.path.exists(ck)
    img = rend.render(scene, cam, smp, li, W, H, checkpoint_path=ck,
                      checkpoint_every=2)
    np.testing.assert_array_equal(img, ref)


def test_partial_output_on_failure():
    """Failure detection: a mid-render error with on_error='partial'
    returns the image accumulated so far instead of raising
    (render_manager.dart:134-140 worker-error semantics)."""
    scene = _scene()
    W = H = 12
    c2w = tr.look_at([0, 0.5, -4], [0, 0, 0], [0, 1, 0])
    cam = cameras.perspective(c2w, 35.0, W, H)
    smp = samplers.make_sampler("lowdiscrepancy", spp=4)
    ig = pi.PathIntegrator(max_depth=2)
    li = lambda s, r, d, c: pi.li(ig, s, r, d, c)

    logs = []

    def boom(s, spp, film):
        if s >= 2:
            raise RuntimeError("simulated worker failure")

    img = rend.render(scene, cam, smp, li, W, H, progress=boom,
                      on_error="partial", log=logs.append)
    assert np.isfinite(img).all() and img.mean() > 0
    assert any("partial" in m for m in logs)
