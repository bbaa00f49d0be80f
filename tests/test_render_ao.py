"""End-to-end ambient-occlusion render test (driver config #1 shape:
AO integrator, triangle-mesh sphere, pinhole camera)."""
import numpy as np
import pytest

from dartray_tpu.scene import mesh, types as st
from dartray_tpu.core import transform as tr
from dartray_tpu import cameras, samplers
from dartray_tpu.integrators import ao
from dartray_tpu.renderers import sampler as rend


@pytest.fixture(scope="module")
def ao_image():
    sph = mesh.sphere(radius=1.0, nu=32, nv=16).transformed(
        np.asarray(tr.translate([0, 1.0, 0]).m))
    plane = mesh.make_mesh(
        [[-10, 0, -10], [10, 0, -10], [10, 0, 10], [-10, 0, 10]],
        [[0, 1, 2], [0, 2, 3]])
    geom = st.compile_geometry([sph, plane])
    scene = st.CompiledScene(geom, None, None, None, None)
    c2w = tr.look_at([0, 2.2, -5.5], [0, 0.8, 0], [0, 1, 0])
    W = H = 64
    cam = cameras.perspective(c2w, 45.0, W, H)
    smp = samplers.make_sampler("lowdiscrepancy", spp=4)
    ig = ao.AOIntegrator(n_samples=64)
    li = lambda s, r, d, c: ao.li(ig, s, r, d, c)
    return rend.render(scene, cam, smp, li, W, H)


def test_ao_structure(ao_image):
    g = ao_image[..., 0]
    assert ao_image.shape == (64, 64, 3)
    assert np.isfinite(ao_image).all()
    # channels equal (AO is gray)
    np.testing.assert_allclose(ao_image[..., 0], ao_image[..., 1], atol=1e-5)
    # sky (top rows) is black — no lights, missed rays carry no radiance
    assert g[:6].max() == 0.0
    # distant floor is mostly unoccluded
    assert g[60, 4] > 0.85
    # contact region under the sphere is clearly darker than open floor
    assert g[44, 32] < g[60, 4] - 0.2
    # sphere top is mostly open
    assert g[18, 32] > 0.8


def test_ao_converges_with_samples(ao_image):
    """More AO samples must reduce noise (std in a flat floor region)."""
    # flat far-floor region from the module render (64 samples)
    region = ao_image[58:63, 2:12, 0]
    assert region.std() < 0.08
