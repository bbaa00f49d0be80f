"""Grid + kd-tree accelerators (grid_accel.dart:33, kdtree_accel.dart:41):
oracle equivalence vs brute force, and end-to-end selection through the
`Accelerator` statement."""
import numpy as np
import jax.numpy as jnp
import pytest

from dartray_tpu.accel import grid as grid_mod, kdtree as kd_mod, \
    traverse as tv
from dartray_tpu.core import math as vm


def _soup(n=300, seed=0):
    rng = np.random.RandomState(seed)
    v0 = rng.randn(n, 3).astype(np.float32)
    e1 = (rng.randn(n, 3) * 0.4).astype(np.float32)
    e2 = (rng.randn(n, 3) * 0.4).astype(np.float32)
    return v0, e1, e2


def _rays(n=400, seed=1):
    rng = np.random.RandomState(seed)
    o = rng.randn(n, 3).astype(np.float32) * 2.0
    d = rng.randn(n, 3).astype(np.float32)
    d /= np.linalg.norm(d, axis=-1, keepdims=True)
    return vm.make_rays(jnp.asarray(o), jnp.asarray(d))


@pytest.mark.parametrize("mod", [grid_mod, kd_mod],
                         ids=["grid", "kdtree"])
def test_alt_accel_matches_bruteforce(mod):
    v0, e1, e2 = _soup()
    acc = mod.build(v0, e1, e2)
    rays = _rays()
    h = mod.intersect(acc, rays)
    ref = tv.brute_force_intersect(jnp.asarray(v0), jnp.asarray(e1),
                                   jnp.asarray(e2), rays)
    assert (np.asarray(h.hit) == np.asarray(ref.hit)).all()
    both = np.asarray(h.hit & ref.hit)
    np.testing.assert_allclose(np.asarray(h.t)[both],
                               np.asarray(ref.t)[both], rtol=1e-4)
    np.testing.assert_array_equal(np.asarray(h.prim)[both],
                                  np.asarray(ref.prim)[both])
    occ = mod.intersect_p(acc, rays)
    assert (np.asarray(occ) == np.asarray(ref.hit)).all()


@pytest.mark.parametrize("name", ["grid", "kdtree"])
def test_accelerator_statement_selects_alt(name):
    from dartray_tpu.scene import parser as parser_mod
    from dartray_tpu.renderers import manager
    scene = f"""
Film "image" "integer xresolution" [12] "integer yresolution" [12]
Sampler "lowdiscrepancy" "integer pixelsamples" [2]
Accelerator "{name}"
SurfaceIntegrator "directlighting" "string strategy" ["one"]
LookAt 0 1 -4  0 0.5 0  0 1 0
Camera "perspective" "float fov" [40]
WorldBegin
Material "matte" "color Kd" [0.6 0.6 0.6]
Shape "sphere" "float radius" [1]
LightSource "point" "point from" [2 4 -2] "color I" [30 30 30]
WorldEnd
"""
    job = parser_mod.parse(scene, log=lambda *a, **k: None)
    assert job.scene.geometry.alt_kind == name
    img = manager.run(job, log=lambda *a, **k: None)
    assert np.isfinite(img).all() and img.mean() > 1e-4
