"""Measured-BRDF pipeline: MERL binary reader, .brdf irregular resampling,
half-angle lobe evaluation (regular_halfangle_brdf.dart:23-81,
measured_material.dart:56-231)."""
import io
import struct

import numpy as np
import jax.numpy as jnp

from dartray_tpu import bsdf as bx
from dartray_tpu import materials as mat_mod
from dartray_tpu.io import merl
from dartray_tpu.renderers import manager


def synth_merl_bytes(nth=4, ntd=4, npd=8, value=(0.3, 0.5, 0.7)):
    """A constant-table MERL file (values pre-divided by the read scales so
    the loaded table equals `value`)."""
    n = nth * ntd * npd
    buf = io.BytesIO()
    buf.write(struct.pack("<3i", nth, ntd, npd))
    for c in range(3):
        chan = np.full(n, value[c] / merl.MERL_SCALES[c], "<f8")
        buf.write(chan.tobytes())
    return buf.getvalue()


def test_merl_reader_constant():
    data = merl.read_merl(synth_merl_bytes())
    assert data.shape == (4, 4, 8, 3)
    assert np.allclose(data[..., 0], 0.3, atol=1e-6)
    assert np.allclose(data[..., 2], 0.7, atol=1e-6)


def test_measured_lobe_constant_and_reciprocal():
    table = mat_mod.build_table(
        [mat_mod.measured(merl.read_merl(synth_merl_bytes()), key="k")])
    assert table.has_measured
    params = mat_mod.eval_params(table, jnp.zeros((4,), jnp.int32))
    rng = np.random.default_rng(0)
    wo = rng.normal(size=(4, 3)); wo[:, 2] = np.abs(wo[:, 2]) + 0.1
    wi = rng.normal(size=(4, 3)); wi[:, 2] = np.abs(wi[:, 2]) + 0.1
    wo /= np.linalg.norm(wo, axis=1, keepdims=True)
    wi /= np.linalg.norm(wi, axis=1, keepdims=True)
    from dartray_tpu.core import math as vm
    wo_v = vm.from_arr(jnp.asarray(wo, jnp.float32))
    wi_v = vm.from_arr(jnp.asarray(wi, jnp.float32))
    f1 = np.asarray(vm.to_arr(bx.measured_f(params.meas, wo_v, wi_v)))
    f2 = np.asarray(vm.to_arr(bx.measured_f(params.meas, wi_v, wo_v)))
    assert np.allclose(f1, [0.3, 0.5, 0.7], atol=1e-5)
    # reciprocity is structural in the half-angle parameterization
    assert np.allclose(f1, f2, atol=1e-6)


def test_brdf_text_resample_constant():
    """Constant-value irregular samples resample to a constant grid."""
    rng = np.random.default_rng(1)
    lines = ["3 450 550 650"]
    for _ in range(200):
        ti, to = rng.uniform(0, np.pi / 2, 2)
        pi_, po = rng.uniform(0, 2 * np.pi, 2)
        lines.append(f"{ti} {pi_} {to} {po} 0.4 0.4 0.4")
    grid = merl.read_brdf_text("\n".join(lines), grid=(8, 8, 8))
    assert grid.shape == (8, 8, 8, 3)
    assert np.allclose(grid, 0.4, atol=1e-3)


def test_measured_material_end_to_end(tmp_path):
    f = tmp_path / "gold.merl"
    f.write_bytes(synth_merl_bytes(value=(0.8, 0.6, 0.2)))
    scene = f"""
Film "image" "integer xresolution" [16] "integer yresolution" [16]
Sampler "lowdiscrepancy" "integer pixelsamples" [2]
SurfaceIntegrator "directlighting"
LookAt 0 0 -3  0 0 0  0 1 0
Camera "perspective" "float fov" [35]
WorldBegin
Material "measured" "string filename" ["{f}"]
Shape "sphere" "float radius" [0.8]
AttributeBegin
  LightSource "point" "color I" [8 8 8] "point from" [0 0 -4]
AttributeEnd
WorldEnd
"""
    img = manager.render_pbrt(scene)
    assert np.isfinite(img).all()
    center = img[6:10, 6:10]
    assert center.mean() > 0.0
    # gold-ish: R channel brighter than B by roughly the table ratio
    assert center[..., 0].mean() > 2.0 * center[..., 2].mean()
