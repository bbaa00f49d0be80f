"""SAMPLED-spectrum rendering mode (spectrum.dart:32-58 Spectrum.type,
sampled_spectrum.dart): per-wavelength-band radiance transport, distinct
from RGB-primaries transport. NUM_SAMPLES = 3 bands riding the 3-lane color
layout (the reference ships NUM_SAMPLES = 4; the count is a quality knob)."""
import numpy as np
import pytest

from dartray_tpu.core import spectrum as spec
from dartray_tpu.renderers import manager


@pytest.fixture(autouse=True)
def _restore_mode():
    yield
    spec.set_mode("rgb")


def test_band_conversions_roundtrip():
    """Flat spectra keep luminance; RGB->bands->XYZ preserves color."""
    flat = np.ones(3, np.float32)
    xyz = np.asarray(flat @ spec.BANDS_TO_XYZ.T)
    # Y of flat spectrum = 1 up to the CIE tails outside 400-700nm
    assert abs(xyz[1] - 1.0) < 5e-3
    rgb = np.asarray([0.4, 0.5, 0.3], np.float32)
    bands = spec.rgb_to_bands(rgb)
    xyz_b = bands @ spec.BANDS_TO_XYZ.T
    xyz_r = rgb @ np.asarray(spec.RGB_TO_XYZ).T
    np.testing.assert_allclose(xyz_b, xyz_r, atol=2e-3)


def test_spd_to_bands_box_average():
    lam = np.asarray([400.0, 499.0, 501.0, 700.0])
    val = np.asarray([2.0, 2.0, 0.0, 0.0])     # 2 in band 0, ~0 after
    b = np.asarray(spec.spd_to_bands(lam, val))
    assert b[0] > 1.8 and b[1] < 0.15 and b[2] < 0.05, b


_SCENE = """
Film "image" "integer xresolution" [16] "integer yresolution" [16]
Sampler "lowdiscrepancy" "integer pixelsamples" [2]
SurfaceIntegrator "directlighting"
LookAt 0 1 -3  0 0 0  0 1 0
Camera "perspective" "float fov" [40]
WorldBegin
LightSource "distant"
  "spectrum L" [400 0  495 0  505 {L1}  595 {L1}  605 0  700 0]
  "point from" [0 4 -2] "point to" [0 0 0]
Material "matte"
  "spectrum Kd" [400 {K0}  495 {K0}  505 {K1}  595 {K1}  605 0  700 0]
Shape "trianglemesh" "integer indices" [0 1 2 0 2 3]
  "point P" [-4 0 -4  4 0 -4  4 0 4  -4 0 4]
WorldEnd
"""


@pytest.mark.slow
def test_sampled_mode_transports_per_band():
    """A mid-band (500-600nm) illuminant on a reflectance that is 0.8 in
    the 500-600 band and 0.2 in 400-500: SAMPLED mode must reflect with
    the 0.8 band albedo (no cross-band leakage); RGB mode mixes the bands
    through the primaries and lands measurably elsewhere."""
    scene = _SCENE.format(L1=6.0, K0=0.2, K1=0.8)
    img_rgb = manager.render_pbrt(scene)
    spec.set_mode("sampled")
    img_s = manager.render_pbrt(scene)
    assert np.isfinite(img_s).all()
    # analytic per-band transport for the lit floor (Lambertian under a
    # distant light): L_b = Kd_b * L_b * cos(theta) / pi, band by band
    lam = np.asarray([400, 495, 505, 595, 605, 700.0])
    l_b = np.asarray(spec.spd_to_bands(lam, [0, 0, 6, 6, 0, 0.0]))
    k_b = np.asarray(spec.spd_to_bands(lam, [0.2, 0.2, 0.8, 0.8, 0, 0.0]))
    cos_t = 4.0 / np.sqrt(20.0)
    bands = k_b * l_b * cos_t / np.pi
    lum_expect = float(bands @ spec.BANDS_TO_XYZ[1])
    w = np.asarray(spec.RGB_TO_XYZ)[1]
    lum_got = float((img_s[10:14, 4:12] @ w).mean())
    assert abs(lum_got - lum_expect) / lum_expect < 0.05, \
        (lum_got, lum_expect)
    # and the two modes produce measurably different images (the RGB-basis
    # product is a different operator than the per-band product)
    assert np.abs(img_s - img_rgb).mean() > 0.01
