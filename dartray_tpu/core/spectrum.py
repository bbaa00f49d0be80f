"""Color / spectrum handling as (..., 3) RGB float32 arrays.

TPU-native replacement for lib/core/spectrum.dart (1151 LoC), rgb_color.dart,
xyz_color.dart. The reference factory-switches between RGB/XYZ/SAMPLED modes
globally (spectrum.dart:32-58); we store all radiometric quantities as RGB
channel arrays (SoA over the ray/wavefront dimension), converting through XYZ
only at film accumulation (image_film.dart accumulates XYZ) and for sampled
SPD data at scene-compile time.
"""
from __future__ import annotations

import numpy as np
import jax.numpy as jnp

# PBRT XYZ<->RGB matrices (spectrum.dart:287-298).
XYZ_TO_RGB = np.array([
    [3.240479, -1.537150, -0.498535],
    [-0.969256, 1.875991, 0.041556],
    [0.055648, -0.204043, 1.057311]], np.float32)
RGB_TO_XYZ = np.array([
    [0.412453, 0.357580, 0.180423],
    [0.212671, 0.715160, 0.072169],
    [0.019334, 0.119193, 0.950227]], np.float32)

CIE_Y_INTEGRAL = 106.856895  # spectrum.dart:865


def _mat3(m, c):
    """Apply a 3x3 constant matrix to a color: V3 -> V3 (componentwise
    FMAs, lane-packed) or (..., 3) -> (..., 3)."""
    from . import math as vm
    if isinstance(c, vm.V3):
        return vm.V3(
            float(m[0][0]) * c.x + float(m[0][1]) * c.y + float(m[0][2]) * c.z,
            float(m[1][0]) * c.x + float(m[1][1]) * c.y + float(m[1][2]) * c.z,
            float(m[2][0]) * c.x + float(m[2][1]) * c.y + float(m[2][2]) * c.z)
    return c @ jnp.asarray(m, jnp.float32).T


def rgb_to_xyz(rgb):
    return _mat3(RGB_TO_XYZ, rgb)


def xyz_to_rgb(xyz):
    return _mat3(XYZ_TO_RGB, xyz)


def luminance(c):
    """y() of the spectrum == XYZ Y channel (rgb_color.dart luminance).
    Mode-aware: in SAMPLED mode the channels are band averages."""
    from . import math as vm
    w = BANDS_TO_XYZ[1] if _mode == "sampled" else RGB_TO_XYZ[1]
    if isinstance(c, vm.V3):
        return float(w[0]) * c.x + float(w[1]) * c.y + float(w[2]) * c.z
    return c @ jnp.asarray(w)


def is_black(rgb):
    from . import math as vm
    if isinstance(rgb, vm.V3):
        return (rgb.x == 0.0) & (rgb.y == 0.0) & (rgb.z == 0.0)
    return jnp.all(rgb == 0.0, axis=-1)


def any_nonzero(c):
    """True where any channel is nonzero (jnp.any(c != 0, -1) analog)."""
    from . import math as vm
    if isinstance(c, vm.V3):
        return (c.x != 0.0) | (c.y != 0.0) | (c.z != 0.0)
    return jnp.any(c != 0.0, axis=-1)


def all_finite(c):
    from . import math as vm
    if isinstance(c, vm.V3):
        return (jnp.isfinite(c.x) & jnp.isfinite(c.y) & jnp.isfinite(c.z))
    return jnp.all(jnp.isfinite(c), axis=-1)


def blackbody(wavelengths_nm, temperature):
    """Planck's law emission (spectrum.dart Blackbody); host-side, numpy."""
    w = np.asarray(wavelengths_nm, np.float64) * 1e-9
    h = 6.62606957e-34
    c = 299792458.0
    kb = 1.3806488e-23
    return (2.0 * h * c * c) / (w ** 5 * (np.expm1(h * c / (w * kb * temperature))))


# --- CIE color matching + sampled-SPD -> RGB conversion (host-side) --------
# CIE 1931 standard observer sampled every 5nm from 360-830 would be the full
# table; we use a compact 10nm-resolution table (public CIE data) adequate for
# converting measured SPDs (metal eta/k, light SPDs) to RGB at compile time.
_CIE_LAMBDA = np.arange(380.0, 781.0, 5.0)
# Analytic multi-lobe gaussian fit of CIE 1931 observer (Wyman et al. 2013).


def _g(x, mu, s1, s2):
    t = (x - mu) * np.where(x < mu, 1.0 / s1, 1.0 / s2)
    return np.exp(-0.5 * t * t)


def cie_xyz_fit(lam):
    lam = np.asarray(lam, np.float64)
    x = (1.056 * _g(lam, 599.8, 37.9, 31.0)
         + 0.362 * _g(lam, 442.0, 16.0, 26.7)
         - 0.065 * _g(lam, 501.1, 20.4, 26.2))
    y = (0.821 * _g(lam, 568.8, 46.9, 40.5)
         + 0.286 * _g(lam, 530.9, 16.3, 31.1))
    z = (1.217 * _g(lam, 437.0, 11.8, 36.0)
         + 0.681 * _g(lam, 459.0, 26.0, 13.8))
    return np.stack([x, y, z], axis=-1)


def spd_to_rgb(lambdas, values, illuminant=False):
    """Piecewise-linear SPD -> RGB (spectrum.dart fromSampled semantics).

    Resamples the SPD on a 5nm grid, integrates against the CIE observer,
    and normalizes by the CIE-Y integral. In the reference's RGB mode this
    normalization is the SAME for reflectances and illuminants
    (rgb_color.dart:61-92 setSampled always divides by yint; the
    SPECTRUM_REFLECTANCE/ILLUMINANT distinction only affects the RGB ->
    spectrum direction, see rgb_to_bands) — `illuminant` is accepted for
    API symmetry and intentionally has no effect here.
    """
    del illuminant  # no-op in RGB mode, matching rgb_color.dart setSampled
    lambdas = np.asarray(lambdas, np.float64)
    values = np.asarray(values, np.float64)
    order = np.argsort(lambdas)
    lambdas, values = lambdas[order], values[order]
    v = np.interp(_CIE_LAMBDA, lambdas, values)
    cmf = cie_xyz_fit(_CIE_LAMBDA)
    xyz = (v[:, None] * cmf).sum(axis=0) * 5.0
    xyz /= (cmf[:, 1].sum() * 5.0)
    rgb = XYZ_TO_RGB.astype(np.float64) @ xyz
    return jnp.asarray(rgb, jnp.float32)


# --- SAMPLED-spectrum rendering mode ---------------------------------------
# Counterpart of the reference's global Spectrum.type switch
# (spectrum.dart:32-58) and SampledSpectrum (sampled_spectrum.dart:23-390).
# TPU redesign: the channel dimension of every radiometric array becomes
# N_BANDS spectral band averages instead of RGB primaries, so the ENTIRE
# wavefront pipeline transports per-wavelength-band radiance with zero
# added cost — the 3-channel arrays are reinterpreted, not widened. DartRay's
# SampledSpectrum.NUM_SAMPLES is 4; here N_BANDS is FIXED at 3 so the band
# dimension rides the existing 3-channel color layout — a deliberate
# fidelity trade (one band fewer than the reference), not a configurable
# knob: every color table in the pipeline is 3-channel.
# Transport multiplies per-band (physically meaningful for
# metal eta/k and peaky illuminants, unlike RGB-primaries products); bands
# convert to XYZ only at film accumulation.

N_BANDS = 3
BAND_EDGES = np.array([400.0, 500.0, 600.0, 700.0])   # nm

_mode = "rgb"


def set_mode(mode: str):
    """Global spectral representation switch ("rgb" | "sampled"),
    Spectrum.type semantics. Set BEFORE parsing/building a scene — parse-
    time conversions bake the representation into the scene tables."""
    global _mode
    assert mode in ("rgb", "sampled"), mode
    _mode = mode


def mode() -> str:
    return _mode


def _bands_cmf():
    cmf = cie_xyz_fit(_CIE_LAMBDA)
    m = np.zeros((3, N_BANDS))
    for b in range(N_BANDS):
        sel = (_CIE_LAMBDA >= BAND_EDGES[b]) & (_CIE_LAMBDA < BAND_EDGES[b + 1])
        m[:, b] = cmf[sel].sum(axis=0) * 5.0
    # flat spectrum of 1 -> Y = 1 (matches RGB mode's (1,1,1) luminance)
    return m / (cmf[:, 1].sum() * 5.0)


BANDS_TO_XYZ = _bands_cmf().astype(np.float32)          # (3 xyz, 3 bands)
_XYZ_TO_BANDS = np.linalg.inv(BANDS_TO_XYZ).astype(np.float32)


def spd_to_bands(lambdas, values, illuminant=False):
    """Piecewise-linear SPD -> per-band averages (SampledSpectrum
    fromSampled, sampled_spectrum.dart)."""
    lambdas = np.asarray(lambdas, np.float64)
    values = np.asarray(values, np.float64)
    order = np.argsort(lambdas)
    lambdas, values = lambdas[order], values[order]
    grid = np.arange(BAND_EDGES[0], BAND_EDGES[-1], 2.0)
    v = np.interp(grid, lambdas, values)
    out = np.zeros(N_BANDS)
    for b in range(N_BANDS):
        sel = (grid >= BAND_EDGES[b]) & (grid < BAND_EDGES[b + 1])
        out[b] = v[sel].mean()
    return jnp.asarray(out, jnp.float32)


def _d65_bands():
    """CIE D65 illuminant band averages, normalized to luminance 1 (host).
    Compact D65 relative SPD at 20nm from 400-700nm (public CIE data)."""
    lam = np.arange(400.0, 701.0, 20.0)
    d65 = np.array([82.75, 93.43, 104.86, 117.01, 115.92, 114.86, 108.81,
                    104.79, 107.69, 104.41, 104.05, 100.00, 96.33, 95.79,
                    88.69, 90.01], np.float64)
    out = np.zeros(N_BANDS)
    for b in range(N_BANDS):
        sel = (lam >= BAND_EDGES[b]) & (lam < BAND_EDGES[b + 1])
        out[b] = d65[sel].mean()
    y = float(BANDS_TO_XYZ[1] @ out)
    return (out / max(y, 1e-12)).astype(np.float32)


_D65_BANDS = _d65_bands()
# illuminant RGB -> bands: white maps to the D65 band shape (the 3-band
# analog of sampled_spectrum.dart:181-210's illuminant basis set), XYZ
# preserved exactly: M = diag(d65) @ inv(BANDS_TO_XYZ @ diag(d65)) @ RGB2XYZ
_XYZ_TO_BANDS_ILLUM = (np.diag(_D65_BANDS)
                       @ np.linalg.inv(BANDS_TO_XYZ @ np.diag(_D65_BANDS))
                       ).astype(np.float32)


def rgb_to_bands(rgb, illuminant=False):
    """RGB -> 3-band spectrum with the same XYZ (a Smits-style basis
    reduced to N_BANDS; exact in color, clamped nonneg in energy).

    illuminant=True uses the D65-shaped basis — the reference converts
    illuminant RGB through a different basis set than reflectance RGB
    (sampled_spectrum.dart:142-210): a white ILLUMINANT has the D65 band
    shape while a white REFLECTANCE is a flat spectrum."""
    arr = np.asarray(rgb, np.float32)
    xyz = arr @ RGB_TO_XYZ.T
    basis = _XYZ_TO_BANDS_ILLUM if illuminant else _XYZ_TO_BANDS
    return np.maximum(xyz @ basis.T, 0.0)


def to_xyz(c):
    """Radiance channels -> XYZ under the current global mode (the film
    accumulation conversion, image_film.dart:99-185)."""
    if _mode == "sampled":
        return _mat3(BANDS_TO_XYZ, c)
    return rgb_to_xyz(c)
