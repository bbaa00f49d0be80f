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


def rgb_to_xyz(rgb):
    return rgb @ jnp.asarray(RGB_TO_XYZ).T


def xyz_to_rgb(xyz):
    return xyz @ jnp.asarray(XYZ_TO_RGB).T


def luminance(rgb):
    """y() of the spectrum == XYZ Y channel (rgb_color.dart luminance)."""
    w = jnp.asarray(RGB_TO_XYZ[1])
    return rgb @ w


def is_black(rgb):
    return jnp.all(rgb == 0.0, axis=-1)


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
    normalizes (by CIE_Y_INTEGRAL for illuminants; reflectances normalize so
    that a constant-1 SPD maps to RGB(1,1,1)).
    """
    lambdas = np.asarray(lambdas, np.float64)
    values = np.asarray(values, np.float64)
    order = np.argsort(lambdas)
    lambdas, values = lambdas[order], values[order]
    v = np.interp(_CIE_LAMBDA, lambdas, values)
    cmf = cie_xyz_fit(_CIE_LAMBDA)
    xyz = (v[:, None] * cmf).sum(axis=0) * 5.0
    if illuminant:
        xyz /= (cmf[:, 1].sum() * 5.0)
    else:
        xyz /= (cmf[:, 1].sum() * 5.0)
    rgb = XYZ_TO_RGB.astype(np.float64) @ xyz
    return jnp.asarray(rgb, jnp.float32)
