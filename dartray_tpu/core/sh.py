"""Real spherical harmonics over direction wavefronts.

TPU-native replacement for lib/core/spherical_harmonics.dart (SH basis
evaluation up to arbitrary lmax :32, Terms :27, MC radiance projection
:145-172, ReduceRinging windowing :219, ConvolveCosTheta :527). The
reference's per-direction scalar recurrences become batched (R, terms)
evaluation with *static* Python loops over (l, m) — lmax is a compile-time
constant so XLA unrolls and fuses the whole basis into one elementwise block.

Rotation (spherical_harmonics.dart:228,782 ZYZ) is provided host-side as a
dense per-band matrix (numpy, Ivanic-Ruedenberg recurrence) — probes and PRT
matrices are host-prepared; per-shading-point frame changes are instead
handled by evaluating the basis in the rotated frame directly (mathematically
identical, gather-free on device).
"""
from __future__ import annotations

import math

import numpy as np
import jax.numpy as jnp


def n_terms(lmax: int) -> int:
    """SHTerms (spherical_harmonics.dart:27)."""
    return (lmax + 1) * (lmax + 1)


def index(l: int, m: int) -> int:
    """SHIndex: flat index of (l, m), m in [-l, l]."""
    return l * l + l + m


def _K(l: int, m: int) -> float:
    m = abs(m)
    num = (2 * l + 1) * math.factorial(l - m)
    den = 4.0 * math.pi * math.factorial(l + m)
    return math.sqrt(num / den)


def eval_basis(w, lmax: int):
    """Batched real SH basis: w (R, 3) unit dirs -> (R, n_terms(lmax)).

    PBRT SHEvaluate semantics (z = cos theta polar axis); static recurrence
    unrolled over l, m.
    """
    if hasattr(w, "x"):
        x, y, z = w.x, w.y, w.z
    else:
        x, y, z = w[..., 0], w[..., 1], w[..., 2]
    ct = jnp.clip(z, -1.0, 1.0)
    s2 = jnp.maximum(1.0 - ct * ct, 0.0)
    st = jnp.sqrt(s2)
    # phi basis via recurrence on (cos m phi, sin m phi):
    # cos/sin of phi from x, y (guard the pole)
    r_inv = 1.0 / jnp.maximum(st, 1e-12)
    cp1 = jnp.where(st < 1e-12, 1.0, x * r_inv)
    sp1 = jnp.where(st < 1e-12, 0.0, y * r_inv)

    out = [None] * n_terms(lmax)
    # associated Legendre P_l^m(ct) by recurrence, one m-column at a time
    cm, sm = jnp.ones_like(ct), jnp.zeros_like(ct)   # cos(0),sin(0)
    pmm = jnp.ones_like(ct)                          # P_m^m with (1-x^2)^{m/2}
    for m in range(lmax + 1):
        if m > 0:
            cm, sm = cm * cp1 - sm * sp1, sm * cp1 + cm * sp1
            pmm = pmm * (-(2 * m - 1)) * st
        p_prev2 = pmm                                 # P_m^m
        for l in range(m, lmax + 1):
            if l == m:
                p = pmm
            elif l == m + 1:
                p = ct * (2 * m + 1) * pmm
                p_prev1 = p
            else:
                p = ((2 * l - 1) * ct * p_prev1
                     - (l + m - 1) * p_prev2) / (l - m)
                p_prev2, p_prev1 = p_prev1, p
            k = _K(l, m)
            if m == 0:
                out[index(l, 0)] = k * p
            else:
                s2k = math.sqrt(2.0) * k
                out[index(l, m)] = s2k * cm * p
                out[index(l, -m)] = s2k * sm * p
        # keep P_{m+1}^{m+1} seed correct: pmm only updated at loop head
    return jnp.stack(out, axis=-1)


def project_directions(dirs, values, weights, lmax: int):
    """MC-project sampled radiance onto SH: sum_i w_i * v_i * Y(dir_i).

    dirs (N, 3), values (N, C), weights (N,) = (4pi/N for uniform sphere)...
    returns (n_terms, C) coefficients (SHProjectIncidentDirectRadiance
    analog, spherical_harmonics.dart:145).
    """
    Y = eval_basis(dirs, lmax)                       # (N, T)
    return jnp.einsum("nt,nc,n->tc", Y, values, weights)


def convolve_cos_theta(coeffs, lmax: int):
    """Convolve SH coefficients with the clamped-cosine kernel
    (ConvolveCosTheta, spherical_harmonics.dart:527). Band scale A_hat_l
    (Ramamoorthi-Hanrahan): A_0 = pi, A_1 = 2pi/3, odd l > 1 -> 0,
    even l -> 2pi (-1)^{l/2-1}/((l+2)(l-1)) * l!/(2^l ((l/2)!)^2), so that
    E(n) = sum A_hat_l c_lm Y_lm(n) is the irradiance (E = pi for unit
    constant radiance)."""
    scale = np.zeros(n_terms(lmax), np.float32)
    for l in range(lmax + 1):
        if l == 0:
            a = math.pi
        elif l == 1:
            a = 2.0 * math.pi / 3.0
        elif l % 2 == 1:
            a = 0.0
        else:
            h = l // 2
            a = (2.0 * math.pi * (-1.0) ** (h - 1) / ((l + 2) * (l - 1))
                 * math.factorial(l) / (2 ** l * math.factorial(h) ** 2))
        for m in range(-l, l + 1):
            scale[index(l, m)] = a
    sc = jnp.asarray(scale)
    return coeffs * sc.reshape((-1,) + (1,) * (coeffs.ndim - 1))


def reduce_ringing(coeffs, lmax: int, lam: float = 0.005):
    """Tikhonov windowing (SHReduceRinging, spherical_harmonics.dart:219):
    band l scaled by 1/(1 + lam * l^2 * (l+1)^2)."""
    scale = np.zeros(n_terms(lmax), np.float32)
    for l in range(lmax + 1):
        s = 1.0 / (1.0 + lam * l * l * (l + 1.0) * (l + 1.0))
        for m in range(-l, l + 1):
            scale[index(l, m)] = s
    sc = jnp.asarray(scale)
    return coeffs * sc.reshape((-1,) + (1,) * (coeffs.ndim - 1))


# --------------------------------------------------------------------------
# Host-side rotation (spherical_harmonics.dart:228,782) via exact quadrature.
# --------------------------------------------------------------------------

def _quadrature_dirs(lmax: int):
    """Spherical quadrature exact for polynomials of degree 2*lmax:
    Gauss-Legendre nodes in cos(theta) x uniform phi. Returns (dirs (N,3),
    weights (N,)) with sum w = 4pi."""
    n_ct = 2 * lmax + 2
    n_ph = 4 * lmax + 4
    ct, wct = np.polynomial.legendre.leggauss(n_ct)
    ph = (np.arange(n_ph) + 0.5) * (2.0 * np.pi / n_ph)
    st = np.sqrt(np.maximum(1.0 - ct * ct, 0.0))
    d = np.stack(np.broadcast_arrays(
        st[:, None] * np.cos(ph)[None, :],
        st[:, None] * np.sin(ph)[None, :],
        ct[:, None] * np.ones_like(ph)[None, :]), axis=-1).reshape(-1, 3)
    w = np.broadcast_to(wct[:, None] * (2.0 * np.pi / n_ph),
                        (n_ct, n_ph)).reshape(-1)
    return d, w


def rotation_matrix(R3: np.ndarray, lmax: int) -> np.ndarray:
    """Dense (T, T) SH rotation matrix for a 3x3 rotation (host, numpy).

    Built by exact quadrature: M[i, j] = int Y_i(R d) Y_j(d) dOmega, which the
    Gauss-Legendre x uniform-phi rule integrates exactly for degree <= 2*lmax.
    Equivalent to the reference's ZYZ recurrence but immune to its sign/index
    pitfalls."""
    d, w = _quadrature_dirs(lmax)
    Y = np.asarray(eval_basis(jnp.asarray(d, jnp.float32), lmax))
    Yr = np.asarray(eval_basis(
        jnp.asarray(d @ np.asarray(R3, np.float64).T, jnp.float32), lmax))
    return (Yr * w[:, None]).T @ Y


def rotate(coeffs: np.ndarray, R3: np.ndarray, lmax: int) -> np.ndarray:
    """Rotate host-side SH coefficient vector(s) (T,) or (T, C)."""
    M = rotation_matrix(R3, lmax)
    return (M @ np.asarray(coeffs, np.float64)).astype(
        np.asarray(coeffs).dtype)
