"""Ashikhmin-Shirley anisotropic microfacet distribution tests
(anisotropic.dart counterpart; reduces to Blinn at ex == ey)."""
import numpy as np
import jax.numpy as jnp

from dartray_tpu import bsdf as bx
from dartray_tpu.core import math as vm


def _frame(n):
    ns = vm.bcast3(vm.splat3([0.0, 0.0, 1.0]), (n,))
    s = vm.bcast3(vm.splat3([1.0, 0.0, 0.0]), (n,))
    t = vm.bcast3(vm.splat3([0.0, 1.0, 0.0]), (n,))
    return bx.Frame(s=s, t=t, n=ns, ng=ns)


def _params(n, ex, ey):
    p = bx.zero_params(n)
    return p._replace(ks=vm.v3full((n,), (0.8, 0.8, 0.8)),
                      exponent=jnp.full((n,), ex),
                      exponent_v=jnp.full((n,), ey),
                      gloss_fresnel=jnp.zeros((n,), jnp.int32))  # FR_NOOP


def test_isotropic_reduces_to_blinn():
    """ex == ey must reproduce the Blinn D and pdf exactly."""
    n = 64
    rng = np.random.RandomState(0)
    wo = rng.randn(n, 3).astype(np.float32)
    wo[:, 2] = np.abs(wo[:, 2]) + 0.1
    wo /= np.linalg.norm(wo, axis=-1, keepdims=True)
    wi = rng.randn(n, 3).astype(np.float32)
    wi[:, 2] = np.abs(wi[:, 2]) + 0.1
    wi /= np.linalg.norm(wi, axis=-1, keepdims=True)
    wo, wi = vm.from_arr(jnp.asarray(wo)), vm.from_arr(jnp.asarray(wi))
    e = jnp.full((n,), 40.0)
    pdf_a = bx._aniso_pdf(e, e, wo, wi)
    wh = vm.normalize(wo + wi)
    d_a = bx._aniso_d(e, e, wh)
    d_b = bx._blinn_d(e, jnp.abs(wh.z))
    np.testing.assert_allclose(np.asarray(d_a), np.asarray(d_b),
                               rtol=1e-4)
    # pdf matches the closed-form Blinn half-vector pdf
    wodoth = jnp.abs(vm.dot(wo, wh))
    pdf_b = (e + 1.0) * jnp.abs(wh.z) ** e / (
        2.0 * np.pi * 4.0 * wodoth)
    np.testing.assert_allclose(np.asarray(pdf_a), np.asarray(pdf_b),
                               rtol=1e-3)


def test_anisotropic_highlight_direction_dependent():
    """ex >> ey: the lobe is tighter for half-vectors tilted along x than
    along y (substrate with uroughness << vroughness)."""
    n = 2
    frame = _frame(n)
    p = _params(n, ex=1000.0, ey=10.0)
    wo = vm.bcast3(vm.splat3([0.0, 0.0, 1.0]), (n,))
    tilt = 0.25
    wi_x = vm.normalize(vm.bcast3(vm.splat3([2 * tilt, 0.0, 1.0]), (n,)))
    wi_y = vm.normalize(vm.bcast3(vm.splat3([0.0, 2 * tilt, 1.0]), (n,)))
    f_x = float(bx.f(p, frame, wo, wi_x).x[0])
    f_y = float(bx.f(p, frame, wo, wi_y).x[0])
    # tight axis (x, exponent 1000) must fall off much faster
    assert f_x < 0.1 * f_y, (f_x, f_y)


def test_aniso_sample_pdf_consistency():
    """MC: E[ D(wh)*|cos wh| / pdf_h(wh) ] over sampled half-vectors = 1
    (the sampling density matches the claimed pdf up to the wi mapping)."""
    n = 4096
    rng = np.random.RandomState(3)
    u = vm.from_arr2(jnp.asarray(rng.rand(n, 2).astype(np.float32)))
    ex = jnp.full((n,), 80.0)
    ey = jnp.full((n,), 6.0)
    wh = bx._aniso_sample_wh(ex, ey, u)
    # pdf of wh itself: sqrt((ex+1)(ey+1))/(2pi) * cos^e
    costh = jnp.abs(wh.z)
    ds = jnp.maximum(1.0 - costh ** 2, 1e-12)
    e = (ex * wh.x ** 2 + ey * wh.y ** 2) / ds
    pdf_h = jnp.sqrt((ex + 1.0) * (ey + 1.0)) / (2 * np.pi) * costh ** e
    d = bx._aniso_d(ex, ey, wh)
    ratio = np.asarray(d * costh / jnp.maximum(pdf_h, 1e-12))
    # D*cos integrates to 1 over the hemisphere; pdf_h integrates to 1 too
    # -> the MC mean of the ratio under pdf_h is 1
    assert abs(ratio.mean() - 1.0) < 0.05, ratio.mean()
