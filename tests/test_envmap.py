"""Infinite-area-light rigor (infinite_area_light.dart:100-131, 190-204):
analytic pdf normalization, sample/pdf consistency, histogram vs
luminance*sin(theta), bilinear lookup."""
import numpy as np
import jax
import jax.numpy as jnp
import pytest

from dartray_tpu import lights as lt_mod
from dartray_tpu.core import spectrum as spec


def _table(seed=0, h=16, w=32):
    rng = np.random.RandomState(seed)
    img = (rng.rand(h, w, 3).astype(np.float32) ** 2) * 3.0
    img[h // 4, w // 3] = 40.0          # a bright texel (sun)
    return lt_mod.build_table([lt_mod.infinite_light(img)],
                              scene_radius=10.0), img


def test_env_pdf_integrates_to_one():
    """MC over uniform sphere directions: E[pdf] * 4pi == 1."""
    lt, _ = _table()
    n = 200_000
    rng = np.random.RandomState(1)
    d = rng.randn(n, 3).astype(np.float32)
    d /= np.linalg.norm(d, axis=-1, keepdims=True)
    pdf = np.asarray(lt_mod.env_pdf(lt, jnp.asarray(d)))
    est = pdf.mean() * 4.0 * np.pi
    assert abs(est - 1.0) < 0.03, est


def test_env_sample_pdf_consistency():
    """pdf returned by the sampler == env_pdf evaluated at the sampled
    direction (up to texel-grid quantization)."""
    lt, _ = _table()
    n = 4096
    rng = np.random.RandomState(2)
    u = jnp.asarray(rng.rand(n, 2).astype(np.float32))
    dir_l, L, pdf_s = lt_mod._env_sample(lt, u)
    pdf_e = np.asarray(lt_mod.env_pdf(lt, dir_l))
    pdf_s = np.asarray(pdf_s)
    ok = pdf_s > 1e-6
    ratio = pdf_e[ok] / pdf_s[ok]
    assert np.median(np.abs(ratio - 1.0)) < 1e-3
    assert (np.abs(ratio - 1.0) < 1e-2).mean() > 0.97


def test_env_sample_histogram_matches_luminance():
    """Chi-square-ish: per-texel sample frequency tracks luminance*sin
    (the Distribution2D construction, infinite_area_light.dart:240-306)."""
    lt, img = _table()
    h, w = img.shape[:2]
    n = 400_000
    rng = np.random.RandomState(3)
    u = jnp.asarray(rng.rand(n, 2).astype(np.float32))
    from dartray_tpu.core import math as vm
    dir_l, _, _ = lt_mod._env_sample(lt, u)
    d = np.asarray(vm.to_arr(dir_l))
    theta = np.arccos(np.clip(d[:, 2], -1, 1))
    phi = np.arctan2(d[:, 1], d[:, 0])
    phi = np.where(phi < 0, phi + 2 * np.pi, phi)
    iu = np.clip((phi / (2 * np.pi) * w).astype(int), 0, w - 1)
    iv = np.clip((theta / np.pi * h).astype(int), 0, h - 1)
    counts = np.zeros((h, w))
    np.add.at(counts, (iv, iu), 1.0)
    lum = img @ np.asarray(spec.RGB_TO_XYZ)[1]
    sin_t = np.sin(np.pi * (np.arange(h) + 0.5) / h)
    target = lum * sin_t[:, None] + 1e-9
    target /= target.sum()
    got = counts / counts.sum()
    # bright texels must be sampled in proportion; overall L1 small
    assert np.abs(got - target).sum() < 0.05
    bright = np.unravel_index(np.argmax(target), target.shape)
    assert got[bright] / target[bright] == pytest.approx(1.0, rel=0.1)


def test_env_bilinear_lookup_interpolates():
    """Le varies smoothly between texel centers (bilinear, not nearest)."""
    h, w = 8, 16
    img = np.zeros((h, w, 3), np.float32)
    img[:, : w // 2] = 1.0              # step in phi
    lt = lt_mod.build_table([lt_mod.infinite_light(img)], scene_radius=10.0)
    # directions straddling the step at phi = pi: sample a few phis around
    phis = np.linspace(np.pi - 0.5, np.pi + 0.5, 9)
    d = np.stack([np.cos(phis), np.sin(phis), np.zeros_like(phis)], -1)
    from dartray_tpu.core import math as vm
    le = np.asarray(vm.to_arr(
        lt_mod.env_le(lt, jnp.asarray(d, jnp.float32))))[:, 0]
    # monotone decreasing through the step, with intermediate values
    assert le[0] > 0.95 and le[-1] < 0.05
    assert ((le > 0.1) & (le < 0.9)).any(), le
