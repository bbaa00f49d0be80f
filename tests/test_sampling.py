"""Sampling-core tests: (0,2)-sequence properties, distributions, MIS
heuristics (reference algorithms: lib/core/montecarlo.dart)."""
import numpy as np
import jax.numpy as jnp

from dartray_tpu.core import sampling as smp


def test_van_der_corput_unscrambled():
    n = jnp.arange(8, dtype=jnp.uint32)
    v = np.asarray(smp.van_der_corput(n, jnp.uint32(0)))
    # base-2 radical inverse of 0..7
    expect = [0.0, 0.5, 0.25, 0.75, 0.125, 0.625, 0.375, 0.875]
    np.testing.assert_allclose(v, expect, atol=1e-7)


def test_sobol2_stratification():
    # first 2^k points of a (0,2)-sequence are stratified: one point per
    # elementary interval
    from dartray_tpu.core import math as vm
    n = jnp.arange(16, dtype=jnp.uint32)
    scr = jnp.zeros((16, 2), jnp.uint32)
    s = np.asarray(vm.to_arr2(smp.sample02(n, scr)))
    assert s.shape == (16, 2)
    assert (s >= 0).all() and (s < 1).all()
    # 4x4 stratification property of first 16 points
    cells = set()
    for x, y in s:
        cells.add((int(x * 4), int(y * 4)))
    assert len(cells) == 16


def test_uniform_bits_range():
    bits = smp.hash_u32(jnp.arange(10000, dtype=jnp.uint32))
    u = np.asarray(smp.uniform_from_bits(bits))
    assert (u >= 0).all() and (u < 1).all()
    assert abs(u.mean() - 0.5) < 0.02


def test_distribution1d_uniformity():
    f = jnp.asarray([1.0, 2.0, 3.0, 2.0])
    d = smp.Distribution1D(f)
    u = jnp.asarray(np.random.RandomState(0).rand(200000), jnp.float32)
    x, pdf, _ = d.sample_continuous(u)
    x = np.asarray(x)
    # histogram should be proportional to func
    h, _ = np.histogram(x, bins=4, range=(0, 1))
    h = h / h.sum()
    np.testing.assert_allclose(h, [1 / 8, 2 / 8, 3 / 8, 2 / 8], atol=0.01)
    # pdf value matches func/int
    np.testing.assert_allclose(np.asarray(pdf)[np.asarray(x) < 0.25], 0.5,
                               atol=1e-5)


def test_distribution2d_matches_pdf():
    rng = np.random.RandomState(1)
    f = rng.rand(8, 16).astype(np.float32) + 0.1
    d = smp.Distribution2D(jnp.asarray(f))
    u = jnp.asarray(rng.rand(100000, 2), jnp.float32)
    uv, pdf = d.sample_continuous(u)
    uv = np.asarray(uv)
    assert (uv >= 0).all() and (uv <= 1).all()
    # check pdf() agrees with the pdf returned at sample points
    pdf2 = np.asarray(d.pdf(jnp.asarray(uv[:, 0]), jnp.asarray(uv[:, 1])))
    np.testing.assert_allclose(np.asarray(pdf), pdf2, rtol=1e-3, atol=1e-4)
    # expectation of 1/pdf over samples == area (1.0)
    est = (1.0 / np.asarray(pdf)).mean()
    assert abs(est - 1.0) < 0.02


def test_power_heuristic():
    # beta=2 form (montecarlo.dart:480-484)
    w = float(smp.power_heuristic(1.0, jnp.float32(0.5), 1.0, jnp.float32(0.25)))
    assert abs(w - (0.25 / (0.25 + 0.0625))) < 1e-6


def test_concentric_disk_in_unit_disk():
    u = jnp.asarray(np.random.RandomState(2).rand(10000, 2), jnp.float32)
    x, y = smp.concentric_sample_disk(u)
    r2 = np.asarray(x) ** 2 + np.asarray(y) ** 2
    assert (r2 <= 1.0 + 1e-6).all()
    assert abs(r2.mean() - 0.5) < 0.01  # uniform disk => E[r^2] = 1/2


def test_cosine_hemisphere():
    u = jnp.asarray(np.random.RandomState(3).rand(20000, 2), jnp.float32)
    from dartray_tpu.core import math as vm
    d = np.asarray(vm.to_arr(smp.cosine_sample_hemisphere(u)))
    assert (d[:, 2] >= 0).all()
    np.testing.assert_allclose(np.linalg.norm(d, axis=-1), 1.0, atol=1e-4)
    # E[cos] for cosine-weighted = 2/3
    assert abs(d[:, 2].mean() - 2.0 / 3.0) < 0.01


def test_stratified_2d():
    s = np.asarray(smp.stratified_sample_2d(4, 4, jnp.uint32(5)))
    cells = set()
    for x, y in s:
        cells.add((int(x * 4), int(y * 4)))
    assert len(cells) == 16


def test_radical_inverse_base3():
    v = np.asarray(smp.radical_inverse(jnp.arange(9, dtype=jnp.uint32), 3))
    expect = [0, 1 / 3, 2 / 3, 1 / 9, 4 / 9, 7 / 9, 2 / 9, 5 / 9, 8 / 9]
    np.testing.assert_allclose(v, expect, atol=1e-6)


def test_bestcandidate_tile_blue_noise():
    """Best-candidate sampler (best_candidate_sampler.dart:31): the
    generated toroidal Poisson tile's min pairwise distance must be far
    above a random set's (blue-noise property), and draws must be
    deterministic in (pixel, s_idx)."""
    import numpy as np
    from dartray_tpu import samplers as sm
    s = sm.make_sampler("bestcandidate", spp=4)
    t = np.asarray(s.bc)                      # (T, T, SMAX, 2)
    T = t.shape[0]
    pts = (t + np.stack(np.meshgrid(np.arange(T), np.arange(T),
                                    indexing="xy"), -1)[:, :, None, :]
           ).reshape(-1, 2)
    d = np.abs(pts[:, None] - pts[None])
    d = np.minimum(d, T - d)
    dist = np.sqrt((d ** 2).sum(-1))
    np.fill_diagonal(dist, 1e9)
    dmin = dist.min()
    rng = np.random.RandomState(0)
    rp = rng.rand(pts.shape[0], 2) * T
    dr = np.abs(rp[:, None] - rp[None])
    dr = np.minimum(dr, T - dr)
    distr = np.sqrt((dr ** 2).sum(-1))
    np.fill_diagonal(distr, 1e9)
    assert dmin > 5 * distr.min(), (dmin, distr.min())
    px = jnp.arange(32, dtype=jnp.int32)
    py = jnp.zeros(32, jnp.int32)
    si = jnp.zeros(32, jnp.int32)
    a = sm.sample_2d(s, px, py, si, 0)
    b = sm.sample_2d(s, px, py, si, 0)
    np.testing.assert_array_equal(np.asarray(a.x), np.asarray(b.x))
