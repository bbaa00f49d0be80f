"""Pallas traversal-kernel oracle: v5/v6/v7 vs brute force (interpret mode).

Each kernel family must agree with the exhaustive intersector on hit masks
and (post-finish) exact t within f32 tolerance — including v7, whose
in-kernel candidates come from Woop-transform arithmetic (different rounding
than Moeller-Trumbore; finish_hits recomputes exact values for winners).
"""
import numpy as np
import jax.numpy as jnp
import pytest

from dartray_tpu.accel import bvh as bvh_mod, cluster, traverse as tv
from dartray_tpu.core import math as vm
from dartray_tpu.ops import traverse_pallas as tp


def _soup(n=400, seed=0):
    rng = np.random.RandomState(seed)
    v0 = rng.randn(n, 3).astype(np.float32)
    e1 = (rng.randn(n, 3) * 0.4).astype(np.float32)
    e2 = (rng.randn(n, 3) * 0.4).astype(np.float32)
    return v0, e1, e2


def _rays(n=512, seed=1):
    rng = np.random.RandomState(seed)
    o = rng.randn(n, 3).astype(np.float32) * 2.0
    d = rng.randn(n, 3).astype(np.float32)
    d /= np.linalg.norm(d, axis=-1, keepdims=True)
    return vm.make_rays(jnp.asarray(o), jnp.asarray(d))


@pytest.mark.parametrize("which", ["v5", "v6", "v7"])
def test_kernel_matches_bruteforce(which):
    v0, e1, e2 = _soup()
    cb = cluster.build(v0, e1, e2, k=32)
    packed, perm = tp.pack(cb.node_lo, cb.node_hi, cb.node_child,
                           cb.node_axis, cb.tri_v0, cb.tri_e1, cb.tri_e2,
                           cb.tri_id)
    rays = _rays()
    lo = jnp.asarray(v0.min(0) - 1.0)
    hi = jnp.asarray(v0.max(0) + 1.0)
    if which == "v7":
        packed = tp.with_woop(packed)   # v7 operand is opt-in (attic)
    t, prim, b1, b2 = tp.intersect_rays(
        packed, jnp.asarray(perm), lo, hi,
        rays.o, rays.d, rays.tmin, rays.tmax,
        any_hit=False, sort=False, kernel=which, interpret=True)
    ref = tv.brute_force_intersect(jnp.asarray(v0), jnp.asarray(e1),
                                   jnp.asarray(e2), rays)
    hit_k = np.asarray(prim) >= 0
    hit_r = np.asarray(ref.hit)
    assert (hit_k == hit_r).mean() > 0.999, (which, (hit_k != hit_r).sum())
    both = hit_k & hit_r
    terr = np.abs(np.asarray(t)[both] - np.asarray(ref.t)[both])
    rel = terr / np.maximum(np.abs(np.asarray(ref.t)[both]), 1e-3)
    assert np.quantile(rel, 0.999) < 1e-3, (which, rel.max())


@pytest.mark.parametrize("which", ["v6", "v7"])
def test_kernel_anyhit_matches(which):
    v0, e1, e2 = _soup(seed=3)
    cb = cluster.build(v0, e1, e2, k=32)
    packed, perm = tp.pack(cb.node_lo, cb.node_hi, cb.node_child,
                           cb.node_axis, cb.tri_v0, cb.tri_e1, cb.tri_e2,
                           cb.tri_id)
    rays = _rays(seed=4)
    lo = jnp.asarray(v0.min(0) - 1.0)
    hi = jnp.asarray(v0.max(0) + 1.0)
    if which == "v7":
        packed = tp.with_woop(packed)   # v7 operand is opt-in (attic)
    t, prim, _, _ = tp.intersect_rays(
        packed, jnp.asarray(perm), lo, hi,
        rays.o, rays.d, rays.tmin, rays.tmax,
        any_hit=True, sort=False, kernel=which, interpret=True)
    ref = tv.brute_force_intersect(jnp.asarray(v0), jnp.asarray(e1),
                                   jnp.asarray(e2), rays)
    assert ((np.asarray(prim) >= 0) == np.asarray(ref.hit)).all()


def test_mixed_pair_matches_bruteforce(monkeypatch):
    """intersect_rays_pair (merged extension+shadow launch, kernel v6 mixed
    mode): the closest-hit half must match the full intersect_rays result
    and the any-hit half must match brute-force occlusion — with a small
    CHUNK_SUBROWS so the dead-chunk-skipping fori path runs and skipped
    (all-dead) chunks produce exact miss outputs."""
    v0, e1, e2 = _soup(seed=5)
    cb = cluster.build(v0, e1, e2, k=32)
    packed, perm = tp.pack(cb.node_lo, cb.node_hi, cb.node_child,
                           cb.node_axis, cb.tri_v0, cb.tri_e1, cb.tri_e2,
                           cb.tri_id)
    lo = jnp.asarray(v0.min(0) - 1.0)
    hi = jnp.asarray(v0.max(0) + 1.0)
    n = 2048
    ext = _rays(n=n, seed=6)
    sh = _rays(n=n, seed=7)
    rng = np.random.RandomState(8)
    dead_e = jnp.asarray(rng.rand(n) < 0.5)
    dead_s = jnp.asarray(rng.rand(n) < 0.7)
    ext = ext._replace(tmax=jnp.where(dead_e, -1.0, ext.tmax))
    sh = sh._replace(tmax=jnp.where(dead_s, -1.0, sh.tmax))
    monkeypatch.setattr(tp, "CHUNK_SUBROWS", 8)
    t, prim, b1, b2, occ = tp.intersect_rays_pair(
        packed, jnp.asarray(perm), lo, hi,
        ext.o, ext.d, ext.tmin, ext.tmax,
        sh.o, sh.d, sh.tmin, sh.tmax, interpret=True)
    ref_e = tv.brute_force_intersect(jnp.asarray(v0), jnp.asarray(e1),
                                     jnp.asarray(e2), ext)
    ref_s = tv.brute_force_intersect(jnp.asarray(v0), jnp.asarray(e1),
                                     jnp.asarray(e2), sh)
    hit_k = np.asarray(prim) >= 0
    hit_r = np.asarray(ref_e.hit)
    assert (hit_k == hit_r).mean() > 0.999, (hit_k != hit_r).sum()
    assert not hit_k[np.asarray(dead_e)].any()
    both = hit_k & hit_r
    rel = (np.abs(np.asarray(t)[both] - np.asarray(ref_e.t)[both])
           / np.maximum(np.abs(np.asarray(ref_e.t)[both]), 1e-3))
    assert np.quantile(rel, 0.999) < 1e-3, rel.max()
    occ_np = np.asarray(occ)
    assert (occ_np == np.asarray(ref_s.hit)).all()
    assert not occ_np[np.asarray(dead_s)].any()
