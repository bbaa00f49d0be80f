"""BVH-vs-brute-force property tests (port of the reference's oracle idea:
renderers/aggregate_test_renderer.dart:31-139 shoots random rays and compares
the accelerator against exhaustive intersection)."""
import numpy as np
import jax.numpy as jnp
import pytest

from dartray_tpu.accel import bvh as bvh_mod
from dartray_tpu.accel import traverse
from dartray_tpu.core import math as vm
from dartray_tpu.scene import mesh as mesh_mod


def random_tri_soup(n, seed=0, spread=4.0):
    rng = np.random.RandomState(seed)
    v0 = (rng.rand(n, 3) * 2 - 1) * spread
    e1 = (rng.rand(n, 3) * 2 - 1)
    e2 = (rng.rand(n, 3) * 2 - 1)
    return (v0.astype(np.float32), e1.astype(np.float32),
            e2.astype(np.float32))


def random_rays(n, seed=1, spread=6.0):
    rng = np.random.RandomState(seed)
    o = (rng.rand(n, 3) * 2 - 1).astype(np.float32) * spread
    d = rng.randn(n, 3).astype(np.float32)
    d /= np.linalg.norm(d, axis=-1, keepdims=True)
    return vm.make_rays(jnp.asarray(o), jnp.asarray(d))


@pytest.mark.parametrize("n_tris,method", [(37, "sah"), (200, "sah"),
                                           (200, "equal"), (200, "middle")])
def test_bvh_matches_brute_force(n_tris, method):
    v0, e1, e2 = random_tri_soup(n_tris)
    b = bvh_mod.build(v0, e1, e2, split_method=method)
    rays = random_rays(2000)
    hb = traverse.intersect(jnp.asarray(b.rows), jnp.asarray(b.links), rays)
    ho = traverse.brute_force_intersect(jnp.asarray(v0), jnp.asarray(e1),
                                        jnp.asarray(e2), rays, chunk=64)
    hit_b = np.asarray(hb.hit)
    hit_o = np.asarray(ho.hit)
    assert (hit_b == hit_o).mean() > 0.999  # f32 edge cases tolerated
    both = hit_b & hit_o
    np.testing.assert_allclose(np.asarray(hb.t)[both], np.asarray(ho.t)[both],
                               rtol=1e-3, atol=1e-4)
    # same prim for the overwhelming majority (coplanar ties tolerated)
    assert (np.asarray(hb.prim)[both] == np.asarray(ho.prim)[both]).mean() > 0.995


def test_bvh_any_hit_consistent():
    v0, e1, e2 = random_tri_soup(100, seed=3)
    b = bvh_mod.build(v0, e1, e2)
    rays = random_rays(1000, seed=4)
    occluded = traverse.intersect_p(jnp.asarray(b.rows), jnp.asarray(b.links),
                                    rays)
    ho = traverse.brute_force_intersect(jnp.asarray(v0), jnp.asarray(e1),
                                        jnp.asarray(e2), rays)
    assert (np.asarray(occluded) == np.asarray(ho.hit)).mean() > 0.999


def test_bvh_sphere_mesh():
    m = mesh_mod.sphere(radius=1.0, nu=32, nv=16)
    v0, e1, e2 = bvh_mod.triangles_to_mt(m.verts, m.faces)
    b = bvh_mod.build(v0, e1, e2)
    # rays from origin outward must all hit the unit sphere from inside
    rng = np.random.RandomState(7)
    d = rng.randn(500, 3).astype(np.float32)
    d /= np.linalg.norm(d, axis=-1, keepdims=True)
    rays = vm.make_rays(jnp.zeros((500, 3), jnp.float32), jnp.asarray(d))
    h = traverse.intersect(jnp.asarray(b.rows), jnp.asarray(b.links), rays)
    assert np.asarray(h.hit).all()
    # hit distance ~ 1 (chordal error from tessellation)
    np.testing.assert_allclose(np.asarray(h.t), 1.0, atol=0.02)
    # rays starting outside, pointing radially outward, must miss
    rays2 = vm.make_rays(jnp.asarray(d * 3.0), jnp.asarray(d))
    h2 = traverse.intersect(jnp.asarray(b.rows), jnp.asarray(b.links), rays2)
    assert not np.asarray(h2.hit).any()


def test_tmin_tmax_respected():
    v0, e1, e2 = random_tri_soup(50, seed=9)
    b = bvh_mod.build(v0, e1, e2)
    rays = random_rays(500, seed=10)
    h = traverse.intersect(jnp.asarray(b.rows), jnp.asarray(b.links), rays)
    hit = np.asarray(h.hit)
    t = np.asarray(h.t)[hit]
    # re-shoot with tmax just below each hit: must miss that prim at that t
    idx = np.where(hit)[0]
    rays2 = vm.Rays(o=vm.gather3(rays.o, idx), d=vm.gather3(rays.d, idx),
                    tmin=rays.tmin[idx],
                    tmax=jnp.asarray(t * 0.99), time=rays.time[idx])
    h2 = traverse.intersect(jnp.asarray(b.rows), jnp.asarray(b.links), rays2)
    t2 = np.asarray(h2.t)
    assert ((t2 < t * 0.99) | ~np.asarray(h2.hit)).all()


def test_object_motion_blur_continuous():
    """Continuous object motion blur (animated_transform.dart:107-178
    redesign: ONE shutter-union BVH, leaf tests lerp vertices by ray time):
    a sphere translating +2x over the shutter is hit at the EXACTLY
    interpolated position for arbitrary (non-quantized) shutter times —
    the round-4 4-bin scheme was only correct at bin centers and banded."""
    from dartray_tpu.scene import types as st, mesh as mesh_mod
    m = mesh_mod.sphere(radius=0.5, nu=24, nv=12)
    m.verts_end = (m.verts + np.asarray([2.0, 0, 0], np.float32))
    geom = st.compile_geometry([m], [0], [-1])
    assert geom.has_motion
    assert geom.cl.tri_dv0 is not None and geom.packed.tdv0 is not None
    geom = st.to_device(geom)     # compile_geometry returns host numpy
    # arbitrary times, deliberately NOT at any bin center
    ts = np.asarray([0.0, 0.11, 0.37, 0.5, 0.73, 0.99], np.float32)
    n = ts.shape[0]
    o = np.stack([2.0 * ts, np.zeros(n), np.full(n, -3.0)], -1)
    d = np.broadcast_to(np.asarray([0, 0, 1.0], np.float32), (n, 3)).copy()
    rays = vm.make_rays(jnp.asarray(o, jnp.float32), jnp.asarray(d),
                        time=jnp.asarray(ts, jnp.float32))
    h = st.intersect(geom, rays)
    t = np.asarray(h.t)
    assert (np.asarray(h.prim) >= 0).all()
    # front of the lerped sphere: ray origin tracks the center exactly
    np.testing.assert_allclose(t, 2.5, atol=0.02)
    # interaction's hit point must be ray-consistent for moving geometry
    it = st.interaction(geom, rays, h)
    p = np.stack([np.asarray(it["p"].x), np.asarray(it["p"].y),
                  np.asarray(it["p"].z)], -1)
    np.testing.assert_allclose(p, o + t[:, None] * d, atol=1e-4)
    # a ray aimed at the START position but stamped with END time misses
    rays2 = rays._replace(
        o=jnp.asarray(np.asarray([[0, 0, -3.0]] * n, np.float32)),
        time=jnp.full(n, 1.0 - 1e-4))
    h2 = st.intersect(geom, rays2)
    assert (np.asarray(h2.prim) < 0).all()
    # occlusion path sees the moving blocker too
    occ = st.intersect_p(geom, rays)
    occ2 = st.intersect_p(geom, rays2)
    assert np.asarray(occ).all() and not np.asarray(occ2).any()


def test_attr_row_id_columns_bit_exact():
    """mat_id/light_id/alpha_tid travel as int32 BIT PATTERNS inside the
    f32 attr table (small ints are f32 denormals): the round trip through
    device_put + the row gather + transpose must be bit-exact data movement
    (ADVICE r4 #3 — any canonicalizing/denormal-flushing copy would silently
    corrupt material/light lookups). Columns 33-35 (and soup16 col 9+) must
    never see arithmetic."""
    import jax
    from dartray_tpu.scene import types as st

    m = mesh_mod.sphere(radius=1.0, nu=16, nv=8)
    n_f = m.faces.shape[0]
    rng = np.random.default_rng(7)
    mat = rng.integers(0, 5, n_f).astype(np.int32)       # tiny denormals
    lid = rng.integers(-1, 3, n_f).astype(np.int32)      # incl. -1
    geom = st.compile_geometry([m])
    # overwrite the id columns with the random patterns (host side)
    A = np.asarray(geom.attr).copy()
    A[:, 33] = mat.view(np.float32)
    A[:, 34] = lid.view(np.float32)
    import dataclasses
    geom = dataclasses.replace(geom, attr=A)
    geom_d = st.to_device(geom)
    idx = jnp.asarray(rng.integers(0, n_f, 257).astype(np.int32))
    rows = st.attr_rows(geom_d, idx)
    got_mat = np.asarray(jax.lax.bitcast_convert_type(rows[33], jnp.int32))
    got_lid = np.asarray(jax.lax.bitcast_convert_type(rows[34], jnp.int32))
    np.testing.assert_array_equal(got_mat, mat[np.asarray(idx)])
    np.testing.assert_array_equal(got_lid, lid[np.asarray(idx)])


def test_object_motion_blur_pallas_interpret():
    """The TPU kernel path (v6 motion mode, interpret): same continuous-
    motion scene as above must agree with the XLA fallback traversal,
    including the merged extension+shadow (mixed) launch."""
    from dartray_tpu.scene import types as st, mesh as mesh_mod
    m = mesh_mod.sphere(radius=0.5, nu=24, nv=12)
    m.verts_end = (m.verts + np.asarray([2.0, 0, 0], np.float32))
    geom = st.to_device(st.compile_geometry([m], [0], [-1]))
    rng = np.random.RandomState(11)
    n = 256
    ts = rng.rand(n).astype(np.float32)
    # rays from a ring of origins toward the lerped sphere center
    ang = rng.rand(n) * 2 * np.pi
    o = np.stack([2.0 * ts + 3.0 * np.cos(ang), 3.0 * np.sin(ang),
                  -3.0 * np.ones(n)], -1).astype(np.float32)
    c = np.stack([2.0 * ts, np.zeros(n), np.zeros(n)], -1)
    d = (c - o).astype(np.float32)
    d /= np.linalg.norm(d, axis=-1, keepdims=True)
    rays = vm.make_rays(jnp.asarray(o), jnp.asarray(d),
                        time=jnp.asarray(ts))
    h_ref = st.intersect(geom, rays)          # XLA fallback (lerped)
    occ_ref = st.intersect_p(geom, rays)
    assert np.asarray(h_ref.prim >= 0).all()  # all aimed at the center
    old = st.FORCE_PALLAS_INTERPRET
    st.FORCE_PALLAS_INTERPRET = True
    try:
        h_k = st.intersect(geom, rays)
        h_pair, occ_k = st.intersect_pair(geom, rays, rays)
    finally:
        st.FORCE_PALLAS_INTERPRET = old
    for hk in (h_k, h_pair):
        assert (np.asarray(hk.prim) == np.asarray(h_ref.prim)).mean() > 0.99
        both = (np.asarray(hk.prim) >= 0) & (np.asarray(h_ref.prim) >= 0)
        np.testing.assert_allclose(np.asarray(hk.t)[both],
                                   np.asarray(h_ref.t)[both], rtol=1e-4)
    assert (np.asarray(occ_k) == np.asarray(occ_ref)).all()
