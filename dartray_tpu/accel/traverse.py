"""Device BVH traversal over ray wavefronts (stackless, octant-threaded).

TPU-native replacement for BVHAccel.intersect / intersectP
(lib/accelerators/bvh_accel.dart:101-224) and Triangle.intersect
(lib/shapes/triangle.dart:44-160). Traversal state per ray is one int32
(current node); every step is one 16-float row gather + one 2-int link gather,
then a slab test and a Moeller-Trumbore test evaluated for ALL lanes with the
result selected by the row's leaf flag — branch-free, static shapes, runs
inside ``lax.while_loop`` until every lane terminates.

The same code path executes on CPU (tests) and TPU; a Pallas fused variant
can swap in behind the same signature.
"""
from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from ..core import math as vm

TRI_EPS = jnp.float32(1e-10)
# Inclusive barycentric tolerance: rays passing exactly through shared edges
# (e.g. scene symmetry planes aligned with tessellation seams) must not fall
# through the crack between the two adjacent triangles when f32 rounding puts
# u/v at -epsilon on both. Shared-edge double hits have identical t, so
# closest-hit semantics are unaffected.
BARY_EPS = jnp.float32(1e-6)


class Hits(NamedTuple):
    """SoA hit records (core/intersection.dart:27 reimagined as arrays)."""
    t: jnp.ndarray        # (R,) hit distance (inf on miss)
    prim: jnp.ndarray     # (R,) int32 triangle id, -1 on miss
    b1: jnp.ndarray       # (R,) barycentric weight of v1
    b2: jnp.ndarray       # (R,) barycentric weight of v2
    # (48, R) per-hit attr rows prefetched by the traversal finish (the
    # combined finish+interaction gather, ops/traverse_pallas.py
    # finish_hits_rows) — layout identical to scene/types._pack_attr; None
    # off the Pallas path (scene/types.interaction falls back to its own
    # gather). A 262k-index gather is index-bound (~8-16 ms on v5e), so
    # sharing ONE row fetch between exact-hit finishing and shading saves
    # a full gather per closest-hit wave.
    rows: jnp.ndarray = None

    @property
    def hit(self):
        return self.prim >= 0


def ray_octants(d):
    """3 sign bits -> octant id in [0, 8) (dirIsNeg, bvh_accel.dart:113)."""
    neg = (d < 0.0).astype(jnp.int32)
    return neg[..., 0] + 2 * neg[..., 1] + 4 * neg[..., 2]


def _mt_test(o, d, v0, e1, e2, tmin, tmax):
    """Moeller-Trumbore; returns (hit, t, u, v)."""
    pvec = vm.cross(d, e2)
    det = vm.dot(e1, pvec)
    inv_det = 1.0 / jnp.where(jnp.abs(det) < TRI_EPS, 1.0, det)
    tvec = o - v0
    u = vm.dot(tvec, pvec) * inv_det
    qvec = vm.cross(tvec, e1)
    v = vm.dot(d, qvec) * inv_det
    t = vm.dot(e2, qvec) * inv_det
    hit = ((jnp.abs(det) >= TRI_EPS) & (u >= -BARY_EPS) & (v >= -BARY_EPS)
           & (u + v <= 1.0 + BARY_EPS) & (t > tmin) & (t < tmax))
    return hit, t, u, v


def _slab_test(o, inv_d, lo, hi, tmin, tmax):
    t0 = (lo - o) * inv_d
    t1 = (hi - o) * inv_d
    tnear = jnp.maximum(jnp.max(jnp.minimum(t0, t1), axis=-1), tmin)
    tfar = jnp.minimum(jnp.min(jnp.maximum(t0, t1), axis=-1), tmax)
    return tnear <= tfar


def _traverse(rows, links, rays: vm.Rays, any_hit: bool, max_steps: int):
    # CPU/XLA fallback path: AoS (R, 3) internally; convert at the boundary
    rays = rays._replace(o=vm.to_arr(rays.o), d=vm.to_arr(rays.d))
    n_nodes = rows.shape[0]
    r = rays.o.shape[0]
    octant = ray_octants(rays.d)
    inv_d = 1.0 / jnp.where(jnp.abs(rays.d) < 1e-30,
                            jnp.where(rays.d < 0, -1e-30, 1e-30), rays.d)
    links_flat = links.reshape(-1, 2)
    link_base = octant * n_nodes

    cur0 = jnp.zeros((r,), jnp.int32)
    t0 = rays.tmax
    prim0 = jnp.full((r,), -1, jnp.int32)
    z = jnp.zeros((r,), jnp.float32)

    def cond(state):
        cur, _, _, _, _, step = state
        return jnp.logical_and(jnp.any(cur >= 0), step < max_steps)

    def body(state):
        cur, t_best, prim, b1, b2, step = state
        active = cur >= 0
        safe = jnp.maximum(cur, 0)
        row = rows[safe]                              # (R, 16) gather
        is_leaf = row[:, 15] > 0.5
        # interior: slab test against current-best t
        hit_box = _slab_test(rays.o, inv_d, row[:, 0:3], row[:, 3:6],
                             rays.tmin, t_best)
        # leaf: triangle test (reuses the same row registers)
        tri_hit, t, u, v = _mt_test(rays.o, rays.d, row[:, 0:3], row[:, 3:6],
                                    row[:, 6:9], rays.tmin, t_best)
        take = active & is_leaf & tri_hit
        leaf_prim = jax.lax.bitcast_convert_type(row[:, 14], jnp.int32)
        t_best = jnp.where(take, t, t_best)
        prim = jnp.where(take, leaf_prim, prim)
        b1 = jnp.where(take, u, b1)
        b2 = jnp.where(take, v, b2)
        lk = links_flat[link_base + safe]             # (R, 2) gather
        descend = hit_box & jnp.logical_not(is_leaf)
        nxt = jnp.where(descend, lk[:, 0], lk[:, 1])
        if any_hit:
            nxt = jnp.where(take, -1, nxt)
        cur = jnp.where(active, nxt, -1)
        return (cur, t_best, prim, b1, b2, step + 1)

    _, t_best, prim, b1, b2, _ = jax.lax.while_loop(
        cond, body, (cur0, t0, prim0, z, z, jnp.int32(0)))
    t_out = jnp.where(prim >= 0, t_best, jnp.float32(jnp.inf))
    return Hits(t=t_out, prim=prim, b1=b1, b2=b2)


def intersect(rows, links, rays: vm.Rays, max_steps: int = 20000) -> Hits:
    """Closest-hit traversal (BVHAccel.intersect, bvh_accel.dart:101-165)."""
    return _traverse(rows, links, rays, any_hit=False, max_steps=max_steps)


def intersect_p(rows, links, rays: vm.Rays, max_steps: int = 20000):
    """Any-hit / occlusion (BVHAccel.intersectP, bvh_accel.dart:167-224).
    Returns boolean (R,) occlusion mask."""
    h = _traverse(rows, links, rays, any_hit=True, max_steps=max_steps)
    return h.prim >= 0


# --- Brute-force oracle (accelerators/brute_force_accel.dart) --------------

def brute_force_intersect(v0, e1, e2, rays: vm.Rays, chunk: int = 4096) -> Hits:
    """Exhaustive closest hit, used as the correctness oracle in the
    aggregatetest-style property tests (renderers/aggregate_test_renderer.dart).
    Scans triangles in chunks with a lax.fori over chunk index."""
    rays = rays._replace(o=vm.to_arr(rays.o), d=vm.to_arr(rays.d))
    v0 = vm.to_arr(v0)
    e1 = vm.to_arr(e1)
    e2 = vm.to_arr(e2)
    f = v0.shape[0]
    r = rays.o.shape[0]
    n_chunks = max((f + chunk - 1) // chunk, 1)
    pad = n_chunks * chunk - f
    v0p = jnp.concatenate([v0, jnp.zeros((pad, 3), v0.dtype)])
    e1p = jnp.concatenate([e1, jnp.zeros((pad, 3), e1.dtype)])
    e2p = jnp.concatenate([e2, jnp.zeros((pad, 3), e2.dtype)])

    def body(ci, state):
        t_best, prim, b1, b2 = state
        s = ci * chunk
        cv0 = jax.lax.dynamic_slice(v0p, (s, 0), (chunk, 3))
        ce1 = jax.lax.dynamic_slice(e1p, (s, 0), (chunk, 3))
        ce2 = jax.lax.dynamic_slice(e2p, (s, 0), (chunk, 3))
        hit, t, u, v = _mt_test(rays.o[:, None, :], rays.d[:, None, :],
                                cv0[None], ce1[None], ce2[None],
                                rays.tmin[:, None], t_best[:, None])
        tri_ids = s + jnp.arange(chunk, dtype=jnp.int32)
        valid = hit & (tri_ids[None, :] < f)
        t_masked = jnp.where(valid, t, jnp.inf)
        j = jnp.argmin(t_masked, axis=1)
        tj = jnp.take_along_axis(t_masked, j[:, None], axis=1)[:, 0]
        better = tj < t_best
        take = lambda a: jnp.take_along_axis(a, j[:, None], axis=1)[:, 0]
        t_best = jnp.where(better, tj, t_best)
        prim = jnp.where(better, tri_ids[j], prim)
        b1 = jnp.where(better, take(u), b1)
        b2 = jnp.where(better, take(v), b2)
        return (t_best, prim, b1, b2)

    z = jnp.zeros((r,), jnp.float32)
    t_best, prim, b1, b2 = jax.lax.fori_loop(
        0, n_chunks, body,
        (rays.tmax, jnp.full((r,), -1, jnp.int32), z, z))
    t_out = jnp.where(prim >= 0, t_best, jnp.float32(jnp.inf))
    return Hits(t=t_out, prim=prim, b1=b1, b2=b2)
