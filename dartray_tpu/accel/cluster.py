"""Packet-cluster BVH: the TPU-native traversal design.

Rationale (replaces the octant-threaded per-ray traversal for the hot path):
per-ray stackless traversal needs one (16-float row + links) gather per ray
per step — random-row gathers that run at a tiny fraction of HBM bandwidth on
TPU (measured ~95k rays/s on a v5e — memory-latency-bound). This module
restructures the reference's BVHAccel (lib/accelerators/bvh_accel.dart) the
TPU way:

* triangles are grouped into fixed-size CLUSTERS (K tris, SAH-built leaves);
* a small BVH is built over clusters — small enough that its node table is
  effectively cache/VMEM-resident;
* rays are grouped into PACKETS of 128 (the TPU lane width); a packet
  traverses with ONE node index per packet (gathers shrink by 128x) and
  near-child-first ordering from the packet's majority direction sign — the
  dirIsNeg analog (bvh_accel.dart:128-139);
* a leaf visit tests ALL K cluster triangles against ALL 128 packet rays as
  one dense (packet, ray, tri) Moeller-Trumbore evaluation — pure VPU math
  with zero gathers (cluster data is contiguous).

Same algorithmic contract as BVHAccel.intersect/intersectP; brute-force
oracle-tested like the reference's aggregatetest renderer.
"""
from __future__ import annotations

import dataclasses
from functools import partial
from typing import NamedTuple

import numpy as np
import jax
import jax.numpy as jnp

from ..core import math as vm
from .traverse import Hits, TRI_EPS, BARY_EPS

PACKET = 128          # rays per packet == TPU lane width
DEFAULT_K = int(__import__("os").environ.get("DR_CLUSTER_K", "32"))  # tris per cluster (env-tunable for on-chip A/B)
N_BUCKETS = 12


@partial(jax.tree_util.register_dataclass,
         data_fields=["node_lo", "node_hi", "node_child", "node_axis",
                      "tri_v0", "tri_e1", "tri_e2", "tri_id",
                      "tri_dv0", "tri_de1", "tri_de2"],
         meta_fields=["n_nodes", "n_clusters", "k", "max_depth"])
@dataclasses.dataclass
class ClusterBVH:
    node_lo: jnp.ndarray     # (N, 3)
    node_hi: jnp.ndarray     # (N, 3)
    node_child: jnp.ndarray  # (N, 2) int32; leaf: child[0] = -(cluster+1)
    node_axis: jnp.ndarray   # (N,) int32
    tri_v0: jnp.ndarray      # (C, K, 3)  (shutter-open for moving scenes)
    tri_e1: jnp.ndarray      # (C, K, 3)
    tri_e2: jnp.ndarray      # (C, K, 3)
    tri_id: jnp.ndarray      # (C, K) int32 original prim ids (-1 pad)
    # continuous object motion blur: shutter-close MINUS shutter-open deltas
    # (v(t) = v0 + t * dv, one FMA per component in the leaf test); node
    # bounds are the union over the shutter interval. None = static scene.
    tri_dv0: jnp.ndarray = None
    tri_de1: jnp.ndarray = None
    tri_de2: jnp.ndarray = None
    n_nodes: int = 0
    n_clusters: int = 0
    k: int = 0
    max_depth: int = 0


def build(v0: np.ndarray, e1: np.ndarray, e2: np.ndarray,
          k: int = DEFAULT_K, split_method: str = "sah") -> ClusterBVH:
    """SAH build with K-triangle leaves -> packed cluster arrays.

    Uses the native C++ builder (accel/native) when available — the numpy
    fallback below is identical but ~1000x slower on large meshes."""
    if split_method == "sah":
        nat = _native_build(v0, e1, e2, k)
        if nat is not None:
            return nat
    f = v0.shape[0]
    v0d = v0.astype(np.float64)
    lo = np.minimum(np.minimum(v0d, v0d + e1), v0d + e2)
    hi = np.maximum(np.maximum(v0d, v0d + e1), v0d + e2)
    cen = 0.5 * (lo + hi)

    max_nodes = 4 * max(f // k, 1) + 64
    nb_lo = np.zeros((max_nodes, 3))
    nb_hi = np.zeros((max_nodes, 3))
    child = np.full((max_nodes, 2), -1, np.int64)
    axis_arr = np.zeros(max_nodes, np.int32)
    clusters = []   # list of index arrays
    order = np.arange(f)
    stack = [(0, 0, f, 0)]
    n_nodes = 1
    max_depth = 0
    while stack:
        node, s, e, d = stack.pop()
        max_depth = max(max_depth, d)
        idx = order[s:e]
        nb_lo[node] = lo[idx].min(axis=0)
        nb_hi[node] = hi[idx].max(axis=0)
        if e - s <= k:
            child[node, 0] = -(len(clusters) + 1)
            clusters.append(idx.copy())
            continue
        c = cen[idx]
        ext = c.max(axis=0) - c.min(axis=0)
        dim = int(np.argmax(ext))
        axis_arr[node] = dim
        if ext[dim] < 1e-12 or split_method == "equal":
            order[s:e] = idx[np.argsort(c[:, dim], kind="stable")]
            mid = (s + e) // 2
        elif split_method == "middle":
            pivot = 0.5 * (c[:, dim].min() + c[:, dim].max())
            mask = c[:, dim] < pivot
            mid = s + int(mask.sum())
            order[s:e] = np.concatenate([idx[mask], idx[~mask]])
            if mid == s or mid == e:
                order[s:e] = idx[np.argsort(c[:, dim], kind="stable")]
                mid = (s + e) // 2
        else:  # binned SAH (bvh_accel.dart:310-421)
            cmin, cmax = c[:, dim].min(), c[:, dim].max()
            b = np.minimum(((c[:, dim] - cmin) / (cmax - cmin) * N_BUCKETS)
                           .astype(np.int64), N_BUCKETS - 1)
            counts = np.bincount(b, minlength=N_BUCKETS)
            blo = np.full((N_BUCKETS, 3), np.inf)
            bhi = np.full((N_BUCKETS, 3), -np.inf)
            np.minimum.at(blo, b, lo[idx])
            np.maximum.at(bhi, b, hi[idx])

            def sa(l, h):
                dd = np.maximum(h - l, 0.0)
                return 2 * (dd[:, 0] * dd[:, 1] + dd[:, 1] * dd[:, 2]
                            + dd[:, 2] * dd[:, 0])
            plo = np.minimum.accumulate(blo, axis=0)
            phi = np.maximum.accumulate(bhi, axis=0)
            slo = np.minimum.accumulate(blo[::-1], axis=0)[::-1]
            shi = np.maximum.accumulate(bhi[::-1], axis=0)[::-1]
            cl = np.cumsum(counts)
            cr = counts.sum() - cl
            cost = sa(plo, phi)[:-1] * cl[:-1] + sa(slo, shi)[1:] * cr[:-1]
            valid = (cl[:-1] > 0) & (cr[:-1] > 0)
            if not valid.any():
                order[s:e] = idx[np.argsort(c[:, dim], kind="stable")]
                mid = (s + e) // 2
            else:
                cost = np.where(valid, cost, np.inf)
                split_b = int(np.argmin(cost))
                mask = b <= split_b
                mid = s + int(mask.sum())
                order[s:e] = np.concatenate([idx[mask], idx[~mask]])
        l_id, r_id = n_nodes, n_nodes + 1
        n_nodes += 2
        child[node] = (l_id, r_id)
        stack.append((l_id, s, mid, d + 1))
        stack.append((r_id, mid, e, d + 1))

    c_n = len(clusters)
    tv0 = np.zeros((c_n, k, 3), np.float32)
    te1 = np.zeros((c_n, k, 3), np.float32)
    te2 = np.zeros((c_n, k, 3), np.float32)
    tid = np.full((c_n, k), -1, np.int32)
    for ci, idx in enumerate(clusters):
        m = len(idx)
        tv0[ci, :m] = v0[idx]
        te1[ci, :m] = e1[idx]
        te2[ci, :m] = e2[idx]
        tid[ci, :m] = idx
    # host numpy end-to-end: the caller does ONE jax.device_put of the
    # finished scene (building on-device round-trips every array through the
    # possibly-tunneled chip — measured 6x build regression, VERDICT r2 #2)
    return ClusterBVH(
        node_lo=np.ascontiguousarray(nb_lo[:n_nodes], np.float32),
        node_hi=np.ascontiguousarray(nb_hi[:n_nodes], np.float32),
        node_child=np.ascontiguousarray(child[:n_nodes], np.int32),
        node_axis=np.ascontiguousarray(axis_arr[:n_nodes], np.int32),
        tri_v0=tv0, tri_e1=te1, tri_e2=te2, tri_id=tid,
        n_nodes=n_nodes, n_clusters=c_n, k=k, max_depth=max_depth)


def build_motion(v0a, e1a, e2a, v0b, e1b, e2b, k: int = DEFAULT_K,
                 split_method: str = "sah") -> ClusterBVH:
    """Continuous-motion build (animated_transform.dart:107-178 redesign):
    ONE tree whose per-triangle bounds are the UNION of the shutter-open
    and shutter-close AABBs (exact for linear vertex motion), with the
    start soup + (close - open) deltas packed in cluster order so leaf
    tests can lerp by ray time.

    Implementation trick: the SAH builders only consume per-triangle
    lo/hi/centroid, so we feed them a degenerate PROXY triangle per prim
    (v0 = union-lo, e1 = union-extent, e2 = 0 -> its AABB IS the union
    box), then re-gather the true start/delta soups via the returned
    cluster permutation. Zero changes to either builder."""
    def aabb(v0, e1, e2):
        v0d = v0.astype(np.float64)
        lo = np.minimum(np.minimum(v0d, v0d + e1), v0d + e2)
        hi = np.maximum(np.maximum(v0d, v0d + e1), v0d + e2)
        return lo, hi

    lo_a, hi_a = aabb(v0a, e1a, e2a)
    lo_b, hi_b = aabb(v0b, e1b, e2b)
    lo_u = np.minimum(lo_a, lo_b).astype(np.float32)
    hi_u = np.maximum(hi_a, hi_b).astype(np.float32)
    cb = build(lo_u, hi_u - lo_u, np.zeros_like(lo_u), k=k,
               split_method=split_method)
    tid = np.asarray(cb.tri_id)
    valid = tid >= 0
    ids = np.maximum(tid, 0)

    def gk(a):
        out = np.zeros(tid.shape + (3,), np.float32)
        out[valid] = np.asarray(a, np.float32)[ids[valid]]
        return out

    return dataclasses.replace(
        cb,
        tri_v0=gk(v0a), tri_e1=gk(e1a), tri_e2=gk(e2a),
        tri_dv0=gk(v0b) - gk(v0a), tri_de1=gk(e1b) - gk(e1a),
        tri_de2=gk(e2b) - gk(e2a))


def _native_build(v0, e1, e2, k):
    from . import native
    res = native.cluster_bvh_build(np.asarray(v0, np.float32),
                                   np.asarray(e1, np.float32),
                                   np.asarray(e2, np.float32), k)
    if res is None:
        return None
    (node_lo, node_hi, node_child, node_axis, tri_order, cl_start, cl_cnt,
     n_nodes, n_clusters, max_depth) = res
    tv0 = np.zeros((n_clusters, k, 3), np.float32)
    te1 = np.zeros((n_clusters, k, 3), np.float32)
    te2 = np.zeros((n_clusters, k, 3), np.float32)
    tid = np.full((n_clusters, k), -1, np.int32)
    # vectorized padded gather: rows (cluster, slot) -> tri id or -1
    slot = np.arange(k)[None, :]
    valid = slot < cl_cnt[:, None]
    src = np.minimum(cl_start[:, None] + slot, len(tri_order) - 1)
    ids = tri_order[src]
    tv0[valid] = v0[ids[valid]]
    te1[valid] = e1[ids[valid]]
    te2[valid] = e2[ids[valid]]
    tid[valid] = ids[valid]
    return ClusterBVH(
        node_lo=np.asarray(node_lo, np.float32),
        node_hi=np.asarray(node_hi, np.float32),
        node_child=np.asarray(node_child, np.int32),
        node_axis=np.asarray(node_axis, np.int32),
        tri_v0=tv0, tri_e1=te1, tri_e2=te2, tri_id=tid,
        n_nodes=int(n_nodes), n_clusters=int(n_clusters), k=int(k),
        max_depth=int(max_depth))


def _pad_packets(x, n_pad, fill):
    if n_pad == 0:
        return x
    pad_shape = (n_pad,) + x.shape[1:]
    return jnp.concatenate([x, jnp.full(pad_shape, fill, x.dtype)])


LEAF_BUF = 8  # clusters buffered per packet between dense flushes


def _traverse(bvh: ClusterBVH, rays: vm.Rays, any_hit: bool,
              t_cull_quantile=None):
    """Packet traversal. Rays padded to a multiple of PACKET.

    Two nested loops: the inner loop runs cheap node-only steps (one slab
    test per packet per step), buffering visited leaf clusters; when any
    packet's buffer fills (or all stacks drain) the outer loop runs ONE
    dense (packet x ray x buffered-cluster-tris) Moeller-Trumbore flush.
    This keeps the expensive dense test off the interior-node steps."""
    # XLA fallback path (CPU tests): AoS internally, convert at the boundary
    rays = rays._replace(o=vm.to_arr(rays.o), d=vm.to_arr(rays.d))
    r = rays.o.shape[0]
    n_pad = (-r) % PACKET
    o = _pad_packets(rays.o, n_pad, 0.0)
    d = _pad_packets(rays.d, n_pad, 1.0)
    tmin = _pad_packets(rays.tmin, n_pad, 0.0)
    tmax = _pad_packets(rays.tmax, n_pad, -1.0)  # pad rays: tmax<tmin => dead
    np_ = (r + n_pad) // PACKET
    o = o.reshape(np_, PACKET, 3)
    d = d.reshape(np_, PACKET, 3)
    tmin = tmin.reshape(np_, PACKET)
    tmax = tmax.reshape(np_, PACKET)
    has_motion = bvh.tri_dv0 is not None
    if has_motion:
        time = _pad_packets(rays.time, n_pad, 0.0).reshape(np_, PACKET)
    inv_d = 1.0 / jnp.where(jnp.abs(d) < 1e-30,
                            jnp.where(d < 0, -1e-30, 1e-30), d)
    # packet majority direction sign per axis (dirIsNeg analog)
    neg_major = jnp.sum((d < 0).astype(jnp.int32), axis=1) > (PACKET // 2)

    depth = bvh.max_depth + 2
    stack0 = jnp.zeros((np_, depth), jnp.int32)   # root pre-pushed
    sp0 = jnp.ones((np_,), jnp.int32)
    t_best0 = jnp.where(tmax >= tmin, tmax, tmin - 1.0)
    prim0 = jnp.full((np_, PACKET), -1, jnp.int32)
    z = jnp.zeros((np_, PACKET), jnp.float32)
    alive0 = tmax >= tmin
    pk = jnp.arange(np_)
    k = bvh.k

    # ---- inner: node-only steps, buffering leaf clusters -----------------
    def inner_cond(st):
        stack, sp, nbuf, _, t_best, done = st
        return jnp.any((sp > 0) & (nbuf < LEAF_BUF))

    def inner_body(st):
        stack, sp, nbuf, buf, t_best, done = st
        can = (sp > 0) & (nbuf < LEAF_BUF)
        spm1 = jnp.where(can, sp - 1, sp)
        node = jnp.take_along_axis(stack, jnp.maximum(spm1, 0)[:, None],
                                   axis=1)[:, 0]
        node = jnp.where(can, node, 0)
        lo = bvh.node_lo[node]
        hi = bvh.node_hi[node]
        t0s = (lo[:, None, :] - o) * inv_d
        t1s = (hi[:, None, :] - o) * inv_d
        tn = jnp.maximum(jnp.max(jnp.minimum(t0s, t1s), axis=-1), tmin)
        tf = jnp.minimum(jnp.min(jnp.maximum(t0s, t1s), axis=-1), t_best)
        ray_hit = (tn <= tf) & alive0 & ~done
        packet_hit = can & jnp.any(ray_hit, axis=1)
        ch = bvh.node_child[node]
        is_leaf = ch[:, 0] < 0
        # buffer leaf cluster
        take_leaf = packet_hit & is_leaf
        cid = -ch[:, 0] - 1
        buf = buf.at[pk, jnp.minimum(nbuf, LEAF_BUF - 1)].set(
            jnp.where(take_leaf, cid,
                      buf[pk, jnp.minimum(nbuf, LEAF_BUF - 1)]))
        nbuf = jnp.where(take_leaf, nbuf + 1, nbuf)
        # push children near-first
        axis = bvh.node_axis[node]
        swap = jnp.take_along_axis(neg_major, axis[:, None], axis=1)[:, 0]
        near = jnp.where(swap, ch[:, 1], ch[:, 0])
        far = jnp.where(swap, ch[:, 0], ch[:, 1])
        do_push = packet_hit & ~is_leaf
        sp1 = jnp.where(can, spm1, sp)
        stack = stack.at[pk, jnp.minimum(sp1, depth - 1)].set(
            jnp.where(do_push, far, stack[pk, jnp.minimum(sp1, depth - 1)]))
        sp2 = jnp.where(do_push, sp1 + 1, sp1)
        stack = stack.at[pk, jnp.minimum(sp2, depth - 1)].set(
            jnp.where(do_push, near, stack[pk, jnp.minimum(sp2, depth - 1)]))
        sp3 = jnp.where(do_push, sp2 + 1, sp2)
        return (stack, sp3, nbuf, buf, t_best, done)

    # ---- flush: dense MT over buffered clusters --------------------------
    def flush(nbuf, buf, t_best, prim, b1, b2, done):
        cv0 = bvh.tri_v0[buf].reshape(np_, LEAF_BUF * k, 3)[:, None]
        ce1 = bvh.tri_e1[buf].reshape(np_, LEAF_BUF * k, 3)[:, None]
        ce2 = bvh.tri_e2[buf].reshape(np_, LEAF_BUF * k, 3)[:, None]
        if has_motion:
            # continuous motion: lerp vertices to each ray's shutter time
            tt = time[:, :, None, None]
            cv0 = cv0 + tt * bvh.tri_dv0[buf].reshape(
                np_, LEAF_BUF * k, 3)[:, None]
            ce1 = ce1 + tt * bvh.tri_de1[buf].reshape(
                np_, LEAF_BUF * k, 3)[:, None]
            ce2 = ce2 + tt * bvh.tri_de2[buf].reshape(
                np_, LEAF_BUF * k, 3)[:, None]
        ctid = bvh.tri_id[buf].reshape(np_, LEAF_BUF * k)
        slot_ok = (jnp.arange(LEAF_BUF)[None, :] < nbuf[:, None])
        slot_ok = jnp.repeat(slot_ok, k, axis=1)
        pvec = jnp.cross(d[:, :, None, :], ce2)
        det = jnp.sum(ce1 * pvec, axis=-1)
        inv_det = 1.0 / jnp.where(jnp.abs(det) < TRI_EPS, 1.0, det)
        tvec = o[:, :, None, :] - cv0
        u = jnp.sum(tvec * pvec, axis=-1) * inv_det
        qvec = jnp.cross(tvec, ce1)
        v = jnp.sum(d[:, :, None, :] * qvec, axis=-1) * inv_det
        t = jnp.sum(ce2 * qvec, axis=-1) * inv_det
        tri_ok = ((jnp.abs(det) >= TRI_EPS)
                  & (u >= -BARY_EPS) & (v >= -BARY_EPS)
                  & (u + v <= 1.0 + BARY_EPS)
                  & (ctid[:, None, :] >= 0)
                  & slot_ok[:, None, :]
                  & (t > tmin[:, :, None]) & (t < t_best[:, :, None])
                  & (alive0 & ~done)[:, :, None])
        t_m = jnp.where(tri_ok, t, jnp.inf)
        jbest = jnp.argmin(t_m, axis=-1)
        tbj = jnp.take_along_axis(t_m, jbest[..., None], axis=-1)[..., 0]
        better = tbj < t_best
        take = lambda a: jnp.take_along_axis(
            a, jbest[..., None], axis=-1)[..., 0]
        t_best = jnp.where(better, tbj, t_best)
        prim_hit = jnp.take_along_axis(
            jnp.broadcast_to(ctid[:, None, :],
                             (np_, PACKET, LEAF_BUF * k)),
            jbest[..., None], axis=-1)[..., 0]
        prim = jnp.where(better, prim_hit, prim)
        b1 = jnp.where(better, take(u), b1)
        b2 = jnp.where(better, take(v), b2)
        if any_hit:
            done = done | (prim >= 0)
        return t_best, prim, b1, b2, done

    def outer_cond(st):
        return jnp.any(st[1] > 0) | jnp.any(st[2] > 0)

    def outer_body(st):
        stack, sp, nbuf, buf, t_best, prim, b1, b2, done = st
        stack, sp, nbuf, buf, t_best, done = jax.lax.while_loop(
            inner_cond, inner_body, (stack, sp, nbuf, buf, t_best, done))
        t_best, prim, b1, b2, done = flush(nbuf, buf, t_best, prim, b1, b2,
                                           done)
        nbuf = jnp.zeros_like(nbuf)
        if any_hit:
            sp = jnp.where(jnp.all(done | ~alive0, axis=1), 0, sp)
        return (stack, sp, nbuf, buf, t_best, prim, b1, b2, done)

    buf0 = jnp.zeros((np_, LEAF_BUF), jnp.int32)
    nbuf0 = jnp.zeros((np_,), jnp.int32)
    done0 = jnp.zeros((np_, PACKET), bool)
    st = (stack0, sp0, nbuf0, buf0, t_best0, prim0, z, z, done0)
    st = jax.lax.while_loop(outer_cond, outer_body, st)
    _, _, _, _, t_best, prim, b1, b2, _ = st
    t_flat = t_best.reshape(-1)[:r]
    prim_flat = prim.reshape(-1)[:r]
    b1f = b1.reshape(-1)[:r]
    b2f = b2.reshape(-1)[:r]
    t_out = jnp.where(prim_flat >= 0, t_flat, jnp.float32(jnp.inf))
    return Hits(t=t_out, prim=prim_flat, b1=b1f, b2=b2f)


def intersect(bvh: ClusterBVH, rays: vm.Rays) -> Hits:
    return _traverse(bvh, rays, any_hit=False)


def intersect_p(bvh: ClusterBVH, rays: vm.Rays):
    h = _traverse(bvh, rays, any_hit=True)
    return h.prim >= 0
