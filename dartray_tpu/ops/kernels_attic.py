"""Kernel attic: superseded traversal-kernel generations (v1-v4) and the
opt-in Woop-MXU kernel (v7), moved out of the production hot-path module
(ops/traverse_pallas.py keeps only the shipping v5/v6 family + glue).

These remain importable for the tools/exp_* experiment scripts and the
kernel-oracle tests; ops.traverse_pallas lazily re-exports every name here
(PEP 562 __getattr__), so `tp.traverse3` etc. keep working. History and
measurements: tools/PERF_NOTES.md. v7 note: its (C, 4, 3K) Woop operand is
no longer built by pack() (it cost ~48 B/tri of transfer+HBM on every
scene); call `with_woop(packed)` before traverse7.
"""
from __future__ import annotations

import dataclasses
import functools
from functools import partial

import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .traverse_pallas import (PackedBVH, STACK_DEPTH, TRI_EPS, BARY_EPS,
                              IDX_BITS, IDX_MASK, _pad_to, _plane_blocks,
                              _components, _mt_dense, _fold_packed,
                              _chunked, CHUNK_SUBROWS, finish_hits)


def with_woop(packed: PackedBVH) -> PackedBVH:
    """Attach the v7 Woop operand (host numpy) to a PackedBVH."""
    return dataclasses.replace(
        packed, woop=woop_pack(packed.tv0, packed.te1, packed.te2))

def _kernel(bounds_ref, meta_ref,
            v0x_ref, v0y_ref, v0z_ref,
            e1x_ref, e1y_ref, e1z_ref,
            e2x_ref, e2y_ref, e2z_ref,
            ox_ref, oy_ref, oz_ref, dx_ref, dy_ref, dz_ref,
            tmin_ref, tmax_ref,
            t_out, prim_out, stack_ref,
            *, k: int, rows: int, any_hit: bool):
    ox, oy, oz = ox_ref[:], oy_ref[:], oz_ref[:]
    dx, dy, dz = dx_ref[:], dy_ref[:], dz_ref[:]
    tmin = tmin_ref[:]
    tmax = tmax_ref[:]

    def safe_inv(d):
        tiny = jnp.where(d < 0, jnp.float32(-1e-30), jnp.float32(1e-30))
        return 1.0 / jnp.where(jnp.abs(d) < 1e-30, tiny, d)

    ix, iy, iz = safe_inv(dx), safe_inv(dy), safe_inv(dz)
    alive = tmax >= tmin
    half = jnp.float32(rows * 128 / 2)
    negx = jnp.sum(jnp.where(dx < 0, 1.0, 0.0)) > half
    negy = jnp.sum(jnp.where(dy < 0, 1.0, 0.0)) > half
    negz = jnp.sum(jnp.where(dz < 0, 1.0, 0.0)) > half

    t0 = jnp.where(alive, tmax, jnp.float32(-jnp.inf))
    prim0 = jnp.full((rows, 128), -1, jnp.int32)
    stack_ref[0] = jnp.int32(0)

    o3 = (ox.reshape(1, rows, 128), oy.reshape(1, rows, 128),
          oz.reshape(1, rows, 128))
    d3 = (dx.reshape(1, rows, 128), dy.reshape(1, rows, 128),
          dz.reshape(1, rows, 128))
    tmin3 = tmin.reshape(1, rows, 128)

    def leaf_test(cid, t_best, prim, slab_hit):
        base = cid * k

        def col(ref):
            row = ref[pl.ds(cid, 1), :]                 # (1, K)
            return jnp.transpose(row, (1, 0)).reshape(k, 1, 1)

        v0 = (col(v0x_ref), col(v0y_ref), col(v0z_ref))
        e1 = (col(e1x_ref), col(e1y_ref), col(e1z_ref))
        e2 = (col(e2x_ref), col(e2y_ref), col(e2z_ref))
        # Moeller-Trumbore, (K, rows, 128) dense
        px = d3[1] * e2[2] - d3[2] * e2[1]
        py = d3[2] * e2[0] - d3[0] * e2[2]
        pz = d3[0] * e2[1] - d3[1] * e2[0]
        det = e1[0] * px + e1[1] * py + e1[2] * pz
        inv_det = 1.0 / jnp.where(jnp.abs(det) < TRI_EPS, 1.0, det)
        tx = o3[0] - v0[0]
        ty = o3[1] - v0[1]
        tz = o3[2] - v0[2]
        u = (tx * px + ty * py + tz * pz) * inv_det
        qx = ty * e1[2] - tz * e1[1]
        qy = tz * e1[0] - tx * e1[2]
        qz = tx * e1[1] - ty * e1[0]
        v = (d3[0] * qx + d3[1] * qy + d3[2] * qz) * inv_det
        t = (e2[0] * qx + e2[1] * qy + e2[2] * qz) * inv_det
        ok = ((jnp.abs(det) >= TRI_EPS)
              & (u >= -BARY_EPS) & (v >= -BARY_EPS)
              & (u + v <= 1.0 + BARY_EPS)
              & (t > tmin3) & slab_hit.reshape(1, rows, 128))
        tm = jnp.where(ok, t, jnp.float32(jnp.inf))
        # fold winner over K (prim id = base + j, pure arithmetic)
        for j in range(k):
            tj = tm[j]
            better = tj < t_best
            t_best = jnp.where(better, tj, t_best)
            prim = jnp.where(better, base + j, prim)
        return t_best, prim

    def cond(st):
        sp, t_best, prim = st
        live = sp > 0
        if any_hit:
            live = live & ~jnp.all((prim >= 0) | ~alive)
        return live

    def body(st):
        sp, t_best, prim = st
        node = stack_ref[sp - 1]
        sp = sp - 1
        lox = bounds_ref[node, 0]
        loy = bounds_ref[node, 1]
        loz = bounds_ref[node, 2]
        hix = bounds_ref[node, 3]
        hiy = bounds_ref[node, 4]
        hiz = bounds_ref[node, 5]
        t0x = (lox - ox) * ix
        t1x = (hix - ox) * ix
        t0y = (loy - oy) * iy
        t1y = (hiy - oy) * iy
        t0z = (loz - oz) * iz
        t1z = (hiz - oz) * iz
        tn = jnp.maximum(jnp.maximum(jnp.minimum(t0x, t1x),
                                     jnp.minimum(t0y, t1y)),
                         jnp.maximum(jnp.minimum(t0z, t1z), tmin))
        tf = jnp.minimum(jnp.minimum(jnp.maximum(t0x, t1x),
                                     jnp.maximum(t0y, t1y)),
                         jnp.minimum(jnp.maximum(t0z, t1z), t_best))
        if any_hit:
            slab_hit = (tn <= tf) & alive & (prim < 0)
        else:
            slab_hit = (tn <= tf) & alive
        nhit = jnp.any(slab_hit)
        c0 = meta_ref[node, 0]
        is_leaf = c0 < 0

        # interior: push far then near (predicated; slots above sp are dead)
        c1 = meta_ref[node, 1]
        axis = meta_ref[node, 2]
        neg = jnp.where(axis == 0, negx, jnp.where(axis == 1, negy, negz))
        near = jnp.where(neg, c1, c0)
        far = jnp.where(neg, c0, c1)
        do_push = nhit & ~is_leaf

        @pl.when(do_push)
        def _():
            stack_ref[sp] = far
            stack_ref[sp + 1] = near

        sp = sp + jnp.where(do_push, 2, 0)

        t_best, prim = jax.lax.cond(
            nhit & is_leaf,
            lambda tb, pr: leaf_test(-c0 - 1, tb, pr, slab_hit),
            lambda tb, pr: (tb, pr),
            t_best, prim)
        return sp, t_best, prim

    _, t_best, prim = jax.lax.while_loop(
        cond, body, (jnp.int32(1), t0, prim0))
    t_out[:] = jnp.where(prim >= 0, t_best, jnp.float32(jnp.inf))
    prim_out[:] = prim

@partial(jax.jit, static_argnames=("any_hit", "block_rows", "interpret"))
def traverse(bvh: PackedBVH, o, d, tmin, tmax, *, any_hit: bool = False,
             block_rows: int = 8, interpret: bool = False):
    """Closest-hit (or any-hit) of rays vs the packed scene.

    o, d: (R, 3); tmin/tmax: (R,). Returns (t (R,), prim (R,)) with t = inf,
    prim = -1 on miss. prim indexes the PERMUTED triangle order (cid*K + j).
    """
    planes, shape2, n_blocks, r = _plane_blocks(o, d, tmin, tmax, block_rows)

    grid = (n_blocks,)
    tri_spec = pl.BlockSpec(
        (1, bvh.n_clusters, bvh.k), lambda i: (0, 0, 0),
        memory_space=pltpu.VMEM)
    full = lambda a: pl.BlockSpec(a.shape, lambda i: (0,) * a.ndim,
                                  memory_space=pltpu.VMEM)
    ray_spec = pl.BlockSpec((block_rows, 128), lambda i: (i, 0),
                            memory_space=pltpu.VMEM)
    tri_args = []
    tri_specs = []
    for arr in (bvh.tv0, bvh.te1, bvh.te2):
        for c in range(3):
            tri_args.append(arr[c])
            tri_specs.append(full(arr[c]))

    kern = partial(_kernel, k=bvh.k, rows=block_rows, any_hit=any_hit)
    t, prim = pl.pallas_call(
        kern,
        grid=grid,
        out_shape=(jax.ShapeDtypeStruct(shape2, jnp.float32),
                   jax.ShapeDtypeStruct(shape2, jnp.int32)),
        in_specs=([full(bvh.bounds), full(bvh.meta)]
                  + tri_specs
                  + [ray_spec] * 8),
        out_specs=(ray_spec, ray_spec),
        scratch_shapes=[pltpu.SMEM((STACK_DEPTH,), jnp.int32)],
        interpret=interpret,
    )(bvh.bounds, bvh.meta, *tri_args, *planes)
    return t.reshape(-1)[:r], prim.reshape(-1)[:r]


# ---------------------------------------------------------------------------
# Kernel v2: per-sublane-row packets with independent stacks + leaf buffers.
#
# v1 (above) gives every (rows x 128) block ONE stack, so a block visits the
# UNION of its rays' nodes and every leaf in that union runs the dense MT test
# against all block rays — fine for coherent camera packets, ruinous for
# bounce rays. v2 runs P=8 independent 128-ray packets per grid program in
# lockstep: the stack is (depth, P) in SMEM with one column per packet, node
# bounds for the P current nodes are assembled from P (1,8) VMEM row loads
# into an (P,8) tile whose columns broadcast against the (P,128) ray planes,
# and popped leaf clusters go to PER-PACKET buffers that are flushed in
# aligned rounds — each packet tests only ITS OWN cluster in one dense
# (K, P, 128) MT evaluation. Packets that are done push NULL ids that map to
# a sentinel node/cluster row (empty box / zero-edge triangles), keeping the
# lockstep rows branch-free.
# ---------------------------------------------------------------------------

LEAF_BUFN = 8


def _kernel4(bounds_ref, meta_ref,
             v0x_ref, v0y_ref, v0z_ref,
             e1x_ref, e1y_ref, e1z_ref,
             e2x_ref, e2y_ref, e2z_ref,
             ox_ref, oy_ref, oz_ref, dx_ref, dy_ref, dz_ref,
             tmin_ref, tmax_ref,
             t_out, prim_out,
             stack_ref, lbuf_ref, lcnt_ref, spill_ref,
             *, k: int, rows: int, any_hit: bool, null_node: int,
             null_cluster: int):
    """v4 = v2 (independent 128-ray packet per sublane row) with node meta in
    SMEM and the index-packed winner fold. See _kernel2 docs."""
    P = rows
    ox, oy, oz = ox_ref[:], oy_ref[:], oz_ref[:]
    dx, dy, dz = dx_ref[:], dy_ref[:], dz_ref[:]
    tmin = tmin_ref[:]
    tmax = tmax_ref[:]

    def safe_inv(d):
        tiny = jnp.where(d < 0, jnp.float32(-1e-30), jnp.float32(1e-30))
        return 1.0 / jnp.where(jnp.abs(d) < 1e-30, tiny, d)

    ix, iy, iz = safe_inv(dx), safe_inv(dy), safe_inv(dz)
    alive = tmax >= tmin

    half = jnp.float32(64.0)
    negf = jnp.concatenate(
        [jnp.sum(jnp.where(dx < 0, 1.0, 0.0), axis=1, keepdims=True),
         jnp.sum(jnp.where(dy < 0, 1.0, 0.0), axis=1, keepdims=True),
         jnp.sum(jnp.where(dz < 0, 1.0, 0.0), axis=1, keepdims=True)],
        axis=1)                                     # (P, 3)
    spill_ref[:, 0:3] = negf
    neg_r = [[spill_ref[r, a] > half for a in range(3)] for r in range(P)]

    t0 = jnp.where(alive, tmax, jnp.float32(-jnp.inf))
    prim0 = jnp.full((P, 128), -1, jnp.int32)
    for r in range(P):
        stack_ref[0, r] = jnp.int32(0)
        lcnt_ref[r] = jnp.int32(0)

    o3 = (ox.reshape(1, P, 128), oy.reshape(1, P, 128),
          oz.reshape(1, P, 128))
    d3 = (dx.reshape(1, P, 128), dy.reshape(1, P, 128),
          dz.reshape(1, P, 128))
    tmin3 = tmin.reshape(1, P, 128)

    def flush(t_best, prim):
        cnts = [lcnt_ref[r] for r in range(P)]
        max_cnt = functools.reduce(jnp.maximum, cnts)

        def round_fn(i, carry):
            t_best, prim = carry
            cids = [jnp.where(i < lcnt_ref[r], lbuf_ref[r, i],
                              jnp.int32(null_cluster)) for r in range(P)]

            def cols(ref):
                rows_ = [ref[pl.ds(cids[r], 1), :] for r in range(P)]
                m = jnp.concatenate(rows_, axis=0)          # (P, K)
                return jnp.transpose(m, (1, 0)).reshape(k, P, 1)

            v0 = (cols(v0x_ref), cols(v0y_ref), cols(v0z_ref))
            e1 = (cols(e1x_ref), cols(e1y_ref), cols(e1z_ref))
            e2 = (cols(e2x_ref), cols(e2y_ref), cols(e2z_ref))
            tm = _mt_dense(o3, d3, tmin3, v0, e1, e2, k)
            live = alive if not any_hit else (alive & (prim < 0))
            tm = jnp.where(live.reshape(1, P, 128), tm,
                           jnp.float32(jnp.inf))
            base = jnp.zeros((P, 128), jnp.int32)
            rsel = jax.lax.broadcasted_iota(jnp.int32, (P, 128), 0)
            for r in range(P):
                base = jnp.where(rsel == r, cids[r] * k, base)
            return _fold_packed(tm, t_best, prim, base, k)

        t_best, prim = jax.lax.fori_loop(0, max_cnt, round_fn,
                                         (t_best, prim))
        for r in range(P):
            lcnt_ref[r] = jnp.int32(0)
        return t_best, prim

    def node_steps(sp, t_best, prim):
        def cond(st):
            sp, t_best, prim, full = st
            return (sp > 0) & ~full

        def body(st):
            sp, t_best, prim, _ = st
            sp = sp - 1
            node_r = [stack_ref[sp, r] for r in range(P)]
            brows = [bounds_ref[pl.ds(node_r[r], 1), :] for r in range(P)]
            B = jnp.concatenate(brows, axis=0)           # (P, 8)
            lox, loy, loz = B[:, 0:1], B[:, 1:2], B[:, 2:3]
            hix, hiy, hiz = B[:, 3:4], B[:, 4:5], B[:, 5:6]
            t0x = (lox - ox) * ix
            t1x = (hix - ox) * ix
            t0y = (loy - oy) * iy
            t1y = (hiy - oy) * iy
            t0z = (loz - oz) * iz
            t1z = (hiz - oz) * iz
            tn = jnp.maximum(jnp.maximum(jnp.minimum(t0x, t1x),
                                         jnp.minimum(t0y, t1y)),
                             jnp.maximum(jnp.minimum(t0z, t1z), tmin))
            tf = jnp.minimum(jnp.minimum(jnp.maximum(t0x, t1x),
                                         jnp.maximum(t0y, t1y)),
                             jnp.minimum(jnp.maximum(t0z, t1z), t_best))
            if any_hit:
                slab = (tn <= tf) & alive & (prim < 0)
            else:
                slab = (tn <= tf) & alive
            nhit_v = jnp.sum(jnp.where(slab, 1.0, 0.0), axis=1,
                             keepdims=True)               # (P, 1)
            spill_ref[:, 4:5] = nhit_v
            any_push = jnp.bool_(False)
            full = jnp.bool_(False)
            for r in range(P):
                valid_r = node_r[r] != null_node
                nhit_r = (spill_ref[r, 4] > 0.5) & valid_r
                m0 = meta_ref[node_r[r], 0]
                c1 = meta_ref[node_r[r], 1]
                is_leaf = m0 < 0
                c0 = m0 >> 2
                ax = m0 & 3
                push_r = nhit_r & ~is_leaf
                neg = jnp.where(ax == 0, neg_r[r][0],
                                jnp.where(ax == 1, neg_r[r][1], neg_r[r][2]))
                near = jnp.where(neg, c1, c0)
                far = jnp.where(neg, c0, c1)
                stack_ref[sp, r] = jnp.where(push_r, far,
                                             jnp.int32(null_node))
                stack_ref[sp + 1, r] = jnp.where(push_r, near,
                                                 jnp.int32(null_node))
                any_push = any_push | push_r
                take = nhit_r & is_leaf
                cnt = lcnt_ref[r]

                @pl.when(take)
                def _():
                    lbuf_ref[r, cnt] = -m0 - 1
                    lcnt_ref[r] = cnt + 1

                full = full | (jnp.where(take, cnt + 1, cnt)
                               >= LEAF_BUFN)
            sp = sp + jnp.where(any_push, 2, 0)
            if any_hit:
                done_all = jnp.all((prim >= 0) | ~alive)
                sp = jnp.where(done_all, 0, sp)
            return sp, t_best, prim, full

        return jax.lax.while_loop(cond, body,
                                  (sp, t_best, prim, jnp.bool_(False)))

    def outer_cond(st):
        sp, t_best, prim = st
        return sp > 0

    def outer_body(st):
        sp, t_best, prim = st
        sp, t_best, prim, _ = node_steps(sp, t_best, prim)
        t_best, prim = flush(t_best, prim)
        return sp, t_best, prim

    sp, t_best, prim = jax.lax.while_loop(
        outer_cond, outer_body, (jnp.int32(1), t0, prim0))
    t_out[:] = jnp.where(prim >= 0, t_best, jnp.float32(jnp.inf))
    prim_out[:] = prim


def _null_extended(bvh: PackedBVH, compact: bool = False):
    """bounds/meta/tris with sentinel rows appended (null node + cluster)."""
    bounds = jnp.concatenate(
        [bvh.bounds,
         jnp.asarray([[jnp.inf] * 3 + [-jnp.inf] * 3 + [0, 0]],
                     jnp.float32)])
    if compact:
        meta = jnp.concatenate([bvh.meta2,
                                jnp.asarray([[4, 1]], jnp.int32)])
    else:
        meta = jnp.concatenate([bvh.meta,
                                jnp.asarray([[1, 1, 0, 0]], jnp.int32)])

    def with_null(arr3):
        z = jnp.zeros((1, bvh.k), arr3.dtype)
        return [jnp.concatenate([arr3[c], z]) for c in range(3)]

    tri_args = (with_null(bvh.tv0) + with_null(bvh.te1)
                + with_null(bvh.te2))
    return bounds, meta, tri_args


@partial(jax.jit, static_argnames=("any_hit", "block_rows", "interpret",
                                   "meta_smem"))
def traverse4(bvh: PackedBVH, o, d, tmin, tmax, *, any_hit: bool = False,
              block_rows: int = 8, interpret: bool = False,
              meta_smem: bool | None = None):
    """v4: per-packet stacks + SMEM meta + packed fold."""
    planes, shape2, n_blocks, r = _plane_blocks(o, d, tmin, tmax, block_rows)
    bounds, meta, tri_args = _null_extended(bvh, compact=True)
    full = lambda a, ms=pltpu.VMEM: pl.BlockSpec(
        a.shape, lambda i: (0,) * a.ndim, memory_space=ms)
    ray_spec = pl.BlockSpec((block_rows, 128), lambda i: (i, 0),
                            memory_space=pltpu.VMEM)
    if meta_smem is None:
        meta_smem = bvh.n_nodes + 1 <= SMEM_META_MAX
    meta_space = pltpu.SMEM if meta_smem else pltpu.VMEM

    kern = partial(_kernel4, k=bvh.k, rows=block_rows, any_hit=any_hit,
                   null_node=bvh.n_nodes, null_cluster=bvh.n_clusters)
    t, prim = pl.pallas_call(
        kern,
        grid=(n_blocks,),
        out_shape=(jax.ShapeDtypeStruct(shape2, jnp.float32),
                   jax.ShapeDtypeStruct(shape2, jnp.int32)),
        in_specs=([full(bounds), full(meta, meta_space)]
                  + [full(a) for a in tri_args]
                  + [ray_spec] * 8),
        out_specs=(ray_spec, ray_spec),
        scratch_shapes=[pltpu.SMEM((STACK_DEPTH, block_rows), jnp.int32),
                        pltpu.SMEM((block_rows, LEAF_BUFN), jnp.int32),
                        pltpu.SMEM((block_rows,), jnp.int32),
                        pltpu.VMEM((block_rows, 8), jnp.float32)],
        interpret=interpret,
    )(bounds, meta, *tri_args, *planes)
    return t.reshape(-1)[:r], prim.reshape(-1)[:r]

def _kernel2(bounds_ref, meta_ref,
             v0x_ref, v0y_ref, v0z_ref,
             e1x_ref, e1y_ref, e1z_ref,
             e2x_ref, e2y_ref, e2z_ref,
             ox_ref, oy_ref, oz_ref, dx_ref, dy_ref, dz_ref,
             tmin_ref, tmax_ref,
             t_out, prim_out,
             stack_ref, lbuf_ref, lcnt_ref, spill_ref,
             *, k: int, rows: int, any_hit: bool, null_node: int,
             null_cluster: int):
    P = rows
    ox, oy, oz = ox_ref[:], oy_ref[:], oz_ref[:]
    dx, dy, dz = dx_ref[:], dy_ref[:], dz_ref[:]
    tmin = tmin_ref[:]
    tmax = tmax_ref[:]

    def safe_inv(d):
        tiny = jnp.where(d < 0, jnp.float32(-1e-30), jnp.float32(1e-30))
        return 1.0 / jnp.where(jnp.abs(d) < 1e-30, tiny, d)

    ix, iy, iz = safe_inv(dx), safe_inv(dy), safe_inv(dz)
    alive = tmax >= tmin

    # per-packet majority direction sign -> scalars via VMEM spill round-trip
    half = jnp.float32(64.0)
    negf = jnp.concatenate(
        [jnp.sum(jnp.where(dx < 0, 1.0, 0.0), axis=1, keepdims=True),
         jnp.sum(jnp.where(dy < 0, 1.0, 0.0), axis=1, keepdims=True),
         jnp.sum(jnp.where(dz < 0, 1.0, 0.0), axis=1, keepdims=True)],
        axis=1)                                     # (P, 3)
    spill_ref[:, 0:3] = negf
    neg_r = [[spill_ref[r, a] > half for a in range(3)] for r in range(P)]

    t0 = jnp.where(alive, tmax, jnp.float32(-jnp.inf))
    prim0 = jnp.full((P, 128), -1, jnp.int32)
    for r in range(P):
        stack_ref[0, r] = jnp.int32(0)
        lcnt_ref[r] = jnp.int32(0)

    o3 = (ox.reshape(1, P, 128), oy.reshape(1, P, 128),
          oz.reshape(1, P, 128))
    d3 = (dx.reshape(1, P, 128), dy.reshape(1, P, 128),
          dz.reshape(1, P, 128))
    tmin3 = tmin.reshape(1, P, 128)

    def flush(t_best, prim):
        """Aligned leaf rounds: one buffered cluster per packet per round."""
        cnts = [lcnt_ref[r] for r in range(P)]
        max_cnt = functools.reduce(jnp.maximum, cnts)

        def round_fn(i, carry):
            t_best, prim = carry
            cids = [jnp.where(i < lcnt_ref[r], lbuf_ref[r, i],
                              jnp.int32(null_cluster)) for r in range(P)]

            def cols(ref):
                rows_ = [ref[pl.ds(cids[r], 1), :] for r in range(P)]
                m = jnp.concatenate(rows_, axis=0)          # (P, K)
                return jnp.transpose(m, (1, 0)).reshape(k, P, 1)

            v0 = (cols(v0x_ref), cols(v0y_ref), cols(v0z_ref))
            e1 = (cols(e1x_ref), cols(e1y_ref), cols(e1z_ref))
            e2 = (cols(e2x_ref), cols(e2y_ref), cols(e2z_ref))
            px = d3[1] * e2[2] - d3[2] * e2[1]
            py = d3[2] * e2[0] - d3[0] * e2[2]
            pz = d3[0] * e2[1] - d3[1] * e2[0]
            det = e1[0] * px + e1[1] * py + e1[2] * pz
            inv_det = 1.0 / jnp.where(jnp.abs(det) < TRI_EPS, 1.0, det)
            tx = o3[0] - v0[0]
            ty = o3[1] - v0[1]
            tz = o3[2] - v0[2]
            u = (tx * px + ty * py + tz * pz) * inv_det
            qx = ty * e1[2] - tz * e1[1]
            qy = tz * e1[0] - tx * e1[2]
            qz = tx * e1[1] - ty * e1[0]
            v = (d3[0] * qx + d3[1] * qy + d3[2] * qz) * inv_det
            t = (e2[0] * qx + e2[1] * qy + e2[2] * qz) * inv_det
            live = alive if not any_hit else (alive & (prim < 0))
            ok = ((jnp.abs(det) >= TRI_EPS)
                  & (u >= -BARY_EPS) & (v >= -BARY_EPS)
                  & (u + v <= 1.0 + BARY_EPS)
                  & (t > tmin3) & live.reshape(1, P, 128))
            tm = jnp.where(ok, t, jnp.float32(jnp.inf))
            # per-packet base prim id vector (P, 128)
            base = jnp.zeros((P, 128), jnp.int32)
            rsel = jax.lax.broadcasted_iota(jnp.int32, (P, 128), 0)
            for r in range(P):
                base = jnp.where(rsel == r, cids[r] * k, base)
            for j in range(k):
                tj = tm[j]
                better = tj < t_best
                t_best = jnp.where(better, tj, t_best)
                prim = jnp.where(better, base + j, prim)
            return t_best, prim

        t_best, prim = jax.lax.fori_loop(0, max_cnt, round_fn,
                                         (t_best, prim))
        for r in range(P):
            lcnt_ref[r] = jnp.int32(0)
        return t_best, prim

    def node_steps(sp, t_best, prim):
        """Pop/test/push until stacks drain or any leaf buffer fills."""
        def cond(st):
            sp, t_best, prim, full = st
            return (sp > 0) & ~full

        def body(st):
            sp, t_best, prim, _ = st
            sp = sp - 1
            node_r = [stack_ref[sp, r] for r in range(P)]
            brows = [bounds_ref[pl.ds(node_r[r], 1), :] for r in range(P)]
            B = jnp.concatenate(brows, axis=0)           # (P, 8)
            lox, loy, loz = B[:, 0:1], B[:, 1:2], B[:, 2:3]
            hix, hiy, hiz = B[:, 3:4], B[:, 4:5], B[:, 5:6]
            t0x = (lox - ox) * ix
            t1x = (hix - ox) * ix
            t0y = (loy - oy) * iy
            t1y = (hiy - oy) * iy
            t0z = (loz - oz) * iz
            t1z = (hiz - oz) * iz
            tn = jnp.maximum(jnp.maximum(jnp.minimum(t0x, t1x),
                                         jnp.minimum(t0y, t1y)),
                             jnp.maximum(jnp.minimum(t0z, t1z), tmin))
            tf = jnp.minimum(jnp.minimum(jnp.maximum(t0x, t1x),
                                         jnp.maximum(t0y, t1y)),
                             jnp.minimum(jnp.maximum(t0z, t1z), t_best))
            if any_hit:
                slab = (tn <= tf) & alive & (prim < 0)
            else:
                slab = (tn <= tf) & alive
            nhit_v = jnp.sum(jnp.where(slab, 1.0, 0.0), axis=1,
                             keepdims=True)               # (P, 1)
            spill_ref[:, 4:5] = nhit_v
            any_push = jnp.bool_(False)
            full = jnp.bool_(False)
            for r in range(P):
                # NOTE: the [+inf,-inf] sentinel box is NOT a miss under the
                # min/max slab test (per-axis ordering turns it into an
                # everything-box), so null nodes must be masked explicitly.
                valid_r = node_r[r] != null_node
                nhit_r = (spill_ref[r, 4] > 0.5) & valid_r
                c0 = meta_ref[node_r[r], 0]
                c1 = meta_ref[node_r[r], 1]
                ax = meta_ref[node_r[r], 2]
                is_leaf = c0 < 0
                push_r = nhit_r & ~is_leaf
                neg = jnp.where(ax == 0, neg_r[r][0],
                                jnp.where(ax == 1, neg_r[r][1], neg_r[r][2]))
                near = jnp.where(neg, c1, c0)
                far = jnp.where(neg, c0, c1)
                stack_ref[sp, r] = jnp.where(push_r, far,
                                             jnp.int32(null_node))
                stack_ref[sp + 1, r] = jnp.where(push_r, near,
                                                 jnp.int32(null_node))
                any_push = any_push | push_r
                # leaf: buffer cid
                take = nhit_r & is_leaf
                cnt = lcnt_ref[r]

                @pl.when(take)
                def _():
                    lbuf_ref[r, cnt] = -c0 - 1
                    lcnt_ref[r] = cnt + 1

                full = full | (jnp.where(take, cnt + 1, cnt)
                               >= LEAF_BUFN)
            sp = sp + jnp.where(any_push, 2, 0)
            if any_hit:
                done_all = jnp.all((prim >= 0) | ~alive)
                sp = jnp.where(done_all, 0, sp)
            return sp, t_best, prim, full

        return jax.lax.while_loop(cond, body,
                                  (sp, t_best, prim, jnp.bool_(False)))

    def outer_cond(st):
        sp, t_best, prim = st
        return sp > 0

    def outer_body(st):
        sp, t_best, prim = st
        sp, t_best, prim, _ = node_steps(sp, t_best, prim)
        t_best, prim = flush(t_best, prim)
        return sp, t_best, prim

    sp, t_best, prim = jax.lax.while_loop(
        outer_cond, outer_body, (jnp.int32(1), t0, prim0))
    t_out[:] = jnp.where(prim >= 0, t_best, jnp.float32(jnp.inf))
    prim_out[:] = prim


# ---------------------------------------------------------------------------
# Kernel v3: leaf-cluster BUFFERING — the node-step while_loop does nothing
# but slab tests + stack ops (no lax.cond leaf branch: Mosaic's cond costs
# show up in the hot loop), buffering hit leaf cluster ids in SMEM; a flush
# pass then runs the dense MT tests back-to-back. Node meta (children+axis)
# lives in SMEM when it fits (scalar loads off the scalar core instead of
# VMEM round-trips). Winner selection packs the candidate index into the low
# 7 mantissa bits of t so one jnp.min over the K axis yields both t and the
# triangle index (IEEE floats >= 0 compare like their bit patterns).
# Block topology = v1 (one stack per rows x 128 block): best for coherent
# (camera/shadow) wavefronts. v4 below is the per-packet variant for bounce
# rays.
# ---------------------------------------------------------------------------

LBUF3 = 16


def _kernel3(bounds_ref, meta_ref,
             v0x_ref, v0y_ref, v0z_ref,
             e1x_ref, e1y_ref, e1z_ref,
             e2x_ref, e2y_ref, e2z_ref,
             ox_ref, oy_ref, oz_ref, dx_ref, dy_ref, dz_ref,
             tmin_ref, tmax_ref,
             t_out, prim_out, *rest,
             k: int, rows: int, any_hit: bool, counters: bool = False):
    if counters:
        cnt_out, stack_ref, lbuf_ref = rest
    else:
        stack_ref, lbuf_ref = rest
    ox, oy, oz = ox_ref[:], oy_ref[:], oz_ref[:]
    dx, dy, dz = dx_ref[:], dy_ref[:], dz_ref[:]
    tmin = tmin_ref[:]
    tmax = tmax_ref[:]

    def safe_inv(d):
        tiny = jnp.where(d < 0, jnp.float32(-1e-30), jnp.float32(1e-30))
        return 1.0 / jnp.where(jnp.abs(d) < 1e-30, tiny, d)

    ix, iy, iz = safe_inv(dx), safe_inv(dy), safe_inv(dz)
    alive = tmax >= tmin
    half = jnp.float32(rows * 128 / 2)
    negx = jnp.sum(jnp.where(dx < 0, 1.0, 0.0)) > half
    negy = jnp.sum(jnp.where(dy < 0, 1.0, 0.0)) > half
    negz = jnp.sum(jnp.where(dz < 0, 1.0, 0.0)) > half

    t0 = jnp.where(alive, tmax, jnp.float32(-jnp.inf))
    prim0 = jnp.full((rows, 128), -1, jnp.int32)
    stack_ref[0] = jnp.int32(0)

    o3 = (ox.reshape(1, rows, 128), oy.reshape(1, rows, 128),
          oz.reshape(1, rows, 128))
    d3 = (dx.reshape(1, rows, 128), dy.reshape(1, rows, 128),
          dz.reshape(1, rows, 128))
    tmin3 = tmin.reshape(1, rows, 128)

    def node_steps(sp, nlb, t_best, prim, nsteps):
        def cond(st):
            sp, nlb, t_best, nsteps = st
            live = (sp > 0) & (nlb < LBUF3)
            return live

        def body(st):
            sp, nlb, t_best, nsteps = st
            nsteps = nsteps + 1
            node = stack_ref[sp - 1]
            sp = sp - 1
            lox = bounds_ref[node, 0]
            loy = bounds_ref[node, 1]
            loz = bounds_ref[node, 2]
            hix = bounds_ref[node, 3]
            hiy = bounds_ref[node, 4]
            hiz = bounds_ref[node, 5]
            t0x = (lox - ox) * ix
            t1x = (hix - ox) * ix
            t0y = (loy - oy) * iy
            t1y = (hiy - oy) * iy
            t0z = (loz - oz) * iz
            t1z = (hiz - oz) * iz
            tn = jnp.maximum(jnp.maximum(jnp.minimum(t0x, t1x),
                                         jnp.minimum(t0y, t1y)),
                             jnp.maximum(jnp.minimum(t0z, t1z), tmin))
            tf = jnp.minimum(jnp.minimum(jnp.maximum(t0x, t1x),
                                         jnp.maximum(t0y, t1y)),
                             jnp.minimum(jnp.maximum(t0z, t1z), t_best))
            if any_hit:
                slab_hit = (tn <= tf) & alive & (prim < 0)
            else:
                slab_hit = (tn <= tf) & alive
            nhit = jnp.any(slab_hit)
            m0 = meta_ref[node, 0]
            c1 = meta_ref[node, 1]
            is_leaf = m0 < 0
            c0 = m0 >> 2
            axis = m0 & 3
            neg = jnp.where(axis == 0, negx,
                            jnp.where(axis == 1, negy, negz))
            near = jnp.where(neg, c1, c0)
            far = jnp.where(neg, c0, c1)
            do_push = nhit & ~is_leaf
            take = nhit & is_leaf

            @pl.when(do_push)
            def _():
                stack_ref[sp] = far
                stack_ref[sp + 1] = near

            @pl.when(take)
            def _():
                lbuf_ref[nlb] = -m0 - 1

            sp = sp + jnp.where(do_push, 2, 0)
            nlb = nlb + jnp.where(take, 1, 0)
            return sp, nlb, t_best, nsteps

        return jax.lax.while_loop(cond, body, (sp, nlb, t_best, nsteps))

    def flush(nlb, t_best, prim):
        def round_fn(i, carry):
            t_best, prim = carry
            cid = lbuf_ref[i]

            def col(ref):
                row = ref[pl.ds(cid, 1), :]
                return jnp.transpose(row, (1, 0)).reshape(k, 1, 1)

            v0 = (col(v0x_ref), col(v0y_ref), col(v0z_ref))
            e1 = (col(e1x_ref), col(e1y_ref), col(e1z_ref))
            e2 = (col(e2x_ref), col(e2y_ref), col(e2z_ref))
            tm = _mt_dense(o3, d3, tmin3, v0, e1, e2, k, bf16=bf16)
            if any_hit:
                tm = jnp.where((alive & (prim < 0)).reshape(1, rows, 128),
                               tm, jnp.float32(jnp.inf))
            return _fold_packed(tm, t_best, prim, cid * k, k)

        return jax.lax.fori_loop(0, nlb, round_fn, (t_best, prim))

    def outer_cond(st):
        sp, nlb, t_best, prim, nsteps, nleaf = st
        live = (sp > 0) | (nlb > 0)
        if any_hit:
            live = live & ~jnp.all((prim >= 0) | ~alive)
        return live

    def outer_body(st):
        sp, nlb, t_best, prim, nsteps, nleaf = st
        sp, nlb, t_best, nsteps = node_steps(sp, nlb, t_best, prim, nsteps)
        t_best, prim = flush(nlb, t_best, prim)
        return sp, jnp.int32(0), t_best, prim, nsteps, nleaf + nlb

    _, _, t_best, prim, nsteps, nleaf = jax.lax.while_loop(
        outer_cond, outer_body,
        (jnp.int32(1), jnp.int32(0), t0, prim0, jnp.int32(0), jnp.int32(0)))
    t_out[:] = jnp.where(prim >= 0, t_best, jnp.float32(jnp.inf))
    prim_out[:] = prim
    if counters:
        sub = jax.lax.broadcasted_iota(jnp.int32, (1, 8, 128), 1)
        cnt_out[:] = jnp.where(sub == 0, nsteps,
                               jnp.where(sub == 1, nleaf, 0))


# SMEM scalars are allocated 128 B apiece out of a 1 MiB budget; a (N,2) i32
# table costs N*256 B, and the stack/leaf scratch need room too.
SMEM_META_MAX = 2400    # nodes whose (N,2) meta2 still fits SMEM

@partial(jax.jit, static_argnames=("any_hit", "block_rows", "interpret",
                                   "meta_smem", "counters"))
def traverse3(bvh: PackedBVH, o, d, tmin, tmax, *, any_hit: bool = False,
              block_rows: int = 8, interpret: bool = False,
              meta_smem: bool | None = None, counters: bool = False):
    """v3: leaf-buffered block traversal. Returns (t, permuted prim)
    (+ per-block (steps, leaf-rounds) counter array when counters=True)."""
    planes, shape2, n_blocks, r = _plane_blocks(o, d, tmin, tmax, block_rows)
    full = lambda a, ms=pltpu.VMEM: pl.BlockSpec(
        a.shape, lambda i: (0,) * a.ndim, memory_space=ms)
    ray_spec = pl.BlockSpec((block_rows, 128), lambda i: (i, 0),
                            memory_space=pltpu.VMEM)
    tri_args = []
    tri_specs = []
    for arr in (bvh.tv0, bvh.te1, bvh.te2):
        for c in range(3):
            tri_args.append(arr[c])
            tri_specs.append(full(arr[c]))
    if meta_smem is None:
        meta_smem = bvh.n_nodes <= SMEM_META_MAX
    meta_space = pltpu.SMEM if meta_smem else pltpu.VMEM

    out_shape = [jax.ShapeDtypeStruct(shape2, jnp.float32),
                 jax.ShapeDtypeStruct(shape2, jnp.int32)]
    out_specs = [ray_spec, ray_spec]
    if counters:
        out_shape.append(jax.ShapeDtypeStruct((n_blocks, 8, 128), jnp.int32))
        out_specs.append(pl.BlockSpec((1, 8, 128), lambda i: (i, 0, 0),
                                      memory_space=pltpu.VMEM))

    kern = partial(_kernel3, k=bvh.k, rows=block_rows, any_hit=any_hit,
                   counters=counters)
    res = pl.pallas_call(
        kern,
        grid=(n_blocks,),
        out_shape=tuple(out_shape),
        in_specs=([full(bvh.bounds), full(bvh.meta2, meta_space)]
                  + tri_specs + [ray_spec] * 8),
        out_specs=tuple(out_specs),
        scratch_shapes=[pltpu.SMEM((STACK_DEPTH,), jnp.int32),
                        pltpu.SMEM((LBUF3,), jnp.int32)],
        interpret=interpret,
    )(bvh.bounds, bvh.meta2, *tri_args, *planes)
    t, prim = res[0], res[1]
    if counters:
        return t.reshape(-1)[:r], prim.reshape(-1)[:r], res[2]
    return t.reshape(-1)[:r], prim.reshape(-1)[:r]


@partial(jax.jit, static_argnames=("any_hit", "block_rows", "interpret"))
def traverse2(bvh: PackedBVH, o, d, tmin, tmax, *, any_hit: bool = False,
              block_rows: int = 8, interpret: bool = False):
    """v2 traversal: independent 128-ray packet per sublane row."""
    planes, shape2, n_blocks, r = _plane_blocks(o, d, tmin, tmax, block_rows)

    # sentinel rows: null node (empty box, non-leaf) + null cluster (zero tris)
    null_node = bvh.n_nodes
    null_cluster = bvh.n_clusters
    bounds = jnp.concatenate(
        [bvh.bounds,
         jnp.asarray([[jnp.inf] * 3 + [-jnp.inf] * 3 + [0, 0]],
                     jnp.float32)])
    meta = jnp.concatenate([bvh.meta,
                            jnp.asarray([[1, 1, 0, 0]], jnp.int32)])

    def with_null(arr3):   # (3, C, K) -> components with zero row appended
        z = jnp.zeros((1, bvh.k), arr3.dtype)
        return [jnp.concatenate([arr3[c], z]) for c in range(3)]

    tri_args = (with_null(bvh.tv0) + with_null(bvh.te1)
                + with_null(bvh.te2))
    # reorder into v0x v0y v0z e1x ... layout expected by the kernel
    full = lambda a: pl.BlockSpec(a.shape, lambda i: (0,) * a.ndim,
                                  memory_space=pltpu.VMEM)
    ray_spec = pl.BlockSpec((block_rows, 128), lambda i: (i, 0),
                            memory_space=pltpu.VMEM)

    kern = partial(_kernel2, k=bvh.k, rows=block_rows, any_hit=any_hit,
                   null_node=null_node, null_cluster=null_cluster)
    t, prim = pl.pallas_call(
        kern,
        grid=(n_blocks,),
        out_shape=(jax.ShapeDtypeStruct(shape2, jnp.float32),
                   jax.ShapeDtypeStruct(shape2, jnp.int32)),
        in_specs=([full(bounds), full(meta)]
                  + [full(a) for a in tri_args]
                  + [ray_spec] * 8),
        out_specs=(ray_spec, ray_spec),
        scratch_shapes=[pltpu.SMEM((STACK_DEPTH, block_rows), jnp.int32),
                        pltpu.SMEM((block_rows, LEAF_BUFN), jnp.int32),
                        pltpu.SMEM((block_rows,), jnp.int32),
                        pltpu.VMEM((block_rows, 8), jnp.float32)],
        interpret=interpret,
    )(bounds, meta, *tri_args, *planes)
    return t.reshape(-1)[:r], prim.reshape(-1)[:r]

# ---------------------------------------------------------------------------
# Kernel v7: wide-BVH traversal with the MXU (Woop-matmul) leaf flush.
#
# VERDICT r4 #1. The dense leaf flush — the measured wall of the v5/v6
# family — evaluates ~40 VPU flops per (ray, triangle) pair. v7 precomputes
# per-triangle unit-triangle (Woop) affine transforms on host: W = [e1 e2
# e1xe2]^-1 with translation t = -W v0 maps the triangle to the canonical
# {(0,0,0),(1,0,0),(0,1,0)} triangle, so a leaf flush is ONE matmul
#     (3K, 4) @ (4, 2B) -> (3K, 2B)     [o' in cols 0:B, d' in cols B:2B]
# on the MXU plus a short elementwise finish: t = -o'z/d'z, u = o'x+t d'x,
# v = o'y+t d'y, bounds tests, packed-index winner fold. Measured on the
# v5e (tools/exp_mxu.py, kernel-dominated timing): 61 vs 39 Gpairs/s —
# 1.6x over the f32 VPU MT flush; bf16 operands gain nothing more (the
# finish is VPU-bound), so operands stay f32 — no precision trade at all
# beyond the existing candidate-then-exact-finish design (finish_hits
# recomputes exact t/u/v from the authoritative f32 soup outside).
#
# Layout: the whole kernel is LANE-MAJOR — rays live in the 128-lane minor
# dim as flat (1, B) registers (B = rows*128) instead of v5's (rows, 128)
# blocks, because the matmul's (3K, 2B) output slices to fully-packed
# (K, B) tiles for the finish. Node steps are v5's wide-node pops with
# (8, B) slab tests and the same octant push-order tables.
# ---------------------------------------------------------------------------

LBUF7 = 16


def woop_pack(tv0, te1, te2):
    """(3, C, K) component soup -> (C, 4, 3K) Woop operand (host numpy).

    Column [c*K + j] holds [W[c,:], t[c]] of triangle j (contraction along
    the 4-row sublane dim): o'_c = col . [o, 1], d'_c = col . [d, 0] (the
    4th row drops for directions). Degenerate (pad) triangles get all-zero
    columns -> d'z = 0 -> miss. Lanes hold the 3K triangle rows (the
    transposed (C, 3K, 4) layout lane-pads 4 -> 128: 32x VMEM inflation)."""
    v0 = np.moveaxis(np.asarray(tv0), 0, -1).astype(np.float64)  # (C, K, 3)
    e1 = np.moveaxis(np.asarray(te1), 0, -1).astype(np.float64)
    e2 = np.moveaxis(np.asarray(te2), 0, -1).astype(np.float64)
    c, k, _ = v0.shape
    n = np.cross(e1, e2)
    M = np.stack([e1, e2, n], axis=-1)                 # columns
    det = np.linalg.det(M)
    ok = np.abs(det) > 1e-30
    Minv = np.zeros_like(M)
    if ok.any():
        Minv[ok] = np.linalg.inv(M[ok])
    t = -np.einsum("ckij,ckj->cki", Minv, v0)
    A = np.zeros((c, 4, 3 * k), np.float32)
    for comp in range(3):
        A[:, 0:3, comp * k:(comp + 1) * k] = np.moveaxis(
            Minv[:, :, comp, :], -1, 1)
        A[:, 3, comp * k:(comp + 1) * k] = t[:, :, comp]
    return A


def _kernel7(wb_ref, wo_ref, ao_ref,
             rays2_ref, tmin_ref, tmax_ref,
             t_out, prim_out, *rest,
             k: int, b: int, any_hit: bool, n_wnodes: int,
             counters: bool = False):
    if counters:
        cnt_out, stack_ref, lbuf_ref, spill_ref = rest
    else:
        stack_ref, lbuf_ref, spill_ref = rest
    rays2 = rays2_ref[0]                       # (4, 2B): [o|1 , d|0]
    ox = rays2[0:1, 0:b]
    oy = rays2[1:2, 0:b]
    oz = rays2[2:3, 0:b]
    dx = rays2[0:1, b:2 * b]
    dy = rays2[1:2, b:2 * b]
    dz = rays2[2:3, b:2 * b]
    tmin = tmin_ref[0]                         # (1, B)
    tmax = tmax_ref[0]

    def safe_inv(d):
        tiny = jnp.where(d < 0, jnp.float32(-1e-30), jnp.float32(1e-30))
        return 1.0 / jnp.where(jnp.abs(d) < 1e-30, tiny, d)

    ix, iy, iz = safe_inv(dx), safe_inv(dy), safe_inv(dz)
    alive = tmax >= tmin
    half = jnp.float32(b / 2)
    negx = jnp.sum(jnp.where(dx < 0, 1.0, 0.0)) > half
    negy = jnp.sum(jnp.where(dy < 0, 1.0, 0.0)) > half
    negz = jnp.sum(jnp.where(dz < 0, 1.0, 0.0)) > half
    qw = (jnp.where(negx, 1, 0) + jnp.where(negy, 2, 0)
          + jnp.where(negz, 4, 0)) * n_wnodes

    t0 = jnp.where(alive, tmax, jnp.float32(-jnp.inf))
    prim0 = jnp.full((1, b), -1, jnp.int32)
    stack_ref[0] = jnp.int32(0)

    def comp(row, c):
        seg = row[:, 8 * c:8 * (c + 1)]              # (1, 8)
        return jnp.transpose(seg, (1, 0))            # (8, 1)

    def node_steps(sp, nlb, t_best, prim, nsteps):
        def cond(st):
            sp, nlb, t_best, nsteps = st
            return (sp > 0) & (nlb + 8 <= LBUF7)

        def body(st):
            sp, nlb, t_best, nsteps = st
            nsteps = nsteps + 1
            node = stack_ref[sp - 1]
            sp = sp - 1
            row = wb_ref[pl.ds(node, 1), :]          # (1, 48)
            lox, loy, loz = comp(row, 0), comp(row, 1), comp(row, 2)
            hix, hiy, hiz = comp(row, 3), comp(row, 4), comp(row, 5)
            t0x = (lox - ox) * ix
            t1x = (hix - ox) * ix
            t0y = (loy - oy) * iy
            t1y = (hiy - oy) * iy
            t0z = (loz - oz) * iz
            t1z = (hiz - oz) * iz
            # NaN pad slots fail every comparison -> never hit
            tn = jnp.maximum(jnp.maximum(jnp.minimum(t0x, t1x),
                                         jnp.minimum(t0y, t1y)),
                             jnp.maximum(jnp.minimum(t0z, t1z), tmin))
            tf = jnp.minimum(jnp.minimum(jnp.maximum(t0x, t1x),
                                         jnp.maximum(t0y, t1y)),
                             jnp.minimum(jnp.maximum(t0z, t1z), t_best))
            if any_hit:
                slab = (tn <= tf) & alive & (prim < 0)
            else:
                slab = (tn <= tf) & alive
            red2 = jnp.sum(jnp.where(slab, 1.0, 0.0), axis=1,
                           keepdims=True)            # (8, 1)
            spill_ref[:, 0:1] = red2
            for s in range(8):
                e = wo_ref[qw + node, s]
                slot = e & 7
                ref = jax.lax.shift_right_arithmetic(e, 3)
                hit_s = spill_ref[slot, 0] > 0.5
                push = hit_s & (ref >= 0)
                take = hit_s & (ref < 0)

                @pl.when(push)
                def _():
                    stack_ref[sp] = ref

                @pl.when(take)
                def _():
                    lbuf_ref[nlb] = -ref - 1

                sp = sp + jnp.where(push, 1, 0)
                nlb = nlb + jnp.where(take, 1, 0)
            return sp, nlb, t_best, nsteps

        return jax.lax.while_loop(cond, body, (sp, nlb, t_best, nsteps))

    def flush(nlb, t_best, prim):
        def round_fn(i, carry):
            t_best, prim = carry
            cid = lbuf_ref[i]
            A = ao_ref[cid]                          # (4, 3K)
            out = jax.lax.dot_general(
                A, rays2, (((0,), (0,)), ((), ())),
                preferred_element_type=jnp.float32)  # (3K, 2B)
            opx = out[0 * k:1 * k, 0:b]
            opy = out[1 * k:2 * k, 0:b]
            opz = out[2 * k:3 * k, 0:b]
            dpx = out[0 * k:1 * k, b:2 * b]
            dpy = out[1 * k:2 * k, b:2 * b]
            dpz = out[2 * k:3 * k, b:2 * b]
            t = -opz / jnp.where(jnp.abs(dpz) < 1e-30,
                                 jnp.float32(1e-30), dpz)
            u = opx + t * dpx
            v = opy + t * dpy
            ok = ((u >= -BARY_EPS) & (v >= -BARY_EPS)
                  & (u + v <= 1.0 + BARY_EPS) & (t > tmin)
                  & (jnp.abs(dpz) >= 1e-30))
            if any_hit:
                ok = ok & alive & (prim < 0)
            else:
                ok = ok & alive
            tm = jnp.where(ok, t, jnp.float32(jnp.inf))
            # packed-index winner fold over the K sublane rows
            ti = jax.lax.bitcast_convert_type(tm, jnp.int32)
            j = jax.lax.broadcasted_iota(jnp.int32, tm.shape, 0)
            ti = (ti & ~IDX_MASK) | j
            twin_i = jnp.min(ti, axis=0, keepdims=True)      # (1, B)
            j_win = twin_i & IDX_MASK
            t_win = jax.lax.bitcast_convert_type(twin_i & ~IDX_MASK,
                                                 jnp.float32)
            better = t_win < t_best
            t_best = jnp.where(better, t_win, t_best)
            prim = jnp.where(better, cid * k + j_win, prim)
            return t_best, prim

        return jax.lax.fori_loop(0, nlb, round_fn, (t_best, prim))

    def outer_cond(st):
        sp, nlb, t_best, prim, nsteps, nleaf = st
        live = (sp > 0) | (nlb > 0)
        if any_hit:
            live = live & ~jnp.all((prim >= 0) | ~alive)
        return live

    def outer_body(st):
        sp, nlb, t_best, prim, nsteps, nleaf = st
        sp, nlb, t_best, nsteps = node_steps(sp, nlb, t_best, prim, nsteps)
        t_best, prim = flush(nlb, t_best, prim)
        return sp, jnp.int32(0), t_best, prim, nsteps, nleaf + nlb

    _, _, t_best, prim, nsteps, nleaf = jax.lax.while_loop(
        outer_cond, outer_body,
        (jnp.int32(1), jnp.int32(0), t0, prim0, jnp.int32(0), jnp.int32(0)))
    t_out[0] = jnp.where(prim >= 0, t_best, jnp.float32(jnp.inf))
    prim_out[0] = prim
    if counters:
        lane = jax.lax.broadcasted_iota(jnp.int32, (1, b), 1)
        cnt_out[0] = jnp.where(lane == 0, nsteps,
                               jnp.where(lane == 1, nleaf, 0))


@partial(jax.jit, static_argnames=("any_hit", "block_rows", "interpret",
                                   "counters"))
def traverse7(bvh: PackedBVH, o, d, tmin, tmax, *, any_hit: bool = False,
              block_rows: int = 32, interpret: bool = False,
              counters: bool = False, woop=None):
    """v7: lane-major wide-BVH traversal with the Woop-MXU leaf flush."""
    oc, dc = _components(o, d)
    r = oc[0].shape[0]
    b = block_rows * 128
    rp = -(-r // b) * b
    n_blocks = rp // b
    ones = jnp.ones((rp,), jnp.float32)
    zeros = jnp.zeros((rp,), jnp.float32)
    # (n_blocks, 4, 2B): [o | 1] in cols 0:B, [d | 0] in cols B:2B
    o_rows = jnp.stack([_pad_to(oc[0], rp, 0.0), _pad_to(oc[1], rp, 0.0),
                        _pad_to(oc[2], rp, 0.0), ones]).reshape(4, n_blocks,
                                                                b)
    d_rows = jnp.stack([_pad_to(dc[0], rp, 1.0), _pad_to(dc[1], rp, 1.0),
                        _pad_to(dc[2], rp, 1.0), zeros]).reshape(4, n_blocks,
                                                                 b)
    rays2 = jnp.concatenate([o_rows, d_rows], axis=-1)   # (4, NB, 2B)
    rays2 = jnp.transpose(rays2, (1, 0, 2))              # (NB, 4, 2B)
    tminb = _pad_to(tmin, rp, 0.0).reshape(n_blocks, 1, b)
    tmaxb = _pad_to(tmax, rp, -1.0).reshape(n_blocks, 1, b)
    if woop is None:
        if bvh.woop is None:
            raise ValueError(
                "pack() no longer builds the v7 Woop operand by default; "
                "call kernels_attic.with_woop(packed) first")
        woop = jnp.asarray(bvh.woop)

    full = lambda a: pl.BlockSpec(a.shape, lambda i: (0,) * a.ndim,
                                  memory_space=pltpu.VMEM)
    rays2_spec = pl.BlockSpec((1, 4, 2 * b), lambda i: (i, 0, 0),
                              memory_space=pltpu.VMEM)
    lane_spec = pl.BlockSpec((1, 1, b), lambda i: (i, 0, 0),
                             memory_space=pltpu.VMEM)
    out_shape = [jax.ShapeDtypeStruct((n_blocks, 1, b), jnp.float32),
                 jax.ShapeDtypeStruct((n_blocks, 1, b), jnp.int32)]
    out_specs = [lane_spec, lane_spec]
    if counters:
        out_shape.append(jax.ShapeDtypeStruct((n_blocks, 1, b), jnp.int32))
        out_specs.append(lane_spec)

    kern = partial(_kernel7, k=bvh.k, b=b, any_hit=any_hit,
                   n_wnodes=bvh.n_wnodes, counters=counters)
    def run(r2c, tmn, tmx, nb, oshape, ospecs):
        return pl.pallas_call(
            kern,
            grid=(nb,),
            out_shape=tuple(oshape),
            in_specs=[full(bvh.wbounds), full(bvh.worder), full(woop),
                      rays2_spec, lane_spec, lane_spec],
            out_specs=tuple(ospecs),
            scratch_shapes=[pltpu.SMEM((STACK_DEPTH,), jnp.int32),
                            pltpu.SMEM((LBUF7,), jnp.int32),
                            pltpu.VMEM((8, 128), jnp.float32)],
            interpret=interpret,
        )(bvh.wbounds, bvh.worder, woop, r2c, tmn, tmx)

    if counters:
        res = run(rays2, tminb, tmaxb, n_blocks, out_shape, out_specs)
        t, prim = res[0], res[1]
        return t.reshape(-1)[:r], prim.reshape(-1)[:r], res[2]

    # chunked dispatch (see _chunked): cap per-call VMEM-placed operands
    nb_chunk = max(CHUNK_SUBROWS // block_rows, 1)
    ts, ps = [], []
    for s0 in range(0, n_blocks, nb_chunk):
        nb = min(nb_chunk, n_blocks - s0)
        osh = [jax.ShapeDtypeStruct((nb, 1, b), jnp.float32),
               jax.ShapeDtypeStruct((nb, 1, b), jnp.int32)]
        tc, pc = run(rays2[s0:s0 + nb], tminb[s0:s0 + nb],
                     tmaxb[s0:s0 + nb], nb, osh, out_specs[:2])
        ts.append(tc)
        ps.append(pc)
    t = jnp.concatenate(ts)
    prim = jnp.concatenate(ps)
    return t.reshape(-1)[:r], prim.reshape(-1)[:r]

def _morton_spread(x):
    x = (x | (x << 16)) & 0x030000FF
    x = (x | (x << 8)) & 0x0300F00F
    x = (x | (x << 4)) & 0x030C30C3
    x = (x | (x << 2)) & 0x09249249
    return x


def sort_order(o, d, tmin, tmax, lo, hi):
    """Coherence-sort permutation for a ray wavefront.

    Key (most significant first): dead flag | direction octant (3 bits) |
    30-bit Morton code of the origin quantized into the scene bounds. Dead
    rays (tmax < tmin) sort last, so whole trailing blocks short-circuit in
    the traversal kernel — compaction without dynamic shapes."""
    oc, dc = _components(o, d)
    sc = 1023.0 / jnp.maximum(hi - lo, 1e-9)
    qs = [jnp.clip((oc[c] - lo[c]) * sc[c], 0.0, 1023.0).astype(jnp.int32)
          for c in range(3)]
    m = (_morton_spread(qs[0]) | (_morton_spread(qs[1]) << 1)
         | (_morton_spread(qs[2]) << 2))
    octant = ((dc[0] < 0) * 1 + (dc[1] < 0) * 2
              + (dc[2] < 0) * 4).astype(jnp.int32)
    dead = (tmax < tmin).astype(jnp.int32)
    key = (dead.astype(jnp.int64) << 34) | (octant.astype(jnp.int64) << 30) \
        | m.astype(jnp.int64)
    return jnp.argsort(key)


def sort_order_origin(p, dead, lo, hi):
    """Origin-only coherence permutation (int32 key: dead | 21-bit Morton).

    Used once per bounce and SHARED by that bounce's shadow wave and the
    next bounce's extension wave (both originate at the same hit points) —
    one argsort instead of two per bounce, and an int32 sort instead of the
    int64 one (each measured ~24 ms per 262k wave on the v5e)."""
    pc = (p.x, p.y, p.z) if hasattr(p, "x") else (p[:, 0], p[:, 1], p[:, 2])
    sc = 127.0 / jnp.maximum(hi - lo, 1e-9)
    qs = [jnp.clip((pc[c] - lo[c]) * sc[c], 0.0, 127.0).astype(jnp.int32)
          for c in range(3)]

    def spread7(x):
        x = (x | (x << 8)) & 0x0300F00F
        x = (x | (x << 4)) & 0x030C30C3
        x = (x | (x << 2)) & 0x09249249
        return x

    m = (spread7(qs[0]) | (spread7(qs[1]) << 1) | (spread7(qs[2]) << 2))
    key = (dead.astype(jnp.int32) << 21) | m
    return jnp.argsort(key)
