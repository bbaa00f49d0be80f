"""Pallas TPU megakernel: fused BVH traversal + Moeller-Trumbore intersection.

The hot loop of the whole renderer (reference semantics:
lib/accelerators/bvh_accel.dart:101-224 traversal + lib/shapes/triangle.dart:44-160
triangle test), redesigned for the TPU memory hierarchy instead of translated:

* The ENTIRE scene lives in VMEM for the duration of the kernel — cluster-BVH
  node table (bounds f32 + children/axis i32, scalar-read per step) and the
  triangle soup packed as (C, K) per-component arrays (~36 B/tri, so ~300k
  triangles fit the ~16 MB VMEM of one core). Zero HBM traffic per node step.
* Rays are processed in BLOCKS of B = B_ROWS*128 (sublane-rows x lanes); each
  grid program owns one block and runs the traversal ``lax.while_loop``
  entirely in-kernel with its stack in SMEM scratch. One node pop costs a few
  scalar loads + one (B_ROWS,128) slab test on the VPU.
* A leaf visit tests all K cluster triangles against all B block rays as one
  dense (K, B_ROWS, 128) MT evaluation — tri components broadcast from (K,1,1)
  column slices, rays from (1,B_ROWS,128). Winner selection folds over K with
  scalar prim ids (cid*K + k): triangles are stored in cluster-permuted order
  so the hit id is arithmetic, not a gather.
* Near-child-first ordering by the block's majority direction sign per axis
  (the packet dirIsNeg analog); any-hit mode terminates a block early once
  every live ray has an occluder.

Returns (t, prim) only; barycentrics are recomputed exactly outside the
kernel by one gathered MT evaluation per hit ray (see ``finish_hits``) —
cheaper than carrying u/v payloads through the selection fold.
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

TRI_EPS = 1e-10
BARY_EPS = 1e-6
STACK_DEPTH = 128


@partial(jax.tree_util.register_dataclass,
         data_fields=["bounds", "meta", "meta2", "tv0", "te1", "te2",
                      "wbounds", "worder", "woop", "soup16",
                      "tdv0", "tde1", "tde2", "soup16d"],
         meta_fields=["n_nodes", "n_clusters", "k", "n_wnodes"])
@dataclasses.dataclass
class PackedBVH:
    """Kernel-ready scene: node table + cluster-permuted triangle soup.

    bounds: (N, 8) f32 [lox loy loz hix hiy hiz 0 0]
    meta:   (N, 4) i32 [child0, child1, axis, 0]; leaf: child0 = -(cluster+1)
    meta2:  (N, 2) i32 [c0*4+axis (interior) | -(cluster+1) (leaf), child1]
            — compact form; SMEM scalars cost 128 B each, so table width
            matters for SMEM residency.
    tv0/te1/te2: 3 x (C, K) per xyz component -> stored as (3, C, K) stacks
    Triangle j of cluster c sits at permuted prim id c*K + j; padded slots are
    degenerate (all-zero edges -> det 0 -> never hit).

    Wide (8-ary) collapse of the same tree (accel/wide.py) for the v5 kernel:
    wbounds: (W, 48) f32 rows [lox*8 loy*8 loz*8 hix*8 hiy*8 hiz*8], NaN pads
    worder:  (W, 64) i32 rows of 8 octant-ordered entry groups (far-first
             push order), entry = ref*8 + slot, ref < 0 -> leaf cluster.
    """
    bounds: jnp.ndarray
    meta: jnp.ndarray
    meta2: jnp.ndarray
    tv0: jnp.ndarray   # (3, C, K)
    te1: jnp.ndarray
    te2: jnp.ndarray
    wbounds: jnp.ndarray
    worder: jnp.ndarray
    # (C, 3K+pad, 4) Woop unit-triangle transforms for the v7 MXU flush
    woop: jnp.ndarray = None
    # (C*K, 16) packed finish rows [v0 e1 e2 orig_id_bits] (soup_pack16)
    soup16: jnp.ndarray = None
    # continuous object motion blur (animated_transform.dart:107-178
    # redesign): shutter-close MINUS shutter-open soup deltas in the same
    # (3, C, K) layout — leaf tests lerp v(t) = v + t*dv per ray time —
    # plus the matching (C*K, 16) finish-row deltas. None = static scene.
    tdv0: jnp.ndarray = None
    tde1: jnp.ndarray = None
    tde2: jnp.ndarray = None
    soup16d: jnp.ndarray = None
    n_nodes: int = 0
    n_clusters: int = 0
    k: int = 0
    n_wnodes: int = 0


def pack(node_lo, node_hi, node_child, node_axis, tv0, te1, te2, tid,
         deltas=None):
    """Build PackedBVH from ClusterBVH-style arrays ((C,K,3) tris, (C,K) ids).

    Returns (packed, perm) where perm (C*K,) maps permuted prim id -> original
    triangle id (-1 for pad slots). Padded slots get zeroed edges.

    deltas: optional (dv0, de1, de2) (C,K,3) shutter-close-minus-open soups
    (continuous motion blur; node bounds must already be the union tree —
    accel/cluster.build_motion)."""
    n = node_lo.shape[0]
    lo = np.asarray(node_lo, np.float32)
    hi = np.asarray(node_hi, np.float32)
    bounds = np.zeros((n, 8), np.float32)
    bounds[:, 0:3] = lo
    bounds[:, 3:6] = hi
    meta = np.zeros((n, 4), np.int32)
    meta[:, 0:2] = np.asarray(node_child, np.int32)
    meta[:, 2] = np.asarray(node_axis, np.int32)
    meta2 = np.zeros((n, 2), np.int32)
    is_leaf = meta[:, 0] < 0
    meta2[:, 0] = np.where(is_leaf, meta[:, 0], meta[:, 0] * 4 + meta[:, 2])
    meta2[:, 1] = meta[:, 1]
    tid = np.asarray(tid, np.int32)
    pad = tid < 0
    v0 = np.where(pad[..., None], 0.0, np.asarray(tv0, np.float32))
    e1 = np.where(pad[..., None], 0.0, np.asarray(te1, np.float32))
    e2 = np.where(pad[..., None], 0.0, np.asarray(te2, np.float32))
    c, k = tid.shape
    from ..accel.wide import build_wide
    wbounds, worder, n_w = build_wide(node_lo, node_hi, node_child)
    # host numpy — one device_put of the whole scene happens at render entry
    t0 = np.moveaxis(v0, -1, 0).copy()
    t1 = np.moveaxis(e1, -1, 0).copy()
    t2 = np.moveaxis(e2, -1, 0).copy()
    perm_flat = tid.reshape(-1)
    d0 = d1 = d2 = s16d = None
    if deltas is not None:
        dv0, de1, de2 = (np.where(pad[..., None], 0.0,
                                  np.asarray(a, np.float32)) for a in deltas)
        d0 = np.moveaxis(dv0, -1, 0).copy()
        d1 = np.moveaxis(de1, -1, 0).copy()
        d2 = np.moveaxis(de2, -1, 0).copy()
        s16d = soup_pack16(d0, d1, d2, np.zeros_like(perm_flat))
    packed = PackedBVH(
        bounds=bounds, meta=meta, meta2=meta2,
        tv0=t0, te1=t1, te2=t2,
        wbounds=wbounds, worder=worder,
        # v7's Woop operand is NOT built by default (~48 B/tri transfer+HBM
        # per scene for an opt-in kernel) — kernels_attic.with_woop adds it
        woop=None,
        soup16=soup_pack16(t0, t1, t2, perm_flat),
        tdv0=d0, tde1=d1, tde2=d2, soup16d=s16d,
        n_nodes=n, n_clusters=c, k=k, n_wnodes=n_w)
    return packed, perm_flat


def _pad_to(x, n, fill):
    if x.shape[0] == n:
        return x
    return jnp.concatenate(
        [x, jnp.full((n - x.shape[0],) + x.shape[1:], fill, x.dtype)])


IDX_BITS = 7            # K <= 128
IDX_MASK = (1 << IDX_BITS) - 1


def _mt_dense(o3, d3, tmin3, v0, e1, e2, k, bf16: bool = False):
    """Dense Moeller-Trumbore: tri cols (K,1,1)x9 vs rays (1,R,128).

    Returns t (K,R,128) f32 with +inf on miss. bf16=True evaluates the
    test in bfloat16 (2x VPU rate, (16,128) tiling) with widened edge
    epsilons — candidate winners are conservative-approximate and the
    EXACT hit is recomputed outside the kernel (finish_hits), so bf16 only
    risks picking a neighbor triangle among near-ties (<~0.5% in t)."""
    if bf16:
        bt = jnp.bfloat16
        o3 = tuple(x.astype(bt) for x in o3)
        d3 = tuple(x.astype(bt) for x in d3)
        v0 = tuple(x.astype(bt) for x in v0)
        e1 = tuple(x.astype(bt) for x in e1)
        e2 = tuple(x.astype(bt) for x in e2)
        bary_eps = 1e-2
        tri_eps = 1e-6
    else:
        bary_eps = BARY_EPS
        tri_eps = TRI_EPS
    px = d3[1] * e2[2] - d3[2] * e2[1]
    py = d3[2] * e2[0] - d3[0] * e2[2]
    pz = d3[0] * e2[1] - d3[1] * e2[0]
    det = e1[0] * px + e1[1] * py + e1[2] * pz
    if bf16:
        # v5e rejects bf16 vector comparisons — det/u/v promote to f32
        # here (elementwise); the expensive dot products above stay bf16
        det = det.astype(jnp.float32)
    inv_det = 1.0 / jnp.where(jnp.abs(det) < tri_eps,
                              jnp.asarray(1.0, det.dtype), det)
    tx = o3[0] - v0[0]
    ty = o3[1] - v0[1]
    tz = o3[2] - v0[2]
    u = (tx * px + ty * py + tz * pz) * inv_det
    qx = ty * e1[2] - tz * e1[1]
    qy = tz * e1[0] - tx * e1[2]
    qz = tx * e1[1] - ty * e1[0]
    v = (d3[0] * qx + d3[1] * qy + d3[2] * qz) * inv_det
    t = (e2[0] * qx + e2[1] * qy + e2[2] * qz) * inv_det
    ok = ((jnp.abs(det) >= tri_eps)
          & (u >= -bary_eps) & (v >= -bary_eps)
          & (u + v <= 1.0 + bary_eps))
    t = t.astype(jnp.float32)
    ok = ok & (t > tmin3)
    return jnp.where(ok, t, jnp.float32(jnp.inf))


def _fold_packed(tm, t_best, prim, base, k):
    """Winner fold via index-packed bit trick.

    tm: (K, R, 128) candidate t (inf = miss, all > 0); base: scalar or
    (R,128) permuted-prim base id. Packs j into the low IDX_BITS of the f32
    bit pattern (clears them first — rounds t DOWN by <= 127 ulps, harmless
    for culling/selection; exact t/u/v are recomputed outside the kernel)."""
    ti = jax.lax.bitcast_convert_type(tm, jnp.int32)
    j = jax.lax.broadcasted_iota(jnp.int32, tm.shape, 0)
    ti = (ti & ~IDX_MASK) | j
    twin_i = jnp.min(ti, axis=0)                     # (R, 128)
    j_win = twin_i & IDX_MASK
    t_win = jax.lax.bitcast_convert_type(twin_i & ~IDX_MASK, jnp.float32)
    better = t_win < t_best
    t_best = jnp.where(better, t_win, t_best)
    prim = jnp.where(better, base + j_win, prim)
    return t_best, prim


def _components(o, d):
    """V3 or (R, 3) -> component tuples (SoA wavefronts pass V3 straight
    through with no layout transpose)."""
    if hasattr(o, "x"):
        return (o.x, o.y, o.z), (d.x, d.y, d.z)
    return (o[:, 0], o[:, 1], o[:, 2]), (d[:, 0], d[:, 1], d[:, 2])


def _plane_blocks(o, d, tmin, tmax, block_rows):
    oc, dc = _components(o, d)
    r = oc[0].shape[0]
    b = block_rows * 128
    rp = -(-r // b) * b
    shape2 = (rp // 128, 128)
    planes = [_pad_to(oc[0], rp, 0.0), _pad_to(oc[1], rp, 0.0),
              _pad_to(oc[2], rp, 0.0),
              _pad_to(dc[0], rp, 1.0), _pad_to(dc[1], rp, 1.0),
              _pad_to(dc[2], rp, 1.0),
              _pad_to(tmin, rp, 0.0), _pad_to(tmax, rp, -1.0)]
    return [p.reshape(shape2) for p in planes], shape2, rp // b, r


# ---------------------------------------------------------------------------
# Kernel v5: WIDE (8-ary) BVH traversal — the round-3 serialization fix.
#
# v3's node-step while_loop is scalar-bound: one binary node pop = ~229 ns
# with the VPU idle. v5 pops one *wide* node per step and slab-tests all 8
# children in a single (8, rows, 128) VPU evaluation: 8x fewer serial steps
# for the same number of box tests. Child push order comes from the
# per-octant precomputed far-first tables (accel/wide.py); the per-child hit
# mask is reduced to ONE scalar bitmask (sum of 2^slot over hit children) so
# the 8-entry push loop runs on pure scalar ALU with no VMEM spill
# round-trip. Leaf clusters buffer + flush exactly as v3.
# ---------------------------------------------------------------------------

LBUF5 = 16


def _kernel5(wb_ref, wo_ref,
             v0x_ref, v0y_ref, v0z_ref,
             e1x_ref, e1y_ref, e1z_ref,
             e2x_ref, e2y_ref, e2z_ref,
             ox_ref, oy_ref, oz_ref, dx_ref, dy_ref, dz_ref,
             tmin_ref, tmax_ref,
             t_out, prim_out, *rest,
             k: int, rows: int, any_hit: bool, n_wnodes: int,
             counters: bool = False, bf16: bool = False):
    if counters:
        cnt_out, stack_ref, lbuf_ref, spill_ref = rest
    else:
        stack_ref, lbuf_ref, spill_ref = rest
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
    # block majority octant selects the push-order row group in worder
    qw = (jnp.where(negx, 1, 0) + jnp.where(negy, 2, 0)
          + jnp.where(negz, 4, 0)) * n_wnodes

    t0 = jnp.where(alive, tmax, jnp.float32(-jnp.inf))
    prim0 = jnp.full((rows, 128), -1, jnp.int32)
    stack_ref[0] = jnp.int32(0)

    o3 = (ox.reshape(1, rows, 128), oy.reshape(1, rows, 128),
          oz.reshape(1, rows, 128))
    d3 = (dx.reshape(1, rows, 128), dy.reshape(1, rows, 128),
          dz.reshape(1, rows, 128))
    ix3 = ix.reshape(1, rows, 128)
    iy3 = iy.reshape(1, rows, 128)
    iz3 = iz.reshape(1, rows, 128)
    tmin3 = tmin.reshape(1, rows, 128)
    alive3 = alive.reshape(1, rows, 128)

    def comp(row, c):
        """(1,48) bounds row -> component c of the 8 child boxes, (8,1,1)."""
        seg = row[:, 8 * c:8 * (c + 1)]              # (1, 8)
        return jnp.transpose(seg, (1, 0)).reshape(8, 1, 1)

    def node_steps(sp, nlb, t_best, prim, nsteps):
        def cond(st):
            sp, nlb, t_best, nsteps = st
            return (sp > 0) & (nlb + 8 <= LBUF5)

        def body(st):
            sp, nlb, t_best, nsteps = st
            nsteps = nsteps + 1
            node = stack_ref[sp - 1]
            sp = sp - 1
            row = wb_ref[pl.ds(node, 1), :]          # (1, 48)
            lox, loy, loz = comp(row, 0), comp(row, 1), comp(row, 2)
            hix, hiy, hiz = comp(row, 3), comp(row, 4), comp(row, 5)
            t0x = (lox - o3[0]) * ix3
            t1x = (hix - o3[0]) * ix3
            t0y = (loy - o3[1]) * iy3
            t1y = (hiy - o3[1]) * iy3
            t0z = (loz - o3[2]) * iz3
            t1z = (hiz - o3[2]) * iz3
            # NaN pad slots fail every comparison -> never hit
            tn = jnp.maximum(jnp.maximum(jnp.minimum(t0x, t1x),
                                         jnp.minimum(t0y, t1y)),
                             jnp.maximum(jnp.minimum(t0z, t1z), tmin3))
            tf = jnp.minimum(jnp.minimum(jnp.maximum(t0x, t1x),
                                         jnp.maximum(t0y, t1y)),
                             jnp.minimum(jnp.maximum(t0z, t1z),
                                         t_best.reshape(1, rows, 128)))
            if any_hit:
                slab = (tn <= tf) & alive3 \
                    & (prim < 0).reshape(1, rows, 128)
            else:
                slab = (tn <= tf) & alive3
            # per-child hit counts -> (8,1) VMEM spill -> scalar reads
            # (the v2 spill pattern; rank-1 / lane-1 int intermediates crash
            # Mosaic's layout inference, so keep reductions rank-2 f32)
            red = jnp.sum(jnp.where(slab, 1.0, 0.0), axis=1)   # (8, 128)
            red2 = jnp.sum(red, axis=1, keepdims=True)         # (8, 1)
            spill_ref[:, 0:1] = red2
            # push far-first (precomputed per-octant order); pops are near-first
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


# Per-dispatch ray cap: XLA places a pallas call's full ray-plane operands
# and outputs in scoped VMEM alongside the VMEM-resident scene (observed
# r4: 8 planes + 2 outs of a 262k wave = 10.5 MB -> scoped-vmem OOM at the
# 16 MB limit once the fused wave sort let XLA chain placements). Chunking
# the DISPATCH keeps each call's operand footprint ~2.6 MB with no kernel
# efficiency loss: grid blocks execute sequentially on the one core either
# way, and the scene tables stay resident across calls.
# sublane rows per sequential traversal dispatch (see _chunked). 512 rows =
# 64k lanes ≈ 2.6 MB of plane operands + outs in scoped VMEM next to the
# VMEM-resident scene. Env-tunable for on-chip A/B (DR_CHUNK_ROWS).
CHUNK_SUBROWS = int(__import__("os").environ.get("DR_CHUNK_ROWS", "512"))


_PLANE_FILL = (0.0, 0.0, 0.0, 1.0, 1.0, 1.0, 0.0, -1.0)  # o d tmin tmax


def _chunked(planes, shape2, call2, fills=None, live_rows=None):
    """Split a (rows, 128)-plane wave into CHUNK_SUBROWS dispatches —
    SEQUENTIAL by construction (independent chunk calls get overlapped by
    the scheduler and their scoped-VMEM stacks SUM: 4 x 6.7M = 27M > the
    16M limit), and the kernel body compiles once.

    call2(planes_chunk) -> (t_chunk, prim_chunk) of chunk shape.

    live_rows: traced scalar count of live (tmax >= tmin) sublane rows.
    When given, the wave is known SORTED (dead lanes at the tail) and only
    ceil(live_rows / CHUNK_SUBROWS) chunks are dispatched via a bounded
    fori_loop — all-dead trailing chunks are never launched (VERDICT r5
    #1b: depth-5 paths go mostly dead from bounce 2 on). Skipped lanes get
    the exact miss outputs the kernel would produce (t=inf, prim=-1)."""
    rows_total = shape2[0]
    if rows_total <= CHUNK_SUBROWS:
        return call2(planes)
    pad = (-rows_total) % CHUNK_SUBROWS
    if fills is None:
        fills = _PLANE_FILL
    if pad:
        planes = [jnp.concatenate(
            [pl, jnp.full((pad, 128), f, pl.dtype)])
            for pl, f in zip(planes, fills)]
    n_chunks = (rows_total + pad) // CHUNK_SUBROWS
    stacked = [pl.reshape(n_chunks, CHUNK_SUBROWS, 128) for pl in planes]

    if live_rows is None:
        def body(chunk_planes):
            return call2(list(chunk_planes))

        t, pr = jax.lax.map(body, tuple(stacked))
    else:
        n_live = jnp.minimum(
            (live_rows + CHUNK_SUBROWS - 1) // CHUNK_SUBROWS, n_chunks)
        t0 = jnp.full((n_chunks, CHUNK_SUBROWS, 128), jnp.inf, jnp.float32)
        p0 = jnp.full((n_chunks, CHUNK_SUBROWS, 128), -1, jnp.int32)

        def lbody(i, carry):
            t_acc, p_acc = carry
            chunk = [jax.lax.dynamic_index_in_dim(pl_, i, 0, keepdims=False)
                     for pl_ in stacked]
            tc, pc = call2(chunk)
            return (jax.lax.dynamic_update_index_in_dim(t_acc, tc, i, 0),
                    jax.lax.dynamic_update_index_in_dim(p_acc, pc, i, 0))

        t, pr = jax.lax.fori_loop(0, n_live, lbody, (t0, p0))
    t = t.reshape(-1, 128)[:rows_total]
    pr = pr.reshape(-1, 128)[:rows_total]
    return t, pr

@partial(jax.jit, static_argnames=("any_hit", "block_rows", "interpret",
                                   "counters", "bf16"))
def traverse5(bvh: PackedBVH, o, d, tmin, tmax, *, any_hit: bool = False,
              block_rows: int = 8, interpret: bool = False,
              counters: bool = False, bf16: bool = False):
    """v5: wide-BVH block traversal (8 children slab-tested per step)."""
    planes, shape2, n_blocks, r = _plane_blocks(o, d, tmin, tmax, block_rows)
    full = lambda a: pl.BlockSpec(a.shape, lambda i: (0,) * a.ndim,
                                  memory_space=pltpu.VMEM)
    ray_spec = pl.BlockSpec((block_rows, 128), lambda i: (i, 0),
                            memory_space=pltpu.VMEM)
    tri_args = []
    tri_specs = []
    # bf16 mode: refs stay f32 (the f32 (1,K)->(K,1) transpose in col() is
    # the one Mosaic accepts on v5e); _mt_dense casts AFTER the transpose.
    for arr in (bvh.tv0, bvh.te1, bvh.te2):
        for c in range(3):
            tri_args.append(arr[c])
            tri_specs.append(full(arr[c]))

    out_shape = [jax.ShapeDtypeStruct(shape2, jnp.float32),
                 jax.ShapeDtypeStruct(shape2, jnp.int32)]
    out_specs = [ray_spec, ray_spec]
    if counters:
        out_shape.append(jax.ShapeDtypeStruct((n_blocks, 8, 128), jnp.int32))
        out_specs.append(pl.BlockSpec((1, 8, 128), lambda i: (i, 0, 0),
                                      memory_space=pltpu.VMEM))

    kern = partial(_kernel5, k=bvh.k, rows=block_rows, any_hit=any_hit,
                   n_wnodes=bvh.n_wnodes, counters=counters, bf16=bf16)

    def run(pls, nb, oshape, ospecs):
        return pl.pallas_call(
            kern,
            grid=(nb,),
            out_shape=tuple(oshape),
            in_specs=([full(bvh.wbounds), full(bvh.worder)]
                      + tri_specs + [ray_spec] * 8),
            out_specs=tuple(ospecs),
            scratch_shapes=[pltpu.SMEM((STACK_DEPTH,), jnp.int32),
                            pltpu.SMEM((LBUF5,), jnp.int32),
                            pltpu.VMEM((8, 128), jnp.float32)],
            interpret=interpret,
        )(bvh.wbounds, bvh.worder, *tri_args, *pls)

    if counters:
        res = run(planes, n_blocks, out_shape, out_specs)
        t, prim = res[0], res[1]
        return t.reshape(-1)[:r], prim.reshape(-1)[:r], res[2]

    def call2(pls):
        rows_c = pls[0].shape[0]
        osh = [jax.ShapeDtypeStruct((rows_c, 128), jnp.float32),
               jax.ShapeDtypeStruct((rows_c, 128), jnp.int32)]
        return run(pls, rows_c // block_rows, osh, out_specs[:2])

    t, prim = _chunked(planes, shape2, call2)
    return t.reshape(-1)[:r], prim.reshape(-1)[:r]


# ---------------------------------------------------------------------------
# Kernel v6: per-row wide traversal — 8 independent 128-ray packets, each
# popping one WIDE (8-ary) node per step. Combines v4's divergence handling
# (a bounce packet only leaf-tests ITS OWN clusters -> 8x less wasted dense
# MT work than a shared-stack block) with v5's wide nodes (8 children
# slab-tested per pop). Per step: 8 pops, 8 (1,48) bounds rows, ONE
# (8 slots, 8 rows, 128) slab evaluation, and per-(slot,row) hit bits packed
# into three f32 full-reductions (21 bits each) so the 64-entry push loop
# runs on scalar ALU without spill round-trips.
# ---------------------------------------------------------------------------

# 32 measured best on the r5 bench (12.43 vs 12.17 Mrays/s at 16):
# fewer outer-loop flush pauses amortize the scalar-serial node steps
LBUF6 = int(__import__("os").environ.get("DR_LBUF6", "32"))
_V6_SCALARX = int(__import__("os").environ.get("DR_V6_SCALARX", "1"))
_V6_NODEX = int(__import__("os").environ.get("DR_V6_NODEX", "1"))
_V6_FLUSHX = int(__import__("os").environ.get("DR_V6_FLUSHX", "1"))
_V6_MTX = int(__import__("os").environ.get("DR_V6_MTX", "1"))
# DR_V6_PAIR=2: pop TWO nodes per row per step — two independent
# slab/reduce pipelines share one scalar<->vector sync round trip (the
# serialized pop->gather->slab->reduce->push chain is the step wall once
# vector work is hidden). Push order: second node's children first, so
# the first (nearer, DFS-top) node's children stay on top of the stack.
_V6_PAIR = int(__import__("os").environ.get("DR_V6_PAIR", "1"))
# push-loop strategy: "loop" (default) = 64-iteration (row x slot) scalar
# loop, fully unrolled straight-line code; "bits" = order-space hit mask +
# de Bruijn set-bit iteration — scalar work proportional to the number of
# HIT children, but MEASURED SLOWER (26.5->33.7 ms coherent, 123->154 ms
# incoherent): the data-dependent nested while serializes where the
# unrolled loop software-pipelines. Kept opt-in for re-evaluation on
# future chips; the ablation knobs DR_V6_{SCALARX,NODEX,FLUSHX,MTX}
# measure each stage's true cost share by duplicating it (CSE-proofed).
_V6_PUSH_BITS = __import__("os").environ.get("DR_V6_PUSH", "loop") == "bits"
# de Bruijn B(2,5) ctz table: _DB_TAB[((x&-x)*_DB_MUL) >>> 27] = ctz(x)
_DB_MUL = np.int32(0x077CB531)
_DB_TAB = np.zeros((32, 1), np.int32)
for _i in range(32):
    _DB_TAB[((((1 << _i) * 0x077CB531) & 0xFFFFFFFF) >> 27) & 31, 0] = _i
_V6_SPILL_DEBUG = False    # read the (slot,row) hit matrix via a VMEM spill
                           # instead of the packed-bits reduce (debug aid)


def _kernel6(wb_ref, wo_ref, w0_ref, w1_ref, w2_ref,
             v0x_ref, v0y_ref, v0z_ref,
             e1x_ref, e1y_ref, e1z_ref,
             e2x_ref, e2y_ref, e2z_ref,
             *rest,
             k: int, rows: int, any_hit: bool, n_wnodes: int,
             null_node: int, null_cluster: int, bf16: bool = False,
             mixed: bool = False, motion: bool = False,
             push_bits: bool = False):
    # push_bits mode repurposes the order-table refs: wo_ref carries the
    # (8*W', 4) 16-bit-packed unified child refs in PUSH ORDER (wrefp),
    # w0_ref the (8*W', 8) order-space mask weights 2^orderpos(slot)
    # (winv), w1_ref the (32, 1) de Bruijn ctz table; w2_ref is unused.
    # mixed: per-LANE any-hit flag plane (merged extension+shadow waves,
    # VERDICT r5 #1a): af > 0 lanes early-out on first hit like any_hit,
    # af == 0 lanes run the full closest-hit walk. The two semantics share
    # one launch (and one coherence sort / chunk schedule).
    # motion: continuous object motion blur — 9 extra soup-delta refs and a
    # per-lane shutter-time plane; leaf tests lerp v(t) = v + t*dv (one FMA
    # per component; node bounds are the shutter-union tree).
    pos = 0
    if motion:
        (dv0x_ref, dv0y_ref, dv0z_ref,
         de1x_ref, de1y_ref, de1z_ref,
         de2x_ref, de2y_ref, de2z_ref) = rest[0:9]
        pos = 9
    (ox_ref, oy_ref, oz_ref, dx_ref, dy_ref, dz_ref,
     tmin_ref, tmax_ref) = rest[pos:pos + 8]
    pos += 8
    af_ref = None
    if mixed:
        af_ref = rest[pos]
        pos += 1
    time_ref = None
    if motion:
        time_ref = rest[pos]
        pos += 1
    (t_out, prim_out,
     stack_ref, sp_ref, lbuf_ref, lcnt_ref, spill_ref) = rest[pos:]
    P = rows
    ox, oy, oz = ox_ref[:], oy_ref[:], oz_ref[:]
    dx, dy, dz = dx_ref[:], dy_ref[:], dz_ref[:]
    tmin = tmin_ref[:]
    tmax = tmax_ref[:]
    anyf = (af_ref[:] > 0.0) if mixed else None

    def safe_inv(d):
        tiny = jnp.where(d < 0, jnp.float32(-1e-30), jnp.float32(1e-30))
        return 1.0 / jnp.where(jnp.abs(d) < 1e-30, tiny, d)

    ix, iy, iz = safe_inv(dx), safe_inv(dy), safe_inv(dz)
    alive = tmax >= tmin

    # per-row majority octant -> worder row-group offsets (spill trick)
    half = jnp.float32(64.0)
    negf = jnp.concatenate(
        [jnp.sum(jnp.where(dx < 0, 1.0, 0.0), axis=1, keepdims=True),
         jnp.sum(jnp.where(dy < 0, 1.0, 0.0), axis=1, keepdims=True),
         jnp.sum(jnp.where(dz < 0, 1.0, 0.0), axis=1, keepdims=True)],
        axis=1)                                     # (P, 3)
    spill_ref[:, 0:3] = negf
    qw_r = []
    for r in range(P):
        q = (jnp.where(spill_ref[r, 0] > half, 1, 0)
             + jnp.where(spill_ref[r, 1] > half, 2, 0)
             + jnp.where(spill_ref[r, 2] > half, 4, 0))
        qw_r.append(q * n_wnodes)

    t0 = jnp.where(alive, tmax, jnp.float32(-jnp.inf))
    prim0 = jnp.full((P, 128), -1, jnp.int32)
    for r in range(P):
        stack_ref[0, r] = jnp.int32(0)
        sp_ref[r] = jnp.int32(1)
        lcnt_ref[r] = jnp.int32(0)

    o3 = (ox.reshape(1, P, 128), oy.reshape(1, P, 128),
          oz.reshape(1, P, 128))
    d3 = (dx.reshape(1, P, 128), dy.reshape(1, P, 128),
          dz.reshape(1, P, 128))
    ix3 = ix.reshape(1, P, 128)
    iy3 = iy.reshape(1, P, 128)
    iz3 = iz.reshape(1, P, 128)
    tmin3 = tmin.reshape(1, P, 128)
    alive3 = alive.reshape(1, P, 128)
    time3 = time_ref[:].reshape(1, P, 128) if motion else None
    # hit-bit packing weights: 3 groups of (rows-in-group x 8 slots) bits,
    # exact power-of-two constants passed as inputs (a runtime exp2() is
    # NOT guaranteed exact for integer arguments and corrupts the pack)
    GROUPS = ((0, 1, 2), (3, 4, 5), (6, 7))
    w_groups = None if push_bits else [w0_ref[:], w1_ref[:], w2_ref[:]]

    def node_steps(t_best, prim):
        def cond(st):
            t_best, full, live = st
            return live & ~full

        def body(st):
            t_best, full, _ = st
            node_r = []
            node2_r = []            # second popped node (DR_V6_PAIR=2)
            for r in range(P):
                sp = sp_ref[r]
                n_ = stack_ref[jnp.maximum(sp - 1, 0), r]
                node_r.append(jnp.where(sp > 0, n_, jnp.int32(null_node)))
                sp = jnp.maximum(sp - 1, 0)
                if _V6_PAIR >= 2 and not push_bits:
                    n2 = stack_ref[jnp.maximum(sp - 1, 0), r]
                    node2_r.append(jnp.where(sp > 0, n2,
                                             jnp.int32(null_node)))
                    sp = jnp.maximum(sp - 1, 0)
                sp_ref[r] = sp

            def slab_for(nlist):
                brows = [wb_ref[pl.ds(nlist[r], 1), :] for r in range(P)]
                B = jnp.concatenate(brows, axis=0)        # (P, 48)

                def comp(c):
                    seg = B[:, 8 * c:8 * (c + 1)]         # (P, 8)
                    return jnp.transpose(seg, (1, 0)).reshape(8, P, 1)

                lox, loy, loz = comp(0), comp(1), comp(2)
                hix, hiy, hiz = comp(3), comp(4), comp(5)
                t0x = (lox - o3[0]) * ix3
                t1x = (hix - o3[0]) * ix3
                t0y = (loy - o3[1]) * iy3
                t1y = (hiy - o3[1]) * iy3
                t0z = (loz - o3[2]) * iz3
                t1z = (hiz - o3[2]) * iz3
                tn = jnp.maximum(jnp.maximum(jnp.minimum(t0x, t1x),
                                             jnp.minimum(t0y, t1y)),
                                 jnp.maximum(jnp.minimum(t0z, t1z),
                                             tmin3))
                tf = jnp.minimum(jnp.minimum(jnp.maximum(t0x, t1x),
                                             jnp.maximum(t0y, t1y)),
                                 jnp.minimum(jnp.maximum(t0z, t1z),
                                             t_best.reshape(1, P, 128)))
                if any_hit:
                    return (tn <= tf) & alive3 \
                        & (prim < 0).reshape(1, P, 128)
                elif mixed:
                    return (tn <= tf) & alive3 \
                        & ((prim < 0) | ~anyf).reshape(1, P, 128)
                return (tn <= tf) & alive3

            slab = slab_for(node_r)
            # ablation (DR_V6_NODEX=N): N-1 duplicate slab-test blocks on
            # perturbed node ids (CSE-proof) folded via a never-true select
            for _rep in range(_V6_NODEX - 1):
                br2 = [wb_ref[pl.ds(jnp.maximum(node_r[r], 1), 1), :]
                       for r in range(P)]
                B2 = jnp.concatenate(br2, axis=0)

                def comp2(c):
                    seg = B2[:, 8 * c:8 * (c + 1)]
                    return jnp.transpose(seg, (1, 0)).reshape(8, P, 1)

                q0x = (comp2(0) - o3[0]) * ix3
                q1x = (comp2(3) - o3[0]) * ix3
                q0y = (comp2(1) - o3[1]) * iy3
                q1y = (comp2(4) - o3[1]) * iy3
                q0z = (comp2(2) - o3[2]) * iz3
                q1z = (comp2(5) - o3[2]) * iz3
                tn2 = jnp.maximum(jnp.maximum(jnp.minimum(q0x, q1x),
                                              jnp.minimum(q0y, q1y)),
                                  jnp.maximum(jnp.minimum(q0z, q1z),
                                              tmin3))
                tf2 = jnp.minimum(jnp.minimum(jnp.maximum(q0x, q1x),
                                              jnp.maximum(q0y, q1y)),
                                  jnp.maximum(q0z, q1z))
                t_best = jnp.where(
                    jnp.max(jnp.where(tn2 <= tf2, tn2, tf2), axis=0)
                    < jnp.float32(-3e38), tmin, t_best)
            # (slot, row) hit matrix -> 3 packed f32 scalars (<= 24 bits)
            hit_sr = jnp.sum(jnp.where(slab, 1.0, 0.0), axis=2) > 0.5
            if _V6_PAIR >= 2 and not push_bits:
                # second node's hit matrix — an independent vector
                # pipeline sharing this step's scalar sync round trip
                slab2 = slab_for(node2_r)
                hit2_sr = jnp.sum(jnp.where(slab2, 1.0, 0.0),
                                  axis=2) > 0.5
                bits2 = []
                for wg in w_groups:
                    bits2.append(jnp.sum(jnp.where(hit2_sr, wg, 0.0))
                                 .astype(jnp.int32))
            if _V6_SPILL_DEBUG:
                spill_ref[:, 0:8] = jnp.transpose(
                    jnp.where(hit_sr, 1.0, 0.0), (1, 0))    # (P rows, 8)
            if push_bits:
                # order-space hit mask per row: one winv row gather gives
                # the 2^orderpos(slot) weights; the weighted slot-sum IS
                # the mask with bit p = "child at push position p was hit"
                # (exact: 8 bits < 2^24 in f32)
                wvrows = jnp.concatenate(
                    [w0_ref[pl.ds(qw_r[r] + node_r[r], 1), :]
                     for r in range(P)], axis=0)            # (P, 8)
                hit_rs = jnp.transpose(
                    jnp.where(hit_sr, 1.0, 0.0), (1, 0))    # (P, 8)
                spill_ref[:, 3:4] = jnp.sum(hit_rs * wvrows, axis=1,
                                            keepdims=True)
                full = jnp.bool_(False)
                for r in range(P):
                    row = qw_r[r] + node_r[r]
                    pw = [wo_ref[row, w] for w in range(4)]
                    m0 = spill_ref[r, 3].astype(jnp.int32)

                    def pcond(c):
                        return c[0] != 0

                    def pbody(c, r=r, pw=pw):
                        m, sp, cnt = c
                        low = m & (-m)
                        idx = jax.lax.shift_right_logical(
                            (low * _DB_MUL).astype(jnp.uint32),
                            jnp.uint32(27)).astype(jnp.int32) & 31
                        p = w1_ref[idx, 0]           # ctz = push position
                        a = jnp.where(
                            p < 2, pw[0],
                            jnp.where(p < 4, pw[1],
                                      jnp.where(p < 6, pw[2], pw[3])))
                        hi16 = jax.lax.shift_right_logical(
                            a.astype(jnp.uint32),
                            jnp.uint32(16)).astype(jnp.int32)
                        fld = jnp.where((p & 1) > 0, hi16, a & 0xFFFF)
                        leaf = fld >= n_wnodes

                        @pl.when(~leaf)
                        def _():
                            stack_ref[sp, r] = fld

                        @pl.when(leaf)
                        def _():
                            lbuf_ref[r, cnt] = fld - n_wnodes

                        return (m & (m - 1), sp + jnp.where(leaf, 0, 1),
                                cnt + jnp.where(leaf, 1, 0))

                    _, sp, cnt = jax.lax.while_loop(
                        pcond, pbody, (m0, sp_ref[r], lcnt_ref[r]))
                    sp_ref[r] = sp
                    lcnt_ref[r] = cnt
                    full = full | (cnt + 8 > LBUF6)
                live = jnp.bool_(False)
                for r in range(P):
                    live = live | (sp_ref[r] > 0)
                if any_hit:
                    live = live & ~jnp.all((prim >= 0) | ~alive)
                elif mixed:
                    live = live & ~jnp.all(~alive | (anyf & (prim >= 0)))
                return t_best, full, live
            bits = []
            for wg in w_groups:
                bits.append(jnp.sum(jnp.where(hit_sr, wg, 0.0))
                            .astype(jnp.int32))
            # ablation (DR_V6_SCALARX=N): N-1 duplicate passes of the push
            # loop writing to a trash row — the measured slope IS the
            # scalar loop's cost share (walk is unchanged)
            for _rep in range(_V6_SCALARX - 1):
                for gi, g in enumerate(GROUPS):
                    for r in g:
                        sp = sp_ref[r]
                        for s in range(8):
                            e = wo_ref[qw_r[r] + node_r[r], s]
                            slot = e & 7
                            ref = jax.lax.shift_right_arithmetic(e, 3)
                            hit_s = ((bits[gi] >> (slot + 8 * (r - g[0])))
                                     & 1) > 0
                            push = hit_s & (ref >= 0)
                            take = hit_s & (ref < 0)

                            @pl.when(push)
                            def _():
                                stack_ref[STACK_DEPTH - 1, r] = ref

                            @pl.when(take)
                            def _():
                                stack_ref[STACK_DEPTH - 1, r] = -ref - 1

                            sp = sp + jnp.where(push, 1, 0)
                        stack_ref[STACK_DEPTH - 1, r] = sp
            full = jnp.bool_(False)
            pair = _V6_PAIR >= 2 and not push_bits
            marg = 16 if pair else 8
            if pair:
                # push the SECOND node's children first: the first node
                # was the stack top (DFS-nearer), so its children must
                # end up above the second's
                for gi, g in enumerate(GROUPS):
                    for r in g:
                        sp = sp_ref[r]
                        cnt = lcnt_ref[r]
                        for s in range(8):
                            e = wo_ref[qw_r[r] + node2_r[r], s]
                            slot = e & 7
                            ref = jax.lax.shift_right_arithmetic(e, 3)
                            hit_s = ((bits2[gi]
                                      >> (slot + 8 * (r - g[0]))) & 1) > 0
                            push = hit_s & (ref >= 0)
                            take = hit_s & (ref < 0)

                            @pl.when(push)
                            def _():
                                stack_ref[sp, r] = ref

                            @pl.when(take)
                            def _():
                                lbuf_ref[r, cnt] = -ref - 1

                            sp = sp + jnp.where(push, 1, 0)
                            cnt = cnt + jnp.where(take, 1, 0)
                        sp_ref[r] = sp
                        lcnt_ref[r] = cnt
            for gi, g in enumerate(GROUPS):
                for r in g:
                    sp = sp_ref[r]
                    cnt = lcnt_ref[r]
                    for s in range(8):
                        e = wo_ref[qw_r[r] + node_r[r], s]
                        slot = e & 7
                        ref = jax.lax.shift_right_arithmetic(e, 3)
                        if _V6_SPILL_DEBUG:
                            hit_s = spill_ref[r, slot] > 0.5
                        else:
                            hit_s = ((bits[gi] >> (slot + 8 * (r - g[0])))
                                     & 1) > 0
                        push = hit_s & (ref >= 0)
                        take = hit_s & (ref < 0)

                        @pl.when(push)
                        def _():
                            stack_ref[sp, r] = ref

                        @pl.when(take)
                        def _():
                            lbuf_ref[r, cnt] = -ref - 1

                        sp = sp + jnp.where(push, 1, 0)
                        cnt = cnt + jnp.where(take, 1, 0)
                    sp_ref[r] = sp
                    lcnt_ref[r] = cnt
                    full = full | (cnt + marg > LBUF6)
            live = jnp.bool_(False)
            for r in range(P):
                live = live | (sp_ref[r] > 0)
            if any_hit:
                done_all = jnp.all((prim >= 0) | ~alive)
                live = live & ~done_all
            elif mixed:
                # pure-shadow blocks (the sort groups lanes by the any-hit
                # key bit) exit once every live lane found its blocker
                done_all = jnp.all(~alive | (anyf & (prim >= 0)))
                live = live & ~done_all
            return t_best, full, live

        live0 = jnp.bool_(True)
        t_best, _, live = jax.lax.while_loop(
            cond, body, (t_best, jnp.bool_(False), live0))
        return t_best, live

    def flush(t_best, prim):
        cnts = [lcnt_ref[r] for r in range(P)]
        max_cnt = functools.reduce(jnp.maximum, cnts)

        def round_fn(i, carry):
            t_best, prim = carry
            cids = [jnp.where(i < lcnt_ref[r], lbuf_ref[r, i],
                              jnp.int32(null_cluster)) for r in range(P)]

            def cols(ref):
                # 9 per-component (P,K) gathers + (K,P) transposes. The
                # transposes are the flush's real cost (~44% of kernel;
                # gathers and MT math are both fully hidden — r5 ablation
                # DR_V6_{MTX,FLUSHX}) but every alternative measured
                # WORSE: fused (P,9K) gather + one big transpose
                # 123->130 ms, fused gather + 9 slice-transposes
                # 123->145, sublane-ray MT (no transpose, K-on-lanes 25%
                # util) 123->941. Mosaic's native per-component layout
                # wins; the relayout is the kernel-family plateau.
                rows_ = [ref[pl.ds(cids[r], 1), :] for r in range(P)]
                m = jnp.concatenate(rows_, axis=0)          # (P, K)
                if bf16:
                    # transpose in bf16 (halve the relayout bytes), but
                    # reshape in f32 — Mosaic only inserts minor dims on
                    # 32-bit types; _mt_dense re-casts elementwise (free)
                    mt_ = jnp.transpose(m.astype(jnp.bfloat16), (1, 0))
                    return mt_.astype(jnp.float32).reshape(k, P, 1)
                return jnp.transpose(m, (1, 0)).reshape(k, P, 1)

            v0 = (cols(v0x_ref), cols(v0y_ref), cols(v0z_ref))
            e1 = (cols(e1x_ref), cols(e1y_ref), cols(e1z_ref))
            e2 = (cols(e2x_ref), cols(e2y_ref), cols(e2z_ref))
            if motion:
                # lerp the cluster's triangles to each lane's shutter time
                dv0 = (cols(dv0x_ref), cols(dv0y_ref), cols(dv0z_ref))
                de1 = (cols(de1x_ref), cols(de1y_ref), cols(de1z_ref))
                de2 = (cols(de2x_ref), cols(de2y_ref), cols(de2z_ref))
                v0 = tuple(a + time3 * dd for a, dd in zip(v0, dv0))
                e1 = tuple(a + time3 * dd for a, dd in zip(e1, de1))
                e2 = tuple(a + time3 * dd for a, dd in zip(e2, de2))
            tm = _mt_dense(o3, d3, tmin3, v0, e1, e2, k, bf16=bf16)
            if any_hit:
                live = alive & (prim < 0)
            elif mixed:
                live = alive & ((prim < 0) | ~anyf)
            else:
                live = alive
            tm = jnp.where(live.reshape(1, P, 128), tm,
                           jnp.float32(jnp.inf))
            base = jnp.zeros((P, 128), jnp.int32)
            rsel = jax.lax.broadcasted_iota(jnp.int32, (P, 128), 0)
            for r in range(P):
                base = jnp.where(rsel == r, cids[r] * k, base)
            # ablation (DR_V6_MTX=N): N-1 duplicate MT evals on the SAME
            # gathered triangles (isolates arithmetic from gather cost)
            for _rep in range(_V6_MTX - 1):
                tm3 = _mt_dense(o3, d3, jnp.minimum(tmin3,
                                                    jnp.float32(3e38)),
                                v0, e1, e2, k, bf16=bf16)
                t_best = jnp.where(
                    jnp.min(tm3, axis=0) < jnp.float32(-3e38),
                    jnp.float32(0.0), t_best)
            # ablation (DR_V6_FLUSHX=N): N-1 duplicate leaf MT rounds on
            # perturbed cluster ids, folded via a never-true select
            for _rep in range(_V6_FLUSHX - 1):
                cid2 = [jnp.maximum(cids[r], 1) for r in range(P)]

                def cols2(ref):
                    rows_ = [ref[pl.ds(cid2[r], 1), :] for r in range(P)]
                    m2 = jnp.concatenate(rows_, axis=0)
                    return jnp.transpose(m2, (1, 0)).reshape(k, P, 1)

                tm2 = _mt_dense(o3, d3, tmin3,
                                (cols2(v0x_ref), cols2(v0y_ref),
                                 cols2(v0z_ref)),
                                (cols2(e1x_ref), cols2(e1y_ref),
                                 cols2(e1z_ref)),
                                (cols2(e2x_ref), cols2(e2y_ref),
                                 cols2(e2z_ref)), k, bf16=bf16)
                t_best = jnp.where(
                    jnp.min(tm2, axis=0) < jnp.float32(-3e38),
                    jnp.float32(0.0), t_best)
            return _fold_packed(tm, t_best, prim, base, k)

        t_best, prim = jax.lax.fori_loop(0, max_cnt, round_fn,
                                         (t_best, prim))
        for r in range(P):
            lcnt_ref[r] = jnp.int32(0)
        return t_best, prim

    def outer_cond(st):
        t_best, prim, live = st
        return live

    def outer_body(st):
        t_best, prim, _ = st
        t_best, live = node_steps(t_best, prim)
        t_best, prim = flush(t_best, prim)
        # buffered leaves may remain when the loop paused on a full buffer
        any_pend = jnp.bool_(False)
        for r in range(P):
            any_pend = any_pend | (sp_ref[r] > 0)
        return t_best, prim, live | any_pend

    t_best, prim, _ = jax.lax.while_loop(
        outer_cond, outer_body, (t0, prim0, jnp.bool_(True)))
    t_out[:] = jnp.where(prim >= 0, t_best, jnp.float32(jnp.inf))
    prim_out[:] = prim


@partial(jax.jit, static_argnames=("any_hit", "block_rows", "interpret",
                                   "bf16"))
def traverse6(bvh: PackedBVH, o, d, tmin, tmax, *, any_hit: bool = False,
              block_rows: int = 8, interpret: bool = False,
              bf16: bool = False, anyf=None, live_rows=None, time=None):
    """v6: per-row packets over the wide BVH (block_rows must be 8 — the
    hit-bit packing groups cover exactly 8 rows).

    anyf: optional (R,) f32 per-lane any-hit flags (mixed waves — merged
    extension+shadow launches). live_rows: optional traced live sublane-row
    count enabling dead-chunk skipping (see _chunked). time: (R,) shutter
    times for continuous-motion scenes (requires bvh.tdv0)."""
    assert block_rows == 8, "v6 supports block_rows=8 only"
    planes, shape2, n_blocks, r = _plane_blocks(o, d, tmin, tmax, block_rows)
    mixed = anyf is not None
    motion = time is not None and bvh.tdv0 is not None
    fills = list(_PLANE_FILL)
    if mixed:
        planes = planes + [_pad_to(anyf, shape2[0] * 128,
                                   0.0).reshape(shape2)]
        fills.append(0.0)
    if motion:
        planes = planes + [_pad_to(time, shape2[0] * 128,
                                   0.0).reshape(shape2)]
        fills.append(0.0)
    fills = tuple(fills)
    # sentinel rows: null wide node (NaN boxes, pad order entries)
    null_node = bvh.n_wnodes
    null_cluster = bvh.n_clusters
    wbounds = jnp.concatenate(
        [jnp.asarray(bvh.wbounds),
         jnp.full((1, 48), jnp.nan, jnp.float32)])
    # per-octant order rows for the null node: regroup (8, W, 8) with one
    # extra node per octant
    wo = jnp.asarray(bvh.worder).reshape(8, bvh.n_wnodes, 8)
    pad_row = jax.lax.broadcasted_iota(jnp.int32, (8, 1, 8), 2)  # slots
    wo = jnp.concatenate([wo, pad_row], axis=1).reshape(
        8 * (bvh.n_wnodes + 1), 8)

    def with_null(arr3):
        z = jnp.zeros((1, bvh.k), jnp.asarray(arr3[0]).dtype)
        return [jnp.concatenate([jnp.asarray(arr3[c]), z]) for c in range(3)]

    # bf16 mode keeps f32 refs ((16,128)-tiled bf16 refs reject the
    # single-row dynamic slices); cols() casts BEFORE the transpose so the
    # relayout — the measured kernel wall — moves half the bytes
    tri_args = (with_null(bvh.tv0) + with_null(bvh.te1)
                + with_null(bvh.te2))
    if motion:
        tri_args = tri_args + (with_null(bvh.tdv0) + with_null(bvh.tde1)
                               + with_null(bvh.tde2))
    push_bits = _V6_PUSH_BITS and (bvh.n_wnodes + bvh.n_clusters + 3
                                   <= 0xFFFF)
    if push_bits:
        # bits mode (see _kernel6): unified 16-bit child refs in push
        # order (interior -> node id, leaf -> W' + cluster), 4 per pair
        # of i32 words, plus the order-space mask weights and ctz table
        wprime = bvh.n_wnodes + 1
        slots = wo & 7
        refs = jax.lax.shift_right_arithmetic(wo, 3)
        uni = jnp.where(refs >= 0, refs, wprime + (-refs - 1))
        wrefp = (uni[:, 0::2] | (uni[:, 1::2] << 16)).astype(jnp.int32)
        pos_w = (2.0 ** np.arange(8)).astype(np.float32)
        winv = jnp.sum(jnp.where(
            slots[:, :, None] == jnp.arange(8, dtype=jnp.int32)[None, None],
            pos_w[None, :, None], 0.0), axis=1)             # (8*W', 8)
        w_args = [winv, jnp.asarray(_DB_TAB),
                  jnp.zeros((1, 8), jnp.float32)]
        wo = wrefp
    else:
        # exact bit-pack weight constants (see _kernel6)
        w_args = []
        for g in ((0, 1, 2), (3, 4, 5), (6, 7)):
            wg = np.zeros((8, block_rows), np.float64)
            for row_ in g:
                for s_ in range(8):
                    wg[s_, row_] = 2.0 ** (s_ + 8 * (row_ - g[0]))
            w_args.append(jnp.asarray(wg.astype(np.float32)))
    full = lambda a: pl.BlockSpec(a.shape, lambda i: (0,) * a.ndim,
                                  memory_space=pltpu.VMEM)
    ray_spec = pl.BlockSpec((block_rows, 128), lambda i: (i, 0),
                            memory_space=pltpu.VMEM)

    kern = partial(_kernel6, k=bvh.k, rows=block_rows, any_hit=any_hit,
                   n_wnodes=bvh.n_wnodes + 1, null_node=null_node,
                   null_cluster=null_cluster, bf16=bf16, mixed=mixed,
                   motion=motion, push_bits=push_bits)
    n_planes = 8 + (1 if mixed else 0) + (1 if motion else 0)

    def call2(pls):
        rows_c = pls[0].shape[0]
        return pl.pallas_call(
            kern,
            grid=(rows_c // block_rows,),
            out_shape=(jax.ShapeDtypeStruct((rows_c, 128), jnp.float32),
                       jax.ShapeDtypeStruct((rows_c, 128), jnp.int32)),
            in_specs=([full(wbounds), full(wo)]
                      + [full(w) for w in w_args]
                      + [full(a) for a in tri_args]
                      + [ray_spec] * n_planes),
            out_specs=(ray_spec, ray_spec),
            scratch_shapes=[pltpu.SMEM((STACK_DEPTH, block_rows), jnp.int32),
                            pltpu.SMEM((block_rows,), jnp.int32),
                            pltpu.SMEM((block_rows, LBUF6), jnp.int32),
                            pltpu.SMEM((block_rows,), jnp.int32),
                            pltpu.VMEM((block_rows, 8), jnp.float32)],
            interpret=interpret,
        )(wbounds, wo, *w_args, *tri_args, *pls)

    t, prim = _chunked(planes, shape2, call2, fills=fills,
                       live_rows=live_rows)
    return t.reshape(-1)[:r], prim.reshape(-1)[:r]


# ---------------------------------------------------------------------------
# Wavefront glue: ray sorting + exact hit finishing (host-of-kernel XLA ops).
# ---------------------------------------------------------------------------

def soup_pack16(tv0, te1, te2, perm):
    """(3, C, K) soup + perm -> (C*K, 16) row table for finish_hits:
    cols [v0.xyz e1.xyz e2.xyz orig_id_bits pad...] (host numpy).

    ONE row gather replaces 9 component gathers + the perm id gather — on
    the v5e a 262k-index gather costs ~8-16 ms regardless of row width
    (index-bound), so per-closest-wave finish cost drops ~10x."""
    ck = tv0.shape[1] * tv0.shape[2]
    A = np.zeros((ck, 16), np.float32)
    for c in range(3):
        A[:, 0 + c] = np.asarray(tv0[c]).reshape(-1)
        A[:, 3 + c] = np.asarray(te1[c]).reshape(-1)
        A[:, 6 + c] = np.asarray(te2[c]).reshape(-1)
    A[:, 9] = np.asarray(perm, np.int32).view(np.float32)
    return A


def finish_hits(bvh: PackedBVH, perm, o, d, tmin, t_approx, prim_p,
                time=None):
    """Exact (t, b1, b2) + original prim ids for kernel winners.

    The kernel's packed fold rounds t by <=127 ulps and drops barycentrics;
    one gathered full-precision Moeller-Trumbore evaluation per ray restores
    exact values (reference triangle.dart:44-160 semantics). The triangle
    fetch is ONE wide row gather from the packed soup16 table (see
    soup_pack16) transposed once to component rows. For continuous-motion
    scenes (`time` + bvh.soup16d) the vertices are lerped to the ray's
    shutter time before the exact evaluation."""
    oc, dc = _components(o, d)
    hit = prim_p >= 0
    pp = jnp.maximum(prim_p, 0)
    if bvh.soup16 is not None:
        rows = jnp.transpose(bvh.soup16[pp])        # (16, R)
        v0 = [rows[0], rows[1], rows[2]]
        e1 = [rows[3], rows[4], rows[5]]
        e2 = [rows[6], rows[7], rows[8]]
        orig = jax.lax.bitcast_convert_type(rows[9], jnp.int32)
        if time is not None and bvh.soup16d is not None:
            rd = jnp.transpose(bvh.soup16d[pp])
            v0 = [a + time * rd[c] for c, a in enumerate(v0)]
            e1 = [a + time * rd[3 + c] for c, a in enumerate(e1)]
            e2 = [a + time * rd[6 + c] for c, a in enumerate(e2)]
    else:
        cid = pp // bvh.k
        j = pp % bvh.k
        flat = cid * bvh.k + j
        v0 = [bvh.tv0[c].reshape(-1)[flat] for c in range(3)]
        e1 = [bvh.te1[c].reshape(-1)[flat] for c in range(3)]
        e2 = [bvh.te2[c].reshape(-1)[flat] for c in range(3)]
        orig = perm[pp]
    t_out, u, v = _exact_mt(oc, dc, v0, e1, e2, hit)
    prim = jnp.where(hit, orig, -1)
    return t_out, prim, u, v


def _exact_mt(oc, dc, v0, e1, e2, hit):
    """Full-precision Moeller-Trumbore over component lists (the finish
    evaluation; triangle.dart:44-160 semantics)."""
    px = dc[1] * e2[2] - dc[2] * e2[1]
    py = dc[2] * e2[0] - dc[0] * e2[2]
    pz = dc[0] * e2[1] - dc[1] * e2[0]
    det = e1[0] * px + e1[1] * py + e1[2] * pz
    inv_det = 1.0 / jnp.where(jnp.abs(det) < TRI_EPS, 1.0, det)
    tx = oc[0] - v0[0]
    ty = oc[1] - v0[1]
    tz = oc[2] - v0[2]
    u = (tx * px + ty * py + tz * pz) * inv_det
    qx = ty * e1[2] - tz * e1[1]
    qy = tz * e1[0] - tx * e1[2]
    qz = tx * e1[1] - ty * e1[0]
    v = (dc[0] * qx + dc[1] * qy + dc[2] * qz) * inv_det
    t = (e2[0] * qx + e2[1] * qy + e2[2] * qz) * inv_det
    t_out = jnp.where(hit, t, jnp.float32(jnp.inf))
    return t_out, jnp.where(hit, u, 0.0), jnp.where(hit, v, 0.0)


def finish_hits_rows(bvh: PackedBVH, attrp, o, d, tmin, t_approx, prim_p,
                     time=None):
    """finish_hits via the COMBINED finish+interaction table: ONE row
    gather serves both the exact-hit evaluation (cols 0-8 = the packed
    soup the kernel tested, col 36 = original prim id bits) and the
    downstream shading interaction (cols 9-35, scene/types._pack_attr
    layout). Saves a full index-bound gather per closest-hit wave vs the
    soup16-then-attr pair (measured ~8 ms each at 262k lanes on v5e).

    Returns (t, prim, b1, b2, rows) with rows (48, R) transposed for
    lane-packed column slices."""
    oc, dc = _components(o, d)
    hit = prim_p >= 0
    pp = jnp.maximum(prim_p, 0)
    rows = jnp.transpose(attrp[pp])                 # (48, R)
    v0 = [rows[0], rows[1], rows[2]]
    e1 = [rows[3], rows[4], rows[5]]
    e2 = [rows[6], rows[7], rows[8]]
    orig = jax.lax.bitcast_convert_type(rows[36], jnp.int32)
    if time is not None and bvh.soup16d is not None:
        # continuous motion: lerp the finish vertices to the ray's shutter
        # time (interaction's shading attrs stay shutter-start by design —
        # it derives p from the ray for moving scenes)
        rd = jnp.transpose(bvh.soup16d[pp])
        v0 = [a + time * rd[c] for c, a in enumerate(v0)]
        e1 = [a + time * rd[3 + c] for c, a in enumerate(e1)]
        e2 = [a + time * rd[6 + c] for c, a in enumerate(e2)]
    t_out, u, v = _exact_mt(oc, dc, v0, e1, e2, hit)
    prim = jnp.where(hit, orig, -1)
    return t_out, prim, u, v, rows


# kernel/config chosen from the round-3 on-chip sweep (tools/exp_wide.py):
# coherent (unsorted camera) waves -> v5 wide blocks at 32 rows (6.1 vs
# 5.5 Mrays/s at 16); sorted bounce/shadow waves -> v6 per-row wide packets
# (best incoherent numbers: 1.75 vs v5's 1.5)
# r4 re-measured (chained timing, tools/exp_wide.py): v5@32 camera probes
# 11.9 M vs v6@8 10.2 M, but v5 in-wave trips XLA's scoped-VMEM placement
# (19.4M > 16M once the fused sort chains VMEM buffers); v6 everywhere is
# within ~15% of per-config optimum and compiles robustly
DEFAULT_KERNEL = dict(closest_coherent=("v6", 8), closest=("v6", 8),
                      any=("v6", 8))


_SORT_KEY_MODE = __import__("os").environ.get("DR_SORT_KEY", "origin")


def sort_key_i32(oc, dc, tmin, tmax, lo, hi, anyflag=None):
    """int32 coherence key: dead flag | any-hit flag | direction octant |
    21-bit Morton of the origin quantized into the scene bounds (sort_order
    semantics in 26 bits — fits the single int32 key operand of the fused
    wave sort). `anyflag` (mixed waves): shadow lanes group into their own
    blocks so the kernel's all-shadow-lanes-done early exit can fire.

    DR_SORT_KEY=dir swaps the 21 Morton bits for 12-bit coarse origin
    Morton + 9-bit direction Morton (A/B probe: secondary diffuse packets
    share an origin cell but spread over the hemisphere — the per-row node
    walk visits the UNION of 128 lanes' node sets, so a tighter direction
    cone may shrink the walk more than finer origin cells do)."""
    def spread7(x):
        x = (x | (x << 8)) & 0x0300F00F
        x = (x | (x << 4)) & 0x030C30C3
        x = (x | (x << 2)) & 0x09249249
        return x

    octant = ((dc[0] < 0) * 1 + (dc[1] < 0) * 2
              + (dc[2] < 0) * 4).astype(jnp.int32)
    dead = (tmax < tmin).astype(jnp.int32)
    if _SORT_KEY_MODE == "dir":
        sc = 15.0 / jnp.maximum(hi - lo, 1e-9)
        qs = [jnp.clip((oc[c] - lo[c]) * sc[c], 0.0, 15.0).astype(jnp.int32)
              for c in range(3)]
        mo = (spread7(qs[0]) | (spread7(qs[1]) << 1)
              | (spread7(qs[2]) << 2)) & 0xFFF
        qd = [jnp.clip(jnp.abs(dc[c]) * 7.999, 0.0,
                       7.0).astype(jnp.int32) for c in range(3)]
        md = (spread7(qd[0]) | (spread7(qd[1]) << 1)
              | (spread7(qd[2]) << 2)) & 0x1FF
        m = (mo << 9) | md
    else:
        sc = 127.0 / jnp.maximum(hi - lo, 1e-9)
        qs = [jnp.clip((oc[c] - lo[c]) * sc[c], 0.0,
                       127.0).astype(jnp.int32) for c in range(3)]
        m = (spread7(qs[0]) | (spread7(qs[1]) << 1) | (spread7(qs[2]) << 2))
    key = (dead << 25) | (octant << 21) | m
    if anyflag is not None:
        key = key | ((anyflag > 0).astype(jnp.int32) << 24)
    return key


def intersect_rays(bvh: PackedBVH, perm, lo, hi, o, d, tmin, tmax, *,
                   any_hit: bool = False, sort: bool = True,
                   kernel: str | None = None, order=None,
                   interpret: bool = False, time=None, rows_table=None):
    """Full traversal pipeline: fused sort -> Pallas kernel -> unsort ->
    finish.

    Returns (t, prim, b1, b2) in the ORIGINAL ray order; prim indexes the
    original triangle soup (-1 miss). For any_hit, b1/b2 are zeros and t is
    the (approximate) blocker distance.

    The coherence sort is ONE multi-operand lax.sort carrying the inverse
    permutation and all 8 ray planes as payload — the r3 design (argsort +
    8 apply-permutation gathers) spent ~10-15 ms PER GATHER on the v5e
    (gathers are the chip's weakest op; tools/exp_permute.py: 33 ms vs
    8.6 ms for the fused form, unsort scatters included). `order` is
    accepted for API compat and ignored (per-bounce sort sharing is now
    slower than just sorting: the fused sort costs less than one gather)."""
    del order
    sorted_wave = sort
    cfg_key = ("any" if any_hit
               else ("closest" if sorted_wave else "closest_coherent"))
    which, br = (kernel, 8) if kernel else DEFAULT_KERNEL[cfg_key]
    if which in ("v5", "v6"):
        fn = {"v5": traverse5, "v6": traverse6}[which]
    else:
        # superseded generations + opt-in v7 live in the attic
        from . import kernels_attic as ka
        fn = getattr(ka, {"v1": "traverse", "v2": "traverse2",
                          "v3": "traverse3", "v4": "traverse4",
                          "v7": "traverse7"}[which])
    oc, dc = _components(o, d)
    motion = time is not None and bvh.tdv0 is not None
    if motion:
        assert which == "v6", "continuous motion requires the v6 kernel"
    if sorted_wave:
        from ..core.math import V3
        n = oc[0].shape[0]
        key = sort_key_i32(oc, dc, tmin, tmax, lo, hi)
        iota = jax.lax.iota(jnp.int32, n)
        ops = [key, iota, oc[0], oc[1], oc[2],
               dc[0], dc[1], dc[2], tmin, tmax]
        if motion:
            ops.append(time)
        s = jax.lax.sort(ops, num_keys=1)
        inv = s[1]
        o_s = V3(s[2], s[3], s[4])
        d_s = V3(s[5], s[6], s[7])
        kw = {}
        if which == "v6":
            # sorted waves put dead lanes last: bound the chunk loop to the
            # live prefix so all-dead chunks are never dispatched
            live = jnp.sum((tmax >= tmin).astype(jnp.int32))
            kw["live_rows"] = (live + 127) // 128
            if motion:
                kw["time"] = s[10]
        t_s, prim_s = fn(bvh, o_s, d_s, s[8], s[9],
                         any_hit=any_hit, block_rows=br, interpret=interpret,
                         **kw)
        t = jnp.zeros((n,), jnp.float32).at[inv].set(t_s)
        prim_p = jnp.full((n,), -1, jnp.int32).at[inv].set(prim_s)
    else:
        kw = {"time": time} if motion else {}
        t, prim_p = fn(bvh, o, d, tmin, tmax, any_hit=any_hit, block_rows=br,
                       interpret=interpret, **kw)
    if any_hit:
        # occlusion callers only test prim >= 0; returning the PERMUTED id
        # (same sign) skips a 262k-index gather per shadow wave
        z = jnp.zeros_like(t)
        return t, prim_p, z, z
    if rows_table is not None:
        # combined finish+interaction gather: +rows in the return tuple
        return finish_hits_rows(bvh, rows_table, o, d, tmin, t, prim_p,
                                time=time)
    return finish_hits(bvh, perm, o, d, tmin, t, prim_p, time=time)


def intersect_rays_pair(bvh: PackedBVH, perm, lo, hi,
                        o_e, d_e, tmin_e, tmax_e,
                        o_s, d_s, tmin_s, tmax_s, *,
                        interpret: bool = False,
                        time_e=None, time_s=None, rows_table=None):
    """ONE traversal launch over 2R lanes: closest-hit extension rays +
    any-hit shadow rays, distinguished by a per-lane flag (kernel v6 mixed
    mode). Merging halves the per-bounce launch count (and coherence
    sorts) of the path-integrator wave: both ray sets originate at the
    same hit points, so they share scene residency and sort locality
    (VERDICT r5 #1a).

    Returns (t, prim, b1, b2) for the extension half (original order,
    original soup ids) and `occluded` bool for the shadow half."""
    from ..core.math import V3
    oce, dce = _components(o_e, d_e)
    ocs, dcs = _components(o_s, d_s)
    n = oce[0].shape[0]
    oc = [jnp.concatenate([a, b]) for a, b in zip(oce, ocs)]
    dc = [jnp.concatenate([a, b]) for a, b in zip(dce, dcs)]
    tmin = jnp.concatenate([tmin_e, tmin_s])
    tmax = jnp.concatenate([tmax_e, tmax_s])
    af = jnp.concatenate([jnp.zeros((n,), jnp.float32),
                          jnp.ones((n,), jnp.float32)])
    motion = time_e is not None and bvh.tdv0 is not None
    key = sort_key_i32(oc, dc, tmin, tmax, lo, hi, anyflag=af)
    iota = jax.lax.iota(jnp.int32, 2 * n)
    ops = [key, iota, oc[0], oc[1], oc[2],
           dc[0], dc[1], dc[2], tmin, tmax, af]
    if motion:
        ops.append(jnp.concatenate([time_e, time_s]))
    s = jax.lax.sort(ops, num_keys=1)
    inv = s[1]
    live = jnp.sum((tmax >= tmin).astype(jnp.int32))
    t_s, prim_s = traverse6(bvh, V3(s[2], s[3], s[4]), V3(s[5], s[6], s[7]),
                            s[8], s[9], any_hit=False, block_rows=8,
                            interpret=interpret, anyf=s[10],
                            live_rows=(live + 127) // 128,
                            time=s[11] if motion else None)
    t = jnp.zeros((2 * n,), jnp.float32).at[inv].set(t_s)
    prim_p = jnp.full((2 * n,), -1, jnp.int32).at[inv].set(prim_s)
    occluded = prim_p[n:] >= 0
    if rows_table is not None:
        te, prime, b1, b2, rows = finish_hits_rows(
            bvh, rows_table, o_e, d_e, tmin_e, t[:n], prim_p[:n],
            time=time_e if motion else None)
        return te, prime, b1, b2, occluded, rows
    te, prime, b1, b2 = finish_hits(bvh, perm, o_e, d_e, tmin_e,
                                    t[:n], prim_p[:n],
                                    time=time_e if motion else None)
    return te, prime, b1, b2, occluded


# --- attic re-exports (PEP 562) --------------------------------------------
# Superseded kernel generations v1-v4, the opt-in v7 Woop-MXU kernel, and
# the obsolete argsort-based sort helpers moved to ops/kernels_attic.py
# (VERDICT r4 weak #7). Lazy attribute access keeps tools/exp_* scripts and
# older call sites working without importing ~1,200 attic lines on the hot
# path.
_ATTIC_NAMES = ("traverse", "traverse2", "traverse3", "traverse4",
                "traverse7", "woop_pack", "with_woop", "sort_order",
                "sort_order_origin", "_null_extended", "_kernel",
                "_kernel2", "_kernel3", "_kernel4", "_kernel7",
                "_morton_spread", "LBUF3", "LBUF7", "SMEM_META_MAX")


def __getattr__(name):
    if name in _ATTIC_NAMES:
        from . import kernels_attic as _ka
        return getattr(_ka, name)
    raise AttributeError(f"module {__name__!r} has no attribute {name!r}")
