"""Compiled scene: every Primitive/Shape/Material/Light flattened to device
arrays (SURVEY §7 architecture mapping — the TPU-native replacement for
DartRay's pointer-based Primitive/Shape polymorphism, lib/core/primitive.dart,
lib/core/scene.dart:26-69).

The scene compiler (host) consumes the parsed PBRT scene (scene/api.py) and
emits one CompiledScene pytree of device arrays; all kernels take it as a
traced argument (no recompilation across scenes of identical shape-signature).
"""
from __future__ import annotations

import dataclasses
from functools import partial
from typing import Any, Optional

import numpy as np
import jax
import jax.numpy as jnp

from ..accel import bvh as bvh_mod
from ..accel import cluster as cluster_mod
from ..core import math as vm
from . import mesh as mesh_mod


@partial(jax.tree_util.register_dataclass,
         data_fields=["cl", "packed", "perm", "attr", "attrp", "v0", "e1",
                      "e2", "vn", "uv", "mat_id", "light_id", "world_bound",
                      "alpha_tid", "alpha_tex", "alt"],
         meta_fields=["n_prims", "n_nodes", "has_alpha", "has_motion",
                      "shutter", "alt_kind"])
@dataclasses.dataclass
class Geometry:
    """Triangle soup + threaded BVH + per-face attribute tables.

    vn: (F, 3, 3) per-corner shading normals (geometric normal replicated
    when the mesh has none); uv: (F, 3, 2) per-corner uv (barycentric default
    when absent). mat_id/light_id: (F,) int32 indices into material/light
    tables (light_id -1 = not emissive).

    Two accelerator representations are carried: ``cl`` (ClusterBVH, the
    XLA while_loop traversal — CPU tests + fallback) and ``packed``/``perm``
    (ops.traverse_pallas.PackedBVH — the Pallas TPU megakernel path).
    """
    cl: Any                  # accel.cluster.ClusterBVH (XLA traversal)
    packed: Any              # ops.traverse_pallas.PackedBVH or None
    perm: Optional[jnp.ndarray]   # (C*K,) permuted prim id -> original
    attr: Optional[jnp.ndarray]   # (F, 48) packed attr rows (_pack_attr)
    # (C*K, 48) PACKED-order combined finish+interaction rows: attr rows
    # permuted to kernel prim order with cols 0-8 replaced by the exact
    # packed soup and col 36 = original prim id bits — ONE gather per
    # closest-hit wave serves both finish_hits and interaction
    attrp: Optional[jnp.ndarray]
    v0: jnp.ndarray
    e1: jnp.ndarray
    e2: jnp.ndarray
    vn: jnp.ndarray
    uv: jnp.ndarray
    mat_id: jnp.ndarray
    light_id: jnp.ndarray
    world_bound: jnp.ndarray   # (2, 3)
    alpha_tid: Any = None      # (F,) int32 alpha-mask texture id (-1 none)
    alpha_tex: Any = None      # textures.TextureData when has_alpha
    # alternate accelerator (Accelerator "grid"/"kdtree"): the REAL
    # reference algorithms (accel/grid.py, accel/kdtree.py) — selectable,
    # oracle-tested, and deliberately NOT the TPU default (their per-lane
    # pointer walks gather far below the wide-BVH cluster kernel)
    alt: Any = None
    alt_kind: str = ""         # "" | "grid" | "kdtree" (static)
    n_prims: int = 0
    n_nodes: int = 0
    has_alpha: bool = False    # static: gates the cutout continuation loop
    # continuous object motion blur (animated_transform.dart:107-178
    # redesign): the BVH is ONE shutter-union tree whose leaf tests lerp
    # vertices to each ray's time (cl.tri_dv0 / packed.tdv0 deltas) — no
    # per-bin retrace, no shutter banding
    has_motion: bool = False
    shutter: tuple = (0.0, 1.0)


@partial(jax.tree_util.register_dataclass,
         data_fields=["geometry", "materials", "lights", "volume", "textures"],
         meta_fields=[])
@dataclasses.dataclass
class CompiledScene:
    geometry: Geometry
    materials: Any      # materials.MaterialTable or None
    lights: Any         # lights.LightTable or None
    volume: Any         # volumes.VolumeData or None
    textures: Any       # textures.TextureData or None


def compile_geometry(meshes, mat_ids=None, light_ids=None,
                     split_method="sah", textures=None,
                     shutter=(0.0, 1.0), accelerator="bvh") -> Geometry:
    """meshes: list of TriangleMesh (world space). mat_ids/light_ids:
    per-mesh ints. textures: the scene TextureData (required only when a
    mesh carries an alpha-mask texture; referenced by the geometry so the
    traversal can evaluate cutouts without extra plumbing)."""
    if not meshes:
        raise ValueError("empty scene")
    n_meshes = len(meshes)
    mat_ids = mat_ids if mat_ids is not None else [0] * n_meshes
    light_ids = light_ids if light_ids is not None else [-1] * n_meshes

    alpha_ids = []
    v0s, e1s, e2s, vns, uvs, mids, lids = [], [], [], [], [], [], []
    for m, mid, lid in zip(meshes, mat_ids, light_ids):
        alpha_ids.append(np.full(m.faces.shape[0],
                                 getattr(m, "alpha_tid", -1), np.int32))
        v0, e1, e2 = bvh_mod.triangles_to_mt(m.verts, m.faces)
        f = m.faces
        if m.normals is not None:
            vn = np.stack([m.normals[f[:, k]] for k in range(3)], axis=1)
        else:
            gn = np.cross(e1, e2)
            gn /= np.maximum(np.linalg.norm(gn, axis=-1, keepdims=True), 1e-20)
            vn = np.repeat(gn[:, None, :], 3, axis=1)
        if m.uvs is not None:
            uv = np.stack([m.uvs[f[:, k]] for k in range(3)], axis=1)
        else:
            uv = np.broadcast_to(
                np.asarray([[0, 0], [1, 0], [1, 1]], np.float32),
                (f.shape[0], 3, 2)).copy()
        v0s.append(v0)
        e1s.append(e1)
        e2s.append(e2)
        vns.append(vn.astype(np.float32))
        uvs.append(uv.astype(np.float32))
        mids.append(np.full(f.shape[0], mid, np.int32))
        lids.append(np.full(f.shape[0], lid, np.int32))

    v0 = np.concatenate(v0s)
    e1 = np.concatenate(e1s)
    e2 = np.concatenate(e2s)
    # continuous object motion blur: ONE shutter-union BVH + per-triangle
    # (close - open) soup deltas; leaf tests lerp by ray time
    # (animated_transform.dart:107-178 redesign — replaces the round-3/4
    # shutter-bin scheme that cost one traversal wave per bin and banded)
    has_motion = any(getattr(m, "verts_end", None) is not None
                     for m in meshes)
    if has_motion:
        vb0s, eb1s, eb2s = [], [], []
        for m in meshes:
            ve = (m.verts_end if getattr(m, "verts_end", None) is not None
                  else m.verts)
            b0, b1_, b2_ = bvh_mod.triangles_to_mt(ve, m.faces)
            vb0s.append(b0)
            eb1s.append(b1_)
            eb2s.append(b2_)
        cb = cluster_mod.build_motion(
            v0, e1, e2, np.concatenate(vb0s), np.concatenate(eb1s),
            np.concatenate(eb2s), split_method=split_method)
    else:
        cb = cluster_mod.build(v0, e1, e2, split_method=split_method)
    wb = np.stack([np.asarray(cb.node_lo[0]), np.asarray(cb.node_hi[0])])
    alt = None
    if has_motion and accelerator in ("grid", "kdtree"):
        import warnings
        warnings.warn(f"Accelerator {accelerator!r} does not support "
                      f"moving geometry; using the cluster BVH")
        accelerator = "bvh"
    if accelerator == "grid":
        from ..accel import grid as grid_mod
        alt = grid_mod.build(v0, e1, e2)
    elif accelerator == "kdtree":
        from ..accel import kdtree as kd_mod
        alt = kd_mod.build(v0, e1, e2)
    from ..ops import traverse_pallas as tp
    # everything stays HOST numpy: one jax.device_put of the finished scene
    # at render entry (to_device below) instead of dozens of host<->device
    # round-trips over a possibly-tunneled chip during the build phase
    packed, perm = tp.pack(cb.node_lo, cb.node_hi, cb.node_child,
                           cb.node_axis, cb.tri_v0, cb.tri_e1, cb.tri_e2,
                           cb.tri_id,
                           deltas=((cb.tri_dv0, cb.tri_de1, cb.tri_de2)
                                   if has_motion else None))
    alpha_tid = np.concatenate(alpha_ids)
    has_alpha = bool((alpha_tid >= 0).any()) and textures is not None
    vn_all = np.concatenate(vns)          # (F, 3 corners, 3)
    uv_all = np.concatenate(uvs)          # (F, 3 corners, 2)
    mat_all = np.concatenate(mids)
    light_all = np.concatenate(lids)
    attr = _pack_attr(v0, e1, e2, vn_all, uv_all, mat_all, light_all,
                      alpha_tid)
    # packed-order combined finish+interaction rows (host numpy): attr rows
    # reordered to kernel prim ids; cols 0-8 = the EXACT packed soup the
    # kernel leaf-tests (pad slots keep zero edges -> det 0 -> never hit);
    # col 36 = original prim id bits. ONE (C*K, 48) row gather per
    # closest-hit wave then serves finish AND shading (finish_hits_rows).
    attrp = attr[np.maximum(perm, 0)].copy()
    for c in range(3):
        attrp[:, 0 + c] = packed.tv0[c].reshape(-1)
        attrp[:, 3 + c] = packed.te1[c].reshape(-1)
        attrp[:, 6 + c] = packed.te2[c].reshape(-1)
    attrp[:, 36] = np.asarray(perm, np.int32).view(np.float32)
    return Geometry(
        cl=cb, packed=packed, perm=perm,
        attr=attr, attrp=attrp,
        v0=_v3_of(v0), e1=_v3_of(e1), e2=_v3_of(e2),
        vn=tuple(_v3_of(vn_all[:, k]) for k in range(3)),
        uv=tuple(vm.V2(np.ascontiguousarray(uv_all[:, k, 0]),
                       np.ascontiguousarray(uv_all[:, k, 1]))
                 for k in range(3)),
        mat_id=np.concatenate(mids),
        light_id=np.concatenate(lids),
        world_bound=wb.astype(np.float32),
        alpha_tid=alpha_tid if has_alpha else None,
        alpha_tex=textures if has_alpha else None,
        alt=alt,
        alt_kind=accelerator if alt is not None else "",
        n_prims=int(v0.shape[0]), n_nodes=cb.n_nodes, has_alpha=has_alpha,
        has_motion=has_motion, shutter=tuple(shutter))


def _v3_of(a):
    """(F, 3) host array -> component-SoA V3 of contiguous (F,) arrays."""
    a = np.asarray(a)
    return vm.V3(np.ascontiguousarray(a[:, 0]),
                 np.ascontiguousarray(a[:, 1]),
                 np.ascontiguousarray(a[:, 2]))


# attr-table column layout (see _pack_attr / attr_rows)
_ATTR_W = 48


def _pack_attr(v0, e1, e2, vn, uv, mat_id, light_id, alpha_tid):
    """Per-face attribute rows (F, 48), host numpy: ONE wide row gather per
    interaction instead of ~26 component gathers (a 262k-index gather costs
    ~8-16 ms on the v5e regardless of row width — index-bound; r4 trace).

    cols: 0-8 v0|e1|e2, 9-11 ng, 12-17 dpdu|dpdv (precomputed, with the
    degenerate-uv fallback baked in), 18-26 vn corners, 27-32 uv corners,
    33 mat_id bits, 34 light_id bits, 35 alpha_tid bits."""
    f = v0.shape[0]
    A = np.zeros((f, _ATTR_W), np.float32)
    A[:, 0:3] = v0
    A[:, 3:6] = e1
    A[:, 6:9] = e2
    ng = np.cross(e1, e2)
    ng /= np.maximum(np.linalg.norm(ng, axis=-1, keepdims=True), 1e-20)
    A[:, 9:12] = ng
    duv1 = uv[:, 1] - uv[:, 0]
    duv2 = uv[:, 2] - uv[:, 0]
    det = duv1[:, 0] * duv2[:, 1] - duv1[:, 1] * duv2[:, 0]
    inv = 1.0 / np.where(np.abs(det) < 1e-12, 1.0, det)
    dpdu = (e1 * duv2[:, 1:2] - e2 * duv1[:, 1:2]) * inv[:, None]
    dpdv = (e2 * duv1[:, 0:1] - e1 * duv2[:, 0:1]) * inv[:, None]
    degen = np.abs(det) < 1e-12
    # coordinate_system(ng) fallback (same branch-free construction)
    x, y, z = ng[:, 0], ng[:, 1], ng[:, 2]
    big_x = np.abs(x) > np.abs(y)
    inv_a = 1.0 / np.sqrt(np.maximum(
        np.where(big_x, x * x + z * z, y * y + z * z), 1e-30))
    cu = np.where(big_x[:, None],
                  np.stack([-z * inv_a, np.zeros_like(x), x * inv_a], -1),
                  np.stack([np.zeros_like(x), z * inv_a, -y * inv_a], -1))
    cv = np.cross(ng, cu)
    dpdu = np.where(degen[:, None], cu, dpdu)
    dpdv = np.where(degen[:, None], cv, dpdv)
    A[:, 12:15] = dpdu
    A[:, 15:18] = dpdv
    A[:, 18:27] = vn.reshape(f, 9)
    A[:, 27:33] = uv.reshape(f, 6)
    # columns 33-35 are int32 BIT PATTERNS (f32 denormals for small ids):
    # NEVER apply arithmetic to them — only bit-exact data movement
    # (device_put / gather / transpose). Regression:
    # tests/test_bvh.py::test_attr_row_id_columns_bit_exact
    A[:, 33] = np.asarray(mat_id, np.int32).view(np.float32)
    A[:, 34] = np.asarray(light_id, np.int32).view(np.float32)
    A[:, 35] = np.asarray(alpha_tid, np.int32).view(np.float32)
    return A


def attr_rows(geom, idx):
    """ONE row gather of the per-face attr table -> (48, R) component rows
    (transposed once so downstream slices are lane-packed (R,) arrays)."""
    return jnp.transpose(geom.attr[idx])


def attr_v3(rows, c0):
    return vm.V3(rows[c0], rows[c0 + 1], rows[c0 + 2])


def to_device(tree):
    """One-shot transfer of a (numpy-leaved) CompiledScene/Geometry pytree to
    the default device. Idempotent — leaves already on device are untouched.
    Call once at render entry; passing numpy leaves straight into a jitted
    step would re-transfer them EVERY call."""
    return jax.device_put(tree)


# force the Pallas traversal in interpret mode off-TPU (tests exercise the
# TPU code path — incl. its gradient boundary — without a chip)
FORCE_PALLAS_INTERPRET = False

# trace-time traversal-query log: every intersect/intersect_p call appends
# its wave size WHILE TRACING. Since a jitted wave re-executes the same
# traced graph, (sum of one trace) x waves = EXACT issued-query count for
# any integrator (fixes the round-2 path-formula-for-everything accounting).
QUERY_LOG: list = []


def _log_query(rays):
    try:
        QUERY_LOG.append(int(rays.o.shape[0]))
    except Exception:   # noqa: BLE001 — never let accounting break a render
        pass


def _use_pallas(geom) -> bool:
    if getattr(geom, "alt_kind", ""):
        return False              # explicit grid/kdtree accelerator
    return geom.packed is not None and (jax.default_backend() == "tpu"
                                        or FORCE_PALLAS_INTERPRET)


def _detach(x):
    """Gradient boundary at the traversal (detached-sampling estimator:
    visibility/hit decisions carry no derivative; gradients flow through the
    shading evaluated AT the returned hit points). Also required mechanically:
    lax.while_loop traversal is not reverse-mode differentiable."""
    return jax.tree_util.tree_map(jax.lax.stop_gradient, x)


def _raw_intersect(geom: "Geometry", rays, sort: bool, order=None):
    _log_query(rays)
    if geom.has_motion:
        rays = rays._replace(time=_shutter_time01(geom, rays))
    if _use_pallas(geom):
        from ..ops import traverse_pallas as tp
        from ..accel.traverse import Hits
        if geom.attrp is not None:
            t, prim, b1, b2, rows = tp.intersect_rays(
                geom.packed, geom.perm, geom.world_bound[0],
                geom.world_bound[1],
                rays.o, rays.d, rays.tmin, rays.tmax, any_hit=False,
                sort=sort, order=order, interpret=FORCE_PALLAS_INTERPRET,
                time=rays.time if geom.has_motion else None,
                rows_table=geom.attrp)
            return Hits(t=t, prim=prim, b1=b1, b2=b2, rows=rows)
        t, prim, b1, b2 = tp.intersect_rays(
            geom.packed, geom.perm, geom.world_bound[0], geom.world_bound[1],
            rays.o, rays.d, rays.tmin, rays.tmax, any_hit=False, sort=sort,
            order=order, interpret=FORCE_PALLAS_INTERPRET,
            time=rays.time if geom.has_motion else None)
        return Hits(t=t, prim=prim, b1=b1, b2=b2)
    if geom.alt_kind == "grid":
        from ..accel import grid as grid_mod
        return grid_mod.intersect(geom.alt, rays)
    if geom.alt_kind == "kdtree":
        from ..accel import kdtree as kd_mod
        return kd_mod.intersect(geom.alt, rays)
    return cluster_mod.intersect(geom.cl, rays)


def _gather_mat3(geom: "Geometry", prim):
    """Per-hit triangle data (v0, e1, e2) as component gathers."""
    return (vm.gather3(geom.v0, prim), vm.gather3(geom.e1, prim),
            vm.gather3(geom.e2, prim))


ALPHA_ROUNDS = 4   # max cut-out layers pierced per query (static)


def _alpha_cut(geom: "Geometry", hits):
    """True where the hit lands on a zero-alpha texel of an alpha-masked
    face (triangle.dart:140-151 alphaMask rejection)."""
    from .. import textures as tex_mod
    prim = jnp.maximum(hits.prim, 0)
    tid = geom.alpha_tid[prim]
    b0 = 1.0 - hits.b1 - hits.b2
    uv0 = vm.V2(geom.uv[0].x[prim], geom.uv[0].y[prim])
    uv1 = vm.V2(geom.uv[1].x[prim], geom.uv[1].y[prim])
    uv2 = vm.V2(geom.uv[2].x[prim], geom.uv[2].y[prim])
    uv = vm.V2(uv0.x * b0 + uv1.x * hits.b1 + uv2.x * hits.b2,
               uv0.y * b0 + uv1.y * hits.b1 + uv2.y * hits.b2)
    it = {"uv": uv, "p": vm.v3zeros(jnp.shape(b0))}
    a = tex_mod.eval_or(geom.alpha_tex, tid, it, vm.v3ones(jnp.shape(b0)))
    return (hits.prim >= 0) & (tid >= 0) & (a.x < 1e-3)


def _shutter_time01(geom: "Geometry", rays):
    """Normalized [0,1] shutter time for the motion lerp (None if static)."""
    if not geom.has_motion:
        return None
    o_, c_ = geom.shutter
    return jnp.clip((rays.time - o_) / max(c_ - o_, 1e-9), 0.0, 1.0)


def intersect(geom: "Geometry", rays, sort: bool = True, order=None):
    """Closest-hit over the scene accelerator (Scene.intersect,
    lib/core/scene.dart:51). On TPU this runs the Pallas megakernel over a
    coherence-sorted wavefront; elsewhere the XLA packet traversal.
    `order`: precomputed coherence permutation (per-bounce sort sharing).

    Moving-geometry scenes traverse ONE shutter-union BVH whose leaf tests
    lerp vertices to each ray's time (continuous motion blur — no per-bin
    waves, no banding).

    Alpha-masked scenes run a static continuation loop: cut-out hits
    re-trace from just past the hit with every other lane dead (the sorted
    kernel short-circuits dead lanes, so continuation waves cost ~the cut
    fraction)."""
    geom = _detach(geom)
    rays = _detach(rays)
    order = None if order is None else jax.lax.stop_gradient(order)
    h = _raw_intersect(geom, rays, sort, order)
    if not geom.has_alpha:
        return h
    from ..accel.traverse import Hits
    cand = jnp.ones(h.t.shape, bool)
    for _ in range(ALPHA_ROUNDS - 1):
        cut = cand & _alpha_cut(geom, h)
        eps = ray_epsilon(h.t)
        cont = rays._replace(
            tmin=jnp.where(cut, h.t + eps, rays.tmin),
            tmax=jnp.where(cut, rays.tmax, -1.0))
        h2 = _raw_intersect(geom, cont, sort, order)
        h = Hits(t=jnp.where(cut, h2.t, h.t),
                 prim=jnp.where(cut, h2.prim, h.prim),
                 b1=jnp.where(cut, h2.b1, h.b1),
                 b2=jnp.where(cut, h2.b2, h.b2),
                 rows=(None if h.rows is None
                       else jnp.where(cut[None, :], h2.rows, h.rows)))
        cand = cut
    return h


def intersect_pair(geom: "Geometry", ext_rays, shadow_rays):
    """Closest-hit over ext_rays + any-hit over shadow_rays in ONE merged
    traversal launch (kernel v6 mixed mode): both sets originate at the
    same bounce hit points, so they share the coherence sort, the chunked
    dispatch and the scene residency — halving the path integrator's
    per-bounce launch count (VERDICT r5 #1a). Falls back to two separate
    launches off-TPU and for alpha/motion scenes (their continuation loops
    need the split form).

    Returns (Hits for ext_rays, occluded bool for shadow_rays)."""
    if (not _use_pallas(geom)) or geom.has_alpha:
        h = intersect(geom, ext_rays)
        occ = intersect_p(geom, shadow_rays)
        return h, occ
    _log_query(ext_rays)
    _log_query(shadow_rays)
    geom = _detach(geom)
    ext_rays = _detach(ext_rays)
    shadow_rays = _detach(shadow_rays)
    from ..ops import traverse_pallas as tp
    from ..accel.traverse import Hits
    t_e = t_s = None
    if geom.has_motion:
        t_e = _shutter_time01(geom, ext_rays)
        t_s = _shutter_time01(geom, shadow_rays)
    if geom.attrp is not None:
        t, prim, b1, b2, occ, rows = tp.intersect_rays_pair(
            geom.packed, geom.perm, geom.world_bound[0], geom.world_bound[1],
            ext_rays.o, ext_rays.d, ext_rays.tmin, ext_rays.tmax,
            shadow_rays.o, shadow_rays.d, shadow_rays.tmin, shadow_rays.tmax,
            interpret=FORCE_PALLAS_INTERPRET, time_e=t_e, time_s=t_s,
            rows_table=geom.attrp)
        return Hits(t=t, prim=prim, b1=b1, b2=b2, rows=rows), occ
    t, prim, b1, b2, occ = tp.intersect_rays_pair(
        geom.packed, geom.perm, geom.world_bound[0], geom.world_bound[1],
        ext_rays.o, ext_rays.d, ext_rays.tmin, ext_rays.tmax,
        shadow_rays.o, shadow_rays.d, shadow_rays.tmin, shadow_rays.tmax,
        interpret=FORCE_PALLAS_INTERPRET, time_e=t_e, time_s=t_s)
    return Hits(t=t, prim=prim, b1=b1, b2=b2), occ


def intersect_p(geom: "Geometry", rays, sort: bool = True, order=None):
    """Any-hit occlusion (Scene.intersectP, lib/core/scene.dart:60)."""
    _log_query(rays)
    geom = _detach(geom)
    rays = _detach(rays)
    order = None if order is None else jax.lax.stop_gradient(order)
    if geom.has_motion and not geom.has_alpha:
        rays = rays._replace(time=_shutter_time01(geom, rays))
    if not geom.has_alpha:
        if _use_pallas(geom):
            from ..ops import traverse_pallas as tp
            t, prim, _, _ = tp.intersect_rays(
                geom.packed, geom.perm, geom.world_bound[0],
                geom.world_bound[1],
                rays.o, rays.d, rays.tmin, rays.tmax, any_hit=True,
                sort=sort, order=order, interpret=FORCE_PALLAS_INTERPRET,
                time=rays.time if geom.has_motion else None)
            return prim >= 0
        if geom.alt_kind == "grid":
            from ..accel import grid as grid_mod
            return grid_mod.intersect_p(geom.alt, rays)
        if geom.alt_kind == "kdtree":
            from ..accel import kdtree as kd_mod
            return kd_mod.intersect_p(geom.alt, rays)
        return cluster_mod.intersect_p(geom.cl, rays)
    # alpha scenes: occlusion needs closest-hit + cutout continuation
    # (an any-hit blocker might be a zero-alpha texel)
    h = intersect(geom, rays, sort=sort, order=order)
    return h.prim >= 0


class SurfaceInteraction:
    """Namespace for deriving shading data from Hits (the TPU analog of
    DifferentialGeometry / Intersection, lib/core/differential_geometry.dart,
    intersection.dart:27-72) — all plain functions over SoA arrays."""


def shared_order(geom: Geometry, p, dead):
    """OBSOLETE (round 4): the traversal's coherence sort is now ONE fused
    multi-operand lax.sort inside intersect_rays, which costs less than a
    single apply-permutation gather did — per-bounce order sharing no
    longer pays. Kept returning None so existing call sites stay valid."""
    return None


def interaction(geom: Geometry, rays, hits, diffs=None):
    """Hits -> dict of SoA shading data for the hit points.

    Returns p/ng/ns/dpdu/dpdv/wo as V3, uv as V2, plus mat_id/light_id/
    prim/t/time (R,) — garbage-but-finite values on misses (callers mask by
    hits.hit). When camera ray differentials are given, also tex_duv
    (4-tuple of (R,)) and tex_width — the uv-space filter footprint for mip
    selection (DifferentialGeometry.computeDifferentials,
    differential_geometry.dart:computeDifferentials).
    """
    prim = jnp.maximum(hits.prim, 0)
    # ONE wide row gather fetches every per-face attribute (geometry,
    # precomputed ng/dpdu/dpdv, corner normals/uvs, ids) — a 262k-index
    # gather is index-bound on the v5e (~10 ms) regardless of row width,
    # so this replaces ~26 gathers at the same unit cost (r4 trace).
    # On the Pallas path the traversal finish already fetched the rows
    # (Hits.rows, combined finish+interaction gather) — reuse them free.
    rows = hits.rows if getattr(hits, "rows", None) is not None \
        else attr_rows(geom, prim)
    v0 = attr_v3(rows, 0)
    e1g = attr_v3(rows, 3)
    e2g = attr_v3(rows, 6)
    ng = attr_v3(rows, 9)
    dpdu = attr_v3(rows, 12)
    dpdv = attr_v3(rows, 15)
    if geom.has_motion:
        # moving geometry: the hit point comes from the ray (exact for the
        # returned t); uv/normals interpolate the shutter-start topology
        # (exact under translation, the anim-bluespheres class)
        p = rays.o + rays.d * jnp.minimum(hits.t, 1e30)
    else:
        p = v0 + e1g * hits.b1 + e2g * hits.b2
    b0 = 1.0 - hits.b1 - hits.b2
    vn0 = attr_v3(rows, 18)
    vn1 = attr_v3(rows, 21)
    vn2 = attr_v3(rows, 24)
    ns = vm.normalize(vn0 * b0 + vn1 * hits.b1 + vn2 * hits.b2)
    # shading normal must be in the same hemisphere as geometric
    # (Shape.getShadingGeometry convention)
    ns = vm.face_forward(ns, ng)
    uv = vm.V2(rows[27] * b0 + rows[29] * hits.b1 + rows[31] * hits.b2,
               rows[28] * b0 + rows[30] * hits.b1 + rows[32] * hits.b2)
    mat_id = jax.lax.bitcast_convert_type(rows[33], jnp.int32)
    light_id = jax.lax.bitcast_convert_type(rows[34], jnp.int32)
    out = dict(
        p=p, ng=ng, ns=ns, uv=uv, dpdu=dpdu, dpdv=dpdv,
        wo=-rays.d, mat_id=mat_id, light_id=light_id,
        prim=hits.prim, t=hits.t, time=rays.time)
    if diffs is not None:
        duv = _uv_footprint(p, ng, dpdu, dpdv, diffs)
        out["tex_duv"] = duv          # (dudx, dvdx, dudy, dvdy) of (R,)
        out["tex_width"] = jnp.maximum(
            jnp.maximum(jnp.abs(duv[0]), jnp.abs(duv[1])),
            jnp.maximum(jnp.abs(duv[2]), jnp.abs(duv[3])))
    return out


def _uv_footprint(p, ng, dpdu, dpdv, diffs):
    """Per-ray uv-space screen footprint: intersect the +1px x/y rays with
    the tangent plane, solve the 2x2 system for du/dv per axis, and return
    the (dudx, dvdx, dudy, dvdy) derivative tuple (computeDifferentials
    semantics, differential_geometry.dart) — both ellipse axes, feeding the
    anisotropic imagemap filter (mipmap.dart:226-340 lookup2 analog)."""
    def plane_hit(o, d):
        denom = vm.dot(d, ng)
        tt = vm.dot(p - o, ng) / jnp.where(jnp.abs(denom) < 1e-9, 1.0, denom)
        return o + d * tt

    dpdx = plane_hit(diffs.rx_o, diffs.rx_d) - p
    dpdy = plane_hit(diffs.ry_o, diffs.ry_d) - p
    # pick the two dominant axes of the normal's complement: component
    # selects instead of take_along_axis
    anx, any_, anz = jnp.abs(ng.x), jnp.abs(ng.y), jnp.abs(ng.z)
    x_big = (anx >= any_) & (anx >= anz)
    z_big = (anz > anx) & (anz > any_)
    # amax==0 -> axes (1,2); amax==2 -> axes (0,1); else (0,2)
    sel0 = lambda v: jnp.where(x_big, v.y, v.x)
    sel1 = lambda v: jnp.where(z_big, v.y, v.z)
    a00 = sel0(dpdu)
    a01 = sel0(dpdv)
    a10 = sel1(dpdu)
    a11 = sel1(dpdv)
    det = a00 * a11 - a01 * a10
    inv = 1.0 / jnp.where(jnp.abs(det) < 1e-12, 1.0, det)
    ok = jnp.abs(det) >= 1e-12

    def solve(b):
        b0, b1 = sel0(b), sel1(b)
        du = (a11 * b0 - a01 * b1) * inv
        dv = (-a10 * b0 + a00 * b1) * inv
        return jnp.where(ok, du, 0.0), jnp.where(ok, dv, 0.0)

    dudx, dvdx = solve(dpdx)
    dudy, dvdy = solve(dpdy)
    return (dudx, dvdx, dudy, dvdy)


def ray_epsilon(t):
    """Offset scale for secondary rays (intersection.dart rayEpsilon:
    1e-3 * tHit)."""
    return 1e-3 * jnp.maximum(t, 1e-4)
