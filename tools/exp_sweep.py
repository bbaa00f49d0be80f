"""One-process kernel sweep: build scene once per K, run all variants.

Usage: python tools/exp_sweep.py [n_tris]
Env: KS=64,128  VS=3,4  BRS=8,16  REPS=3  RAYS=262144
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax
import jax.numpy as jnp

from dartray_tpu.scene import mesh as mesh_mod
from dartray_tpu.accel import bvh, cluster
from dartray_tpu.ops import traverse_pallas as tp

N_TRIS = int(sys.argv[1]) if len(sys.argv) > 1 else 100_000
KS = [int(x) for x in os.environ.get("KS", "64,128").split(",")]
VS = [int(x) for x in os.environ.get("VS", "3,4").split(",")]
BRS = [int(x) for x in os.environ.get("BRS", "8,16").split(",")]
REPS = int(os.environ.get("REPS", "3"))
N_RAYS = int(os.environ.get("RAYS", "262144"))
FNS = {1: tp.traverse, 2: tp.traverse2, 3: tp.traverse3, 4: tp.traverse4}


def build(k):
    nu = max(int(np.sqrt(N_TRIS)), 8)
    m = mesh_mod.sphere(radius=1.0, nu=nu, nv=max(nu // 2, 8))
    v0, e1, e2 = bvh.triangles_to_mt(m.verts, m.faces)
    cb = cluster.build(v0, e1, e2, k=k)
    packed, perm = tp.pack(np.asarray(cb.node_lo), np.asarray(cb.node_hi),
                           np.asarray(cb.node_child), np.asarray(cb.node_axis),
                           np.asarray(cb.tri_v0), np.asarray(cb.tri_e1),
                           np.asarray(cb.tri_e2), np.asarray(cb.tri_id))
    return packed, (v0, e1, e2)


def rays_coherent(n):
    g = int(np.sqrt(n))
    ys, xs = np.meshgrid(np.linspace(-1.2, 1.2, g),
                         np.linspace(-1.2, 1.2, g), indexing="ij")
    o = np.stack([xs, ys, np.full_like(xs, -3.0)], -1).reshape(-1, 3)
    d = np.broadcast_to(np.array([0, 0, 1.0]), o.shape).copy()
    return o.astype(np.float32), d.astype(np.float32)


def rays_bounce(n, tris, frac_inward=0.5, seed=1):
    """Surface-origin hemisphere rays (bounce-ray stand-in)."""
    v0, e1, e2 = tris
    rng = np.random.default_rng(seed)
    area2 = np.linalg.norm(np.cross(e1, e2), axis=1)
    good = np.nonzero(area2 > 1e-12)[0]
    idx = good[rng.integers(0, good.shape[0], n)]
    b1 = rng.uniform(0, 1, n)
    b2 = rng.uniform(0, 1, n)
    ov = b1 + b2 > 1
    b1[ov] = 1 - b1[ov]
    b2[ov] = 1 - b2[ov]
    o = v0[idx] + e1[idx] * b1[:, None] + e2[idx] * b2[:, None]
    nrm = np.cross(e1[idx], e2[idx])
    nrm /= np.linalg.norm(nrm, axis=1, keepdims=True)
    d = rng.normal(size=(n, 3))
    d /= np.linalg.norm(d, axis=1, keepdims=True)
    flip = (d * nrm).sum(1, keepdims=True) < 0
    d = np.where(flip, -d, d)
    inward = rng.uniform(size=(n, 1)) < frac_inward
    d = np.where(inward, -d, d)
    o = o + np.where(inward, -1, 1) * nrm * 1e-3
    return o.astype(np.float32), d.astype(np.float32)


def run(name, fn, packed, o, d, br, sort, any_hit=False):
    o = jnp.asarray(o)
    d = jnp.asarray(d)
    n = o.shape[0]
    tmin = jnp.zeros(n)
    tmax = jnp.full(n, jnp.inf)
    if sort:
        lo = packed.bounds[0, 0:3]
        hi = packed.bounds[0, 3:6]
        order = tp.sort_order(o, d, tmin, tmax, lo, hi)
        o, d = o[order], d[order]
    f = jax.jit(lambda p, a, b, c, e: fn(p, a, b, c, e, block_rows=br,
                                         any_hit=any_hit))
    t0 = time.time()
    try:
        t, prim = f(packed, o, d, tmin, tmax)
        jax.block_until_ready(t)
    except Exception as ex:
        print(f"{name}: FAIL {type(ex).__name__} {str(ex)[:120]}", flush=True)
        return
    comp = time.time() - t0
    t0 = time.time()
    for _ in range(REPS):
        t, prim = f(packed, o, d, tmin, tmax)
    jax.block_until_ready(t)
    dt = (time.time() - t0) / REPS
    hitf = float(jnp.mean((prim >= 0).astype(jnp.float32)))
    print(f"{name}: {n/dt/1e6:6.2f} Mrays/s (hit {hitf:.3f}, "
          f"compile {comp:.1f}s)", flush=True)


for k in KS:
    packed, tris = build(k)
    print(f"--- K={k}: tris={packed.n_clusters*packed.k} "
          f"nodes={packed.n_nodes}", flush=True)
    oc, dc = rays_coherent(N_RAYS)
    ob, db = rays_bounce(N_RAYS, tris)
    oe, de = rays_bounce(N_RAYS, tris, frac_inward=0.0, seed=2)
    for v in VS:
        for br in BRS:
            run(f"V{v} K{k} BR{br} coherent    ", FNS[v], packed, oc, dc,
                br, sort=False)
            run(f"V{v} K{k} BR{br} bounce+sort ", FNS[v], packed, ob, db,
                br, sort=True)
            run(f"V{v} K{k} BR{br} escape+sort ", FNS[v], packed, oe, de,
                br, sort=True)
