"""Validate + time the Pallas traverse kernel.

Usage:
  JAX_PLATFORMS=cpu python tools/exp_traverse_pallas.py check   # interpret vs oracle
  python tools/exp_traverse_pallas.py bench [n_rays] [n_tris]   # real TPU timing
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

mode = sys.argv[1] if len(sys.argv) > 1 else "check"
if mode == "check":
    os.environ["JAX_PLATFORMS"] = "cpu"

import numpy as np
import jax
if mode == "check":
    jax.config.update("jax_platforms", "cpu")
import jax.numpy as jnp


def build_packed(n_tris, k=32):
    from dartray_tpu.scene import mesh as mesh_mod
    from dartray_tpu.accel import bvh, cluster
    from dartray_tpu.ops import traverse_pallas as tp

    nu = max(int(np.sqrt(n_tris)), 8)
    m = mesh_mod.sphere(radius=1.0, nu=nu, nv=max(nu // 2, 8))
    v0, e1, e2 = bvh.triangles_to_mt(m.verts, m.faces)
    cb = cluster.build(v0, e1, e2, k=k)
    packed, perm = tp.pack(np.asarray(cb.node_lo), np.asarray(cb.node_hi),
                           np.asarray(cb.node_child), np.asarray(cb.node_axis),
                           np.asarray(cb.tri_v0), np.asarray(cb.tri_e1),
                           np.asarray(cb.tri_e2), np.asarray(cb.tri_id))
    return cb, packed, perm, (v0, e1, e2)


def gen_rays(n, seed=0, coherent=False):
    g = int(np.sqrt(n))
    if coherent:
        ys, xs = np.meshgrid(np.linspace(-1.2, 1.2, g),
                             np.linspace(-1.2, 1.2, g), indexing="ij")
        o = np.stack([xs, ys, np.full_like(xs, -3.0)], -1).reshape(-1, 3)
        d = np.broadcast_to(np.array([0, 0, 1.0]), o.shape).copy()
    else:
        rng = np.random.default_rng(seed)
        o = rng.uniform(-1.5, 1.5, (g * g, 3))
        d = rng.normal(size=(g * g, 3))
        d /= np.linalg.norm(d, axis=1, keepdims=True)
    return (jnp.asarray(o, jnp.float32), jnp.asarray(d, jnp.float32))


def check():
    from dartray_tpu.ops import traverse_pallas as tp
    from dartray_tpu.accel import cluster
    from dartray_tpu.core import math as vm

    cb, packed, perm, _ = build_packed(int(os.environ.get("NT", "900")), k=int(os.environ.get("K", "16")))
    print(f"tris(C*K)={packed.n_clusters * packed.k} nodes={packed.n_nodes}")
    for coh in (True, False):
        o, d = gen_rays(int(os.environ.get("NR", "1024")), coherent=coh)
        tmin = jnp.zeros(o.shape[0])
        tmax = jnp.full(o.shape[0], jnp.inf)
        t, prim = tp.traverse(packed, o, d, tmin, tmax, interpret=True,
                              block_rows=2)
        # oracle: existing XLA cluster traversal
        rays = vm.make_rays(o, d)
        h = cluster.intersect(cb, rays)
        prim_orig = jnp.where(prim >= 0, jnp.asarray(perm)[jnp.maximum(prim, 0)], -1)
        hit_match = np.mean(np.asarray((prim_orig >= 0) == (h.prim >= 0)))
        both = np.asarray((prim_orig >= 0) & (h.prim >= 0))
        t_err = np.abs(np.asarray(t) - np.asarray(h.t))[both]
        pm = np.mean(np.asarray(prim_orig)[both] == np.asarray(h.prim)[both])
        print(f"coh={coh}: hit-agree={hit_match:.4f} prim-agree={pm:.4f} "
              f"max|dt|={t_err.max() if both.any() else 0:.2e}")
        assert hit_match == 1.0, "hit mask mismatch"
        assert t_err.max() < 1e-3
        # any-hit
        ta, pa = tp.traverse(packed, o, d, tmin, tmax, interpret=True,
                             block_rows=2, any_hit=True)
        assert np.array_equal(np.asarray(pa >= 0), np.asarray(h.prim >= 0))
        # v2
        t2, prim2 = tp.traverse2(packed, o, d, tmin, tmax, interpret=True,
                                 block_rows=2)
        prim2o = jnp.where(prim2 >= 0, jnp.asarray(perm)[jnp.maximum(prim2, 0)], -1)
        hm2 = np.mean(np.asarray((prim2o >= 0) == (h.prim >= 0)))
        t2e = np.abs(np.asarray(t2) - np.asarray(h.t))[both]
        print(f"v2 coh={coh}: hit-agree={hm2:.4f} max|dt|={t2e.max() if both.any() else 0:.2e}")
        assert hm2 == 1.0 and t2e.max() < 1e-3
        ta2, pa2 = tp.traverse2(packed, o, d, tmin, tmax, interpret=True,
                                block_rows=2, any_hit=True)
        assert np.array_equal(np.asarray(pa2 >= 0), np.asarray(h.prim >= 0))
        # v3 / v4 (leaf-buffered + packed fold; t matches to ~127 ulps)
        for name, fn in (("v3", tp.traverse3), ("v4", tp.traverse4)):
            t3, prim3 = fn(packed, o, d, tmin, tmax, interpret=True,
                           block_rows=2)
            p3o = jnp.where(prim3 >= 0,
                            jnp.asarray(perm)[jnp.maximum(prim3, 0)], -1)
            hm3 = np.mean(np.asarray((p3o >= 0) == (h.prim >= 0)))
            t3e = np.abs(np.asarray(t3) - np.asarray(h.t))[both]
            print(f"{name} coh={coh}: hit-agree={hm3:.4f} "
                  f"max|dt|={t3e.max() if both.any() else 0:.2e}")
            assert hm3 == 1.0 and t3e.max() < 1e-3
            ta3, pa3 = fn(packed, o, d, tmin, tmax, interpret=True,
                          block_rows=2, any_hit=True)
            assert np.array_equal(np.asarray(pa3 >= 0),
                                  np.asarray(h.prim >= 0))
    print("CHECK OK")


def bench():
    from dartray_tpu.ops import traverse_pallas as tp

    n_rays = int(sys.argv[2]) if len(sys.argv) > 2 else 262144
    n_tris = int(sys.argv[3]) if len(sys.argv) > 3 else 100_000
    k = int(os.environ.get("K", "32"))
    cb, packed, perm, _ = build_packed(n_tris, k=k)
    print(f"tris={packed.n_clusters * packed.k} nodes={packed.n_nodes} k={k}")
    for br in [int(x) for x in os.environ.get("BR", "4,8,16").split(",")]:
        for coh in (True, False):
            o, d = gen_rays(n_rays, coherent=coh)
            tmin = jnp.zeros(o.shape[0])
            tmax = jnp.full(o.shape[0], jnp.inf)
            ver = {"1": tp.traverse, "2": tp.traverse2, "3": tp.traverse3,
                   "4": tp.traverse4}[os.environ.get("V", "1")]
            fn = jax.jit(lambda p, o, d, a, b: ver(
                p, o, d, a, b, block_rows=br))
            try:
                t0 = time.time()
                t, prim = fn(packed, o, d, tmin, tmax)
                jax.block_until_ready(t)
                compile_s = time.time() - t0
                t0 = time.time()
                reps = 5
                for _ in range(reps):
                    t, prim = fn(packed, o, d, tmin, tmax)
                jax.block_until_ready(t)
                dt = (time.time() - t0) / reps
                hitf = float(jnp.mean((prim >= 0).astype(jnp.float32)))
                print(f"BR={br} coh={coh}: {n_rays/dt/1e6:.2f} Mrays/s "
                      f"(hit {hitf:.3f}, compile {compile_s:.1f}s)", flush=True)
            except Exception as e:
                print(f"BR={br} coh={coh}: FAIL {type(e).__name__}: "
                      f"{str(e)[:200]}", flush=True)


def bench_sorted():
    """Secondary-ray realism: rays from surface points, sorted by octant+morton."""
    from dartray_tpu.ops import traverse_pallas as tp

    n_rays = 262144
    k = int(os.environ.get("K", "32"))
    cb, packed, perm, (v0, e1, e2) = build_packed(100_000, k=k)
    rng = np.random.default_rng(1)
    # origins on the sphere surface (like bounce rays), cosine-ish dirs
    area2 = np.linalg.norm(np.cross(e1, e2), axis=1)
    good = np.nonzero(area2 > 1e-12)[0]
    idx = good[rng.integers(0, good.shape[0], n_rays)]
    b1 = rng.uniform(0, 1, n_rays); b2 = rng.uniform(0, 1, n_rays)
    ov = b1 + b2 > 1; b1[ov] = 1 - b1[ov]; b2[ov] = 1 - b2[ov]
    o = v0[idx] + e1[idx] * b1[:, None] + e2[idx] * b2[:, None]
    n = np.cross(e1[idx], e2[idx]); n /= np.linalg.norm(n, axis=1, keepdims=True)
    d = rng.normal(size=(n_rays, 3)); d /= np.linalg.norm(d, axis=1, keepdims=True)
    # half bounce INTO the sphere interior (guaranteed re-hit), half escape
    flip = (d * n).sum(1, keepdims=True) < 0
    d = np.where(flip, -d, d)
    inward = rng.uniform(size=(n_rays, 1)) < 0.5
    d = np.where(inward, -d, d)
    o = o + np.where(inward, -1, 1) * n * 1e-3

    def key_of(o, d):
        oct_ = (d[:, 0] < 0) * 1 + (d[:, 1] < 0) * 2 + (d[:, 2] < 0) * 4
        lo = o.min(0); hi = o.max(0)
        q = np.clip(((o - lo) / np.maximum(hi - lo, 1e-9) * 1023), 0, 1023).astype(np.int64)
        def spread(x):
            x = (x | (x << 16)) & 0x030000FF
            x = (x | (x << 8)) & 0x0300F00F
            x = (x | (x << 4)) & 0x030C30C3
            x = (x | (x << 2)) & 0x09249249
            return x
        m = spread(q[:, 0]) | (spread(q[:, 1]) << 1) | (spread(q[:, 2]) << 2)
        return (oct_.astype(np.int64) << 30) | m

    for sort in (False, True):
        oo, dd = o, d
        if sort:
            srt = np.argsort(key_of(o, d), kind="stable")
            oo, dd = o[srt], d[srt]
        oj = jnp.asarray(oo, jnp.float32); dj = jnp.asarray(dd, jnp.float32)
        tmin = jnp.zeros(n_rays); tmax = jnp.full(n_rays, jnp.inf)
        for br in [int(x) for x in os.environ.get("BR", "8,16,32").split(",")]:
            ver = {"1": tp.traverse, "2": tp.traverse2, "3": tp.traverse3,
                   "4": tp.traverse4}[os.environ.get("V", "1")]
            fn = jax.jit(lambda p, a, b, c, e: ver(p, a, b, c, e, block_rows=br))
            t, prim = fn(packed, oj, dj, tmin, tmax)
            jax.block_until_ready(t)
            t0 = time.time(); reps = 5
            for _ in range(reps):
                t, prim = fn(packed, oj, dj, tmin, tmax)
            jax.block_until_ready(t)
            dt = (time.time() - t0) / reps
            hitf = float(jnp.mean((prim >= 0).astype(jnp.float32)))
            print(f"sorted={sort} BR={br}: {n_rays/dt/1e6:.2f} Mrays/s (hit {hitf:.3f})",
                  flush=True)


if __name__ == "__main__":
    {"check": check, "bench": bench, "sorted": bench_sorted}[mode]()
