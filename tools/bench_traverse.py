"""Traversal micro-benchmark on the real TPU: coherent vs incoherent rays,
parameter sweep over (PACKET, K, LEAF_BUF). Usage:
    python tools/bench_traverse.py [n_rays] [n_tris]
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax
import jax.numpy as jnp


def main():
    n_rays = int(sys.argv[1]) if len(sys.argv) > 1 else 262144
    n_tris = int(sys.argv[2]) if len(sys.argv) > 2 else 100_000

    from dartray_tpu.scene import mesh as mesh_mod
    from dartray_tpu.accel import bvh, cluster
    from dartray_tpu.core import math as vm

    nu = int(np.sqrt(n_tris))
    m = mesh_mod.sphere(radius=1.0, nu=nu, nv=max(nu // 2, 8))
    v0, e1, e2 = bvh.triangles_to_mt(m.verts, m.faces)
    print(f"tris={v0.shape[0]} rays={n_rays}", file=sys.stderr, flush=True)

    # coherent: camera-like grid from z=-3; incoherent: random sphere points
    g = int(np.sqrt(n_rays))
    ys, xs = np.meshgrid(np.linspace(-1.2, 1.2, g), np.linspace(-1.2, 1.2, g),
                         indexing="ij")
    o_c = np.stack([xs, ys, np.full_like(xs, -3.0)], -1).reshape(-1, 3)
    d_c = np.broadcast_to(np.array([0, 0, 1.0]), o_c.shape).copy()
    rng = np.random.default_rng(0)
    o_i = rng.uniform(-1.5, 1.5, (g * g, 3))
    d_i = rng.normal(size=(g * g, 3))
    d_i /= np.linalg.norm(d_i, axis=1, keepdims=True)

    def rays_of(o, d):
        return vm.make_rays(jnp.asarray(o, jnp.float32),
                            jnp.asarray(d, jnp.float32))

    results = []
    import json
    cfgs = json.loads(os.environ.get(
        "SWEEP", "[[128,64,4],[128,128,2],[128,256,2],[128,512,1],[256,128,2]]"))
    for (pk, kk, lb) in cfgs:
        cluster.PACKET = pk
        cluster.LEAF_BUF = lb
        t0 = time.time()
        cb = cluster.build(v0, e1, e2, k=kk)
        build_s = time.time() - t0
        fn = jax.jit(cluster.intersect)
        for name, (o, d) in [("coh", (o_c, d_c)), ("inc", (o_i, d_i))]:
            r = rays_of(o, d)
            h = fn(cb, r)
            jax.block_until_ready(h.t)     # compile
            t0 = time.time()
            reps = 3
            for _ in range(reps):
                h = fn(cb, r)
            jax.block_until_ready(h.t)
            dt = (time.time() - t0) / reps
            rs = o.shape[0] / dt
            hitfrac = float(jnp.mean((h.prim >= 0).astype(jnp.float32)))
            line = (f"P={pk} K={kk} LB={lb} {name}: {rs/1e6:.2f} Mrays/s "
                    f"(hit {hitfrac:.3f}, build {build_s:.1f}s)")
            print(line, flush=True)
            results.append(line)


if __name__ == "__main__":
    main()
