"""On-chip A/B: wide (v5) vs binary (v3/v4) traversal kernels.

Usage: python tools/exp_wide.py [n_tris] [--rays R]
Builds the bench displaced-sphere scene shape, times closest-hit + any-hit
on (a) coherent camera-style rays, (b) sorted bounce-style rays.
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax
import jax.numpy as jnp

jax.config.update("jax_compilation_cache_dir",
                  os.path.expanduser("~/.cache/jax_comp_cache"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 2.0)


def build_geom(n_tris, k=32):
    from dartray_tpu.scene import mesh as mesh_mod
    from dartray_tpu.accel import bvh as bvh_mod, cluster
    from dartray_tpu.ops import traverse_pallas as tp
    nu = int(np.sqrt(n_tris))
    nv = max(nu // 2, 8)
    m = mesh_mod.sphere(radius=1.0, nu=nu, nv=nv)
    v = m.verts.astype(np.float64)
    disp = (0.08 * np.sin(7 * v[:, 0]) * np.cos(5 * v[:, 1])
            + 0.05 * np.sin(11 * v[:, 2] + 3 * v[:, 0]))
    n = v / np.maximum(np.linalg.norm(v, axis=-1, keepdims=True), 1e-9)
    m.verts = (v + n * disp[:, None]).astype(np.float32)
    v0, e1, e2 = bvh_mod.triangles_to_mt(m.verts, m.faces)
    t0 = time.time()
    cb = cluster.build(v0, e1, e2, k=k)
    t1 = time.time()
    packed, perm = tp.pack(cb.node_lo, cb.node_hi, cb.node_child,
                           cb.node_axis, cb.tri_v0, cb.tri_e1, cb.tri_e2,
                           cb.tri_id)
    t2 = time.time()
    print(f"tris={v0.shape[0]} build={t1-t0:.2f}s pack(+wide)={t2-t1:.2f}s "
          f"nodes={packed.n_nodes} wnodes={packed.n_wnodes} "
          f"clusters={packed.n_clusters} k={k}", flush=True)
    return packed


def camera_rays(r):
    # pinhole at (0,0,-2.5) looking at the unit sphere; most rays hit
    rng = np.random.RandomState(0)
    side = int(np.sqrt(r))
    xs, ys = np.meshgrid(np.linspace(-0.5, 0.5, side),
                         np.linspace(-0.5, 0.5, side))
    d = np.stack([xs.reshape(-1), ys.reshape(-1),
                  np.ones(side * side)], -1).astype(np.float32)
    d = np.concatenate([d, d[:max(0, r - d.shape[0])]])[:r]
    d /= np.linalg.norm(d, axis=-1, keepdims=True)
    o = np.broadcast_to(np.asarray([0, 0, -2.5], np.float32), (r, 3)).copy()
    return o, d


def bounce_rays(r):
    # random origins near the surface, random dirs (incoherent)
    rng = np.random.RandomState(1)
    o = rng.randn(r, 3).astype(np.float32)
    o /= np.linalg.norm(o, axis=-1, keepdims=True)
    o *= 1.05
    d = rng.randn(r, 3).astype(np.float32)
    d /= np.linalg.norm(d, axis=-1, keepdims=True)
    return o, d


def bench(fn, packed, o, d, tmin, tmax, label, iters=16, **kw):
    """CHAINED timing: each call's tmax depends on the previous call's
    output, forcing sequential execution; ONE scalar readback at the end
    closes the chain. Amortizes the ~60 ms tunnel readback latency AND
    defeats both axon traps (identical-execution coalescing; lazy
    execution under bare block_until_ready — see tools/exp_mxu.py)."""
    t, p = fn(packed, o, d, tmin, tmax, **kw)
    jax.block_until_ready((t, p))
    _ = float(jnp.sum(t[:128]))          # prime the executable

    def chain_dep(t_prev):
        return jnp.sum(jnp.clip(t_prev[:8], 0.0, 1.0)) * 0.0

    t0 = time.time()
    for i in range(iters):
        t, p = fn(packed, o, d, tmin, tmax + chain_dep(t) + 1e-7 * i, **kw)
    jax.block_until_ready((t, p))
    _ = float(jnp.sum(t[:128]))
    dt = (time.time() - t0) / iters
    r = o.shape[0]
    print(f"{label:34s} {r/dt/1e6:8.2f} Mrays/s  ({dt*1e3:6.2f} ms, "
          f"hit {float((np.asarray(p)>=0).mean()):.3f})", flush=True)
    return r / dt


def main():
    n_tris = int(sys.argv[1]) if len(sys.argv) > 1 else 100_000
    r = 512 * 512
    from dartray_tpu.ops import traverse_pallas as tp
    for k in ([8, 16, 32] if "--k" not in sys.argv else
              [int(sys.argv[sys.argv.index("--k") + 1])]):
        packed = jax.device_put(build_geom(n_tris, k=k))
        tmin = jnp.zeros((r,), jnp.float32)
        tmax = jnp.full((r,), jnp.inf, jnp.float32)
        for nm, (o, d) in (("coherent", camera_rays(r)),
                           ("incoherent-sorted", bounce_rays(r))):
            o = jnp.asarray(o)
            d = jnp.asarray(d)
            if nm.startswith("incoherent"):
                order = tp.sort_order(o, d, tmin, tmax,
                                      jnp.asarray([-1.2] * 3),
                                      jnp.asarray([1.2] * 3))
                o, d = o[order], d[order]
            for which, fn in (("v5", tp.traverse5), ("v6", tp.traverse6),
                              ("v7", tp.traverse7)):
                for br in (8, 16, 32):
                    if which in ("v4", "v6") and br != 8:
                        continue
                    bench(fn, packed, o, d, tmin, tmax,
                          f"k{k} {nm} {which} rows={br}", block_rows=br)
                bench(fn, packed, o, d, tmin, tmax,
                      f"k{k} {nm} {which} rows=8 ANY", any_hit=True,
                      block_rows=8)


if __name__ == "__main__" and not (len(sys.argv) > 1 and sys.argv[1] == "counters"):
    main()


def counters_run():
    """v5 step/leaf-round counters on coherent + incoherent sets."""
    n_tris = 100_000
    from dartray_tpu.ops import traverse_pallas as tp
    packed = jax.device_put(build_geom(n_tris, k=32))
    r = 512 * 512
    tmin = jnp.zeros((r,), jnp.float32)
    tmax = jnp.full((r,), jnp.inf, jnp.float32)
    for nm, (o, d) in (("coherent", camera_rays(r)),
                       ("incoherent-sorted", bounce_rays(r))):
        o = jnp.asarray(o)
        d = jnp.asarray(d)
        if nm.startswith("incoherent"):
            order = tp.sort_order(o, d, tmin, tmax,
                                  jnp.asarray([-1.2] * 3),
                                  jnp.asarray([1.2] * 3))
            o, d = o[order], d[order]
        t, p, cnt = tp.traverse5(packed, o, d, tmin, tmax, counters=True)
        cnt = np.asarray(cnt)
        steps = cnt[:, 0, 0].astype(np.float64)
        leafs = cnt[:, 1, 0].astype(np.float64)
        print(f"{nm}: blocks={cnt.shape[0]} steps/blk mean={steps.mean():.0f}"
              f" p95={np.percentile(steps,95):.0f}"
              f" leafrounds/blk mean={leafs.mean():.0f}"
              f" p95={np.percentile(leafs,95):.0f}", flush=True)


if len(sys.argv) > 1 and sys.argv[1] == "counters":
    counters_run()
    sys.exit(0)
