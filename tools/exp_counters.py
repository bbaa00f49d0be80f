"""Measure per-step and per-leaf-round costs of traverse3 on the real chip.

Runs 3 workloads (coherent / bounce+sort / escape+sort) with the counter
output, times each, then least-squares solves time = a*steps + b*leaves + c.
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax
import jax.numpy as jnp

from dartray_tpu.ops import traverse_pallas as tp
from exp_sweep import build, rays_coherent, rays_bounce, N_RAYS  # noqa: E402

K = int(os.environ.get("K", "64"))
BR = int(os.environ.get("BR", "8"))
packed, tris = build(K)
print(f"K={K} nodes={packed.n_nodes} clusters={packed.n_clusters}",
      flush=True)

workloads = {
    "coherent": rays_coherent(N_RAYS),
    "bounce": rays_bounce(N_RAYS, tris),
    "escape": rays_bounce(N_RAYS, tris, frac_inward=0.0, seed=2),
}

rows = []
for name, (o, d) in workloads.items():
    o = jnp.asarray(o)
    d = jnp.asarray(d)
    n = o.shape[0]
    tmin = jnp.zeros(n)
    tmax = jnp.full(n, jnp.inf)
    if name != "coherent":
        order = tp.sort_order(o, d, tmin, tmax, packed.bounds[0, 0:3],
                              packed.bounds[0, 3:6])
        o, d = o[order], d[order]
    f = jax.jit(lambda p, a, b, c, e: tp.traverse3(
        p, a, b, c, e, block_rows=BR, counters=True))
    t, prim, cnt = f(packed, o, d, tmin, tmax)
    jax.block_until_ready(t)
    t0 = time.time()
    reps = 3
    for _ in range(reps):
        t, prim, cnt = f(packed, o, d, tmin, tmax)
    jax.block_until_ready(t)
    dt = (time.time() - t0) / reps
    cnt = np.asarray(cnt)
    steps = cnt[:, 0, 0].astype(np.int64)
    leaves = cnt[:, 1, 0].astype(np.int64)
    nb = cnt.shape[0]
    print(f"{name}: {dt*1e3:.1f} ms, {n/dt/1e6:.2f} Mrays/s | "
          f"steps tot={steps.sum()} mean/blk={steps.mean():.0f} "
          f"max={steps.max()} | leaves tot={leaves.sum()} "
          f"mean/blk={leaves.mean():.0f} max={leaves.max()}", flush=True)
    rows.append((dt, steps.sum(), leaves.sum(), nb))

A = np.array([[s, l, nb] for (_, s, l, nb) in rows], np.float64)
y = np.array([dt for (dt, _, _, _) in rows])
coef, *_ = np.linalg.lstsq(A, y, rcond=None)
print(f"per-step: {coef[0]*1e9:.0f} ns, per-leaf-round: {coef[1]*1e9:.0f} ns, "
      f"per-block fixed: {coef[2]*1e6:.1f} us")
