"""Wavefront permutation strategies (the sorted-traversal wrapper cost).

The r4 trace shows the sort/unsort PERMUTATION dominates the sorted
traversal wrapper: 8 apply-permutation gathers + 2 unsort scatters per
call at ~10-16 ms each. Candidates measured here (R = 262144):

  a) argsort key + 8 separate (R,) gathers + 2 (R,) scatters   (current)
  b) argsort key + one (R, 8) row gather + column unpack + row scatter
  c) ONE multi-operand jax.lax.sort carrying all 8 planes + iota
     (sorts data in the same op; unsort still 2 scatters)

Chained timing, closing readback (exp_mxu.py trap notes).
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax

jax.config.update("jax_compilation_cache_dir",
                  os.path.expanduser("~/.cache/jax_comp_cache"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 2.0)

import jax.numpy as jnp

R = 262144


def bench(fn, mk_args, label, iters=10):
    out = fn(*mk_args(0))
    jax.block_until_ready(out)
    _ = float(jnp.sum(out[0][:8]))
    t0 = time.time()
    prev = out[0]
    for i in range(iters):
        a = mk_args(i + 1)
        bias = jnp.clip(prev[:4], 0, 1).sum() * 0.0
        a = (a[0] + bias,) + a[1:]
        out = fn(*a)
        prev = out[0]
    jax.block_until_ready(prev)
    _ = float(jnp.sum(prev[:8]))
    dt = (time.time() - t0) / iters
    print(f"{label:52s} {dt * 1e3:8.2f} ms", flush=True)


def main():
    rng = np.random.RandomState(0)
    planes = [jnp.asarray(rng.randn(R).astype(np.float32))
              for _ in range(8)]
    key = jnp.asarray(rng.randint(0, 1 << 21, R).astype(np.int32))

    def mk(i):
        return (planes[0], key + i % 3)

    @jax.jit
    def strat_a(p0, key):
        order = jnp.argsort(key)
        ps = [p0[order]] + [p[order] for p in planes[1:]]
        t = ps[0] * 1.0
        prim = (ps[1] > 0).astype(jnp.int32)
        t_u = jnp.zeros((R,), jnp.float32).at[order].set(t)
        p_u = jnp.full((R,), -1, jnp.int32).at[order].set(prim)
        return t_u + sum(ps[2:]) * 1e-30, p_u

    @jax.jit
    def strat_b(p0, key):
        order = jnp.argsort(key)
        packed = jnp.stack([p0] + planes[1:], axis=-1)     # (R, 8)
        rows = packed[order]                                # row gather
        ps = [rows[:, i] for i in range(8)]
        t = ps[0] * 1.0
        prim = (ps[1] > 0).astype(jnp.int32)
        t_u = jnp.zeros((R,), jnp.float32).at[order].set(t)
        p_u = jnp.full((R,), -1, jnp.int32).at[order].set(prim)
        return t_u + sum(ps[2:]) * 1e-30, p_u

    @jax.jit
    def strat_c(p0, key):
        iota = jnp.arange(R, dtype=jnp.int32)
        sorted_all = jax.lax.sort(
            [key, iota, p0] + planes[1:], num_keys=1)
        order = sorted_all[1]
        ps = sorted_all[2:]
        t = ps[0] * 1.0
        prim = (ps[1] > 0).astype(jnp.int32)
        t_u = jnp.zeros((R,), jnp.float32).at[order].set(t)
        p_u = jnp.full((R,), -1, jnp.int32).at[order].set(prim)
        return t_u + sum(ps[2:]) * 1e-30, p_u

    @jax.jit
    def sort_only(p0, key):
        return (jnp.argsort(key).astype(jnp.float32) + p0 * 1e-30,)

    bench(sort_only, mk, "argsort alone")
    bench(strat_a, mk, "a) argsort + 8 gathers + 2 scatters")
    bench(strat_b, mk, "b) argsort + (R,8) row gather + 2 scatters")
    bench(strat_c, mk, "c) multi-operand lax.sort + 2 scatters")


if __name__ == "__main__":
    main()
