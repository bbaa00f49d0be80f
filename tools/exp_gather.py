"""TPU gather microbench: scalar component gathers vs packed row gathers.

The r4 wave trace shows ~70 fusions of ~10-16 ms each dominated by 1D
gathers (f32[F] indexed by s32[R], R=262k, F=148k) — the component-SoA
attribute fetches (finish_hits, interaction, eval_params). This measures
alternatives:
  - N separate (R,) gathers from (F,) tables           (current)
  - one row gather from (F, W) then column slices      (packed rows)
  - sorted vs random indices
Chained timing with a closing readback (see exp_mxu.py trap notes).

Usage: python tools/exp_gather.py
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
F = 148512


def bench(fn, args_list, label, iters=12):
    out = fn(*args_list[-1])
    jax.block_until_ready(out)
    _ = float(jnp.sum(out[:8]) if out.ndim == 1 else jnp.sum(out[:8, 0]))
    t0 = time.time()
    prev = None
    for i in range(iters):
        a = list(args_list[i % (len(args_list) - 1)])
        if prev is not None:
            # chain: bias the indices by 0 * f(prev) to serialize
            dep = (jnp.clip(prev[:4], 0, 1).sum() * 0).astype(jnp.int32) \
                if prev.dtype != jnp.int32 else prev[:4].sum() * 0
            a[-1] = a[-1] + dep
        out = fn(*a)
        prev = out if out.ndim == 1 else out[:, 0]
        del out
    jax.block_until_ready(prev)
    _ = float(jnp.sum(prev[:8]))
    dt = (time.time() - t0) / iters
    print(f"{label:44s} {dt * 1e3:8.2f} ms", flush=True)
    return dt


def main():
    rng = np.random.RandomState(0)
    idx_rand = jnp.asarray(rng.randint(0, F, R).astype(np.int32))
    idx_sort = jnp.asarray(np.sort(np.asarray(idx_rand)))
    tables1 = [jnp.asarray(rng.randn(F).astype(np.float32))
               for _ in range(9)]
    for w in (8, 16, 32):
        globals()[f"table_{w}"] = jnp.asarray(
            rng.randn(F, w).astype(np.float32))

    g1 = jax.jit(lambda t, i: t[i])
    g9 = jax.jit(lambda t0, t1, t2, t3, t4, t5, t6, t7, t8, i:
                 sum(t[i] for t in (t0, t1, t2, t3, t4, t5, t6, t7, t8)))
    grow = jax.jit(lambda t, i: t[i])          # (F, W) rows
    growsum = jax.jit(lambda t, i: t[i].sum(axis=-1))

    var = lambda base: [(t, base) for t in tables1[:6]] + [(tables1[6], base)]
    bench(g1, var(idx_rand), "1x (R,) gather, random idx")
    bench(g1, var(idx_sort), "1x (R,) gather, sorted idx")
    bench(g9, [(tuple(tables1) + (idx_rand,))[0:10]] * 7,
          "9x (R,) gathers fused, random idx")
    for w in (8, 16, 32):
        t = globals()[f"table_{w}"]
        bench(grow, [(t, idx_rand)] * 7, f"1x (F,{w}) row gather, random")
        bench(growsum, [(t, idx_rand)] * 7,
              f"1x (F,{w}) row gather + reduce, random")


if __name__ == "__main__":
    main()
