"""A/B the v6 scalar push-loop cost: DR_V6_SCALARX=1 vs 2 (set by caller).
Times v6 closest-hit on coherent + sorted-incoherent rays only.
Usage: DR_V6_SCALARX=N python tools/exp_scalarx.py [n_tris]
"""
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp

jax.config.update("jax_compilation_cache_dir",
                  os.path.expanduser("~/.cache/jax_comp_cache"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 2.0)

from exp_wide import build_geom, camera_rays, bounce_rays, bench  # noqa: E402


def main():
    n_tris = int(sys.argv[1]) if len(sys.argv) > 1 else 100_000
    r = 512 * 512
    from dartray_tpu.ops import traverse_pallas as tp
    print(f"SCALARX={tp._V6_SCALARX}", flush=True)
    packed = jax.device_put(build_geom(n_tris, k=32))
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
        bf = os.environ.get("DR_BF16", "") == "1"
        for rep in range(2):       # rep 0 = tunnel warm-up, report rep 1
            bench(tp.traverse6, packed, o, d, tmin, tmax,
                  f"{nm} v6 x{tp._V6_SCALARX}{' bf16' if bf else ''} "
                  f"rep{rep}", block_rows=8, bf16=bf)


if __name__ == "__main__":
    main()
