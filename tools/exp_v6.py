"""Focused v6 incoherent probe (LBUF/config experiments)."""
import os, sys, time
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import numpy as np, jax
jax.config.update("jax_compilation_cache_dir", os.path.expanduser("~/.cache/jax_comp_cache"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 2.0)
import jax.numpy as jnp
sys.argv_hack = None
import importlib
ew = importlib.import_module("tools.exp_wide") if False else None
from tools.exp_wide import build_geom, bounce_rays, camera_rays, bench
from dartray_tpu.ops import traverse_pallas as tp

def main():
    packed = jax.device_put(build_geom(100_000, k=32))
    r = 512 * 512
    tmin = jnp.zeros((r,), jnp.float32)
    tmax = jnp.full((r,), jnp.inf, jnp.float32)
    o, d = bounce_rays(r)
    o = jnp.asarray(o); d = jnp.asarray(d)
    order = tp.sort_order(o, d, tmin, tmax, jnp.asarray([-1.2]*3), jnp.asarray([1.2]*3))
    o, d = o[order], d[order]
    bench(tp.traverse6, packed, o, d, tmin, tmax, f"incoh v6 LBUF={tp.LBUF6}", block_rows=8)
    bench(tp.traverse6, packed, o, d, tmin, tmax, f"incoh v6 ANY LBUF={tp.LBUF6}", any_hit=True, block_rows=8)

if __name__ == "__main__":
    main()
