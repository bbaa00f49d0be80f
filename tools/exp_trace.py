"""Device-side wave breakdown via the JAX profiler (Perfetto trace).

Host wall-clock over the axon tunnel is unreliable (see exp_mxu.py's
block_until_ready note); the profiler's device timeline is authoritative.
Runs warm bench waves under jax.profiler.trace and aggregates device op
durations by bucket: pallas traversal kernels, sorts, scatters (film/unsort),
gathers, fusions (shade chains), everything else.

Usage: python tools/exp_trace.py [n_waves]
"""
import glob
import gzip
import json
import os
import sys
import time
from collections import defaultdict
from functools import partial

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax

jax.config.update("jax_compilation_cache_dir",
                  os.path.expanduser("~/.cache/jax_comp_cache"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 2.0)

import jax.numpy as jnp


def main():
    n_waves = int(sys.argv[1]) if len(sys.argv) > 1 else 2
    import importlib
    bench = importlib.import_module("bench")
    from dartray_tpu.scene import types as st
    from dartray_tpu.core import transform as tr
    from dartray_tpu import cameras, samplers, film as film_mod
    from dartray_tpu.integrators import path as pi
    from dartray_tpu.renderers import sampler as rend

    jax.block_until_ready(jnp.zeros(8))
    width = height = 512
    scene = st.to_device(bench.build_bench_scene())
    c2w = tr.look_at([0, 2.2, -5.0], [0, 0.9, 0], [0, 1, 0])
    cam = cameras.perspective(c2w, 42.0, width, height)
    smp = samplers.make_sampler("lowdiscrepancy", spp=64)
    px, py = rend.pixel_grid(width, height)
    ig = pi.PathIntegrator(max_depth=5, remat=False)
    li = lambda s, rr, d, c: pi.li(ig, s, rr, d, c)
    film = film_mod.make_film(width, height)
    step = jax.jit(partial(rend.render_wave, li_fn=li, width=width,
                           height=height, spp=64))
    # warm + prime (readback forces real completion on the tunnel)
    film = step(scene, cam, smp, film, px, py,
                jnp.zeros(px.shape, jnp.int32))
    jax.block_until_ready(film.pixels)
    _ = float(jnp.sum(film.pixels[0, :8]))

    logdir = "/tmp/dartray_trace"
    os.system(f"rm -rf {logdir}")
    t0 = time.time()
    with jax.profiler.trace(logdir, create_perfetto_trace=True):
        for s in range(1, 1 + n_waves):
            film = step(scene, cam, smp, film, px, py,
                        jnp.full(px.shape, s, jnp.int32))
        jax.block_until_ready(film.pixels)
        _ = float(jnp.sum(film.pixels[0, :8]))
    wall = time.time() - t0
    print(f"traced {n_waves} waves in {wall:.2f}s wall "
          f"({wall / n_waves * 1e3:.0f} ms/wave incl. profiling overhead)",
          flush=True)

    paths = glob.glob(f"{logdir}/**/*perfetto_trace.json.gz",
                      recursive=True)
    if not paths:
        print("no perfetto trace produced; files:",
              glob.glob(f"{logdir}/**/*", recursive=True))
        return
    with gzip.open(sorted(paths)[-1]) as f:
        d = json.load(f)
    ev = d["traceEvents"]
    # device pids: identify threads whose events carry XLA op names
    durs = defaultdict(float)
    tid_names = {}
    for e in ev:
        if e.get("ph") == "M" and e.get("name") == "thread_name":
            tid_names[(e.get("pid"), e.get("tid"))] = \
                e.get("args", {}).get("name", "")
    for e in ev:
        if e.get("ph") != "X" or not e.get("dur"):
            continue
        tname = tid_names.get((e.get("pid"), e.get("tid")), "")
        if "XLA" not in tname and "TensorFlow" not in tname \
                and "Steps" not in tname and "xla" not in tname.lower():
            # keep only device op lanes; host python lanes excluded
            if "op" not in tname.lower() and "stream" not in tname.lower():
                continue
        durs[e["name"]] += e["dur"]

    total = sum(durs.values())
    buckets = defaultdict(float)
    for name, dur in durs.items():
        n = name.lower()
        if "kernel5" in n or "kernel6" in n or "kernel7" in n \
                or "traverse" in n or "custom-call" in n or "tpu_custom" in n:
            buckets["pallas traversal"] += dur
        elif "sort" in n:
            buckets["sort"] += dur
        elif "scatter" in n:
            buckets["scatter (film/unsort)"] += dur
        elif "gather" in n or "dynamic-slice" in n:
            buckets["gather"] += dur
        elif "fusion" in n:
            buckets["fusion (shade/etc)"] += dur
        elif "copy" in n or "transpose" in n or "reshape" in n:
            buckets["copy/layout"] += dur
        else:
            buckets["other"] += dur
    print(f"\ndevice total {total / 1e3:.1f} ms over {n_waves} waves "
          f"({total / 1e3 / n_waves:.1f} ms/wave)")
    for k, v in sorted(buckets.items(), key=lambda kv: -kv[1]):
        print(f"  {k:28s} {v / 1e3:9.1f} ms  {v / total * 100:5.1f}%")
    print("\ntop 25 ops:")
    for name, dur in sorted(durs.items(), key=lambda kv: -kv[1])[:25]:
        print(f"  {dur / 1e3:9.1f} ms  {name[:100]}")


if __name__ == "__main__":
    main()
