"""Dump the compiled wave HLO and summarize what the big fusions contain.

Pairs with exp_trace.py: the trace names hot ops (fusion.N); this script
prints each named fusion's operation mix (gathers/scatters/dots/elementwise
counts and operand shapes) so the wave breakdown is attributable.

Usage: python tools/exp_hlo.py [fusion.309 fusion.305 ...]
       (no args: print the 15 largest fusions by body size)
"""
import os
import re
import sys
from collections import Counter
from functools import partial

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax

jax.config.update("jax_compilation_cache_dir",
                  os.path.expanduser("~/.cache/jax_comp_cache"))
import jax.numpy as jnp


def main():
    import importlib
    bench = importlib.import_module("bench")
    from dartray_tpu.scene import types as st
    from dartray_tpu.core import transform as tr
    from dartray_tpu import cameras, samplers, film as film_mod
    from dartray_tpu.integrators import path as pi
    from dartray_tpu.renderers import sampler as rend

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
    lowered = step.lower(scene, cam, smp, film, px, py,
                         jnp.zeros(px.shape, jnp.int32))
    txt = lowered.compile().as_text()
    with open("/tmp/wave_hlo.txt", "w") as f:
        f.write(txt)
    print(f"HLO: {len(txt) / 1e6:.1f} MB -> /tmp/wave_hlo.txt", flush=True)

    # index fusion computations: fused_computation bodies + the fusion ops
    # that call them
    fusion_calls = {}  # fusion name -> called computation
    for m in re.finditer(r"(fusion[.\w]*) = [^\n]*calls=([%\w.\-]+)", txt):
        fusion_calls[m.group(1)] = m.group(2).lstrip("%")

    # computation bodies
    comp_bodies = {}
    cur = None
    for line in txt.splitlines():
        m = re.match(r"^%?([\w.\-]+) \([^)]*\) -> ", line)
        if m:
            cur = m.group(1)
            comp_bodies[cur] = []
        elif cur is not None and line.startswith("}"):
            cur = None
        elif cur is not None:
            comp_bodies[cur].append(line)

    targets = sys.argv[1:]
    if not targets:
        sized = sorted(fusion_calls.items(),
                       key=lambda kv: -len(comp_bodies.get(kv[1], [])))
        targets = [k for k, _ in sized[:15]]

    for fname in targets:
        comp = fusion_calls.get(fname)
        body = comp_bodies.get(comp, []) if comp else []
        ops = Counter()
        big_shapes = Counter()
        for line in body:
            m = re.match(r"\s*%?[\w.\-]+ = ([\w\[\]{},\d]+) ([\w\-]+)\(",
                         line)
            if not m:
                continue
            shape, op = m.group(1), m.group(2)
            ops[op] += 1
            if op in ("gather", "scatter", "dynamic-slice", "sort",
                      "dot", "transpose", "iota", "dynamic-update-slice"):
                big_shapes[f"{op} {shape}"] += 1
        total = sum(ops.values())
        print(f"\n== {fname} (calls {comp}, {total} ops)")
        for op, c in ops.most_common(12):
            print(f"   {op:22s} x{c}")
        for k, c in big_shapes.most_common(10):
            print(f"   >> {k}  x{c}")


if __name__ == "__main__":
    main()
