"""Honest wave-stage split via CHAINED dispatch timing.

The axon tunnel adds ~45 ms of round-trip latency to any single blocking
dispatch, and the profiler's per-op spans on this backend are wall-ish
(they absorb scheduling gaps), so neither single-shot timeit nor the
Perfetto bucket split is trustworthy (measured round 5; see PERF_NOTES).

This tool times each stage as the SLOPE of chained dispatches: run the
stage K1 and K2 times back-to-back (queued, one readback), and report
(T2 - T1) / (K2 - K1) — latency and readback cancel exactly.

Usage: python tools/exp_chain.py
"""
import os
import sys
import time
from functools import partial

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax

jax.config.update("jax_compilation_cache_dir",
                  os.path.expanduser("~/.cache/jax_comp_cache"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 2.0)

import jax.numpy as jnp

K1, K2 = 2, 6


def slope(label, fn, *args, readback):
    """Chained-dispatch slope timing; fn(*args) -> pytree (args reused —
    stages are independent dispatches, queued in submission order)."""
    out = fn(*args)
    jax.block_until_ready(out)
    _ = readback(out)

    def run(k):
        best = np.inf
        for _ in range(3):
            t0 = time.time()
            o = None
            for _ in range(k):
                o = fn(*args)
            jax.block_until_ready(o)
            _ = readback(o)
            best = min(best, time.time() - t0)
        return best

    t1, t2 = run(K1), run(K2)
    ms = (t2 - t1) / (K2 - K1) * 1e3
    print(f"{label:48s} {ms:8.2f} ms", flush=True)
    return out, ms


def main():
    import importlib
    bench = importlib.import_module("bench")
    from dartray_tpu.scene import types as st
    from dartray_tpu.core import transform as tr
    from dartray_tpu import cameras, samplers, film as film_mod
    from dartray_tpu import materials as mat_mod, bsdf as bx
    from dartray_tpu.integrators import path as pi, common
    from dartray_tpu.renderers import sampler as rend

    jax.block_until_ready(jnp.zeros(8))
    width = height = 512
    scene = st.to_device(bench.build_bench_scene())
    geom = scene.geometry
    c2w = tr.look_at([0, 2.2, -5.0], [0, 0.9, 0], [0, 1, 0])
    cam = cameras.perspective(c2w, 42.0, width, height)
    smp = samplers.make_sampler("lowdiscrepancy", spp=64)
    px, py = rend.pixel_grid(width, height)
    r = px.shape[0]
    s_idx = jnp.zeros((r,), jnp.int32)
    sctx = {"sampler": smp, "px": px, "py": py, "s_idx": s_idx}

    ig = pi.PathIntegrator(max_depth=5)
    li = lambda s, rr, d, c: pi.li(ig, s, rr, d, c)
    film = film_mod.make_film(width, height)
    step = jax.jit(partial(rend.render_wave, li_fn=li, width=width,
                           height=height, spp=64))
    rb_film = lambda f: float(jnp.sum(f.pixels[0, :8]))
    _, wave_ms = slope("FULL WAVE (6 bounces)", step, scene, cam, smp, film,
                       px, py, s_idx, readback=rb_film)

    # ---- raygen + sampler --------------------------------------------------
    @jax.jit
    def raygen(s_idx):
        cs = samplers.camera_samples(smp, px, py, s_idx)
        rays, diffs, w = cameras.generate_rays(cam, cs, width, height, 0.125)
        return rays, diffs, w

    rb0 = lambda o: float(jnp.sum(jax.tree_util.tree_leaves(o)[0][:8]))
    (rays, diffs, w), _ = slope("raygen + camera samples", raygen, s_idx,
                                readback=rb0)

    # ---- camera closest-hit (unsorted, chunked) ---------------------------
    isect = jax.jit(partial(st.intersect, sort=False))
    hits, _ = slope("closest-hit camera wave (no sort)", isect, geom, rays,
                    readback=lambda h: float(jnp.sum(h.t[:8])))

    # ---- interaction + shade arithmetic -----------------------------------
    @jax.jit
    def shade(rays, hits):
        it = st.interaction(geom, rays, hits, diffs=diffs)
        it["ns"] = mat_mod.bump_shading_normal(scene.materials, it["mat_id"],
                                               scene.textures, it)
        frame = bx.make_frame(it["ns"], it["dpdu"], it["ng"])
        params = mat_mod.eval_params(scene.materials, it["mat_id"],
                                     scene.textures, it)
        sd = lambda d: samplers.sample_1d(smp, px, py, s_idx, d)
        sd2 = lambda d: samplers.sample_2d(smp, px, py, s_idx, d)
        bs = bx.sample_f(params, frame, it["wo"], sd2(7), sd(9))
        sray, usable, contrib = common.nee_prepare(
            scene, it, frame, params, it["wo"], sd(1), sd2(2), sd(4),
            mask=hits.prim >= 0)
        return bs.f, contrib, sray

    (_, _, sray), _ = slope("shade (interaction+bump+bsdf+NEE prep)", shade,
                            rays, hits, readback=rb0)

    # ---- the merged pair launch at bounce-1 conditions --------------------
    @jax.jit
    def mk_next(rays, hits):
        it = st.interaction(geom, rays, hits)
        frame = bx.make_frame(it["ns"], it["dpdu"], it["ng"])
        params = mat_mod.eval_params(scene.materials, it["mat_id"],
                                     scene.textures, it)
        sd2 = lambda d: samplers.sample_2d(smp, px, py, s_idx, d)
        sd = lambda d: samplers.sample_1d(smp, px, py, s_idx, d)
        bs = bx.sample_f(params, frame, it["wo"], sd2(17), sd(19))
        eps = st.ray_epsilon(it["t"])
        from dartray_tpu.core import math as vm
        ng_f = vm.face_forward(it["ng"], bs.wi)
        cont = (hits.prim >= 0) & bs.valid & (bs.pdf > 0)
        return vm.Rays(o=it["p"] + ng_f * eps, d=bs.wi,
                       tmin=jnp.zeros((r,)),
                       tmax=jnp.where(cont, jnp.inf, -1.0),
                       time=rays.time)

    nrays = mk_next(rays, hits)
    jax.block_until_ready(nrays.o.x)
    pair = jax.jit(st.intersect_pair)
    _, _ = slope("merged pair launch (bounce-1 live mix)", pair, geom,
                 nrays, sray,
                 readback=lambda o: float(jnp.sum(o[0].t[:8])))

    # ---- the fused sort alone ---------------------------------------------
    @jax.jit
    def sort_only(rays):
        from dartray_tpu.ops import traverse_pallas as tp
        oc = [rays.o.x, rays.o.y, rays.o.z]
        dc = [rays.d.x, rays.d.y, rays.d.z]
        key = tp.sort_key_i32(oc, dc, rays.tmin, rays.tmax,
                              geom.world_bound[0], geom.world_bound[1])
        iota = jax.lax.iota(jnp.int32, r)
        s = jax.lax.sort([key, iota] + oc + dc + [rays.tmin, rays.tmax],
                         num_keys=1)
        return s[2]

    _, _ = slope("fused 10-operand sort (262k)", sort_only, nrays,
                 readback=lambda o: float(jnp.sum(o[:8])))

    # ---- film scatter-add --------------------------------------------------
    @jax.jit
    def film_add(film, hits):
        from dartray_tpu.core import math as vm
        Lv = vm.V3(hits.t * 0 + 0.5, hits.t * 0 + 0.25, hits.t * 0 + 0.125)
        cs_xy = vm.V2(px.astype(jnp.float32) + 0.5,
                      py.astype(jnp.float32) + 0.5)
        return film_mod.add_samples(film, cs_xy, Lv)

    _, _ = slope("film scatter-add", film_add, film, hits, readback=rb_film)

    print(f"\nfull wave = {wave_ms:.1f} ms "
          f"({r * 12 / wave_ms * 1e3 / 1e6:.2f} Mrays/s at 12 q/wave)")


if __name__ == "__main__":
    main()
