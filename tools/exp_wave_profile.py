"""On-chip wave breakdown: where does one bench wave's time go?

Times each stage of the path-integrator wave separately (jitted standalone):
camera raygen, coherence sort, closest-hit traversal (camera + bounce
distributions), any-hit shadow traversal, interaction + material eval +
BSDF sample + NEE arithmetic, film scatter. This is the breakdown VERDICT
r2 asked for (the kernel peak vs end-to-end gap).
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


def timeit(label, fn, *args, iters=4, **kw):
    out = fn(*args, **kw)
    jax.block_until_ready(out)
    times = []
    for _ in range(iters):
        t0 = time.time()
        out = fn(*args, **kw)
        jax.block_until_ready(out)
        times.append(time.time() - t0)
    dt = min(times)
    print(f"{label:42s} {dt*1e3:8.2f} ms", flush=True)
    return out, dt


def main():
    sys.path.insert(0, os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))))
    import importlib
    bench = importlib.import_module("bench")
    from dartray_tpu.scene import types as st
    from dartray_tpu.core import transform as tr
    from dartray_tpu import cameras, samplers, film as film_mod
    from dartray_tpu import materials as mat_mod, bsdf as bx
    from dartray_tpu.integrators import path as pi, common
    from dartray_tpu.renderers import sampler as rend
    from dartray_tpu.ops import traverse_pallas as tp
    from functools import partial

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

    # --- full wave reference ------------------------------------------------
    ig = pi.PathIntegrator(max_depth=5)
    li = lambda s, rr, d, c: pi.li(ig, s, rr, d, c)
    film = film_mod.make_film(width, height)
    step = jax.jit(partial(rend.render_wave, li_fn=li, width=width,
                           height=height, spp=64))
    (_, wave_dt) = timeit("FULL WAVE (6 bounces, 12 traversals)", step,
                          scene, cam, smp, film, px, py, s_idx)

    # --- stages -------------------------------------------------------------
    @jax.jit
    def raygen(s_idx):
        cs = samplers.camera_samples(smp, px, py, s_idx)
        rays, diffs, w = cameras.generate_rays(cam, cs, width, height, 0.125)
        return rays, diffs, w

    (rays, diffs, w), _ = timeit("camera samples + raygen", raygen, s_idx)

    sort_j = jax.jit(tp.sort_order)
    lo, hi = geom.world_bound[0], geom.world_bound[1]
    (order, sort_dt) = timeit("sort_order (262k rays)", sort_j,
                              rays.o, rays.d, rays.tmin, rays.tmax, lo, hi)

    isect = jax.jit(partial(st.intersect, sort=False))
    isect_s = jax.jit(partial(st.intersect, sort=True))
    (hits, t_cam) = timeit("closest-hit, camera wave (no sort)", isect,
                           geom, rays)
    _, t_cam_s = timeit("closest-hit, camera wave (sorted)", isect_s,
                        geom, rays)

    # bounce-like wave: cosine directions from the hit points
    @jax.jit
    def make_bounce(hits):
        it = st.interaction(geom, rays, hits)
        from dartray_tpu.core import sampling as smps
        key = (px.astype(jnp.uint32) * jnp.uint32(9781)
               ^ py.astype(jnp.uint32))
        u1 = smps.rng_uniform(key, jnp.uint32(1))
        u2 = smps.rng_uniform(key, jnp.uint32(2))
        from dartray_tpu.core import math as vm
        d = smps.cosine_sample_hemisphere(jnp.stack([u1, u2], -1))
        cu, cv = vm.coordinate_system(it["ns"])
        wd = (cu * d[:, 0:1] + cv * d[:, 1:2] + it["ns"] * d[:, 2:3])
        eps = st.ray_epsilon(it["t"])
        alive = hits.prim >= 0
        return vm.Rays(o=it["p"] + it["ng"] * eps[:, None], d=wd,
                       tmin=jnp.zeros((r,)),
                       tmax=jnp.where(alive, jnp.inf, -1.0),
                       time=rays.time)

    brays, _ = timeit("make bounce rays", make_bounce, hits)
    _, t_b_sort = timeit("closest-hit, bounce wave (sorted)", isect_s,
                         geom, brays)
    ip_s = jax.jit(partial(st.intersect_p, sort=True))
    _, t_sh = timeit("any-hit shadow wave (sorted)", ip_s, geom, brays)

    # shading arithmetic: interaction + params + NEE math + BSDF sample
    @jax.jit
    def shade(hits):
        it = st.interaction(geom, rays, hits, diffs=diffs)
        it["ns"] = mat_mod.bump_shading_normal(scene.materials, it["mat_id"],
                                               scene.textures, it)
        frame = bx.make_frame(it["ns"], it["dpdu"], it["ng"])
        params = mat_mod.eval_params(scene.materials, it["mat_id"],
                                     scene.textures, it)
        sd = lambda dim: samplers.sample_1d(smp, px, py, s_idx, dim)
        sd2 = lambda dim: samplers.sample_2d(smp, px, py, s_idx, dim)
        bs = bx.sample_f(params, frame, it["wo"], sd2(7), sd(9))
        ls = None
        from dartray_tpu import lights as lt_mod
        ls = lt_mod.sample_li(scene.lights, geom,
                              jnp.zeros((r,), jnp.int32), it["p"],
                              sd2(1), sd(3))
        f_l = bx.f(params, frame, it["wo"], ls.wi)
        return bs.f + f_l + ls.li

    _, t_shade = timeit("shade arithmetic (interaction+BSDF+NEE)", shade,
                        hits)

    @jax.jit
    def film_add(film, L):
        cs = samplers.camera_samples(smp, px, py, s_idx)
        return film_mod.add_samples(film, cs.image_xy, L)

    _, t_film = timeit("film scatter-add", film_add, film,
                       jnp.ones((r, 3)))

    n_b = 5
    est = (t_cam_s + n_b * t_b_sort + 6 * t_sh + 6 * t_shade + t_film
           + 11 * sort_dt)
    print(f"\nwave = {wave_dt*1e3:.1f} ms; stage model: "
          f"1 cam isect {t_cam_s*1e3:.1f} + {n_b} bounce isect "
          f"{n_b*t_b_sort*1e3:.1f} + 6 shadow {6*t_sh*1e3:.1f} + 6 shade "
          f"{6*t_shade*1e3:.1f} + film {t_film*1e3:.1f} + ~11 sorts "
          f"{11*sort_dt*1e3:.1f} = {est*1e3:.1f} ms", flush=True)


if __name__ == "__main__":
    main()
