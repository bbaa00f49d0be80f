"""Benchmark: path-tracing rays/s on one chip (driver config #3 shape).

Scene: ~100k-triangle displaced-sphere mesh + glass sphere + matte floor +
area light; path integrator (maxdepth 5, NEE + MIS), low-discrepancy sampler,
512x512. Prints ONE JSON line:
  {"metric": "rays/s/chip (path)", "value": N, "unit": "rays/s",
   "vs_baseline": N / 1e9}   (baseline target: 1 Grays/s per chip)

Ray accounting: every bounce of every wave traces 2 full wavefronts (the
path-extension closest-hit ray, which doubles as the MIS BSDF-sample ray,
and the NEE shadow any-hit ray), so rays = R * 2 * (max_depth + 1) per wave —
the number of traversal queries the chip actually executes (no compaction
discount; dead lanes are sorted to trailing blocks that the kernel
short-circuits, but they still count as issued queries).

NOTE: on the tunneled single-chip environment the FIRST device op can take
~3 minutes (remote compile + claim handshake); warmup is untimed.
"""
import os
import sys
import json
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

import numpy as np
import jax

jax.config.update("jax_compilation_cache_dir",
                  os.path.expanduser("~/.cache/jax_comp_cache"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 2.0)

import jax.numpy as jnp


def build_bench_scene(n_tris_target=100_000):
    from dartray_tpu.scene import build as sb, mesh as mesh_mod
    from dartray_tpu import materials as mat_mod
    from dartray_tpu.core import transform as tr

    b = sb.SceneBuilder()
    gray = b.add_material(mat_mod.matte(kd=(0.6, 0.6, 0.6)))
    floor_m = b.add_material(mat_mod.matte(kd=(0.4, 0.4, 0.45)))
    glass_m = b.add_material(mat_mod.glass())
    dark = b.add_material(mat_mod.matte(kd=(0.0, 0.0, 0.0)))

    # displaced sphere with ~n_tris_target triangles (bunny stand-in)
    nu = int(np.sqrt(n_tris_target / 2 * (2.0)))  # nu = 2*nv grid
    nv = max(nu // 2, 8)
    m = mesh_mod.sphere(radius=1.0, nu=nu, nv=nv)
    v = m.verts.astype(np.float64)
    # multi-frequency displacement (keeps it non-trivial for the BVH)
    disp = (0.08 * np.sin(7 * v[:, 0]) * np.cos(5 * v[:, 1])
            + 0.05 * np.sin(11 * v[:, 2] + 3 * v[:, 0]))
    n = v / np.maximum(np.linalg.norm(v, axis=-1, keepdims=True), 1e-9)
    m.verts = (v + n * disp[:, None]).astype(np.float32)
    m.normals = None
    m = m.transformed(np.asarray(tr.translate([-0.4, 1.05, 0.2]).m))
    b.add_mesh(m, gray)

    sph = mesh_mod.sphere(radius=0.5, nu=64, nv=32).transformed(
        np.asarray(tr.translate([1.2, 0.5, -0.6]).m))
    b.add_mesh(sph, glass_m)

    b.add_mesh(mesh_mod.make_mesh(
        [[-6, 0, -6], [6, 0, -6], [6, 0, 6], [-6, 0, 6]],
        [[0, 1, 2], [0, 2, 3]]), floor_m)
    # area light overhead (wound to emit downward)
    b.add_mesh(mesh_mod.make_mesh(
        [[-1, 4, -1], [1, 4, -1], [1, 4, 1], [-1, 4, 1]],
        [[0, 1, 2], [0, 2, 3]]), dark, area_light_L=(12.0,) * 3)
    return b.build()


def main():
    width = height = int(os.environ.get("BENCH_RES", "512"))
    spp_budget = int(os.environ.get("BENCH_SPP", "64"))
    max_seconds = float(os.environ.get("BENCH_SECONDS", "60"))
    max_depth = 5

    from dartray_tpu.scene import build as sb  # noqa: F401 (path setup)
    from dartray_tpu.core import transform as tr
    from dartray_tpu import cameras, samplers, film as film_mod
    from dartray_tpu.integrators import path as pi
    from dartray_tpu.renderers import sampler as rend
    from functools import partial

    # claim the (possibly tunneled) device up front — the one-time claim
    # handshake can take minutes and must not pollute the build/warmup
    # timings — and preload the lazily-imported kernel/table modules so
    # module import time doesn't land in the timed build phase
    t0 = time.time()
    from dartray_tpu.ops import traverse_pallas  # noqa: F401
    from dartray_tpu import lights, materials, textures  # noqa: F401
    from dartray_tpu.accel import cluster, wide  # noqa: F401
    jax.block_until_ready(jnp.zeros((8,)))
    claim_s = time.time() - t0
    print(f"[bench] device claim: {claim_s:.1f}s", file=sys.stderr,
          flush=True)

    t0 = time.time()
    scene = build_bench_scene()     # pure host numpy (no device round-trips)
    build_s = time.time() - t0
    print(f"[bench] scene+bvh build: {build_s:.1f}s", file=sys.stderr,
          flush=True)

    c2w = tr.look_at([0, 2.2, -5.0], [0, 0.9, 0], [0, 1, 0])
    cam = cameras.perspective(c2w, 42.0, width, height)
    smp = samplers.make_sampler("lowdiscrepancy", spp=spp_budget)
    ig = pi.PathIntegrator(max_depth=max_depth)
    li = lambda s, r, d, c: pi.li(ig, s, r, d, c)

    film = film_mod.make_film(width, height)
    px, py = rend.pixel_grid(width, height)
    step = jax.jit(partial(rend.render_wave, li_fn=li, width=width,
                           height=height, spp=spp_budget),
                   donate_argnames=("film",))

    # warmup: one scene transfer + compile. The trailing SCALAR READBACK is
    # load-bearing: on the axon tunnel, block_until_ready alone can return
    # before device work completes until the executable's output has been
    # read back once (measured round 4, tools/exp_mxu.py) — without it the
    # timed loop under-reports wave time.
    t0 = time.time()
    from dartray_tpu.scene import types as st_mod
    scene = st_mod.to_device(scene)
    film = step(scene, cam, smp, film, px, py,
                jnp.zeros(px.shape, jnp.int32))
    jax.block_until_ready(film.pixels)
    _ = float(jnp.sum(film.pixels[0, :8]))
    warmup_s = time.time() - t0
    print(f"[bench] warmup+compile: {warmup_s:.1f}s", file=sys.stderr,
          flush=True)

    rays_per_wave = px.shape[0] * 2 * (max_depth + 1)
    # timed waves (film threads through every step: the loop is a true
    # sequential chain; one readback closes it)
    done = 1
    t0 = time.time()
    for s in range(1, spp_budget):
        film = step(scene, cam, smp, film, px, py,
                    jnp.full(px.shape, s, jnp.int32))
        done += 1
        if s % 4 == 0:
            jax.block_until_ready(film.pixels)
            if time.time() - t0 > max_seconds:
                break
    jax.block_until_ready(film.pixels)
    _ = float(jnp.sum(film.pixels[0, :8]))
    dt = time.time() - t0
    timed_waves = done - 1
    rays_s = rays_per_wave * timed_waves / max(dt, 1e-9)

    img = np.asarray(film_mod.to_rgb(film))
    out_path = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                            "bench_render.png")
    try:
        from dartray_tpu.io import image as io_img
        io_img.save(out_path, np.clip(img, 0, 1))
    except Exception:
        pass

    # TPU gradient probe, ON BY DEFAULT (VERDICT r5 #5): differentiate a
    # small render through the REAL Pallas path on the chip so every bench
    # run demonstrates the differentiable path (BASELINE.md metric #2).
    # BENCH_GRAD=RES:SPP overrides the shape; BENCH_GRAD=0 disables.
    grad_s = None
    g_norm = None
    grad_err = None
    grad_cfg = os.environ.get("BENCH_GRAD", "96:8")
    if grad_cfg not in ("0", "off", ""):
        # a probe failure must never swallow the headline JSON line
        try:
            res_s, spp_s = grad_cfg.split(":")
            gw = int(res_s)
            gspp = int(spp_s)
            from dartray_tpu import grad as grad_mod
            theta, inject = grad_mod.select(scene, ["materials.kd"])
            gsmp = samplers.make_sampler("lowdiscrepancy", spp=gspp)
            gcam = cameras.perspective(c2w, 42.0, gw, gw)
            t0 = time.time()
            val, grads = grad_mod.render_loss_grad(
                scene, gcam, gsmp, li, gw, gw, theta, inject,
                lambda im: (im ** 2).mean(), spp=gspp)
            jax.block_until_ready(grads)
            g_norm = float(jnp.linalg.norm(grads["materials.kd"]))
            grad_s = round(time.time() - t0, 2)
            print(f"[bench] grad probe {gw}x{gw} spp{gspp}: {grad_s}s "
                  f"(incl. compile), |dL/dkd| = {g_norm:.3e}",
                  file=sys.stderr, flush=True)
        except Exception as e:  # noqa: BLE001
            grad_err = f"{type(e).__name__}: {e}"[:300]
            print(f"[bench] grad probe FAILED: {grad_err}",
                  file=sys.stderr, flush=True)

    result = {
        "metric": "rays/s/chip (path, %dx%d, depth %d)" % (width, height,
                                                           max_depth),
        "value": round(rays_s),
        "unit": "rays/s",
        "vs_baseline": round(rays_s / 1e9, 4),
        "platform": jax.default_backend(),
        "tris": scene.geometry.n_prims,
        "waves": timed_waves,
        "secs": round(dt, 2),
        "bvh_build_s": round(build_s, 2),
        "warmup_s": round(warmup_s, 2),
        "img_mean": float(img.mean()),
    }
    if grad_s is not None:
        result["grad_s"] = grad_s
        result["grad_norm"] = g_norm
    elif grad_err is not None:
        result["grad_error"] = grad_err
    print(json.dumps(result))


if __name__ == "__main__":
    main()
