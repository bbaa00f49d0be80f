"""createprobes renderer: bake SH radiance probes on a 3D grid.

TPU-native replacement for lib/renderers/create_probes_renderer.dart:45-363:
the reference iterates grid cells, shooting rays from jittered points inside
each cell and projecting the scene's full Li onto SH (:52-80). Here every
probe cell's sample directions form one device wave: rays (n_probes x
n_samples) are evaluated by the scene's surface integrator li_fn in chunks,
then projected with one einsum (core/sh.py). Output is an SHProbes pytree
(npz-serializable) consumed by the useprobes integrator
(integrators/prt.py).
"""
from __future__ import annotations

from typing import Callable

import numpy as np
import jax
import jax.numpy as jnp

from ..core import math as vm
from ..core import sampling as smp
from ..core import sh
from ..integrators import prt as prt_mod

FOUR_PI = float(4.0 * np.pi)


def probe_positions(bbox_lo, bbox_hi, res):
    """Cell-center probe positions on an (nx, ny, nz) grid, raveled
    x-major to match SHProbes.probe_lookup indexing."""
    nx, ny, nz = res
    lo = np.asarray(bbox_lo, np.float32)
    hi = np.asarray(bbox_hi, np.float32)
    xs = (np.arange(nx) + 0.5) / nx
    ys = (np.arange(ny) + 0.5) / ny
    zs = (np.arange(nz) + 0.5) / nz
    gx, gy, gz = np.meshgrid(xs, ys, zs, indexing="ij")
    g = np.stack([gx, gy, gz], axis=-1).reshape(-1, 3)
    return lo + g * (hi - lo)


def render(scene, li_fn: Callable, bbox_lo=None, bbox_hi=None,
           res=(4, 4, 4), lmax: int = 4, n_samples: int = 512,
           seed: int = 11, chunk: int = 4) -> prt_mod.SHProbes:
    """Bake probes. li_fn(scene, rays, diffs, sctx) -> (R, 3) radiance —
    any surface integrator's li partial (typically path or directlighting,
    matching the reference's use of the configured surface integrator).

    n_samples per probe (default 512 = 'indirectsamples', Appendix B);
    probes are baked `chunk` cells at a time to bound the wave size."""
    from ..scene import types as _st
    scene = _st.to_device(scene)
    geom = scene.geometry
    if bbox_lo is None or bbox_hi is None:
        wb = np.asarray(geom.world_bound)
        bbox_lo = wb[0] if bbox_lo is None else bbox_lo
        bbox_hi = wb[1] if bbox_hi is None else bbox_hi
    pos = probe_positions(bbox_lo, bbox_hi, res)         # (P, 3)
    n_probes = pos.shape[0]
    T = sh.n_terms(lmax)
    rng = np.random.default_rng(seed)
    scr_np = rng.integers(0, 2 ** 32, 2, dtype=np.uint32)
    scr = (jnp.uint32(int(scr_np[0])), jnp.uint32(int(scr_np[1])))
    idx = jnp.arange(n_samples, dtype=jnp.uint32)
    u = smp.sample02(idx, scr)
    dirs = smp.uniform_sample_sphere(u)                  # V3 of (S,)
    Y = sh.eval_basis(dirs, lmax)                        # (S, T)
    dirs_arr = vm.to_arr(dirs)
    w = FOUR_PI / n_samples

    @jax.jit
    def bake_chunk(p_chunk):
        c = p_chunk.shape[0]
        o = vm.from_arr(jnp.repeat(p_chunk, n_samples, axis=0))
        d = vm.from_arr(jnp.tile(dirs_arr, (c, 1)))
        r = c * n_samples
        rays = vm.Rays(o=o, d=d,
                       tmin=jnp.full((r,), 1e-4, jnp.float32),
                       tmax=jnp.full((r,), jnp.inf, jnp.float32),
                       time=jnp.zeros((r,), jnp.float32))
        # integrators draw per-"pixel" randoms; fake a pixel id per probe ray
        from .. import samplers as smp_mod
        sctx = {"sampler": smp_mod.make_sampler("random", spp=1, seed=seed),
                "px": jnp.arange(r, dtype=jnp.int32),
                "py": jnp.zeros((r,), jnp.int32),
                "s_idx": jnp.zeros((r,), jnp.int32)}
        L = vm.to_arr(li_fn(scene, rays, None, sctx))    # (c*S, 3)
        L = L.reshape(c, n_samples, 3)
        return jnp.einsum("st,csk->ctk", Y, L) * w       # (c, T, 3)

    out = np.zeros((n_probes, T, 3), np.float32)
    for s in range(0, n_probes, chunk):
        e = min(s + chunk, n_probes)
        pc = jnp.asarray(pos[s:e])
        out[s:e] = np.asarray(bake_chunk(pc))
    return prt_mod.SHProbes(coeffs=jnp.asarray(out),
                            bbox_lo=jnp.asarray(bbox_lo, jnp.float32),
                            bbox_hi=jnp.asarray(bbox_hi, jnp.float32),
                            lmax=lmax, res=tuple(res))


def save(path: str, probes: prt_mod.SHProbes) -> None:
    """Persist probes (the reference's probes output file,
    create_probes_renderer.dart:300+)."""
    np.savez(path, coeffs=np.asarray(probes.coeffs),
             bbox_lo=np.asarray(probes.bbox_lo),
             bbox_hi=np.asarray(probes.bbox_hi),
             lmax=probes.lmax, res=np.asarray(probes.res))


def load(path: str) -> prt_mod.SHProbes:
    z = np.load(path)
    return prt_mod.SHProbes(
        coeffs=jnp.asarray(z["coeffs"]),
        bbox_lo=jnp.asarray(z["bbox_lo"]), bbox_hi=jnp.asarray(z["bbox_hi"]),
        lmax=int(z["lmax"]), res=tuple(int(x) for x in z["res"]))
