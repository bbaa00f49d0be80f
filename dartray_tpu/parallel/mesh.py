"""Multi-chip sharding: tiles x samples over a jax.sharding.Mesh.

TPU-native replacement for DartRay's share-nothing isolate decomposition
(SURVEY §2.6: GetSubWindow tile split, full scene replication, sub-image
compositing — lib/core/common.dart:52-73, lib/dartray_web/render_manager.dart:
100-144). Here the distribution axes are: `tiles` (pixel dimension, the
GetSubWindow analog) and `spp` (sample-index dimension); the scene pytree is
replicated to every device, each device renders its (pixel-chunk x
sample-chunk) wave, and the film is reduced with one psum over both axes —
the postMessage sub-rect compositing becomes a single ICI all-reduce.

Determinism: samples are keyed by (pixel, sample index, dimension), never by
shard, so the N-device image is bit-identical to the 1-device image up to
f32 reduction order (SURVEY §7).
"""
from __future__ import annotations

from functools import partial
from typing import Callable

import numpy as np
import jax
import jax.numpy as jnp
from jax.sharding import Mesh, PartitionSpec as P

from .. import film as film_mod
from .. import samplers as smp_mod
from .. import cameras as cam_mod
from ..renderers import sampler as rend


def make_device_mesh(n_tiles: int, n_spp: int, devices=None) -> Mesh:
    devices = devices if devices is not None else jax.devices()
    assert n_tiles * n_spp <= len(devices), \
        f"need {n_tiles * n_spp} devices, have {len(devices)}"
    dev = np.asarray(devices[: n_tiles * n_spp]).reshape(n_tiles, n_spp)
    return Mesh(dev, axis_names=("tiles", "spp"))


def render_sharded(scene, camera, sampler, li_fn: Callable, width: int,
                   height: int, mesh: Mesh):
    """Full sharded render -> (H, W, 3) linear RGB on host.

    Pixels are split along `tiles`, sample indices along `spp`; each device
    loops its local sample indices (static count), accumulating into a
    replicated-size film that is psum'd across the mesh.
    """
    n_tiles = mesh.shape["tiles"]
    n_spp = mesh.shape["spp"]
    spp = sampler.spp
    px, py = rend.pixel_grid(width, height)
    r = px.shape[0]
    # pad pixel dim to a multiple of n_tiles
    pad = (-r) % n_tiles
    px = jnp.concatenate([px, jnp.full((pad,), 0, jnp.int32)])
    py = jnp.concatenate([py, jnp.full((pad,), -1, jnp.int32)])  # y<0 masked
    # pad sample dim
    spp_pad = (-spp) % n_spp
    s_all = jnp.concatenate([jnp.arange(spp, dtype=jnp.int32),
                             jnp.full((spp_pad,), -1, jnp.int32)])
    local_spp = (spp + spp_pad) // n_spp
    film0 = film_mod.make_film(width, height)

    @partial(jax.shard_map, mesh=mesh,
             in_specs=(P(), P(), P(), P("tiles"), P("tiles"), P("spp"), P()),
             out_specs=P(), check_vma=False)
    def shard_render(scene, camera, sampler, px_l, py_l, s_l, film):
        for k in range(local_spp):
            s = s_l[k]
            s_idx = jnp.full(px_l.shape, jnp.maximum(s, 0), jnp.int32)
            cs = smp_mod.camera_samples(sampler, px_l, py_l, s_idx)
            diff_scale = 1.0 / np.sqrt(max(spp, 1))
            rays, diffs, weight = cam_mod.generate_rays(
                camera, cs, width, height, diff_scale)
            sctx = {"sampler": sampler, "px": px_l, "py": py_l,
                    "s_idx": s_idx}
            L = li_fn(scene, rays, diffs, sctx) * weight[:, None]
            mask = (py_l >= 0) & (s >= 0)
            film = film_mod.add_samples(film, cs.image_xy, L, mask=mask)
        pixels = jax.lax.psum(film.pixels, ("tiles", "spp"))
        splat = jax.lax.psum(film.splat, ("tiles", "spp"))
        import dataclasses
        return dataclasses.replace(film, pixels=pixels, splat=splat)

    film = jax.jit(shard_render)(scene, camera, sampler, px, py, s_all, film0)
    return np.asarray(film_mod.to_rgb(film))
