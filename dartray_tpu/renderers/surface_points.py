"""surfacepoints renderer: Poisson-distributed sample points on scene
surfaces.

TPU-native replacement for lib/renderers/surface_points_renderer.dart:33-299:
the reference random-walks rays from the scene interior, adding hit points
that pass an octree repulsion test (:40-75). Here candidate generation is a
device wave (N random sphere rays per round, one traversal), and the
repulsion test is a host-side hash-grid filter per round — the renderer is a
preprocess that feeds dipolesubsurface (integrators/dipole.py), exactly like
the reference's 'pointsfile' pipeline.
"""
from __future__ import annotations

from typing import NamedTuple

import numpy as np
import jax
import jax.numpy as jnp

from ..core import math as vm
from ..scene import types as st


class SurfacePoints(NamedTuple):
    p: np.ndarray        # (P, 3)
    n: np.ndarray        # (P, 3) geometric normals
    area: np.ndarray     # (P,) per-point represented area
    mat_id: np.ndarray   # (P,) int32
    ray_eps: np.ndarray  # (P,)


def render(scene, min_sample_dist: float = 0.25, max_points: int = 50_000,
           n_rounds: int = 32, rays_per_round: int = 8192,
           seed: int = 3) -> SurfacePoints:
    """Generate blue-noise-ish surface points with minimum spacing
    `minsampledistance` (surface_points_renderer.dart:133-137 default 0.25).
    """
    from ..scene import types as _st
    scene = _st.to_device(scene)
    geom = scene.geometry
    wb = np.asarray(geom.world_bound)
    center = 0.5 * (wb[0] + wb[1])
    radius = 0.5 * float(np.linalg.norm(wb[1] - wb[0])) + 1e-3
    rng = np.random.default_rng(seed)

    @jax.jit
    def cast(o, d):
        r = o.shape[0]
        rays = vm.Rays(o=vm.from_arr(o), d=vm.from_arr(d),
                       tmin=jnp.full((r,), 1e-4, jnp.float32),
                       tmax=jnp.full((r,), jnp.inf, jnp.float32),
                       time=jnp.zeros((r,), jnp.float32))
        hits = st.intersect(geom, rays)
        it = st.interaction(geom, rays, hits)
        return (hits.hit, vm.to_arr(it["p"]), vm.to_arr(it["ng"]),
                it["mat_id"], hits.t)

    cell = max(min_sample_dist, 1e-6)
    grid = {}
    pts, nrm, mids, eps_l = [], [], [], []

    def cell_of(p):
        return tuple(np.floor(p / cell).astype(np.int64))

    def far_enough(p):
        c = cell_of(p)
        for dx in (-1, 0, 1):
            for dy in (-1, 0, 1):
                for dz in (-1, 0, 1):
                    for q in grid.get((c[0] + dx, c[1] + dy, c[2] + dz), ()):
                        if np.dot(p - q, p - q) < min_sample_dist ** 2:
                            return False
        return True

    for _ in range(n_rounds):
        if len(pts) >= max_points:
            break
        # rays from random points on the bounding sphere toward random
        # interior targets (the reference's random-walk seeding)
        u = rng.normal(size=(rays_per_round, 3))
        u /= np.linalg.norm(u, axis=1, keepdims=True)
        o = center + radius * u
        tgt = center + rng.uniform(-0.5, 0.5, (rays_per_round, 3)) * (
            wb[1] - wb[0])
        d = tgt - o
        d /= np.maximum(np.linalg.norm(d, axis=1, keepdims=True), 1e-9)
        hit, p, n, mid, t = (np.asarray(x) for x in cast(
            jnp.asarray(o, jnp.float32), jnp.asarray(d, jnp.float32)))
        for i in np.nonzero(hit)[0]:
            if len(pts) >= max_points:
                break
            pi = p[i]
            if far_enough(pi):
                grid.setdefault(cell_of(pi), []).append(pi)
                pts.append(pi)
                nrm.append(n[i])
                mids.append(mid[i])
                eps_l.append(1e-3 * max(t[i], 1e-4))

    pts = np.asarray(pts, np.float32).reshape(-1, 3)
    # each point represents a disk of radius minDist/2 (the reference's
    # area assignment for the dipole Mo integration)
    area = np.full(pts.shape[0], np.pi * (min_sample_dist * 0.5) ** 2,
                   np.float32)
    return SurfacePoints(p=pts, n=np.asarray(nrm, np.float32).reshape(-1, 3),
                         area=area,
                         mat_id=np.asarray(mids, np.int32).reshape(-1),
                         ray_eps=np.asarray(eps_l, np.float32).reshape(-1))


def save(path: str, sp: SurfacePoints) -> None:
    np.savez(path, p=sp.p, n=sp.n, area=sp.area, mat_id=sp.mat_id,
             ray_eps=sp.ray_eps)


def load(path: str) -> SurfacePoints:
    z = np.load(path)
    return SurfacePoints(p=z["p"], n=z["n"], area=z["area"],
                         mat_id=z["mat_id"], ray_eps=z["ray_eps"])
