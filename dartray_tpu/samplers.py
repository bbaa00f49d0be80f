"""Wavefront sample generation: low-discrepancy / stratified / random / halton.

TPU-native replacement for lib/samplers/ (low_discrepancy_sampler.dart:31,
stratified_sampler.dart, random_sampler.dart, halton_sampler.dart) and the
Sample/CameraSample request protocol (lib/core/sample.dart:23-79). The
reference's stateful getMoreSamples pixel loop becomes pure functions of
(pixel, sample_index, dimension, seed): every sample value is computable
independently on device, which makes output bit-identical for any shard
count (SURVEY §7 determinism requirement).

Dimension allocation convention (mirrors CameraSample): dims 0,1 = image
offset; 2,3 = lens; 4 = time; integrators draw dims >= 5 via sample_1d/2d.

PIXEL SAMPLERS (lib/pixel_samplers/: linear, random, tile — a DartRay
addition deciding which pixel to render next): intentionally ABSENT by
redesign. The wavefront renderer evaluates EVERY film pixel in every wave
(one sample index per wave, renderers/sampler.py), so there is no "next
pixel" to choose — pixel ORDER only exists as the Morton layout used for
packet coherence (pixel_grid), and progressive preview comes from the
per-wave film callback instead of a pixel ordering. The scene parser
accepts and ignores `PixelSampler` statements for compatibility.
"""
from __future__ import annotations

import dataclasses
from functools import partial

import numpy as np
import jax
import jax.numpy as jnp

from .core import sampling as smp
from .cameras import CameraSamples

U32 = jnp.uint32

LOWDISCREPANCY = 0
STRATIFIED = 1
RANDOM = 2
HALTON = 3
BESTCANDIDATE = 4
VECTOR = 5   # primary-sample-space vector (Metropolis chains)

# --- best-candidate (Poisson-disk) image-sample tile ------------------------
# The reference ships a ~4000-line precomputed table
# (best_candidate_sampler.dart:31 + sample_table.dart): blue-noise sample
# positions over a toroidal tile, repeated across the film. TPU redesign:
# the tile is GENERATED once on host by Mitchell's best-candidate algorithm
# (the same construction the reference's table was built with), bucketed
# into per-pixel slots so the wavefront contract (every pixel x every
# sample index, pure function) holds; non-image dimensions use the
# (0,2)-sequence machinery (a strict improvement over the reference's
# table reuse for lens/time — same spirit as its scrambled fallbacks).

BC_TILE = 16          # tile spans BC_TILE x BC_TILE pixels
BC_SMAX = 16          # samples per pixel stored in the tile
_BC_CACHE = {}


def _bc_tile(seed: int = 0):
    """(T, T, SMAX, 2) toroidal best-candidate intra-pixel offsets."""
    key = int(seed)
    if key in _BC_CACHE:
        return _BC_CACHE[key]
    t = BC_TILE
    m = t * t * BC_SMAX
    rng = np.random.RandomState(1234 + seed)
    pts = np.empty((m, 2), np.float32)
    pts[0] = rng.rand(2) * t
    n_cand = 12
    chunk = np.empty((n_cand, 2), np.float32)
    for i in range(1, m):
        cand = rng.rand(n_cand, 2).astype(np.float32) * t
        # toroidal min distance to existing points, vectorized
        d = np.abs(cand[:, None, :] - pts[None, :i, :])
        d = np.minimum(d, t - d)
        dmin = (d ** 2).sum(-1).min(axis=1)
        pts[i] = cand[int(np.argmax(dmin))]
        chunk = cand
    del chunk
    # bucket into pixels; fill deficits with jittered strata
    table = np.empty((t, t, BC_SMAX, 2), np.float32)
    ix = np.minimum(pts[:, 0].astype(np.int64), t - 1)
    iy = np.minimum(pts[:, 1].astype(np.int64), t - 1)
    for y in range(t):
        for x in range(t):
            sel = pts[(ix == x) & (iy == y)] - (x, y)
            sel = sel[rng.permutation(len(sel))]
            if len(sel) >= BC_SMAX:
                cell = sel[:BC_SMAX]
            else:
                pad = rng.rand(BC_SMAX - len(sel), 2).astype(np.float32)
                cell = np.concatenate([sel, pad]) if len(sel) else pad
            table[y, x] = cell
    _BC_CACHE[key] = table
    return table


@partial(jax.tree_util.register_dataclass,
         data_fields=["seed", "u_vec", "bc"],
         meta_fields=["kind", "spp", "nx", "ny", "jitter"])
@dataclasses.dataclass
class Sampler:
    kind: int
    spp: int
    seed: jnp.ndarray       # () uint32
    nx: int = 1             # stratified strata
    ny: int = 1
    jitter: bool = True
    u_vec: jnp.ndarray = None   # (R, D) primary samples (VECTOR kind only)
    bc: jnp.ndarray = None      # (T, T, SMAX, 2) Poisson tile (BESTCANDIDATE)


def vector_sampler(u_vec) -> Sampler:
    """Sampler whose draws read the explicit primary-sample vector u_vec
    (R, D): dimension d -> u_vec[:, d mod D]. This is how the Metropolis
    renderer drives the ordinary integrators with mutated sample vectors
    (the _MLTSample analog, renderers/metropolis_renderer.dart)."""
    return Sampler(VECTOR, 1, jnp.uint32(0), u_vec=u_vec)


def _round_pow2(n):
    return 1 << max(int(np.ceil(np.log2(max(n, 1)))), 0)


def make_sampler(kind: str, spp: int = 4, seed: int = 0, jitter=True) -> Sampler:
    if kind == "lowdiscrepancy" or kind == "02sequence":
        # pow-2 spp rounding (low_discrepancy_sampler.dart:60-62)
        return Sampler(LOWDISCREPANCY, _round_pow2(spp), jnp.uint32(seed))
    if kind == "stratified":
        nx = max(int(np.round(np.sqrt(spp))), 1)
        ny = max((spp + nx - 1) // nx, 1)
        return Sampler(STRATIFIED, nx * ny, jnp.uint32(seed), nx, ny, jitter)
    if kind == "random":
        return Sampler(RANDOM, spp, jnp.uint32(seed))
    if kind == "halton":
        return Sampler(HALTON, spp, jnp.uint32(seed))
    if kind == "bestcandidate":
        # real Poisson-disk tile (best_candidate_sampler.dart:31): image
        # dims from the generated toroidal best-candidate table; other
        # dims via the (0,2)-sequence machinery. spp > BC_SMAX reuses the
        # tile with a per-repeat Cranley-Patterson shift (sample_2d), the
        # same table-reuse the reference applies for arbitrary spp
        # (best_candidate_sampler.dart:39)
        return Sampler(BESTCANDIDATE, _round_pow2(spp),
                       jnp.uint32(seed), bc=jnp.asarray(_bc_tile(seed)))
    raise ValueError(f"unknown sampler {kind}")


def _pixel_key(sampler: Sampler, px, py, dim):
    """Per-(pixel, dimension) uint32 scramble key. dim may be a python int
    or a traced int scalar (e.g. a fori_loop index)."""
    d = (jnp.asarray(dim).astype(U32) + U32(1)) * U32(0x9e3779b9)
    h = smp.hash_u32(px.astype(U32) ^ (py.astype(U32) << 16) ^ d)
    return smp.hash_u32(h ^ sampler.seed)


def sample_2d(sampler: Sampler, px, py, s_idx, dim: int):
    """(R,) pixel coords + sample indices -> V2 in [0,1)^2."""
    from .core.math import V2
    if sampler.kind == VECTOR:
        d = sampler.u_vec.shape[1]
        return V2(sampler.u_vec[:, dim % d],
                  sampler.u_vec[:, (dim + 1) % d])
    if sampler.kind == BESTCANDIDATE and dim == 0:
        t = BC_TILE
        cell = sampler.bc[py % t, px % t]            # (SMAX, 2) rows
        sl = s_idx % BC_SMAX
        x = cell[jnp.arange(px.shape[0]), sl, 0]
        y = cell[jnp.arange(px.shape[0]), sl, 1]
        # spp > SMAX: repeat the tile under a per-repeat Cranley-Patterson
        # toroidal shift (repeat 0 = the verbatim blue-noise table)
        if sampler.spp > BC_SMAX:
            rep = (s_idx.astype(U32) // U32(BC_SMAX))
            kcp = sampler.seed ^ U32(0xBC5D1234)
            ox = smp.rng_uniform(kcp, rep * U32(2))
            oy = smp.rng_uniform(kcp, rep * U32(2) + U32(1))
            shift = rep > U32(0)
            x = jnp.where(shift, (x + ox) % 1.0, x)
            y = jnp.where(shift, (y + oy) % 1.0, y)
        return V2(x, y)
    if sampler.kind in (LOWDISCREPANCY, BESTCANDIDATE):
        scr = (_pixel_key(sampler, px, py, dim),
               _pixel_key(sampler, px, py, dim + 1000))
        # independent draw ORDER per dimension group (see
        # sampling.index_permute — the LDShuffleScrambled analog)
        sp = smp.index_permute(s_idx.astype(U32), sampler.spp,
                               _pixel_key(sampler, px, py, dim + 2000))
        return smp.sample02(sp, scr)
    if sampler.kind == STRATIFIED:
        # jittered strata of the (nx, ny) grid, stratum order shuffled
        # independently per (pixel, dim) (StratifiedSampler + Shuffle)
        k = _pixel_key(sampler, px, py, dim)
        perm_idx = smp.index_permute(s_idx.astype(U32), sampler.spp, k)
        sx = (perm_idx % U32(sampler.nx)).astype(jnp.float32)
        sy = (perm_idx // U32(sampler.nx)).astype(jnp.float32)
        jx = smp.rng_uniform(k, s_idx.astype(U32) * U32(2))
        jy = smp.rng_uniform(k, s_idx.astype(U32) * U32(2) + U32(1))
        if not sampler.jitter:
            jx = jnp.full_like(jx, 0.5)
            jy = jnp.full_like(jy, 0.5)
        return V2((sx + jx) / sampler.nx, (sy + jy) / sampler.ny)
    if sampler.kind == HALTON:
        # global permuted-Halton indexed by (pixel-hash + sample) — statistical
        # equivalent of halton_sampler.dart's image-window sequence
        k = _pixel_key(sampler, px, py, 0)
        n = s_idx.astype(U32) ^ (k >> 8)
        b1 = int(smp._PRIMES[(2 * dim) % 40])
        b2 = int(smp._PRIMES[(2 * dim + 1) % 40])
        return V2(smp.radical_inverse(n, b1), smp.radical_inverse(n, b2))
    # RANDOM
    k = _pixel_key(sampler, px, py, dim)
    return V2(smp.rng_uniform(k, s_idx.astype(U32) * U32(2)),
              smp.rng_uniform(k, s_idx.astype(U32) * U32(2) + U32(1)))


def sample_1d(sampler: Sampler, px, py, s_idx, dim: int):
    if sampler.kind == VECTOR:
        return sampler.u_vec[:, dim % sampler.u_vec.shape[1]]
    if sampler.kind in (LOWDISCREPANCY, BESTCANDIDATE):
        scr = _pixel_key(sampler, px, py, dim)
        sp = smp.index_permute(s_idx.astype(U32), sampler.spp,
                               _pixel_key(sampler, px, py, dim + 2000))
        return smp.van_der_corput(sp, scr)
    if sampler.kind == STRATIFIED:
        k = _pixel_key(sampler, px, py, dim)
        perm_idx = smp.index_permute(s_idx.astype(U32), sampler.spp, k)
        j = smp.rng_uniform(k, s_idx.astype(U32))
        if not sampler.jitter:
            j = jnp.full_like(j, 0.5)
        return (perm_idx.astype(jnp.float32) + j) / sampler.spp
    if sampler.kind == HALTON:
        k = _pixel_key(sampler, px, py, 0)
        n = s_idx.astype(U32) ^ (k >> 8)
        b = int(smp._PRIMES[(2 * dim) % 40])
        return smp.radical_inverse(n, b)
    k = _pixel_key(sampler, px, py, dim)
    return smp.rng_uniform(k, s_idx.astype(U32))


def camera_samples(sampler: Sampler, px, py, s_idx,
                   shutter=(0.0, 1.0)) -> CameraSamples:
    """Image/lens/time sample triple for a wavefront (LDPixelSample layout,
    montecarlo.dart:407-474). px/py int32 raster pixel; returns continuous
    raster image_xy = pixel + [0,1)^2 offset."""
    from .core.math import V2
    img = sample_2d(sampler, px, py, s_idx, 0)
    lens = sample_2d(sampler, px, py, s_idx, 2)
    time_u = sample_1d(sampler, px, py, s_idx, 4)
    image_xy = V2(px.astype(jnp.float32) + img.x,
                  py.astype(jnp.float32) + img.y)
    return CameraSamples(image_xy=image_xy, lens_uv=lens, time_u=time_u)
