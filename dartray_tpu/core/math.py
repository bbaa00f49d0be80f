"""Vectorized 3D math over SoA device arrays.

TPU-native replacement for DartRay's scalar geometric types
(reference: lib/core/vector.dart:23, point.dart:23, normal.dart:23,
bbox.dart:23, ray.dart:23, ray_differential.dart). Vectors/points/normals are
plain ``(..., 3)`` float32 arrays; rays are SoA NamedTuples of arrays so whole
wavefronts live in single device buffers.
"""
from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

INF = jnp.float32(jnp.inf)
EPS = jnp.float32(1e-7)
MACHINE_EPSILON = float(jnp.finfo(jnp.float32).eps) * 0.5


def vec(x, y, z, dtype=jnp.float32):
    return jnp.stack([jnp.asarray(x, dtype), jnp.asarray(y, dtype),
                      jnp.asarray(z, dtype)], axis=-1)


def dot(a, b):
    """Dot product over the trailing 3-axis (vector.dart Dot)."""
    return jnp.sum(a * b, axis=-1)


def absdot(a, b):
    return jnp.abs(dot(a, b))


def cross(a, b):
    return jnp.cross(a, b)


def length_sq(v):
    return dot(v, v)


def length(v):
    return jnp.sqrt(length_sq(v))


def normalize(v):
    """Safe normalize: zero vectors stay zero (avoids NaN poisoning under jit)."""
    len2 = length_sq(v)[..., None]
    return v * jax.lax.rsqrt(jnp.maximum(len2, 1e-30))


def distance(a, b):
    return length(b - a)


def distance_sq(a, b):
    return length_sq(b - a)


def face_forward(n, v):
    """Flip n to lie in the hemisphere of v (vector.dart FaceForward)."""
    return jnp.where(dot(n, v)[..., None] < 0.0, -n, n)


def coordinate_system(v1):
    """Build an orthonormal basis around v1 (vector.dart CoordinateSystem).

    Returns (v2, v3) with v1 x v2 = v3. Branch-free (jnp.where) version of the
    reference's |x|>|y| split.
    """
    x, y, z = v1[..., 0], v1[..., 1], v1[..., 2]
    big_x = jnp.abs(x) > jnp.abs(y)
    inv_a = jax.lax.rsqrt(jnp.where(big_x, x * x + z * z, y * y + z * z))
    v2 = jnp.where(
        big_x[..., None],
        jnp.stack([-z * inv_a, jnp.zeros_like(x), x * inv_a], axis=-1),
        jnp.stack([jnp.zeros_like(x), z * inv_a, -y * inv_a], axis=-1),
    )
    v3 = cross(v1, v2)
    return v2, v3


def spherical_direction(sintheta, costheta, phi):
    """(vector.dart SphericalDirection)"""
    return jnp.stack([sintheta * jnp.cos(phi),
                      sintheta * jnp.sin(phi),
                      costheta], axis=-1)


def spherical_direction_basis(sintheta, costheta, phi, x, y, z):
    return (x * (sintheta * jnp.cos(phi))[..., None]
            + y * (sintheta * jnp.sin(phi))[..., None]
            + z * costheta[..., None])


def spherical_theta(v):
    return jnp.arccos(jnp.clip(v[..., 2], -1.0, 1.0))


def spherical_phi(v):
    p = jnp.arctan2(v[..., 1], v[..., 0])
    return jnp.where(p < 0.0, p + 2.0 * jnp.pi, p)


def lerp(t, a, b):
    return a + t * (b - a)


def quadratic(a, b, c):
    """Stable quadratic solve (common.dart:140 Quadratic).

    Returns (has_roots, t0, t1) with t0 <= t1; vectorized + branch-free.
    Where has_roots is False, t0/t1 are garbage and must be masked.
    """
    disc = b * b - 4.0 * a * c
    has = disc >= 0.0
    root = jnp.sqrt(jnp.maximum(disc, 0.0))
    q = jnp.where(b < 0.0, -0.5 * (b - root), -0.5 * (b + root))
    # Guard divisions; masked out when has==False or degenerate.
    t0 = q / jnp.where(jnp.abs(a) < 1e-30, 1.0, a)
    t1 = c / jnp.where(jnp.abs(q) < 1e-30, 1.0, q)
    lo = jnp.minimum(t0, t1)
    hi = jnp.maximum(t0, t1)
    return has, lo, hi


class Rays(NamedTuple):
    """SoA ray wavefront (ray.dart:23 / ray_differential.dart).

    o, d: (N, 3); tmin/tmax/time: (N,). Differentials are optional (None) —
    carried as rx/ry origin+dir used for texture filtering
    (ray_differential.dart fields), scaled by 1/sqrt(spp) before integration
    (sampler_renderer.dart:166).
    """
    o: jnp.ndarray
    d: jnp.ndarray
    tmin: jnp.ndarray
    tmax: jnp.ndarray
    time: jnp.ndarray

    @property
    def n(self):
        return self.o.shape[0]

    def at(self, t):
        return self.o + self.d * t[..., None]


def make_rays(o, d, tmin=None, tmax=None, time=None):
    n = o.shape[0]
    if tmin is None:
        tmin = jnp.zeros((n,), jnp.float32)
    elif jnp.ndim(tmin) == 0:
        tmin = jnp.full((n,), tmin, jnp.float32)
    if tmax is None:
        tmax = jnp.full((n,), INF, jnp.float32)
    elif jnp.ndim(tmax) == 0:
        tmax = jnp.full((n,), tmax, jnp.float32)
    if time is None:
        time = jnp.zeros((n,), jnp.float32)
    elif jnp.ndim(time) == 0:
        time = jnp.full((n,), time, jnp.float32)
    return Rays(o=o, d=d, tmin=tmin, tmax=tmax, time=time)


# --- BBox ops on (2,3) or (N,2,3) arrays (bbox.dart) -----------------------

def bbox_empty():
    return jnp.stack([jnp.full((3,), jnp.inf, jnp.float32),
                      jnp.full((3,), -jnp.inf, jnp.float32)])


def bbox_union(a, b):
    return jnp.stack([jnp.minimum(a[..., 0, :], b[..., 0, :]),
                      jnp.maximum(a[..., 1, :], b[..., 1, :])], axis=-2)


def bbox_union_point(b, p):
    return jnp.stack([jnp.minimum(b[..., 0, :], p),
                      jnp.maximum(b[..., 1, :], p)], axis=-2)


def bbox_surface_area(b):
    d = jnp.maximum(b[..., 1, :] - b[..., 0, :], 0.0)
    return 2.0 * (d[..., 0] * d[..., 1] + d[..., 1] * d[..., 2]
                  + d[..., 2] * d[..., 0])


def bbox_intersect_p(bounds_lo, bounds_hi, o, inv_d, tmin, tmax):
    """Vectorized slab test (bbox.dart intersectP / bvh_accel.dart traversal).

    All args broadcast; returns boolean hit mask. Robust to inf*0 by using
    min/max ordering on slab distances.
    """
    t0 = (bounds_lo - o) * inv_d
    t1 = (bounds_hi - o) * inv_d
    tnear = jnp.minimum(t0, t1)
    tfar = jnp.maximum(t0, t1)
    t_enter = jnp.maximum(jnp.max(tnear, axis=-1), tmin)
    t_exit = jnp.minimum(jnp.min(tfar, axis=-1), tmax)
    return t_enter <= t_exit
