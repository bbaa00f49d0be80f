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


class V3(NamedTuple):
    """Component-SoA 3-vector / RGB color: three (R,) lane-packed arrays.

    THE wavefront layout (VERDICT r3 #2 / PERF_NOTES): (R, 3) arrays place
    the 3-channel axis in the 128-lane minor dimension (3/128 lanes used,
    measured ~40x memory inflation on every elementwise fusion); component
    arrays are fully lane-packed. All hot-path state — ray o/d, normals,
    throughput, radiance — is V3 end-to-end so no layout transposes exist
    at any module boundary.
    """
    x: jnp.ndarray
    y: jnp.ndarray
    z: jnp.ndarray

    # -- arithmetic (component-wise; scalar/broadcastable second operands ok)
    def __add__(self, o):
        if isinstance(o, V3):
            return V3(self.x + o.x, self.y + o.y, self.z + o.z)
        return V3(self.x + o, self.y + o, self.z + o)

    __radd__ = __add__

    def __sub__(self, o):
        if isinstance(o, V3):
            return V3(self.x - o.x, self.y - o.y, self.z - o.z)
        return V3(self.x - o, self.y - o, self.z - o)

    def __rsub__(self, o):
        return V3(o - self.x, o - self.y, o - self.z)

    def __mul__(self, o):
        if isinstance(o, V3):
            return V3(self.x * o.x, self.y * o.y, self.z * o.z)
        return V3(self.x * o, self.y * o, self.z * o)

    __rmul__ = __mul__

    def __truediv__(self, o):
        if isinstance(o, V3):
            return V3(self.x / o.x, self.y / o.y, self.z / o.z)
        return V3(self.x / o, self.y / o, self.z / o)

    def __rtruediv__(self, o):
        return V3(o / self.x, o / self.y, o / self.z)

    def __neg__(self):
        return V3(-self.x, -self.y, -self.z)

    def map(self, fn):
        return V3(fn(self.x), fn(self.y), fn(self.z))

    @property
    def shape(self):
        return jnp.shape(self.x)

    def astype(self, dt):
        return V3(self.x.astype(dt), self.y.astype(dt), self.z.astype(dt))


class V2(NamedTuple):
    """Component-SoA 2-vector (uv coords, 2D samples)."""
    x: jnp.ndarray
    y: jnp.ndarray

    def __add__(self, o):
        if isinstance(o, V2):
            return V2(self.x + o.x, self.y + o.y)
        return V2(self.x + o, self.y + o)

    __radd__ = __add__

    def __sub__(self, o):
        if isinstance(o, V2):
            return V2(self.x - o.x, self.y - o.y)
        return V2(self.x - o, self.y - o)

    def __mul__(self, o):
        if isinstance(o, V2):
            return V2(self.x * o.x, self.y * o.y)
        return V2(self.x * o, self.y * o)

    __rmul__ = __mul__

    @property
    def shape(self):
        return jnp.shape(self.x)


def v3(x, y, z):
    """V3 from components (scalars broadcast)."""
    return V3(jnp.asarray(x, jnp.float32), jnp.asarray(y, jnp.float32),
              jnp.asarray(z, jnp.float32))


def splat3(c):
    """V3 of scalar components from a length-3 constant (broadcasts against
    any (R,) array)."""
    return V3(jnp.float32(c[0]), jnp.float32(c[1]), jnp.float32(c[2]))


def v3zeros(shape):
    z = jnp.zeros(shape, jnp.float32)
    return V3(z, z, z)


def v3ones(shape):
    o = jnp.ones(shape, jnp.float32)
    return V3(o, o, o)


def v3full(shape, c):
    return V3(jnp.full(shape, c[0], jnp.float32),
              jnp.full(shape, c[1], jnp.float32),
              jnp.full(shape, c[2], jnp.float32))


def from_arr(a):
    """(..., 3) array -> V3 (boundary adapter; avoid in hot loops)."""
    if isinstance(a, V3):
        return a
    return V3(a[..., 0], a[..., 1], a[..., 2])


def to_arr(v):
    """V3 -> (..., 3) array (boundary adapter)."""
    if not isinstance(v, V3):
        return v
    return jnp.stack([jnp.asarray(v.x, jnp.float32),
                      jnp.asarray(v.y, jnp.float32),
                      jnp.asarray(v.z, jnp.float32)], axis=-1)


def from_arr2(a):
    if isinstance(a, V2):
        return a
    return V2(a[..., 0], a[..., 1])


def to_arr2(v):
    if not isinstance(v, V2):
        return v
    return jnp.stack([v.x, v.y], axis=-1)


def where3(m, a, b):
    """Masked select; a/b may be V3 or scalar."""
    ax, ay, az = (a.x, a.y, a.z) if isinstance(a, V3) else (a, a, a)
    bx, by, bz = (b.x, b.y, b.z) if isinstance(b, V3) else (b, b, b)
    return V3(jnp.where(m, ax, bx), jnp.where(m, ay, by),
              jnp.where(m, az, bz))


def gather3(v, idx):
    """Row gather of a component-SoA table: V3 of (N,) -> V3 of (R,)."""
    return V3(v.x[idx], v.y[idx], v.z[idx])


def bcast3(v, shape):
    return V3(jnp.broadcast_to(v.x, shape), jnp.broadcast_to(v.y, shape),
              jnp.broadcast_to(v.z, shape))


def vec(x, y, z, dtype=jnp.float32):
    return jnp.stack([jnp.asarray(x, dtype), jnp.asarray(y, dtype),
                      jnp.asarray(z, dtype)], axis=-1)


def dot(a, b):
    """Dot product (vector.dart Dot). V3 pairs or trailing-3-axis arrays."""
    if isinstance(a, V3):
        return a.x * b.x + a.y * b.y + a.z * b.z
    return jnp.sum(a * b, axis=-1)


def absdot(a, b):
    return jnp.abs(dot(a, b))


def cross(a, b):
    if isinstance(a, V3):
        return V3(a.y * b.z - a.z * b.y,
                  a.z * b.x - a.x * b.z,
                  a.x * b.y - a.y * b.x)
    return jnp.cross(a, b)


def length_sq(v):
    return dot(v, v)


def length(v):
    return jnp.sqrt(length_sq(v))


def normalize(v):
    """Safe normalize: zero vectors stay zero (avoids NaN poisoning under jit)."""
    if isinstance(v, V3):
        inv = jax.lax.rsqrt(jnp.maximum(length_sq(v), 1e-30))
        return v * inv
    len2 = length_sq(v)[..., None]
    return v * jax.lax.rsqrt(jnp.maximum(len2, 1e-30))


def distance(a, b):
    return length(b - a)


def distance_sq(a, b):
    return length_sq(b - a)


def face_forward(n, v):
    """Flip n to lie in the hemisphere of v (vector.dart FaceForward)."""
    if isinstance(n, V3):
        return where3(dot(n, v) < 0.0, -n, n)
    return jnp.where(dot(n, v)[..., None] < 0.0, -n, n)


def coordinate_system(v1):
    """Build an orthonormal basis around v1 (vector.dart CoordinateSystem).

    Returns (v2, v3) with v1 x v2 = v3. Branch-free (jnp.where) version of the
    reference's |x|>|y| split.
    """
    if isinstance(v1, V3):
        x, y, z = v1.x, v1.y, v1.z
        big_x = jnp.abs(x) > jnp.abs(y)
        inv_a = jax.lax.rsqrt(
            jnp.maximum(jnp.where(big_x, x * x + z * z, y * y + z * z),
                        1e-30))
        zero = jnp.zeros_like(x)
        v2 = where3(big_x, V3(-z * inv_a, zero, x * inv_a),
                    V3(zero, z * inv_a, -y * inv_a))
        return v2, cross(v1, v2)
    x, y, z = v1[..., 0], v1[..., 1], v1[..., 2]
    big_x = jnp.abs(x) > jnp.abs(y)
    inv_a = jax.lax.rsqrt(jnp.where(big_x, x * x + z * z, y * y + z * z))
    v2 = jnp.where(
        big_x[..., None],
        jnp.stack([-z * inv_a, jnp.zeros_like(x), x * inv_a], axis=-1),
        jnp.stack([jnp.zeros_like(x), z * inv_a, -y * inv_a], axis=-1),
    )
    v3_ = cross(v1, v2)
    return v2, v3_


def spherical_direction(sintheta, costheta, phi) -> V3:
    """(vector.dart SphericalDirection)"""
    return V3(sintheta * jnp.cos(phi), sintheta * jnp.sin(phi), costheta)


def spherical_direction_basis(sintheta, costheta, phi, x, y, z):
    if isinstance(x, V3):
        return (x * (sintheta * jnp.cos(phi)) + y * (sintheta * jnp.sin(phi))
                + z * costheta)
    return (x * (sintheta * jnp.cos(phi))[..., None]
            + y * (sintheta * jnp.sin(phi))[..., None]
            + z * costheta[..., None])


def spherical_theta(v):
    zc = v.z if isinstance(v, V3) else v[..., 2]
    return jnp.arccos(jnp.clip(zc, -1.0, 1.0))


def spherical_phi(v):
    if isinstance(v, V3):
        p = jnp.arctan2(v.y, v.x)
    else:
        p = jnp.arctan2(v[..., 1], v[..., 0])
    return jnp.where(p < 0.0, p + 2.0 * jnp.pi, p)


def xform_point3(m, p: V3) -> V3:
    """Apply a (4,4) matrix to a V3 point wavefront."""
    return V3(m[0, 0] * p.x + m[0, 1] * p.y + m[0, 2] * p.z + m[0, 3],
              m[1, 0] * p.x + m[1, 1] * p.y + m[1, 2] * p.z + m[1, 3],
              m[2, 0] * p.x + m[2, 1] * p.y + m[2, 2] * p.z + m[2, 3])


def xform_vector3(m, v: V3) -> V3:
    return V3(m[0, 0] * v.x + m[0, 1] * v.y + m[0, 2] * v.z,
              m[1, 0] * v.x + m[1, 1] * v.y + m[1, 2] * v.z,
              m[2, 0] * v.x + m[2, 1] * v.y + m[2, 2] * v.z)


def xform_vector3_rows(mr, v: V3) -> V3:
    """Per-ray matrices as a V3-of-V3 rows structure ((row, col) of (R,)
    arrays): mr[i][j] is matrix entry (i, j) per ray."""
    return V3(mr[0][0] * v.x + mr[0][1] * v.y + mr[0][2] * v.z,
              mr[1][0] * v.x + mr[1][1] * v.y + mr[1][2] * v.z,
              mr[2][0] * v.x + mr[2][1] * v.y + mr[2][2] * v.z)


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

    o, d: V3 of (N,) component arrays (end-to-end SoA: lane-packed);
    tmin/tmax/time: (N,). Differentials are optional (None) — carried as
    rx/ry origin+dir used for texture filtering (ray_differential.dart
    fields), scaled by 1/sqrt(spp) before integration
    (sampler_renderer.dart:166).
    """
    o: V3
    d: V3
    tmin: jnp.ndarray
    tmax: jnp.ndarray
    time: jnp.ndarray

    @property
    def n(self):
        return self.o.x.shape[0]

    def at(self, t):
        return self.o + self.d * t


def make_rays(o, d, tmin=None, tmax=None, time=None):
    o = from_arr(o)
    d = from_arr(d)
    n = o.x.shape[0]
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
