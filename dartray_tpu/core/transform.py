"""4x4 transforms, factory transforms, quaternions, animated transforms.

TPU-native replacement for lib/core/matrix4x4.dart, transform.dart:27,
quaternion.dart, animated_transform.dart. A Transform is a pair of (4,4)
float32 arrays (m, m_inv); applications are vectorized over point/vector
batches of shape (N, 3). Host-side scene compilation composes transforms with
numpy-compatible jnp ops; device kernels only see the final matrices.
"""
from __future__ import annotations

import math as _pymath
from typing import NamedTuple

import numpy as np
import jax.numpy as jnp

from . import math as vm


class Transform(NamedTuple):
    m: jnp.ndarray       # (4, 4)
    m_inv: jnp.ndarray   # (4, 4)

    def inverse(self):
        return Transform(self.m_inv, self.m)

    def __mul__(self, other: "Transform"):
        """Composition t1 * t2 applies t2 first (transform.dart operator*)."""
        return Transform(self.m @ other.m, other.m_inv @ self.m_inv)

    # --- applications (vectorized over (..., 3)) ---------------------------
    def xform_point(self, p):
        r = p @ self.m[:3, :3].T + self.m[:3, 3]
        w = p @ self.m[3, :3] + self.m[3, 3]
        return r / jnp.where(jnp.abs(w) < 1e-30, 1.0, w)[..., None]

    def xform_vector(self, v):
        return v @ self.m[:3, :3].T

    def xform_normal(self, n):
        """Normals transform by the inverse transpose (transform.dart)."""
        return n @ self.m_inv[:3, :3]

    def xform_rays(self, rays: vm.Rays) -> vm.Rays:
        return rays._replace(o=self.xform_point(rays.o),
                             d=self.xform_vector(rays.d))

    def xform_bbox(self, b):
        """Transform AABB (2,3) by transforming all 8 corners."""
        lo, hi = b[0], b[1]
        corners = jnp.stack([
            jnp.stack([jnp.where(jnp.asarray([(i >> k) & 1 for k in range(3)],
                                             bool), hi, lo)])
            for i in range(8)
        ]).reshape(8, 3)
        pts = self.xform_point(corners)
        return jnp.stack([jnp.min(pts, axis=0), jnp.max(pts, axis=0)])

    def swaps_handedness(self):
        det = np.linalg.det(np.asarray(self.m)[:3, :3])
        return det < 0.0

    def has_scale(self):
        m3 = np.asarray(self.m)[:3, :3]
        la = np.sum(m3 ** 2, axis=1)
        return bool(np.any(np.abs(la - 1.0) > 1e-3))


# Factories build HOST numpy matrices: scene compilation composes and reads
# these eagerly, and a single eager device op / device->host readback costs
# seconds-to-minutes over a tunneled chip (measured: one 4x4 np.asarray of a
# device array = 193 s). Device kernels receive them as jit constants/args.

def identity() -> Transform:
    return Transform(np.eye(4, dtype=np.float32),
                     np.eye(4, dtype=np.float32))


def from_matrix(m) -> Transform:
    m = np.asarray(m, np.float32).reshape(4, 4)
    return Transform(m, np.linalg.inv(m).astype(np.float32))


def translate(d) -> Transform:
    """(transform.dart:214 Translate)"""
    d = np.asarray(d, np.float32)
    m = np.eye(4, dtype=np.float32)
    m[:3, 3] = d
    mi = np.eye(4, dtype=np.float32)
    mi[:3, 3] = -d
    return Transform(m, mi)


def scale(x, y, z) -> Transform:
    """(transform.dart Scale)"""
    s = np.asarray([x, y, z], np.float32)
    m = np.diag(np.concatenate([s, np.ones(1, np.float32)]))
    mi = np.diag(np.concatenate([1.0 / s, np.ones(1, np.float32)]))
    return Transform(m, mi)


def _rot(axis_idx, angle_deg):
    a = _pymath.radians(float(angle_deg))
    c, s = _pymath.cos(a), _pymath.sin(a)
    m = np.eye(4, dtype=np.float32)
    i, j = [(1, 2), (0, 2), (0, 1)][axis_idx]
    if axis_idx == 1:  # RotateY has transposed sign layout
        m[i, i] = c; m[i, j] = s; m[j, i] = -s; m[j, j] = c
    else:
        m[i, i] = c; m[i, j] = -s; m[j, i] = s; m[j, j] = c
    return Transform(m, m.T.copy())


def rotate_x(deg) -> Transform:
    return _rot(0, deg)


def rotate_y(deg) -> Transform:
    return _rot(1, deg)


def rotate_z(deg) -> Transform:
    return _rot(2, deg)


def rotate(deg, axis) -> Transform:
    """Rotation about an arbitrary axis (transform.dart Rotate)."""
    a = np.asarray(axis, np.float64)
    a = a / np.linalg.norm(a)
    s = _pymath.sin(_pymath.radians(float(deg)))
    c = _pymath.cos(_pymath.radians(float(deg)))
    x, y, z = a
    m = np.eye(4)
    m[0, 0] = x * x + (1 - x * x) * c
    m[0, 1] = x * y * (1 - c) - z * s
    m[0, 2] = x * z * (1 - c) + y * s
    m[1, 0] = x * y * (1 - c) + z * s
    m[1, 1] = y * y + (1 - y * y) * c
    m[1, 2] = y * z * (1 - c) - x * s
    m[2, 0] = x * z * (1 - c) - y * s
    m[2, 1] = y * z * (1 - c) + x * s
    m[2, 2] = z * z + (1 - z * z) * c
    mj = np.asarray(m, np.float32)
    return Transform(mj, mj.T.copy())


def look_at(eye, look, up) -> Transform:
    """Camera-to-world transform (transform.dart LookAt)."""
    eye = np.asarray(eye, np.float64)
    look = np.asarray(look, np.float64)
    up = np.asarray(up, np.float64)
    d = look - eye
    d = d / np.linalg.norm(d)
    left = np.cross(up / np.linalg.norm(up), d)
    nl = np.linalg.norm(left)
    if nl < 1e-12:
        # up parallel to dir; pick any orthogonal
        up = np.array([0.0, 0.0, 1.0]) if abs(d[2]) < 0.9 else np.array([1.0, 0.0, 0.0])
        left = np.cross(up, d)
        nl = np.linalg.norm(left)
    left /= nl
    new_up = np.cross(d, left)
    m = np.eye(4)
    m[:3, 0] = left
    m[:3, 1] = new_up
    m[:3, 2] = d
    m[:3, 3] = eye
    mj = np.asarray(m, np.float32)
    return Transform(mj, np.asarray(np.linalg.inv(m), np.float32))


def orthographic(znear, zfar) -> Transform:
    """(transform.dart Orthographic)"""
    return scale(1.0, 1.0, 1.0 / (zfar - znear)) * translate([0.0, 0.0, -znear])


def perspective(fov_deg, n, f) -> Transform:
    """(transform.dart Perspective): project z to [0,1], divide by z."""
    persp = np.asarray([
        [1, 0, 0, 0],
        [0, 1, 0, 0],
        [0, 0, f / (f - n), -f * n / (f - n)],
        [0, 0, 1, 0]], np.float32)
    inv_tan = 1.0 / _pymath.tan(_pymath.radians(float(fov_deg)) / 2.0)
    return scale(inv_tan, inv_tan, 1.0) * from_matrix(persp)


# --- Quaternions + AnimatedTransform (motion blur) -------------------------

def quat_from_matrix(m):
    """Rotation matrix (3,3 block of 4,4) -> quaternion (x,y,z,w).

    (quaternion.dart fromMatrix), numerically-stable trace branch; host-side
    (numpy) since it runs at scene-compile time.
    """
    import numpy as np
    m = np.asarray(m, np.float64)
    trace = m[0, 0] + m[1, 1] + m[2, 2]
    q = np.zeros(4)
    if trace > 0.0:
        s = _pymath.sqrt(trace + 1.0)
        q[3] = s / 2.0
        s = 0.5 / s
        q[0] = (m[2, 1] - m[1, 2]) * s
        q[1] = (m[0, 2] - m[2, 0]) * s
        q[2] = (m[1, 0] - m[0, 1]) * s
    else:
        nxt = [1, 2, 0]
        i = 0
        if m[1, 1] > m[0, 0]:
            i = 1
        if m[2, 2] > m[i, i]:
            i = 2
        j, k = nxt[i], nxt[nxt[i]]
        s = _pymath.sqrt((m[i, i] - (m[j, j] + m[k, k])) + 1.0)
        qv = np.zeros(3)
        qv[i] = s * 0.5
        if s != 0.0:
            s = 0.5 / s
        q[3] = (m[k, j] - m[j, k]) * s
        qv[j] = (m[j, i] + m[i, j]) * s
        qv[k] = (m[k, i] + m[i, k]) * s
        q[:3] = qv
    return jnp.asarray(q, jnp.float32)


def quat_to_matrix(q):
    """Quaternion (..., 4) -> rotation (..., 4, 4) (quaternion.dart toMatrix)."""
    x, y, z, w = q[..., 0], q[..., 1], q[..., 2], q[..., 3]
    xx, yy, zz = x * x, y * y, z * z
    xy, xz, yz = x * y, x * z, y * z
    wx, wy, wz = w * x, w * y, w * z
    zero = jnp.zeros_like(x)
    one = jnp.ones_like(x)
    rows = [
        [1 - 2 * (yy + zz), 2 * (xy + wz), 2 * (xz - wy), zero],
        [2 * (xy - wz), 1 - 2 * (xx + zz), 2 * (yz + wx), zero],
        [2 * (xz + wy), 2 * (yz - wx), 1 - 2 * (xx + yy), zero],
        [zero, zero, zero, one],
    ]
    m = jnp.stack([jnp.stack(r, axis=-1) for r in rows], axis=-2)
    # NOTE: this is the transpose convention of quaternion.dart toMatrix
    # (reference stores column-major-looking layout); transpose to match
    # pbrt's m[row][col].
    return jnp.swapaxes(m, -1, -2)


def slerp(t, q1, q2):
    """Spherical lerp (quaternion.dart Slerp), branch-free."""
    cos_theta = jnp.sum(q1 * q2, axis=-1)
    near = cos_theta > 0.9995
    q_lin = (1.0 - t)[..., None] * q1 + t[..., None] * q2
    q_lin = q_lin / jnp.linalg.norm(q_lin, axis=-1, keepdims=True)
    theta = jnp.arccos(jnp.clip(cos_theta, -1.0, 1.0))
    thetap = theta * t
    qperp = q2 - q1 * cos_theta[..., None]
    qperp = qperp / jnp.maximum(
        jnp.linalg.norm(qperp, axis=-1, keepdims=True), 1e-12)
    q_sl = q1 * jnp.cos(thetap)[..., None] + qperp * jnp.sin(thetap)[..., None]
    return jnp.where(near[..., None], q_lin, q_sl)


class AnimatedTransform(NamedTuple):
    """Two-keyframe animated transform (animated_transform.dart:61-178).

    Decomposed at scene-compile time into translation T (2,3), rotation quat
    R (2,4), scale S (2,4,4); interpolation at ray time is fully vectorized.
    """
    start_time: jnp.ndarray
    end_time: jnp.ndarray
    t: jnp.ndarray       # (2, 3)
    r: jnp.ndarray       # (2, 4) quats
    s: jnp.ndarray       # (2, 4, 4)
    actually_animated: bool
    start: Transform
    end: Transform

    def interpolate_matrix(self, time):
        """time (N,) -> matrices (N, 4, 4)."""
        dt = jnp.clip((time - self.start_time)
                      / jnp.maximum(self.end_time - self.start_time, 1e-30),
                      0.0, 1.0)
        trans = (1.0 - dt)[:, None] * self.t[0] + dt[:, None] * self.t[1]
        rot = slerp(dt, jnp.broadcast_to(self.r[0], dt.shape + (4,)),
                    jnp.broadcast_to(self.r[1], dt.shape + (4,)))
        sc = (1.0 - dt)[:, None, None] * self.s[0] + dt[:, None, None] * self.s[1]
        rm = quat_to_matrix(rot)
        m = rm @ sc
        m = m.at[..., :3, 3].add(trans)
        return m


def decompose(m):
    """Decompose affine matrix into T, R(quat), S (animated_transform.dart:61).

    Polar decomposition by iterated inverse-transpose averaging; host-side.
    """
    import numpy as np
    m = np.asarray(m, np.float64)
    t = m[:3, 3].copy()
    M = m.copy()
    M[:3, 3] = 0.0
    M[3, :] = [0, 0, 0, 1]
    R = M.copy()
    for _ in range(100):
        Rit = np.linalg.inv(R.T)
        Rnext = 0.5 * (R + Rit)
        norm = np.max(np.sum(np.abs(R - Rnext), axis=1))
        R = Rnext
        if norm < 1e-4:
            break
    S = np.linalg.inv(R) @ M
    return (jnp.asarray(t, jnp.float32), quat_from_matrix(R),
            jnp.asarray(S, jnp.float32))


def animated(start: Transform, end: Transform, t0=0.0, t1=1.0) -> AnimatedTransform:
    import numpy as np
    t_s, r_s, s_s = decompose(np.asarray(start.m))
    t_e, r_e, s_e = decompose(np.asarray(end.m))
    # Keep shortest-path slerp (flip sign if dot < 0), per pbrt.
    if float(jnp.sum(r_s * r_e)) < 0.0:
        r_e = -r_e
    same = bool(jnp.allclose(start.m, end.m))
    return AnimatedTransform(
        start_time=jnp.float32(t0), end_time=jnp.float32(t1),
        t=jnp.stack([t_s, t_e]), r=jnp.stack([r_s, r_e]),
        s=jnp.stack([s_s, s_e]), actually_animated=not same,
        start=start, end=end)
