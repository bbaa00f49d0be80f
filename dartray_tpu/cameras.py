"""Cameras: perspective / orthographic / environment, vectorized ray generation.

TPU-native replacement for lib/core/camera.dart, lib/core/projective_camera.dart
and lib/cameras/ (perspective_camera.dart:45, orthographic_camera.dart,
environment_camera.dart). A camera is a NamedTuple of device matrices/scalars;
``generate_rays`` maps a whole wavefront of CameraSamples to world-space rays
in one shot, including depth-of-field lens sampling
(perspective_camera.dart:70-85) and ray differentials (:93-132) carried as
per-wave dx/dy direction deltas.
"""
from __future__ import annotations

from typing import NamedTuple, Optional

import numpy as np
import jax.numpy as jnp

from .core import math as vm
from .core import sampling as smp
from .core import transform as tr

PERSPECTIVE = 0
ORTHOGRAPHIC = 1
ENVIRONMENT = 2


class CameraSamples(NamedTuple):
    """SoA camera samples (core/camera_sample.dart): continuous image position
    (image_x/y include the +0.5-style jitter already), lens uv, time u."""
    image_xy: "vm.V2"       # raster coords (component SoA)
    lens_uv: "vm.V2"
    time_u: jnp.ndarray     # (R,)


import dataclasses
from functools import partial
import jax


@partial(jax.tree_util.register_dataclass,
         data_fields=["cam2world", "raster2camera", "dx_camera", "dy_camera",
                      "lens_radius", "focal_distance", "shutter_open",
                      "shutter_close", "animated"],
         meta_fields=["kind"])
@dataclasses.dataclass
class Camera:
    """kind is static metadata (hashable, drives Python control flow under
    jit); the rest are traced device values."""
    kind: int
    cam2world: tr.Transform        # world from camera
    raster2camera: jnp.ndarray     # (4,4)
    dx_camera: jnp.ndarray         # (3,) raster-x step in camera space
    dy_camera: jnp.ndarray         # (3,)
    lens_radius: jnp.ndarray       # ()
    focal_distance: jnp.ndarray    # ()
    shutter_open: jnp.ndarray      # ()
    shutter_close: jnp.ndarray     # ()
    animated: Optional[tr.AnimatedTransform]  # motion blur or None (static)


def _raster_to_screen(width, height, screen_window):
    x0, x1, y0, y1 = screen_window
    # raster (0..w, 0..h) -> screen (x0..x1, y1..y0) -> NDC
    s = tr.scale((x1 - x0) / width, (y0 - y1) / height, 1.0)
    t = tr.translate([x0, y1, 0.0])
    return t * s


def default_screen_window(width, height):
    """pbrt convention: [-1,1] along the shorter axis (projective_camera)."""
    aspect = width / height
    if aspect > 1.0:
        return (-aspect, aspect, -1.0, 1.0)
    return (-1.0, 1.0, -1.0 / aspect, 1.0 / aspect)


def perspective(cam2world: tr.Transform, fov_deg: float, width: int,
                height: int, lens_radius=0.0, focal_distance=1e30,
                shutter_open=0.0, shutter_close=1.0, screen_window=None,
                animated=None) -> Camera:
    """(cameras/perspective_camera.dart:134-181; defaults fov 60,
    lensradius 0, focaldistance 1e30, shutter [0,1])."""
    if screen_window is None:
        screen_window = default_screen_window(width, height)
    cam2screen = tr.perspective(fov_deg, 1e-2, 1000.0)
    screen2camera = cam2screen.inverse()
    r2s = _raster_to_screen(width, height, screen_window)
    raster2camera = screen2camera.m @ r2s.m
    # camera-space differentials per raster pixel step
    def r2c(p):
        q = raster2camera @ jnp.asarray([p[0], p[1], 0.0, 1.0], jnp.float32)
        return q[:3] / q[3]
    o = r2c((0.0, 0.0))
    dx = r2c((1.0, 0.0)) - o
    dy = r2c((0.0, 1.0)) - o
    return Camera(PERSPECTIVE, cam2world, jnp.asarray(raster2camera),
                  dx, dy, jnp.float32(lens_radius),
                  jnp.float32(focal_distance), jnp.float32(shutter_open),
                  jnp.float32(shutter_close), animated)


def orthographic(cam2world: tr.Transform, width: int, height: int,
                 lens_radius=0.0, focal_distance=1e30, shutter_open=0.0,
                 shutter_close=1.0, screen_window=None, animated=None) -> Camera:
    """(cameras/orthographic_camera.dart)"""
    if screen_window is None:
        screen_window = default_screen_window(width, height)
    cam2screen = tr.orthographic(0.0, 1.0)
    r2s = _raster_to_screen(width, height, screen_window)
    raster2camera = cam2screen.inverse().m @ r2s.m
    return Camera(ORTHOGRAPHIC, cam2world, jnp.asarray(raster2camera),
                  jnp.asarray([1.0, 0, 0], jnp.float32),
                  jnp.asarray([0, 1.0, 0], jnp.float32),
                  jnp.float32(lens_radius), jnp.float32(focal_distance),
                  jnp.float32(shutter_open), jnp.float32(shutter_close),
                  animated)


def environment(cam2world: tr.Transform, width: int, height: int,
                shutter_open=0.0, shutter_close=1.0, animated=None) -> Camera:
    """Latitude-longitude sphere camera (cameras/environment_camera.dart)."""
    return Camera(ENVIRONMENT, cam2world, jnp.eye(4, dtype=jnp.float32),
                  jnp.asarray([2.0 * np.pi / width, 0, 0], jnp.float32),
                  jnp.asarray([0, np.pi / height, 0], jnp.float32),
                  jnp.float32(0.0), jnp.float32(1e30),
                  jnp.float32(shutter_open), jnp.float32(shutter_close),
                  animated)


class RayDiffs(NamedTuple):
    """Ray differentials: camera-space direction/origin deltas for the +1px
    x/y rays, world space, pre-scaled by 1/sqrt(spp)
    (sampler_renderer.dart:166). All fields V3."""
    rx_o: "vm.V3"
    rx_d: "vm.V3"
    ry_o: "vm.V3"
    ry_d: "vm.V3"


def generate_rays(cam: Camera, samples: CameraSamples, width: int,
                  height: int, diff_scale: float = 1.0):
    """CameraSamples -> (Rays, RayDiffs, weight). Everything vectorized,
    component-SoA (V3) end-to-end.

    Perspective: pbrt generateRayDifferential semantics; DoF via
    ConcentricSampleDisk on the lens (perspective_camera.dart:70-85).
    """
    img = vm.from_arr2(samples.image_xy)
    r = jnp.shape(img.x)[0]
    time = vm.lerp(samples.time_u, cam.shutter_open, cam.shutter_close)
    c2w = cam.cam2world.m            # (4, 4)
    xf_p = lambda p: vm.xform_point3(c2w, p)
    xf_v = lambda v: vm.xform_vector3(c2w, v)
    if cam.kind == ENVIRONMENT:
        theta = np.pi * img.y / height
        phi = 2.0 * np.pi * img.x / width
        d = vm.V3(jnp.sin(theta) * jnp.cos(phi), jnp.cos(theta),
                  jnp.sin(theta) * jnp.sin(phi))
        o = vm.v3zeros((r,))
        # differentials: neighboring-pixel directions
        theta_y = np.pi * (img.y + 1.0) / height
        phi_x = 2.0 * np.pi * (img.x + 1.0) / width
        dx = vm.V3(jnp.sin(theta) * jnp.cos(phi_x), jnp.cos(theta),
                   jnp.sin(theta) * jnp.sin(phi_x))
        dy = vm.V3(jnp.sin(theta_y) * jnp.cos(phi), jnp.cos(theta_y),
                   jnp.sin(theta_y) * jnp.sin(phi))
        o_w = xf_p(o)
        d_w = xf_v(d)
        rays = vm.make_rays(o_w, d_w, tmin=jnp.zeros((r,), jnp.float32),
                            time=time)
        diffs = RayDiffs(o_w, xf_v(dx) * diff_scale + d_w * (1 - diff_scale),
                         o_w, xf_v(dy) * diff_scale + d_w * (1 - diff_scale))
        return rays, diffs, jnp.ones((r,), jnp.float32)

    # projective cameras: raster -> camera (homogeneous, z=0 plane)
    m = cam.raster2camera
    hx = m[0, 0] * img.x + m[0, 1] * img.y + m[0, 3]
    hy = m[1, 0] * img.x + m[1, 1] * img.y + m[1, 3]
    hz = m[2, 0] * img.x + m[2, 1] * img.y + m[2, 3]
    hw = m[3, 0] * img.x + m[3, 1] * img.y + m[3, 3]
    inv_w = 1.0 / hw
    p_cam = vm.V3(hx * inv_w, hy * inv_w, hz * inv_w)

    if cam.kind == PERSPECTIVE:
        o = vm.v3zeros((r,))
        d = vm.normalize(p_cam)
        dxc, dyc = cam.dx_camera, cam.dy_camera
        dx_dir = vm.normalize(p_cam + vm.V3(dxc[0], dxc[1], dxc[2]))
        dy_dir = vm.normalize(p_cam + vm.V3(dyc[0], dyc[1], dyc[2]))
    else:  # ORTHOGRAPHIC
        o = p_cam
        zf = jnp.zeros((r,), jnp.float32)
        d = vm.V3(zf, zf, jnp.ones((r,), jnp.float32))
        dx_dir = d
        dy_dir = d

    # depth of field (projective_camera lens params)
    lr = cam.lens_radius

    def with_dof(o, d):
        lx, ly = smp.concentric_sample_disk(samples.lens_uv)
        ft = cam.focal_distance / jnp.maximum(jnp.abs(d.z), 1e-12)
        p_focus = o + d * ft
        o2 = o + vm.V3(lx * lr, ly * lr, jnp.zeros((r,), jnp.float32))
        d2 = vm.normalize(p_focus - o2)
        return o2, d2

    # lens_radius is a traced scalar; evaluate both and select (cheap).
    o_dof, d_dof = with_dof(o, d)
    sel = (lr > 0.0)
    o = vm.where3(sel, o_dof, o)
    d = vm.where3(sel, d_dof, d)

    o_w = xf_p(o)
    d_w = xf_v(d)
    rays = vm.make_rays(o_w, d_w, time=time)
    rx_d = xf_v(dx_dir)
    ry_d = xf_v(dy_dir)
    # scaled differentials: d + scale*(d_offset - d) (sampler_renderer.dart:166)
    diffs = RayDiffs(o_w, d_w + (rx_d - d_w) * diff_scale,
                     o_w, d_w + (ry_d - d_w) * diff_scale)
    return rays, diffs, jnp.ones((r,), jnp.float32)
