"""Leaf-flush formulation shootout: f32 VPU MT vs bf16 VPU MT vs Woop-MXU.

VERDICT r3 #1 prescribes moving leaf intersection onto the MXU via Woop-style
per-triangle affine transforms evaluated as a matmul. The catch this script
measures: the Woop formulation's CONTRACTION dimension is 8 (a homogeneous
ray against a 3x4 affine transform — padded [o,1,d,0]), so the 128-wide MXU
systolic contraction runs at 8/128 utilization, and half the padded operand
is zeros. Analytically:

  per (ray, tri) pair   flops   engine        effective rate   time/pair
  f32 Moeller-Trumbore   ~40    VPU f32       ~4 Tflop/s       ~10 ps
  bf16 Moeller-Trumbore  ~40    VPU bf16      ~8 Tflop/s       ~5 ps
  Woop matmul + finish   96+10  MXU bf16 8/128 (~12.5 T) + VPU ~10 ps

i.e. the MXU path TIES f32 and LOSES to bf16-on-VPU. This script verifies
on-chip with standalone kernels that each run NR rounds of a dense
(K tris x B rays) flush: (1) f32 MT, (2) bf16 MT (cast after load),
(3) Woop (6K, 8) @ (8, B) matmul + elementwise finish.

Usage: python tools/exp_mxu.py [rows]
"""
import os
import sys
import time
import functools

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

jax.config.update("jax_compilation_cache_dir",
                  os.path.expanduser("~/.cache/jax_comp_cache"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 2.0)

K = 32          # triangles per cluster
NR = int(os.environ.get('NR', '64'))   # flush rounds per kernel invocation


def make_tris(c, k, seed=0):
    rng = np.random.RandomState(seed)
    v0 = rng.randn(c, k, 3).astype(np.float32)
    e1 = (rng.randn(c, k, 3) * 0.3).astype(np.float32)
    e2 = (rng.randn(c, k, 3) * 0.3).astype(np.float32)
    return v0, e1, e2


def woop_operand(v0, e1, e2):
    """(C, 6K, 8) f32: rows [c*K+j] of the o'-part then d'-part.

    o'_c = W_c . o + t_c  (cols 0-3 = [W_c, t_c], cols 4-7 = 0)
    d'_c = W_c . d        (cols 4-6 = W_c, others 0)
    """
    c, k, _ = v0.shape
    n = np.cross(e1, e2)
    M = np.stack([e1, e2, n], axis=-1)               # (C, K, 3, 3) columns
    det = np.linalg.det(M)
    ok = np.abs(det) > 1e-20
    Minv = np.zeros_like(M)
    Minv[ok] = np.linalg.inv(M[ok])
    t = -np.einsum("ckij,ckj->cki", Minv, v0)        # (C, K, 3)
    A = np.zeros((c, 6 * k, 8), np.float32)
    for comp in range(3):
        A[:, comp * k:(comp + 1) * k, 0:3] = Minv[:, :, comp, :]
        A[:, comp * k:(comp + 1) * k, 3] = t[:, :, comp]
        A[:, (3 + comp) * k:(4 + comp) * k, 4:7] = Minv[:, :, comp, :]
    return A


def _mt_math(o3, d3, v0, e1, e2, bf16):
    if bf16:
        bt = jnp.bfloat16
        o3 = tuple(x.astype(bt) for x in o3)
        d3 = tuple(x.astype(bt) for x in d3)
        v0 = tuple(x.astype(bt) for x in v0)
        e1 = tuple(x.astype(bt) for x in e1)
        e2 = tuple(x.astype(bt) for x in e2)
        eps, beps = 1e-4, 1e-2
    else:
        eps, beps = 1e-10, 1e-6
    px = d3[1] * e2[2] - d3[2] * e2[1]
    py = d3[2] * e2[0] - d3[0] * e2[2]
    pz = d3[0] * e2[1] - d3[1] * e2[0]
    det = e1[0] * px + e1[1] * py + e1[2] * pz
    det_f = det.astype(jnp.float32)
    inv_det = (1.0 / jnp.where(jnp.abs(det_f) < eps, 1.0, det_f)) \
        .astype(det.dtype)
    tx = o3[0] - v0[0]
    ty = o3[1] - v0[1]
    tz = o3[2] - v0[2]
    u = (tx * px + ty * py + tz * pz) * inv_det
    qx = ty * e1[2] - tz * e1[1]
    qy = tz * e1[0] - tx * e1[2]
    qz = tx * e1[1] - ty * e1[0]
    v = (d3[0] * qx + d3[1] * qy + d3[2] * qz) * inv_det
    t = (e2[0] * qx + e2[1] * qy + e2[2] * qz) * inv_det
    ok = ((jnp.abs(det_f) >= eps) & (u >= -beps) & (v >= -beps)
          & (u + v <= 1.0 + beps))
    t = t.astype(jnp.float32)
    return jnp.where(ok & (t > 0), t, jnp.float32(jnp.inf))


def mt_kernel(v0x, v0y, v0z, e1x, e1y, e1z, e2x, e2y, e2z,
              ox, oy, oz, dx, dy, dz, t_out, *, rows, bf16):
    o3 = (ox[:].reshape(1, rows, 128), oy[:].reshape(1, rows, 128),
          oz[:].reshape(1, rows, 128))
    d3 = (dx[:].reshape(1, rows, 128), dy[:].reshape(1, rows, 128),
          dz[:].reshape(1, rows, 128))

    def round_fn(i, t_best):
        def col(ref):
            row = ref[pl.ds(i, 1), :]
            c = jnp.transpose(row, (1, 0)).reshape(K, 1, 1)
            if bf16:
                # (K,1,1) bf16 elementwise crashes Mosaic layout inference;
                # broadcast to a full-lane tile in f32 first, cast after
                c = jnp.broadcast_to(c, (K, 1, 128)).astype(jnp.bfloat16)
            return c

        tm = _mt_math(o3, d3,
                      (col(v0x), col(v0y), col(v0z)),
                      (col(e1x), col(e1y), col(e1z)),
                      (col(e2x), col(e2y), col(e2z)), bf16)
        return jnp.minimum(t_best, jnp.min(tm, axis=0))

    t0 = jnp.full((rows, 128), jnp.inf, jnp.float32)
    t_out[:] = jax.lax.fori_loop(0, NR, round_fn, t0)


def woop_kernel(a_ref, rays_ref, t_out, *, bf16):
    """rays_ref: (1, 8, B) [ox oy oz 1 dx dy dz 0]; a_ref: (C, 6K, 8)."""
    rays = rays_ref[0]
    if bf16:
        rays = rays.astype(jnp.bfloat16)

    def round_fn(i, t_best):
        A = a_ref[i]                                  # (6K, 8)
        if bf16:
            A = A.astype(jnp.bfloat16)
        out = jax.lax.dot_general(
            A, rays, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)       # (6K, B)
        opx = out[0 * K:1 * K]
        opy = out[1 * K:2 * K]
        opz = out[2 * K:3 * K]
        dpx = out[3 * K:4 * K]
        dpy = out[4 * K:5 * K]
        dpz = out[5 * K:6 * K]
        t = -opz / jnp.where(jnp.abs(dpz) < 1e-6, 1e-6, dpz)
        u = opx + t * dpx
        v = opy + t * dpy
        eps = 1e-2 if bf16 else 1e-6
        ok = (u >= -eps) & (v >= -eps) & (u + v <= 1.0 + eps) & (t > 0)
        tm = jnp.where(ok, t, jnp.float32(jnp.inf))
        return jnp.minimum(t_best, jnp.min(tm, axis=0, keepdims=True))

    t0 = jnp.full((1, t_out.shape[-1]), jnp.inf, jnp.float32)
    t_out[0] = jax.lax.fori_loop(0, NR, round_fn, t0)


def bench(fn, variants, label, iters=6):
    """variants: list of arg tuples (distinct inputs per call — the axon
    tunnel coalesces identical executions into one). A small readback per
    call forces real completion (block_until_ready alone has been observed
    to return before device work finishes on this tunnel)."""
    out = fn(*variants[-1])
    jax.block_until_ready(out)
    _ = float(jnp.sum(out))
    times = []
    for i in range(iters):
        a = variants[i % (len(variants) - 1)]
        t0 = time.time()
        out = fn(*a)
        jax.block_until_ready(out)
        _ = float(jnp.sum(out))
        times.append(time.time() - t0)
    print('    times:', ' '.join(f'{t*1e3:.2f}' for t in times), flush=True)
    dt = min(times)
    return dt, out


def main():
    rows = int(sys.argv[1]) if len(sys.argv) > 1 else 32
    B = rows * 128
    n_blocks = int(os.environ.get('NB', '64'))
    C = NR                              # clusters touched per block
    v0, e1, e2 = make_tris(C, K)
    A = woop_operand(v0, e1, e2)
    rng = np.random.RandomState(1)
    o = rng.randn(n_blocks * B, 3).astype(np.float32) * 0.1
    d = rng.randn(n_blocks * B, 3).astype(np.float32)
    d /= np.linalg.norm(d, axis=-1, keepdims=True)

    shape2 = (n_blocks * rows, 128)
    planes = [jnp.asarray(x.reshape(shape2)) for x in
              (o[:, 0], o[:, 1], o[:, 2], d[:, 0], d[:, 1], d[:, 2])]
    tri_comp = []
    for arr in (v0, e1, e2):
        for c in range(3):
            tri_comp.append(jnp.asarray(np.ascontiguousarray(arr[..., c])))

    full = lambda a: pl.BlockSpec(a.shape, lambda i: (0,) * a.ndim,
                                  memory_space=pltpu.VMEM)
    ray_spec = pl.BlockSpec((rows, 128), lambda i: (i, 0),
                            memory_space=pltpu.VMEM)

    pairs = n_blocks * B * K * NR

    n_var = 7
    mt_variants = [tuple(tri_comp) + tuple(
        [planes[0] * (1.0 + 1e-6 * i)] + planes[1:]) for i in range(n_var)]
    for bf16 in (False, True):
        kern = functools.partial(mt_kernel, rows=rows, bf16=bf16)
        fn = jax.jit(lambda *a: pl.pallas_call(
            kern, grid=(n_blocks,),
            out_shape=jax.ShapeDtypeStruct(shape2, jnp.float32),
            in_specs=[full(x) for x in tri_comp] + [ray_spec] * 6,
            out_specs=ray_spec)(*a))
        try:
            dt, _ = bench(fn, mt_variants, "")
            print(f"MT   {'bf16' if bf16 else 'f32 '} rows={rows}: "
                  f"{pairs / dt / 1e9:8.2f} Gpairs/s  ({dt * 1e3:.2f} ms)",
                  flush=True)
        except Exception as e:  # noqa: BLE001
            print(f"MT   {'bf16' if bf16 else 'f32 '} FAILED: "
                  f"{type(e).__name__}: {str(e)[:200]}", flush=True)

    # Woop-MXU: rays pre-packed (n_blocks, 8, B)
    rays8 = np.zeros((n_blocks, 8, B), np.float32)
    ob = o.reshape(n_blocks, B, 3)
    db = d.reshape(n_blocks, B, 3)
    for c in range(3):
        rays8[:, c, :] = ob[..., c]
        rays8[:, 4 + c, :] = db[..., c]
    rays8[:, 3, :] = 1.0
    rays8 = jnp.asarray(rays8)
    A_j = jnp.asarray(A)
    ray8_spec = pl.BlockSpec((1, 8, B), lambda i: (i, 0, 0),
                             memory_space=pltpu.VMEM)
    out_spec = pl.BlockSpec((1, 1, B), lambda i: (i, 0, 0),
                            memory_space=pltpu.VMEM)

    def woop_wrap(a_ref, r_ref, t_out, *, bf16):
        woop_kernel(a_ref, r_ref, t_out, bf16=bf16)

    woop_variants = [(A_j, rays8 * (1.0 + 1e-6 * i)) for i in range(n_var)]
    for bf16 in (False, True):
        kern = functools.partial(woop_wrap, bf16=bf16)
        fn = jax.jit(lambda a, r: pl.pallas_call(
            kern, grid=(n_blocks,),
            out_shape=jax.ShapeDtypeStruct((n_blocks, 1, B), jnp.float32),
            in_specs=[full(A_j), ray8_spec],
            out_specs=out_spec)(a, r))
        try:
            dt, _ = bench(fn, woop_variants, "")
            print(f"WOOP {'bf16' if bf16 else 'f32 '} rows={rows}: "
                  f"{pairs / dt / 1e9:8.2f} Gpairs/s  ({dt * 1e3:.2f} ms)",
                  flush=True)
        except Exception as e:  # noqa: BLE001
            print(f"WOOP {'bf16' if bf16 else 'f32 '} FAILED: "
                  f"{type(e).__name__}: {str(e)[:300]}", flush=True)


if __name__ == "__main__":
    main()
