"""Probe Mosaic/Pallas primitives needed by the traverse kernel on this chip:
1. SMEM input arrays (node table) + dynamic scalar loads
2. dynamic lane-dim slice (K, C)[:, cid:cid+1]
3. dynamic sublane-dim slice (C, K)[cid] + transpose (1,K)->(K,1)
4. while_loop with SMEM scratch stack + scalar carries
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def test_smem_table(n):
    """Node table in SMEM, dynamic scalar read."""
    def kern(tab_ref, idx_ref, out_ref):
        i = idx_ref[0]
        out_ref[:] = jnp.full((8, 128), tab_ref[i, 2], jnp.float32)

    tab = jnp.arange(n * 8, dtype=jnp.float32).reshape(n, 8)
    idx = jnp.array([n - 1], jnp.int32)
    out = pl.pallas_call(
        kern,
        out_shape=jax.ShapeDtypeStruct((8, 128), jnp.float32),
        in_specs=[pl.BlockSpec(memory_space=pltpu.SMEM),
                  pl.BlockSpec(memory_space=pltpu.SMEM)],
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
    )(tab, idx)
    expect = float(tab[n - 1, 2])
    assert float(out[0, 0]) == expect, (out[0, 0], expect)
    print(f"SMEM table n={n} ({n*8*4/1024:.0f} KB): OK")


def test_lane_slice(K, C):
    """(K, C) tri table, dynamic lane slice -> (K, 1) -> broadcast."""
    def kern(tab_ref, idx_ref, out_ref):
        c = idx_ref[0]
        col = tab_ref[:, pl.ds(c, 1)]          # (K, 1)
        out_ref[:] = jnp.broadcast_to(col, (K, 128))

    tab = jnp.arange(K * C, dtype=jnp.float32).reshape(K, C)
    cid = C - 7
    out = pl.pallas_call(
        kern,
        out_shape=jax.ShapeDtypeStruct((K, 128), jnp.float32),
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM),
                  pl.BlockSpec(memory_space=pltpu.SMEM)],
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
    )(tab, jnp.array([cid], jnp.int32))
    assert np.allclose(np.asarray(out[:, 0]), np.asarray(tab[:, cid])), "lane slice bad"
    print(f"lane-dim dynamic slice (K={K}, C={C}): OK")


def test_sublane_slice_transpose(K, C):
    """(C, K) table, dynamic sublane slice -> (1, K) -> transpose (K, 1)."""
    def kern(tab_ref, idx_ref, out_ref):
        c = idx_ref[0]
        row = tab_ref[pl.ds(c, 1), :]          # (1, K)
        col = jnp.transpose(row, (1, 0))       # (K, 1)
        out_ref[:] = jnp.broadcast_to(col, (K, 128))

    tab = jnp.arange(K * C, dtype=jnp.float32).reshape(C, K)
    cid = C - 7
    out = pl.pallas_call(
        kern,
        out_shape=jax.ShapeDtypeStruct((K, 128), jnp.float32),
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM),
                  pl.BlockSpec(memory_space=pltpu.SMEM)],
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
    )(tab, jnp.array([cid], jnp.int32))
    assert np.allclose(np.asarray(out[:, 0]), np.asarray(tab[cid])), "transpose bad"
    print(f"sublane slice + transpose (K={K}, C={C}): OK")


def test_while_stack(depth):
    """while_loop + SMEM scratch stack push/pop + scalar carry."""
    def kern(out_ref, stack_ref):
        stack_ref[0] = 0

        def cond(st):
            sp, acc = st
            return sp > 0

        def body(st):
            sp, acc = st
            node = stack_ref[sp - 1]
            sp = sp - 1
            acc = acc + node

            def push(sp):
                stack_ref[sp] = 2 * node + 1
                stack_ref[sp + 1] = 2 * node + 2
                return sp + 2

            sp = jax.lax.cond(2 * node + 2 < depth, push, lambda s: s, sp)
            return sp, acc

        _, acc = jax.lax.while_loop(cond, body, (jnp.int32(1), jnp.int32(0)))
        out_ref[0] = acc

    out = pl.pallas_call(
        kern,
        out_shape=jax.ShapeDtypeStruct((1,), jnp.int32),
        out_specs=pl.BlockSpec(memory_space=pltpu.SMEM),
        scratch_shapes=[pltpu.SMEM((64,), jnp.int32)],
    )()
    expect = sum(range(depth))
    assert int(out[0]) == expect, (out[0], expect)
    print(f"while+SMEM stack (full binary tree {depth} nodes): OK sum={out[0]}")


def test_3d_broadcast(K):
    """(K,1,1) x (1,8,128) -> (K,8,128) elementwise."""
    def kern(a_ref, b_ref, out_ref):
        a = a_ref[:].reshape(K, 1, 1)
        b = b_ref[:].reshape(1, 8, 128)
        out_ref[:] = a * b

    a = jnp.arange(K, dtype=jnp.float32).reshape(K, 1)
    b = jnp.ones((8, 128), jnp.float32) * 2.0
    out = pl.pallas_call(
        kern,
        out_shape=jax.ShapeDtypeStruct((K, 8, 128), jnp.float32),
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM),
                  pl.BlockSpec(memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
    )(a, b)
    assert float(out[3, 0, 0]) == 6.0
    print(f"3D broadcast (K={K},8,128): OK")


if __name__ == "__main__":
    for fn, args in [
        (test_while_stack, (1023,)),
        (test_smem_table, (1024,)),
        (test_smem_table, (8192,)),
        (test_smem_table, (16384,)),
        (test_lane_slice, (32, 3328)),
        (test_sublane_slice_transpose, (32, 3328)),
        (test_3d_broadcast, (32,)),
    ]:
        try:
            fn(*args)
        except Exception as e:
            print(f"{fn.__name__}{args}: FAIL -> {type(e).__name__}: {str(e)[:300]}")
