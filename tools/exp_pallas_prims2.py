"""Probe round 2: SMEM size limit, VMEM node-row fetch patterns."""
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def test_smem_table(n, w=8):
    def kern(tab_ref, idx_ref, out_ref):
        i = idx_ref[0]
        out_ref[:] = jnp.full((8, 128), tab_ref[i, 2], jnp.float32)

    tab = jnp.arange(n * w, dtype=jnp.float32).reshape(n, w)
    out = pl.pallas_call(
        kern,
        out_shape=jax.ShapeDtypeStruct((8, 128), jnp.float32),
        in_specs=[pl.BlockSpec(memory_space=pltpu.SMEM),
                  pl.BlockSpec(memory_space=pltpu.SMEM)],
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
    )(tab, jnp.array([n - 1], jnp.int32))
    assert float(out[0, 0]) == float(tab[n - 1, 2])
    print(f"SMEM table ({n},{w}) = {n*w*4/1024:.0f} KB: OK")


def test_vmem_row_bcast(n):
    """(N, 8) VMEM bounds; fetch row, static (1,1) extracts, broadcast."""
    def kern(tab_ref, idx_ref, out_ref):
        i = idx_ref[0]
        row = tab_ref[pl.ds(i, 1), :]            # (1, 8)
        lo_x = row[0:1, 0:1]
        hi_z = row[0:1, 5:6]
        out_ref[:] = jnp.broadcast_to(lo_x, (8, 128)) + jnp.broadcast_to(
            hi_z, (8, 128))

    tab = jnp.arange(n * 8, dtype=jnp.float32).reshape(n, 8)
    out = pl.pallas_call(
        kern,
        out_shape=jax.ShapeDtypeStruct((8, 128), jnp.float32),
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM),
                  pl.BlockSpec(memory_space=pltpu.SMEM)],
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
    )(tab, jnp.array([n - 2], jnp.int32))
    expect = float(tab[n - 2, 0] + tab[n - 2, 5])
    assert float(out[0, 0]) == expect, (out[0, 0], expect)
    print(f"VMEM ({n},8) row fetch + static extract broadcast: OK")


def test_vmem_scalar_read(n):
    """scalar = vmem_ref[i, j] with dynamic i — does it lower?"""
    def kern(tab_ref, idx_ref, out_ref):
        i = idx_ref[0]
        v = tab_ref[i, 3]
        out_ref[0] = v.astype(jnp.float32)

    tab = jnp.arange(n * 8, dtype=jnp.float32).reshape(n, 8)
    out = pl.pallas_call(
        kern,
        out_shape=jax.ShapeDtypeStruct((1,), jnp.float32),
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM),
                  pl.BlockSpec(memory_space=pltpu.SMEM)],
        out_specs=pl.BlockSpec(memory_space=pltpu.SMEM),
    )(tab, jnp.array([5], jnp.int32))
    assert float(out[0]) == float(tab[5, 3])
    print(f"VMEM scalar read tab[i,3]: OK")


def test_big_vmem(c, k):
    """~4MB of tri data resident in VMEM + slice."""
    def kern(a_ref, idx_ref, out_ref):
        i = idx_ref[0]
        row = a_ref[pl.ds(i, 1), :]
        out_ref[:] = jnp.broadcast_to(jnp.transpose(row, (1, 0)), (k, 128))

    tabs = jnp.arange(c * k, dtype=jnp.float32).reshape(c, k)
    args = [tabs] * 9
    def kern9(*refs):
        a_refs, idx_ref, out_ref = refs[:9], refs[9], refs[10]
        i = idx_ref[0]
        acc = jnp.zeros((k, 128), jnp.float32)
        for a in a_refs:
            row = a[pl.ds(i, 1), :]
            acc = acc + jnp.broadcast_to(jnp.transpose(row, (1, 0)), (k, 128))
        out_ref[:] = acc

    out = pl.pallas_call(
        kern9,
        out_shape=jax.ShapeDtypeStruct((k, 128), jnp.float32),
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)] * 9
        + [pl.BlockSpec(memory_space=pltpu.SMEM)],
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
    )(*args, jnp.array([c - 1], jnp.int32))
    assert np.allclose(np.asarray(out[:, 0]), 9 * np.asarray(tabs[c - 1]))
    print(f"9x({c},{k}) VMEM resident = {9*c*k*4/1e6:.1f} MB: OK")


if __name__ == "__main__":
    for fn, args in [
        (test_smem_table, (2048, 8)),
        (test_smem_table, (4096, 8)),
        (test_smem_table, (3072, 8)),
        (test_smem_table, (2048, 16)),
        (test_vmem_row_bcast, (4096,)),
        (test_vmem_scalar_read, (4096,)),
        (test_big_vmem, (1600, 64)),
        (test_big_vmem, (3200, 64)),
    ]:
        try:
            fn(*args)
        except Exception as e:
            print(f"{fn.__name__}{args}: FAIL -> {type(e).__name__}: {str(e)[:200]}")
