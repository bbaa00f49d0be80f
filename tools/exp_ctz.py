"""Mosaic lowering probe for the v6 set-bit push loop (r5 perf):
(a) scalar while_loop nested inside the traversal while body with SMEM
    carries, (b) i32 scalar multiply (de Bruijn ctz), (c) scalar VMEM
    table read by dynamic index.
Run on TPU (or CPU interpret): python tools/exp_ctz.py [--interpret]
"""
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

# de Bruijn B(2,5) multiply table: ctz(x) for x a power of two
DB_MUL = np.int32(0x077CB531)
DB_TAB = np.zeros((32, 1), np.int32)
for i in range(32):
    DB_TAB[((((1 << i) * 0x077CB531) & 0xFFFFFFFF) >> 27) & 31, 0] = i


def _kernel(db_ref, m_ref, out_ref, acc_ref):
    P = 8
    for r in range(P):
        acc_ref[r] = jnp.int32(0)

    def outer_body(st):
        it = st
        for r in range(P):
            m0 = m_ref[0, r] + it * 0      # data-dependent mask

            def cond(c):
                m, acc = c
                return m != 0

            def body(c):
                m, acc = c
                low = m & (-m)
                idx = jax.lax.shift_right_logical(
                    (low * DB_MUL).astype(jnp.uint32), jnp.uint32(27)
                ).astype(jnp.int32) & 31
                p = db_ref[idx, 0]
                return m & (m - 1), acc * 8 + p

            m, acc = jax.lax.while_loop(cond, body, (m0, jnp.int32(0)))
            acc_ref[r] = acc_ref[r] + acc
        return it + 1

    jax.lax.while_loop(lambda it: it < 3, outer_body, jnp.int32(0))
    out = jnp.zeros((1, 128), jnp.int32)
    rsel = jax.lax.broadcasted_iota(jnp.int32, (1, 128), 1)
    for r in range(P):
        out = jnp.where(rsel == r, acc_ref[r], out)
    out_ref[:] = out


def main():
    interp = "--interpret" in sys.argv
    masks = np.array([[0b10110010, 0b1, 0, 0b11111111,
                       0b1000, 0b01010101, 0b100000, 3]], np.int32)
    fn = pl.pallas_call(
        _kernel,
        out_shape=jax.ShapeDtypeStruct((1, 128), jnp.int32),
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)] * 2,
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        scratch_shapes=[pltpu.SMEM((8,), jnp.int32)],
        interpret=interp,
    )
    got = np.asarray(fn(jnp.asarray(DB_TAB), jnp.asarray(masks)))[0, :8]

    def ref_one(m):
        acc = 0
        while m:
            p = (m & -m).bit_length() - 1
            acc = acc * 8 + p
            m &= m - 1
        return acc * 3 if False else None

    # reference: 3 outer iterations, each re-folds the same mask
    def ref_acc(m0):
        total = 0
        for _ in range(3):
            m, acc = m0, 0
            while m:
                p = (m & -m).bit_length() - 1
                acc = acc * 8 + p
                m &= m - 1
            total += acc
        return total

    want = np.array([ref_acc(int(m)) for m in masks[0]], np.int32)
    print("got :", got)
    print("want:", want)
    assert np.array_equal(got, want), "MISMATCH"
    print("OK — nested scalar while + i32 mul + VMEM table read all lower")


if __name__ == "__main__":
    main()
