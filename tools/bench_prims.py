#!/usr/bin/env python
"""Primitive-cost microbench: what does each kernel building block cost?

Measures, per while_loop iteration with a data-dependent row index (so
nothing hoists):
  a) K scalar lane loads tab[row, j] consumed as vector broadcasts
  b) one (1,128) vector row load + K lane-broadcast extracts (dyn gather)
  c) one (8,128) vector row load + K sublane slices
  d) a jnp.sum vector->scalar consumed by an SMEM address
  e) empty loop (pop/branch floor)
"""
import sys
import time

import numpy as np

CLOCK_GHZ = 1.59
ROWS = 32


def main():
    import jax
    import jax.numpy as jnp
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    iters = 8192
    K = int(sys.argv[1]) if len(sys.argv) > 1 else 16

    def run(name, mk):
        f = pl.pallas_call(
            mk,
            in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)] * 2,
            out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((ROWS, 128), jnp.float32),
            scratch_shapes=[pltpu.SMEM((256,), jnp.int32)],
        )
        tab = jnp.asarray(np.random.rand(64, 128) + 0.5, jnp.float32)
        x = jnp.asarray(np.random.rand(ROWS, 128), jnp.float32)
        g = jax.jit(f)
        r = g(tab, x)
        r.block_until_ready()
        t0 = time.perf_counter()
        n = 5
        for _ in range(n):
            r = g(tab, x)
        r.block_until_ready()
        dt = (time.perf_counter() - t0) / n
        print(f"{name}: {dt*1e3:.3f} ms -> {dt*CLOCK_GHZ*1e9/iters:.0f} cyc/iter"
              f"  (out {float(np.asarray(r)[0,0]):.3f})")

    # data-dependent row chain: row_{i+1} = f(scalar load of row_i) so the
    # loop cannot be hoisted or pipelined beyond the scalar chain
    def base_loop(body_fn, use_sum_row=False):
        def kernel(tab_ref, x_ref, out_ref, smem_ref):
            x = x_ref[:]

            def body(c):
                i, row, acc = c
                acc, nxt = body_fn(tab_ref, x, row, acc, smem_ref, i)
                return i + 1, nxt & 63, acc

            _, _, acc = jax.lax.while_loop(
                lambda c: c[0] < iters, body,
                (jnp.int32(0), jnp.int32(1), x))
            out_ref[:] = acc

        return kernel

    # e) floor: scalar-only chain
    def e_body(tab_ref, x, row, acc, smem, i):
        v = smem[row & 15]
        smem[(row + 1) & 15] = v + 1
        return acc, row + 1

    # a) K scalar lane loads + broadcasts
    def a_body(tab_ref, x, row, acc, smem, i):
        s = jnp.float32(0)
        accv = acc
        for j in range(K):
            accv = accv + tab_ref[row, j]  # scalar load -> vector broadcast
        nxt = row + 1
        return accv * 0.5, nxt

    # a2) K scalar loads consumed as SCALARS only (no broadcast)
    def a2_body(tab_ref, x, row, acc, smem, i):
        s = jnp.float32(0)
        for j in range(K):
            s = s + tab_ref[row, j]
        nxt = row + (s > 0).astype(jnp.int32)
        return acc + 1e-9 * s, nxt

    # b) one (1,128) row load + lane gather broadcast (dyn idx)
    def b_body(tab_ref, x, row, acc, smem, i):
        rv = tab_ref[pl.ds(row, 1), :]  # (1,128) vector load
        S = ((K + 7) // 8) * 8
        xb = jnp.broadcast_to(rv, (S, 128))
        gi = jax.lax.broadcasted_iota(jnp.int32, (S, 128), 0)
        tq = jnp.take_along_axis(xb, gi, axis=1)  # row k = lane k broadcast
        accv = acc
        for j in range(K):
            accv = accv + jax.lax.slice(tq, (j, 0), (j + 1, 128))
        return accv * 0.5, row + 1

    # d) jnp.sum -> scalar consumed for control
    def d_body(tab_ref, x, row, acc, smem, i):
        s = jnp.sum(acc).astype(jnp.int32)
        nxt = row + (s & 1) + 1
        return acc * 0.99999, nxt

    # d2) 4x jnp.sum -> scalars consumed
    def d2_body(tab_ref, x, row, acc, smem, i):
        t = 0
        for k in range(4):
            t = t + (jnp.sum(acc * (k + 1)).astype(jnp.int32) & 1)
        return acc * 0.99999, row + t + 1

    run("e  floor (scalar smem chain)", base_loop(e_body))
    run(f"a  {K} scalar loads->bcast", base_loop(a_body))
    run(f"a2 {K} scalar loads (scalar use)", base_loop(a2_body))
    run(f"b  row load + {K} lane-gather", base_loop(b_body))
    run("d  1x sum->scalar consume", base_loop(d_body))
    run("d2 4x sum->scalar consume", base_loop(d2_body))


if __name__ == "__main__":
    main()

def extra():
    import jax
    import jax.numpy as jnp
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu
    import numpy as np, time, sys
    iters = 8192
    K = int(sys.argv[1]) if len(sys.argv) > 1 else 16

    def run(name, mk):
        f = pl.pallas_call(
            mk,
            in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)] * 2,
            out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((ROWS, 128), jnp.float32),
            scratch_shapes=[pltpu.SMEM((256,), jnp.int32)],
        )
        tab = jnp.asarray(np.random.rand(64, 128) + 0.5, jnp.float32)
        x = jnp.asarray(np.random.rand(ROWS, 128), jnp.float32)
        g = jax.jit(f)
        r = g(tab, x); r.block_until_ready()
        t0 = time.perf_counter()
        for _ in range(5):
            r = g(tab, x)
        r.block_until_ready()
        dt = (time.perf_counter() - t0) / 5
        print(f"{name}: {dt*1e3:.3f} ms -> {dt*CLOCK_GHZ*1e9/iters:.0f} cyc/iter"
              f"  (out {float(np.asarray(r)[0,0]):.3f})")

    def base_loop(body_fn):
        def kernel(tab_ref, x_ref, out_ref, smem_ref):
            x = x_ref[:]
            def body(c):
                i, row, acc = c
                acc, nxt = body_fn(tab_ref, x, row, acc, smem_ref, i)
                return i + 1, nxt & 63, acc
            _, _, acc = jax.lax.while_loop(
                lambda c: c[0] < iters, body,
                (jnp.int32(0), jnp.int32(1), x))
            out_ref[:] = acc
        return kernel

    # f) (1,128) vector row load at dynamic row + K static-lane (1,1)
    #    slices broadcast into vector math; scalar chain untouched
    def f_body(tab_ref, x, row, acc, smem, i):
        rv = tab_ref[pl.ds(row, 1), :]
        accv = acc
        for j in range(K):
            s11 = jax.lax.slice(rv, (0, j), (1, j + 1))
            accv = accv + jnp.broadcast_to(s11, (1, 128))
        return accv * 0.5, row + 1

    # f4) same but 4 different dynamic rows per iteration
    def f4_body(tab_ref, x, row, acc, smem, i):
        accv = acc
        for r4 in range(4):
            rv = tab_ref[pl.ds((row + r4) & 63, 1), :]
            for j in range(max(K // 4, 1)):
                s11 = jax.lax.slice(rv, (0, j), (1, j + 1))
                accv = accv + jnp.broadcast_to(s11, (1, 128))
        return accv * 0.5, row + 1

    # g) f + ONE (1,1)->scalar consume per iteration (the batched sync)
    def g_body(tab_ref, x, row, acc, smem, i):
        rv = tab_ref[pl.ds(row, 1), :]
        accv = acc
        for j in range(K):
            s11 = jax.lax.slice(rv, (0, j), (1, j + 1))
            accv = accv + jnp.broadcast_to(s11, (1, 128))
        s = jnp.sum(accv, keepdims=True)
        nxt = row + 1 + (s[0, 0].astype(jnp.int32) & 1)
        return accv * 0.5, nxt

    # a4) K scalar loads spread over 4 dynamic rows
    def a4_body(tab_ref, x, row, acc, smem, i):
        accv = acc
        for r4 in range(4):
            rr = (row + r4) & 63
            for j in range(max(K // 4, 1)):
                accv = accv + tab_ref[rr, j]
        return accv * 0.5, row + 1

    if False: run(f"f  rowvec + {K} static (1,1) slices", base_loop(f_body))
    if False: run(f"f4 4 rowvecs + {K} slices total", base_loop(f4_body))
    if False: run(f"g  f + 1 scalar consume", base_loop(g_body))
    run(f"a4 {K} scalar loads over 4 rows", base_loop(a4_body))


if __name__ == "__main__" and len(sys.argv) > 2 and sys.argv[2] == "extra":
    extra()
