#!/usr/bin/env python
"""Microbench: cross-lane reduce strategies inside a Pallas TPU while_loop.

Measures per-iteration cost of: (a) 4 packed jnp.sum reduces (current kernel),
(b) bitwise-OR lane/sublane rolls + single-element extract, (c) single jnp.sum.
"""
import time

import numpy as np


def main():
    import jax
    import jax.numpy as jnp
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    ROWS = 8
    ITERS = 20000

    def make(mode):
        def kernel(x_ref, out_ref):
            x = x_ref[:]

            def body(c):
                i, acc, x = c
                h = [(x > float(k)).astype(jnp.int32) for k in range(8)]

                if mode == "sum4":
                    sums = [jnp.sum(h[2 * i_] + (h[2 * i_ + 1] << 16))
                            for i_ in range(4)]
                    bits = jnp.int32(0)
                    for i_ in range(4):
                        bits |= ((sums[i_] & 0xFFFF) > 0).astype(jnp.int32) << (2 * i_)
                        bits |= ((sums[i_] >> 16) > 0).astype(jnp.int32) << (2 * i_ + 1)
                elif mode == "orroll":
                    m = h[0]
                    for k in range(1, 8):
                        m = m | (h[k] << k)
                    for sh in (64, 32, 16, 8, 4, 2, 1):
                        m = m | pltpu.roll(m, sh, axis=1)
                    sh = ROWS // 2
                    while sh >= 1:
                        m = m | pltpu.roll(m, sh, axis=0)
                        sh //= 2
                    bits = jnp.sum(m[0:1, 0:1])
                elif mode == "orroll_max":
                    m = h[0]
                    for k in range(1, 8):
                        m = m | (h[k] << k)
                    for sh in (64, 32, 16, 8, 4, 2, 1):
                        m = m | pltpu.roll(m, sh, axis=1)
                    bits = jnp.max(m[0:1, :])
                elif mode == "sum1":
                    m = h[0]
                    for k in range(1, 8):
                        m = m | (h[k] << k)
                    bits = jnp.sum(m)  # not correct OR; cost probe only
                acc = acc + bits
                # next iteration's VECTOR work depends on this iteration's
                # SCALAR result — the real kernel's serialization pattern
                # (stack pop -> scalar meta -> next node's slab tests)
                x = x + (bits & 1).astype(jnp.float32) * jnp.float32(1e-6)
                return i + 1, acc, x

            def cond(c):
                return c[0] < ITERS

            _, acc, _ = jax.lax.while_loop(cond, body, (jnp.int32(0), jnp.int32(0), x))
            out_ref[:] = jnp.full((ROWS, 128), acc, jnp.int32)

        return kernel

    x = jnp.asarray(np.random.rand(ROWS, 128) * 8, jnp.float32)
    for mode in ("sum4", "orroll", "orroll_max", "sum1"):
        try:
            fn = pl.pallas_call(
                make(mode),
                in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)],
                out_shape=jax.ShapeDtypeStruct((ROWS, 128), jnp.int32),
            )
            fn = jax.jit(fn)
            out = jax.block_until_ready(fn(x))
            t0 = time.perf_counter()
            for _ in range(3):
                out = jax.block_until_ready(fn(x))
            dt = (time.perf_counter() - t0) / 3
            cyc = dt * 940e6 / ITERS
            print(f"{mode:12s}: {dt*1e3:7.2f} ms for {ITERS} iters -> {cyc:7.1f} cyc/iter")
        except Exception as e:
            print(f"{mode:12s}: FAIL {str(e)[:200]}")


if __name__ == "__main__":
    main()
