#!/usr/bin/env python
"""Can two independent vector->scalar sync chains share one while_loop?

The packet tracer pays ~1.3k cycles per node visit for the vector->scalar
sync (see tools/bench_prims.py and the perf notes). If the cost is a
pipeline-drain LATENCY (not occupancy), interleaving TWO independent
traversals in one loop should cost ~1 sync for 2 visits; and deferring the
consume by one iteration (software pipelining) should hide it entirely.

Measures cycles/iter for:
  d1     1 chain, sum->scalar consumed same iteration (baseline)
  dd2    2 independent chains, both consumed per iteration
  dd4    4 independent chains
  dp1    1 chain, consume DEFERRED one iteration ((1,1) vector carried)
  dpd2   2 chains, both deferred
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

    def run(name, mk, n_out=1):
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
        cyc = dt * CLOCK_GHZ * 1e9 / iters
        print(f"{name}: {dt*1e3:.3f} ms -> {cyc:.0f} cyc/iter "
              f"({cyc/n_out:.0f} cyc/visit)  (out {float(np.asarray(r)[0,0]):.3f})")

    def kernel_d1(tab_ref, x_ref, out_ref, smem_ref):
        x = x_ref[:]

        def body(c):
            i, row, acc = c
            s = jnp.sum(acc).astype(jnp.int32)
            nxt = (row + (s & 1) + 1) & 63
            return i + 1, nxt, acc * 0.99999

        _, _, acc = jax.lax.while_loop(
            lambda c: c[0] < iters, body, (jnp.int32(0), jnp.int32(1), x))
        out_ref[:] = acc

    def kernel_dd(n_chains):
        def kernel(tab_ref, x_ref, out_ref, smem_ref):
            x = x_ref[:]

            def body(c):
                i = c[0]
                rows = list(c[1:1 + n_chains])
                accs = list(c[1 + n_chains:])
                for k in range(n_chains):
                    s = jnp.sum(accs[k]).astype(jnp.int32)
                    rows[k] = (rows[k] + (s & 1) + 1) & 63
                    accs[k] = accs[k] * 0.99999
                return (i + 1, *rows, *accs)

            init = (jnp.int32(0),
                    *[jnp.int32(1 + k) for k in range(n_chains)],
                    *[x * (1.0 + 0.1 * k) for k in range(n_chains)])
            res = jax.lax.while_loop(lambda c: c[0] < iters, body, init)
            acc = res[1 + n_chains]
            for k in range(1, n_chains):
                acc = acc + res[1 + n_chains + k]
            out_ref[:] = acc

        return kernel

    def kernel_dp(n_chains):
        # deferred consume: the scalar decision this iteration uses the
        # (1,1) reduce PRODUCED LAST iteration
        def kernel(tab_ref, x_ref, out_ref, smem_ref):
            x = x_ref[:]

            def body(c):
                i = c[0]
                rows = list(c[1:1 + n_chains])
                prevs = list(c[1 + n_chains:1 + 2 * n_chains])
                accs = list(c[1 + 2 * n_chains:])
                for k in range(n_chains):
                    s = prevs[k][0, 0].astype(jnp.int32)  # last iter's reduce
                    rows[k] = (rows[k] + (s & 1) + 1) & 63
                    accs[k] = accs[k] * 0.99999
                    prevs[k] = jnp.sum(accs[k], keepdims=True)  # stays vector
                return (i + 1, *rows, *prevs, *accs)

            init = (jnp.int32(0),
                    *[jnp.int32(1 + k) for k in range(n_chains)],
                    *[jnp.zeros((1, 1), jnp.float32) for _ in range(n_chains)],
                    *[x * (1.0 + 0.1 * k) for k in range(n_chains)])
            res = jax.lax.while_loop(lambda c: c[0] < iters, body, init)
            acc = res[1 + 2 * n_chains]
            for k in range(1, n_chains):
                acc = acc + res[1 + 2 * n_chains + k]
            out_ref[:] = acc

        return kernel

    run("d1   1 chain same-iter", kernel_d1, 1)
    run("dd2  2 chains same-iter", kernel_dd(2), 2)
    run("dd4  4 chains same-iter", kernel_dd(4), 4)
    run("dp1  1 chain deferred", kernel_dp(1), 1)
    run("dpd2 2 chains deferred", kernel_dp(2), 2)


if __name__ == "__main__":
    main()
