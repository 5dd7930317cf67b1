#!/usr/bin/env python
"""Synthetic microbench of the packet-trace inner loop on real TPU.

Isolates the per-iteration cost components of the wide-node traversal body:
  - 8 child slab tests (f32 vs bf16)
  - the vector->scalar any-hit reduction (4x packed jnp.sum vs 1 sum vs none)
  - scalar VMEM lane loads + SMEM pushes
Fixed iteration count (no data-dependent traversal) so differences are pure
compute. Prints cycles/iteration at an assumed clock.

Usage: python tools/bench_slab.py [rows] [iters]
"""
import os
import sys
import time

import numpy as np

CLOCK_GHZ = 1.59  # v5e nominal


def main():
    import jax
    import jax.numpy as jnp
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    rows = int(sys.argv[1]) if len(sys.argv) > 1 else 32
    iters = int(sys.argv[2]) if len(sys.argv) > 2 else 4096

    def make(mode, reduce_mode):
        # mode: 'f32' | 'bf16'
        dt = jnp.bfloat16 if mode == "bf16" else jnp.float32

        def kernel(tab_ref, ox_ref, oy_ref, oz_ref, dx_ref, dy_ref, dz_ref,
                   out_ref, stack_ref):
            ox, oy, oz = ox_ref[:], oy_ref[:], oz_ref[:]
            dx, dy, dz = dx_ref[:], dy_ref[:], dz_ref[:]
            ix, iy, iz = 1.0 / dx, 1.0 / dy, 1.0 / dz
            if mode == "bf16":
                ox, oy, oz = ox.astype(dt), oy.astype(dt), oz.astype(dt)
                ix, iy, iz = ix.astype(dt), iy.astype(dt), iz.astype(dt)
            stack_ref[0] = jnp.int32(1)

            def slab(sl, b, t_best):
                c = (lambda j: dt.dtype.type(0.0))  # placeholder
                bx0 = sl(b); by0 = sl(b + 1); bz0 = sl(b + 2)
                bx1 = sl(b + 3); by1 = sl(b + 4); bz1 = sl(b + 5)
                if mode == "bf16":
                    bx0 = bx0.astype(dt); by0 = by0.astype(dt); bz0 = bz0.astype(dt)
                    bx1 = bx1.astype(dt); by1 = by1.astype(dt); bz1 = bz1.astype(dt)
                t0 = (bx0 - ox) * ix
                t1 = (bx1 - ox) * ix
                tn = jnp.minimum(t0, t1)
                tf = jnp.maximum(t0, t1)
                t0 = (by0 - oy) * iy
                t1 = (by1 - oy) * iy
                tn = jnp.maximum(tn, jnp.minimum(t0, t1))
                tf = jnp.minimum(tf, jnp.maximum(t0, t1))
                t0 = (bz0 - oz) * iz
                t1 = (bz1 - oz) * iz
                tn = jnp.maximum(tn, jnp.minimum(t0, t1))
                tf = jnp.minimum(tf, jnp.maximum(t0, t1))
                if mode == "bf16":
                    tn = jnp.maximum(tn, dt.dtype.type(0.0))
                    # packed-bf16 compare unsupported: one convert + f32 cmp
                    d = (jnp.minimum(tf, t_best) - tn).astype(jnp.float32)
                    return d >= 0.0
                tn = jnp.maximum(tn, 0.0)
                return (tf >= tn) & (tn <= t_best)

            def body(c):
                i, acc = c
                row = i & 63
                off = (i & 1) * 64

                def half(off):
                    def inner(_):
                        sl = lambda j: tab_ref[row, off + j]
                        t_best = acc if mode == "f32" else acc.astype(dt)
                        hs = []
                        mets = []
                        for ch in range(8):
                            b = ch * 8
                            h = slab(sl, b, t_best)
                            hs.append(h.astype(jnp.int32))
                            mets.append(sl(b + 6).astype(jnp.int32))
                            mets.append(sl(b + 7).astype(jnp.int32))
                        if reduce_mode == "sum4":
                            sums = [jnp.sum(hs[2 * k] + (hs[2 * k + 1] << 16))
                                    for k in range(4)]
                        elif reduce_mode == "sum1":
                            m = hs[0]
                            for ch in range(1, 8):
                                m = m | (hs[ch] << ch)
                            sums = [jnp.sum(m), jnp.int32(0), jnp.int32(0),
                                    jnp.int32(0)]
                        else:  # none: consume masks without cross-lane reduce
                            m = hs[0]
                            for ch in range(1, 8):
                                m = m | (hs[ch] << ch)
                            # fold into acc (vector) — no vector->scalar sync
                            sums = None
                            return (*mets, m)
                        return (*mets, *sums)

                    return inner

                vals = jax.lax.switch(i & 1, [half(0), half(64)], None)
                mets = vals[:16]
                if reduce_mode == "none":
                    m = vals[16]
                    acc2 = acc + m.astype(jnp.float32) * 1e-9
                    # scalar pushes driven by meta only (always-true-ish)
                    sp = stack_ref[0]
                    do = (mets[0] + i) & 1

                    @pl.when(do == 0)
                    def _():
                        stack_ref[sp & 63] = mets[1]

                    return i + 1, acc2
                else:
                    s = vals[16]
                    acc2 = acc + jnp.float32(s & 1) * 1e-9
                    sp = stack_ref[0]
                    for k in range(2):
                        do = ((vals[16 + k] >> (k & 15)) + i) & 1

                        @pl.when(do == 0)
                        def _(k=k):
                            stack_ref[(sp + k) & 63] = mets[k]

                    return i + 1, acc2

            _, acc = jax.lax.while_loop(
                lambda c: c[0] < iters, body,
                (jnp.int32(0), jnp.full((rows, 128), 1e30, jnp.float32)))
            out_ref[:] = acc

        return kernel

    tab = np.random.rand(64, 128).astype(np.float32) + 0.5
    shape = (rows, 128)
    rng = np.random.default_rng(0)
    args = [jnp.asarray(rng.standard_normal(shape), jnp.float32)
            for _ in range(6)]

    for mode in ("f32", "bf16"):
        for red in ("sum4", "sum1", "none"):
            f = pl.pallas_call(
                make(mode, red),
                in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)] * 7,
                out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
                out_shape=jax.ShapeDtypeStruct(shape, jnp.float32),
                scratch_shapes=[pltpu.SMEM((64,), jnp.int32)],
            )
            g = jax.jit(lambda *a: f(jnp.asarray(tab), *a))
            try:
                r = g(*args)
                r.block_until_ready()
                t0 = time.perf_counter()
                n = 5
                for _ in range(n):
                    r = g(*args)
                r.block_until_ready()
                dt_s = (time.perf_counter() - t0) / n
                cyc = dt_s * CLOCK_GHZ * 1e9 / iters
                print(f"rows={rows} {mode} reduce={red}: {dt_s*1e3:.2f} ms "
                      f"-> {cyc:.0f} cyc/iter")
            except Exception as e:
                print(f"rows={rows} {mode} reduce={red}: FAILED {type(e).__name__}: {e}")


if __name__ == "__main__":
    main()
