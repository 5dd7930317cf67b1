#!/usr/bin/env python
"""Microbench: row-gather strategies for per-hit attribute fetch on TPU.

2M hit slots into a ~108K-row attribute table. Variants: row widths,
flat-index, take, sorted indices, bf16, one-hot matmul (small table).
Reports device-profiled deltas vs an empty baseline dispatch.
"""
import time

import numpy as np


def timed(fn, *args, reps=5):
    import jax
    out = jax.block_until_ready(fn(*args))
    t0 = time.perf_counter()
    for _ in range(reps):
        out = jax.block_until_ready(fn(*args))
    return (time.perf_counter() - t0) / reps * 1e3


def main():
    import jax
    import jax.numpy as jnp

    R = 1920 * 1080
    N = 108_464
    rng_ = np.random.default_rng(0)
    # spatially-coherent-ish indices: sorted blocks with jitter (mimics
    # tile-swizzled packet hits)
    base = np.sort(rng_.integers(0, N, R))
    jit_idx = np.clip(base + rng_.integers(-50, 50, R), 0, N - 1).astype(np.int32)
    rnd_idx = rng_.integers(0, N, R).astype(np.int32)

    tbl9 = jnp.asarray(rng_.standard_normal((N, 9)), jnp.float32)
    tbl16 = jnp.asarray(rng_.standard_normal((N, 16)), jnp.float32)
    tbl13 = jnp.asarray(rng_.standard_normal((N, 13)), jnp.float32)
    tbl_bf = tbl16.astype(jnp.bfloat16)
    idx_c = jnp.asarray(jit_idx)
    idx_r = jnp.asarray(rnd_idx)

    baseline = timed(jax.jit(lambda i: i + 1), idx_c)
    print(f"baseline dispatch      {baseline:8.1f} ms")

    for name, fn, arg in [
        ("rows9   coherent", jax.jit(lambda i: tbl9[i]), idx_c),
        ("rows9   random  ", jax.jit(lambda i: tbl9[i]), idx_r),
        ("rows16  coherent", jax.jit(lambda i: tbl16[i]), idx_c),
        ("rows16  bf16 coh", jax.jit(lambda i: tbl_bf[i]), idx_c),
        ("take16  coherent", jax.jit(lambda i: jnp.take(tbl16, i, axis=0)), idx_c),
        ("rows13  coherent", jax.jit(lambda i: tbl13[i]), idx_c),
        ("flat9x  coherent", jax.jit(
            lambda i: tbl9.reshape(-1)[(i[:, None] * 9 + jnp.arange(9)).reshape(-1)].reshape(-1, 9)), idx_c),
    ]:
        ms = timed(fn, arg)
        print(f"{name}   {ms:8.1f} ms   (-base {ms - baseline:7.1f})")

    # small material table: one-hot matmul vs gather
    M = 8
    mat = jnp.asarray(rng_.standard_normal((M, 16)), jnp.float32)
    mid = jnp.asarray(rng_.integers(0, M, R).astype(np.int32))
    g = jax.jit(lambda i: mat[i])
    oh = jax.jit(lambda i: jax.nn.one_hot(i, M, dtype=jnp.bfloat16) @ mat.astype(jnp.bfloat16))
    print(f"mat gather (8 rows)    {timed(g, mid) - baseline:8.1f} ms")
    print(f"mat one-hot matmul     {timed(oh, mid) - baseline:8.1f} ms")

    # fused: three gathers in ONE jit (what the frame actually does)
    three = jax.jit(lambda i: (tbl9[i], tbl13[i], mat[jnp.clip(i, 0, M - 1)]))
    print(f"three-gathers-one-jit  {timed(three, idx_c) - baseline:8.1f} ms")


if __name__ == "__main__":
    main()
