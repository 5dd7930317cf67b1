#!/usr/bin/env python
"""Scatter-max strategy microbench (the voxelizer's remaining whale).

Scatters N 4-channel samples into a (4, M) grid with per-cell max.
Variants:
  raw        — grid.at[:, idx].max(vals) as-is (measured 86 ms @ 1M->16.7M)
  sorted     — sort by cell first, scatter with indices_are_sorted
  sorted+uni — sort, segmented max-scan, dumpster non-run-tails, scatter
               with indices_are_sorted + unique_indices
The sort/scan cost is INSIDE the timed region — the question is whether
XLA's TPU scatter has a fast path worth paying for.

Env: IDK_SCAT_N (1M), IDK_SCAT_M (16.7M), IDK_BENCH_REPS (5).
"""
import os
import sys
import time

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR",
                      os.path.expanduser("~/.cache/jax_cache"))
sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np


def main():
    import jax
    import jax.numpy as jnp

    N = int(os.environ.get("IDK_SCAT_N", 1 << 20))
    M = int(os.environ.get("IDK_SCAT_M", 256 ** 3))
    reps = int(os.environ.get("IDK_BENCH_REPS", 5))
    rng = np.random.default_rng(0)
    # cell ids with realistic duplication (surface voxelization: ~3-4x)
    idx = jnp.asarray(rng.integers(0, M // 3, N).astype(np.int32) * 3 % M)
    vals = jnp.asarray(rng.random((4, N), np.float32))

    def timed(fn, *args):
        # axon: block_until_ready is unreliable — force a host fetch
        _ = float(fn(jnp.float32(0), *args))
        t0 = time.time()
        for i in range(reps):
            out = fn(jnp.float32(1e-6 * (i + 1)), *args)
        _ = float(out)
        return (time.time() - t0) / reps * 1e3

    @jax.jit
    def raw(salt, idx, vals):
        g = jnp.zeros((4, M), jnp.float32)
        return jnp.sum(g.at[:, idx].max(vals + salt))

    @jax.jit
    def sorted_scatter(salt, idx, vals):
        k, v0, v1, v2, v3 = jax.lax.sort(
            (idx, vals[0] + salt, vals[1], vals[2], vals[3]), num_keys=1)
        g = jnp.zeros((4, M), jnp.float32)
        g = g.at[:, k].max(jnp.stack([v0, v1, v2, v3], 0),
                           indices_are_sorted=True)
        return jnp.sum(g)

    @jax.jit
    def sorted_unique(salt, idx, vals):
        k, v0, v1, v2, v3 = jax.lax.sort(
            (idx, vals[0] + salt, vals[1], vals[2], vals[3]), num_keys=1)
        same = jnp.concatenate([k[:-1] == k[1:], jnp.zeros((1,), bool)])

        def comb(a, b):
            # segmented max-scan: (value, segment-start flag)
            av, af = a
            bv, bf = b
            return jnp.where(bf, bv, jnp.maximum(av, bv)), af | bf

        start = jnp.concatenate([jnp.ones((1,), bool), k[1:] != k[:-1]])
        sv = [jax.lax.associative_scan(comb, (v, start))[0]
              for v in (v0, v1, v2, v3)]
        kk = jnp.where(same, M, k)  # only run tails survive (M = dumpster)
        g = jnp.zeros((4, M + 1), jnp.float32)
        g = g.at[:, kk].max(jnp.stack(sv, 0), indices_are_sorted=True,
                            unique_indices=True)
        return jnp.sum(g[:, :M])

    from idkengine_tpu.ops.voxel_scatter import scatter_max_dense

    @jax.jit
    def pallas_onehot(salt, idx, vals):
        return jnp.sum(scatter_max_dense(idx, vals + salt, M))

    @jax.jit
    def pallas_onehot_bf16(salt, idx, vals):
        return jnp.sum(scatter_max_dense(idx, vals + salt, M, bf16=True))

    for name, fn in [("raw       ", raw), ("sorted    ", sorted_scatter),
                     ("sorted+uni", sorted_unique),
                     ("pallas-1hot", pallas_onehot),
                     ("pallas-bf16", pallas_onehot_bf16)]:
        try:
            ms = timed(fn, idx, vals)
        except Exception as e:
            print(f"{name}  FAILED: {type(e).__name__} "
                  f"{str(e).splitlines()[0][:100]}", flush=True)
            continue
        print(f"{name}  N={N>>20}M M={M>>20}M  {ms:8.2f} ms "
              f"({N/ms/1e3:.0f} Mupd/s)", flush=True)


if __name__ == "__main__":
    main()
