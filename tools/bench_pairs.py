#!/usr/bin/env python
"""Feasibility microbench for TWO-PHASE traversal (phase B: dense pair tests).

The packet kernel's leaf visits test all `rows x 128` rays against <=12
triangles even though only ~5-10% of rays want that leaf — lane efficiency
is the bounce-closest wall (BENCH_NOTES). The two-phase redesign emits
per-ray (ray, leaf) candidate pairs in the kernel (cheap append via
c==k masks) and tests them DENSELY outside: one XLA op that gathers each
pair's leaf row (12 tris x 9 f32 in a 128-lane row) from HBM and runs
masked Moller against the pair's own ray.

This bench measures exactly that consumer in isolation:
  1. gather+sum            — upper bound on row-gather throughput
  2. gather+moller12+min   — the real phase-B shape
  3. same with leaf-coherent (blocky) indices — emitted pairs are
     ray-major with strong locality between consecutive rays

Env: IDK_PAIR_N (16M), IDK_PAIR_L (16384 rows), IDK_BENCH_REPS (5).
Wall-clock salted reps (axon pool memoizes identical args; bench_trace.py
method, +-5% vs profiler).
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

    N = int(os.environ.get("IDK_PAIR_N", 16 * 1024 * 1024))
    L = int(os.environ.get("IDK_PAIR_L", 16384))
    reps = int(os.environ.get("IDK_BENCH_REPS", 5))
    rng = np.random.default_rng(0)

    tbl = jnp.asarray(rng.standard_normal((L, 128)), jnp.float32)
    idx_r = jnp.asarray(rng.integers(0, L, N).astype(np.int32))
    # leaf-coherent: runs of ~32 rays sharing a neighborhood of ~64 leaves
    base = np.repeat(rng.integers(0, L, N // 32), 32)
    idx_c = jnp.asarray(
        np.clip(base + rng.integers(-32, 32, N), 0, L - 1).astype(np.int32))
    o = jnp.asarray(rng.standard_normal((N, 3)), jnp.float32)
    d = jnp.asarray(rng.standard_normal((N, 3)), jnp.float32)

    def timed(fn, *args):
        out = jax.block_until_ready(fn(jnp.float32(0), *args))
        t0 = time.time()
        for i in range(reps):
            out = fn(jnp.float32(1e-6 * (i + 1)), *args)
        jax.block_until_ready(out)
        return (time.time() - t0) / reps * 1e3, out

    @jax.jit
    def gather_sum(salt, idx):
        return jnp.sum(tbl[idx]) + salt

    @jax.jit
    def phase_b(salt, idx, o, d):
        g = tbl[idx]  # (N,128): 12 tris x 9 f32
        ox, oy, oz = o[:, 0] + salt, o[:, 1], o[:, 2]
        dx, dy, dz = d[:, 0], d[:, 1], d[:, 2]
        t_best = jnp.full((N,), 3.4e38, jnp.float32)
        slot = jnp.full((N,), -1, jnp.int32)
        for k in range(12):
            b = k * 9
            p0x, p0y, p0z = g[:, b], g[:, b + 1], g[:, b + 2]
            e1x, e1y, e1z = g[:, b + 3], g[:, b + 4], g[:, b + 5]
            e2x, e2y, e2z = g[:, b + 6], g[:, b + 7], g[:, b + 8]
            pvx = dy * e2z - dz * e2y
            pvy = dz * e2x - dx * e2z
            pvz = dx * e2y - dy * e2x
            det = e1x * pvx + e1y * pvy + e1z * pvz
            inv = jnp.where(jnp.abs(det) > 1e-12, 1.0 / det, 0.0)
            sx, sy, sz = ox - p0x, oy - p0y, oz - p0z
            uu = (sx * pvx + sy * pvy + sz * pvz) * inv
            qx = sy * e1z - sz * e1y
            qy = sz * e1x - sx * e1z
            qz = sx * e1y - sy * e1x
            vv = (dx * qx + dy * qy + dz * qz) * inv
            tt = (e2x * qx + e2y * qy + e2z * qz) * inv
            ok = ((uu >= 0) & (uu <= 1) & (vv >= 0) & (uu + vv <= 1)
                  & (tt > 0) & (tt < t_best))
            t_best = jnp.where(ok, tt, t_best)
            slot = jnp.where(ok, idx * 12 + k, slot)
        return jnp.sum(jnp.where(slot >= 0, t_best, 0.0)) + jnp.sum(slot)

    @jax.jit
    def phase_b_chunked(salt, idx, o, d):
        # production shape: chunk the pair stream so the materialized
        # row-gather stays ~1 GB
        C = 4
        n = N // C
        acc = jnp.float32(0)
        for c in range(C):
            sl = slice(c * n, (c + 1) * n)
            g = tbl[idx[sl]]
            ox = o[sl, 0] + salt
            oy, oz = o[sl, 1], o[sl, 2]
            dx, dy, dz = d[sl, 0], d[sl, 1], d[sl, 2]
            t_best = jnp.full((n,), 3.4e38, jnp.float32)
            slot = jnp.full((n,), -1, jnp.int32)
            for k in range(12):
                b = k * 9
                p0x, p0y, p0z = g[:, b], g[:, b + 1], g[:, b + 2]
                e1x, e1y, e1z = g[:, b + 3], g[:, b + 4], g[:, b + 5]
                e2x, e2y, e2z = g[:, b + 6], g[:, b + 7], g[:, b + 8]
                pvx = dy * e2z - dz * e2y
                pvy = dz * e2x - dx * e2z
                pvz = dx * e2y - dy * e2x
                det = e1x * pvx + e1y * pvy + e1z * pvz
                inv = jnp.where(jnp.abs(det) > 1e-12, 1.0 / det, 0.0)
                sx, sy, sz = ox - p0x, oy - p0y, oz - p0z
                uu = (sx * pvx + sy * pvy + sz * pvz) * inv
                qx = sy * e1z - sz * e1y
                qy = sz * e1x - sx * e1z
                qz = sx * e1y - sy * e1x
                vv = (dx * qx + dy * qy + dz * qz) * inv
                tt = (e2x * qx + e2y * qy + e2z * qz) * inv
                ok = ((uu >= 0) & (uu <= 1) & (vv >= 0) & (uu + vv <= 1)
                      & (tt > 0) & (tt < t_best))
                t_best = jnp.where(ok, tt, t_best)
                slot = jnp.where(ok, idx[sl] * 12 + k, slot)
            acc = acc + jnp.sum(jnp.where(slot >= 0, t_best, 0.0))
        return acc

    gb = N * 128 * 4 / 1e9
    for name, fn, args in [
        ("gather+sum  random  ", gather_sum, (idx_r,)),
        ("gather+sum  coherent", gather_sum, (idx_c,)),
        ("phaseB-chnk random  ", phase_b_chunked, (idx_r, o, d)),
        ("phaseB-chnk coherent", phase_b_chunked, (idx_c, o, d)),
        ("phaseB      random  ", phase_b, (idx_r, o, d)),
        ("phaseB      coherent", phase_b, (idx_c, o, d)),
    ]:
        try:
            ms, _ = timed(fn, *args)
        except Exception as e:
            print(f"{name}  FAILED: {type(e).__name__} "
                  f"{str(e).splitlines()[0][:100]}", flush=True)
            continue
        print(f"{name}  N={N>>20}M L={L}  {ms:8.2f} ms   "
              f"{gb/ms*1e3:7.1f} GB/s  ({N/ms/1e3:.0f} Mpairs/s)",
              flush=True)


if __name__ == "__main__":
    main()
