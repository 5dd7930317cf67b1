#!/usr/bin/env python
"""Per-hit attribute fetch strategies (the 117 ms/2M-gather problem).

The (T,32) packed attr table gets laid out column-major by XLA (dense,
consumer-friendly) which makes each per-hit row gather touch 32 strided
tiles. Variants:
  naive    — tbl[idx] row gather from (T,32), XLA-chosen layouts
  packed4  — 4 slots per 128-lane row: (T/4,128) dense row gather (one
             tile/hit) + layout-pinned transpose + 4-way lane-group
             select per channel
  padded128— 1 slot per 128-lane row (lanes 0:31 = channels, 4x HBM):
             dense row gather (353 Mrows/s class, tools/bench_pairs.py)
             + slice + transpose to SoA, no select chain. This is what
             the PathTracer builds under IDK_ATTR_ROWS=1.
Consumption modeled as a weighted sum of all 32 channels.

Env: IDK_ATTR_T (2.75M), IDK_ATTR_N (2M), IDK_BENCH_REPS (5).
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
    from jax.experimental.layout import Format, Layout, with_layout_constraint

    T = int(os.environ.get("IDK_ATTR_T", 2_755_496))
    N = int(os.environ.get("IDK_ATTR_N", 2_073_600))
    reps = int(os.environ.get("IDK_BENCH_REPS", 5))
    rng = np.random.default_rng(0)
    tbl_np = rng.random((T, 32), np.float32)
    tbl = jnp.asarray(tbl_np)
    T4 = (T + 3) // 4
    p4 = np.zeros((T4 * 4, 32), np.float32)
    p4[:T] = tbl_np
    tbl4 = jnp.asarray(p4.reshape(T4, 128))
    idx = jnp.asarray(rng.integers(0, T, N).astype(np.int32))
    w = jnp.asarray(rng.random((32,), np.float32))

    def timed(fn, *args):
        _ = float(fn(jnp.int32(0), *args))
        t0 = time.time()
        for i in range(reps):
            out = fn(jnp.int32(i + 1), *args)
        _ = float(out)
        return (time.time() - t0) / reps * 1e3

    @jax.jit
    def naive(salt, idx, tbl, w):
        g = tbl[(idx + salt) % T]
        return jnp.sum(g * w[None, :])

    fmt = Layout((1, 0))

    @jax.jit
    def packed4(salt, idx, tbl4, w):
        s = (idx + salt) % T
        g = tbl4[s >> 2]  # (N,128) one-tile rows
        g = with_layout_constraint(g, fmt)
        gt = g.T          # (128,N) real transpose
        gt = with_layout_constraint(gt, fmt)
        sub = s & 3
        acc = jnp.zeros((N,), jnp.float32)
        for c in range(32):
            v = jnp.where(sub == 0, gt[c],
                          jnp.where(sub == 1, gt[32 + c],
                                    jnp.where(sub == 2, gt[64 + c],
                                              gt[96 + c])))
            acc = acc + v * w[c]
        return jnp.sum(acc)

    p128 = np.zeros((T, 128), np.float32)
    p128[:, :32] = tbl_np
    tbl128 = jnp.asarray(p128)
    del p128

    @jax.jit
    def padded128(salt, idx, tbl128, w):
        s = (idx + salt) % T
        gt = tbl128[s, :32].T  # (32,N) SoA
        acc = jnp.zeros((N,), jnp.float32)
        for c in range(32):
            acc = acc + gt[c] * w[c]
        return jnp.sum(acc)

    @jax.jit
    def pad_full_t(salt, idx, tbl128, w):
        """Gather FULL (N,128) rows (no slice inside the gather), pin the
        row-major layout, transpose whole, slice 32 sublanes after."""
        s = (idx + salt) % T
        g = tbl128[s]
        g = with_layout_constraint(g, fmt)
        gt = g.T  # (128,N)
        gt = with_layout_constraint(gt, fmt)
        acc = jnp.zeros((N,), jnp.float32)
        for c in range(32):
            acc = acc + gt[c] * w[c]
        return jnp.sum(acc)

    @jax.jit
    def pad_weight_mm(salt, idx, tbl128, w):
        """Consume via a (N,128)@(128,) matvec — the MXU eats the reduce,
        no transpose at all. Only works for weighted-sum style consumers,
        but shading wants individual channels... benchmark the bound."""
        s = (idx + salt) % T
        g = tbl128[s]
        w128 = jnp.concatenate([w, jnp.zeros((96,), jnp.float32)])
        return jnp.sum(g @ w128)

    @jax.jit
    def pad_dot_t(salt, idx, tbl128, w):
        """Transpose via MXU: gt = I32x128 @ g^T expressed as dot_general
        (128,N) = (128,128) @ (N,128)^T — contraction on lanes, output
        sublane-major. XLA picks the layout; the matmul's (128,128) eye is
        free next to the (N,128) stream."""
        s = (idx + salt) % T
        g = tbl128[s]  # (N,128)
        eye = jnp.eye(128, dtype=jnp.float32)
        gt = jax.lax.dot_general(eye, g, (((1,), (1,)), ((), ())))  # (128,N)
        acc = jnp.zeros((N,), jnp.float32)
        for c in range(32):
            acc = acc + gt[c] * w[c]
        return jnp.sum(acc)

    r0 = float(naive(jnp.int32(7), idx, tbl, w))
    variants = [("naive    ", naive, (tbl, w)),
                ("packed4  ", packed4, (tbl4, w)),
                ("padded128", padded128, (tbl128, w)),
                ("padfull_t", pad_full_t, (tbl128, w)),
                ("pad_wt_mm", pad_weight_mm, (tbl128, w)),
                ("pad_dot_t", pad_dot_t, (tbl128, w))]
    only = os.environ.get("IDK_ATTR_ONLY", "")
    if only:
        variants = [v for v in variants
                    if v[0].strip() in only.split(",")] or variants
    for name, fn, extra in variants:
        try:
            rv = float(fn(jnp.int32(7), idx, *extra))
            assert abs(r0 - rv) / max(abs(r0), 1) < 1e-4, (r0, rv, name)
        except AssertionError:
            raise
        except Exception as e:
            print(f"{name}  FAILED: {type(e).__name__} "
                  f"{str(e).splitlines()[0][:110]}", flush=True)
            continue
        try:
            ms = timed(fn, idx, *extra)
        except Exception as e:
            print(f"{name}  FAILED: {type(e).__name__} "
                  f"{str(e).splitlines()[0][:110]}", flush=True)
            continue
        print(f"{name}  T={T} N={N}  {ms:8.2f} ms ({N/ms/1e3:.0f} Mhits/s)",
              flush=True)


if __name__ == "__main__":
    main()
