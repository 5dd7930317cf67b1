#!/usr/bin/env python
"""Probe: cost of basic XLA ops at 2M rows on this TPU (axon backend)."""
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
    rng_ = np.random.default_rng(0)
    a = jnp.asarray(rng_.standard_normal((R,)), jnp.float32)
    a3 = jnp.asarray(rng_.standard_normal((R, 3)), jnp.float32)
    a16 = jnp.asarray(rng_.standard_normal((R, 16)), jnp.float32)
    i32 = jnp.asarray(rng_.integers(0, 8, R).astype(np.int32))
    small = jnp.asarray(rng_.standard_normal((8, 16)), jnp.float32)

    probes = [
        ("add (R,)", jax.jit(lambda x: x + 1.0), a),
        ("add (R,16)", jax.jit(lambda x: x + 1.0), a16),
        ("mul+add chain x8 (R,16)", jax.jit(
            lambda x: ((((((((x * 1.1 + 1) * 1.1 + 1) * 1.1 + 1) * 1.1 + 1)
                          * 1.1 + 1) * 1.1 + 1) * 1.1 + 1) * 1.1 + 1)), a16),
        ("sum (R,16)->()", jax.jit(lambda x: jnp.sum(x)), a16),
        ("norm rows (R,3)", jax.jit(
            lambda x: x / jnp.linalg.norm(x, axis=-1, keepdims=True)), a3),
        ("where (R,16)", jax.jit(lambda x: jnp.where(x > 0, x, -x)), a16),
        ("one_hot8 (R,)", jax.jit(lambda i: jax.nn.one_hot(i, 8, dtype=jnp.bfloat16)), i32),
        ("iota+cmp (R,8)", jax.jit(
            lambda i: (i[:, None] == jnp.arange(8)[None, :]).astype(jnp.bfloat16)), i32),
        ("matmul (R,8)@(8,16) pre1h", jax.jit(
            lambda oh: oh @ small), jnp.asarray(
                np.eye(8, dtype=np.float32)[np.asarray(i32)])),
        ("gather small (R,) from (8,16)", jax.jit(lambda i: small[i]), i32),
        ("reshape (R,16)->(R/128,128,16)", jax.jit(
            lambda x: x.reshape(-1, 128, 16) + 0.0), a16),
        ("stack3 (R,)", jax.jit(lambda x: jnp.stack([x, x, x], -1)), a),
        ("concat (R,3)+(R,16)", jax.jit(
            lambda x, y: jnp.concatenate([x, y], -1)), a3, a16),
        ("argsort key (R,)", jax.jit(lambda x: jnp.argsort(x)), a),
        ("sort 4payload (R,)", jax.jit(
            lambda x: jax.lax.sort((x, x, x, x), num_keys=1)), a),
    ]
    for name, fn, *args in probes:
        print(f"{name:32s} {timed(fn, *args):8.2f} ms")


if __name__ == "__main__":
    main()
