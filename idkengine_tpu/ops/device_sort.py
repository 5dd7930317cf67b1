"""Device ray-reorder sort — the counting-sort slot.

TPU re-expression of the reference's GPU counting-sort pipeline
(ref: Resource/Shaders/PathTracing/CountingSort/** — per-group
subgroupExclusiveAdd histograms, single-group Blelloch scan over group
sums, then scatter; driven from PathTracer.cs:273-297 with 2^21 bins).

Measured on v5e (2M keys, 18-bit domain):
  - jnp.argsort(key) then gathering the payload: ~76 ms (XLA TPU gathers
    run at ~2 GB/s effective — latency-bound random row access);
  - ONE multi-operand jax.lax.sort((key, *payload_columns)): ~15 ms — the
    sort network carries the payload with the keys, no gather at all;
  - two-pass narrow-key radix (below): ~7 ms for the permutation alone but
    still needs the gathers, so it loses end-to-end.

`sort_rays_by_key` is what the path tracer uses per bounce; `radix_argsort`
is kept for permutation-only callers (parity with Algorithms.cs radix sort
on device).
"""
from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp


def sort_rays_by_key(key: jnp.ndarray, columns: tuple) -> tuple:
    """Reorder payload columns by int32 key with one multi-operand sort.
    Returns the sorted columns (key dropped). Ties are unordered."""
    out = jax.lax.sort((key, *columns), num_keys=1, is_stable=False)
    return out[1:]


@partial(jax.jit, static_argnames=("bits", "passes"))
def radix_argsort(keys: jnp.ndarray, bits: int = 9, passes: int = 2) -> jnp.ndarray:
    """Stable LSD radix argsort of non-negative int32 keys with
    passes*bits significant bits (default 18, matching the ray sort key)."""
    idx = jnp.arange(keys.shape[0], dtype=jnp.int32)
    k = keys
    mask = (1 << bits) - 1
    for p in range(passes):
        sub = (k >> (p * bits)) & mask
        sub, k, idx = jax.lax.sort((sub, k, idx), num_keys=1, is_stable=True)
    return idx
