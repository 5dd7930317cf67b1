#!/usr/bin/env python
"""HW repro for the 2.8M steered-loop abort: force a small scene into many
wave segments (IDK_STEER_VMEM) so K and table shapes approach the headline
config without the 2.8M build cost. Bisect dials via env:
  IDK_TRIS (default 300k), IDK_STEER_VMEM (set small outside), IDK_RAYS.
"""
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np


def main():
    import jax
    import jax.numpy as jnp

    from idkengine_tpu.bvh.builder import BuildSettings
    from idkengine_tpu.ops.packet_trace import (
        BOUNCE_ROWS, packet_trace_closest_steered, packet_trace_any_steered)
    from idkengine_tpu.scene.procedural import atrium
    from idkengine_tpu.scene.scene_db import SceneDatabase

    tris = int(os.environ.get("IDK_TRIS", 300_000))
    n_rays = int(os.environ.get("IDK_RAYS", 1 << 20))
    t0 = time.time()
    db = SceneDatabase(BuildSettings(
        max_leaf_triangle_count=12, traversal_cost=4.0, presplit_factor=0.0))
    db.add_model(atrium(tris))
    sc = db.build()
    ws = db.wave_set()
    assert ws is not None
    S = len(ws.segs)
    print(f"build {time.time()-t0:.1f}s, segs={S}", flush=True)

    # incoherent rays from random surface-ish points (deterministic)
    r = np.random.RandomState(0)
    o = r.uniform(-10, 10, size=(n_rays, 3)).astype(np.float32)
    d = r.normal(size=(n_rays, 3)).astype(np.float32)
    d /= np.linalg.norm(d, axis=1, keepdims=True)
    o_j, d_j = jnp.asarray(o), jnp.asarray(d)
    tm = jnp.full((n_rays,), 3.4e38, jnp.float32)

    t1 = time.time()
    hit = jax.block_until_ready(packet_trace_closest_steered(
        ws.segs, ws.pairs_stack, ws.leaf_stack, ws.seg_min, ws.seg_max,
        o_j, d_j, tm, rows=BOUNCE_ROWS))
    print(f"closest ok {time.time()-t1:.1f}s "
          f"hit {float(jnp.mean(hit.slot >= 0)):.3f}", flush=True)

    tma = jnp.full((n_rays,), 100.0, jnp.float32)
    t2 = time.time()
    occ = jax.block_until_ready(packet_trace_any_steered(
        ws.segs, ws.pairs_stack, ws.leaf_stack, ws.seg_min, ws.seg_max,
        o_j, d_j, tma, rows=BOUNCE_ROWS))
    print(f"any ok {time.time()-t2:.1f}s occ {float(jnp.mean(occ)):.3f}",
          flush=True)
    print("REPRO_PASS", flush=True)


if __name__ == "__main__":
    main()
