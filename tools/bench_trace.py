#!/usr/bin/env python
"""Microbenchmark: packet_trace_closest in isolation (no shading).

Usage: IDK_PACKET_ROWS=8 python tools/bench_trace.py [raster|tile|sortkey]
Prints Mrays/s for primary rays on the 110k-tri atrium.
"""
import os
import sys
import time

import numpy as np


def tile_swizzle(w: int, h: int, tw: int, th: int) -> np.ndarray:
    """Permutation: position i in the ray pool holds pixel swz[i]; pixels are
    laid out tile-by-tile (tw x th tiles, row-major within a tile)."""
    px = np.arange(w * h, dtype=np.int64)
    x = px % w
    y = px // w
    tile_x = x // tw
    tile_y = y // th
    n_tx = (w + tw - 1) // tw
    key = ((tile_y * n_tx + tile_x) << 24) | ((y % th) * tw + (x % tw))
    return np.argsort(key, kind="stable").astype(np.int32)


def main():
    import jax
    import jax.numpy as jnp

    from idkengine_tpu.bvh.builder import BuildSettings
    from idkengine_tpu.ops.packet_trace import PACKET, packet_trace_closest
    from idkengine_tpu.render.camera import Camera, generate_rays
    from idkengine_tpu.scene.procedural import atrium
    from idkengine_tpu.scene.scene_db import SceneDatabase

    mode = sys.argv[1] if len(sys.argv) > 1 else "raster"
    w = int(os.environ.get("IDK_BENCH_RES_W", 1920))
    h = int(os.environ.get("IDK_BENCH_RES_H", 1080))
    tris = int(os.environ.get("IDK_BENCH_TRIS", 110_000))

    db = SceneDatabase(BuildSettings(
        max_leaf_triangle_count=12, traversal_cost=4.0, presplit_factor=0.0))
    db.add_model(atrium(tris))
    db.build()
    ps = db.packet_scene

    cam = Camera(position=np.array([0.0, 3.0, 24.0], np.float32), yaw=-90.0, fov_y=65.0)
    o, d = generate_rays(cam.ray_params(w, h), w, h, jnp.zeros(2))
    if mode == "tile":
        tw = int(os.environ.get("IDK_TILE_W", 32))
        th = int(os.environ.get("IDK_TILE_H", 32))
        swz = tile_swizzle(w, h, tw, th)
        o, d = o[swz], d[swz]
    elif mode == "sortkey":
        key = (d[:, 0] >= 0) * 1 + (d[:, 1] >= 0) * 2 + (d[:, 2] >= 0) * 4
        perm = jnp.argsort(key)
        o, d = o[perm], d[perm]
    o = jax.device_put(o)
    d = jax.device_put(d)
    tm = jnp.full((w * h,), 3.4e38, jnp.float32)

    hit = packet_trace_closest(ps, o, d, tm)
    hit.t.block_until_ready()
    hits = float(jnp.mean((hit.slot >= 0).astype(jnp.float32)))

    reps = int(os.environ.get("IDK_BENCH_REPS", 8))
    t0 = time.time()
    for i in range(reps):
        # salt each rep (the axon pool memoizes identical-args executions)
        hit = packet_trace_closest(ps, o, d, tm * (1.0 + (i + 1) * 1e-6))
    hit.t.block_until_ready()
    dt = time.time() - t0
    mrays = w * h * reps / dt / 1e6
    print(f"{mode} rows={PACKET//128}: {mrays:.2f} Mrays/s "
          f"({dt/reps*1000:.1f} ms/trace, hit {hits:.3f})")


if __name__ == "__main__":
    main()
