#!/usr/bin/env python
"""Cycles/iteration for the packet tracer under IDK_ABLATE knobs.

Runs the real kernel on primary (tile-swizzled) and sorted-bounce rays,
reporting wall ms, total traversal iterations and derived cycles/iter.
Ablations change traversal (wrong results) — cycles/iter stays meaningful.
"""
import os
import time

import numpy as np

CLOCK_GHZ = 1.59


def main():
    import jax
    import jax.numpy as jnp

    from idkengine_tpu.bvh.builder import BuildSettings
    from idkengine_tpu.ops.packet_trace import _pallas_trace
    from idkengine_tpu.render.camera import Camera, generate_rays
    from idkengine_tpu.render.pathtracer import tile_swizzle
    from idkengine_tpu.scene.procedural import atrium
    from idkengine_tpu.scene.scene_db import SceneDatabase

    w, h = 1920, 1080
    rows = int(os.environ.get("IDK_ROWS", 32))
    db = SceneDatabase(BuildSettings(
        max_leaf_triangle_count=12, traversal_cost=4.0, presplit_factor=0.0))
    db.add_model(atrium(110_000))
    sc = db.build()
    ps = db.packet_scene
    cam = Camera(position=np.array([0, 3, 24], np.float32), yaw=-90.0,
                 fov_y=65.0)
    swz = jnp.asarray(tile_swizzle(w, h))
    o, d = generate_rays(cam.ray_params(w, h), w, h, jnp.zeros(2), px=swz)
    tm = jnp.full((w * h,), 3.4e38, jnp.float32)

    def spread(x, bits):
        x = x.astype(jnp.int64)
        r = jnp.zeros_like(x)
        for i in range(bits):
            r = r | (((x >> i) & 1) << (3 * i))
        return r

    def run(name, o_, d_, tm_):
        dbg = jax.jit(lambda o, d, t: _pallas_trace(
            ps, o, d, t, False, False, rows=rows, debug_iters=True))
        res = dbg(o_, d_, tm_)
        raw = np.asarray(res[1])[:: rows * 128].astype(np.int64)
        it = (raw & 0xFFFF).sum()
        lf = (raw >> 16).sum()
        f = jax.jit(lambda o, d, t: _pallas_trace(
            ps, o, d, t, False, False, rows=rows))
        r = f(o_, d_, tm_)
        jax.block_until_ready(r)
        t0 = time.perf_counter()
        n = 3
        for _ in range(n):
            r = f(o_, d_, tm_)
        jax.block_until_ready(r)
        dt = (time.perf_counter() - t0) / n
        cyc = dt * CLOCK_GHZ * 1e9 / max(it, 1)
        print(f"{name}: {dt*1e3:.1f} ms, iters={it} (leaf {lf}, "
              f"{100*lf/max(it,1):.0f}%), {cyc:.0f} cyc/iter")
        return r

    hit = run("primary", o, d, tm)

    # sorted bounce rays (cosine hemisphere about geometric normal)
    slot = jnp.maximum(hit.slot, 0)
    gn = jnp.asarray(sc.tri_gn)[slot]
    flip = jnp.sum(gn * d, axis=-1) > 0.0
    gn = jnp.where(flip[:, None], -gn, gn)
    hp = o + d * hit.t[:, None]
    key = jax.random.PRNGKey(1)
    u1, u2 = jax.random.uniform(key, (2, w * h))
    r_ = jnp.sqrt(u1)
    phi = 2 * np.pi * u2
    tang = jnp.where(jnp.abs(gn[:, 0:1]) < 0.9,
                     jnp.array([[1.0, 0, 0]]), jnp.array([[0, 1.0, 0]]))
    tx = jnp.cross(gn, tang)
    tx = tx / jnp.maximum(jnp.linalg.norm(tx, axis=-1, keepdims=True), 1e-9)
    ty = jnp.cross(gn, tx)
    d2 = (tx * (r_ * jnp.cos(phi))[:, None] + ty * (r_ * jnp.sin(phi))[:, None]
          + gn * jnp.sqrt(jnp.maximum(1 - u1, 0))[:, None])
    o2 = hp + gn * 1e-3
    alive = hit.slot >= 0
    tm2 = jnp.where(alive, jnp.float32(3.4e38), -1.0)
    lo = jnp.asarray(sc.node_min[0])
    ext = jnp.asarray(sc.node_max[0]) - lo
    oc = ((d2[:, 0] >= 0) * 1 + (d2[:, 1] >= 0) * 2
          + (d2[:, 2] >= 0) * 4).astype(jnp.int32)
    nq = 1 << 5
    q = jnp.clip((o2 - lo) / jnp.maximum(ext, 1e-6) * nq, 0,
                 nq - 1).astype(jnp.int32)
    cell = (q[:, 0] << 10) | (q[:, 1] << 5) | q[:, 2]
    k = jnp.where(alive, (oc << 15) | cell, jnp.int32(1 << 30))
    p = jnp.argsort(k)
    run("bounce-sorted", o2[p], d2[p], tm2[p])


if __name__ == "__main__":
    main()
