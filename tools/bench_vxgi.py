#!/usr/bin/env python
"""Voxelize-256^3 device timing — the reference's published VXGI numbers.

ref: Readme.md:240-245 — voxelize 256^3 incl. clear+merge: 19.05 ms
(RTX 3050 Ti L baseline) down to 4.93 ms (FP16 atomics + passthrough GS);
6.49 ms on RX 5700 XT. The TPU path is scatter voxelization (area-
proportional triangle sampling + shadowed direct-light injection +
per-voxel max + mip chain) — one jitted step, device-profiled.

Env: IDK_VXGI_RES (256), IDK_BENCH_TRIS (110k), IDK_VXGI_SAMPLES (1M),
IDK_VXGI_SHADOWED (1 = occlusion-traced injection like the reference's
shadow-mapped fragment lighting).
"""
import os
import sys
import time

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR",
                      os.path.expanduser("~/.cache/jax_cache"))
sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np

CLOCK_GHZ = 1.59


def main():
    import jax
    import jax.numpy as jnp

    try:
        jax.config.update("jax_compilation_cache_dir",
                          os.environ["JAX_COMPILATION_CACHE_DIR"])
    except Exception:
        pass

    from idkengine_tpu.bvh.builder import BuildSettings
    from idkengine_tpu.ops.packet_trace import packet_trace_any
    from idkengine_tpu.render.vxgi import VoxelGrid, VxgiSettings
    from idkengine_tpu.scene.procedural import atrium
    from idkengine_tpu.scene.scene_db import SceneDatabase

    res = int(os.environ.get("IDK_VXGI_RES", 256))
    tris = int(os.environ.get("IDK_BENCH_TRIS", 110_000))
    samples = int(os.environ.get("IDK_VXGI_SAMPLES", 1 << 20))
    shadowed = bool(int(os.environ.get("IDK_VXGI_SHADOWED", "1")))

    db = SceneDatabase(BuildSettings(
        max_leaf_triangle_count=12, traversal_cost=4.0, presplit_factor=0.0))
    db.add_model(atrium(tris))
    sc = db.build()
    db.lights.add([0.0, 10.5, 0.0], [40.0, 38.0, 35.0], radius=0.8)
    lights = {k: jnp.asarray(v) for k, v in db.lights.soa().items()
              if k != "count"}
    mats = {k: jnp.asarray(v) for k, v in db.materials.soa().items()}

    lo = db.blas.nodes["min"][0] - 0.1
    hi = db.blas.nodes["max"][0] + 0.1
    grid = VoxelGrid(lo, hi, VxgiSettings(resolution=res,
                                          max_samples=samples))
    ps = db.packet_scene

    occ = None
    if shadowed:
        occ = lambda o, d, tm: packet_trace_any(ps, o, d, tm)

    def step(scene, mats_, lights_, salt):
        g = grid.voxelize(scene, mats_, lights_, 1, frame=0,
                         occlusion_fn=occ)
        # fold mips into the timed step (the reference's clear+merge+mips)
        return g.sum() + sum(m.sum() for m in grid.mips[1:]) + salt

    jstep = jax.jit(step)
    t0 = time.time()
    _ = float(jstep(sc, mats, lights, jnp.float32(0)))
    print(f"# compile+warmup {time.time()-t0:.1f}s; {tris//1000}k tris, "
          f"{res}^3 grid, {samples>>10}k samples, shadowed={shadowed}",
          file=sys.stderr)
    if int(os.environ.get("IDK_VXGI_PROFILE", "0")):
        sys.path.insert(0, os.path.dirname(__file__))
        from bench_waves import device_ms
        with jax.profiler.trace("/tmp/jt_vxgi"):
            _ = float(jstep(sc, mats, lights, jnp.float32(0.5)))
        by = device_ms("/tmp/jt_vxgi", substr="")
        for name, t in sorted(by.items(), key=lambda kv: -kv[1])[:20]:
            if not name.startswith("jit_"):
                print(f"  {t:8.1f} ms  {name[:100]}", file=sys.stderr)

    t0 = time.time()
    n = 5
    for i in range(n):
        r = jstep(sc, mats, lights, jnp.float32(1e-6 * (i + 1)))
    _ = float(r)
    dt = (time.time() - t0) / n * 1e3
    import json

    print(json.dumps({
        "metric": f"voxelize {res}^3 incl. shadowed injection + mips, "
                  f"{tris//1000}k tris",
        "value": round(dt, 2), "unit": "ms",
        "vs_baseline": round(19.05 / max(dt, 1e-9), 4),
    }))


if __name__ == "__main__":
    main()
