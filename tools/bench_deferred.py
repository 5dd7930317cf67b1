#!/usr/bin/env python
"""Deferred-pipeline full-frame timing on the real chip.

ref: Readme.md published per-pass numbers (RTX 3050 Ti L / RX 5700 XT):
SSAO ~2.5 ms, voxelize 19.05 ms, the whole raster frame tens of ms at
1080p-class resolutions. This times our ray+image-space deferred frame
graph end-to-end (G-buffer primaries, RT shadows, deferred lighting,
optional VXGI/SSR/volumetric, TAA, bloom, tonemap) and prints a per-pass
wall profile plus one JSON line.

Env: IDK_BENCH_RES_W/H (1280x720), IDK_BENCH_TRIS (110k), IDK_DEF_VXGI,
IDK_DEF_SSR, IDK_DEF_VOL (all 0/1, default 0/0/0), IDK_BENCH_REPS (5).
"""
import json
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

    try:
        jax.config.update("jax_compilation_cache_dir",
                          os.environ["JAX_COMPILATION_CACHE_DIR"])
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    except Exception:
        pass

    from idkengine_tpu.bvh.builder import BuildSettings
    from idkengine_tpu.render.camera import Camera
    from idkengine_tpu.render.pipeline import DeferredPipeline, DeferredSettings2
    from idkengine_tpu.scene.procedural import atrium
    from idkengine_tpu.scene.scene_db import SceneDatabase

    w = int(os.environ.get("IDK_BENCH_RES_W", 1280))
    h = int(os.environ.get("IDK_BENCH_RES_H", 720))
    tris = int(os.environ.get("IDK_BENCH_TRIS", 110_000))
    reps = int(os.environ.get("IDK_BENCH_REPS", 5))

    db = SceneDatabase(BuildSettings(
        max_leaf_triangle_count=12, traversal_cost=4.0, presplit_factor=0.0))
    db.add_model(atrium(tris))
    db.build()
    db.lights.add([0.0, 10.5, 0.0], [40.0, 38.0, 35.0], radius=0.8)
    db.lights.add([6.0, 4.0, -20.0], [20.0, 10.0, 5.0], radius=0.5)

    s = DeferredSettings2(
        use_vxgi=bool(int(os.environ.get("IDK_DEF_VXGI", "0"))),
        use_ssr=bool(int(os.environ.get("IDK_DEF_SSR", "0"))),
        use_volumetric=bool(int(os.environ.get("IDK_DEF_VOL", "0"))),
    )
    pipe = DeferredPipeline(db, w, h, s)
    cam = Camera(position=np.array([0.0, 3.0, 24.0], np.float32),
                 yaw=-90.0, fov_y=65.0)

    t0 = time.time()
    img = pipe.render_frame(cam)
    _ = float(jnp.sum(img))
    print(f"# compile+warmup {time.time()-t0:.1f}s; {tris//1000}k tris "
          f"{w}x{h} vxgi={s.use_vxgi} ssr={s.use_ssr} vol={s.use_volumetric}",
          file=sys.stderr)

    t0 = time.time()
    for i in range(reps):
        cam.position = cam.position + np.float32(1e-4)  # salt vs memoization
        img = pipe.render_frame(cam)
    _ = float(jnp.sum(img))
    dt = (time.time() - t0) / reps * 1e3

    print(json.dumps({
        "metric": f"deferred frame {w}x{h}, {tris//1000}k tris"
                  + (" +vxgi" if s.use_vxgi else "")
                  + (" +ssr" if s.use_ssr else "")
                  + (" +vol" if s.use_volumetric else ""),
        "value": round(dt, 2), "unit": "ms",
        "vs_baseline": round(33.0 / max(dt, 1e-9), 4),
    }))


if __name__ == "__main__":
    main()
