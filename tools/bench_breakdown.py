#!/usr/bin/env python
"""Frame-cost decomposition: times PT variants to attribute ms between
primary trace, bounce trace, NEE shadow rays, ray sorting and shading.

Run from repo root: python -c "exec(open('tools/bench_breakdown.py').read())"
"""
import os
import time

import numpy as np


def run():
    import jax
    import jax.numpy as jnp

    from idkengine_tpu.bvh.builder import BuildSettings
    from idkengine_tpu.render import Camera, PathTracer, PathTracerSettings
    from idkengine_tpu.scene.procedural import atrium
    from idkengine_tpu.scene.scene_db import SceneDatabase

    w = int(os.environ.get("IDK_BENCH_RES_W", 1920))
    h = int(os.environ.get("IDK_BENCH_RES_H", 1080))
    tris = int(os.environ.get("IDK_BENCH_TRIS", 110_000))

    db = SceneDatabase(BuildSettings(
        max_leaf_triangle_count=12, traversal_cost=4.0, presplit_factor=0.0))
    db.add_model(atrium(tris))
    scene = db.build()
    mats = db.materials.soa()
    db.lights.add([0.0, 10.5, 0.0], [40.0, 38.0, 35.0], radius=0.8)
    db.lights.add([6.0, 4.0, -20.0], [20.0, 10.0, 5.0], radius=0.5)
    lights = db.lights.soa()
    cam = Camera(position=np.array([0.0, 3.0, 24.0], np.float32), yaw=-90.0,
                 fov_y=65.0)

    variants = [
        ("d2 nee sort", dict(ray_depth=2, nee=True, do_ray_sorting=True)),
        ("d2 nee     ", dict(ray_depth=2, nee=True, do_ray_sorting=False)),
        ("d2         ", dict(ray_depth=2, nee=False, do_ray_sorting=False)),
        ("d1 nee     ", dict(ray_depth=1, nee=True, do_ray_sorting=False)),
        ("d1         ", dict(ray_depth=1, nee=False, do_ray_sorting=False)),
    ]
    reps = int(os.environ.get("IDK_BENCH_REPS", 4))
    for name, kw in variants:
        pt = PathTracer(
            scene, mats, lights, w, h,
            PathTracerSettings(russian_roulette=False, sky_strength=1.0, **kw),
            packet_scene=db.packet_scene,
        )
        img = pt.render_frame(cam)
        img.block_until_ready()
        t0 = time.time()
        for _ in range(reps):  # frame counter salts each rep
            img = pt.render_frame(cam)
        img.block_until_ready()
        ms = (time.time() - t0) / reps * 1e3
        rays = float(pt.last_rays_traced)
        print(f"{name}: {ms:7.1f} ms/frame  {rays/1e6:.2f} Mrays  "
              f"{rays/ms/1e3:.1f} Mrays/s")


run()
