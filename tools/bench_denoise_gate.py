#!/usr/bin/env python
"""Standalone replica of bench.py's denoiser-gate leg for fast iteration.

Renders 8 spp on the production (steered) path at 256^2, denoises, then
converges to 256 spp and prints the linear + tonemapped RMSE ratios for a
sweep of firefly-clamp factors (0 = the pre-round-5 behaviour).

Env: IDK_TRIS (110k), IDK_SPP (8), IDK_REF_SPP (256), IDK_CLAMPS ("0,4,8,16").
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def main():
    import jax.numpy as jnp

    from idkengine_tpu.bvh.builder import BuildSettings
    from idkengine_tpu.render import Camera, PathTracer, PathTracerSettings
    from idkengine_tpu.render.denoise import DenoiseSettings, atrous_denoise
    from idkengine_tpu.render.tonemap import tonemap
    from idkengine_tpu.scene.procedural import atrium
    from idkengine_tpu.scene.scene_db import SceneDatabase

    tris = int(os.environ.get("IDK_TRIS", 110_000))
    spp = int(os.environ.get("IDK_SPP", 8))
    ref_spp = int(os.environ.get("IDK_REF_SPP", 256))
    clamps = [float(c) for c in
              os.environ.get("IDK_CLAMPS", "0,4,8,16").split(",")]
    Hd = Wd = 256

    db = SceneDatabase(BuildSettings(
        max_leaf_triangle_count=12, traversal_cost=4.0, presplit_factor=0.0))
    db.add_model(atrium(tris))
    scene = db.build()
    mats = db.materials.device_tables()
    lights = db.lights.device_tables()
    cam = Camera(position=np.array([0, 3, 24], np.float32), yaw=-90.0,
                 fov_y=65.0)

    pt = PathTracer(scene, mats, lights, Wd, Hd, PathTracerSettings(),
                    packet_scene=db.packet_scene, wave_boxes=db.wave_set())
    t0 = time.time()
    for _ in range(spp):
        pt.render_frame(cam)
    noisy = np.asarray(pt.image())
    alb, nrm, dep = pt._last_aovs
    var = pt.variance()
    img8 = pt.image()
    print(f"{spp} spp in {time.time()-t0:.1f}s", flush=True)
    for _ in range(ref_spp - spp):
        pt.render_frame(cam)
    ref = np.asarray(pt.image())
    print(f"{ref_spp} spp total in {time.time()-t0:.1f}s", flush=True)

    rmse = lambda a, b: float(np.sqrt(((a - b) ** 2).mean()))
    tmf = lambda x: np.asarray(tonemap(jnp.asarray(x)))
    base_lin = rmse(noisy, ref)
    base_tm = rmse(tmf(noisy), tmf(ref))
    for c in clamps:
        den = np.asarray(atrous_denoise(
            img8, alb.reshape(Hd, Wd, 3), nrm.reshape(Hd, Wd, 3),
            dep.reshape(Hd, Wd), settings=DenoiseSettings(firefly_clamp=c),
            variance=var))
        lin = rmse(den, ref) / max(base_lin, 1e-12)
        tmr = rmse(tmf(den), tmf(ref)) / max(base_tm, 1e-12)
        print(f"clamp={c:5.1f}  linear {lin:.4f}  tonemapped {tmr:.4f}",
              flush=True)


if __name__ == "__main__":
    main()
