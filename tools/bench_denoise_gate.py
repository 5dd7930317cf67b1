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
    mats = db.materials.soa()
    db.lights.add([0.0, 10.5, 0.0], [40.0, 38.0, 35.0], radius=0.8)
    db.lights.add([6.0, 4.0, -20.0], [20.0, 10.0, 5.0], radius=0.5)
    lights = db.lights.soa()
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
    variants = [("default", DenoiseSettings())]
    for it in (1, 2, 3):
        for sc in (0.5, 1.0, 2.0):
            variants.append((f"it={it} sc={sc}", DenoiseSettings(
                iterations=it, sigma_color=sc)))
    for c in clamps:
        variants.append((f"clamp={c}", DenoiseSettings(firefly_clamp=c)))
    for vb in (0.0, 1e-3, 4e-3, 1e-2, 4e-2):
        variants.append((f"vb={vb}", DenoiseSettings(variance_blend=vb)))
    for vb in (4e-3, 1e-2):
        variants.append((f"vb={vb} it=2 sc=1", DenoiseSettings(
            variance_blend=vb, iterations=2, sigma_color=1.0)))
    for name, st in variants:
        den = np.asarray(atrous_denoise(
            img8, alb.reshape(Hd, Wd, 3), nrm.reshape(Hd, Wd, 3),
            dep.reshape(Hd, Wd), settings=st, variance=var))
        lin = rmse(den, ref) / max(base_lin, 1e-12)
        tmr = rmse(tmf(den), tmf(ref)) / max(base_tm, 1e-12)
        # where does the linear regression come from? split the error
        # delta by reference brightness decile
        d2 = ((den - ref) ** 2).mean(-1)
        n2 = ((noisy - ref) ** 2).mean(-1)
        lum = ref.mean(-1)
        bright = lum > np.percentile(lum, 90)
        top = (d2 - n2)[bright].sum() / max((d2 - n2).sum(), 1e-12)
        print(f"{name:14s}  linear {lin:.4f}  tonemapped {tmr:.4f}"
              f"  bright10%-share-of-delta {top:.2f}", flush=True)


if __name__ == "__main__":
    main()
