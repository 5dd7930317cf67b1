#!/usr/bin/env python
"""Showcase: load the reference's DamagedHelmet (BasisU-compressed KTX2
textures), path-trace it with normal mapping, save a PNG.

Usage:  python examples/render_helmet.py [out.png] [WxH] [spp]
CPU-safe (keep the resolution modest on 1-core hosts); on TPU the packet
tracer engages automatically.
"""
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np

HELMET = "/root/reference/IDKEngine/Resource/Models/HelmetCompressed/Helmet.gltf"


def main():
    out = sys.argv[1] if len(sys.argv) > 1 else "/tmp/helmet.png"
    res = sys.argv[2] if len(sys.argv) > 2 else "192x192"
    spp = int(sys.argv[3]) if len(sys.argv) > 3 else 2
    w, h = (int(v) for v in res.split("x"))

    from idkengine_tpu.render import Camera, PathTracerSettings
    from idkengine_tpu.render.pipeline import (
        PathTracerPipeline, PtPipelineSettings)
    from idkengine_tpu.scene.gltf import load_gltf
    from idkengine_tpu.scene.scene_db import SceneDatabase

    db = SceneDatabase()
    db.add_model(load_gltf(HELMET))
    db.build()
    db.lights.add([3.0, 3.0, -3.0], [30.0, 28.0, 25.0], radius=0.3)
    db.lights.add([-3.0, 1.0, -2.0], [6.0, 7.0, 10.0], radius=0.4)

    pipe = PathTracerPipeline(
        db, w, h,
        PathTracerSettings(ray_depth=3, sky_strength=0.35,
                           sky_zenith=(0.35, 0.45, 0.7),
                           sky_horizon=(0.7, 0.7, 0.75)),
        PtPipelineSettings(output="noisy", use_bloom=False))
    cam = Camera(position=np.array([0.0, 0.0, -3.6], np.float32), yaw=90.0,
                 fov_y=45.0)
    img = None
    for _ in range(spp):
        img = pipe.render_frame(cam)
    u8 = np.clip(np.asarray(img) * 255.0, 0, 255).astype(np.uint8)
    from PIL import Image

    Image.fromarray(u8).save(out)
    print(f"saved {out} ({w}x{h}, {spp} spp, "
          f"{db.meta.n_triangles} tris, textures decoded: "
          f"{sum(1 for t in db.models[0].textures if t.data is not None)})")


if __name__ == "__main__":
    main()
