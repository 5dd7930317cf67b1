#!/usr/bin/env python
"""Full-frame device-event dump at the headline config: one profiled
render_frame, top-N device events by total ms with their names. The
per-pass buckets (bench.py profile) say WHERE time goes; this says WHICH
fusions/ops — the ranking tool for de-glue work (VERDICT r3 #1/#2).

Env: IDK_TRIS (2.8M), IDK_DEPTH (2), IDK_TOP (40).
"""
import collections
import glob
import gzip
import json
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np


def main():
    import jax
    import jax.numpy as jnp

    from idkengine_tpu.bvh.builder import BuildSettings
    from idkengine_tpu.render import Camera, PathTracer, PathTracerSettings
    from idkengine_tpu.scene.procedural import atrium
    from idkengine_tpu.scene.scene_db import SceneDatabase

    w = int(os.environ.get("IDK_RES_W", 1920))
    h = int(os.environ.get("IDK_RES_H", 1080))
    tris = int(os.environ.get("IDK_TRIS", 2_800_000))
    depth = int(os.environ.get("IDK_DEPTH", 2))
    topn = int(os.environ.get("IDK_TOP", 40))

    t0 = time.time()
    db = SceneDatabase(BuildSettings(
        max_leaf_triangle_count=12, traversal_cost=4.0, presplit_factor=0.0))
    db.add_model(atrium(tris))
    db.build()
    db.lights.add([0.0, 10.5, 0.0], [40.0, 38.0, 35.0], radius=0.8)
    db.lights.add([6.0, 4.0, -20.0], [20.0, 10.0, 5.0], radius=0.5)
    print(f"build {time.time()-t0:.1f}s", flush=True)

    pt = PathTracer(
        db.build(), db.materials.soa(), db.lights.soa(), w, h,
        PathTracerSettings(ray_depth=depth, do_ray_sorting=True,
                           sky_strength=1.0),
        packet_scene=db.packet_scene, wave_boxes=db.wave_set())
    cam = Camera(position=np.array([0, 3, 24], np.float32), yaw=-90.0,
                 fov_y=65.0)
    img = pt.render_frame(cam)
    img.block_until_ready()
    print(f"first frame done {time.time()-t0:.1f}s", flush=True)

    t1 = time.time()
    img = pt.render_frame(cam)
    img.block_until_ready()
    wall = (time.time() - t1) * 1e3

    path = "/tmp/jt_frame_events"
    with jax.profiler.trace(path):
        img = pt.render_frame(cam)
        img.block_until_ready()
    with gzip.open(sorted(glob.glob(
            path + "/plugins/profile/*/*.trace.json.gz"))[-1]) as f:
        tr = json.load(f)
    meta = {e.get("pid"): e.get("args", {}).get("name", "")
            for e in tr["traceEvents"]
            if e.get("ph") == "M" and e.get("name") == "process_name"}
    dev = [p for p, n in meta.items() if "TPU" in str(n)]
    by = collections.defaultdict(lambda: [0.0, 0])
    for e in tr["traceEvents"]:
        if e.get("ph") == "X" and e.get("pid") in dev:
            rec = by[str(e.get("name", ""))]
            rec[0] += e.get("dur", 0) / 1000.0
            rec[1] += 1
    total = sum(v[0] for v in by.values())
    print(f"wall {wall:.0f} ms, device total {total:.0f} ms; top {topn}:")
    for name, (ms, cnt) in sorted(by.items(), key=lambda kv: -kv[1][0])[:topn]:
        print(f"  {ms:8.1f} ms  x{cnt:<4d}  {name[:110]}")


if __name__ == "__main__":
    main()
