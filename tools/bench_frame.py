#!/usr/bin/env python
"""Device-profiled breakdown of one full wavefront-PT frame (bench.py
scene/settings). Prints the top device ops grouped by kind."""
import collections
import os
import sys

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR",
                      os.path.expanduser("~/.cache/jax_cache"))

import numpy as np

sys.path.insert(0, os.path.dirname(__file__))
sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
from bench_waves import device_ms  # noqa: E402


def main():
    import jax
    import jax.numpy as jnp

    from idkengine_tpu.bvh.builder import BuildSettings
    from idkengine_tpu.render import Camera, PathTracer, PathTracerSettings
    from idkengine_tpu.scene.procedural import atrium
    from idkengine_tpu.scene.scene_db import SceneDatabase

    w = int(os.environ.get("IDK_BENCH_RES_W", 1920))
    h = int(os.environ.get("IDK_BENCH_RES_H", 1080))
    db = SceneDatabase(BuildSettings(
        max_leaf_triangle_count=12, traversal_cost=4.0, presplit_factor=0.0))
    db.add_model(atrium(int(os.environ.get('IDK_BENCH_TRIS', 110_000))))
    db.build()
    mats = db.materials.soa()
    db.lights.add([0.0, 10.5, 0.0], [40.0, 38.0, 35.0], radius=0.8)
    db.lights.add([6.0, 4.0, -20.0], [20.0, 10.0, 5.0], radius=0.5)
    lights = db.lights.soa()
    cam = Camera(position=np.array([0.0, 3.0, 24.0], np.float32),
                 yaw=-90.0, fov_y=65.0)
    # settings identical to bench.py so the persistent compile cache is
    # shared between the headline bench and this profile
    s = PathTracerSettings(
        ray_depth=int(os.environ.get("IDK_BENCH_DEPTH", 2)),
        russian_roulette=False, do_ray_sorting=True, tile_size=0,
        sky_strength=1.0, use_packet_tracer=True)
    try:
        jax.config.update("jax_compilation_cache_dir",
                          os.environ["JAX_COMPILATION_CACHE_DIR"])
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    except Exception:
        pass
    # same path selection as bench.py: steered (WaveSet) when available
    wb = db.wave_set() if int(os.environ.get("IDK_FRAME_STEER", "1")) else (
        None if db.wave_seg_min is None else (db.wave_seg_min, db.wave_seg_max))
    pt = PathTracer(db.device_scene, mats, lights, w, h, s,
                    packet_scene=db.packet_scene, wave_boxes=wb)
    pt.render_frame(cam)  # warm up / compile
    with jax.profiler.trace("/tmp/jt_frame"):
        pt.render_frame(cam)
        float(jnp.sum(pt.accum))
    by = device_ms("/tmp/jt_frame", substr="")
    groups = collections.defaultdict(float)
    for n, t in by.items():
        if n.startswith("jit_"):
            continue
        if "packet" in n:
            g = "trace:closest" if "closest" in n else "trace:any"
        elif "sort" in n:
            g = "sort"
        elif "gather" in n or "dynamic" in n.lower():
            g = "gather"
        elif "fusion" in n:
            g = "fusion(elementwise)"
        else:
            g = "other"
        groups[g] += t
    tot = sum(groups.values())
    print(f"frame device total: {tot:.1f} ms")
    for g, t in sorted(groups.items(), key=lambda kv: -kv[1]):
        print(f"  {t:8.1f} ms  {g}")
    print("top individual ops:")
    for n, t in sorted(by.items(), key=lambda kv: -kv[1])[:16]:
        if not n.startswith("jit_"):
            print(f"  {t:8.1f} ms  {n[:95]}")


if __name__ == "__main__":
    main()
