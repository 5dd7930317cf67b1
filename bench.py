#!/usr/bin/env python
"""Headline benchmark: Mrays/s per chip, wavefront PT on a Bistro-class scene.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.
Baseline: 374 Mrays/s derived from the reference's 146 FPS @ 1600x800x2 rays
on an RX 5700 XT (BASELINE.md); BASELINE.json's north-star floor for this
repo is >=150 Mrays/s per TPU v5e chip, so vs_baseline is value/150.

The reference's Bistro asset isn't in the snapshot (Git-LFS pointers), so
the scene is the procedural atrium at a Bistro-class 2.8M triangles
(override with IDK_BENCH_TRIS / IDK_BENCH_RES / IDK_BENCH_DEPTH).
"""
import json
import os
import sys
import time

import numpy as np


def main():
    t_setup = time.time()
    # persistent compilation cache: repeat benches (and the driver's run
    # after a warmup) skip the multi-minute XLA/Mosaic compiles
    os.environ.setdefault("JAX_COMPILATION_CACHE_DIR",
                          os.path.expanduser("~/.cache/jax_cache"))
    import jax

    try:
        jax.config.update("jax_compilation_cache_dir",
                          os.environ["JAX_COMPILATION_CACHE_DIR"])
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    except Exception:
        pass

    from idkengine_tpu.render import Camera, PathTracer, PathTracerSettings
    from idkengine_tpu.scene.procedural import atrium
    from idkengine_tpu.scene.scene_db import SceneDatabase

    tris = int(os.environ.get("IDK_BENCH_TRIS", 2_800_000))
    width = int(os.environ.get("IDK_BENCH_RES_W", 1920))
    height = int(os.environ.get("IDK_BENCH_RES_H", 1080))
    depth = int(os.environ.get("IDK_BENCH_DEPTH", 2))  # primary + bounce
    tile = int(os.environ.get("IDK_BENCH_TILE", 0))
    sort_rays = bool(int(os.environ.get("IDK_BENCH_SORT", "1")))

    from idkengine_tpu.bvh.builder import BuildSettings

    # packet tracer wants <=8-tri leaves; presplit off keeps the leaf table
    # inside the VMEM budget (large scenes fall back to the XLA trace)
    db = SceneDatabase(BuildSettings(
        max_leaf_triangle_count=12, traversal_cost=4.0, presplit_factor=0.0,
    ))
    db.add_model(atrium(tris))
    scene = db.build()
    mats = db.materials.soa()
    db.lights.add([0.0, 10.5, 0.0], [40.0, 38.0, 35.0], radius=0.8)
    db.lights.add([6.0, 4.0, -20.0], [20.0, 10.0, 5.0], radius=0.5)
    lights = db.lights.soa()

    cam = Camera(position=np.array([0.0, 3.0, 24.0], np.float32), yaw=-90.0, fov_y=65.0)
    settings = PathTracerSettings(
        ray_depth=depth,
        russian_roulette=False,
        do_ray_sorting=sort_rays,
        tile_size=tile,
        sky_strength=1.0,
        use_packet_tracer=bool(int(os.environ.get("IDK_BENCH_PACKET", "1"))),
    )
    # Traversal-path fallback chain: steered (WaveSet) -> chained segments
    # (boxes-only sort key) -> XLA trace. A compile/VMEM failure downgrades
    # instead of killing the bench.
    variants = [
        ("steered", dict(packet_scene=db.packet_scene,
                         wave_boxes=db.wave_set())),
        ("chained", dict(packet_scene=db.packet_scene,
                         wave_boxes=(None if db.wave_seg_min is None else
                                     (db.wave_seg_min, db.wave_seg_max)))),
        ("xla", dict(packet_scene=None, wave_boxes=None)),
    ]
    pt = None
    path_name = "steered"
    for path_name, kw in variants:
        try:
            pt = PathTracer(scene, mats, lights, width, height, settings, **kw)
            pt.render_frame(cam)  # warmup / compile
            _ = float(pt.last_rays_traced)
            break
        except Exception as e:
            print(f"# trace path '{path_name}' failed ({type(e).__name__}: "
                  f"{str(e)[:200]}); falling back", file=sys.stderr)
            pt = None
    if pt is None:
        raise SystemExit("all trace paths failed")
    print(
        f"# setup+compile {time.time()-t_setup:.1f}s; scene {db.meta.n_triangles} tris, "
        f"SAH {db.meta.sah_cost:.1f}, build {db.meta.build_ms:.0f} ms, device={jax.devices()[0].device_kind}",
        file=sys.stderr,
    )

    n_frames = int(os.environ.get("IDK_BENCH_FRAMES", 4))
    total_rays = 0.0
    t0 = time.time()
    for _ in range(n_frames):
        img = pt.render_frame(cam)
        total_rays += float(pt.last_rays_traced)
    img.block_until_ready()
    dt = time.time() - t0

    mrays = total_rays / dt / 1e6
    frame_ms = dt / n_frames * 1000.0
    print(
        f"# {n_frames} frames in {dt:.2f}s → {frame_ms:.1f} ms/frame @ {width}x{height}, "
        f"{total_rays/1e6:.1f} Mrays total",
        file=sys.stderr,
    )
    print(
        json.dumps(
            {
                "metric": f"Mrays/s per chip, wavefront PT ({path_name}), {tris//1000}k-tri atrium, {width}x{height} depth={depth}",
                "value": round(mrays, 2),
                "unit": "Mrays/s",
                "vs_baseline": round(mrays / 150.0, 4),
            }
        )
    )


if __name__ == "__main__":
    main()
