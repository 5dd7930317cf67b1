#!/usr/bin/env python
"""HW repro for the round-5 rebin compile failure: at the 2.8M headline
config (64 wave segments) `packet_trace_closest_rebin` with R=2,073,600
rays dies in the REMOTE COMPILER (HTTP 500: tpu_compile_helper subprocess
exit code 1) while R=524,288 compiles and runs. Bisect which dial kills
the compiler without paying the 2.8M build each time: force a small scene
into the same segment count via IDK_STEER_VMEM.

Env: IDK_TRIS (default 300k), IDK_STEER_VMEM (set small outside to force
S=64), IDK_RAYS (comma list of R values, ascending), IDK_REBIN_RESIDUAL,
IDK_REBIN_K, IDK_MODE (closest|any).
"""
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np


def main():
    import jax
    import jax.numpy as jnp

    from idkengine_tpu.bvh.builder import BuildSettings
    from idkengine_tpu.ops.packet_trace import (
        BOUNCE_ROWS, packet_trace_any_rebin, packet_trace_closest_rebin)
    from idkengine_tpu.scene.procedural import atrium
    from idkengine_tpu.scene.scene_db import SceneDatabase

    tris = int(os.environ.get("IDK_TRIS", 300_000))
    rays_list = [int(x) for x in os.environ.get(
        "IDK_RAYS", "524288,1048576,2073600").split(",")]
    mode = os.environ.get("IDK_MODE", "closest")
    t0 = time.time()
    db = SceneDatabase(BuildSettings(
        max_leaf_triangle_count=12, traversal_cost=4.0, presplit_factor=0.0))
    db.add_model(atrium(tris))
    db.build()
    ws = db.wave_set()
    assert ws is not None
    S = len(ws.segs)
    print(f"build {time.time()-t0:.1f}s, segs={S}", flush=True)

    r = np.random.RandomState(0)
    for n_rays in rays_list:
        o = r.uniform(-10, 10, size=(n_rays, 3)).astype(np.float32)
        d = r.normal(size=(n_rays, 3)).astype(np.float32)
        d /= np.linalg.norm(d, axis=1, keepdims=True)
        o_j, d_j = jnp.asarray(o), jnp.asarray(d)
        tm = jnp.full((n_rays,), 3.4e38, jnp.float32)
        t1 = time.time()
        try:
            if mode == "closest":
                hit = jax.block_until_ready(packet_trace_closest_rebin(
                    ws.segs, ws.pairs_stack, ws.leaf_stack,
                    ws.seg_min, ws.seg_max, o_j, d_j, tm, rows=BOUNCE_ROWS))
                stat = float(jnp.mean(hit.slot >= 0))
            else:
                occ = jax.block_until_ready(packet_trace_any_rebin(
                    ws.segs, ws.pairs_stack, ws.leaf_stack,
                    ws.seg_min, ws.seg_max, o_j, d_j,
                    jnp.full((n_rays,), 100.0, jnp.float32),
                    rows=BOUNCE_ROWS))
                stat = float(jnp.mean(occ))
            print(f"R={n_rays} OK {time.time()-t1:.1f}s stat {stat:.3f}",
                  flush=True)
        except Exception as e:
            print(f"R={n_rays} FAILED {time.time()-t1:.1f}s "
                  f"{type(e).__name__}: {str(e)[:300]}", flush=True)
            raise SystemExit(1)
    print("REPRO_PASS", flush=True)


if __name__ == "__main__":
    main()
