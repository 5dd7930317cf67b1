#!/usr/bin/env python
"""Per-RAY wave-segment intersection stats on real bounce rays (2.8M atrium).

The round-4 measurement (BENCH_NOTES) showed sorted bounce PACKETS traverse a
mean 16.3 of 64 segments — the packet union. The dense re-binning design pays
per-PAIR instead, so what matters is the per-ray count of intersected segment
boxes: expansion factor = mean(count); the tail picks the residual strategy.

Env: IDK_BENCH_TRIS (default 2.8M). Run on the TPU (primary trace at 2.8M).
"""
import os

import numpy as np


def main():
    import jax
    import jax.numpy as jnp

    from idkengine_tpu.bvh.builder import BuildSettings
    from idkengine_tpu.ops import packet_trace as PT
    from idkengine_tpu.render import Camera, shading
    from idkengine_tpu.render.camera import generate_rays
    from idkengine_tpu.render.pathtracer import tile_swizzle
    from idkengine_tpu.scene.procedural import atrium
    from idkengine_tpu.scene.scene_db import SceneDatabase
    from idkengine_tpu.utils import rng
    from idkengine_tpu.utils.compression import decompress_normal

    tris = int(os.environ.get("IDK_BENCH_TRIS", 2_800_000))
    w, h = 1920, 1080
    db = SceneDatabase(BuildSettings(
        max_leaf_triangle_count=12, traversal_cost=4.0, presplit_factor=0.0))
    db.add_model(atrium(tris))
    sc = db.build()
    ws = db.wave_set()
    assert ws is not None
    S = int(ws.seg_min.shape[0])

    cam = Camera(position=np.array([0.0, 3.0, 24.0], np.float32), yaw=-90.0,
                 fov_y=65.0)
    swz = jnp.asarray(tile_swizzle(w, h))
    pix = swz.astype(jnp.uint32)
    state = rng.init_state(pix, jnp.uint32(0))
    state, u_pix = rng.uniform2(state)
    o, d = generate_rays(cam.ray_params(w, h), w, h, u_pix, px=swz)
    tm = jnp.full((w * h,), 3.4e38, jnp.float32)
    hit = PT.packet_trace_closest_steered(
        ws.segs, ws.pairs_stack, ws.leaf_stack, ws.seg_min, ws.seg_max,
        o, d, tm, rows=16)

    # BSDF bounce like the real path tracer (bench_bounce2 recipe)
    slot = jnp.maximum(hit.slot, 0)
    u_b, v_b = hit.u, hit.v
    w_b = 1.0 - u_b - v_b
    n0 = decompress_normal(sc.tri_n[slot, 0], jnp)
    n1 = decompress_normal(sc.tri_n[slot, 1], jnp)
    n2 = decompress_normal(sc.tri_n[slot, 2], jnp)
    ns = n0 * w_b[..., None] + n1 * u_b[..., None] + n2 * v_b[..., None]
    ns = ns / jnp.maximum(jnp.linalg.norm(ns, axis=-1, keepdims=True), 1e-12)
    gn = sc.tri_gn[slot]
    flip = jnp.sum(gn * d, axis=-1) > 0.0
    gn = jnp.where(flip[..., None], -gn, gn)
    ns = jnp.where(jnp.sum(ns * gn, axis=-1, keepdims=True) < 0.0, -ns, ns)
    state, u_lobe = rng.uniform(state)
    state, u_dir = rng.uniform2(state)
    mats = db.materials.soa()
    mat_id = np.asarray(sc.tri_mat)[np.asarray(slot)]
    alb = jnp.asarray(mats["base_color"][mat_id, :3])
    met = jnp.asarray(mats["metallic"][mat_id])
    rough = jnp.asarray(mats["roughness"][mat_id])
    trans = jnp.asarray(mats["transmission"][mat_id])
    ior = jnp.asarray(mats["ior"][mat_id])
    surf = shading.sample_bsdf(d, ns, alb, met, rough, trans, ior,
                               jnp.zeros((w * h,), bool), u_lobe, u_dir)
    hp = o + d * hit.t[:, None]
    eps = 1e-4 * jnp.maximum(1.0, jnp.linalg.norm(hp, axis=-1, keepdims=True))
    o2 = hp + gn * eps
    d2 = surf.direction
    alive = hit.slot >= 0
    tm2 = jnp.where(alive, jnp.float32(3.4e38), -1.0)

    lo = sc.node_min[0]
    ext = sc.node_max[0] - sc.node_min[0]
    key = PT.segment_wave_key(o2, d2, tm2, ws.seg_min, ws.seg_max, lo, ext)
    perm = jnp.argsort(key)
    o2, d2, tm2 = o2[perm], d2[perm], tm2[perm]

    R = w * h
    cnt = np.zeros(R, np.int32)
    for lo_i in range(0, R, 1 << 19):
        sl = slice(lo_i, min(lo_i + (1 << 19), R))
        for _s, ent in PT._entry_all(o2[sl], d2[sl], tm2[sl],
                                     ws.seg_min, ws.seg_max,
                                     r_chunk=1 << 30):
            cnt[sl] = np.asarray((ent < jnp.inf).sum(1))
    live = np.asarray(tm2) > 0.0
    c = cnt[live]
    print(f"live bounce rays: {int(live.sum())} of {R}, S={S}")
    print(f"per-ray intersected segments: mean {c.mean():.2f} "
          f"p50 {np.percentile(c, 50):.0f} p90 {np.percentile(c, 90):.0f} "
          f"p99 {np.percentile(c, 99):.0f} max {c.max()}")
    for K in (2, 3, 4, 6, 8, 12, 16):
        frac = (c > K).mean()
        print(f"  K={K}: rays over: {frac*100:.2f}%  "
              f"pairs={np.minimum(c, K).sum()/1e6:.2f}M")


if __name__ == "__main__":
    main()
