#!/usr/bin/env python
"""Per-stage device timing of the STEERED bounce chain at the headline
config: steering build, loop-kernel closest, NEE any, multi-operand sort,
wave key build, attr fetch. Ranks the round-4 fusion levers (VERDICT r3 #1:
~375 ms of XLA glue around 1086 ms of kernels — where exactly?).

Env: IDK_TRIS (2.8M), IDK_ROWS (8 = BOUNCE_ROWS), IDK_REPS.
Run on the TPU from repo root: python tools/bench_chain.py
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


def device_ms(tag, run, salt):
    """Total device-event ms for one run (axon block_until_ready is broken;
    salted args force re-execution)."""
    import jax

    _ = jax.block_until_ready(run(salt))  # compile
    path = f"/tmp/jt_chain_{tag}"
    with jax.profiler.trace(path):
        _ = jax.block_until_ready(run(salt + 1.0))
    with gzip.open(sorted(glob.glob(
            path + "/plugins/profile/*/*.trace.json.gz"))[-1]) as f:
        tr = json.load(f)
    meta = {e.get('pid'): e.get('args', {}).get('name', '')
            for e in tr['traceEvents']
            if e.get('ph') == 'M' and e.get('name') == 'process_name'}
    dev = [p for p, n in meta.items() if 'TPU' in str(n)]
    by = collections.defaultdict(float)
    for e in tr['traceEvents']:
        if e.get('ph') == 'X' and e.get('pid') in dev:
            by[e['name']] += e.get('dur', 0) / 1000.0
    total = sum(by.values())
    top = sorted(by.items(), key=lambda kv: -kv[1])[:4]
    print(f"{tag}: {total:7.1f} ms   " + "  ".join(
        f"{n[:42]}={v:.0f}" for n, v in top), flush=True)
    return total


def main():
    import jax
    import jax.numpy as jnp

    from idkengine_tpu.bvh.builder import BuildSettings
    from idkengine_tpu.ops.packet_trace import (
        BOUNCE_ROWS, _build_steering, packet_trace_any_steered,
        packet_trace_closest_steered, segment_wave_key)
    from idkengine_tpu.render import Camera, shading
    from idkengine_tpu.render.camera import generate_rays
    from idkengine_tpu.render.pathtracer import ATTR_CH, tile_swizzle
    from idkengine_tpu.scene.procedural import atrium
    from idkengine_tpu.scene.scene_db import SceneDatabase
    from idkengine_tpu.utils import rng
    from idkengine_tpu.utils.compression import decompress_normal

    w = int(os.environ.get("IDK_RES_W", 1920))
    h = int(os.environ.get("IDK_RES_H", 1080))
    tris = int(os.environ.get("IDK_TRIS", 2_800_000))
    rows = int(os.environ.get("IDK_ROWS", BOUNCE_ROWS))

    t0 = time.time()
    db = SceneDatabase(BuildSettings(
        max_leaf_triangle_count=12, traversal_cost=4.0, presplit_factor=0.0))
    db.add_model(atrium(tris))
    sc = db.build()
    ws = db.wave_set()
    assert ws is not None
    S = len(ws.segs)
    print(f"build {time.time()-t0:.1f}s, segs={S}", flush=True)

    cam = Camera(position=np.array([0, 3, 24], np.float32), yaw=-90.0,
                 fov_y=65.0)
    swz = jnp.asarray(tile_swizzle(w, h))
    pix = swz.astype(jnp.uint32)
    state = rng.init_state(pix, jnp.uint32(0))
    state, u_pix = rng.uniform2(state)
    o, d = generate_rays(cam.ray_params(w, h), w, h, u_pix, px=swz)
    tm = jnp.full((w * h,), 3.4e38, jnp.float32)
    hit = jax.block_until_ready(packet_trace_closest_steered(
        ws.segs, ws.pairs_stack, ws.leaf_stack, ws.seg_min, ws.seg_max,
        o, d, tm, rows=rows))
    print(f"primary done {time.time()-t0:.1f}s "
          f"hit {float(jnp.mean(hit.slot >= 0)):.3f}", flush=True)

    # bounce rays exactly like the PT
    slot = jnp.maximum(hit.slot, 0)
    n0 = decompress_normal(sc.tri_n[slot, 0], jnp)
    gn = sc.tri_gn[slot]
    flip = jnp.sum(gn * d, axis=-1) > 0.0
    gn = jnp.where(flip[..., None], -gn, gn)
    state, u_lobe = rng.uniform(state)
    state, u_dir = rng.uniform2(state)
    mats = db.materials.soa()
    mat_id = np.asarray(sc.tri_mat)[np.asarray(slot)]
    surf = shading.sample_bsdf(
        d, gn, jnp.asarray(mats["base_color"][mat_id, :3]),
        jnp.asarray(mats["metallic"][mat_id]),
        jnp.asarray(mats["roughness"][mat_id]),
        jnp.asarray(mats["transmission"][mat_id]),
        jnp.asarray(mats["ior"][mat_id]),
        jnp.zeros((w * h,), bool), u_lobe, u_dir)
    hp = o + d * hit.t[:, None]
    eps = 1e-4 * jnp.maximum(1.0, jnp.linalg.norm(hp, axis=-1, keepdims=True))
    o2 = hp + gn * eps
    d2 = surf.direction
    alive = hit.slot >= 0
    tm2 = jnp.where(alive, jnp.float32(3.4e38), -1.0)
    lo = sc.node_min[0]
    ext = sc.node_max[0] - sc.node_min[0]

    # --- stage 1: wave key build ---
    key_fn = jax.jit(lambda o_, d_, t_: segment_wave_key(
        o_, d_, t_, ws.seg_min, ws.seg_max, lo, ext))
    device_ms("key_build", lambda s: key_fn(o2 + s, d2, tm2), 0.0)
    key = key_fn(o2, d2, tm2)

    # --- stage 2: 16-operand lax.sort (the PT's per-bounce reorder) ---
    r = w * h
    f32 = [o2[:, 0], o2[:, 1], o2[:, 2], d2[:, 0], d2[:, 1], d2[:, 2]]
    extra = [jnp.zeros((r,), jnp.float32) for _ in range(7)]
    i32 = [jnp.arange(r, dtype=jnp.int32), jnp.arange(r, dtype=jnp.int32)]
    sort_fn = jax.jit(lambda k, ops: jax.lax.sort(
        (k,) + tuple(ops), num_keys=1, is_stable=False))
    device_ms("sort16", lambda s: sort_fn(
        key + jnp.int32(s), tuple(f32 + extra + i32)), 0.0)
    perm = jnp.argsort(key)
    o2s, d2s, tm2s = o2[perm], d2[perm], tm2[perm]

    # --- stage 3: steering build alone ---
    packet = rows * 128
    pad = (-r) % packet
    ops_pad = (lambda a, fill: a if pad == 0 else jnp.concatenate(
        [a, jnp.full((pad,) + a.shape[1:], fill, a.dtype)]))
    op_, dp_, tp_ = (ops_pad(o2s, 0.0), ops_pad(d2s, 1.0),
                     ops_pad(tm2s, -1.0))
    steer_fn = jax.jit(lambda o_, d_, t_: _build_steering(
        o_, d_, t_, ws.seg_min, ws.seg_max, packet, S))
    device_ms("steer_build", lambda s: steer_fn(op_ + s, dp_, tp_), 0.0)
    # segment-coverage distribution: how many segments each SORTED packet
    # intersects = the divergence the kernel actually pays (each steer slot
    # is a full sub-traversal of the whole packet)
    steer_ids = steer_fn(op_, dp_, tp_)[0]
    cnt = np.asarray((np.asarray(steer_ids) >= 0).sum(1))
    print(f"segs/packet: mean {cnt.mean():.1f} p50 {np.percentile(cnt,50):.0f} "
          f"p90 {np.percentile(cnt,90):.0f} max {cnt.max()} of S={S} "
          f"({len(cnt)} packets)", flush=True)

    # --- stage 4: steered closest (loop kernel; includes steering build) ---
    # packet_trace_* are already jitted with the stacks as ARGUMENTS — no
    # outer jit (closing over the scene arrays bakes them into the HLO as
    # constants and the remote compile service rejects the body at 2.8M).
    def closest_fn(o_, d_, t_):
        return packet_trace_closest_steered(
            ws.segs, ws.pairs_stack, ws.leaf_stack, ws.seg_min, ws.seg_max,
            o_, d_, t_, rows=rows, tag="bnc")

    device_ms("closest+steer", lambda s: closest_fn(o2s + s, d2s, tm2s), 0.0)

    # --- stage 5: steered any (NEE; includes steering build) ---
    lpos = jnp.asarray([0.0, 10.5, 0.0], jnp.float32)
    ldir = lpos[None, :] - o2s
    ldist = jnp.linalg.norm(ldir, axis=-1)
    ldirn = ldir / jnp.maximum(ldist[:, None], 1e-6)
    tm_nee = jnp.where(alive[perm], ldist - 1e-2, -1.0)

    def any_fn(o_, d_, t_):
        return packet_trace_any_steered(
            ws.segs, ws.pairs_stack, ws.leaf_stack, ws.seg_min, ws.seg_max,
            o_, d_, t_, rows=rows, tag="nee")

    device_ms("any+steer", lambda s: any_fn(o2s + s, ldirn, tm_nee), 0.0)

    # --- stage 6: attr fetch (pad_dot_t) on the bounce hits ---
    hitb = jax.block_until_ready(closest_fn(o2s, d2s, tm2s))
    slots = jnp.maximum(hitb.slot, 0)
    T = sc.tri_uv.shape[0]
    tblp = jnp.zeros((T, 128), jnp.float32)

    @jax.jit
    def attr_jit(tbl, sl):
        g = tbl[sl]
        eye = jnp.eye(128, dtype=jnp.float32)
        gt = jax.lax.dot_general(eye, g, (((1,), (1,)), ((), ())))
        return gt[:ATTR_CH]

    device_ms("attr_fetch", lambda s: attr_jit(
        tblp, jnp.minimum(slots + jnp.int32(s), T - 1)), 0.0)


if __name__ == "__main__":
    main()
