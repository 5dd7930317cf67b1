#!/usr/bin/env python
"""Wave-scheduled segment tracing vs whole-tree packet trace (device-timed).

Correctness: wave result must equal the single-table trace. Perf: device
kernel-time totals from the jax profiler (the axon pool memoizes
identical-args executions and async-tracking is unreliable — wall timing
lies; salt every run).
Env: IDK_WAVE_SEGS, IDK_WAVES, IDK_ROWS.
"""
import collections
import glob
import gzip
import json
import os

import numpy as np


def device_ms(tracedir, substr="packet"):
    with gzip.open(sorted(glob.glob(
            tracedir + '/plugins/profile/*/vm.trace.json.gz'))[-1]) as f:
        tr = json.load(f)
    meta = {e.get('pid'): e.get('args', {}).get('name', '')
            for e in tr['traceEvents']
            if e.get('ph') == 'M' and e.get('name') == 'process_name'}
    dev = [p for p, n in meta.items() if 'TPU' in str(n)]
    by = collections.defaultdict(float)
    for e in tr['traceEvents']:
        if e.get('ph') == 'X' and e.get('pid') in dev and substr in e['name']:
            by[e['name']] += e.get('dur', 0) / 1000.0
    return by


def main():
    import jax
    import jax.numpy as jnp

    from idkengine_tpu.bvh.builder import BuildSettings
    from idkengine_tpu.ops.packet_trace import (
        packet_trace_any, packet_trace_any_waves, packet_trace_closest,
        packet_trace_closest_waves, segment_wave_key)
    from idkengine_tpu.render.camera import Camera, generate_rays
    from idkengine_tpu.render.pathtracer import tile_swizzle
    from idkengine_tpu.scene.procedural import atrium
    from idkengine_tpu.scene.scene_db import SceneDatabase

    w, h = 1920, 1080
    rows = int(os.environ.get("IDK_ROWS", 32))
    db = SceneDatabase(BuildSettings(
        max_leaf_triangle_count=12, traversal_cost=4.0, presplit_factor=0.0))
    db.add_model(atrium(int(os.environ.get("IDK_BENCH_TRIS", 110_000))))
    sc = db.build()
    ps = db.packet_scene
    ws = db.wave_scene
    smin = jnp.asarray(db.wave_seg_min)
    smax = jnp.asarray(db.wave_seg_max)
    assert ws is not None, "wave scene not built"
    print(f"segments: {len(ws)}")

    cam = Camera(position=np.array([0, 3, 24], np.float32), yaw=-90.0,
                 fov_y=65.0)
    swz = jnp.asarray(tile_swizzle(w, h))
    o, d = generate_rays(cam.ray_params(w, h), w, h, jnp.zeros(2), px=swz)
    tm = jnp.full((w * h,), 3.4e38, jnp.float32)
    hit = packet_trace_closest(ps, o, d, tm, rows=rows)

    # diffuse bounce rays
    slot = jnp.maximum(hit.slot, 0)
    gn = jnp.asarray(sc.tri_gn)[slot]
    flip = jnp.sum(gn * d, axis=-1) > 0.0
    gn = jnp.where(flip[:, None], -gn, gn)
    hp = o + d * hit.t[:, None]
    u1, u2 = jax.random.uniform(jax.random.PRNGKey(1), (2, w * h))
    r_ = jnp.sqrt(u1)
    phi = 2 * np.pi * u2
    tang = jnp.where(jnp.abs(gn[:, 0:1]) < 0.9,
                     jnp.array([[1.0, 0, 0]]), jnp.array([[0, 1.0, 0]]))
    tx = jnp.cross(gn, tang)
    tx = tx / jnp.maximum(jnp.linalg.norm(tx, axis=-1, keepdims=True), 1e-9)
    ty = jnp.cross(gn, tx)
    d2 = (tx * (r_ * jnp.cos(phi))[:, None]
          + ty * (r_ * jnp.sin(phi))[:, None]
          + gn * jnp.sqrt(jnp.maximum(1 - u1, 0))[:, None])
    o2 = hp + gn * 1e-3
    alive = hit.slot >= 0
    tm2 = jnp.where(alive, jnp.float32(3.4e38), -1.0)
    lo = jnp.asarray(sc.node_min[0])
    ext = jnp.asarray(sc.node_max[0]) - lo
    key = segment_wave_key(o2, d2, tm2, smin, smax, lo, ext)
    p = jnp.argsort(key)
    o2s, d2s, tm2s = o2[p], d2[p], tm2[p]
    # shadow rays toward a light
    lpos = jnp.array([0.0, 10.5, 0.0])
    ld = lpos[None, :] - o2s
    ldist = jnp.linalg.norm(ld, axis=-1)
    ldn = ld / jnp.maximum(ldist[:, None], 1e-9)
    stm = jnp.where(tm2s > 0, ldist - 2e-3, -1.0)
    jax.block_until_ready((o2s, d2s, tm2s, ldn, stm))

    @jax.jit
    def run_plain(ps_, o_, d_, tm_, ldn_, stm_, salt):
        h1 = packet_trace_closest(ps_, o_, d_, tm_ + salt, rows=rows)
        occ = packet_trace_any(ps_, o_, ldn_, stm_ * (1.0 + salt * 0), rows=rows)
        return (jnp.sum(h1.t * (h1.slot >= 0)) + jnp.sum(occ),
                h1.t, h1.slot, occ)

    @jax.jit
    def run_wave(ws_, smin_, smax_, o_, d_, tm_, ldn_, stm_, salt):
        h1 = packet_trace_closest_waves(ws_, smin_, smax_, o_, d_, tm_ + salt,
                                        rows=rows)
        occ = packet_trace_any_waves(ws_, smin_, smax_, o_, ldn_,
                                     stm_ * (1.0 + salt * 0), rows=rows)
        return (jnp.sum(h1.t * (h1.slot >= 0)) + jnp.sum(occ),
                h1.t, h1.slot, occ)

    rb = run_plain(ps, o2s, d2s, tm2s, ldn, stm, jnp.float32(0))
    _ = float(rb[0])
    with jax.profiler.trace("/tmp/jt_wv_plain"):
        _ = float(run_plain(ps, o2s, d2s, tm2s, ldn, stm,
                            jnp.float32(1e25))[0])
    for name, tdir in (("plain", "/tmp/jt_wv_plain"),):
        by = device_ms(tdir)
        tot = {}
        for n, t in by.items():
            base = 'closest' if 'closest' in n else 'any'
            tot[base] = tot.get(base, 0) + t
        print(f"{name}: " + "  ".join(
            f"{k}={v:.1f}ms" for k, v in sorted(tot.items())), flush=True)
    if os.environ.get("IDK_AB_PLAIN_ONLY"):
        return
    rw = run_wave(ws, smin, smax, o2s, d2s, tm2s, ldn, stm, jnp.float32(0))
    _ = float(rw[0])
    with jax.profiler.trace("/tmp/jt_wv_wave"):
        _ = float(run_wave(ws, smin, smax, o2s, d2s, tm2s, ldn, stm,
                           jnp.float32(1e25))[0])

    for name, tdir in (("plain", "/tmp/jt_wv_plain"),
                       ("wave", "/tmp/jt_wv_wave")):
        by = device_ms(tdir)
        tot = {}
        for n, t in by.items():
            base = 'closest' if 'closest' in n else 'any'
            tot[base] = tot.get(base, 0) + t
        print(f"{name}: " + "  ".join(
            f"{k}={v:.1f}ms" for k, v in sorted(tot.items())))

    bt, bs, bo = np.asarray(rb[1]), np.asarray(rb[2]), np.asarray(rb[3])
    wt, wss, wo = np.asarray(rw[1]), np.asarray(rw[2]), np.asarray(rw[3])
    bh, wh = bs >= 0, wss >= 0
    print(f"closest: mask mism {(bh != wh).sum()}, slot mism "
          f"{(bs != wss)[bh & wh].sum()}, max|dt| "
          f"{np.abs(bt - wt)[bh & wh].max(initial=0):.2e}; "
          f"any mism {(bo != wo).sum()}")


if __name__ == "__main__" and not os.environ.get("IDK_STEERED"):
    main()


def main_steered():
    """Device-timed steered trace vs plain chained trace."""
    import jax
    import jax.numpy as jnp

    from idkengine_tpu.bvh.builder import BuildSettings
    from idkengine_tpu.ops.packet_trace import (
        packet_trace_any, packet_trace_any_steered, packet_trace_closest,
        packet_trace_closest_steered, segment_wave_key)
    from idkengine_tpu.render.camera import Camera, generate_rays
    from idkengine_tpu.render.pathtracer import tile_swizzle
    from idkengine_tpu.scene.procedural import atrium
    from idkengine_tpu.scene.scene_db import SceneDatabase

    w, h = 1920, 1080
    rows = int(os.environ.get("IDK_ROWS", 32))
    db = SceneDatabase(BuildSettings(
        max_leaf_triangle_count=12, traversal_cost=4.0, presplit_factor=0.0))
    db.add_model(atrium(int(os.environ.get("IDK_BENCH_TRIS", 110_000))))
    sc = db.build()
    ps = db.packet_scene
    ws = db.wave_scene
    smin = jnp.asarray(db.wave_seg_min)
    smax = jnp.asarray(db.wave_seg_max)
    print(f"segments: {len(ws)}")

    cam = Camera(position=np.array([0, 3, 24], np.float32), yaw=-90.0,
                 fov_y=65.0)
    swz = jnp.asarray(tile_swizzle(w, h))
    o, d = generate_rays(cam.ray_params(w, h), w, h, jnp.zeros(2), px=swz)
    tm = jnp.full((w * h,), 3.4e38, jnp.float32)
    hit = packet_trace_closest(ps, o, d, tm, rows=rows)
    slot = jnp.maximum(hit.slot, 0)
    gn = jnp.asarray(sc.tri_gn)[slot]
    flip = jnp.sum(gn * d, axis=-1) > 0.0
    gn = jnp.where(flip[:, None], -gn, gn)
    hp = o + d * hit.t[:, None]
    u1, u2 = jax.random.uniform(jax.random.PRNGKey(1), (2, w * h))
    r_ = jnp.sqrt(u1)
    phi = 2 * np.pi * u2
    tang = jnp.where(jnp.abs(gn[:, 0:1]) < 0.9,
                     jnp.array([[1.0, 0, 0]]), jnp.array([[0, 1.0, 0]]))
    tx = jnp.cross(gn, tang)
    tx = tx / jnp.maximum(jnp.linalg.norm(tx, axis=-1, keepdims=True), 1e-9)
    ty = jnp.cross(gn, tx)
    d2 = (tx * (r_ * jnp.cos(phi))[:, None]
          + ty * (r_ * jnp.sin(phi))[:, None]
          + gn * jnp.sqrt(jnp.maximum(1 - u1, 0))[:, None])
    o2 = hp + gn * 1e-3
    alive = hit.slot >= 0
    tm2 = jnp.where(alive, jnp.float32(3.4e38), -1.0)
    lo = jnp.asarray(sc.node_min[0])
    ext = jnp.asarray(sc.node_max[0]) - lo
    key = segment_wave_key(o2, d2, tm2, smin, smax, lo, ext)
    p = jnp.argsort(key)
    o2s, d2s, tm2s = o2[p], d2[p], tm2[p]
    lpos = jnp.array([0.0, 10.5, 0.0])
    ld = lpos[None, :] - o2s
    ldist = jnp.linalg.norm(ld, axis=-1)
    ldn = ld / jnp.maximum(ldist[:, None], 1e-9)
    stm = jnp.where(tm2s > 0, ldist - 2e-3, -1.0)
    jax.block_until_ready((o2s, d2s, tm2s, ldn, stm))

    pstack, lstack = db.wave_pairs_stack, db.wave_leaf_stack

    # arrays travel as jit ARGUMENTS: closed-over device arrays are baked
    # into the HLO as constants (remote-compile rejects >limit payloads)
    @jax.jit
    def run_plain(ps_, o_, d_, tm_, ldn_, stm_, salt):
        h1 = packet_trace_closest(ps_, o_, d_, tm_ + salt, rows=rows)
        occ = packet_trace_any(ps_, o_, ldn_, stm_ * (1.0 + salt * 0), rows=rows)
        return (jnp.sum(h1.t * (h1.slot >= 0)) + jnp.sum(occ),
                h1.t, h1.slot, occ)

    @jax.jit
    def run_steer(ws_, pstack_, lstack_, smin_, smax_, o_, d_, tm_, ldn_,
                  stm_, salt):
        h1 = packet_trace_closest_steered(
            ws_, pstack_, lstack_, smin_, smax_, o_, d_, tm_ + salt, rows=rows)
        occ = packet_trace_any_steered(
            ws_, pstack_, lstack_, smin_, smax_, o_, ldn_,
            stm_ * (1.0 + salt * 0), rows=rows)
        return (jnp.sum(h1.t * (h1.slot >= 0)) + jnp.sum(occ),
                h1.t, h1.slot, occ)

    rb = run_plain(ps, o2s, d2s, tm2s, ldn, stm, jnp.float32(0))
    _ = float(rb[0])
    with jax.profiler.trace("/tmp/jt_st_plain"):
        _ = float(run_plain(ps, o2s, d2s, tm2s, ldn, stm,
                            jnp.float32(1e25))[0])
    rw = run_steer(ws, pstack, lstack, smin, smax, o2s, d2s, tm2s, ldn, stm,
                   jnp.float32(0))
    _ = float(rw[0])
    with jax.profiler.trace("/tmp/jt_st_steer"):
        _ = float(run_steer(ws, pstack, lstack, smin, smax, o2s, d2s, tm2s,
                            ldn, stm, jnp.float32(1e25))[0])

    for name, tdir in (("plain", "/tmp/jt_st_plain"),
                       ("steer", "/tmp/jt_st_steer")):
        by = device_ms(tdir)
        tot = {}
        for n, t in by.items():
            base = 'closest' if 'closest' in n else ('any' if 'any' in n
                                                     else 'steer')
            tot[base] = tot.get(base, 0) + t
        print(f"{name}: " + "  ".join(
            f"{k}={v:.1f}ms" for k, v in sorted(tot.items())))
        allk = device_ms(tdir, substr="")
        print(f"  {name} total device: {sum(allk.values()):.1f}ms")

    bt, bs, bo = np.asarray(rb[1]), np.asarray(rb[2]), np.asarray(rb[3])
    wt, wss, wo = np.asarray(rw[1]), np.asarray(rw[2]), np.asarray(rw[3])
    bh, wh = bs >= 0, wss >= 0
    print(f"closest: mask mism {(bh != wh).sum()}, slot mism "
          f"{(bs != wss)[bh & wh].sum()}, max|dt| "
          f"{np.abs(bt - wt)[bh & wh].max(initial=0):.2e}; "
          f"any mism {(bo != wo).sum()}")


if __name__ == "__main__" and os.environ.get("IDK_STEERED"):
    main_steered()
