#!/usr/bin/env python
"""Bounce-trace microbench: device-profiled cost of closest/any traces on
sorted diffuse-bounce rays vs packet size (IDK_PACKET_ROWS)."""
import glob
import gzip
import json
import collections
import os

import numpy as np


def main():
    import jax
    import jax.numpy as jnp

    from idkengine_tpu.bvh.builder import BuildSettings
    from idkengine_tpu.ops.packet_trace import (
        PACKET, packet_trace_any, packet_trace_closest)
    from idkengine_tpu.render.camera import Camera, generate_rays
    from idkengine_tpu.render.pathtracer import tile_swizzle
    from idkengine_tpu.render import sampling
    from idkengine_tpu.scene.procedural import atrium
    from idkengine_tpu.scene.scene_db import SceneDatabase

    w, h = 1920, 1080
    db = SceneDatabase(BuildSettings(
        max_leaf_triangle_count=12, traversal_cost=4.0, presplit_factor=0.0))
    db.add_model(atrium(int(os.environ.get("IDK_BENCH_TRIS", 110_000))))
    db.build()
    ps = db.packet_scene
    cam = Camera(position=np.array([0, 3, 24], np.float32), yaw=-90.0, fov_y=65.0)
    swz = jnp.asarray(tile_swizzle(w, h))
    o, d = generate_rays(cam.ray_params(w, h), w, h, jnp.zeros(2), px=swz)
    tm = jnp.full((w * h,), 3.4e38, jnp.float32)
    hit = packet_trace_closest(ps, o, d, tm)
    hp = jax.block_until_ready(o + d * hit.t[:, None])

    key = jax.random.PRNGKey(0)
    # cosine-hemisphere bounce directions around +y-ish normals (proxy)
    rd = jax.random.normal(key, (w * h, 3))
    rd = rd / jnp.linalg.norm(rd, axis=-1, keepdims=True)
    btm = jnp.where(hit.slot >= 0, jnp.float32(3.4e38), -1.0)
    oct_ = (rd[:, 0] >= 0) * 1 + (rd[:, 1] >= 0) * 2 + (rd[:, 2] >= 0) * 4
    lo = hp.min(0)
    ext = hp.max(0) - lo + 1e-6
    q = jnp.clip((hp - lo) / ext * 32, 0, 31).astype(jnp.int32)
    k = (oct_.astype(jnp.int32) << 15) | (q[:, 0] << 10) | (q[:, 1] << 5) | q[:, 2]
    perm = jnp.argsort(k)
    hps, rds, btms = hp[perm], rd[perm], btm[perm]
    ldir = jnp.array([0.0, 10.5, 0.0]) - hps
    ldist = jnp.linalg.norm(ldir, axis=-1)
    ldir = ldir / ldist[:, None]
    stms = jnp.where(btms > 0, ldist - 1e-2, -1.0)

    @jax.jit
    def run(salt):
        h1 = packet_trace_closest(ps, hps, rds, btms + salt)
        occ = packet_trace_any(ps, hps, ldir, stms + salt * 0)
        return jnp.sum(h1.t * (h1.slot >= 0)) + jnp.sum(occ)

    _ = float(run(jnp.float32(0)))
    with jax.profiler.trace("/tmp/jt_bounce"):
        _ = float(run(jnp.float32(1e25)))
    with gzip.open(sorted(glob.glob(
            '/tmp/jt_bounce/plugins/profile/*/vm.trace.json.gz'))[-1]) as f:
        tr = json.load(f)
    meta = {e.get('pid'): e.get('args', {}).get('name', '')
            for e in tr['traceEvents']
            if e.get('ph') == 'M' and e.get('name') == 'process_name'}
    dev = [p for p, n in meta.items() if 'TPU' in str(n)]
    by = collections.defaultdict(float)
    for e in tr['traceEvents']:
        if e.get('ph') == 'X' and e.get('pid') in dev and 'packet' in e['name']:
            by[e['name']] += e.get('dur', 0) / 1000.0
    rows = PACKET // 128
    for n, t in sorted(by.items()):
        print(f"rows={rows} {n}: {t:.1f} ms")


if __name__ == "__main__":
    main()
