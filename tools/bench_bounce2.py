#!/usr/bin/env python
"""Sweep packet size x sort key on REAL bounce-1 rays extracted from a frame.

Env: IDK_ROWS (trace rows), IDK_KEY (octcell|cell|oct|dir6cell|none).
Prints device-profiled ms for closest+any on the real bounce distribution.
"""
import collections
import glob
import gzip
import json
import os

import numpy as np


def main():
    import jax
    import jax.numpy as jnp

    from idkengine_tpu.bvh.builder import BuildSettings
    from idkengine_tpu.ops.packet_trace import (
        packet_trace_any, packet_trace_closest)
    from idkengine_tpu.render import Camera, PathTracer, PathTracerSettings
    from idkengine_tpu.render import sampling, shading
    from idkengine_tpu.scene.procedural import atrium
    from idkengine_tpu.scene.scene_db import SceneDatabase
    from idkengine_tpu.utils import rng
    from idkengine_tpu.utils.compression import decompress_normal
    from idkengine_tpu.render.camera import generate_rays
    from idkengine_tpu.render.pathtracer import tile_swizzle

    w, h = 1920, 1080
    rows = int(os.environ.get("IDK_ROWS", 32))
    keymode = os.environ.get("IDK_KEY", "octcell")

    db = SceneDatabase(BuildSettings(
        max_leaf_triangle_count=int(os.environ.get("IDK_MAX_LEAF", 12)),
        traversal_cost=4.0, presplit_factor=0.0))
    db.add_model(atrium(110_000))
    sc = db.build()
    ps = db.packet_scene
    cam = Camera(position=np.array([0, 3, 24], np.float32), yaw=-90.0, fov_y=65.0)
    swz = jnp.asarray(tile_swizzle(w, h))
    pix = swz.astype(jnp.uint32)
    state = rng.init_state(pix, jnp.uint32(0))
    state, u_pix = rng.uniform2(state)
    o, d = generate_rays(cam.ray_params(w, h), w, h, u_pix, px=swz)
    tm = jnp.full((w * h,), 3.4e38, jnp.float32)
    hit = packet_trace_closest(ps, o, d, tm)

    # reconstruct shading normal + BSDF bounce like the real path tracer
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
    inside = jnp.zeros((w * h,), bool)
    mats = db.materials.soa()
    mat_id = np.asarray(sc.tri_mat)[np.asarray(slot)]
    alb = jnp.asarray(mats["base_color"][mat_id, :3])
    met = jnp.asarray(mats["metallic"][mat_id])
    rough = jnp.asarray(mats["roughness"][mat_id])
    trans = jnp.asarray(mats["transmission"][mat_id])
    ior = jnp.asarray(mats["ior"][mat_id])
    surf = shading.sample_bsdf(d, ns, alb, met, rough, trans, ior,
                               inside, u_lobe, u_dir)
    hp = o + d * hit.t[:, None]
    eps = 1e-4 * jnp.maximum(1.0, jnp.linalg.norm(hp, axis=-1, keepdims=True))
    o2 = hp + gn * eps
    d2 = surf.direction
    alive = hit.slot >= 0
    tm2 = jnp.where(alive, jnp.float32(3.4e38), -1.0)

    lo = sc.node_min[0]
    ext = sc.node_max[0] - sc.node_min[0]

    def key_octcell(o_, d_, bits):
        oc = ((d_[:, 0] >= 0) * 1 + (d_[:, 1] >= 0) * 2
              + (d_[:, 2] >= 0) * 4).astype(jnp.int32)
        n = 1 << bits
        q = jnp.clip((o_ - lo) / jnp.maximum(ext, 1e-6) * n, 0, n - 1).astype(jnp.int32)
        cell = (q[:, 0] << (2 * bits)) | (q[:, 1] << bits) | q[:, 2]
        return (oc << (3 * bits)) | cell

    if keymode == "octcell":
        k = key_octcell(o2, d2, 5)
    elif keymode == "cell":
        k = key_octcell(o2, d2, 5) & ((1 << 15) - 1)
    elif keymode == "oct8cell":
        k = key_octcell(o2, d2, 8)
    elif keymode == "celloct":
        kk = key_octcell(o2, d2, 5)
        k = ((kk & ((1 << 15) - 1)) << 3) | (kk >> 15)
    elif keymode == "none":
        k = jnp.zeros((w * h,), jnp.int32)
    k = jnp.where(alive, k, jnp.int32(0x7FFFFFFF))
    perm = jnp.argsort(k)
    o2s, d2s, tm2s = o2[perm], d2[perm], tm2[perm]
    # per-packet light target
    pk = jnp.arange(w * h, dtype=jnp.uint32) // (rows * 128)
    lpos = jnp.where((pk % 2 == 0)[:, None], jnp.array([[0.0, 10.5, 0.0]]),
                     jnp.array([[6.0, 4.0, -20.0]]))
    ldir = lpos - o2s
    ldist = jnp.linalg.norm(ldir, axis=-1)
    ldir = ldir / jnp.maximum(ldist[:, None], 1e-9)
    stm = jnp.where(tm2s > 0, ldist - 1e-2, -1.0)
    jax.block_until_ready((o2s, d2s, tm2s, ldir, stm))

    @jax.jit
    def run(salt):
        h1 = packet_trace_closest(ps, o2s, d2s, tm2s + salt, rows=rows)
        occ = packet_trace_any(ps, o2s, ldir, stm + salt * 0, rows=rows)
        return jnp.sum(h1.t * (h1.slot >= 0)) + jnp.sum(occ)

    _ = float(run(jnp.float32(0)))
    with jax.profiler.trace("/tmp/jt_b2"):
        _ = float(run(jnp.float32(1e25)))
    with gzip.open(sorted(glob.glob(
            '/tmp/jt_b2/plugins/profile/*/vm.trace.json.gz'))[-1]) as f:
        tr = json.load(f)
    meta = {e.get('pid'): e.get('args', {}).get('name', '')
            for e in tr['traceEvents']
            if e.get('ph') == 'M' and e.get('name') == 'process_name'}
    dev = [p for p, n in meta.items() if 'TPU' in str(n)]
    by = collections.defaultdict(float)
    for e in tr['traceEvents']:
        if e.get('ph') == 'X' and e.get('pid') in dev and 'packet' in e['name']:
            by[e['name']] += e.get('dur', 0) / 1000.0
    tot = {}
    for n, t in by.items():
        base = 'closest' if 'closest' in n else 'any'
        tot[base] = tot.get(base, 0) + t
    # subtract the shared primary closest (unsalted → cached? it reruns: count max only)
    print(f"rows={rows} key={keymode}: " + "  ".join(
        f"{k}={v:.1f}ms" for k, v in sorted(tot.items())))


if __name__ == "__main__":
    main()
