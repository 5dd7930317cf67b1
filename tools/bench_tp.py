#!/usr/bin/env python
"""A/B: steered one-phase vs two-phase traversal on REAL bounce rays.

Builds the bench atrium (IDK_TRIS, default 2.8M), extracts bounce-1 rays
exactly like the path tracer (primary trace + BSDF sample), octcell-sorts
them, then device-profiles closest+any for:
  a) packet_trace_*_steered        (the round-2 headline path)
  b) two_phase_*_steered           (ops/two_phase.py)
Device times come from the profiler (axon's block_until_ready is broken
and executions memoize — salted inputs force re-execution).

Env: IDK_TRIS, IDK_ROWS, IDK_TP_D, IDK_TP_STEER_K, IDK_MODE=both|tp|steered
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


def device_ms(tag, run, arg):
    import jax

    _ = jax.block_until_ready(run(arg))  # compile
    path = f"/tmp/jt_tp_{tag}"
    with jax.profiler.trace(path):
        _ = jax.block_until_ready(run(arg + 1.0))
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
    return by


def main():
    import jax
    import jax.numpy as jnp

    from idkengine_tpu.bvh.builder import BuildSettings
    from idkengine_tpu.ops import two_phase as tp
    from idkengine_tpu.ops.packet_trace import (
        packet_trace_any_steered, packet_trace_closest_steered)
    from idkengine_tpu.render import Camera
    from idkengine_tpu.render import shading
    from idkengine_tpu.render.camera import generate_rays
    from idkengine_tpu.render.pathtracer import tile_swizzle
    from idkengine_tpu.scene.procedural import atrium
    from idkengine_tpu.scene.scene_db import SceneDatabase
    from idkengine_tpu.utils import rng
    from idkengine_tpu.utils.compression import decompress_normal

    w = int(os.environ.get("IDK_RES_W", 1920))
    h = int(os.environ.get("IDK_RES_H", 1080))
    tris = int(os.environ.get("IDK_TRIS", 2_800_000))
    rows = int(os.environ.get("IDK_ROWS", 32))
    mode = os.environ.get("IDK_MODE", "both")

    t0 = time.time()
    db = SceneDatabase(BuildSettings(
        max_leaf_triangle_count=12, traversal_cost=4.0, presplit_factor=0.0))
    db.add_model(atrium(tris))
    sc = db.build()
    ws = db.wave_set()
    assert ws is not None and ws.first_stack is not None, "need wave segs"
    print(f"build {time.time()-t0:.1f}s, segs={len(ws.segs)}")

    cam = Camera(position=np.array([0, 3, 24], np.float32), yaw=-90.0,
                 fov_y=65.0)
    swz = jnp.asarray(tile_swizzle(w, h))
    pix = swz.astype(jnp.uint32)
    state = rng.init_state(pix, jnp.uint32(0))
    state, u_pix = rng.uniform2(state)
    o, d = generate_rays(cam.ray_params(w, h), w, h, u_pix, px=swz)
    tm = jnp.full((w * h,), 3.4e38, jnp.float32)
    hit = packet_trace_closest_steered(
        ws.segs, ws.pairs_stack, ws.leaf_stack, ws.seg_min, ws.seg_max,
        o, d, tm, rows=rows)
    hit = jax.block_until_ready(hit)
    print(f"primary done {time.time()-t0:.1f}s, "
          f"hit rate {float(jnp.mean(hit.slot >= 0)):.3f}")

    # BSDF bounce like the real path tracer
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
    surf = shading.sample_bsdf(
        d, ns, jnp.asarray(mats["base_color"][mat_id, :3]),
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

    # octcell sort (the real wavefront key)
    lo = sc.node_min[0]
    ext = sc.node_max[0] - sc.node_min[0]
    oc = ((d2[:, 0] >= 0) * 1 + (d2[:, 1] >= 0) * 2
          + (d2[:, 2] >= 0) * 4).astype(jnp.int32)
    q = jnp.clip((o2 - lo) / jnp.maximum(ext, 1e-6) * 32, 0, 31).astype(
        jnp.int32)
    cell = (q[:, 0] << 10) | (q[:, 1] << 5) | q[:, 2]
    k = jnp.where(alive, (oc << 15) | cell, jnp.int32(0x7FFFFFFF))
    perm = jnp.argsort(k)
    o2s, d2s, tm2s = o2[perm], d2[perm], tm2[perm]

    # NEE shadow rays toward the bench lights
    pk_id = jnp.arange(w * h, dtype=jnp.uint32) // (rows * 128)
    lpos = jnp.where((pk_id % 2 == 0)[:, None],
                     jnp.array([[0.0, 10.5, 0.0]]),
                     jnp.array([[6.0, 4.0, -20.0]]))
    ldir = lpos - o2s
    ldist = jnp.linalg.norm(ldir, axis=-1)
    ldir = ldir / jnp.maximum(ldist[:, None], 1e-9)
    stm = jnp.where(tm2s > 0, ldist - 1e-2, -1.0)
    jax.block_until_ready((o2s, d2s, tm2s, ldir, stm))
    print(f"bounce rays ready {time.time()-t0:.1f}s, "
          f"alive {float(jnp.mean(tm2s > 0)):.3f}")

    args = (ws.segs, ws.pairs_stack, ws.leaf_stack)
    targs = args + (ws.first_stack, ws.count_stack)

    # NO outer jit wrapper: the inner steered functions are jitted with the
    # tables as ARGUMENTS; an outer jit would close over the 100s-of-MB
    # stacks as embedded constants and blow the remote-compile payload
    # limit (HTTP 413 — the exact failure that killed the first A/B run).
    if mode in ("both", "steered"):
        def run_steered(salt):
            h1 = packet_trace_closest_steered(
                *args, ws.seg_min, ws.seg_max, o2s, d2s, tm2s + salt,
                rows=rows)
            occ = packet_trace_any_steered(
                *args, ws.seg_min, ws.seg_max, o2s, ldir,
                stm + salt * 0, rows=rows)
            return jnp.sum(h1.t * (h1.slot >= 0)) + jnp.sum(occ)

        by = device_ms("steered", run_steered, jnp.float32(0))
        tot = sum(v for n, v in by.items())
        top = sorted(by.items(), key=lambda kv: -kv[1])[:6]
        print(f"STEERED total {tot:.1f} ms; top: "
              + "  ".join(f"{n[:40]}={v:.1f}" for n, v in top))

    if mode in ("both", "tp"):
        def run_tp(salt):
            h1 = tp.two_phase_closest_steered(
                *targs, ws.seg_min, ws.seg_max, o2s, d2s, tm2s + salt,
                rows=rows)
            occ = tp.two_phase_any_steered(
                *targs, ws.seg_min, ws.seg_max, o2s, ldir,
                stm + salt * 0, rows=rows)
            return jnp.sum(h1.t * (h1.slot >= 0)) + jnp.sum(occ)

        by = device_ms("tp", run_tp, jnp.float32(0))
        tot = sum(v for n, v in by.items())
        top = sorted(by.items(), key=lambda kv: -kv[1])[:8]
        print(f"TWO-PHASE total {tot:.1f} ms; top: "
              + "  ".join(f"{n[:40]}={v:.1f}" for n, v in top))

    # correctness cross-check on a subsample
    n_chk = 1 << 16
    h_a = packet_trace_closest_steered(
        *args, ws.seg_min, ws.seg_max, o2s[:n_chk], d2s[:n_chk],
        tm2s[:n_chk], rows=rows)
    h_b = tp.two_phase_closest_steered(
        *targs, ws.seg_min, ws.seg_max, o2s[:n_chk], d2s[:n_chk],
        tm2s[:n_chk], rows=rows)
    same = float(jnp.mean((h_a.slot == h_b.slot)
                          | (jnp.abs(h_a.t - h_b.t) < 1e-3)))
    print(f"closest agreement on {n_chk} rays: {same:.5f}")


if __name__ == "__main__":
    main()
