#!/usr/bin/env python
"""Steered-vs-rebin on REAL bounce + NEE rays at the bench scene (2.8M).

One process, one scene build: extracts the bounce-1 ray batch and the
NEE shadow batch exactly as the path tracer does, then device-times
  closest: packet_trace_closest_steered  vs  packet_trace_closest_rebin
  any:     packet_trace_any_steered      vs  packet_trace_any_rebin
with jax.profiler event bucketing so kernel time and XLA glue are split
per variant. This is the decision bench for the round-5 rebin wiring.

Env: IDK_TRIS (2.8M), IDK_ROWS (BOUNCE_ROWS), IDK_REBIN_K.
"""
import glob
import gzip
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def profile_call(fn, label):
    import jax
    out = jax.block_until_ready(fn())  # compile
    t0 = time.time()
    out = jax.block_until_ready(fn())
    wall = (time.time() - t0) * 1000
    tdir = f"/tmp/jt_r5_{label}"
    with jax.profiler.trace(tdir):
        jax.block_until_ready(fn())
    total = {}
    try:
        path = sorted(glob.glob(tdir + "/plugins/profile/*/*.trace.json.gz"))[-1]
        with gzip.open(path) as f:
            tr = json.load(f)
        meta = {}
        for e in tr["traceEvents"]:
            if e.get("ph") == "M" and e.get("name") == "thread_name":
                meta[(e.get("pid"), e.get("tid"))] = e["args"]["name"]
        for e in tr["traceEvents"]:
            if e.get("ph") != "X":
                continue
            tname = meta.get((e.get("pid"), e.get("tid")), "")
            if "XLA Op" not in tname and "TensorFlow Op" not in tname:
                continue
            nm = e.get("name", "")
            if nm.startswith("jit_"):
                continue
            dur = e.get("dur", 0) / 1000.0
            if "steerloop" in nm or "steered" in nm or "pt_closest" in nm \
                    or "pt_any" in nm:
                total["kernel"] = total.get("kernel", 0.0) + dur
            elif "sort" in nm:
                total["sort"] = total.get("sort", 0.0) + dur
            elif "gather" in nm or "dynamic-slice" in nm:
                total["gather"] = total.get("gather", 0.0) + dur
            elif "scatter" in nm:
                total["scatter"] = total.get("scatter", 0.0) + dur
            else:
                total["other"] = total.get("other", 0.0) + dur
    except Exception as ex:  # profiling is best-effort
        total = {"error": str(ex)}
    tot = sum(v for v in total.values() if isinstance(v, float))
    print(f"{label:22s} wall {wall:7.1f} ms  device {tot:7.1f} ms  "
          + "  ".join(f"{k}={v:.1f}" for k, v in sorted(total.items())),
          flush=True)
    return out


def main():
    import jax
    import jax.numpy as jnp

    from idkengine_tpu.bvh.builder import BuildSettings
    from idkengine_tpu.ops import packet_trace as PT
    from idkengine_tpu.render import Camera
    from idkengine_tpu.render import shading
    from idkengine_tpu.render.camera import generate_rays
    from idkengine_tpu.render.pathtracer import tile_swizzle
    from idkengine_tpu.scene.procedural import atrium
    from idkengine_tpu.scene.scene_db import SceneDatabase
    from idkengine_tpu.utils import rng
    from idkengine_tpu.utils.compression import decompress_normal

    w, h = 1920, 1080
    rows = int(os.environ.get("IDK_ROWS", PT.BOUNCE_ROWS))
    tris = int(os.environ.get("IDK_TRIS", 2_800_000))

    db = SceneDatabase(BuildSettings(
        max_leaf_triangle_count=12, traversal_cost=4.0, presplit_factor=0.0))
    db.add_model(atrium(tris))
    sc = db.build()
    t0 = time.time()
    ws = db.wave_set()
    print(f"wave_set {time.time()-t0:.1f}s S={len(ws.segs)}", flush=True)

    cam = Camera(position=np.array([0, 3, 24], np.float32), yaw=-90.0,
                 fov_y=65.0)
    mats = db.materials.soa()
    mat_tbl = np.concatenate(
        [mats["base_color"][:, :3], mats["metallic"][:, None],
         mats["roughness"][:, None], mats["transmission"][:, None],
         mats["ior"][:, None]], axis=1).astype(np.float32)
    lo_np = np.asarray(sc.node_min[0])
    ext_np = np.asarray(sc.node_max[0]) - lo_np

    @jax.jit
    def gen(_):
        swz = jnp.asarray(tile_swizzle(w, h))
        pix = swz.astype(jnp.uint32)
        state = rng.init_state(pix, jnp.uint32(0))
        state, u_pix = rng.uniform2(state)
        o, d = generate_rays(cam.ray_params(w, h), w, h, u_pix, px=swz)
        tm = jnp.full((w * h,), 3.4e38, jnp.float32)
        return o, d, tm, state

    @jax.jit
    def prep(hit, o, d, tm, state, ws, tri_n, tri_gn, tri_mat, mat_tbl,
             lo, ext):
        slot = jnp.maximum(hit.slot, 0)
        u_b, v_b = hit.u, hit.v
        w_b = 1.0 - u_b - v_b
        n0 = decompress_normal(tri_n[slot, 0], jnp)
        n1 = decompress_normal(tri_n[slot, 1], jnp)
        n2 = decompress_normal(tri_n[slot, 2], jnp)
        ns = n0 * w_b[..., None] + n1 * u_b[..., None] + n2 * v_b[..., None]
        ns = ns / jnp.maximum(
            jnp.linalg.norm(ns, axis=-1, keepdims=True), 1e-12)
        gn = tri_gn[slot]
        flip = jnp.sum(gn * d, axis=-1) > 0.0
        gn = jnp.where(flip[..., None], -gn, gn)
        ns = jnp.where(jnp.sum(ns * gn, axis=-1, keepdims=True) < 0.0,
                       -ns, ns)
        state, u_lobe = rng.uniform(state)
        state, u_dir = rng.uniform2(state)
        inside = jnp.zeros((w * h,), bool)
        g = mat_tbl[tri_mat[slot]]
        surf = shading.sample_bsdf(
            d, ns, g[:, 0:3], g[:, 3], g[:, 4], g[:, 5], g[:, 6],
            inside, u_lobe, u_dir)
        hp = o + d * hit.t[:, None]
        eps = 1e-4 * jnp.maximum(
            1.0, jnp.linalg.norm(hp, axis=-1, keepdims=True))
        o2 = hp + gn * eps
        d2 = surf.direction
        alive = hit.slot >= 0
        tm2 = jnp.where(alive, jnp.float32(3.4e38), -1.0)
        key = PT.segment_wave_key(o2, d2, tm2, ws.seg_min, ws.seg_max,
                                  lo, ext)
        perm = jnp.argsort(key)
        o2s, d2s, tm2s = o2[perm], d2[perm], tm2[perm]
        lpos = jnp.array([0.0, 12.0, 0.0], jnp.float32)
        ldir = lpos[None, :] - o2s
        ldist = jnp.linalg.norm(ldir, axis=-1)
        ldirn = ldir / jnp.maximum(ldist[:, None], 1e-9)
        stm = jnp.where(tm2s > 0, ldist - 1e-2, -1.0)
        return o2s, d2s, tm2s, ldirn, stm, o2, d2, tm2

    t0 = time.time()
    o, d, tm, state = jax.block_until_ready(gen(jnp.zeros((1,))))
    print(f"gen {time.time()-t0:.1f}s", flush=True)
    t0 = time.time()
    hit = jax.block_until_ready(PT.packet_trace_closest_steered(
        ws.segs, ws.pairs_stack, ws.leaf_stack, ws.seg_min, ws.seg_max,
        o, d, tm, tag="b5p"))
    print(f"primary trace (compile+run) {time.time()-t0:.1f}s", flush=True)
    t0 = time.time()
    (o2s, d2s, tm2s, ldirn, stm, o2u, d2u, tm2u) = jax.block_until_ready(
        prep(hit, o, d, tm, state, ws, sc.tri_n, sc.tri_gn, sc.tri_mat,
             jnp.asarray(mat_tbl), jnp.asarray(lo_np), jnp.asarray(ext_np)))
    print(f"prep (compile+run) {time.time()-t0:.1f}s", flush=True)
    n_live = int(jnp.sum(tm2s > 0))
    print(f"bounce batch: {n_live} live of {w*h}", flush=True)

    args = (ws.segs, ws.pairs_stack, ws.leaf_stack, ws.seg_min, ws.seg_max)

    h_st = profile_call(lambda: PT.packet_trace_closest_steered(
        *args, o2s, d2s, tm2s, rows=rows, tag="b5s"), "closest_steered")
    h_rb = profile_call(lambda: PT.packet_trace_closest_rebin(
        *args, o2s, d2s, tm2s, rows=rows, tag="b5r"), "closest_rebin")
    agree = float(jnp.mean((jnp.abs(h_st.t - h_rb.t) < 1e-3)
                           | ((h_st.slot < 0) & (h_rb.slot < 0))))
    print(f"closest agree: {agree:.4f}", flush=True)

    o_st = profile_call(lambda: PT.packet_trace_any_steered(
        *args, o2s, ldirn, stm, rows=rows, tag="n5s"), "any_steered")
    o_rb = profile_call(lambda: PT.packet_trace_any_rebin(
        *args, o2s, ldirn, stm, rows=rows, tag="n5r"), "any_rebin")
    print(f"any agree: {float(jnp.mean(o_st == o_rb)):.4f}", flush=True)

    if int(os.environ.get("IDK_SWEEP_KEYS", "0")):
        from functools import partial as _part
        lo_j = jnp.asarray(lo_np)
        ext_j = jnp.asarray(ext_np)

        @_part(jax.jit, static_argnames=("nw", "cb", "cell_first"))
        def sortvar(o2, d2, tm2, nw, cb, cell_first):
            if nw == 0:
                oc = ((d2[:, 0] >= 0) * 1 + (d2[:, 1] >= 0) * 2
                      + (d2[:, 2] >= 0) * 4).astype(jnp.int32)
                n = 1 << cb
                q = jnp.clip((o2 - lo_j[None, :])
                             / jnp.maximum(ext_j[None, :], 1e-6) * n,
                             0, n - 1).astype(jnp.int32)
                cell = (q[:, 0] << (2 * cb)) | (q[:, 1] << cb) | q[:, 2]
                key = (oc << (3 * cb)) | cell
                key = jnp.where(tm2 > 0, key, jnp.int32(0x7FFFFFFF))
            else:
                key = PT.segment_wave_key(o2, d2, tm2, ws.seg_min,
                                          ws.seg_max, lo_j, ext_j,
                                          n_waves=nw, cell_bits=cb)
                if cell_first:
                    # swap the oct|cell tail to cell|oct
                    sub = 3 + 3 * cb
                    head = key >> sub
                    oc = (key >> (3 * cb)) & 7
                    cell = key & ((1 << (3 * cb)) - 1)
                    key = (head << sub) | (cell << 3) | oc
            p2 = jnp.argsort(key)
            return o2[p2], d2[p2], tm2[p2]

        for nw, cb, cf in ((2, 4, False), (2, 4, True), (1, 4, False),
                           (2, 3, False), (2, 5, False), (0, 4, False),
                           (0, 6, False)):
            ov, dv, tv = jax.block_until_ready(
                sortvar(o2u, d2u, tm2u, nw, cb, cf))
            profile_call(lambda ov=ov, dv=dv, tv=tv:
                         PT.packet_trace_closest_steered(
                             *args, ov, dv, tv, rows=rows, tag="b5s"),
                         f"key nw={nw} cb={cb} cf={int(cf)}")

    if int(os.environ.get("IDK_SWEEP_ROWS", "0")):
        for rv in (8, 32):
            profile_call(lambda rv=rv: PT.packet_trace_closest_steered(
                *args, o2s, d2s, tm2s, rows=rv, tag="b5s"),
                f"rows={rv}")


if __name__ == "__main__":
    main()
