#!/usr/bin/env python
"""Per-stage timing of one PT sample on real intermediate data.

Times isolated jits for: raygen, primary trace, attr+material fetch, shading
math, bsdf sample, light spheres, sort, bounce trace, NEE shadow trace,
unscramble. Identifies where the non-trace frame cost lives.
"""
import os
import time

import numpy as np


def timed(fn, *args, reps=3, **kw):
    import jax
    out = jax.block_until_ready(fn(*args, **kw))
    t0 = time.perf_counter()
    for _ in range(reps):
        out = jax.block_until_ready(fn(*args, **kw))
    return (time.perf_counter() - t0) / reps * 1e3, out


def main():
    import jax
    import jax.numpy as jnp

    from idkengine_tpu.bvh.builder import BuildSettings
    from idkengine_tpu.ops.intersect import ray_sphere
    from idkengine_tpu.ops.packet_trace import (
        packet_trace_any, packet_trace_closest)
    from idkengine_tpu.render import Camera, PathTracerSettings, sampling, shading
    from idkengine_tpu.render.camera import generate_rays
    from idkengine_tpu.render.pathtracer import PathTracer, tile_swizzle
    from idkengine_tpu.scene.procedural import atrium
    from idkengine_tpu.scene.scene_db import SceneDatabase
    from idkengine_tpu.utils import rng
    from idkengine_tpu.utils.compression import decompress_normal

    w, h = 1920, 1080
    r = w * h
    db = SceneDatabase(BuildSettings(
        max_leaf_triangle_count=12, traversal_cost=4.0, presplit_factor=0.0))
    db.add_model(atrium(int(os.environ.get("IDK_BENCH_TRIS", 110_000))))
    sc = db.build()
    ps = db.packet_scene
    mats = db.materials.soa()
    db.lights.add([0.0, 10.5, 0.0], [40.0, 38.0, 35.0], radius=0.8)
    db.lights.add([6.0, 4.0, -20.0], [20.0, 10.0, 5.0], radius=0.5)
    lights = {k: jnp.asarray(v) for k, v in db.lights.soa().items() if k != "count"}
    cam = Camera(position=np.array([0, 3, 24], np.float32), yaw=-90.0, fov_y=65.0)

    pt = PathTracer(sc, mats, db.lights.soa(), w, h,
                    PathTracerSettings(ray_depth=2, nee=True,
                                       do_ray_sorting=True,
                                       russian_roulette=False),
                    packet_scene=ps)

    swz = jnp.asarray(tile_swizzle(w, h))
    cam_params = cam.ray_params(w, h)

    # --- stage jits -----------------------------------------------------
    @jax.jit
    def raygen(u):
        state = rng.init_state(swz.astype(jnp.uint32), jnp.uint32(0))
        state, u_pix = rng.uniform2(state)
        state, u_lens = rng.uniform2(state)
        return generate_rays(cam_params, w, h, u_pix, u_lens, px=swz)

    ms, (o, d) = timed(raygen, jnp.zeros(2))
    print(f"raygen                {ms:8.1f} ms")

    tm = jnp.full((r,), 3.4e38, jnp.float32)
    ms, hit = timed(packet_trace_closest, ps, o, d, tm)
    print(f"primary trace         {ms:8.1f} ms")

    @jax.jit
    def lightloop(o, d):
        light_t = jnp.full((r,), 3.4e38, jnp.float32)
        light_id = jnp.full((r,), -1, jnp.int32)
        for li in range(2):
            lh, lt = ray_sphere(o, d, lights["pos"][li], lights["radius"][li])
            closer = lh & (lt < light_t)
            light_t = jnp.where(closer, lt, light_t)
            light_id = jnp.where(closer, li, light_id)
        return light_t, light_id

    ms, (light_t, light_id) = timed(lightloop, o, d)
    print(f"light spheres         {ms:8.1f} ms")

    attr = pt._attr

    @jax.jit
    def attrfetch(hit):
        slot = jnp.maximum(hit.slot, 0)
        af = attr[slot]
        return af, af[:, 12:25]

    ms, (af, mf) = timed(attrfetch, hit)
    print(f"attr gather (packed)  {ms:8.1f} ms")

    @jax.jit
    def shade_math(hit, af, mf, o, d):
        u_b, v_b = hit.u, hit.v
        w_b = 1.0 - u_b - v_b
        an = af[:, 9:12].view(jnp.uint32)
        n0 = decompress_normal(an[:, 0], jnp)
        n1 = decompress_normal(an[:, 1], jnp)
        n2 = decompress_normal(an[:, 2], jnp)
        ns = n0 * w_b[..., None] + n1 * u_b[..., None] + n2 * v_b[..., None]
        ns = ns / jnp.maximum(jnp.linalg.norm(ns, axis=-1, keepdims=True), 1e-12)
        gn = af[:, 6:9]
        flip = jnp.sum(gn * d, axis=-1) > 0.0
        gn = jnp.where(flip[..., None], -gn, gn)
        ns = jnp.where(jnp.sum(ns * gn, axis=-1, keepdims=True) < 0.0, -ns, ns)
        state = rng.init_state(swz.astype(jnp.uint32), jnp.uint32(1))
        state, u_lobe = rng.uniform(state)
        state, u_dir = rng.uniform2(state)
        surf = shading.sample_bsdf(
            d, ns, mf[:, 0:3], mf[:, 6], mf[:, 7], mf[:, 8], mf[:, 9],
            jnp.zeros((r,), bool), u_lobe, u_dir)
        hp = o + d * hit.t[:, None]
        eps = 1e-4 * jnp.maximum(1.0, jnp.linalg.norm(hp, axis=-1, keepdims=True))
        return hp + gn * eps, surf.direction, ns, gn, hp

    ms, (o2, d2, ns, gn, hp) = timed(shade_math, hit, af, mf, o, d)
    print(f"shade+bsdf math       {ms:8.1f} ms")

    alive = hit.slot >= 0

    @jax.jit
    def dosort(o2, d2, alive):
        lo = sc.node_min[0]
        ext = sc.node_max[0] - sc.node_min[0]
        oct_ = ((d2[:, 0] >= 0) * 1 + (d2[:, 1] >= 0) * 2
                + (d2[:, 2] >= 0) * 4).astype(jnp.int32)
        q = jnp.clip((o2 - lo) / jnp.maximum(ext, 1e-6) * 32.0, 0, 31).astype(jnp.int32)
        cell = (q[:, 0] << 10) | (q[:, 1] << 5) | q[:, 2]
        keyv = jnp.where(alive, (oct_ << 15) | cell, jnp.int32(0x7FFFFFFF))
        vals = jax.lax.sort(
            (keyv, o2[:, 0], o2[:, 1], o2[:, 2], d2[:, 0], d2[:, 1], d2[:, 2],
             jnp.zeros(r), jnp.zeros(r), jnp.zeros(r),
             jnp.ones(r), jnp.ones(r), jnp.ones(r),
             alive.astype(jnp.int32), jnp.zeros(r, jnp.int32), swz),
            num_keys=1, is_stable=False)
        return vals[1], vals[2], vals[3], vals[4], vals[5], vals[6], vals[13]

    ms, (sox, soy, soz, sdx, sdy, sdz, sal) = timed(dosort, o2, d2, alive)
    print(f"16-payload sort       {ms:8.1f} ms")

    o2s = jnp.stack([sox, soy, soz], -1)
    d2s = jnp.stack([sdx, sdy, sdz], -1)
    tm2 = jnp.where(sal != 0, jnp.float32(3.4e38), -1.0)
    ms, hit2 = timed(packet_trace_closest, ps, o2s, d2s, tm2)
    print(f"bounce trace (sorted) {ms:8.1f} ms")

    # NEE shadow from primary hits
    @jax.jit
    def neeprep(hp, ns, gn):
        state = rng.init_state(swz.astype(jnp.uint32), jnp.uint32(2))
        state, u_l = rng.uniform2(state)
        ldir, lpdf, _ = sampling.sphere_light_sample(
            hp, lights["pos"][0], lights["radius"][0], u_l)
        cos_s = jnp.maximum(jnp.sum(ns * ldir, axis=-1), 0.0)
        sh_hit, sh_t = ray_sphere(hp, ldir, lights["pos"][0], lights["radius"][0])
        eps_o = 1e-4 * jnp.maximum(1.0, jnp.linalg.norm(hp, axis=-1))
        do_nee = alive & (cos_s > 0.0) & sh_hit
        sh_tmax = jnp.where(do_nee, sh_t - 2.0 * eps_o, -1.0)
        return hp + gn * eps_o[..., None], ldir, sh_tmax

    ms, (sh_o, sh_d, sh_tm) = timed(neeprep, hp, ns, gn)
    print(f"nee prep              {ms:8.1f} ms")

    ms, occ = timed(packet_trace_any, ps, sh_o, sh_d, sh_tm)
    print(f"nee any (primary)     {ms:8.1f} ms")

    @jax.jit
    def unscramble(pix, radiance):
        vals = jax.lax.sort((pix, radiance[:, 0], radiance[:, 1], radiance[:, 2]),
                            num_keys=1, is_stable=False)
        return jnp.stack(vals[1:], -1)

    ms, _ = timed(unscramble, swz, o2)
    print(f"unscramble sort       {ms:8.1f} ms")

    # whole frame for comparison
    ms, _ = timed(lambda: pt.render_frame(cam), reps=2)
    print(f"FULL d2 nee sort frame{ms:8.1f} ms")


if __name__ == "__main__":
    main()
