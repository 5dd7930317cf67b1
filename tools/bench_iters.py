#!/usr/bin/env python
"""Measure traversal iterations/packet for primary vs sorted-bounce rays.

Decides whether to attack per-iteration cost (sync/reduce) or iteration
count (packet union) in the Pallas kernel.
"""
import os

import numpy as np


def main():
    import jax
    import jax.numpy as jnp

    from idkengine_tpu.bvh.builder import BuildSettings
    from idkengine_tpu.ops.packet_trace import _pallas_trace
    from idkengine_tpu.render.camera import Camera, generate_rays
    from idkengine_tpu.render.pathtracer import tile_swizzle
    from idkengine_tpu.scene.procedural import atrium
    from idkengine_tpu.scene.scene_db import SceneDatabase

    w, h = 1920, 1080
    rows = int(os.environ.get("IDK_ROWS", 32))
    db = SceneDatabase(BuildSettings(
        max_leaf_triangle_count=int(os.environ.get("IDK_MAX_LEAF", 12)),
        traversal_cost=4.0, presplit_factor=0.0))
    db.add_model(atrium(110_000))
    db.build()
    ps = db.packet_scene
    cam = Camera(position=np.array([0, 3, 24], np.float32), yaw=-90.0, fov_y=65.0)
    swz = jnp.asarray(tile_swizzle(w, h))
    o, d = generate_rays(cam.ray_params(w, h), w, h, jnp.zeros(2), px=swz)
    tm = jnp.full((w * h,), 3.4e38, jnp.float32)

    def stats(name, o_, d_, tm_):
        hit, iters = jax.jit(
            lambda o, d, t: _pallas_trace(ps, o, d, t, False, False,
                                          rows=rows, debug_iters=True)
        )(o_, d_, tm_)
        raw = np.asarray(iters)[:: rows * 128].astype(np.int64)
        it = raw & 0xFFFF
        lf = raw >> 16
        print(f"{name}: packets={it.shape[0]} iters mean={it.mean():.1f} "
              f"(leaf {lf.mean():.1f}) p50={np.percentile(it, 50):.0f} "
              f"p90={np.percentile(it, 90):.0f} max={it.max()} "
              f"total={it.sum()} leaf_total={lf.sum()}")
        return hit

    def stats_any(name, o_, d_, tm_):
        res = jax.jit(
            lambda o, d, t: _pallas_trace(ps, o, d, t, True, False,
                                          rows=rows, debug_iters=True)
        )(o_, d_, tm_)
        raw = np.asarray(res[1])[:: rows * 128].astype(np.int64)
        it = raw & 0xFFFF
        lf = raw >> 16
        print(f"{name}: iters mean={it.mean():.1f} (leaf {lf.mean():.1f}) "
              f"total={it.sum()}")

    hit = stats("primary", o, d, tm)

    # bounce rays: cosine hemisphere around geometric normal
    sc = db.device_scene
    slot = jnp.maximum(hit.slot, 0)
    gn = sc.tri_gn[slot]
    flip = jnp.sum(gn * d, axis=-1) > 0.0
    gn = jnp.where(flip[..., None], -gn, gn)
    hp = o + d * hit.t[:, None]
    key = jax.random.PRNGKey(1)
    u2 = jax.random.uniform(key, (w * h, 2))
    r_ = jnp.sqrt(u2[:, 0])
    phi = 2 * jnp.pi * u2[:, 1]
    t1 = jnp.where(jnp.abs(gn[:, 0:1]) > 0.9, jnp.array([[0.0, 1.0, 0.0]]),
                   jnp.array([[1.0, 0.0, 0.0]]))
    tx = jnp.cross(gn, t1)
    tx = tx / jnp.linalg.norm(tx, axis=-1, keepdims=True)
    ty = jnp.cross(gn, tx)
    d2 = (tx * (r_ * jnp.cos(phi))[:, None] + ty * (r_ * jnp.sin(phi))[:, None]
          + gn * jnp.sqrt(1 - u2[:, 0])[:, None])
    o2 = hp + gn * 1e-3
    alive = hit.slot >= 0
    tm2 = jnp.where(alive, jnp.float32(3.4e38), -1.0)

    lo = sc.node_min[0]
    ext = sc.node_max[0] - sc.node_min[0]
    oct_ = ((d2[:, 0] >= 0) * 1 + (d2[:, 1] >= 0) * 2
            + (d2[:, 2] >= 0) * 4).astype(jnp.int32)

    def spread(v, bits):
        # interleave: spread `bits` bits with 2-bit gaps
        v = v.astype(jnp.int32)
        if bits > 8:
            v = (v | (v << 16)) & 0x030000FF
        v = (v | (v << 8)) & 0x0300F00F
        v = (v | (v << 4)) & 0x030C30C3
        v = (v | (v << 2)) & 0x09249249
        return v

    def keys(mode, nbits):
        n = 1 << nbits
        q = jnp.clip((o2 - lo) / jnp.maximum(ext, 1e-6) * n, 0, n - 1).astype(jnp.int32)
        if mode == "raster":
            cell = (q[:, 0] << (2 * nbits)) | (q[:, 1] << nbits) | q[:, 2]
        else:
            cell = (spread(q[:, 0], nbits) << 2) | (spread(q[:, 1], nbits) << 1) | spread(q[:, 2], nbits)
        return jnp.where(alive, (oct_ << (3 * nbits)) | cell, jnp.int32(0x7FFFFFFF))

    perm = jnp.argsort(keys("morton", 7))
    o2s, d2s, tm2s = o2[perm], d2[perm], tm2[perm]
    stats("bounce morton7+oct", o2s, d2s, tm2s)

    # capped-t two-pass: short rays prune far subtrees; misses retrace full
    diag = float(jnp.linalg.norm(ext))
    for frac in (0.05, 0.15, 0.3):
        cap = frac * diag
        h1 = stats(f"bounce cap={frac:.2f}diag",
                   o2s, d2s, jnp.where(tm2s > 0, jnp.float32(cap), -1.0))
        missed = (h1.slot < 0) & (tm2s > 0)
        n_miss = int(jnp.sum(missed))
        # compact misses to the front (sort by miss flag desc)
        mperm = jnp.argsort(~missed)
        tm3 = jnp.where(missed[mperm], jnp.float32(3.4e38), -1.0)
        h2 = stats(f"  miss retrace ({n_miss} rays, {100*n_miss/(w*h):.0f}%)",
                   o2s[mperm], d2s[mperm], tm3)

    # ---- NEE shadow rays from BOUNCE hit points: forward vs reversed ----
    h2 = jax.jit(lambda o, d, t: _pallas_trace(ps, o, d, t, False, False,
                                               rows=rows))(o2s, d2s, tm2s)
    hp2 = o2s + d2s * h2.t[:, None]
    alive2 = h2.slot >= 0
    lpos = jnp.array([0.0, 10.5, 0.0])
    ld = lpos[None, :] - hp2
    ldist = jnp.linalg.norm(ld, axis=-1)
    ldn = ld / jnp.maximum(ldist[:, None], 1e-9)
    so = hp2 + ldn * 1e-3
    stm = jnp.where(alive2, ldist - 2e-3, -1.0)
    # sort by landing cell
    n = 1 << 7
    q = jnp.clip((hp2 - lo) / jnp.maximum(ext, 1e-6) * n, 0, n - 1).astype(jnp.int32)
    cellh = (spread(q[:, 0], 7) << 2) | (spread(q[:, 1], 7) << 1) | spread(q[:, 2], 7)
    kk = jnp.where(alive2, cellh, jnp.int32(0x7FFFFFFF))
    p2 = jnp.argsort(kk)
    stats_any("shadow fwd sorted", so[p2], ldn[p2], stm[p2])
    # reversed: origin at light, direction toward surface
    ro = jnp.broadcast_to(lpos, so.shape)
    stats_any("shadow rev sorted", ro[p2], (-ldn)[p2], stm[p2])

    # no-octant key (origin-only morton) with cap
    n = 1 << 7
    q = jnp.clip((o2 - lo) / jnp.maximum(ext, 1e-6) * n, 0, n - 1).astype(jnp.int32)
    cell = (spread(q[:, 0], 7) << 2) | (spread(q[:, 1], 7) << 1) | spread(q[:, 2], 7)
    k2 = jnp.where(alive, cell, jnp.int32(0x7FFFFFFF))
    perm2 = jnp.argsort(k2)
    cap = 0.15 * diag
    stats("bounce morton-only cap=.15", o2[perm2], d2[perm2],
          jnp.where(tm2[perm2] > 0, jnp.float32(cap), -1.0))


if __name__ == "__main__":
    main()
