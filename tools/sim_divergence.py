#!/usr/bin/env python
"""CPU simulation: BVH node visits per ray for packet (shared-stack) traversal
at different packet sizes, on real primary + bounce-1 ray distributions.

Decides whether a per-row multi-stack kernel is worth building: if the
128-ray union is close to the 4096-ray union, divergence isn't the problem.
"""
import os
import sys
import time

import numpy as np


def packet_visits(nodes_min, nodes_max, first, count, o, d, group):
    """Total node visits for shared-stack traversal with `group`-ray packets.
    No t-pruning (upper bound, same for all sizes). Returns visits/ray."""
    n_rays = o.shape[0]
    inv = 1.0 / np.where(np.abs(d) < 1e-12, 1e-12, d)
    total = 0
    for g0 in range(0, n_rays, group):
        sel = slice(g0, min(g0 + group, n_rays))
        og, ig = o[sel], inv[sel]
        stack = [0]
        while stack:
            ni = stack.pop()
            t0 = (nodes_min[ni] - og) * ig
            t1 = (nodes_max[ni] - og) * ig
            tn = np.minimum(t0, t1).max(1)
            tf = np.maximum(t0, t1).min(1)
            hit = (tf >= np.maximum(tn, 0.0))
            total += 1
            if not hit.any():
                continue
            if count[ni] == 0:
                stack.append(first[ni])
                stack.append(first[ni] + 1)
    return total


def main():
    sys.path.insert(0, "/root/repo")
    os.environ["PALLAS_AXON_POOL_IPS"] = ""
    os.environ["JAX_PLATFORMS"] = "cpu"
    import jax.numpy as jnp

    from idkengine_tpu.bvh.builder import BLAS, BuildSettings
    from idkengine_tpu.render.camera import Camera, generate_rays
    from idkengine_tpu.render.pathtracer import tile_swizzle
    from idkengine_tpu.scene.procedural import atrium

    w, h = 256, 128  # 32768 rays (this box has one CPU core)
    m = atrium(110_000)
    # merge all prims
    vs, fs, off = [], [], 0
    for p in m.primitives:
        vs.append(p.positions)
        fs.append(p.indices + off)
        off += p.positions.shape[0]
    verts = np.concatenate(vs)
    faces = np.concatenate(fs)
    b = BLAS(verts, faces, BuildSettings(max_leaf_triangle_count=12,
                                         traversal_cost=4.0, presplit_factor=0.0))
    nodes = b.nodes
    nmin = nodes["min"].astype(np.float64)
    nmax = nodes["max"].astype(np.float64)
    first = nodes["left_or_first"].astype(np.int64)
    count = nodes["count"].astype(np.int64)

    cam = Camera(position=np.array([0, 3, 24], np.float32), yaw=-90.0, fov_y=65.0)
    swz = jnp.asarray(tile_swizzle(w, h, 64, 64))
    o, d = generate_rays(cam.ray_params(w, h), w, h, jnp.zeros(2), px=swz)
    o = np.asarray(o, np.float64)
    d = np.asarray(d, np.float64)

    # primary hits via CPU BLAS traversal on a SUBSET for speed
    n = w * h
    rng = np.random.RandomState(0)
    # crude bounce generation: intersect each ray (C++ core), then random
    # cosine direction around the geometric normal
    hp = np.zeros_like(o)
    nrm = np.zeros_like(o)
    alive = np.zeros(n, bool)
    t0 = time.time()
    for i in range(n):
        r = b.intersect_ray(o[i].astype(np.float32), d[i].astype(np.float32))
        if r is None:
            continue
        t, u, v, tri = r
        hp[i] = o[i] + d[i] * t
        a, bb, c = verts[faces[tri]]
        gn = np.cross(bb - a, c - a)
        gn /= max(np.linalg.norm(gn), 1e-12)
        if np.dot(gn, d[i]) > 0:
            gn = -gn
        nrm[i] = gn
        alive[i] = True
    print(f"primary CPU hits: {alive.mean():.3f} in {time.time()-t0:.0f}s")

    # cosine hemisphere bounce
    u1, u2 = rng.rand(n), rng.rand(n)
    rr = np.sqrt(u1)
    phi = 2 * np.pi * u2
    t_ = np.where(np.abs(nrm[:, 0:1]) < 0.9, np.array([[1.0, 0, 0]]),
                  np.array([[0, 1.0, 0]]))
    tx = np.cross(nrm, t_)
    tx /= np.maximum(np.linalg.norm(tx, axis=1, keepdims=True), 1e-12)
    ty = np.cross(nrm, tx)
    bd = (tx * (rr * np.cos(phi))[:, None] + ty * (rr * np.sin(phi))[:, None]
          + nrm * np.sqrt(np.maximum(1 - u1, 0))[:, None])
    bo = hp + nrm * 1e-3

    # sort bounce rays like the tracer does
    oct_ = (bd[:, 0] >= 0) * 1 + (bd[:, 1] >= 0) * 2 + (bd[:, 2] >= 0) * 4
    lo = verts.min(0)
    ext = verts.max(0) - lo + 1e-6
    q = np.clip((bo - lo) / ext * 32, 0, 31).astype(np.int64)
    key = (oct_.astype(np.int64) << 15) | (q[:, 0] << 10) | (q[:, 1] << 5) | q[:, 2]
    key[~alive] = 1 << 40
    perm = np.argsort(key, kind="stable")
    bo, bd, alv = bo[perm], bd[perm], alive[perm]
    # drop dead rays (they're free in the kernel)
    bo, bd = bo[alv], bd[alv]

    for group in (128, 512, 1024, 4096):
        for name, oo, dd in (("primary", o, d), ("bounce", bo, bd)):
            t0 = time.time()
            vis = packet_visits(nmin, nmax, first, count, oo, dd, group)
            print(f"{name} group={group}: {vis} node visits "
                  f"({vis/ (len(oo)/group):.0f}/packet, {time.time()-t0:.0f}s)")


if __name__ == "__main__":
    main()


def per_group_visits(nodes_min, nodes_max, first, count, o, d, group):
    """Visits per group (list), for lockstep-imbalance analysis."""
    n_rays = o.shape[0]
    inv = 1.0 / np.where(np.abs(d) < 1e-12, 1e-12, d)
    out = []
    for g0 in range(0, n_rays, group):
        sel = slice(g0, min(g0 + group, n_rays))
        og, ig = o[sel], inv[sel]
        stack = [0]
        tot = 0
        while stack:
            ni = stack.pop()
            t0 = (nodes_min[ni] - og) * ig
            t1 = (nodes_max[ni] - og) * ig
            tn = np.minimum(t0, t1).max(1)
            tf = np.maximum(t0, t1).min(1)
            hit = (tf >= np.maximum(tn, 0.0))
            tot += 1
            if not hit.any():
                continue
            if count[ni] == 0:
                stack.append(first[ni])
                stack.append(first[ni] + 1)
        out.append(tot)
    return np.array(out)
