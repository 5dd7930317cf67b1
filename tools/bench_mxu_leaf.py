#!/usr/bin/env python
"""Feasibility: leaf triangle tests as an MXU bilinear form.

Möller-Trumbore for ray (o,d) vs tri (p0,e1,e2) reduces to FOUR bilinear
forms between a 10-vector of ray features and per-triangle 10-vectors:

  ray features f = [d(3), o(3), o x d(3), 1]
  det   = f . [-n, 0, 0, 0]             n = e1 x e2
  u*det = f . [-(e2 x p0), 0, e2, 0]
  v*det = f . [-(p0 x e1), 0, -e1, 0]
  t*det = f . [0, n, 0, -p0.n]

so ONE dot_general (R,10)@(10, 4*T) evaluates a whole T-triangle leaf,
and the VPU only does sign/range checks + a per-ray lane reduction:

  hit iff sign(udet)==sign(det) & sign(vdet)==sign(det)
        & sign(det-udet-vdet)==sign(det) & 0 < tdet/det < t_best

This bench measures, per (ray,tri) pair on the real chip:
  a) vpu_moller  — the packet kernel's current full Möller on the VPU
  b) mxu_form    — dot_general + sign checks + lane-argmin
both as standalone Pallas kernels over synthetic VMEM-resident data
(no traversal, no DMA): the numbers bound what a leaf visit can cost.

Env: IDK_MXU_R (rays, def 4096 = one 32x128 packet), IDK_MXU_T (tris per
leaf row, def 32), IDK_MXU_VISITS (leaf visits per kernel, def 256),
IDK_BENCH_REPS.
"""
import os
import sys
import time

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR",
                      os.path.join(os.path.dirname(os.path.abspath(__file__)),
                                   "..", ".jax_cache"))
sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np


def main():
    import jax
    import jax.numpy as jnp
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    R = int(os.environ.get("IDK_MXU_R", 4096))
    T = int(os.environ.get("IDK_MXU_T", 32))
    V = int(os.environ.get("IDK_MXU_VISITS", 256))
    reps = int(os.environ.get("IDK_BENCH_REPS", 20))
    rows = R // 128
    assert rows * 128 == R and T <= 32

    rng = np.random.default_rng(0)
    o_np = rng.uniform(-1, 1, (R, 3)).astype(np.float32)
    d_np = rng.standard_normal((R, 3)).astype(np.float32)
    d_np /= np.linalg.norm(d_np, axis=-1, keepdims=True)

    # V leaves of T triangles near the origin
    p0 = rng.uniform(-1, 1, (V, T, 3)).astype(np.float32)
    e1 = rng.uniform(-0.5, 0.5, (V, T, 3)).astype(np.float32)
    e2 = rng.uniform(-0.5, 0.5, (V, T, 3)).astype(np.float32)

    # --- current-style leaf rows: nrow9 x 128-lane rows per leaf holding
    # T*(p0,e1,e2) 9 floats; 14 tris per row so every tri's 9 lanes stay
    # inside one 128-lane tile (static lane offsets, like the real kernel)
    TPR = 14
    nrow9 = (T + TPR - 1) // TPR
    leaf9 = np.zeros((V * nrow9, 128), np.float32)
    tri = np.concatenate([p0, e1, e2], axis=-1)  # (V,T,9)
    for r in range(nrow9):
        sub = tri[:, r * TPR:(r + 1) * TPR].reshape(V, -1)
        leaf9[r::nrow9, : sub.shape[1]] = sub

    # --- MXU feature rows: (V, 10*8=80 sublanes? no): (V, 10, 128) lanes =
    # 4 forms x T tris interleaved as [det(T) | udet(T) | vdet(T) | tdet(T)]
    n = np.cross(e1, e2)
    g = np.zeros((V, 10, 4 * T), np.float32)
    g[:, 0:3, 0 * T:1 * T] = -np.swapaxes(n, 1, 2)
    g[:, 0:3, 1 * T:2 * T] = -np.swapaxes(np.cross(e2, p0), 1, 2)
    g[:, 6:9, 1 * T:2 * T] = np.swapaxes(e2, 1, 2)
    g[:, 0:3, 2 * T:3 * T] = -np.swapaxes(np.cross(p0, e1), 1, 2)
    g[:, 6:9, 2 * T:3 * T] = -np.swapaxes(e1, 1, 2)
    g[:, 3:6, 3 * T:4 * T] = np.swapaxes(n, 1, 2)
    g[:, 9, 3 * T:4 * T] = -np.sum(p0 * n, axis=-1)
    gfeat = np.zeros((V, 10, 128), np.float32)
    gfeat[:, :, : 4 * T] = g

    ox, oy, oz = (o_np[:, i].reshape(rows, 128) for i in range(3))
    dx, dy, dz = (d_np[:, i].reshape(rows, 128) for i in range(3))

    def kernel_vpu(leaf_ref, ox_ref, oy_ref, oz_ref, dx_ref, dy_ref, dz_ref,
                   out_ref):
        oxr, oyr, ozr = ox_ref[:], oy_ref[:], oz_ref[:]
        dxr, dyr, dzr = dx_ref[:], dy_ref[:], dz_ref[:]
        t_best = jnp.full((rows, 128), 1e30, jnp.float32)
        slot = jnp.full((rows, 128), -1, jnp.int32)

        def visit(vi, c):
            t_best, slot = c
            for kk in range(T):
                row = vi * nrow9 + kk // TPR
                b = (kk % TPR) * 9
                sl = lambda j: leaf_ref[row, b + j]
                p0x, p0y, p0z = sl(0), sl(1), sl(2)
                e1x, e1y, e1z = sl(3), sl(4), sl(5)
                e2x, e2y, e2z = sl(6), sl(7), sl(8)
                pvx = dyr * e2z - dzr * e2y
                pvy = dzr * e2x - dxr * e2z
                pvz = dxr * e2y - dyr * e2x
                det = e1x * pvx + e1y * pvy + e1z * pvz
                inv_det = jnp.where(jnp.abs(det) > 1e-12, 1.0 / det, 0.0)
                sx, sy, sz = oxr - p0x, oyr - p0y, ozr - p0z
                uu = (sx * pvx + sy * pvy + sz * pvz) * inv_det
                qx = sy * e1z - sz * e1y
                qy = sz * e1x - sx * e1z
                qz = sx * e1y - sy * e1x
                vv = (dxr * qx + dyr * qy + dzr * qz) * inv_det
                tt = (e2x * qx + e2y * qy + e2z * qz) * inv_det
                ok = ((uu >= 0.0) & (uu <= 1.0) & (vv >= 0.0)
                      & (uu + vv <= 1.0) & (tt > 0.0) & (tt < t_best))
                t_best = jnp.where(ok, tt, t_best)
                slot = jnp.where(ok, vi * T + kk, slot)
            return t_best, slot

        t_best, slot = jax.lax.fori_loop(0, V, visit, (t_best, slot))
        out_ref[:] = t_best + slot.astype(jnp.float32)

    def kernel_mxu(feat_ref, ox_ref, oy_ref, oz_ref, dx_ref, dy_ref, dz_ref,
                   out_ref):
        oxr, oyr, ozr = ox_ref[:], oy_ref[:], oz_ref[:]
        dxr, dyr, dzr = dx_ref[:], dy_ref[:], dz_ref[:]
        cxr = oyr * dzr - ozr * dyr
        cyr = ozr * dxr - oxr * dzr
        czr = oxr * dyr - oyr * dxr
        one = jnp.ones((rows, 128), jnp.float32)
        # (R,10) ray features — assembled once per kernel
        f = jnp.stack([dxr, dyr, dzr, oxr, oyr, ozr, cxr, cyr, czr, one],
                      axis=-1).reshape(rows * 128, 10)
        t_best = jnp.full((rows * 128, 1), 1e30, jnp.float32)
        slot = jnp.full((rows * 128, 1), -1, jnp.int32)
        lane = jax.lax.broadcasted_iota(jnp.int32, (rows * 128, T), 1)

        def visit(vi, c):
            t_best, slot = c
            gmat = feat_ref[vi]  # (10,128)
            out = jax.lax.dot_general(
                f, gmat, (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32)  # (R,128)
            det = jax.lax.slice(out, (0, 0), (rows * 128, T))
            udet = jax.lax.slice(out, (0, T), (rows * 128, 2 * T))
            vdet = jax.lax.slice(out, (0, 2 * T), (rows * 128, 3 * T))
            tdet = jax.lax.slice(out, (0, 3 * T), (rows * 128, 4 * T))
            pos = det > 0.0
            ok = (((udet > 0.0) == pos) & ((vdet > 0.0) == pos)
                  & ((udet + vdet < det) == pos)
                  & ((tdet > 0.0) == pos)
                  & (jnp.abs(det) > 1e-12))
            tt = jnp.where(ok, tdet / jnp.where(ok, det, 1.0), 1e30)
            # per-ray argmin over the T lanes
            tmin = jnp.min(tt, axis=1, keepdims=True)
            kmin = jnp.min(jnp.where(tt <= tmin, lane, T), axis=1,
                           keepdims=True)
            better = tmin < t_best
            t_best = jnp.where(better, tmin, t_best)
            slot = jnp.where(better, vi * T + kmin, slot)
            return t_best, slot

        t_best, slot = jax.lax.fori_loop(0, V, visit, (t_best, slot))
        out_ref[:] = (t_best + slot.astype(jnp.float32)).reshape(rows, 128)

    vspec = pl.BlockSpec(memory_space=pltpu.VMEM)

    def run(kernel, tbl):
        return pl.pallas_call(
            kernel,
            in_specs=[vspec] * 7,
            out_specs=vspec,
            out_shape=jax.ShapeDtypeStruct((rows, 128), jnp.float32),
            compiler_params=pltpu.CompilerParams(
                vmem_limit_bytes=100 * 1024 * 1024),
        )(tbl, ox, oy, oz, dx, dy, dz)

    def timed(fn, *args):
        f = jax.jit(lambda salt, *a: fn(*a) + salt)
        _ = jax.block_until_ready(f(jnp.float32(0), *args))
        import collections
        import glob
        import gzip
        import json
        path = "/tmp/jt_mxu"
        with jax.profiler.trace(path):
            _ = jax.block_until_ready(f(jnp.float32(1), *args))
        with gzip.open(sorted(glob.glob(
                path + "/plugins/profile/*/*.trace.json.gz"))[-1]) as fh:
            tr = json.load(fh)
        meta = {e.get('pid'): e.get('args', {}).get('name', '')
                for e in tr['traceEvents']
                if e.get('ph') == 'M' and e.get('name') == 'process_name'}
        dev = [p for p, nm in meta.items() if 'TPU' in str(nm)]
        tot = 0.0
        for e in tr['traceEvents']:
            if (e.get('ph') == 'X' and e.get('pid') in dev
                    and not e['name'].startswith('jit_')):
                tot += e.get('dur', 0) / 1000.0
        return tot

    pairs = R * T * V
    for name, kern, tbl in [
        ("vpu_moller", kernel_vpu, jnp.asarray(leaf9)),
        ("mxu_form  ", kernel_mxu, jnp.asarray(gfeat)),
    ]:
        ms = timed(lambda t: run(kern, t), tbl)
        cyc = ms * 1e-3 * 940e6
        print(f"{name} R={R} T={T} V={V}: {ms:7.3f} ms  "
              f"{pairs / (ms * 1e-3) / 1e9:7.2f} Gpairs/s  "
              f"{cyc / (T * V):6.1f} cyc/tri-visit", flush=True)

    # cross-check agreement on hits
    a = np.asarray(run(kernel_vpu, jnp.asarray(leaf9)))
    b = np.asarray(run(kernel_mxu, jnp.asarray(gfeat)))
    close = np.isclose(a, b, rtol=1e-3, atol=1e-2)
    print(f"agreement: {close.mean():.4f} (MXU f32 rounding differs on "
          f"edge-grazing pairs)", flush=True)


if __name__ == "__main__":
    main()
