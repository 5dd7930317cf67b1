#!/usr/bin/env python
"""Per-op device timing of the rebin layout prologue at bench scale.

Round-5 motivation: with rebin on, the 2.8M 1080p frame's device profile
showed xla_glue 2646 ms of a 4000 ms frame — the (segment, ray) pair
layout (argsort + inverse-permutation scatter + searchsorted + gathers),
not the trace kernel, became the frame. This isolates each stage so the
dominant op is measured, not guessed.

Env: IDK_RAYS (default 2073600), IDK_TRIS (default 2.8M), IDK_REBIN_K.
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def timed(name, fn, *args, n=3):
    import jax
    fn = jax.jit(fn)
    out = jax.block_until_ready(fn(*args))  # compile
    t0 = time.time()
    for _ in range(n):
        out = jax.block_until_ready(fn(*args))
    dt = (time.time() - t0) / n * 1000
    print(f"{name:34s} {dt:8.1f} ms", flush=True)
    return out


def main():
    import jax
    import jax.numpy as jnp

    from idkengine_tpu.bvh.builder import BuildSettings
    from idkengine_tpu.ops import packet_trace as PT
    from idkengine_tpu.scene.procedural import atrium
    from idkengine_tpu.scene.scene_db import SceneDatabase

    R = int(os.environ.get("IDK_RAYS", 2073600))
    tris = int(os.environ.get("IDK_TRIS", 2_800_000))
    K = PT.REBIN_K
    rows = PT.BOUNCE_ROWS
    packet = rows * 128

    db = SceneDatabase(BuildSettings(
        max_leaf_triangle_count=12, traversal_cost=4.0, presplit_factor=0.0))
    db.add_model(atrium(tris))
    db.build()
    ws = db.wave_set()
    S = len(ws.segs)
    print(f"R={R} S={S} K={K} packet={packet}", flush=True)

    r = np.random.RandomState(0)
    o = jnp.asarray(r.uniform(-30, 30, size=(R, 3)).astype(np.float32))
    d = r.normal(size=(R, 3)).astype(np.float32)
    d = jnp.asarray(d / np.linalg.norm(d, axis=1, keepdims=True))
    tm = jnp.full((R,), 3.4e38, jnp.float32)

    # stage 1: K nearest segment boxes per ray
    ids_cnt = timed("nearest_segments", lambda o, d, tm: PT._nearest_segments(
        o, d, tm, ws.seg_min, ws.seg_max, K, want_count=True), o, d, tm)
    ids, _ts, cnt = ids_cnt
    seg = jnp.stack(ids[:K], axis=1)
    P = R * K
    seg_flat = seg.reshape(P)

    # stage 2: the argsort of P segment ids
    perm = timed("argsort(seg_flat) P=%.1fM" % (P / 1e6),
                 lambda x: jnp.argsort(x, stable=True), seg_flat)

    # stage 3: counts/base/start + searchsorted over n_slots
    n_slots = (min(int(PT.REBIN_BUDGET * R) + S * packet, P + S * packet)
               + packet - 1) // packet * packet

    def stage3(seg_flat):
        counts = jnp.bincount(seg_flat, length=S)
        aligned = ((counts + packet - 1) // packet) * packet
        base = jnp.concatenate(
            [jnp.zeros(1, aligned.dtype), jnp.cumsum(aligned)])[:S]
        j = jnp.arange(n_slots, dtype=jnp.int32)
        seg_of = (jnp.searchsorted(base, j, side="right") - 1).astype(jnp.int32)
        return seg_of

    timed("bincount+searchsorted n_slots=%.1fM" % (n_slots / 1e6),
          stage3, seg_flat)

    # stage 4: inverse permutation via scatter (current implementation)
    timed("inv: scatter .at[perm].set",
          lambda p: jnp.zeros(P, jnp.int32).at[p].set(
              jnp.arange(P, dtype=jnp.int32)), perm)

    # stage 4b: inverse permutation via a second sort
    timed("inv: argsort(perm)", lambda p: jnp.argsort(p), perm)

    # stage 4c: inverse via sort with payload (lax.sort pair)
    def inv_sortpair(p):
        import jax.lax as lax
        _, invv = lax.sort((p, jnp.arange(P, dtype=jnp.int32)), num_keys=1)
        return invv
    timed("inv: lax.sort pair", inv_sortpair, perm)

    # stage 5: the slot gathers (o_s/d_s/t_s at n_slots)
    slot_pair = jnp.minimum(jnp.arange(n_slots, dtype=jnp.int32), P - 1)

    def stage5(o, d, tm, slot_pair):
        ray_of = jnp.maximum(slot_pair, 0) // K
        return o[ray_of], d[ray_of], tm[ray_of]
    timed("slot gathers o/d/t", stage5, o, d, tm, slot_pair)

    # stage 6: merge gathers (R,K) from n_slots arrays
    hT = jnp.ones((n_slots,), jnp.float32)
    hS = jnp.ones((n_slots,), jnp.int32)
    ps = jnp.minimum(
        jnp.arange(P, dtype=jnp.int32).reshape(R, K), n_slots - 1)

    def stage6(hT, hS, ps):
        t_p = hT[ps]
        s_p = hS[ps]
        kb = jnp.argmin(jnp.where(s_p >= 0, t_p, jnp.inf), axis=1)[:, None]
        return jnp.take_along_axis(t_p, kb, axis=1)[:, 0]
    timed("merge gathers+argmin (R,K)", stage6, hT, hS, ps)

    # ---- packed-row alternatives (VXGI lore: one wide row-gather pays the
    # ~26 ns/index latency once for all columns) --------------------------

    # 5b: pack (R,8) then ONE row gather at n_slots
    def stage5b(o, d, tm, slot_pair):
        ray_of = jnp.maximum(slot_pair, 0) // K
        packed = jnp.concatenate([o, d, tm[:, None],
                                  jnp.zeros_like(tm)[:, None]], axis=1)
        return packed[ray_of]
    timed("5b: packed (R,8) row gather", stage5b, o, d, tm, slot_pair)

    # 6b: pack hits (n_slots,4) then ONE row gather at (R,K)
    hU = jnp.ones((n_slots,), jnp.float32)
    hV = jnp.ones((n_slots,), jnp.float32)

    def stage6b(hT, hS, hU, hV, ps):
        packed = jnp.stack([hT, hS.view(jnp.float32) if hasattr(hS, "view")
                            else hS.astype(jnp.float32), hU, hV], axis=1)
        g = packed[ps]  # (R, K, 4)
        t_p = g[..., 0]
        s_p = g[..., 1]
        kb = jnp.argmin(jnp.where(s_p >= 0, t_p, jnp.inf), axis=1)[:, None]
        return jnp.take_along_axis(t_p, kb, axis=1)[:, 0]
    timed("6b: packed (n_slots,4) row gather", stage6b, hT, hS, hU, hV, ps)

    # 3b: seg_of via broadcast compare-sum instead of searchsorted
    base_t = jnp.cumsum(jnp.full((S,), n_slots // S, jnp.int32)) - (
        n_slots // S)

    def stage3b(base):
        j = jnp.arange(n_slots, dtype=jnp.int32)
        return jnp.sum(j[:, None] >= base[None, :], axis=1).astype(
            jnp.int32) - 1
    timed("3b: seg_of compare-sum", stage3b, base_t)

    # 2b: 2-operand stable sort (keys + pair ids) replacing argsort
    def stage2b(x):
        import jax.lax as lax
        sk, pid = lax.sort((x, jnp.arange(P, dtype=jnp.int32)), num_keys=1)
        return sk, pid
    timed("2b: lax.sort (key,pair)", stage2b, seg_flat)

    # 2c: multi-operand sort carrying all 8 ray columns
    def stage2c(x, o, d, tm):
        import jax.lax as lax
        oo = jnp.broadcast_to(o[:, None, :], (R, K, 3)).reshape(P, 3)
        dd = jnp.broadcast_to(d[:, None, :], (R, K, 3)).reshape(P, 3)
        tt = jnp.broadcast_to(tm[:, None], (R, K)).reshape(P)
        out = lax.sort((x, jnp.arange(P, dtype=jnp.int32),
                        oo[:, 0], oo[:, 1], oo[:, 2],
                        dd[:, 0], dd[:, 1], dd[:, 2], tt), num_keys=1)
        return out[1]
    timed("2c: lax.sort 9-operand", stage2c, seg_flat, o, d, tm)

    # element gather perm[q] at n_slots (slot_pair materialization)
    qq = jnp.minimum(jnp.arange(n_slots, dtype=jnp.int32), P - 1)
    timed("perm[q] element gather", lambda p, q: p[q], perm, qq)

    # full layout for reference
    timed("FULL _rebin_layout", lambda o, d, tm: PT._rebin_layout(
        o, d, tm, ws.seg_min, ws.seg_max, packet, K), o, d, tm)


if __name__ == "__main__":
    main()
