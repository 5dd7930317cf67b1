"""Two-phase BVH traversal: interior-only phase A records per-ray leaf
lists; phase B tests (ray, leaf) pairs densely in XLA.

WHY (measured, BENCH_NOTES.md): the one-phase packet kernel is
VPU-throughput-bound on leaf triangle tests — every leaf visit runs the
full Möller loop over the whole (rows,128) packet even though only a few
rays wanted that leaf, and the shared-stack union means leaf visits are
~60% of all pops. Splitting the work makes the triangle tests scale with
USEFUL (ray, leaf) pairs instead of packet width:

  phase A (Pallas): the BVH8 traversal pops ONLY interior nodes. A leaf
    child is never pushed — at the parent visit the per-ray child-box hit
    mask appends the leaf's row id into that ray's D-slot list (a VMEM
    read-modify-write per list slot, ~200 cycles per taken leaf child vs
    ~2k cycles of packet-wide Möller). No leaf geometry in VMEM at all,
    which also makes steered segments ~4x bigger.
  phase B (XLA): gather the recorded leaf rows (row gathers run at
    ~353 Mrows/s on v5e regardless of index order), transpose to SoA, and
    run the 12-triangle Möller test per pair with every lane useful;
    per-ray argmin over the D slots gives the closest hit.
  exactness: a ray whose list overflowed D slots falls back to the exact
    chained kernel, pruned by the (usually tight) phase-B t — overflow is
    the only case the one-phase kernel is still needed.

This is the reference's ray-sorting coherence strategy (counting-sort
reorder, Resource/Shaders/PathTracing/CountingSort/**) taken to its
TPU-native conclusion: instead of reordering rays so SIMT lanes agree,
reorder the WORK into dense (ray, leaf) pairs.
"""
from __future__ import annotations

import os
from functools import partial

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .trace import Hit
from . import packet_trace as pk
from .packet_trace import (
    LEAVES_PER_ROW, MAX_LEAF_PACKET, PACKET_ROWS, STACK_DEPTH, _build_steering,
    _merge_hits, _slab,
)

D_SLOTS = int(os.environ.get("IDK_TP_D", "8"))
TP_STEER_K = int(os.environ.get("IDK_TP_STEER_K", "12"))
# Co-traversing chains in phase A (same trick as packet_trace CHAINS):
# independent row-slices of the packet share each iteration's
# vector->scalar sync drain. Phase A has NO leaf tests — its loop is
# exactly the sync-bound case where chains measured ~linear wins
# (tools/bench_dual.py: 1100 cyc/visit at 1 chain, ~350 at 4).
TP_CHAINS = int(os.environ.get("IDK_TP_CHAINS", "1"))


# ---------------------------------------------------------------------------
# Phase A kernel
# ---------------------------------------------------------------------------

def _phase_a_body(rows, D, ox, oy, oz, ix, iy, iz, negs,
                  stack_ref, cnt_ref, list_refs, chains: int = 1):
    """Returns run_seg(pairs_ref, t_max, seg_base): one interior-only
    traversal of a (wide-layout) table, appending leaf-child row ids
    (+seg_base) to the per-ray lists. cnt_ref counts EVERY wanted leaf
    (beyond D too — the overflow signal).

    chains > 1 co-traverses independent row-slices of the packet in ONE
    while_loop (same rationale as packet_trace._build_run_seg): phase A is
    pure interior traversal, so every iteration is dominated by the
    vector->scalar sync drain that independent same-iteration chains
    share. Chain k owns ray rows [k*rc, (k+1)*rc), stack slots
    [k*STACK_DEPTH, ...), and the matching row-slices of cnt/lists."""
    assert rows % chains == 0, (rows, chains)
    rc = rows // chains

    def make_chain(k):
        s0 = k * rc
        csl = lambda a: jax.lax.slice(a, (s0, 0), (s0 + rc, 128))
        oxk, oyk, ozk = csl(ox), csl(oy), csl(oz)
        ixk, iyk, izk = csl(ix), csl(iy), csl(iz)
        if chains == 1:
            negsk = negs
        else:
            # per-chain dominant sign from the inverse directions (signs of
            # 1/d match d elementwise; this is only an ordering heuristic)
            negsk = (jnp.sum(ixk) < 0.0, jnp.sum(iyk) < 0.0,
                     jnp.sum(izk) < 0.0)
        soff = k * STACK_DEPTH

        def emit(h_i32, rowid):
            c = cnt_ref[s0:s0 + rc, :]
            for dd in range(D):
                sel = (c == dd) & (h_i32 > 0)
                list_refs[dd][s0:s0 + rc, :] = jnp.where(
                    sel, rowid, list_refs[dd][s0:s0 + rc, :])
            cnt_ref[s0:s0 + rc, :] = c + h_i32

        def visit(pairs_ref, t_maxk, sp):
            """Pop + test ONE interior node for this chain."""
            sp = sp - 1
            m0 = stack_ref[soff + sp]
            axis = m0 & 3
            wnode = m0 >> 2
            row = 1 + (wnode >> 1)

            def whalf(off):
                def inner(_):
                    sl = lambda j: pairs_ref[row, off + j]
                    hs, mets = [], []
                    for cc in range(8):
                        b = cc * 8
                        h, _tn = _slab(
                            oxk, oyk, ozk, ixk, iyk, izk,
                            sl(b), sl(b + 1), sl(b + 2),
                            sl(b + 3), sl(b + 4), sl(b + 5), t_maxk,
                        )
                        hs.append(h.astype(jnp.int32))
                        mets.append(sl(b + 6).astype(jnp.int32))
                        mets.append(sl(b + 7).astype(jnp.int32))
                    sums = [
                        jnp.sum(hs[2 * i] + (hs[2 * i + 1] << 16))
                        for i in range(4)
                    ]
                    return (*hs, *mets, *sums)

                return inner

            vals = jax.lax.switch(wnode & 1, [whalf(0), whalf(64)], None)
            hs = vals[:8]
            m0s = [vals[8 + 2 * cc] for cc in range(8)]
            m1s = [vals[8 + 2 * cc + 1] for cc in range(8)]
            ns = []
            for i in range(4):
                s_ = vals[24 + i]
                ns.append(s_ & 0xFFFF)
                ns.append(s_ >> 16)
            neg = jnp.where(axis == 0, negsk[0],
                            jnp.where(axis == 1, negsk[1], negsk[2]))
            # push INTERIOR children far-to-near (pop order = near-first);
            # LEAF children never enter the stack — their per-ray hit masks
            # append to the lists right here (near-to-far for better
            # truncation order when a list overflows)
            for kk in range(8):
                pm0 = jnp.where(neg, m0s[kk], m0s[7 - kk])
                pm1 = jnp.where(neg, m1s[kk], m1s[7 - kk])
                pn = jnp.where(neg, ns[kk], ns[7 - kk])
                do = (pn > 0) & (pm1 == 0)

                @pl.when(do)
                def _(pm0=pm0, sp=sp):
                    stack_ref[soff + sp] = pm0

                sp = sp + do.astype(jnp.int32)
            for kk in range(8):
                pm1 = jnp.where(neg, m1s[7 - kk], m1s[kk])
                pn = jnp.where(neg, ns[7 - kk], ns[kk])
                ph = jnp.where(neg, hs[7 - kk], hs[kk])

                @pl.when((pn > 0) & (pm1 != 0))
                def _(ph=ph, pm1=pm1):
                    emit(ph, seg_base_box[0] + (pm1 >> 4))

            return sp

        return csl, emit, visit

    # seg_base travels via a mutable cell so visit() can close over it
    # (run_seg may be called once per steered segment with different bases)
    seg_base_box = [jnp.int32(0)]
    chain_ctx = [make_chain(k) for k in range(chains)]

    def run_seg(pairs_ref, t_max, seg_base):
        seg_base_box[0] = seg_base
        rm0 = pairs_ref[0, 0].astype(jnp.int32)
        rm1 = pairs_ref[0, 1].astype(jnp.int32)
        rb = (pairs_ref[0, 2], pairs_ref[0, 3], pairs_ref[0, 4],
              pairs_ref[0, 5], pairs_ref[0, 6], pairs_ref[0, 7])
        sps, tmaxs = [], []
        for k, (csl, emit, _visit) in enumerate(chain_ctx):
            tmk = csl(t_max)
            tmaxs.append(tmk)
            oxk, oyk, ozk = csl(ox), csl(oy), csl(oz)
            ixk, iyk, izk = csl(ix), csl(iy), csl(iz)
            rhit, _ = _slab(oxk, oyk, ozk, ixk, iyk, izk, *rb, tmk)
            any_root = jnp.sum(rhit.astype(jnp.int32)) > 0

            @pl.when(any_root & (rm1 != 0))
            def _(emit=emit, rhit=rhit):
                # degenerate one-leaf (sub)tree: emit at the root
                emit(rhit.astype(jnp.int32), seg_base + (rm1 >> 4))

            stack_ref[k * STACK_DEPTH] = rm0
            sps.append(jnp.where(any_root & (rm1 == 0),
                                 jnp.int32(1), jnp.int32(0)))

        C = chains

        def cond(c):
            alive = c[0] > 0
            for k in range(1, C):
                alive = alive | (c[k] > 0)
            return alive

        def body(c):
            sps = list(c[:C])
            it = c[-1]
            for k in range(C):
                def do_visit(sp, k=k):
                    return chain_ctx[k][2](pairs_ref, tmaxs[k], sp)

                sps[k] = jax.lax.cond(
                    sps[k] > 0, do_visit, lambda sp: sp, sps[k])
            return (*sps, it + 1)

        res = jax.lax.while_loop(cond, body, (*sps, jnp.int32(0)))
        return res[-1]

    return run_seg


def _make_kernel_a(rows: int, D: int, chains: int = 1):
    def kernel(pairs_hbm,
               ox_ref, oy_ref, oz_ref, dx_ref, dy_ref, dz_ref, tmax_ref,
               cnt_ref, *rest):
        list_refs = list(rest[:D])
        pairs_ref, stack_ref, dma_sems = rest[D:]

        @pl.when(pl.program_id(0) == 0)
        def _():
            cp = pltpu.make_async_copy(pairs_hbm, pairs_ref, dma_sems.at[0])
            cp.start()
            cp.wait()

        ox, oy, oz = ox_ref[:], oy_ref[:], oz_ref[:]
        dx, dy, dz = dx_ref[:], dy_ref[:], dz_ref[:]
        t_max = tmax_ref[:]
        tiny = jnp.float32(1e-20)
        sgn = lambda v: jnp.where(v < 0, -tiny, tiny)
        ix = 1.0 / jnp.where(jnp.abs(dx) < tiny, sgn(dx), dx)
        iy = 1.0 / jnp.where(jnp.abs(dy) < tiny, sgn(dy), dy)
        iz = 1.0 / jnp.where(jnp.abs(dz) < tiny, sgn(dz), dz)
        negs = (jnp.sum(dx) < 0.0, jnp.sum(dy) < 0.0, jnp.sum(dz) < 0.0)

        cnt_ref[:] = jnp.zeros((rows, 128), jnp.int32)
        for dd in range(D):
            list_refs[dd][:] = jnp.full((rows, 128), -1, jnp.int32)
        run_seg = _phase_a_body(rows, D, ox, oy, oz, ix, iy, iz, negs,
                                stack_ref, cnt_ref, list_refs, chains=chains)
        run_seg(pairs_ref, t_max, jnp.int32(0))

    return kernel


def _make_kernel_a_steered(rows: int, D: int, K: int, PR: int, LS: int,
                           chains: int = 1):
    """Steered phase A: per-packet list of segment ids (scalar prefetch),
    double-buffered pairs-table DMA (NO leaf tables — that's the point),
    lists/counts accumulate across segments with global leaf rows."""

    def kernel(steer_ref,
               ox_ref, oy_ref, oz_ref, dx_ref, dy_ref, dz_ref, tmax_ref,
               pairs_hbm,
               cnt_ref, *rest):
        list_refs = list(rest[:D])
        pairs_buf, stack_ref, dma_sems = rest[D:]

        ox, oy, oz = ox_ref[:], oy_ref[:], oz_ref[:]
        dx, dy, dz = dx_ref[:], dy_ref[:], dz_ref[:]
        t_max = tmax_ref[:]
        tiny = jnp.float32(1e-20)
        sgn = lambda v: jnp.where(v < 0, -tiny, tiny)
        ix = 1.0 / jnp.where(jnp.abs(dx) < tiny, sgn(dx), dx)
        iy = 1.0 / jnp.where(jnp.abs(dy) < tiny, sgn(dy), dy)
        iz = 1.0 / jnp.where(jnp.abs(dz) < tiny, sgn(dz), dz)
        negs = (jnp.sum(dx) < 0.0, jnp.sum(dy) < 0.0, jnp.sum(dz) < 0.0)

        cnt_ref[:] = jnp.zeros((rows, 128), jnp.int32)
        for dd in range(D):
            list_refs[dd][:] = jnp.full((rows, 128), -1, jnp.int32)
        run_seg = _phase_a_body(rows, D, ox, oy, oz, ix, iy, iz, negs,
                                stack_ref, cnt_ref, list_refs, chains=chains)

        pid = pl.program_id(0)

        def start_dma(k, buf):
            st = steer_ref[pid, k]

            @pl.when(st >= 0)
            def _():
                pltpu.make_async_copy(
                    pairs_hbm.at[pl.ds(st * PR, PR)],
                    pairs_buf.at[buf], dma_sems.at[buf]).start()

        start_dma(0, 0)
        for k in range(K):
            st = steer_ref[pid, k]
            if k + 1 < K:
                start_dma(k + 1, (k + 1) % 2)

            @pl.when(st >= 0)
            def _(st=st, buf=k % 2):
                pltpu.make_async_copy(
                    pairs_hbm.at[pl.ds(st * PR, PR)],
                    pairs_buf.at[buf], dma_sems.at[buf]).wait()
                run_seg(pairs_buf.at[buf], t_max, st * LS)

    return kernel


def _pad_rays(o, d, t_max, packet):
    r = o.shape[0]
    pad = (-r) % packet
    if pad:
        o = jnp.concatenate([o, jnp.zeros((pad, 3), o.dtype)])
        d = jnp.concatenate([d, jnp.ones((pad, 3), d.dtype)])
        t_max = jnp.concatenate([t_max, jnp.full((pad,), -1.0, t_max.dtype)])
    return o, d, t_max, r, r + pad


def phase_a(ps, o, d, t_max, interpret=False, rows=PACKET_ROWS, D=D_SLOTS,
            chains=None):
    """Resident-table phase A. Returns (lists (R,D) i32 leaf rows | -1,
    cnt (R,) i32 total wanted leaves — cnt>D means the list overflowed)."""
    assert ps.wide and LEAVES_PER_ROW == 1, "two-phase needs wide tables"
    chains = TP_CHAINS if chains is None else chains
    if rows % max(chains, 1) != 0:
        chains = 1
    o, d, t_max, r, rp = _pad_rays(o, d, t_max, rows * 128)
    n_pk = rp // (rows * 128)
    shape8 = (n_pk * rows, 128)
    ray_spec = pl.BlockSpec((rows, 128), lambda i: (i, 0),
                            memory_space=pltpu.VMEM)
    outs = pl.pallas_call(
        _make_kernel_a(rows, D, chains),
        grid=(n_pk,),
        in_specs=[pl.BlockSpec(memory_space=pl.ANY)] + [ray_spec] * 7,
        out_specs=[ray_spec] * (1 + D),
        out_shape=[jax.ShapeDtypeStruct(shape8, jnp.int32)] * (1 + D),
        scratch_shapes=[
            pltpu.VMEM(ps.pairs.shape, jnp.float32),
            pltpu.SMEM((chains * STACK_DEPTH,), jnp.int32),
            pltpu.SemaphoreType.DMA((1,)),
        ],
        interpret=interpret,
    )(ps.pairs,
      o[:, 0].reshape(shape8), o[:, 1].reshape(shape8), o[:, 2].reshape(shape8),
      d[:, 0].reshape(shape8), d[:, 1].reshape(shape8), d[:, 2].reshape(shape8),
      t_max.reshape(shape8))
    cnt = outs[0].reshape(rp)[:r]
    lists = jnp.stack([outs[1 + dd].reshape(rp)[:r] for dd in range(D)], -1)
    return lists, cnt


def phase_a_steered(pairs_stack, PR, LS, steer, o, d, t_max,
                    interpret=False, rows=PACKET_ROWS, D=D_SLOTS,
                    chains=None):
    """Steered phase A over a segmented scene. steer: (n_pk, K) segment ids
    (-1 = skip). Returns (lists, cnt) with GLOBAL leaf rows (st*LS + slot)."""
    chains = TP_CHAINS if chains is None else chains
    if rows % max(chains, 1) != 0:
        chains = 1
    packet = rows * 128
    o, d, t_max, r, rp = _pad_rays(o, d, t_max, packet)
    n_pk = rp // packet
    assert steer.shape[0] == n_pk
    K = steer.shape[1]
    shape8 = (n_pk * rows, 128)
    ray_spec = pl.BlockSpec((rows, 128), lambda i, steer: (i, 0),
                            memory_space=pltpu.VMEM)
    outs = pl.pallas_call(
        _make_kernel_a_steered(rows, D, K, PR, LS, chains),
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=(n_pk,),
            in_specs=[ray_spec] * 7 + [pl.BlockSpec(memory_space=pl.ANY)],
            out_specs=[ray_spec] * (1 + D),
            scratch_shapes=[
                pltpu.VMEM((2, PR, 128), jnp.float32),
                pltpu.SMEM((chains * STACK_DEPTH,), jnp.int32),
                pltpu.SemaphoreType.DMA((2,)),
            ],
        ),
        out_shape=[jax.ShapeDtypeStruct(shape8, jnp.int32)] * (1 + D),
        interpret=interpret,
    )(steer,
      o[:, 0].reshape(shape8), o[:, 1].reshape(shape8), o[:, 2].reshape(shape8),
      d[:, 0].reshape(shape8), d[:, 1].reshape(shape8), d[:, 2].reshape(shape8),
      t_max.reshape(shape8), pairs_stack)
    cnt = outs[0].reshape(rp)[:r]
    lists = jnp.stack([outs[1 + dd].reshape(rp)[:r] for dd in range(D)], -1)
    return lists, cnt


# ---------------------------------------------------------------------------
# Phase B (plain XLA — dense pair testing)
# ---------------------------------------------------------------------------

def phase_b_closest(lists, cnt, leaf_stack, leaf_first, leaf_count,
                    o, d, t_max, chunk: int = 1 << 17):
    """Test every recorded (ray, leaf) pair; returns the per-ray closest
    Hit (slot -1 = none closer than t_max). Pure XLA: ONE row gather per
    pair + a transpose to SoA + a dense Möller loop — every vector lane is
    a real pair (the lane efficiency the packet kernel can't get)."""
    R, D = lists.shape
    parts = []
    for lo in range(0, R, chunk):
        sl = slice(lo, min(lo + chunk, R))
        ls = lists[sl]
        rc = ls.shape[0]
        rowsv = jnp.maximum(ls, 0).reshape(-1)  # (rc*D,)
        valid = (ls >= 0).reshape(-1)
        g = leaf_stack[rowsv]  # (rc*D, 128) row gather
        gt = g.T  # SoA: lane slices of gathered rows serialize, rows don't
        first = leaf_first[rowsv]
        countv = leaf_count[rowsv]
        ox = jnp.repeat(o[sl, 0], D)
        oy = jnp.repeat(o[sl, 1], D)
        oz = jnp.repeat(o[sl, 2], D)
        dx = jnp.repeat(d[sl, 0], D)
        dy = jnp.repeat(d[sl, 1], D)
        dz = jnp.repeat(d[sl, 2], D)
        t_best = jnp.repeat(t_max[sl], D)
        slot = jnp.full((rc * D,), -1, jnp.int32)
        ub = jnp.zeros((rc * D,), jnp.float32)
        vb = jnp.zeros((rc * D,), jnp.float32)
        for k in range(MAX_LEAF_PACKET):
            b = k * 9
            p0x, p0y, p0z = gt[b], gt[b + 1], gt[b + 2]
            e1x, e1y, e1z = gt[b + 3], gt[b + 4], gt[b + 5]
            e2x, e2y, e2z = gt[b + 6], gt[b + 7], gt[b + 8]
            pvx = dy * e2z - dz * e2y
            pvy = dz * e2x - dx * e2z
            pvz = dx * e2y - dy * e2x
            det = e1x * pvx + e1y * pvy + e1z * pvz
            inv_det = jnp.where(jnp.abs(det) > 1e-12, 1.0 / det, 0.0)
            sx, sy, sz = ox - p0x, oy - p0y, oz - p0z
            uu = (sx * pvx + sy * pvy + sz * pvz) * inv_det
            qx = sy * e1z - sz * e1y
            qy = sz * e1x - sx * e1z
            qz = sx * e1y - sy * e1x
            vv = (dx * qx + dy * qy + dz * qz) * inv_det
            tt = (e2x * qx + e2y * qy + e2z * qz) * inv_det
            ok = (
                valid & (k < countv)
                & (uu >= 0.0) & (uu <= 1.0)
                & (vv >= 0.0) & (uu + vv <= 1.0)
                & (tt > 0.0) & (tt < t_best)
            )
            t_best = jnp.where(ok, tt, t_best)
            slot = jnp.where(ok, first + k, slot)
            ub = jnp.where(ok, uu, ub)
            vb = jnp.where(ok, vv, vb)
        tb = t_best.reshape(rc, D)
        pick = jnp.argmin(tb, axis=1)[:, None]
        take = lambda a: jnp.take_along_axis(a.reshape(rc, D), pick,
                                             axis=1)[:, 0]
        parts.append((take(t_best), take(slot.astype(jnp.float32)),
                      take(ub), take(vb)))
    t = jnp.concatenate([p[0] for p in parts])
    slot = jnp.concatenate([p[1] for p in parts]).astype(jnp.int32)
    u = jnp.concatenate([p[2] for p in parts])
    v = jnp.concatenate([p[3] for p in parts])
    return Hit(t=t, slot=slot, u=u, v=v)


def phase_b_any(lists, cnt, leaf_stack, leaf_first, leaf_count,
                o, d, t_max, chunk: int = 1 << 17):
    """Occlusion over recorded pairs: True where ANY pair hits < t_max."""
    h = phase_b_closest(lists, cnt, leaf_stack, leaf_first, leaf_count,
                        o, d, t_max, chunk=chunk)
    return h.slot >= 0


# ---------------------------------------------------------------------------
# End-to-end closest / any
# ---------------------------------------------------------------------------

@partial(jax.jit, static_argnames=("interpret", "rows", "d_slots"))
def two_phase_closest(ps, leaf_first, leaf_count, o, d, t_max,
                      interpret: bool = False, rows: int = PACKET_ROWS,
                      d_slots: int = D_SLOTS) -> Hit:
    """Exact closest hit via two-phase traversal over a resident-table
    scene (single PacketScene). Overflowed rays (cnt > D) finish in the
    one-phase chained kernel pruned by the phase-B t."""
    if jnp.ndim(t_max) == 0:
        t_max = jnp.full((o.shape[0],), t_max, jnp.float32)
    t_max = t_max.astype(jnp.float32)
    itp = interpret or pk.FORCE_INTERPRET
    lists, cnt = phase_a(ps, o, d, t_max, interpret=itp, rows=rows,
                         D=d_slots)
    hit = phase_b_closest(lists, cnt, ps.leaf_geo, leaf_first, leaf_count,
                          o, d, t_max)
    over = cnt > d_slots
    tm2 = jnp.where(over & (t_max > 0.0),
                    jnp.minimum(hit.t, t_max), jnp.float32(-1.0))

    def fallback(h):
        h2 = pk._pallas_trace(ps, o, d, tm2, False, itp, rows)
        return _merge_hits(h, h2)

    hit = jax.lax.cond(jnp.any(over), fallback, lambda h: h, hit)
    ok = hit.slot >= 0
    return Hit(t=jnp.where(ok, hit.t, t_max), slot=hit.slot,
               u=hit.u, v=hit.v)


@partial(jax.jit, static_argnames=("interpret", "rows", "d_slots"))
def two_phase_any(ps, leaf_first, leaf_count, o, d, t_max,
                  interpret: bool = False, rows: int = PACKET_ROWS,
                  d_slots: int = D_SLOTS):
    """Occlusion via two-phase traversal (resident tables). Unresolved
    overflow rays (no recorded pair hit, more leaves existed) finish in
    the one-phase any-hit kernel."""
    if jnp.ndim(t_max) == 0:
        t_max = jnp.full((o.shape[0],), t_max, jnp.float32)
    t_max = t_max.astype(jnp.float32)
    itp = interpret or pk.FORCE_INTERPRET
    lists, cnt = phase_a(ps, o, d, t_max, interpret=itp, rows=rows,
                         D=d_slots)
    occ = phase_b_any(lists, cnt, ps.leaf_geo, leaf_first, leaf_count,
                      o, d, t_max)
    unresolved = (cnt > d_slots) & ~occ & (t_max > 0.0)
    tm2 = jnp.where(unresolved, t_max, jnp.float32(-1.0))

    def fallback(oc):
        h2 = pk._pallas_trace(ps, o, d, tm2, True, itp, rows)
        return oc | (h2.slot >= 0)

    return jax.lax.cond(jnp.any(unresolved), fallback, lambda oc: oc, occ)


def _steer_and_lists(pairs_stack, PR, LS, seg_min, seg_max, op, dp, tp,
                     o, d, t_max, k_steer, itp, rows, d_slots,
                     exclude=None):
    packet = rows * 128
    steer, pk_hits, _sfx = _build_steering(op, dp, tp, seg_min, seg_max, packet,
                                     k_steer, exclude=exclude)
    lists, cnt = phase_a_steered(pairs_stack, PR, LS, steer, o, d, t_max,
                                 interpret=itp, rows=rows, D=d_slots)
    S = seg_min.shape[0]
    seg_ids = jnp.arange(S, dtype=jnp.int32)
    done = jnp.any(steer[:, :, None] == seg_ids[None, None, :], axis=1)
    # rays in packets with intersected-but-unsteered segments have
    # incomplete lists (the steering ran out of K slots)
    uncovered_pk = jnp.any(pk_hits & ~done, axis=1)  # (n_pk,)
    r = o.shape[0]
    incomplete = jnp.repeat(uncovered_pk, packet)[:r]
    return lists, cnt, incomplete, done, pk_hits


@partial(jax.jit, static_argnames=("interpret", "rows", "d_slots", "k_steer"))
def two_phase_closest_steered(ps_segs, pairs_stack, leaf_stack,
                              leaf_first_stack, leaf_count_stack,
                              seg_min, seg_max, o, d, t_max,
                              interpret: bool = False,
                              rows: int = PACKET_ROWS,
                              d_slots: int = D_SLOTS,
                              k_steer: int = TP_STEER_K) -> Hit:
    """Exact closest hit over a VMEM-segmented scene: steered phase A
    (pairs-only DMAs) + phase B, a second pruned pass for rays whose lists
    overflowed or whose packets ran out of steer slots, then a per-segment
    chained backstop for anything still unresolved (rare)."""
    if jnp.ndim(t_max) == 0:
        t_max = jnp.full((o.shape[0],), t_max, jnp.float32)
    t_max = t_max.astype(jnp.float32)
    itp = interpret or pk.FORCE_INTERPRET
    S = len(ps_segs)
    PR = ps_segs[0].pairs.shape[0]
    LR = ps_segs[0].leaf_geo.shape[0]
    LS = LR * LEAVES_PER_ROW
    packet = rows * 128
    R = o.shape[0]
    pad = (-R) % packet
    padded = lambda a, fill: a if pad == 0 else jnp.concatenate(
        [a, jnp.full((pad,) + a.shape[1:], fill, a.dtype)])
    op = padded(o, 0.0)
    dp = padded(d, 1.0)
    tp = padded(t_max, -1.0)

    lists, cnt, incomplete, done, _hits = _steer_and_lists(
        pairs_stack, PR, LS, seg_min, seg_max, op, dp, tp,
        o, d, t_max, k_steer, itp, rows, d_slots)
    hit = phase_b_closest(lists, cnt, leaf_stack, leaf_first_stack,
                          leaf_count_stack, o, d, t_max)

    # pass 2: rays with truncated or incomplete lists re-record against the
    # TIGHTENED bound (their phase-B t prunes most of the tree)
    redo = (cnt > d_slots) | incomplete
    tm2 = jnp.where(redo & (t_max > 0.0),
                    jnp.minimum(hit.t, t_max), jnp.float32(-1.0))
    tp2 = padded(tm2, -1.0)
    lists2, cnt2, incomplete2, done2, hits2 = _steer_and_lists(
        pairs_stack, PR, LS, seg_min, seg_max, op, dp, tp2,
        o, d, tm2, k_steer, itp, rows, d_slots)
    h2 = phase_b_closest(lists2, cnt2, leaf_stack, leaf_first_stack,
                         leaf_count_stack, o, d, tm2)
    hit = _merge_hits(hit, h2)

    # exact backstop: still-unresolved rays sweep the chained segments
    unresolved = (cnt2 > d_slots) | incomplete2
    tm3 = jnp.where(unresolved & (t_max > 0.0),
                    jnp.minimum(hit.t, t_max), jnp.float32(-1.0))

    def backstop(h):
        cur = tm3
        for s in range(S):
            hs = pk._pallas_trace(ps_segs[s], o, d, cur, False, itp, rows)
            h = _merge_hits(h, hs)
            cur = jnp.minimum(cur, h.t)
        return h

    hit = jax.lax.cond(jnp.any(unresolved), backstop, lambda h: h, hit)
    ok = hit.slot >= 0
    return Hit(t=jnp.where(ok, hit.t, t_max), slot=hit.slot,
               u=hit.u, v=hit.v)


@partial(jax.jit, static_argnames=("interpret", "rows", "d_slots", "k_steer"))
def two_phase_any_steered(ps_segs, pairs_stack, leaf_stack,
                          leaf_first_stack, leaf_count_stack,
                          seg_min, seg_max, o, d, t_max,
                          interpret: bool = False,
                          rows: int = PACKET_ROWS,
                          d_slots: int = D_SLOTS,
                          k_steer: int = TP_STEER_K):
    """Occlusion over a segmented scene via steered two-phase traversal."""
    if jnp.ndim(t_max) == 0:
        t_max = jnp.full((o.shape[0],), t_max, jnp.float32)
    t_max = t_max.astype(jnp.float32)
    itp = interpret or pk.FORCE_INTERPRET
    S = len(ps_segs)
    PR = ps_segs[0].pairs.shape[0]
    LR = ps_segs[0].leaf_geo.shape[0]
    LS = LR * LEAVES_PER_ROW
    packet = rows * 128
    R = o.shape[0]
    pad = (-R) % packet
    padded = lambda a, fill: a if pad == 0 else jnp.concatenate(
        [a, jnp.full((pad,) + a.shape[1:], fill, a.dtype)])
    op = padded(o, 0.0)
    dp = padded(d, 1.0)
    tp = padded(t_max, -1.0)

    lists, cnt, incomplete, _done, _h = _steer_and_lists(
        pairs_stack, PR, LS, seg_min, seg_max, op, dp, tp,
        o, d, t_max, k_steer, itp, rows, d_slots)
    occ = phase_b_any(lists, cnt, leaf_stack, leaf_first_stack,
                      leaf_count_stack, o, d, t_max)

    unresolved = ((cnt > d_slots) | incomplete) & ~occ & (t_max > 0.0)
    tm2 = jnp.where(unresolved, t_max, jnp.float32(-1.0))

    def backstop(oc):
        cur = tm2
        for s in range(S):
            hs = pk._pallas_trace(ps_segs[s], o, d, cur, True, itp, rows)
            oc = oc | (hs.slot >= 0)
            cur = jnp.where(oc, jnp.float32(-1.0), cur)
        return oc

    return jax.lax.cond(jnp.any(unresolved), backstop, lambda oc: oc, occ)
