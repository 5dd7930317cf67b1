"""Pallas TPU packet tracer — the hot traversal kernel.

TPU-first replacement for per-ray traversal (ref: Resource/Shaders/include/
BVHIntersect.glsl): a PACKET of 8x128 = 1024 rays traverses the BVH together
with ONE shared traversal stack in SMEM. All per-node data arrives via
scalar VMEM loads broadcast into dense (8,128) vector tests — the TPU has no
fast per-lane gather, so the kernel never gathers; divergence costs masked
work within a packet and is mitigated by ray sorting upstream.

Data layout (v7):
  pair table (1+ceil(P/8), 128) f32 — sibling pair p at row 1+(p>>3),
  lane block (p&7)*16:
      [c0.min3, c0.max3, c1.min3, c1.max3, c0.meta0, c0.meta1,
       c1.meta0, c1.meta1] — 16 lanes per pair, 8 pairs per row.
      metas are SMALL NON-NEGATIVE INTS stored exactly as f32 (< 2^24):
        leaf child:     meta0 = first tri slot, meta1 = count + leaf_slot*8
        interior child: meta0 = its own pair index*4 + split_axis, meta1 = 0
      children are swapped at build time so c0 is the lower child along the
      pair's dominant axis; traversal orders near/far from the packet's mean
      direction sign — no per-node reductions for ordering.
      Row 0 is a dedicated root record: lanes 0..1 root meta, 2..7 root box.
  leaf table (ceil(L/2), 128) f32 — triangle k of leaf slot s at row s>>1,
      lanes [(s&1)*54 + k*9, +9): p0(3), e1(3), e2(3) — static lanes read by
      scalar VMEM loads (max 6 tris per leaf; small leaves keep the Möller
      loop short, which dominates incoherent packets).

The traversal stack holds (meta0, meta1) of pending subtrees, so a pop needs
no node fetch: leaves go straight to triangle tests; interiors load exactly
16 scalars at static lanes (one 2-way branch on the row half) and use one
fused reduction for both children's any-hit counts.
"""
from __future__ import annotations

import os
from dataclasses import dataclass
from functools import partial

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .trace import Hit

PACKET_ROWS = int(__import__('os').environ.get('IDK_PACKET_ROWS', '32'))
PACKET = PACKET_ROWS * 128  # default rays per packet (rows x 128 lanes)
# Bounce/NEE packet size: at 2.8M/64-segment scale the sorted-bounce union
# GROWS with packet size, so smaller packets win until fixed overheads bite
# (round-4 device sweep, 2M bounce rays, closest/any ms:
# rows=8 648/89, 16 558/74, 32 619/82, 64 1008/130; co-chains on top of 16
# regress to 603/73). 16 rows is the measured sweet spot; at the 110k scale
# the union was size-insensitive and 32 was tied — keep the knob.
BOUNCE_ROWS = int(__import__('os').environ.get('IDK_BOUNCE_ROWS', '16'))
# Triangles per leaf. 12 (one leaf per 128-lane row, 108 lanes) measured
# faster than 6 (two leaves/row): interior-iteration overhead dominates the
# packet loop, so fewer+fatter leaves win even for incoherent packets.
MAX_LEAF_PACKET = int(__import__('os').environ.get('IDK_MAX_LEAF', '12'))
LEAVES_PER_ROW = max(1, 108 // (MAX_LEAF_PACKET * 9))
STACK_DEPTH = 128
# VMEM budget for the resident pair+leaf tables (the ray blocks, outputs and
# double-buffering need the rest of the ~16 MB scoped vmem)
PACKET_VMEM_BUDGET = 13_000_000
# 8-wide (BVH8) nodes: one pop tests 8 child boxes — 3 binary levels per
# vector→scalar sync instead of 1. Default on; IDK_WIDE=0 falls back to the
# sibling-pair kernel.
WIDE = bool(int(__import__('os').environ.get('IDK_WIDE', '1')))
# child any-hit reduction: 'sum4' = 4 packed jnp.sum reduces,
# 'orroll' = per-lane bitmask + log-step bitwise-OR rolls + 1 extraction
REDUCE = __import__('os').environ.get('IDK_REDUCE', 'sum4')
# Co-traversing chains per kernel: the ~1k-cycle vector->scalar sync per
# node visit is a pipeline DRAIN shared by independent work in the same
# loop iteration (tools/bench_dual.py: 1 chain ~1100 cyc/visit, 4 chains
# ~350 cyc/visit). Each chain traverses its own rows-slice of the packet
# with its own stack; chains==1 reproduces the single-packet kernel.
CHAINS = int(__import__('os').environ.get('IDK_COCHAINS', '1'))
# Any-hit co-chains default to 2: the any-hit loop's vector work is light
# (early exit, no t refinement), so sharing the per-visit sync drain wins
# (bench_waves 110k: NEE any 47.9 -> 42.2 ms); the closest kernel is
# VPU-bound on leaf tests and measures flat-to-worse with chains.
CHAINS_ANY = int(__import__('os').environ.get('IDK_COCHAINS_ANY', '2'))


# ---------------------------------------------------------------------------
# Host-side table building
# ---------------------------------------------------------------------------

@dataclass
class PacketTables:
    pairs: np.ndarray  # (1+ceil(P/2),128) f32 (row 0 = root record)
    leaf_geo: np.ndarray  # (L,128) f32
    n_nodes: int
    vmem_bytes: int
    # refresh plan (topology-static indices for refit updates)
    collapsed_nodes: np.ndarray | None = None
    plan_c0: np.ndarray | None = None  # (P,) collapsed-node id of lower child
    plan_c1: np.ndarray | None = None
    plan_row: np.ndarray | None = None  # (P,) pair row
    plan_off: np.ndarray | None = None  # (P,) pair lane offset
    plan_leaf_slot: np.ndarray | None = None  # (S,) tri slot per leaf lane group
    plan_leaf_row: np.ndarray | None = None  # (S,) leaf row
    plan_leaf_base: np.ndarray | None = None  # (S,) lane base (k*9)
    collapse_map: np.ndarray | None = None  # (Nc,) collapsed idx -> builder idx
    wide: bool = False  # 8-wide node layout (see _tables_wide_from_collapsed)
    plan_wrow: np.ndarray | None = None  # (K,) row per real wide-child slot
    plan_wbase: np.ndarray | None = None  # (K,) lane base per wide-child slot
    plan_wnode: np.ndarray | None = None  # (K,) collapsed node id per slot
    # per-leaf-slot side tables (two-phase traversal, ops/two_phase.py):
    # global first tri slot + tri count of leaf slot s
    leaf_first: np.ndarray | None = None  # (L,) i32
    leaf_count: np.ndarray | None = None  # (L,) i32

    def refresh(self, nodes: np.ndarray, slot_tri_ids: np.ndarray,
                vertices: np.ndarray, indices: np.ndarray):
        """Update boxes + leaf geometry in place after a refit (topology and
        near/far axis choices stay from build time — ordering is a heuristic,
        correctness is unaffected). Fully vectorized (per-frame path)."""
        nm = nodes["min"][self.collapse_map]
        nx = nodes["max"][self.collapse_map]
        if self.wide:
            for j in range(3):
                self.pairs[self.plan_wrow, self.plan_wbase + j] = nm[self.plan_wnode][:, j]
                self.pairs[self.plan_wrow, self.plan_wbase + 3 + j] = nx[self.plan_wnode][:, j]
        else:
            for j in range(3):
                self.pairs[self.plan_row, self.plan_off + j] = nm[self.plan_c0][:, j]
                self.pairs[self.plan_row, self.plan_off + 3 + j] = nx[self.plan_c0][:, j]
                self.pairs[self.plan_row, self.plan_off + 6 + j] = nm[self.plan_c1][:, j]
                self.pairs[self.plan_row, self.plan_off + 9 + j] = nx[self.plan_c1][:, j]
        # row 0 holds THIS table's root record — for segment tables that is
        # the segment's own subtree root (collapse_map[0]), not the global
        # scene root; wave-key boxes are re-derived from this row after a
        # refit, so writing the global box here would collapse every
        # segment's sort key to the same value
        self.pairs[0, 2:5] = nm[0]
        self.pairs[0, 5:8] = nx[0]
        tri_v = indices[slot_tri_ids[self.plan_leaf_slot].astype(np.int64)]
        p = vertices[tri_v]
        p0 = p[:, 0]
        e1 = p[:, 1] - p[:, 0]
        e2 = p[:, 2] - p[:, 0]
        for j in range(3):
            self.leaf_geo[self.plan_leaf_row, self.plan_leaf_base + j] = p0[:, j]
            self.leaf_geo[self.plan_leaf_row, self.plan_leaf_base + 3 + j] = e1[:, j]
            self.leaf_geo[self.plan_leaf_row, self.plan_leaf_base + 6 + j] = e2[:, j]


def _collapse_leaves(nodes: np.ndarray, max_leaf: int) -> np.ndarray:
    """Bottom-up collapse of sibling leaves into bigger leaves (≤ max_leaf)
    to maximize leaf-row fill — the packet kernel tests a whole leaf row per
    visit, so fuller leaves are free (ref: the reference's subtree collapse
    in BLAS.OptimizeStackSize, BLAS.cs:875-937, same motivation). Children
    occupy contiguous tri-slot ranges, so a merged leaf is just
    (first_of_left, count_left + count_right). Returns a compact re-packed
    node array."""
    from ..bvh import builder as _builder

    native = _builder.tree_collapse_leaves(nodes, max_leaf)
    if native is not None:
        return native
    nodes = nodes.copy()
    counts = nodes["count"]
    firsts = nodes["left_or_first"]
    # children always have larger indices than parents, so one reverse scan
    # cascades collapses all the way up
    for i in range(nodes.shape[0] - 1, -1, -1):
        if counts[i] != 0:
            continue
        l = int(firsts[i])
        cl, cr = int(counts[l]), int(counts[l + 1])
        if 0 < cl and 0 < cr and cl + cr <= max_leaf and cl != 0xFFFFFFFF and cr != 0xFFFFFFFF:
            counts[i] = cl + cr
            firsts[i] = min(int(firsts[l]), int(firsts[l + 1]))
            counts[l] = counts[l + 1] = 0xFFFFFFFF  # orphan marker
    # BFS repack (drops orphans); track original builder ids for refits
    out = np.zeros(nodes.shape[0], dtype=nodes.dtype)
    orig = np.zeros(nodes.shape[0], np.int64)
    out[0] = nodes[0]
    orig[0] = 0
    n_out = 1
    k = 0
    while k < n_out:
        if out[k]["count"] == 0:
            l = int(out[k]["left_or_first"])
            out[k]["left_or_first"] = n_out
            out[n_out] = nodes[l]
            out[n_out + 1] = nodes[l + 1]
            orig[n_out] = l
            orig[n_out + 1] = l + 1
            n_out += 2
        k += 1
    return out[:n_out].copy(), orig[:n_out].copy()


def _subtree_extract(nodes: np.ndarray, orig: np.ndarray, root: int):
    """Renumber the subtree at `root` into a fresh builder-layout array
    (root 0, children consecutive), keeping the original-id map."""
    from ..bvh import builder as _builder

    native = _builder.tree_subtree_extract(nodes, orig, root)
    if native is not None:
        return native
    out = np.zeros(nodes.shape[0], dtype=nodes.dtype)
    o_map = np.zeros(nodes.shape[0], np.int64)
    out[0] = nodes[root]
    o_map[0] = orig[root]
    n_out, k = 1, 0
    while k < n_out:
        if out[k]["count"] == 0:
            l = int(out[k]["left_or_first"])
            out[k]["left_or_first"] = n_out
            out[n_out] = nodes[l]
            out[n_out + 1] = nodes[l + 1]
            o_map[n_out] = orig[l]
            o_map[n_out + 1] = orig[l + 1]
            n_out += 2
        k += 1
    return out[:n_out].copy(), o_map[:n_out].copy()


def _segment_roots(nodes: np.ndarray, budget: int) -> list[int]:
    """Minimal antichain of subtree roots whose packed tables each fit the
    VMEM budget. Footprints via one reverse scan (children follow parents)."""
    from ..bvh import builder as _builder

    native = _builder.tree_segment_roots(nodes, budget, LEAVES_PER_ROW)
    if native is not None:
        return native
    n = nodes.shape[0]
    is_leaf = nodes["count"] > 0
    pairs_below = np.zeros(n, np.int64)
    leaves_below = np.zeros(n, np.int64)
    for i in range(n - 1, -1, -1):
        if is_leaf[i]:
            leaves_below[i] = 1
        else:
            l = int(nodes["left_or_first"][i])
            pairs_below[i] = 1 + pairs_below[l] + pairs_below[l + 1]
            leaves_below[i] = leaves_below[l] + leaves_below[l + 1]
    foot = (
        (1 + (pairs_below + 7) // 8) * 512
        + ((leaves_below + LEAVES_PER_ROW - 1) // LEAVES_PER_ROW) * 512
    )
    roots, stack = [], [0]
    while stack:
        i = stack.pop()
        if foot[i] <= budget or is_leaf[i]:
            roots.append(i)
        else:
            l = int(nodes["left_or_first"][i])
            stack.append(l)
            stack.append(l + 1)
    return roots


def build_packet_tables_segmented(
    nodes_in: np.ndarray, slot_tri_ids: np.ndarray,
    vertices: np.ndarray, indices: np.ndarray, budget: int,
    wide: bool = WIDE,
) -> list[PacketTables]:
    """Split an over-VMEM BVH into subtree segments that each fit `budget`
    and pack each as its own table set. Traversal chains the segments with
    a carried t_max (closest) / OR (any-hit); leaf metas keep GLOBAL slot
    ids so shading is segment-agnostic. This is how Bistro-class scenes
    (>VMEM) keep using the packet kernel instead of the slow XLA fallback.

    Segmentation runs on the binary tree with the pair-table footprint;
    wide tables are usually smaller (64 lanes per ~7 interiors vs 16 per
    pair). Ragged subtrees can pack bigger — over-budget segments are
    re-split with a tighter budget."""
    collapsed, orig = _collapse_leaves(nodes_in, MAX_LEAF_PACKET)
    pack = _tables_wide_from_collapsed if wide else _tables_from_collapsed

    def emit(parent, parent_orig, sub_budget) -> list[PacketTables]:
        out = []
        for r in _segment_roots(parent, sub_budget):
            sub, sub_orig = _subtree_extract(parent, parent_orig, r)
            t = pack(sub, sub_orig, slot_tri_ids, vertices, indices)
            if t.vmem_bytes > budget and sub.shape[0] > 3:
                # rare ragged case: wide packing overshot the pair estimate
                out.extend(emit(sub, sub_orig, sub_budget * 0.6))
            else:
                out.append(t)
        return out

    return emit(collapsed, orig, budget)


def packet_vmem_estimate(nodes_in: np.ndarray, wide: bool = WIDE) -> int:
    """Exact packed-table byte size WITHOUT packing geometry — lets the
    big-scene path skip the throwaway whole-scene build_packet_tables call
    (several seconds of host gathers at 2.8M tris) and go straight to
    segmentation."""
    nodes, _ = _collapse_leaves(nodes_in, MAX_LEAF_PACKET)
    counts = nodes["count"]
    n_leaves = int((counts > 0).sum())
    leaf_bytes = max((n_leaves + LEAVES_PER_ROW - 1) // LEAVES_PER_ROW, 1) * 512
    if counts[0] > 0:  # single-leaf degenerate tree
        return 512 + leaf_bytes
    if wide:
        kids, _, _, _ = _collapse_wide(nodes)
        w = kids.shape[0]
        return (1 + (w + 1) // 2) * 512 + leaf_bytes
    n_pairs = int((counts == 0).sum())
    return (1 + max((n_pairs + 7) // 8, 1)) * 512 + leaf_bytes


def build_packet_tables(nodes_in: np.ndarray, slot_tri_ids: np.ndarray,
                        vertices: np.ndarray, indices: np.ndarray,
                        wide: bool = WIDE) -> PacketTables:
    """Pack builder nodes (NODE_DTYPE, root 0, children l/l+1) + leaf-slot
    triangles into the kernel's node/leaf tables (8-wide by default; also
    captures the static-index refresh plan for per-frame refits)."""
    nodes, collapse_map = _collapse_leaves(nodes_in, MAX_LEAF_PACKET)
    pack = _tables_wide_from_collapsed if wide else _tables_from_collapsed
    return pack(nodes, collapse_map, slot_tri_ids, vertices, indices)


def _tables_from_collapsed(nodes: np.ndarray, collapse_map: np.ndarray,
                           slot_tri_ids: np.ndarray,
                           vertices: np.ndarray, indices: np.ndarray) -> PacketTables:
    n = nodes.shape[0]
    counts = nodes["count"].astype(np.int64)
    firsts = nodes["left_or_first"].astype(np.int64)

    interior = np.nonzero(counts == 0)[0]
    leaf_ids = np.nonzero(counts > 0)[0]
    lv = counts[leaf_ids]
    assert lv.max(initial=0) <= MAX_LEAF_PACKET, (
        f"leaf count {lv.max(initial=0)} exceeds packet capacity "
        f"{MAX_LEAF_PACKET}; build the BLAS with max_leaf <= {MAX_LEAF_PACKET}"
    )
    leaf_slot_of = np.zeros(n, np.int64)
    leaf_slot_of[leaf_ids] = np.arange(leaf_ids.shape[0])

    # pair index per interior node, addressed by its left-child id
    pair_of = np.full(n + 1, -1, np.int64)
    pair_of[firsts[interior]] = np.arange(interior.shape[0])
    n_pairs = interior.shape[0]

    centers = 0.5 * (nodes["min"].astype(np.float64) + nodes["max"].astype(np.float64))

    # per-node meta (vectorized): leaf -> (first, count + row*16);
    # interior node ni with children (l, l+1) -> (pair_of[l]*4 + axis, 0)
    axis_of = np.zeros(n, np.int64)
    if n_pairs:
        l_all = firsts[interior]
        diff = np.abs(centers[l_all + 1] - centers[l_all])
        ax = np.argmax(diff, axis=1)
        axis_of[interior] = ax
    meta0 = np.where(
        counts > 0, firsts.astype(np.float64),
        (pair_of[np.minimum(firsts, n)] * 4 + axis_of).astype(np.float64),
    )
    meta1 = np.where(counts > 0, (counts + leaf_slot_of * 16).astype(np.float64), 0.0)

    pr_rows = max((n_pairs + 7) // 8, 1)
    pairs = np.zeros((1 + pr_rows, 128), np.float32)

    if n_pairs:
        l_all = firsts[interior]
        ax = axis_of[interior]
        swap = centers[l_all, ax] > centers[l_all + 1, ax]
        c0 = np.where(swap, l_all + 1, l_all)
        c1 = np.where(swap, l_all, l_all + 1)
        pi = np.arange(n_pairs)
        row = 1 + (pi >> 3)
        off = (pi & 7) * 16
        for j in range(3):
            pairs[row, off + j] = nodes["min"][c0][:, j]
            pairs[row, off + 3 + j] = nodes["max"][c0][:, j]
            pairs[row, off + 6 + j] = nodes["min"][c1][:, j]
            pairs[row, off + 9 + j] = nodes["max"][c1][:, j]
        pairs[row, off + 12] = meta0[c0]
        pairs[row, off + 13] = meta1[c0]
        pairs[row, off + 14] = meta0[c1]
        pairs[row, off + 15] = meta1[c1]
    else:
        c0 = c1 = row = off = np.zeros(0, np.int64)

    pairs[0, 0] = meta0[0]
    pairs[0, 1] = meta1[0]
    pairs[0, 2:5] = nodes["min"][0]
    pairs[0, 5:8] = nodes["max"][0]

    # leaf geometry (vectorized): one entry per (leaf, k<count),
    # LEAVES_PER_ROW leaves per 128-lane row
    n_leaves = leaf_ids.shape[0]
    lpr = LEAVES_PER_ROW
    leaf_geo = np.zeros((max((n_leaves + lpr - 1) // lpr, 1), 128), np.float32)
    if n_leaves:
        kk = np.arange(MAX_LEAF_PACKET)
        mask = kk[None, :] < counts[leaf_ids][:, None]  # (L,K)
        li_idx, k_idx = np.nonzero(mask)
        slots = firsts[leaf_ids][li_idx] + k_idx
        rows_l = li_idx // lpr
        base_l = (li_idx % lpr) * (MAX_LEAF_PACKET * 9) + k_idx * 9
        tri_v = indices[slot_tri_ids[slots].astype(np.int64)]
        p = vertices[tri_v]
        p0 = p[:, 0]
        e1 = p[:, 1] - p[:, 0]
        e2 = p[:, 2] - p[:, 0]
        for j in range(3):
            leaf_geo[rows_l, base_l + j] = p0[:, j]
            leaf_geo[rows_l, base_l + 3 + j] = e1[:, j]
            leaf_geo[rows_l, base_l + 6 + j] = e2[:, j]
    else:
        rows_l = base_l = slots = np.zeros(0, np.int64)

    vmem = pairs.nbytes + leaf_geo.nbytes
    return PacketTables(
        pairs, leaf_geo, n, vmem,
        collapsed_nodes=nodes,
        plan_c0=c0, plan_c1=c1, plan_row=row, plan_off=off,
        plan_leaf_slot=slots, plan_leaf_row=rows_l, plan_leaf_base=base_l,
        collapse_map=collapse_map,
        leaf_first=firsts[leaf_ids].astype(np.int32),
        leaf_count=counts[leaf_ids].astype(np.int32),
    )


# ---------------------------------------------------------------------------
# Wide (8-ary) tables — BVH8 collapse of the binary tree
# ---------------------------------------------------------------------------

def _collapse_wide(nodes: np.ndarray):
    """Collapse a (leaf-collapsed) binary tree into 8-wide nodes by greedily
    expanding the largest-area interior child until 8 children (the standard
    CWBVH-style collapse). Returns (kids, axis, order):
      kids  (W,8) int64 binary-node id per child slot, -1 = empty
      axis  (W,)  ordering axis per wide node (children sorted ascending)
      order (W,)  binary id of each wide node (BFS, parents first)
    Child slot order is ascending centroid along `axis`; traversal pushes
    forward or reversed by the packet's direction sign on that axis."""
    from ..bvh import builder as _builder

    native = _builder.tree_collapse_wide(nodes)
    if native is not None:
        return native
    counts = nodes["count"].astype(np.int64)
    firsts = nodes["left_or_first"].astype(np.int64)
    nmin = nodes["min"].astype(np.float64)
    nmax = nodes["max"].astype(np.float64)
    ext = np.maximum(nmax - nmin, 0.0)
    area = ext[:, 0] * ext[:, 1] + ext[:, 1] * ext[:, 2] + ext[:, 2] * ext[:, 0]
    center = 0.5 * (nmin + nmax)
    is_leaf = counts > 0

    kids_rows: list[list[int]] = []
    axis_rows: list[int] = []
    wide_of = {}
    order = [0]
    qi = 0
    while qi < len(order):
        b = order[qi]
        qi += 1
        kids = [int(firsts[b]), int(firsts[b]) + 1]
        while len(kids) < 8:
            best, best_a = -1, -1.0
            for j, k in enumerate(kids):
                if not is_leaf[k] and area[k] > best_a:
                    best_a = area[k]
                    best = j
            if best < 0:
                break
            k = kids.pop(best)
            kids.extend((int(firsts[k]), int(firsts[k]) + 1))
        c = center[kids]
        axis = int(np.argmax(c.max(0) - c.min(0)))
        kids.sort(key=lambda k: center[k, axis])
        for k in kids:
            if not is_leaf[k]:
                wide_of[k] = len(order)
                order.append(k)
        kids_rows.append(kids)
        axis_rows.append(axis)

    W = len(kids_rows)
    kids_arr = np.full((W, 8), -1, np.int64)
    for w, ks in enumerate(kids_rows):
        kids_arr[w, : len(ks)] = ks
    axis_arr = np.asarray(axis_rows, np.int64)
    # per-wide-node meta0 as referenced by the PARENT: wide_id*4 + own axis
    self_meta0 = np.arange(W, dtype=np.int64) * 4 + axis_arr
    wide_meta0_of = np.full(nodes.shape[0], -1, np.int64)
    for b, w in wide_of.items():
        wide_meta0_of[b] = self_meta0[w]
    wide_meta0_of[0] = self_meta0[0]
    return kids_arr, axis_arr, np.asarray(order, np.int64), wide_meta0_of


def _pack_leaves(leaf_firsts, leaf_counts, slot_tri_ids, vertices, indices):
    """Pack per-leaf triangles into the 128-lane leaf table (shared by the
    pair and wide kernels). Returns (leaf_geo, plan_slot, plan_row, plan_base)
    where leaf slot s = position in leaf_firsts."""
    n_leaves = leaf_firsts.shape[0]
    lpr = LEAVES_PER_ROW
    leaf_geo = np.zeros((max((n_leaves + lpr - 1) // lpr, 1), 128), np.float32)
    if not n_leaves:
        z = np.zeros(0, np.int64)
        return leaf_geo, z, z, z
    kk = np.arange(MAX_LEAF_PACKET)
    mask = kk[None, :] < leaf_counts[:, None]
    li_idx, k_idx = np.nonzero(mask)
    slots = leaf_firsts[li_idx] + k_idx
    rows_l = li_idx // lpr
    base_l = (li_idx % lpr) * (MAX_LEAF_PACKET * 9) + k_idx * 9
    tri_v = indices[slot_tri_ids[slots].astype(np.int64)]
    p = vertices[tri_v]
    p0 = p[:, 0]
    e1 = p[:, 1] - p[:, 0]
    e2 = p[:, 2] - p[:, 0]
    for j in range(3):
        leaf_geo[rows_l, base_l + j] = p0[:, j]
        leaf_geo[rows_l, base_l + 3 + j] = e1[:, j]
        leaf_geo[rows_l, base_l + 6 + j] = e2[:, j]
    return leaf_geo, slots, rows_l, base_l


def _tables_wide_from_collapsed(nodes: np.ndarray, collapse_map: np.ndarray,
                                slot_tri_ids: np.ndarray,
                                vertices: np.ndarray, indices: np.ndarray) -> PacketTables:
    """Pack a leaf-collapsed binary tree as 8-wide nodes: wide node w lives
    at row 1+(w>>1), lane block (w&1)*64; child c at lanes [c*8, c*8+8):
    [min3, max3, meta0, meta1]. Empty slots carry NaN boxes (the slab test
    can never pass) and zero metas. Row 0 is the root record as in v7."""
    counts = nodes["count"].astype(np.int64)
    firsts = nodes["left_or_first"].astype(np.int64)
    n = nodes.shape[0]
    leaf_ids = np.nonzero(counts > 0)[0]
    assert counts[leaf_ids].max(initial=0) <= MAX_LEAF_PACKET
    leaf_slot_of = np.zeros(n, np.int64)
    leaf_slot_of[leaf_ids] = np.arange(leaf_ids.shape[0])
    # per-node leaf meta (valid where leaf)
    meta0_leaf = firsts
    meta1_leaf = counts + leaf_slot_of * 16

    leaf_geo, plan_slot, plan_lrow, plan_lbase = _pack_leaves(
        firsts[leaf_ids], counts[leaf_ids], slot_tri_ids, vertices, indices)

    lf = firsts[leaf_ids].astype(np.int32)
    lc = counts[leaf_ids].astype(np.int32)
    if counts[0] > 0:  # degenerate: whole (sub)tree is one leaf
        pairs = np.zeros((1, 128), np.float32)
        pairs[0, 0] = meta0_leaf[0]
        pairs[0, 1] = meta1_leaf[0]
        pairs[0, 2:5] = nodes["min"][0]
        pairs[0, 5:8] = nodes["max"][0]
        return PacketTables(
            pairs, leaf_geo, n, pairs.nbytes + leaf_geo.nbytes,
            collapsed_nodes=nodes, wide=True,
            plan_wrow=np.zeros(0, np.int64), plan_wbase=np.zeros(0, np.int64),
            plan_wnode=np.zeros(0, np.int64),
            plan_leaf_slot=plan_slot, plan_leaf_row=plan_lrow,
            plan_leaf_base=plan_lbase, collapse_map=collapse_map,
            leaf_first=lf, leaf_count=lc,
        )

    kids, axis, order, wide_meta0_of = _collapse_wide(nodes)
    W = kids.shape[0]
    pairs = np.zeros((1 + (W + 1) // 2, 128), np.float32)

    w_idx, c_idx = np.nonzero(kids >= 0)
    k_ids = kids[w_idx, c_idx]
    rows_w = 1 + (w_idx >> 1)
    base_w = (w_idx & 1) * 64 + c_idx * 8
    # empty slots: NaN boxes so the slab test never passes
    empty_w, empty_c = np.nonzero(kids < 0)
    e_rows = 1 + (empty_w >> 1)
    e_base = (empty_w & 1) * 64 + empty_c * 8
    for j in range(6):
        pairs[e_rows, e_base + j] = np.nan
    for j in range(3):
        pairs[rows_w, base_w + j] = nodes["min"][k_ids][:, j]
        pairs[rows_w, base_w + 3 + j] = nodes["max"][k_ids][:, j]
    k_leaf = counts[k_ids] > 0
    pairs[rows_w, base_w + 6] = np.where(
        k_leaf, meta0_leaf[k_ids], wide_meta0_of[k_ids]).astype(np.float32)
    pairs[rows_w, base_w + 7] = np.where(k_leaf, meta1_leaf[k_ids], 0).astype(np.float32)

    pairs[0, 0] = wide_meta0_of[0]
    pairs[0, 1] = 0.0
    pairs[0, 2:5] = nodes["min"][0]
    pairs[0, 5:8] = nodes["max"][0]

    vmem = pairs.nbytes + leaf_geo.nbytes
    return PacketTables(
        pairs, leaf_geo, n, vmem,
        collapsed_nodes=nodes, wide=True,
        plan_wrow=rows_w, plan_wbase=base_w, plan_wnode=k_ids,
        plan_leaf_slot=plan_slot, plan_leaf_row=plan_lrow,
        plan_leaf_base=plan_lbase, collapse_map=collapse_map,
        leaf_first=lf, leaf_count=lc,
    )


@jax.tree_util.register_pytree_node_class
@dataclass
class PacketScene:
    pairs: jnp.ndarray
    leaf_geo: jnp.ndarray
    wide: bool = False

    def tree_flatten(self):
        return (self.pairs, self.leaf_geo), self.wide

    @classmethod
    def tree_unflatten(cls, aux, ch):
        return cls(*ch, wide=aux)

    @staticmethod
    def from_tables(t: PacketTables) -> "PacketScene":
        return PacketScene(jnp.asarray(t.pairs), jnp.asarray(t.leaf_geo),
                           wide=t.wide)


# ---------------------------------------------------------------------------
# Kernel
# ---------------------------------------------------------------------------

def _slab(ox, oy, oz, ix, iy, iz, bx0, by0, bz0, bx1, by1, bz1, t_best):
    t0 = (bx0 - ox) * ix
    t1 = (bx1 - ox) * ix
    tn = jnp.minimum(t0, t1)
    tf = jnp.maximum(t0, t1)
    t0 = (by0 - oy) * iy
    t1 = (by1 - oy) * iy
    tn = jnp.maximum(tn, jnp.minimum(t0, t1))
    tf = jnp.minimum(tf, jnp.maximum(t0, t1))
    t0 = (bz0 - oz) * iz
    t1 = (bz1 - oz) * iz
    tn = jnp.maximum(tn, jnp.minimum(t0, t1))
    tf = jnp.minimum(tf, jnp.maximum(t0, t1))
    tn = jnp.maximum(tn, 0.0)
    return (tf >= tn) & (tn <= t_best), tn


def _build_run_seg(any_hit, rows, wide, packet,
                   ox, oy, oz, dx, dy, dz, ix, iy, iz,
                   neg_x, neg_y, neg_z, stack0_ref, stack1_ref,
                   chains: int = 1):
    """One full stack traversal of one node/leaf table pair against the
    packet's rays. Shared by the whole-table kernel and the multi-steer
    kernel (which runs it once per steered segment with a fresh t_maxk).

    chains > 1 co-traverses `chains` independent row-slices of the packet
    in ONE while_loop: the per-visit vector->scalar sync is a pipeline
    drain whose cost is shared by independent same-iteration work
    (tools/bench_dual.py: ~1100 cyc/visit at 1 chain, ~350 at 4), so
    divergence cost per visit drops ~linearly in the chain count. Each
    chain owns stack rows [k*STACK_DEPTH, (k+1)*STACK_DEPTH)."""
    assert rows % chains == 0, (rows, chains)
    rc = rows // chains

    def make_chain(k):
        """Per-chain ray slices + a visit() running ONE node visit."""
        s0 = k * rc
        csl = lambda a: jax.lax.slice(a, (s0, 0), (s0 + rc, 128))
        oxk, oyk, ozk = csl(ox), csl(oy), csl(oz)
        dxk, dyk, dzk = csl(dx), csl(dy), csl(dz)
        ixk, iyk, izk = csl(ix), csl(iy), csl(iz)
        if chains == 1:
            negs = (neg_x, neg_y, neg_z)
        else:
            negs = (jnp.sum(dxk) < 0.0, jnp.sum(dyk) < 0.0,
                    jnp.sum(dzk) < 0.0)
        soff = k * STACK_DEPTH

        def visit(pairs_ref, leaf_ref, t_maxk, c):
            sp, t_best, slot, u, v = c
            sp = sp - 1
            m0 = stack0_ref[soff + sp]
            m1 = stack1_ref[soff + sp]
            is_leaf = m1 != 0

            def leaf_case(args):
                sp, t_best, slot, u, v = args
                leaf_slot = m1 >> 4
                count = m1 & 15
                leaf_row = leaf_slot // LEAVES_PER_ROW
                first = m0

                def tri_test(kk, st, base):
                    t_best, slot, u, v = st
                    b = base + kk * 9
                    sl = lambda j: leaf_ref[leaf_row, b + j]
                    p0x, p0y, p0z = sl(0), sl(1), sl(2)
                    e1x, e1y, e1z = sl(3), sl(4), sl(5)
                    e2x, e2y, e2z = sl(6), sl(7), sl(8)
                    pvx = dyk * e2z - dzk * e2y
                    pvy = dzk * e2x - dxk * e2z
                    pvz = dxk * e2y - dyk * e2x
                    det = e1x * pvx + e1y * pvy + e1z * pvz
                    inv_det = jnp.where(jnp.abs(det) > 1e-12, 1.0 / det, 0.0)
                    sx, sy, sz = oxk - p0x, oyk - p0y, ozk - p0z
                    uu = (sx * pvx + sy * pvy + sz * pvz) * inv_det
                    qx = sy * e1z - sz * e1y
                    qy = sz * e1x - sx * e1z
                    qz = sx * e1y - sy * e1x
                    vv = (dxk * qx + dyk * qy + dzk * qz) * inv_det
                    tt = (e2x * qx + e2y * qy + e2z * qz) * inv_det
                    ok = (
                        (kk < count)
                        & (uu >= 0.0) & (uu <= 1.0)
                        & (vv >= 0.0) & (uu + vv <= 1.0)
                        & (tt > 0.0) & (tt < t_best)
                    )
                    # any-hit early-out: record the hit as NEGATED t —
                    # a negative pruning bound fails every later slab and
                    # Möller test, so occluded rays contribute nothing to
                    # the rest of the traversal (whole subtrees stop being
                    # pushed once a block's live mask empties); run_seg
                    # flips the sign back on exit. Safe unconditionally:
                    # every any-hit consumer reduces the Hit to a boolean
                    # (pathtracer alpha rounds use CLOSEST traces), and
                    # "any hit exists" is the same answer whether the first
                    # or the nearest one is recorded.
                    t_best = jnp.where(ok, -tt if any_hit else tt, t_best)
                    slot = jnp.where(ok, first + kk, slot)
                    u = jnp.where(ok, uu, u)
                    v = jnp.where(ok, vv, v)
                    return t_best, slot, u, v

                def run_half(base):
                    def run(st):
                        for kk in range(MAX_LEAF_PACKET):
                            st = tri_test(kk, st, base)
                        return st

                    return run

                if LEAVES_PER_ROW == 1:
                    t_best, slot, u, v = run_half(0)((t_best, slot, u, v))
                else:
                    # lane offsets must be static: branch on the row slot
                    t_best, slot, u, v = jax.lax.switch(
                        leaf_slot % LEAVES_PER_ROW,
                        [run_half(kk * MAX_LEAF_PACKET * 9)
                         for kk in range(LEAVES_PER_ROW)],
                        (t_best, slot, u, v),
                    )
                return sp, t_best, slot, u, v

            def interior_wide_case(args):
                # 8-wide node: one pop tests all 8 child boxes; per-child
                # any-hit counts come from 4 packed reduces (2x16-bit
                # fields) whose scalar reads pipeline.
                sp, t_best, slot, u, v = args
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
                                sl(b + 3), sl(b + 4), sl(b + 5), t_best,
                            )
                            hs.append(h.astype(jnp.int32))
                            mets.append(sl(b + 6).astype(jnp.int32))
                            mets.append(sl(b + 7).astype(jnp.int32))
                        if REDUCE == "orroll":
                            m = hs[0]
                            for cc in range(1, 8):
                                m = m | (hs[cc] << cc)
                            for sh in (64, 32, 16, 8, 4, 2, 1):
                                m = m | pltpu.roll(m, sh, axis=1)
                            sh = rc // 2
                            while sh >= 1:
                                m = m | pltpu.roll(m, sh, axis=0)
                                sh //= 2
                            return (*mets, jnp.sum(jax.lax.slice(m, (0, 0), (1, 1))))
                        sums = [
                            jnp.sum(hs[2 * i] + (hs[2 * i + 1] << 16))
                            for i in range(4)
                        ]
                        return (*mets, *sums)

                    return inner

                vals = jax.lax.switch(wnode & 1, [whalf(0), whalf(64)], None)
                m0s = [vals[2 * cc] for cc in range(8)]
                m1s = [vals[2 * cc + 1] for cc in range(8)]
                ns = []
                if REDUCE == "orroll":
                    bits = vals[16]
                    ns = [(bits >> cc) & 1 for cc in range(8)]
                else:
                    for i in range(4):
                        s = vals[16 + i]
                        ns.append(s & 0xFFFF)
                        ns.append(s >> 16)
                neg = jnp.where(axis == 0, negs[0],
                                jnp.where(axis == 1, negs[1], negs[2]))
                # children sorted ascending along axis at build time; push
                # far-to-near: positive dir -> push 7..0 (pop 0 first)
                for kk in range(8):
                    pm0 = jnp.where(neg, m0s[kk], m0s[7 - kk])
                    pm1 = jnp.where(neg, m1s[kk], m1s[7 - kk])
                    pn = jnp.where(neg, ns[kk], ns[7 - kk])
                    do = pn > 0

                    @pl.when(do)
                    def _(pm0=pm0, pm1=pm1, sp=sp):
                        stack0_ref[soff + sp] = pm0
                        stack1_ref[soff + sp] = pm1

                    sp = sp + do.astype(jnp.int32)
                return sp, t_best, slot, u, v

            def interior_case(args):
                sp, t_best, slot, u, v = args
                axis = m0 & 3
                p = m0 >> 2
                row = 1 + (p >> 3)

                def half(off):
                    def inner(_):
                        sl = lambda j: pairs_ref[row, off + j]
                        h0, _tn0 = _slab(
                            oxk, oyk, ozk, ixk, iyk, izk,
                            sl(0), sl(1), sl(2), sl(3), sl(4), sl(5), t_best,
                        )
                        h1, _tn1 = _slab(
                            oxk, oyk, ozk, ixk, iyk, izk,
                            sl(6), sl(7), sl(8), sl(9), sl(10), sl(11), t_best,
                        )
                        a0 = sl(12).astype(jnp.int32)
                        a1 = sl(13).astype(jnp.int32)
                        b0 = sl(14).astype(jnp.int32)
                        b1 = sl(15).astype(jnp.int32)
                        s = jnp.sum(h0.astype(jnp.int32) + (h1.astype(jnp.int32) << 16))
                        return a0, a1, b0, b1, s

                    return inner

                # 8 pairs per 128-lane row (lane offsets must be static)
                a0, a1, b0, b1, s = jax.lax.switch(
                    p & 7, [half(kk * 16) for kk in range(8)], None
                )
                n0 = s & 0xFFFF
                n1 = s >> 16
                neg = jnp.where(axis == 0, negs[0],
                                jnp.where(axis == 1, negs[1], negs[2]))
                both = (n0 > 0) & (n1 > 0)
                far0 = jnp.where(neg, a0, b0)
                far1 = jnp.where(neg, a1, b1)
                near0 = jnp.where(neg, b0, a0)
                near1 = jnp.where(neg, b1, a1)
                only0 = jnp.where(n0 > 0, a0, b0)
                only1 = jnp.where(n0 > 0, a1, b1)
                near0 = jnp.where(both, near0, only0)
                near1 = jnp.where(both, near1, only1)
                do_far = both
                do_near = (n0 > 0) | (n1 > 0)

                @pl.when(do_far)
                def _():
                    stack0_ref[soff + sp] = far0
                    stack1_ref[soff + sp] = far1

                sp = sp + do_far.astype(jnp.int32)

                @pl.when(do_near)
                def _():
                    stack0_ref[soff + sp] = near0
                    stack1_ref[soff + sp] = near1

                sp = sp + do_near.astype(jnp.int32)
                return sp, t_best, slot, u, v

            sp, t_best, slot, u, v = jax.lax.cond(
                is_leaf, leaf_case,
                interior_wide_case if wide else interior_case,
                (sp, t_best, slot, u, v),
            )
            return (sp, t_best, slot, u, v), is_leaf

        return csl, visit

    chain_ctx = [make_chain(k) for k in range(chains)]

    def run_seg(pairs_ref, leaf_ref, t_maxk):
        rm0 = pairs_ref[0, 0].astype(jnp.int32)
        rm1 = pairs_ref[0, 1].astype(jnp.int32)
        rb = (pairs_ref[0, 2], pairs_ref[0, 3], pairs_ref[0, 4],
              pairs_ref[0, 5], pairs_ref[0, 6], pairs_ref[0, 7])
        sps, ts, slots, us, vs, tmaxs = [], [], [], [], [], []
        for k, (csl, _visit) in enumerate(chain_ctx):
            tmk = csl(t_maxk)
            tmaxs.append(tmk)
            oxk, oyk, ozk = csl(ox), csl(oy), csl(oz)
            ixk, iyk, izk = csl(ix), csl(iy), csl(iz)
            rhit, _ = _slab(oxk, oyk, ozk, ixk, iyk, izk, *rb, tmk)
            any_root = jnp.sum(rhit.astype(jnp.int32)) > 0
            stack0_ref[k * STACK_DEPTH] = rm0
            stack1_ref[k * STACK_DEPTH] = rm1
            sps.append(jnp.where(any_root, jnp.int32(1), jnp.int32(0)))
            ts.append(tmk)
            slots.append(jnp.full((rc, 128), -1, jnp.int32))
            us.append(jnp.zeros((rc, 128), jnp.float32))
            vs.append(jnp.zeros((rc, 128), jnp.float32))

        C = chains

        def cond(c):
            alive = c[0] > 0
            for k in range(1, C):
                alive = alive | (c[k] > 0)
            return alive

        def body(c):
            sps = list(c[:C])
            per = list(c[C:-1])  # t/slot/u/v per chain, flattened
            it = c[-1]
            n_leaf = jnp.int32(0)
            for k in range(C):
                carry_k = (sps[k], per[4 * k], per[4 * k + 1],
                           per[4 * k + 2], per[4 * k + 3])

                def do_visit(ck, k=k):
                    (sp, t_b, sl_, u_, v_), is_leaf = chain_ctx[k][1](
                        pairs_ref, leaf_ref, tmaxs[k], ck)
                    return sp, t_b, sl_, u_, v_, is_leaf.astype(jnp.int32)

                def idle(ck):
                    return (*ck, jnp.int32(0))

                sp, t_b, sl_, u_, v_, lf = jax.lax.cond(
                    sps[k] > 0, do_visit, idle, carry_k)
                sps[k] = sp
                per[4 * k] = t_b
                per[4 * k + 1] = sl_
                per[4 * k + 2] = u_
                per[4 * k + 3] = v_
                n_leaf = n_leaf + lf
            it = it + 1 + (n_leaf << 16)
            if any_hit:
                # the cross-lane reduce is expensive — poll for termination
                # only every 16 iterations
                def check(sps_t):
                    out = []
                    for k in range(C):
                        all_done = (
                            jnp.sum(((per[4 * k] < tmaxs[k])
                                     | (tmaxs[k] <= 0.0)).astype(jnp.int32))
                            >= rc * 128
                        )
                        out.append(jnp.where(all_done, 0, sps_t[k]))
                    return tuple(out)

                sps = list(jax.lax.cond(
                    (it & 15) == 0, check, lambda x: tuple(x), tuple(sps)))
            return (*sps, *per, it)

        init = (*sps, *[x for k in range(C)
                        for x in (ts[k], slots[k], us[k], vs[k])],
                jnp.int32(0))
        res = jax.lax.while_loop(cond, body, init)
        per = res[C:-1]
        iters = res[-1]
        t = jnp.concatenate([per[4 * k] for k in range(C)], axis=0)
        slot = jnp.concatenate([per[4 * k + 1] for k in range(C)], axis=0)
        u = jnp.concatenate([per[4 * k + 2] for k in range(C)], axis=0)
        v = jnp.concatenate([per[4 * k + 3] for k in range(C)], axis=0)
        if any_hit:
            # undo the early-out encoding: hits carried their t negated
            t = jnp.where(slot >= 0, -t, t)
        return t, slot, u, v, iters

    return run_seg


def _make_kernel(any_hit: bool, rows: int = PACKET_ROWS, wide: bool = False,
                 debug_iters: bool = False, chains: int = 1):
    packet = rows * 128
    def kernel(
        pairs_hbm, leaf_hbm,
        ox_ref, oy_ref, oz_ref, dx_ref, dy_ref, dz_ref, tmax_ref,
        t_ref, slot_ref, u_ref, v_ref,
        *rest,
    ):
        if debug_iters:
            (iters_ref, pairs_ref, leaf_ref, stack0_ref, stack1_ref,
             dma_sems) = rest
        else:
            pairs_ref, leaf_ref, stack0_ref, stack1_ref, dma_sems = rest
        @pl.when(pl.program_id(0) == 0)
        def _():
            cp = pltpu.make_async_copy(pairs_hbm, pairs_ref, dma_sems.at[0])
            cp.start()
            cp.wait()
            cp = pltpu.make_async_copy(leaf_hbm, leaf_ref, dma_sems.at[1])
            cp.start()
            cp.wait()

        ox, oy, oz = ox_ref[:], oy_ref[:], oz_ref[:]
        dx, dy, dz = dx_ref[:], dy_ref[:], dz_ref[:]
        t_max = tmax_ref[:]
        tiny = jnp.float32(1e-20)
        sgn = lambda d: jnp.where(d < 0, -tiny, tiny)
        ix = 1.0 / jnp.where(jnp.abs(dx) < tiny, sgn(dx), dx)
        iy = 1.0 / jnp.where(jnp.abs(dy) < tiny, sgn(dy), dy)
        iz = 1.0 / jnp.where(jnp.abs(dz) < tiny, sgn(dz), dz)

        # packet's dominant direction sign per axis (near/far ordering)
        neg_x = jnp.sum(dx) < 0.0
        neg_y = jnp.sum(dy) < 0.0
        neg_z = jnp.sum(dz) < 0.0

        run_seg = _build_run_seg(
            any_hit, rows, wide, packet,
            ox, oy, oz, dx, dy, dz, ix, iy, iz,
            neg_x, neg_y, neg_z, stack0_ref, stack1_ref,
            chains=chains)
        t, slot, u, v, iters = run_seg(pairs_ref, leaf_ref, t_max)
        t_ref[:] = t
        slot_ref[:] = slot
        u_ref[:] = u
        v_ref[:] = v
        if debug_iters:
            iters_ref[:] = jnp.full((rows, 128), iters, jnp.int32)

    return kernel


def _pallas_trace(ps: PacketScene, o, d, t_max, any_hit: bool, interpret: bool,
                  rows: int = PACKET_ROWS, debug_iters: bool = False,
                  tag: str = ""):
    r = o.shape[0]
    packet = rows * 128
    pad = (-r) % packet
    if pad:
        # dead-ray padding (t_max<0 exits the root test immediately)
        o = jnp.concatenate([o, jnp.zeros((pad, 3), o.dtype)])
        d = jnp.concatenate([d, jnp.ones((pad, 3), d.dtype)])
        t_max = jnp.concatenate([t_max, jnp.full((pad,), -1.0, t_max.dtype)])
    rp = r + pad
    n_pk = rp // packet
    shape8 = (n_pk * rows, 128)
    ox = o[:, 0].reshape(shape8)
    oy = o[:, 1].reshape(shape8)
    oz = o[:, 2].reshape(shape8)
    dx = d[:, 0].reshape(shape8)
    dy = d[:, 1].reshape(shape8)
    dz = d[:, 2].reshape(shape8)
    tm = t_max.reshape(shape8)

    ray_spec = pl.BlockSpec((rows, 128), lambda i: (i, 0), memory_space=pltpu.VMEM)
    hbm = lambda: pl.BlockSpec(memory_space=pl.ANY)

    out_shapes = [
        jax.ShapeDtypeStruct(shape8, jnp.float32),
        jax.ShapeDtypeStruct(shape8, jnp.int32),
        jax.ShapeDtypeStruct(shape8, jnp.float32),
        jax.ShapeDtypeStruct(shape8, jnp.float32),
    ]
    out_specs = [ray_spec, ray_spec, ray_spec, ray_spec]
    if debug_iters:
        out_shapes.append(jax.ShapeDtypeStruct(shape8, jnp.int32))
        out_specs.append(ray_spec)
    want = CHAINS_ANY if any_hit else CHAINS
    chains = want if rows % max(want, 1) == 0 else 1
    outs = pl.pallas_call(
        _make_kernel(any_hit, rows, wide=ps.wide, debug_iters=debug_iters,
                     chains=chains),
        # distinct names per call-site role so device profiles attribute
        # kernel time to passes (tools/bench_profile.py buckets on these)
        name=f"pt_{'any' if any_hit else 'closest'}_plain_{tag or 'x'}",
        grid=(n_pk,),
        in_specs=[
            hbm(), hbm(),
            ray_spec, ray_spec, ray_spec, ray_spec, ray_spec, ray_spec, ray_spec,
        ],
        out_specs=out_specs,
        out_shape=out_shapes,
        scratch_shapes=[
            pltpu.VMEM(ps.pairs.shape, jnp.float32),
            pltpu.VMEM(ps.leaf_geo.shape, jnp.float32),
            pltpu.SMEM((chains * STACK_DEPTH,), jnp.int32),
            pltpu.SMEM((chains * STACK_DEPTH,), jnp.int32),
            pltpu.SemaphoreType.DMA((2,)),
        ],
        interpret=interpret,
    )(ps.pairs, ps.leaf_geo, ox, oy, oz, dx, dy, dz, tm)
    t, slot, u, v = outs[:4]
    hit = Hit(
        t=t.reshape(rp)[:r], slot=slot.reshape(rp)[:r],
        u=u.reshape(rp)[:r], v=v.reshape(rp)[:r],
    )
    if debug_iters:
        return hit, outs[4].reshape(rp)[:r]
    return hit


# test hook: force interpreter mode (Mosaic kernels cannot compile on CPU)
FORCE_INTERPRET = False


@partial(jax.jit, static_argnames=("interpret", "rows", "tag"))
def packet_trace_closest(ps, o, d, t_max, interpret: bool = False,
                         rows: int = PACKET_ROWS, tag: str = "") -> Hit:
    """Closest-hit packet trace. o/d: (R,3); rows*128-ray packets.

    ps: a PacketScene, or a tuple of them (VMEM-segmented big scene) —
    segments chain with a carried t_max so later segments only refine."""
    if jnp.ndim(t_max) == 0:
        t_max = jnp.full((o.shape[0],), t_max, jnp.float32)
    t_max = t_max.astype(jnp.float32)
    itp = interpret or FORCE_INTERPRET
    if isinstance(ps, PacketScene):
        return _pallas_trace(ps, o, d, t_max, False, itp, rows, tag=tag)
    best = None
    for seg in ps:
        h = _pallas_trace(seg, o, d, t_max, False, itp, rows, tag=tag)
        if best is None:
            best = h
        else:
            closer = h.slot >= 0  # h.t < t_max implied by the hit test
            best = Hit(
                t=jnp.where(closer, h.t, best.t),
                slot=jnp.where(closer, h.slot, best.slot),
                u=jnp.where(closer, h.u, best.u),
                v=jnp.where(closer, h.v, best.v),
            )
        t_max = best.t
    return best


@partial(jax.jit, static_argnames=("interpret", "rows", "tag"))
def packet_trace_any(ps, o, d, t_max, interpret: bool = False,
                     rows: int = PACKET_ROWS, tag: str = ""):
    """Occlusion packet trace: True where something closer than t_max.
    Accepts a PacketScene or a tuple of segments (occluded rays turn into
    dead rays for the remaining segments)."""
    if jnp.ndim(t_max) == 0:
        t_max = jnp.full((o.shape[0],), t_max, jnp.float32)
    t_max = t_max.astype(jnp.float32)
    itp = interpret or FORCE_INTERPRET
    if isinstance(ps, PacketScene):
        hit = _pallas_trace(ps, o, d, t_max, True, itp, rows, tag=tag)
        return hit.slot >= 0
    occ = jnp.zeros((o.shape[0],), bool)
    for seg in ps:
        hit = _pallas_trace(seg, o, d, t_max, True, itp, rows, tag=tag)
        occ = occ | (hit.slot >= 0)
        t_max = jnp.where(occ, jnp.float32(-1.0), t_max)
    return occ

# ---------------------------------------------------------------------------
# Segment-wave tracing — treelet-style re-sorted traversal for incoherent rays
# ---------------------------------------------------------------------------
# For bounce/shadow rays the shared-stack packet pays for the UNION of node
# visits of its 4096 rays; measured lane efficiency on diffuse bounces is
# <10%. The fix is algorithmic (the TPU analogue of GPU treelet queueing /
# the reference's counting-sort reorder, PathTracer.cs:273-297): split the
# BVH into VMEM-sized subtree segments, give every ray a sort key made of
# its up-to-W nearest intersected segments (cheap (R,S) ray-vs-rootbox
# tests in plain XLA), sort ONCE, then trace wave w as S masked kernel
# calls. Each (wave, segment) group is contiguous after the sort, so its
# packets traverse one small subtree with dense lanes; packets whose rays
# are all masked exit at the root test. Rays needing >W segments finish in
# an exact chained fallback sweep (pruned by the running t_best).

WAVE_COUNT = int(__import__('os').environ.get('IDK_WAVES', '3'))


def _segment_entry_t(o, d, t_max, bmin, bmax):
    """Conservative (R,) ray/box entry distance; +inf where missed.
    Same safe-inverse convention as the kernel."""
    tiny = jnp.float32(1e-20)
    dn = jnp.where(jnp.abs(d) < tiny, jnp.where(d < 0, -tiny, tiny), d)
    inv = 1.0 / dn
    t0 = (bmin[None, :] - o) * inv
    t1 = (bmax[None, :] - o) * inv
    tn = jnp.max(jnp.minimum(t0, t1), axis=-1)
    tf = jnp.min(jnp.maximum(t0, t1), axis=-1)
    tn = jnp.maximum(tn, 0.0)
    hit = (tf >= tn) & (tn <= t_max) & (t_max > 0.0)
    return jnp.where(hit, tn, jnp.float32(jnp.inf))


def _entry_all(o, d, t_max, seg_min, seg_max, r_chunk: int = 1 << 18):
    """Yield (rows_slice, (Rc,S) entry-t) chunks for ALL segments at once.

    One batched SoA fusion per ray chunk replaces S separate sweeps that
    each re-read every ray — at 2.8M rays / 61 segments the per-segment
    Python loop was a major 'small fusions' sink in the frame profile."""
    S = seg_min.shape[0]
    R = o.shape[0]
    tiny = jnp.float32(1e-20)
    bmin = jnp.asarray(seg_min, jnp.float32)  # (S,3)
    bmax = jnp.asarray(seg_max, jnp.float32)
    for lo_i in range(0, R, r_chunk):
        sl = slice(lo_i, min(lo_i + r_chunk, R))
        ox, oy, oz = o[sl, 0:1], o[sl, 1:2], o[sl, 2:3]  # (Rc,1)
        tm = t_max[sl]

        def inv(dc):
            dn = jnp.where(jnp.abs(dc) < tiny,
                           jnp.where(dc < 0, -tiny, tiny), dc)
            return 1.0 / dn

        ix, iy, iz = inv(d[sl, 0:1]), inv(d[sl, 1:2]), inv(d[sl, 2:3])
        t0x = (bmin[None, :, 0] - ox) * ix
        t1x = (bmax[None, :, 0] - ox) * ix
        t0y = (bmin[None, :, 1] - oy) * iy
        t1y = (bmax[None, :, 1] - oy) * iy
        t0z = (bmin[None, :, 2] - oz) * iz
        t1z = (bmax[None, :, 2] - oz) * iz
        tn = jnp.maximum(jnp.maximum(jnp.minimum(t0x, t1x),
                                     jnp.minimum(t0y, t1y)),
                         jnp.minimum(t0z, t1z))
        tf = jnp.minimum(jnp.minimum(jnp.maximum(t0x, t1x),
                                     jnp.maximum(t0y, t1y)),
                         jnp.maximum(t0z, t1z))
        tn = jnp.maximum(tn, 0.0)
        hit = (tf >= tn) & (tn <= tm[:, None]) & (tm[:, None] > 0.0)
        yield sl, jnp.where(hit, tn, jnp.float32(jnp.inf))


def _nearest_segments(o, d, t_max, seg_min, seg_max, n, want_count=False):
    """Per-ray ids of the n nearest intersected segments (S = id means
    'none'), via batched entry chunks + top_k. With want_count also returns
    the per-ray TOTAL intersected-segment count (the re-binned pair path
    uses it to route >n-segment rays to its exact residual)."""
    S = seg_min.shape[0]
    ids_parts, ts_parts, cnt_parts = [], [], []
    for _sl, ent in _entry_all(o, d, t_max, seg_min, seg_max):
        neg, idx = jax.lax.top_k(-ent, min(n, S))
        ts_parts.append(-neg)
        ids_parts.append(jnp.where(jnp.isfinite(neg), idx.astype(jnp.int32),
                                   jnp.int32(S)))
        if want_count:
            cnt_parts.append((ent < jnp.inf).sum(axis=1).astype(jnp.int32))
    ts_all = jnp.concatenate(ts_parts, axis=0)
    ids_all = jnp.concatenate(ids_parts, axis=0)
    k = ids_all.shape[1]
    ids = [ids_all[:, i] if i < k else jnp.full((o.shape[0],), S, jnp.int32)
           for i in range(n)]
    ts = [ts_all[:, i] if i < k
          else jnp.full((o.shape[0],), jnp.inf, jnp.float32)
          for i in range(n)]
    if want_count:
        return ids, ts, jnp.concatenate(cnt_parts, axis=0)
    return ids, ts


def segment_wave_key(o, d, t_max, seg_min, seg_max, lo, ext,
                     n_waves: int = WAVE_COUNT, cell_bits: int = 4):
    """Sort key for wave tracing: nested grouping by the ray's 1st..n-th
    nearest segment, then direction octant + origin cell for stack-union
    coherence inside the innermost group. Dead rays key to the max value.
    Measured (tools/bench_waves.py, atrium 110k, 29 segments): this key
    alone cuts the plain chained bounce-closest trace 197→148 ms vs the
    octant+cell key — segment ids align packets with BVH topology.
    The nesting depth auto-shrinks so the key fits 31 bits."""
    import math

    S = seg_min.shape[0]
    sub_bits = 3 + 3 * cell_bits
    n_nest = n_waves
    while n_nest > 1 and \
            n_nest * math.ceil(math.log2(S + 1)) + sub_bits > 31:
        n_nest -= 1
    ids, _ts = _nearest_segments(o, d, t_max, seg_min, seg_max, n_nest)
    key = jnp.zeros((o.shape[0],), jnp.int32)
    for k in range(n_nest):
        key = key * (S + 1) + ids[k]
    oc = ((d[:, 0] >= 0) * 1 + (d[:, 1] >= 0) * 2
          + (d[:, 2] >= 0) * 4).astype(jnp.int32)
    n = 1 << cell_bits
    q = jnp.clip((o - lo[None, :]) / jnp.maximum(ext[None, :], 1e-6) * n,
                 0, n - 1).astype(jnp.int32)
    cell = (q[:, 0] << (2 * cell_bits)) | (q[:, 1] << cell_bits) | q[:, 2]
    key = (key << sub_bits) | (oc << (3 * cell_bits)) | cell
    return jnp.where(t_max > 0.0, key, jnp.int32(0x7FFFFFFF))


def _merge_hits(best, h):
    closer = h.slot >= 0
    return Hit(
        t=jnp.where(closer, h.t, best.t),
        slot=jnp.where(closer, h.slot, best.slot),
        u=jnp.where(closer, h.u, best.u),
        v=jnp.where(closer, h.v, best.v),
    )


@partial(jax.jit, static_argnames=("interpret", "rows", "n_waves"))
def packet_trace_closest_waves(ps_segs, seg_min, seg_max, o, d, t_max,
                               interpret: bool = False,
                               rows: int = PACKET_ROWS,
                               n_waves: int = WAVE_COUNT) -> Hit:
    """Closest-hit over a segmented scene using wave scheduling. Exact: the
    result equals the chained segment trace (ties between equal-t hits may
    resolve to either). Rays should be pre-sorted with segment_wave_key for
    performance; correctness does not depend on the order."""
    if jnp.ndim(t_max) == 0:
        t_max = jnp.full((o.shape[0],), t_max, jnp.float32)
    t_max = t_max.astype(jnp.float32)
    itp = interpret or FORCE_INTERPRET
    S = len(ps_segs)
    R = o.shape[0]
    ids, _ = _nearest_segments(o, d, t_max, seg_min, seg_max, n_waves)
    best = Hit(t=t_max, slot=jnp.full((R,), -1, jnp.int32),
               u=jnp.zeros((R,)), v=jnp.zeros((R,)))
    for w in range(n_waves):
        selw = ids[w]
        for s in range(S):
            tm_s = jnp.where(selw == s, best.t, jnp.float32(-1.0))
            h = _pallas_trace(ps_segs[s], o, d, tm_s, False, itp, rows)
            best = _merge_hits(best, h)
    # exact fallback: segments beyond the first n_waves, pruned by the
    # (now much tighter) running t_best
    for s in range(S):
        t = _segment_entry_t(o, d, best.t, jnp.asarray(seg_min[s]),
                             jnp.asarray(seg_max[s]))
        need = t < jnp.inf
        for w in range(n_waves):
            need = need & (ids[w] != s)
        tm_s = jnp.where(need, best.t, jnp.float32(-1.0))
        h = _pallas_trace(ps_segs[s], o, d, tm_s, False, itp, rows)
        best = _merge_hits(best, h)
    return best


@partial(jax.jit, static_argnames=("interpret", "rows", "n_waves"))
def packet_trace_any_waves(ps_segs, seg_min, seg_max, o, d, t_max,
                           interpret: bool = False,
                           rows: int = PACKET_ROWS,
                           n_waves: int = WAVE_COUNT):
    """Occlusion over a segmented scene with wave scheduling (exact)."""
    if jnp.ndim(t_max) == 0:
        t_max = jnp.full((o.shape[0],), t_max, jnp.float32)
    t_max = t_max.astype(jnp.float32)
    itp = interpret or FORCE_INTERPRET
    S = len(ps_segs)
    R = o.shape[0]
    ids, _ = _nearest_segments(o, d, t_max, seg_min, seg_max, n_waves)
    occ = jnp.zeros((R,), bool)
    for w in range(n_waves):
        selw = ids[w]
        for s in range(S):
            tm_s = jnp.where((selw == s) & ~occ, t_max, jnp.float32(-1.0))
            h = _pallas_trace(ps_segs[s], o, d, tm_s, True, itp, rows)
            occ = occ | (h.slot >= 0)
    for s in range(S):
        t = _segment_entry_t(o, d, t_max, jnp.asarray(seg_min[s]),
                             jnp.asarray(seg_max[s]))
        need = (t < jnp.inf) & ~occ
        for w in range(n_waves):
            need = need & (ids[w] != s)
        tm_s = jnp.where(need, t_max, jnp.float32(-1.0))
        h = _pallas_trace(ps_segs[s], o, d, tm_s, True, itp, rows)
        occ = occ | (h.slot >= 0)
    return occ

# ---------------------------------------------------------------------------
# Multi-steer kernel: one launch traces every ray through its needed segments
# ---------------------------------------------------------------------------
# The wave scheduler above is exact but needs S*(W+1) launches whose dead
# packets dominate. This variant keeps ONE launch: rays are pre-sorted by
# segment_wave_key, each packet carries a short list of steered segment ids
# (an SMEM block input), and the kernel loops over them, double-buffering
# the segment tables HBM→VMEM with dynamic-offset DMAs while the previous
# segment traces. Rays whose needed segments aren't all steered finish in
# the chained fallback sweep (exact).

STEER_K = int(__import__("os").environ.get("IDK_STEER_K", "8"))
# while_loop steered kernel with FULL per-packet segment coverage (one
# launch, in-kernel best-t carry) instead of the unrolled two-pass
# (pass + residual + backstop) scheme: measured 2.2x on 2.8M bounce
# closest (1995 -> 893 ms) and 1.9x on NEE any (375 -> 193 ms), exact.
# See _make_kernel_steered_loop / BENCH_NOTES 'Steered loop kernel'.
STEER_LOOP = int(__import__("os").environ.get("IDK_STEER_LOOP", "1"))
# Per-segment table budget for the steered kernel: the kernel double-buffers
# one segment's pairs+leaf tables in scoped VMEM (2x budget) next to the ray
# blocks/outputs and the ~16 MB scoped limit. 13 MB whole-scene segments are
# fine for the resident chained kernel but NOT steerable.
STEER_VMEM_BUDGET = int(__import__("os").environ.get(
    "IDK_STEER_VMEM", "5000000"))


@jax.tree_util.register_pytree_node_class
@dataclass
class WaveSet:
    """Segment set for wave-key sorting + steered traversal: the segment
    PacketScenes, their row-concatenated tables (for the steered kernel's
    dynamic-offset DMAs) and the per-segment root boxes (sort keys)."""

    segs: tuple  # of PacketScene (common-padded shapes)
    pairs_stack: jnp.ndarray  # (S*PR, 128)
    leaf_stack: jnp.ndarray  # (S*LR, 128)
    seg_min: jnp.ndarray  # (S,3)
    seg_max: jnp.ndarray  # (S,3)
    # per-leaf-slot side tables by stacked row id (two-phase tracer)
    first_stack: jnp.ndarray | None = None  # (S*LS,) i32
    count_stack: jnp.ndarray | None = None  # (S*LS,) i32

    def tree_flatten(self):
        return (self.segs, self.pairs_stack, self.leaf_stack,
                self.seg_min, self.seg_max, self.first_stack,
                self.count_stack), None

    @classmethod
    def tree_unflatten(cls, aux, ch):
        return cls(*ch)


def _make_kernel_steered(any_hit: bool, rows: int, wide: bool, K: int,
                         PR: int, LR: int, chains: int = 1):
    packet = rows * 128

    def kernel(
        steer_ref,
        ox_ref, oy_ref, oz_ref, dx_ref, dy_ref, dz_ref, tmax_ref,
        pairs_hbm, leaf_hbm,
        t_ref, slot_ref, u_ref, v_ref,
        pairs_buf, leaf_buf, stack0_ref, stack1_ref, dma_sems,
    ):
        ox, oy, oz = ox_ref[:], oy_ref[:], oz_ref[:]
        dx, dy, dz = dx_ref[:], dy_ref[:], dz_ref[:]
        t_base = tmax_ref[:]
        tiny = jnp.float32(1e-20)
        sgn = lambda v: jnp.where(v < 0, -tiny, tiny)
        ix = 1.0 / jnp.where(jnp.abs(dx) < tiny, sgn(dx), dx)
        iy = 1.0 / jnp.where(jnp.abs(dy) < tiny, sgn(dy), dy)
        iz = 1.0 / jnp.where(jnp.abs(dz) < tiny, sgn(dz), dz)
        neg_x = jnp.sum(dx) < 0.0
        neg_y = jnp.sum(dy) < 0.0
        neg_z = jnp.sum(dz) < 0.0
        run_seg = _build_run_seg(
            any_hit, rows, wide, packet,
            ox, oy, oz, dx, dy, dz, ix, iy, iz,
            neg_x, neg_y, neg_z, stack0_ref, stack1_ref,
            chains=chains)

        pid = pl.program_id(0)

        # steer words are FLAT-packed 128/row (see _pallas_trace_steered):
        # a (n_pk, K) scalar-prefetch operand is lane-padded to 128 words
        # per row in SMEM, which blows the 1 MB budget once n_pk is large
        def sread(k):
            p = pid * K + k
            return steer_ref[p // 128, p % 128]

        def start_dma(k, buf):
            st = sread(k)

            @pl.when(st >= 0)
            def _():
                pltpu.make_async_copy(
                    pairs_hbm.at[pl.ds(st * PR, PR)],
                    pairs_buf.at[buf], dma_sems.at[2 * buf]).start()
                pltpu.make_async_copy(
                    leaf_hbm.at[pl.ds(st * LR, LR)],
                    leaf_buf.at[buf], dma_sems.at[2 * buf + 1]).start()

        start_dma(0, 0)
        t_cur = t_base
        slot_cur = jnp.full((rows, 128), -1, jnp.int32)
        u_cur = jnp.zeros((rows, 128), jnp.float32)
        v_cur = jnp.zeros((rows, 128), jnp.float32)
        for k in range(K):
            st = sread(k)
            if k + 1 < K:
                start_dma(k + 1, (k + 1) % 2)

            def trace_k(carry, st=st, buf=k % 2):
                t_cur, slot_cur, u_cur, v_cur = carry
                pltpu.make_async_copy(
                    pairs_hbm.at[pl.ds(st * PR, PR)],
                    pairs_buf.at[buf], dma_sems.at[2 * buf]).wait()
                pltpu.make_async_copy(
                    leaf_hbm.at[pl.ds(st * LR, LR)],
                    leaf_buf.at[buf], dma_sems.at[2 * buf + 1]).wait()
                # no per-ray membership mask: the sub-trace's own root
                # test kills rays missing this segment's box, and t_best
                # pruning kills rays whose hit is already closer — steering
                # near-first makes later sub-traces cheap
                if any_hit:
                    tk = jnp.where(slot_cur < 0, t_cur, jnp.float32(-1.0))
                else:
                    tk = t_cur
                t_k, slot_k, u_k, v_k, _it = run_seg(
                    pairs_buf.at[buf], leaf_buf.at[buf], tk)
                hit_k = slot_k >= 0
                return (jnp.where(hit_k, t_k, t_cur),
                        jnp.where(hit_k, slot_k, slot_cur),
                        jnp.where(hit_k, u_k, u_cur),
                        jnp.where(hit_k, v_k, v_cur))

            t_cur, slot_cur, u_cur, v_cur = jax.lax.cond(
                st >= 0, trace_k, lambda c: c,
                (t_cur, slot_cur, u_cur, v_cur))
        t_ref[:] = t_cur
        slot_ref[:] = slot_cur
        u_ref[:] = u_cur
        v_ref[:] = v_cur

    return kernel


# f32 bit pattern of the loop kernel's initial "live" bound (any finite
# packed suffix bound must pass the first cond check)
_F32MAX_BITS = int(np.float32(3.4e38).view(np.int32))


def _pack_steer_suffix(steer, suffix):
    """Pack steer ids and the ordered-termination bound into ONE int32
    scalar-prefetch word per slot: low 16 bits = segment id + 1 (0 marks an
    invalid slot), high 16 = the bound's truncated f32 bits. The bound is
    clamped to >= 0 first (hit t is never negative, so 0 is a valid lower
    bound) — truncating a non-negative float's low mantissa bits only
    lowers it, keeping the early-exit exact. A second (n_pk, K) f32
    prefetch operand overflowed the 1 MB SMEM at the 2.8M config."""
    assert steer.shape == suffix.shape, (steer.shape, suffix.shape)
    sfx = jnp.maximum(suffix.astype(jnp.float32), 0.0)
    sfx_bits = jax.lax.bitcast_convert_type(sfx, jnp.int32)
    return jnp.where(steer >= 0,
                     (sfx_bits & jnp.int32(-65536)) | (steer + 1),
                     jnp.int32(0))


def _make_kernel_steered_loop(any_hit: bool, rows: int, wide: bool, K: int,
                              PR: int, LR: int, chains: int = 1):
    """Steered kernel with a while_loop over the steer slots instead of the
    unrolled K iterations of _make_kernel_steered. Code size is then
    K-independent, so K can cover ALL of a packet's intersected segments
    (the steering build packs valid ids as a near-first PREFIX, -1 after,
    so the loop early-exits at the packet's real segment count). best-t
    carries across segments IN-KERNEL — one launch replaces the two-pass
    (pass + residual) scheme plus its per-segment backstop sweeps, which
    the 2.8M A/B profile measured at ~60% of the steered path's device
    time (BENCH_NOTES 'Two-phase A/B'). Double-buffered segment DMA as in
    the unrolled kernel; the traced buffer index is resolved with two
    static pl.when branches."""

    def kernel(
        steer_ref,
        ox_ref, oy_ref, oz_ref, dx_ref, dy_ref, dz_ref, tmax_ref,
        pairs_hbm, leaf_hbm,
        t_ref, slot_ref, u_ref, v_ref,
        pairs_buf, leaf_buf, stack0_ref, stack1_ref, dma_sems,
    ):
        ox, oy, oz = ox_ref[:], oy_ref[:], oz_ref[:]
        dx, dy, dz = dx_ref[:], dy_ref[:], dz_ref[:]
        t_base = tmax_ref[:]
        tiny = jnp.float32(1e-20)
        sgn = lambda v: jnp.where(v < 0, -tiny, tiny)
        ix = 1.0 / jnp.where(jnp.abs(dx) < tiny, sgn(dx), dx)
        iy = 1.0 / jnp.where(jnp.abs(dy) < tiny, sgn(dy), dy)
        iz = 1.0 / jnp.where(jnp.abs(dz) < tiny, sgn(dz), dz)
        neg_x = jnp.sum(dx) < 0.0
        neg_y = jnp.sum(dy) < 0.0
        neg_z = jnp.sum(dz) < 0.0
        run_seg = _build_run_seg(
            any_hit, rows, wide, rows * 128,
            ox, oy, oz, dx, dy, dz, ix, iy, iz,
            neg_x, neg_y, neg_z, stack0_ref, stack1_ref,
            chains=chains)

        pid = pl.program_id(0)

        def start_dma(st, buf):
            """Kick both table copies for segment `st` into buffer `buf`
            (both traced scalars; caller guards st >= 0)."""
            for b in (0, 1):
                @pl.when(buf == b)
                def _(b=b):
                    pltpu.make_async_copy(
                        pairs_hbm.at[pl.ds(st * PR, PR)],
                        pairs_buf.at[b], dma_sems.at[2 * b]).start()
                    pltpu.make_async_copy(
                        leaf_hbm.at[pl.ds(st * LR, LR)],
                        leaf_buf.at[b], dma_sems.at[2 * b + 1]).start()

        def wait_dma(st, buf):
            for b in (0, 1):
                @pl.when(buf == b)
                def _(b=b):
                    pltpu.make_async_copy(
                        pairs_hbm.at[pl.ds(st * PR, PR)],
                        pairs_buf.at[b], dma_sems.at[2 * b]).wait()
                    pltpu.make_async_copy(
                        leaf_hbm.at[pl.ds(st * LR, LR)],
                        leaf_buf.at[b], dma_sems.at[2 * b + 1]).wait()

        # Packed steer word (see _pack_steer_suffix): low 16 bits = segment
        # id + 1 (0 = invalid slot), high 16 = the suffix-min entry-t bound
        # as truncated-f32 bits. One scalar-prefetch array instead of two:
        # a second (n_pk, K) f32 suffix operand blew the 1 MB SMEM budget
        # at the 2.8M config (s32+f32 [1024,65] operands -> 'Ran out of
        # memory in memory space smem ... exceeded by 2.1K').
        # The words are FLAT-packed 128/row (see _pallas_trace_steered): a
        # (n_pk, K) prefetch operand lane-pads each row to 128 words, which
        # at the rebin path's n_pk (one steer slot per PACKET of ray-segment
        # pairs) hit u8[1716224] > 1 MB SMEM — the round-5 remote-compile
        # failure at 1080p ray counts.
        def sread(k):
            p = pid * K + k
            return steer_ref[p // 128, p % 128]

        pk0 = sread(0)
        st0 = (pk0 & 0xFFFF) - 1

        @pl.when(st0 >= 0)
        def _():
            start_dma(st0, jnp.int32(0))

        init = (jnp.int32(0), st0 >= 0, jnp.int32(_F32MAX_BITS), t_base,
                jnp.full((rows, 128), -1, jnp.int32),
                jnp.zeros((rows, 128), jnp.float32),
                jnp.zeros((rows, 128), jnp.float32))

        def cond(c):
            # c[1] is the continuation decided by the PREVIOUS body (or the
            # slot-0 validity for the first iteration): true iff slot c[0]'s
            # segment DMA was started. The ordered-termination bound test
            # lives in `body`, NOT here — cond must return exactly "was the
            # DMA for this slot kicked off", or an early exit would leave an
            # in-flight async copy whose semaphore is never awaited, which
            # hard-aborts the chip ('ABORTED: TPU backend error').
            return c[1]

        def body(c):
            k, _cont, s_bits, t_cur, slot_cur, u_cur, v_cur = c
            st = (sread(k) & 0xFFFF) - 1
            buf = jax.lax.rem(k, 2)
            pk_next = sread(jnp.minimum(k + 1, K - 1))
            # Ordered termination, decided BEFORE the prefetch: slots are
            # near-first and the packed high half carries the suffix-min of
            # the packet's entry t per slot — no segment from k+1 on can
            # produce a hit below that bound, so stop once every ray's
            # current best (closest) / remaining budget (any) sits under
            # it. The bound used here is one body stale (end of body k-1),
            # i.e. looser — the exit fires at most one slot late, never
            # early, so it stays exact. Both sides compare as int32: for
            # floats >= 0 the bit pattern is order-isomorphic, and a
            # negative s_bits (all rays done in any-hit mode) makes every
            # bound "too far" — also the wanted outcome. Deciding here (and
            # having cond consume the decision) guarantees every started
            # DMA is waited by the body that follows.
            cont = ((k + 1 < K) & ((pk_next & 0xFFFF) > 0)
                    & ((pk_next & jnp.int32(-65536)) <= s_bits))

            @pl.when(cont)
            def _():
                start_dma((pk_next & 0xFFFF) - 1, jax.lax.rem(k + 1, 2))

            wait_dma(st, buf)
            if any_hit:
                tk = jnp.where(slot_cur < 0, t_cur, jnp.float32(-1.0))
            else:
                tk = t_cur

            def seg_on(b):
                def run(_):
                    t_k, slot_k, u_k, v_k, _it = run_seg(
                        pairs_buf.at[b], leaf_buf.at[b], tk)
                    return t_k, slot_k, u_k, v_k

                return run

            t_k, slot_k, u_k, v_k = jax.lax.switch(
                buf, [seg_on(0), seg_on(1)], None)
            hit_k = slot_k >= 0
            t_nxt = jnp.where(hit_k, t_k, t_cur)
            slot_nxt = jnp.where(hit_k, slot_k, slot_cur)
            if any_hit:
                # remaining budget of still-undone rays (t_base < 0 = dead,
                # hits are done): -inf once all done -> loop stops
                live = jnp.where((slot_nxt < 0) & (t_base > 0.0),
                                 t_base, jnp.float32(-3.4e38))
            else:
                # worst (largest) current best across the packet; misses
                # keep t_base (their t_max), so sky-bound rays hold the
                # loop open for their remaining slots
                live = t_nxt
            s_bits = jnp.max(jax.lax.bitcast_convert_type(live, jnp.int32))
            return (k + 1, cont, s_bits, t_nxt, slot_nxt,
                    jnp.where(hit_k, u_k, u_cur),
                    jnp.where(hit_k, v_k, v_cur))

        _, _, _, t_cur, slot_cur, u_cur, v_cur = jax.lax.while_loop(
            cond, body, init)
        t_ref[:] = t_cur
        slot_ref[:] = slot_cur
        u_ref[:] = u_cur
        v_ref[:] = v_cur

    return kernel


def _pallas_trace_steered(pairs_stack, leaf_stack, PR, LR, steer,
                          o, d, t_max, any_hit: bool, interpret: bool,
                          rows: int = PACKET_ROWS, wide: bool = True,
                          loop: bool = False, tag: str = "", suffix=None):
    """steer: (n_pk, K) int32 segment ids (-1 = skip), near-first. Rays and
    steering must cover the same (padded) packet layout. `wide` must match
    the layout the tables were built with (IDK_WIDE). suffix (loop mode):
    (n_pk, K) f32 suffix-min entry t per slot — the ordered-termination
    bound, packed into the steer words (_pack_steer_suffix — one SMEM
    operand, not two); None keeps the packed bound at 0 bits, which never
    triggers an early slot-loop exit."""
    r = o.shape[0]
    packet = rows * 128
    pad = (-r) % packet
    if pad:
        o = jnp.concatenate([o, jnp.zeros((pad, 3), o.dtype)])
        d = jnp.concatenate([d, jnp.ones((pad, 3), d.dtype)])
        t_max = jnp.concatenate([t_max, jnp.full((pad,), -1.0, t_max.dtype)])
    rp = r + pad
    n_pk = rp // packet
    assert steer.shape[0] == n_pk, (steer.shape, n_pk)
    K = steer.shape[1]
    shape8 = (n_pk * rows, 128)
    # steered kernel: co-chains unmeasured on this path — keep CHAINS for
    # both hit modes (CHAINS_ANY applies to the plain whole-table kernel
    # where the 12% any-hit win was measured)
    chains = CHAINS if rows % max(CHAINS, 1) == 0 else 1
    maker = _make_kernel_steered_loop if loop else _make_kernel_steered
    if loop:
        if suffix is None:
            suffix = jnp.zeros(steer.shape, jnp.float32)
        steer = _pack_steer_suffix(steer, suffix)
    # Lane-pack the prefetch words: SMEM pads every row of a (n_pk, K)
    # scalar operand to 128 words, so its true footprint is n_pk*512 B
    # regardless of K. The rebin path (K=1, one packet per ray-segment pair
    # group) overflowed the 1 MB SMEM at 1080p ray counts (u8[1716224]);
    # flat packing costs exactly n_pk*K words and also halves the regular
    # steered path's footprint. Kernels index [p//128, p%128], p = pid*K+k.
    L = n_pk * K
    steer_flat = steer.reshape(L)
    pad_w = (-L) % 128
    if pad_w:
        steer_flat = jnp.concatenate(
            [steer_flat, jnp.zeros((pad_w,), steer_flat.dtype)])
    steer = steer_flat.reshape(-1, 128)
    ray_spec_p = pl.BlockSpec((rows, 128), lambda i, steer: (i, 0),
                              memory_space=pltpu.VMEM)
    outs = pl.pallas_call(
        maker(any_hit, rows, wide=wide, K=K, PR=PR, LR=LR,
              chains=chains),
        name=(f"pt_{'any' if any_hit else 'closest'}"
              f"_steer{'loop' if loop else ''}_{tag or 'x'}"),
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=(n_pk,),
            in_specs=[
                ray_spec_p, ray_spec_p, ray_spec_p, ray_spec_p, ray_spec_p,
                ray_spec_p, ray_spec_p,
                pl.BlockSpec(memory_space=pl.ANY),
                pl.BlockSpec(memory_space=pl.ANY),
            ],
            out_specs=[ray_spec_p, ray_spec_p, ray_spec_p, ray_spec_p],
            scratch_shapes=[
                pltpu.VMEM((2, PR, 128), jnp.float32),
                pltpu.VMEM((2, LR, 128), jnp.float32),
                pltpu.SMEM((chains * STACK_DEPTH,), jnp.int32),
                pltpu.SMEM((chains * STACK_DEPTH,), jnp.int32),
                pltpu.SemaphoreType.DMA((4,)),
            ],
        ),
        out_shape=[
            jax.ShapeDtypeStruct(shape8, jnp.float32),
            jax.ShapeDtypeStruct(shape8, jnp.int32),
            jax.ShapeDtypeStruct(shape8, jnp.float32),
            jax.ShapeDtypeStruct(shape8, jnp.float32),
        ],
        interpret=interpret,
    )(
        steer,
        o[:, 0].reshape(shape8), o[:, 1].reshape(shape8),
        o[:, 2].reshape(shape8),
        d[:, 0].reshape(shape8), d[:, 1].reshape(shape8),
        d[:, 2].reshape(shape8),
        t_max.reshape(shape8), pairs_stack, leaf_stack,
    )
    t, slot, u, v = outs
    return Hit(t=t.reshape(rp)[:r], slot=slot.reshape(rp)[:r],
               u=u.reshape(rp)[:r], v=v.reshape(rp)[:r])


def _build_steering(o, d, t_max, seg_min, seg_max, packet, K,
                    exclude=None):
    """Per-packet steered segment ids: every segment any of the packet's
    rays' boxes intersect, ordered near-first (mean entry t). counts and
    mean-t come from reshape-reduces over batched entry chunks (rays
    contiguous per packet) — no scatters, one fusion per ray chunk instead
    of S sweeps. A packet intersecting more than K distinct segments leaves
    the excess to the residual steered pass / fallback sweep.

    exclude: optional (n_pk, S) bool — pairs already traced (the residual
    pass excludes the first pass's steer slots)."""
    S = seg_min.shape[0]
    rp = o.shape[0]
    n_pk = rp // packet
    c_parts, t_parts, mn_parts = [], [], []
    # chunk on packet boundaries so per-packet reduces stay within a chunk
    r_chunk = max(packet, ((1 << 18) // packet) * packet)
    for sl, ent in _entry_all(o, d, t_max, seg_min, seg_max, r_chunk):
        m = ent < jnp.inf  # (Rc, S)
        pk_c = sl.stop - sl.start
        c_parts.append(m.reshape(pk_c // packet, packet, S).sum(axis=1))
        t_parts.append(jnp.where(m, ent, 0.0)
                       .reshape(pk_c // packet, packet, S).sum(axis=1))
        mn_parts.append(jnp.where(m, ent, jnp.inf)
                        .reshape(pk_c // packet, packet, S).min(axis=1))
    counts = jnp.concatenate(c_parts, axis=0)  # (n_pk, S)
    mean_t = jnp.concatenate(t_parts, axis=0) / jnp.maximum(counts, 1)
    min_t = jnp.concatenate(mn_parts, axis=0)  # (n_pk, S) nearest entry
    hits = counts > 0
    if exclude is not None:
        counts = jnp.where(exclude, 0, counts)
    k = min(K, S)
    # pick the k most-populated segments, then order them near-first
    top, idx = jax.lax.top_k(counts, k)
    sel_t = jnp.where(top > 0, jnp.take_along_axis(mean_t, idx, axis=1),
                      jnp.inf)
    order = jnp.argsort(sel_t, axis=1)
    idx = jnp.take_along_axis(idx, order, axis=1)
    top = jnp.take_along_axis(top, order, axis=1)
    steer = jnp.where(top > 0, idx.astype(jnp.int32), jnp.int32(-1))
    # Ordered-termination bound: suffix[k] = min over slots >= k of the
    # packet's NEAREST entry t into that slot's segment. Any hit a ray can
    # still find in slots >= k satisfies t >= suffix[k], so once every
    # ray's current best (or remaining t_max for any-hit) is below it, the
    # kernel's slot loop stops — near-first ordering makes this fire after
    # the first few populated segments for surface-dense packets.
    sel_mn = jnp.where(top > 0, jnp.take_along_axis(min_t, idx, axis=1),
                       jnp.inf)
    suffix = jax.lax.cummin(sel_mn, axis=1, reverse=True)
    # per-(packet, segment) intersect flags: the fallback logic reuses these
    # instead of re-running S entry sweeps over every ray (measured ~600 ms
    # of XLA overhead at 2.8M/29 segments)
    return steer, hits, suffix


@partial(jax.jit, static_argnames=("interpret", "rows", "k_steer", "tag"))
def packet_trace_closest_steered(ps_segs, pairs_stack, leaf_stack,
                                 seg_min, seg_max, o, d, t_max,
                                 interpret: bool = False,
                                 rows: int = PACKET_ROWS,
                                 k_steer: int = STEER_K,
                                 tag: str = "") -> Hit:
    """Closest hit over a segmented scene: one steered launch + exact
    chained fallback for ray/segment pairs the steering missed. Rays should
    be pre-sorted by segment_wave_key. Equals the chained trace exactly."""
    if jnp.ndim(t_max) == 0:
        t_max = jnp.full((o.shape[0],), t_max, jnp.float32)
    t_max = t_max.astype(jnp.float32)
    itp = interpret or FORCE_INTERPRET
    S = len(ps_segs)
    R = o.shape[0]
    PR = ps_segs[0].pairs.shape[0]
    LR = ps_segs[0].leaf_geo.shape[0]
    packet = rows * 128
    pad = (-R) % packet
    op = o if pad == 0 else jnp.concatenate(
        [o, jnp.zeros((pad, 3), o.dtype)])
    dp = d if pad == 0 else jnp.concatenate(
        [d, jnp.ones((pad, 3), d.dtype)])
    tp = t_max if pad == 0 else jnp.concatenate(
        [t_max, jnp.full((pad,), -1.0, jnp.float32)])
    if STEER_LOOP:
        # single-pass full coverage: the while_loop kernel's code size is
        # K-independent, so steer EVERY intersected segment (near-first,
        # best-t pruning carries in-kernel, and the suffix-min entry bound
        # stops the slot loop once no remaining segment can beat any ray's
        # best). No residual pass, no backstop.
        steer, _hits, suffix = _build_steering(op, dp, tp, seg_min, seg_max,
                                               packet, S)
        return _pallas_trace_steered(
            pairs_stack, leaf_stack, PR, LR, steer,
            o, d, t_max, False, itp, rows, wide=ps_segs[0].wide, loop=True,
            tag=tag, suffix=suffix)
    steer, pk_hits, _sfx = _build_steering(op, dp, tp, seg_min, seg_max,
                                           packet, k_steer)
    best = _pallas_trace_steered(
        pairs_stack, leaf_stack, PR, LR, steer,
        o, d, t_max, False, itp, rows, wide=ps_segs[0].wide, tag=tag)
    seg_ids = jnp.arange(S, dtype=jnp.int32)
    done = jnp.any(steer[:, :, None] == seg_ids[None, None, :], axis=1)
    # residual steered pass: rebuild steering against the TIGHTENED best.t
    # (far segments prune away), excluding pass-1 pairs. This replaces the
    # common case of the per-segment fallback sweeps — each taken sweep was
    # a full kernel launch over mostly-dead packets (~300-400 ms/frame of
    # 'fallback conds' in the 2.8M profile).
    bt = best.t if pad == 0 else jnp.concatenate(
        [best.t, jnp.full((pad,), -1.0, jnp.float32)])
    steer2, pk_hits2, _sfx2 = _build_steering(op, dp, bt, seg_min,
                                              seg_max, packet,
                                              k_steer, exclude=done)
    h2 = _pallas_trace_steered(
        pairs_stack, leaf_stack, PR, LR, steer2,
        o, d, best.t, False, itp, rows, wide=ps_segs[0].wide, tag=tag)
    best = _merge_hits(best, h2)
    done = done | jnp.any(steer2[:, :, None] == seg_ids[None, None, :],
                          axis=1)
    # exact backstop: pairs still uncovered (beyond 2K slots) — rarely taken
    for s in range(S):
        pk_need = pk_hits2[:, s] & ~done[:, s]  # (n_pk,)

        def sweep(b, s=s, pk_need=pk_need):
            need = jnp.repeat(pk_need, packet)[:R]
            tm_s = jnp.where(need, b.t, jnp.float32(-1.0))
            h = _pallas_trace(ps_segs[s], o, d, tm_s, False, itp, rows,
                              tag=tag + "fb")
            return _merge_hits(b, h)

        best = jax.lax.cond(jnp.any(pk_need), sweep, lambda b: b, best)
    return best


@partial(jax.jit, static_argnames=("interpret", "rows", "k_steer", "tag"))
def packet_trace_any_steered(ps_segs, pairs_stack, leaf_stack,
                             seg_min, seg_max, o, d, t_max,
                             interpret: bool = False,
                             rows: int = PACKET_ROWS,
                             k_steer: int = STEER_K,
                             tag: str = ""):
    """Occlusion over a segmented scene: steered launch + exact fallback."""
    if jnp.ndim(t_max) == 0:
        t_max = jnp.full((o.shape[0],), t_max, jnp.float32)
    t_max = t_max.astype(jnp.float32)
    itp = interpret or FORCE_INTERPRET
    S = len(ps_segs)
    R = o.shape[0]
    PR = ps_segs[0].pairs.shape[0]
    LR = ps_segs[0].leaf_geo.shape[0]
    packet = rows * 128
    pad = (-R) % packet
    op = o if pad == 0 else jnp.concatenate(
        [o, jnp.zeros((pad, 3), o.dtype)])
    dp = d if pad == 0 else jnp.concatenate(
        [d, jnp.ones((pad, 3), d.dtype)])
    tp = t_max if pad == 0 else jnp.concatenate(
        [t_max, jnp.full((pad,), -1.0, jnp.float32)])
    if STEER_LOOP:
        steer, _hits, suffix = _build_steering(op, dp, tp, seg_min, seg_max,
                                               packet, S)
        h = _pallas_trace_steered(
            pairs_stack, leaf_stack, PR, LR, steer,
            o, d, t_max, True, itp, rows, wide=ps_segs[0].wide, loop=True,
            tag=tag, suffix=suffix)
        return h.slot >= 0
    steer, pk_hits, _sfx = _build_steering(op, dp, tp, seg_min, seg_max,
                                           packet, k_steer)
    h = _pallas_trace_steered(
        pairs_stack, leaf_stack, PR, LR, steer,
        o, d, t_max, True, itp, rows, wide=ps_segs[0].wide, tag=tag)
    occ = h.slot >= 0
    seg_ids = jnp.arange(S, dtype=jnp.int32)
    done = jnp.any(steer[:, :, None] == seg_ids[None, None, :], axis=1)
    # residual steered pass: occluded rays drop out of the steering build
    # (their t_max masks to -1), pass-1 pairs are excluded
    tm1 = jnp.where(occ, jnp.float32(-1.0), t_max)
    tp2 = tm1 if pad == 0 else jnp.concatenate(
        [tm1, jnp.full((pad,), -1.0, jnp.float32)])
    steer2, pk_hits2, _sfx2 = _build_steering(op, dp, tp2, seg_min,
                                              seg_max, packet,
                                              k_steer, exclude=done)
    h2 = _pallas_trace_steered(
        pairs_stack, leaf_stack, PR, LR, steer2,
        o, d, tm1, True, itp, rows, wide=ps_segs[0].wide, tag=tag)
    occ = occ | (h2.slot >= 0)
    done = done | jnp.any(steer2[:, :, None] == seg_ids[None, None, :],
                          axis=1)
    for s in range(S):
        pk_need = pk_hits2[:, s] & ~done[:, s]

        def sweep(oc, s=s, pk_need=pk_need):
            need = jnp.repeat(pk_need, packet)[:R] & ~oc
            tm_s = jnp.where(need, t_max, jnp.float32(-1.0))
            hs = _pallas_trace(ps_segs[s], o, d, tm_s, True, itp, rows,
                               tag=tag + "fb")
            return oc | (hs.slot >= 0)

        occ = jax.lax.cond(jnp.any(pk_need), sweep, lambda oc: oc, occ)
    return occ


# ---------------------------------------------------------------------------
# Dense per-segment ray re-binning ("rebin"): the round-5 bounce lever.
#
# The steered loop kernel above traces each sorted ray PACKET against every
# segment its ray-union touches — measured mean 16.3 of 64 segments per
# packet at 2.8M (BENCH_NOTES r4), i.e. ~16 sub-traversals per packet over
# mostly-irrelevant lanes. Re-binning inverts the loop: expand each ray into
# (segment, ray) pairs for its K nearest intersected segment boxes, sort the
# pairs by segment (each segment's run padded to a packet multiple), and
# trace each packet against exactly ONE segment at full lane density. Hits
# come back per pair; an inverse gather + min over the K candidate axis
# merges them per ray (no scatters anywhere). Rays intersecting more than K
# segments finish in the exact steered residual with their (tight) running
# best as t_max. Per-pair expansion replaces the per-packet-union redundancy:
# mean pairs/ray is the per-RAY box count (small), not the packet union.
# ---------------------------------------------------------------------------

REBIN_K = int(os.environ.get("IDK_REBIN_K", "6"))
# kernel-slot budget as a multiple of the ray count: bounds the pair
# buffer (and its gathers) near the LIVE pair total instead of R*K — the
# measured live mean is 2.84 pairs/ray at 2.8M (p99 6), so 3.25R holds the
# whole distribution; anything past the budget routes to the exact residual
REBIN_BUDGET = float(os.environ.get("IDK_REBIN_BUDGET", "3.25"))
# ablation/debug: 0 skips the exact over-K residual (INEXACT — bench only)
REBIN_RESIDUAL = int(os.environ.get("IDK_REBIN_RESIDUAL", "1"))


def _rebin_layout(o, d, t_max, seg_min, seg_max, packet, K):
    """Build the pair layout. Returns:
      slot_pair (n_slots,) i32 — flat pair index (ray*K + k) per kernel
        slot, -1 = dead (padding / empty candidate)
      steer (n_pk, 1) i32 — the single segment id per packet (-1 = skip)
      pair_slot (R, K) i32 — kernel slot of each pair (-1 = empty candidate)
      over (R,) bool — ray has candidates not covered by the pair pass
        (more than K boxes, or pairs past the slot budget)
    """
    R = o.shape[0]
    S = seg_min.shape[0]
    ids, _ts, cnt = _nearest_segments(o, d, t_max, seg_min, seg_max, K,
                                      want_count=True)
    seg = jnp.stack(ids[:K], axis=1)  # (R, K); S = empty candidate
    P = R * K
    seg_flat = seg.reshape(P)
    perm = jnp.argsort(seg_flat, stable=True)  # empties (id S) sort last
    counts = jnp.bincount(seg_flat, length=S)  # id S drops out
    aligned = ((counts + packet - 1) // packet) * packet
    base = jnp.concatenate(
        [jnp.zeros(1, aligned.dtype), jnp.cumsum(aligned)])[:S]
    start = jnp.concatenate(
        [jnp.zeros(1, counts.dtype), jnp.cumsum(counts)])[:S]
    n_slots = (min(int(REBIN_BUDGET * R) + S * packet, P + S * packet)
               + packet - 1) // packet * packet  # static
    j = jnp.arange(n_slots, dtype=jnp.int32)
    seg_of = (jnp.searchsorted(base, j, side="right") - 1).astype(jnp.int32)
    off = j - base[seg_of]
    valid = off < counts[seg_of]
    q = start[seg_of] + off  # position in segment-sorted pair order
    slot_pair = jnp.where(valid, perm[jnp.minimum(q, P - 1)], -1)
    steer = jnp.where(valid.reshape(-1, packet)[:, 0],
                      seg_of.reshape(-1, packet)[:, 0],
                      jnp.int32(-1))[:, None]
    # pair -> its kernel slot: sorted position via the inverse permutation,
    # then shift by the segment's alignment gap; past-budget slots drop out
    # (their rays go to the residual via `over`)
    inv = jnp.zeros(P, jnp.int32).at[perm].set(
        jnp.arange(P, dtype=jnp.int32))
    pseg = jnp.minimum(seg_flat, S - 1)
    pair_slot = jnp.where(seg_flat < S, base[pseg] + (inv - start[pseg]),
                          -1)
    dropped = pair_slot >= n_slots
    pair_slot = jnp.where(dropped, -1, pair_slot).reshape(R, K)
    over = (cnt > K) | jnp.any(dropped.reshape(R, K), axis=1)
    return slot_pair, steer, pair_slot, over


@partial(jax.jit, static_argnames=("interpret", "rows", "k_pairs", "tag"))
def packet_trace_closest_rebin(ps_segs, pairs_stack, leaf_stack,
                               seg_min, seg_max, o, d, t_max,
                               interpret: bool = False,
                               rows: int = PACKET_ROWS,
                               k_pairs: int = REBIN_K,
                               tag: str = "") -> Hit:
    """Closest hit over a segmented scene via dense per-segment re-binning.
    Exact: equals the chained segment trace (ties may resolve either way)."""
    if jnp.ndim(t_max) == 0:
        t_max = jnp.full((o.shape[0],), t_max, jnp.float32)
    t_max = t_max.astype(jnp.float32)
    itp = interpret or FORCE_INTERPRET
    S = len(ps_segs)
    R = o.shape[0]
    K = min(k_pairs, S)
    PR = ps_segs[0].pairs.shape[0]
    LR = ps_segs[0].leaf_geo.shape[0]
    packet = rows * 128
    slot_pair, steer, pair_slot, over = _rebin_layout(
        o, d, t_max, seg_min, seg_max, packet, K)
    ray_of = jnp.maximum(slot_pair, 0) // K
    o_s = o[ray_of]
    d_s = d[ray_of]
    t_s = jnp.where(slot_pair >= 0, t_max[ray_of], jnp.float32(-1.0))
    h = _pallas_trace_steered(
        pairs_stack, leaf_stack, PR, LR, steer, o_s, d_s, t_s,
        False, itp, rows, wide=ps_segs[0].wide, loop=True, tag=tag + "rb")
    # merge the <=K candidate hits per ray: inverse gather + row min
    ps_i = jnp.maximum(pair_slot, 0)
    t_p = jnp.where(pair_slot >= 0, h.t[ps_i], jnp.inf)
    slot_p = jnp.where(pair_slot >= 0, h.slot[ps_i], -1)
    # prefer real hits over miss records (miss keeps t = t_max)
    t_rank = jnp.where(slot_p >= 0, t_p, jnp.inf)
    kb = jnp.argmin(t_rank, axis=1)[:, None]
    take = lambda a: jnp.take_along_axis(a, kb, axis=1)[:, 0]
    slot_b = take(slot_p)
    best = Hit(
        t=jnp.where(slot_b >= 0, take(t_p), t_max),
        slot=slot_b,
        u=jnp.where(slot_b >= 0, take(h.u[ps_i]), 0.0),
        v=jnp.where(slot_b >= 0, take(h.v[ps_i]), 0.0),
    )
    # exact residual: rays whose box count exceeds K re-run the steered
    # path with the (tight) running best as t_max — only a closer hit in a
    # not-yet-traced segment can land, and near-first candidate order makes
    # that rare
    if not REBIN_RESIDUAL:
        return best
    t_over = jnp.where(over & (t_max > 0.0), best.t, jnp.float32(-1.0))

    def residual(b):
        h2 = packet_trace_closest_steered(
            ps_segs, pairs_stack, leaf_stack, seg_min, seg_max,
            o, d, t_over, interpret=interpret, rows=rows, tag=tag + "rbres")
        return _merge_hits(b, h2)

    return jax.lax.cond(jnp.any(t_over > 0.0), residual, lambda b: b, best)


@partial(jax.jit, static_argnames=("interpret", "rows", "k_pairs", "tag"))
def packet_trace_any_rebin(ps_segs, pairs_stack, leaf_stack,
                           seg_min, seg_max, o, d, t_max,
                           interpret: bool = False,
                           rows: int = PACKET_ROWS,
                           k_pairs: int = REBIN_K,
                           tag: str = ""):
    """Occlusion over a segmented scene via dense per-segment re-binning."""
    if jnp.ndim(t_max) == 0:
        t_max = jnp.full((o.shape[0],), t_max, jnp.float32)
    t_max = t_max.astype(jnp.float32)
    itp = interpret or FORCE_INTERPRET
    S = len(ps_segs)
    K = min(k_pairs, S)
    PR = ps_segs[0].pairs.shape[0]
    LR = ps_segs[0].leaf_geo.shape[0]
    packet = rows * 128
    slot_pair, steer, pair_slot, over = _rebin_layout(
        o, d, t_max, seg_min, seg_max, packet, K)
    ray_of = jnp.maximum(slot_pair, 0) // K
    o_s = o[ray_of]
    d_s = d[ray_of]
    t_s = jnp.where(slot_pair >= 0, t_max[ray_of], jnp.float32(-1.0))
    h = _pallas_trace_steered(
        pairs_stack, leaf_stack, PR, LR, steer, o_s, d_s, t_s,
        True, itp, rows, wide=ps_segs[0].wide, loop=True, tag=tag + "rb")
    ps_i = jnp.maximum(pair_slot, 0)
    occ = jnp.any((pair_slot >= 0) & (h.slot[ps_i] >= 0), axis=1)
    if not REBIN_RESIDUAL:
        return occ
    t_over = jnp.where(over & ~occ & (t_max > 0.0), t_max,
                       jnp.float32(-1.0))

    def residual(oc):
        return oc | packet_trace_any_steered(
            ps_segs, pairs_stack, leaf_stack, seg_min, seg_max,
            o, d, t_over, interpret=interpret, rows=rows, tag=tag + "rbres")

    return jax.lax.cond(jnp.any(t_over > 0.0), residual, lambda oc: oc, occ)
