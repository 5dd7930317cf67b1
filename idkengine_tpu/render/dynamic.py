"""Device-side scene dynamics: vertex transforms, level-order BVH refit and
packet-table refresh — zero host<->device geometry traffic per frame.

Replaces the host round-trip in SceneDatabase.update() (device LBS -> host
pullback -> C++ refit -> full re-upload). The reference pipelines its CPU
refit behind a fence one frame late (ref: ModelManager.cs:281-359) and
refits on-GPU with an atomic-lock protocol (ref: BLASRefit/compute.glsl:
31-37); the TPU design precomputes per-depth level partitions at build time
and refits with data-parallel level sweeps — no atomics, no locks, static
shapes throughout (SURVEY.md §7 step 7).

All index plans are host-built ONCE at scene build; the per-frame
`refit(verts, normals)` is a single jittable function of device arrays.
"""
from __future__ import annotations

from dataclasses import dataclass

import jax
import jax.numpy as jnp
import numpy as np

from ..ops.trace import SceneArrays
from ..utils.compression import compress_normal_xp


@dataclass
class RefitPlan:
    """Static (host-built) index plan for the device refit."""

    # triangle slots
    slot_tri_v: np.ndarray  # (S,3) vertex ids per slot triangle
    # flat threaded-BVH leaves: per node, max_leaf slot ids (padded by repeat)
    leaf_gather: np.ndarray  # (N, max_leaf) slot id (interior rows: slot 0)
    is_leaf: np.ndarray  # (N,) bool
    # interior levels, deepest first: (ids, left_child, right_child)
    levels: list  # [(ids (K,), lc (K,), rc (K,))]
    # packet-table refresh plans (None when no packet scene)
    packet: list | None = None  # per segment: dict of device index arrays


def build_refit_plan(flat, slot_tri, indices, max_leaf: int,
                     packet_tables=None) -> RefitPlan:
    """Build the static refit plan from the flattened BVH (+ packet tables).

    flat: bvh.flatten.FlatBvh (DFS order, left child = i+1, right child =
    miss_link of the left child)."""
    n = flat.node_min.shape[0]
    counts = np.asarray(flat.node_count)
    first = np.asarray(flat.node_first)
    miss = np.asarray(flat.miss_link)
    is_leaf = counts > 0

    # children in DFS order
    left = np.arange(1, n + 1, dtype=np.int64)
    right = np.where(left < n, miss[np.minimum(left, n - 1)], -1)
    right = np.where(right < 0, n - 1, right)  # root subtree: clamp (unused)

    # depths via parent propagation (DFS order: parent precedes children)
    depth = np.zeros(n, np.int64)
    for i in range(n):
        if not is_leaf[i]:
            l, r = left[i], int(right[i])
            depth[l] = depth[i] + 1
            depth[r] = depth[i] + 1
    levels = []
    interior = np.nonzero(~is_leaf)[0]
    if interior.size:
        for d in range(int(depth[interior].max()), -1, -1):
            ids = interior[depth[interior] == d]
            if ids.size:
                levels.append((ids.astype(np.int32),
                               left[ids].astype(np.int32),
                               right[ids].astype(np.int32)))

    # leaf slot gather (padded with the first slot so min/max are unaffected)
    k = np.arange(max_leaf)
    f64 = first.astype(np.int64)
    gather = np.where(is_leaf[:, None],
                      f64[:, None] + np.minimum(k[None, :],
                                                np.maximum(counts[:, None] - 1, 0)),
                      0)
    slot_tri_v = np.asarray(indices)[np.asarray(slot_tri).astype(np.int64)]

    packet = None
    if packet_tables is not None:
        tables = (packet_tables if isinstance(packet_tables, list)
                  else [packet_tables])
        # builder-node id -> flat DFS position
        dfs_pos = np.zeros(n, np.int64)
        dfs_pos[np.asarray(flat.order)] = np.arange(n)
        packet = []
        for t in tables:
            cm = t.collapse_map.astype(np.int64)
            seg = {
                "wide": t.wide,
                "root_flat": np.int32(dfs_pos[cm[0]]),
                "pairs_shape": t.pairs.shape,
                "leaf_shape": t.leaf_geo.shape,
            }
            if t.wide:
                node_flat = dfs_pos[cm[t.plan_wnode.astype(np.int64)]]
                base = (t.plan_wrow * 128 + t.plan_wbase).astype(np.int64)
                seg["box_idx"] = np.stack(
                    [base + j for j in range(6)], 1).astype(np.int32)
                seg["box_node"] = node_flat.astype(np.int32)
            else:
                n0 = dfs_pos[cm[t.plan_c0.astype(np.int64)]]
                n1 = dfs_pos[cm[t.plan_c1.astype(np.int64)]]
                base = (t.plan_row * 128 + t.plan_off).astype(np.int64)
                seg["box_idx"] = np.concatenate([
                    np.stack([base + j for j in range(6)], 1),
                    np.stack([base + 6 + j for j in range(6)], 1)],
                    0).astype(np.int32)
                seg["box_node"] = np.concatenate([n0, n1]).astype(np.int32)
            lbase = (t.plan_leaf_row * 128 + t.plan_leaf_base).astype(np.int64)
            seg["leaf_idx"] = np.stack(
                [lbase + j for j in range(9)], 1).astype(np.int32)
            seg["leaf_slot"] = t.plan_leaf_slot.astype(np.int32)
            packet.append(seg)

    return RefitPlan(slot_tri_v=slot_tri_v.astype(np.int32),
                     leaf_gather=gather.astype(np.int32),
                     is_leaf=is_leaf, levels=levels, packet=packet)


class DeviceRefitter:
    """Owns device-resident copies of the plan; `refit` is one jit."""

    def __init__(self, plan: RefitPlan, scene: SceneArrays,
                 packet_scene=None):
        self.plan = plan
        self.max_leaf = scene.max_leaf
        self._tri_v = jnp.asarray(plan.slot_tri_v)
        self._leaf_gather = jnp.asarray(plan.leaf_gather)
        self._is_leaf = jnp.asarray(plan.is_leaf)
        self._levels = [(jnp.asarray(i), jnp.asarray(l), jnp.asarray(r))
                        for i, l, r in plan.levels]
        self._packet_idx = None
        if plan.packet is not None:
            self._packet_idx = [
                {k: (jnp.asarray(v) if isinstance(v, np.ndarray) else v)
                 for k, v in seg.items()}
                for seg in plan.packet]
        self._jit = jax.jit(self._refit)

    # ------------------------------------------------------------------
    def _refit(self, scene: SceneArrays, verts, normals, uvs_unused,
               packet_scenes):
        p = verts[self._tri_v]  # (S,3,3)
        p0 = p[:, 0]
        e1 = p[:, 1] - p[:, 0]
        e2 = p[:, 2] - p[:, 0]
        gn = jnp.cross(e1, e2)
        gn = gn / jnp.maximum(jnp.linalg.norm(gn, axis=-1, keepdims=True),
                              1e-20)
        nrm = normals[self._tri_v]  # (S,3,3)
        n_packed = jnp.stack(
            [compress_normal_xp(nrm[:, k], jnp) for k in range(3)], 1
        ).astype(jnp.uint32)

        # per-slot triangle AABBs -> leaf boxes -> level sweeps
        tmin = p.min(axis=1)  # (S,3)
        tmax = p.max(axis=1)
        lmin = tmin[self._leaf_gather].min(axis=1)  # (N,3)
        lmax = tmax[self._leaf_gather].max(axis=1)
        node_min = jnp.where(self._is_leaf[:, None], lmin, scene.node_min)
        node_max = jnp.where(self._is_leaf[:, None], lmax, scene.node_max)
        for ids, lc, rc in self._levels:
            node_min = node_min.at[ids].set(
                jnp.minimum(node_min[lc], node_min[rc]))
            node_max = node_max.at[ids].set(
                jnp.maximum(node_max[lc], node_max[rc]))

        new_scene = SceneArrays(
            node_min=node_min, node_max=node_max,
            node_first=scene.node_first, node_count=scene.node_count,
            hit_link=scene.hit_link, miss_link=scene.miss_link,
            tri_p0=p0, tri_e1=e1, tri_e2=e2, tri_n=n_packed,
            tri_uv=scene.tri_uv, tri_mat=scene.tri_mat, tri_gn=gn,
            max_leaf=scene.max_leaf,
        )

        new_packets = None
        wave_min = wave_max = None
        if packet_scenes is not None and self._packet_idx is not None:
            new_packets = []
            wave_min_l, wave_max_l = [], []
            for ps, seg in zip(packet_scenes, self._packet_idx):
                pairs = ps.pairs.reshape(-1)
                bi = seg["box_idx"]  # (K,6) flat lane indices
                bn = seg["box_node"]  # (K,)
                vals = jnp.concatenate([node_min[bn], node_max[bn]], axis=1)
                pairs = pairs.at[bi.reshape(-1)].set(vals.reshape(-1))
                root = seg["root_flat"]
                pairs = pairs.at[jnp.arange(2, 8)].set(
                    jnp.concatenate([node_min[root], node_max[root]]))
                leaf = ps.leaf_geo.reshape(-1)
                li = seg["leaf_idx"]  # (K,9)
                ls = seg["leaf_slot"]
                lvals = jnp.concatenate([p0[ls], e1[ls], e2[ls]], axis=1)
                leaf = leaf.at[li.reshape(-1)].set(lvals.reshape(-1))
                from ..ops.packet_trace import PacketScene

                new_packets.append(PacketScene(
                    pairs.reshape(seg["pairs_shape"]),
                    leaf.reshape(seg["leaf_shape"]), wide=seg["wide"]))
                wave_min_l.append(node_min[root])
                wave_max_l.append(node_max[root])
            new_packets = tuple(new_packets)
            wave_min = jnp.stack(wave_min_l)
            wave_max = jnp.stack(wave_max_l)
        return new_scene, new_packets, (wave_min, wave_max)

    # ------------------------------------------------------------------
    def refit(self, scene: SceneArrays, verts, normals, packet_scenes=None):
        """verts/normals: (V,3) device arrays in world space. Returns
        (SceneArrays, packet_scenes | None, (wave_min, wave_max) | (None,None))."""
        return self._jit(scene, verts, normals, None, packet_scenes)
