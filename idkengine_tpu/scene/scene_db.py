"""Scene database: the ModelManager equivalent.

Owns all loaded models as concatenated SoA arrays, the BVH, the light
manager, and produces/updates the device-resident SceneArrays
(ref: IDKEngine/Source/ModelManager.cs — global arrays mirrored in SSBOs).

TPU-first differences from the reference:
  - static geometry is hoisted and merged into ONE BLAS (the reference's
    HoistMeshPrimitives optimization taken to its limit) so the traversal
    kernel has no TLAS indirection;
  - dynamic nodes keep per-instance transforms; their triangles live in the
    same merged triangle space and are re-transformed ON DEVICE each frame
    (vmapped matmul), followed by a device level-order BVH refit — there is
    no GPU→CPU readback in the animation loop (the reference needs a fenced
    readback for CPU refit, ModelManager.cs:281-359).
"""
from __future__ import annotations

from dataclasses import dataclass, field

import numpy as np

from ..bvh import BLAS
from ..bvh.builder import BuildSettings
from ..bvh.flatten import (flatten_triangles,
                           flatten_triangles_device, thread_bvh)
from ..log import get_logger
from ..ops.trace import SceneArrays
from ..utils import mathutil as mu
from .lights import LightManager
from .materials import MaterialTable
from .model import Model, hoist_static_primitives

log = get_logger(__name__)


@dataclass
class SceneMeta:
    """Host-side metadata about the flattened scene."""

    n_triangles: int = 0
    n_nodes: int = 0
    sah_cost: float = 0.0
    epo: float = 0.0
    build_ms: float = 0.0
    slot_instance: np.ndarray | None = None  # (T,) instance id per slot
    n_instances: int = 0
    instance_node: list[int] = field(default_factory=list)  # scene-node per instance
    instance_model: list[int] = field(default_factory=list)
    packet_vmem_bytes: int = 0


@dataclass
class MeshShading:
    """Per-mesh shading overrides applied AFTER material/texture fetch
    (ref: GpuMesh.cs fields consumed by Surface.glsl:85-96
    SurfaceApplyModificatons; e.g. Application.cs:449-457 raises
    EmissiveBias on Sponza's lamp meshes)."""

    emissive_bias: float = 0.0        # emissive += bias * albedo
    normal_map_strength: float = 1.0  # mix(geom normal, mapped normal, s)
    specular_bias: float = 0.0        # metallic += bias (clamped)
    roughness_bias: float = 0.0       # roughness += bias (clamped)
    transmission_bias: float = 0.0    # transmission += bias (clamped)
    ior_bias: float = 0.0             # ior += bias (>= 1)
    absorbance_bias: tuple = (0.0, 0.0, 0.0)
    tint_on_transmissive: bool = True  # KHR_materials_transmission tint

    ROW_DEFAULT = np.array([0, 1, 0, 0, 0, 0, 0, 0, 0, 1], np.float32)

    def row(self) -> np.ndarray:
        a = self.absorbance_bias
        return np.array(
            [self.emissive_bias, self.normal_map_strength,
             self.specular_bias, self.roughness_bias,
             self.transmission_bias, self.ior_bias, a[0], a[1], a[2],
             1.0 if self.tint_on_transmissive else 0.0], np.float32)


class SceneDatabase:
    """Concatenated scene + BVH + lights; produces device SceneArrays."""

    def __init__(self, build_settings: BuildSettings | None = None):
        self.build_settings = build_settings or BuildSettings(
            presplit_factor=0.3, max_leaf_triangle_count=12, traversal_cost=4.0
        )
        self.models: list[Model] = []
        self.lights = LightManager()
        self.materials = MaterialTable()
        self.meta = SceneMeta()
        # concatenated triangle-space arrays (model space == world space for
        # hoisted static geometry)
        self._verts: np.ndarray | None = None
        self._indices: np.ndarray | None = None
        self._normals: np.ndarray | None = None
        self._uvs: np.ndarray | None = None
        self._tri_mat: np.ndarray | None = None
        self.blas: BLAS | None = None
        self._flat = None
        self._slot_tri: np.ndarray | None = None
        self.device_scene: SceneArrays | None = None
        # per-mesh shading overrides, keyed by placement index (the i-th
        # (model, node, prim, instance) tuple build() enumerates — the
        # analogue of the reference's GpuModel.Meshes[i] handle)
        self.mesh_shading: dict[int, MeshShading] = {}
        self._tri_prim: np.ndarray | None = None

    # ------------------------------------------------------------------
    def add_model(self, model: Model, transform: np.ndarray | None = None, hoist: bool = True):
        """Append a model (optionally pre-transformed by a 4x4 root matrix).

        ref: ModelManager.Add (ModelManager.cs:128-216) — array concat with
        index rebasing happens at build()."""
        if hoist:
            model = hoist_static_primitives(model)
        if transform is not None:
            t = np.asarray(transform, np.float32)
            nmat = np.linalg.inv(t[:3, :3]).T
            for node in model.nodes:
                if node.parent < 0:
                    local = node.local_matrix()
                    m = t @ local
                    tr, q, s = mu.decompose_trs(m)
                    node.translation, node.rotation, node.scale = tr, q, s
            del nmat
        self.models.append(model)

    # ------------------------------------------------------------------
    def build(self):
        """Concatenate all models, build the merged BLAS, flatten to device
        arrays. Call once after adding models (and again after structural
        scene changes — ref: Gui.AddModelDialog path re-running BlasesBuild)."""
        verts, idx, norms, uvs, tri_mat, tri_prim = [], [], [], [], [], []
        voff = 0
        mat_off = 0
        self._placements = []  # (model_i, node_i, prim_i, inst_mat, v_start, v_end)
        for mi, model in enumerate(self.models):
            transforms = model.global_transforms()
            mat_off = self.materials.add_model(model)
            for ni, node in enumerate(model.nodes):
                if not node.mesh_primitives:
                    continue
                m = transforms[ni]
                inst = node.instance_transforms
                mats = [np.eye(4, dtype=np.float32)] if inst is None else list(inst)
                for im in mats:
                    world = m @ im
                    nrm_m = np.linalg.inv(world[:3, :3]).T
                    for pi in node.mesh_primitives:
                        prim = model.primitives[pi]
                        prim.ensure_normals()
                        p = prim.positions @ world[:3, :3].T + world[:3, 3]
                        n = mu.normalize(prim.normals @ nrm_m.T)
                        self._placements.append(
                            (mi, ni, pi, im, voff, voff + p.shape[0])
                        )
                        verts.append(p.astype(np.float32))
                        norms.append(n.astype(np.float32))
                        uvs.append(
                            prim.uvs.astype(np.float32)
                            if prim.uvs is not None
                            else np.zeros((p.shape[0], 2), np.float32)
                        )
                        idx.append(prim.indices.astype(np.uint32) + voff)
                        tri_mat.append(
                            np.full(prim.indices.shape[0], prim.material + mat_off, np.int32)
                        )
                        tri_prim.append(np.full(
                            prim.indices.shape[0],
                            len(self._placements) - 1, np.int32))
                        voff += p.shape[0]
        if not verts:
            raise ValueError("scene is empty")
        self._verts = np.concatenate(verts)
        self._indices = np.concatenate(idx)
        self._normals = np.concatenate(norms)
        self._uvs = np.concatenate(uvs)
        self._tri_mat = np.concatenate(tri_mat)
        self._tri_prim = np.concatenate(tri_prim)

        self.blas = BLAS(self._verts, self._indices, self.build_settings)
        self._flat, slot_perm = thread_bvh(self.blas.nodes)
        self._slot_tri = self.blas.tri_indices[slot_perm]
        ft = flatten_triangles_device(
            self._slot_tri, self._verts, self._indices, self._normals, self._uvs, self._tri_mat
        )
        self.device_scene = SceneArrays.from_flat(
            self._flat, ft, max_leaf=self.build_settings.max_leaf_triangle_count
        )
        self._build_packet_scene()
        self._inst_attr_srcs = []
        if getattr(self, "_instanced_models", None):
            self._inst_attr_srcs = self._build_instanced(
                int(self._slot_tri.shape[0]))
            self._refresh_instance_device()
            log.info("instanced: %d models, %d instances (two-level trace)",
                     len(self._instanced_models), len(self._instance_list))
        self.meta.n_triangles = int(self._indices.shape[0])
        self.meta.n_nodes = int(self._flat.node_min.shape[0])
        self.meta.sah_cost = self.blas.sah_cost
        self.meta.build_ms = self.blas.build_ms
        # quality metrics logged per build like the reference (SAH + EPO,
        # ref: Bvh/BVH.cs:460-469 + BLAS.ComputeGlobalEPO) — SAH alone
        # misses node-overlap pathologies
        import os as _os

        self.meta.epo = (self.blas.epo()
                         if _os.environ.get("IDK_EPO", "1") != "0"
                         else float("nan"))
        log.info(
            "scene built: %d tris → %d slots, %d nodes, SAH %.1f, "
            "EPO %.3f, %.0f ms",
            self.meta.n_triangles, self._slot_tri.shape[0], self.meta.n_nodes,
            self.meta.sah_cost, self.meta.epo, self.meta.build_ms,
        )
        return self.device_scene

    # ------------------------------------------------------------------
    def set_mesh_shading(self, mesh_index: int, **kwargs) -> MeshShading:
        """Set per-mesh shading overrides (ref: GpuMesh EmissiveBias /
        NormalMapStrength / SpecularBias / RoughnessBias / ... edited live
        from Application.cs:449-457 and the Gui). mesh_index indexes the
        placements build() enumerates (one per node x instance x primitive,
        matching the reference's GpuModel.Meshes order). Consumers bake the
        rows into their attribute tables — renderers constructed before
        this call need refresh_mesh_shading()."""
        ms = self.mesh_shading.get(mesh_index, MeshShading())
        for k, v in kwargs.items():
            if not hasattr(ms, k):
                raise AttributeError(f"MeshShading has no field {k!r}")
            setattr(ms, k, v)
        self.mesh_shading[mesh_index] = ms
        return ms

    @property
    def n_meshes(self) -> int:
        """Placement count (valid after build())."""
        return len(getattr(self, "_placements", []) or [])

    def slot_shading(self) -> np.ndarray | None:
        """Per-slot (n_static_slots, 10) override rows in MeshShading.row
        order, or None when no mesh has overrides (the hot path stays
        untouched). Instanced-model slots are not covered (they pack their
        own attr sources); overrides there are a future extension."""
        if not self.mesh_shading or self._slot_tri is None:
            return None
        table = np.tile(MeshShading.ROW_DEFAULT,
                        (len(self._placements), 1))
        for k, ms in self.mesh_shading.items():
            table[k] = ms.row()
        return table[self._tri_prim[self._slot_tri]]

    # ------------------------------------------------------------------
    def _build_packet_scene(self):
        """Pack the Pallas packet-tracer tables (ops/packet_trace.py) when
        the build settings are compatible; shares the builder slot space
        with the threaded-trace shading arrays."""
        from ..ops.packet_trace import (
            MAX_LEAF_PACKET, PACKET_VMEM_BUDGET, PacketScene,
            build_packet_tables, build_packet_tables_segmented,
        )

        self.packet_scene = None
        self._packet_tables = None
        self.packet_leaf_first = None  # two-phase side tables (resident)
        self.packet_leaf_count = None
        self.wave_scene = None  # tuple of segment PacketScenes for wave trace
        self.wave_seg_min = None  # (S,3) f32 segment root boxes
        self.wave_seg_max = None
        self.wave_pairs_stack = None  # row-concat tables for steered DMA
        self.wave_leaf_stack = None
        self._wave_tables = None
        if self.build_settings.max_leaf_triangle_count <= MAX_LEAF_PACKET:
            from ..ops.packet_trace import packet_vmem_estimate

            try:
                vmem_est = packet_vmem_estimate(
                    self.blas.nodes)  # exact, no geometry pack
                self.meta.packet_vmem_bytes = vmem_est
                if vmem_est <= PACKET_VMEM_BUDGET:
                    tables = build_packet_tables(
                        self.blas.nodes, self.blas.tri_indices, self._verts,
                        self._indices)
                    self._packet_tables = tables
                    self.packet_scene = PacketScene.from_tables(tables)
                    if tables.leaf_first is not None:
                        import jax.numpy as _jnp

                        self.packet_leaf_first = _jnp.asarray(tables.leaf_first)
                        self.packet_leaf_count = _jnp.asarray(tables.leaf_count)
                    self._build_wave_scene(tables.vmem_bytes)
                else:
                    # VMEM-segmented big scene: subtree tables that each fit
                    # the budget, chained at trace time with a carried t_max
                    segs = build_packet_tables_segmented(
                        self.blas.nodes, self.blas.tri_indices,
                        self._verts, self._indices, PACKET_VMEM_BUDGET,
                    )
                    self._packet_tables = segs
                    scenes, p_d, l_d, f_d, c_d = self._stack_tables(segs)
                    self.packet_scene = tuple(scenes)
                    self._packet_stack_d = (p_d, l_d, f_d, c_d)
                    log.info(
                        "scene over the %.0f MB VMEM budget (%.1f MB): "
                        "packet tracer split into %d subtree segments "
                        "(max %.1f MB)", PACKET_VMEM_BUDGET / 1e6,
                        vmem_est / 1e6, len(segs),
                        max(t.vmem_bytes for t in segs) / 1e6,
                    )
            except AssertionError as e:
                log.warning("packet tables unavailable: %s", e)
        if self.packet_scene is not None and self.wave_scene is None and \
                isinstance(self.packet_scene, tuple):
            # over-budget scene: build a FINER wave set sized for the steered
            # kernel (its double-buffered segment DMA needs 2x the segment
            # tables inside the ~16 MB scoped VMEM — the resident chained
            # segments are too big to steer)
            self._build_wave_scene(self.meta.packet_vmem_bytes)
            if self.wave_scene is None:
                # fall back to aliasing the chained segments (sort keys only)
                self._wave_tables = self._packet_tables
                self.wave_scene = self.packet_scene
                self._set_wave_boxes(self._packet_tables)
                (self.wave_pairs_stack, self.wave_leaf_stack,
                 self.wave_first_stack, self.wave_count_stack) = \
                    self._packet_stack_d

    def _build_wave_scene(self, total_bytes: int):
        """Segment the BVH into ~IDK_WAVE_SEGS treelets for the wave tracer
        (ops/packet_trace.py segment-wave section). Incoherent bounce and
        shadow rays re-sorted by nearest-segment keys traverse ONE small
        subtree per packet with dense lanes — the TPU analogue of the
        reference's hit-key counting sort (PathTracer.cs:273-297)."""
        import os

        from ..ops.packet_trace import (
            STEER_VMEM_BUDGET, PacketScene, build_packet_tables_segmented)

        n_segs = int(os.environ.get("IDK_WAVE_SEGS", "16"))
        if n_segs <= 1:
            return
        # cap at the steered kernel's double-buffer budget so big scenes'
        # wave segments stay steerable
        budget = min(max(total_bytes // n_segs, 200_000), STEER_VMEM_BUDGET)
        try:
            segs = build_packet_tables_segmented(
                self.blas.nodes, self.blas.tri_indices,
                self._verts, self._indices, budget)
        except AssertionError as e:
            log.warning("wave segments unavailable: %s", e)
            return
        self._wave_tables = segs
        scenes, p_d, l_d, f_d, c_d = self._stack_tables(segs)
        self.wave_scene = tuple(scenes)
        self._set_wave_boxes(segs)
        self.wave_pairs_stack, self.wave_leaf_stack = p_d, l_d
        self.wave_first_stack, self.wave_count_stack = f_d, c_d
        log.info("wave tracer: %d segments (max %.2f MB)", len(segs),
                 max(t.vmem_bytes for t in segs) / 1e6)

    def wave_set(self):
        """WaveSet for the PathTracer: segment sort keys + steered
        traversal tables; None when no wave segments were built."""
        if self.wave_scene is None or self.wave_pairs_stack is None:
            return None
        import jax.numpy as jnp

        from ..ops.packet_trace import WaveSet

        return WaveSet(
            segs=tuple(self.wave_scene),
            pairs_stack=self.wave_pairs_stack,
            leaf_stack=self.wave_leaf_stack,
            seg_min=jnp.asarray(self.wave_seg_min),
            seg_max=jnp.asarray(self.wave_seg_max),
            first_stack=getattr(self, "wave_first_stack", None),
            count_stack=getattr(self, "wave_count_stack", None),
        )

    @staticmethod
    def _stack_tables(tables):
        """Zero-pad every segment's node/leaf tables to one common shape so
        a SINGLE Mosaic kernel compilation serves all segments (distinct
        shapes would each compile their own kernel — minutes per segment) —
        writing them ONCE into row-concatenated stacks (the steered kernel's
        dynamic-offset DMA source). Each table's arrays become views of the
        stack; per-segment device tables are slices of ONE device_put (this
        host is memcpy-bound — the old pad-copy → concat-copy → per-segment
        upload chain was ~10 s of the 2.8M scene build).

        Returns (scenes, pairs_d, leaf_d, first_d, count_d)."""
        import jax.numpy as jnp

        from ..ops.packet_trace import LEAVES_PER_ROW, PacketScene

        s = len(tables)
        pr = max(t.pairs.shape[0] for t in tables)
        lr = max(t.leaf_geo.shape[0] for t in tables)
        ls = lr * LEAVES_PER_ROW
        pairs_np = np.zeros((s * pr, 128), np.float32)
        leaf_np = np.zeros((s * lr, 128), np.float32)
        has_lf = all(t.leaf_first is not None for t in tables)
        first_np = np.zeros(s * ls, np.int32) if has_lf else None
        count_np = np.zeros(s * ls, np.int32) if has_lf else None
        for i, t in enumerate(tables):
            pairs_np[i * pr: i * pr + t.pairs.shape[0]] = t.pairs
            leaf_np[i * lr: i * lr + t.leaf_geo.shape[0]] = t.leaf_geo
            t.pairs = pairs_np[i * pr: (i + 1) * pr]
            t.leaf_geo = leaf_np[i * lr: (i + 1) * lr]
            if has_lf:
                first_np[i * ls: i * ls + t.leaf_first.shape[0]] = t.leaf_first
                count_np[i * ls: i * ls + t.leaf_count.shape[0]] = t.leaf_count
                t.leaf_first = first_np[i * ls: (i + 1) * ls]
                t.leaf_count = count_np[i * ls: (i + 1) * ls]
        pairs_d = jnp.asarray(pairs_np)
        leaf_d = jnp.asarray(leaf_np)
        first_d = jnp.asarray(first_np) if has_lf else None
        count_d = jnp.asarray(count_np) if has_lf else None
        scenes = [
            PacketScene(pairs_d[i * pr: (i + 1) * pr],
                        leaf_d[i * lr: (i + 1) * lr], wide=t.wide)
            for i, t in enumerate(tables)
        ]
        return scenes, pairs_d, leaf_d, first_d, count_d

    @staticmethod
    def _pad_tables_common(tables):
        """Back-compat shim: pad segment tables to one common shape
        (now done by _stack_tables, whose stacks this discards)."""
        SceneDatabase._stack_tables(tables)

    def _set_wave_boxes(self, tables):
        self.wave_seg_min = np.stack(
            [t.pairs[0, 2:5] for t in tables]).astype(np.float32)
        self.wave_seg_max = np.stack(
            [t.pairs[0, 5:8] for t in tables]).astype(np.float32)

    def _set_wave_stack(self, tables):
        """Row-concatenated (common-shaped) segment tables for the
        multi-steer kernel's dynamic-offset table DMAs. When the tables are
        views of one _stack_tables base (the common case), the stack is just
        a device_put of that base — no host concat."""
        import jax.numpy as jnp

        def _stacked(arrs, n_total=None):
            base = arrs[0].base
            if base is not None and all(a.base is base for a in arrs):
                return jnp.asarray(base)
            return jnp.asarray(np.concatenate(arrs, axis=0))

        self.wave_pairs_stack = _stacked([t.pairs for t in tables])
        self.wave_leaf_stack = _stacked([t.leaf_geo for t in tables])
        if all(t.leaf_first is not None for t in tables):
            # per-leaf-slot side tables for the two-phase tracer
            # (ops/two_phase.py): global first tri slot + count by the
            # stacked leaf row id st*LS + slot
            self.wave_first_stack = _stacked([t.leaf_first for t in tables])
            self.wave_count_stack = _stacked([t.leaf_count for t in tables])
        else:
            self.wave_first_stack = self.wave_count_stack = None

    # ------------------------------------------------------------------
    def update(self, time: float, animation_index: int = 0) -> SceneArrays:
        """Per-frame scene update: sample animations → node hierarchy →
        skinning → vertex refresh → BVH refit → device array refresh
        (ref: ModelManager.Update, ModelManager.cs:236-361 — without the
        fenced readback: all arrays live host-side and re-upload).

        Returns the refreshed device SceneArrays (packet tables refresh too)."""
        from . import animation as anim_mod
        from . import skinning as skin_mod

        any_dynamic = False
        for mi, model in enumerate(self.models):
            if not model.animations:
                continue
            anim = model.animations[min(animation_index, len(model.animations) - 1)]
            anim_mod.apply_animation(model, anim, time)
            transforms = model.global_transforms()
            any_dynamic = True
            # skinned vertices (LBS on device, pulled back for the refit)
            skinned_cache: dict[int, np.ndarray] = {}
            for mi2, ni, pi, im, v0, v1 in self._placements:
                if mi2 != mi:
                    continue
                node = model.nodes[ni]
                prim = model.primitives[pi]
                if node.skin >= 0 and prim.joints is not None:
                    if pi not in skinned_cache:
                        jm = skin_mod.joint_matrices(transforms, model.skins[node.skin])
                        import jax.numpy as jnp

                        sp = skin_mod.skin_positions(
                            jnp.asarray(prim.positions),
                            jnp.asarray(prim.joints.astype(np.int32)),
                            jnp.asarray(prim.weights),
                            jnp.asarray(jm),
                        )
                        sn = skin_mod.skin_normals(
                            jnp.asarray(prim.normals),
                            jnp.asarray(prim.joints.astype(np.int32)),
                            jnp.asarray(prim.weights),
                            jnp.asarray(jm),
                        )
                        skinned_cache[pi] = (np.asarray(sp), np.asarray(sn))
                    p_local, n_local = skinned_cache[pi]
                    world = np.eye(4, dtype=np.float32)  # skin is in model space
                else:
                    p_local, n_local = prim.positions, prim.normals
                    world = transforms[ni] @ im
                nrm_m = np.linalg.inv(world[:3, :3]).T
                self._verts[v0:v1] = (
                    p_local @ world[:3, :3].T + world[:3, 3]
                ).astype(np.float32)
                self._normals[v0:v1] = mu.normalize(n_local @ nrm_m.T).astype(np.float32)
        if not any_dynamic:
            return self.device_scene

        # refit the builder BVH (C++, bottom-up) and refresh device arrays
        self.blas.refit(self._verts)
        self._flat.refresh_boxes(self.blas.nodes)
        ft = flatten_triangles_device(
            self._slot_tri, self._verts, self._indices, self._normals, self._uvs, self._tri_mat
        )
        self.device_scene = SceneArrays.from_flat(
            self._flat, ft, max_leaf=self.build_settings.max_leaf_triangle_count
        )
        if self.packet_scene is not None and self._packet_tables is not None:
            from ..ops.packet_trace import PacketScene

            if isinstance(self._packet_tables, list):
                for t in self._packet_tables:
                    t.refresh(self.blas.nodes, self.blas.tri_indices,
                              self._verts, self._indices)
                self.packet_scene = tuple(
                    PacketScene.from_tables(t) for t in self._packet_tables
                )
            else:
                self._packet_tables.refresh(
                    self.blas.nodes, self.blas.tri_indices, self._verts,
                    self._indices,
                )
                self.packet_scene = PacketScene.from_tables(self._packet_tables)
        if self.wave_scene is not None:
            from ..ops.packet_trace import PacketScene

            if self._wave_tables is self._packet_tables:
                # over-VMEM scenes alias the packet tables as wave segments:
                # those were refreshed above, but the wave boxes/stacks still
                # need re-deriving or segment_wave_key and the steered DMA
                # stacks go stale (refitted geometry could silently miss)
                self.wave_scene = self.packet_scene
            else:
                for t in self._wave_tables:
                    t.refresh(self.blas.nodes, self.blas.tri_indices,
                              self._verts, self._indices)
                self.wave_scene = tuple(
                    PacketScene.from_tables(t) for t in self._wave_tables)
            self._set_wave_boxes(self._wave_tables)
            self._set_wave_stack(self._wave_tables)
        return self.device_scene

    # ------------------------------------------------------------------
    # Instanced models: own BLAS per model, traced through the two-level
    # path (ref: TLAS.cs + BVH.cs:162-223) — transform updates never
    # rebuild or refit geometry.
    # ------------------------------------------------------------------
    def add_instanced_model(self, model: Model,
                            transforms: np.ndarray) -> int:
        """Register a model drawn at `transforms` ((I,4,4) world matrices)
        through its OWN BLAS (ref: ModelManager BLAS-per-mesh + TLAS over
        instances; EXT_mesh_gpu_instancing content belongs here when it
        must move per frame without rebuilds). Returns the model's id.
        Call before build()."""
        if not hasattr(self, "_instanced_models"):
            self._instanced_models = []
            self._instance_list = []  # (model_idx, (4,4) transform)
        mi = len(self._instanced_models)
        self._instanced_models.append(model)
        for t in np.asarray(transforms, np.float32).reshape(-1, 4, 4):
            self._instance_list.append([mi, t])
        return mi

    def _build_instanced(self, slot_base: int):
        """Build per-model BLASes + device arrays for instanced content.
        Returns the per-slot attribute source arrays for the combined
        attribute table."""
        self._inst_blas = []
        self._inst_scene_arrays = []
        self._inst_slot_off = []
        extra_attr_srcs = []
        slot_off = slot_base
        for model in self._instanced_models:
            verts, idx, norms, uvs, tri_mat = [], [], [], [], []
            voff = 0
            mat_off = self.materials.add_model(model)
            transforms = model.global_transforms()
            for ni, node in enumerate(model.nodes):
                for pi in node.mesh_primitives:
                    prim = model.primitives[pi]
                    prim.ensure_normals()
                    m = transforms[ni]
                    nrm_m = np.linalg.inv(m[:3, :3]).T
                    verts.append((prim.positions @ m[:3, :3].T
                                  + m[:3, 3]).astype(np.float32))
                    norms.append(mu.normalize(
                        prim.normals @ nrm_m.T).astype(np.float32))
                    uvs.append(prim.uvs.astype(np.float32)
                               if prim.uvs is not None
                               else np.zeros((prim.positions.shape[0], 2),
                                             np.float32))
                    idx.append(prim.indices.astype(np.uint32) + voff)
                    tri_mat.append(np.full(prim.indices.shape[0],
                                           prim.material + mat_off, np.int32))
                    voff += prim.positions.shape[0]
            v = np.concatenate(verts)
            ix = np.concatenate(idx)
            blas = BLAS(v, ix, self.build_settings)
            flat, slot_perm = thread_bvh(blas.nodes)
            slot_tri = blas.tri_indices[slot_perm]
            ft = flatten_triangles(slot_tri, v, ix, np.concatenate(norms),
                                   np.concatenate(uvs),
                                   np.concatenate(tri_mat))
            sa = SceneArrays.from_flat(
                flat, ft,
                max_leaf=self.build_settings.max_leaf_triangle_count)
            self._inst_blas.append(blas)
            self._inst_scene_arrays.append(sa)
            self._inst_slot_off.append(slot_off)
            extra_attr_srcs.append(ft)
            slot_off += slot_tri.shape[0]
        return extra_attr_srcs

    def add_model_runtime(self, model: Model,
                          transform: np.ndarray | None = None) -> int:
        """Add a model AFTER build() without touching existing geometry
        (ref: Gui.AddModelDialog → ModelManager.Add + BLAS build of only
        the new ranges, ModelManager.cs:128-216): the model gets its own
        BLAS and joins the two-level instance path. Returns its instance
        id. The caller should refresh PathTracer.instances (engine.render
        does this on the next accumulation reset)."""
        if transform is None:
            transform = np.eye(4, dtype=np.float32)
        if not hasattr(self, "_instanced_models"):
            self._instanced_models = []
            self._instance_list = []
        if not hasattr(self, "_inst_blas"):
            self._inst_blas = []
            self._inst_scene_arrays = []
            self._inst_slot_off = []
            self._inst_attr_srcs = []
        mi = len(self._instanced_models)
        self._instanced_models.append(model)
        inst_id = len(self._instance_list)
        self._instance_list.append([mi, np.asarray(transform, np.float32)])
        # build ONLY the new model's BLAS (incremental, nothing else moves)
        slot_base = (self._inst_slot_off[-1]
                     + self._inst_scene_arrays[-1].tri_p0.shape[0]
                     if self._inst_slot_off
                     else int(self._slot_tri.shape[0]))
        keep = self._instanced_models
        self._instanced_models = [model]
        srcs = self._build_instanced_append(slot_base)
        self._instanced_models = keep
        self._inst_attr_srcs.extend(srcs)
        self._refresh_instance_device()
        log.info("runtime add: model %d as instance %d (BLAS %d nodes)",
                 mi, inst_id, self._inst_blas[-1].nodes.shape[0])
        return inst_id

    def _build_instanced_append(self, slot_base: int):
        """_build_instanced over self._instanced_models, APPENDING to the
        existing per-model lists."""
        blas_keep = self._inst_blas
        sa_keep = self._inst_scene_arrays
        off_keep = self._inst_slot_off
        self._inst_blas = []
        self._inst_scene_arrays = []
        self._inst_slot_off = []
        srcs = self._build_instanced(slot_base)
        self._inst_blas = blas_keep + self._inst_blas
        self._inst_scene_arrays = sa_keep + self._inst_scene_arrays
        self._inst_slot_off = off_keep + self._inst_slot_off
        return srcs

    def set_instance_transform(self, instance: int, transform: np.ndarray):
        """Move one instance: updates its matrix + world box + the TLAS —
        geometry untouched (the no-rebuild contract, ref: TLAS.cs role)."""
        self._instance_list[instance][1] = np.asarray(transform, np.float32)
        self._refresh_instance_device()

    def _refresh_instance_device(self):
        import jax.numpy as jnp

        from ..bvh.builder import TLAS

        invs, boxes, nmats = [], [], []
        for mi, t in self._instance_list:
            blas = self._inst_blas[mi]
            m = np.asarray(t, np.float64)
            inv = np.linalg.inv(m)
            invs.append(inv[:3, :4])
            # world box of the local root box's 8 corners
            lo = blas.nodes["min"][0].astype(np.float64)
            hi = blas.nodes["max"][0].astype(np.float64)
            corners = np.array([[x, y, z]
                                for x in (lo[0], hi[0])
                                for y in (lo[1], hi[1])
                                for z in (lo[2], hi[2])])
            wc = corners @ m[:3, :3].T + m[:3, 3]
            boxes.append(np.stack([wc.min(0), wc.max(0)]))
            nmats.append(np.linalg.inv(m[:3, :3]).T)
        self.instance_inv = jnp.asarray(np.stack(invs), jnp.float32)
        self.instance_boxes = jnp.asarray(np.stack(boxes), jnp.float32)
        self.instance_normal_mat = jnp.asarray(np.stack(nmats), jnp.float32)
        # TLAS over instance world boxes + the static scene root
        aabbs = [np.concatenate([np.asarray(b[0]), np.asarray(b[1])])
                 for b in boxes]
        if self._flat is not None:
            aabbs.insert(0, np.concatenate(
                [self._flat.node_min[0], self._flat.node_max[0]]))
        self.tlas = TLAS(np.stack(aabbs))

    def instance_set(self):
        """InstanceSet for the PathTracer, or None."""
        if not getattr(self, "_instance_list", None):
            return None
        import jax.numpy as jnp

        from ..ops.trace import InstanceSet

        return InstanceSet(
            scenes=tuple(self._inst_scene_arrays[mi]
                         for mi, _ in self._instance_list),
            inv=self.instance_inv,
            boxes=self.instance_boxes,
            slot_off=jnp.asarray(
                np.asarray([self._inst_slot_off[mi]
                            for mi, _ in self._instance_list], np.int32)),
            normal_mat=self.instance_normal_mat,
        )

    # ------------------------------------------------------------------
    def _get_refitter(self):
        """Lazily build the device refit plan (render/dynamic.py). The plan
        covers BOTH table sets (chained packet segments + wave segments)."""
        if getattr(self, "_refitter", None) is None:
            from ..render.dynamic import DeviceRefitter, build_refit_plan

            tb_packet = ([] if self._packet_tables is None else
                         (self._packet_tables
                          if isinstance(self._packet_tables, list)
                          else [self._packet_tables]))
            tb_wave = ([] if (self._wave_tables is None
                              or self._wave_tables is self._packet_tables)
                       else list(self._wave_tables))
            all_tables = tb_packet + tb_wave
            self._n_refit_packet = len(tb_packet)
            plan = build_refit_plan(
                self._flat, self._slot_tri, self._indices,
                self.build_settings.max_leaf_triangle_count,
                packet_tables=all_tables or None)
            self._refitter = DeviceRefitter(plan, self.device_scene)
            # static placement->vertex map for the device transform path
            vid = np.zeros(self._verts.shape[0], np.int32)
            for pi_, (mi, ni, p, im, v0, v1) in enumerate(self._placements):
                vid[v0:v1] = pi_
            self._placement_of_vertex = vid
            import jax.numpy as jnp

            self._verts_local = jnp.asarray(self._verts)
            self._normals_local = jnp.asarray(self._normals)
        return self._refitter

    def update_device(self, time: float, animation_index: int = 0):
        """Per-frame scene update entirely ON DEVICE: host samples the
        animation transforms (small scalars), the device transforms
        vertices, refits the BVH level-by-level and refreshes the packet
        tables — no geometry readback (SURVEY.md §7 step 7; contrast
        update(), which mirrors the reference's fenced-readback CPU refit).

        Returns the refreshed SceneArrays (also updates packet/wave state)."""
        from . import animation as anim_mod
        from . import skinning as skin_mod

        import jax.numpy as jnp

        refitter = self._get_refitter()
        any_dynamic = False
        n_place = len(self._placements)
        mats = np.tile(np.eye(4, dtype=np.float32)[None], (n_place, 1, 1))
        skinned: list[tuple[int, int, object, object]] = []
        for mi, model in enumerate(self.models):
            if not model.animations:
                continue
            anim = model.animations[min(animation_index,
                                        len(model.animations) - 1)]
            anim_mod.apply_animation(model, anim, time)
            transforms = model.global_transforms()
            any_dynamic = True
            jm_cache: dict[int, np.ndarray] = {}
            for pi_, (mi2, ni, pidx, im, v0, v1) in enumerate(self._placements):
                if mi2 != mi:
                    continue
                node = model.nodes[ni]
                prim = model.primitives[pidx]
                if node.skin >= 0 and prim.joints is not None:
                    if node.skin not in jm_cache:
                        jm_cache[node.skin] = skin_mod.joint_matrices(
                            transforms, model.skins[node.skin])
                    jm = jm_cache[node.skin]
                    sp = skin_mod.skin_positions(
                        jnp.asarray(prim.positions),
                        jnp.asarray(prim.joints.astype(np.int32)),
                        jnp.asarray(prim.weights), jnp.asarray(jm))
                    sn = skin_mod.skin_normals(
                        jnp.asarray(prim.normals),
                        jnp.asarray(prim.joints.astype(np.int32)),
                        jnp.asarray(prim.weights), jnp.asarray(jm))
                    skinned.append((v0, v1, sp, sn))
                else:
                    mats[pi_] = transforms[ni] @ im
        if not any_dynamic:
            return self.device_scene

        M = jnp.asarray(mats)[self._placement_of_vertex]  # (V,4,4)
        verts = jnp.einsum("vij,vj->vi", M[:, :3, :3], self._verts_local) \
            + M[:, :3, 3]
        nrm_m = jnp.transpose(jnp.linalg.inv(M[:, :3, :3]), (0, 2, 1))
        normals = jnp.einsum("vij,vj->vi", nrm_m, self._normals_local)
        normals = normals / jnp.maximum(
            jnp.linalg.norm(normals, axis=-1, keepdims=True), 1e-12)
        for v0, v1, sp, sn in skinned:
            verts = verts.at[v0:v1].set(sp)
            normals = normals.at[v0:v1].set(sn)

        # one refit covers scene arrays + every packed table set: the
        # plan groups [packet segments..., wave segments...]
        pk_scenes = ([] if self.packet_scene is None else
                     (list(self.packet_scene)
                      if isinstance(self.packet_scene, tuple)
                      else [self.packet_scene]))
        aliased = (self._wave_tables is self._packet_tables)
        wv_scenes = ([] if (self.wave_scene is None or aliased)
                     else list(self.wave_scene))
        packet_in = tuple(pk_scenes + wv_scenes) or None
        new_scene, new_pk, (wmin, wmax) = refitter.refit(
            self.device_scene, verts, normals, packet_in)
        self.device_scene = new_scene
        if new_pk is not None:
            npk = self._n_refit_packet
            if npk:
                self.packet_scene = (tuple(new_pk[:npk])
                                     if isinstance(self.packet_scene, tuple)
                                     else new_pk[0])
            if self.wave_scene is not None:
                new_wave = (tuple(new_pk[:npk]) if aliased
                            else tuple(new_pk[npk:]))
                self.wave_scene = new_wave
                self.wave_seg_min = (wmin[:npk] if aliased else wmin[npk:])
                self.wave_seg_max = (wmax[:npk] if aliased else wmax[npk:])
                self.wave_pairs_stack = jnp.concatenate(
                    [p.pairs for p in new_wave], axis=0)
                self.wave_leaf_stack = jnp.concatenate(
                    [p.leaf_geo for p in new_wave], axis=0)
        return self.device_scene

    # ------------------------------------------------------------------
    def refit_host(self, new_vertices: np.ndarray) -> SceneArrays:
        """Host refit path: update vertices, refit BLAS, re-upload changed
        arrays (the per-frame device-side path is update_device / render/dynamic.py)."""
        assert self.blas is not None
        self._verts = np.ascontiguousarray(new_vertices, np.float32)
        self.blas.refit(self._verts)
        self._flat, slot_perm = thread_bvh(self.blas.nodes)
        self._slot_tri = self.blas.tri_indices[slot_perm]
        ft = flatten_triangles_device(
            self._slot_tri, self._verts, self._indices, self._normals, self._uvs, self._tri_mat
        )
        self.device_scene = SceneArrays.from_flat(
            self._flat, ft, max_leaf=self.build_settings.max_leaf_triangle_count
        )
        self._build_packet_scene()
        return self.device_scene

    # ------------------------------------------------------------------
    def intersect_ray(self, origin, direction, t_max=3.4e38):
        """CPU picking/collision ray (ref: BVH.Intersect, Bvh/BVH.cs:162-223)."""
        assert self.blas is not None
        return self.blas.intersect_ray(origin, direction, t_max)

    def intersect_box(self, box_min, box_max):
        assert self.blas is not None
        return self.blas.intersect_box(box_min, box_max)
