"""Engine-side scene model: the CPU-resident structured form of a loaded asset.

Equivalent in role to the reference's ModelLoader output structures
(ref: IDKEngine/Source/Utils/ModelLoader.cs CpuModel/GpuModel), re-shaped as
SoA numpy arrays ready for flattening to device buffers.
"""
from __future__ import annotations

from dataclasses import dataclass, field

import numpy as np

from ..utils import mathutil as mu


@dataclass
class Material:
    """PBR material (ref: GpuTypes/GpuMaterial.cs + ModelLoader.cs:1565-1628).

    Volume/transmission extensions are folded into `absorbance` the same way
    the reference derives Beer–Lambert absorbance from KHR_materials_volume
    attenuation color/distance."""

    name: str = ""
    base_color: np.ndarray = field(default_factory=lambda: np.ones(4, np.float32))
    emissive: np.ndarray = field(default_factory=lambda: np.zeros(3, np.float32))
    metallic: float = 0.0
    roughness: float = 1.0
    ior: float = 1.5
    transmission: float = 0.0
    absorbance: np.ndarray = field(default_factory=lambda: np.zeros(3, np.float32))
    alpha_cutoff: float = 0.5  # alphaMode MASK; -1 = OPAQUE, 0 = BLEND
    double_sided: bool = False
    # texture indices into Model.textures (-1 = none)
    base_color_texture: int = -1
    metallic_roughness_texture: int = -1
    normal_texture: int = -1
    emissive_texture: int = -1
    occlusion_texture: int = -1


@dataclass
class Texture:
    """Decoded RGBA8 image or a deferred/fallback marker."""

    name: str = ""
    data: np.ndarray | None = None  # (H, W, 4) uint8, None if undecodable
    is_srgb: bool = True
    # deferred-decode payload (async IO, scene/async_io.py); name carries
    # the decode hint (file extension) when set
    source_bytes: bytes | None = None
    # IDK_BC5_normal_metallicRoughness channel semantics: BasisU payloads
    # carry (X|metallic) in R and (Y|roughness) in A; the loader normalizes
    # decoded pixels back to the standard glTF layout
    # (gltf.apply_channel_layout). None | "bc5_normal" | "bc5_mr".
    channel_layout: str | None = None


@dataclass
class MeshPrimitive:
    """One drawable primitive: indexed triangles + vertex attributes."""

    positions: np.ndarray  # (V, 3) f32
    indices: np.ndarray  # (T, 3) u32
    normals: np.ndarray | None = None  # (V, 3) f32
    tangents: np.ndarray | None = None  # (V, 4) f32
    uvs: np.ndarray | None = None  # (V, 2) f32
    joints: np.ndarray | None = None  # (V, 4) u16
    weights: np.ndarray | None = None  # (V, 4) f32
    material: int = 0

    def ensure_normals(self):
        """Generate smooth vertex normals when the asset omits them
        (ref: ModelLoader.cs vertex pull + normal generation :1296-1409)."""
        if self.normals is not None:
            return
        n = np.zeros_like(self.positions)
        p = self.positions[self.indices]
        fn = np.cross(p[:, 1] - p[:, 0], p[:, 2] - p[:, 0])
        for k in range(3):
            np.add.at(n, self.indices[:, k], fn)
        self.normals = mu.normalize(n).astype(np.float32)


@dataclass
class AnimationSampler:
    times: np.ndarray  # (K,) f32
    values: np.ndarray  # (K, D)
    interpolation: str = "LINEAR"  # LINEAR | STEP | CUBICSPLINE


@dataclass
class AnimationChannel:
    node: int
    path: str  # translation | rotation | scale | weights
    sampler: AnimationSampler


@dataclass
class Animation:
    name: str
    channels: list[AnimationChannel]

    @property
    def duration(self) -> float:
        return max((float(c.sampler.times[-1]) for c in self.channels if len(c.sampler.times)), default=0.0)


@dataclass
class Skin:
    joints: np.ndarray  # (J,) node indices
    inverse_bind_matrices: np.ndarray  # (J, 4, 4)
    skeleton: int = -1


@dataclass
class Node:
    """Flat-array scene-graph node (ref: ModelLoader node hierarchy)."""

    name: str = ""
    parent: int = -1
    children: list[int] = field(default_factory=list)
    translation: np.ndarray = field(default_factory=lambda: np.zeros(3, np.float32))
    rotation: np.ndarray = field(default_factory=lambda: np.array([0, 0, 0, 1], np.float32))
    scale: np.ndarray = field(default_factory=lambda: np.ones(3, np.float32))
    mesh_primitives: list[int] = field(default_factory=list)  # into Model.primitives
    skin: int = -1
    # EXT_mesh_gpu_instancing: (I,4,4) per-instance local transforms
    instance_transforms: np.ndarray | None = None

    def local_matrix(self) -> np.ndarray:
        return mu.trs_matrix(self.translation, self.rotation, self.scale)


@dataclass
class Model:
    name: str = ""
    nodes: list[Node] = field(default_factory=list)
    root_nodes: list[int] = field(default_factory=list)
    primitives: list[MeshPrimitive] = field(default_factory=list)
    materials: list[Material] = field(default_factory=list)
    textures: list[Texture] = field(default_factory=list)
    animations: list[Animation] = field(default_factory=list)
    skins: list[Skin] = field(default_factory=list)

    def global_transforms(self) -> np.ndarray:
        """(N,4,4) node-to-model matrices via top-down hierarchy walk
        (ref: ModelManager.UpdateNodeHierarchy:482-512)."""
        n = len(self.nodes)
        out = np.zeros((n, 4, 4), np.float32)
        # nodes are stored parent-before-child (loader guarantees this)
        for i, node in enumerate(self.nodes):
            local = node.local_matrix()
            out[i] = local if node.parent < 0 else out[node.parent] @ local
        return out

    def triangle_count(self) -> int:
        return sum(p.indices.shape[0] for p in self.primitives)


def hoist_static_primitives(model: Model) -> Model:
    """Merge all non-animated, non-skinned, non-instanced primitives into a
    single root-level mesh with baked world transforms.

    The reference's HoistMeshPrimitives (ModelLoader.cs:2021-2130) merges
    static child meshes upward and reports >2x ray tracing perf; for the TPU
    path tracer the merged form additionally collapses TLAS indirection in
    the traversal kernel, so it is the default for static scenes."""
    animated_nodes = set()
    for anim in model.animations:
        for ch in anim.channels:
            animated_nodes.add(ch.node)
    # propagate: children of animated nodes are animated too
    changed = True
    while changed:
        changed = False
        for i, nd in enumerate(model.nodes):
            if i not in animated_nodes and nd.parent in animated_nodes:
                animated_nodes.add(i)
                changed = True

    transforms = model.global_transforms()
    merged: dict[int, list[MeshPrimitive]] = {}
    new_model = Model(
        name=model.name,
        materials=model.materials,
        textures=model.textures,
        animations=model.animations,
        skins=model.skins,
    )

    static_prims: list[MeshPrimitive] = []
    for ni, node in enumerate(model.nodes):
        is_static = (
            ni not in animated_nodes
            and node.skin < 0
            and node.instance_transforms is None
        )
        if not node.mesh_primitives:
            continue
        m = transforms[ni]
        for pi in node.mesh_primitives:
            prim = model.primitives[pi]
            if is_static:
                p = prim.positions @ m[:3, :3].T + m[:3, 3]
                nrm = prim.normals
                if nrm is None:
                    prim.ensure_normals()
                    nrm = prim.normals
                nmat = np.linalg.inv(m[:3, :3]).T
                new_prim = MeshPrimitive(
                    positions=p.astype(np.float32),
                    indices=prim.indices,
                    normals=mu.normalize(nrm @ nmat.T).astype(np.float32),
                    tangents=None
                    if prim.tangents is None
                    else np.concatenate(
                        [
                            mu.normalize(prim.tangents[:, :3] @ m[:3, :3].T),
                            prim.tangents[:, 3:],
                        ],
                        axis=1,
                    ).astype(np.float32),
                    uvs=prim.uvs,
                    material=prim.material,
                )
                static_prims.append(new_prim)
            else:
                merged.setdefault(ni, []).append(model.primitives[pi])

    # static primitives under one root node (one per material is not needed:
    # per-triangle material ids are assigned at flatten time)
    for prim in static_prims:
        new_model.primitives.append(prim)
    if static_prims:
        root = Node(name="hoisted_static")
        root.mesh_primitives = list(range(len(static_prims)))
        new_model.nodes.append(root)
        new_model.root_nodes.append(0)

    # re-add dynamic nodes preserving hierarchy (remap indices)
    remap = {}
    for ni, node in enumerate(model.nodes):
        needs_node = ni in merged or ni in animated_nodes or node.skin >= 0 or (
            node.instance_transforms is not None and node.mesh_primitives
        )
        # also keep ancestors of kept nodes so transforms resolve
        if needs_node:
            chain = []
            j = ni
            while j >= 0 and j not in remap:
                chain.append(j)
                j = model.nodes[j].parent
            for j in reversed(chain):
                remap[j] = len(new_model.nodes)
                src = model.nodes[j]
                nn = Node(
                    name=src.name,
                    parent=remap.get(src.parent, -1),
                    translation=src.translation.copy(),
                    rotation=src.rotation.copy(),
                    scale=src.scale.copy(),
                    skin=src.skin,
                    instance_transforms=src.instance_transforms,
                )
                if j in merged:
                    for prim in merged[j]:
                        nn.mesh_primitives.append(len(new_model.primitives))
                        new_model.primitives.append(prim)
                new_model.nodes.append(nn)
                if nn.parent < 0:
                    new_model.root_nodes.append(remap[j])
    # fix animation channel node references
    if model.animations:
        new_anims = []
        for anim in model.animations:
            chans = [
                AnimationChannel(remap[c.node], c.path, c.sampler)
                for c in anim.channels
                if c.node in remap
            ]
            new_anims.append(Animation(anim.name, chans))
        new_model.animations = new_anims
    # fix skin joint references
    new_skins = []
    for sk in model.skins:
        new_skins.append(
            Skin(
                joints=np.array([remap.get(int(j), -1) for j in sk.joints], np.int32),
                inverse_bind_matrices=sk.inverse_bind_matrices,
                skeleton=remap.get(sk.skeleton, -1),
            )
        )
    new_model.skins = new_skins
    return new_model
