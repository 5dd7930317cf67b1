"""Meshopt pass (scene/meshopt.py): exact-permutation invariants +
measurable locality improvement (the pass's whole reason to exist)."""
import numpy as np

from idkengine_tpu.scene.meshopt import (
    optimize_primitive, reindex_vertices_first_use,
    reorder_triangles_morton)
from idkengine_tpu.scene.model import MeshPrimitive


def _random_prim(rs, nv=500, nt=800, extra=True):
    pos = rs.rand(nv, 3).astype(np.float32) * 10
    idx = rs.randint(0, nv, (nt, 3)).astype(np.uint32)
    p = MeshPrimitive(positions=pos, indices=idx, material=3)
    if extra:
        p.normals = rs.randn(nv, 3).astype(np.float32)
        p.uvs = rs.rand(nv, 2).astype(np.float32)
        p.joints = rs.randint(0, 4, (nv, 4)).astype(np.uint16)
        p.weights = rs.rand(nv, 4).astype(np.float32)
    return p


def _tri_set(prim):
    """Canonical multiset of triangles with attributes, order-free."""
    tri = prim.positions[prim.indices]  # (T,3,3)
    uv = prim.uvs[prim.indices] if prim.uvs is not None else 0 * tri[..., :2]
    flat = np.concatenate([tri.reshape(len(tri), -1),
                           uv.reshape(len(tri), -1)], axis=1)
    return np.sort(flat.round(5).view([("", flat.dtype)] * flat.shape[1]),
                   axis=0)


def test_permutation_exactness():
    rs = np.random.RandomState(0)
    p = _random_prim(rs)
    before = _tri_set(p)
    optimize_primitive(p)
    after = _tri_set(p)
    assert np.array_equal(before, after)
    # vertices are exactly the referenced ones, each exactly once
    assert p.positions.shape[0] == len(np.unique(p.indices.reshape(-1)))
    assert p.joints.dtype == np.uint16 and p.indices.dtype == np.uint32


def test_drops_unreferenced_vertices():
    rs = np.random.RandomState(1)
    p = _random_prim(rs, nv=100, nt=20)
    used = len(np.unique(p.indices.reshape(-1)))
    reindex_vertices_first_use(p)
    assert p.positions.shape[0] == used


def test_first_use_order_is_monotone():
    rs = np.random.RandomState(2)
    p = _random_prim(rs, nv=60, nt=40, extra=False)
    reindex_vertices_first_use(p)
    flat = p.indices.reshape(-1).astype(np.int64)
    firsts = np.zeros(p.positions.shape[0], np.int64)
    seen = np.zeros(p.positions.shape[0], bool)
    for i, v in enumerate(flat):
        if not seen[v]:
            seen[v] = True
            firsts[v] = i
    # new vertex ids must be assigned in order of first appearance
    assert np.all(np.diff(firsts) > 0)


def test_morton_improves_locality():
    # a scrambled grid of quads: after the pass, consecutive triangles
    # must be spatially closer on average than before
    rs = np.random.RandomState(3)
    n = 24
    xs, zs = np.meshgrid(np.arange(n, dtype=np.float32),
                         np.arange(n, dtype=np.float32))
    pos = np.stack([xs.ravel(), 0 * xs.ravel(), zs.ravel()], -1)
    quads = []
    for i in range(n - 1):
        for j in range(n - 1):
            a = i * n + j
            quads += [[a, a + 1, a + n], [a + 1, a + n + 1, a + n]]
    idx = np.asarray(quads, np.uint32)
    idx = idx[rs.permutation(len(idx))]  # scramble
    p = MeshPrimitive(positions=pos, indices=idx)

    def mean_jump(prim):
        c = prim.positions[prim.indices].mean(axis=1)
        return float(np.linalg.norm(np.diff(c, axis=0), axis=1).mean())

    before = mean_jump(p)
    reorder_triangles_morton(p)
    after = mean_jump(p)
    assert after < before * 0.25, (before, after)


def test_gltf_loader_runs_pass(tmp_path):
    # BVH/trace equivalence: optimized vs unoptimized load of the same file
    import json

    pos = np.array([[0, 0, 0], [1, 0, 0], [1, 1, 0], [0, 1, 0],
                    [2, 0, 0], [3, 0, 0], [3, 1, 0]], np.float32)
    idx = np.array([[0, 1, 2], [0, 2, 3], [4, 5, 6]], np.uint32)
    pb = pos.tobytes() + idx.tobytes()
    g = {
        "asset": {"version": "2.0"},
        "scenes": [{"nodes": [0]}], "scene": 0,
        "nodes": [{"mesh": 0}],
        "meshes": [{"primitives": [
            {"attributes": {"POSITION": 0}, "indices": 1}]}],
        "accessors": [
            {"bufferView": 0, "componentType": 5126, "count": 7,
             "type": "VEC3", "min": pos.min(0).tolist(),
             "max": pos.max(0).tolist()},
            {"bufferView": 1, "componentType": 5125, "count": 9,
             "type": "SCALAR"},
        ],
        "bufferViews": [
            {"buffer": 0, "byteOffset": 0, "byteLength": pos.nbytes},
            {"buffer": 0, "byteOffset": pos.nbytes,
             "byteLength": idx.nbytes},
        ],
        "buffers": [{"byteLength": len(pb), "uri": "m.bin"}],
    }
    (tmp_path / "m.bin").write_bytes(pb)
    (tmp_path / "m.gltf").write_text(json.dumps(g))

    from idkengine_tpu.scene.gltf import load_gltf
    m_opt = load_gltf(str(tmp_path / "m.gltf"))
    m_raw = load_gltf(str(tmp_path / "m.gltf"), optimize=False)
    p_opt, p_raw = m_opt.primitives[0], m_raw.primitives[0]
    assert np.array_equal(_tri_set(p_opt), _tri_set(p_raw))
    # the unreferenced-vertex count may differ; triangle geometry may not
