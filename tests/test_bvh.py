"""BVH builder/traversal tests: native vs numpy oracle vs brute force.

Mirrors the reference's numeric self-validation strategy (SURVEY.md §4):
SAH metrics as oracles, traversal equivalence, refit invariants.
"""
import numpy as np
import pytest

from idkengine_tpu.bvh import BLAS, TLAS, native_available
from idkengine_tpu.bvh.builder import (
    BuildSettings,
    compute_global_sah,
    intersect_ray_numpy,
    sphere_closest_triangle_numpy,
)


def random_mesh(seed=0, nv=500, nt=800, scale=5.0):
    rs = np.random.RandomState(seed)
    verts = (rs.randn(nv, 3) * scale).astype(np.float32)
    idx = rs.randint(0, nv, (nt, 3)).astype(np.uint32)
    return verts, idx


def grid_mesh(n=16):
    """A z=0 plane grid of 2*(n-1)^2 triangles — structured geometry."""
    xs, ys = np.meshgrid(np.linspace(-1, 1, n), np.linspace(-1, 1, n))
    verts = np.stack([xs.ravel(), ys.ravel(), np.zeros(n * n)], axis=-1).astype(np.float32)
    quads = []
    for j in range(n - 1):
        for i in range(n - 1):
            a = j * n + i
            quads.append([a, a + 1, a + n])
            quads.append([a + 1, a + n + 1, a + n])
    return verts, np.asarray(quads, dtype=np.uint32)


def brute_force_ray(verts, idx, o, d, tmax=3.4e38):
    p = verts[idx].astype(np.float64)
    e1, e2 = p[:, 1] - p[:, 0], p[:, 2] - p[:, 0]
    pv = np.cross(d, e2)
    det = (e1 * pv).sum(-1)
    ok = np.abs(det) > 1e-12
    inv = np.where(ok, 1.0 / np.where(ok, det, 1.0), 0.0)
    s = o - p[:, 0]
    u = (s * pv).sum(-1) * inv
    qv = np.cross(s, e1)
    v = (np.asarray(d) * qv).sum(-1) * inv
    t = (e2 * qv).sum(-1) * inv
    hit = ok & (u >= 0) & (u <= 1) & (v >= 0) & (u + v <= 1) & (t > 0) & (t < tmax)
    if not hit.any():
        return None
    i = int(np.where(hit, t, 1e30).argmin())
    return t[i], i


class TestBlasBuild:
    def test_native_compiled(self):
        assert native_available(), "C++ BVH core must compile in this environment"

    def test_structure_invariants(self):
        verts, idx = random_mesh()
        b = BLAS(verts, idx)
        nodes = b.nodes
        interior = nodes["count"] == 0
        left = nodes["left_or_first"][interior]
        # children in contiguous pairs, inside bounds
        assert (left + 1 < nodes.shape[0]).all()
        # every triangle referenced at least once
        assert set(b.tri_indices.tolist()) == set(range(idx.shape[0]))
        # parent boxes contain child boxes
        src = np.nonzero(interior)[0]
        for s, l in zip(src, left):
            for c in (l, l + 1):
                assert (nodes["min"][s] <= nodes["min"][c] + 1e-5).all()
                assert (nodes["max"][s] >= nodes["max"][c] - 1e-5).all()

    def test_sah_better_than_median_fallback(self):
        verts, idx = grid_mesh(24)
        sweep = BLAS(verts, idx)
        # numpy fallback builder is a median split — sweep SAH must beat it
        fb = BLAS.__new__(BLAS)
        fb.settings = BuildSettings()
        fb.vertices = verts
        fb.indices = idx
        fb._handle = None
        fb._build_fallback()
        assert sweep.sah_cost <= fb.sah_cost * 1.01

    def test_empty_mesh(self):
        # regression: empty tree's zero-count root must not be walked as an
        # interior node (used to self-reference and hang)
        b = BLAS(np.zeros((0, 3), np.float32), np.zeros((0, 3), np.uint32))
        assert b.nodes.shape[0] == 1
        assert b.intersect_ray(np.zeros(3, np.float32), np.array([0, 0, 1], np.float32)) is None
        assert b.intersect_box(np.full(3, -1, np.float32), np.ones(3, np.float32)).size == 0
        b.refit(np.zeros((0, 3), np.float32))

    def test_single_triangle(self):
        verts = np.array([[0, 0, 0], [1, 0, 0], [0, 1, 0]], np.float32)
        idx = np.array([[0, 1, 2]], np.uint32)
        b = BLAS(verts, idx)
        r = b.intersect_ray(np.array([0.2, 0.2, -1], np.float32), np.array([0, 0, 1], np.float32))
        assert r is not None and r[0] == pytest.approx(1.0, rel=1e-5)


class TestBlasTraversal:
    @pytest.mark.parametrize("seed", [0, 1, 2])
    def test_matches_brute_force(self, seed):
        verts, idx = random_mesh(seed)
        b = BLAS(verts, idx)
        rs = np.random.RandomState(seed + 100)
        for _ in range(60):
            o = rs.randn(3) * 8
            d = rs.randn(3)
            d /= np.linalg.norm(d)
            got = b.intersect_ray(o.astype(np.float32), d.astype(np.float32))
            want = brute_force_ray(verts, idx, o, d)
            assert (got is None) == (want is None)
            if got is not None:
                assert got[0] == pytest.approx(want[0], rel=1e-3, abs=1e-5)

    def test_numpy_path_matches_native(self):
        verts, idx = random_mesh(3)
        b = BLAS(verts, idx)
        rs = np.random.RandomState(42)
        for _ in range(30):
            o = rs.randn(3) * 8
            d = rs.randn(3)
            d /= np.linalg.norm(d)
            native = b.intersect_ray(o.astype(np.float32), d.astype(np.float32))
            ref = intersect_ray_numpy(
                b.nodes, b.tri_indices, b.vertices, b.indices, o, d
            )
            assert (native is None) == (ref is None)
            if native is not None:
                assert native[0] == pytest.approx(ref[0], rel=1e-4, abs=1e-6)

    def test_box_query_complete(self):
        verts, idx = random_mesh(4)
        b = BLAS(verts, idx)
        bm = np.array([-1, -1, -1], np.float32)
        bx = np.array([1, 1, 1], np.float32)
        got = set(b.intersect_box(bm, bx).tolist())
        p = verts[idx]
        overlap = (p.min(1) <= bx).all(1) & (p.max(1) >= bm).all(1)
        truth = set(np.nonzero(overlap)[0].tolist())
        assert truth <= got  # conservative: no misses allowed


class TestRefit:
    def test_refit_tightens_to_new_geometry(self):
        verts, idx = random_mesh(5)
        b = BLAS(verts, idx)
        v2 = verts * 0.5 + 1.0
        b.refit(v2)
        p = v2[idx]
        np.testing.assert_allclose(b.nodes["min"][0], p.min((0, 1)), atol=1e-4)
        np.testing.assert_allclose(b.nodes["max"][0], p.max((0, 1)), atol=1e-4)

    def test_traversal_correct_after_refit(self):
        verts, idx = grid_mesh(8)
        b = BLAS(verts, idx)
        v2 = verts.copy()
        v2[:, 2] += 1.0  # move plane to z=1
        b.refit(v2)
        r = b.intersect_ray(np.array([0, 0, -1], np.float32), np.array([0, 0, 1], np.float32))
        assert r is not None and r[0] == pytest.approx(2.0, rel=1e-4)


class TestPreSplitting:
    def test_presplit_improves_sah_on_mixed_scale(self):
        # A huge floor triangle plus a cloud of tiny ones: the classic case
        # pre-splitting exists for (ref: Readme.md PT FPS tables).
        rs = np.random.RandomState(8)
        small = rs.randn(300, 3, 3).astype(np.float32) * 0.2 + np.array([0, 2, 0], np.float32)
        floor = np.array(
            [[[-50, 0, -50], [50, 0, -50], [0, 0, 50]]], np.float32
        )
        tris = np.concatenate([floor, small])
        verts = tris.reshape(-1, 3)
        idx = np.arange(verts.shape[0], dtype=np.uint32).reshape(-1, 3)
        plain = BLAS(verts, idx, BuildSettings(presplit_factor=0.0))
        split = BLAS(verts, idx, BuildSettings(presplit_factor=0.3))
        assert split.tri_indices.shape[0] > plain.tri_indices.shape[0]

        # The giant triangle must end up in strictly tighter leaves: compare
        # the largest leaf AABB area that references triangle 0.
        def max_leaf_area_of_tri0(b):
            areas = []
            for i in range(b.nodes.shape[0]):
                c = int(b.nodes["count"][i])
                lof = int(b.nodes["left_or_first"][i])
                if c > 0 and 0 in b.tri_indices[lof : lof + c]:
                    e = b.nodes["max"][i] - b.nodes["min"][i]
                    areas.append(float(e[0] * (e[1] + e[2]) + e[1] * e[2]))
            return max(areas)

        assert max_leaf_area_of_tri0(split) < 0.5 * max_leaf_area_of_tri0(plain)

    def test_presplit_traversal_still_correct(self):
        verts, idx = grid_mesh(12)
        b = BLAS(verts, idx, BuildSettings(presplit_factor=1.0))
        rs = np.random.RandomState(9)
        for _ in range(40):
            o = np.array([rs.uniform(-0.9, 0.9), rs.uniform(-0.9, 0.9), -2.0])
            d = np.array([0.0, 0.0, 1.0])
            got = b.intersect_ray(o.astype(np.float32), d.astype(np.float32))
            want = brute_force_ray(verts, idx, o, d)
            assert got is not None and want is not None
            assert got[0] == pytest.approx(want[0], rel=1e-4)


class TestTlas:
    def test_covers_all_instances(self):
        rs = np.random.RandomState(10)
        mins = rs.randn(37, 3) * 10
        aabbs = np.concatenate([mins, mins + np.abs(rs.randn(37, 3)) + 0.1], axis=1)
        t = TLAS(aabbs.astype(np.float32))
        leaves = t.nodes[t.nodes["count"] == 1]
        assert t.nodes.shape[0] == 2 * 37 - 1
        assert set(leaves["left_or_first"].tolist()) == set(range(37))
        # parent containment
        interior = t.nodes["count"] == 0
        left = t.nodes["left_or_first"][interior]
        for s, l in zip(np.nonzero(interior)[0], left):
            for c in (l, l + 1):
                assert (t.nodes["min"][s] <= t.nodes["min"][c] + 1e-4).all()
                assert (t.nodes["max"][s] >= t.nodes["max"][c] - 1e-4).all()

    def test_single_instance(self):
        t = TLAS(np.array([[0, 0, 0, 1, 1, 1]], np.float32))
        assert t.nodes.shape[0] == 1
        assert t.nodes["count"][0] == 1


class TestCollision:
    def test_sphere_closest_point(self):
        verts = np.array([[0, 0, 0], [2, 0, 0], [0, 2, 0]], np.float32)
        idx = np.array([[0, 1, 2]], np.uint32)
        b = BLAS(verts, idx)
        res = b.sphere_closest_triangle(
            np.array([0], np.uint32), np.array([0.5, 0.5, 0.3], np.float32), 1.0
        )
        assert res is not None
        closest, dist, _ = res
        np.testing.assert_allclose(closest, [0.5, 0.5, 0.0], atol=1e-5)
        assert dist == pytest.approx(0.3, abs=1e-5)

    def test_native_matches_numpy(self):
        verts, idx = random_mesh(11, nv=60, nt=100, scale=2.0)
        b = BLAS(verts, idx)
        cands = np.arange(100, dtype=np.uint32)
        center = np.array([0.1, 0.2, 0.3], np.float32)
        native = b.sphere_closest_triangle(cands, center, 5.0)
        ref = sphere_closest_triangle_numpy(verts, idx, cands, center, 5.0)
        assert native is not None and ref is not None
        assert native[1] == pytest.approx(ref[1], abs=1e-4)
