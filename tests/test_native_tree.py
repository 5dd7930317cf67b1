"""Native (C++) tree flatten/collapse helpers must be bit-identical to the
Python fallbacks they replace (setup-time hot path at 2.8M tris; VERDICT r4
task 3). Each test builds a real BLAS, runs the helper both ways (native via
the .so, fallback by monkeypatching the native entry to None), and compares
every output array exactly."""
import numpy as np
import pytest

from idkengine_tpu.bvh import builder as B
from idkengine_tpu.bvh import flatten as F
from idkengine_tpu.ops import packet_trace as PT


def _scene(n_side=14, seed=0):
    rng = np.random.default_rng(seed)
    g = np.linspace(-1, 1, n_side)
    xx, yy = np.meshgrid(g, g)
    # bumpy heightfield triangulated + a few random floating quads
    zz = 0.3 * np.sin(3 * xx) * np.cos(2 * yy)
    verts = np.stack([xx, yy, zz], -1).reshape(-1, 3).astype(np.float32)
    idx = []
    for r in range(n_side - 1):
        for c in range(n_side - 1):
            a = r * n_side + c
            idx.append([a, a + 1, a + n_side])
            idx.append([a + 1, a + n_side + 1, a + n_side])
    extra_v = rng.normal(size=(60, 3)).astype(np.float32)
    base = verts.shape[0]
    for q in range(0, 60, 3):
        idx.append([base + q, base + q + 1, base + q + 2])
    verts = np.concatenate([verts, extra_v])
    return verts, np.asarray(idx, np.uint32)


@pytest.fixture(scope="module")
def blas():
    verts, idx = _scene()
    b = B.BLAS(verts, idx)
    assert b.nodes.shape[0] > 32, "scene too small to exercise the helpers"
    return b


def test_native_lib_present():
    assert B._load() is not None, (
        "libidk_bvh.so missing: native tree helpers untested"
    )


def _fallback(monkeypatch, *names):
    for nm in names:
        monkeypatch.setattr(B, nm, lambda *a, **k: None)


def test_thread_links_match(blas, monkeypatch):
    nat = B.tree_thread_links(blas.nodes)
    assert nat is not None
    flat_n, perm_n = F.thread_bvh(blas.nodes)
    _fallback(monkeypatch, "tree_thread_links")
    flat_p, perm_p = F.thread_bvh(blas.nodes)
    np.testing.assert_array_equal(flat_n.order, flat_p.order)
    np.testing.assert_array_equal(flat_n.hit_link, flat_p.hit_link)
    np.testing.assert_array_equal(flat_n.miss_link, flat_p.miss_link)
    np.testing.assert_array_equal(flat_n.node_first, flat_p.node_first)
    np.testing.assert_array_equal(flat_n.node_count, flat_p.node_count)
    np.testing.assert_array_equal(flat_n.node_min, flat_p.node_min)
    np.testing.assert_array_equal(perm_n, perm_p)


def test_collapse_leaves_match(blas, monkeypatch):
    out_n, orig_n = PT._collapse_leaves(blas.nodes, PT.MAX_LEAF_PACKET)
    _fallback(monkeypatch, "tree_collapse_leaves")
    out_p, orig_p = PT._collapse_leaves(blas.nodes, PT.MAX_LEAF_PACKET)
    assert out_n.shape == out_p.shape
    for f in ("min", "max", "left_or_first", "count"):
        np.testing.assert_array_equal(out_n[f], out_p[f])
    np.testing.assert_array_equal(orig_n, orig_p)


def test_segment_roots_and_subtree_match(blas, monkeypatch):
    coll, orig = PT._collapse_leaves(blas.nodes, PT.MAX_LEAF_PACKET)
    budget = 16 * 512  # force several segments on this small tree
    roots_n = PT._segment_roots(coll, budget)
    sub_n = [PT._subtree_extract(coll, orig, r) for r in roots_n]
    _fallback(monkeypatch, "tree_segment_roots", "tree_subtree_extract")
    roots_p = PT._segment_roots(coll, budget)
    sub_p = [PT._subtree_extract(coll, orig, r) for r in roots_p]
    assert list(roots_n) == list(roots_p)
    assert len(roots_n) > 1
    for (s_n, m_n), (s_p, m_p) in zip(sub_n, sub_p):
        for f in ("min", "max", "left_or_first", "count"):
            np.testing.assert_array_equal(s_n[f], s_p[f])
        np.testing.assert_array_equal(m_n, m_p)


def test_collapse_wide_match(blas, monkeypatch):
    coll, _ = PT._collapse_leaves(blas.nodes, PT.MAX_LEAF_PACKET)
    assert coll["count"][0] == 0, "root must be interior for wide collapse"
    kids_n, axis_n, order_n, meta_n = PT._collapse_wide(coll)
    _fallback(monkeypatch, "tree_collapse_wide")
    kids_p, axis_p, order_p, meta_p = PT._collapse_wide(coll)
    np.testing.assert_array_equal(kids_n, kids_p)
    np.testing.assert_array_equal(axis_n, axis_p)
    np.testing.assert_array_equal(order_n, order_p)
    np.testing.assert_array_equal(meta_n, meta_p)


def test_full_tables_match(blas, monkeypatch):
    """End-to-end: the packed segmented tables must be byte-identical."""
    verts, idx = _scene()
    slot_ids = blas.tri_indices
    budget = 24 * 512
    segs_n = PT.build_packet_tables_segmented(
        blas.nodes, slot_ids, verts, idx, budget)
    _fallback(monkeypatch, "tree_collapse_leaves", "tree_segment_roots",
              "tree_subtree_extract", "tree_collapse_wide",
              "tree_thread_links")
    segs_p = PT.build_packet_tables_segmented(
        blas.nodes, slot_ids, verts, idx, budget)
    assert len(segs_n) == len(segs_p)
    for t_n, t_p in zip(segs_n, segs_p):
        np.testing.assert_array_equal(t_n.pairs, t_p.pairs)
        np.testing.assert_array_equal(t_n.leaf_geo, t_p.leaf_geo)
        np.testing.assert_array_equal(t_n.leaf_first, t_p.leaf_first)
        np.testing.assert_array_equal(t_n.leaf_count, t_p.leaf_count)
