"""Packet tracer (Pallas, interpret mode) vs CPU traversal oracle."""
import numpy as np
import pytest

jax = pytest.importorskip("jax")
import jax.numpy as jnp  # noqa: E402

from idkengine_tpu.bvh import BLAS  # noqa: E402
from idkengine_tpu.bvh.builder import BuildSettings  # noqa: E402
from idkengine_tpu.ops.packet_trace import (  # noqa: E402
    MAX_LEAF_PACKET,
    PacketScene,
    _collapse_leaves,
    build_packet_tables,
    packet_trace_any,
    packet_trace_closest,
)
from idkengine_tpu.scene.procedural import atrium, cornell_box  # noqa: E402


def _merge(model):
    verts, idx = [], []
    voff = 0
    for p in model.primitives:
        verts.append(p.positions)
        idx.append(p.indices + voff)
        voff += p.positions.shape[0]
    return np.concatenate(verts), np.concatenate(idx)


@pytest.fixture(scope="module", params=[False, True], ids=["pair", "wide"])
def cornell_setup(request):
    verts, idx = _merge(cornell_box())
    b = BLAS(verts, idx, BuildSettings(max_leaf_triangle_count=MAX_LEAF_PACKET, traversal_cost=3.0))
    tables = build_packet_tables(b.nodes, b.tri_indices, verts, idx,
                                 wide=request.param)
    return b, PacketScene.from_tables(tables)


class TestCollapse:
    def test_collapse_preserves_coverage(self):
        verts, idx = _merge(atrium(5000))
        b = BLAS(verts, idx, BuildSettings(max_leaf_triangle_count=4))
        merged, _ = _collapse_leaves(b.nodes, MAX_LEAF_PACKET)
        # all original tri slots still referenced exactly once-ish (ranges)
        leaf = merged["count"] > 0
        total = int(merged["count"][leaf].sum())
        assert total == b.tri_indices.shape[0]
        # parent containment holds
        interior = ~leaf
        left = merged["left_or_first"][interior]
        for s, l in zip(np.nonzero(interior)[0], left):
            for c in (l, l + 1):
                assert (merged["min"][s] <= merged["min"][c] + 1e-4).all()

    def test_collapse_shrinks_leaf_count(self):
        verts, idx = _merge(atrium(5000))
        b = BLAS(verts, idx, BuildSettings(max_leaf_triangle_count=4))
        before = int((b.nodes["count"] > 0).sum())
        merged, _ = _collapse_leaves(b.nodes, MAX_LEAF_PACKET)
        after = int((merged["count"] > 0).sum())
        assert after < before


class TestPacketTrace:
    def test_closest_matches_cpu(self, cornell_setup):
        b, ps = cornell_setup
        rs = np.random.RandomState(3)
        R = 1024
        o = (b.vertices.mean(0) + rs.randn(R, 3) * 300).astype(np.float32)
        d = rs.randn(R, 3).astype(np.float32)
        d /= np.linalg.norm(d, axis=-1, keepdims=True)
        hit = packet_trace_closest(
            ps, jnp.asarray(o), jnp.asarray(d), jnp.full((R,), 1e30, jnp.float32),
            interpret=True,
        )
        for i in range(0, R, 29):
            cpu = b.intersect_ray(o[i], d[i])
            if cpu is None:
                assert int(hit.slot[i]) < 0
            else:
                assert float(hit.t[i]) == pytest.approx(cpu[0], rel=1e-2)

    def test_any_hit_matches_cpu(self, cornell_setup):
        b, ps = cornell_setup
        rs = np.random.RandomState(4)
        R = 1024
        o = (b.vertices.mean(0) + rs.randn(R, 3) * 200).astype(np.float32)
        d = rs.randn(R, 3).astype(np.float32)
        d /= np.linalg.norm(d, axis=-1, keepdims=True)
        t_cut = 250.0
        occ = packet_trace_any(
            ps, jnp.asarray(o), jnp.asarray(d), jnp.full((R,), t_cut, jnp.float32),
            interpret=True,
        )
        for i in range(0, R, 29):
            cpu = b.intersect_ray(o[i], d[i], t_cut)
            assert bool(occ[i]) == (cpu is not None)

    def test_rows_param_equivalent(self, cornell_setup):
        # packet size is a perf knob only — results must be identical
        b, ps = cornell_setup
        rs = np.random.RandomState(5)
        R = 2048
        o = (b.vertices.mean(0) + rs.randn(R, 3) * 300).astype(np.float32)
        d = rs.randn(R, 3).astype(np.float32)
        d /= np.linalg.norm(d, axis=-1, keepdims=True)
        tm = jnp.full((R,), 1e30, jnp.float32)
        h8 = packet_trace_closest(ps, jnp.asarray(o), jnp.asarray(d), tm,
                                  interpret=True, rows=8)
        h16 = packet_trace_closest(ps, jnp.asarray(o), jnp.asarray(d), tm,
                                   interpret=True, rows=16)
        # packet grouping changes traversal order → coplanar ties may pick a
        # different (equally correct) triangle; t and hit/miss must agree
        np.testing.assert_array_equal(np.asarray(h8.slot >= 0),
                                      np.asarray(h16.slot >= 0))
        np.testing.assert_allclose(np.asarray(h8.t), np.asarray(h16.t),
                                   rtol=1e-5, atol=1e-5)

    def test_dead_rays_ignored(self, cornell_setup):
        _, ps = cornell_setup
        R = 1024
        o = jnp.zeros((R, 3), jnp.float32)
        d = jnp.tile(jnp.asarray([[0.0, 0.0, 1.0]]), (R, 1))
        t_max = jnp.full((R,), -1.0, jnp.float32)  # all dead
        hit = packet_trace_closest(ps, o, d, t_max, interpret=True)
        assert int(jnp.sum(hit.slot >= 0)) == 0


class TestWideRefresh:
    def test_refresh_matches_rebuild(self):
        """In-place table refresh after a refit must equal re-packing the
        refit tree (boxes + leaf geometry; topology is build-time)."""
        from idkengine_tpu.bvh.builder import refit_nodes_numpy

        verts, idx = _merge(atrium(4000))
        b = BLAS(verts, idx, BuildSettings(max_leaf_triangle_count=MAX_LEAF_PACKET,
                                           traversal_cost=3.0))
        t = build_packet_tables(b.nodes, b.tri_indices, verts, idx, wide=True)
        verts2 = verts + np.float32([0.3, -0.1, 0.2])
        nodes2 = b.nodes.copy()
        refit_nodes_numpy(nodes2, b.tri_indices, verts2, idx)
        t.refresh(nodes2, b.tri_indices, verts2, idx)
        t2 = build_packet_tables(nodes2, b.tri_indices, verts2, idx, wide=True)
        # the rebuild may pick a different (valid) wide topology — compare
        # traversal results, not raw tables
        rs = np.random.RandomState(11)
        R = 1024
        c = verts2.mean(0)
        ext = float(np.max(verts2.max(0) - verts2.min(0)))
        o = (c + rs.randn(R, 3) * ext).astype(np.float32)
        d = rs.randn(R, 3).astype(np.float32)
        d /= np.linalg.norm(d, axis=-1, keepdims=True)
        tm = jnp.full((R,), 1e30, jnp.float32)
        h1 = packet_trace_closest(PacketScene.from_tables(t), jnp.asarray(o),
                                  jnp.asarray(d), tm, interpret=True)
        h2 = packet_trace_closest(PacketScene.from_tables(t2), jnp.asarray(o),
                                  jnp.asarray(d), tm, interpret=True)
        np.testing.assert_allclose(np.asarray(h1.t), np.asarray(h2.t),
                                   rtol=1e-5, atol=1e-5)
        np.testing.assert_array_equal(np.asarray(h1.slot >= 0),
                                      np.asarray(h2.slot >= 0))


class TestSegmented:
    @pytest.mark.parametrize("wide", [False, True], ids=["pair", "wide"])
    def test_segmented_matches_single(self, wide):
        """Tiny VMEM budget forces multiple subtree segments; chained
        traversal must agree with the single-table kernel."""
        from idkengine_tpu.ops.packet_trace import build_packet_tables_segmented

        verts, idx = _merge(atrium(8000))
        b = BLAS(verts, idx, BuildSettings(max_leaf_triangle_count=MAX_LEAF_PACKET,
                                           traversal_cost=3.0))
        single = PacketScene.from_tables(
            build_packet_tables(b.nodes, b.tri_indices, verts, idx, wide=wide))
        segs = build_packet_tables_segmented(
            b.nodes, b.tri_indices, verts, idx, budget=120_000, wide=wide)
        assert len(segs) > 2
        multi = tuple(PacketScene.from_tables(t) for t in segs)

        rs = np.random.RandomState(7)
        R = 1024
        c = verts.mean(0)
        ext = float(np.max(verts.max(0) - verts.min(0)))
        o = (c + rs.randn(R, 3) * ext).astype(np.float32)
        d = rs.randn(R, 3).astype(np.float32)
        d /= np.linalg.norm(d, axis=-1, keepdims=True)
        tm = jnp.full((R,), 1e30, jnp.float32)
        h1 = packet_trace_closest(single, jnp.asarray(o), jnp.asarray(d), tm,
                                  interpret=True)
        h2 = packet_trace_closest(multi, jnp.asarray(o), jnp.asarray(d), tm,
                                  interpret=True)
        np.testing.assert_allclose(np.asarray(h1.t), np.asarray(h2.t), rtol=1e-5)
        np.testing.assert_array_equal(np.asarray(h1.slot >= 0),
                                      np.asarray(h2.slot >= 0))
        occ1 = packet_trace_any(single, jnp.asarray(o), jnp.asarray(d),
                                jnp.full((R,), ext, jnp.float32), interpret=True)
        occ2 = packet_trace_any(multi, jnp.asarray(o), jnp.asarray(d),
                                jnp.full((R,), ext, jnp.float32), interpret=True)
        np.testing.assert_array_equal(np.asarray(occ1), np.asarray(occ2))


class TestWaveTracing:
    """Segment-wave and multi-steer tracers must match the chained trace
    exactly (same kernels, different scheduling)."""

    def _scene(self):
        import os
        os.environ.setdefault("IDK_WAVE_SEGS", "6")
        from idkengine_tpu.bvh.builder import BuildSettings
        from idkengine_tpu.scene.procedural import atrium
        from idkengine_tpu.scene.scene_db import SceneDatabase

        db = SceneDatabase(BuildSettings(
            max_leaf_triangle_count=12, traversal_cost=4.0,
            presplit_factor=0.0))
        # 8000 tris: comfortably above the wave-segmenter's 200 KB floor
        # under BOTH the exact-sweep and the hybrid binned BLAS build (the
        # 3000-tri scene straddled it: 204 KB exact vs 197 KB binned)
        db.add_model(atrium(8000))
        sc = db.build()
        return db, sc

    def _rays(self, sc, n=3072):
        import jax.numpy as jnp
        import numpy as np
        rng = np.random.default_rng(7)
        lo = np.asarray(sc.node_min[0])
        hi = np.asarray(sc.node_max[0])
        o = rng.uniform(lo, hi, (n, 3)).astype(np.float32)
        d = rng.standard_normal((n, 3)).astype(np.float32)
        d /= np.linalg.norm(d, axis=-1, keepdims=True)
        return jnp.asarray(o), jnp.asarray(d)

    def test_wave_and_steered_match_chained(self):
        import jax.numpy as jnp
        import numpy as np

        import idkengine_tpu.ops.packet_trace as pt

        db, sc = self._scene()
        assert db.wave_scene is not None and len(db.wave_scene) >= 2
        o, d = self._rays(sc)
        tm = jnp.full((o.shape[0],), 3.4e38, jnp.float32)
        smin = jnp.asarray(db.wave_seg_min)
        smax = jnp.asarray(db.wave_seg_max)
        lo = jnp.asarray(sc.node_min[0])
        ext = jnp.asarray(sc.node_max[0]) - lo
        key = pt.segment_wave_key(o, d, tm, smin, smax, lo, ext)
        p = jnp.argsort(key)
        o, d = o[p], d[p]
        base = pt.packet_trace_closest(db.packet_scene, o, d, tm,
                                       interpret=True, rows=8)
        wave = pt.packet_trace_closest_waves(
            db.wave_scene, smin, smax, o, d, tm, interpret=True, rows=8)
        steer = pt.packet_trace_closest_steered(
            db.wave_scene, db.wave_pairs_stack, db.wave_leaf_stack,
            smin, smax, o, d, tm, interpret=True, rows=8)
        # the legacy unrolled two-pass scheme must stay exact too
        old_loop, pt.STEER_LOOP = pt.STEER_LOOP, 0
        try:
            pt.packet_trace_closest_steered.clear_cache()
            steer_unrolled = pt.packet_trace_closest_steered(
                db.wave_scene, db.wave_pairs_stack, db.wave_leaf_stack,
                smin, smax, o, d, tm, interpret=True, rows=8)
        finally:
            pt.STEER_LOOP = old_loop
            pt.packet_trace_closest_steered.clear_cache()
        for name, h in (("wave", wave), ("steer", steer),
                        ("steer_unrolled", steer_unrolled)):
            bs, hs = np.asarray(base.slot), np.asarray(h.slot)
            bt, ht = np.asarray(base.t), np.asarray(h.t)
            # hit masks must agree; slots may differ only on equal-t ties
            # (e.g. a ray hitting a shared edge — segment visit order then
            # legitimately picks the other triangle)
            np.testing.assert_array_equal(bs >= 0, hs >= 0, err_msg=name)
            hit = bs >= 0
            np.testing.assert_allclose(bt[hit], ht[hit], rtol=1e-6,
                                       err_msg=name)
            diff = (bs != hs) & hit
            assert np.all(np.abs(bt[diff] - ht[diff])
                          <= 1e-6 * np.abs(bt[diff]) + 1e-6), (
                name, np.nonzero(diff)[0][:5])

    def test_pathtracer_steered_image_matches_single_table(self):
        """PathTracer wiring: a segmented packet scene + WaveSet routes
        traversal through the steered kernel and renders the same image as
        the single-table packet path."""
        import jax.numpy as jnp
        import numpy as np

        import idkengine_tpu.ops.packet_trace as pt
        from idkengine_tpu.render import (
            Camera, PathTracer, PathTracerSettings)

        db, sc = self._scene()
        db.lights.add([0.0, 8.0, 0.0], [30.0, 30.0, 30.0], radius=0.5)
        mats = db.materials.soa()
        lights = db.lights.soa()
        cam = Camera(position=np.array([0, 3, 24], np.float32), yaw=-90.0,
                     fov_y=65.0)
        settings = PathTracerSettings(ray_depth=2, sky_strength=0.4,
                                      use_packet_tracer=True)
        pt.FORCE_INTERPRET = True
        try:
            ref = PathTracer(sc, mats, lights, 32, 16, settings,
                             packet_scene=db.packet_scene)
            img_ref = np.asarray(ref.render_frame(cam))
            ws = db.wave_set()
            assert ws is not None and len(ws.segs) >= 2
            spt = PathTracer(sc, mats, lights, 32, 16, settings,
                             packet_scene=tuple(ws.segs), wave_boxes=ws)
            img_st = np.asarray(spt.render_frame(cam))
        finally:
            pt.FORCE_INTERPRET = False
        rmse = float(np.sqrt(np.mean((img_st - img_ref) ** 2)))
        assert rmse <= 2e-3, f"steered PT image diverged: RMSE {rmse:.2e}"

    def test_any_wave_and_steered_match_chained(self):
        import jax.numpy as jnp
        import numpy as np

        import idkengine_tpu.ops.packet_trace as pt

        db, sc = self._scene()
        o, d = self._rays(sc)
        tm = jnp.full((o.shape[0],), 15.0, jnp.float32)
        smin = jnp.asarray(db.wave_seg_min)
        smax = jnp.asarray(db.wave_seg_max)
        base = pt.packet_trace_any(db.packet_scene, o, d, tm,
                                   interpret=True, rows=8)
        wave = pt.packet_trace_any_waves(
            db.wave_scene, smin, smax, o, d, tm, interpret=True, rows=8)
        steer = pt.packet_trace_any_steered(
            db.wave_scene, db.wave_pairs_stack, db.wave_leaf_stack,
            smin, smax, o, d, tm, interpret=True, rows=8)
        np.testing.assert_array_equal(np.asarray(base), np.asarray(wave))
        np.testing.assert_array_equal(np.asarray(base), np.asarray(steer))


class TestRebinTracing:
    """Dense per-segment re-binned tracer (round 5) must match the chained
    trace exactly, including the over-K / over-budget residual routes."""

    _scene = TestWaveTracing._scene
    _rays = TestWaveTracing._rays

    def test_rebin_closest_matches_chained(self):
        import jax.numpy as jnp
        import numpy as np

        import idkengine_tpu.ops.packet_trace as pt

        db, sc = self._scene()
        assert db.wave_scene is not None and len(db.wave_scene) >= 2
        o, d = self._rays(sc)
        tm = jnp.full((o.shape[0],), 3.4e38, jnp.float32)
        smin = jnp.asarray(db.wave_seg_min)
        smax = jnp.asarray(db.wave_seg_max)
        base = pt.packet_trace_closest(db.packet_scene, o, d, tm,
                                       interpret=True, rows=8)
        for k_pairs in (2, 4):  # k=2 exercises the over-K residual heavily
            h = pt.packet_trace_closest_rebin(
                db.wave_scene, db.wave_pairs_stack, db.wave_leaf_stack,
                smin, smax, o, d, tm, interpret=True, rows=8,
                k_pairs=k_pairs)
            bs, hs = np.asarray(base.slot), np.asarray(h.slot)
            bt, ht = np.asarray(base.t), np.asarray(h.t)
            np.testing.assert_array_equal(bs >= 0, hs >= 0,
                                          err_msg=f"k={k_pairs}")
            hit = bs >= 0
            np.testing.assert_allclose(bt[hit], ht[hit], rtol=1e-6,
                                       err_msg=f"k={k_pairs}")
            diff = (bs != hs) & hit
            assert np.all(np.abs(bt[diff] - ht[diff])
                          <= 1e-6 * np.abs(bt[diff]) + 1e-6), (
                k_pairs, np.nonzero(diff)[0][:5])

    def test_rebin_budget_overflow_residual(self, monkeypatch):
        """A tiny slot budget must push pairs into the residual, not lose
        them."""
        import jax.numpy as jnp
        import numpy as np

        import idkengine_tpu.ops.packet_trace as pt

        db, sc = self._scene()
        o, d = self._rays(sc, n=2048)
        tm = jnp.full((o.shape[0],), 3.4e38, jnp.float32)
        smin = jnp.asarray(db.wave_seg_min)
        smax = jnp.asarray(db.wave_seg_max)
        base = pt.packet_trace_closest(db.packet_scene, o, d, tm,
                                       interpret=True, rows=8)
        monkeypatch.setattr(pt, "REBIN_BUDGET", 0.5)
        pt.packet_trace_closest_rebin.clear_cache()
        try:
            h = pt.packet_trace_closest_rebin(
                db.wave_scene, db.wave_pairs_stack, db.wave_leaf_stack,
                smin, smax, o, d, tm, interpret=True, rows=8, k_pairs=3)
        finally:
            pt.packet_trace_closest_rebin.clear_cache()
        bs, hs = np.asarray(base.slot), np.asarray(h.slot)
        bt, ht = np.asarray(base.t), np.asarray(h.t)
        np.testing.assert_array_equal(bs >= 0, hs >= 0)
        hit = bs >= 0
        np.testing.assert_allclose(bt[hit], ht[hit], rtol=1e-6)

    def test_rebin_any_matches_chained(self):
        import jax.numpy as jnp
        import numpy as np

        import idkengine_tpu.ops.packet_trace as pt

        db, sc = self._scene()
        o, d = self._rays(sc)
        tm = jnp.full((o.shape[0],), 15.0, jnp.float32)
        smin = jnp.asarray(db.wave_seg_min)
        smax = jnp.asarray(db.wave_seg_max)
        base = pt.packet_trace_any(db.packet_scene, o, d, tm,
                                   interpret=True, rows=8)
        for k_pairs in (2, 4):
            occ = pt.packet_trace_any_rebin(
                db.wave_scene, db.wave_pairs_stack, db.wave_leaf_stack,
                smin, smax, o, d, tm, interpret=True, rows=8,
                k_pairs=k_pairs)
            np.testing.assert_array_equal(np.asarray(base), np.asarray(occ),
                                          err_msg=f"k={k_pairs}")
