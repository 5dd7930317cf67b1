"""Two-phase traversal (ops/two_phase.py) vs the one-phase packet oracle.

Runs the Pallas phase-A kernel in interpret mode on CPU; phase B is plain
XLA. Exactness contract: results must EQUAL the chained packet trace
(ties between equal-t hits may resolve to either slot)."""
import numpy as np
import pytest

jax = pytest.importorskip("jax")
import jax.numpy as jnp  # noqa: E402

from idkengine_tpu.bvh import BLAS  # noqa: E402
from idkengine_tpu.bvh.builder import BuildSettings  # noqa: E402
from idkengine_tpu.ops.packet_trace import (  # noqa: E402
    MAX_LEAF_PACKET, PacketScene, build_packet_tables,
    build_packet_tables_segmented, packet_trace_any, packet_trace_closest,
)
from idkengine_tpu.ops import two_phase as tp  # noqa: E402
from idkengine_tpu.scene.procedural import atrium, cornell_box  # noqa: E402


def _merge(model):
    verts, idx = [], []
    voff = 0
    for p in model.primitives:
        verts.append(p.positions)
        idx.append(p.indices + voff)
        voff += p.positions.shape[0]
    return np.concatenate(verts), np.concatenate(idx)


def _rays(n, lo, hi, seed=0, inward=True):
    rs = np.random.RandomState(seed)
    c = (np.asarray(lo) + np.asarray(hi)) / 2
    ext = np.asarray(hi) - np.asarray(lo)
    o = (rs.rand(n, 3) * 2.2 - 0.6) * ext + lo  # some origins outside
    d = rs.randn(n, 3)
    if inward:
        d[: n // 2] = c + (rs.rand(n // 2, 3) - 0.5) * ext - o[: n // 2]
    d /= np.maximum(np.linalg.norm(d, axis=-1, keepdims=True), 1e-9)
    return jnp.asarray(o, jnp.float32), jnp.asarray(d, jnp.float32)


def _assert_hits_equal(ha, hb, t_max, tag=""):
    """Equal hits up to equal-t ties."""
    sa = np.asarray(ha.slot)
    sb = np.asarray(hb.slot)
    ta = np.asarray(ha.t)
    tb = np.asarray(hb.t)
    same_presence = (sa >= 0) == (sb >= 0)
    assert same_presence.all(), (
        f"{tag}: hit presence differs on {np.count_nonzero(~same_presence)}"
        f" rays of {sa.shape[0]}")
    hit = sa >= 0
    np.testing.assert_allclose(ta[hit], tb[hit], rtol=1e-4, atol=1e-4,
                               err_msg=f"{tag}: hit t differs")


@pytest.fixture(scope="module")
def atrium_setup():
    verts, idx = _merge(atrium(4000))
    b = BLAS(verts, idx, BuildSettings(max_leaf_triangle_count=MAX_LEAF_PACKET,
                                       traversal_cost=3.0))
    tables = build_packet_tables(b.nodes, b.tri_indices, verts, idx, wide=True)
    ps = PacketScene.from_tables(tables)
    return b, tables, ps, verts, idx


class TestResident:
    def test_closest_matches_one_phase(self, atrium_setup):
        b, tables, ps, _v, _i = atrium_setup
        lo, hi = b.nodes["min"][0], b.nodes["max"][0]
        o, d = _rays(2048, lo, hi, seed=1)
        tm = jnp.full((2048,), 1e30, jnp.float32)
        ref = packet_trace_closest(ps, o, d, tm, interpret=True, rows=8)
        got = tp.two_phase_closest(
            ps, jnp.asarray(tables.leaf_first), jnp.asarray(tables.leaf_count),
            o, d, tm, interpret=True, rows=8, d_slots=4)
        _assert_hits_equal(got, ref, tm, "resident closest (D=4, overflow)")

    def test_any_matches_one_phase(self, atrium_setup):
        b, tables, ps, _v, _i = atrium_setup
        lo, hi = b.nodes["min"][0], b.nodes["max"][0]
        o, d = _rays(1024, lo, hi, seed=2)
        tm = jnp.full((1024,), 6.0, jnp.float32)
        ref = np.asarray(packet_trace_any(ps, o, d, tm, interpret=True, rows=8))
        got = np.asarray(tp.two_phase_any(
            ps, jnp.asarray(tables.leaf_first), jnp.asarray(tables.leaf_count),
            o, d, tm, interpret=True, rows=8, d_slots=4))
        assert (got == ref).all(), f"{np.count_nonzero(got != ref)} mismatches"

    def test_dead_rays_stay_dead(self, atrium_setup):
        b, tables, ps, _v, _i = atrium_setup
        lo, hi = b.nodes["min"][0], b.nodes["max"][0]
        o, d = _rays(512, lo, hi, seed=3)
        tm = jnp.where(jnp.arange(512) % 2 == 0, 1e30, -1.0).astype(jnp.float32)
        got = tp.two_phase_closest(
            ps, jnp.asarray(tables.leaf_first), jnp.asarray(tables.leaf_count),
            o, d, tm, interpret=True, rows=8)
        assert (np.asarray(got.slot)[1::2] == -1).all()

    def test_chains_match_single(self, atrium_setup, monkeypatch):
        """chains>1 co-traverses row-slices with per-chain orderings; the
        emitted leaf SETS (and exact closest hits) must not change."""
        b, tables, ps, _v, _i = atrium_setup
        lo, hi = b.nodes["min"][0], b.nodes["max"][0]
        o, d = _rays(1024, lo, hi, seed=7)
        tm = jnp.full((1024,), 1e30, jnp.float32)
        ref = tp.two_phase_closest(
            ps, jnp.asarray(tables.leaf_first), jnp.asarray(tables.leaf_count),
            o, d, tm, interpret=True, rows=8, d_slots=4)
        monkeypatch.setattr(tp, "TP_CHAINS", 2)
        # TP_CHAINS is read at trace time — drop the chains=1 trace
        tp.two_phase_closest.clear_cache()
        got = tp.two_phase_closest(
            ps, jnp.asarray(tables.leaf_first), jnp.asarray(tables.leaf_count),
            o, d, tm, interpret=True, rows=8, d_slots=4)
        _assert_hits_equal(got, ref, tm, "chains=2 vs chains=1")
        # don't leak the chains=2 trace to later same-shape calls
        monkeypatch.undo()
        tp.two_phase_closest.clear_cache()
        # counts are order-independent — must match exactly
        _l1, c1 = tp.phase_a(ps, o, d, tm, interpret=True, rows=8, D=4,
                             chains=1)
        _l2, c2 = tp.phase_a(ps, o, d, tm, interpret=True, rows=8, D=4,
                             chains=2)
        np.testing.assert_array_equal(np.asarray(c1), np.asarray(c2))

    def test_overflow_counts_reported(self, atrium_setup):
        b, tables, ps, _v, _i = atrium_setup
        lo, hi = b.nodes["min"][0], b.nodes["max"][0]
        o, d = _rays(512, lo, hi, seed=4)
        tm = jnp.full((512,), 1e30, jnp.float32)
        lists, cnt = tp.phase_a(ps, o, d, tm, interpret=True, rows=8, D=2)
        lists = np.asarray(lists)
        cnt = np.asarray(cnt)
        assert lists.shape == (512, 2)
        # recorded entries = min(cnt, D)
        rec = (lists >= 0).sum(axis=1)
        np.testing.assert_array_equal(rec, np.minimum(cnt, 2))
        assert (cnt > 2).any(), "expect overflow at D=2 in a real scene"


class TestSegmented:
    def test_closest_matches_chained(self):
        verts, idx = _merge(atrium(6000))
        b = BLAS(verts, idx, BuildSettings(
            max_leaf_triangle_count=MAX_LEAF_PACKET, traversal_cost=3.0))
        segs = build_packet_tables_segmented(
            b.nodes, b.tri_indices, verts, idx, budget=60_000)
        assert len(segs) > 2
        from idkengine_tpu.scene.scene_db import SceneDatabase

        SceneDatabase._pad_tables_common(segs)
        ps_segs = tuple(PacketScene.from_tables(t) for t in segs)
        pairs_stack = jnp.asarray(np.concatenate([t.pairs for t in segs]))
        leaf_stack = jnp.asarray(np.concatenate([t.leaf_geo for t in segs]))
        first_stack = jnp.asarray(np.concatenate([t.leaf_first for t in segs]))
        count_stack = jnp.asarray(np.concatenate([t.leaf_count for t in segs]))
        seg_min = jnp.asarray(np.stack([t.pairs[0, 2:5] for t in segs]))
        seg_max = jnp.asarray(np.stack([t.pairs[0, 5:8] for t in segs]))

        lo, hi = b.nodes["min"][0], b.nodes["max"][0]
        o, d = _rays(1024, lo, hi, seed=5)
        tm = jnp.full((1024,), 1e30, jnp.float32)
        ref = packet_trace_closest(ps_segs, o, d, tm, interpret=True, rows=8)
        got = tp.two_phase_closest_steered(
            ps_segs, pairs_stack, leaf_stack, first_stack, count_stack,
            seg_min, seg_max, o, d, tm, interpret=True, rows=8, d_slots=4,
            k_steer=3)  # small K forces the incomplete-coverage path
        _assert_hits_equal(got, ref, tm, "steered closest (K=3, D=4)")

        occ_ref = np.asarray(packet_trace_any(
            ps_segs, o, d, jnp.full((1024,), 8.0, jnp.float32),
            interpret=True, rows=8))
        occ = np.asarray(tp.two_phase_any_steered(
            ps_segs, pairs_stack, leaf_stack, first_stack, count_stack,
            seg_min, seg_max, o, d, jnp.full((1024,), 8.0, jnp.float32),
            interpret=True, rows=8, d_slots=4, k_steer=3))
        assert (occ == occ_ref).all(), (
            f"any: {np.count_nonzero(occ != occ_ref)} mismatches")


class TestPathTracerWiring:
    def test_two_phase_image_matches_packet(self):
        """PathTracerSettings.use_two_phase routes traversal (closest AND
        shadow rays) through ops/two_phase.py and renders the same image as
        the single-table packet path."""
        import os

        os.environ.setdefault("IDK_WAVE_SEGS", "6")
        import idkengine_tpu.ops.packet_trace as pk_mod
        from idkengine_tpu.render import Camera, PathTracer, PathTracerSettings
        from idkengine_tpu.bvh.builder import BuildSettings
        from idkengine_tpu.scene.scene_db import SceneDatabase

        db = SceneDatabase(BuildSettings(max_leaf_triangle_count=12,
                                         traversal_cost=4.0,
                                         presplit_factor=0.0))
        db.add_model(atrium(3000))
        sc = db.build()
        db.lights.add([0.0, 8.0, 0.0], [30.0, 30.0, 30.0], radius=0.5)
        mats = db.materials.soa()
        lights = db.lights.soa()
        cam = Camera(position=np.array([0, 3, 24], np.float32), yaw=-90.0,
                     fov_y=65.0)
        settings = PathTracerSettings(ray_depth=2, sky_strength=0.4,
                                      use_packet_tracer=True)
        pk_mod.FORCE_INTERPRET = True
        try:
            ref = PathTracer(sc, mats, lights, 32, 16, settings,
                             packet_scene=db.packet_scene)
            img_ref = np.asarray(ref.render_frame(cam))
            ws = db.wave_set()
            assert ws is not None and ws.first_stack is not None
            import dataclasses

            tps = dataclasses.replace(settings, use_two_phase=True)
            tpt = PathTracer(sc, mats, lights, 32, 16, tps,
                             packet_scene=tuple(ws.segs), wave_boxes=ws)
            img_tp = np.asarray(tpt.render_frame(cam))
        finally:
            pk_mod.FORCE_INTERPRET = False
        rmse = float(np.sqrt(np.mean((img_tp - img_ref) ** 2)))
        assert rmse <= 2e-3, f"two-phase PT image diverged: RMSE {rmse:.2e}"
