"""Multi-chip sharding tests on the virtual 8-device CPU mesh.

conftest.py forces xla_force_host_platform_device_count=8, so every test
here runs real SPMD partitioning (XLA inserts the collectives). This is the
test coverage for SURVEY.md §5's distribution design: rays/pixels are the
data-parallel axis, scene/BVH replicated, all_gather only at image assembly.
"""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from idkengine_tpu.parallel.shard import (
    ShardedPathTracer, make_mesh, replicate, shard_render)
from idkengine_tpu.render import Camera, PathTracer, PathTracerSettings
from idkengine_tpu.scene.procedural import cornell_box
from idkengine_tpu.scene.scene_db import SceneDatabase


def _build_pt(width=64, height=64, **kw):
    db = SceneDatabase()
    db.add_model(cornell_box(emissive_quad=False))
    scene = db.build()
    mats = db.materials.soa()
    db.lights.add([278, 480, 279.5], [6, 6, 6], radius=45.0)
    lights = db.lights.soa()
    cam = Camera(position=np.array([278, 273, -800], np.float32),
                 yaw=90.0, fov_y=38.0)
    settings = PathTracerSettings(
        ray_depth=3, sky_strength=0.0, use_packet_tracer=False, **kw)
    pt = PathTracer(scene, mats, lights, width, height, settings)
    return pt, cam


def test_eight_devices_available():
    assert len(jax.devices()) >= 8, (
        "conftest should provision 8 virtual CPU devices")


def test_sharded_render_matches_single_device():
    """8-way sharded sample == single-device sample (same seed, same HLO
    math modulo partitioning): RMSE ~ 0."""
    pt, cam = _build_pt(width=128, height=8)
    cam_params = cam.ray_params(pt.width, pt.height)
    frame = jnp.uint32(0)

    ref, *_ = pt._render_sample(
        pt.scene, pt.mats, pt.lights, None, cam_params, frame, None, None)

    mesh = make_mesh(8)
    fn = shard_render(mesh, pt._render_sample)
    args = [replicate(mesh, a) for a in
            (pt.scene, pt.mats, pt.lights)] + [None,
            replicate(mesh, cam_params), frame, None, None, None, None,
            replicate(mesh, pt._attr),
            replicate(mesh, (pt._swz, pt._inv_swz))]
    out, *_ = fn(*args)
    assert out.sharding.is_equivalent_to(
        jax.sharding.NamedSharding(
            mesh, jax.sharding.PartitionSpec("rays")), out.ndim)
    rmse = float(jnp.sqrt(jnp.mean((out - ref) ** 2)))
    assert rmse <= 1e-5, f"sharded render diverged: RMSE {rmse}"


def test_sharded_pathtracer_smoke():
    """ShardedPathTracer end-to-end: accumulates frames, returns an image."""
    pt, cam = _build_pt(width=128, height=8)
    spt = ShardedPathTracer(pt, make_mesh(8))
    img = spt.render_frame(cam)
    assert img.shape == (8, 128, 3)
    assert np.isfinite(np.asarray(img)).all()
    assert float(jnp.max(img)) > 0.0
    img2 = spt.render_frame(cam)
    assert pt.accumulated_samples == 2
    assert float(spt.pt.last_rays_traced) > 0

    # matches the unsharded tracer frame-for-frame
    pt2, cam2 = _build_pt(width=128, height=8)
    ref = pt2.render_frame(cam2)
    ref = pt2.render_frame(cam2)
    rmse = float(jnp.sqrt(jnp.mean((img2 - ref) ** 2)))
    assert rmse <= 1e-5, f"ShardedPathTracer diverged: RMSE {rmse}"


def test_sharded_engine_pipeline():
    """Engine -> PathTracerPipeline -> ShardedPathTracer: the
    PtPipelineSettings.shard_devices knob routes the engine's PT mode
    through the mesh; output matches the unsharded pipeline."""
    from idkengine_tpu.engine import Engine, EngineSettings
    from idkengine_tpu.parallel.shard import ShardedPathTracer as SPT

    def _eng(n_shard):
        db = SceneDatabase()
        db.add_model(cornell_box(emissive_quad=False))
        db.build()
        db.lights.add([278, 480, 279.5], [6, 6, 6], radius=45.0)
        import dataclasses

        s = EngineSettings(width=64, height=8)
        s.pt = dataclasses.replace(s.pt, ray_depth=2, sky_strength=0.0,
                                   use_packet_tracer=False)
        s.pt_pipeline.shard_devices = n_shard
        s.pt_pipeline.use_bloom = False
        eng = Engine(db, s)
        eng.camera.position = np.array([278, 273, -800], np.float32)
        eng.camera.yaw = 90.0
        return eng

    eng = _eng(8)
    img = np.asarray(eng.render())
    assert isinstance(eng._pipeline().pt, SPT)
    ref = np.asarray(_eng(0).render())
    rmse = float(np.sqrt(np.mean((img - ref) ** 2)))
    assert rmse <= 1e-5, f"engine sharded pipeline diverged: RMSE {rmse}"


@pytest.mark.slow
def test_sharded_nontoy_instanced_scene():
    """Non-toy multi-chip coverage (VERDICT r2 #9): a 110k-tri atrium plus
    instanced spheres (two-level tracer) at 256x256 depth-2 — a six-figure
    ray count through the REAL instanced path, sharded over 8 devices,
    RMSE-checked against the single-device render."""
    from idkengine_tpu.bvh.builder import BuildSettings
    from idkengine_tpu.scene.model import (
        Material, MeshPrimitive, Model, Node)
    from idkengine_tpu.scene.procedural import atrium, make_uv_sphere

    pos, idx = make_uv_sphere([0.0, 0.0, 0.0], 1.2, n_lat=8, n_lon=12)
    prim = MeshPrimitive(positions=pos.astype(np.float32),
                         indices=idx.astype(np.uint32), material=0)
    prim.ensure_normals()
    inst_model = Model(
        primitives=[prim], nodes=[Node(mesh_primitives=[0])],
        materials=[Material(name="inst",
                            base_color=np.array([0.9, 0.2, 0.2, 1],
                                                np.float32))])
    inst_model.root_nodes.append(0)

    def _mat(t):
        m = np.eye(4, dtype=np.float32)
        m[:3, 3] = t
        return m

    db = SceneDatabase(BuildSettings(max_leaf_triangle_count=12,
                                     traversal_cost=4.0))
    db.add_model(atrium(110_000))
    db.add_instanced_model(inst_model, np.stack(
        [_mat([-4.0, 2.0, 6.0]), _mat([4.0, 3.0, -6.0])]))
    scene = db.build()
    db.lights.add([0.0, 8.0, 0.0], [30.0, 30.0, 30.0], radius=0.5)
    mats = db.materials.soa()
    lights = db.lights.soa()
    iset = db.instance_set()
    assert iset is not None
    cam = Camera(position=np.array([0, 3, 24], np.float32), yaw=-90.0,
                 fov_y=65.0)
    settings = PathTracerSettings(ray_depth=2, sky_strength=0.4,
                                  use_packet_tracer=False)
    pt = PathTracer(scene, mats, lights, 256, 256, settings, instances=iset,
                    inst_attr_srcs=getattr(db, "_inst_attr_srcs", None))
    ref = np.asarray(pt.render_frame(cam))
    rays = float(pt.last_rays_traced)
    assert rays >= 100_000, f"want a six-figure ray count, got {rays:.0f}"

    pt2 = PathTracer(scene, mats, lights, 256, 256, settings, instances=iset,
                     inst_attr_srcs=getattr(db, "_inst_attr_srcs", None))
    spt = ShardedPathTracer(pt2, make_mesh(8))
    img = np.asarray(spt.render_frame(cam))
    assert img.shape == ref.shape
    rmse = float(np.sqrt(np.mean((img - ref) ** 2)))
    assert rmse <= 1e-5, f"sharded instanced render diverged: RMSE {rmse}"


def test_dryrun_multichip_entry():
    """The driver's own entry point must pass in-process."""
    import __graft_entry__

    __graft_entry__.dryrun_multichip(8)


# ---------------------------------------------------------------------------
# Production Pallas packet/steered path under SPMD (VERDICT r3 #6/#3): the
# scalar-prefetch kernels run per-shard via shard_map (GSPMD can't partition
# a Mosaic custom call), tables replicated, rays sharded.
# ---------------------------------------------------------------------------

def _packet_scene_rays(n_rays=8 * 8 * 128):
    import os

    from idkengine_tpu.bvh.builder import BuildSettings
    from idkengine_tpu.scene.procedural import atrium

    os.environ.setdefault("IDK_WAVE_SEGS", "6")
    db = SceneDatabase(BuildSettings(max_leaf_triangle_count=12,
                                     traversal_cost=4.0))
    db.add_model(atrium(60_000))  # big enough for several wave segments
    db.build()
    ws = db.wave_set()
    assert ws is not None and len(ws.segs) >= 2
    rng = np.random.default_rng(7)
    lo, hi = db.blas.nodes["min"][0], db.blas.nodes["max"][0]
    o = (lo + rng.random((n_rays, 3)) * (hi - lo)).astype(np.float32)
    d = rng.normal(size=(n_rays, 3)).astype(np.float32)
    d /= np.linalg.norm(d, axis=-1, keepdims=True)
    t_max = jnp.full((n_rays,), 3.4e38, jnp.float32)
    return ws, jnp.asarray(o), jnp.asarray(d), t_max


def test_sharded_steered_packet_trace_matches_single():
    """The steered Pallas path (interpret mode on CPU) under an 8-way
    shard_map == the single-device trace, bit-exact."""
    from idkengine_tpu.ops import packet_trace as _pt
    from idkengine_tpu.parallel.shard import shard_packet_any, shard_packet_closest

    rows = 8  # small packets so 8 shards still hold full packets
    ws, o, d, t_max = _packet_scene_rays(n_rays=8 * 2 * rows * 128)
    ref = _pt.packet_trace_closest_steered(
        ws.segs, ws.pairs_stack, ws.leaf_stack, ws.seg_min, ws.seg_max,
        o, d, t_max, interpret=True, rows=rows)
    assert int(jnp.sum(ref.slot >= 0)) > 100  # the scene is actually hit

    mesh = make_mesh(8)
    fn = shard_packet_closest(mesh, ws, interpret=True, rows=rows)
    hit = fn(ws.pairs_stack, ws.leaf_stack, ws.seg_min, ws.seg_max,
             o, d, t_max)
    assert hit.t.sharding.is_equivalent_to(
        jax.sharding.NamedSharding(
            mesh, jax.sharding.PartitionSpec("rays")), hit.t.ndim)
    np.testing.assert_array_equal(np.asarray(hit.slot), np.asarray(ref.slot))
    np.testing.assert_allclose(np.asarray(hit.t)[np.asarray(ref.slot) >= 0],
                               np.asarray(ref.t)[np.asarray(ref.slot) >= 0],
                               rtol=0, atol=0)

    occ_ref = _pt.packet_trace_any_steered(
        ws.segs, ws.pairs_stack, ws.leaf_stack, ws.seg_min, ws.seg_max,
        o, d, jnp.where(ref.slot >= 0, ref.t * 1.5, 1e3), interpret=True,
        rows=rows)
    fn_any = shard_packet_any(mesh, ws, interpret=True, rows=rows)
    occ = fn_any(ws.pairs_stack, ws.leaf_stack, ws.seg_min, ws.seg_max,
                 o, d, jnp.where(ref.slot >= 0, ref.t * 1.5, 1e3))
    np.testing.assert_array_equal(np.asarray(occ), np.asarray(occ_ref))
