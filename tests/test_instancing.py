"""Two-level (TLAS-path) instanced tracing.

ref: Source/Bvh/TLAS.cs + BVH.cs:162-223 — instanced content keeps its own
BLAS; moving an instance updates only transforms + the TLAS, never geometry.
"""
import numpy as np
import pytest

jnp = pytest.importorskip("jax.numpy")

from idkengine_tpu.bvh.builder import BuildSettings
from idkengine_tpu.ops.trace import trace_closest, trace_closest_two_level
from idkengine_tpu.render import Camera, PathTracer, PathTracerSettings
from idkengine_tpu.scene.model import Material, MeshPrimitive, Model, Node
from idkengine_tpu.scene.procedural import cornell_box, make_uv_sphere
from idkengine_tpu.scene.scene_db import SceneDatabase


def _sphere_model(radius=50.0):
    pos, idx = make_uv_sphere([0.0, 0.0, 0.0], radius, n_lat=12, n_lon=16)
    prim = MeshPrimitive(positions=pos.astype(np.float32),
                         indices=idx.astype(np.uint32), material=0)
    prim.ensure_normals()
    m = Model(primitives=[prim], nodes=[Node(mesh_primitives=[0])],
              materials=[Material(name="inst",
                                  base_color=np.array([0.9, 0.2, 0.2, 1],
                                                      np.float32))])
    m.root_nodes.append(0)
    return m


def _mat(t, s=1.0):
    m = np.eye(4, dtype=np.float32)
    m[:3, :3] *= s
    m[:3, 3] = t
    return m


def _instanced_db():
    db = SceneDatabase(BuildSettings(max_leaf_triangle_count=12,
                                     traversal_cost=4.0))
    db.add_model(cornell_box(emissive_quad=False))
    db.add_instanced_model(_sphere_model(), np.stack([
        _mat([150, 380, 250]), _mat([400, 380, 250], s=1.5)]))
    db.build()
    db.lights.add([278, 480, 279.5], [6, 6, 6], radius=45.0)
    return db


def _baked_db():
    """Oracle: the same scene with instances baked into the merged BLAS."""
    db = SceneDatabase(BuildSettings(max_leaf_triangle_count=12,
                                     traversal_cost=4.0))
    db.add_model(cornell_box(emissive_quad=False))
    db.add_model(_sphere_model(), transform=_mat([150, 380, 250]),
                 hoist=False)
    db.add_model(_sphere_model(), transform=_mat([400, 380, 250], s=1.5),
                 hoist=False)
    db.build()
    db.lights.add([278, 480, 279.5], [6, 6, 6], radius=45.0)
    return db


def _cam():
    return Camera(position=np.array([278, 273, -800], np.float32), yaw=90.0,
                  fov_y=38.0)


def test_two_level_hits_match_baked():
    db = _instanced_db()
    ref = _baked_db()
    iset = db.instance_set()
    assert iset is not None and len(iset.scenes) == 2
    cam = _cam()
    from idkengine_tpu.render.camera import generate_rays

    o, d = generate_rays(cam.ray_params(64, 64), 64, 64, jnp.zeros(2))
    tm = jnp.full((64 * 64,), 3.4e38, jnp.float32)
    hit, inst = trace_closest_two_level(
        db.device_scene, iset.scenes, iset.inv, iset.boxes, o, d, tm,
        slot_off=iset.slot_off)
    hit_ref = trace_closest(ref.device_scene, o, d, tm)
    np.testing.assert_array_equal(np.asarray(hit.slot >= 0),
                                  np.asarray(hit_ref.slot >= 0))
    m = np.asarray(hit.slot >= 0)
    np.testing.assert_allclose(np.asarray(hit.t)[m],
                               np.asarray(hit_ref.t)[m], rtol=2e-4, atol=2e-3)
    assert (np.asarray(inst) >= 0).sum() > 50  # spheres are visible
    assert (np.asarray(inst)[m] < 0).sum() > 500  # walls too


def test_instanced_render_matches_baked():
    db = _instanced_db()
    ref = _baked_db()
    cam = _cam()
    settings = PathTracerSettings(ray_depth=2, sky_strength=0.0,
                                  use_packet_tracer=False)
    pt_i = PathTracer(db.device_scene, db.materials.soa(), db.lights.soa(),
                      48, 48, settings, instances=db.instance_set(),
                      inst_attr_srcs=db._inst_attr_srcs)
    img_i = np.asarray(pt_i.render_frame(cam))
    pt_r = PathTracer(ref.device_scene, ref.materials.soa(), ref.lights.soa(),
                      48, 48, settings)
    img_r = np.asarray(pt_r.render_frame(cam))
    rmse = float(np.sqrt(np.mean((img_i - img_r) ** 2)))
    assert rmse <= 3e-2, f"instanced render diverged from baked: {rmse:.3f}"
    # identical RNG + geometry => images should be nearly pixel-identical
    assert np.mean(np.abs(img_i - img_r) > 1e-3) < 0.02


def test_instance_transform_update_without_rebuild():
    db = _instanced_db()
    n_nodes_before = [b.nodes.shape[0] for b in db._inst_blas]
    builds_before = [b.build_ms for b in db._inst_blas]
    cam = _cam()
    from idkengine_tpu.render.camera import generate_rays

    o, d = generate_rays(cam.ray_params(96, 96), 96, 96, jnp.zeros(2))
    tm = jnp.full((96 * 96,), 3.4e38, jnp.float32)

    def sphere_pixels():
        iset = db.instance_set()
        _, inst = trace_closest_two_level(
            db.device_scene, iset.scenes, iset.inv, iset.boxes, o, d, tm,
            slot_off=iset.slot_off)
        return np.asarray(inst)

    before = sphere_pixels()
    # move instance 0 out of view — no BLAS rebuild may happen
    db.set_instance_transform(0, _mat([150, 5000, 250]))
    after = sphere_pixels()
    assert (before == 0).sum() > 20
    assert (after == 0).sum() == 0, "moved instance still visible"
    assert (after == 1).sum() >= (before == 1).sum() * 0.9  # other one stays
    assert [b.nodes.shape[0] for b in db._inst_blas] == n_nodes_before
    assert [b.build_ms for b in db._inst_blas] == builds_before
    # TLAS refreshed over the new boxes
    assert db.tlas.nodes.shape[0] >= 3


def test_runtime_model_add_incremental():
    """Adding a model after build() builds ONLY its own BLAS and joins the
    instance path (ref: ModelManager.Add at runtime)."""
    db = SceneDatabase(BuildSettings(max_leaf_triangle_count=12,
                                     traversal_cost=4.0))
    db.add_model(cornell_box(emissive_quad=False))
    db.build()
    static_nodes = db.meta.n_nodes
    inst = db.add_model_runtime(_sphere_model(), _mat([278, 380, 250]))
    assert inst == 0
    assert db.meta.n_nodes == static_nodes  # merged BLAS untouched
    iset = db.instance_set()
    assert iset is not None and len(iset.scenes) == 1
    o = jnp.asarray(np.array([[278, 380, -800]], np.float32))
    d = jnp.asarray(np.array([[0, 0, 1]], np.float32))
    hit, iid = trace_closest_two_level(
        db.device_scene, iset.scenes, iset.inv, iset.boxes, o, d,
        jnp.full((1,), 3.4e38, jnp.float32), slot_off=iset.slot_off)
    assert int(iid[0]) == 0 and abs(float(hit.t[0]) - 1000.0) < 2.0

    # a second runtime add stacks on top
    inst2 = db.add_model_runtime(_sphere_model(radius=20.0),
                                 _mat([100, 380, 250]))
    assert inst2 == 1
    iset2 = db.instance_set()
    assert len(iset2.scenes) == 2
    # engine-level path rebuilds pipelines
    from idkengine_tpu.engine import Engine, EngineSettings

    db2 = SceneDatabase(BuildSettings(max_leaf_triangle_count=12,
                                      traversal_cost=4.0))
    db2.add_model(cornell_box(emissive_quad=False))
    db2.build()
    db2.lights.add([278, 480, 279.5], [6, 6, 6], radius=45.0)
    eng = Engine(db2, EngineSettings(width=32, height=32))
    eng.settings.pt = __import__("dataclasses").replace(
        eng.settings.pt, use_packet_tracer=False, ray_depth=2)
    eng.camera.position = np.array([278, 273, -800], np.float32)
    eng.camera.yaw = 90.0
    img0 = np.asarray(eng.render())
    eng.add_model_runtime(_sphere_model(), _mat([278, 273, 250]))
    img1 = np.asarray(eng.render())
    assert (np.abs(img1 - img0) > 1e-3).mean() > 0.01  # the sphere shows up
