"""Per-mesh shading overrides (ref: GpuMesh.cs fields applied in
Surface.glsl:85-96 SurfaceApplyModificatons; Application.cs:449-457 uses
EmissiveBias to make Sponza's lamp meshes glow).
"""
import jax.numpy as jnp
import numpy as np

from idkengine_tpu.render import Camera, PathTracer, PathTracerSettings
from idkengine_tpu.scene.model import MeshPrimitive, Model, Node
from idkengine_tpu.scene.scene_db import MeshShading, SceneDatabase


def _two_quad_model():
    """Two vertically stacked quads facing the camera at -z."""
    def quad(y0):
        pos = np.array([[0, y0, 0], [2, y0, 0], [2, y0 + 1, 0],
                        [0, y0 + 1, 0]], np.float32)
        idx = np.array([[0, 1, 2], [0, 2, 3]], np.uint32)
        return MeshPrimitive(positions=pos, indices=idx, material=0)

    m = Model(name="two_quads")
    for i, y0 in enumerate((0.0, 1.0)):
        p = quad(y0)
        p.ensure_normals()
        n = Node(name=f"q{i}")
        n.mesh_primitives = [len(m.primitives)]
        m.primitives.append(p)
        m.nodes.append(n)
        m.root_nodes.append(i)
    from idkengine_tpu.scene.model import Material

    m.materials.append(Material(
        name="m0", base_color=np.array([0.5, 0.25, 0.125, 1.0], np.float32)))
    return m


def _db():
    db = SceneDatabase()
    db.add_model(_two_quad_model())
    db.build()
    return db


def _camera():
    return Camera(position=np.array([1.0, 1.0, -4.0], np.float32),
                  yaw=90.0, fov_y=45.0)


def test_slot_shading_rows_follow_bvh_permutation():
    db = _db()
    assert db.slot_shading() is None  # no overrides -> hot path untouched
    db.set_mesh_shading(1, emissive_bias=5.0)
    rows = db.slot_shading()
    assert rows.shape == (db._slot_tri.shape[0], 10)
    # every slot of placement 1 carries the bias; placement 0 stays default
    prim_of_slot = db._tri_prim[db._slot_tri]
    np.testing.assert_array_equal(rows[prim_of_slot == 1, 0], 5.0)
    np.testing.assert_array_equal(rows[prim_of_slot == 0, 0], 0.0)
    np.testing.assert_array_equal(rows[:, 1], 1.0)  # strength default
    np.testing.assert_array_equal(rows[:, 9], 1.0)  # tint default


def test_emissive_bias_adds_albedo_glow():
    """depth-1, no lights, no sky: radiance == emissive, and the biased
    mesh must emit bias * albedo (ref: Surface.glsl:87)."""
    db = _db()
    cam = _camera()
    st = PathTracerSettings(ray_depth=1, sky_strength=0.0, nee=False,
                            use_packet_tracer=False)

    def render(slot_shading):
        pt = PathTracer(db.device_scene, db.materials.soa(), db.lights.soa(),
                        24, 24, st, slot_shading=slot_shading)
        return np.asarray(pt.render_frame(cam))

    base = render(None)
    np.testing.assert_allclose(base, 0.0, atol=1e-6)

    db.set_mesh_shading(1, emissive_bias=4.0)
    img = render(db.slot_shading())
    # upper quad (placement 1) glows with bias * albedo
    top = img[:10]
    lit = top[top.sum(-1) > 0]
    assert lit.shape[0] > 10
    np.testing.assert_allclose(
        lit, np.broadcast_to(np.array([0.5, 0.25, 0.125]) * 4.0, lit.shape),
        rtol=1e-3)
    # lower quad stays dark
    np.testing.assert_allclose(img[16:], 0.0, atol=1e-6)


def test_set_slot_shading_live_update():
    db = _db()
    cam = _camera()
    st = PathTracerSettings(ray_depth=1, sky_strength=0.0, nee=False,
                            use_packet_tracer=False)
    pt = PathTracer(db.device_scene, db.materials.soa(), db.lights.soa(),
                    16, 16, st)
    base = np.asarray(pt.render_frame(cam))
    np.testing.assert_allclose(base, 0.0, atol=1e-6)
    db.set_mesh_shading(0, emissive_bias=2.0)
    pt.set_slot_shading(db.slot_shading())
    img = np.asarray(pt.render_frame(cam))
    assert img.sum() > 0.1  # the edit took effect without a rebuild


def test_gbuffer_biases():
    from idkengine_tpu.render.gbuffer import render_gbuffer
    from idkengine_tpu.ops.trace import trace_closest

    db = _db()
    db.set_mesh_shading(1, specular_bias=1.0, roughness_bias=-1.0,
                        emissive_bias=1.0)
    cam = _camera()
    scene = db.device_scene
    mats = {k: jnp.asarray(v) for k, v in db.materials.soa().items()
            if k != "count"}
    gbuf = render_gbuffer(
        lambda o, d, tm: trace_closest(scene, o, d, tm), scene, mats,
        cam.ray_params(24, 24), None or cam.ray_params(24, 24), 24, 24,
        slot_shading=db.slot_shading())
    mask = np.asarray(gbuf.mask)
    met = np.asarray(gbuf.metallic)
    rough = np.asarray(gbuf.roughness)
    em = np.asarray(gbuf.emissive)
    top = mask[:10]
    assert top.sum() > 10
    # biased mesh: metallic clamped to 1, roughness to 0, emissive = albedo
    np.testing.assert_allclose(met[:10][top], 1.0)
    np.testing.assert_allclose(rough[:10][top], 0.0)
    np.testing.assert_allclose(
        em[:10][top], np.asarray(gbuf.albedo)[:10][top], rtol=1e-5)
    # unbiased mesh: defaults (material metallic=1? -> read from table)
    bot = mask[16:]
    assert bot.sum() > 10
    np.testing.assert_allclose(em[16:][bot], 0.0, atol=1e-6)


def test_transmission_tint_follows_reference_semantics():
    """sample_bsdf tints the transmissive lobe by the provided tint (ref:
    Shading.glsl:136-144)."""
    from idkengine_tpu.render.shading import sample_bsdf

    n = jnp.asarray(np.tile([0.0, 0.0, -1.0], (4, 1)), jnp.float32)
    d = jnp.asarray(np.tile([0.0, 0.0, 1.0], (4, 1)), jnp.float32)
    albedo = jnp.asarray(np.tile([0.8, 0.4, 0.2], (4, 1)), jnp.float32)
    kw = dict(
        metallic=jnp.zeros(4), roughness=jnp.zeros(4),
        transmission=jnp.ones(4), ior=jnp.full(4, 1.5),
        inside=jnp.zeros(4, bool), u_lobe=jnp.full(4, 0.999),
        u_dir=jnp.full((4, 2), 0.5))
    s_white = sample_bsdf(d, n, albedo, **kw)
    s_tint = sample_bsdf(d, n, albedo, trans_tint=albedo, **kw)
    assert bool(s_white.is_transmissive.all())
    np.testing.assert_allclose(np.asarray(s_white.throughput_mul), 1.0)
    np.testing.assert_allclose(np.asarray(s_tint.throughput_mul),
                               np.asarray(albedo))


def test_mesh_shading_row_roundtrip():
    ms = MeshShading(emissive_bias=2.0, normal_map_strength=0.25,
                     specular_bias=0.5, roughness_bias=-0.5,
                     transmission_bias=0.1, ior_bias=0.2,
                     absorbance_bias=(1, 2, 3), tint_on_transmissive=False)
    np.testing.assert_allclose(
        ms.row(), [2.0, 0.25, 0.5, -0.5, 0.1, 0.2, 1, 2, 3, 0.0])
    np.testing.assert_allclose(MeshShading().row(), MeshShading.ROW_DEFAULT)
