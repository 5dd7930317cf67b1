"""Alpha-tested transparency + normal mapping in the path tracer.

ref: FirstHit/compute.glsl:141-146 (stochastic alpha test),
ShadowsRayTraced/compute.glsl:96-117 (alpha-attenuated shadow rays),
Surface.glsl:96-118 (tangent-space normal mapping).
"""
import numpy as np

from idkengine_tpu.render import Camera, PathTracer, PathTracerSettings
from idkengine_tpu.scene.model import (
    Material, MeshPrimitive, Model, Node, Texture)
from idkengine_tpu.scene.procedural import make_quad
from idkengine_tpu.scene.scene_db import SceneDatabase


def _checker_rgba(n=8, size=64):
    """Checkerboard alpha: cell (i+j) even -> opaque white, odd -> alpha 0."""
    img = np.zeros((size, size, 4), np.uint8)
    cell = size // n
    for j in range(n):
        for i in range(n):
            a = 255 if (i + j) % 2 == 0 else 0
            img[j * cell:(j + 1) * cell, i * cell:(i + 1) * cell] = (
                255, 255, 255, a)
    return img


def _quad_model(material, texture=None, z=0.0, size=1.0):
    v, idx = make_quad([-size, -size, z], [size, -size, z],
                       [size, size, z], [-size, size, z])
    prim = MeshPrimitive(positions=v.astype(np.float32),
                         indices=idx.astype(np.uint32), material=0)
    prim.uvs = ((v[:, :2] / (2 * size)) + 0.5).astype(np.float32)
    prim.ensure_normals()
    m = Model(primitives=[prim],
              nodes=[Node(name="quad", mesh_primitives=[0])],
              materials=[material])
    if texture is not None:
        m.textures.append(texture)
    m.root_nodes.append(0)
    return m


def _render_depth(db, width=64, height=64, depth=2):
    scene = db.build()
    pt = PathTracer(scene, db.materials.soa(), db.lights.soa(), width, height,
                    PathTracerSettings(ray_depth=depth, sky_strength=1.0,
                                       sky_zenith=(1, 1, 1),
                                       sky_horizon=(1, 1, 1),
                                       nee=False, light_spheres=False,
                                       use_packet_tracer=False))
    cam = Camera(position=np.array([0, 0, -3], np.float32), yaw=90.0,
                 fov_y=40.0)
    img = np.asarray(pt.render_frame(cam))
    dep = np.asarray(pt._last_aovs[2]).reshape(height, width)
    return pt, img, dep


def test_alpha_mask_checkerboard_silhouette():
    """MASK-mode checkerboard quad: primary rays pass through alpha-0 cells
    (depth = background quad) and stop at opaque cells."""
    mat = Material(name="checker", alpha_cutoff=0.5,
                   base_color_texture=0, roughness=1.0)
    tex = Texture(name="checker", data=_checker_rgba(), is_srgb=True)
    db = SceneDatabase()
    db.add_model(_quad_model(mat, tex, z=0.0, size=1.0))
    back = Material(name="back", base_color=np.array([1, 0, 0, 1], np.float32))
    db.add_model(_quad_model(back, z=2.0, size=4.0))
    pt, img, dep = _render_depth(db)
    assert pt._has_alpha, "alpha gate should engage for MASK+texture"
    on = dep > 0.0
    assert on.sum() > 500
    near = on & (dep < 4.0)   # front quad at ~3
    far = on & (dep >= 4.0)   # back quad at ~5
    # both populations must exist and be comparable (checker is 50/50)
    assert near.sum() > 100, f"opaque cells missing: {near.sum()}"
    assert far.sum() > 100, f"transparent cells not punched: {far.sum()}"
    ratio = near.sum() / max(far.sum(), 1)
    assert 0.4 < ratio < 2.5, f"checker balance off: {ratio}"


def test_alpha_opaque_material_unaffected():
    """OPAQUE materials (cutoff=-1) never alpha-discard even with alpha 0
    texels, and the alpha gate stays off for pure factor scenes."""
    mat = Material(name="solid", alpha_cutoff=-1.0, base_color_texture=0)
    tex = Texture(name="checker", data=_checker_rgba(), is_srgb=True)
    db = SceneDatabase()
    db.add_model(_quad_model(mat, tex, z=0.0, size=1.0))
    pt, img, dep = _render_depth(db)
    on = dep > 0.0
    assert not (on & (dep >= 4.0)).any()

    db2 = SceneDatabase()
    db2.add_model(_quad_model(Material(name="plain"), z=0.0))
    scene2 = db2.build()
    pt2 = PathTracer(scene2, db2.materials.soa(), db2.lights.soa(), 8, 8,
                     PathTracerSettings(use_packet_tracer=False))
    assert not pt2._has_alpha


def test_alpha_blend_transmittance_statistics():
    """BLEND (cutoff=0) with alpha=a must transmit primary rays with
    probability 1-a — NOT 1-a^alpha_rounds. Regression for the settled-hit
    bug: re-rolling the stochastic keep test each alpha round made kept
    BLEND hits re-test, biasing surfaces too transparent."""
    a = 0.3
    mat = Material(name="blend", alpha_cutoff=0.0,
                   base_color=np.array([1, 1, 1, a], np.float32),
                   roughness=1.0)
    db = SceneDatabase()
    db.add_model(_quad_model(mat, z=0.0, size=4.0))
    back = Material(name="back", base_color=np.array([1, 0, 0, 1], np.float32))
    db.add_model(_quad_model(back, z=2.0, size=16.0))
    scene = db.build()
    pt = PathTracer(scene, db.materials.soa(), db.lights.soa(), 96, 96,
                    PathTracerSettings(ray_depth=1, sky_strength=0.0,
                                       nee=False, light_spheres=False,
                                       use_packet_tracer=False))
    assert pt._has_alpha
    assert pt.alpha_rounds >= 2, "regression needs >= 2 alpha rounds"
    cam = Camera(position=np.array([0, 0, -3], np.float32), yaw=90.0,
                 fov_y=40.0)
    pt.render_frame(cam)
    dep = np.asarray(pt._last_aovs[2]).reshape(96, 96)
    on = dep > 0.0
    assert on.sum() > 8000
    passed = (dep[on] >= 4.0).mean()  # back quad at t~5, front at t~3
    # expected 1-a = 0.70; the re-roll bug gives 1-a^2 = 0.91
    assert 0.64 < passed < 0.76, (
        f"BLEND transmittance {passed:.3f}, expected ~{1-a}")


def test_alpha_shadows_pass_through_holes():
    """Shadow rays pass alpha-0 cells: a surface lit through a checkerboard
    shows both lit and shadowed regions (ref: RT shadows alpha attenuation)."""
    db = SceneDatabase()
    # floor facing +y at y=-1
    v, idx = make_quad([-4, -1, -2], [4, -1, -2], [4, -1, 6], [-4, -1, 6])
    prim = MeshPrimitive(positions=v.astype(np.float32),
                         indices=idx.astype(np.uint32), material=0)
    prim.uvs = np.zeros((4, 2), np.float32)
    prim.ensure_normals()
    floor = Model(primitives=[prim], nodes=[Node(mesh_primitives=[0])],
                  materials=[Material(name="floor")])
    floor.root_nodes.append(0)
    db.add_model(floor)
    # horizontal checker quad between floor and light (facing +-y)
    vq, iq = make_quad([-1, 1, 1], [1, 1, 1], [1, 1, 3], [-1, 1, 3])
    pq = MeshPrimitive(positions=vq.astype(np.float32),
                       indices=iq.astype(np.uint32), material=0)
    pq.uvs = ((vq[:, [0, 2]] - [-1, 1]) / 2.0).astype(np.float32)
    pq.ensure_normals()
    chk = Model(primitives=[pq], nodes=[Node(mesh_primitives=[0])],
                materials=[Material(name="chk", alpha_cutoff=0.5,
                                    base_color_texture=0, double_sided=True)],
                textures=[Texture(name="c", data=_checker_rgba(),
                                  is_srgb=True)])
    chk.root_nodes.append(0)
    db.add_model(chk)
    scene = db.build()
    db.lights.add([0.0, 6.0, 2.0], [60.0, 60.0, 60.0], radius=0.25)
    pt = PathTracer(scene, db.materials.soa(), db.lights.soa(), 64, 64,
                    PathTracerSettings(ray_depth=1, sky_strength=0.0,
                                       nee=True, use_packet_tracer=False))
    cam = Camera(position=np.array([0, 3.0, -4], np.float32), yaw=90.0,
                 pitch=-40.0, fov_y=60.0)
    img = np.asarray(pt.render_frame(cam))
    dep = np.asarray(pt._last_aovs[2]).reshape(64, 64)
    floor_px = img[dep > 0]
    lum = floor_px.mean(axis=-1)
    lit = (lum > lum.max() * 0.5).sum()
    dark = (lum < lum.max() * 0.1).sum()
    assert lit > 30, f"no lit floor pixels ({lit})"
    assert dark > 30, f"no shadowed floor pixels ({dark})"


def test_normal_map_tilts_shading_normal():
    """A constant tangent-space normal map tilts the AOV shading normal by
    the decoded amount on a flat quad."""
    # normal map encodes (0.6, 0, 0.8): tilt toward +tangent
    nm = np.zeros((8, 8, 4), np.uint8)
    nm[..., 0] = int((0.6 * 0.5 + 0.5) * 255)
    nm[..., 1] = 127
    nm[..., 2] = int((0.8 * 0.5 + 0.5) * 255)
    nm[..., 3] = 255
    mat = Material(name="bump", normal_texture=0, roughness=1.0)
    tex = Texture(name="nm", data=nm, is_srgb=False)
    db = SceneDatabase()
    db.add_model(_quad_model(mat, tex, z=0.0, size=1.0))
    scene = db.build()
    pt = PathTracer(scene, db.materials.soa(), db.lights.soa(), 32, 32,
                    PathTracerSettings(ray_depth=1, sky_strength=1.0,
                                       nee=False, light_spheres=False,
                                       use_packet_tracer=False))
    assert pt._has_normal_maps
    cam = Camera(position=np.array([0, 0, -3], np.float32), yaw=90.0,
                 fov_y=40.0)
    pt.render_frame(cam)
    alb, nrm, dep = pt._last_aovs
    nrm = np.asarray(nrm).reshape(32, 32, 3)
    dep = np.asarray(dep).reshape(32, 32)
    on = dep > 0.0
    assert on.sum() > 100
    n_mean = nrm[on].mean(axis=0)
    n_mean /= np.linalg.norm(n_mean)
    # flat quad normal is -z (faces camera); tilt moves it off-axis by
    # ~asin(0.6) in the tangent direction
    off_axis = np.linalg.norm(n_mean[:2])
    assert off_axis > 0.45, f"normal not perturbed: {n_mean}"

    # without the normal map the AOV normal is axis-aligned
    db2 = SceneDatabase()
    db2.add_model(_quad_model(Material(name="flat"), z=0.0, size=1.0))
    scene2 = db2.build()
    pt2 = PathTracer(scene2, db2.materials.soa(), db2.lights.soa(), 32, 32,
                     PathTracerSettings(ray_depth=1, sky_strength=1.0,
                                        nee=False, light_spheres=False,
                                        use_packet_tracer=False))
    pt2.render_frame(cam)
    nrm2 = np.asarray(pt2._last_aovs[1]).reshape(32, 32, 3)
    flat_mean = nrm2[on].mean(axis=0)
    flat_mean /= np.linalg.norm(flat_mean)
    assert np.linalg.norm(flat_mean[:2]) < 0.05
