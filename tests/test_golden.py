"""End-to-end image tests: analytic oracles + stored goldens + replay.

The reference's de-facto regression mechanism is golden-path replay
(StateRecorder + frame dumps, Application.cs:664-743; SURVEY.md §4). Here:

1. White-furnace: a CONVEX diffuse body under a uniform sky — every path
   carries exactly albedo*sky (cosine-weighted sampling cancels the pdf, a
   convex body never self-intersects), so the image is an analytic constant
   with ZERO Monte-Carlo variance. Catches BSDF weighting, normal, and
   throughput bugs that per-op tests cannot.
2. Stored goldens: deterministic low-res Cornell render compared at
   RMSE <= 1e-3 per BASELINE.json. Re-baseline: delete tests/goldens/*.npz
   and run with IDK_REBASELINE=1.
3. Replay: a recorded camera path re-renders bit-identically.
"""
import os

import numpy as np
import pytest

from idkengine_tpu.render import Camera, PathTracer, PathTracerSettings
from idkengine_tpu.scene.model import Material, MeshPrimitive, Model, Node
from idkengine_tpu.scene.procedural import cornell_box, make_uv_sphere
from idkengine_tpu.scene.scene_db import SceneDatabase

GOLDEN_DIR = os.path.join(os.path.dirname(__file__), "goldens")


def _sphere_model(albedo):
    pos, idx = make_uv_sphere([0.0, 0.0, 0.0], 1.0, n_lat=24, n_lon=32)
    prim = MeshPrimitive(positions=pos.astype(np.float32),
                         indices=idx.astype(np.uint32), material=0)
    prim.ensure_normals()
    model = Model(
        primitives=[prim],
        nodes=[Node(name="sphere", mesh_primitives=[0])],
        materials=[Material(
            name="diffuse",
            base_color=np.array([*albedo, 1.0], np.float32),
            # ior=1 zeroes f0; at near-normal incidence the Schlick term
            # vanishes too, so center-disc pixels are PURE diffuse paths
            metallic=0.0, roughness=1.0, ior=1.0)],
    )
    model.root_nodes.append(0)
    return model


def _center_disc(img, dep, slack=0.02):
    """Pixels near the sphere's closest point: cos(theta) >~ 0.98, where the
    specular-lobe chance (1-cos)^5 < 1e-8 — analytically pure-diffuse."""
    on = dep > 0.0
    dmin = dep[on].min()
    sel = on & (dep < dmin + slack)
    return img[sel], img[~on]


def test_white_furnace_convex_body():
    """Diffuse sphere, uniform sky S, albedo a => near-normal-incidence
    pixels are EXACTLY a*S (cosine sampling cancels the pdf; a convex body
    never re-intersects its own bounce rays) and sky pixels exactly S."""
    a, S = 0.63, 1.7
    db = SceneDatabase()
    db.add_model(_sphere_model((a, a, a)))
    scene = db.build()
    pt = PathTracer(
        scene, db.materials.soa(), db.lights.soa(), 48, 48,
        PathTracerSettings(
            ray_depth=3, sky_zenith=(S, S, S), sky_horizon=(S, S, S),
            sky_strength=1.0, russian_roulette=False, light_spheres=False,
            nee=False, use_packet_tracer=False),
    )
    cam = Camera(position=np.array([0, 0, -4], np.float32), yaw=90.0,
                 fov_y=35.0)
    img = np.asarray(pt.render_frame(cam))
    dep = np.asarray(pt._last_aovs[2]).reshape(48, 48)
    sph, sky = _center_disc(img, dep)
    assert sph.shape[0] > 20, "need some center-disc pixels"
    assert np.allclose(sky, S, atol=1e-5), f"sky={sky.mean()} want {S}"
    assert np.allclose(sph, a * S, atol=1e-4), (
        f"furnace failed: sphere mean {sph.mean():.6f} want {a*S:.6f} "
        f"(max dev {np.abs(sph - a*S).max():.2e})")


def test_furnace_with_nee_unbiased():
    """NEE + light spheres on: the furnace must stay exact — NEE paths and
    BSDF light hits must not double-count (light radiance 0 contributes
    nothing; the estimator itself must stay the identity)."""
    a, S = 0.5, 1.0
    db = SceneDatabase()
    db.add_model(_sphere_model((a, a, a)))
    scene = db.build()
    db.lights.add([50.0, 0.0, 0.0], [0.0, 0.0, 0.0], radius=0.5)
    pt = PathTracer(
        scene, db.materials.soa(), db.lights.soa(), 32, 32,
        PathTracerSettings(
            ray_depth=3, sky_zenith=(S, S, S), sky_horizon=(S, S, S),
            russian_roulette=False, nee=True, use_packet_tracer=False),
    )
    cam = Camera(position=np.array([0, 0, -4], np.float32), yaw=90.0,
                 fov_y=35.0)
    img = np.asarray(pt.render_frame(cam))
    dep = np.asarray(pt._last_aovs[2]).reshape(32, 32)
    sph, _ = _center_disc(img, dep)
    assert np.allclose(sph, a * S, atol=1e-4), (
        f"NEE biased the furnace: mean {sph.mean():.6f} want {a*S:.6f}")


def _cornell_pt(width=64, height=64, spp=4):
    db = SceneDatabase()
    db.add_model(cornell_box(emissive_quad=False))
    scene = db.build()
    db.lights.add([278, 480, 279.5], [6, 6, 6], radius=45.0)
    pt = PathTracer(
        scene, db.materials.soa(), db.lights.soa(), width, height,
        PathTracerSettings(ray_depth=4, sky_strength=0.0,
                           use_packet_tracer=False,
                           spp_per_frame=spp),
    )
    cam = Camera(position=np.array([278, 273, -800], np.float32), yaw=90.0,
                 fov_y=38.0)
    return pt, cam


def test_golden_cornell():
    """Deterministic Cornell render vs stored golden, RMSE <= 1e-3
    (BASELINE.json contract at equal spp/seed)."""
    pt, cam = _cornell_pt()
    img = np.asarray(pt.render_frame(cam))
    path = os.path.join(GOLDEN_DIR, "cornell_64_4spp.npz")
    if not os.path.exists(path) or os.environ.get("IDK_REBASELINE"):
        os.makedirs(GOLDEN_DIR, exist_ok=True)
        np.savez_compressed(path, img=img.astype(np.float32))
        pytest.skip("golden (re)baselined — rerun to compare")
    gold = np.load(path)["img"]
    rmse = float(np.sqrt(np.mean((img - gold) ** 2)))
    assert rmse <= 1e-3, f"cornell drifted from golden: RMSE {rmse:.2e}"

    # physical sanity independent of the golden: the side walls carry a
    # strong red tint on one side and green on the other (cornell layout)
    h, w, _ = img.shape
    left = img[:, : w // 6]
    right = img[:, -w // 6:]
    red_left = left[..., 0].mean() / max(left[..., 1].mean(), 1e-6)
    green_right = right[..., 1].mean() / max(right[..., 0].mean(), 1e-6)
    red_right = right[..., 0].mean() / max(right[..., 1].mean(), 1e-6)
    green_left = left[..., 1].mean() / max(left[..., 0].mean(), 1e-6)
    assert (red_left > 1.5 and green_right > 1.5) or \
        (red_right > 1.5 and green_left > 1.5), (
            red_left, green_right, red_right, green_left)


def test_golden_replay_deterministic():
    """Recorder replay renders the same frames bit-identically — the
    reference's StateRecorder regression flow (ref: StateRecorder.cs:28-96)."""
    from idkengine_tpu.recorder import StateRecorder

    pt, cam = _cornell_pt(width=32, height=32, spp=1)
    rec = StateRecorder()
    imgs = []
    for i in range(3):
        cam.position = cam.position + np.array([0, 0, 30], np.float32)
        rec.record(cam, animation_time=i * 0.1)
        imgs.append(np.asarray(pt.render_frame(cam)))
        pt.reset_accumulation()
        pt._frame = i + 1  # accumulate per-view, keep the frame seed moving

    pt2, cam2 = _cornell_pt(width=32, height=32, spp=1)
    for i in range(3):
        fs = rec.replay(cam2)
        assert fs is not None
        img2 = np.asarray(pt2.render_frame(cam2))
        pt2.reset_accumulation()
        pt2._frame = i + 1
        assert np.array_equal(img2, imgs[i]), f"replay frame {i} diverged"


def test_packet_vs_xla_image_equivalence():
    """Image-level agreement between the Pallas packet tracer (interpret
    mode) and the XLA threaded trace: same hits => tiny RMSE."""
    from idkengine_tpu.ops import packet_trace as pt_mod

    db = SceneDatabase()
    db.add_model(cornell_box(emissive_quad=False))
    scene = db.build()
    db.lights.add([278, 480, 279.5], [6, 6, 6], radius=45.0)
    cam = Camera(position=np.array([278, 273, -800], np.float32), yaw=90.0,
                 fov_y=38.0)

    pt_x = PathTracer(scene, db.materials.soa(), db.lights.soa(), 32, 32,
                      PathTracerSettings(ray_depth=2, sky_strength=0.0,
                                         use_packet_tracer=False))
    img_x = np.asarray(pt_x.render_frame(cam))

    pt_mod.FORCE_INTERPRET = True
    try:
        pt_p = PathTracer(scene, db.materials.soa(), db.lights.soa(), 32, 32,
                          PathTracerSettings(ray_depth=2, sky_strength=0.0,
                                             use_packet_tracer=True),
                          packet_scene=db.packet_scene)
        img_p = np.asarray(pt_p.render_frame(cam))
    finally:
        pt_mod.FORCE_INTERPRET = False
    rmse = float(np.sqrt(np.mean((img_p - img_x) ** 2)))
    assert rmse <= 2e-3, f"packet vs XLA image diverged: RMSE {rmse:.2e}"
