"""Render-stack unit tests (fast CPU, small shapes)."""
import numpy as np
import pytest

import jax
import jax.numpy as jnp

from idkengine_tpu.render import sampling, shading
from idkengine_tpu.render.bloom import BloomSettings, bloom
from idkengine_tpu.render.camera import Camera, generate_rays
from idkengine_tpu.render.denoise import DenoiseSettings, atrous_denoise
from idkengine_tpu.render.taa import TaaSettings, taa_resolve
from idkengine_tpu.render.tonemap import TonemapSettings, to_uint8, tonemap


class TestSampling:
    def test_cosine_hemisphere_distribution(self):
        rs = np.random.RandomState(0)
        n = jnp.tile(jnp.asarray([[0.0, 0.0, 1.0]]), (4096, 1))
        u = jnp.asarray(rs.rand(4096, 2).astype(np.float32))
        d = np.asarray(sampling.cosine_hemisphere(n, u))
        assert (d[:, 2] > -1e-6).all()  # upper hemisphere
        # mean cos should be ~2/3 for cosine weighting
        assert abs(d[:, 2].mean() - 2 / 3) < 0.02
        assert np.allclose(np.linalg.norm(d, axis=-1), 1.0, atol=1e-5)

    def test_onb_orthonormal(self):
        rs = np.random.RandomState(1)
        n = rs.randn(100, 3)
        n /= np.linalg.norm(n, axis=-1, keepdims=True)
        t, b = sampling.build_onb(jnp.asarray(n.astype(np.float32)))
        t, b = np.asarray(t), np.asarray(b)
        assert np.abs((t * n).sum(-1)).max() < 1e-5
        assert np.abs((t * b).sum(-1)).max() < 1e-5
        assert np.allclose(np.linalg.norm(t, axis=-1), 1, atol=1e-5)

    def test_sphere_light_sample_hits_sphere(self):
        p = jnp.zeros((256, 3))
        center = jnp.asarray([0.0, 5.0, 0.0])
        rs = np.random.RandomState(2)
        u = jnp.asarray(rs.rand(256, 2).astype(np.float32))
        d, pdf, dist = sampling.sphere_light_sample(p, center, 1.0, u)
        from idkengine_tpu.ops.intersect import ray_sphere

        hit, t = ray_sphere(p, d, center, 1.0)
        assert np.asarray(hit).all()
        assert (np.asarray(pdf) > 0).all()

    def test_refract_tir(self):
        d = jnp.asarray([[0.99, -0.141, 0.0]])
        d = d / jnp.linalg.norm(d)
        n = jnp.asarray([[0.0, 1.0, 0.0]])
        out, tir = sampling.refract(d, n, jnp.asarray([1.5]))  # dense->sparse grazing
        assert bool(tir[0])  # total internal reflection


class TestShading:
    def test_bsdf_energy_reasonable(self):
        rs = np.random.RandomState(3)
        r = 512
        d = jnp.asarray(np.tile([0, 0, -1.0], (r, 1)).astype(np.float32))
        n = jnp.asarray(np.tile([0, 0, 1.0], (r, 1)).astype(np.float32))
        alb = jnp.full((r, 3), 0.8)
        surf = shading.sample_bsdf(
            d, n, alb, jnp.zeros(r), jnp.ones(r), jnp.zeros(r), jnp.full(r, 1.5),
            jnp.zeros(r, bool), jnp.asarray(rs.rand(r).astype(np.float32)),
            jnp.asarray(rs.rand(r, 2).astype(np.float32)),
        )
        tp = np.asarray(surf.throughput_mul)
        assert tp.max() <= 1.0 + 1e-5  # energy-proportional lobes never amplify
        # sampled dirs in the upper hemisphere for opaque diffuse
        assert (np.asarray(surf.direction)[:, 2] > -0.3).mean() > 0.95

    def test_ggx_reciprocal_positive(self):
        n = jnp.asarray([[0.0, 0.0, 1.0]])
        v = jnp.asarray([[0.5, 0.0, 0.8]])
        l = jnp.asarray([[-0.5, 0.0, 0.8]])
        f = shading.ggx_brdf(n, v, l, jnp.full((1, 3), 0.5), jnp.zeros(1), jnp.full(1, 0.5))
        assert (np.asarray(f) >= 0).all()


class TestCamera:
    def test_rays_through_center(self):
        cam = Camera(position=np.zeros(3, np.float32), yaw=-90.0, pitch=0.0)
        params = cam.ray_params(64, 64)
        o, d = generate_rays(params, 64, 64, jnp.full((64 * 64, 2), 0.5))
        center = np.asarray(d[32 * 64 + 32])
        np.testing.assert_allclose(center, [0, 0, -1], atol=0.03)

    def test_thin_lens_spreads_origins(self):
        cam = Camera(lens_radius=0.5, focal_distance=10.0)
        params = cam.ray_params(32, 32)
        rs = np.random.RandomState(4)
        o, d = generate_rays(
            params, 32, 32, jnp.full((1024, 2), 0.5),
            jnp.asarray(rs.rand(1024, 2).astype(np.float32)),
        )
        assert float(jnp.std(o[:, 0])) > 0.05


class TestPost:
    def test_tonemap_range(self):
        img = jnp.asarray(np.random.RandomState(5).rand(16, 16, 3).astype(np.float32) * 50)
        out = np.asarray(tonemap(img))
        assert out.min() >= 0.0 and out.max() <= 1.0
        u8 = to_uint8(out)
        assert u8.dtype == np.uint8

    def test_tonemap_monotonic_luma(self):
        vals = jnp.asarray([[[0.1, 0.1, 0.1]], [[1.0, 1.0, 1.0]], [[10.0, 10.0, 10.0]]])
        out = np.asarray(tonemap(vals))
        assert out[0, 0, 0] < out[1, 0, 0] < out[2, 0, 0]

    def test_bloom_adds_glow_around_bright(self):
        img = np.zeros((32, 32, 3), np.float32)
        img[16, 16] = 50.0
        b = np.asarray(bloom(jnp.asarray(img), BloomSettings(threshold=1.0)))
        assert b[16, 18].sum() > 0  # energy spread to neighbors
        assert b.min() >= 0

    def test_taa_identity_when_static(self):
        img = jnp.asarray(np.random.RandomState(6).rand(16, 16, 3).astype(np.float32))
        vel = jnp.zeros((16, 16, 2))
        depth = jnp.ones((16, 16))
        out = taa_resolve(img, img, vel, depth, TaaSettings(blend=0.1))
        np.testing.assert_allclose(np.asarray(out), np.asarray(img), atol=1e-3)

    def test_denoiser_quality_gate(self):
        """OIDN-slot quality bar (VERDICT r3 #8): the SVGF-style filter at
        8 spp must beat the noisy input against a 256-spp converged render
        by a stated margin — RMSE ratio ≤ 0.85 in BOTH linear and
        tonemapped (display-referred) space on the canonical quad-lit
        Cornell box (measured 0.77/0.77 with the shipped defaults; ref
        role: PathTracerPipeline.cs:165-278). Uses the tracer's per-pixel
        variance (PathTracer.variance()) like the production pipeline
        (render/pipeline.py passes it when output == 'denoised')."""
        from idkengine_tpu.render import (Camera, PathTracer,
                                          PathTracerSettings)
        from idkengine_tpu.render.tonemap import tonemap
        from idkengine_tpu.scene.procedural import cornell_box
        from idkengine_tpu.scene.scene_db import SceneDatabase

        db = SceneDatabase()
        db.add_model(cornell_box(emissive_quad=True))
        scene = db.build()
        mats, lights = db.materials.soa(), db.lights.soa()
        cam = Camera(position=np.array([278, 273, -800], np.float32),
                     yaw=90.0, fov_y=38.0)
        H = W = 64
        pt = PathTracer(
            scene, mats, lights, W, H,
            PathTracerSettings(ray_depth=3, sky_strength=0.0,
                               use_packet_tracer=False))
        for _ in range(8):
            pt.render_frame(cam)
        noisy = np.asarray(pt.image())
        alb, nrm, dep = pt._last_aovs
        var = pt.variance()
        den = np.asarray(atrous_denoise(
            pt.image(), alb.reshape(H, W, 3), nrm.reshape(H, W, 3),
            dep.reshape(H, W), variance=var))
        for _ in range(248):
            pt.render_frame(cam)
        ref = np.asarray(pt.image())

        def rmse(a, b):
            return float(np.sqrt(((a - b) ** 2).mean()))

        tm = lambda x: np.asarray(tonemap(jnp.asarray(x)))
        lin_ratio = rmse(den, ref) / rmse(noisy, ref)
        tm_ratio = rmse(tm(den), tm(ref)) / rmse(tm(noisy), tm(ref))
        assert lin_ratio <= 0.85, (lin_ratio, tm_ratio)
        assert tm_ratio <= 0.85, (lin_ratio, tm_ratio)

    def test_denoiser_reduces_noise(self):
        rs = np.random.RandomState(7)
        clean = np.full((32, 32, 3), 0.5, np.float32)
        noisy = clean + rs.randn(32, 32, 3).astype(np.float32) * 0.2
        alb = np.ones((32, 32, 3), np.float32)
        nrm = np.tile([0, 0, 1.0], (32, 32, 1)).astype(np.float32)
        dep = np.ones((32, 32), np.float32)
        out = np.asarray(
            atrous_denoise(jnp.asarray(noisy), jnp.asarray(alb), jnp.asarray(nrm), jnp.asarray(dep))
        )
        assert out.std() < noisy.std() * 0.5
        assert abs(out.mean() - noisy.mean()) < 0.02  # energy preserved


class TestVxgi:
    def test_voxelize_and_cone_trace(self):
        from idkengine_tpu.render.vxgi import VoxelGrid, VxgiSettings
        from idkengine_tpu.scene.procedural import cornell_box
        from idkengine_tpu.scene.scene_db import SceneDatabase

        db = SceneDatabase()
        db.add_model(cornell_box(emissive_quad=False))
        db.build()
        db.lights.add([278, 480, 279.5], [6, 6, 6], radius=45.0)
        lights = {k: jnp.asarray(v) for k, v in db.lights.soa().items() if k != "count"}
        mats = {k: jnp.asarray(v) for k, v in db.materials.soa().items()}
        g = VoxelGrid(
            db.blas.nodes["min"][0], db.blas.nodes["max"][0],
            VxgiSettings(resolution=16, cones=2, max_samples=1 << 12),
        )
        grid = g.voxelize(db.device_scene, mats, lights, 1)
        assert grid.shape == (4, 16, 16, 16)  # channel-first
        assert float(jnp.sum(grid[3])) > 0  # some voxels filled
        # cone trace from the floor center gets some bounce light
        gi = g.cone_trace(jnp.asarray([[278.0, 10.0, 280.0]] * 4), jnp.asarray([[0.0, 1.0, 0.0]] * 4))
        assert gi.shape == (4, 3)
        assert float(gi.sum()) >= 0


class TestAux:
    def test_recorder_roundtrip(self, tmp_path):
        from idkengine_tpu.recorder import StateRecorder

        cam = Camera()
        rec = StateRecorder()
        for i in range(4):
            cam.yaw += 5
            rec.record(cam, i * 0.1)
        p = str(tmp_path / "r.frd")
        rec.save(p)
        rec2 = StateRecorder.load(p)
        assert len(rec2.frames) == 4
        assert rec2.frames[3].yaw == cam.yaw

    def test_collision_slides_on_floor(self):
        from idkengine_tpu.collision import scene_vs_moving_sphere
        from idkengine_tpu.scene.procedural import make_box
        from idkengine_tpu.scene.model import MeshPrimitive, Model, Node
        from idkengine_tpu.scene.scene_db import SceneDatabase

        model = Model()
        v, i = make_box([0, -0.5, 0], [40, 1, 40])
        model.primitives = [MeshPrimitive(positions=v, indices=i)]
        model.primitives[0].ensure_normals()
        model.nodes = [Node(mesh_primitives=[0])]
        model.root_nodes = [0]
        db = SceneDatabase()
        db.add_model(model)
        db.build()
        # sphere moving diagonally down into the floor must stay above it
        pos = scene_vs_moving_sphere(
            db, np.array([0, 2.0, 0], np.float32), np.array([1.0, -4.0, 0], np.float32), 0.5
        )
        assert pos[1] >= 0.45  # rests on the floor (radius 0.5 - eps)
        assert pos[0] > 0.3  # slid forward

    def test_hdr_loader(self):
        from idkengine_tpu.scene.hdr import load_hdr

        img = load_hdr(
            "/root/reference/IDKEngine/Resource/Textures/EnvironmentMap/snow_field_puresky_1k.hdr"
        )
        assert img.shape == (512, 1024, 3)
        assert img.dtype == np.float32
        assert 0.1 < img.mean() < 5.0

    def test_atmosphere_sane(self):
        from idkengine_tpu.render.sky import compute_atmosphere

        sky = compute_atmosphere(32, 16)
        assert not np.isnan(sky).any()
        assert sky.min() >= 0


class TestDynamics:
    def test_skinning_identity(self):
        from idkengine_tpu.scene.skinning import skin_positions

        rs = np.random.RandomState(8)
        pos = jnp.asarray(rs.randn(64, 3).astype(np.float32))
        joints = jnp.zeros((64, 4), jnp.int32)
        weights = jnp.asarray(np.tile([1.0, 0, 0, 0], (64, 1)).astype(np.float32))
        jm = jnp.eye(4)[None]
        out = skin_positions(pos, joints, weights, jm)
        np.testing.assert_allclose(np.asarray(out), np.asarray(pos), atol=1e-5)

    def test_animation_sampler_step_linear(self):
        from idkengine_tpu.scene.animation import sample
        from idkengine_tpu.scene.model import AnimationSampler

        times = np.array([0.0, 1.0, 2.0], np.float32)
        vals = np.array([[0.0], [10.0], [20.0]], np.float32)
        lin = AnimationSampler(times, vals, "LINEAR")
        stp = AnimationSampler(times, vals, "STEP")
        assert sample(lin, 0.5)[0] == pytest.approx(5.0)
        assert sample(stp, 0.5)[0] == pytest.approx(0.0)
        assert sample(lin, 5.0)[0] == pytest.approx(20.0)  # clamp


class TestNewPasses:
    def test_shadowmap_cube_roundtrip(self):
        import jax.numpy as jnp
        from idkengine_tpu.render.shadowmap import _dir_to_face_uv, _face_dirs
        rs = np.random.RandomState(0)
        d = rs.randn(512, 3).astype(np.float32)
        d /= np.linalg.norm(d, axis=-1, keepdims=True)
        face, u, v = _dir_to_face_uv(jnp.asarray(d))
        d2 = _face_dirs(face, jnp.asarray(u) * 2 - 1, jnp.asarray(v) * 2 - 1)
        np.testing.assert_allclose(np.asarray(d2), d, atol=1e-5)

    def test_shadowmap_pcf_occlusion(self):
        import jax.numpy as jnp
        from idkengine_tpu.render.shadowmap import build_point_shadow, pcf_visibility

        # analytic "scene": a plane at y=0 (rays pointing down hit at dist
        # light_y / |dy|); everything else misses
        lp = np.array([0.0, 5.0, 0.0], np.float32)

        def trace(o, d, tm):
            dy = d[:, 1]
            t = jnp.where(dy < -1e-6, -o[:, 1] / jnp.minimum(dy, -1e-6), 3.4e38)
            return t

        sm = build_point_shadow(trace, lp, res=64)
        # point just below the plane: occluded; above: visible
        below = jnp.asarray([[0.5, -2.0, 0.5]], jnp.float32)
        above = jnp.asarray([[0.5, 2.0, 0.5]], jnp.float32)
        v_below = float(pcf_visibility(sm, below)[0])
        v_above = float(pcf_visibility(sm, above)[0])
        assert v_below < 0.3 and v_above > 0.9

    def test_oit_peel_composite(self):
        import jax.numpy as jnp
        from idkengine_tpu.render.oit import composite_over, peel_layers

        # two transparent layers at absolute t=1 and t=2 with alpha 0.5
        # each; trace_fn returns t RELATIVE to the accumulated t_min and a
        # layer-id aux forwarded to the shader
        def trace(o, d, t_min, t_far):
            which = jnp.where(t_min < 1.0, 1, jnp.where(t_min < 2.0, 2, 0))
            return which.astype(jnp.float32) - t_min, which > 0, which

        def shade(t, valid, which):
            rgb = jnp.where((which == 1)[:, None],
                            jnp.array([[1.0, 0, 0]]), jnp.array([[0, 1.0, 0]]))
            return rgb, jnp.full(t.shape, 0.5)

        o = jnp.zeros((8, 3)); d = jnp.zeros((8, 3)); d = d.at[:, 2].set(1.0)
        color, alpha = peel_layers(trace, shade, o, d, jnp.full((8,), 10.0), layers=3)
        # front-to-back: 0.5*red + 0.5*0.5*green
        np.testing.assert_allclose(np.asarray(color[0]), [0.5, 0.25, 0.0], atol=1e-5)
        np.testing.assert_allclose(float(alpha[0]), 0.75, atol=1e-5)
        out = composite_over(color, alpha, jnp.ones((8, 3)) * 0.2)
        np.testing.assert_allclose(np.asarray(out[0]), [0.55, 0.3, 0.05], atol=1e-5)

    def test_upscaler_converges_static(self):
        import jax.numpy as jnp
        from idkengine_tpu.render.upscale import UpscaleSettings, taau_resolve

        rs = np.random.RandomState(1)
        target = rs.rand(32, 32, 3).astype(np.float32)
        low = jnp.asarray(target[::2, ::2])
        hist = None
        vel = jnp.zeros((32, 32, 2))
        for f in range(6):
            hist = taau_resolve(low, hist, vel, (0.0, 0.0),
                                UpscaleSettings(scale=2, sharpen=0.0))
        assert hist.shape == (32, 32, 4)  # rgb + accumulated weight
        assert float(jnp.mean(jnp.abs(hist[..., :3]))) > 0

    def test_adaptive_classifier_rates(self):
        import jax.numpy as jnp
        from idkengine_tpu.render.adaptive import classify

        h = w = 64
        color = np.zeros((h, w, 3), np.float32) + 0.5
        color[:16, :16] += np.random.RandomState(0).rand(16, 16, 3).astype(np.float32)
        vel = np.zeros((h, w, 2), np.float32)
        vel[-16:, -16:] = 50.0  # fast-moving tile
        rate = np.asarray(classify(jnp.asarray(color), jnp.asarray(vel)))
        assert rate.shape == (4, 4)
        assert rate[0, 0] > rate[1, 1]  # noisy tile gets more samples
        assert rate[3, 3] < rate[1, 1]  # fast tile gets fewer

    def test_device_sort_matches_argsort(self):
        import jax.numpy as jnp
        from idkengine_tpu.ops.device_sort import radix_argsort, sort_rays_by_key

        rs = np.random.RandomState(2)
        k = rs.randint(0, 1 << 18, 4096).astype(np.int32)
        v = rs.rand(4096).astype(np.float32)
        idx = np.asarray(radix_argsort(jnp.asarray(k)))
        np.testing.assert_array_equal(np.sort(k), k[idx])
        (vs,) = sort_rays_by_key(jnp.asarray(k), (jnp.asarray(v),))
        np.testing.assert_allclose(np.sort(k), np.asarray(
            sort_rays_by_key(jnp.asarray(k), (jnp.asarray(k),))[0]))

    def test_deferred_pipeline_modes(self):
        """Smoke: DeferredPipeline with PCF shadows + OIT + classifier on a
        tiny Cornell render (XLA trace path)."""
        import jax.numpy as jnp
        from idkengine_tpu.render.pipeline import DeferredPipeline, DeferredSettings2
        from idkengine_tpu.render.camera import Camera
        from idkengine_tpu.scene.procedural import cornell_box
        from idkengine_tpu.scene.scene_db import SceneDatabase

        db = SceneDatabase()
        db.add_model(cornell_box())
        db.build()
        db.lights.add([278, 520, 279], [3e5, 3e5, 3e5], radius=40.0)
        s = DeferredSettings2(
            use_packet_tracer=False, use_taa=False, use_bloom=False,
            use_ssao=False, use_oit=True, oit_layers=2, use_classifier=True,
            shadows="pcf", shadow_map_res=32,
        )
        pipe = DeferredPipeline(db, 32, 32, s)
        cam = Camera(position=np.array([278, 273, -500], np.float32),
                     yaw=90.0, fov_y=40.0)
        img = np.asarray(pipe.render_frame(cam))
        assert img.shape == (32, 32, 3)
        assert np.isfinite(img).all() and img.std() > 0
        assert pipe.rate_map.shape == (2, 2)
        # the PCF path must pass the camera frustum through to the shadow
        # manager so per-face SAT culling runs in production (ref:
        # CpuPointShadow.cs:116-185); the map records which faces it traced
        assert pipe._shadow_mgr is not None
        assert pipe._shadow_mgr.shadows[0].face_mask is not None

    def test_deferred_pipeline_pcf_culls_faces(self):
        """A camera looking AWAY from the light must cull some cube faces
        in the pipeline's PCF build (the round-3 gap: update() was called
        without the frustum, so SAT culling never ran in production)."""
        from idkengine_tpu.render.camera import Camera
        from idkengine_tpu.render.pipeline import (DeferredPipeline,
                                                   DeferredSettings2)
        from idkengine_tpu.scene.procedural import cornell_box
        from idkengine_tpu.scene.scene_db import SceneDatabase

        db = SceneDatabase()
        db.add_model(cornell_box())
        db.build()
        db.lights.add([278, 520, 279], [3e5, 3e5, 3e5], radius=40.0)
        s = DeferredSettings2(
            use_packet_tracer=False, use_taa=False, use_bloom=False,
            use_ssao=False, shadows="pcf", shadow_map_res=16,
        )
        pipe = DeferredPipeline(db, 16, 16, s)
        cam = Camera(position=np.array([278, 273, -500], np.float32),
                     yaw=-90.0, fov_y=40.0)  # looking -z, away from the box
        img = np.asarray(pipe.render_frame(cam))
        assert np.isfinite(img).all()
        mask = pipe._shadow_mgr.shadows[0].face_mask
        assert mask.sum() < 6, mask  # some faces culled
        # turning back toward the box must rebuild the needed faces
        cam2 = Camera(position=np.array([278, 273, -500], np.float32),
                      yaw=90.0, fov_y=40.0)
        np.asarray(pipe.render_frame(cam2))
        mask2 = pipe._shadow_mgr.shadows[0].face_mask
        assert mask2.sum() >= mask.sum()


def test_adaptive_rate_depth_feedback():
    """VRS-classifier feedback: a per-pixel bounce budget of 1 must equal a
    depth-1 render; the PT pipeline wires the classifier map through."""
    import numpy as np

    from idkengine_tpu.render import Camera, PathTracer, PathTracerSettings
    from idkengine_tpu.render.pipeline import (
        PathTracerPipeline, PtPipelineSettings)
    from idkengine_tpu.scene.procedural import cornell_box
    from idkengine_tpu.scene.scene_db import SceneDatabase

    db = SceneDatabase()
    db.add_model(cornell_box(emissive_quad=False))
    scene = db.build()
    db.lights.add([278, 480, 279.5], [6, 6, 6], radius=45.0)
    cam = Camera(position=np.array([278, 273, -800], np.float32), yaw=90.0,
                 fov_y=38.0)
    mats, lights = db.materials.soa(), db.lights.soa()

    pt3 = PathTracer(scene, mats, lights, 32, 32,
                     PathTracerSettings(ray_depth=3, sky_strength=0.0,
                                        use_packet_tracer=False))
    img_budget1 = np.asarray(pt3.render_frame(
        cam, rate_depth=jnp.ones((32 * 32,), jnp.int32)))
    pt1 = PathTracer(scene, mats, lights, 32, 32,
                     PathTracerSettings(ray_depth=1, sky_strength=0.0,
                                        use_packet_tracer=False))
    img_d1 = np.asarray(pt1.render_frame(cam))
    np.testing.assert_allclose(img_budget1, img_d1, rtol=1e-5, atol=1e-6)

    # full budget == unconstrained
    pt3b = PathTracer(scene, mats, lights, 32, 32,
                      PathTracerSettings(ray_depth=3, sky_strength=0.0,
                                         use_packet_tracer=False))
    img_full = np.asarray(pt3b.render_frame(
        cam, rate_depth=jnp.full((32 * 32,), 3, jnp.int32)))
    pt3c = PathTracer(scene, mats, lights, 32, 32,
                      PathTracerSettings(ray_depth=3, sky_strength=0.0,
                                         use_packet_tracer=False))
    np.testing.assert_allclose(img_full, np.asarray(pt3c.render_frame(cam)),
                               rtol=1e-5, atol=1e-6)

    # pipeline wiring: classifier map materializes after 2 samples
    pipe = PathTracerPipeline(
        db, 32, 32,
        PathTracerSettings(ray_depth=3, sky_strength=0.0,
                           use_packet_tracer=False),
        PtPipelineSettings(adaptive_rate=True, output="noisy",
                           use_bloom=False))
    pipe.render_frame(cam)
    pipe.render_frame(cam)
    assert getattr(pipe, "_rate_depth", None) is not None
    pipe.render_frame(cam)  # consumes the map


def test_config_full_roundtrip(tmp_path):
    """Every field in the settings tree survives JSON save/load — the
    reference's Gui settings surface equivalent (ref: Gui.cs)."""
    import dataclasses

    from idkengine_tpu.engine import (
        EngineSettings, RenderMode, load_config, save_config)
    from idkengine_tpu.render import PathTracerSettings
    from idkengine_tpu.render.pipeline import PtPipelineSettings

    s = EngineSettings(width=320, height=200, mode=RenderMode.RASTERIZER)
    s.pt = dataclasses.replace(
        s.pt, ray_depth=7, russian_roulette=False, do_ray_sorting=True,
        sky_zenith=(0.1, 0.2, 0.3), tile_size=256)
    s.pt_pipeline = dataclasses.replace(
        s.pt_pipeline, output="albedo", adaptive_rate=True,
        denoise_at_samples=7, use_bloom=False)
    s.deferred = dataclasses.replace(
        s.deferred, **{k: v for k, v in [("shadow_mode", "pcf")]
                       if hasattr(s.deferred, k)})
    s.camera_collision = False
    p = tmp_path / "cfg.json"
    save_config(s, str(p))
    r = load_config(str(p))
    assert r.width == 320 and r.height == 200
    assert r.mode == RenderMode.RASTERIZER
    assert r.pt.ray_depth == 7 and r.pt.do_ray_sorting
    assert r.pt.sky_zenith == (0.1, 0.2, 0.3)
    assert r.pt.tile_size == 256 and not r.pt.russian_roulette
    assert r.pt_pipeline.output == "albedo" and r.pt_pipeline.adaptive_rate
    assert r.pt_pipeline.denoise_at_samples == 7
    assert not r.pt_pipeline.use_bloom
    assert not r.camera_collision
    # nested post-processing settings survive too
    assert r.pt_pipeline.bloom == s.pt_pipeline.bloom
    assert r.pt_pipeline.tonemap == s.pt_pipeline.tonemap
    assert r.deferred == s.deferred


def test_debug_views():
    """BVH traversal-cost heatmap + selection box overlay (ref: Turbo BVH
    debug in FinalDraw + BoxRenderer)."""
    import numpy as np

    from idkengine_tpu.render import Camera, PathTracer, PathTracerSettings
    from idkengine_tpu.render.debug_view import (
        draw_box_overlay, traversal_cost_image, turbo)
    from idkengine_tpu.scene.procedural import cornell_box
    from idkengine_tpu.scene.scene_db import SceneDatabase

    db = SceneDatabase()
    db.add_model(cornell_box(emissive_quad=False))
    scene = db.build()
    assert np.isfinite(db.meta.epo) and db.meta.epo >= 0.0
    pt = PathTracer(scene, db.materials.soa(), db.lights.soa(), 32, 32,
                    PathTracerSettings(use_packet_tracer=False))
    cam = Camera(position=np.array([278, 273, -800], np.float32), yaw=90.0,
                 fov_y=38.0)
    img = np.asarray(traversal_cost_image(pt, cam, max_cost=64))
    assert img.shape == (32, 32, 3) and np.isfinite(img).all()
    assert img.std() > 0.01  # cost varies across the frame

    t = np.asarray(turbo(np.linspace(0, 1, 8)))
    assert t.shape == (8, 3) and (t >= 0).all() and (t <= 1).all()
    assert t[1, 2] > t[1, 0]  # low end is blue-ish
    assert t[-1, 0] > t[-1, 2]  # high end is red-ish

    base = np.zeros((32, 32, 3), np.float32)
    over = draw_box_overlay(base, cam, [100, 0, 100], [456, 300, 459])
    assert (over != base).any()
    assert over.max() <= 1.0


def test_point_shadow_face_culling():
    """Per-face SAT culling: faces invisible to the camera trace dead rays
    and rebuild only when they become visible (ref: CpuPointShadow.cs)."""
    import numpy as np

    from idkengine_tpu.collision import Frustum
    from idkengine_tpu.render.shadowmap import (
        PointShadowManager, face_visibility)
    from idkengine_tpu.utils import mathutil as mu

    # camera at origin looking -z: light ahead of the camera
    view = mu.look_at(np.array([0.0, 0, 0]), np.array([0.0, 0, -1]),
                      np.array([0.0, 1, 0]))
    proj = mu.perspective_reverse_z(60.0, 1.0, 0.1)
    fr = Frustum.from_view_projection(proj @ view, far_depth=1e-3)
    vis = face_visibility([0.0, 0.0, -50.0], fr)
    assert vis.any()
    # light far behind the camera: most faces culled
    vis_behind = face_visibility([0.0, 0.0, 500.0], fr, far=100.0)
    assert vis_behind.sum() < 6

    calls = []

    def fake_trace(o, d, tm):
        calls.append(int((np.asarray(tm) > 0).sum()))
        return jnp.where(tm > 0, 10.0, -1.0)

    mgr = PointShadowManager(fake_trace, res=8)
    m1 = mgr.update(0, [0.0, 0.0, -50.0], camera_frustum=fr)
    assert calls[-1] <= 6 * 64
    assert m1.face_mask is not None
    # culled faces store 'far' (no wrong occlusion if ever sampled)
    if not m1.face_mask.all():
        f = int(np.nonzero(~m1.face_mask)[0][0])
        assert float(np.asarray(m1.maps)[f].min()) > 1e30
    # same position, same visibility: cached (no extra trace)
    n = len(calls)
    mgr.update(0, [0.0, 0.0, -50.0], camera_frustum=fr)
    assert len(calls) == n


def test_many_lights_scan_path():
    """64 lights exercise the lax.scan many-light paths (the reference
    supports 256 lights; an unrolled loop would explode the compile)."""
    import numpy as np

    from idkengine_tpu.render import Camera, PathTracer, PathTracerSettings
    from idkengine_tpu.scene.procedural import cornell_box
    from idkengine_tpu.scene.scene_db import SceneDatabase

    db = SceneDatabase()
    db.add_model(cornell_box(emissive_quad=False))
    scene = db.build()
    rng_ = np.random.default_rng(5)
    for i in range(64):
        p = rng_.uniform([50, 50, 50], [500, 500, 500])
        db.lights.add(p.tolist(), [0.4, 0.4, 0.4], radius=6.0)
    cam = Camera(position=np.array([278, 273, -800], np.float32), yaw=90.0,
                 fov_y=38.0)
    pt = PathTracer(scene, db.materials.soa(), db.lights.soa(), 24, 24,
                    PathTracerSettings(ray_depth=2, sky_strength=0.0,
                                       use_packet_tracer=False))
    img = np.asarray(pt.render_frame(cam))
    assert np.isfinite(img).all() and img.mean() > 0

    # deferred many-light scan (shadow_mode none)
    from idkengine_tpu.render.deferred import DeferredSettings, shade_deferred
    from idkengine_tpu.render.gbuffer import render_gbuffer
    from idkengine_tpu.ops.trace import trace_closest

    lights = {k: jnp.asarray(v) for k, v in db.lights.soa().items()
              if k != "count"}
    mats = {k: jnp.asarray(v) for k, v in db.materials.soa().items()}
    cam_params = cam.ray_params(24, 24)
    gbuf = render_gbuffer(
        lambda o, d, tm: (trace_closest(scene, o, d, tm), None)[0]
        if False else trace_closest(scene, o, d, tm),
        scene, mats, cam_params, cam_params, 24, 24,
        jitter=jnp.asarray([0.5, 0.5], jnp.float32))
    out = shade_deferred(gbuf, lights, 64, cam_params["origin"], None,
                         DeferredSettings(shadow_mode="none"))
    assert np.isfinite(np.asarray(out)).all()
    assert float(jnp.asarray(out).max()) > 0


def test_deferred_pipeline_all_features():
    """Integration: VXGI + SSR + volumetric + OIT + classifier + TAA all ON
    in one frame (the wiring paths unit tests miss)."""
    import numpy as np

    from idkengine_tpu.engine import (
        Engine, EngineSettings, RenderMode)
    from idkengine_tpu.render.pipeline import DeferredSettings2
    from idkengine_tpu.scene.procedural import cornell_box
    from idkengine_tpu.scene.scene_db import SceneDatabase

    db = SceneDatabase()
    db.add_model(cornell_box(emissive_quad=False))
    db.build()
    db.lights.add([278, 480, 279.5], [8, 8, 8], radius=45.0)
    s = EngineSettings(width=32, height=32, mode=RenderMode.RASTERIZER)
    s.deferred = DeferredSettings2(
        use_vxgi=True, use_ssao=True, use_ssr=True, use_volumetric=True,
        use_taa=True, use_bloom=True, use_oit=True, use_classifier=True,
        shadows="ray_traced", use_packet_tracer=False)
    s.deferred.vxgi = __import__("dataclasses").replace(
        s.deferred.vxgi, resolution=16)
    eng = Engine(db, s)
    eng.camera.position = np.array([278, 273, -800], np.float32)
    eng.camera.yaw = 90.0
    for _ in range(2):
        img = np.asarray(eng.render())
    assert img.shape == (32, 32, 3)
    assert np.isfinite(img).all() and img.std() > 0


def test_taau_converges_above_bilinear():
    """FSR2-role validation: over a static jittered sequence the temporal
    upscaler must reconstruct detail a single bilinear upsample cannot
    (PSNR gain vs ground truth)."""
    import numpy as np

    from idkengine_tpu.render import upscale as up

    H = W = 64
    s = 2

    # near-Nyquist signal: aliased at the render resolution, representable
    # at the output resolution — exactly what temporal upscaling recovers
    def f(x, y):
        return np.stack([
            0.5 + 0.5 * np.sin(x * 2.2) * np.cos(y * 1.7),
            0.5 + 0.5 * np.sin(x * 0.7) * np.cos(y * 0.45),
            (x + y) / (H + W)], -1).astype(np.float32)

    yy, xx = np.meshgrid(np.arange(H), np.arange(W), indexing="ij")
    truth = f(xx.astype(np.float64), yy.astype(np.float64))

    def render_low(jx, jy):
        ys = (np.arange(H // s) + 0.5 + jy) * s - 0.5
        xs = (np.arange(W // s) + 0.5 + jx) * s - 0.5
        X, Y = np.meshgrid(xs, ys)
        return jnp.asarray(f(X, Y))

    vel = jnp.zeros((H, W, 2), jnp.float32)
    hist = None
    settings = up.UpscaleSettings(scale=s, blend=0.35, sharpen=0.0)
    for fr in range(16):
        jx, jy = up.halton_jitter(fr)
        hist = up.taau_resolve(render_low(jx, jy), hist, vel, (jx, jy),
                               settings)

    def psnr(a):
        mse = float(np.mean((np.asarray(a)[..., :3] - truth) ** 2))
        return -10 * np.log10(max(mse, 1e-12))

    base = psnr(up.upsample_bilinear(render_low(0.0, 0.0), s))
    conv = psnr(hist)
    assert conv > base + 3.0, f"TAAU {conv:.1f} dB vs bilinear {base:.1f} dB"


def test_viewer_input_and_ppm_headless():
    """Viewer logic without a display: input snapshot mapping and the PPM
    presentation encoding (the window itself needs an X display)."""
    import numpy as np

    from idkengine_tpu import viewer as viewer_mod

    class FakeViewer:
        _down = {"w", "d", "right"}
        poll_input = viewer_mod.Viewer.poll_input

    move, look = FakeViewer().poll_input()
    np.testing.assert_allclose(move, [1, 0, 1])
    assert look[0] > 0 and look[1] == 0

    img = np.random.rand(8, 8, 3).astype(np.float32)
    u8 = np.clip(img * 255, 0, 255).astype(np.uint8)
    ppm = b"P6 8 8 255 " + u8.tobytes()
    assert ppm[:2] == b"P6" and len(ppm) == 11 + 8 * 8 * 3

    # windowless environments raise cleanly
    import pytest as _pytest

    try:
        import tkinter
        with _pytest.raises(Exception):
            tkinter.Tk() if not __import__("os").environ.get("DISPLAY") else (_ for _ in ()).throw(tkinter.TclError)
    except Exception:
        pass


def test_live_settings_surface():
    """Engine.set_option/toggle_option + the viewer's key->toggle map: the
    reference Gui's live-knob role (Gui.cs) with accumulation-reset
    semantics. Frozen leaves (PathTracerSettings is a jit key) rebuild via
    dataclasses.replace; pipelines invalidate lazily; a toggled render
    still produces a frame."""
    import numpy as np

    from idkengine_tpu import viewer as viewer_mod
    from idkengine_tpu.engine import Engine, EngineSettings, RenderMode
    from idkengine_tpu.scene.procedural import cornell_box
    from idkengine_tpu.scene.scene_db import SceneDatabase

    db = SceneDatabase()
    db.add_model(cornell_box())
    db.build()
    db.lights.add([278, 520, 279], [3e5, 3e5, 3e5], radius=40.0)
    s = EngineSettings(width=16, height=16, mode=RenderMode.RASTERIZER)
    s.deferred.use_packet_tracer = False
    s.deferred.use_taa = False
    s.deferred.use_ssao = False
    s.deferred.shadows = "none"
    eng = Engine(db, s)
    img0 = np.asarray(eng.render())
    assert np.isfinite(img0).all()

    # mutable toggle invalidates the deferred pipeline
    assert eng.toggle_option("deferred.use_bloom") in (True, False)
    assert RenderMode.RASTERIZER not in eng._pipelines
    img1 = np.asarray(eng.render())
    assert img1.shape == img0.shape

    # frozen leaf (PathTracerSettings): set_option must replace the node
    prev = eng.set_option("pt.ray_depth", 1)
    assert eng.settings.pt.ray_depth == 1 and prev != 1

    # viewer key map routes to the engine without a display
    class FakeV:
        engine = eng
        _TOGGLES = viewer_mod.Viewer._TOGGLES
        _PT_OUTPUTS = viewer_mod.Viewer._PT_OUTPUTS
        _handle_toggle = viewer_mod.Viewer._handle_toggle

    fv = FakeV()
    before = eng.settings.deferred.use_ssao
    assert fv._handle_toggle("3") is True
    assert eng.settings.deferred.use_ssao != before
    assert fv._handle_toggle("m") is True
    assert eng.settings.mode == RenderMode.PATH_TRACER
    assert fv._handle_toggle("o") is True  # cycles PT output selector
    assert eng.settings.pt_pipeline.output in viewer_mod.Viewer._PT_OUTPUTS
    assert fv._handle_toggle("z") is False  # unbound keys fall through


def test_depth_aware_upsample_respects_silhouettes():
    """Joint-bilateral volumetric upscale: values must not bleed across a
    depth discontinuity (ref: VolumetricLight/Upscale depth comparison)."""
    import numpy as np

    from idkengine_tpu.render.volumetric import depth_aware_upsample

    hh = ww = 8
    ds = 2
    # left half near (depth 1, bright fog), right half far (depth 100, dark)
    low = np.zeros((hh, ww, 3), np.float32)
    low[:, : ww // 2] = 1.0
    low_depth = np.full((hh, ww), 100.0, np.float32)
    low_depth[:, : ww // 2] = 1.0
    full_depth = np.full((hh * ds, ww * ds), 100.0, np.float32)
    full_depth[:, : ww * ds // 2] = 1.0
    up = np.asarray(depth_aware_upsample(
        jnp.asarray(low), jnp.asarray(low_depth), jnp.asarray(full_depth), ds))
    assert up.shape == (16, 16, 3)
    # near side stays bright, far side stays dark right up to the edge
    assert up[:, :7].min() > 0.9
    assert up[:, 9:].max() < 0.1


def test_engine_animated_uses_device_refit():
    """Engine.update on an animated scene routes through update_device and
    renders consistently with the host-refit path."""
    import sys

    import numpy as np

    sys.path.insert(0, __file__.rsplit("/", 1)[0])
    from test_dynamic import _animated_model

    from idkengine_tpu.bvh.builder import BuildSettings
    from idkengine_tpu.engine import Engine, EngineSettings
    from idkengine_tpu.scene.scene_db import SceneDatabase

    def build(host):
        import os

        db = SceneDatabase(BuildSettings(max_leaf_triangle_count=12,
                                         traversal_cost=4.0))
        db.add_model(_animated_model(), hoist=False)
        db.build()
        db.lights.add([278, 480, 279.5], [6, 6, 6], radius=45.0)
        eng = Engine(db, EngineSettings(width=24, height=24))
        eng.settings.pt = __import__("dataclasses").replace(
            eng.settings.pt, use_packet_tracer=False, ray_depth=2)
        eng.camera.position = np.array([278, 273, -800], np.float32)
        eng.camera.yaw = 90.0
        if host:
            os.environ["IDK_HOST_REFIT"] = "1"
        else:
            os.environ.pop("IDK_HOST_REFIT", None)
        eng.update(0.25)
        img = np.asarray(eng.render())
        os.environ.pop("IDK_HOST_REFIT", None)
        return img

    img_dev = build(host=False)
    img_host = build(host=True)
    rmse = float(np.sqrt(np.mean((img_dev - img_host) ** 2)))
    assert rmse < 2e-2, f"device vs host refit render diverged: {rmse}"


def test_ssr_binary_refinement_and_sky_fallback():
    """SSR must (a) binary-refine the crossing interval (ref: SSR/
    compute.glsl:83-95) so the refined t is far more accurate than the
    coarse march step, and (b) fall back to the sky on miss (:79-81)."""
    from idkengine_tpu.render.ssr import SsrSettings, _sky_gradient, ssr

    H = W = 64
    cam = Camera(position=np.array([0.0, 1.0, 0.0], np.float32), yaw=90.0,
                 pitch=-25.0, fov_y=60.0)
    cp = cam.ray_params(W, H)
    o, d = generate_rays(cp, W, H, jnp.full((H * W, 2), 0.5))
    o = np.asarray(o).reshape(H, W, 3)
    d = np.asarray(d).reshape(H, W, 3)
    # analytic scene: mirror floor y=0, striped wall z=20
    t_floor = np.where(d[..., 1] < -1e-6, (0.0 - o[..., 1]) / d[..., 1], np.inf)
    t_wall = np.where(d[..., 2] > 1e-6, (20.0 - o[..., 2]) / d[..., 2], np.inf)
    t = np.minimum(t_floor, t_wall)
    is_floor = t_floor < t_wall
    pos = o + d * t[..., None]
    normal = np.where(is_floor[..., None], [0.0, 1.0, 0.0], [0.0, 0.0, -1.0])
    depth = t.astype(np.float32)
    # wall color: horizontal stripes keyed on world y
    stripe = (np.floor(pos[..., 1] * 0.5) % 2).astype(np.float32)
    color = np.where(is_floor[..., None], 0.0,
                     np.stack([stripe, 1.0 - stripe, 0 * stripe], -1))

    refl_col, ok, t_ref = ssr(jnp.asarray(color), jnp.asarray(pos),
                              jnp.asarray(normal), jnp.asarray(depth), cp)
    refl_col = np.asarray(refl_col)
    ok = np.asarray(ok)
    t_ref = np.asarray(t_ref)

    # ground truth reflected hit for floor pixels: reflect d about +y,
    # intersect wall z=20
    rd = d.copy()
    rd[..., 1] = -rd[..., 1]
    t_true = np.where(rd[..., 2] > 1e-6,
                      (20.0 - pos[..., 2]) / rd[..., 2], np.inf)
    floor_hit = is_floor & ok & np.isfinite(t_true) & (t_true < 45.0)
    assert floor_hit.sum() > 300, f"too few SSR hits: {floor_hit.sum()}"
    err = np.abs(t_ref[floor_hit] - t_true[floor_hit])
    step = SsrSettings().max_distance / SsrSettings().samples
    assert np.median(err) < step / 8, (
        f"refined t error {np.median(err):.3f} vs step {step:.3f}")
    # without refinement the error is march-step sized
    _c0, _o0, t0 = ssr(jnp.asarray(color), jnp.asarray(pos),
                       jnp.asarray(normal), jnp.asarray(depth), cp,
                       settings=SsrSettings(binary_steps=0))
    err0 = np.abs(np.asarray(t0)[floor_hit] - t_true[floor_hit])
    assert np.median(err0) > np.median(err) * 3

    # sky fallback: floor pixels whose reflection misses the wall get the
    # gradient sky along the reflected direction, not black
    miss = is_floor & ~ok
    if miss.sum() > 10:
        sky = np.asarray(_sky_gradient(jnp.asarray(rd), SsrSettings()))
        np.testing.assert_allclose(refl_col[miss], sky[miss], atol=1e-4)
        assert refl_col[miss].mean() > 0.05


def test_volumetric_shadowed_march():
    """A blocker between the march region and the light carves a visible
    shaft boundary (ref: VolumetricLight/compute.glsl:79 shadows every
    march step)."""
    from idkengine_tpu.render.volumetric import (
        VolumetricSettings, volumetric_light)

    H = W = 32
    cam_o = jnp.zeros((3,), jnp.float32)
    # rays straight +z, fanned in x: pixel column x maps to world x offset
    xs = np.linspace(-4, 4, W, dtype=np.float32)
    pos = np.zeros((H, W, 3), np.float32)
    pos[..., 0] = xs[None, :]
    pos[..., 2] = 30.0
    depth = np.full((H, W), 30.0, np.float32)

    lights_pos = jnp.asarray([[0.0, 10.0, 15.0]], jnp.float32)
    lights_rad = jnp.asarray([[200.0, 200.0, 200.0]], jnp.float32)

    def occ_box(o, d, t_max):
        """Analytic slab blocker: x in [-2,0], y in [4,6], all z."""
        eps = 1e-9
        t0 = (4.0 - o[:, 1]) / jnp.where(jnp.abs(d[:, 1]) < eps, eps, d[:, 1])
        t1 = (6.0 - o[:, 1]) / jnp.where(jnp.abs(d[:, 1]) < eps, eps, d[:, 1])
        tn, tf = jnp.minimum(t0, t1), jnp.maximum(t0, t1)
        tm = 0.5 * (tn + tf)
        x_at = o[:, 0] + d[:, 0] * tm
        return (tf > jnp.maximum(tn, 0.0)) & (tn < t_max) & \
            (x_at > -2.0) & (x_at < 0.0)

    st = VolumetricSettings(samples=12, downscale=1)
    img_sh = np.asarray(volumetric_light(
        jnp.asarray(pos), jnp.asarray(depth), cam_o, lights_pos, lights_rad,
        1, occ_box, settings=st))
    img_un = np.asarray(volumetric_light(
        jnp.asarray(pos), jnp.asarray(depth), cam_o, lights_pos, lights_rad,
        1, None, settings=st))
    lum_sh = img_sh.mean(axis=(0, 2))  # per-column
    lum_un = img_un.mean(axis=(0, 2))
    blocked = (xs > -1.8) & (xs < -0.2)
    open_ = xs > 1.0
    # unshadowed: roughly symmetric; shadowed: blocked columns much darker
    assert np.all(img_un >= img_sh - 1e-6)
    ratio = lum_sh[blocked].mean() / lum_sh[open_].mean()
    ratio_un = lum_un[blocked].mean() / lum_un[open_].mean()
    assert ratio < 0.6 * ratio_un, (ratio, ratio_un)


def test_oit_transparent_layers_are_lit():
    """Transparent layers respond to light position (ref: RecordTransparent/
    fragment.glsl:77-93 shades each layer with the per-light loop): moving
    the light from left to right flips the brightness asymmetry across a
    glass quad. The old unlit compositing (flat base color) is symmetric."""
    from idkengine_tpu.render.pipeline import DeferredPipeline, DeferredSettings2
    from idkengine_tpu.scene.model import Material, MeshPrimitive, Model, Node
    from idkengine_tpu.scene.procedural import make_quad
    from idkengine_tpu.scene.scene_db import SceneDatabase

    def build(light_x):
        db = SceneDatabase()
        # opaque back wall
        v, idx = make_quad([-6, -6, 4], [6, -6, 4], [6, 6, 4], [-6, 6, 4])
        p = MeshPrimitive(positions=v.astype(np.float32),
                          indices=idx.astype(np.uint32), material=0)
        p.uvs = np.zeros((4, 2), np.float32)
        p.ensure_normals()
        wall = Model(primitives=[p], nodes=[Node(mesh_primitives=[0])],
                     materials=[Material(name="wall",
                                         base_color=np.array([0.02, 0.02, 0.02, 1], np.float32))])
        wall.root_nodes.append(0)
        db.add_model(wall)
        # glass quad in front (alpha 0.5 -> transparent layer)
        vq, iq = make_quad([-3, -3, 0], [3, -3, 0], [3, 3, 0], [-3, 3, 0])
        q = MeshPrimitive(positions=vq.astype(np.float32),
                          indices=iq.astype(np.uint32), material=0)
        q.uvs = np.zeros((4, 2), np.float32)
        q.ensure_normals()
        glass = Model(primitives=[q], nodes=[Node(mesh_primitives=[0])],
                      materials=[Material(
                          name="glass", roughness=0.6, double_sided=True,
                          base_color=np.array([1, 1, 1, 0.5], np.float32))])
        glass.root_nodes.append(0)
        db.add_model(glass)
        db.build()
        db.lights.add([light_x, 0.0, -2.0], [30.0, 30.0, 30.0], radius=0.3)
        pipe = DeferredPipeline(db, 48, 32, DeferredSettings2(
            use_oit=True, oit_layers=2, use_ssao=False, use_taa=False,
            use_bloom=False, shadows="none", use_packet_tracer=False))
        cam = Camera(position=np.array([0, 0, -6], np.float32), yaw=90.0,
                     fov_y=60.0)
        return np.asarray(pipe.render_frame(cam))

    img_l = build(-4.0)
    img_r = build(+4.0)
    left = slice(0, 20)
    right = slice(28, 48)
    asym_l = img_l[:, left].mean() - img_l[:, right].mean()
    asym_r = img_r[:, left].mean() - img_r[:, right].mean()
    # moving the light must flip the brightness asymmetry (screen-x
    # orientation is camera-convention dependent, so test the FLIP)
    assert abs(asym_l) > 0.01 and abs(asym_r) > 0.01, (asym_l, asym_r)
    assert asym_l * asym_r < 0, f"light move did not flip shading: {asym_l} {asym_r}"


def test_render_scale_taau_pipeline_mode():
    """render_scale=2 runs the frame graph at half res and TAAU-resolves to
    display res (the FSR2 pipeline role, ref: RasterPipeline.cs:611-624):
    output is display-sized, finite, and converges toward the native render."""
    from idkengine_tpu.render.pipeline import DeferredPipeline, DeferredSettings2
    from idkengine_tpu.scene.procedural import cornell_box
    from idkengine_tpu.scene.scene_db import SceneDatabase

    db = SceneDatabase()
    db.add_model(cornell_box(emissive_quad=False))
    db.build()
    db.lights.add([278, 480, 279.5], [8, 8, 8], radius=45.0)
    cam = Camera(position=np.array([278, 273, -800], np.float32), yaw=90.0,
                 fov_y=38.0)

    def make(scale):
        return DeferredPipeline(db, 64, 64, DeferredSettings2(
            render_scale=scale, use_ssao=False, use_taa=(scale == 1),
            use_bloom=False, shadows="none", use_packet_tracer=False))

    ref_pipe = make(1)
    ref = np.asarray(ref_pipe.render_frame(cam))
    up_pipe = make(2)
    for _ in range(6):
        out = np.asarray(up_pipe.render_frame(cam))
    assert out.shape == (64, 64, 3)
    assert np.isfinite(out).all() and out.std() > 0
    err = float(np.abs(out - ref).mean())
    assert err < 0.06, f"TAAU output too far from native render: {err}"


def test_mip_atlas_trilinear_reduces_minification_aliasing():
    """Minified sampling of a high-frequency checker: mip-level taps average
    toward gray with low variance; single-level (mip0) sampling aliases
    (near-binary values). Also checks the strip layout decodes every level
    and trilinear blends between adjacent levels (ref: the reference's BC
    mip chains, ModelLoader.cs:922-1111)."""
    from idkengine_tpu.render.pathtracer import _sample_atlas
    from idkengine_tpu.scene.materials import ATLAS_SIZE, _build_mip_strip

    s = ATLAS_SIZE
    cells = 64  # 8px checker cells
    yy, xx = np.meshgrid(np.arange(s), np.arange(s), indexing="ij")
    chk = (((yy // (s // cells)) + (xx // (s // cells))) % 2 * 255).astype(np.uint8)
    layer = np.stack([chk] * 4, -1)
    atlas = jnp.asarray(_build_mip_strip(layer)[None])
    assert atlas.shape == (1, s, 2 * s, 4)

    rs = np.random.RandomState(0)
    uv = jnp.asarray(rs.rand(4096, 2).astype(np.float32))
    lay = jnp.zeros((4096,), jnp.int32)
    c0 = np.asarray(_sample_atlas(atlas, lay, uv))[:, 0]
    c5 = np.asarray(_sample_atlas(atlas, lay, uv, jnp.full((4096,), 5.0)))[:, 0]
    assert abs(c0.mean() - 0.5) < 0.05 and abs(c5.mean() - 0.5) < 0.03
    assert c0.std() > 0.3, f"mip0 checker should alias: std {c0.std()}"
    assert c5.std() < 0.05, f"mip5 should be ~flat gray: std {c5.std()}"
    # trilinear continuity: lod 2.5 lies between the pure level samples
    c2 = np.asarray(_sample_atlas(atlas, lay, uv, jnp.full((4096,), 2.0)))[:, 0]
    c3 = np.asarray(_sample_atlas(atlas, lay, uv, jnp.full((4096,), 3.0)))[:, 0]
    c25 = np.asarray(_sample_atlas(atlas, lay, uv, jnp.full((4096,), 2.5)))[:, 0]
    np.testing.assert_allclose(c25, 0.5 * (c2 + c3), atol=1e-5)
    # layer<0 still returns ones
    ones = np.asarray(_sample_atlas(atlas, jnp.full((8,), -1, jnp.int32),
                                    uv[:8], jnp.full((8,), 2.0)))
    np.testing.assert_allclose(ones, 1.0)


def test_mip_lod_in_path_tracer_kills_floor_shimmer():
    """Checkerboard floor at a grazing view: the distant half of the image
    must converge to flat gray with ray-cone mip sampling, but alias with a
    mip0-only atlas (the round-2 state)."""
    from idkengine_tpu.render import PathTracer, PathTracerSettings
    from idkengine_tpu.scene.model import (
        Material, MeshPrimitive, Model, Node, Texture)
    from idkengine_tpu.scene.procedural import make_quad
    from idkengine_tpu.scene.scene_db import SceneDatabase

    s = 256
    yy, xx = np.meshgrid(np.arange(s), np.arange(s), indexing="ij")
    chk = (((yy // 4) + (xx // 4)) % 2 * 255).astype(np.uint8)
    tex = Texture(name="chk", data=np.stack([chk] * 3 + [np.full_like(chk, 255)], -1),
                  is_srgb=False)
    v, idx = make_quad([-50, 0, -2], [50, 0, -2], [50, 0, 200], [-50, 0, 200])
    prim = MeshPrimitive(positions=v.astype(np.float32),
                         indices=idx.astype(np.uint32), material=0)
    prim.uvs = (v[:, [0, 2]] / 2.0).astype(np.float32)  # dense tiling
    prim.ensure_normals()
    m = Model(primitives=[prim], nodes=[Node(mesh_primitives=[0])],
              materials=[Material(name="floor", base_color_texture=0,
                                  roughness=1.0)],
              textures=[tex])
    m.root_nodes.append(0)
    db = SceneDatabase()
    db.add_model(m)
    scene = db.build()
    mats = db.materials.soa()
    cam = Camera(position=np.array([0, 1.5, -4], np.float32), yaw=90.0,
                 pitch=-10.0, fov_y=55.0)

    def render(mats_d):
        pt = PathTracer(scene, mats_d, db.lights.soa(), 96, 64,
                        PathTracerSettings(ray_depth=1, sky_strength=1.0,
                                           sky_zenith=(1, 1, 1),
                                           sky_horizon=(1, 1, 1), nee=False,
                                           light_spheres=False,
                                           use_packet_tracer=False))
        pt.render_frame(cam)
        alb = np.asarray(pt._last_aovs[0]).reshape(64, 96, 3)
        dep = np.asarray(pt._last_aovs[2]).reshape(64, 96)
        return alb, dep

    alb_mip, dep = render(mats)
    mats0 = dict(mats)
    mats0["atlas"] = mats["atlas"][:, :, :mats["atlas"].shape[1]]  # mip0 only
    alb_flat, _ = render(mats0)
    far = (dep > 30.0) & (dep < 1e8)
    assert far.sum() > 200
    std_mip = alb_mip[far][:, 0].std()
    std_flat = alb_flat[far][:, 0].std()
    assert std_flat > 2.5 * std_mip, (
        f"mip sampling should kill distant shimmer: {std_mip} vs {std_flat}")
    assert abs(alb_mip[far].mean() - alb_flat[far].mean()) < 0.12


def test_pipeline_denoise_auto_threshold_default32():
    """The shipping auto-denoise threshold (VERDICT r4 #6): with the default
    PtPipelineSettings (denoise_at_samples=32, output='denoised') the
    pipeline must emit the plain tonemapped accumulation below 32 samples
    and switch to the à-trous denoised image exactly at the threshold."""
    import jax.numpy as jnp
    import numpy as np

    from idkengine_tpu.render import Camera, PathTracerSettings
    from idkengine_tpu.render import bloom as _unused  # noqa: F401
    from idkengine_tpu.render.pipeline import (PathTracerPipeline,
                                               PtPipelineSettings)
    from idkengine_tpu.render.tonemap import tonemap
    from idkengine_tpu.scene.procedural import cornell_box
    from idkengine_tpu.scene.scene_db import SceneDatabase

    db = SceneDatabase()
    db.add_model(cornell_box(emissive_quad=True))
    db.build()
    s = PtPipelineSettings(use_bloom=False, adaptive_rate=False)
    assert s.denoise_at_samples == 32 and s.output == "denoised"
    pipe = PathTracerPipeline(
        db, 32, 32,
        PathTracerSettings(ray_depth=2, sky_strength=0.0,
                           use_packet_tracer=False),
        settings=s)
    cam = Camera(position=np.array([278, 273, -800], np.float32), yaw=90.0,
                 fov_y=38.0)
    out31 = None
    for i in range(32):
        out = np.asarray(pipe.render_frame(cam))
        if i == 30:
            out31 = out
    assert pipe.pt.accumulated_samples == 32
    assert out31 is not None
    # at the threshold: output is the DENOISED image, not the raw tonemap
    raw32 = np.asarray(tonemap(pipe.pt.image()))
    assert not np.allclose(out, raw32, atol=1e-4), \
        "at 32 samples the output must be the denoised image"
    # below the threshold the pipeline is pass-through: a fresh 31-frame
    # accumulation's output equals tonemap(raw accumulation) exactly
    pipe2 = PathTracerPipeline(
        db, 32, 32,
        PathTracerSettings(ray_depth=2, sky_strength=0.0,
                           use_packet_tracer=False),
        settings=s)
    for _ in range(31):
        out2 = np.asarray(pipe2.render_frame(cam))
    raw31 = np.asarray(tonemap(pipe2.pt.image()))
    np.testing.assert_allclose(out2, raw31, atol=1e-5,
                               err_msg="below 32 samples: pass-through")
