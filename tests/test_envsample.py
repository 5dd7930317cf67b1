"""Env-map importance sampling (render/envsample.py) + env NEE integration.

Oracle strategy: (1) the alias table must reproduce the texel pmf
exactly in distribution; (2) the solid-angle pdf must integrate to 1;
(3) env NEE must be UNBIASED (same mean as BSDF-only on a scene where
both converge) and lower-variance on a concentrated sun."""
import numpy as np
import pytest

jax = pytest.importorskip("jax")
import jax.numpy as jnp  # noqa: E402

from idkengine_tpu.render import envsample  # noqa: E402


def test_alias_matches_pmf():
    rs = np.random.RandomState(0)
    w = rs.rand(16, 8).astype(np.float32) ** 3  # skewed weights
    env = np.repeat(w[..., None], 3, axis=-1)
    s = envsample.EnvSampler(env)
    n = 200_000
    u1 = jnp.asarray(rs.rand(n).astype(np.float32))
    u2 = jnp.asarray(rs.rand(n).astype(np.float32))
    uj = jnp.asarray(rs.rand(n, 2).astype(np.float32))
    d, _ = envsample.sample(s.tables, u1, u2, uj)
    # recover the texel from the direction and histogram it
    h_, w_ = 16, 8
    theta = np.arccos(np.clip(np.asarray(d)[:, 1], -1, 1))
    phi = np.arctan2(np.asarray(d)[:, 2], np.asarray(d)[:, 0])
    x = np.clip(((phi / (2 * np.pi) + 0.5) * w_).astype(int), 0, w_ - 1)
    y = np.clip((theta / np.pi * h_).astype(int), 0, h_ - 1)
    counts = np.bincount(y * w_ + x, minlength=h_ * w_) / n
    pmf = np.asarray(s.tables["pmf"])
    # each texel's frequency within 4 sigma of its pmf
    sig = np.sqrt(np.maximum(pmf * (1 - pmf) / n, 1e-12))
    assert np.all(np.abs(counts - pmf) < 4.5 * sig + 2e-4), (
        np.max(np.abs(counts - pmf) / (sig + 1e-9)))


def test_pdf_integrates_to_one():
    rs = np.random.RandomState(1)
    env = (rs.rand(32, 64, 3).astype(np.float32) ** 2) * 5.0
    s = envsample.EnvSampler(env)
    n = 400_000
    v = rs.randn(n, 3)
    v /= np.linalg.norm(v, axis=-1, keepdims=True)
    p = np.asarray(envsample.pdf(s.tables, jnp.asarray(v, jnp.float32)))
    est = p.mean() * 4.0 * np.pi  # MC over the uniform sphere
    assert abs(est - 1.0) < 0.02, est


def test_sample_pdf_consistency():
    # E[f(d)/pdf(d)] over alias draws must equal the integral of f; take
    # f = luminance -> integral = total env power (per steradian avg * 4pi)
    rs = np.random.RandomState(2)
    env = np.zeros((16, 32, 3), np.float32) + 0.05
    env[3:5, 10:12] = 50.0  # sun block
    s = envsample.EnvSampler(env)
    n = 300_000
    u1 = jnp.asarray(rs.rand(n).astype(np.float32))
    u2 = jnp.asarray(rs.rand(n).astype(np.float32))
    uj = jnp.asarray(rs.rand(n, 2).astype(np.float32))
    d, pdf = envsample.sample(s.tables, u1, u2, uj)
    # nearest lookup of luminance at d
    lum_map = env[..., 0]
    theta = np.arccos(np.clip(np.asarray(d)[:, 1], -1, 1))
    phi = np.arctan2(np.asarray(d)[:, 2], np.asarray(d)[:, 0])
    x = np.clip(((phi / (2 * np.pi) + 0.5) * 32).astype(int), 0, 31)
    y = np.clip((theta / np.pi * 16).astype(int), 0, 15)
    f = lum_map[y, x]
    est = float(np.mean(f / np.asarray(pdf)))
    # true integral of the (piecewise-constant) map over the sphere
    th_edges = np.linspace(0, np.pi, 17)
    d_omega_row = (2 * np.pi / 32) * (np.cos(th_edges[:-1]) - np.cos(th_edges[1:]))
    truth = float((lum_map * d_omega_row[:, None]).sum())
    assert abs(est - truth) / truth < 0.03, (est, truth)


def _render_floor(env, env_nee, spp, seed_frames=0, depth=2, res=24):
    from idkengine_tpu.bvh.builder import BuildSettings
    from idkengine_tpu.render import Camera, PathTracer, PathTracerSettings
    from idkengine_tpu.scene.model import (Material, MeshPrimitive, Model,
                                           Node)
    from idkengine_tpu.scene.procedural import make_quad
    from idkengine_tpu.scene.scene_db import SceneDatabase

    pos, idx = make_quad([-5, 0, -5], [5, 0, -5], [5, 0, 5], [-5, 0, 5])
    prim = MeshPrimitive(positions=pos.astype(np.float32),
                         indices=idx.astype(np.uint32), material=0)
    prim.ensure_normals()
    m = Model(primitives=[prim], nodes=[Node(mesh_primitives=[0])],
              materials=[Material(name="floor")])
    m.root_nodes.append(0)
    db = SceneDatabase(BuildSettings())
    db.add_model(m)
    scene = db.build()
    cam = Camera(position=np.array([0, 2.0, 6.0], np.float32), yaw=-90.0,
                 pitch=-15.0, fov_y=60.0)
    pt = PathTracer(scene, db.materials.soa(), db.lights.soa(), res, res,
                    PathTracerSettings(ray_depth=depth, use_packet_tracer=False,
                                       russian_roulette=False,
                                       use_env_map=True, env_nee=env_nee,
                                       light_spheres=False),
                    env_map=env)
    pt._frame = seed_frames
    for _ in range(spp):
        pt.render_frame(cam)
    return np.asarray(pt.image())


def test_env_nee_unbiased_and_lower_variance():
    # moderately bright sun block: BSDF-only still converges (slowly),
    # env NEE must agree in mean and beat it in variance
    env = np.zeros((16, 32, 3), np.float32) + 0.08
    env[4:6, 8:10] = 25.0
    img_nee = _render_floor(env, True, spp=24)
    img_ref = _render_floor(env, False, spp=160)
    floor_nee = img_nee[16:, :, :].mean()
    floor_ref = img_ref[16:, :, :].mean()
    assert abs(floor_nee - floor_ref) / max(floor_ref, 1e-6) < 0.12, (
        floor_nee, floor_ref)
    # per-sample variance proxy: spread of independent 1-spp estimates
    ones_nee = [
        _render_floor(env, True, spp=1, seed_frames=s)[16:, :, :].mean()
        for s in range(6)]
    ones_bsdf = [
        _render_floor(env, False, spp=1, seed_frames=s)[16:, :, :].mean()
        for s in range(6)]
    assert np.std(ones_nee) < np.std(ones_bsdf), (ones_nee, ones_bsdf)
