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


def test_dryrun_multichip_entry():
    """The driver's own entry point must pass in-process."""
    import __graft_entry__

    __graft_entry__.dryrun_multichip(8)
