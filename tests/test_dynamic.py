"""Device-side refit (render/dynamic.py) vs the C++ host-refit oracle.

The reference refits on-GPU with an atomic-lock bottom-up protocol
(BLASRefit/compute.glsl:31-37) after a fenced skinned-vertex readback; the
TPU path refits with precomputed level sweeps, no readback. These tests pin
it against the host path (C++ blas_refit + table refresh), which is itself
tested against closed-form cases in test_bvh.py.
"""
import numpy as np
import pytest

jnp = pytest.importorskip("jax.numpy")

from idkengine_tpu.bvh.builder import BuildSettings
from idkengine_tpu.render.dynamic import DeviceRefitter, build_refit_plan
from idkengine_tpu.scene.model import (
    Animation, AnimationChannel, AnimationSampler)
from idkengine_tpu.scene.procedural import atrium, cornell_box
from idkengine_tpu.scene.scene_db import SceneDatabase


def _db(tris=3000, wave_segs=True):
    import os

    os.environ.setdefault("IDK_WAVE_SEGS", "8")
    db = SceneDatabase(BuildSettings(
        max_leaf_triangle_count=12, traversal_cost=4.0, presplit_factor=0.0))
    db.add_model(atrium(tris))
    db.build()
    return db


def test_device_refit_matches_host_oracle():
    db = _db()
    sc = db.device_scene
    tables = ([] if db._packet_tables is None else
              ([db._packet_tables] if not isinstance(db._packet_tables, list)
               else db._packet_tables)) + \
        (list(db._wave_tables)
         if db._wave_tables is not None
         and db._wave_tables is not db._packet_tables else [])
    plan = build_refit_plan(db._flat, db._slot_tri, db._indices,
                            db.build_settings.max_leaf_triangle_count,
                            packet_tables=tables or None)
    refitter = DeviceRefitter(plan, sc)

    # displace vertices deterministically
    rng = np.random.default_rng(3)
    verts2 = db._verts + rng.normal(0, 0.05, db._verts.shape).astype(np.float32)
    normals2 = db._normals

    pk_scenes = ([db.packet_scene] if not isinstance(db.packet_scene, tuple)
                 else list(db.packet_scene)) + list(db.wave_scene or ())
    new_scene, new_pk, (wmin, wmax) = refitter.refit(
        sc, jnp.asarray(verts2), jnp.asarray(normals2),
        tuple(pk_scenes) if pk_scenes else None)

    # host oracle
    db.blas.refit(verts2)
    db._flat.refresh_boxes(db.blas.nodes)
    np.testing.assert_allclose(np.asarray(new_scene.node_min),
                               db._flat.node_min, rtol=1e-6, atol=1e-5)
    np.testing.assert_allclose(np.asarray(new_scene.node_max),
                               db._flat.node_max, rtol=1e-6, atol=1e-5)
    # triangle arrays
    tri_v = db._indices[db._slot_tri.astype(np.int64)]
    p = verts2[tri_v]
    np.testing.assert_allclose(np.asarray(new_scene.tri_p0), p[:, 0],
                               rtol=1e-6, atol=1e-6)
    np.testing.assert_allclose(np.asarray(new_scene.tri_e1),
                               p[:, 1] - p[:, 0], rtol=1e-5, atol=1e-5)
    # packet tables vs host-side refresh
    for t, ps in zip(tables, new_pk):
        t.refresh(db.blas.nodes, db.blas.tri_indices, verts2, db._indices)
        np.testing.assert_allclose(np.asarray(ps.pairs), t.pairs,
                                   rtol=1e-6, atol=1e-5)
        np.testing.assert_allclose(np.asarray(ps.leaf_geo), t.leaf_geo,
                                   rtol=1e-6, atol=1e-5)
    # wave boxes = per-segment root boxes (row-0 records)
    n_pk_tables = len(tables) - len(db.wave_scene or ())
    for i, t in enumerate(tables):
        np.testing.assert_allclose(np.asarray(wmin[i]), t.pairs[0, 2:5],
                                   rtol=1e-6, atol=1e-5)


def _animated_model():
    m = cornell_box(emissive_quad=False)
    # animate the root node: oscillating translation
    times = np.array([0.0, 1.0, 2.0], np.float32)
    vals = np.array([[0, 0, 0], [0, 60, 0], [0, 0, 0]], np.float32)
    m.animations.append(Animation(
        name="bob",
        channels=[AnimationChannel(
            node=0, path="translation",
            sampler=AnimationSampler(times=times, values=vals))],
    ))
    return m


def test_update_device_matches_update_host():
    """Animated scene: update_device() must produce the same device arrays
    as the host update() path."""
    db1 = SceneDatabase(BuildSettings(max_leaf_triangle_count=12,
                                      traversal_cost=4.0))
    db1.add_model(_animated_model(), hoist=False)
    db1.build()
    db2 = SceneDatabase(BuildSettings(max_leaf_triangle_count=12,
                                      traversal_cost=4.0))
    db2.add_model(_animated_model(), hoist=False)
    db2.build()

    for t in (0.5, 1.25):
        s_host = db1.update(t)
        s_dev = db2.update_device(t)
        np.testing.assert_allclose(np.asarray(s_dev.node_min),
                                   np.asarray(s_host.node_min),
                                   rtol=1e-5, atol=1e-4)
        np.testing.assert_allclose(np.asarray(s_dev.node_max),
                                   np.asarray(s_host.node_max),
                                   rtol=1e-5, atol=1e-4)
        np.testing.assert_allclose(np.asarray(s_dev.tri_p0),
                                   np.asarray(s_host.tri_p0),
                                   rtol=1e-5, atol=1e-4)
        # shading normals round-trip through octahedral compression on both
        # paths; compare decoded direction loosely
        np.testing.assert_allclose(np.asarray(s_dev.tri_gn),
                                   np.asarray(s_host.tri_gn),
                                   rtol=1e-4, atol=1e-4)


def test_update_device_traces_correctly():
    """After a device update, rays hit the moved geometry (picking oracle
    uses the host BVH refit on the same animation time)."""
    db = SceneDatabase(BuildSettings(max_leaf_triangle_count=12,
                                     traversal_cost=4.0))
    db.add_model(_animated_model(), hoist=False)
    db.build()
    from idkengine_tpu.ops.trace import trace_closest

    sc = db.update_device(1.0)  # peak displacement (+60 y)
    o = jnp.asarray(np.array([[278, 333, -800]], np.float32))
    d = jnp.asarray(np.array([[0, 0, 1]], np.float32))
    hit = trace_closest(sc, o, d, jnp.full((1,), 3.4e38, jnp.float32))
    assert int(hit.slot[0]) >= 0
    # host oracle at the same time
    db2 = SceneDatabase(BuildSettings(max_leaf_triangle_count=12,
                                      traversal_cost=4.0))
    db2.add_model(_animated_model(), hoist=False)
    db2.build()
    sc2 = db2.update(1.0)
    hit2 = trace_closest(sc2, o, d, jnp.full((1,), 3.4e38, jnp.float32))
    assert abs(float(hit.t[0]) - float(hit2.t[0])) < 1e-3
